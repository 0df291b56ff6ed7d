package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.QueryDef

/** Multimodal column handling: media (image/audio/video) ride through the
  * engine as opaque `binary` payload columns plus typed metadata, and
  * decode / feature-extraction runs as a PARTITION-BATCHED transform over a
  * typed Dataset — the Scala analog of `mapInPandas` (one iterator per
  * partition, rows processed in streaming batches, no driver collect).
  *
  * Images decode for REAL through [[ImageIoDecoder]] (`javax.imageio`,
  * in the JDK): true dimensions, pixel-derived features, decode→scale→
  * re-encode resize. Audio decodes for REAL through [[WavDecoder]]
  * (`javax.sound.sampled`, in the JDK): WAV/AIFF/AU payloads yield the
  * true sample rate, channel count and frame count, PCM-derived signal
  * features, and linear-interpolation resampling as the resize analog.
  * Video decodes for REAL through [[GifVideoDecoder]] — animated GIF via
  * the `javax.imageio` sequence reader: true logical-screen dimensions,
  * true frame count, composited per-frame pixel features, and a temporal
  * luminance profile as the whole-payload feature — and through
  * [[AviMjpegDecoder]] — MJPEG in a RIFF/AVI container, walked by a
  * ~60-line chunk parser with each frame decoded by the JDK's JPEG codec;
  * and through [[Mp4MjpegDecoder]] — MJPEG samples in an ISO-BMFF
  * (MP4/MOV) container located via the stsz/stsc/stco sample tables; the
  * containers share [[temporalProfile]] so features are
  * codec-independent. H.264/HEVC/VP8 bitstreams (and WebM) fall back to
  * [[StubDecoder]] (deterministic pseudo-features — this container has no
  * external media libraries); everything around that fallback is real and
  * load-bearing: the schema contract, the partition-batched execution
  * shape, the `binary`-column plumbing, and the downstream columnar
  * feature handling. Swapping in a JNI codec touches only
  * [[Decoder.decode]]/[[Decoder.resizePayload]]/[[Decoder.decodeFrames]].
  *
  * Scale notes: payloads never shuffle unless a downstream op needs them —
  * feature extraction projects payload→small feature vector EARLY, so
  * shuffles move features (KBs), not media (MBs). Partition sizing for
  * binary tables should target `maxPartitionBytes` at the media size, not
  * row count.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, // source-declared; 0 when unknown
      height: Int,
      duration_ms: Long)

  /** Extracted features: small, shuffle-friendly. */
  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: String,
      // decode stub outputs (deterministic pseudo-features):
      decoded_w: Int,
      decoded_h: Int,
      n_frames: Int,
      feature: Array[Float])

  trait Decoder extends Serializable {
    /** Decode one payload into (w, h, frames, feature vector). A real
      * implementation calls the codec here; signature and batch shape stay.
      */
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float])

    /** Re-encode `payload` at (w, h); None = no codec for this kind (the
      * caller falls back to the deterministic stub transform).
      */
    def resizePayload(kind: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = None

    /** Per-frame (w, h, feature) sequence for multi-frame payloads; None =
      * the decoder has no frame-level codec for this kind (the caller falls
      * back to [[decode]]'s whole-payload feature for every sampled frame).
      */
    def decodeFrames(kind: String, payload: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Float])]] = None
  }

  /** 8-dim pixel-truth feature shared by the image and video codecs, each
    * value in [0,1]: mean R, mean G, mean B, mean luminance, then mean
    * luminance of the four quadrants — small, deterministic, derived from
    * pixels, so downstream similarity/dedup over it is meaningful.
    */
  private[multimodal] def pixelFeature(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Double](8)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
        val lum = 0.2126 * r + 0.7152 * g + 0.0722 * b
        sums(0) += r; sums(1) += g; sums(2) += b; sums(3) += lum
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        sums(4 + q) += lum
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    val qn = n / 4.0
    Array.tabulate(8)(i => (sums(i) / (if (i < 4) n else qn) / 255.0).toFloat)
  }

  /** REAL image codec via `javax.imageio` (in the JDK — zero egress):
    * decodes PNG/JPEG/GIF/BMP payloads to true dimensions and the
    * [[pixelFeature]] 8-dim color/luminance feature, and resizes by
    * decode → scale → re-encode. Audio routes to [[WavDecoder]], video to
    * [[GifVideoDecoder]]; anything neither can decode falls back to the
    * honest stub rather than faking metadata.
    */
  object ImageIoDecoder extends Decoder {
    private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (kind != "image") return StubDecoder.decode(kind, payload)
      readImage(payload) match {
        case None => StubDecoder.decode(kind, payload) // undecodable bytes
        case Some(img) => (img.getWidth, img.getHeight, 1, pixelFeature(img))
      }
    }

    override def resizePayload(
        kind: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
      if (kind != "image") return None
      readImage(payload).map { img =>
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        bos.toByteArray
      }
    }
  }

  /** REAL audio codec via `javax.sound.sampled` (in the JDK — zero
    * egress): WAV/AIFF/AU payloads decode to 16-bit signed PCM. The
    * [[MediaFeatures]] columns are reinterpreted for audio the way the
    * schema contract documents: `decoded_w` = sample rate (Hz),
    * `decoded_h` = channel count, `n_frames` = PCM frame count (so
    * duration = n_frames / decoded_w). Undecodable payloads (or compressed
    * formats the JDK lacks) fall back to [[StubDecoder]].
    *
    * Feature layout: RMS, mean |s|, zero-crossing rate, peak |s|, then RMS
    * of the four time quarters — all on the channel-mixed signal in
    * [-1, 1], deterministic pure math, so downstream similarity/silence
    * screens over the feature column are meaningful.
    */
  object WavDecoder extends Decoder {
    import javax.sound.sampled._

    /** Payload → (format, interleaved 16-bit little-endian PCM bytes). */
    private def pcm(payload: Array[Byte]): Option[(AudioFormat, Array[Byte])] =
      try {
        val in = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val base = in.getFormat
        val want = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          base.getSampleRate, 16, base.getChannels,
          base.getChannels * 2, base.getSampleRate, false)
        val cvt =
          if (base.matches(want)) in
          else AudioSystem.getAudioInputStream(want, in)
        val bytes = cvt.readAllBytes()
        Some((cvt.getFormat, bytes))
      } catch { case _: Exception => None }

    private def sampleAt(bytes: Array[Byte], frame: Int, ch: Int, c: Int): Double = {
      val off = (frame * ch + c) * 2
      (((bytes(off) & 0xff) | (bytes(off + 1) << 8)).toShort) / 32768.0
    }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (kind != "audio") return StubDecoder.decode(kind, payload)
      pcm(payload) match {
        case None => StubDecoder.decode(kind, payload) // undecodable bytes
        case Some((fmt, bytes)) =>
          val ch = fmt.getChannels
          val n = bytes.length / (2 * ch)
          if (n == 0) return StubDecoder.decode(kind, payload)
          var sumSq = 0.0; var sumAbs = 0.0; var peak = 0.0
          var crossings = 0L; var prevSign = 0
          val quarterSq = new Array[Double](4)
          var i = 0
          while (i < n) {
            var mix = 0.0
            var c = 0
            while (c < ch) { mix += sampleAt(bytes, i, ch, c); c += 1 }
            mix /= ch
            sumSq += mix * mix; sumAbs += math.abs(mix)
            if (math.abs(mix) > peak) peak = math.abs(mix)
            val sign = if (mix > 0) 1 else if (mix < 0) -1 else prevSign
            if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
            if (sign != 0) prevSign = sign
            quarterSq(math.min(3, i * 4 / n)) += mix * mix
            i += 1
          }
          val qn = math.max(1.0, n / 4.0)
          val feat = Array(
            math.sqrt(sumSq / n).toFloat,
            (sumAbs / n).toFloat,
            (crossings.toDouble / math.max(1, n - 1)).toFloat,
            peak.toFloat,
            math.sqrt(quarterSq(0) / qn).toFloat,
            math.sqrt(quarterSq(1) / qn).toFloat,
            math.sqrt(quarterSq(2) / qn).toFloat,
            math.sqrt(quarterSq(3) / qn).toFloat)
          (math.round(fmt.getSampleRate), ch, n, feat)
      }
    }

    /** The resize analog for audio: decode → per-channel linear
      * interpolation to `targetHz` → WAV re-encode. None when the payload
      * has no decodable audio.
      */
    def resample(payload: Array[Byte], targetHz: Int): Option[Array[Byte]] =
      pcm(payload).flatMap { case (fmt, bytes) =>
        val ch = fmt.getChannels
        val srcRate = fmt.getSampleRate.toDouble
        val nSrc = bytes.length / (2 * ch)
        if (nSrc == 0 || targetHz <= 0) return None
        val nDst = math.max(1, math.round(nSrc * targetHz / srcRate).toInt)
        val out = new Array[Byte](nDst * 2 * ch)
        var i = 0
        while (i < nDst) {
          val t = i * srcRate / targetHz
          val i0 = math.min(nSrc - 1, t.toInt)
          val i1 = math.min(nSrc - 1, i0 + 1)
          val frac = t - i0
          var c = 0
          while (c < ch) {
            val s0 = sampleAt(bytes, i0, ch, c)
            val s1 = sampleAt(bytes, i1, ch, c)
            val v = math.max(-32768, math.min(32767,
              math.round((s0 + (s1 - s0) * frac) * 32767.0))).toInt
            val off = (i * ch + c) * 2
            out(off) = (v & 0xff).toByte
            out(off + 1) = ((v >> 8) & 0xff).toByte
            c += 1
          }
          i += 1
        }
        val outFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          targetHz.toFloat, 16, ch, ch * 2, targetHz.toFloat, false)
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(out), outFmt, nDst.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
        Some(bos.toByteArray)
      }
  }

  /** REAL video codec for the one container the JDK decodes natively:
    * animated GIF via `javax.imageio`'s sequence reader (zero egress).
    * Decodes every frame, composites partial frames at their logical-screen
    * offset over the running canvas (the common "do not dispose" GIF
    * semantics; restore-to-background/previous disposal is approximated by
    * the same overdraw — documented simplification, exact for the
    * full-frame GIFs an ingest pipeline normalizes to), and reports true
    * logical-screen dimensions and frame count.
    *
    * Whole-payload feature: the 8-dim TEMPORAL luminance profile — mean
    * frame luminance over 8 equal time segments — so scene-change and
    * near-dup screens over the feature column respond to actual content.
    * [[decodeFrames]] exposes the per-frame [[pixelFeature]] for real
    * frame sampling. Compressed-bitstream codecs the JDK lacks (H.264,
    * VP8) fall back to [[StubDecoder]].
    */
  object GifVideoDecoder extends Decoder {
    import javax.imageio.ImageIO
    import javax.imageio.metadata.IIOMetadataNode
    import java.awt.image.BufferedImage

    /** Payload → composited per-frame canvases, or None when the bytes are
      * not a decodable GIF stream.
      */
    private def frames(payload: Array[Byte]): Option[Vector[BufferedImage]] = {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
      try {
        reader.setInput(iis, false)
        val n = reader.getNumImages(true)
        if (n <= 0) return None
        // logical screen size from stream metadata (frame 0 may be a
        // sub-rectangle); fall back to frame 0's own dims
        val screen: Option[(Int, Int)] =
          try {
            val tree = reader.getStreamMetadata.getAsTree("javax_imageio_gif_stream")
              .asInstanceOf[IIOMetadataNode]
            val d = tree.getElementsByTagName("LogicalScreenDescriptor")
            if (d.getLength == 0) None
            else {
              val sd = d.item(0).asInstanceOf[IIOMetadataNode]
              Some((sd.getAttribute("logicalScreenWidth").toInt,
                sd.getAttribute("logicalScreenHeight").toInt))
            }
          } catch { case _: Exception => None }
        var canvas: BufferedImage = null
        val out = Vector.newBuilder[BufferedImage]
        for (i <- 0 until n) {
          val frame = reader.read(i)
          val (ox, oy) =
            try {
              val tree = reader.getImageMetadata(i).getAsTree("javax_imageio_gif_image")
                .asInstanceOf[IIOMetadataNode]
              val d = tree.getElementsByTagName("ImageDescriptor").item(0)
                .asInstanceOf[IIOMetadataNode]
              (d.getAttribute("imageLeftPosition").toInt,
                d.getAttribute("imageTopPosition").toInt)
            } catch { case _: Exception => (0, 0) }
          if (canvas == null) {
            val (w, h) = screen.getOrElse((ox + frame.getWidth, oy + frame.getHeight))
            canvas = new BufferedImage(math.max(w, ox + frame.getWidth),
              math.max(h, oy + frame.getHeight), BufferedImage.TYPE_INT_RGB)
          }
          val g = canvas.createGraphics()
          try g.drawImage(frame, ox, oy, null) finally g.dispose()
          // snapshot the running canvas — later frames overdraw it
          val snap = new BufferedImage(canvas.getWidth, canvas.getHeight,
            BufferedImage.TYPE_INT_RGB)
          val sg = snap.createGraphics()
          try sg.drawImage(canvas, 0, 0, null) finally sg.dispose()
          out += snap
        }
        Some(out.result())
      } catch { case _: Exception => None }
      finally { reader.dispose(); if (iis != null) iis.close() }
    }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (kind != "video") return StubDecoder.decode(kind, payload)
      frames(payload) match {
        case None => StubDecoder.decode(kind, payload) // undecodable bytes
        case Some(fs) =>
          (fs.head.getWidth, fs.head.getHeight, fs.length, temporalProfile(fs))
      }
    }

    override def decodeFrames(
        kind: String, payload: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Float])]] =
      if (kind != "video") None
      else frames(payload).map(_.map(f => (f.getWidth, f.getHeight, pixelFeature(f))))
  }

  /** Whole-video 8-dim TEMPORAL luminance profile — mean frame luminance
    * over 8 equal time segments; empty tail segments (fewer than 8 frames)
    * hold the last seen mean, so the profile is a step function, not
    * zero-padded. Shared by every real video codec so scene-change and
    * near-dup screens behave identically across containers.
    */
  private[multimodal] def temporalProfile(
      fs: IndexedSeq[java.awt.image.BufferedImage]): Array[Float] = {
    val lum = fs.map(f => pixelFeature(f)(3)) // mean luminance per frame
    val segSum = new Array[Double](8)
    val segN = new Array[Int](8)
    for (i <- lum.indices) {
      val s = math.min(7, i * 8 / lum.length)
      segSum(s) += lum(i); segN(s) += 1
    }
    val feat = new Array[Float](8)
    var last = 0.0f
    for (s <- 0 until 8) {
      if (segN(s) > 0) last = (segSum(s) / segN(s)).toFloat
      feat(s) = last
    }
    feat
  }

  /** REAL video codec #2, also fully in-JDK: MJPEG inside an AVI (RIFF)
    * container — the classic capture-pipeline format where every frame is
    * an independent JPEG. A ~60-line RIFF walker finds the video chunks
    * (`NNdb`/`NNdc` ids, nested arbitrarily deep in LIST structures — the
    * `movi` list in practice) and `javax.imageio`'s JPEG codec decodes
    * each; dimensions and frame count are therefore TRUE decoded values,
    * and the whole-payload feature is the same [[temporalProfile]] the GIF
    * path reports. Chunks that fail JPEG decode are skipped (MJPEG streams
    * may interleave non-JPEG data chunks); a payload yielding zero frames
    * falls back to the stub. (MP4 containers route to [[Mp4MjpegDecoder]];
    * only the compressed bitstreams the JDK has no codec for — H.264,
    * HEVC, VP8/WebM — stay on the documented stub, since zero egress
    * forbids codec jars.)
    */
  object AviMjpegDecoder extends Decoder {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, Iso)
    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private[multimodal] def isAvi(payload: Array[Byte]): Boolean =
      payload.length >= 12 && fourcc(payload, 0) == "RIFF" &&
        fourcc(payload, 8) == "AVI "

    private val VideoChunk = """\d\d(dc|db)""".r

    /** Payload → decoded JPEG frames, or None when not an AVI or no video
      * chunk decodes.
      */
    private def frames(payload: Array[Byte]): Option[Vector[BufferedImage]] = {
      if (!isAvi(payload)) return None
      val out = Vector.newBuilder[BufferedImage]
      // iterative RIFF walk: (start, end) spans of chunk sequences
      def walk(start: Int, end: Int): Unit = {
        var p = start
        while (p + 8 <= end) {
          val id = fourcc(payload, p)
          val sz = u32(payload, p + 4)
          if (sz < 0 || p + 8 + sz > end) return // corrupt length: stop
          val bodyEnd = p + 8 + sz.toInt
          id match {
            case "LIST" | "RIFF" if sz >= 4 => walk(p + 12, bodyEnd)
            case VideoChunk(_) if sz > 0 =>
              try {
                val img = ImageIO.read(
                  new java.io.ByteArrayInputStream(payload, p + 8, sz.toInt))
                if (img != null) out += img
              } catch { case _: Exception => () } // non-JPEG data chunk
            case _ => () // avih/strh/strf/idx1/…: structure we don't need
          }
          p = bodyEnd + (sz.toInt & 1) // chunks are word-aligned
        }
      }
      walk(12, payload.length)
      val v = out.result()
      if (v.isEmpty) None else Some(v)
    }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (kind != "video") return StubDecoder.decode(kind, payload)
      frames(payload) match {
        case None => StubDecoder.decode(kind, payload)
        case Some(fs) =>
          (fs.head.getWidth, fs.head.getHeight, fs.length, temporalProfile(fs))
      }
    }

    override def decodeFrames(
        kind: String, payload: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Float])]] =
      if (kind != "video") None
      else frames(payload).map(_.map(f => (f.getWidth, f.getHeight, pixelFeature(f))))
  }

  /** REAL video codec #3: motion-JPEG inside an ISO base-media (MP4/MOV)
    * container. The box grammar is a public spec (ISO/IEC 14496-12): a
    * `moov/trak/mdia/minf/stbl` tree describes each track's samples —
    * `stsz` sizes, `stsc` samples-per-chunk runs, `stco`/`co64` absolute
    * chunk offsets — and for a `jpeg`/`mjpa`-format video track every
    * sample is an independent JPEG that `javax.imageio` decodes. So the
    * walker below gives TRUE frames/dimensions for MJPEG-in-MP4 (the
    * QuickTime capture lineage), while H.264/HEVC/VP8 tracks in the same
    * grammar still land on the honest stub: the CONTAINER is fully
    * parsed; only the codec bitstream is out of JDK reach.
    */
  object Mp4MjpegDecoder extends Decoder {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO

    private val Iso = java.nio.charset.StandardCharsets.ISO_8859_1
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, Iso)
    private def u32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
        ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
    private def u64(b: Array[Byte], off: Int): Long =
      (u32(b, off) << 32) | u32(b, off + 4)

    private[multimodal] def isMp4(payload: Array[Byte]): Boolean =
      payload.length >= 12 && fourcc(payload, 4) == "ftyp"

    /** One track's sample table, folded while walking its `stbl`. */
    private final class Stbl {
      var video = false // mdia/hdlr handler_type == 'vide'
      var sizes: IndexedSeq[Int] = IndexedSeq.empty // stsz
      var stsc: IndexedSeq[(Long, Long)] = IndexedSeq.empty // (first_chunk, per_chunk)
      var chunks: IndexedSeq[Long] = IndexedSeq.empty // stco/co64 absolute offsets
    }

    /** Absolute (offset, size) of every sample in stbl order: walk chunks,
      * expanding the stsc run-length table; samples inside a chunk are
      * contiguous.
      */
    private def sampleSpans(t: Stbl): IndexedSeq[(Long, Int)] = {
      val out = IndexedSeq.newBuilder[(Long, Int)]
      var sample = 0
      var run = 0
      for (ci <- t.chunks.indices) {
        // advance to the stsc run covering chunk ci+1 (runs are sorted)
        while (run + 1 < t.stsc.length && t.stsc(run + 1)._1 <= ci + 1) run += 1
        val perChunk =
          if (t.stsc.isEmpty) 0L else t.stsc(math.min(run, t.stsc.length - 1))._2
        var off = t.chunks(ci)
        var s = 0L
        while (s < perChunk && sample < t.sizes.length) {
          val sz = t.sizes(sample)
          out += ((off, sz))
          off += sz
          sample += 1
          s += 1
        }
      }
      out.result()
    }

    private def frames(payload: Array[Byte]): Option[Vector[BufferedImage]] =
      // a corrupt box tree (e.g. an stsz declaring more entries than the
      // payload holds) must degrade to the stub, never fail the task —
      // the same whole-parse guard the GIF path uses
      try framesUnsafe(payload)
      catch { case _: Exception => None }

    private def framesUnsafe(payload: Array[Byte]): Option[Vector[BufferedImage]] = {
      if (!isMp4(payload)) return None
      val tracks = Vector.newBuilder[Stbl]
      var cur: Stbl = null
      // recursive box walk over [start, end); descends containers only
      def walk(start: Long, end: Long): Unit = {
        var p = start
        while (p + 8 <= end) {
          val sz0 = u32(payload, p.toInt)
          val id = fourcc(payload, p.toInt + 4)
          // size 1 → 64-bit largesize follows; size 0 → box runs to end
          val (body, next) =
            if (sz0 == 1 && p + 16 <= end) (p + 16, p + u64(payload, p.toInt + 8))
            else if (sz0 == 0) (p + 8, end)
            else (p + 8, p + sz0)
          if (next < body || next > end) return // corrupt length: stop
          id match {
            case "moov" | "mdia" | "minf" | "stbl" => walk(body, next)
            case "trak" =>
              cur = new Stbl
              walk(body, next)
              tracks += cur
              cur = null
            case "hdlr" if cur != null && body + 12 <= next =>
              if (fourcc(payload, body.toInt + 8) == "vide") cur.video = true
            case "stsz" if cur != null && body + 12 <= next =>
              val fixed = u32(payload, body.toInt + 4)
              val n = u32(payload, body.toInt + 8).toInt
              cur.sizes =
                if (fixed != 0) IndexedSeq.fill(n)(fixed.toInt)
                else (0 until n).map(i => u32(payload, body.toInt + 12 + 4 * i).toInt)
            case "stsc" if cur != null && body + 8 <= next =>
              val n = u32(payload, body.toInt + 4).toInt
              cur.stsc = (0 until n).map { i =>
                val e = body.toInt + 8 + 12 * i
                (u32(payload, e), u32(payload, e + 4))
              }
            case "stco" if cur != null && body + 8 <= next =>
              val n = u32(payload, body.toInt + 4).toInt
              cur.chunks =
                (0 until n).map(i => u32(payload, body.toInt + 8 + 4 * i))
            case "co64" if cur != null && body + 8 <= next =>
              val n = u32(payload, body.toInt + 4).toInt
              cur.chunks =
                (0 until n).map(i => u64(payload, body.toInt + 8 + 8 * i))
            case _ => () // ftyp/mdat/mvhd/tkhd/stsd/…: not needed to locate samples
          }
          p = next
        }
      }
      walk(0L, payload.length.toLong)
      val out = Vector.newBuilder[BufferedImage]
      for (t <- tracks.result() if t.video; (off, sz) <- sampleSpans(t)) {
        if (off >= 0 && sz > 0 && off + sz <= payload.length) {
          try {
            val img = ImageIO.read(
              new java.io.ByteArrayInputStream(payload, off.toInt, sz))
            if (img != null) out += img
          } catch { case _: Exception => () } // non-JPEG codec sample
        }
      }
      val v = out.result()
      if (v.isEmpty) None else Some(v)
    }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (kind != "video") return StubDecoder.decode(kind, payload)
      frames(payload) match {
        case None => StubDecoder.decode(kind, payload) // H.264/HEVC etc.
        case Some(fs) =>
          (fs.head.getWidth, fs.head.getHeight, fs.length, temporalProfile(fs))
      }
    }

    override def decodeFrames(
        kind: String, payload: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Float])]] =
      if (kind != "video") None
      else frames(payload).map(_.map(f => (f.getWidth, f.getHeight, pixelFeature(f))))
  }

  /** The default decoder: every kind the JDK can decode for real, routed to
    * its real codec; the rest on the honest stub.
    */
  object JdkDecoder extends Decoder {
    // container sniff: RIFF/AVI → MJPEG path, ISO-BMFF → the MP4 sample
    // walker, anything else → GIF path (which itself stubs out
    // undecodable bytes)
    private def videoCodec(payload: Array[Byte]): Decoder =
      if (AviMjpegDecoder.isAvi(payload)) AviMjpegDecoder
      else if (Mp4MjpegDecoder.isMp4(payload)) Mp4MjpegDecoder
      else GifVideoDecoder
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) =
      kind match {
        case "image" => ImageIoDecoder.decode(kind, payload)
        case "audio" => WavDecoder.decode(kind, payload)
        case "video" => videoCodec(payload).decode(kind, payload)
        case _ => StubDecoder.decode(kind, payload)
      }
    override def resizePayload(
        kind: String, payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      if (kind == "image") ImageIoDecoder.resizePayload(kind, payload, w, h)
      else None
    override def decodeFrames(
        kind: String, payload: Array[Byte]): Option[IndexedSeq[(Int, Int, Array[Float])]] =
      if (kind == "video") videoCodec(payload).decodeFrames(kind, payload) else None
  }

  /** Deterministic stand-in for the absent codec libraries: pseudo-features
    * from byte statistics (stable across runs/JVMs — pure byte math).
    */
  object StubDecoder extends Decoder {
    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val n = payload.length
      val w = 16 + (math.abs(payloadHash(payload, 1)) % 64).toInt
      val h = 16 + (math.abs(payloadHash(payload, 2)) % 64).toInt
      val frames = if (kind == "video") 1 + (n % 30) else 1
      val feat = Array.tabulate(8) { i =>
        var acc = 0L
        var j = i
        while (j < n) { acc += (payload(j) & 0xff); j += 8 }
        acc.toFloat / math.max(n, 1)
      }
      (w, h, frames, feat)
    }
    private def payloadHash(p: Array[Byte], seed: Long): Long = {
      var h = seed
      var i = 0
      while (i < p.length) { h = h * 31 + (p(i) & 0xff); i += 1 }
      h
    }
  }

  /** Partition-batched decode + feature extraction (the mapInPandas shape:
    * executor-side iterator, constant memory per partition, no shuffle).
    */
  def extractFeatures(items: Dataset[MediaItem], decoder: Decoder = JdkDecoder): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, h, frames, feat) = decoder.decode(m.kind, m.payload)
        md.reset()
        val sum = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, sum, w, h, frames, feat)
      }
    }
  }

  /** Resize: re-encode each image payload to `(w, h)`. With
    * [[ImageIoDecoder]] this is a REAL decode → bilinear scale → PNG
    * re-encode; a decoder without a codec for the kind (the stub, or
    * audio/video) falls back to a deterministic payload transform so the
    * pipeline shape — payload-in/payload-out per row, batched per
    * partition, output metadata trusted downstream — stays testable
    * end to end either way.
    */
  def resize(items: Dataset[MediaItem], w: Int, h: Int,
      decoder: Decoder = JdkDecoder): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      it.map { m =>
        if (m.kind != "image") m
        else decoder.resizePayload(m.kind, m.payload, w, h) match {
          case Some(out) => m.copy(payload = out, width = w, height = h)
          case None =>
            // stub re-encode: deterministic sample of the source bytes sized
            // ∝ the target area (a real codec decodes + scales + re-encodes)
            val target = math.max(1, math.min(m.payload.length, w * h / 8))
            val step = math.max(1, m.payload.length / target)
            val out = Array.tabulate(target)(i => m.payload((i * step) % m.payload.length))
            m.copy(payload = out, width = w, height = h)
        }
      }
    }
  }

  /** Resample audio payloads to `targetHz` — the audio resize analog:
    * decode → interpolate → WAV re-encode per row, batched per partition,
    * non-audio rows and undecodable payloads pass through unchanged.
    */
  def resampleAudio(items: Dataset[MediaItem], targetHz: Int): Dataset[MediaItem] = {
    import items.sparkSession.implicits._
    items.mapPartitions(_.map { m =>
      if (m.kind != "audio") m
      else WavDecoder.resample(m.payload, targetHz)
        .map(out => m.copy(payload = out)).getOrElse(m)
    })
  }

  /** Frame sampling for video payloads: every `stride`-th decoded frame,
    * 1 row in → n small feature rows out (the explode/flatMap shape —
    * payloads never fan out, only fixed-size frame records do). With the
    * default decoder, GIF payloads yield REAL per-frame pixel features via
    * [[GifVideoDecoder.decodeFrames]]; kinds without a frame-level codec
    * fall back to the whole-payload decode repeated per sampled frame.
    */
  def sampleFrames(items: Dataset[MediaItem], stride: Int, decoder: Decoder = JdkDecoder): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      decoder.decodeFrames(m.kind, m.payload) match {
        case Some(fs) =>
          (0 until fs.length by stride).map { f =>
            val (w, h, feat) = fs(f); (m.media_id, f, w, h, feat)
          }
        case None =>
          val (w, h, frames, feat) = decoder.decode(m.kind, m.payload)
          (0 until frames by stride).map(f => (m.media_id, f, w, h, feat))
      }
    }.toDF("media_id", "frame_idx", "width", "height", "feature")
  }

  /** Oracle-verified binary-column metadata query: documents' text bytes
    * stand in for media payloads (no binary test corpus exists); byte
    * length, content checksum and header bytes are computed ON the binary
    * column in both engines.
    */
  val queries: Map[String, QueryDef] = Map(
    "q24_binary_meta" -> QueryDef(
      fn = { (s: SparkSession, dir: String) =>
        Tables.load(s, dir, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(
            col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            md5(col("payload")).as("checksum"),
            lower(hex(substring(col("payload"), 1, 8))).as("header_hex"))
          .orderBy("doc_id")
      },
      oracle = Some(
        """SELECT doc_id,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  md5(text) AS checksum,
          |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex
          |FROM documents ORDER BY doc_id""".stripMargin)),
  )
}
