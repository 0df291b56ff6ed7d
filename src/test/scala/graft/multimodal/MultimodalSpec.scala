package graft.multimodal

import graft.SparkTestBase
import Multimodal._

class MultimodalSpec extends SparkTestBase {

  private def corpus = {
    import spark.implicits._
    Seq(
      MediaItem(1L, "image", "PNGDATA-aaaaaaaaaaaa".getBytes("UTF-8"), 640, 480, 0L),
      MediaItem(2L, "audio", "RIFFDATA-bbbbbbbb".getBytes("UTF-8"), 0, 0, 1200L),
      MediaItem(3L, "video", ("MP4" * 40).getBytes("UTF-8"), 1920, 1080, 5000L)).toDS()
  }

  test("extractFeatures: schema, determinism, checksum") {
    val f1 = extractFeatures(corpus).collect().sortBy(_.media_id)
    val f2 = extractFeatures(corpus).collect().sortBy(_.media_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq) // stub is pure
    assert(f1.forall(_.feature.length == 8))
    assert(f1.find(_.media_id == 1).get.n_bytes == 20L)
    // checksum matches Spark's own md5 of the same bytes
    import org.apache.spark.sql.functions._
    val sparkMd5 = corpus.toDF().select(md5(col("payload"))).collect().map(_.getString(0)).toSet
    assert(f1.map(_.checksum).toSet == sparkMd5)
  }

  test("sampleFrames: only video, stride respected") {
    val frames = sampleFrames(corpus, stride = 7).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getLong(0) == 3L))
    val idx = frames.map(_.getInt(1)).sorted.toSeq
    assert(idx == idx.distinct && idx.forall(_ % 7 == 0))
  }

  test("resize: images re-encoded to target dims, other kinds untouched") {
    val out = resize(corpus, 64, 64).collect().sortBy(_.media_id)
    val img = out(0)
    assert(img.width == 64 && img.height == 64)
    assert(img.payload.length == 64 * 64 / 8 || img.payload.length == 20) // capped at source size
    // deterministic: same input → same bytes
    val again = resize(corpus, 64, 64).collect().sortBy(_.media_id).head
    assert(again.payload.toSeq == img.payload.toSeq)
    // audio/video pass through unchanged
    val orig = corpus.collect().sortBy(_.media_id)
    assert(out(1).payload.toSeq == orig(1).payload.toSeq)
    assert(out(2).width == 1920 && out(2).height == 1080)
  }

  test("real image codec: decode, pixel features, and true resize via javax.imageio") {
    import spark.implicits._
    // a REAL PNG generated in-test: 40x20, left half pure red, right pure blue
    val img = new java.awt.image.BufferedImage(40, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 20; x <- 0 until 40)
      img.setRGB(x, y, if (x < 20) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val items = Seq(
      MediaItem(1L, "image", png, 0, 0, 0L), // dims unknown at ingest
      MediaItem(2L, "audio", "RIFF".getBytes("UTF-8"), 0, 0, 99L)).toDS()

    val feats = extractFeatures(items, ImageIoDecoder).collect().sortBy(_.media_id)
    val f = feats(0)
    // true decoded dimensions, not source-declared, not stub-derived
    assert(f.decoded_w == 40 && f.decoded_h == 20)
    // features are pixel truth: half red + half blue, no green
    assert(f.feature(0) > 0.45f && f.feature(0) < 0.55f) // mean R
    assert(f.feature(1) < 0.01f) // mean G
    assert(f.feature(2) > 0.45f && f.feature(2) < 0.55f) // mean B
    // audio stays on the honest stub
    assert(feats(1).decoded_w >= 16 && feats(1).feature.length == 8)

    // resize really re-encodes: the output payload is a valid 8x8 PNG
    val resized = resize(items, 8, 8).collect().sortBy(_.media_id).head
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized.payload))
    assert(back.getWidth == 8 && back.getHeight == 8)
    // scaled pixels keep the halves' colors
    assert(((back.getRGB(1, 4) >> 16) & 0xff) > 200) // left: red
    assert((back.getRGB(6, 4) & 0xff) > 200) // right: blue
  }

  test("real audio codec: WAV decode, PCM-truth features, resample via javax.sound.sampled") {
    import spark.implicits._
    import javax.sound.sampled._
    // a REAL WAV generated in-test: 8000 Hz mono 16-bit, 4000 frames
    // (0.5 s) of a 440 Hz sine at amplitude 0.5
    val rate = 8000; val n = 4000; val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * 440 * i / rate) * amp * 32767).toInt.toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val items = Seq(MediaItem(1L, "audio", wav, 0, 0, 500L)).toDS()

    // the DEFAULT decoder routes audio to the real codec: true sample
    // rate / channels / frame count, not stub-derived
    val f = extractFeatures(items).collect().head
    assert(f.decoded_w == 8000 && f.decoded_h == 1 && f.n_frames == 4000)
    // PCM truth: RMS of a sine is A/√2; peak is A; ZCR is 2f/rate
    assert(math.abs(f.feature(0) - amp / math.sqrt(2)) < 0.01, s"rms=${f.feature(0)}")
    assert(math.abs(f.feature(3) - amp) < 0.01, s"peak=${f.feature(3)}")
    assert(math.abs(f.feature(2) - 880.0 / rate) < 0.01, s"zcr=${f.feature(2)}")
    // steady tone: all four time-quarter RMS values agree
    assert((4 to 7).forall(i => math.abs(f.feature(i) - f.feature(4)) < 0.01))

    // resample to half the rate: a VALID WAV with ~half the frames and
    // the same signal energy (the tone is far below the new Nyquist)
    val rs = resampleAudio(items, 4000).collect().head
    val f2 = extractFeatures(Seq(rs).toDS()).collect().head
    assert(f2.decoded_w == 4000 && f2.decoded_h == 1)
    assert(math.abs(f2.n_frames - 2000) <= 1, s"frames=${f2.n_frames}")
    assert(math.abs(f2.feature(0) - amp / math.sqrt(2)) < 0.02)
    // undecodable "audio" bytes fall back to the honest stub, not a crash
    val junk = Seq(MediaItem(2L, "audio", "RIFFnope".getBytes("UTF-8"), 0, 0, 0L)).toDS()
    assert(extractFeatures(junk).collect().head.feature.length == 8)
  }

  test("real video codec: animated GIF frame decode, temporal profile, frame sampling") {
    import spark.implicits._
    import javax.imageio._
    // a REAL animated GIF generated in-test: 24x12, 6 frames alternating
    // solid black / solid white (GIF is 256-color palettized, so pure
    // black/white survive quantization exactly)
    val frames = (0 until 6).map { i =>
      val img = new java.awt.image.BufferedImage(24, 12, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(if (i % 2 == 0) java.awt.Color.BLACK else java.awt.Color.WHITE)
      g.fillRect(0, 0, 24, 12)
      g.dispose()
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new IIOImage(f, null, null), null))
    writer.endWriteSequence()
    ios.close(); writer.dispose()
    val gif = bos.toByteArray
    val items = Seq(
      MediaItem(1L, "video", gif, 0, 0, 0L),
      MediaItem(2L, "video", ("MP4" * 40).getBytes("UTF-8"), 1920, 1080, 0L)).toDS()

    // the DEFAULT decoder routes video to the real codec: true
    // logical-screen dims and true frame count, not stub-derived
    val f = extractFeatures(items).collect().sortBy(_.media_id).head
    assert(f.decoded_w == 24 && f.decoded_h == 12 && f.n_frames == 6)
    // temporal luminance profile alternates with the frames: 8 segments
    // over 6 frames → segment luminances follow the black/white pattern
    assert(f.feature(0) < 0.05f, s"seg0=${f.feature(0)}") // frame 0: black
    assert(f.feature(7) > 0.95f, s"seg7=${f.feature(7)}") // frame 5: white
    assert(f.feature.max > 0.95f && f.feature.min < 0.05f)

    // frame sampling decodes REAL per-frame features: stride 2 keeps
    // frames 0/2/4 (all black) for the GIF; the MP4 bytes fall back to the
    // stub's whole-payload decode (1 pseudo-frame)
    val sampled = sampleFrames(items, stride = 2).collect()
    val gifRows = sampled.filter(_.getLong(0) == 1L).sortBy(_.getInt(1))
    assert(gifRows.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(gifRows.forall(r => r.getInt(2) == 24 && r.getInt(3) == 12))
    assert(gifRows.forall(_.getSeq[Float](4)(3) < 0.05f)) // mean luminance: black
    val stubRows = sampled.filter(_.getLong(0) == 2L)
    assert(stubRows.length == 1 && stubRows.head.getInt(1) == 0)
    // stride 1 sees the alternation in per-frame luminance
    val all = sampleFrames(items.filter(_.media_id == 1L), stride = 1).collect().sortBy(_.getInt(1))
    assert(all.length == 6)
    assert(all.map(r => if (r.getSeq[Float](4)(3) > 0.5f) 1 else 0).toSeq == Seq(0, 1, 0, 1, 0, 1))
  }

  test("real video codec #2: MJPEG-in-AVI decode via RIFF walker + JDK JPEG") {
    import spark.implicits._
    import javax.imageio.ImageIO
    // frame-truth fixture: an MJPEG AVI generated in-test — 3 solid-color
    // JPEG frames (32x16, black/white/black) wrapped in a real RIFF
    // structure (hdrl with avih/strh/strf, then the movi list). Solid
    // colors survive JPEG's lossy DCT essentially exactly.
    def jpegBytes(c: java.awt.Color): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics(); g.setColor(c); g.fillRect(0, 0, 32, 16); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ le32(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    def lst(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("ISO-8859-1") ++ body)
    val jf = Seq(java.awt.Color.BLACK, java.awt.Color.WHITE, java.awt.Color.BLACK)
      .map(jpegBytes)
    val hdrl = lst("hdrl", chunk("avih", Array.fill(56)(0.toByte)) ++
      lst("strl", chunk("strh", Array.fill(56)(0.toByte)) ++
        chunk("strf", Array.fill(40)(0.toByte))))
    val movi = lst("movi", jf.map(b => chunk("00dc", b)).reduce(_ ++ _))
    val body = "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("ISO-8859-1") ++ le32(body.length) ++ body

    // the DEFAULT decoder sniffs RIFF/AVI and routes to the MJPEG codec:
    // true dims and true frame count from actual JPEG decode
    val items = Seq(MediaItem(1L, "video", avi, 0, 0, 0L)).toDS()
    val f = extractFeatures(items).collect().head
    assert(f.decoded_w == 32 && f.decoded_h == 16 && f.n_frames == 3)
    // temporal profile: starts black, peaks white mid-stream, ends black
    assert(f.feature(0) < 0.05f, s"seg0=${f.feature(0)}")
    assert(f.feature(7) < 0.05f, s"seg7=${f.feature(7)}")
    assert(f.feature.max > 0.95f)

    // frame sampling yields REAL per-frame features in stream order
    val all = sampleFrames(items, stride = 1).collect().sortBy(_.getInt(1))
    assert(all.length == 3)
    assert(all.map(r => if (r.getSeq[Float](4)(3) > 0.5f) 1 else 0).toSeq == Seq(0, 1, 0))

    // frame truth: the AVI path's per-frame features are IDENTICAL to the
    // JDK image codec decoding the same JPEG bytes directly — same codec,
    // same pixels, bit-equal features
    val viaAvi = Multimodal.AviMjpegDecoder.decodeFrames("video", avi).get
    val direct = jf.map(b => Multimodal.ImageIoDecoder.decode("image", b))
    assert(viaAvi.map(_._1) == direct.map(_._1) && viaAvi.map(_._2) == direct.map(_._2))
    viaAvi.zip(direct).foreach { case ((_, _, fa), (_, _, _, fd)) =>
      assert(fa.toSeq == fd.toSeq)
    }

    // a truncated/corrupt AVI never crashes the pipeline: stub fallback
    val bad = avi.take(40) ++ Array.fill(8)(0.toByte)
    val fb = extractFeatures(Seq(MediaItem(9L, "video", bad, 0, 0, 0L)).toDS())
      .collect().head
    assert(fb.n_frames >= 1) // stub-shaped, no exception
  }

  test("real video codec #3: MJPEG-in-MP4 decode via ISO-BMFF sample walker") {
    import spark.implicits._
    import javax.imageio.ImageIO
    // frame-truth fixture: an MJPEG MP4 generated in-test — 3 solid-color
    // JPEG samples (32x16, black/white/black) laid out as TWO chunks
    // (2 samples + 1 sample) so the stsc run expansion is exercised, with
    // absolute stco offsets into the mdat.
    def jpegBytes(c: java.awt.Color): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        32, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics(); g.setColor(c); g.fillRect(0, 0, 32, 16); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "jpg", bos); bos.toByteArray
    }
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(id: String, body: Array[Byte]): Array[Byte] =
      be32(8L + body.length) ++ id.getBytes("ISO-8859-1") ++ body
    val vf = Array.fill(4)(0.toByte) // fullbox version+flags
    val jf = Seq(java.awt.Color.BLACK, java.awt.Color.WHITE, java.awt.Color.BLACK)
      .map(jpegBytes)
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1") ++ be32(0) ++ "isom".getBytes("ISO-8859-1"))
    val mdatOff = ftyp.length + 8L // samples start right after the mdat header
    val chunk1 = mdatOff // samples 0,1 contiguous
    val chunk2 = mdatOff + jf(0).length + jf(1).length // sample 2
    val hdlr = box("hdlr", vf ++ be32(0) ++ "vide".getBytes("ISO-8859-1") ++
      Array.fill(13)(0.toByte))
    val stsz = box("stsz", vf ++ be32(0) ++ be32(3) ++
      jf.flatMap(b => be32(b.length)).toArray)
    val stsc = box("stsc", vf ++ be32(2) ++
      be32(1) ++ be32(2) ++ be32(1) ++ // chunks 1..1: 2 samples each
      be32(2) ++ be32(1) ++ be32(1))   // chunks 2..: 1 sample each
    val stco = box("stco", vf ++ be32(2) ++ be32(chunk1) ++ be32(chunk2))
    val moov = box("moov", box("trak", box("mdia", hdlr ++
      box("minf", box("stbl", stsz ++ stsc ++ stco)))))
    val mp4 = ftyp ++ box("mdat", jf.reduce(_ ++ _)) ++ moov

    // the DEFAULT decoder sniffs ftyp and routes to the MP4 sample walker:
    // true dims and true frame count from actual JPEG decode
    val items = Seq(MediaItem(1L, "video", mp4, 0, 0, 0L)).toDS()
    val f = extractFeatures(items).collect().head
    assert(f.decoded_w == 32 && f.decoded_h == 16 && f.n_frames == 3)
    assert(f.feature(0) < 0.05f && f.feature(7) < 0.05f && f.feature.max > 0.95f)

    // frame truth: identical features to the JDK image codec decoding the
    // same JPEG bytes directly — same codec, same pixels, bit-equal
    val viaMp4 = Multimodal.Mp4MjpegDecoder.decodeFrames("video", mp4).get
    val direct = jf.map(b => Multimodal.ImageIoDecoder.decode("image", b))
    assert(viaMp4.map(_._1) == direct.map(_._1) && viaMp4.map(_._2) == direct.map(_._2))
    viaMp4.zip(direct).foreach { case ((_, _, fa), (_, _, _, fd)) =>
      assert(fa.toSeq == fd.toSeq)
    }

    // an mp4 whose samples are NOT JPEG (an H.264-shaped bitstream) parses
    // as a container but decodes zero frames → honest stub, no crash; a
    // truncated box tree likewise
    val opaque = Array.tabulate[Byte](600)(i => (i * 31).toByte)
    val mp4H264 = ftyp ++ box("mdat", opaque) ++ box("moov", box("trak",
      box("mdia", hdlr ++ box("minf", box("stbl",
        box("stsz", vf ++ be32(0) ++ be32(1) ++ be32(600)) ++
          box("stsc", vf ++ be32(1) ++ be32(1) ++ be32(1) ++ be32(1)) ++
          box("stco", vf ++ be32(1) ++ be32(mdatOff)))))))
    // an stsz declaring more entries than the payload holds must degrade
    // to the stub too (bounds are enforced by the whole-parse guard)
    val lyingStsz = ftyp ++ box("mdat", opaque) ++ box("moov", box("trak",
      box("mdia", hdlr ++ box("minf", box("stbl",
        box("stsz", vf ++ be32(0) ++ be32(100000) ++ be32(600)))))))
    val fb = extractFeatures(
      Seq(MediaItem(8L, "video", mp4H264, 0, 0, 0L),
        MediaItem(9L, "video", mp4.take(60), 0, 0, 0L),
        MediaItem(10L, "video", lyingStsz, 0, 0, 0L)).toDS())
      .collect()
    assert(fb.length == 3 && fb.forall(_.n_frames >= 1)) // stub-shaped, no exception
  }

  test("payloads project to features before any wide op (plan shape)") {
    val feats = extractFeatures(corpus).toDF()
    // features are small fixed-size records — grouping them shuffles KBs,
    // not payloads; assert payload column is gone post-projection
    assert(!feats.columns.contains("payload"))
    val agg = feats.groupBy("kind").count().collect()
    assert(agg.map(_.getLong(1)).sum == 3L)
  }
}
