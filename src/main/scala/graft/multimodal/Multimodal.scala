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
  * re-encode resize. Audio/video remain on [[StubDecoder]] (deterministic
  * pseudo-features from payload bytes — the JDK ships no codec for them
  * and this container has no media libraries); everything around that
  * stub is real and load-bearing: the schema contract, the
  * partition-batched execution shape, the `binary`-column plumbing, and
  * the downstream columnar feature handling. Swapping in a JNI codec
  * touches only [[Decoder.decode]]/[[Decoder.resizePayload]].
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
  }

  /** REAL image codec via `javax.imageio` (in the JDK — zero egress):
    * decodes PNG/JPEG/GIF/BMP payloads to true dimensions and an 8-dim
    * color/luminance feature, and resizes by decode → scale → re-encode.
    * Audio/video stay on [[StubDecoder]] semantics — the JDK ships no
    * codec for them, and pretending otherwise would fake the metadata.
    *
    * Feature layout (each in [0,1]): mean R, mean G, mean B, mean
    * luminance, then mean luminance of the four image quadrants — small,
    * deterministic, and actually derived from pixels, so downstream
    * similarity/dedup over the feature column is meaningful.
    */
  object ImageIoDecoder extends Decoder {
    private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    def decode(kind: String, payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      if (kind != "image") return StubDecoder.decode(kind, payload)
      readImage(payload) match {
        case None => StubDecoder.decode(kind, payload) // undecodable bytes
        case Some(img) =>
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
          val feat = Array.tabulate(8)(i =>
            (sums(i) / (if (i < 4) n else qn) / 255.0).toFloat)
          (w, h, 1, feat)
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
  def extractFeatures(items: Dataset[MediaItem], decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
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
      decoder: Decoder = ImageIoDecoder): Dataset[MediaItem] = {
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

  /** Frame sampling for video payloads: every `stride`-th decoded frame.
    * Decode is stubbed; the explode/flatMap shape (1 row in → n frame rows
    * out, each a small feature record) is the real pattern.
    */
  def sampleFrames(items: Dataset[MediaItem], stride: Int, decoder: Decoder = StubDecoder): DataFrame = {
    import items.sparkSession.implicits._
    items.filter(_.kind == "video").flatMap { m =>
      val (w, h, frames, feat) = decoder.decode(m.kind, m.payload)
      (0 until frames by stride).map(f => (m.media_id, f, w, h, feat))
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
