package graft.sources.interop

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.JsonNode

/** Delta Lake deletion-vector decoding, straight from the published
  * protocol (delta-io/delta PROTOCOL.md, "Deletion Vectors" +
  * "Deletion Vector Descriptor Schema" + "Deletion Vector File Storage
  * Format"):
  *
  *  - a descriptor carries `storageType` ('u' relative file named by a
  *    Z85-encoded UUID, 'p' absolute path, 'i' inline), `pathOrInlineDv`,
  *    `offset` (u/p), `sizeInBytes`, `cardinality`;
  *  - in a DV FILE, each vector sits at `offset` as
  *    `[4-byte big-endian length][payload][4-byte big-endian CRC-32 of
  *    the payload]`;
  *  - the payload is the RoaringBitmapArray PORTABLE serialization:
  *    `[4-byte little-endian magic 1681511377][8-byte little-endian
  *    bitmap count N][N standard-portable 32-bit RoaringBitmaps in index
  *    order]` — bitmap i holds the low 32 bits of row indexes in
  *    [i·2³², (i+1)·2³²).
  *
  * Decoded positions are parquet `_metadata.row_index` values — the same
  * addressing the commitlog's native deletion vectors use, so imported
  * DVs re-encode losslessly as commitlog DV parquet.
  */
object DeltaDv {

  private val PortableMagic = 1681511377

  /** Z85 (ZeroMQ base-85, the encoding PROTOCOL.md specifies for DV file
    * UUIDs): 5 chars → 4 bytes; a UUID is 20 chars → 16 bytes.
    */
  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      ".-:+=^!/*?&<>()[]{}@%$#"
  private val z85Dec: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  private[graft] def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length must be a multiple of 5: '$s'")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var acc = 0L
      (0 until 5).foreach { k =>
        val c = s.charAt(i + k)
        val v = if (c < 128) z85Dec(c.toInt) else -1
        require(v >= 0, s"invalid Z85 character '$c' in '$s'")
        acc = acc * 85 + v
      }
      val o = i / 5 * 4
      out(o) = (acc >> 24).toByte; out(o + 1) = (acc >> 16).toByte
      out(o + 2) = (acc >> 8).toByte; out(o + 3) = acc.toByte
      i += 5
    }
    out
  }

  private[graft] def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "Z85 input must be a multiple of 4 bytes")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var acc = 0L
      (0 until 4).foreach(k => acc = (acc << 8) | (bytes(i + k) & 0xffL))
      val chunk = new Array[Char](5)
      (4 to 0 by -1).foreach { k =>
        chunk(k) = Z85Alphabet((acc % 85).toInt); acc /= 85
      }
      sb.appendAll(chunk)
      i += 4
    }
    sb.toString
  }

  /** Resolve a descriptor's DV file path under the table root ('u': the
    * optional random prefix is everything before the final 20 Z85 chars;
    * the file is `deletion_vector_<uuid>.bin`).
    */
  private[graft] def dvFilePath(tableRoot: String, storageType: String,
      pathOrInline: String): Path = storageType match {
    case "p" => Paths.get(pathOrInline)
    case "u" =>
      require(pathOrInline.length >= 20,
        s"'u' pathOrInlineDv must end in a 20-char Z85 UUID: '$pathOrInline'")
      val (prefix, enc) = pathOrInline.splitAt(pathOrInline.length - 20)
      val b = z85Decode(enc)
      val bb = ByteBuffer.wrap(b)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) Paths.get(tableRoot, name)
      else Paths.get(tableRoot, prefix, name)
    case other =>
      throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }

  /** Decode one descriptor to its dead row indexes (sorted ascending). */
  def decode(tableRoot: String, dv: JsonNode): Array[Long] = decodeFields(
    tableRoot,
    dv.get("storageType").asText(),
    dv.get("pathOrInlineDv").asText(),
    Option(dv.get("offset")).map(_.asInt()).getOrElse(0),
    Option(dv.get("sizeInBytes")).map(_.asInt()).getOrElse(-1),
    Option(dv.get("cardinality")).map(_.asLong()).getOrElse(-1L))

  /** [[decode]] over the descriptor's plain fields — Serializable-friendly
    * (no Jackson nodes), so the import path can decode DVs EXECUTOR-side
    * and keep position sets off the driver entirely. Pass negative
    * `sizeInBytes`/`cardinality` when the descriptor omits them.
    */
  private[graft] def decodeFields(tableRoot: String, storageType: String,
      pathOrInline: String, offset: Int, sizeInBytes: Int,
      cardinality: Long): Array[Long] = {
    val payload: Array[Byte] = storageType match {
      case "i" => z85Decode(pathOrInline)
      case _ =>
        val file = dvFilePath(tableRoot, storageType, pathOrInline)
        require(Files.isRegularFile(file), s"DV file missing: $file")
        val bytes = Files.readAllBytes(file)
        val off = offset
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
        bb.position(off)
        val len = bb.getInt
        require(len > 0 && off + 4 + len + 4 <= bytes.length,
          s"DV entry at offset $off overruns $file (len=$len)")
        // PROTOCOL.md: sizeInBytes is the serialized payload size, which
        // the storage format repeats as the entry's length prefix —
        // delta-spark asserts they agree, and so do we (a writer that
        // recorded the .bin FILE size here would corrupt real readers)
        require(sizeInBytes < 0 || len == sizeInBytes,
          s"DV length prefix $len != descriptor sizeInBytes $sizeInBytes " +
            s"in $file at offset $off — malformed descriptor")
        val p = new Array[Byte](len)
        bb.get(p)
        val storedCrc = bb.getInt
        val crc = new java.util.zip.CRC32
        crc.update(p)
        require(crc.getValue.toInt == storedCrc,
          s"DV payload CRC mismatch in $file at offset $off — refusing a " +
            "corrupt deletion vector (importing it would resurrect or " +
            "over-delete rows)")
        p
    }
    val positions = parsePortable(payload)
    require(cardinality < 0 || cardinality == positions.length,
      s"DV cardinality ${positions.length} != descriptor cardinality " +
        s"$cardinality")
    positions
  }

  /** RoaringBitmapArray portable form → sorted row indexes. */
  private[graft] def parsePortable(payload: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == PortableMagic,
      s"DV payload magic $magic != RoaringBitmapArray portable $PortableMagic")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"absurd bitmap count $n")
    val out = Array.newBuilder[Long]
    (0L until n).foreach { i =>
      val rb = new org.roaringbitmap.buffer.ImmutableRoaringBitmap(bb)
      val it = rb.getIntIterator
      while (it.hasNext) out += (i << 32) | (it.next().toLong & 0xffffffffL)
      bb.position(bb.position() + rb.serializedSizeInBytes())
    }
    out.result()
  }

  /** Serialize row indexes as a portable RoaringBitmapArray payload — the
    * write half the import fixtures (and the DV spec) round-trip through.
    */
  private[graft] def writePortable(positions: Array[Long]): Array[Byte] = {
    val byHigh = positions.groupBy(p => (p >> 32).toInt)
    val n = if (positions.isEmpty) 0 else byHigh.keys.max + 1
    val bitmaps = (0 until n).map { i =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      byHigh.getOrElse(i, Array.empty[Long]).foreach(p => rb.add(p.toInt))
      rb.runOptimize()
      rb
    }
    val size = 4 + 8 + bitmaps.map(_.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(PortableMagic)
    bb.putLong(n.toLong)
    bitmaps.foreach(_.serialize(bb))
    bb.array()
  }

  /** Write a DV FILE holding one vector at offset 1 (version byte 1 at
    * offset 0, per the storage format); returns (entry offset, payload
    * length). The payload length — NOT the .bin file size — is what a
    * descriptor's `sizeInBytes` must carry (PROTOCOL.md; delta readers
    * assert it against the length prefix).
    */
  private[graft] def writeDvFile(target: Path,
      positions: Array[Long]): (Int, Int) = {
    val payload = writePortable(positions)
    val crc = new java.util.zip.CRC32
    crc.update(payload)
    val bb = ByteBuffer.allocate(1 + 4 + payload.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    bb.put(1.toByte) // format version
    bb.putInt(payload.length)
    bb.put(payload)
    bb.putInt(crc.getValue.toInt)
    Files.createDirectories(target.getParent)
    Files.write(target, bb.array())
    (1, payload.length) // entry offset, descriptor sizeInBytes
  }
}
