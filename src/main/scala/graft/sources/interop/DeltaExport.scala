package graft.sources.interop

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.sources.CommitLog

/** Zero-copy EXPORT of a commitlog snapshot as a Delta Lake table: the
  * `_delta_log/` directory is written INTO the table root, so the
  * commitlog data files — which already live under the root as plain
  * parquet — become the Delta table's data files with RELATIVE add paths
  * and no byte moved. The written log follows the public protocol
  * (delta-io PROTOCOL.md): one commit carrying `protocol`
  * (minReaderVersion 1 — nothing in the exported snapshot needs reader
  * features), `metaData` (schemaString = Spark schema JSON; exported
  * UNPARTITIONED, which is always correct because this engine stages
  * partition columns in-file as ordinary data columns), and one `add`
  * per live file with `stats.numRecords` riding the manifest's exact row
  * counts.
  *
  * Deletion vectors (r8): a DV-bearing snapshot exports as a READER
  * VERSION 3 log with the `deletionVectors` feature — each file's
  * commitlog DV parquet (dead `_metadata.row_index` positions, the same
  * addressing Delta uses) re-encodes through [[DeltaDv.writeDvFile]] as a
  * 'u'-addressed `deletion_vector_<uuid>.bin` (Z85 uuid, CRC-framed
  * portable RoaringBitmapArray) referenced by a `deletionVector`
  * descriptor on the add action. Reading the positions needs a
  * SparkSession (DV parquet is data, not metadata) — pass one, or the
  * DV case refuses with instructions. The re-encode is DISTRIBUTED:
  * each DV's .bin is built and written executor-side; the driver holds
  * only descriptor tuples, never a position set.
  *
  * Column mapping (r9): rename-era tables export NATIVELY as Delta
  * name-mode column mapping — the file bytes already hold physical
  * column names, and the schemaString's per-field
  * `delta.columnMapping.physicalName`/`id` metadata carries the map, so
  * the export stays pure metadata (reader version 2, or the
  * `columnMapping` table feature when DVs ride along).
  *
  * Refused loudly (exporting would corrupt): by-reference files outside
  * the root (clone/import sources — a relative path cannot reach them).
  *
  * Round-trip contract: `DeltaImport.importTable` over the exported root
  * reads back the identical snapshot ([[DeltaExportSpec]]) — for DV
  * exports that round trip exercises BOTH halves of the PROTOCOL.md DV
  * codec against each other plus the commitlog read path as the
  * ground truth. At 100 TB the export is a driver-metadata write — KB of
  * JSON (plus KB-scale .bin per DV'd file) for any table size.
  */
object DeltaExport {

  private val mapper = new ObjectMapper()

  /** Write the Delta log for the current — or a PINNED (`version`) —
    * snapshot; returns the number of data files exported. Pinning is the
    * "publish this tag to external Delta readers" move: the export
    * freezes that snapshot's file list, while the commitlog table keeps
    * evolving underneath (vacuum retention still governs the files'
    * physical lifetime — pin a tag to hold them).
    */
  def exportTable(root: String, version: Option[Long] = None,
      spark: Option[org.apache.spark.sql.SparkSession] = None): Int = {
    val v = version.getOrElse(CommitLog.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no commits at $root")))
    val m = CommitLog.readManifest(root, v)
    val dvMap = m.dvsOrEmpty
    require(dvMap.isEmpty || spark.nonEmpty,
      "snapshot carries deletion vectors — their positions live in DV " +
        "parquet, so exporting them needs a SparkSession: " +
        "exportTable(root, version, spark = Some(session)) writes a " +
        "reader-version-3 log; or REORG … APPLY (PURGE) first for a " +
        "reader-version-1 export")
    // column-mapped tables export NATIVELY (r9): Delta's name-mode column
    // mapping is the identical mechanism — files keep physical column
    // names, the schemaString's per-field delta.columnMapping.physicalName
    // metadata carries logical→physical — so the export is still pure
    // metadata. (Rename-era commitlog maps are top-level only, matching
    // what the import side translates.)
    val colMap = m.colMapOrEmpty
    require(m.files.forall(!_.startsWith("/")),
      "snapshot references files outside the table root (clone/import " +
        "sources) — a relative Delta path cannot reach them; compact first")
    require(dvMap.values.forall(!_.startsWith("/")),
      "snapshot references deletion vectors outside the table root — " +
        "purge or compact first")
    val logDir = Paths.get(root, "_delta_log")
    require(!Files.exists(logDir),
      s"$root already carries a _delta_log")
    // DV re-encode BEFORE the log dir exists (a failed export must not
    // leave a half-valid Delta table): one descriptor per DV'd file.
    // DISTRIBUTED: every DV parquet reads in ONE Spark job; each group
    // (the positions of one DV — inherently single-file-bounded) builds
    // and writes its .bin ON THE EXECUTOR, so the driver only ever holds
    // the per-file descriptor tuples, never a position set
    val descriptors: Map[String, (String, Int, Int, Long)] =
      if (dvMap.isEmpty) Map.empty
      else {
        val s = spark.get
        import s.implicits._
        // dv parquet (absolute, normalized) → the data files it serves
        // (normally exactly one) with a driver-chosen uuid each
        val plan: Map[String, Seq[(String, String)]] =
          dvMap.toSeq.map { case (dataFile, dvFile) =>
            Paths.get(root, dvFile).toAbsolutePath.normalize.toString ->
              (dataFile, java.util.UUID.randomUUID().toString)
          }.groupMap(_._1)(_._2)
        val rootB = root
        val written = s.read
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("pos",
              org.apache.spark.sql.types.LongType))))
          .parquet(plan.keys.toSeq: _*)
          .select(org.apache.spark.sql.functions.input_file_name().as("u"),
            org.apache.spark.sql.functions.col("pos"))
          .as[(String, Long)]
          // input_file_name is a URI — decode to the on-disk path
          .map { case (u, p) =>
            (Paths.get(new java.net.URI(u).getPath)
              .normalize.toString, p) }
          .groupByKey(_._1)
          .mapGroups { (dvAbs: String, it: Iterator[(String, Long)]) =>
            val positions = it.map(_._2).toArray
            plan.getOrElse(dvAbs, sys.error(
              s"DV parquet $dvAbs not in the export plan")).map {
              case (dataFile, uuid) =>
                val (off, size) = DeltaDv.writeDvFile(
                  Paths.get(rootB, s"deletion_vector_$uuid.bin"), positions)
                (dataFile, uuid, off, size, positions.length.toLong)
            }
          }
          .collect().toSeq.flatten
        written.map { case (dataFile, uuid, off, size, card) =>
          val u = java.util.UUID.fromString(uuid)
          val bb = java.nio.ByteBuffer.allocate(16)
          bb.putLong(u.getMostSignificantBits)
          bb.putLong(u.getLeastSignificantBits)
          // sizeInBytes = the serialized payload length (== the entry's
          // length prefix), NOT the .bin file size — PROTOCOL.md; delta
          // readers assert the two agree when loading the DV
          dataFile -> (DeltaDv.z85Encode(bb.array()), off, size, card)
        }.toMap
      }
    Files.createDirectories(logDir)
    val rowsOf = m.statsOrNil.map(s => s.path -> s.rows).toMap
    val sizeOf = m.statsOrNil.map(s => s.path -> s.bytes).toMap
    def line(build: com.fasterxml.jackson.databind.node.ObjectNode => Unit)
        : String = {
      val n = mapper.createObjectNode(); build(n); mapper.writeValueAsString(n)
    }
    val encoded: String => String = p =>
      // RFC 2396 path encoding, per the protocol; '/' stays a separator
      p.split('/').map(seg =>
        java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
        .mkString("/")
    // schemaString: logical names; under column mapping every field
    // carries the physicalName + id metadata the protocol requires for
    // name mode (defaulting to its own name for never-renamed columns)
    val schemaForDelta = {
      val base = CommitLog.manifestSchema(m)
      if (colMap.isEmpty) base
      else org.apache.spark.sql.types.StructType(
        base.fields.zipWithIndex.map { case (f, i) =>
          f.copy(metadata =
            new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
              .putString("delta.columnMapping.physicalName",
                colMap.getOrElse(f.name, f.name))
              .putLong("delta.columnMapping.id", (i + 1).toLong)
              .build())
        })
    }
    val actions =
      line { n =>
        val p = n.putObject("protocol")
        if (descriptors.isEmpty && colMap.isEmpty) {
          p.put("minReaderVersion", 1); p.put("minWriterVersion", 2)
        } else if (descriptors.isEmpty) {
          // reader version 2 IS column mapping in the legacy protocol
          p.put("minReaderVersion", 2); p.put("minWriterVersion", 5)
        } else {
          // table features protocol: DVs (and colMap when present) are
          // reader features
          p.put("minReaderVersion", 3); p.put("minWriterVersion", 7)
          val rf = p.putArray("readerFeatures")
          val wf = p.putArray("writerFeatures")
          rf.add("deletionVectors"); wf.add("deletionVectors")
          if (colMap.nonEmpty) {
            rf.add("columnMapping"); wf.add("columnMapping")
          }
        }
      } +:
      line { n =>
        val md = n.putObject("metaData")
        md.put("id", java.util.UUID.randomUUID().toString)
        md.put("schemaString", schemaForDelta.json)
        md.putObject("format").put("provider", "parquet")
        md.putArray("partitionColumns")
        if (descriptors.nonEmpty || colMap.nonEmpty) {
          val cfg = md.putObject("configuration")
          if (descriptors.nonEmpty)
            cfg.put("delta.enableDeletionVectors", "true")
          if (colMap.nonEmpty) {
            cfg.put("delta.columnMapping.mode", "name")
            cfg.put("delta.columnMapping.maxColumnId",
              schemaForDelta.fields.length.toString)
          }
        }
        md.put("createdTime", m.version) // deterministic, not wall clock
      } +:
      m.files.map { f =>
        line { n =>
          val a = n.putObject("add")
          a.put("path", encoded(f)); a.put("dataChange", true)
          a.put("size", sizeOf.getOrElse(f, 0L))
          a.put("modificationTime", 0L)
          a.putObject("partitionValues")
          rowsOf.get(f).foreach(r =>
            a.put("stats", s"""{"numRecords":$r}"""))
          descriptors.get(f).foreach { case (enc, off, payloadLen, card) =>
            val dv = a.putObject("deletionVector")
            dv.put("storageType", "u")
            dv.put("pathOrInlineDv", enc)
            dv.put("offset", off)
            dv.put("sizeInBytes", payloadLen)
            dv.put("cardinality", card)
          }
        }
      }
    Files.write(logDir.resolve(f"${0L}%020d.json"),
      actions.mkString("\n").getBytes("UTF-8"))
    m.files.size
  }
}
