package graft.sources.interop

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import graft.sources.CommitLog

/** Read-only import of a Delta Lake table into the commitlog format — the
  * in-place migration path for the most common open table format. The
  * Delta transaction-log protocol is public
  * (delta-io/delta PROTOCOL.md): the `_delta_log/` directory holds
  * ordered JSON commits (`00000000000000000000.json`, …), each a sequence
  * of single-line actions — `protocol`, `metaData` (whose `schemaString`
  * is Spark's own StructType JSON), `add {path, partitionValues, size,
  * stats?}`, `remove {path}` — optionally compacted into a parquet
  * checkpoint named by `_last_checkpoint`. The current snapshot is the
  * last-writer-wins fold of adds minus removes.
  *
  * Import semantics:
  *  - **Unpartitioned tables import ZERO-COPY**: the commitlog commit
  *    references the Delta data files by absolute path (the same
  *    mechanism SHALLOW CLONE uses), so a 100 TB Delta table imports in
  *    driver-metadata time — no byte moves. Row counts ride the adds'
  *    `stats.numRecords` when present; only files missing stats are
  *    counted by a footer-cheap scan.
  *  - **Hive-partitioned tables materialize**: Delta stores partition
  *    values in the log, NOT in the data files, while this engine stages
  *    partition columns in-file (single-valued per file, making stats
  *    pruning exact). Each partition tuple's files read back with the
  *    tuple's literals injected (cast through the declared schema), and
  *    land as one partitioned append.
  *  - **Reader version 2/3 features translate natively** (r8; the engine
  *    implements both concepts itself, so refusing them was a pure gap):
  *    `delta.columnMapping.physicalName` field metadata becomes the
  *    commitlog's own logical→physical column map (files keep physical
  *    names, reads resolve through the map — the identical mechanism);
  *    `deletionVector` descriptors decode per PROTOCOL.md (Z85 'u' paths,
  *    absolute 'p', inline 'i'; CRC-checked; RoaringBitmapArray portable
  *    bitmaps — see [[DeltaDv]]) and re-encode as commitlog DV parquet,
  *    position-for-position (`_metadata.row_index` addressing on both
  *    sides). Features this engine has no native twin for (v2Checkpoints
  *    as the checkpoint gate below, type widening, …) still REFUSE
  *    loudly — importing files a reader feature reinterprets would be
  *    silently wrong.
  */
object DeltaImport {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private final case class Snapshot(
      schema: StructType, // logical names, delta metadata stripped
      partitionCols: Seq[String], // logical names
      adds: Map[String, JsonNode], // path -> add action (last wins)
      colMap: Map[String, String]) { // logical -> physical (empty = none)
    def physOf(c: String): String = colMap.getOrElse(c, c)
  }

  /** Fold the Delta log at `deltaPath` to its current snapshot. */
  private def readLog(spark: SparkSession, deltaPath: String): Snapshot = {
    val logDir = Paths.get(deltaPath, "_delta_log")
    require(Files.isDirectory(logDir),
      s"$deltaPath has no _delta_log directory — not a Delta table")
    // checkpoint base, when one is published
    val lastCp = logDir.resolve("_last_checkpoint")
    val (cpVersion, cpAdds, cpMeta):
        (Long, Map[String, JsonNode], Option[(StructType, Seq[String])]) =
      if (!Files.isRegularFile(lastCp)) (-1L, Map.empty, None)
      else {
        val node = mapper.readTree(Files.readAllBytes(lastCp))
        val v = node.get("version").asLong()
        val cpFile = logDir.resolve(f"$v%020d.checkpoint.parquet")
        require(Files.isRegularFile(cpFile),
          s"_last_checkpoint names version $v but ${cpFile.getFileName} " +
            "is missing (multi-part/v2 checkpoints are not supported)")
        val rows = spark.read.parquet(cpFile.toString)
        rows.filter(col("protocol.minReaderVersion").isNotNull)
          .select(to_json(col("protocol")).as("j"))
          .collect().foreach(r => gateReader(mapper.readTree(r.getString(0))))
        val metas = rows
          .filter(col("metaData.schemaString").isNotNull)
          .select("metaData.schemaString", "metaData.partitionColumns")
          .collect()
        val meta = metas.lastOption.map { r =>
          (DataType.fromJson(r.getString(0)).asInstanceOf[StructType],
            r.getSeq[String](1).toSeq)
        }
        val adds = rows.filter(col("add.path").isNotNull)
          .select(to_json(col("add")).as("j"))
          .collect()
          .map { r =>
            val a = mapper.readTree(r.getString(0))
            a.get("path").asText() -> a
          }.toMap
        (v, adds, meta)
      }
    val commits = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("\\d{20}\\.json"))
      .map(n => (n.dropRight(5).toLong, n))
      .filter(_._1 > cpVersion)
      .toSeq.sortBy(_._1)
    require(cpVersion >= 0 || commits.nonEmpty,
      s"$deltaPath/_delta_log holds no commits")
    var schema: Option[StructType] = cpMeta.map(_._1)
    var partCols: Seq[String] = cpMeta.map(_._2).getOrElse(Nil)
    var adds = scala.collection.mutable.LinkedHashMap[String, JsonNode]() ++
      cpAdds
    commits.foreach { case (_, name) =>
      Files.readAllLines(logDir.resolve(name)).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          Option(node.get("protocol")).foreach(gateReader)
          Option(node.get("metaData")).foreach { m =>
            schema = Some(DataType.fromJson(m.get("schemaString").asText())
              .asInstanceOf[StructType])
            partCols = Option(m.get("partitionColumns")).toSeq
              .flatMap(_.elements().asScala.map(_.asText()))
          }
          Option(node.get("add")).foreach(a =>
            adds.put(a.get("path").asText(), a))
          Option(node.get("remove")).foreach(r =>
            adds.remove(r.get("path").asText()))
        }
    }
    val raw = schema.getOrElse(throw new IllegalArgumentException(
      s"$deltaPath log carries no metaData action"))
    // delta.columnMapping.physicalName → the engine's own logical→physical
    // map. Top-level only: the commitlog resolves nested fields by their
    // literal parquet names, so a nested mapping cannot translate.
    val PhysKey = "delta.columnMapping.physicalName"
    def nestedMapped(dt: DataType): Boolean = dt match {
      case st: StructType => st.fields.exists(f =>
        (f.metadata.contains(PhysKey) &&
          f.metadata.getString(PhysKey) != f.name) || nestedMapped(f.dataType))
      case at: org.apache.spark.sql.types.ArrayType => nestedMapped(at.elementType)
      case mt: org.apache.spark.sql.types.MapType =>
        nestedMapped(mt.keyType) || nestedMapped(mt.valueType)
      case _ => false
    }
    raw.fields.foreach(f => require(!nestedMapped(f.dataType),
      s"column '${f.name}' carries NESTED column-mapping physical names — " +
        "the commitlog maps top-level columns only; materialize with a " +
        "Delta-native reader first"))
    val colMap = raw.fields.flatMap { f =>
      if (f.metadata.contains(PhysKey) &&
          f.metadata.getString(PhysKey) != f.name)
        Some(f.name -> f.metadata.getString(PhysKey))
      else None
    }.toMap
    val clean = StructType(raw.fields.map(f =>
      org.apache.spark.sql.types.StructField(f.name, f.dataType, f.nullable)))
    Snapshot(clean, partCols, adds.toMap, colMap)
  }

  /** Reader-feature gate: version 1 is the base protocol; version 2 is
    * column mapping (translated natively); version 3 lists readerFeatures,
    * each of which must have a native translation here. Anything else is
    * REFUSED loudly — importing files a reader feature reinterprets would
    * be silently wrong (v2Checkpoint is additionally gated at the
    * single-part-checkpoint require above).
    */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "timestampNtz")

  private def gateReader(protocol: JsonNode): Unit = {
    val v = protocol.get("minReaderVersion").asInt()
    if (v <= 2) return
    require(v == 3, s"Delta reader version $v is unknown to this importer")
    require(protocol.get("readerFeatures") != null,
      "Delta reader version 3 requires a readerFeatures list " +
        "(PROTOCOL.md, Table Features) — refusing a malformed protocol")
    val feats = Option(protocol.get("readerFeatures")).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))
    val unsupported = feats.filterNot(SupportedReaderFeatures)
    require(unsupported.isEmpty,
      s"Delta table requires reader features ${unsupported.mkString(", ")} " +
        "with no native translation in this engine; importing its files " +
        "by path would be incorrect — materialize it with a Delta-native " +
        "reader first")
  }

  /** Percent-decode an add.path (the protocol stores RFC 2396-encoded
    * relative paths).
    */
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p, "UTF-8")

  /** Import the table's current snapshot into a NEW commitlog table at
    * `root`; returns the created version.
    */
  def importTable(spark: SparkSession, deltaPath: String,
      root: String): Long = {
    require(CommitLog.currentVersion(root).isEmpty,
      s"import target $root already holds a table")
    val snap = readLog(spark, deltaPath)
    require(snap.adds.nonEmpty,
      s"$deltaPath folds to an empty snapshot — nothing to import")
    if (snap.partitionCols.isEmpty) importByReference(spark, deltaPath, snap, root)
    else importMaterialized(spark, deltaPath, snap, root)
  }

  private def dvOf(a: JsonNode): Option[JsonNode] =
    Option(a.get("deletionVector")).filterNot(_.isNull)

  private def importByReference(spark: SparkSession, deltaPath: String,
      snap: Snapshot, root: String): Long = {
    val paths = snap.adds.keysIterator.toSeq.sorted.map { rel =>
      val abs = Paths.get(deltaPath, decodePath(rel)).toAbsolutePath.toString
      require(Files.isRegularFile(Paths.get(abs)),
        s"Delta add references missing file $rel")
      abs
    }
    // r9: per-file stats come off the parquet FOOTERS at import — KB per
    // file, zero data reads, scaled out as a Spark job past 192 files —
    // so the imported table prunes (and metadata-answers counts)
    // immediately, no ANALYZE scan needed. Row counts are footer-exact
    // (supersedes trusting add.stats.numRecords / counting statless
    // files). Stats key by PHYSICAL column name under column mapping,
    // exactly like native rename-era tables.
    val physSchema = StructType(snap.schema.fields.map(f =>
      f.copy(name = snap.physOf(f.name))))
    val stats = CommitLog.importFooterStats(spark, physSchema, paths,
      sidecarRoot = Some(root))
    // deletion vectors re-encode as commitlog DV parquet, position-for-
    // position (both formats address parquet row indexes); rows above
    // deliberately keep Delta's physical counts — the commitlog records
    // all-rows stats too and subtracts DVs at read/describe time.
    // DISTRIBUTED: the driver keeps only the descriptor list (one row per
    // DV'd file, straight out of the log it already holds); the bitmaps
    // decode EXECUTOR-side and flow as (file, pos) marks into
    // stageImportedDvs' partitionBy write — a heavily-churned import of
    // billions of dead positions never touches driver memory
    val dvDescs = snap.adds.toSeq.flatMap { case (rel, a) =>
      dvOf(a).map { d =>
        val abs = Paths.get(deltaPath, decodePath(rel)).toAbsolutePath.toString
        (abs, d.get("storageType").asText(), d.get("pathOrInlineDv").asText(),
          Option(d.get("offset")).map(_.asInt()).getOrElse(0),
          Option(d.get("sizeInBytes")).map(_.asInt()).getOrElse(-1),
          Option(d.get("cardinality")).map(_.asLong()).getOrElse(-1L))
      }
    }
    val dvs =
      if (dvDescs.isEmpty) Map.empty[String, String]
      else {
        import spark.implicits._
        val deltaPathB = deltaPath
        val marks = dvDescs
          .toDF("file", "st", "p", "off", "size", "card")
          .repartition(math.min(dvDescs.size,
            spark.sparkContext.defaultParallelism), col("file"))
          .as[(String, String, String, Int, Int, Long)]
          .flatMap { case (f, st, p, off, size, card) =>
            DeltaDv.decodeFields(deltaPathB, st, p, off, size, card)
              .map(pos => (f, pos))
          }
          .toDF("file", "pos")
        CommitLog.stageImportedDvs(spark, root, marks)
      }
    CommitLog.importSnapshot(root, snap.schema, stats, snap.colMap, dvs)
  }

  private def importMaterialized(spark: SparkSession, deltaPath: String,
      snap: Snapshot, root: String): Long = {
    // under column mapping the log's partitionValues are keyed by
    // PHYSICAL name (PROTOCOL.md: partition values use the physical
    // schema); data files likewise store physical column names
    val byTuple = snap.adds.toSeq.groupBy { case (_, a) =>
      snap.partitionCols.map(c =>
        Option(a.get("partitionValues").get(snap.physOf(c)))
          .filterNot(_.isNull).map(_.asText()).orNull)
    }
    val dataCols = snap.schema.fields
      .filterNot(f => snap.partitionCols.contains(f.name)).toSeq
    val physSchema = StructType(dataCols.map(f =>
      f.copy(name = snap.physOf(f.name))))
    def toLogical(df: DataFrame): DataFrame =
      if (snap.colMap.isEmpty) df
      else df.select(dataCols.map(f =>
        col(snap.physOf(f.name)).as(f.name)): _*)
    val parts = byTuple.toSeq.map { case (tuple, files) =>
      val (withDv, clean) = files.partition { case (_, a) => dvOf(a).isDefined }
      def absOf(rel: String) =
        Paths.get(deltaPath, decodePath(rel)).toAbsolutePath.toString
      val cleanDf =
        if (clean.isEmpty) None
        else Some(toLogical(spark.read.schema(physSchema)
          .parquet(clean.map(f => absOf(f._1)): _*)))
      // DV'd files materialize MINUS their dead positions: each file reads
      // alone (its DV addresses ITS row indexes) and anti-joins the
      // position set on _metadata.row_index. The bitmap decodes EXECUTOR-
      // side (one descriptor row → flatMap), so even a file with millions
      // of dead rows never lands its positions on the driver; AQE picks
      // broadcast for the (typical) small side on its own
      val dvDfs = withDv.map { case (rel, a) =>
        import spark.implicits._
        val d = dvOf(a).get
        val deltaPathB = deltaPath
        val dead = Seq((d.get("storageType").asText(),
            d.get("pathOrInlineDv").asText(),
            Option(d.get("offset")).map(_.asInt()).getOrElse(0),
            Option(d.get("sizeInBytes")).map(_.asInt()).getOrElse(-1),
            Option(d.get("cardinality")).map(_.asLong()).getOrElse(-1L)))
          .toDS()
          .flatMap { case (st, p, off, size, card) =>
            DeltaDv.decodeFields(deltaPathB, st, p, off, size, card) }
          .toDF("__imp_pos")
        toLogical(spark.read.schema(physSchema).parquet(absOf(rel))
          .withColumn("__imp_pos", col("_metadata.row_index"))
          .join(dead, Seq("__imp_pos"), "left_anti")
          .drop("__imp_pos"))
      }
      val base = (cleanDf.toSeq ++ dvDfs).reduce(_.unionByName(_))
      snap.partitionCols.zip(tuple).foldLeft(base) { case (d, (c, v)) =>
        d.withColumn(c,
          lit(v).cast(snap.schema(c).dataType))
      }.select(snap.schema.fieldNames.toIndexedSeq.map(col): _*)
    }
    val all = parts.reduce(_.unionByName(_))
    CommitLog.append(all, root, partitionBy = snap.partitionCols)
  }
}
