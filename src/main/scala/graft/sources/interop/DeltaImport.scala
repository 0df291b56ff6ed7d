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
  *  - Reader-version gate: protocol `minReaderVersion` > 1 (deletion
  *    vectors, column mapping, v2 checkpoints …) is REFUSED loudly —
  *    importing such a snapshot by path would resurrect deleted rows or
  *    misname columns.
  */
object DeltaImport {

  private val mapper = new ObjectMapper()
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  private final case class Snapshot(
      schema: StructType,
      partitionCols: Seq[String],
      adds: Map[String, JsonNode]) // path -> add action (last wins)

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
        val protos = rows.select("protocol.minReaderVersion")
          .filter(col("minReaderVersion").isNotNull)
          .collect().map(_.getInt(0))
        protos.foreach(gateReader)
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
          Option(node.get("protocol")).foreach(p =>
            gateReader(p.get("minReaderVersion").asInt()))
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
    Snapshot(
      schema.getOrElse(throw new IllegalArgumentException(
        s"$deltaPath log carries no metaData action")),
      partCols, adds.toMap)
  }

  private def gateReader(minReaderVersion: Int): Unit =
    require(minReaderVersion <= 1,
      s"Delta table requires reader version $minReaderVersion " +
        "(deletion vectors / column mapping / v2 checkpoints); importing " +
        "its files by path would be incorrect — materialize it with a " +
        "Delta-native reader first")

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

  private def importByReference(spark: SparkSession, deltaPath: String,
      snap: Snapshot, root: String): Long = {
    val stats = snap.adds.toSeq.map { case (rel, a) =>
      val abs = Paths.get(deltaPath, decodePath(rel)).toAbsolutePath.toString
      require(Files.isRegularFile(Paths.get(abs)),
        s"Delta add references missing file $rel")
      val rows = Option(a.get("stats"))
        .map(s => mapper.readTree(s.asText()))
        .flatMap(s => Option(s.get("numRecords")).map(_.asLong()))
        .getOrElse(spark.read.parquet(abs).count())
      CommitLog.FileStat(abs, rows, Files.size(Paths.get(abs)))
    }
    CommitLog.importSnapshot(root, snap.schema, stats)
  }

  private def importMaterialized(spark: SparkSession, deltaPath: String,
      snap: Snapshot, root: String): Long = {
    val byTuple = snap.adds.toSeq.groupBy { case (_, a) =>
      snap.partitionCols.map(c =>
        Option(a.get("partitionValues").get(c)).filterNot(_.isNull)
          .map(_.asText()).orNull)
    }
    val dataCols = snap.schema.fields
      .filterNot(f => snap.partitionCols.contains(f.name))
    val parts = byTuple.toSeq.map { case (tuple, files) =>
      val paths = files.map { case (rel, _) =>
        Paths.get(deltaPath, decodePath(rel)).toAbsolutePath.toString }
      val base = spark.read
        .schema(StructType(dataCols))
        .parquet(paths: _*)
      snap.partitionCols.zip(tuple).foldLeft(base) { case (d, (c, v)) =>
        d.withColumn(c,
          lit(v).cast(snap.schema(c).dataType))
      }.select(snap.schema.fieldNames.toIndexedSeq.map(col): _*)
    }
    val all = parts.reduce(_.unionByName(_))
    CommitLog.append(all, root, partitionBy = snap.partitionCols)
  }
}
