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
  * Refused loudly (exporting would corrupt): deletion vectors (a Delta-1
  * reader would resurrect dead rows), column mapping (physical names
  * would leak), and by-reference files outside the root (clone/import
  * sources — a relative path cannot reach them).
  *
  * Round-trip contract: `DeltaImport.importTable` over the exported root
  * reads back the identical snapshot ([[DeltaExportSpec]]). At 100 TB the
  * export is a driver-metadata write — KB of JSON for any table size.
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
  def exportTable(root: String, version: Option[Long] = None): Int = {
    val v = version.getOrElse(CommitLog.currentVersion(root).getOrElse(
      throw new IllegalStateException(s"no commits at $root")))
    val m = CommitLog.readManifest(root, v)
    require(m.dvsOrEmpty.isEmpty,
      "snapshot carries deletion vectors — compact first (a Delta reader " +
        "version 1 would resurrect deleted rows)")
    require(m.colMapOrEmpty.isEmpty,
      "table uses column mapping — physical file names differ from the " +
        "logical schema; materialize a rename-free copy first")
    require(m.files.forall(!_.startsWith("/")),
      "snapshot references files outside the table root (clone/import " +
        "sources) — a relative Delta path cannot reach them; compact first")
    val logDir = Paths.get(root, "_delta_log")
    require(!Files.exists(logDir),
      s"$root already carries a _delta_log")
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
    val actions =
      line { n =>
        val p = n.putObject("protocol")
        p.put("minReaderVersion", 1); p.put("minWriterVersion", 2)
      } +:
      line { n =>
        val md = n.putObject("metaData")
        md.put("id", java.util.UUID.randomUUID().toString)
        md.put("schemaString", CommitLog.manifestSchema(m).json)
        md.putObject("format").put("provider", "parquet")
        md.putArray("partitionColumns")
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
        }
      }
    Files.write(logDir.resolve(f"${0L}%020d.json"),
      actions.mkString("\n").getBytes("UTF-8"))
    m.files.size
  }
}
