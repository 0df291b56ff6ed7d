package graft.sources

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import scala.util.Try
import scala.xml.{Elem, XML}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Minimal XLSX reader — the one genuinely new I/O component of the build
  * (SURVEY.md §7 hard-part 1: zero-egress, so no spark-excel/POI jar; an
  * .xlsx is just a zip of small XML parts).
  *
  * Reproduces the semantics of the reference's Excel ingestion
  * (assets.py:43-64, 220-250 via pandas/openpyxl): every sheet of a workbook
  * is one candidate table, the first row is the header, and every cell is
  * STRINGIFIED — downstream schema inference re-types the strings
  * ([[SchemaInference]]).
  *
  * Supported parts:
  *  - `xl/workbook.xml` + `xl/_rels/workbook.xml.rels`: sheet names in
  *    workbook order resolved to their worksheet parts;
  *  - `xl/sharedStrings.xml`: shared-string cells (rich-text runs are
  *    concatenated, like openpyxl/pandas);
  *  - `xl/styles.xml`: cells styled with a DATE/TIME number format (builtin
  *    ids 14-22 and 45-47, or a custom format containing y/m/d/h/s codes)
  *    render their Excel serial as `yyyy-MM-dd HH:mm:ss` — the shape the
  *    reference's timestamp regex classifies (assets.py:296-298), matching
  *    pandas' datetime stringification;
  *  - cell types `s` (shared), `inlineStr`, `str` (formula result), `b`
  *    (boolean → "True"/"False", the pandas rendering), `e` (error), and
  *    numeric (rendered with a trailing `.0` for integral floats — pandas
  *    `str(float)` parity — unless the cell is a plain untyped integer).
  *
  * Scale note: one workbook parses on one executor core (a zip is not
  * splittable and landing xlsx files are human-authored, i.e. small);
  * corpus-level parallelism comes from MANY files, exactly like the
  * reference's file-at-a-time loop. Bulk machine-generated data arrives via
  * the CSV/JSON/Parquet paths instead.
  */
object Xlsx {

  final case class Sheet(name: String, header: Seq[String], rows: Seq[Seq[String]])

  private val excelEpoch = LocalDateTime.of(1899, 12, 30, 0, 0, 0)
  private val tsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  /** Builtin date/time numFmtIds per ECMA-376 §18.8.30. */
  private val builtinDateFmts: Set[Int] = ((14 to 22) ++ (45 to 47)).toSet

  private def isDateFormatCode(code: String): Boolean = {
    // strip quoted literals and color/locale brackets, then look for
    // date/time tokens; formats like "0.00" or "#,##0" must NOT match.
    val stripped = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
    stripped.exists(c => "ymdhs".contains(c.toLower)) &&
      !stripped.exists(c => "#?0".contains(c))
  }

  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((a, c) => a * 26 + (c.toUpper - 'A' + 1)) - 1
  }

  /** Excel serial day → "yyyy-MM-dd HH:mm:ss" (rounded to the second —
    * Timestamp(0) parity with the inferred type, assets.py:299).
    */
  private[sources] def serialToTimestamp(serial: Double): String = {
    val seconds = math.round(serial * 86400.0)
    excelEpoch.plusSeconds(seconds).format(tsFmt)
  }

  /** Numeric cell text → pandas-style stringification: integral floats get
    * a trailing ".0" only when the raw text is float-shaped; plain integer
    * text stays integral.
    */
  private def renderNumber(raw: String): String =
    if (raw.contains('.') || raw.toLowerCase.contains('e'))
      Try(raw.toDouble).map(_.toString).getOrElse(raw)
    else raw

  /** The small zip parts of one workbook, parsed once per open. */
  private final case class WorkbookParts(
      shared: IndexedSeq[String],
      dateStyles: Set[Int],
      targets: Seq[(String, String)]) // sheet name → zip entry name

  private def loadParts(zip: java.util.zip.ZipFile, path: String): WorkbookParts = {
    def part(name: String): Option[Elem] =
      Option(zip.getEntry(name)).map(e => XML.load(zip.getInputStream(e)))

    val shared: IndexedSeq[String] = part("xl/sharedStrings.xml")
      .map(sst => (sst \ "si").map(si => (si \\ "t").map(_.text).mkString).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)

    // style index → is-date? via cellXfs numFmtId + custom numFmts
    val dateStyles: Set[Int] = part("xl/styles.xml").map { styles =>
      val customDateIds = (styles \ "numFmts" \ "numFmt")
        .filter(n => isDateFormatCode((n \@ "formatCode")))
        .map(n => (n \@ "numFmtId").toInt).toSet
      (styles \ "cellXfs" \ "xf").zipWithIndex.collect {
        case (xf, i) if {
          val id = Try((xf \@ "numFmtId").toInt).getOrElse(0)
          builtinDateFmts(id) || customDateIds(id)
        } => i
      }.toSet
    }.getOrElse(Set.empty)

    val wb = part("xl/workbook.xml")
      .getOrElse(throw new IllegalArgumentException(s"$path: no xl/workbook.xml"))
    val rels = part("xl/_rels/workbook.xml.rels")
      .map(r => (r \ "Relationship").map(n => (n \@ "Id") -> (n \@ "Target")).toMap)
      .getOrElse(Map.empty)

    val targets = (wb \ "sheets" \ "sheet").toSeq.map { sh =>
      val name = sh \@ "name"
      val rid = sh.attributes.collectFirst {
        case a if a.key == "id" && a.prefixedKey.startsWith("r:") => a.value.text
      }.getOrElse(sh \@ "id")
      val target = rels.getOrElse(rid, s"worksheets/sheet${sh \@ "sheetId"}.xml")
      name -> (if (target.startsWith("/")) target.drop(1) else s"xl/$target")
    }
    WorkbookParts(shared, dateStyles, targets)
  }

  /** Parse every sheet of a workbook. Pure JVM (driver or executor). */
  def readSheets(path: String): Seq[Sheet] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val parts = loadParts(zip, path)
      parts.targets.flatMap { case (name, full) =>
        Option(zip.getEntry(full)).map { entry =>
          // Worksheets are the one potentially-large part — parse them with
          // streaming StAX instead of a scala-xml DOM (~10× less time and
          // garbage on a 10k-row sheet; semantics identical to the DOM
          // traversal this replaces). The small parts above stay DOM.
          val cellRows = parseSheetData(zip.getInputStream(entry),
            parts.shared, parts.dateStyles)
          val width = (cellRows.map(r => if (r.isEmpty) 0 else r.keys.max + 1) :+ 0).max
          val dense = cellRows.map(r => (0 until width).map(i => r.get(i).orNull))
          val header = dense.headOption.getOrElse(Seq.empty).zipWithIndex
            .map { case (h, i) => Option(h).filter(_.nonEmpty).getOrElse(s"unnamed_$i") }
          Sheet(name, header, dense.drop(1))
        }
      }
    } finally zip.close()
  }

  /** Per-sheet metadata discovered WITHOUT materializing rows: the header
    * (padded to the sheet's max row width with `unnamed_i` — exactly
    * [[readSheets]]' rule) and the data-row count.
    */
  final case class SheetInfo(name: String, header: Seq[String], dataRows: Long)

  /** Metadata for every sheet via one streaming width-scan per sheet — the
    * driver-side schema discovery for [[streamSheet]]. Rows are parsed but
    * never retained, so memory stays O(header) on arbitrarily tall sheets;
    * the row count rides along for free and spares the ingest audit a
    * second full parse.
    */
  def sheetInfos(path: String): Seq[SheetInfo] = {
    val zip = new java.util.zip.ZipFile(path)
    try {
      val parts = loadParts(zip, path)
      parts.targets.flatMap { case (name, full) =>
        Option(zip.getEntry(full)).map { entry =>
          val it = new RowIterator(zip.getInputStream(entry),
            parts.shared, parts.dateStyles)
          try {
            val first = if (it.hasNext) it.next() else Map.empty[Int, String]
            var width = if (first.isEmpty) 0 else first.keys.max + 1
            var dataRows = 0L
            while (it.hasNext) {
              val r = it.next()
              dataRows += 1
              if (r.nonEmpty) width = math.max(width, r.keys.max + 1)
            }
            val header = (0 until width).map(i =>
              first.get(i).filter(_.nonEmpty).getOrElse(s"unnamed_$i"))
            SheetInfo(name, header, dataRows)
          } finally it.close()
        }
      }
    } finally zip.close()
  }

  /** One sheet as a DISTRIBUTED all-string DataFrame: the workbook opens on
    * an EXECUTOR (one task per sheet — the binaryFiles-shaped path) and rows
    * stream from the StAX cursor straight into the scan, never materializing
    * a per-sheet list anywhere. This is the scale path for machine-generated
    * workbooks: a landing zone of many (file, sheet) pairs parses with
    * cluster-wide parallelism, memory stays O(1) per task, and an
    * early-stopping consumer (schema inference's first-rows probe) stops the
    * parse mid-sheet. `header` comes from [[sheetInfos]].
    */
  def streamSheet(spark: SparkSession, path: String, sheetName: String,
      header: Seq[String]): DataFrame = {
    val w = header.size
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    val rdd = spark.sparkContext.parallelize(Seq(sheetName), 1).flatMap { name =>
      val zip = new java.util.zip.ZipFile(path)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ =>
          try zip.close() catch { case _: Exception => () }))
      val parts = loadParts(zip, path)
      val full = parts.targets.collectFirst { case (n, t) if n == name => t }
        .getOrElse(throw new IllegalArgumentException(s"no sheet '$name' in $path"))
      val entry = Option(zip.getEntry(full))
        .getOrElse(throw new IllegalArgumentException(s"no part '$full' in $path"))
      val it = new RowIterator(zip.getInputStream(entry), parts.shared, parts.dateStyles)
      it.drop(1) // header row
        .map(m => Row.fromSeq((0 until w).map(i => m.get(i).orNull)))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Streaming parse of one worksheet's `sheetData`: one `Map[col → text]`
    * per row. Cell semantics mirror the reference's openpyxl rendering
    * exactly as the previous DOM implementation did: shared strings,
    * inline rich-text runs concatenated, booleans as True/False, date-styled
    * serials as timestamps, numbers pandas-stringified.
    */
  private def parseSheetData(
      in: java.io.InputStream,
      shared: IndexedSeq[String],
      dateStyles: Set[Int]): Seq[Map[Int, String]] = {
    val it = new RowIterator(in, shared, dateStyles)
    try it.toVector finally it.close()
  }

  /** Lazy StAX cursor over one worksheet's `sheetData`: yields one
    * `Map[col → text]` per `<row>` as the XML is read, so consumers decide
    * how much to materialize — [[parseSheetData]] takes everything,
    * [[sheetInfos]] keeps only the first row, and [[streamSheet]] pipes
    * rows straight into a Spark scan without ever holding a sheet in memory.
    * Cell rendering is the openpyxl-parity rule set documented on
    * [[parseSheetData]]. Closes the underlying reader on exhaustion;
    * `close()` is for early abandonment.
    */
  private final class RowIterator(
      in: java.io.InputStream,
      shared: IndexedSeq[String],
      dateStyles: Set[Int]) extends Iterator[Map[Int, String]] {
    import javax.xml.stream.XMLStreamConstants._
    private val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    // entity/DTD hardening for untrusted zip parts
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    private val r = f.createXMLStreamReader(in)
    private var pending: Map[Int, String] = null
    private var closed = false

    def close(): Unit = if (!closed) {
      closed = true
      try r.close() finally in.close()
    }

    // Parse forward until the next </row> completes. A row's cell state is
    // fully contained between <row> and </row>, so it lives in locals here.
    private def advance(): Unit = {
      var cur = Map.newBuilder[Int, String]
      var next = 0
      var ref = ""; var typ = ""; var style = -1
      val vBuf = new StringBuilder; val isBuf = new StringBuilder
      var inV = false; var inIs = false; var inIsT = false
      while (pending == null && !closed && r.hasNext) {
        r.next() match {
          case START_ELEMENT => r.getLocalName match {
            case "row" => cur = Map.newBuilder; next = 0
            case "c" =>
              ref = Option(r.getAttributeValue(null, "r")).getOrElse("")
              typ = Option(r.getAttributeValue(null, "t")).getOrElse("")
              style = Try(r.getAttributeValue(null, "s").toInt).getOrElse(-1)
              vBuf.clear(); isBuf.clear()
            case "v" => inV = true
            case "is" => inIs = true
            case "t" if inIs => inIsT = true
            case _ => ()
          }
          case CHARACTERS | CDATA =>
            if (inV) vBuf.append(r.getText)
            else if (inIsT) isBuf.append(r.getText)
          case END_ELEMENT => r.getLocalName match {
            case "v" => inV = false
            case "t" if inIs => inIsT = false
            case "is" => inIs = false
            case "c" =>
              val i = if (ref.nonEmpty) colIndex(ref) else next
              next = i + 1
              val v = vBuf.toString
              val text = typ match {
                case "s"         => Try(shared(v.toInt)).getOrElse("")
                case "inlineStr" => isBuf.toString
                case "str" | "e" => v
                case "b"         => if (v.trim == "1") "True" else "False"
                case _ => // numeric (or untyped)
                  if (v.isEmpty) ""
                  else if (dateStyles(style))
                    Try(serialToTimestamp(v.toDouble)).getOrElse(renderNumber(v))
                  else renderNumber(v)
              }
              if (text.nonEmpty) cur += i -> text
            case "row" => pending = cur.result()
            case _ => ()
          }
          case _ => ()
        }
      }
      if (pending == null) close()
    }

    def hasNext: Boolean = {
      if (pending == null && !closed) advance()
      pending != null
    }

    def next(): Map[Int, String] = {
      if (!hasNext) throw new NoSuchElementException("end of sheetData")
      val row = pending
      pending = null
      row
    }
  }

  /** Minimal XLSX writer — the reader's export twin (inline-string cells
    * only; schema re-typing happens on read via [[SchemaInference]], so
    * strings are the faithful landing format). Used by the ingest benchmark
    * to synthesize realistic workbook sources, and by tests.
    */
  def write(path: String, sheets: Seq[Sheet]): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    // Escapes for BOTH text and attribute contexts (sheet names land inside
    // name="..." — an unescaped quote there is malformed XML).
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace("\"", "&quot;").replace("'", "&apos;")
    def sheetXml(sh: Sheet): String = {
      val rows = (sh.header +: sh.rows).zipWithIndex.map { case (cells, i) =>
        cells.map(c =>
          s"""<c t="inlineStr"><is><t>${esc(Option(c).getOrElse(""))}</t></is></c>""")
          .mkString(s"""<row r="${i + 1}">""", "", "</row>")
      }.mkString
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        s"<sheetData>$rows</sheetData></worksheet>"
    }
    val wb = sheets.zipWithIndex.map { case (sh, i) =>
      s"""<sheet name="${esc(sh.name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString(
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"""" +
        """ xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        "<sheets>", "", "</sheets></workbook>")
    val relType = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    val rels = sheets.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="$relType/worksheet"""" +
        s""" Target="worksheets/sheet${i + 1}.xml"/>""")
      .mkString(
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""",
        "", "</Relationships>")
    // The OPC package parts generic OOXML readers (openpyxl, Excel) require
    // before they will even look at xl/workbook.xml.
    val contentTypes =
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml"""" +
            """ ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        "</Types>"
    val rootRels =
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        s"""<Relationship Id="rId1" Type="$relType/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"
    val zos = new ZipOutputStream(java.nio.file.Files.newOutputStream(
      java.nio.file.Paths.get(path)))
    try {
      def put(name: String, content: String): Unit = {
        zos.putNextEntry(new ZipEntry(name))
        zos.write(content.getBytes("UTF-8"))
        zos.closeEntry()
      }
      put("[Content_Types].xml", contentTypes)
      put("_rels/.rels", rootRels)
      put("xl/workbook.xml", wb)
      put("xl/_rels/workbook.xml.rels", rels)
      sheets.zipWithIndex.foreach { case (sh, i) =>
        put(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(sh))
      }
    } finally zos.close()
  }

  /** One sheet → an all-string DataFrame (header row = column names), the
    * exact input shape [[SchemaInference.infer]]/`coerce` expect.
    */
  def sheetDf(spark: SparkSession, sheet: Sheet): DataFrame = {
    val schema = StructType(sheet.header.map(StructField(_, StringType, nullable = true)))
    val rows = sheet.rows.map { r =>
      Row.fromSeq((0 until sheet.header.size).map(i => if (i < r.size) r(i) else null))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
  }
}
