package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types._
import graft.SparkTestBase

/** Builds a real .xlsx (zip + OOXML parts) in the test and drives the
  * zero-dependency reader + the full ingest path over it.
  */
class XlsxSpec extends SparkTestBase {

  private def writeXlsx(dir: Path, entries: (String, String)*): Path = {
    val f = dir.resolve("book.xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(f))
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    zos.close()
    f
  }

  private val workbook =
    """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
      | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets>
      |  <sheet name="Ventas 2020" sheetId="1" r:id="rId1"/>
      |  <sheet name="Hoja2" sheetId="2" r:id="rId2"/>
      |</sheets></workbook>""".stripMargin

  private val rels =
    """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Target="worksheets/sheet1.xml"/>
      |<Relationship Id="rId2" Target="worksheets/sheet2.xml"/>
      |</Relationships>""".stripMargin

  private val sharedStrings =
    """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<si><t>fecha alta</t></si>
      |<si><r><t>nom</t></r><r><t>bre</t></r></si>
      |<si><t>Ana</t></si>
      |</sst>""".stripMargin

  // style 0: general; style 1: builtin date numFmtId 14; style 2: custom
  // date code; style 3: custom NON-date code (decimals)
  private val styles =
    """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<numFmts count="2">
      |  <numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm:ss"/>
      |  <numFmt numFmtId="165" formatCode="0.00"/>
      |</numFmts>
      |<cellXfs count="4">
      |  <xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/><xf numFmtId="165"/>
      |</cellXfs></styleSheet>""".stripMargin

  // header: shared "fecha alta", rich-text shared "nombre", inline "n"
  // row2: date serial w/ builtin style, shared "Ana", int 7
  // row3: date serial w/ custom style, inline "Luis", float 2.5 (non-date style)
  private val sheet1 =
    """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<sheetData>
      |<row r="1">
      |  <c r="A1" t="s"><v>0</v></c>
      |  <c r="B1" t="s"><v>1</v></c>
      |  <c r="C1" t="inlineStr"><is><t>n</t></is></c>
      |</row>
      |<row r="2">
      |  <c r="A2" s="1"><v>43831</v></c>
      |  <c r="B2" t="s"><v>2</v></c>
      |  <c r="C2"><v>7</v></c>
      |</row>
      |<row r="3">
      |  <c r="A3" s="2"><v>43832.5</v></c>
      |  <c r="B3" t="inlineStr"><is><t>Luis</t></is></c>
      |  <c r="C3" s="3"><v>2.5</v></c>
      |</row>
      |</sheetData></worksheet>""".stripMargin

  // second sheet: sparse row (gap at B), boolean, trailing empty column
  private val sheet2 =
    """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<sheetData>
      |<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c><c r="B1" t="inlineStr"><is><t>flag</t></is></c></row>
      |<row r="2"><c r="A2"><v>1</v></c><c r="B2" t="b"><v>1</v></c></row>
      |<row r="3"><c r="B3" t="b"><v>0</v></c></row>
      |</sheetData></worksheet>""".stripMargin

  private def makeBook(dir: Path): Path = writeXlsx(dir,
    "xl/workbook.xml" -> workbook,
    "xl/_rels/workbook.xml.rels" -> rels,
    "xl/sharedStrings.xml" -> sharedStrings,
    "xl/styles.xml" -> styles,
    "xl/worksheets/sheet1.xml" -> sheet1,
    "xl/worksheets/sheet2.xml" -> sheet2)

  test("reads sheets, shared/rich/inline strings, date styles, sparse rows") {
    val dir = Files.createTempDirectory("xlsx")
    val sheets = Xlsx.readSheets(makeBook(dir).toString)
    assert(sheets.map(_.name) == Seq("Ventas 2020", "Hoja2"))

    val s1 = sheets.head
    assert(s1.header == Seq("fecha alta", "nombre", "n"))
    assert(s1.rows == Seq(
      Seq("2020-01-01 00:00:00", "Ana", "7"),
      Seq("2020-01-02 12:00:00", "Luis", "2.5")))

    val s2 = sheets(1)
    assert(s2.header == Seq("k", "flag"))
    assert(s2.rows == Seq(Seq("1", "True"), Seq(null, "False")))
  }

  test("writer round-trips through the reader, escaping XML and unicode") {
    val dir = Files.createTempDirectory("xlsxw")
    val sheets = Seq(
      Xlsx.Sheet("datos & más", Seq("k", "texto"),
        Seq(Seq("1", "a&b<c>"), Seq("2", "ñé"))),
      Xlsx.Sheet("otra", Seq("x"), Seq(Seq("solo"))))
    val p = dir.resolve("out.xlsx").toString
    Xlsx.write(p, sheets)
    assert(Xlsx.readSheets(p) == sheets)
  }

  test("writer emits a valid OPC package: content types, root rels, quoted names") {
    val dir = Files.createTempDirectory("xlsxw2")
    // a sheet name with quotes lands inside name="..." — attribute escaping
    val sheets = Seq(Xlsx.Sheet("""the "q" sheet""", Seq("a"), Seq(Seq("it's"))))
    val p = dir.resolve("opc.xlsx").toString
    Xlsx.write(p, sheets)
    assert(Xlsx.readSheets(p) == sheets)
    val zf = new java.util.zip.ZipFile(p)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      // the parts generic OOXML readers demand before xl/workbook.xml
      assert(names.contains("[Content_Types].xml"))
      assert(names.contains("_rels/.rels"))
      // the workbook XML stayed well-formed under the hostile name (a
      // javax parser rejects a raw quote inside the attribute)
      val wb = zf.getInputStream(zf.getEntry("xl/workbook.xml"))
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.newDocumentBuilder().parse(wb) // throws on malformed XML
    } finally zf.close()
  }

  test("sheetInfos: headers, widths, and row counts without materializing rows") {
    val dir = Files.createTempDirectory("xlsxh")
    val p = makeBook(dir).toString
    val infos = Xlsx.sheetInfos(p)
    val sheets = Xlsx.readSheets(p)
    assert(infos.map(_.name) == sheets.map(_.name))
    assert(infos.map(_.header) == sheets.map(_.header))
    assert(infos.map(_.dataRows) == sheets.map(_.rows.size.toLong))
  }

  test("streamSheet: distributed parse ≡ the local-relation parse, row for row") {
    val dir = Files.createTempDirectory("xlsxs")
    val p = makeBook(dir).toString
    val sheets = Xlsx.readSheets(p)
    Xlsx.sheetInfos(p).zip(sheets).foreach { case (info, sheet) =>
      val streamed = Xlsx.streamSheet(spark, p, info.name, info.header)
      val local = Xlsx.sheetDf(spark, sheet)
      assert(streamed.schema == local.schema)
      assert(streamed.collect().toSeq.sortBy(_.toString) ==
        local.collect().toSeq.sortBy(_.toString))
    }
  }

  test("ingest via the distributed streaming path matches the local path") {
    val landing = Files.createTempDirectory("landing-str")
    val config = Files.createTempDirectory("config-str")
    Files.createDirectories(landing.resolve("ventastream"))
    makeBook(landing.resolve("ventastream"))
    spark.conf.set("graft.xlsx.streamBytes", "1") // force every workbook to stream
    try {
      val out = IngestPipeline.ingest(spark, landing.toString, config.toString,
        consume = "keep")
      // audit row counts come from the sheetInfos width-scan, not a re-parse
      assert(out.map(t => t.table -> t.rows).toMap ==
        Map("book_Ventas_2020" -> 2L, "book_Hoja2" -> 2L))
      val t1 = spark.table("ventastream.book_Ventas_2020")
      assert(t1.schema("fechaalta").dataType == TimestampType)
      assert(t1.count() == 2)
      assert(t1.filter(t1("nombre") === "Ana").count() == 1)
      // strict mode keeps numeric/boolean-looking strings as varchar
      // (the reference's dead to_sql — SchemaInferenceSpec)
      val t2 = spark.table("ventastream.book_Hoja2")
      assert(t2.orderBy("k").collect().map(_.toSeq).toSeq ==
        Seq(Seq(null, "False"), Seq("1", "True")))
    } finally {
      spark.conf.unset("graft.xlsx.streamBytes")
      spark.sql("DROP TABLE IF EXISTS ventastream.book_Ventas_2020")
      spark.sql("DROP TABLE IF EXISTS ventastream.book_Hoja2")
    }
  }

  test("excel serial conversion: epoch, leap-bug era skipped, fractions") {
    assert(Xlsx.serialToTimestamp(43831.0) == "2020-01-01 00:00:00")
    assert(Xlsx.serialToTimestamp(43832.5) == "2020-01-02 12:00:00")
    assert(Xlsx.serialToTimestamp(61.0) == "1900-03-01 00:00:00")
  }

  test("ingest: one table per sheet, inferred timestamp column, catalog rows") {
    val landing = Files.createTempDirectory("landing")
    val config = Files.createTempDirectory("config")
    val bucket = landing.resolve("ventas")
    Files.createDirectories(bucket)
    makeBook(bucket)

    val out = IngestPipeline.ingest(spark, landing.toString, config.toString,
      consume = "keep")
    val names = out.map(t => s"${t.db}.${t.table}")
    assert(names.contains("ventas.book_Ventas_2020"))
    assert(names.contains("ventas.book_Hoja2"))

    val t1 = spark.table("ventas.book_Ventas_2020")
    // column sanitization strips the space entirely (sanitize_db_name ∘
    // unidecode, assets.py:235 — not the fix_string underscore path)
    assert(t1.schema("fechaalta").dataType == TimestampType) // regex-classified
    assert(t1.schema("nombre").dataType == StringType)
    assert(t1.count() == 2)
    assert(t1.filter(t1("nombre") === "Ana").count() == 1)
    spark.sql("DROP TABLE ventas.book_Ventas_2020")
    spark.sql("DROP TABLE ventas.book_Hoja2")
  }
}
