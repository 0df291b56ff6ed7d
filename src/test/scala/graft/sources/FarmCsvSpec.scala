package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** FIXTURES.md §1 — farm-CSV extraction golden cases (assets.py:172-211). */
class FarmCsvSpec extends SparkTestBase {

  private val fixture = Seq(
    "12/3/2023 Venta Animales: 45 Documento salida: 778 GRANJA NORTE LOTE B",
    "4/11 Venta Documento salida: 12 Animales: 7 restos varios",
    "línea sin venta que debe ignorarse",
    "RECRIASIN",
    "9/9/2023 Venta Animales: 99 Documento salida: 1")

  test("parseLines: kept rows, dropped rows, sentinel cutoff") {
    val rows = FarmCsv.parseLines(fixture.iterator, "granja_norte").toSeq
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.fecha == "12/3/2023")
    assert(r0.n_animales == 45L && r0.Documento_salida == 778L)
    assert(r0.Extra == "GRANJA NORTE LOTE B")
    assert(r0.prefix == "g" && r0.name_farm == "granja_norte")
    val r1 = rows(1)
    assert(r1.fecha == "4/11") // date without year (assets.py:175)
    assert(r1.n_animales == 7L && r1.Documento_salida == 12L)
    assert(r1.Extra == "restos varios")
  }

  test("parseLines: one key missing → row dropped (assets.py:206)") {
    val rows = FarmCsv.parseLines(
      Iterator("1/2/2023 Venta Animales: 5 sin documento"), "f").toSeq
    assert(rows.isEmpty)
  }

  test("parseLines: no Venta+date gate → dropped (assets.py:175-179)") {
    assert(FarmCsv.parseLines(
      Iterator("Animales: 5 Documento salida: 3"), "f").isEmpty)
    // date present but no Venta
    assert(FarmCsv.parseLines(
      Iterator("1/2/2023 Animales: 5 Documento salida: 3"), "f").isEmpty)
  }

  test("read: latin-1 file through the distributed path") {
    val dir = Files.createTempDirectory("farm")
    val f = dir.resolve("Granja Ñ.csv")
    Files.write(f, fixture.mkString("\n").getBytes(StandardCharsets.ISO_8859_1))
    val ds = FarmCsv.read(spark, dir.toString)
    val rows = ds.collect().sortBy(_.fecha)
    assert(rows.length == 2)
    // fix_string: space→_, Ñ→N; sanitize_db_name keeps word chars
    assert(rows(0).name_farm == "Granja_N")
    // latin-1 'í' in the ignored line must not corrupt parsing of kept rows
    assert(rows.map(_.n_animales).toSeq.sorted == Seq(7L, 45L))
  }

  test("sentinelCutoff over a table: min-id cutoff, no sentinel → keep all") {
    import spark.implicits._
    val df = Seq((0L, "a"), (1L, "STOP here"), (2L, "b")).toDF("id", "t")
    val cut = FarmCsv.sentinelCutoff(df, "t", "id", "STOP").select("id").as[Long].collect()
    assert(cut.toSeq == Seq(0L))
    val keep = FarmCsv.sentinelCutoff(df, "t", "id", "ZZZ").count()
    assert(keep == 3L)
  }
}
