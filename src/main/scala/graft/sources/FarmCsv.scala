package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Sanitize

/** The reference's "farm" CSV path: raw latin-1 lines → regex extraction →
  * fixed 6-column schema (assets.py:136-218; FIXTURES.md §1).
  *
  * Semantics (assets.py:172-211):
  *  - a line containing the sentinel `RECRIASIN` terminates the FILE —
  *    everything after is ignored (assets.py:177-178);
  *  - gate: `\b\d{1,2}/\d{1,2}(?:/\d{4})?\b\s+Venta\b` must match
  *    (assets.py:175-179);
  *  - `Venta` occurrences removed; first whitespace token = `fecha`;
  *  - `Key: 123` pairs via `[A-Z][a-z]*(?: [a-z]*)*(?: *: *)\d+`; a row is
  *    kept only if both `Animales` and `Documento salida` are present
  *    (assets.py:187-206); matched pairs are removed, leftover → `Extra`.
  *
  * DELIBERATE DIVERGENCE (SURVEY.md §7 quirk register): the reference
  * appends matched values to the INSERT *positionally* — first match →
  * n_animales, second → Documento_salida, regardless of which key matched
  * (assets.py:195-205) — so `4/11 Venta Documento salida: 12 Animales: 7`
  * stores n_animales=12, Documento_salida=7 there. We assign BY KEY
  * (`Animales:` → n_animales, `Documento salida:` → Documento_salida),
  * which is the evident intent; FarmCsvSpec pins the by-key values.
  *
  * Spark shape: per-file tasks (`binaryFiles`), sequential line scan inside
  * the task — file order is the semantic (sentinel cutoff), so per-file
  * sequentiality is inherent; parallelism comes from many files, matching
  * the reference's file-at-a-time loop. The RDD hop exists only because the
  * text source has no charset option and the cutoff needs file-local line
  * order; everything downstream is DataFrame. For sentinel cutoffs over
  * *tables* (distributed, order by an explicit key) see
  * [[FarmCsv.sentinelCutoff]].
  */
object FarmCsv {

  case class FarmRow(
      name_farm: String,
      prefix: String,
      fecha: String,
      n_animales: Long,
      Documento_salida: Long,
      Extra: String)

  private val gate = """\b\d{1,2}/\d{1,2}(?:/\d{4})?\b\s+Venta\b""".r
  private val kvPattern = """[A-Z][a-z]*(?: [a-z]*)*(?: *: *)\d+""".r

  /** Pure per-file parse ≡ assets.py:172-208. Unit-tested against
    * FIXTURES.md §1 golden cases.
    */
  def parseLines(lines: Iterator[String], nameFarm: String): Iterator[FarmRow] = {
    val out = Seq.newBuilder[FarmRow]
    val it = lines
    var stop = false
    while (it.hasNext && !stop) {
      val raw = it.next().replace("\t", " ")
      if (raw.contains("RECRIASIN")) stop = true
      else if (gate.findFirstIn(raw).isDefined) {
        val noVenta = raw.replace("Venta", " ")
        val parts = noVenta.split(" ", 2)
        if (parts.length == 2) {
          val fecha = parts(0)
          var purged = parts(1)
          var animales: Option[Long] = None
          var docSalida: Option[Long] = None
          kvPattern.findAllIn(purged.trim).foreach { m =>
            val Array(clave, valor) = m.split(":", 2)
            if (clave.contains("Animales")) {
              animales = Some(valor.trim.toLong); purged = purged.replace(m, "")
            } else if (clave.contains("Documento salida")) {
              docSalida = Some(valor.trim.toLong); purged = purged.replace(m, "")
            }
          }
          for (a <- animales; d <- docSalida)
            out += FarmRow(nameFarm, nameFarm.take(1), fecha, a, d, purged.trim)
        }
      }
    }
    out.result().iterator
  }

  /** Ingest every `*.csv` under `path` (latin-1, one record per line).
    * Table name per file ≡ `sanitize_db_name(fix_string(basename))`
    * (assets.py:155).
    */
  def read(spark: SparkSession, path: String): Dataset[FarmRow] = {
    import spark.implicits._
    spark.sparkContext
      .binaryFiles(path + "/*.csv")
      .flatMap { case (file, stream) =>
        val base = file.split('/').last.stripSuffix(".csv")
        val nameFarm = Sanitize.sanitizeDbName(Sanitize.fixString(base))
        val text = new String(stream.toArray(), java.nio.charset.StandardCharsets.ISO_8859_1)
        parseLines(text.linesIterator, nameFarm)
      }
      .toDS()
  }

  /** Distributed sentinel cutoff over a table: keep rows strictly before the
    * first row (by `orderCol`) whose `textCol` contains `sentinel`
    * (≡ assets.py:177-178 generalized to tables — SURVEY.md §2a #17).
    * One min-aggregate (broadcast back as a scalar subquery), no sort.
    */
  def sentinelCutoff(df: DataFrame, textCol: String, orderCol: String, sentinel: String): DataFrame = {
    val cutoff = df
      .filter(col(textCol).contains(sentinel))
      .agg(min(col(orderCol)).as("__cut"))
    // No sentinel anywhere → min is NULL → keep every row (reference: the
    // break simply never fires).
    df.join(broadcast(cutoff), col("__cut").isNull || col(orderCol) < col("__cut"), "inner")
      .drop("__cut")
  }
}
