package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives: ONE definition of whitespace tokenization and
  * content normalization, so the operator modules (TextAnalysis, Corpus,
  * Dedup) cannot silently drift from each other — q12's dedup keys, q15's
  * shingles, and q82's uniqueness counts must all mean the same thing by
  * "token" and "normalized content". The DuckDB oracle mirrors necessarily
  * repeat the SQL text per query; the Scala side does not have to.
  */
private[operators] object Text {

  /** Whitespace tokens of the lowercased, trimmed `text` column. */
  def toksCol: Column = split(lower(trim(col("text"))), "\\s+")

  /** Normalized-content dedup key: md5 over whitespace-collapsed
    * lowercased text (q12's definition).
    */
  def contentKey: Column =
    md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
}
