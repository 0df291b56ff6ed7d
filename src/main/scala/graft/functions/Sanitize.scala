package graft.functions

/** Identifier sanitization with the reference's semantics.
  *
  * Reference behavior (all in /root/reference/projects/dagster/assets/assets.py):
  *  - `fix_string` (assets.py:304-336): char-wise — `%`→`porcentaje_`,
  *    `ñ`→`n`, `Ñ`→`N`; every other special char →`_`; then collapse `__`
  *    runs to `_`.
  *  - `sanitize_db_name` (assets.py:338-344): strip non-ASCII, strip
  *    anything not `[a-zA-Z0-9_]`, truncate to 63 chars (Postgres
  *    identifier limit).
  *  - `unidecode` (assets.py:54, 235): ASCII transliteration of accented
  *    letters before sanitizing (library call in the reference; here a
  *    Latin-script transliteration table, which covers the reference's
  *    Spanish-language input domain).
  *
  * Pure driver-side string functions — applied to `StructField` names via
  * `withColumnsRenamed`, never shipped into Catalyst.
  */
object Sanitize {

  private val specialReplacements: Map[Char, String] =
    Map('%' -> "porcentaje_", 'ñ' -> "n", 'Ñ' -> "N")

  // assets.py:310-315 — note multi-char entries '--', '/*', '*/' in the
  // reference list are redundant (its loop is per-char); the per-char set:
  private val specialChars: Set[Char] =
    Set(';', '/', '*', '\'', '"', '\\', '%', '_', '<', '>', '=', '+', '-',
      '@', '#', '!', '~', '`', '|', '&', '^', '$', '?', '(', ')', '[', ']',
      '{', '}', ',', '.', ':', ' ')

  /** ≡ fix_string (assets.py:304-336). */
  def fixString(s: String): String = {
    val sb = new StringBuilder
    s.foreach { c =>
      specialReplacements.get(c) match {
        case Some(r)                       => sb.append(r)
        case None if specialChars.contains(c) => sb.append('_')
        case None                          => sb.append(c)
      }
    }
    var out = sb.toString
    while (out.contains("__")) out = out.replace("__", "_")
    out
  }

  /** ≡ sanitize_db_name (assets.py:338-344). */
  def sanitizeDbName(s: String): String = {
    val clean = s.filter(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_')
    if (clean.length > 63) clean.substring(0, 63) else clean
  }

  /** ASCII transliteration for Latin scripts (≡ unidecode on the
    * reference's Spanish-domain inputs, assets.py:8,54,235).
    */
  def unidecode(s: String): String = {
    val decomposed = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
    val noMarks = decomposed.replaceAll("\\p{M}+", "")
    // Characters NFKD doesn't decompose but unidecode maps:
    noMarks
      .replace("ß", "ss").replace("Æ", "AE").replace("æ", "ae")
      .replace("Ø", "O").replace("ø", "o").replace("Đ", "D").replace("đ", "d")
      .replace("Þ", "Th").replace("þ", "th").replace("Ð", "D").replace("ð", "d")
      .replace("Œ", "OE").replace("œ", "oe").replace("Ł", "L").replace("ł", "l")
  }

  /** Full table-name pipeline ≡ assets.py:53-56:
    * `sanitize_db_name(unidecode(file + " " + sheet).replace(" ", "_"))`.
    */
  def tableName(fileBase: String, sheet: String): String =
    sanitizeDbName(unidecode(fileBase + " " + sheet).replace(" ", "_"))
}
