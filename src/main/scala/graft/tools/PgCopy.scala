package graft.tools

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{BooleanType, StringType, StructField, StructType}

import graft.sources.CommitLog

/** The pg COPY sub-protocol for [[PgWire]] — `COPY … TO STDOUT` and
  * `COPY … FROM STDIN`, the path psql's `\copy` and every pg bulk tool
  * ride against the reference's Postgres endpoint (reference
  * `README.md:74-76`). Message flow per the published protocol
  * documentation ("COPY Operations"): the server answers the statement
  * with CopyOutResponse (`H`) / CopyInResponse (`G`), rows travel as
  * CopyData (`d`) frames, CopyDone (`c`) ends the stream, CopyFail
  * (`f`) aborts it, and CommandComplete carries `COPY <n>`.
  *
  * Formats: pg's TEXT format (tab delimiter, `\N` null, backslash
  * escapes) and CSV (RFC-style quoting; unquoted empty = NULL, quoted
  * empty = empty string; optional HEADER), selected by the statement's
  * `WITH (FORMAT csv, HEADER, DELIMITER '…')` options (legacy bare
  * `WITH CSV HEADER` spellings accepted too). Unsupported options are
  * refused loudly — never half-honored.
  *
  * Semantics:
  *   - **COPY OUT** streams the table/query through `toLocalIterator`
  *     — one partition of driver memory at a time, the same streaming
  *     discipline as every other result path; rows render with the
  *     wire's own [[PgWire.render]] so a value that SELECTs as `x`
  *     copies as `x`.
  *   - **COPY IN** accumulates the client's frames, parses them against
  *     the target's declared schema (Spark casts do the typing, so
  *     `COPY`ing back what `COPY TO` emitted round-trips), and lands
  *     them as ONE atomic commit — [[CommitLog.append]] in autocommit,
  *     or staged into the open [[PgTxn]] block so COPY participates in
  *     BEGIN/COMMIT like any INSERT. A parse error or CopyFail commits
  *     nothing (the stream is drained first, per the protocol's
  *     error-recovery contract).
  *
  * Scale note: COPY IN is inherently single-socket — the bytes arrive
  * through one connection, so a driver-side parse is not a scale
  * regression; cluster-width ingest is the file/streaming ingest
  * surface's job. COPY OUT streams and never materializes the result.
  */
object PgCopy {

  /** True when the statement is a COPY the wire must intercept (COPY
    * never reaches Spark's parser).
    */
  def isCopy(sql: String): Boolean =
    sql.trim.regionMatches(true, 0, "COPY", 0, 4) &&
      sql.trim.length > 4 && Character.isWhitespace(sql.trim.charAt(4))

  private val ToRe =
    """(?is)^\s*COPY\s+(.+?)\s+TO\s+STDOUT\s*(.*)$""".r
  private val FromRe =
    """(?is)^\s*COPY\s+(.+?)\s+FROM\s+STDIN\s*(.*)$""".r

  private final case class Opts(csv: Boolean, header: Boolean,
      delim: Char, nullToken: String)

  /** Parse the options tail: `WITH (FORMAT csv, HEADER, DELIMITER ',',
    * NULL '…')`, or the legacy bare `WITH CSV HEADER` words.
    */
  private def parseOpts(tail0: String): Opts = {
    var csv = false; var header = false
    var delim: Option[Char] = None; var nullTok: Option[String] = None
    val tail = tail0.trim.replaceAll("(?i)^WITH\\b", "").trim
    if (tail.isEmpty) ()
    else if (tail.startsWith("(")) {
      val inner = tail.stripPrefix("(").stripSuffix(")")
      // split on commas OUTSIDE single quotes
      val parts = Seq.newBuilder[String]
      val cur = new java.lang.StringBuilder(); var q = false
      inner.foreach { c =>
        if (c == '\'') { q = !q; cur.append(c) }
        else if (c == ',' && !q) { parts += cur.toString; cur.setLength(0) }
        else cur.append(c)
      }
      parts += cur.toString
      parts.result().map(_.trim).filter(_.nonEmpty).foreach { p =>
        val sp = p.split("\\s+", 2)
        val key = sp(0).toUpperCase(java.util.Locale.ROOT)
        val value = if (sp.length > 1) unquote(sp(1).trim) else ""
        key match {
          case "FORMAT" => value.toLowerCase(java.util.Locale.ROOT) match {
            case "csv" => csv = true
            case "text" => csv = false
            case other => throw new UnsupportedOperationException(
              s"COPY FORMAT $other is not supported (text, csv)")
          }
          case "HEADER" =>
            header = value.isEmpty ||
              value.equalsIgnoreCase("true") || value.equalsIgnoreCase("on")
          case "DELIMITER" =>
            require(value.length == 1, "COPY DELIMITER must be one character")
            delim = Some(value.charAt(0))
          case "NULL" => nullTok = Some(value)
          case other => throw new UnsupportedOperationException(
            s"COPY option $other is not supported " +
              "(FORMAT, HEADER, DELIMITER, NULL)")
        }
      }
    } else {
      // legacy word list: CSV, HEADER, DELIMITER 'x', NULL 'x'
      val toks = tail.split("\\s+").toSeq
      var i = 0
      while (i < toks.length) {
        toks(i).toUpperCase(java.util.Locale.ROOT) match {
          case "CSV" => csv = true
          case "HEADER" => header = true
          case "DELIMITER" =>
            i += 1; delim = Some(unquote(toks(i)).charAt(0))
          case "NULL" => i += 1; nullTok = Some(unquote(toks(i)))
          case "" =>
          case other => throw new UnsupportedOperationException(
            s"COPY option $other is not supported")
        }
        i += 1
      }
    }
    Opts(csv, header && csv,
      delim.getOrElse(if (csv) ',' else '\t'),
      nullTok.getOrElse(if (csv) "" else "\\N"))
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && t.head == '\'' && t.last == '\'')
      t.substring(1, t.length - 1).replace("''", "'")
    else t
  }

  /** The COPY source/target spelling: a table name with an optional
    * column list, or a parenthesized query (TO only).
    */
  private def sourceFrame(session: SparkSession, spec0: String,
      prepare: String => String): DataFrame = {
    val spec = spec0.trim
    if (spec.startsWith("("))
      session.sql(prepare(spec.stripPrefix("(").stripSuffix(")")))
    else {
      val (name, cols) = splitNameCols(spec)
      val t = session.table(name)
      if (cols.isEmpty) t
      else t.select(cols.map(c => col(s"`${c.replace("`", "``")}`")): _*)
    }
  }

  /** `t` / `t (a, b)` / `"Weird Name" (a)` → (spark-quoted name, cols). */
  private def splitNameCols(spec: String): (String, Seq[String]) = {
    val p = spec.indexOf('(')
    val rawName = (if (p < 0) spec else spec.substring(0, p)).trim
    val cols =
      if (p < 0) Nil
      else spec.substring(p + 1, spec.lastIndexOf(')')).split(",")
        .map(c => stripIdentQuotes(c.trim)).filter(_.nonEmpty).toSeq
    // pg double-quoted identifiers → Spark backticks; bare names pass
    val name = rawName.split("\\.").map(stripIdentQuotes).map(part =>
      if (part.matches("[A-Za-z0-9_]+")) part
      else s"`${part.replace("`", "``")}`").mkString(".")
    (name, cols)
  }

  private def stripIdentQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '"' && t.last == '"')
      t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t
  }

  // --------------------------------------------------------------- OUT

  /** pg TEXT-format field escaping (the documented COPY text rules). */
  private[tools] def escapeText(v: String, delim: Char): String = {
    val sb = new java.lang.StringBuilder(v.length)
    v.foreach {
      case '\\' => sb.append("\\\\")
      case '\t' if delim == '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case c if c == delim => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.toString
  }

  private[tools] def unescapeText(v: String): String = {
    val sb = new java.lang.StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        i += 1
        v.charAt(i) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case 'r' => sb.append('\r')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'v' => sb.append('\u000b')
          case o => sb.append(o) // \\ and \<delim> both land here
        }
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private[tools] def csvField(v: String, delim: Char): String =
    csvField(v, delim, "")

  /** A non-null value that HAPPENS to equal the NULL token must quote
    * (pg's COPY TO does the same force-quoting) — quoted fields are
    * never NULL on the way back in.
    */
  private[tools] def csvField(v: String, delim: Char, nullToken: String): String =
    if (v.isEmpty) "\"\"" // quoted empty ≠ unquoted empty (= NULL)
    else if (v == nullToken ||
        v.exists(c => c == delim || c == '"' || c == '\n' || c == '\r'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** Split one TEXT-format line into raw (still-escaped) fields. The
    * delimiter is matched literally and a backslash escapes the next
    * character, so `\<delim>` inside field data never splits mid-field
    * and a regex-meta delimiter like `|` or `.` is safe (r12 advice:
    * `String.split` treated the delimiter as a regex).
    */
  private[tools] def splitText(line: String, delim: Char): Seq[String] = {
    val fields = Seq.newBuilder[String]
    val cur = new java.lang.StringBuilder()
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '\\' && i + 1 < line.length) {
        cur.append(c).append(line.charAt(i + 1)); i += 1
      } else if (c == delim) { fields += cur.toString; cur.setLength(0) }
      else cur.append(c)
      i += 1
    }
    fields += cur.toString
    fields.result()
  }

  /** Split one CSV payload into rows×fields (quotes may span lines).
    * A field is NULL (None) when it is UNQUOTED and equals `nullToken`
    * (pg's CSV rule — default token is the empty string, so unquoted
    * empty = NULL); quoted fields are never NULL.
    */
  private[tools] def parseCsv(data: String, delim: Char)
      : Seq[Seq[Option[String]]] = parseCsv(data, delim, "")

  private[tools] def parseCsv(data: String, delim: Char, nullToken: String)
      : Seq[Seq[Option[String]]] = {
    val rows = Seq.newBuilder[Seq[Option[String]]]
    var fields = Seq.newBuilder[Option[String]]
    val cur = new java.lang.StringBuilder()
    var quoted = false   // inside "…"
    var wasQuoted = false // current field had quotes (affects NULL-ness)
    var any = false      // current row has content
    def endField(): Unit = {
      fields += (if (!wasQuoted && cur.toString == nullToken) None
                 else Some(cur.toString))
      cur.setLength(0); wasQuoted = false
    }
    def endRow(): Unit = { endField(); rows += fields.result(); fields = Seq.newBuilder; any = false }
    var i = 0
    while (i < data.length) {
      val c = data.charAt(i)
      if (quoted) {
        if (c == '"') {
          if (i + 1 < data.length && data.charAt(i + 1) == '"') {
            cur.append('"'); i += 1
          } else quoted = false
        } else cur.append(c)
      } else c match {
        case '"' => quoted = true; wasQuoted = true; any = true
        case `delim` => endField(); any = true
        case '\r' => // swallow; \n ends the row
        case '\n' => if (any || cur.length > 0 || wasQuoted) endRow()
        case other => cur.append(other); any = true
      }
      i += 1
    }
    if (any || cur.length > 0 || wasQuoted) endRow()
    rows.result()
  }

  // ------------------------------------------------------------ handler

  /** Run one COPY statement on the simple-query path. Throws to the
    * caller's generic error path AFTER the sub-protocol is in a clean
    * state (COPY IN drains the client's frames before erroring, per the
    * protocol's recovery contract).
    */
  def handle(session: SparkSession, in: DataInputStream,
      out: DataOutputStream, sql: String, txn: PgTxn,
      prepare: String => String): Unit = {
    txn.guard()
    sql match {
      case ToRe(src, optTail) => copyOut(session, out, src, parseOpts(optTail), prepare)
      case FromRe(dst, optTail) => copyIn(session, in, out, dst, parseOpts(optTail), txn)
      case _ => throw new UnsupportedOperationException(
        "COPY supports `COPY <table|(query)> TO STDOUT [WITH (…)]` and " +
          "`COPY <table> [(cols)] FROM STDIN [WITH (…)]`")
    }
  }

  private def msg(out: DataOutputStream, t: Char, body: Array[Byte]): Unit = {
    out.writeByte(t); out.writeInt(body.length + 4); out.write(body)
  }

  private def copyOut(session: SparkSession, out: DataOutputStream,
      src: String, o: Opts, prepare: String => String): Unit = {
    val df = sourceFrame(session, src, prepare)
    val schema = df.schema
    // CopyOutResponse: i8 overall format (0 = textual), i16 ncols, per-col i16
    val h = new ByteArrayOutputStream()
    h.write(0); h.write(schema.length >>> 8); h.write(schema.length & 0xff)
    schema.foreach { _ => h.write(0); h.write(0) }
    msg(out, 'H', h.toByteArray)
    var n = 0L
    if (o.header) {
      val line = schema.fieldNames.map(csvField(_, o.delim))
        .mkString(o.delim.toString) + "\n"
      msg(out, 'd', line.getBytes(UTF_8))
    }
    val it = df.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val line = renderRow(row, schema, o)
      msg(out, 'd', line.getBytes(UTF_8))
      n += 1
      if (n % 256 == 0) out.flush()
    }
    msg(out, 'c', Array.emptyByteArray) // CopyDone
    val t = new ByteArrayOutputStream()
    t.write(s"COPY $n".getBytes(UTF_8)); t.write(0)
    msg(out, 'C', t.toByteArray)
  }

  private def renderRow(row: Row, schema: StructType, o: Opts): String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < schema.length) {
      if (i > 0) sb.append(o.delim)
      if (row.isNullAt(i)) sb.append(o.nullToken)
      else {
        val s = PgWire.render(row.get(i))
        sb.append(if (o.csv) csvField(s, o.delim, o.nullToken)
                  else escapeText(s, o.delim))
      }
      i += 1
    }
    sb.append('\n')
    sb.toString
  }

  private def copyIn(session: SparkSession, in: DataInputStream,
      out: DataOutputStream, dst: String, o: Opts, txn: PgTxn): Unit = {
    val (name, cols) = splitNameCols(dst)
    // resolve + schema BEFORE answering CopyInResponse: an unknown table
    // errors without entering copy mode (pg's own behavior)
    val resolved = txn.resolveTable(name)
    // CopyInResponse — same layout as CopyOutResponse
    val ncols = resolved.map(_._2.length).getOrElse(math.max(cols.size, 1))
    val h = new ByteArrayOutputStream()
    h.write(0); h.write(ncols >>> 8); h.write(ncols & 0xff)
    (0 until ncols).foreach { _ => h.write(0); h.write(0) }
    msg(out, 'G', h.toByteArray)
    out.flush()
    // drain the sub-protocol COMPLETELY before any failure surfaces
    val buf = new ByteArrayOutputStream()
    var done = false
    var failMsg: Option[String] = None
    while (!done) {
      val t = in.readByte().toChar
      val len = in.readInt()
      require(len >= 4 && len <= (64 << 20), s"copy frame length $len out of range")
      val body = new Array[Byte](len - 4); in.readFully(body)
      t match {
        case 'd' => buf.write(body)
        case 'c' => done = true
        case 'f' =>
          val e = body.indexOf(0.toByte)
          failMsg = Some(new String(body, 0, if (e < 0) body.length else e, UTF_8))
          done = true
        case 'H' | 'S' => // Flush/Sync mid-copy: ignore (per protocol)
        case other =>
          throw new IllegalArgumentException(
            s"unexpected message '$other' during COPY FROM STDIN")
      }
    }
    failMsg.foreach(m => throw new IllegalArgumentException(s"COPY failed: $m"))
    val (root, schema) = resolved.getOrElse(
      throw new UnsupportedOperationException(
        s"$name is not a commitlog table — COPY FROM targets commitlog " +
          "tables (one atomic commit per COPY)"))
    val data = new String(buf.toByteArray, UTF_8)
    val cells: Seq[Seq[Option[String]]] =
      if (o.csv) {
        val all = parseCsv(data, o.delim, o.nullToken)
        if (o.header) all.drop(1) else all
      } else {
        // keep interior empty lines — a single-text-column row holding
        // '' emits one (review finding r13: filtering them lost rows on
        // a COPY TO → FROM round trip); only the artifact after the
        // final newline drops
        val lines0 = data.split("\n", -1).toSeq.map(_.stripSuffix("\r"))
        val lines =
          if (lines0.nonEmpty && lines0.last.isEmpty) lines0.init else lines0
        lines.takeWhile(_ != "\\.")
          .map(splitText(_, o.delim).map {
            case t if t == o.nullToken => None
            case t => Some(unescapeText(t))
          })
      }
    val targetFields: Seq[StructField] =
      if (cols.isEmpty) schema.fields.toSeq
      else {
        val resolver = session.sessionState.conf.resolver
        cols.map(c => schema.fields.find(f => resolver(f.name, c)).getOrElse(
          throw new IllegalArgumentException(
            s"COPY column $c does not exist in $name")))
      }
    cells.zipWithIndex.foreach { case (r, i) =>
      require(r.size == targetFields.size,
        s"COPY row ${i + 1} has ${r.size} fields, expected ${targetFields.size}")
    }
    // string rows → typed columns via Spark casts (bool accepts pg's t/f)
    val strSchema = StructType(targetFields.map(f =>
      StructField(f.name, StringType, nullable = true)))
    import scala.jdk.CollectionConverters._
    val strDf = session.createDataFrame(
      cells.map(r => Row(r.map(_.orNull): _*)).asJava, strSchema)
    val typedCols = targetFields.map { f =>
      val c = col(s"`${f.name.replace("`", "``")}`")
      val typed = f.dataType match {
        case BooleanType =>
          org.apache.spark.sql.functions.when(c === "t", true)
            .when(c === "f", false).otherwise(c.cast(BooleanType))
        case dt => c.cast(dt)
      }
      typed.as(f.name)
    }
    // missing columns (explicit column list) fill NULL, full table order
    val resolver = session.sessionState.conf.resolver
    val full = schema.fields.toSeq.map { f =>
      if (targetFields.exists(tf => resolver(tf.name, f.name)))
        typedCols(targetFields.indexWhere(tf => resolver(tf.name, f.name)))
      else org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)
    }
    val typed = strDf.select(full: _*)
    val n = cells.size.toLong
    if (txn.isOpen) txn.stageBatch(root, typed)
    else CommitLog.append(typed, root)
    val t = new ByteArrayOutputStream()
    t.write(s"COPY $n".getBytes(UTF_8)); t.write(0)
    msg(out, 'C', t.toByteArray)
  }
}
