package graft.tools

import graft.{SparkTestBase, Tables}

/** The pg-wire CLIENT-COMPATIBILITY surface: the introspection queries
  * real Postgres clients issue on connect and for metadata — replayed
  * VERBATIM from their documented sources over a live socket — must
  * answer with rows that match `spark.catalog`.
  *
  * Batteries covered (each test names its source):
  *   - pgjdbc connect: `SET extra_float_digits`, `SELECT current_schema()`
  *   - pgjdbc `DatabaseMetaData`: getSchemas / getTables / getColumns
  *     (PgDatabaseMetaData.java, driver 42.x), the TypeInfoCache oid
  *     lookup (generate_series / array_upper / current_schemas forms)
  *   - psql: `\dn`, `\dt`, and the three-step `\d <table>` sequence
  *     (OPERATOR(pg_catalog.~), COLLATE pg_catalog.default, `::` casts,
  *     correlated pg_attrdef/pg_collation subqueries)
  *
  * Every query here reaches Spark through [[PgCatalog.rewrite]] and the
  * live temp views [[PgCatalog.ensure]] builds from `spark.catalog` —
  * nothing is special-cased per query.
  */
class PgCatalogSpec extends SparkTestBase {

  private val user = "cube"
  private val pass = "pg-cat-secret"

  private def q(port: Int, sql: String) =
    PgWire.queryOnce("127.0.0.1", port, user, pass, sql)

  test("pgjdbc + psql introspection batteries replay verbatim against " +
      "a live socket and match spark.catalog") {
    // a real catalog surface: one permanent commitlog table in its own
    // database + one temp view, both expected to introspect
    import graft.sources.{CatalogOps, CommitLog}
    val root = java.nio.file.Files.createTempDirectory("graft-pgcat").toString
    CommitLog.append(
      spark.range(3).selectExpr("id", "CAST(id AS DOUBLE) AS price",
        "CAST(id AS STRING) AS label"), root)
    CatalogOps.createCommitLogTable(spark, "pgmeta", "widgets", root)
    Tables.load(spark, sf0001, "nation").createOrReplaceTempView("nation_pgv")

    val server = PgWire.start(spark, user = user, password = pass)
    try {
      val port = server.port

      // ---- pgjdbc connect-time battery -------------------------------
      q(port, "SET extra_float_digits = 3") // must not error
      q(port, "SET application_name = 'PostgreSQL JDBC Driver'")
      assert(q(port, "SELECT 1")._2 == Seq(Seq(Some("1"))))
      val ver = q(port, "SELECT version()")._2.head.head.get
      assert(ver.startsWith("PostgreSQL "), ver)
      // pgjdbc getSchema()
      val cs = q(port, "select current_schema()")._2.head.head
      assert(cs.exists(_.nonEmpty))
      // pgjdbc getCatalog()
      assert(q(port, "select current_database()")._2 ==
        Seq(Seq(Some("graft"))))
      // SHOW round trip (psql \echo :VERSION uses SHOW server_version)
      assert(q(port, "SHOW server_version")._2 ==
        Seq(Seq(Some("15.4 (graft)"))))
      assert(q(port, "SHOW TRANSACTION ISOLATION LEVEL")._2 ==
        Seq(Seq(Some("read committed"))))

      // ---- pgjdbc getSchemas (PgDatabaseMetaData.getSchemas) ---------
      val schemas = q(port,
        """SELECT nspname AS TABLE_SCHEM, NULL AS TABLE_CATALOG FROM pg_catalog.pg_namespace  WHERE nspname <> 'pg_toast' AND (nspname !~ '^pg_temp_'  OR nspname = (pg_catalog.current_schemas(true))[1]) AND (nspname !~ '^pg_toast_temp_'  OR nspname = replace((pg_catalog.current_schemas(true))[1], 'pg_temp_', 'pg_toast_temp_'))  ORDER BY TABLE_SCHEM""")
      val schemaNames = schemas._2.map(_.head.get)
      assert(schemaNames.contains("pgmeta"), schemaNames)
      assert(schemaNames.contains("pg_catalog")) // clients expect it listed
      // the same namespaces spark.catalog reports
      spark.catalog.listDatabases().collect().map(_.name).foreach { db =>
        assert(schemaNames.contains(db), s"missing schema $db")
      }

      // ---- psql \dn --------------------------------------------------
      val dn = q(port,
        """SELECT n.nspname AS "Name",
          |  pg_catalog.pg_get_userbyid(n.nspowner) AS "Owner"
          |FROM pg_catalog.pg_namespace n
          |WHERE n.nspname !~ '^pg_' AND n.nspname <> 'information_schema'
          |ORDER BY 1""".stripMargin)
      assert(dn._1 == Seq("Name", "Owner"))
      assert(dn._2.exists(r => r.head.contains("pgmeta") &&
        r(1).contains(user)))

      // ---- psql \dt --------------------------------------------------
      val dt = q(port,
        """SELECT n.nspname as "Schema",
          |  c.relname as "Name",
          |  CASE c.relkind WHEN 'r' THEN 'table' WHEN 'v' THEN 'view' WHEN 'm' THEN 'materialized view' WHEN 'i' THEN 'index' WHEN 'S' THEN 'sequence' WHEN 't' THEN 'TOAST table' WHEN 'f' THEN 'foreign table' WHEN 'p' THEN 'partitioned table' WHEN 'I' THEN 'partitioned index' END as "Type",
          |  pg_catalog.pg_get_userbyid(c.relowner) as "Owner"
          |FROM pg_catalog.pg_class c
          |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
          |WHERE c.relkind IN ('r','p','')
          |      AND n.nspname <> 'pg_catalog'
          |      AND n.nspname !~ '^pg_toast'
          |      AND n.nspname <> 'information_schema'
          |  AND pg_catalog.pg_table_is_visible(c.oid)
          |ORDER BY 1,2""".stripMargin)
      assert(dt._1 == Seq("Schema", "Name", "Type", "Owner"))
      assert(dt._2.exists(r => r == Seq(Some("pgmeta"), Some("widgets"),
        Some("table"), Some(user))), dt._2)

      // ---- psql \d widgets: the documented three-query sequence ------
      // (1) resolve the name to an oid
      val d1 = q(port,
        """SELECT c.oid,
          |  n.nspname,
          |  c.relname
          |FROM pg_catalog.pg_class c
          |     LEFT JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
          |WHERE c.relname OPERATOR(pg_catalog.~) '^(widgets)$' COLLATE pg_catalog.default
          |  AND pg_catalog.pg_table_is_visible(c.oid)
          |ORDER BY 2, 3""".stripMargin)
      assert(d1._2.length == 1, d1._2)
      val oid = d1._2.head.head.get
      assert(d1._2.head(1).contains("pgmeta") && d1._2.head(2).contains("widgets"))

      // (2) relation flags for that oid
      val d2 = q(port,
        s"""SELECT c.relchecks, c.relkind, c.relhasindex, c.relhasrules, c.relhastriggers, c.relrowsecurity, c.relforcerowsecurity, false AS relhasoids, c.relispartition, '', c.reltablespace, CASE WHEN c.reloftype = 0 THEN '' ELSE c.reloftype::pg_catalog.regtype::pg_catalog.text END, c.relpersistence, c.relreplident, am.amname
           |FROM pg_catalog.pg_class c
           | LEFT JOIN pg_catalog.pg_am am ON (c.relam = am.oid)
           |WHERE c.oid = '$oid'""".stripMargin)
      assert(d2._2.length == 1)
      assert(d2._2.head(1).contains("r")) // relkind

      // (3) the column list, format_type'd, with the correlated
      // pg_attrdef / pg_collation subqueries psql sends
      val d3 = q(port,
        s"""SELECT a.attname,
           |  pg_catalog.format_type(a.atttypid, a.atttypmod),
           |  (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid, true)
           |   FROM pg_catalog.pg_attrdef d
           |   WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum AND a.atthasdef),
           |  a.attnotnull,
           |  (SELECT c.collname FROM pg_catalog.pg_collation c, pg_catalog.pg_type t
           |   WHERE c.oid = a.attcollation AND t.oid = a.atttypid AND a.attcollation <> t.typcollation) AS attcollation,
           |  a.attidentity,
           |  a.attgenerated
           |FROM pg_catalog.pg_attribute a
           |WHERE a.attrelid = '$oid' AND a.attnum > 0 AND NOT a.attisdropped
           |ORDER BY a.attnum""".stripMargin)
      // rows match the real schema, in declared order, with pg spellings
      val fields = spark.table("pgmeta.widgets").schema.fields
      assert(d3._2.map(_.head.get) == fields.map(_.name).toSeq)
      assert(d3._2.map(r => r(1).get) ==
        Seq("bigint", "double precision", "text"))

      // ---- pgjdbc getTables (PgDatabaseMetaData.getTables) -----------
      val gt = q(port,
        """SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, c.relname AS TABLE_NAME,  CASE n.nspname ~ '^pg_' OR n.nspname = 'information_schema'  WHEN true THEN CASE  WHEN n.nspname = 'pg_catalog' OR n.nspname = 'information_schema' THEN CASE c.relkind   WHEN 'r' THEN 'SYSTEM TABLE'   WHEN 'v' THEN 'SYSTEM VIEW'   WHEN 'i' THEN 'SYSTEM INDEX'   ELSE NULL   END  WHEN n.nspname = 'pg_toast' THEN CASE c.relkind   WHEN 'r' THEN 'SYSTEM TOAST TABLE'   WHEN 'i' THEN 'SYSTEM TOAST INDEX'   ELSE NULL   END  ELSE CASE c.relkind   WHEN 'r' THEN 'TEMPORARY TABLE'   WHEN 'p' THEN 'TEMPORARY TABLE'   WHEN 'i' THEN 'TEMPORARY INDEX'   WHEN 'S' THEN 'TEMPORARY SEQUENCE'   WHEN 'v' THEN 'TEMPORARY VIEW'   ELSE NULL   END  END  WHEN false THEN CASE c.relkind  WHEN 'r' THEN 'TABLE'  WHEN 'p' THEN 'PARTITIONED TABLE'  WHEN 'i' THEN 'INDEX'  WHEN 'P' then 'PARTITIONED INDEX'  WHEN 'S' THEN 'SEQUENCE'  WHEN 'v' THEN 'VIEW'  WHEN 'c' THEN 'TYPE'  WHEN 'f' THEN 'FOREIGN TABLE'  WHEN 'm' THEN 'MATERIALIZED VIEW'  ELSE NULL  END  ELSE NULL  END  AS TABLE_TYPE, d.description AS REMARKS,  '' as TYPE_CAT, '' as TYPE_SCHEM, '' as TYPE_NAME, '' AS SELF_REFERENCING_COL_NAME, '' AS REF_GENERATION  FROM pg_catalog.pg_namespace n, pg_catalog.pg_class c  LEFT JOIN pg_catalog.pg_description d ON (c.oid = d.objoid AND d.objsubid = 0  and d.classoid = 'pg_class'::regclass)  WHERE c.relnamespace = n.oid  AND (false  OR ( c.relkind = 'r' AND n.nspname !~ '^pg_' AND n.nspname <> 'information_schema' ) )  ORDER BY TABLE_TYPE,TABLE_SCHEM,TABLE_NAME""")
      assert(gt._2.exists(r => r(1).contains("pgmeta") &&
        r(2).contains("widgets") && r(3).contains("TABLE")), gt._2)

      // ---- pgjdbc getColumns (PgDatabaseMetaData.getColumns) ---------
      val gc = q(port,
        """SELECT * FROM (SELECT n.nspname,c.relname,a.attname,a.atttypid,a.attnotnull OR (t.typtype = 'd' AND t.typnotnull) AS attnotnull,a.atttypmod,a.attlen,t.typtypmod,row_number() OVER (PARTITION BY a.attrelid ORDER BY a.attnum) AS attnum, nullif(a.attidentity, '') as attidentity,nullif(a.attgenerated, '') as attgenerated,pg_catalog.pg_get_expr(def.adbin, def.adrelid) AS adsrc,dsc.description,t.typbasetype,t.typtype  FROM pg_catalog.pg_namespace n  JOIN pg_catalog.pg_class c ON (c.relnamespace = n.oid)  JOIN pg_catalog.pg_attribute a ON (a.attrelid=c.oid)  JOIN pg_catalog.pg_type t ON (a.atttypid = t.oid)  LEFT JOIN pg_catalog.pg_attrdef def ON (a.attrelid=def.adrelid AND a.attnum = def.adnum)  LEFT JOIN pg_catalog.pg_description dsc ON (c.oid=dsc.objoid AND a.attnum = dsc.objsubid)  LEFT JOIN pg_catalog.pg_class dc ON (dc.oid=dsc.classoid AND dc.relname='pg_class')  LEFT JOIN pg_catalog.pg_namespace dn ON (dc.relnamespace=dn.oid AND dn.nspname='pg_catalog')  WHERE c.relkind in ('r','p','v','f','m') and a.attnum > 0 AND NOT a.attisdropped  AND c.relname LIKE 'widgets'  AND a.attname LIKE '%') c WHERE true  ORDER BY nspname,c.relname,attnum""")
      assert(gc._2.map(_(2).get) == Seq("id", "price", "label"))
      assert(gc._2.map(_(3).get) == Seq("20", "701", "25")) // int8/float8/text

      // ---- pgjdbc TypeInfoCache oid lookup (the $1 bound to 23) ------
      val ti = q(port,
        """SELECT typinput='array_in'::regproc as is_array, typtype, typname, pg_type.oid FROM pg_catalog.pg_type LEFT JOIN (select ns.oid as nspoid, ns.nspname, r.r from pg_namespace as ns join ( select s.r, (current_schemas(false))[s.r] as nspname from generate_series(1, array_upper(current_schemas(false), 1)) as s(r) ) as r using ( nspname ) ) as sp ON sp.nspoid = typnamespace WHERE pg_type.oid = 23 LIMIT 1""")
      assert(ti._2 == Seq(Seq(Some("f"), Some("b"), Some("int4"), Some("23"))))

      // global temp views are cross-session — they surface as relkind
      // 'v' in the global_temp schema (exactly where SELECT finds them)
      spark.range(2).selectExpr("id AS g").createOrReplaceGlobalTempView("gpv")
      val tv = q(port,
        """SELECT n.nspname, c.relkind FROM pg_catalog.pg_class c
          | JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
          | WHERE c.relname = 'gpv'""".stripMargin)
      assert(tv._2 == Seq(Seq(Some("global_temp"), Some("v"))))

      // ---- psql \l (list databases) — verbatim, incl. the E'\n'
      // escape-string literal and the array_to_string over a NULL acl
      val dl = q(port,
        """SELECT d.datname as "Name",
          |       pg_catalog.pg_get_userbyid(d.datdba) as "Owner",
          |       pg_catalog.pg_encoding_to_char(d.encoding) as "Encoding",
          |       d.datcollate as "Collate",
          |       d.datctype as "Ctype",
          |       pg_catalog.array_to_string(d.datacl, E'\n') AS "Access privileges"
          |FROM pg_catalog.pg_database d
          |ORDER BY 1""".stripMargin)
      assert(dl._1 == Seq("Name", "Owner", "Encoding", "Collate", "Ctype",
        "Access privileges"))
      assert(dl._2 == Seq(Seq(Some("graft"), Some(user), Some("UTF8"),
        Some("C"), Some("C"), None)))

      // ---- information_schema (the SQL-standard introspection dialect
      // Metabase's sync and many ORMs use instead of pg_catalog)
      val ist = q(port,
        """SELECT table_schema, table_name, table_type
          | FROM information_schema.tables
          | WHERE table_type = 'BASE TABLE'
          |   AND table_schema NOT IN ('pg_catalog', 'information_schema')
          | ORDER BY 1, 2""".stripMargin)
      assert(ist._2.exists(r => r.head.contains("pgmeta") &&
        r(1).contains("widgets") && r(2).contains("BASE TABLE")), ist._2)
      val isc = q(port,
        """SELECT column_name, data_type, is_nullable, ordinal_position
          | FROM information_schema.columns
          | WHERE table_schema = 'pgmeta' AND table_name = 'widgets'
          | ORDER BY ordinal_position""".stripMargin)
      assert(isc._2.map(_.head.get) == Seq("id", "price", "label"))
      assert(isc._2.map(_(1).get) ==
        Seq("bigint", "double precision", "text"))
      val iss = q(port,
        "SELECT schema_name FROM information_schema.schemata ORDER BY 1")
      assert(iss._2.map(_.head.get).contains("pgmeta"))

      // DDL AFTER connect is visible to introspection (ensure() is
      // live): a table created in the shared catalog mid-session
      val root2 = java.nio.file.Files.createTempDirectory("graft-pgcat2").toString
      CommitLog.append(spark.range(2).selectExpr("id AS k"), root2)
      CatalogOps.createCommitLogTable(spark, "pgmeta", "late_t", root2)
      val late = q(port,
        "SELECT c.relname FROM pg_catalog.pg_class c WHERE c.relname = 'late_t'")
      assert(late._2 == Seq(Seq(Some("late_t"))))
    } finally server.stop()

    // session temp views (invisible to OTHER connections — the thrift
    // isolation contract) map to relkind 'v' in the session's own
    // catalog view: exercise ensure() on the owning session directly
    PgCatalog.ensure(spark)
    val mine = spark.sql(
      "SELECT relkind FROM pg_class WHERE relname = 'nation_pgv'").collect()
    assert(mine.map(_.getString(0)).toSeq == Seq("v"))
  }

  test("constraint + comment batteries: pgjdbc getPrimaryKeys/" +
      "getImportedKeys verbatim, psql \\d constraint queries, COMMENT ON " +
      "through pg_description/obj_description — from declared RELY keys") {
    import graft.sources.{CatalogOps, CommitLog}
    // a dim with a declared PK, a fact with a declared FK onto it, and a
    // CHECK constraint — the engine's own validated constraint surface
    val dimRoot = java.nio.file.Files.createTempDirectory("graft-pgconD").toString
    val factRoot = java.nio.file.Files.createTempDirectory("graft-pgconF").toString
    CommitLog.append(spark.range(5).selectExpr("id AS k", "CAST(id AS STRING) AS nm"), dimRoot)
    CommitLog.setTableProperties(dimRoot, Map(CommitLog.PkProp -> "k"))
    CommitLog.append(spark.range(10).selectExpr("id AS fid", "id % 5 AS dim_k",
      "CAST(id * 2 AS DOUBLE) AS amount"), factRoot)
    CommitLog.setTableProperties(factRoot,
      Map(s"${CommitLog.FkPropPrefix}dim_k" -> s"$dimRoot::k"))
    CatalogOps.createCommitLogTable(spark, "pgcon", "dim", dimRoot)
    CatalogOps.createCommitLogTable(spark, "pgcon", "fact", factRoot)
    spark.sql("ALTER TABLE pgcon.fact ADD CONSTRAINT amount_pos CHECK (amount >= 0)")

    val server = PgWire.start(spark, user = user, password = pass)
    try {
      val port = server.port

      // ---- pgjdbc getPrimaryKeys (PgDatabaseMetaData, 42.x) VERBATIM —
      // including the _pg_expandarray SRF and the (result.KEYS).x
      // record-field wrapper
      val pk = q(port,
        "SELECT result.TABLE_CAT, result.TABLE_SCHEM, result.TABLE_NAME, " +
          "result.COLUMN_NAME, result.KEY_SEQ, result.PK_NAME FROM (" +
          "SELECT NULL AS TABLE_CAT, n.nspname AS TABLE_SCHEM, ct.relname AS TABLE_NAME, " +
          "a.attname AS COLUMN_NAME, (information_schema._pg_expandarray(i.indkey)).n AS KEY_SEQ, " +
          "ci.relname AS PK_NAME, information_schema._pg_expandarray(i.indkey) AS KEYS, " +
          "a.attnum AS A_ATTNUM FROM pg_catalog.pg_class ct " +
          "JOIN pg_catalog.pg_attribute a ON (ct.oid = a.attrelid) " +
          "JOIN pg_catalog.pg_index i ON ( a.attrelid = i.indrelid) " +
          "JOIN pg_catalog.pg_class ci ON (ci.oid = i.indexrelid) " +
          "JOIN pg_catalog.pg_namespace n ON (ct.relnamespace = n.oid) " +
          "WHERE true  AND n.nspname = E'pgcon' AND ct.relname = E'dim' AND i.indisprimary " +
          ") result where result.A_ATTNUM = (result.KEYS).x " +
          "ORDER BY result.table_name, result.pk_name, result.key_seq")
      assert(pk._2 == Seq(Seq(None, Some("pgcon"), Some("dim"), Some("k"),
        Some("1"), Some("dim_pkey"))), pk._2)

      // ---- pgjdbc getImportedKeys VERBATIM — generate_series pos(n) in
      // FROM, 1-based conkey/confkey subscripts, conindid join onto the
      // PK index's pg_class row
      val fk = q(port,
        "SELECT NULL::text AS PKTABLE_CAT, pkn.nspname AS PKTABLE_SCHEM, pkc.relname AS PKTABLE_NAME, " +
          "pka.attname AS PKCOLUMN_NAME, NULL::text AS FKTABLE_CAT, fkn.nspname AS FKTABLE_SCHEM, " +
          "fkc.relname AS FKTABLE_NAME, fka.attname AS FKCOLUMN_NAME, pos.n AS KEY_SEQ, " +
          "CASE con.confupdtype  WHEN 'c' THEN 0 WHEN 'n' THEN 2 WHEN 'd' THEN 4 WHEN 'r' THEN 1 " +
          "WHEN 'p' THEN 1 WHEN 'a' THEN 3 ELSE NULL END AS UPDATE_RULE, " +
          "CASE con.confdeltype  WHEN 'c' THEN 0 WHEN 'n' THEN 2 WHEN 'd' THEN 4 WHEN 'r' THEN 1 " +
          "WHEN 'p' THEN 1 WHEN 'a' THEN 3 ELSE NULL END AS DELETE_RULE, " +
          "con.conname AS FK_NAME, pkic.relname AS PK_NAME, " +
          "CASE  WHEN con.condeferrable AND con.condeferred THEN 5 WHEN con.condeferrable THEN 6 ELSE 7 END AS DEFERRABILITY " +
          "FROM pg_catalog.pg_namespace pkn, pg_catalog.pg_class pkc, pg_catalog.pg_attribute pka, " +
          "pg_catalog.pg_namespace fkn, pg_catalog.pg_class fkc, pg_catalog.pg_attribute fka, " +
          "pg_catalog.pg_constraint con, pg_catalog.generate_series(1, 32) pos(n), pg_catalog.pg_class pkic " +
          "WHERE pkn.oid = pkc.relnamespace AND pkc.oid = pka.attrelid AND pka.attnum = con.confkey[pos.n] " +
          "AND con.confrelid = pkc.oid AND fkn.oid = fkc.relnamespace AND fkc.oid = fka.attrelid " +
          "AND fka.attnum = con.conkey[pos.n] AND con.conrelid = fkc.oid AND con.contype = 'f' " +
          "AND (pkic.relkind = 'i' OR pkic.relkind = 'I') AND pkic.oid = con.conindid " +
          "AND fkn.nspname = E'pgcon' AND fkc.relname = E'fact' " +
          "ORDER BY pkn.nspname,pkc.relname, con.conname,pos.n")
      assert(fk._2 == Seq(Seq(None, Some("pgcon"), Some("dim"), Some("k"),
        None, Some("pgcon"), Some("fact"), Some("dim_k"), Some("1"),
        Some("3"), Some("3"), Some("fact_dim_k_fkey"), Some("dim_pkey"),
        Some("7"))), fk._2)

      // ---- psql \d dim: the index battery (pg_get_indexdef /
      // pg_get_constraintdef / conindid / contype IN)
      val oid = q(port,
        "SELECT c.oid FROM pg_catalog.pg_class c JOIN pg_catalog.pg_namespace n " +
          "ON n.oid = c.relnamespace WHERE c.relname = 'dim' AND n.nspname = 'pgcon'")
        ._2.head.head.get
      val idx = q(port,
        s"""SELECT c2.relname, i.indisprimary, i.indisunique, i.indisclustered, i.indisvalid, pg_catalog.pg_get_indexdef(i.indexrelid, 0, true),
           |  pg_catalog.pg_get_constraintdef(con.oid, true), contype, condeferrable, condeferred, i.indisreplident, c2.reltablespace
           |FROM pg_catalog.pg_class c, pg_catalog.pg_class c2, pg_catalog.pg_index i
           |  LEFT JOIN pg_catalog.pg_constraint con ON (conrelid = i.indrelid AND conindid = i.indexrelid AND contype IN ('p','u','x'))
           |WHERE c.oid = '$oid' AND c.oid = i.indrelid AND i.indexrelid = c2.oid
           |ORDER BY i.indisprimary DESC, i.indisunique DESC, c2.relname""".stripMargin)
      assert(idx._2.length == 1)
      assert(idx._2.head.head.contains("dim_pkey"))
      assert(idx._2.head(1).contains("t") && idx._2.head(2).contains("t"))
      assert(idx._2.head(5).exists(_.contains("CREATE UNIQUE INDEX dim_pkey")))
      assert(idx._2.head(6).contains("PRIMARY KEY (k)"))
      assert(idx._2.head(7).contains("p"))

      // ---- psql \d fact: FK + CHECK constraint listings
      val factOid = q(port,
        "SELECT c.oid FROM pg_catalog.pg_class c JOIN pg_catalog.pg_namespace n " +
          "ON n.oid = c.relnamespace WHERE c.relname = 'fact' AND n.nspname = 'pgcon'")
        ._2.head.head.get
      val fkDef = q(port,
        s"SELECT conname, pg_catalog.pg_get_constraintdef(r.oid, true) as condef " +
          s"FROM pg_catalog.pg_constraint r WHERE r.conrelid = '$factOid' " +
          "AND r.contype = 'f' ORDER BY 1")
      assert(fkDef._2 == Seq(Seq(Some("fact_dim_k_fkey"),
        Some("FOREIGN KEY (dim_k) REFERENCES dim(k)"))))
      val ckDef = q(port,
        s"SELECT r.conname, pg_catalog.pg_get_constraintdef(r.oid, true) " +
          s"FROM pg_catalog.pg_constraint r WHERE r.conrelid = '$factOid' " +
          "AND r.contype = 'c' ORDER BY 1")
      assert(ckDef._2.length == 1)
      assert(ckDef._2.head.head.contains("amount_pos"))
      assert(ckDef._2.head(1).exists(_.startsWith("CHECK (")))

      // ---- information_schema constraint views (Metabase's FK sync)
      val tc = q(port,
        """SELECT constraint_name, table_name, constraint_type
          | FROM information_schema.table_constraints
          | WHERE table_schema = 'pgcon' ORDER BY 1""".stripMargin)
      assert(tc._2.map(r => (r.head.get, r(1).get, r(2).get)).toSet == Set(
        ("dim_pkey", "dim", "PRIMARY KEY"),
        ("fact_dim_k_fkey", "fact", "FOREIGN KEY"),
        ("amount_pos", "fact", "CHECK")), tc._2)
      val kcu = q(port,
        """SELECT kcu.constraint_name, kcu.table_name, kcu.column_name, kcu.ordinal_position
          | FROM information_schema.key_column_usage kcu
          | WHERE kcu.table_schema = 'pgcon' ORDER BY 1""".stripMargin)
      assert(kcu._2.map(r => (r.head.get, r(1).get, r(2).get, r(3).get)).toSet
        == Set(("dim_pkey", "dim", "k", "1"),
          ("fact_dim_k_fkey", "fact", "dim_k", "1")), kcu._2)
      val rc = q(port,
        """SELECT constraint_name, unique_constraint_name, delete_rule
          | FROM information_schema.referential_constraints ORDER BY 1""".stripMargin)
      assert(rc._2.exists(r => r.head.contains("fact_dim_k_fkey") &&
        r(1).contains("dim_pkey") && r(2).contains("NO ACTION")), rc._2)

      // ---- COMMENT ON → pg_description / obj_description / \dt+ -------
      assert(q(port, "COMMENT ON TABLE pgcon.dim IS 'the dimension'")._2 == Nil)
      assert(q(port, "COMMENT ON COLUMN pgcon.dim.k IS 'the key'")._2 == Nil)
      // psql \dt+ Description column
      val dtp = q(port,
        """SELECT c.relname, pg_catalog.obj_description(c.oid, 'pg_class') as "Description"
          | FROM pg_catalog.pg_class c JOIN pg_catalog.pg_namespace n ON n.oid = c.relnamespace
          | WHERE n.nspname = 'pgcon' AND c.relkind = 'r' ORDER BY 1""".stripMargin)
      assert(dtp._2.contains(Seq(Some("dim"), Some("the dimension"))), dtp._2)
      // psql \d+ column Description (col_description)
      val cdesc = q(port,
        s"""SELECT a.attname, pg_catalog.col_description(a.attrelid, a.attnum)
           | FROM pg_catalog.pg_attribute a WHERE a.attrelid = '$oid'
           | AND a.attnum > 0 ORDER BY a.attnum""".stripMargin)
      assert(cdesc._2 == Seq(Seq(Some("k"), Some("the key")),
        Seq(Some("nm"), None)), cdesc._2)
      // pgjdbc getTables REMARKS rides the same pg_description join
      val rem = q(port,
        """SELECT c.relname, d.description FROM pg_catalog.pg_class c
          | LEFT JOIN pg_catalog.pg_description d ON (c.oid = d.objoid AND d.objsubid = 0 and d.classoid = 'pg_class'::regclass)
          | WHERE c.relname = 'dim'""".stripMargin)
      assert(rem._2 == Seq(Seq(Some("dim"), Some("the dimension"))))
      // COMMENT ON ... IS NULL clears
      assert(q(port, "COMMENT ON TABLE pgcon.dim IS NULL")._2 == Nil)
      val cleared = q(port,
        """SELECT pg_catalog.obj_description(c.oid, 'pg_class')
          | FROM pg_catalog.pg_class c WHERE c.relname = 'dim'""".stripMargin)
      assert(cleared._2 == Seq(Seq(None)), cleared._2)
    } finally server.stop()
  }

  test("rewrite unit behavior: casts, regex operators, COLLATE, " +
      "regclass, subscripts, double-quoted identifiers — literals opaque") {
    // rewrites may differ in whitespace; compare space-normalized
    def rw(s: String): String =
      PgCatalog.rewrite(s).replaceAll("\\s+", " ").trim
    assert(rw("SELECT c.oid::pg_catalog.regtype::pg_catalog.text FROM t")
      == "SELECT c.oid FROM t")
    assert(rw("a !~ '^pg_'") == "a NOT RLIKE '^pg_'")
    assert(rw("a OPERATOR(pg_catalog.~) '^(x)$'") == "a RLIKE '^(x)$'")
    assert(rw("n.nspname ~ '^pg_'") == "n.nspname RLIKE '^pg_'")
    assert(rw("x COLLATE pg_catalog.default AND y") == "x AND y")
    // COLLATE is word-bounded: a column NAMED datcollate is untouched
    assert(rw("SELECT d.datcollate as c FROM t") ==
      "SELECT d.datcollate as c FROM t")
    // pg escape-string literals: standalone E before a quote drops; an
    // E inside a literal, or word-interior (LIKE'x'), never does
    assert(rw("SELECT array_to_string(a, E'\\n') FROM t") ==
      "SELECT array_to_string(a, '\\n') FROM t")
    assert(rw("SELECT 'A E''B' AS x") == "SELECT 'A E''B' AS x")
    assert(rw("SELECT k FROM t WHERE k LIKE'y%'") ==
      "SELECT k FROM t WHERE k LIKE'y%'")
    assert(rw("d.classoid = 'pg_class'::regclass")
      == "d.classoid = regclass_oid('pg_class')")
    // a literal containing the operators is untouched
    assert(rw("SELECT 'a::b' AS x") == "SELECT 'a::b' AS x")
    assert(rw("SELECT 'a ~ b' AS x") == "SELECT 'a ~ b' AS x")
    // pg double quotes are IDENTIFIERS → Spark backticks ("" escape kept)
    assert(rw("SELECT n.nspname as \"Schema\" FROM t")
      == "SELECT n.nspname as `Schema` FROM t")
    assert(rw("SELECT 1 as \"a\"\"b\"") == "SELECT 1 as `a\"b`")
    assert(rw("(pg_catalog.current_schemas(true))[1]")
      == "element_at(current_schemas(true), 1)")
    assert(rw("generate_series(1, array_upper(current_schemas(false), 1)) as s(r)")
      == "explode(sequence(1, size(current_schemas(false)))) as s(r)")
    // non-word-boundary names are left alone, later real calls still hit
    assert(rw("xgenerate_series(1,2) + generate_series(3, 4)")
      == "xgenerate_series(1,2) + explode(sequence(3, 4))")
    // the gate: plain engine SQL never pays the rewrite
    assert(!PgCatalog.needsRewrite("SELECT l_orderkey FROM lineitem"))
    assert(PgCatalog.needsRewrite("SELECT * FROM pg_catalog.pg_class"))
    assert(PgCatalog.needsRewrite("SELECT 1 AS \"x\""))
  }
}
