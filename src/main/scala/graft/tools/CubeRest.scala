package graft.tools

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.semantic.CubeDef

/** The cube.dev REST API persona — the HTTP face the reference's cube
  * container exposed (`conf/cube/.env:7-11`: `CUBEJS_API_SECRET`, REST
  * port) and the last documented interface without an analog here. A BI
  * tool speaking cube's REST dialect POSTs (or GETs) a LOAD QUERY —
  * measures + dimensions + timeDimensions(granularity, dateRange) +
  * filters + limit, members addressed `cube.member` — to
  * `/cubejs-api/v1/load` and receives `{query, data, annotation}` rows.
  * The rendering is EXACTLY [[graft.semantic.CubeDef.query]] — the same
  * DataFrame aggregation the Scala API and the SQL-port persona
  * ([[graft.semantic.CubeViews]]) produce, so all three faces of the
  * semantic layer are one implementation (the equivalence is
  * spec-proven). `/cubejs-api/v1/meta` serves the cube catalog, which is
  * what BI tools hit first.
  *
  * Auth ≡ `CUBEJS_API_SECRET`: the `Authorization` header carries either
  * the literal secret (cube.dev dev-mode style) or an HS256 JWT signed
  * WITH the secret (cube.dev production style) — the JWT path verifies
  * the signature with a constant-time compare and enforces the standard
  * time claims (`exp` strictly in the future, `nbf` not in the future)
  * so a leaked token ages out; other claims are ignored, the persona's
  * subset of cube's security context. The server binds loopback by
  * default (`bindAddress` widens it deliberately), and results are
  * row-capped before `collect()` — `limit` defaults to 10000 and is
  * rejected above 50000, cube.dev's own bounds — so an authorized but
  * oversized query cannot OOM the driver.
  *
  * Scale: the server is a thin JSON shim; every query plans and executes
  * as the cube's declarative aggregation (Catalyst/AQE own the physical
  * plan, pre-aggregation routing included for unfiltered selections), so
  * the REST face costs nothing over the Scala face.
  */
object CubeRest {

  /** cube.dev's own load-query row bounds (its API reference: `limit`
    * defaults to 10000, maximum 50000).
    */
  val DefaultLimit = 10000
  val MaxLimit = 50000

  private val mapper = new ObjectMapper()

  /** Start the REST endpoint on `port` (0 = pick a free one); returns the
    * server (call `.stop(0)` to shut down) and the bound port.
    *
    * @param cubes       the served cube catalog
    * @param resolve     table name → DataFrame, same contract as CubeDef.query
    * @param secret      ≡ CUBEJS_API_SECRET (defaults to the env var)
    * @param bindAddress interface to listen on; loopback by default —
    *                    widening to 0.0.0.0 is an explicit caller choice
    */
  def start(cubes: Seq[CubeDef], resolve: String => DataFrame,
      secret: String = sys.env.getOrElse("CUBEJS_API_SECRET", ""),
      port: Int = 0, bindAddress: String = "127.0.0.1"): (HttpServer, Int) = {
    require(secret.nonEmpty,
      "CubeRest needs an API secret (CUBEJS_API_SECRET or the secret arg)")
    val byName = cubes.map(c => c.name -> c).toMap
    val server = HttpServer.create(
      new InetSocketAddress(java.net.InetAddress.getByName(bindAddress), port), 0)
    server.createContext("/cubejs-api/v1/load", (ex: HttpExchange) =>
      guarded(ex, secret) { () =>
        val q = ex.getRequestMethod match {
          case "POST" =>
            val body = mapper.readTree(ex.getRequestBody.readAllBytes())
            Option(body.get("query")).getOrElse(body)
          case _ => // GET ?query=<urlencoded json>
            val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
            val enc = raw.split('&').find(_.startsWith("query="))
              .map(_.stripPrefix("query=")).getOrElse(
                throw new IllegalArgumentException("missing query parameter"))
            mapper.readTree(java.net.URLDecoder.decode(enc, "UTF-8"))
        }
        renderLoad(byName, resolve, q)
      })
    server.createContext("/cubejs-api/v1/meta", (ex: HttpExchange) =>
      guarded(ex, secret)(() => meta(cubes)))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    (server, server.getAddress.getPort)
  }

  // ------------------------------------------------------------------ auth

  /** Literal secret, or an HS256 JWT signed with it. A verified JWT must
    * also pass the standard time claims when present — `exp` strictly
    * after now, `nbf` at or before now (RFC 7519 §4.1.4/4.1.5) — so an
    * expired or leaked-and-rotated-out token is not valid forever.
    * `nowEpochSec` is injectable for the spec's frozen-clock cases.
    */
  private[tools] def authorized(header: String, secret: String,
      nowEpochSec: () => Long = () => System.currentTimeMillis() / 1000L)
      : Boolean = {
    val t = header.stripPrefix("Bearer ").trim
    if (java.security.MessageDigest.isEqual(
        t.getBytes(UTF_8), secret.getBytes(UTF_8))) true
    else t.split('.') match {
      case Array(h, p, sig) =>
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          secret.getBytes(UTF_8), "HmacSHA256"))
        val want = java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString(mac.doFinal(s"$h.$p".getBytes(UTF_8)))
        java.security.MessageDigest.isEqual(
          want.getBytes(UTF_8), sig.getBytes(UTF_8)) && timeClaimsOk(p, nowEpochSec())
      case _ => false
    }
  }

  /** exp/nbf gate over a signature-verified payload; a payload that is
    * not decodable JSON fails closed (the signature says the issuer
    * produced it, but a non-JWS-shaped token earns no time-claim pass).
    */
  private def timeClaimsOk(payloadB64: String, now: Long): Boolean =
    try {
      val claims = mapper.readTree(
        java.util.Base64.getUrlDecoder.decode(payloadB64))
      // RFC 7519 requires exp/nbf to be NumericDate. A present-but-non-
      // numeric claim (e.g. "exp": "123") is a malformed token and fails
      // CLOSED — silently skipping the check would mint never-expiring
      // tokens out of an issuer bug.
      def gate(f: String)(ok: Long => Boolean): Boolean =
        Option(claims.get(f)).filterNot(_.isNull) match {
          case None => true
          case Some(n) if n.isNumber => ok(n.asLong())
          case Some(_) => false
        }
      gate("exp")(_ > now) && gate("nbf")(_ <= now)
    } catch { case scala.util.control.NonFatal(_) => false }

  private def guarded(ex: HttpExchange, secret: String)
      (body: () => ObjectNode): Unit = {
    try {
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (!auth.exists(authorized(_, secret))) {
        respond(ex, 403, err("Invalid token"))
      } else respond(ex, 200, body())
    } catch {
      case e: IllegalArgumentException => respond(ex, 400, err(e.getMessage))
      case scala.util.control.NonFatal(e) =>
        respond(ex, 500, err(String.valueOf(e.getMessage)))
    } finally ex.close()
  }

  private def err(msg: String): ObjectNode = {
    val n = mapper.createObjectNode(); n.put("error", msg); n
  }

  private def respond(ex: HttpExchange, code: Int, node: ObjectNode): Unit = {
    val bytes = mapper.writeValueAsBytes(node)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  // ------------------------------------------------------------------ load

  /** `cube.member` → (cube, member); every member must land in ONE cube. */
  private def splitMember(m: String): (String, String) = {
    val i = m.indexOf('.')
    require(i > 0, s"member '$m' is not cube.member-qualified")
    (m.substring(0, i), m.substring(i + 1))
  }

  private def renderLoad(byName: Map[String, CubeDef],
      resolve: String => DataFrame, q: JsonNode): ObjectNode = {
    def arr(field: String): Seq[JsonNode] =
      Option(q.get(field)).toSeq.flatMap { n =>
        import scala.jdk.CollectionConverters._
        n.elements().asScala.toSeq
      }
    val measures = arr("measures").map(m => splitMember(m.asText()))
    val dimensions = arr("dimensions").map(d => splitMember(d.asText()))
    val timeDims = arr("timeDimensions").map { td =>
      val (c, d) = splitMember(td.get("dimension").asText())
      val gran = Option(td.get("granularity")).filterNot(_.isNull)
        .map(_.asText())
      val range = Option(td.get("dateRange")).filterNot(_.isNull).map { r =>
        require(r.isArray && r.size == 2,
          "dateRange must be [from, to] (inclusive dates)")
        (r.get(0).asText(), r.get(1).asText())
      }
      (c, d, gran, range)
    }
    val cubeNames = (measures.map(_._1) ++ dimensions.map(_._1) ++
      timeDims.map(_._1) ++
      arr("filters").map(f => splitMember(f.get("member").asText())._1))
      .distinct
    require(cubeNames.size == 1,
      s"query must address exactly one cube, got: ${cubeNames.mkString(", ")}")
    val cube = byName.getOrElse(cubeNames.head,
      throw new IllegalArgumentException(s"unknown cube '${cubeNames.head}'"))
    require(measures.nonEmpty, "query lists no measures")
    val dims: Seq[(String, Option[String])] =
      dimensions.map { case (_, d) => d -> None } ++
        timeDims.collect { case (_, d, Some(g), _) => d -> Some(g) }
    val filters: Seq[Column] = arr("filters").map(filterCol(cube, _)) ++
      timeDims.collect { case (_, d, _, Some((from, to))) =>
        // inclusive calendar-date range, cube.dev's dateRange contract
        cube.dimensionExpr(d)._1.cast("date").between(from, to)
      }
    // cube.dev's row-limit contract (default 10000, hard max 50000) —
    // enforced BEFORE collect() so an omitted or oversized limit can
    // never pull an unbounded aggregate onto the driver.
    val limit = Option(q.get("limit")).filterNot(_.isNull)
      .map(_.asInt()).getOrElse(DefaultLimit)
    require(limit >= 0 && limit <= MaxLimit,
      s"limit must be between 0 and $MaxLimit, got $limit")
    val df = cube.query(resolve, measures.map(_._2), dims, filters)
      .limit(limit)
    // response keys ≡ cube.dev: cube.measure, cube.dim, cube.timeDim.gran
    val outKeys: Seq[(String, String)] = // (df column, response key)
      dimensions.map { case (c, d) => d -> s"$c.$d" } ++
        timeDims.collect { case (c, d, Some(g), _) =>
          s"${d}_$g" -> s"$c.$d.$g" } ++
        measures.map { case (c, m) => m -> s"$c.$m" }
    val out = mapper.createObjectNode()
    out.set[ObjectNode]("query", q.deepCopy[JsonNode]())
    val data = out.putArray("data")
    df.collect().foreach { row =>
      val r = data.addObject()
      outKeys.foreach { case (colName, key) =>
        row.getAs[Any](colName) match {
          case null => r.putNull(key)
          case v: java.lang.Long => r.put(key, v.longValue())
          case v: java.lang.Integer => r.put(key, v.intValue())
          case v: java.lang.Double => r.put(key, v.doubleValue())
          case v: java.lang.Float => r.put(key, v.floatValue())
          case v: java.math.BigDecimal => r.put(key, v)
          case v: Decimal => r.put(key, v.toJavaBigDecimal)
          case v: java.lang.Boolean => r.put(key, v.booleanValue())
          case v => r.put(key, v.toString) // dates/timestamps/strings
        }
      }
    }
    val ann = out.putObject("annotation")
    def annotate(node: ObjectNode, keys: Seq[String], typ: String): Unit =
      keys.foreach { k =>
        val o = node.putObject(k); o.put("title", k); o.put("type", typ)
      }
    annotate(ann.putObject("measures"), measures.map { case (c, m) => s"$c.$m" }, "number")
    annotate(ann.putObject("dimensions"), dimensions.map { case (c, d) => s"$c.$d" }, "string")
    annotate(ann.putObject("timeDimensions"),
      timeDims.collect { case (c, d, Some(g), _) => s"$c.$d.$g" }, "time")
    out
  }

  private type Decimal = org.apache.spark.sql.types.Decimal

  /** cube.dev filter → Column over the dimension's expression. */
  private def filterCol(cube: CubeDef, f: JsonNode): Column = {
    val (_, member) = splitMember(f.get("member").asText())
    val (e, _) = cube.dimensionExpr(member)
    val op = f.get("operator").asText()
    import scala.jdk.CollectionConverters._
    val values = Option(f.get("values")).toSeq
      .flatMap(_.elements().asScala.map(_.asText()).toSeq)
    def anyOf(per: String => Column): Column =
      values.map(per).reduceOption(_ || _).getOrElse(lit(false))
    op match {
      case "equals" => anyOf(v => e === lit(v))
      case "notEquals" => !anyOf(v => e === lit(v)) || e.isNull
      case "contains" => anyOf(v => lower(e.cast("string")).contains(v.toLowerCase))
      case "notContains" =>
        !anyOf(v => lower(e.cast("string")).contains(v.toLowerCase)) || e.isNull
      case "gt" => e > lit(values.head)
      case "gte" => e >= lit(values.head)
      case "lt" => e < lit(values.head)
      case "lte" => e <= lit(values.head)
      case "set" => e.isNotNull
      case "notSet" => e.isNull
      case "inDateRange" =>
        require(values.size == 2, "inDateRange wants [from, to]")
        e.cast("date").between(values(0), values(1))
      case other =>
        throw new IllegalArgumentException(s"unsupported filter operator '$other'")
    }
  }

  // ------------------------------------------------------------------ meta

  private def meta(cubes: Seq[CubeDef]): ObjectNode = {
    val out = mapper.createObjectNode()
    val arr: ArrayNode = out.putArray("cubes")
    cubes.foreach { c =>
      val n = arr.addObject()
      n.put("name", c.name); n.put("title", c.name)
      val ms = n.putArray("measures")
      c.measures.foreach { m =>
        val o = ms.addObject()
        o.put("name", s"${c.name}.${m.name}")
        o.put("type", "number"); o.put("aggType", m.typ)
      }
      val ds = n.putArray("dimensions")
      c.dimensions.foreach { d =>
        val o = ds.addObject()
        o.put("name", s"${c.name}.${d.name}")
        o.put("type", d.typ)
      }
    }
    out
  }
}
