package graft.tools

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.semantic.ReferenceCubes

/** The cube.dev REST persona over a REAL socket: token/JWT auth, the
  * load-query dialect (measures, dimensions, timeDimensions with
  * granularity + dateRange, filters, limit), and the equivalence proof —
  * REST rows must equal the Scala rendering row-for-row, the same
  * CubeViews-style proof the SQL-port persona carries.
  */
class CubeRestSpec extends SparkTestBase {

  private val om = new ObjectMapper()
  private val secret = "test-cube-secret"

  private def http(port: Int, path: String, auth: Option[String],
      postBody: Option[String] = None): (Int, String) = {
    val url = new URI(s"http://127.0.0.1:$port$path").toURL
    val c = url.openConnection().asInstanceOf[HttpURLConnection]
    auth.foreach(c.setRequestProperty("Authorization", _))
    postBody.foreach { b =>
      c.setRequestMethod("POST")
      c.setRequestProperty("Content-Type", "application/json")
      c.setDoOutput(true)
      c.getOutputStream.write(b.getBytes(UTF_8))
    }
    val code = c.getResponseCode
    val in = if (code >= 400) c.getErrorStream else c.getInputStream
    val body = new String(in.readAllBytes(), UTF_8)
    c.disconnect()
    (code, body)
  }

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")

  test("load queries render through the cube, auth gates the socket, and " +
      "REST rows equal the Scala rendering") {
    val events = Tables.load(spark, sf0001, "events")
    val (server, port) = CubeRest.start(
      Seq(ReferenceCubes.eventsCube), _ => events, secret = secret)
    try {
      // no/bad token → 403
      assert(http(port, "/cubejs-api/v1/meta", None)._1 == 403)
      assert(http(port, "/cubejs-api/v1/meta", Some("wrong"))._1 == 403)
      // raw secret and an HS256 JWT signed with it both pass
      assert(http(port, "/cubejs-api/v1/meta", Some(secret))._1 == 200)
      val jwt = {
        def b64(s: String) = java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString(s.getBytes(UTF_8))
        val hp = b64("""{"alg":"HS256","typ":"JWT"}""") + "." + b64("{}")
        val mac = javax.crypto.Mac.getInstance("HmacSHA256")
        mac.init(new javax.crypto.spec.SecretKeySpec(
          secret.getBytes(UTF_8), "HmacSHA256"))
        hp + "." + java.util.Base64.getUrlEncoder.withoutPadding
          .encodeToString(mac.doFinal(hp.getBytes(UTF_8)))
      }
      assert(http(port, "/cubejs-api/v1/meta", Some(s"Bearer $jwt"))._1 == 200)
      // a JWT signed with the WRONG secret fails
      val badJwt = jwt.dropRight(4) + "AAAA"
      assert(http(port, "/cubejs-api/v1/meta", Some(s"Bearer $badJwt"))._1 == 403)

      // GET load: measures × (string dim, month granularity)
      val q =
        """{"measures":["events_cube.n","events_cube.sum_value"],
          |"dimensions":["events_cube.event_type"],
          |"timeDimensions":[{"dimension":"events_cube.ts",
          |  "granularity":"month"}]}""".stripMargin
      val (code, body) = http(port,
        s"/cubejs-api/v1/load?query=${enc(q)}", Some(secret))
      assert(code == 200, body)
      val data = om.readTree(body).get("data")
      val want = ReferenceCubes.eventsCube.query(_ => events,
        Seq("n", "sum_value"), Seq("event_type" -> None, "ts" -> Some("month")))
        .collect()
      assert(data.size() == want.length)
      want.zipWithIndex.foreach { case (row, i) =>
        val r = data.get(i)
        assert(r.get("events_cube.event_type").asText() == row.getString(0))
        assert(r.get("events_cube.ts.month").asText() ==
          row.getAs[java.sql.Date]("ts_month").toString)
        assert(r.get("events_cube.n").asLong() == row.getAs[Long]("n"))
        assert(r.get("events_cube.sum_value").asDouble() ==
          row.getAs[Double]("sum_value"))
      }

      // POST load with a filter + dateRange + limit ≡ the filtered
      // DataFrame rendering
      val types = events.select("event_type").distinct()
        .collect().map(_.getString(0)).sorted
      val pick = types.head
      val dates = events.agg(
        min(to_date(col("ts"))).cast("string"),
        max(to_date(col("ts"))).cast("string")).collect()(0)
      val (from, to) = (dates.getString(0), dates.getString(1))
      val fq =
        s"""{"query":{"measures":["events_cube.n"],
           |"timeDimensions":[{"dimension":"events_cube.ts",
           |  "granularity":"month","dateRange":["$from","$to"]}],
           |"filters":[{"member":"events_cube.event_type",
           |  "operator":"equals","values":["$pick"]}],
           |"limit":3}}""".stripMargin
      val (c2, b2) = http(port, "/cubejs-api/v1/load", Some(secret),
        postBody = Some(fq))
      assert(c2 == 200, b2)
      val d2 = om.readTree(b2).get("data")
      val want2 = ReferenceCubes.eventsCube.query(_ => events, Seq("n"),
        Seq("ts" -> Some("month")),
        filters = Seq(col("event_type") === pick,
          to_date(col("ts")).between(from, to)))
        .limit(3).collect()
      assert(d2.size() == want2.length)
      want2.zipWithIndex.foreach { case (row, i) =>
        assert(d2.get(i).get("events_cube.n").asLong() ==
          row.getAs[Long]("n"))
        assert(d2.get(i).get("events_cube.ts.month").asText() ==
          row.getAs[java.sql.Date]("ts_month").toString)
      }

      // meta lists the cube's members (the first thing a BI tool reads)
      val metaBody = om.readTree(http(port, "/cubejs-api/v1/meta",
        Some(secret))._2)
      val cube0 = metaBody.get("cubes").get(0)
      assert(cube0.get("name").asText() == "events_cube")
      import scala.jdk.CollectionConverters._
      assert(cube0.get("measures").elements().asScala
        .map(_.get("name").asText()).contains("events_cube.sum_value"))

      // malformed queries answer 400, not a hung socket
      assert(http(port, "/cubejs-api/v1/load?query=%7B%7D",
        Some(secret))._1 == 400)
      val twoCubes =
        """{"measures":["a.m","b.m"]}"""
      assert(http(port, s"/cubejs-api/v1/load?query=${enc(twoCubes)}",
        Some(secret))._1 == 400)

      // an over-the-max limit answers 400 (cube.dev caps at 50000);
      // an omitted limit still renders (the default cap, not an
      // unbounded collect)
      val big =
        """{"measures":["events_cube.n"],
          |"dimensions":["events_cube.event_type"],"limit":50001}"""
          .stripMargin
      assert(http(port, s"/cubejs-api/v1/load?query=${enc(big)}",
        Some(secret))._1 == 400)
      val noLimit =
        """{"measures":["events_cube.n"],
          |"dimensions":["events_cube.event_type"]}""".stripMargin
      assert(http(port, s"/cubejs-api/v1/load?query=${enc(noLimit)}",
        Some(secret))._1 == 200)

      // an expired JWT is refused at the socket even though its
      // signature verifies
      val expiredJwt = signedJwt(s"""{"exp":${nowSec - 3600}}""")
      assert(http(port, "/cubejs-api/v1/load?query=%7B%7D",
        Some(s"Bearer $expiredJwt"))._1 == 403)
    } finally server.stop(0)
  }

  private def nowSec: Long = System.currentTimeMillis() / 1000L

  private def signedJwt(payload: String): String = {
    def b64(s: String) = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(s.getBytes(UTF_8))
    val hp = b64("""{"alg":"HS256","typ":"JWT"}""") + "." + b64(payload)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      secret.getBytes(UTF_8), "HmacSHA256"))
    hp + "." + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(mac.doFinal(hp.getBytes(UTF_8)))
  }

  test("JWT time claims: exp and nbf gate a signature-valid token") {
    val clock = () => 1_000_000L
    def ok(payload: String): Boolean =
      CubeRest.authorized(s"Bearer ${signedJwt(payload)}", secret, clock)
    assert(ok("{}"))                           // no time claims → valid
    assert(ok("""{"exp":1000001}"""))          // expires next second
    assert(!ok("""{"exp":1000000}"""))         // exp == now → expired
    assert(!ok("""{"exp":999999}"""))          // past → expired
    assert(ok("""{"nbf":1000000}"""))          // active as of now
    assert(!ok("""{"nbf":1000001}"""))         // not yet valid
    assert(ok("""{"nbf":999000,"exp":1000500}"""))
    assert(!ok("""{"nbf":999000,"exp":999500}"""))
    // a signature over a non-JSON payload fails closed
    assert(!CubeRest.authorized(
      s"Bearer ${signedJwt("not json")}", secret, clock))
    // RFC 7519: exp/nbf must be NumericDate — a present-but-non-numeric
    // claim is a malformed token and fails CLOSED (an issuer bug
    // emitting string timestamps must not mint never-expiring tokens)
    assert(!ok("""{"exp":"999999"}"""))
    assert(!ok("""{"exp":"2000000"}"""))
    assert(!ok("""{"nbf":"0"}"""))
    assert(!ok("""{"exp":true}"""))
    assert(!ok("""{"exp":[1000001]}"""))
  }
}
