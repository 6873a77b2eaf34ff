package graft.serve

import graft.SparkSpec
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end HTTP tests: a real server on an ephemeral localhost port, a
  * real JDK HttpClient — the reference's notebook probe
  * (FinalProject.ipynb cell-2: POST {table, limit:50} → 50 rows) replayed
  * against the engine. */
class HttpQueryServerSpec extends SparkSpec {
  import spark.implicits._

  private lazy val client = HttpClient.newHttpClient()

  private def post(port: Int, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/get_data"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def withServer(maxLimit: Int = 1000)(f: Int => Unit): Unit = {
    val svc = QueryService.overParquetDir(spark, "/root/testdata/sf0.001",
      Seq("nation", "orders"), Map("nation" -> Seq("n_nationkey"),
        "orders" -> Seq("o_orderkey")))
    val srv = new HttpQueryServer(svc, maxLimit)
    val port = srv.start()
    try f(port) finally srv.stop()
  }

  test("golden probe: POST {table, limit:50} returns exactly 50 ordered rows") {
    withServer() { port =>
      val r = post(port, """{"table": "orders", "limit": 50}""")
      assert(r.statusCode() === 200)
      assert(r.headers().firstValue("Content-Type").orElse("")
        .startsWith("application/json"))
      assert(r.body().contains(""""limit_applied":50"""))
      assert(r.body().contains(""""o_orderkey""""))
      // 50 row objects, each carrying the sort key as a field
      assert(raw""""o_orderkey":""".r.findAllIn(r.body()).size === 50)
      // deterministic order: the first row is the smallest key
      assert(r.body().contains(""""rows":[{"o_orderkey":0,"""))
    }
  }

  test("quoted limit (the reference client sends strings) still works") {
    withServer() { port =>
      val r = post(port, """{"table": "nation", "limit": "3"}""")
      assert(r.statusCode() === 200)
      assert(r.body().contains(""""limit_applied":3"""))
    }
  }

  test("limit is capped at maxLimit — no unbounded collect") {
    withServer(maxLimit = 5) { port =>
      val r = post(port, """{"table": "orders", "limit": 999999}""")
      assert(r.statusCode() === 200)
      assert(r.body().contains(""""limit_applied":5"""))
    }
  }

  test("unknown table is a 400 with the whitelist, not SQL or a stack trace") {
    withServer() { port =>
      val r = post(port, """{"table": "final_project_secrets", "limit": 5}""")
      assert(r.statusCode() === 400)
      assert(r.body().contains("known: nation, orders"))
    }
  }

  test("malformed body / injection-shaped table / wrong method rejected") {
    withServer() { port =>
      assert(post(port, """{"limit": 5}""").statusCode() === 400)
      // quoting/semicolons don't match the identifier pattern — the
      // injection string never even reaches the registry lookup
      assert(post(port, """{"table": "x; DROP TABLE y", "limit": 5}""")
        .statusCode() === 400)
      val get = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/get_data"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() === 405)
    }
  }
}
