package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import graft.plugs.{Podping, Polls}
import graft.serving.HttpApi

/** End-to-end HTTP serving: real sockets, real queries over plug-derived
  * tables (E1 lifecycle: HTTP -> validate -> DataFrame plan -> collect ->
  * shaped JSON).
  */
class HttpApiSpec extends SparkSpec {
  import Fixtures._

  private lazy val fixture = opLog(spark, Seq(
    op(1, 100, 0, "2024-01-01 00:00:00", "podping",
      podpingV03(Seq("https://a.example/feed", "https://b.example/feed"))),
    op(2, 101, 0, "2024-01-01 00:00:03", "podping",
      podpingV03(Seq("https://a.example/feed"))),
    op(3, 102, 0, "2024-01-01 00:00:06", "polls",
      pollCreate("color", "Best color?", Seq("red", "blue"),
        "2024-06-01 00:00:00", "colors"), postingAuth = "alice"),
    op(4, 103, 0, "2024-01-01 01:00:00", "polls",
      pollVote("alice", "color", 2), postingAuth = "bob")))

  private lazy val (api, port) = {
    val pod = Podping.transform(fixture)
    val pol = Polls.transform(fixture)
    val api = new HttpApi(
      tables = Map(
        "podping_updates" -> pod("updates"), "podping_ops" -> pod("ops"),
        "polls_content" -> pol("content"), "polls_votes" -> pol("votes")),
      now = () => ts("2024-01-15 00:00:00"))
    (api, api.start())
  }

  private val client = HttpClient.newHttpClient()
  private def get(path: String): (Int, String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  test("GET /api returns status") {
    val (code, body) = get("/api")
    assert(code === 200 && body.contains("\"status\""))
  }

  test("podping counts over default window, shaped JSON") {
    val (code, body) = get("/api/podping/history/counts")
    assert(code === 200)
    assert(body.contains("\"url\": \"https://a.example/feed\""))
    assert(body.contains("\"url_count\": 2"))
  }

  test("podping latest for a url includes hex trx id and ISO timestamps") {
    val (code, body) = get("/api/podping/feeds/latest?url=https%3A%2F%2Fa.example%2Ffeed")
    assert(code === 200)
    assert(body.contains("\"created\": \"2024-01-01T00:00:0"))
    assert(body.contains("\"trx_id\""))
  }

  test("polls flow: active, summary, votes") {
    val (c1, active) = get("/api/polls/active")
    assert(c1 === 200 && active.contains("\"permlink\": \"color\""))
    val (c2, summary) = get("/api/polls/summary?author=alice&permlink=color")
    assert(c2 === 200 && summary.contains("\"parsed_answer\": \"blue\"") &&
      summary.contains("\"votes\": 1"))
    val (c3, votes) = get("/api/polls/votes?author=alice&permlink=color")
    assert(c3 === 200 && votes.contains("\"account\": \"bob\""))
  }

  test("validation: missing and over-long params get 400, unknown route 400") {
    assert(get("/api/polls/summary?permlink=color")._1 === 400)
    assert(get(s"/api/polls/user?author=${"a" * 20}")._1 === 400)
    assert(get("/api/nope")._1 === 400)
  }

  override def afterAll(): Unit = { api.stop(); super.afterAll() }
}
