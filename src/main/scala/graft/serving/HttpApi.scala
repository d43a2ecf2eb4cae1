package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, Row}

/** HTTP serving layer (reference: FastAPI endpoints in server/serve.py +
  * server/plug_endpoints/). Zero-dependency (JDK HttpServer); each route
  * validates params (§2.9), builds the DataFrame query against the
  * engine's derived tables, collects, and shapes JSON with the
  * reference's type normalization (timestamps as `%Y-%m-%dT%H:%M:%S`).
  *
  * Routes (mirroring the reference API):
  *   GET /api                               — sync status (E3)
  *   GET /api/podping/history/counts        — url counts over a block range
  *   GET /api/podping/feeds/latest?url=     — latest-N pings for a url
  *   GET /api/polls/active                  — live polls
  *   GET /api/polls/summary?author&permlink — per-answer distinct voters
  *   GET /api/polls/votes?author&permlink   — full vote list
  *   GET /api/polls/user?author             — a user's polls
  *   GET /api/polls/tag?tag                 — polls by tag
  */
class HttpApi(
    tables: Map[String, DataFrame],
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    statusFn: () => Map[String, Any] = () => Map("status" -> "GOOD")) {

  /** Default query window constants (reference: podping.py:14-37). */
  val DefaultCountsWindow: Long = 864000L
  val DefaultLimit = 20

  private var server: HttpServer = _

  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ------------------------------------------------------------------ routes

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath
      val q = parseQuery(Option(ex.getRequestURI.getQuery).getOrElse(""))
      val result: Either[String, String] = path match {
        case "/api" => Right(JsonOut.obj(statusFn()))
        case "/api/podping/history/counts" => podpingCounts(q)
        case "/api/podping/feeds/latest" => podpingLatest(q)
        case "/api/polls/active" => Right(rowsJson(
          PollsQueries.activePolls(tables("polls_content"), now())))
        case "/api/polls/summary" => pollsSummary(q)
        case "/api/polls/votes" => pollsVotes(q)
        case "/api/polls/user" =>
          withParam(q, "author")(a => ApiShaping.validateAuthor(a).map(author =>
            rowsJson(PollsQueries.userPolls(tables("polls_content"), author))))
        case "/api/polls/tag" =>
          withParam(q, "tag")(t => Right(rowsJson(
            PollsQueries.pollsByTag(tables("polls_content"), t))))
        case _ => Left(s"unknown route: $path")
      }
      result match {
        case Right(body) => respond(ex, 200, body)
        case Left(err)   => respond(ex, 400, JsonOut.obj(Map("error" -> err)))
      }
    } catch {
      case e: Throwable =>
        respond(ex, 500, JsonOut.obj(Map("error" -> String.valueOf(e.getMessage))))
    }

  private def podpingCounts(q: Map[String, String]): Either[String, String] = {
    val updates = tables("podping_updates")
    val head = graft.core.OpLog.headBlock(
      updates.select(org.apache.spark.sql.functions.col("block_num"))).getOrElse(0L)
    val last = q.get("block_range_high").map(_.toLong).getOrElse(head)
    val first = q.get("block_range_low").map(_.toLong)
      .getOrElse(math.max(0L, last - DefaultCountsWindow))
    val limit = q.get("limit").map(_.toInt).getOrElse(DefaultLimit)
    ApiShaping.validateBlockRange(first, last).map { case (lo, hi) =>
      rowsJson(PodpingQueries.urlCounts(updates, lo, hi, limit))
    }
  }

  private def podpingLatest(q: Map[String, String]): Either[String, String] =
    withParam(q, "url") { url =>
      val limit = q.get("limit").map(_.toInt).getOrElse(5)
      Right(rowsJson(PodpingQueries.feedUpdates(
        tables("podping_updates"), tables("podping_ops"), url, limit)))
    }

  private def pollsSummary(q: Map[String, String]): Either[String, String] =
    withParam(q, "author") { a =>
      withParam(q, "permlink") { p =>
        for {
          author <- ApiShaping.validateAuthor(a)
          permlink <- ApiShaping.validatePermlink(p)
        } yield {
          import org.apache.spark.sql.functions.col
          rowsJson(PollsQueries.pollSummary(
            tables("polls_content"), tables("polls_votes"))
            .filter(col("author") === author && col("permlink") === permlink))
        }
      }
    }

  private def pollsVotes(q: Map[String, String]): Either[String, String] =
    withParam(q, "author") { a =>
      withParam(q, "permlink") { p =>
        for {
          author <- ApiShaping.validateAuthor(a)
          permlink <- ApiShaping.validatePermlink(p)
        } yield rowsJson(PollsQueries.pollVotes(
          tables("polls_content"), tables("polls_votes"), author, permlink))
      }
    }

  // ------------------------------------------------------------------ utils

  private def withParam(q: Map[String, String], name: String)(
      f: String => Either[String, String]): Either[String, String] =
    q.get(name).filter(_.nonEmpty).toRight(s"missing required param: $name").flatMap(f)

  private def parseQuery(s: String): Map[String, String] =
    s.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, "UTF-8")
    }.toMap

  /** Collect + shape: list of {col: normalized value} objects (the
    * reference's populate_by_schema + normalize_types, tools.py:51-74).
    */
  private def rowsJson(df: DataFrame): String = {
    val cols = df.columns.toSeq
    val rows = df.collect().toSeq.map { r: Row =>
      ApiShaping.populateBySchema(r.toSeq, cols)
    }
    JsonOut.arr(rows.map(m => JsonOut.obj(m, cols)))
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}

object HttpApi {
  /** Status function composing the health listener and plug-state cursors
    * into the reference's sync-status shape (server/system_status.py:12-29):
    * overall GOOD/BAD plus per-plug latest block and batch.
    */
  def statusFrom(health: graft.streaming.StreamHealth,
                 spark: org.apache.spark.sql.SparkSession,
                 outDir: String, plugs: Seq[String]): () => Map[String, Any] = () => {
    val (overall, _) = health.sync_status()
    val plugStates = plugs.map { p =>
      graft.streaming.PlugState.latest(spark, outDir, p) match {
        case Some((batchId, block)) =>
          p -> Map("latest_block_num" -> block, "batch_id" -> batchId)
        case None => p -> Map("latest_block_num" -> null, "batch_id" -> null)
      }
    }.toMap
    Map("status" -> overall, "plugs" -> plugStates)
  }
}

/** Minimal JSON writer (no deps). */
object JsonOut {
  def str(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def value(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => n.toString
    case n: Double => n.toString
    case s: Seq[_] => arr(s.map(value))
    case a: Array[_] => arr(a.toSeq.map(value))
    case m: Map[_, _] => obj(m.map { case (k, x) => String.valueOf(k) -> x })
    case other => str(String.valueOf(other))
  }

  def arr(items: Seq[String]): String = items.mkString("[", ",", "]")

  def obj(m: Map[String, Any], order: Seq[String] = Seq.empty): String = {
    val keys = if (order.nonEmpty) order.filter(m.contains) else m.keys.toSeq
    keys.map(k => s"${str(k)}: ${value(m(k))}").mkString("{", ",", "}")
  }
}
