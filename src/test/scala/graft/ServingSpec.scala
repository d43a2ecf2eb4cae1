package graft

import java.sql.Timestamp
import graft.serving.ApiShaping._
import org.scalatest.funsuite.AnyFunSuite

class ServingSpec extends AnyFunSuite {

  test("boot config: fixture ini loads the six reference fields") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    val ini = dir.resolve("config.ini")
    java.nio.file.Files.writeString(ini,
      "db_host=localhost\ndb_name=haf\ndb_username=postgres\n" +
        "db_password=p=w\nserver_host=127.0.0.2\nserver_port=8080\n")
    val cfg = graft.core.GraftConfig.load(ini.toString).fold(e => fail(e), identity)
    assert(cfg.dbHost === "localhost" && cfg.dbName === "haf")
    assert(cfg.dbPassword === "p=w") // split on FIRST '=' only
    assert(cfg.serverHost === "127.0.0.2" && cfg.serverPort === 8080)
    assert(cfg.jdbcUrl === "jdbc:postgresql://localhost/haf")
    assert(cfg.jdbcProps === Map("user" -> "postgres", "password" -> "p=w"))
  }

  test("boot config: unknown keys rejected; missing file writes a blank template") {
    assert(graft.core.GraftConfig.parse("nonsense_key=1\n").isLeft)
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg")
    val ini = dir.resolve("config.ini")
    val r = graft.core.GraftConfig.load(ini.toString)
    assert(r.isLeft) // refuse to boot, like config.py's create-and-exit
    val written = java.nio.file.Files.readString(ini)
    graft.core.GraftConfig.Fields.foreach(f =>
      assert(written.contains(s"$f="), s"template missing $f"))
    // the blank template round-trips (empty values, all keys valid)
    assert(graft.core.GraftConfig.load(ini.toString).isRight)
  }

  test("slug: ampersand, accumulation cap, charset strip") {
    assert(slug("What do you think?") === "what-do-you-think")
    assert(slug("Cats & Dogs") === "cats-and-dogs")
    assert(slug("A very long question that keeps going and going forever")
      .length <= 32)
    // dropped tokens leave their joiner hyphens behind — faithful to the
    // reference's re.sub(r'[^a-z-]+','') which strips chars, not hyphens
    assert(slug("Price $1.00 or $2.50?") === "price--or-")
  }

  test("uniqueSlug appends -n on collision") {
    val taken = Set("what-do-you-think", "what-do-you-think-2")
    assert(uniqueSlug("What do you think?", taken.contains) === "what-do-you-think-3")
    assert(uniqueSlug("Fresh question", taken.contains) === "fresh-question")
  }

  test("rangeSplit chunks inclusively (the 100-block massive-sync chunker)") {
    assert(rangeSplit(1, 250, 100) === Seq((1L, 100L), (101L, 200L), (201L, 250L)))
    assert(rangeSplit(5, 5, 100) === Seq((5L, 5L)))
  }

  test("normalizeValue: decimal->double, timestamp->ISO seconds, bytes->hex") {
    assert(normalizeValue(new java.math.BigDecimal("1.50")) === 1.5)
    assert(normalizeValue(Timestamp.valueOf("2024-01-02 03:04:05.678")) ===
      "2024-01-02T03:04:05")
    assert(normalizeValue(Array[Byte](0x0a, 0x7f)) === "0a7f")
  }

  test("populateBySchema zips positionally") {
    assert(populateBySchema(Seq(1L, "x"), Seq("id", "name")) ===
      Map("id" -> 1L, "name" -> "x"))
  }

  test("validators enforce reference length limits") {
    assert(validateAuthor("imwatsi").isRight)
    assert(validateAuthor("a-name-longer-than-16").isLeft)
    assert(validatePermlink("p" * 255).isRight && validatePermlink("p" * 256).isLeft)
    assert(validateBlockRange(10, 5).isLeft)
  }

  test("timeSince uses total seconds (not the reference's .seconds bug)") {
    val a = Timestamp.valueOf("2024-01-01 00:00:00")
    val b = Timestamp.valueOf("2024-01-02 00:00:30") // >1 day
    assert(timeSinceSeconds(a, b) === 86430L)
  }

  test("key-set validators: required present, nothing outside allowed") {
    val payload = Map[String, Any]("permlink" -> "p", "question" -> "q")
    assert(checkRequiredKeys(payload, Set("permlink")).isRight)
    assert(checkRequiredKeys(payload, Set("permlink", "answers"))
      === Left("missing required keys: answers"))
    assert(checkAllowedKeys(payload, Set("permlink", "question", "tag")).isRight)
    assert(checkAllowedKeys(payload, Set("permlink"))
      === Left("unexpected keys: question"))
  }
}
