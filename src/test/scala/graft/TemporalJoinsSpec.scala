package graft

import graft.operators.{Dedup, TemporalJoins}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantics of the shuffle-minimal temporal joins, pinned against
  * straight-line Scala reference implementations on randomized inputs
  * (seeded) plus handcrafted boundary fixtures — ties at equal
  * timestamps, inclusive-vs-strict edges, window-boundary rows that sit
  * exactly on a bin edge.
  */
class TemporalJoinsSpec extends SparkSpec {

  private case class Ev(id: Long, us: Long, user: Long, kind: String, v: Double)

  private def df(rows: Seq[Ev]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.map(e => (e.id, e.us, e.user, e.kind, e.v))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
      .drop("us")
  }

  // 400 events over 5 users in a 50-instant range: plenty of equal-ts
  // collisions within and across sides
  private lazy val rows: Seq[Ev] = {
    val rnd = new scala.util.Random(42)
    (0L until 400L).map { i =>
      Ev(i, rnd.nextInt(50) * 1000000L, rnd.nextInt(5).toLong,
        if (rnd.nextBoolean()) "click" else "purchase", rnd.nextInt(100).toDouble)
    }
  }

  private def expectedAsOf(strict: Boolean): Map[Long, Option[Long]] = {
    val purchases = rows.filter(_.kind == "purchase")
    rows.filter(_.kind == "click").map { c =>
      val eligible = purchases.filter(p =>
        p.user == c.user && (p.us < c.us || (!strict && p.us == c.us)))
      c.id -> (if (eligible.isEmpty) None
               else Some(eligible.maxBy(p => (p.us, p.id)).id))
    }.toMap
  }

  private def runAsOf(strict: Boolean): Map[Long, Option[Long]] = {
    val e = df(rows)
    TemporalJoins.asOfJoin(
      e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"),
      Seq("user_id"), "ts", "event_id", Seq("value"), strict = strict)
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("r_event_id")).map(_.longValue()))
      .toMap
  }

  test("asOfJoin matches the reference argmax on randomized ties (inclusive)") {
    assert(runAsOf(strict = false) === expectedAsOf(strict = false))
  }

  test("asOfJoin strict excludes the equal-timestamp right row") {
    assert(runAsOf(strict = true) === expectedAsOf(strict = true))
    // the fixture must actually contain a click with a same-instant
    // purchase, or the strict test proves nothing
    val purchases = rows.filter(_.kind == "purchase")
    assert(rows.filter(_.kind == "click").exists(c =>
      purchases.exists(p => p.user == c.user && p.us == c.us)))
  }

  test("asOfJoin: no prior match yields null right columns, left row kept") {
    val fix = Seq(
      Ev(1, 5000000L, 1, "click", 1.0), // before any purchase
      Ev(2, 9000000L, 1, "purchase", 2.0),
      Ev(3, 9500000L, 1, "click", 3.0))
    val out = runOn(fix)
    assert(out === Map(1L -> None, 3L -> Some(2L)))
  }

  test("asOfJoin preserves a genuinely-null right attribute (struct payload)") {
    // newest purchase has value NULL; ignoreNulls must not skip past it
    // to the older purchase's value
    val s = spark
    import s.implicits._
    val left = Seq((10L, 20L, 1L)).toDF("event_id", "us", "user_id")
      .withColumn("ts", timestamp_micros(col("us") * 1000000L)).drop("us")
    val right = Seq((1L, 5L, 1L, Some(7.0)), (2L, 6L, 1L, None))
      .toDF("event_id", "us", "user_id", "value")
      .withColumn("ts", timestamp_micros(col("us") * 1000000L)).drop("us")
    val r = TemporalJoins.asOfJoin(left, right, Seq("user_id"), "ts",
      "event_id", Seq("value")).collect()
    assert(r.length === 1)
    assert(r.head.getAs[java.lang.Long]("r_event_id") === 2L)
    assert(r.head.isNullAt(r.head.fieldIndex("r_value")))
  }

  private def runOn(fix: Seq[Ev]): Map[Long, Option[Long]] = {
    val e = df(fix)
    TemporalJoins.asOfJoin(
      e.filter(col("event_type") === "click"),
      e.filter(col("event_type") === "purchase"),
      Seq("user_id"), "ts", "event_id", Seq("value"))
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("r_event_id")).map(_.longValue()))
      .toMap
  }

  test("rangeJoinBinned equals the reference trailing-window pair set") {
    val w = 10L // seconds
    val left = rows.filter(_.kind == "purchase")
    val right = rows.filter(_.kind == "click")
    val expected = (for {
      l <- left; r <- right
      if r.user == l.user && r.us > l.us - w * 1000000L && r.us <= l.us
    } yield (l.id, r.id)).toSet
    val got = TemporalJoins.rangeJoinBinned(
      df(left), df(right), Seq("user_id"), "ts", "ts", w)
      .select(col("l_event_id"), col("r_event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("rangeJoinBinned boundary rows: bin-edge and window-edge exactness") {
    val w = 10L
    // right rows at exactly l.ts (in), exactly l.ts - w (out, half-open),
    // just inside the excluded edge, and across a bin boundary (l at
    // t=20s probes bins [20,30) and [10,20); r at 19.999999s matches)
    val left = Seq(Ev(100, 20000000L, 1, "purchase", 0))
    val right = Seq(
      Ev(1, 20000000L, 1, "click", 0), // == l.ts       -> in
      Ev(2, 10000000L, 1, "click", 0), // == l.ts - w   -> out
      Ev(3, 10000001L, 1, "click", 0), // just inside   -> in
      Ev(4, 19999999L, 1, "click", 0), // previous bin  -> in
      Ev(5, 20000001L, 1, "click", 0), // future        -> out
      Ev(6, 15000000L, 2, "click", 0)) // other key     -> out
    val got = TemporalJoins.rangeJoinBinned(
      df(left), df(right), Seq("user_id"), "ts", "ts", w)
      .select(col("r_event_id")).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 4L))
  }

  test("repeatedSpans finds the cross-doc 8-gram and respects minDocs") {
    val s = spark
    import s.implicits._
    val shared = "one two three four five six seven eight"
    val docs = Seq(
      (0L, s"prefix $shared suffix stuff here"),
      (1L, s"Other lead-in $shared trailing words"), // shares via lower()
      (2L, "a doc with no overlap at all in any span of eight tokens"),
      (3L, "short doc seven tokens only here now"), // < 8 tokens: nothing
      (4L, s"$shared $shared")) // within-doc repeat: occurrences add up
      .toDF("doc_id", "text")
    val r = Dedup.repeatedSpans(docs, "text", "doc_id", width = 8, minDocs = 2)
      .collect()
      .map(x => x.getAs[String]("span") ->
        (x.getAs[Long]("n_docs"), x.getAs[Long]("n_total"))).toMap
    assert(r.contains(shared))
    assert(r(shared)._1 === 3L) // docs 0, 1, 4
    assert(r(shared)._2 === 4L) // doc 4 contains it twice
    // every reported span must really span >= 2 docs
    assert(r.values.forall(_._1 >= 2L))
  }

  test("repeatedSpansHashed equals the text-keyed form on real testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getAs[String]("span"), x.getAs[Long]("n_docs"),
        x.getAs[Long]("n_total"))).toSet
    val exact = rows(Dedup.repeatedSpans(docs, "text", "doc_id", 8, 2))
    val hashed = rows(Dedup.repeatedSpansHashed(docs, "text", "doc_id", 8, 2))
    assert(exact === hashed)
    assert(exact.nonEmpty)
  }
}
