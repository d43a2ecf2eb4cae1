package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators in their shuffle-minimal formulations: as-of
  * (latest-prior match per key) and bounded-range (all matches within a
  * trailing time window). Neither exists as a Spark builtin; the naive SQL
  * spellings — a correlated argmax subquery, or a `JOIN ... ON key AND
  * r.t BETWEEN l.t - w AND l.t` inequality join — plan into per-key row
  * explosions (O(|all prior matches|) intermediates plus a second shuffle
  * for the argmax) or, without the equi key, a BroadcastNestedLoopJoin.
  * Both formulations here stay equi-shuffled and linear per key, which is
  * the difference that matters at 100 TB.
  */
object TemporalJoins {

  /** As-of join: attach to each `left` row the single most recent `right`
    * row with the same key and `right.timeCol <= left.timeCol`
    * (`strict = true` makes the comparison `<`). Ties among right rows at
    * the same instant resolve to the largest `tieCol`; rows with no prior
    * match keep null right columns (left-outer semantics). `timeCol` and
    * `tieCol` must exist on both inputs; right payload columns arrive
    * prefixed with `prefix`.
    *
    * Formulation: tagged union + ONE running-frame window — not a range
    * join. Both inputs shuffle once on the key; within each key partition
    * a single ordered pass carries the latest right payload forward
    * (`last(_, ignoreNulls)` over `rowsBetween(unboundedPreceding,
    * currentRow)` — Spark's UnboundedPrecedingWindowFunctionFrame
    * evaluates that frame incrementally, O(rows), never rescanning the
    * frame per row). The payload rides in ONE struct so a genuinely-null
    * right attribute is preserved rather than skipped past by
    * `ignoreNulls` (the struct itself is non-null for every right row).
    *
    * Inclusive-vs-strict is an ORDER, not a filter: at equal time the
    * right row sorts before the left row (inclusive) or after it
    * (strict), so the window frame naturally contains or excludes it.
    *
    * Skew: one hot key lands in one window partition — same failure class
    * as any keyed window, and AQE cannot split a window partition. A
    * pathological key wants a pre-reduction (keep only the latest right
    * row per (key, coarse time bucket) first, which this formulation
    * composes with); that is a documented escalation, not a silent
    * default, because it changes no results only when buckets are chosen
    * >= the left span.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               timeCol: String, tieCol: String, rightCols: Seq[String],
               prefix: String = "r_", strict: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "asOfJoin needs at least one key column")
    val (sideLeft, sideRight) = if (strict) (0, 1) else (1, 0)
    val lSchema = left.schema
    val leftData = left.columns.filterNot(keyCols.contains).toSeq
    val payload = struct((tieCol +: rightCols).map(col): _*)
    val pType = right.select(payload.as("_p")).schema("_p").dataType

    val lSide = left.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("_t"), lit(sideLeft).as("_side"),
        col(tieCol).as("_tie"), lit(null).cast(pType).as("_p")) ++
        leftData.map(col): _*)
    val rSide = right.select(
      keyCols.map(col) ++ Seq(
        col(timeCol).as("_t"), lit(sideRight).as("_side"),
        col(tieCol).as("_tie"), payload.as("_p")) ++
        leftData.map(c => lit(null).cast(lSchema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === sideLeft)
      .select(keyCols.map(col) ++ leftData.map(col) ++
        (tieCol +: rightCols).map(c => col("_m").getField(c).as(prefix + c)): _*)
  }

  /** Bounded-range join: every (left, right) pair with equal keys and
    * `right.rightTime` in the half-open trailing window
    * `(left.leftTime - windowSec, left.leftTime]`. Inner pairs only —
    * compose an outer count with a follow-up left join against the left
    * table (both gate and spec do), which keeps this operator free of the
    * exploded-left-row dedup an outer binned join would need.
    *
    * Formulation: time-binned equi join. Right rows key to
    * `(keys, floor(t / windowSec))`; each left row probes its own bin and
    * the previous one — two candidate bins cover any trailing window of
    * length <= the bin width — and a residual filter trims the edges.
    * The join is a plain equi shuffle on (keys, bin), so Catalyst picks
    * SMJ / shuffled-hash / broadcast from sizes as usual, instead of the
    * BroadcastNestedLoopJoin a raw inequality join degenerates to. Cost is
    * O(pairs-within-2-bins), not O(pairs-per-key): at 100 TB with
    * time-partitioned storage the bin key also prunes input partitions.
    *
    * Each matching pair is produced exactly once (a right row lives in one
    * bin; the probe that equals that bin is unique per left row).
    * Output: key columns unprefixed, left columns `l_`-, right `r_`-
    * prefixed.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTime: String, rightTime: String,
                      windowSec: Long): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val binUs = windowSec * 1000000L
    // The join key is the bin's START in epoch micros (t - t mod width):
    // pure long arithmetic, exact for any sign — no division, and no
    // double quotient to misround exactly at a bin boundary.
    def floorBin(c: org.apache.spark.sql.Column) = {
      val us = unix_micros(c)
      us - pmod(us, lit(binUs))
    }
    val lb = left.select(
      keyCols.map(col) ++
        left.columns.filterNot(keyCols.contains).map(c => col(c).as("l_" + c)) :+
        explode(array(floorBin(col(leftTime)),
          floorBin(col(leftTime)) - binUs)).as("_bin"): _*)
    val rb = right.select(
      keyCols.map(col) ++
        right.columns.filterNot(keyCols.contains).map(c => col(c).as("r_" + c)) :+
        floorBin(col(rightTime)).as("_bin"): _*)
    val lUs = unix_micros(col("l_" + leftTime))
    val rUs = unix_micros(col("r_" + rightTime))
    lb.join(rb, keyCols :+ "_bin")
      .filter(rUs > lUs - binUs && rUs <= lUs)
      .drop("_bin")
  }
}
