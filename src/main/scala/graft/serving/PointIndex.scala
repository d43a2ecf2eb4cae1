package graft.serving

import org.apache.spark.sql.{DataFrame, Row}

/** Per-data-epoch in-heap point-lookup index over a BOUNDED derived
  * serving table — the engine-side analogue of the B-tree the reference
  * keeps in Postgres (its API reads are all indexed point lookups:
  * `plugs/podping/podping.py:30-39` `WHERE url = ...`,
  * `plugs/polls/polls.py:59-84` `WHERE author = ... AND permlink = ...`).
  * A Spark plan has no point-read primitive: every fresh-params request
  * pays Catalyst + a distributed scan job, which is exactly the measured
  * unique-params serving envelope (tools/ServeBench `uniq`: p99 ~6 s at
  * 50 clients — each request's plan is cheap, but 1000 distinct requests
  * through a cores/2 admission gate is throughput-bound on job launch).
  * The index inverts that: ONE distributed job per data epoch computes
  * the route's query for EVERY key at once, the driver holds the result
  * as a hash map, and each point lookup is O(1) heap reads — no plan, no
  * job, no gate pressure.
  *
  * Correctness contract (pinned byte-equal per route by HttpApiSpec):
  * the build query IS the route's query with the key filter dropped.
  * Filtering on the key commutes exactly with every upstream operator
  * the routes use — equi joins on key-independent columns, per-key
  * windows, per-key aggregates — so per-key rows are value-identical to
  * the fallback's. For a route with a deterministic response ORDER, the
  * per-key order is produced by Spark too: the build plan ends in a
  * global `ORDER BY (key, route-order)`, and the driver groups rows in
  * collect order (collect preserves a sorted plan's order), so ordering
  * semantics — collation, null placement, ties — are decided by the
  * same engine that serves the fallback path; the driver never compares
  * values itself. A build MAY omit the sort only when per-key order
  * cannot matter: existence-only keysets, and keys that are UNIQUE in
  * the source by construction (at most one row per key — each such
  * build site documents the uniqueness invariant it leans on).
  *
  * Scale contract: the index only exists BELOW `maxRows` collected rows
  * (the build collects `maxRows + 1` under a plan-side limit — bounded
  * driver memory even against a corrupt/unbounded table). Above the cap
  * the epoch is marked unindexable and every lookup returns None — the
  * route falls back to its per-request distributed plan. Derived plug
  * state (polls, podping feeds) is bounded by entity counts, not corpus
  * bytes — the same thing the reference materializes in Postgres — so
  * at 100 TB the cap trips only if a table outgrows what ANY
  * single-node serving tier could hold, and the distributed path is
  * still there when it does.
  *
  * Concurrency: one builder per epoch (double-checked under the lock);
  * concurrent requests during a rebuild wait on the builder rather than
  * racing duplicate jobs (the same convoy the request-coalescing layer
  * kills for identical URIs). A data rewrite bumps
  * [[graft.core.Tables.epoch]], which lazily invalidates — the first
  * lookup of the new epoch rebuilds.
  */
final class PointIndex(
    val name: String,
    build: () => DataFrame,
    keyOf: Row => String,
    maxRows: Int) {

  // (epoch, Some(map)) = live for that epoch; (epoch, None) = over cap /
  // disabled for that epoch (fall back); epoch Long.MinValue = never built
  @volatile private var state: (Long, Option[Map[String, IndexedSeq[Row]]]) =
    (Long.MinValue, None)

  private[graft] val builds = new java.util.concurrent.atomic.AtomicLong
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong

  /** Some(rows) — possibly empty — when the index is live for the current
    * data epoch (the index is COMPLETE, so an absent key means an empty
    * result, not a miss); None when disabled or over cap (caller must run
    * its fallback plan).
    */
  def lookup(key: String): Option[IndexedSeq[Row]] = {
    if (maxRows <= 0) return None
    var s = state
    if (s._1 != graft.core.Tables.epoch) synchronized {
      // re-read the epoch UNDER the lock: a waiter that blocked on the
      // monitor while another thread already rebuilt for a NEWER epoch
      // must not compare against its stale pre-lock epoch — it would
      // rebuild again and regress state backward (serving current data
      // labeled with an old epoch, forcing yet another rebuild)
      val cur = graft.core.Tables.epoch
      s = state
      if (s._1 != cur) {
        s = (cur, doBuild())
        state = s
      }
    }
    s._2.map { m =>
      hits.incrementAndGet()
      m.getOrElse(key, PointIndex.Empty)
    }
  }

  private def doBuild(): Option[Map[String, IndexedSeq[Row]]] =
    try {
      builds.incrementAndGet()
      val rows = build().limit(maxRows + 1).collect()
      if (rows.length > maxRows) None
      else {
        // collect order IS the build plan's (key, route-order) sort:
        // appending per key preserves the route's per-key order exactly
        val m = scala.collection.mutable.LinkedHashMap
          .empty[String, scala.collection.mutable.ArrayBuffer[Row]]
        rows.foreach(r =>
          m.getOrElseUpdate(keyOf(r), scala.collection.mutable.ArrayBuffer.empty) += r)
        Some(m.map { case (k, v) => (k, v.toIndexedSeq) }.toMap)
      }
    } catch {
      // a failed build must degrade to the fallback path, not poison the
      // route: mark this epoch unindexable and let requests run Spark
      case _: Throwable => None
    }
}

object PointIndex {
  private val Empty: IndexedSeq[Row] = IndexedSeq.empty

  /** Unambiguous composite key, same escaping contract as the serving
    * plan-cache key: each part URL-encoded before joining so a '/'
    * inside one param can never collide two distinct composites.
    */
  def key(parts: String*): String =
    parts.map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("/")
}
