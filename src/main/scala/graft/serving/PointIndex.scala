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
  * Concurrency: rebuilds never run on a request thread. At an epoch roll
  * the first lookup triggers ONE background builder (single-flight CAS)
  * and requests keep serving the PREVIOUS epoch's map until the build
  * lands — bounded staleness (the build latency after the roll, normally
  * well under an ingest interval), the same contract as the serving
  * layer's 1-second clock snap. The earlier design built inline under
  * the instance monitor, which convoyed every keyed request for the
  * route behind one distributed job at each epoch roll — with all
  * admission-gate seats pinned behind the build, unrelated routes could
  * shed 503 for its duration. When NO prior map exists (first epoch
  * ever, or the prior epoch was over cap), lookups return None and the
  * route runs its per-request plan until the background build completes
  * — a request never waits on a build. A data rewrite bumps
  * [[graft.core.Tables.epoch]], which lazily invalidates — the first
  * lookup of the new epoch triggers the rebuild.
  */
final class PointIndex(
    val name: String,
    build: () => DataFrame,
    keyOf: Row => String,
    maxRows: Int,
    buildDeadlineMs: Long = 10L * 60 * 1000) {

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[PointIndex])

  // (epoch, Some(map)) = live for that epoch; (epoch, None) = over cap /
  // build failed for that epoch (fall back); epoch Long.MinValue = never
  // built. Writes: the background builder only, under commitLock.
  @volatile private var state: (Long, Option[Map[String, IndexedSeq[Row]]]) =
    (Long.MinValue, None)

  // single-flight token: Long.MinValue = idle; otherwise the running
  // builder's start-nanos, which doubles as (a) the watchdog's deadline
  // clock and (b) the builder's COMMIT TOKEN — a build whose token was
  // stolen by the watchdog (hung past buildDeadlineMs) can neither write
  // state nor release the flag, so a zombie builder finishing late can
  // never regress the index to an older epoch
  private val building =
    new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
  private val commitLock = new Object
  @volatile private var builderThread: Thread = _

  private[graft] val builds = new java.util.concurrent.atomic.AtomicLong
  private[graft] val hits = new java.util.concurrent.atomic.AtomicLong

  /** Some(rows) — possibly empty — when the index is live for the current
    * OR (during a rebuild) the previous data epoch; an absent key means an
    * empty result, not a miss, because the map is COMPLETE for its epoch.
    * None when disabled, over cap, or no epoch has ever been indexed
    * (caller must run its fallback plan).
    */
  def lookup(key: String): Option[IndexedSeq[Row]] = {
    if (maxRows <= 0) return None
    val s = state
    if (s._1 != graft.core.Tables.epoch) triggerRebuild()
    // serve whatever map exists — current epoch's, or the prior epoch's
    // while the rebuild is in flight. A prior-epoch None (over cap /
    // failed / never built) falls back to the per-request plan.
    s._2.map { m =>
      hits.incrementAndGet()
      m.getOrElse(key, PointIndex.Empty)
    }
  }

  /** Start ONE background build for the current epoch if none is running.
    * CAS single-flight: concurrent lookups at a roll race the CAS, one
    * wins, the rest serve stale and move on. The TARGET epoch is read
    * AFTER winning the CAS — a pre-CAS target could be stale (thread
    * stalls across a roll while another builder lands the newer epoch),
    * and building for it would regress state backward and force yet
    * another full rebuild.
    */
  private def triggerRebuild(): Unit = {
    val now = System.nanoTime()
    val token = if (now == Long.MinValue) now + 1 else now
    if (building.compareAndSet(Long.MinValue, token)) {
      val target = graft.core.Tables.epoch
      if (state._1 == target) { building.set(Long.MinValue); return }
      val t = new Thread(() => {
        // the spawning request thread's Spark local properties are
        // INHERITED (InheritableThreadLocal) — including its per-handler
        // FAIR pool, inside which jobs run FIFO: left in place, the
        // multi-second build would convoy that handler's later request
        // jobs. Re-pool the build into its own name so FAIR isolates it
        // (inert under FIFO), and tag a cancellable JOB GROUP so the
        // watchdog can kill a hung build's distributed work, not just
        // interrupt its driver thread.
        org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
          .foreach { sp =>
            sp.sparkContext.setLocalProperty(
              "spark.scheduler.pool", "graft-index-build")
            sp.sparkContext.setJobGroup(jobGroup(token),
              s"graft point index build: $name", interruptOnCancel = true)
          }
        // a FATAL build error (driver OOM on the capped collect) must
        // still mark the epoch unindexable before propagating — state
        // left stale would re-trigger the same fatal build on every
        // subsequent lookup, a crash loop of heavy jobs; NonFatal and
        // interrupts are already absorbed to None inside doBuild. Every
        // commit is TOKEN-GUARDED under commitLock: a builder whose
        // token the watchdog stole is a zombie — it must neither write
        // state (epoch regression) nor release a flag it no longer owns.
        val result = try Right(doBuild()) catch { case fatal: Throwable => Left(fatal) }
        commitLock.synchronized {
          if (building.get() == token) {
            state = (target, result.getOrElse(None))
            building.set(Long.MinValue)
          }
        }
        result.left.foreach(throw _)
      }, s"graft-point-index-$name")
      t.setDaemon(true)
      builderThread = t
      t.start()
    } else watchdog(now)
  }

  private def jobGroup(token: Long) = s"graft-point-index-$name-$token"

  /** Reclaim a build that has been running past [[buildDeadlineMs]]: a
    * hung distributed job would otherwise hold the single-flight flag
    * forever — no future rebuild could start and lookups would serve the
    * previous epoch's map indefinitely (unbounded staleness). The steal
    * invalidates the straggler's commit token FIRST (so it can never
    * regress state), then interrupts its thread and cancels its job
    * group; the NEXT trigger starts a fresh build.
    */
  private def watchdog(now: Long): Unit = {
    val cur = building.get()
    if (cur != Long.MinValue && now - cur > buildDeadlineMs * 1000000L) {
      commitLock.synchronized {
        if (building.get() == cur) {
          log.warn(s"point index '$name' build exceeded ${buildDeadlineMs} ms; " +
            "reclaiming single-flight, interrupting the straggler, and " +
            "cancelling its job group")
          building.set(Long.MinValue)
          Option(builderThread).foreach(_.interrupt())
          org.apache.spark.sql.SparkSession.getActiveSession
            .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
            .foreach(_.sparkContext.cancelJobGroup(jobGroup(cur)))
        }
      }
    }
  }

  /** Block until the index state is current for the data epoch (build
    * finished — live OR marked over-cap), triggering the build if no
    * lookup has. Test/warmup hook, never on the serve path.
    */
  private[graft] def awaitCurrent(timeoutMs: Long = 60000L): Boolean = {
    val deadline = System.nanoTime + timeoutMs * 1000000L
    while (state._1 != graft.core.Tables.epoch && System.nanoTime < deadline) {
      if (maxRows <= 0) return false
      triggerRebuild()
      Thread.sleep(2)
    }
    state._1 == graft.core.Tables.epoch
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
      // route: mark this epoch unindexable and let requests run Spark.
      // NonFatal only — OutOfMemoryError and friends must propagate, and
      // an interrupt restores its flag so a pool shutdown isn't swallowed.
      // Logged by name: a persistently failing build otherwise degrades
      // silently (only the builds counter would move).
      case ie: InterruptedException =>
        Thread.currentThread().interrupt()
        log.warn(s"point index '$name' build interrupted; serving fallback", ie)
        None
      case scala.util.control.NonFatal(e) =>
        log.warn(s"point index '$name' build failed; serving fallback", e)
        None
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
