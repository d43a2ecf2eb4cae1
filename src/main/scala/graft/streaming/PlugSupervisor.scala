package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery
import scala.collection.concurrent.TrieMap

/** Plug supervision (reference `database/plugs.py:89-102`: the 60 s loop
  * that restarts dead plugs, and kills stalled syncs via
  * `database/sql/functions.sql:49-62`).
  *
  * Spark retries failed *tasks* natively, but a terminated
  * `StreamingQuery` — driver-side exception, source outage, manual stop —
  * stays dead until something calls start() again. This is that
  * something. Each registered plug owns a launcher closure; on every
  * poll the supervisor:
  *
  *  - relaunches a terminated query, with capped exponential backoff
  *    (restart is exactly-once-safe: the checkpoint plus the pinned
  *    stream origin in [[PlugRunner.start]] make a relaunch resume,
  *    not replay);
  *  - stops an active query that has made no progress inside
  *    `staleAfterMs` (the reference's stalled-sync kill) — it then falls
  *    into the same relaunch path;
  *  - resets the backoff once a query makes fresh progress.
  *
  * `tick()` is the poll body, callable directly (tests inject a clock);
  * `run()` spawns the reference-style daemon loop.
  */
final class PlugSupervisor(
    pollMs: Long = 60000,
    staleAfterMs: Long = 600000,
    baseBackoffMs: Long = 1000,
    maxBackoffMs: Long = 60000,
    clock: () => Long = () => System.currentTimeMillis()) {

  final class Supervised private[PlugSupervisor] (
      val name: String, launcher: () => StreamingQuery) {
    @volatile private[PlugSupervisor] var query: Option[StreamingQuery] = None
    @volatile private[PlugSupervisor] var failures: Int = 0
    @volatile private[PlugSupervisor] var notBefore: Long = Long.MinValue
    @volatile private[PlugSupervisor] var launchedAt: Long = 0L
    @volatile var restarts: Long = -1 // first launch is not a restart

    def isActive: Boolean = query.exists(_.isActive)

    private[PlugSupervisor] def launch(now: Long): Unit = {
      query = Some(launcher())
      launchedAt = now
      restarts += 1
    }

    /** Epoch millis of the query's newest progress event, or the launch
      * time while the first batch is still running.
      */
    private[PlugSupervisor] def progressAt: Long =
      query.flatMap(q => Option(q.lastProgress))
        .map(p => java.time.Instant.parse(p.timestamp).toEpochMilli)
        .map(math.max(_, launchedAt)) // a restart must not inherit staleness
        .getOrElse(launchedAt)

    private[PlugSupervisor] def backoff: Long =
      math.min(baseBackoffMs * (1L << math.min(failures, 20)), maxBackoffMs)
  }

  private val entries = TrieMap.empty[String, Supervised]
  @volatile private var loop: Option[Thread] = None

  /** Register a plug stream; it is launched on the next tick. Replaces
    * any same-named registration (the old query, if live, is stopped).
    */
  def register(name: String, launcher: () => StreamingQuery): Supervised = {
    val s = new Supervised(name, launcher)
    entries.put(name, s).foreach(_.query.filter(_.isActive).foreach(_.stop()))
    s
  }

  def status: Map[String, Supervised] = entries.readOnlySnapshot().toMap

  /** One supervision pass — the body of the reference's 60 s loop. */
  def tick(): Unit = entries.values.foreach { e =>
    val now = clock()
    e.query match {
      case None if now >= e.notBefore =>
        e.launch(now)
      case Some(q) if !q.isActive =>
        // dead plug: exception or unexpected stop — back off, then the
        // None branch above relaunches it on a later tick
        e.failures += 1
        e.notBefore = now + e.backoff
        e.query = None
      case Some(q) if now - e.progressAt > staleAfterMs =>
        // stalled sync: live query, no progress — kill it; the dead-plug
        // path picks it up from here
        q.stop()
      case Some(q) =>
        // healthy forward progress clears the backoff state
        if (e.failures > 0 && q.lastProgress != null &&
            e.progressAt > e.launchedAt) e.failures = 0
      case None => () // awaiting backoff expiry
    }
  }

  /** Start the daemon poll loop (reference: `while True: sleep(60)`). */
  def run(): Unit = synchronized {
    if (loop.isEmpty) {
      val t = new Thread(() => {
        while (!Thread.currentThread().isInterrupted) {
          tick()
          try Thread.sleep(pollMs)
          catch { case _: InterruptedException => Thread.currentThread().interrupt() }
        }
      }, "graft-plug-supervisor")
      t.setDaemon(true)
      t.start()
      loop = Some(t)
    }
  }

  /** Stop the loop and every supervised query. */
  def shutdown(): Unit = synchronized {
    loop.foreach(_.interrupt())
    loop = None
    entries.values.foreach(_.query.filter(_.isActive).foreach(_.stop()))
  }
}
