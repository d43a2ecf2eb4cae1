package graft.plugs

import org.apache.spark.sql.DataFrame

/** A plug — the reference's extension unit (defs.json + tables.sql +
  * functions.sql; docs/plug-definitions.md:8-29). In this engine a plug is a
  * pure set-oriented transform: op-log DataFrame in, named derived tables
  * out. The reference's per-row `EXECUTE FORMAT(...)` dispatch
  * (database/sql/sync.sql:102-103) becomes dispatch by *stream definition* —
  * one streaming query per plug — so there is no row-at-a-time code anywhere.
  */
trait Plug {
  /** Plug name (schema name in the reference). */
  def name: String

  /** First block this plug cares about (defs.json `start_block`). */
  def startBlock: Int

  /** Op type ids this plug consumes (defs.json `ops` keys). */
  def opTypeIds: Set[Int]

  /** Narrow the op log to this plug's ops — applied before `transform` so
    * the filter pushes down to the source scan.
    */
  def filter(ops: DataFrame): DataFrame

  /** Pure transform: filtered op-log rows -> derived tables keyed by name.
    * Must be deterministic and idempotent (re-running a block range yields
    * identical rows) so that `foreachBatch` replay is exactly-once.
    */
  def transform(ops: DataFrame): Map[String, DataFrame]
}

/** Registry mirroring the reference's plug discovery (database/haf.py:72-84). */
object PlugRegistry {
  def all: Seq[Plug] = Seq(Podping, Polls, HiveEngine)
  def byName(n: String): Option[Plug] = all.find(_.name == n)

  /** Runtime discovery from a directory of `<plug>/defs.json` definition
    * files — the reference's actual boot story (every startup rescans the
    * plugs dir; an operator adds a dataset by dropping in a definition,
    * no rebuild). Returns the ENABLED plugs, each bound to its compiled
    * transform via [[PlugDefs.transforms]]. The compiled [[all]] remains
    * the default when no defs directory is deployed.
    */
  def fromDefs(dir: java.io.File): Seq[Plug] = PlugDefs.boot(dir)
}
