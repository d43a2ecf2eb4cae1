package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence construction: turn an event log into per-key ordered
  * arrays (conversation turns, user action histories — the row shape
  * sequence-model training data is built from).
  *
  * `collect_list` alone has no ordering guarantee across shuffles; the
  * deterministic form collects (order_key, value) structs and sorts the
  * array per row (`sort_array` compares structs field-by-field, so the
  * order key leads). One shuffle; array sort is per-row CPU — linear at
  * scale.
  */
object Sequences {

  def orderedSequences(events: DataFrame, keyCol: String, orderCol: String,
                       valueCol: String, maxLen: Int = Int.MaxValue): DataFrame =
    events
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col(orderCol), col(valueCol)))).as("_s"))
      .select(col(keyCol),
        slice(transform(col("_s"), s => s.getField(valueCol)), 1, maxLen).as("seq"),
        size(col("_s")).cast("long").as("n_events"))
}
