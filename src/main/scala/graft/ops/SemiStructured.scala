package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Semi-structured (JSON) column handling — web-scale event logs carry a
 * per-event JSON property bag; the engine must parse it inside the
 * distributed plan (never collect-and-parse) and treat malformed payloads
 * as skip-and-count, never task failure (the same doctrine as the
 * malformed-row error channel in `kg/Sources`, reference loader
 * kbp.py:41-57).
 *
 * `from_json` with an explicit DDL schema is the idiomatic Spark form: a
 * narrow per-row projection (no shuffle), where malformed JSON or a
 * missing field degrades to NULL (PERMISSIVE mode) and is observable as
 * `n_events - n_parsed`. At scale the plan is
 * scan → project(parse) → partial agg → one shuffle on the group key →
 * final agg: parse cost is per-row CPU, embarrassingly parallel, and the
 * shuffle carries only the per-group partial aggregates — the JSON
 * strings themselves never cross the wire.
 */
object SemiStructured {

  /** Per-event-type statistics over the JSON `props` bag: row count,
    * parse-success count (`n_events - n_parsed` = malformed/missing — the
    * skip-and-count channel), exact-integer sum/min/max of the `k` field,
    * and the distinct count of users with a high-`k` event. Every output
    * column is exact (BIGINT): no float leaves the operator. */
  def propStats(events: DataFrame, hiThreshold: Long = 50L): DataFrame = {
    val k = from_json(col("props"),
      org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")).getField("k")
    events
      .select(col("event_type"), col("user_id"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"),
        countDistinct(when(col("k") > hiThreshold, col("user_id"))).as("n_users_hi"))
  }
}
