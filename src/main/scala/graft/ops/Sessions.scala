package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Gap-based sessionization over an event log — the classic web-analytics
 * operator: a user's events belong to one session until a silence longer
 * than `gapSeconds` starts the next one.
 *
 * Gaps-and-islands entirely inside per-user windows: `lag(ts)` marks
 * session starts, a running sum numbers them, and the summary aggregate
 * groups by (user_id, session_idx). Every window is PARTITIONED by
 * user_id — no global sort, no SinglePartition exchange — and because
 * hash-partitioning on user_id already co-locates every (user, session)
 * group, Catalyst satisfies the aggregate's distribution without a second
 * shuffle: the whole operator is ONE exchange end to end (plan-asserted
 * in SessionsSpec). At 100 TB that is the floor for this semantics; skew
 * is per-user event counts, handled by AQE the same way the rank family
 * documents.
 *
 * Timestamps are compared as epoch MICROSECONDS (exact longs on both
 * engines — `unix_micros` here, `epoch_us` in DuckDB — so sub-second
 * components never hit a truncation-direction ambiguity; session TZ is
 * pinned UTC by every entry point); `value` sums as DECIMAL(18,2) and
 * casts back to double only at the end — the [[graft.SparkEntry]] oracle
 * discipline for cross-engine exactness.
 */
object Sessions {

  /** One row per (user_id, session): 1-based session index in time order,
    * start/end epoch micros, event count, exact value sum. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val epochUs = unix_micros(col("ts").cast("timestamp"))
    events
      .withColumn("ep", epochUs)
      .withColumn("new_session",
        when(col("ep") - lag(col("ep"), 1).over(byUser) > gapSeconds * 1000000L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx",
        sum(when(lag(col("ep"), 1).over(byUser).isNull, 1L)
          .otherwise(col("new_session"))).over(byUser))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ep")).as("start_us"),
        max(col("ep")).as("end_us"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
  }
}
