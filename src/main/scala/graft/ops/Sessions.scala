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

  /** Ordered-funnel analysis (the windowFunnel shape): for each user, the
    * earliest time step 1 occurred, the earliest step-2 time strictly
    * after it, and so on — one nullable epoch-micros column per step plus
    * the deepest step reached. With `windowSeconds` set, later steps must
    * also land within that deadline of the step-1 anchor (the earliest
    * step-1 occurrence — a deterministic simplification of ClickHouse's
    * try-every-anchor windowFunnel, documented as such). Each step is a
    * partition-frame window minimum conditioned on the previous step's
    * column, so the N-step funnel is N window expressions over ONE
    * user-keyed exchange and a final per-user aggregate on the same
    * partitioning — no self-joins, no per-user event buffering. */
  def funnel(events: DataFrame, steps: Seq[String],
      windowSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val byUser = Window.partitionBy(col("user_id"))
    val epochUs = unix_micros(col("ts").cast("timestamp"))
    val withSteps = steps.zipWithIndex.foldLeft(
      events.select(col("user_id"), col("event_type"), epochUs.as("ep"))) {
      case (df, (step, i)) =>
        val cond = if (i == 0) col("event_type") === step
                   else windowSeconds.foldLeft(
                     col("event_type") === step && col("ep") > col(s"step${i}_us")) {
                     (c, w) => c && col("ep") <= col("step1_us") + lit(w * 1000000L)
                   }
        df.withColumn(s"step${i + 1}_us", min(when(cond, col("ep"))).over(byUser))
    }
    val stepCols = steps.indices.map(i => col(s"step${i + 1}_us"))
    // fold FORWARD so the deepest step's test ends up outermost:
    // when(sN,N).otherwise(when(sN-1,N-1)...otherwise(0))
    val reached = stepCols.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (c, i)) => when(c.isNotNull, lit((i + 1).toLong)).otherwise(acc)
    }
    withSteps
      .groupBy(col("user_id"))
      .agg(first(stepCols.head).as("step1_us"),
           stepCols.tail.zipWithIndex.map { case (c, i) => first(c).as(s"step${i + 2}_us") }: _*)
      .withColumn("reached", reached.as("reached"))
  }

  /** Weekly cohort retention: cohort = the epoch week of a user's first
    * event, and for every (cohort, week-offset) the distinct count of
    * users active that week. Two linear exchanges: the user-keyed window
    * finds the cohort week, then one aggregate on (cohort, offset) whose
    * countDistinct absorbs the per-week event multiplicity (no separate
    * distinct shuffle). Epoch weeks are exact integral division of epoch
    * micros — no calendar or timezone arithmetic. */
  def retention(events: DataFrame, weekMicros: Long = 604800L * 1000000L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
    val week = expr(s"unix_micros(cast(ts as timestamp)) div ${weekMicros}L")
    events
      .select(col("user_id"), week.as("week"))
      .withColumn("cohort_week", min(col("week")).over(byUser))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
