package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed global ranking — the scale-safe replacement for
 * `row_number().over(Window.orderBy(...))`, which Spark executes by moving
 * EVERY row through a single partition (a single-task bottleneck at web
 * scale: the vocab of a 100 TB corpus is billions of tokens).
 *
 * Two-phase plan (the classic zipWithIndex shape, kept in the DataFrame
 * API so Catalyst still prunes/pushes around it):
 *   1. range-repartition by the sort keys and sort within partitions —
 *      partition i holds a contiguous, disjoint key range, all partitions
 *      sort in parallel;
 *   2. per-partition local row_number (window PARTITIONED by the range
 *      partition id — parallel, never global) + per-partition row counts
 *      (collected to the driver: at most `partitions` longs — metadata on
 *      the order of AQE statistics, not data) → cumulative offsets,
 *      broadcast back and added to the local rank.
 *
 * The input subplan is `localCheckpoint`ed so the count pass and the rank
 * pass compute it exactly once (blocks are reclaimed by the ContextCleaner
 * when the result is garbage-collected).
 *
 * Requires the sort keys to be a total order (unique): equal keys land in
 * one partition, but their relative rank would be nondeterministic — same
 * contract as the reference's insertion-ordered vocab ids
 * (data/dataset.py:19-34), where the key (token) is unique by construction.
 */
object Rank {

  def globalRowNumber(df: DataFrame, order: Seq[Column], out: String,
      partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    // per-partition counts: <= p rows to the driver (partition metadata)
    val counts = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + counts.getOrElse(i, 0L))
    val offsetRows = (0 until p).map(i => (i, offsets(i)))
    import spark.implicits._
    val offsetDf = offsetRows.toDF("__pid", "__offset")
    ranged
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(order: _*)))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(out, (col("__rn").cast("long") + col("__offset")))
      .drop("__pid", "__rn", "__offset")
  }

  /** Distributed EXCLUSIVE prefix sum in a global order — the scale-safe
    * replacement for `sum(v).over(Window.orderBy(...))`, which Spark would
    * execute by moving EVERY row through a single partition. Same two-phase
    * shape as [[globalRowNumber]]: range-repartition by the order keys and
    * sort within partitions (parallel), per-partition value totals to the
    * driver (at most `partitions` longs — partition metadata, not data),
    * cumulative offsets broadcast back, and a LOCAL window sum within each
    * range partition. `out` receives the sum of `value` over all rows
    * STRICTLY before the row in the global order. Same total-order contract
    * on the sort keys as [[globalRowNumber]]. */
  def globalRunningOffset(df: DataFrame, order: Seq[Column], value: Column,
      out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = df
      .repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast("long"))
      .localCheckpoint()
    // per-partition totals: <= p longs to the driver (metadata-sized).
    // coalesce: a non-empty partition whose cast values are all NULL would
    // otherwise yield a NULL sum and NPE at getLong
    val totals = ranged.groupBy(col("__pid"))
      .agg(coalesce(sum(col("__v")), lit(0L)).as("__t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until p).scanLeft(0L)((acc, i) => acc + totals.getOrElse(i, 0L))
    import spark.implicits._
    val offsetDf = (0 until p).map(i => (i, offsets(i))).toDF("__pid", "__offset")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .withColumn("__local", coalesce(sum(col("__v")).over(w), lit(0L)))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(out, col("__local") + col("__offset"))
      .drop("__pid", "__v", "__local", "__offset")
  }
}
