package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-decade probe for the event-analytics family (sessionize, funnel,
 * retention, json_props): replicate the sf events table `copies`× with
 * DISJOINT user-id/event-id ranges (timestamps unchanged), so every
 * output has an exact closed form in terms of the base table —
 * per-user operators must scale their outputs by exactly `copies` and
 * global sums by exactly `copies`, or the operator is broken at scale.
 * Run: PROBE_COPIES=100 sbt "runMain graft.tools.EventsProbe"
 */
object EventsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("PROBE_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val userStride = ev.agg(max("user_id")).head.getLong(0) + 1L
    val eventStride = ev.agg(max("event_id")).head.getLong(0) + 1L
    val big = ev
      .withColumn("c", explode(array((0 until copies).map(lit): _*)))
      .withColumn("user_id", col("user_id") + col("c").cast("long") * userStride)
      .withColumn("event_id", col("event_id") + col("c").cast("long") * eventStride)
      .drop("c")
      .repartition(64)
      .cache()
    val nBig = big.count() // materialize so op timings exclude generation
    println(s"probe: copies=$copies rows=$nBig sf=$sfDir")

    def timed(label: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(f"copies=$copies%-4d $label%-12s sec=${(System.nanoTime() - t0) / 1e9}%8.3f out=$n")
      n
    }

    // base-table closed forms (cheap at 1x)
    val baseSessions = graft.ops.Sessions.sessionize(ev).count()
    val baseUsers = ev.select("user_id").distinct().count()
    val baseRetention = graft.ops.Sessions.retention(ev)
      .agg(sum("n_users"), count(lit(1))).head
    val (baseRetUsers, baseRetCells) = (baseRetention.getLong(0), baseRetention.getLong(1))
    val baseKSum = graft.ops.SemiStructured.propStats(ev).agg(sum("k_sum")).head.getLong(0)

    val sessions = timed("sessionize") { graft.ops.Sessions.sessionize(big).count() }
    require(sessions == copies * baseSessions,
      s"sessionize must replicate per-user: $sessions vs ${copies * baseSessions}")

    val funnels = timed("funnel") {
      graft.ops.Sessions.funnel(big, Seq("view", "click", "purchase")).count()
    }
    require(funnels == copies * baseUsers,
      s"funnel is one row per user: $funnels vs ${copies * baseUsers}")

    // deadline funnel: per-user depth counts must replicate exactly
    def depths(df: DataFrame): Map[Long, Long] =
      df.groupBy("reached").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val baseDepths = depths(
      graft.ops.Sessions.funnel(ev, Seq("view", "click", "purchase"), Some(86400L)))
    var gotDepths = Map.empty[Long, Long]
    timed("funnel_win") {
      gotDepths = depths(
        graft.ops.Sessions.funnel(big, Seq("view", "click", "purchase"), Some(86400L)))
      gotDepths.values.sum
    }
    require(gotDepths == baseDepths.map { case (k, v) => k -> v * copies },
      s"deadline-funnel depth mix must replicate: $gotDepths vs $baseDepths x$copies")

    val retRow = graft.ops.Sessions.retention(big)
    val ret = timed("retention") { retRow.count() }
    val retUsers = retRow.agg(sum("n_users")).head.getLong(0)
    require(ret == baseRetCells && retUsers == copies * baseRetUsers,
      s"retention cells must be stable ($ret vs $baseRetCells) and user mass linear " +
        s"($retUsers vs ${copies * baseRetUsers})")

    val props = graft.ops.SemiStructured.propStats(big)
    timed("json_props") { props.count() }
    val kSum = props.agg(sum("k_sum")).head.getLong(0)
    require(kSum == copies * baseKSum, s"k mass must be linear: $kSum vs ${copies * baseKSum}")

    println(s"probe OK: all five event-analytics outputs match their ${copies}x closed forms")
    spark.stop()
  }
}
