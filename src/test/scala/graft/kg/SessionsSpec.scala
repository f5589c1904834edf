package graft.kg

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Gap-based sessionization ([[graft.ops.Sessions]]): hand-computed
  * session boundaries, exact micro-epoch arithmetic, and the one-exchange
  * plan (per-user windows feed the aggregate without a second shuffle). */
class SessionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize: hand-computed boundaries at a 60 s gap") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 00:00:30"), 2.0),  // 30 s gap: same session
      (3L, 10L, ts("2024-01-01 00:02:00"), 4.0),  // 90 s gap: new session
      (4L, 20L, ts("2024-01-01 00:00:00"), 8.0))
      .toDF("event_id", "user_id", "ts", "value")
    val out = graft.ops.Sessions.sessionize(events, gapSeconds = 60L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.size === 3)
    val base = ts("2024-01-01 00:00:00").getTime * 1000L
    assert(out((10L, 1L)) === ((base, base + 30000000L, 2L, 3.0)))
    assert(out((10L, 2L)) === ((base + 120000000L, base + 120000000L, 1L, 4.0)))
    assert(out((20L, 1L)) === ((base, base, 1L, 8.0)))
  }

  test("sessionize: a gap of exactly gapSeconds does NOT split (strict >)") {
    val events = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 10L, ts("2024-01-01 00:01:00"), 1.0))
      .toDF("event_id", "user_id", "ts", "value")
    assert(graft.ops.Sessions.sessionize(events, gapSeconds = 60L).count() === 1)
  }

  test("sessionize battery form: one exchange end to end, sane session shape") {
    val out = graft.ops.Sessions.sessionize(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"), 1800L)
    val plan = out.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"per-user partitioning must carry window AND aggregate ($exchanges exchanges):\n$plan")
    assert(!plan.contains("SinglePartition"), s"no global window:\n$plan")
    val rows = out.collect()
    assert(rows.length > 100, "30-min gaps must split the sf0.001 event log")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(3)), "start <= end")
    // session count per user equals that user's max session index
    val byUser = rows.groupBy(_.getLong(0))
    assert(byUser.forall { case (_, rs) => rs.map(_.getLong(1)).max === rs.length })
  }
}
