package graft.kg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-6 curation additions: SemDeDup (cluster-bounded semantic dedup),
  * the corpus-frequency rarity score, source/domain-level gating, and
  * concat-and-chunk sequence packing over the distributed prefix sum. */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // ---- SemDeDup ------------------------------------------------------------

  test("semDeDup drops the larger id of every within-cluster duplicate") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(0.0f, 0.95f))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.semDeDup(emb, tau = 0.9, nlist = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // init centroids = two smallest ids: (1,0) and (0,1); 3 joins cluster 0,
    // 4 joins cluster 1; both have a lower-id neighbor above tau
    assert(out(1L)._2 && out(2L)._2, s"cluster representatives must be kept: $out")
    assert(!out(3L)._2 && !out(4L)._2, s"near-duplicates must be dropped: $out")
    assert(out(1L)._1 === out(3L)._1 && out(2L)._1 === out(4L)._1)
  }

  test("semDeDup keeps everything when tau exceeds every pairwise cosine") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.9f, 0.1f))).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.semDeDup(emb, tau = 1.1, nlist = 2)
    assert(out.filter(!col("kept")).count() === 0)
    assert(out.count() === 3)
  }

  test("semDeDup battery form: plan has no cross join, and tau=0.35 fires") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") =!= 0)
    val out = graft.ops.Similarity.semDeDup(emb, tau = 0.35)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"semDeDup must stay cluster-keyed:\n$plan")
    val dropped = out.filter(!col("kept")).count()
    assert(dropped > 0, "threshold must actually drop something at sf0.001")
    assert(out.count() === emb.count())
  }

  // ---- rarity score --------------------------------------------------------

  test("rarityScore: hand-computed corpus frequencies") {
    val docs = Seq((0L, "a a b"), (1L, "b c")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.rarityScore(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // cf: a=2, b=2, c=1
    assert(out(0L) === ((3L, 6L, 2.0)))
    assert(out(1L) === ((2L, 3L, 1.5)))
  }

  // ---- source stats --------------------------------------------------------

  test("sourceStats: dup-fraction and mean-length gates both fire") {
    val docs = Seq(
      (0L, "s_dup", ("a b c d e f g h i j " * 6).trim),
      (1L, "s_dup", ("a b c d e f g h i j " * 6).trim), // exact dup -> dup_frac 0.5
      (2L, "s_short", "a b c"),                       // mean_tokens 3 < 50
      (3L, "s_ok", ("tok " * 60).trim)                // 60 unique-enough tokens
    ).toDF("doc_id", "source", "text")
    val out = graft.ops.TextAnalysis.sourceStats(docs)
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(out("s_dup"), "50% exact-dup source must be flagged")
    assert(out("s_short"), "short-doc source must be flagged")
    assert(!out("s_ok"), "healthy source must pass")
  }

  // ---- token shift ---------------------------------------------------------

  test("tokenShift: hand-computed relative-frequency differences and top-k cut") {
    val docs = Seq(
      (0L, "sA", "a a b"),
      (1L, "sB", "a c")).toDF("doc_id", "source", "text")
    // n_a=3, n_b=2; shift: a=|2/3-1/2|=1/6, b=1/3, c=1/2
    val all = graft.ops.TextAnalysis.tokenShift(docs, "sA", "sB", k = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
    assert(all.map(_._1).toSeq === Seq("c", "b", "a"), "ordered by shift desc")
    val m = all.toMap
    assert(m("a") === ((2L, 1L, math.abs(2.0 / 3.0 - 1.0 / 2.0))))
    assert(m("b") === ((1L, 0L, 1.0 / 3.0)))
    assert(m("c") === ((0L, 1L, 1.0 / 2.0)))
    val top2 = graft.ops.TextAnalysis.tokenShift(docs, "sA", "sB", k = 2)
      .collect().map(_.getString(0)).toSet
    assert(top2 === Set("c", "b"))
  }

  test("tokenShift: equal shifts break ties by token ASC, deterministically") {
    val docs = Seq(
      (0L, "sA", "x y"),
      (1L, "sB", "p q")).toDF("doc_id", "source", "text")
    // every token has shift 1/2 -> pure tie-break ordering
    val toks = graft.ops.TextAnalysis.tokenShift(docs, "sA", "sB", k = 3)
      .collect().map(_.getString(0)).toSeq
    assert(toks === Seq("p", "q", "x"))
  }

  test("tokenShift: top-k is TakeOrderedAndProject, never a global sort") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.ops.TextAnalysis.tokenShift(docs, "src0", "src1", k = 100)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be the distributed per-partition-heads form:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"no global sort exchange:\n$plan")
    assert(out.count() > 0)
  }

  // ---- packing -------------------------------------------------------------

  test("packChunks: hand-computed manifest at capacity 10") {
    val docs = Seq(
      (0L, ("a " * 7).trim),  // start 0,  end 7
      (1L, ("b " * 8).trim),  // start 7,  end 15 -> spans chunks 0 and 1
      (2L, ("c " * 4).trim)   // start 15, end 19
    ).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.packChunks(docs, capacity = 10L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(0L) === ((2L, 10L, 0L, 1L))) // docs 0+1, full chunk
    assert(out(1L) === ((2L, 9L, 1L, 2L)))  // tail of doc 1 + doc 2
    assert(out.size === 2)
  }

  test("packChunks equals the single-window reference on the sf corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cap = 1024L
    val d = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") > 0)
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = d.withColumn("s", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("e", col("s") + col("n"))
      .withColumn("chunk_id", explode(sequence(
        expr(s"s DIV $cap"), expr(s"(e - 1) DIV $cap"))))
      .groupBy("chunk_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(least(col("e"), (col("chunk_id") + 1) * cap)
          - greatest(col("s"), col("chunk_id") * cap)).as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val got = graft.ops.TextAnalysis.packChunks(docs, cap)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(got === ref)
    // every interior chunk is exactly full
    val full = graft.ops.TextAnalysis.packChunks(docs, cap)
      .filter(col("chunk_id") < got.keys.max).select("n_tokens").as[Long].collect()
    assert(full.forall(_ == cap))
  }

  test("globalRunningOffset: no single-partition exchange, matches window form") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
    val got = graft.ops.Rank.globalRunningOffset(d, Seq(col("doc_id")), col("n"), "start")
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"prefix sum must stay distributed:\n$plan")
    val w = Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)
    val ref = d.withColumn("start", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("doc_id", "start").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotMap = got.select("doc_id", "start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap === ref)
  }

  test("lengthPercentiles: hand-computed rank picks, p100 = max, p1 = min") {
    // lengths 10,20,30,40,50 under one source: ceil-rank semantics
    val docs = (1L to 5L).map(i => (i, "s", i * 10L)).toDF("doc_id", "source", "n_chars")
    val out = graft.ops.TextAnalysis.lengthPercentiles(docs, Seq(1, 50, 90, 100))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // ranks: ceil(.01*5)=1, ceil(.5*5)=3, ceil(.9*5)=5, ceil(1*5)=5
    assert(out === Map(1L -> 10L, 50L -> 30L, 90L -> 50L, 100L -> 50L))
  }

  test("lengthPercentiles: per-source windows stay parallel, |sources|x|pcts| rows") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.ops.TextAnalysis.lengthPercentiles(d)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"percentile sort must be per-source:\n$plan")
    val nSources = d.select("source").distinct().count()
    assert(out.count() === nSources * 3)
    // monotone: p50 <= p90 <= p99 within each source
    val bySrc = out.collect().groupBy(_.getString(0))
    assert(bySrc.values.forall { rs =>
      val m = rs.map(r => r.getLong(1) -> r.getLong(2)).toMap
      m(50L) <= m(90L) && m(90L) <= m(99L)
    })
  }
}
