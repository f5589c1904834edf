package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for selected queries — the review loop
  * for pushdown/pruning/broadcast/codegen (run after any query change). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q_broadcast_join", "q_large_join", "q_semi_join",
        "q_topk_docs", "q_dedup_exact", "q_lsh_pairs", "q_embed_topk", "q_vocab_build")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
