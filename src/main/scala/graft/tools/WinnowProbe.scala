package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off sizing probe: winnow fingerprint bucket stats + pair counts at
  * a given SF dir (arg 0, default sf0.1). */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .appName("winnow-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val fp = graft.ops.TextAnalysis.winnowFingerprints(spark, docs).cache()
    val nFp = fp.count()
    val buckets = fp.groupBy("fingerprint").count()
    val top = buckets.orderBy(col("count").desc).limit(5).collect()
    val nPairs = graft.ops.TextAnalysis.winnowCandidatePairs(spark, docs).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"[winnow-probe] fp_rows=$nFp top_buckets=${top.map(_.getLong(1)).mkString(",")} pairs=$nPairs sec=$sec")
    spark.stop()
  }
}
