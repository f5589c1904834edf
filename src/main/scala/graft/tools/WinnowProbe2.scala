package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sizing: winnow pair counts under a document-frequency cap. */
object WinnowProbe2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .appName("winnow-probe2").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val fp = graft.ops.TextAnalysis.winnowFingerprints(spark, docs)
    val sizes = fp.groupBy("fingerprint").agg(count(lit(1)).as("n")).cache()
    Seq(20, 50, 100, 200).foreach { maxDf =>
      val est = sizes.filter(col("n") <= maxDf && col("n") > 1)
        .agg(sum((col("n") * (col("n") - 1) / 2).cast("long")).cast("long")).head().getLong(0)
      println(s"[winnow-probe2] maxDf=$maxDf candidate_pairs(before distinct)=$est")
    }
    val total = sizes.filter(col("n") > 1).count()
    val over = Seq(20, 50, 100, 200).map(d => sizes.filter(col("n") > d).count())
    println(s"[winnow-probe2] multi_buckets=$total dropped_buckets=${over.mkString(",")}")
    spark.stop()
  }
}
