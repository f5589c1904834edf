package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the q_graph_components star-CC loop. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("cc-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val pairs = o.select((col("o_custkey").cast("long") * 2).as("a"),
      (col("o_orderkey").cast("long") * 2 + 1).as("b"))
    val nodes = pairs.select(col("a").as("node"))
      .unionByName(pairs.select(col("b").as("node"))).distinct()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.connectedComponentsStar(pairs, nodes).count()
      println(f"[cc-probe] trial$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
