package graft.tools

import org.apache.spark.sql.SparkSession

/** Drives SparkEntry.entry exactly like the driver's smoke check. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n")
    df.show(10, truncate = false)
    spark.stop()
  }
}
