package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ground-truth dump of Spark's xxhash64 for oracle development:
  * string inputs (len 0..31) and the (int, long) slot-hash chaining. */
object XxProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").appName("xx-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val strings = (0 to 31).map(n => ("abcdefghijklmnopqrstuvwxyz012345".take(n))) ++
      Seq("the quick brown", "a b c", "hello world!", "Zz9 ~", "x")
    val sdf = strings.toDF("s").select(col("s"), xxhash64(col("s")).as("h"))
    sdf.collect().foreach(r => println(s"[xx-str]\t${r.getString(0)}\t${r.getLong(1)}"))
    val longs = Seq(0L, 1L, -1L, 42L, Long.MinValue, Long.MaxValue,
      1234567890123456789L, -987654321098765432L)
    val pairs = for (i <- 1 to 8; h <- longs) yield (i, h)
    val pdf = pairs.toDF("i", "h").select(col("i"), col("h"),
      xxhash64(col("i"), col("h")).as("hh"))
    pdf.collect().foreach(r => println(s"[xx-pair]\t${r.getInt(0)}\t${r.getLong(1)}\t${r.getLong(2)}"))
    spark.stop()
  }
}
