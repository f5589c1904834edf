package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Which BigDecimal construction matches Spark's round(double, 4)? */
object RoundProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]").appName("round-probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vals = Seq(0.12345, 0.123450000000000001, 0.29995, 0.299950000000001,
      -0.12345, 0.99995, 1.0 / 3.0, 0.3000000000000000444, 2.675e-1, 0.00005)
    val sparkRounded = vals.toDF("x").select(round(col("x"), 4).as("r")).collect().map(_.getDouble(0))
    vals.zip(sparkRounded).foreach { case (x, sr) =>
      val viaValueOf = java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      val viaExact = new java.math.BigDecimal(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      println(s"[round-probe] x=$x spark=$sr valueOf=$viaValueOf exact=$viaExact " +
        s"matchValueOf=${sr == viaValueOf} matchExact=${sr == viaExact}")
    }
    spark.stop()
  }
}
