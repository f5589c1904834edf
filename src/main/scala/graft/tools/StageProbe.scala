package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-stage scaling probe: times generate-only, generate+score, and the
  * full pipeline at two local[k] levels to localize scaling bottlenecks. */
object StageProbe {
  def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"probe-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("PROBE_PAGES", "200000").toLong
    for (cpus <- Seq(8, 32)) {
      val spark = session(cpus)
      import org.apache.spark.sql.functions._
      // warmup
      graft.kg.Pipeline.extractTriples(spark, graft.kg.Pipeline.generatePages(spark, 64)).count()

      def timed(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"cpus=$cpus%-3d $label%-16s sec=${(System.nanoTime() - t0) / 1e9}%8.3f rows=$n")
      }
      val bundleBc = spark.sparkContext.broadcast(graft.kg.Pipeline.buildBundle())
      timed("gen-only") {
        graft.kg.Pipeline.generatePages(spark, pages, partitions = cpus * 2)
          .select(length(col("text"))).agg(sum("length(text)")).head().getLong(0)
      }
      timed("gen+score") {
        graft.kg.Pipeline.scorePages(spark,
          graft.kg.Pipeline.generatePages(spark, pages, partitions = cpus * 2), bundleBc).count()
      }
      timed("full") {
        graft.kg.Pipeline.extractTriples(spark,
          graft.kg.Pipeline.generatePages(spark, pages, partitions = cpus * 2)).count()
      }
      spark.stop()
    }
  }
}
