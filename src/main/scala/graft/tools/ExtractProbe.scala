package graft.tools

import org.apache.spark.sql.SparkSession

/** Localizes flagship-kernel cost: page-gen alone, +extract, +full score. */
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("PROBE_PAGES", "200000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val spark = StageProbe.session(cpus)
    import spark.implicits._
    // warmup
    graft.kg.Pipeline.extractTriples(spark, graft.kg.Pipeline.generatePages(spark, 64)).count()

    def timed(label: String)(f: => Long): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"$label%-14s sec=${best._1}%8.3f out=${best._2}")
    }
    timed("gen-only") {
      spark.range(0L, pages, 1L, cpus * 2)
        .mapPartitions(it => it.map(i => graft.kg.Gen.page(42L, i, withText = false).html.length.toLong))
        .agg("value" -> "sum").head().getLong(0)
    }
    timed("gen+extract") {
      spark.range(0L, pages, 1L, cpus * 2)
        .mapPartitions(it => it.map { i =>
          graft.kg.TextExtract.extract(graft.kg.Gen.page(42L, i, withText = false).html).length.toLong
        })
        .agg("value" -> "sum").head().getLong(0)
    }
    val bundleBc = spark.sparkContext.broadcast(graft.kg.Pipeline.buildBundle())
    timed("gen+score") {
      graft.kg.Pipeline.scorePages(spark,
        graft.kg.Pipeline.generatePages(spark, pages, partitions = cpus * 2), bundleBc).count()
    }
    spark.stop()
  }
}
