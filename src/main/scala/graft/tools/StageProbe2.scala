package graft.tools

import org.apache.spark.sql.SparkSession

/** Narrower probe: is the anti-scaling in the Page encoder, the kernel, or GC? */
object StageProbe2 {
  def main(args: Array[String]): Unit = {
    val pages = sys.env.getOrElse("PROBE_PAGES", "200000").toLong
    for (cpus <- Seq(8, 32)) {
      val spark = StageProbe.session(cpus)
      import spark.implicits._
      spark.range(64).map(i => graft.kg.Gen.page(42L, i).text.length).agg("value" -> "sum").head()

      def timed(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"cpus=$cpus%-3d $label%-24s sec=${(System.nanoTime() - t0) / 1e9}%8.3f out=$n")
      }
      // kernel only, no Page encoder: long in, long out
      timed("kernel-noencode") {
        spark.range(0L, pages, 1L, cpus * 2)
          .mapPartitions(it => it.map(i => graft.kg.Gen.page(42L, i).text.length.toLong))
          .agg("value" -> "sum").head().getLong(0)
      }
      // RDD path (no SQL at all)
      timed("kernel-rdd") {
        spark.sparkContext.range(0L, pages, 1L, cpus * 2)
          .map(i => graft.kg.Gen.page(42L, i).text.length.toLong).sum().toLong
      }
      // Page encoder roundtrip
      timed("page-encode") {
        graft.kg.Pipeline.generatePages(spark, pages, partitions = cpus * 2)
          .mapPartitions(it => it.map(_.text.length.toLong))
          .agg("value" -> "sum").head().getLong(0)
      }
      timed("kernel-noencode-2nd") {
        spark.range(0L, pages, 1L, cpus * 2)
          .mapPartitions(it => it.map(i => graft.kg.Gen.page(42L, i).text.length.toLong))
          .agg("value" -> "sum").head().getLong(0)
      }
      spark.stop()
    }
  }
}
