package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B timing + plan probe for the banded-ANN family at a given SF dir. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("ann-probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[ann-probe] $tag trial$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    val pairs = graft.ops.Similarity.annCandidatePairs(e, 0.3)
    println("[ann-probe] ---- pairs plan ----")
    pairs.count() // warm + let AQE finalize
    println(pairs.queryExecution.executedPlan.toString.split("\n").take(60).mkString("\n"))
    time("pairs")(pairs.count())
    time("knn")(graft.ops.Similarity.annTopKJoin(e, k = 1, minCosine = 0.2).count())
    // stage breakdown: raw kernel pairs, then +distinct
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val dim = 64
    val ed = e.withColumn("embedding", col("embedding").cast("array<double>"))
    val bandStructs = (0 until 12).map { l =>
      val planes = graft.ops.Similarity.hyperplanes(3, dim, 7L + 31L * l)
      val bucket = planes.zipWithIndex.map { case (pl, i) =>
        val dot = graft.functions.VectorOps.dot_product(col("embedding"),
          array(pl.toIndexedSeq.map(v => lit(v.toDouble)): _*))
        when(dot > 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(l).as("band"), bucket.as("key"))
    }
    graft.functions.VectorOps.register(spark)
    val acc = spark.sparkContext.longAccumulator("probe")
    val banded = ed.select(col("vec_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"), col("vec_id"))
      .as[(Int, Int, Long)]
    val raw = banded.repartition(col("band"), col("key"))
      .sortWithinPartitions(col("band"), col("key"), col("vec_id"))
      .mapPartitions { it =>
        // inline copy of the bucket window (probe-only)
        var cur: (Int, Int) = null
        val buf = new scala.collection.mutable.ArrayBuffer[Long](16)
        it.flatMap { case (band, key, id) =>
          val k = (band, key)
          if (cur == null || k != cur) { cur = k; buf.clear() }
          val n = buf.size
          buf += id
          Iterator.range(0, n).flatMap(i => if (buf(i) < id) Some((buf(i), id)) else None)
        }
      }
      .toDF("id_a", "id_b")
    time("kernel_only")(raw.count())
    time("kernel_distinct")(raw.distinct().count())
    spark.stop()
  }
}
