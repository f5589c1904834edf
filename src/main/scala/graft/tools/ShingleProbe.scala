package graft.tools

import org.apache.spark.sql.functions._

/** Localizes minhash cost over documents: tokenize-only, +shingles,
  * +hash, +min-agg — to tell shingle construction apart from hashing. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val spark = StageProbe.session(cpus)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm file read

    def timed(label: String)(f: => Long): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }.minBy(_._1)
      println(f"$label%-22s sec=${best._1}%8.3f out=${best._2}")
    }

    timed("tokens-explode") {
      docs.select(explode(split(col("text"), " ")).as("t")).count()
    }
    timed("shingles-explode") {
      docs.select(explode(graft.ops.Dedup.shingles(col("text"))).as("s")).count()
    }
    timed("shingles+xxhash64") {
      docs.select(explode(graft.ops.Dedup.shingles(col("text"))).as("s"))
        .select(xxhash64(col("s")).as("h"))
        .agg(max(col("h"))).head(); 1L // max, not sum: ANSI long overflow
    }
    timed("shingles+md5") {
      docs.select(explode(graft.ops.Dedup.shingles(col("text"))).as("s"))
        .select(md5(col("s")).as("h"))
        .agg(max(col("h"))).head(); 1L
    }
    timed("minhash-sig64-full") {
      graft.ops.Dedup.minhashSignatures64(docs).count()
    }
    timed("minhash-md5-full") {
      graft.ops.Dedup.minhashSignatures(docs, 4).count()
    }
    spark.stop()
  }
}
