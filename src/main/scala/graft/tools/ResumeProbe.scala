package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Checkpoint/resume at probe scale (VERDICT r5 ask #4): run the flagship
 * through `Pipeline.runCheckpointed` over a 10×-battery page corpus, kill
 * it after half the url-hash buckets commit (simulated by
 * `maxBucketsPerRun` — the incremental-commit knob processes 16 of 32
 * buckets and returns before the graph stage, exactly the on-disk state a
 * mid-job crash leaves), restart, and assert:
 *
 *  (a) only the REMAINDER is processed — the resume's RunReport names
 *      exactly the 16 uncommitted buckets, and every data file of the 16
 *      committed bucket partitions is byte-untouched (same path/size/mtime)
 *      after the resume — the committed work is pruned, not redone;
 *  (b) the final edges/nodes snapshots are BIT-IDENTICAL (canonical
 *      row-sorted md5) to an uninterrupted run over the same page table.
 *
 * Env knobs: SPARK_GRAFT_PAGES (default 3000 = 10× battery flagship),
 * SPARK_GRAFT_CPUS (default 32). Prints one JSON line.
 */
object ResumeProbe {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_PAGES", "3000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = 32
    val half = buckets / 2
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.kg.{Lineage, Pipeline}

    val root = java.nio.file.Files.createTempDirectory("graft-resume-probe").toString
    try {
      // pages as a TABLE AT REST so both runs scan identical bytes
      val pagesDir = s"$root/pages"
      Pipeline.generatePages(spark, nPages, withText = true)
        .write.mode("overwrite").parquet(pagesDir)
      def pages = spark.read.parquet(pagesDir).as[graft.kg.Page]

      def secs[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
      }
      // canonical content hash: column-name-sorted projection, row-sorted;
      // \u0001 field separator + newline row terminator keep cell
      // boundaries unambiguous (("ab","c") must not hash like ("a","bc"))
      def tableHash(df: DataFrame): String = {
        val cols = df.columns.sorted.toIndexedSeq
        val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
          .collect().map(_.toSeq.map(String.valueOf).mkString("\u0001")).sorted
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.foreach { r => md.update(r.getBytes("UTF-8")); md.update('\n'.toByte) }
        md.digest().map("%02x".format(_)).mkString
      }
      // every data file under triples_raw: path -> (size, mtime)
      def rawFiles(outDir: String): Map[String, (Long, Long)] = {
        val base = java.nio.file.Paths.get(s"$outDir/triples_raw")
        val s = java.nio.file.Files.walk(base)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(p => java.nio.file.Files.isRegularFile(p))
            .map(p => base.relativize(p).toString ->
              ((java.nio.file.Files.size(p), java.nio.file.Files.getLastModifiedTime(p).toMillis)))
            .toMap
        } finally s.close()
      }

      // ---- uninterrupted reference run -----------------------------------
      val outA = s"$root/runA"
      val (repA, secA) = secs(Pipeline.runCheckpointed(spark, pages, outA, buckets))

      // ---- interrupted run: half the buckets commit, then the job "dies" --
      val outB = s"$root/runB"
      val (rep1, secB1) = secs(
        Pipeline.runCheckpointed(spark, pages, outB, buckets, maxBucketsPerRun = half))
      require(rep1.triples == -1L && rep1.nodes == -1L,
        "partial run must not publish a graph snapshot")
      require(rep1.bucketsProcessed.size == half,
        s"expected $half committed buckets, got ${rep1.bucketsProcessed.size}")
      val committedBefore = rawFiles(outB)

      // ---- restart: resume must prune the committed half ------------------
      val (rep2, secB2) = secs(Pipeline.runCheckpointed(spark, pages, outB, buckets))
      val resumedOnlyRemainder =
        rep2.bucketsSkipped.toSet == rep1.bucketsProcessed.toSet &&
        rep2.bucketsProcessed.toSet == ((0 until buckets).toSet -- rep1.bucketsProcessed)
      val after = rawFiles(outB)
      val committedPrefixes = rep1.bucketsProcessed.map(b => s"bucket=$b/").toSet
      val committedUntouched = committedBefore.forall { case (path, meta) =>
        !committedPrefixes.exists(path.startsWith) || after.get(path).contains(meta)
      }
      val committedCount = committedBefore.keys.count(p => committedPrefixes.exists(p.startsWith))

      // ---- (b) bit-identity of the final graph ---------------------------
      val edgesEqual = tableHash(Lineage.readTable(spark, outA, "edges")) ==
        tableHash(Lineage.readTable(spark, outB, "edges"))
      val nodesEqual = tableHash(Lineage.readTable(spark, outA, "nodes")) ==
        tableHash(Lineage.readTable(spark, outB, "nodes"))

      System.err.println(f"[resume-probe] uninterrupted ${secA}%.1f s; " +
        f"half-run ${secB1}%.1f s + resume ${secB2}%.1f s; " +
        s"remainder-only=$resumedOnlyRemainder untouched=$committedUntouched " +
        s"edges=$edgesEqual nodes=$nodesEqual")
      println(s"""{"metric":"resume_probe","pages":$nPages,"buckets":$buckets""" +
        s""","interrupted_buckets":${rep1.bucketsProcessed.size}""" +
        s""","resumed_buckets":${rep2.bucketsProcessed.size}""" +
        s""","committed_files":$committedCount""" +
        s""","resumed_only_remainder":$resumedOnlyRemainder""" +
        s""","committed_files_untouched":$committedUntouched""" +
        s""","edges_hash_equal":$edgesEqual,"nodes_hash_equal":$nodesEqual""" +
        s""","edges":${repA.triples},"nodes":${repA.nodes}""" +
        s""","sec_uninterrupted":$secA,"sec_half":$secB1,"sec_resume":$secB2}""")
      require(resumedOnlyRemainder && committedUntouched && edgesEqual && nodesEqual,
        "resume probe FAILED — see JSON")
    } finally graft.kg.Lineage.deleteRecursively(root)
    spark.stop()
  }
}
