package graft.kg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tripleSet(df: org.apache.spark.sql.DataFrame): Set[(String, String, String, Long)] =
    df.select("subject_id", "relation", "object_id", "support").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  test("flagship pipeline extracts triples end-to-end") {
    val pages = Pipeline.generatePages(spark, 60)
    val triples = Pipeline.extractTriples(spark, pages)
    val rows = triples.collect()
    assert(rows.nonEmpty, "pipeline must emit triples")
    assert(rows.forall(_.getString(1) != "no_relation"), "P15: no_relation suppressed")
    assert(rows.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  test("pipeline output is deterministic across runs (golden-gate precondition)") {
    val t1 = tripleSet(Pipeline.extractTriples(spark, Pipeline.generatePages(spark, 80)))
    val t2 = tripleSet(Pipeline.extractTriples(spark, Pipeline.generatePages(spark, 80)))
    assert(t1 === t2)
    assert(t1.nonEmpty)
  }

  test("broadcast and salted entity linking agree (J5 skew path)") {
    val pages = Pipeline.generatePages(spark, 80)
    val a = tripleSet(Pipeline.extractTriples(spark, pages, salted = false))
    val b = tripleSet(Pipeline.extractTriples(spark, pages, salted = true))
    assert(a === b)
  }

  test("hot-key skew exists by construction (united states is Zipf-hot)") {
    val pages = Pipeline.generatePages(spark, 120)
    val bundle = spark.sparkContext.broadcast(Pipeline.buildBundle())
    val scored = Pipeline.scorePages(spark, pages, bundle)
    val byObj = scored.groupBy("objectSurface").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hot = byObj.getOrElse("united states", 0L) + byObj.getOrElse("the united states", 0L)
    val coldCountries = Seq("freedonia", "sylvania", "latveria", "genosha", "wakanda")
      .map(byObj.getOrElse(_, 0L))
    assert(hot > coldCountries.max * 3, s"hot=$hot cold=$coldCountries")
  }

  test("checkpointed run resumes: second invocation processes zero buckets") {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    try {
      val pages = Pipeline.generatePages(spark, 60)
      val r1 = Pipeline.runCheckpointed(spark, pages, dir, buckets = 8)
      assert(r1.bucketsProcessed.size === 8)
      assert(r1.triples > 0)
      val r2 = Pipeline.runCheckpointed(spark, pages, dir, buckets = 8)
      assert(r2.bucketsProcessed.isEmpty)
      assert(r2.bucketsSkipped.size === 8)
      assert(r2.triples === r1.triples)
    } finally Lineage.deleteRecursively(dir)
  }

  test("maxBucketsPerRun: partial run commits buckets but defers the graph; " +
      "resume completes bit-identically") {
    val dir = Files.createTempDirectory("graft-partial-knob").toString
    val fullDir = Files.createTempDirectory("graft-full-knob").toString
    try {
      val pages = Pipeline.generatePages(spark, 60)
      val full = Pipeline.runCheckpointed(spark, pages, fullDir, buckets = 8)
      // "crash" after half the buckets commit
      val half = Pipeline.runCheckpointed(spark, pages, dir, buckets = 8, maxBucketsPerRun = 4)
      assert(half.bucketsProcessed.size === 4)
      assert(half.triples === -1L && half.nodes === -1L,
        "partial run must not publish a graph snapshot")
      assert(Lineage.snapshots(dir, "edges").isEmpty)
      // restart: exactly the remainder runs, final graph equals uninterrupted
      val resumed = Pipeline.runCheckpointed(spark, pages, dir, buckets = 8)
      assert(resumed.bucketsSkipped.toSet === half.bucketsProcessed.toSet)
      assert(resumed.bucketsProcessed.toSet ===
        (0 until 8).toSet -- half.bucketsProcessed.toSet)
      assert(resumed.triples === full.triples)
      assert(tripleSet(Lineage.readTable(spark, dir, "edges")) ===
        tripleSet(Lineage.readTable(spark, fullDir, "edges")))
    } finally { Lineage.deleteRecursively(dir); Lineage.deleteRecursively(fullDir) }
  }

  test("checkpointed run resumes after partial failure: only missing buckets rerun") {
    val dir = Files.createTempDirectory("graft-partial").toString
    val fullDir = Files.createTempDirectory("graft-full").toString
    try {
      val pages = Pipeline.generatePages(spark, 60)
      val full = Pipeline.runCheckpointed(spark, pages, fullDir, buckets = 8)
      Pipeline.runCheckpointed(spark, pages, dir, buckets = 8)
      // simulate a failed run: drop manifest records + data for buckets 5..7
      val keep = Lineage.read(dir, "triples_raw").filter(_.bucket < 5)
      Lineage.clear(dir, "triples_raw")
      Lineage.append(dir, "triples_raw", keep)
      (5 until 8).foreach(b => Lineage.deleteRecursively(s"$dir/triples_raw/bucket=$b"))
      val resumed = Pipeline.runCheckpointed(spark, pages, dir, buckets = 8)
      assert(resumed.bucketsProcessed === Seq(5, 6, 7))
      assert(resumed.triples === full.triples)
      val edges = tripleSet(Lineage.readTable(spark, dir, "edges"))
      val expected = tripleSet(Lineage.readTable(spark, fullDir, "edges"))
      assert(edges === expected)
    } finally { Lineage.deleteRecursively(dir); Lineage.deleteRecursively(fullDir) }
  }

  test("lineage manifest records per-bucket row counts; snapshots advance per commit") {
    val dir = Files.createTempDirectory("graft-lineage").toString
    try {
      val pages = Pipeline.generatePages(spark, 40)
      val r = Pipeline.runCheckpointed(spark, pages, dir, buckets = 4)
      val recs = Lineage.read(dir, "triples_raw")
      assert(recs.map(_.bucket).sorted === Seq(0, 1, 2, 3))
      val rawCount = spark.read.parquet(s"$dir/triples_raw").count()
      assert(recs.map(_.rowsOut).sum === rawCount)
      // Iceberg-style snapshots: edges/nodes committed as snapshot 0
      assert(Lineage.snapshots(dir, "edges") === Some(0))
      assert(Lineage.snapshots(dir, "nodes") === Some(0))
      val snap = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, "_manifest", "edges.snapshot-0.json")), "UTF-8")
      assert(snap.contains(s""""rows":${r.triples}"""))
      assert(snap.contains(".parquet"))
      // a second commit advances the snapshot id; BOTH snapshots stay
      // readable (copy-on-write time travel), and current == latest
      Pipeline.runCheckpointed(spark, pages, dir, buckets = 4)
      assert(Lineage.snapshots(dir, "edges") === Some(1))
      val snap0 = tripleSet(Lineage.readSnapshot(spark, dir, "edges", 0))
      val snap1 = tripleSet(Lineage.readSnapshot(spark, dir, "edges", 1))
      val current = tripleSet(Lineage.readTable(spark, dir, "edges"))
      assert(snap0 === snap1) // same input corpus → same graph
      assert(current === snap1)
      assert(snap0.nonEmpty)
    } finally Lineage.deleteRecursively(dir)
  }

  test("snapshot time travel: an overwritten table's history stays readable") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-tt").toString
    try {
      // commit 1: three rows
      val id0 = Lineage.nextSnapshotId(dir, "t")
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
        .write.parquet(Lineage.snapshotDataDir(dir, "t", id0))
      Lineage.writeSnapshot(dir, "t", 3, id0)
      // commit 2: different content
      val id1 = Lineage.nextSnapshotId(dir, "t")
      Seq((9L, "z")).toDF("k", "v")
        .write.parquet(Lineage.snapshotDataDir(dir, "t", id1))
      Lineage.writeSnapshot(dir, "t", 1, id1)
      assert(id0 === 0 && id1 === 1)
      val s0 = Lineage.readSnapshot(spark, dir, "t", 0)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val s1 = Lineage.readTable(spark, dir, "t")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(s0 === Set((1L, "a"), (2L, "b"), (3L, "c")))
      assert(s1 === Set((9L, "z")))
      assertThrows[IllegalArgumentException](Lineage.snapshotFiles(dir, "t", 7))
    } finally Lineage.deleteRecursively(dir)
  }

  test("pages TABLE at rest (input-hint shape) → identical triples as in-memory corpus") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-pages-table").toString
    try {
      // write the pages table with ALL input-hint columns populated
      Pipeline.generatePages(spark, 50, withText = true)
        .write.mode("overwrite").parquet(dir)
      val onDisk = spark.read.parquet(dir)
      assert(onDisk.schema.fieldNames.toSet ===
        Set("url", "warc_ts", "html", "text", "lang"))
      val fromTable = tripleSet(Pipeline.extractTriples(spark, onDisk.as[Page]))
      val fromMemory = tripleSet(Pipeline.extractTriples(spark, Pipeline.generatePages(spark, 50)))
      assert(fromTable === fromMemory)
      // the scan is pruned: scoring consumes only url+html
      val plan = Pipeline.scorePages(spark, onDisk.as[Page],
        spark.sparkContext.broadcast(Pipeline.buildBundle()))
        .queryExecution.executedPlan.toString
      val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan).map(_.group(1))
      assert(read.exists(s => s.contains("url") && s.contains("html") && !s.contains("text")),
        s"pages scan must prune to url+html: $read\n$plan")
    } finally Lineage.deleteRecursively(dir)
  }

  test("streaming KG construction emits exactly the batch pipeline's triples") {
    val dir = Files.createTempDirectory("graft-stream-eq").toString
    try {
      Pipeline.generatePages(spark, 80, withText = true)
        .write.mode("overwrite").parquet(dir)
      val streamed = tripleSet(
        graft.ops.Streaming.streamingKgTriples(spark, dir, Pipeline.buildBundle()))
      val batch = tripleSet(
        Pipeline.extractTriples(spark, Pipeline.generatePages(spark, 80)))
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally Lineage.deleteRecursively(dir)
  }

  test("rate-limited stream (maxFilesPerTrigger=1) runs REAL multi-batch; triples unchanged") {
    // the micro-batch-boundary-independence claim at actual boundaries:
    // 6 source files × maxFilesPerTrigger=1 → ≥ 6 micro-batches through the
    // scoring + linking + append path, then the batch dedup compaction must
    // still emit exactly the batch pipeline's triple set
    val dir = Files.createTempDirectory("graft-stream-multibatch").toString
    try {
      Pipeline.generatePages(spark, 80, withText = true).repartition(6)
        .write.mode("overwrite").parquet(dir)
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val streamed = tripleSet(graft.ops.Streaming.streamingKgTriples(
        spark, dir, Pipeline.buildBundle(),
        maxFilesPerTrigger = 1, batchCounter = Some(batches)))
      assert(batches.get() >= 3,
        s"rate limit must force multiple micro-batches, got ${batches.get()}")
      val batch = tripleSet(
        Pipeline.extractTriples(spark, Pipeline.generatePages(spark, 80)))
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally Lineage.deleteRecursively(dir)
  }

  test("rate-limited streaming dedup carries state across micro-batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream-dedup-multibatch").toString
    try {
      // duplicates deliberately SPREAD across files so dedup state must
      // survive batch boundaries for the result to equal SELECT DISTINCT
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartition(5).write.mode("overwrite").parquet(dir)
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val streamed = graft.ops.Streaming.streamingDedup(spark, dir,
        maxFilesPerTrigger = 1, batchCounter = Some(batches))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(batches.get() >= 3,
        s"rate limit must force multiple micro-batches, got ${batches.get()}")
      val exact = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "event_type").distinct()
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === exact)
    } finally Lineage.deleteRecursively(dir)
  }

  test("rate-limited windowed agg: append-mode watermark eviction across " +
      "micro-batches equals the batch aggregation with BOUNDED state") {
    import org.apache.spark.sql.functions._
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft-stream-win-multibatch").toString
    try {
      // time-ordered 5-file split (bounded disorder — the watermark
      // contract): each file covers a contiguous ts range; strictly
      // increasing mod-times make the file source replay the stream in
      // event-time order, so append mode's late-data rule drops nothing
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .repartitionByRange(5, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(dir)
      val parts = {
        val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        try s.iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
          .toSeq.sortBy(_.getFileName.toString)
        finally s.close()
      }
      assert(parts.size == 5)
      val base = java.nio.file.Files.getLastModifiedTime(parts.head).toMillis
      parts.zipWithIndex.foreach { case (f, i) =>
        java.nio.file.Files.setLastModifiedTime(f,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
      }
      val batches = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxState = new java.util.concurrent.atomic.AtomicLong(0)
      val streamed = graft.ops.Streaming.windowedEventCounts(spark, dir,
        maxFilesPerTrigger = 1, batchCounter = Some(batches),
        stateRowsMax = Some(maxState))
        .collect().map(r => (r.get(0).toString + "/" + r.getString(1), r.getLong(2))).toMap
      assert(batches.get() >= 3,
        s"rate limit must force multiple micro-batches, got ${batches.get()}")
      val exact = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.get(0).toString + "/" + r.getString(1), r.getLong(2))).toMap
      assert(streamed === exact)
      // the point of append mode: finalized windows are EVICTED, so peak
      // state is far below the total window count (complete mode would
      // retain every window ever opened = exact.size rows at the end)
      assert(maxState.get() > 0, "state metrics must be observed")
      assert(maxState.get() < exact.size / 2,
        s"state must stay bounded by eviction: peak ${maxState.get()} vs ${exact.size} total windows")
    } finally Lineage.deleteRecursively(dir)
  }

  test("windowed agg edge cases: empty source -> typed empty result; " +
      "single event -> drain flushes the one (trailing) window") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-stream-edge").toString
    try {
      val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      // empty source: zero micro-batches, nothing to drain — must return
      // the empty TYPED frame, not throw (the old memory-sink behavior)
      events.limit(0).write.mode("overwrite").parquet(s"$dir/empty")
      val empty = graft.ops.Streaming.windowedEventCounts(spark, s"$dir/empty")
      assert(empty.columns.toSeq ===
        Seq("window_start", "event_type", "n", "total_value"))
      assert(empty.count() === 0L)
      // single event: its window is open at end-of-data (watermark never
      // passes it) — ONLY the sentinel drain can flush it
      events.orderBy("event_id").limit(1).write.mode("overwrite").parquet(s"$dir/one")
      val one = graft.ops.Streaming.windowedEventCounts(spark, s"$dir/one").collect()
      assert(one.length === 1)
      assert(one(0).getLong(2) === 1L)
    } finally Lineage.deleteRecursively(dir)
  }

  test("triple P/R vs frozen reference extractions >= 0.95 (BASELINE gate)") {
    val goldenPath = getClass.getResource("/golden_triples.tsv")
    assume(goldenPath != null, "golden fixture not yet generated — run graft.kg.GoldenGen")
    val golden = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/golden_triples.tsv"), "UTF-8")
      .getLines().filter(_.nonEmpty).map { l =>
        val Array(s, r, o) = l.split("\t"); (s, r, o)
      }.toSet
    val got = Pipeline.extractTriples(spark, Pipeline.generatePages(spark, GoldenGen.N_PAGES))
      .select("subject_id", "relation", "object_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val tp = (got intersect golden).size.toDouble
    val precision = tp / got.size
    val recall = tp / golden.size
    assert(precision >= 0.95, s"precision $precision")
    assert(recall >= 0.95, s"recall $recall")
  }
}

/** One-time golden fixture generator: freezes the deterministic pipeline's
  * extractions as the "reference" triple set (SURVEY.md §7.3 — the reference
  * repo ships no trained weights, so reference semantics are defined by the
  * frozen fixture scorer at seed 42). */
object GoldenGen {
  val N_PAGES = 200L
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val triples = Pipeline.extractTriples(spark, Pipeline.generatePages(spark, N_PAGES))
      .select("subject_id", "relation", "object_id").collect()
      .map(r => s"${r.getString(0)}\t${r.getString(1)}\t${r.getString(2)}")
      .sorted
    val out = java.nio.file.Paths.get("src/test/resources/golden_triples.tsv")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, triples.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${triples.length} golden triples to $out")
    spark.stop()
  }
}
