package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Structured Streaming analog of the reference's only unbounded operator —
 * the stdin micro-batch loop (reference: data/adaptors.py:111-120 + the
 * kbp.py:49-78 cache-and-flush). The reference has no watermarks/windows/
 * state (SURVEY.md §2.8); we provide the standard streaming surface anyway:
 * event-time tumbling-window aggregation with a watermark, driven
 * synchronously over a static parquet dir for tests/verification.
 */
object Streaming {

  /** Tumbling 1-hour event-time counts per event_type, computed by an
    * actual streaming query. The result is identical to the batch
    * `date_trunc` aggregation — which is the DuckDB oracle.
    *
    * Sink shape: the stateful windowed aggregate is SMALL by construction
    * (one row per open (window, event_type)), so each micro-batch
    * idempotently overwrites a parquet snapshot of the complete aggregate
    * (foreachBatch, the standard streaming-agg → snapshot-table pattern)
    * and the caller reads the final snapshot back — results never flow
    * through a driver-memory sink, so the output path is executor-parallel
    * like the streaming-KG file sink.
    *
    * `maxFilesPerTrigger > 0` rate-limits the source so AvailableNow runs
    * REAL multi-micro-batch execution: the snapshot is overwritten once
    * per batch and the final state equals the batch aggregation no matter
    * how the files split (asserted in StreamingSpec); `batchCounter`
    * receives the number of snapshot writes. */
  def windowedEventCounts(spark: SparkSession, eventsPath: String,
      maxFilesPerTrigger: Int = 0,
      batchCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    val eventsDir = stageDir(eventsPath)
    val schema = spark.read.parquet(eventsDir).schema
    val out = java.nio.file.Files.createTempDirectory("graft-stream-win").toString
    try {
      val reader = spark.readStream.schema(schema)
      val limited = if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
      val q = limited.parquet(eventsDir)
      // parquet NTZ → LTZ for event-time semantics (session TZ is UTC, so
      // wall-clock values are unchanged); window start goes back to NTZ so
      // the output type matches the source column.
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchCounter.foreach(_.incrementAndGet())
        batch.write.mode("overwrite").parquet(s"$out/agg")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
      q.processAllAvailable()
      q.stop()
      // materialize (localCheckpoint is eager) so the staging dir can be removed
      spark.read.parquet(s"$out/agg").localCheckpoint()
    } finally graft.kg.Lineage.deleteRecursively(out) // also on query failure
  }

  /** Stateful streaming dedup: dropDuplicates on a composite key with an
    * event-time watermark bounding state (the scale-safe form — state for
    * keys older than the watermark is evicted). Emits the surviving key set,
    * which equals SELECT DISTINCT — the DuckDB oracle.
    *
    * Sink shape: append-mode parquet FILE sink (dropDuplicates emits each
    * first-seen key once, so append is exact) + batch read-back — the same
    * executor-parallel output path as the streaming-KG pipeline; no
    * driver-memory sink anywhere in the execution path.
    *
    * `maxFilesPerTrigger > 0` rate-limits the source so AvailableNow runs
    * REAL multi-micro-batch execution (state carries across batch
    * boundaries); `batchCounter` receives the number of data batches that
    * actually executed, so tests can assert > 1. */
  def streamingDedup(spark: SparkSession, eventsPath: String,
      maxFilesPerTrigger: Int = 0,
      batchCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    val eventsDir = stageDir(eventsPath)
    val schema = spark.read.parquet(eventsDir).schema
    val name = s"stream_dedup_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val reader = spark.readStream.schema(schema)
    val limited = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    // exact data-batch counting via a listener — recentProgress is capped
    // (default 100 entries) and would undercount long rate-limited runs
    val counted = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == name && e.progress.numInputRows > 0) counted.incrementAndGet()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    if (batchCounter.isDefined) spark.streams.addListener(listener)
    val out = java.nio.file.Files.createTempDirectory("graft-stream-dedup").toString
    try {
      val q = limited.parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "24 hours")
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
      .writeStream.outputMode("append")
      .format("parquet").option("path", s"$out/data")
      .option("checkpointLocation", s"$out/chk")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
      q.processAllAvailable()
      q.stop()
      if (batchCounter.isDefined) {
        // listener events are delivered asynchronously — wait (bounded) for
        // the count to stop moving before reading it
        var last = -1
        var waited = 0
        while (counted.get() != last && waited < 5000) {
          last = counted.get()
          Thread.sleep(100)
          waited += 100
        }
        spark.streams.removeListener(listener)
        batchCounter.foreach(_.set(counted.get()))
      }
      spark.read.parquet(s"$out/data").localCheckpoint()
    } finally graft.kg.Lineage.deleteRecursively(out) // also on query failure
  }

  /** Stage a single parquet FILE as a directory for the streaming source. */
  private def stageDir(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) path
    else {
      val tmp = java.nio.file.Files.createTempDirectory("stream_src")
      java.nio.file.Files.createSymbolicLink(tmp.resolve(p.getFileName), p.toAbsolutePath)
      tmp.toString
    }
  }

  /** Streaming micro-batch scoring (B2 analog): the KG scoring kernel run
    * via foreachBatch over a stream of pages — each micro-batch plays the
    * rôle of the reference's 2^15-example cache flush. Returns collected
    * batch sizes for verification. */
  def scorePagesStreaming(spark: SparkSession, pagesDir: String,
      bundle: graft.kg.Pipeline.ScoringBundle): Seq[(Long, Long)] = {
    import spark.implicits._
    val schema = spark.read.parquet(pagesDir).schema
    val bundleBc = spark.sparkContext.broadcast(bundle)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = spark.readStream.schema(schema).parquet(pagesDir)
      .writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val pages = batch.as[graft.kg.Page]
        val scored = graft.kg.Pipeline.scorePages(pages.sparkSession, pages, bundleBc)
        results.synchronized { results += ((batchId, scored.count())) }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    results.toSeq
  }

  /** Streaming KG construction end to end: a pages STREAM runs the fused
    * scoring kernel + broadcast entity linking per micro-batch, appends raw
    * linked triples to a file sink, and the final graph is the batch dedup
    * over everything the stream produced — so the emitted triple set is
    * INDEPENDENT of how the source files split into micro-batches (max
    * confidence and support aggregate over the union; asserted equal to the
    * batch pipeline in PipelineSpec). This is the production shape: stream
    * → raw append-only table → periodic compaction/dedup. */
  def streamingKgTriples(spark: SparkSession, pagesDir: String,
      bundle: graft.kg.Pipeline.ScoringBundle,
      maxFilesPerTrigger: Int = 0,
      batchCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None): DataFrame = {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-stream-kg").toString
    val schema = spark.read.parquet(pagesDir).schema
    val bundleBc = spark.sparkContext.broadcast(bundle)
    val dict = graft.kg.Pipeline.entityDict(spark)
    val reader = spark.readStream.schema(schema)
    val limited = if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader
    val q = limited.parquet(pagesDir)
      .writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
        batchCounter.foreach(_.incrementAndGet())
        val pages = batch.as[graft.kg.Page]
        val scored = graft.kg.Pipeline.scorePages(pages.sparkSession, pages, bundleBc)
        graft.kg.Pipeline.linkBroadcast(scored, dict)
          .write.mode("append").parquet(s"$out/raw")
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // materialize (localCheckpoint is eager) so the staging dir can be
    // deleted instead of leaking one temp tree per invocation
    val result = graft.kg.Pipeline.dedupTriples(spark.read.parquet(s"$out/raw"))
      .localCheckpoint()
    graft.kg.Lineage.deleteRecursively(out)
    result
  }
}
