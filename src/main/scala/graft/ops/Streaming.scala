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

  /** Reserved event_type carried by watermark-drain sentinel rows; contains
    * a NUL so it can never collide with real event types. Sentinel rows only
    * ever form their own (window, event_type) groups, which are filtered out
    * of the read-back. */
  val SentinelType = "\u0000graft_drain"

  /** Tumbling 1-hour event-time counts per event_type, computed by an
    * actual streaming query. The result is identical to the batch
    * `date_trunc` aggregation — which is the DuckDB oracle.
    *
    * State shape (the 100 TB story): `outputMode("append")` + the 1-hour
    * watermark means a window's state row is EVICTED as soon as the
    * watermark passes its end — state holds only the open ~2 hours of
    * windows per event_type at any instant, regardless of stream length
    * (asserted bounded across micro-batches in PipelineSpec via
    * `stateRowsMax`). Finalized windows append to a parquet FILE sink via
    * foreachBatch, so results never flow through a driver-memory sink and
    * the final table is the union of appends (each window emitted exactly
    * once).
    *
    * Drain: a bounded batch run ends with the last ~2 windows still open
    * (watermark = maxTs − 1 h never passes them), so after the data run we
    * perform the standard drain-flush — append ONE far-future sentinel row
    * (reserved [[SentinelType]], +3 h) as its own micro-batch. Eviction in
    * batch k uses the watermark computed from batches < k: the +3 h batch
    * advances the watermark past every real window end, and the CLOSING
    * NO-DATA micro-batch the engine runs when the watermark advanced
    * (`spark.sql.streaming.noDataMicroBatches.enabled`, default true —
    * required by this drain) evicts under it. This replaces the former
    * two-sentinel form (one fewer stateful micro-batch per drain; verified
    * equal to the batch aggregation by the oracle and the multi-batch
    * PipelineSpec cases). Sentinel groups are filtered from the read-back;
    * under AvailableNow the final table equals the batch aggregation
    * exactly, so the DuckDB oracle is unchanged.
    *
    * `maxFilesPerTrigger > 0` rate-limits the source so AvailableNow runs
    * REAL multi-micro-batch execution (append-mode state must carry across
    * batch boundaries); `batchCounter` receives the number of foreachBatch
    * invocations, `stateRowsMax` the max state-store row count observed
    * across all micro-batches (to assert boundedness). NOTE: append mode
    * treats data below the watermark as LATE and drops it, so multi-file
    * sources must be split time-ordered (bounded disorder — the watermark
    * contract); a single file / single batch is always safe. */
  def windowedEventCounts(spark: SparkSession, eventsPath: String,
      maxFilesPerTrigger: Int = 0,
      batchCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None,
      stateRowsMax: Option[java.util.concurrent.atomic.AtomicLong] = None,
      statePartitions: Int = 8): DataFrame = {
    // statePartitions sizes the stateful shuffle (= state-store instance
    // count, fixed by the first batch's checkpoint). The watermark-bounded
    // window aggregate holds only OPEN windows — a handful of rows per
    // event_type at ANY corpus scale (partial aggregation upstream is
    // map-side and unaffected) — so a small constant beats the session's
    // scan-sized shuffle width: every micro-batch pays one state-store
    // commit PER PARTITION, which at 32 partitions is pure fixed overhead.
    // Raise it for genuinely high-cardinality grouping keys.
    val schema = spark.read.parquet(eventsPath).schema
    val staged = stageAll(eventsPath)
    val nDataFiles = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      try { import scala.jdk.CollectionConverters._; s.iterator().asScala.size }
      finally s.close()
    }
    val out = java.nio.file.Files.createTempDirectory("graft-stream-win").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$out/data"))
    try {
      // parquet NTZ → LTZ for event-time semantics (session TZ is UTC, so
      // wall-clock values are unchanged); window start goes back to NTZ so
      // the output type matches the source column.
      def aggStream(reader: org.apache.spark.sql.streaming.DataStreamReader): DataFrame =
        reader.parquet(staged)
          .withColumn("ts", col("ts").cast("timestamp"))
          .withWatermark("ts", "1 hour")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("total_value"))
          .select(col("w.start").cast("timestamp_ntz").as("window_start"),
            col("event_type"), col("n"), col("total_value"))
      val outSchema = aggStream(spark.readStream.schema(schema)).schema
      // max-ts anchor row, collected ONCE (one TakeOrdered job — also the
      // empty-source guard: zero micro-batches would leave no snapshot and
      // no watermark to drain, so return the empty typed result directly).
      // The sentinel writes below start from this driver-held row as a
      // LocalRelation instead of re-scanning a checkpointed anchor — two
      // fewer actions inside the drain path.
      val anchorRows = spark.read.parquet(eventsPath)
        .orderBy(col("ts").desc).limit(1).collect()
      if (anchorRows.isEmpty)
        return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outSchema)
      val anchor = spark.createDataFrame(
        java.util.Arrays.asList(anchorRows(0)), schema)

      def runOnce(filesPerTrigger: Int): Unit = {
        val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
        // the drain REQUIRES the closing no-data micro-batch (doc above):
        // a session tuned with noDataMicroBatches=false would silently
        // never evict the trailing windows, so pin it for the run
        val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
        val prevNoData = spark.conf.get(noDataKey)
        spark.conf.set(noDataKey, "true")
        if (statePartitions > 0)
          spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
        try {
          val reader = spark.readStream.schema(schema)
          val limited = if (filesPerTrigger > 0)
            reader.option("maxFilesPerTrigger", filesPerTrigger) else reader
          val q = aggStream(limited)
            .writeStream.outputMode("append")
            .option("checkpointLocation", s"$out/chk")
            .foreachBatch { (batch: DataFrame, _: Long) =>
              batchCounter.foreach(_.incrementAndGet())
              batch.write.mode("append").parquet(s"$out/data")
              ()
            }
            .trigger(Trigger.AvailableNow())
            .start()
          try q.processAllAvailable() finally q.stop()
          stateRowsMax.foreach { m =>
            q.recentProgress.foreach(p => p.stateOperators.foreach(so =>
              m.getAndUpdate(cur => math.max(cur, so.numRowsTotal))))
          }
        } finally {
          spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
          spark.conf.set(noDataKey, prevNoData)
        }
      }
      // sentinel = the anchor row shifted +h hours with the reserved
      // event_type; its own window end stays above the advanced watermark,
      // and its group is filtered below, so it never pollutes the output.
      // Each sentinel is one file with a CONTROLLED mod-time so the drain
      // run replays them oldest-first as separate rate-limited batches.
      def writeSentinel(hours: Int, mtimeMillis: Long): Unit = {
        def listing() = {
          val s = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
          try { import scala.jdk.CollectionConverters._; s.iterator().asScala.toSet }
          finally s.close()
        }
        val before = listing()
        anchor
          .withColumn("ts", (col("ts").cast("timestamp") +
            expr(s"INTERVAL $hours HOURS")).cast(schema("ts").dataType))
          .withColumn("event_type", lit(SentinelType))
          .coalesce(1).write.mode("append").parquet(staged)
        (listing() -- before).foreach(p => java.nio.file.Files.setLastModifiedTime(
          p, java.nio.file.attribute.FileTime.fromMillis(mtimeMillis)))
      }

      val drainBase = System.currentTimeMillis() + 60000 // after every data file
      // With one data file (or an explicit per-file rate limit, where
      // per-file batching is already the contract), the sentinel rides the
      // SAME query lifecycle: rate limit 1 + mod-time order gives
      // data-batch(es) → sentinel batch → closing no-data batch in one run.
      // Otherwise the data runs unrestricted first and one rate-limited
      // resume lifecycle drains (sentinel batch + no-data batch).
      if (nDataFiles == 1 || maxFilesPerTrigger == 1) {
        writeSentinel(3, drainBase)
        runOnce(1)
      } else {
        // data phase: one batch when maxFilesPerTrigger=0; for an explicit
        // limit > 1 the time-ordered multi-file contract (doc above)
        // applies across batch boundaries, exactly as for limit = 1
        runOnce(maxFilesPerTrigger)
        writeSentinel(3, drainBase) // watermark → maxTs+2h; no-data batch evicts
        runOnce(1)
      }
      // materialize (localCheckpoint is eager) so the staging dirs can be removed
      spark.read.schema(outSchema).parquet(s"$out/data")
        .filter(col("event_type") =!= SentinelType)
        .localCheckpoint()
    } finally {                        // also on query failure
      graft.kg.Lineage.deleteRecursively(out)
      graft.kg.Lineage.deleteRecursively(staged)
    }
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
      batchCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None,
      statePartitions: Int = 8): DataFrame = {
    // statePartitions sizes the stateful shuffle exactly as in
    // [[windowedEventCounts]]: every micro-batch pays one state-store
    // commit PER PARTITION, so the session's scan-sized shuffle width (32
    // here) is pure fixed overhead per batch. Dedup state rows scale with
    // the distinct-key count, so at genuinely high key cardinality raise
    // this (it is a knob, not a constant tuned to the local core count);
    // partitioning never changes WHICH keys survive, only where they live.
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
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    if (statePartitions > 0)
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
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
      try q.processAllAvailable() finally q.stop() // stop even on failure —
      // otherwise the finally below deletes the staging dir under a live query
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
    } finally {                                       // also on query failure
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.kg.Lineage.deleteRecursively(out)
    }
  }

  /** Stage the source's parquet files into a PRIVATE directory (symlinks),
    * so drain-sentinel files can be appended without touching the source.
    * Symlinks keep the target's mod-time, so sentinel files (real, newer)
    * always sort after the data files in the file-stream source. */
  private def stageAll(path: String): String = {
    val p = java.nio.file.Paths.get(path)
    val tmp = java.nio.file.Files.createTempDirectory("stream_src")
    val files =
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.filter { f =>
            val n = f.getFileName.toString
            java.nio.file.Files.isRegularFile(f) && !n.startsWith("_") && !n.startsWith(".")
          }.toSeq
        } finally s.close()
      } else Seq(p)
    files.foreach(f => java.nio.file.Files.createSymbolicLink(
      tmp.resolve(f.getFileName), f.toAbsolutePath))
    tmp.toString
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
    try q.processAllAvailable() finally q.stop()
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
      batchCounter: Option[java.util.concurrent.atomic.AtomicInteger] = None,
      rawOut: Option[String] = None): DataFrame = {
    import spark.implicits._
    // rawOut keeps the raw append-only triple table at a caller-fixed path
    // (fresh per run — the sink appends) so the compaction/dedup stage can
    // be oracle-checked over the identical bytes; None = private temp dir
    val out = rawOut.getOrElse(java.nio.file.Files.createTempDirectory("graft-stream-kg").toString)
    if (rawOut.isDefined) graft.kg.Lineage.deleteRecursively(out)
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
    try q.processAllAvailable() finally q.stop()
    // materialize (localCheckpoint is eager) so the staging dir can be
    // deleted instead of leaking one temp tree per invocation
    val result = graft.kg.Pipeline.dedupTriples(spark.read.parquet(s"$out/raw"))
      .localCheckpoint()
    if (rawOut.isEmpty) graft.kg.Lineage.deleteRecursively(out)
    result
  }
}
