package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Larger-scale battery datapoint (VERDICT r4 ask #8): build an
 * sf1-EQUIVALENT corpus locally (10× the sf0.1 bench tables, seeded and
 * deterministic) and run the dedup + ANN family once, to confirm the
 * bounded-memory claims empirically — overflow accumulator counts instead
 * of OOMs, wall-clock that scales like the row count.
 *
 * Corpus construction (pure transformations of the driver's sf0.1 parquet —
 * no external data): `copies` shifted replicas of each table with disjoint
 * id ranges. Replica 1 is byte-identical to replica 0 (exact-dup structure:
 * every doc has one true duplicate), replicas 2+ carry a one-token /
 * first-component perturbation (near-dup structure: clusters of ~`copies`
 * near-identical members — the worst realistic shape for banding operators,
 * boilerplate-heavy like a crawled corpus).
 *
 * Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 * SPARK_GRAFT_COPIES (default 10), SPARK_GRAFT_CPUS (default 32),
 * SPARK_GRAFT_TRIALS (default 2 — min is reported; the sandbox has bursty
 * background load), SPARK_GRAFT_SKIP (comma-separated op names — e.g.
 * skip the deliberately-mis-sized ann_pairs_default at larger multiples,
 * where its quadratic verify would dominate the probe).
 *
 * Prints one JSON line: per-op seconds (min over trials), result rows, and
 * every overflow accumulator.
 */
object Sf1Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idStride = 10000000L
    def replicate(df: DataFrame, idCol: String, perturb: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map { c =>
        val shifted = df.withColumn(idCol, col(idCol) + lit(c * idStride))
        if (c >= 2) perturb(shifted, c) else shifted // replicas 0,1 identical
      }.reduce(_ unionByName _)

    val docs = replicate(spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id",
      (d, c) => d.withColumn("text", concat(col("text"), lit(s" copytok$c"))))
      .localCheckpoint() // materialize once; every op reads the same table
    val embs = replicate(spark.read.parquet(s"$sfDir/embeddings.parquet"), "vec_id",
      (e, c) => e.withColumn("embedding",
        concat(array((element_at(col("embedding"), 1) + lit(c * 0.001f)).cast("float")),
          slice(col("embedding"), 2, 63))))
      .localCheckpoint()
    val nDocs = docs.count()
    val nEmbs = embs.count()

    val sc = spark.sparkContext
    // one accumulator per op that can drop ids (separate default/auto ANN
    // counters), RESET before every trial so the recorded value is one
    // run's drops, not a sum over trials
    val accs = scala.collection.mutable.LinkedHashMap(
      "lsh_dropped" -> sc.longAccumulator("graft.lsh.dropped_ids"),
      "winnow_dropped" -> sc.longAccumulator("graft.winnow.dropped_ids"),
      "simhash_dropped" -> sc.longAccumulator("graft.simhash.dropped_ids"),
      "ann_default_dropped" -> sc.longAccumulator("graft.ann.dropped_ids.default"),
      "ann_auto_dropped" -> sc.longAccumulator("graft.ann.dropped_ids.auto"))

    import graft.ops.{Dedup, Similarity, TextAnalysis}
    val sigs = Dedup.minhashSignatures(docs, 4).localCheckpoint()
    val ops: Seq[(String, () => Long)] = Seq(
      "dedup_exact" -> (() => Dedup.exact(docs).count()),
      "minhash_sigs" -> (() => Dedup.minhashSignatures(docs, 4).count()),
      "lsh_pairs" -> (() => Dedup.lshCandidatePairsFromSigs(
        sigs, droppedAcc = Some(accs("lsh_dropped"))).count()),
      "neardup_clusters" -> (() => Dedup.nearDupClusters(docs, sigs = Some(sigs)).count()),
      "simhash_pairs" -> (() => Dedup.simhashPairs(docs,
        droppedAcc = Some(accs("simhash_dropped"))).count()),
      "winnow_pairs" -> (() => TextAnalysis.winnowCandidatePairs(spark, docs,
        droppedAcc = Some(accs("winnow_dropped"))).count()),
      "ngram_jaccard_lsh" -> (() => Dedup.ngramJaccardForPairs(docs,
        Dedup.lshCandidatePairsFromSigs(sigs)).count()),
      // duplicated-span intervals over the replicated corpus: nearly every
      // position is duplicated (replica structure), so this measures the
      // gaps-and-islands window at its worst case — dup table ≈ the whole
      // positional span table. The span table is MATERIALIZED first (the
      // SpanCache shared-table contract the battery uses): its two
      // consumers (document frequency + join-back) must not re-run the
      // 20-wide shingle concat.
      "dup_intervals" -> (() => TextAnalysis.dupSpanIntervals(
        TextAnalysis.spanDigests(docs).localCheckpoint()).count()),
      // the cut ACTION at the replica worst case: all but one replica of
      // every span is cut, so the splice rewrites ~(copies-1)/copies of
      // the corpus; canonical selection is a groupBy-min over the whole
      // positional table. The aggregate consumes the digest column so
      // Catalyst cannot prune the splice out of the measurement (a bare
      // count() would).
      "dedup_cut" -> (() => {
        val cutDf = TextAnalysis.cutDuplicateSpans(docs,
          TextAnalysis.spanDigests(docs).localCheckpoint())
        val r = cutDf.agg(count(lit(1)), sum(col("cut_tokens")),
          sum(length(col("cleaned_md5")))).head()
        System.err.println(s"[sf1probe]   dedup_cut detail: cut_tokens=${r.getLong(1)}")
        r.getLong(0)
      }),
      "bloom_decontaminate" -> (() => Dedup.decontaminateBloom(docs,
        docs.filter(col("doc_id") % 97 === 0), n = 3).count()),
      // battery-default banding (planesPerBand=3, sized for the 2k-vector
      // bench table): at 20k vectors the expected bucket grows 10×, and the
      // in-bucket verify grows ~100× — the measured cost of NOT resizing
      "ann_pairs_default" -> (() => Similarity.annCandidatePairs(embs, 0.3,
        droppedAcc = Some(accs("ann_default_dropped"))).count()),
      // the production path: planesForCorpus re-sizes the banding to the
      // actual corpus count, holding expected bucket population constant
      "ann_pairs_auto" -> (() => Similarity.annCandidatePairsAuto(embs, 0.3,
        targetBucketSize = 1000, droppedAcc = Some(accs("ann_auto_dropped"))).count()),
      "ann_knn_auto" -> (() => Similarity.annTopKJoin(embs, k = 1, minCosine = 0.2,
        planesPerBand = Similarity.planesForCorpus(nEmbs, 1000)).count()),
      // the IVF family at auto nlist: exercises BOTH regimes of the
      // min-population rule (population-bound below 65536 vectors, √n
      // above) — full deterministic Lloyd build + probe-pruned top-k
      "ivf_topk_auto" -> (() => {
        val q = embs.filter(col("vec_id") === 0)
          .select(col("embedding")).head().getSeq[Float](0).toArray
        val rest = embs.filter(col("vec_id") =!= 0)
        val nlist = Similarity.nlistForCorpus(nEmbs - 1)
        Similarity.ivfCosineTopK(rest, q, k = 10, nlist = nlist,
          nprobe = Similarity.nprobeForNlist(nlist)).count()
      }),
      // SemDeDup at auto nlist over the replica corpus — the worst
      // realistic case for cluster-bounded pairwise work: every vector has
      // ~copies near-identical siblings, so in-cluster pair volume is the
      // cap the nlistForCorpus population rule promises. The kept=false
      // count proves the action fires at scale (replicas drop).
      "semdedup_auto" -> (() => {
        val out = Similarity.semDeDup(embs.filter(col("vec_id") =!= 0))
        val r = out.agg(count(lit(1)), sum(when(col("kept"), 0L).otherwise(1L))).head()
        System.err.println(s"[sf1probe]   semdedup detail: dropped=${r.getLong(1)}")
        r.getLong(0)
      }),
      // concat-and-chunk packing: the distributed prefix sum at scale (the
      // one op whose naive form would be a single-partition window)
      "pack_chunks" -> (() => TextAnalysis.packChunks(docs).count()),
      // corpus-frequency rarity: token-keyed join-back shape at scale
      "rarity_score" -> (() => TextAnalysis.rarityScore(docs).count()),
      // two-source distribution shift: vocab-keyed conditional sums +
      // distributed top-k (TakeOrderedAndProject) at scale
      "token_shift" -> (() => TextAnalysis.tokenShift(docs, "src0", "src1").count()),
      // source-level gate: one tiny-keyspace groupBy (sources, not docs)
      "source_stats" -> (() => TextAnalysis.sourceStats(docs).count()))

    // each accumulator is driven by exactly one op; its value is SNAPSHOT
    // right after that op's trials (the last trial's count — the reset
    // before each trial keeps it a single-run figure, not a trial sum)
    val finalCounts = scala.collection.mutable.LinkedHashMap(
      accs.keys.map(_ -> 0L).toSeq: _*)
    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "").split(",").filter(_.nonEmpty).toSet
    val results = ops.filterNot(o => skip(o._1)).map { case (name, run) =>
      var rows = 0L
      val secs = (1 to trials).map { _ =>
        accs.values.foreach(_.reset())
        val t0 = System.nanoTime()
        rows = run()
        (System.nanoTime() - t0) / 1e9
      }
      accs.foreach { case (n, a) => if (a.value > 0) finalCounts(n) = a.value }
      System.err.println(f"[sf1probe] $name%-20s ${secs.min}%8.2f s  rows=$rows")
      (name, secs.min, rows)
    }

    val opsJson = results.map { case (n, s, r) => s""""$n":{"sec":$s,"rows":$r}""" }
      .mkString("{", ",", "}")
    val accJson = finalCounts.map { case (n, v) => s""""$n":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"sf1_probe","value":$total,"unit":"sec","copies":$copies,"n_docs":$nDocs,"n_embeddings":$nEmbs,"ops":$opsJson,"overflow":$accJson}""")
    spark.stop()
  }
}
