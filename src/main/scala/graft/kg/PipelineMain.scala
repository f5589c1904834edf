package graft.kg

import org.apache.spark.sql.SparkSession

/**
 * spark-submit entry point for the checkpointed KG-construction run:
 *
 *   spark-submit --class graft.kg.PipelineMain <jar> \
 *     --out /data/kg_out [--pages 100000] [--buckets 256] [--salted] \
 *     [--pages-path /data/pages_parquet] \
 *     [--experiment /data/experiments/deploy] \
 *     [--options scope:3,dropout:0.1] \
 *     [--senna-words words.lst --senna-embeddings embeddings.txt]
 *
 * With --pages-path the corpus is read from an existing pages table
 * (url, warc_ts, html, text, lang); otherwise the deterministic synthetic
 * generator supplies --pages rows. --experiment loads a saved model
 * directory (S9 deploy contract, kbp.py:38-45) instead of the fixture
 * bundle; --senna-* preloads a Senna-format pretrained embedding table
 * into the model (S6, models.py:33-40). On a cluster, every setting here
 * comes from spark-submit; the code makes no local[] assumptions.
 *
 * --options is the reference's docopt override surface (train.py:115-121):
 * comma-separated `key:value` specs merged over the experiment's (or
 * default) config with the reference's type-coercion rules; the merged
 * EFFECTIVE config is written to `<out>/config.json`, and the `scope`
 * override is applied to the live bundle (model tensor dims come from the
 * loaded weights and are recorded, not rebuilt).
 */
object PipelineMain {

  /** The --options resolution (testable core of the CLI surface): merge
    * overrides over the experiment's (or default) config, apply the LIVE
    * knobs — scope (featurization window) and dropout (inference scale) —
    * to the bundle, and reject structural overrides (emb_dim / hidden /
    * rel_size) that contradict the loaded weight tensors. Returns the
    * bundle to run with and the EFFECTIVE config to persist. */
  private[kg] def resolveConfig(bundle0: Option[Pipeline.ScoringBundle],
      experiment: String, options: String): (Option[Pipeline.ScoringBundle], Map[String, String]) = {
    val defaultBundle = bundle0.getOrElse(Pipeline.buildBundle())
    val baseConfig =
      if (experiment.nonEmpty) Experiments.readConfig(experiment)
      else Map(
        "emb_dim" -> defaultBundle.weights.embDim.toString,
        "hidden" -> defaultBundle.weights.hidden.toString,
        "rel_size" -> defaultBundle.weights.relSize.toString,
        "dropout" -> defaultBundle.weights.dropout.toString,
        "scope" -> defaultBundle.scope.toString)
    val effective = Experiments.applyOverrides(baseConfig, options)
    Seq("emb_dim", "hidden", "rel_size").foreach { k =>
      if (baseConfig.contains(k) && effective(k) != baseConfig(k))
        throw new IllegalArgumentException(
          s"--options $k:${effective(k)} contradicts the loaded weight tensors " +
            s"($k=${baseConfig(k)}); structural dims come from the weights, not the config")
    }
    var b = defaultBundle
    if (effective("scope") != baseConfig("scope")) b = b.copy(scope = effective("scope").toInt)
    if (baseConfig.contains("dropout") && effective("dropout") != baseConfig("dropout"))
      b = b.copy(weights = b.weights.copy(dropout = effective("dropout").toFloat))
    (if (b eq defaultBundle) bundle0 else Some(b), effective)
  }

  def main(args: Array[String]): Unit = {
    var out = ""
    var pages = 10000L
    var buckets = 32
    var salted = false
    var pagesPath = ""
    var experiment = ""
    var options = ""
    var sennaWords = ""
    var sennaEmb = ""
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--out" => out = args(i + 1); i += 2
        case "--pages" => pages = args(i + 1).toLong; i += 2
        case "--buckets" => buckets = args(i + 1).toInt; i += 2
        case "--salted" => salted = true; i += 1
        case "--pages-path" => pagesPath = args(i + 1); i += 2
        case "--experiment" => experiment = args(i + 1); i += 2
        case "--options" => options = args(i + 1); i += 2
        case "--senna-words" => sennaWords = args(i + 1); i += 2
        case "--senna-embeddings" => sennaEmb = args(i + 1); i += 2
        case other => throw new IllegalArgumentException(s"unknown arg: $other")
      }
    }
    require(out.nonEmpty, "--out is required")
    val builder = SparkSession.builder().appName("graft-kg-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // local fallback for sandbox runs; spark-submit --master overrides
    val spark = (if (sys.env.contains("SPARK_GRAFT_LOCAL"))
      builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = if (pagesPath.nonEmpty) spark.read.parquet(pagesPath).as[Page]
      else Pipeline.generatePages(spark, pages)
    // deploy-time model: saved experiment dir (S9), else the fixture bundle;
    // optional Senna embedding preload (S6) on top of either
    val base = if (experiment.nonEmpty) {
      val p = java.nio.file.Paths.get(experiment)
      Some(Experiments.load(p.getParent.toString, p.getFileName.toString))
    } else None
    val bundle0 = (base, sennaWords.nonEmpty && sennaEmb.nonEmpty) match {
      case (b, true) =>
        val b0 = b.getOrElse(Pipeline.buildBundle())
        Some(b0.copy(weights =
          Pretrain.loadAndPreload(b0.weights, b0.word, sennaWords, sennaEmb)))
      case (b, false) => b
    }
    // --options (train.py:115-121): merge k:v overrides over the loaded
    // experiment's config (or the fixture-default one), APPLY the live
    // knobs (scope, dropout), REJECT structural overrides that contradict
    // the loaded weight tensors (silently recording them would produce a
    // config.json that lies about the run), and persist the effective
    // config next to the graph tables
    val (bundle, effective) = PipelineMain.resolveConfig(bundle0, experiment, options)
    val report = Pipeline.runCheckpointed(spark, corpus, out, buckets = buckets,
      salted = salted, bundle = bundle)
    Experiments.writeConfig(out, effective)
    // K2 sink: best_scores.json-style run summary next to the graph tables
    Metrics.writeScoresJson(s"$out/run_scores.json", Map(
      "triples" -> report.triples.toDouble,
      "nodes" -> report.nodes.toDouble,
      "buckets_processed" -> report.bucketsProcessed.size.toDouble,
      "buckets_skipped" -> report.bucketsSkipped.size.toDouble,
      "featurize_errors" -> report.errors.toDouble))
    println(s"""{"triples":${report.triples},"nodes":${report.nodes},"bucketsProcessed":${report.bucketsProcessed.size},"bucketsSkipped":${report.bucketsSkipped.size},"errors":${report.errors}}""")
    spark.stop()
  }
}
