package graft.tools

/** Thread-scaling microbenchmarks for the hot per-row kernels (page
  * generation+extraction, segmentation+scoring) — used to separate JVM/
  * memory-bandwidth scaling limits from Spark scheduling effects when
  * tuning the Bench/ScalingBench numbers. */
object MicroBench {
  def time(label: String, threads: Int, n: Long)(work: (Long, Long) => Unit): Double = {
    val t0 = System.nanoTime()
    val per = n / threads
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => work(t * per, (t + 1) * per))
      th.start(); th
    }
    ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"$label%-18s threads=$threads%-3d sec=$sec%8.3f rows_per_sec=${n / sec}%12.0f")
    sec
  }

  def main(args: Array[String]): Unit = {
    val n = 100000L
    val sink = new java.util.concurrent.atomic.AtomicLong()
    for (th <- Seq(1, 8, 32)) {
      time("gen+extract", th, n) { (a, b) =>
        var i = a; var acc = 0L
        while (i < b) { acc += graft.kg.Gen.page(42L, i).text.length; i += 1 }
        sink.addAndGet(acc)
      }
    }
    val bundle = graft.kg.Pipeline.buildBundle()
    val pages = (0L until 2000L).map(graft.kg.Gen.page(42L, _)).toArray
    val scorer = new graft.kg.Scorer(bundle.weights, bundle.typechecker)
    for (th <- Seq(1, 8, 32)) {
      time("segment+score", th, n) { (a, b) =>
        var i = a; var acc = 0L
        while (i < b) {
          val page = pages((i % 2000).toInt)
          graft.kg.Segment.sentences(page.text).foreach { sent =>
            val toks = graft.kg.Segment.tokenize(sent)
            val ms = graft.kg.Segment.detectMentions(toks, bundle.gazetteer, bundle.gazMaxLen)
            graft.kg.Segment.candidatePairs(ms).foreach { case (s, o) =>
              try {
                val ex = graft.kg.Segment.toExample(toks, s, o)
                val f = new graft.kg.SentenceFeaturizer({ val v = new graft.kg.VocabSet; v })
                acc += 1
              } catch { case _: Exception => }
            }
          }
          i += 1
        }
        sink.addAndGet(acc)
      }
    }
    println(s"sink=${sink.get()}")
  }
}
