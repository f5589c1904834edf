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
    val n = sys.env.getOrElse("MICRO_N", "100000").toLong
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val bundle = graft.kg.Pipeline.buildBundle()
    val pages = (0L until 2000L).map(graft.kg.Gen.page(42L, _)).toArray

    def phases(th: Int): Unit = {
      time("gen-only", th, n) { (a, b) =>
        var i = a; var acc = 0L
        while (i < b) { acc += graft.kg.Gen.page(42L, i, withText = false).html.length; i += 1 }
        sink.addAndGet(acc)
      }
      time("extract-only", th, n) { (a, b) =>
        var i = a; var acc = 0L
        while (i < b) {
          acc += graft.kg.TextExtract.extract(pages((i % 2000).toInt).html).length; i += 1
        }
        sink.addAndGet(acc)
      }
      time("segment+mentions", th, n) { (a, b) =>
        val gazIndex = new graft.kg.Segment.GazetteerIndex(bundle.gazetteer)
        var i = a; var acc = 0L
        while (i < b) {
          val page = pages((i % 2000).toInt)
          graft.kg.Segment.sentences(page.text).foreach { sent =>
            val toks = graft.kg.Segment.tokenize(sent)
            val lower = toks.map(graft.kg.Adaptors.asciiLower)
            val ms = graft.kg.Segment.detectMentionsIndexed(lower, gazIndex)
            acc += graft.kg.Segment.candidatePairs(ms).length
          }
          i += 1
        }
        sink.addAndGet(acc)
      }
      time("full-kernel", th, n) { (a, b) =>
        val scorer = new graft.kg.Scorer(bundle.weights, bundle.typechecker)
        val gazIndex = new graft.kg.Segment.GazetteerIndex(bundle.gazetteer)
        val noRel = bundle.rel("no_relation")
        var i = a; var acc = 0L
        while (i < b) {
          val page = pages((i % 2000).toInt)
          val text = graft.kg.TextExtract.extract(page.html)
          graft.kg.Segment.sentences(text).foreach { sent =>
            val toks = graft.kg.Segment.tokenize(sent)
            val lower = toks.map(graft.kg.Adaptors.asciiLower)
            val ms = graft.kg.Segment.detectMentionsIndexed(lower, gazIndex)
            if (ms.nonEmpty) {
              val words = graft.kg.Adaptors.zeroDigits(lower).toIndexedSeq
              val ids = words.map(bundle.word(_)).toArray
              graft.kg.Segment.candidatePairs(ms).foreach { case (s, o) =>
                // approximate the blanked-seq cost with a direct score call
                val (relId, _) = scorer.predict(ids, bundle.ner(s.ner), bundle.ner(o.ner))
                if (relId != noRel) acc += 1
              }
            }
          }
          i += 1
        }
        sink.addAndGet(acc)
      }
    }
    Seq(8, 32).foreach(phases)
    println(s"sink=${sink.get()}")
  }
}
