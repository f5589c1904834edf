package graft.ops

/**
 * The shared memory-bounded streaming bucket-expansion kernel: over rows
 * SORTED by (key, id) within a partition, buffer at most `maxBucket` ids
 * per bucket (8 bytes each — never a payload), emit (a, b) pairs lazily
 * for each arriving id against the buffered strictly-smaller ids, and
 * DROP ids past the cap — counted on the accumulator and logged once per
 * task (the no-silent-caps rule), never buffered. Memory per task is
 * O(maxBucket) longs regardless of bucket or corpus size.
 *
 * Used by the banded-ANN and minhash-LSH pair generators; the simhash
 * kernel stays specialized in [[Dedup]] because it carries a per-id
 * payload and verifies Hamming distance in-kernel.
 */
private[ops] object BucketWindow {

  /** All-or-nothing bucket expansion: buffer a bucket's ids (over rows
    * sorted by key within the partition) and emit its pairs ONLY if the
    * bucket holds at most `maxDf` ids — buckets past the cap contribute
    * NOTHING and every id in them is counted on the accumulator. This is
    * the document-frequency stop rule of fingerprint dedup (a fingerprint
    * shared by thousands of documents is boilerplate, not near-dup
    * signal), with O(maxDf) task memory: the buffer never grows past
    * maxDf + 1 even on a web-scale mega-bucket. */
  def pairsIfSmall[K](it: Iterator[(K, Long)], maxDf: Int,
      dropped: org.apache.spark.util.LongAccumulator,
      tag: String): Iterator[(Long, Long)] = {
    var warned = false
    val rows = it.buffered
    new Iterator[(Long, Long)] {
      private var out: Iterator[(Long, Long)] = Iterator.empty
      private def fill(): Unit = {
        while (!out.hasNext && rows.hasNext) {
          val key = rows.head._1
          val buf = new scala.collection.mutable.ArrayBuffer[Long](16)
          var overflow = 0L
          while (rows.hasNext && rows.head._1 == key) {
            val id = rows.next()._2
            if (buf.size <= maxDf) buf += id else overflow += 1
          }
          if (buf.size > maxDf) {
            dropped.add(buf.size + overflow)
            if (!warned) {
              System.err.println(s"[graft.$tag] bucket $key exceeds maxDf=$maxDf — " +
                "dropping the whole bucket (stop-fingerprint rule; see dropped-ids accumulator)")
              warned = true
            }
          } else {
            // ids arrive sorted; strict < skips duplicate-id self-pairs
            out = buf.indices.iterator.flatMap(i =>
              Iterator.range(i + 1, buf.size)
                .collect { case j if buf(i) < buf(j) => (buf(i), buf(j)) })
          }
        }
      }
      def hasNext: Boolean = { fill(); out.hasNext }
      def next(): (Long, Long) = { fill(); out.next() }
    }
  }

  def pairs[K](it: Iterator[(K, Long)], maxBucket: Int,
      dropped: org.apache.spark.util.LongAccumulator,
      tag: String): Iterator[(Long, Long)] = {
    var started = false
    var cur: K = null.asInstanceOf[K]
    var warned = false
    val buf = new scala.collection.mutable.ArrayBuffer[Long](16)
    it.flatMap { case (key, id) =>
      if (!started || key != cur) { started = true; cur = key; buf.clear() }
      if (buf.size >= maxBucket) {
        dropped.add(1)
        if (!warned) {
          System.err.println(s"[graft.$tag] bucket $key exceeds maxBucket=$maxBucket — " +
            "dropping overflow ids (see dropped-ids accumulator)")
          warned = true
        }
        Iterator.empty
      } else {
        val n = buf.size
        buf += id
        // lazy: flatMap exhausts this before touching the next row, and
        // appends never move indices 0..n-1 — no per-row array copy.
        // strict < keeps duplicate ids from self-pairing (parity with the
        // strict y > x of the expression forms this replaced)
        Iterator.range(0, n).flatMap(i =>
          if (buf(i) < id) Some((buf(i), id)) else None)
      }
    }
  }
}
