package graft.kg

/**
 * Full-model gradient kernel for the CONCAT 4-channel model — the last
 * zoo config: per-channel embedding tables (word/ner/pos/arc over the
 * dependency path, [[ConcatenatedDependencyFeaturizer]]), inputs
 * concatenated to a 4×embDim vector, TWO stacked LSTM layers with
 * inter-layer dropout, dense readout — exactly [[Models.ZooScorer]]'s
 * `concat` wiring (models.py's concat config) in double precision.
 *
 * Reuses [[BackpropStack]]'s layer primitives (forward caches +
 * per-timestep backward); the only new math is the channelized embedding
 * front end and routing each timestep's input gradient back into its
 * channel's table slice. Pinned by the central finite-difference check in
 * BackpropSpec.
 */
object BackpropConcat {

  /** Channel vocab sizes follow Models.get for `concat`:
    * word/ner/pos/arc with pos+arc bounded by the word table. */
  final case class Layout(chSizes: Array[Int], embDim: Int, h1: Int, h2: Int, relSize: Int) {
    val nCh: Int = chSizes.length
    private var cursor = 0
    private def alloc(n: Int): Int = { val o = cursor; cursor += n; o }
    val emb: Array[Int] = chSizes.map(v => alloc(v * embDim))
    val l1 = BackpropStack.Cell(cursor, embDim * nCh, h1)
    val l2 = BackpropStack.Cell(l1.end, h1, h2)
    val dense: Int = l2.end
    val denseB: Int = dense + h2 * relSize
    val total: Int = denseB + relSize
  }

  def init(l: Layout, seed: Long = 42L): Array[Double] = {
    val f = new Array[Double](l.total)
    var k = 0
    def fill(off: Int, n: Int, scale: Double): Unit = {
      k += 1
      val r = new Gen.Rng(seed * 0x9E3779B97F4A7C15L + k * 0xC2B2AE3D27D4EB4FL + 477)
      var i = 0
      while (i < n) { f(off + i) = (r.nextDouble() * 2 - 1) * scale; i += 1 }
    }
    l.emb.zip(l.chSizes).foreach { case (o, v) => fill(o, v * l.embDim, 0.5) }
    Seq(l.l1, l.l2).foreach { c =>
      Seq(c.wI, c.wF, c.wC, c.wO).foreach(o => fill(o, c.inDim * c.hidden, 0.3))
      Seq(c.uI, c.uF, c.uC, c.uO).foreach(o => fill(o, c.hidden * c.hidden, 0.3))
      Seq(c.bI, c.bF, c.bC, c.bO).foreach(o => fill(o, c.hidden, 0.1))
    }
    fill(l.dense, l.h2 * l.relSize, 0.5)
    fill(l.denseB, l.relSize, 0.1)
    f
  }

  /** channels(ch)(t) — all channels the same length. */
  private def embed(f: Array[Double], l: Layout, retain: Double,
      channels: Array[Array[Int]]): Array[Array[Double]] = {
    val d = l.embDim
    Array.tabulate(channels(0).length) { t =>
      val x = new Array[Double](d * l.nCh)
      var ch = 0
      while (ch < l.nCh) {
        val off = l.emb(ch) + channels(ch)(t) * d
        var i = 0
        while (i < d) { x(ch * d + i) = f(off + i) * retain; i += 1 }
        ch += 1
      }
      x
    }
  }

  /** Forward only: masked logits for one channelized sequence. */
  def logits(f: Array[Double], l: Layout, retain: Double,
      channels: Array[Array[Int]]): Array[Double] = {
    val xs = embed(f, l, retain, channels)
    val s1 = BackpropStack.forwardLayer(f, l.l1, xs, null, null, null, null, null)
    val scaled = s1.map(_.map(_ * retain))
    val s2 = BackpropStack.forwardLayer(f, l.l2, scaled, null, null, null, null, null)
    val hT = s2(s2.length - 1)
    val out = new Array[Double](l.relSize)
    var r = 0
    while (r < l.relSize) { out(r) = f(l.denseB + r); r += 1 }
    var j = 0
    while (j < l.h2) {
      val hj = hT(j) * retain
      r = 0
      while (r < l.relSize) { out(r) += hj * f(l.dense + j * l.relSize + r); r += 1 }
      j += 1
    }
    out
  }

  /** One example's loss, accumulating dL/dθ into `grad` (+=). */
  def accumulate(f: Array[Double], l: Layout, retain: Double,
      channels: Array[Array[Int]], label: Int, mask: Array[Float],
      grad: Array[Double], truncate: Int = 0): Double = {
    val T = channels(0).length
    val tMin = if (truncate > 0) math.max(0, T - truncate) else 0
    val xs = embed(f, l, retain, channels)
    val p1I = new Array[Array[Double]](T); val p1F = new Array[Array[Double]](T)
    val p1C = new Array[Array[Double]](T); val p1O = new Array[Array[Double]](T)
    val c1 = new Array[Array[Double]](T)
    val s1 = BackpropStack.forwardLayer(f, l.l1, xs, p1I, p1F, p1C, p1O, c1)
    val scaled = s1.map(_.map(_ * retain))
    val p2I = new Array[Array[Double]](T); val p2F = new Array[Array[Double]](T)
    val p2C = new Array[Array[Double]](T); val p2O = new Array[Array[Double]](T)
    val c2 = new Array[Array[Double]](T)
    val s2 = BackpropStack.forwardLayer(f, l.l2, scaled, p2I, p2F, p2C, p2O, c2)
    val hT = s2(T - 1)

    val rS = l.relSize
    val logit = new Array[Double](rS)
    var r = 0
    while (r < rS) { logit(r) = f(l.denseB + r); r += 1 }
    var j = 0
    while (j < l.h2) {
      val hj = hT(j) * retain
      r = 0
      while (r < rS) { logit(r) += hj * f(l.dense + j * rS + r); r += 1 }
      j += 1
    }
    val p = Backprop.filteredSoftmax(logit, mask)
    val loss = -math.log(p(label))

    val dLogit = new Array[Double](rS)
    r = 0
    while (r < rS) { dLogit(r) = (p(r) - (if (r == label) 1.0 else 0.0)) * mask(r); r += 1 }
    val dStates2 = Array.ofDim[Double](T, l.h2)
    j = 0
    while (j < l.h2) {
      val hj = hT(j) * retain
      var acc = 0.0
      r = 0
      while (r < rS) {
        grad(l.dense + j * rS + r) += hj * dLogit(r)
        acc += f(l.dense + j * rS + r) * dLogit(r)
        r += 1
      }
      dStates2(T - 1)(j) = acc * retain
      j += 1
    }
    r = 0
    while (r < rS) { grad(l.denseB + r) += dLogit(r); r += 1 }

    val dScaled = BackpropStack.backwardLayer(f, l.l2, scaled, s2,
      p2I, p2F, p2C, p2O, c2, dStates2, grad, tMin)
    val dStates1 = dScaled.map(_.map(_ * retain))
    val dXs = BackpropStack.backwardLayer(f, l.l1, xs, s1,
      p1I, p1F, p1C, p1O, c1, dStates1, grad, tMin)
    // route each timestep's input gradient back into its channel's table
    val d = l.embDim
    var t = tMin
    while (t < T) {
      var ch = 0
      while (ch < l.nCh) {
        val off = l.emb(ch) + channels(ch)(t) * d
        var i = 0
        while (i < d) { grad(off + i) += dXs(t)(ch * d + i) * retain; i += 1 }
        ch += 1
      }
      t += 1
    }
    loss
  }
}
