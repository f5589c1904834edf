package graft.kg

/**
 * Full-model gradient kernel for the 2-LAYER LSTM sentence model — the
 * reference's `single` config (models.py:99-116 stacks two recurrent
 * layers with inter-layer dropout before the dense readout; `get_model`
 * trains it like any other). [[Backprop]] covers the fused single-layer
 * `single_small`; this kernel generalizes the LSTM layer to accept
 * PER-TIMESTEP incoming gradients, because layer 2 consumes EVERY state
 * of layer 1, so layer 1's BPTT receives a gradient at every t, not just
 * the last.
 *
 * Semantics mirror [[Models.ZooScorer]] for `single`/lstm in double
 * precision: embeddings scaled by `retain`, layer-1 states scaled by
 * `retain` between layers (test-time inter-layer dropout), layer-2 final
 * state scaled by `retain` into the dense readout; Keras-0.x LSTM cells
 * (hard_sigmoid gates, tanh candidate/output). Loss is the masked
 * filtered cross-entropy. Pinned by the central finite-difference check
 * in BackpropSpec.
 */
object BackpropStack {

  /** Per-layer tensor offsets: (W,U,b) × i/f/c/o gates. */
  final case class Cell(off: Int, inDim: Int, hidden: Int) {
    private var cursor = off
    private def alloc(n: Int): Int = { val o = cursor; cursor += n; o }
    val wI = alloc(inDim * hidden); val uI = alloc(hidden * hidden); val bI = alloc(hidden)
    val wF = alloc(inDim * hidden); val uF = alloc(hidden * hidden); val bF = alloc(hidden)
    val wC = alloc(inDim * hidden); val uC = alloc(hidden * hidden); val bC = alloc(hidden)
    val wO = alloc(inDim * hidden); val uO = alloc(hidden * hidden); val bO = alloc(hidden)
    val end: Int = cursor
  }

  final case class Layout(vocab: Int, embDim: Int, h1: Int, h2: Int, relSize: Int) {
    val emb = 0
    val l1 = Cell(vocab * embDim, embDim, h1)
    val l2 = Cell(l1.end, h1, h2)
    val dense = l2.end
    val denseB = dense + h2 * relSize
    val total: Int = denseB + relSize
  }

  /** Deterministic fixture initialization (same scheme as the GRU/MUT
    * kernels; per-tensor seeded segments). */
  def init(l: Layout, seed: Long = 42L): Array[Double] = {
    val f = new Array[Double](l.total)
    var k = 0
    def fill(off: Int, n: Int, scale: Double): Unit = {
      k += 1
      val r = new Gen.Rng(seed * 0x9E3779B97F4A7C15L + k * 0xC2B2AE3D27D4EB4FL + 277)
      var i = 0
      while (i < n) { f(off + i) = (r.nextDouble() * 2 - 1) * scale; i += 1 }
    }
    fill(l.emb, l.vocab * l.embDim, 0.5)
    Seq(l.l1, l.l2).foreach { c =>
      Seq(c.wI, c.wF, c.wC, c.wO).foreach(o => fill(o, c.inDim * c.hidden, 0.3))
      Seq(c.uI, c.uF, c.uC, c.uO).foreach(o => fill(o, c.hidden * c.hidden, 0.3))
      Seq(c.bI, c.bF, c.bC, c.bO).foreach(o => fill(o, c.hidden, 0.1))
    }
    fill(l.dense, l.h2 * l.relSize, 0.5)
    fill(l.denseB, l.relSize, 0.1)
    f
  }

  @inline private def hsig(x: Double): Double = {
    val y = 0.2 * x + 0.5
    if (y < 0) 0 else if (y > 1) 1 else y
  }
  @inline private def hsigGrad(pre: Double): Double = {
    val y = 0.2 * pre + 0.5
    if (y <= 0 || y >= 1) 0.0 else 0.2
  }

  /** One LSTM layer forward over `xs`; returns every state h_t (T × h).
    * Caches (when non-null, length T) are filled with gate
    * pre-activations, cell states, and the shifted previous-state table. */
  private[kg] def forwardLayer(f: Array[Double], c: Cell, xs: Array[Array[Double]],
      preI: Array[Array[Double]], preF: Array[Array[Double]],
      preC: Array[Array[Double]], preO: Array[Array[Double]],
      cs: Array[Array[Double]]): Array[Array[Double]] = {
    val h = c.hidden; val d = c.inDim
    val hPrev = new Array[Double](h)
    val cell = new Array[Double](h)
    val out = Array.ofDim[Double](xs.length, h)
    var t = 0
    while (t < xs.length) {
      val x = xs(t)
      val gi = new Array[Double](h); val gf = new Array[Double](h)
      val gc = new Array[Double](h); val go = new Array[Double](h)
      var j = 0
      while (j < h) {
        gi(j) = f(c.bI + j); gf(j) = f(c.bF + j); gc(j) = f(c.bC + j); go(j) = f(c.bO + j)
        j += 1
      }
      var i = 0
      while (i < d) {
        val xi = x(i)
        if (xi != 0) {
          j = 0
          while (j < h) {
            gi(j) += xi * f(c.wI + i * h + j); gf(j) += xi * f(c.wF + i * h + j)
            gc(j) += xi * f(c.wC + i * h + j); go(j) += xi * f(c.wO + i * h + j)
            j += 1
          }
        }
        i += 1
      }
      i = 0
      while (i < h) {
        val hi = hPrev(i)
        if (hi != 0) {
          j = 0
          while (j < h) {
            gi(j) += hi * f(c.uI + i * h + j); gf(j) += hi * f(c.uF + i * h + j)
            gc(j) += hi * f(c.uC + i * h + j); go(j) += hi * f(c.uO + i * h + j)
            j += 1
          }
        }
        i += 1
      }
      if (preI != null) { preI(t) = gi; preF(t) = gf; preC(t) = gc; preO(t) = go }
      j = 0
      while (j < h) {
        cell(j) = hsig(gf(j)) * cell(j) + hsig(gi(j)) * math.tanh(gc(j))
        hPrev(j) = hsig(go(j)) * math.tanh(cell(j))
        out(t)(j) = hPrev(j)
        j += 1
      }
      if (cs != null) cs(t) = cell.clone()
      t += 1
    }
    out
  }

  /** One LSTM layer backward with a PER-TIMESTEP incoming gradient
    * `dStates(t)` on h_t (zero rows where nothing flows in). Accumulates
    * this layer's tensor gradients into `grad` and RETURNS dXs — the
    * gradient wrt the layer's inputs at every t (what the layer below
    * receives). `states` holds this layer's outputs; the caches come from
    * [[forwardLayer]]. */
  private[kg] def backwardLayer(f: Array[Double], c: Cell, xs: Array[Array[Double]],
      states: Array[Array[Double]], preI: Array[Array[Double]],
      preF: Array[Array[Double]], preC: Array[Array[Double]],
      preO: Array[Array[Double]], cs: Array[Array[Double]],
      dStates: Array[Array[Double]], grad: Array[Double],
      tMin: Int = 0): Array[Array[Double]] = {
    val h = c.hidden; val d = c.inDim
    val T = xs.length
    val dXs = Array.ofDim[Double](T, d)
    val dh = new Array[Double](h)
    val dc = new Array[Double](h)
    // BPTT truncation (theano scan semantics, per layer): the backward
    // scan runs only the last T - tMin iterations; gradient injections
    // and dXs before tMin stay zero
    var t = T - 1
    while (t >= tMin) {
      var k = 0
      while (k < h) { dh(k) += dStates(t)(k); k += 1 }
      val cell = cs(t)
      val cPrev = if (t == 0) null else cs(t - 1)
      val hPrev = if (t == 0) new Array[Double](h) else states(t - 1)
      val gi = preI(t); val gf = preF(t); val gc = preC(t); val go = preO(t)
      val dhNext = new Array[Double](h)
      k = 0
      while (k < h) {
        val tc = math.tanh(cell(k))
        val iG = hsig(gi(k)); val fG = hsig(gf(k)); val oG = hsig(go(k))
        val gT = math.tanh(gc(k))
        val dOut = dh(k) * tc * hsigGrad(go(k))
        val dcK = dc(k) + dh(k) * oG * (1 - tc * tc)
        val dIn = dcK * gT * hsigGrad(gi(k))
        val dFor = dcK * (if (t == 0) 0.0 else cPrev(k)) * hsigGrad(gf(k))
        val dCand = dcK * iG * (1 - gT * gT)
        dc(k) = dcK * fG
        grad(c.bI + k) += dIn; grad(c.bF + k) += dFor
        grad(c.bC + k) += dCand; grad(c.bO + k) += dOut
        var i = 0
        while (i < d) {
          val xi = xs(t)(i)
          grad(c.wI + i * h + k) += xi * dIn; grad(c.wF + i * h + k) += xi * dFor
          grad(c.wC + i * h + k) += xi * dCand; grad(c.wO + i * h + k) += xi * dOut
          dXs(t)(i) += f(c.wI + i * h + k) * dIn + f(c.wF + i * h + k) * dFor +
                       f(c.wC + i * h + k) * dCand + f(c.wO + i * h + k) * dOut
          i += 1
        }
        i = 0
        while (i < h) {
          val hi = hPrev(i)
          grad(c.uI + i * h + k) += hi * dIn; grad(c.uF + i * h + k) += hi * dFor
          grad(c.uC + i * h + k) += hi * dCand; grad(c.uO + i * h + k) += hi * dOut
          dhNext(i) += f(c.uI + i * h + k) * dIn + f(c.uF + i * h + k) * dFor +
                       f(c.uC + i * h + k) * dCand + f(c.uO + i * h + k) * dOut
          i += 1
        }
        k += 1
      }
      System.arraycopy(dhNext, 0, dh, 0, h)
      t -= 1
    }
    dXs
  }

  private def embed(f: Array[Double], l: Layout, retain: Double,
      seq: Array[Int]): Array[Array[Double]] =
    Array.tabulate(seq.length) { t =>
      val x = new Array[Double](l.embDim)
      var k = 0
      while (k < l.embDim) { x(k) = f(l.emb + seq(t) * l.embDim + k) * retain; k += 1 }
      x
    }

  /** Forward only: masked logits for one sequence (dev metrics). */
  def logits(f: Array[Double], l: Layout, retain: Double, seq: Array[Int]): Array[Double] = {
    val xs = embed(f, l, retain, seq)
    val s1 = forwardLayer(f, l.l1, xs, null, null, null, null, null)
    val scaled = s1.map(_.map(_ * retain)) // inter-layer dropout scale
    val s2 = forwardLayer(f, l.l2, scaled, null, null, null, null, null)
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
      seq: Array[Int], label: Int, mask: Array[Float], grad: Array[Double],
      truncate: Int = 0): Double = {
    val T = seq.length
    val tMin = if (truncate > 0) math.max(0, T - truncate) else 0
    val xs = embed(f, l, retain, seq)
    val p1I = new Array[Array[Double]](T); val p1F = new Array[Array[Double]](T)
    val p1C = new Array[Array[Double]](T); val p1O = new Array[Array[Double]](T)
    val c1 = new Array[Array[Double]](T)
    val s1 = forwardLayer(f, l.l1, xs, p1I, p1F, p1C, p1O, c1)
    val scaled = s1.map(_.map(_ * retain))
    val p2I = new Array[Array[Double]](T); val p2F = new Array[Array[Double]](T)
    val p2C = new Array[Array[Double]](T); val p2O = new Array[Array[Double]](T)
    val c2 = new Array[Array[Double]](T)
    val s2 = forwardLayer(f, l.l2, scaled, p2I, p2F, p2C, p2O, c2)
    val hT = s2(T - 1)

    // readout + loss
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

    // layer 2 backward → gradient wrt the SCALED layer-1 states
    val dScaled = backwardLayer(f, l.l2, scaled, s2, p2I, p2F, p2C, p2O, c2,
      dStates2, grad, tMin)
    // undo the inter-layer dropout scale: d s1 = d scaled * retain
    val dStates1 = dScaled.map(_.map(_ * retain))
    // layer 1 backward → gradient wrt the scaled embeddings (both scans
    // truncate at the same window, matching per-RNN truncate_gradient)
    val dXs = backwardLayer(f, l.l1, xs, s1, p1I, p1F, p1C, p1O, c1,
      dStates1, grad, tMin)
    var t = tMin
    while (t < T) {
      val w = seq(t)
      var i = 0
      while (i < l.embDim) {
        grad(l.emb + w * l.embDim + i) += dXs(t)(i) * retain
        i += 1
      }
      t += 1
    }
    loss
  }
}
