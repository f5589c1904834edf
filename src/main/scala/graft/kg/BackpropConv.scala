package graft.kg

/**
 * Full-model gradient kernel for the `single_conv` topology —
 * Convolution1D(filterLen 3, valid) → tanh → MaxPooling1D(2) → LSTM →
 * dense, mirroring [[Models.ZooScorer]]'s conv path in double precision
 * (models.py's conv config; the zoo's degenerate-length rules included:
 * odd trailing conv frame dropped by the pool, pooled-empty falls back to
 * the first conv frame, and sequences shorter than the filter feed a
 * single zero frame to the LSTM).
 *
 * Backward: dense → LSTM ([[BackpropStack.backwardLayer]], gradient only
 * at the last state) → max-pool routing (each pooled element's gradient
 * flows to the argmax frame; first-wins on ties, matching forward's
 * math.max evaluation) → tanh' → conv filter/bias/input gradients →
 * embeddings. Pinned by the central finite-difference check in
 * BackpropSpec, including the degenerate lengths.
 */
object BackpropConv {

  final case class Layout(vocab: Int, embDim: Int, convOut: Int, h2: Int, relSize: Int) {
    val filterLen = 3
    val emb = 0
    private var cursor = vocab * embDim
    private def alloc(n: Int): Int = { val o = cursor; cursor += n; o }
    /** filter k's weight block (embDim × convOut), k in 0..filterLen-1 */
    val w: Array[Int] = Array.fill(filterLen)(alloc(embDim * convOut))
    val cBias = alloc(convOut)
    val cell = BackpropStack.Cell(cursor, convOut, h2)
    val dense = cell.end
    val denseB = dense + h2 * relSize
    val total: Int = denseB + relSize
  }

  /** Deterministic fixture initialization (same scheme as the siblings). */
  def init(l: Layout, seed: Long = 42L): Array[Double] = {
    val f = new Array[Double](l.total)
    var k = 0
    def fill(off: Int, n: Int, scale: Double): Unit = {
      k += 1
      val r = new Gen.Rng(seed * 0x9E3779B97F4A7C15L + k * 0xC2B2AE3D27D4EB4FL + 377)
      var i = 0
      while (i < n) { f(off + i) = (r.nextDouble() * 2 - 1) * scale; i += 1 }
    }
    fill(l.emb, l.vocab * l.embDim, 0.5)
    l.w.foreach(o => fill(o, l.embDim * l.convOut, 0.3))
    fill(l.cBias, l.convOut, 0.1)
    val c = l.cell
    Seq(c.wI, c.wF, c.wC, c.wO).foreach(o => fill(o, c.inDim * c.hidden, 0.3))
    Seq(c.uI, c.uF, c.uC, c.uO).foreach(o => fill(o, c.hidden * c.hidden, 0.3))
    Seq(c.bI, c.bF, c.bC, c.bO).foreach(o => fill(o, c.hidden, 0.1))
    fill(l.dense, l.h2 * l.relSize, 0.5)
    fill(l.denseB, l.relSize, 0.1)
    f
  }

  private def embed(f: Array[Double], l: Layout, retain: Double,
      seq: Array[Int]): Array[Array[Double]] =
    Array.tabulate(seq.length) { t =>
      val x = new Array[Double](l.embDim)
      var k = 0
      while (k < l.embDim) { x(k) = f(l.emb + seq(t) * l.embDim + k) * retain; k += 1 }
      x
    }

  /** Conv frames POST-tanh (length max(0, T - filterLen + 1)). */
  private def convForward(f: Array[Double], l: Layout,
      xs: Array[Array[Double]]): Array[Array[Double]] = {
    val co = l.convOut; val d = l.embDim
    Array.tabulate(math.max(0, xs.length - l.filterLen + 1)) { t =>
      val y = new Array[Double](co)
      var j = 0
      while (j < co) { y(j) = f(l.cBias + j); j += 1 }
      var k = 0
      while (k < l.filterLen) {
        val x = xs(t + k)
        val off = l.w(k)
        var i = 0
        while (i < d) {
          val xi = x(i)
          if (xi != 0) {
            j = 0
            while (j < co) { y(j) += xi * f(off + i * co + j); j += 1 }
          }
          i += 1
        }
        k += 1
      }
      j = 0
      while (j < co) { y(j) = math.tanh(y(j)); j += 1 }
      y
    }
  }

  /** Pool frames + the zoo's degenerate-length fallbacks; also returns,
    * per pooled frame, which conv frame won each element (for backward),
    * or null when the frame is a fallback/zero frame. */
  private def poolForward(conv: Array[Array[Double]], co: Int):
      (Array[Array[Double]], Array[Array[Int]]) = {
    val nPool = conv.length / 2
    if (nPool > 0) {
      val out = Array.ofDim[Double](nPool, co)
      val arg = Array.ofDim[Int](nPool, co)
      var t = 0
      while (t < nPool) {
        val a = conv(2 * t); val b = conv(2 * t + 1)
        var j = 0
        while (j < co) {
          // math.max(a, b): a wins ties — backward routes to a on ties
          if (a(j) >= b(j)) { out(t)(j) = a(j); arg(t)(j) = 2 * t }
          else { out(t)(j) = b(j); arg(t)(j) = 2 * t + 1 }
          j += 1
        }
        t += 1
      }
      (out, arg)
    } else if (conv.nonEmpty) {
      // pooled empty → first conv frame passes straight through
      (Array(conv(0).clone()), Array(Array.fill(co)(0)))
    } else {
      (Array(new Array[Double](co)), null) // T < filterLen → zero frame
    }
  }

  /** Forward only: masked logits for one sequence (dev metrics). */
  def logits(f: Array[Double], l: Layout, retain: Double, seq: Array[Int]): Array[Double] = {
    val xs = embed(f, l, retain, seq)
    val (pooled, _) = poolForward(convForward(f, l, xs), l.convOut)
    val states = BackpropStack.forwardLayer(f, l.cell, pooled, null, null, null, null, null)
    val hT = states(states.length - 1)
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
      seq: Array[Int], label: Int, mask: Array[Float], grad: Array[Double]): Double = {
    val co = l.convOut
    val xs = embed(f, l, retain, seq)
    val conv = convForward(f, l, xs)
    val (pooled, arg) = poolForward(conv, co)
    val T2 = pooled.length
    val pI = new Array[Array[Double]](T2); val pF = new Array[Array[Double]](T2)
    val pC = new Array[Array[Double]](T2); val pO = new Array[Array[Double]](T2)
    val cs = new Array[Array[Double]](T2)
    val states = BackpropStack.forwardLayer(f, l.cell, pooled, pI, pF, pC, pO, cs)
    val hT = states(T2 - 1)

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
    val dStates = Array.ofDim[Double](T2, l.h2)
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
      dStates(T2 - 1)(j) = acc * retain
      j += 1
    }
    r = 0
    while (r < rS) { grad(l.denseB + r) += dLogit(r); r += 1 }

    // LSTM backward → gradient wrt the pooled frames
    val dPooled = BackpropStack.backwardLayer(f, l.cell, pooled, states,
      pI, pF, pC, pO, cs, dStates, grad)

    // route pooled gradients back to conv frames
    val dConv = Array.ofDim[Double](conv.length, co)
    if (arg != null) {
      var t = 0
      while (t < T2) {
        var k = 0
        while (k < co) { dConv(arg(t)(k))(k) += dPooled(t)(k); k += 1 }
        t += 1
      }
    } // else: zero frame — nothing flows into the conv
    // conv backward: through tanh, filters, bias, inputs → embeddings
    if (conv.nonEmpty) {
      val d = l.embDim
      val dXs = Array.ofDim[Double](xs.length, d)
      var t = 0
      while (t < conv.length) {
        var j2 = 0
        while (j2 < co) {
          val out = conv(t)(j2)
          val g = dConv(t)(j2) * (1 - out * out) // tanh'
          if (g != 0) {
            grad(l.cBias + j2) += g
            var k = 0
            while (k < l.filterLen) {
              val x = xs(t + k)
              val off = l.w(k)
              var i = 0
              while (i < d) {
                grad(off + i * co + j2) += x(i) * g
                dXs(t + k)(i) += f(off + i * co + j2) * g
                i += 1
              }
              k += 1
            }
          }
          j2 += 1
        }
        t += 1
      }
      t = 0
      while (t < xs.length) {
        val w = seq(t)
        var i = 0
        while (i < d) { grad(l.emb + w * d + i) += dXs(t)(i) * retain; i += 1 }
        t += 1
      }
    }
    loss
  }
}
