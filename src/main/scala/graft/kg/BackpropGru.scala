package graft.kg

/**
 * Full-model gradient kernel for the GRU sentence model — extends FULL
 * training beyond the LSTM ([[Backprop]]): the reference trains whatever
 * `get_model` returns (models.py:19-28), and `get_rnn` maps config "gru"
 * to the keras 0.x GRU (models.py:29-30), so the training surface must
 * cover the GRU cell too.
 *
 * Cell math matches [[Models.GruCell]] (Keras-0.x semantics) in double
 * precision:
 *   z_t = hard_sigmoid(Wz·x_t + Uz·h_{t-1} + bz)
 *   r_t = hard_sigmoid(Wr·x_t + Ur·h_{t-1} + br)
 *   c_t = tanh(Wh·x_t + Uh·(r_t ⊙ h_{t-1}) + bh)
 *   h_t = z_t ⊙ h_{t-1} + (1 − z_t) ⊙ c_t
 * with test-time dropout as a constant `retain` scale on the embedding
 * output and the final hidden state, and the same masked filtered
 * cross-entropy loss — all exactly parallel to the LSTM kernel. Gradient
 * correctness is pinned by the same central finite-difference check
 * (BackpropSpec).
 *
 * All tensors live in ONE flat Array[Double] so the trainer's
 * per-partition gradient aggregation is a single array add; the whole
 * model is ~10^4 parameters (~80 KB) regardless of corpus size.
 */
object BackpropGru {

  /** Offsets into the flat parameter/gradient vector: embedding, the 3 GRU
    * gates' (W, U, b) in z/r/h order, then dense + bias. */
  final case class Layout(vocab: Int, embDim: Int, hidden: Int, relSize: Int) {
    val emb = 0
    private var cursor = vocab * embDim
    private def alloc(n: Int): Int = { val o = cursor; cursor += n; o }
    val wZ = alloc(embDim * hidden); val uZ = alloc(hidden * hidden); val bZ = alloc(hidden)
    val wR = alloc(embDim * hidden); val uR = alloc(hidden * hidden); val bR = alloc(hidden)
    val wH = alloc(embDim * hidden); val uH = alloc(hidden * hidden); val bH = alloc(hidden)
    val dense = alloc(hidden * relSize); val denseB = alloc(relSize)
    val total: Int = cursor
  }

  /** Deterministic fixture initialization — pure function of (seed, tensor
    * index), the same scheme as the frozen LSTM fixture: the reference
    * ships no trained weights, so the seeded tensors define the starting
    * point (SURVEY.md §7.3). Scales mirror [[Models]] (0.5 embeddings/
    * dense, 0.3 recurrent, 0.1 biases). */
  def init(l: Layout, seed: Long = 42L): Array[Double] = {
    val f = new Array[Double](l.total)
    def fill(off: Int, n: Int, k: Int, scale: Double): Unit = {
      val r = new Gen.Rng(seed * 0x9E3779B97F4A7C15L + k * 0xC2B2AE3D27D4EB4FL + 77)
      var i = 0
      while (i < n) { f(off + i) = (r.nextDouble() * 2 - 1) * scale; i += 1 }
    }
    fill(l.emb, l.vocab * l.embDim, 1, 0.5)
    fill(l.wZ, l.embDim * l.hidden, 2, 0.3)
    fill(l.uZ, l.hidden * l.hidden, 3, 0.3)
    fill(l.bZ, l.hidden, 4, 0.1)
    fill(l.wR, l.embDim * l.hidden, 5, 0.3)
    fill(l.uR, l.hidden * l.hidden, 6, 0.3)
    fill(l.bR, l.hidden, 7, 0.1)
    fill(l.wH, l.embDim * l.hidden, 8, 0.3)
    fill(l.uH, l.hidden * l.hidden, 9, 0.3)
    fill(l.bH, l.hidden, 10, 0.1)
    fill(l.dense, l.hidden * l.relSize, 11, 0.5)
    fill(l.denseB, l.relSize, 12, 0.1)
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

  /** Shared forward; when the cache arrays are non-null they are filled
    * per timestep (preZ/preR/preH hold gate PRE-activations; rhs holds
    * r_t ⊙ h_{t-1}; hs holds h_t shifted by one, hs(0) = h_{-1} = 0). */
  private def forward(f: Array[Double], l: Layout, retain: Double, seq: Array[Int],
      preZ: Array[Array[Double]], preR: Array[Array[Double]],
      preH: Array[Array[Double]], rhs: Array[Array[Double]]):
      (Array[Array[Double]], Array[Array[Double]], Array[Double]) = {
    val h = l.hidden; val d = l.embDim
    val hPrev = new Array[Double](h)
    val hs = if (preZ != null) Array.ofDim[Double](seq.length + 1, h) else null
    val xs = if (preZ != null) Array.ofDim[Double](seq.length, d) else null
    val x = new Array[Double](d)
    val rh = new Array[Double](h)
    var t = 0
    while (t < seq.length) {
      val w = seq(t)
      var k = 0
      while (k < d) { x(k) = f(l.emb + w * d + k) * retain; k += 1 }
      if (xs != null) System.arraycopy(x, 0, xs(t), 0, d)
      val gz = new Array[Double](h); val gr = new Array[Double](h)
      val gh = new Array[Double](h)
      var j = 0
      while (j < h) { gz(j) = f(l.bZ + j); gr(j) = f(l.bR + j); gh(j) = f(l.bH + j); j += 1 }
      var i = 0
      while (i < d) {
        val xi = x(i)
        if (xi != 0) {
          j = 0
          while (j < h) {
            gz(j) += xi * f(l.wZ + i * h + j); gr(j) += xi * f(l.wR + i * h + j)
            gh(j) += xi * f(l.wH + i * h + j)
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
            gz(j) += hi * f(l.uZ + i * h + j); gr(j) += hi * f(l.uR + i * h + j)
            j += 1
          }
        }
        i += 1
      }
      j = 0
      while (j < h) { rh(j) = hsig(gr(j)) * hPrev(j); j += 1 }
      i = 0
      while (i < h) {
        val ri = rh(i)
        if (ri != 0) {
          j = 0
          while (j < h) { gh(j) += ri * f(l.uH + i * h + j); j += 1 }
        }
        i += 1
      }
      if (preZ != null) {
        preZ(t) = gz; preR(t) = gr; preH(t) = gh; rhs(t) = rh.clone()
      }
      j = 0
      while (j < h) {
        val z = hsig(gz(j))
        hPrev(j) = z * hPrev(j) + (1 - z) * math.tanh(gh(j))
        j += 1
      }
      if (hs != null) System.arraycopy(hPrev, 0, hs(t + 1), 0, h)
      t += 1
    }
    (xs, hs, hPrev.clone())
  }

  /** Forward pass only: masked logits for one sequence (double precision).
    * Used for dev metrics during GRU full training. */
  def logits(f: Array[Double], l: Layout, retain: Double, seq: Array[Int]): Array[Double] = {
    val (_, _, hT) = forward(f, l, retain, seq, null, null, null, null)
    val out = new Array[Double](l.relSize)
    var r = 0
    while (r < l.relSize) { out(r) = f(l.denseB + r); r += 1 }
    var j = 0
    while (j < l.hidden) {
      val hj = hT(j) * retain
      r = 0
      while (r < l.relSize) { out(r) += hj * f(l.dense + j * l.relSize + r); r += 1 }
      j += 1
    }
    out
  }

  /**
   * One example's loss, accumulating dL/dθ into `grad` (+=). BPTT through
   * the GRU with the standard masked-softmax-CE output gradient:
   *   d pre_z = dh ⊙ (h_{t-1} − c_t) ⊙ σ'(pre_z)
   *   d pre_c = dh ⊙ (1 − z_t) ⊙ (1 − c_t²)
   *   d(r⊙h)  = Uh^T · d pre_c
   *   d pre_r = d(r⊙h) ⊙ h_{t-1} ⊙ σ'(pre_r)
   *   dh_{t-1} = dh ⊙ z_t + d(r⊙h) ⊙ r_t + Uz^T·d pre_z + Ur^T·d pre_r
   */
  def accumulate(f: Array[Double], l: Layout, retain: Double,
      seq: Array[Int], label: Int, mask: Array[Float], grad: Array[Double],
      truncate: Int = 0): Double = {
    val h = l.hidden; val d = l.embDim; val rS = l.relSize
    val T = seq.length
    // BPTT truncation (config.py:32, theano scan semantics — see the LSTM
    // kernel): backward stops `truncate` steps from the end; 0 = full
    val tMin = if (truncate > 0) math.max(0, T - truncate) else 0
    val preZ = new Array[Array[Double]](T); val preR = new Array[Array[Double]](T)
    val preH = new Array[Array[Double]](T); val rhs = new Array[Array[Double]](T)
    val (xs, hs, hT) = forward(f, l, retain, seq, preZ, preR, preH, rhs)

    // readout + loss (identical to the LSTM kernel)
    val logit = new Array[Double](rS)
    var r = 0
    while (r < rS) { logit(r) = f(l.denseB + r); r += 1 }
    var j = 0
    while (j < h) {
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
    val dh = new Array[Double](h)
    j = 0
    while (j < h) {
      val hj = hT(j) * retain
      var acc = 0.0
      r = 0
      while (r < rS) {
        grad(l.dense + j * rS + r) += hj * dLogit(r)
        acc += f(l.dense + j * rS + r) * dLogit(r)
        r += 1
      }
      dh(j) = acc * retain
      j += 1
    }
    r = 0
    while (r < rS) { grad(l.denseB + r) += dLogit(r); r += 1 }

    // BPTT
    val dx = new Array[Double](d)
    val dzPre = new Array[Double](h)
    val dcPre = new Array[Double](h)
    val drh = new Array[Double](h)
    val drPre = new Array[Double](h)
    var t = T - 1
    while (t >= tMin) {
      val hPrev = hs(t) // hs is shifted: hs(t) == h_{t-1}
      val gz = preZ(t); val gr = preR(t); val gh = preH(t); val rh = rhs(t)
      java.util.Arrays.fill(dx, 0.0)
      java.util.Arrays.fill(drh, 0.0)
      val dhNext = new Array[Double](h)
      var k = 0
      while (k < h) {
        val c = math.tanh(gh(k))
        val z = hsig(gz(k))
        dzPre(k) = dh(k) * (hPrev(k) - c) * hsigGrad(gz(k))
        dcPre(k) = dh(k) * (1 - z) * (1 - c * c)
        dhNext(k) += dh(k) * z // direct carry through the update gate
        k += 1
      }
      // d(r⊙h) = Uh^T · d pre_c, and Uh's own gradient from rh ⊗ d pre_c
      var i = 0
      while (i < h) {
        var acc = 0.0
        val ri = rh(i)
        k = 0
        while (k < h) {
          val g = dcPre(k)
          acc += f(l.uH + i * h + k) * g
          grad(l.uH + i * h + k) += ri * g
          k += 1
        }
        drh(i) = acc
        i += 1
      }
      k = 0
      while (k < h) {
        val rGate = hsig(gr(k))
        drPre(k) = drh(k) * hPrev(k) * hsigGrad(gr(k))
        dhNext(k) += drh(k) * rGate // reset gate passes h_{t-1} through
        k += 1
      }
      // W/U/b gradients + dx + dhPrev through Uz/Ur
      k = 0
      while (k < h) {
        grad(l.bZ + k) += dzPre(k); grad(l.bR + k) += drPre(k); grad(l.bH + k) += dcPre(k)
        i = 0
        while (i < d) {
          val xi = xs(t)(i)
          grad(l.wZ + i * h + k) += xi * dzPre(k)
          grad(l.wR + i * h + k) += xi * drPre(k)
          grad(l.wH + i * h + k) += xi * dcPre(k)
          dx(i) += f(l.wZ + i * h + k) * dzPre(k) + f(l.wR + i * h + k) * drPre(k) +
                   f(l.wH + i * h + k) * dcPre(k)
          i += 1
        }
        i = 0
        while (i < h) {
          val hi = hPrev(i)
          grad(l.uZ + i * h + k) += hi * dzPre(k)
          grad(l.uR + i * h + k) += hi * drPre(k)
          dhNext(i) += f(l.uZ + i * h + k) * dzPre(k) + f(l.uR + i * h + k) * drPre(k)
          i += 1
        }
        k += 1
      }
      // embedding gradient: x = emb[w] * retain
      val w = seq(t)
      i = 0
      while (i < d) { grad(l.emb + w * d + i) += dx(i) * retain; i += 1 }
      System.arraycopy(dhNext, 0, dh, 0, h)
      t -= 1
    }
    loss
  }
}
