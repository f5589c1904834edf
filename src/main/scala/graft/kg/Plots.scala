package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * PNG plot rendering — the Spark rebuild of the reference's plot surface
 * (plot_utils.py:17-42; pred.py:80-84 and train.py:180-183 save
 * `confusion_matrix.png` and `relation_histogram.png` into the experiment
 * directory).
 *
 * No plotting library exists in this stack, and none is needed: the plot
 * INPUTS are tiny driver-side aggregates (R ≤ 41 relation labels — a
 * confusion matrix is R×R cells, a histogram R bars), so rendering is a
 * pure function aggregates → RGB raster → PNG container. The container
 * uses the JDK's real zlib (`java.util.zip.Deflater`) and real chunk CRCs
 * (`CRC32`) — the files decode in any PNG reader (PlotsSpec round-trips
 * them through `javax.imageio`).
 *
 * Scale shape: everything upstream of the raster is a Spark aggregation
 * over (targ, pred) pairs — the collect moves at most R² count rows, the
 * same driver-side footprint as the reference's sklearn/matplotlib step.
 */
object Plots {

  // ---------------------------------------------------------------------------
  // PNG container (truecolor, 8-bit, filter 0 scanlines, one IDAT) — the
  // chunk encoder is shared with the multimodal container synthesizer
  // ---------------------------------------------------------------------------

  private def u32be(v: Int): Array[Byte] = graft.ops.Multimodal.u32be(v)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] =
    graft.ops.Multimodal.pngChunk(tag, data)

  /** Encode a packed RGB raster (3 bytes/pixel, row-major) as a PNG. */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"raster must be $width x $height x 3 bytes, got ${rgb.length}")
    val stride = 1 + width * 3
    val raw = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      raw(y * stride) = 0 // filter type None per scanline
      System.arraycopy(rgb, y * width * 3, raw, y * stride + 1, width * 3)
      y += 1
    }
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr = u32be(width) ++ u32be(height) ++ Array[Byte](8, 2, 0, 0, 0)
    sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", out.toByteArray) ++
      chunk("IEND", Array.empty)
  }

  /** A Blues-like colormap (matplotlib `cm.Blues` endpoints, linear):
    * 0 → near-white (247,251,255), 1 → dark blue (8,48,107). */
  def blues(v: Double): (Int, Int, Int) = {
    val t = math.max(0.0, math.min(1.0, v))
    def mix(a: Int, b: Int) = (a + (b - a) * t).round.toInt
    (mix(247, 8), mix(251, 48), mix(255, 107))
  }

  private val barColor = (31, 119, 180) // matplotlib default C0

  /** Row-normalized confusion heatmap (plot_utils.py:17-31): cell (i, j) =
    * share of true-label-i examples predicted j, Blues colormap, `cell` px
    * per matrix cell. Rows with zero support render white (the reference's
    * 0/0 produces NaN, which imshow leaves unmapped). */
  def confusionMatrixPng(matrix: Array[Array[Double]], cell: Int = 16): Array[Byte] = {
    val n = matrix.length
    require(n > 0 && matrix.forall(_.length == n), "matrix must be square")
    val wh = n * cell
    val rgb = new Array[Byte](wh * wh * 3)
    for (i <- 0 until n; j <- 0 until n) {
      val v = matrix(i)(j)
      val (r, g, b) =
        if (v.isNaN) (255, 255, 255) else blues(v)
      for (dy <- 0 until cell; dx <- 0 until cell) {
        val p = ((i * cell + dy) * wh + (j * cell + dx)) * 3
        rgb(p) = r.toByte; rgb(p + 1) = g.toByte; rgb(p + 2) = b.toByte
      }
    }
    encodePng(wh, wh, rgb)
  }

  /** Bar-chart histogram (plot_utils.py:34-42): one bar per label in the
    * given order, heights scaled to `height` px, white background. */
  def histogramPng(counts: Seq[Long], barWidth: Int = 12, gap: Int = 4,
      height: Int = 200): Array[Byte] = {
    require(counts.nonEmpty)
    val w = counts.length * (barWidth + gap) + gap
    val rgb = Array.fill(w * height * 3)(255.toByte)
    val mx = math.max(1L, counts.max)
    val (br, bg, bb) = barColor
    counts.zipWithIndex.foreach { case (c, i) =>
      val barH = ((c.toDouble / mx) * (height - 2)).round.toInt
      val x0 = gap + i * (barWidth + gap)
      for (y <- (height - barH) until height; x <- x0 until (x0 + barWidth)) {
        val p = (y * w + x) * 3
        rgb(p) = br.toByte; rgb(p + 1) = bg.toByte; rgb(p + 2) = bb.toByte
      }
    }
    encodePng(w, height, rgb)
  }

  // ---------------------------------------------------------------------------
  // aggregate → plot plumbing (get_sorted_labels + the two pred.py figures)
  // ---------------------------------------------------------------------------

  /** Labels of the scored split ordered by true-label frequency
    * (plot_utils.py:10-15 `get_sorted_labels`; ties break by label — a
    * deterministic stand-in for Counter.most_common insertion order, same
    * policy as Evaluate.formatAnalysis). */
  def sortedLabels(scored: DataFrame, targCol: String = "targ"): Seq[(String, Long)] =
    scored.groupBy(col(targCol)).agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (l, c) => (-c, l) }
      .toSeq

  /** The row-normalized confusion matrix over `order` (sklearn
    * confusion_matrix + the astype/sum normalization of plot_utils.py:20-21;
    * zero-support rows are NaN there and render white here). */
  def confusionMatrix(scored: DataFrame, order: Seq[String],
      targCol: String = "targ", predCol: String = "pred"): Array[Array[Double]] = {
    val idx = order.zipWithIndex.toMap
    val counts = scored.groupBy(col(targCol).as("t"), col(predCol).as("p"))
      .agg(count(lit(1)).as("cnt")).collect()
    val n = order.length
    val m = Array.ofDim[Double](n, n)
    counts.foreach { r =>
      for (i <- idx.get(r.getString(0)); j <- idx.get(r.getString(1)))
        m(i)(j) += r.getLong(2).toDouble
    }
    m.map { row =>
      val s = row.sum
      if (s == 0) row.map(_ => Double.NaN) else row.map(_ / s)
    }
  }

  /** pred.py:80-84 — write `confusion_matrix.png` and
    * `relation_histogram.png` for a scored split into `outDir` (the
    * experiment-artifact directory). Returns the two paths. */
  def writeEvalPlots(outDir: String, scored: DataFrame): (String, String) = {
    val labels = sortedLabels(scored)
    val cm = confusionMatrix(scored, labels.map(_._1))
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    val cmPath = dir.resolve("confusion_matrix.png")
    val histPath = dir.resolve("relation_histogram.png")
    java.nio.file.Files.write(cmPath, confusionMatrixPng(cm))
    java.nio.file.Files.write(histPath, histogramPng(labels.map(_._2)))
    (cmPath.toString, histPath.toString)
  }
}
