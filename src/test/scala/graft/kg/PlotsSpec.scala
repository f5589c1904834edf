package graft.kg

import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO

/** PNG plot rendering (plot_utils.py:17-42 analog): container validity via
  * a javax.imageio decode round-trip, colormap/pixel exactness, and the
  * pred.py:80-84 artifact write through Evaluate.run. */
class PlotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def decode(png: Array[Byte]) =
    ImageIO.read(new java.io.ByteArrayInputStream(png))

  test("encodePng emits a decodable truecolor PNG with exact pixels") {
    // 2x2: red, green / blue, white
    val rgb = Array(
      255, 0, 0, 0, 255, 0,
      0, 0, 255, 255, 255, 255).map(_.toByte)
    val img = decode(Plots.encodePng(2, 2, rgb))
    assert(img.getWidth === 2 && img.getHeight === 2)
    assert((img.getRGB(0, 0) & 0xFFFFFF) === 0xFF0000)
    assert((img.getRGB(1, 0) & 0xFFFFFF) === 0x00FF00)
    assert((img.getRGB(0, 1) & 0xFFFFFF) === 0x0000FF)
    assert((img.getRGB(1, 1) & 0xFFFFFF) === 0xFFFFFF)
    // and our own container parser agrees on the header
    assert(Multimodal_parse(Plots.encodePng(2, 2, rgb)) === Some(("png", 2, 2, 1)))
  }

  private def Multimodal_parse(p: Array[Byte]) = graft.ops.Multimodal.parseHeader(p)

  test("confusion heatmap: diagonal of a perfect matrix is dark blue, " +
      "off-diagonal white; NaN rows render white") {
    val m = Array(
      Array(1.0, 0.0),
      Array(Double.NaN, Double.NaN))
    val img = decode(Plots.confusionMatrixPng(m, cell = 4))
    assert(img.getWidth === 8 && img.getHeight === 8)
    assert((img.getRGB(0, 0) & 0xFFFFFF) === 0x08306B) // blues(1) = (8,48,107)
    assert((img.getRGB(7, 0) & 0xFFFFFF) === 0xF7FBFF) // blues(0) = (247,251,255)
    assert((img.getRGB(0, 7) & 0xFFFFFF) === 0xFFFFFF) // NaN row → white
  }

  test("histogram: bar heights proportional to counts, background white") {
    val img = decode(Plots.histogramPng(Seq(4L, 2L, 0L), barWidth = 4, gap = 2, height = 100))
    assert(img.getWidth === 3 * 6 + 2 && img.getHeight === 100)
    def isBar(x: Int, y: Int) = (img.getRGB(x, y) & 0xFFFFFF) == 0x1F77B4
    // tallest bar (count 4) reaches ~the top; half bar (count 2) only half
    assert(isBar(3, 3), "max bar fills the column")
    assert(isBar(9, 99) && !isBar(9, 40), "half bar stops at half height")
    assert(!isBar(15, 99), "zero bar draws nothing")
    assert((img.getRGB(0, 0) & 0xFFFFFF) === 0xFFFFFF, "background is white")
  }

  test("Evaluate.run(plotsDir) writes the two pred.py figures, sized by the " +
      "realized label space") {
    val bundleBc = spark.sparkContext.broadcast(Pipeline.buildBundle())
    val examples = spark.range(200).map(i => Gen.labeledExample(42L, i))
    val dir = java.nio.file.Files.createTempDirectory("graft-plots").toString
    try {
      Evaluate.run(spark, examples, bundleBc, plotsDir = Some(dir))
      val cm = ImageIO.read(new java.io.File(s"$dir/confusion_matrix.png"))
      val hist = ImageIO.read(new java.io.File(s"$dir/relation_histogram.png"))
      val scored = Evaluate.scoreExamples(spark, examples, bundleBc).toDF()
      val nLabels = Plots.sortedLabels(scored).length
      assert(cm.getWidth === nLabels * 16 && cm.getHeight === nLabels * 16)
      assert(hist.getHeight === 200)
      assert(hist.getWidth === nLabels * 16 + 4)
    } finally Lineage.deleteRecursively(dir)
  }
}
