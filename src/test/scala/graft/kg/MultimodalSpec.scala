package graft.kg

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Container synthesis ↔ header-parse round trip, the unknown-container
  * fallback accounting, and structural validity of the synth formats. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("synthesize → parseHeader round-trips format, dims and frame count") {
    // content lengths hitting each format arm (n % 3) and frame counts
    (1 to 200).foreach { n =>
      val content = Array.tabulate(n)(i => (i % 251).toByte)
      val (fmt, w, h, frames) = Multimodal.synthDims(n)
      val parsed = Multimodal.parseHeader(Multimodal.synthesize(content))
      assert(parsed === Some((fmt, w, h, frames)), s"content length $n")
    }
  }

  test("PNG parse reads IHDR big-endian at fixed offsets (16-bit+ dims)") {
    // dims beyond one byte exercise true 32-bit big-endian reads
    val content = Array.fill(3)(0x41.toByte) // n=3 → png arm
    val png = Multimodal.synthesize(content)
    assert(Multimodal.parseHeader(png).get._1 === "png")
    // corrupt the IHDR tag → unknown
    val bad = png.clone(); bad(12) = 'X'.toByte
    assert(Multimodal.parseHeader(bad) === None)
  }

  test("GIF block walk counts image descriptors and survives extensions") {
    val content = Array.fill(43)(0x42.toByte) // 43 % 3 = 1 → gif, frames = 1 + 43 % 40 = 4
    val gif = Multimodal.synthesize(content)
    assert(Multimodal.parseHeader(gif) === Some(("gif", 16 + 43 % 240, 16 + (43 * 7) % 180, 4)))
    // splice a graphic-control extension (0x21 F9, 4-byte sub-block, 0x00)
    // before the first image descriptor: frame count must be unchanged
    val hdr = gif.take(13)
    val rest = gif.drop(13)
    val ext = Array(0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)
    assert(Multimodal.parseHeader(hdr ++ ext ++ rest) ===
      Some(("gif", 16 + 43 % 240, 16 + (43 * 7) % 180, 4)))
    // truncate mid-stream (no trailer) → malformed → None
    assert(Multimodal.parseHeader(gif.dropRight(1)) === None)
  }

  test("JPEG marker scan skips non-SOF segments to find SOF dims") {
    val content = Array.fill(5)(0x43.toByte) // 5 % 3 = 2 → jpeg
    val jpg = Multimodal.synthesize(content)
    val (fmt, w, h, _) = Multimodal.synthDims(5)
    assert(Multimodal.parseHeader(jpg) === Some(("jpeg", w, h, 1)))
    // splice an APP0 segment after SOI: scan must skip it and still hit SOF
    val app0 = Array(0xFF, 0xE0, 0x00, 0x06, 0x4A, 0x46, 0x49, 0x46).map(_.toByte)
    val withApp0 = jpg.take(2) ++ app0 ++ jpg.drop(2)
    assert(Multimodal.parseHeader(withApp0) === Some(("jpeg", w, h, 1)))
  }

  test("unknown containers take the counted fake-decode fallback") {
    val docs = Seq((1L, "plain text, not a container", "en"),
      (2L, "also not a container", "en")).toDF("doc_id", "text", "lang")
    val acc = spark.sparkContext.longAccumulator("test.media.unparsed")
    val meta = Multimodal.extractMeta(spark, Multimodal.mediaTable(docs), Some(acc))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(meta === Map(1L -> "unknown", 2L -> "unknown"))
    assert(acc.value === 2L, "every fallback decode must be counted")
    // and the synth table over the same docs parses cleanly: zero fallbacks
    val acc2 = spark.sparkContext.longAccumulator("test.media.unparsed2")
    val real = Multimodal.extractMeta(spark, Multimodal.mediaTableSynth(docs), Some(acc2))
      .collect()
    assert(real.forall(_.getString(3) != "unknown"))
    assert(acc2.value === 0L)
  }
}
