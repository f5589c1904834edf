package graft.kg

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Error-analysis dump parity (analyze_errors.py:28-58): wrong-only rows,
  * path fields, and the `.analysis` text rendering. */
class EvaluateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val bundleBc = spark.sparkContext.broadcast(Pipeline.buildBundle())

  test("errorAnalysisDump carries only wrong examples with consistent path rows") {
    val examples = spark.range(300).map(i => Gen.labeledExample(42L, i))
    val dump = Evaluate.errorAnalysisDump(spark, examples, bundleBc).collect()
    assert(dump.nonEmpty, "the frozen fixture must miss some examples")
    dump.foreach { e =>
      assert(e.relation !== e.predicted, "dump rows must be WRONG examples")
      assert(e.pathLen === e.pathWords.length)
      assert(e.pathWords.length === e.pathArcs.length)
      assert(e.pathWords.length === e.pathNers.length)
      assert(e.sentence.nonEmpty && e.subject.nonEmpty && e.obj.nonEmpty)
    }
    // the dump is exactly the wrong subset of the single-path scoring pass
    val scored = Evaluate.scoreSinglePath(spark, examples, bundleBc).collect()
    val wrongIds = scored.filter(s => s.pred != s.targ).map(_.id).toSet
    assert(dump.map(_.id).toSet === wrongIds)
  }

  test("formatAnalysis renders the reference's .analysis layout verbatim") {
    val ex = Evaluate.ErrorExample(
      id = 1L,
      sentence = "in may 0000 , branko returned to macedonia .",
      subject = "branko crvenkovski", subjectNer = "PERSON",
      obj = "macedonia", objectNer = "LOCATION",
      relation = "per:countries_of_residence", predicted = "no_relation",
      pathLen = 3,
      pathWords = Seq("macedonia", "returned", "branko"),
      pathArcs = Seq("nmod_from", "root", "nsubj_to"),
      pathNers = Seq("LOCATION", "O", "PERSON"))
    val hist = Seq((3, 10L, 2L), (5, 20L, 1L)) // (length, count, errors)
    val text = Evaluate.formatAnalysis(Seq(ex), hist)
    val expected =
      """in may 0000 , branko returned to macedonia .
        |branko crvenkovski PERSON
        |macedonia LOCATION
        |per:countries_of_residence no_relation
        |PATH = 3
        |macedonia nmod_from LOCATION
        |returned root O
        |branko nsubj_to PERSON
        |
        |length	count	num_error	percent_error
        |5	20	1	0.05
        |3	10	2	0.2
        |""".stripMargin
    assert(text === expected)
  }
}
