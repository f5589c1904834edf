package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, Row}
import org.apache.spark.sql.types._

/**
 * Spark readers for the reference's four source formats (S1-S4), composing
 * `spark.read.csv` (quoting/arity handled by the CSV datasource) with the
 * typed decode kernels in [[Adaptors]].
 *
 * Scale notes: the CSV/TSV scan parallelizes by file split; the decode is a
 * narrow typed map. Malformed rows follow the reference's P14 error-channel
 * policy — counted on an accumulator, never aborting the job
 * (reference: data/dataset.py:98-115).
 */
object Sources {

  private def strSchema(n: Int): StructType =
    StructType((0 until n).map(i => StructField(s"_c$i", StringType, nullable = true)))

  private def rowToSeq(r: Row, n: Int): Seq[String] =
    (0 until n).map(i => Option(r.getString(i)).getOrElse(""))

  private def decode(spark: SparkSession, df: DataFrame, n: Int,
      f: Seq[String] => SentenceExample,
      errors: org.apache.spark.util.LongAccumulator): Dataset[SentenceExample] = {
    import spark.implicits._
    df.flatMap { r =>
      try Some(f(rowToSeq(r, n)))
      catch { case _: Exception => errors.add(1); None } // P14 'short'/'ignore'
    }
  }

  /** S1: supervision.csv — standard CSV quoting, 14 columns. */
  def readSupervisedCsv(spark: SparkSession, path: String): Dataset[SentenceExample] = {
    val errors = spark.sparkContext.longAccumulator("s1_errors")
    val raw = spark.read.schema(strSchema(14))
      .option("multiLine", true).option("escape", "\"").csv(path)
    decode(spark, raw, 14, Adaptors.supervisedToExample, errors)
  }

  /** S2: KBP test corpus — TSV, no quoting, 20 columns. */
  def readKbpTsv(spark: SparkSession, path: String): Dataset[SentenceExample] = {
    val errors = spark.sparkContext.longAccumulator("s2_errors")
    val raw = spark.read.schema(strSchema(20))
      .option("sep", "\t").option("quote", "").csv(path)
    decode(spark, raw, 20, Adaptors.kbpToExample, errors)
  }

  /** S3: labeled evaluation — TSV, 23 columns. */
  def readKbpEvaluationTsv(spark: SparkSession, path: String): Dataset[SentenceExample] = {
    val errors = spark.sparkContext.longAccumulator("s3_errors")
    val raw = spark.read.schema(strSchema(23))
      .option("sep", "\t").option("quote", "").csv(path)
    decode(spark, raw, 23, Adaptors.kbpEvaluationToExample, errors)
  }

  /** S4: self-training — TSV, 24 columns. */
  def readSelfTrainingTsv(spark: SparkSession, path: String): Dataset[SentenceExample] = {
    val errors = spark.sparkContext.longAccumulator("s4_errors")
    val raw = spark.read.schema(strSchema(24))
      .option("sep", "\t").option("quote", "").csv(path)
    decode(spark, raw, 24, Adaptors.selfTrainingToExample, errors)
  }

  /** U1: union of supervised + self-training sources
    * (reference: data/adaptors.py:197-208). */
  def readAllAnnotated(spark: SparkSession, supervisedPath: String,
      selfTrainingPath: String): Dataset[SentenceExample] =
    readSupervisedCsv(spark, supervisedPath)
      .unionByName(readSelfTrainingTsv(spark, selfTrainingPath))
}
