package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * J2 in full: parsers for the two external report TEXT formats plus the
 * alignment join (reference: plot_utils.py:47-64 `parse_sklearn_report` /
 * `parse_gabor_report`; align_reports.py:17-42 the N/A-filled alignment).
 *
 * Values stay strings end to end, exactly like the reference (percentages
 * are formatted with Python's `"{:.2%}"` — two decimals and a '%').
 */
object Reports {

  final case class ReportRow(relation: String, precision: String,
      recall: String, f1: String, support: String)

  /** Python `"{:.2%}".format(x)`. */
  private def pct(x: Double): String = f"${x * 100}%.2f%%"

  /**
   * sklearn `classification_report` text (plot_utils.py:47-56): the first
   * two lines are headers, the last two are averages, each body line is
   *   `       no_relation       0.86      0.34      0.49      6191`
   * P/R/F1 are re-formatted as percentages, support kept verbatim.
   */
  def parseSklearnReport(text: String): Seq[ReportRow] = {
    val lines = text.linesIterator.toSeq
    lines.slice(2, math.max(2, lines.length - 2)).map { line =>
      line.trim.split("\\s+") match {
        case Array(relation, precision, recall, f1, support) =>
          ReportRow(relation, pct(precision.toDouble), pct(recall.toDouble),
            pct(f1.toDouble), support)
        case other =>
          throw new IllegalArgumentException(
            s"malformed sklearn report line (${other.length} fields): $line")
      }
    }
  }

  /**
   * Gabor-report lines (plot_utils.py:58-64):
   *   `[org:number_of_employees/members]  #: 9  P: 100.00%  R: 0.00%  F1: 0.00%`
   * Nine whitespace-separated tokens; the relation sheds its brackets;
   * percentages are kept verbatim (already formatted).
   */
  def parseGaborReport(text: String): Seq[ReportRow] =
    text.linesIterator.filter(_.trim.nonEmpty).map { line =>
      line.trim.split("\\s+") match {
        case Array(relation, _, support, _, precision, _, recall, _, f1) =>
          ReportRow(relation.stripPrefix("[").stripSuffix("]"),
            precision, recall, f1, support)
        case other =>
          throw new IllegalArgumentException(
            s"malformed gabor report line (${other.length} fields): $line")
      }
    }.toSeq

  /**
   * The alignment join (align_reports.py:36-40): every sklearn-report
   * relation in REPORT ORDER, joined with the gabor columns where present,
   * 'N/A' elsewhere. Left join + coalesce — the J2 shape; report tables are
   * driver-small so the join broadcasts.
   */
  def align(spark: SparkSession, sklearnText: String, gaborText: String): DataFrame = {
    import spark.implicits._
    val nn = parseSklearnReport(sklearnText).zipWithIndex
      .map { case (r, i) => (i, r.relation, r.precision, r.recall, r.f1, r.support) }
      .toDF("idx", "relation", "nn_precision", "nn_recall", "nn_f1", "nn_support")
    val sup = parseGaborReport(gaborText)
      .map(r => (r.relation, r.precision, r.recall, r.f1, r.support))
      .toDF("relation", "sup_precision", "sup_recall", "sup_f1", "sup_support")
    nn.join(broadcast(sup), Seq("relation"), "left")
      .select(col("idx"), col("relation"),
        col("nn_precision"), col("nn_recall"), col("nn_f1"), col("nn_support"),
        coalesce(col("sup_precision"), lit("N/A")).as("sup_precision"),
        coalesce(col("sup_recall"), lit("N/A")).as("sup_recall"),
        coalesce(col("sup_f1"), lit("N/A")).as("sup_f1"),
        coalesce(col("sup_support"), lit("N/A")).as("sup_support"))
      .orderBy(col("idx")).drop("idx")
  }
}
