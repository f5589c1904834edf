package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a list of battery queries to files —
  * the plan evidence for OPTIMIZATION_r07.md (plans/r07/<q>_<tag>.txt).
  *
  * Args: <outDir> <tag> <query,names,comma-sep>
  * Session config mirrors graft.Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so the dumped plans are the plans the
  * bench actually runs. Queries with eager construction (checkpointed
  * caches, streaming lifecycles) execute those side effects here exactly as
  * in the battery; the dumped plan is the final returned DataFrame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    var failed = false
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), plan)
            println(s"[plandump] wrote ${name}_$tag.txt")
          } catch {
            case e: Throwable =>
              failed = true
              System.err.println(s"[plandump] $name failed: ${e.getMessage}")
          }
        case None =>
          failed = true
          System.err.println(s"[plandump] unknown query: $name")
      }
    }
    spark.stop()
    if (failed) sys.exit(1) // a plan-evidence run with missing files must not look clean
  }
}
