package graft.kg

import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Per-partition lineage + checkpoint/resume substrate (north rule; SURVEY.md
 * §7.5) — the Spark-native replacement for the reference's pickle-cache
 * keyed by config (reference: data/dataset.py:179-188, train.py:123-126).
 *
 * Each heavy stage writes outputs partitioned by a deterministic url-hash
 * bucket; a JSON manifest per stage records which buckets are complete, with
 * row counts in/out and error-channel counts. On restart the driver diffs
 * manifest vs input buckets and schedules only the remainder — work units
 * are idempotent because bucket membership is a pure function of url.
 *
 * Hand-rolled flat JSON (no deps); driver-side filesystem only. On a real
 * cluster this path is the job's output directory on HDFS/S3 — the logic is
 * identical, only the Path API changes.
 */
object Lineage {

  final case class BucketRecord(bucket: Int, rowsOut: Long, errors: Long)

  private def manifestPath(outDir: String, stage: String): Path =
    Paths.get(outDir, "_manifest", s"$stage.json")

  def doneBuckets(outDir: String, stage: String): Set[Int] =
    read(outDir, stage).map(_.bucket).toSet

  def read(outDir: String, stage: String): Seq[BucketRecord] = {
    val p = manifestPath(outDir, stage)
    if (!Files.exists(p)) return Seq.empty
    val txt = new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
    // rows like {"bucket":3,"rowsOut":120,"errors":0}
    "\\{\"bucket\":(\\d+),\"rowsOut\":(\\d+),\"errors\":(\\d+)\\}".r
      .findAllMatchIn(txt)
      .map(m => BucketRecord(m.group(1).toInt, m.group(2).toLong, m.group(3).toLong))
      .toSeq
  }

  /** Append (merge) records and atomically replace the manifest. */
  def append(outDir: String, stage: String, records: Seq[BucketRecord]): Unit = {
    val merged = (read(outDir, stage) ++ records)
      .groupBy(_.bucket).map(_._2.last).toSeq.sortBy(_.bucket)
    val p = manifestPath(outDir, stage)
    Files.createDirectories(p.getParent)
    val body = merged
      .map(r => s"""{"bucket":${r.bucket},"rowsOut":${r.rowsOut},"errors":${r.errors}}""")
      .mkString("[\n", ",\n", "\n]")
    val tmp = p.resolveSibling(s"$stage.json.tmp")
    Files.write(tmp, body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def clear(outDir: String, stage: String): Unit = {
    val p = manifestPath(outDir, stage)
    if (Files.exists(p)) Files.delete(p)
  }

  /**
   * Iceberg-style snapshot layer (SURVEY.md §4.3.4: no Iceberg jar in this
   * environment, so the copy-on-write table contract is implemented
   * directly). Each commit writes its data files into an immutable
   * `<table>/snap-<id>/` directory and records a numbered snapshot JSON
   * listing those files with sizes + row count. The latest snapshot is the
   * table's current state; older snapshots stay readable — TIME TRAVEL via
   * [[readSnapshot]]. If an iceberg-spark-runtime jar ever appears, this
   * layer is replaced by a catalog config swap.
   */
  def nextSnapshotId(outDir: String, table: String): Int =
    snapshots(outDir, table).map(_ + 1).getOrElse(0)

  /** Directory a commit must write its data files into BEFORE committing. */
  def snapshotDataDir(outDir: String, table: String, id: Int): String =
    Paths.get(outDir, table, s"snap-$id").toString

  /** Commit snapshot `id`: record the files under its data dir. */
  def writeSnapshot(outDir: String, table: String, rowCount: Long, id: Int): Int = {
    val dataDir = Paths.get(snapshotDataDir(outDir, table, id))
    val files =
      if (Files.isDirectory(dataDir))
        Files.list(dataDir).iterator().asScala
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .map(p => (s"snap-$id/${p.getFileName.toString}", Files.size(p)))
          .toSeq.sortBy(_._1)
      else Seq.empty
    val manifestDir = Paths.get(outDir, "_manifest")
    Files.createDirectories(manifestDir)
    val body =
      s"""{"table":"${table}","snapshot":$id,"rows":$rowCount,"files":[""" +
        files.map { case (n, s) => s"""{"name":"$n","bytes":$s}""" }.mkString(",") + "]}"
    Files.write(manifestDir.resolve(s"$table.snapshot-$id.json"),
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    id
  }

  /** Data files recorded by snapshot `id` (absolute paths). */
  def snapshotFiles(outDir: String, table: String, id: Int): Seq[String] = {
    val p = Paths.get(outDir, "_manifest", s"$table.snapshot-$id.json")
    require(Files.exists(p), s"no snapshot $id for table $table under $outDir")
    val txt = new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)
    "\"name\":\"([^\"]+)\"".r.findAllMatchIn(txt)
      .map(m => Paths.get(outDir, table, m.group(1)).toString).toSeq
  }

  /** Time travel: read the table exactly as of snapshot `id`. */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession, outDir: String,
      table: String, id: Int): org.apache.spark.sql.DataFrame = {
    val files = snapshotFiles(outDir, table, id)
    if (files.isEmpty) spark.emptyDataFrame else spark.read.parquet(files: _*)
  }

  /** Current state: the latest committed snapshot. */
  def readTable(spark: org.apache.spark.sql.SparkSession, outDir: String,
      table: String): org.apache.spark.sql.DataFrame = {
    val id = snapshots(outDir, table)
      .getOrElse(throw new IllegalStateException(s"table $table has no snapshots"))
    readSnapshot(spark, outDir, table, id)
  }

  /** Latest snapshot id of a table, if any. */
  def snapshots(outDir: String, table: String): Option[Int] = {
    val manifestDir = Paths.get(outDir, "_manifest")
    if (!Files.isDirectory(manifestDir)) return None
    val pat = s"""${java.util.regex.Pattern.quote(table)}\\.snapshot-(\\d+)\\.json""".r
    val ids = Files.list(manifestDir).iterator().asScala.flatMap { p =>
      pat.findFirstMatchIn(p.getFileName.toString).map(_.group(1).toInt)
    }.toSeq
    if (ids.isEmpty) None else Some(ids.max)
  }

  def deleteRecursively(dir: String): Unit = {
    val root = Paths.get(dir)
    if (Files.exists(root))
      Files.walk(root).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }
}
