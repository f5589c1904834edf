package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`embeddings(vec_id,
 * embedding: array<float>, label)`).
 *
 * Two paths, per the scale playbook:
 *  - [[bruteCosineTopK]]: exact baseline — a broadcast of the query vector,
 *    one narrow pass, one small top-k. O(N·d), embarrassingly parallel.
 *  - [[lshCosineTopK]]: sign-random-projection LSH — each vector is hashed
 *    to a bucket by the sign pattern of `nPlanes` fixed pseudo-random
 *    hyperplanes; search touches only the query's bucket (and Hamming-1
 *    neighbors), so the candidate set shrinks ~2^nPlanes-fold. At 100 TB
 *    the bucket id becomes the partition key and only candidate buckets
 *    are scanned (partition pruning on bucket).
 *
 * Dot products use the `aggregate`/`zip_with` higher-order functions —
 * codegen'd Catalyst expressions, no UDF in the hot path.
 */
object Similarity {

  /** cosine(embedding, queryVec) as a Column expression (HOFs, no UDF). */
  private def cosineCol(queryVec: Array[Float]) = {
    val q = array(queryVec.map(v => lit(v.toDouble)): _*)
    val dot = aggregate(zip_with(col("embedding"), q, (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    val normA = sqrt(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x * x))
    val normQ = math.sqrt(queryVec.map(v => v.toDouble * v).sum)
    dot / (normA * lit(normQ))
  }

  /** All math in double (matches the DuckDB oracle's DOUBLE[] cast). */
  private def asDouble(embeddings: DataFrame): DataFrame =
    embeddings.withColumn("embedding", col("embedding").cast("array<double>"))

  /** Exact brute-force cosine top-k against one query vector. */
  def bruteCosineTopK(embeddings: DataFrame, queryVec: Array[Float], k: Int = 10): DataFrame =
    asDouble(embeddings)
      .select(col("vec_id"), round(cosineCol(queryVec), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)

  /** Deterministic pseudo-random hyperplanes (pure function of seed). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 7L): Array[Array[Float]] = {
    val rng = new graft.kg.Gen.Rng(seed)
    Array.fill(nPlanes)(Array.fill(dim)((rng.nextDouble() * 2 - 1).toFloat))
  }

  /** Sign-LSH bucket id per vector: bit p = sign(v · plane_p). */
  def withLshBucket(embeddings: DataFrame, planes: Array[Array[Float]]): DataFrame = {
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(zip_with(col("embedding"),
        array(p.map(v => lit(v.toDouble)): _*), (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    embeddings.withColumn("bucket", bucket)
  }

  /** ANN top-k: search only the query's LSH bucket and its Hamming-1
    * neighbor buckets (recall knob). */
  def lshCosineTopK(embeddings: DataFrame, queryVec: Array[Float], k: Int = 10,
      nPlanes: Int = 4, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(nPlanes, queryVec.length, seed)
    var qBucket = 0
    planes.zipWithIndex.foreach { case (p, i) =>
      val dot = p.zip(queryVec).map { case (a, b) => a.toDouble * b }.sum
      if (dot > 0) qBucket |= (1 << i)
    }
    val candidates = qBucket +: (0 until nPlanes).map(p => qBucket ^ (1 << p))
    withLshBucket(asDouble(embeddings), planes)
      .filter(col("bucket").isInCollection(candidates))
      .select(col("vec_id"), round(cosineCol(queryVec), 4).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs above a cosine
    * threshold within a bounded id range (the exact, oracle-checkable form;
    * at corpus scale the LSH-bucketed variant restricts candidates to
    * same-bucket pairs first — compose [[withLshBucket]] + this predicate). */
  def cosineNearDupPairs(embeddings: DataFrame, cap: Int = 150, minCosine: Double = 0.3): DataFrame = {
    val e = asDouble(embeddings).filter(col("vec_id") < cap)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val dot = aggregate(zip_with(col("emb_a"), col("emb_b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(col("emb_a"), lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(col("emb_b"), lit(0.0), (acc, x) => acc + x * x))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(dot / (na * nb), 4).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** All-pairs exact top-1 neighbor per vector, bounded demo (vec_id < cap):
    * the oracle-checkable all-pairs form. */
  def nearestNeighborJoin(embeddings: DataFrame, cap: Int = 100): DataFrame = {
    val e = asDouble(embeddings).filter(col("vec_id") < cap)
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val dot = aggregate(zip_with(col("emb_a"), col("emb_b"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(col("emb_a"), lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(col("emb_b"), lit(0.0), (acc, x) => acc + x * x))
    val pairs = a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"), round(dot / (na * nb), 4).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("cosine").desc, col("id_b").asc)
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }
}
