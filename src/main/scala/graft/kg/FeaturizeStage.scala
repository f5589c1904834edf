package graft.kg

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.broadcast.Broadcast

/**
 * The Spark analog of the reference's `Split` build (reference:
 * data/dataset.py:74-127): filter ignored relations (P11), featurize with
 * the error-channel policy (P14), stamp deterministic ids, expand corrupted
 * negatives (M5), and drop type-invalid pairs (P12).
 *
 * Determinism where the reference is sloppy (SURVEY.md §7.3): corruption
 * RNG is seeded by example id, so the expansion replays identically on
 * retry/resume — a requirement for checkpointed pipelines that the
 * reference's global `np.random` cannot give.
 */
object FeaturizeStage {

  final case class IdFeaturized(id: Long, corrupt: Boolean, feat: Featurized)

  /** M5: clone, drop one seeded-random sequence position, relabel
    * no_relation (reference: data/featurizers.py:74-85). Returns None when
    * the corrupted sequence would be empty (:85). */
  def corruptOne(feat: Featurized, noRelationId: Int, seed: Long): Option[Featurized] = {
    if (feat.sequence.isEmpty) return None
    val rng = new Gen.Rng(seed)
    val drop = rng.nextInt(feat.sequence.length)
    val seq = feat.sequence.take(drop) ++
      (if (drop < feat.sequence.length - 1) feat.sequence.drop(drop + 1) else Nil)
    if (seq.isEmpty) None
    else Some(feat.copy(sequence = seq, relation = Some(noRelationId), length = seq.length))
  }

  /**
   * Featurize a corpus of canonical examples. Ids are stable functions of
   * input order within partition boundaries only if the input is stably
   * partitioned — we derive them from a 64-bit hash of identifying fields
   * instead (deterministic under any partitioning, unlike the reference's
   * sequential counter, data/dataset.py:117-119).
   */
  def run(spark: SparkSession, examples: Dataset[SentenceExample],
      bundleBc: Broadcast[Pipeline.ScoringBundle], numCorrupt: Int = 0,
      errorAcc: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[IdFeaturized] = {
    import spark.implicits._
    val errors = errorAcc.getOrElse(spark.sparkContext.longAccumulator("featurize_errors"))
    examples
      .filter((ex: SentenceExample) => !ex.relation.exists(Adaptors.ignoreRelations)) // P11
      .mapPartitions { it =>
        val b = bundleBc.value
        val featurizer = new SentenceFeaturizer(b.toVocabSet, b.scope)
        val noRel = b.rel("no_relation")
        it.flatMap { ex =>
          val feat0 =
            try Some(featurizer.featurize(ex, add = false))
            catch { case _: NoPathException | _: NoSuchElementException =>
              errors.add(1); None } // P14
          feat0.toSeq.flatMap { feat =>
            val id = stableId(ex)
            // P12: drop pairs whose NER pair admits no positive relation
            if (!pairAdmitsPositive(b, feat)) Nil
            else IdFeaturized(id, corrupt = false, feat) +:
              (1 to numCorrupt).flatMap(k =>
                corruptOne(feat, noRel, id * 31L + k)
                  .map(IdFeaturized(id * 31L + k, corrupt = true, _)))
          }
        }
      }
  }

  /** P12 semantics: at least one positive (non-no_relation) valid relation
    * for the NER pair (reference: train.py:162-165 + dataset.py:132-135 —
    * see TypeChecker.pairValid doc for the truthiness subtlety; the
    * effective training-time filter is "any positive relation possible"). */
  private[kg] def pairAdmitsPositive(b: Pipeline.ScoringBundle, feat: Featurized): Boolean = {
    val tc = b.typechecker
    val base = (feat.subjectNer * tc.nerSize + feat.objectNer) * tc.relSize
    var r = 0
    var any = false
    val noRel = b.rel("no_relation")
    while (r < tc.relSize && !any) {
      if (r != noRel && tc.valid(base + r) != 0f) any = true
      r += 1
    }
    any
  }

  /** 64-bit FNV-1a over identifying fields — deterministic example id. */
  def stableId(ex: SentenceExample): Long = {
    var h = 0xcbf29ce484222325L
    def mix(s: String): Unit = {
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      h ^= 0x1fL; h *= 0x100000001b3L
    }
    ex.words.foreach(mix)
    mix(ex.subjectBegin.toString); mix(ex.subjectEnd.toString)
    mix(ex.objectBegin.toString); mix(ex.objectEnd.toString)
    h & Long.MaxValue
  }
}
