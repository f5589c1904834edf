package graft.kg

import scala.collection.mutable

/**
 * Insertion-ordered string↔int bijection with counts and optional UNK
 * fallback (reference: data/dataset.py:19-71).
 *
 * Build happens on the driver from deterministic ordered input (matching the
 * reference's deploy-time reality, where the vocab is frozen before inference
 * — kbp.py:40-41); executors see the immutable broadcastable [[VocabView]].
 */
final class Vocab(val unk: Option[String]) extends Serializable {
  private val w2i = mutable.LinkedHashMap.empty[String, Int]
  private val i2w = mutable.ArrayBuffer.empty[String]
  val counts = mutable.HashMap.empty[String, Long].withDefaultValue(0L)

  unk.foreach(add(_))

  def size: Int = i2w.length
  def index2word: IndexedSeq[String] = i2w.toIndexedSeq
  def contains(word: String): Boolean = w2i.contains(word)

  /** Lookup with UNK fallback; throws when absent and no UNK
    * (reference: data/dataset.py:38-42 — KeyError semantics). */
  def apply(word: String): Int = unk match {
    case Some(u) => w2i.getOrElse(word, w2i(u))
    case None    => w2i.getOrElse(word, throw new NoSuchElementException(s"vocab miss: $word"))
  }

  def get(word: String, add: Boolean): Int = if (add) this.add(word) else apply(word)

  def add(word: String, count: Long = 1L): Int = {
    val id = w2i.getOrElseUpdate(word, { i2w += word; i2w.length - 1 })
    counts(word) += count
    id
  }

  /** Drop entries with count <= cutoff, keeping UNK; ids re-ranked in
    * original insertion order (reference: data/dataset.py:66-71). */
  def pruneRares(cutoff: Long = 2L): Vocab = {
    val v = new Vocab(unk)
    i2w.foreach { w => if (counts(w) > cutoff || unk.contains(w)) v.add(w, counts(w)) }
    v
  }

  def view: VocabView = VocabView(i2w.toArray, w2i.toMap, unk.map(w2i).getOrElse(-1))
}

/** Immutable, broadcast-friendly snapshot of a [[Vocab]]. */
final case class VocabView(index2word: Array[String], word2index: Map[String, Int], unkId: Int)
    extends Serializable {
  def size: Int = index2word.length
  def contains(w: String): Boolean = word2index.contains(w)
  def apply(w: String): Int =
    if (unkId >= 0) word2index.getOrElse(w, unkId)
    else word2index.getOrElse(w, throw new NoSuchElementException(s"vocab miss: $w"))
}

/** The five per-channel vocabularies the featurizers share
  * (reference: data/featurizers.py:10-17). */
final class VocabSet extends Serializable {
  val rel = new Vocab(None)
  val ner = new Vocab(Some("O"))
  val dep = new Vocab(None)
  val pos = new Vocab(Some("."))
  val word = new Vocab(Some("UNKNOWN"))
}
