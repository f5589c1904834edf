package graft.kg

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/**
 * S6: Senna-format pretrained word-embedding side input
 * (reference: data/pretrain.py:7-24; consumed by models.py:33-40
 * `pretrained_word_emb`).
 *
 * Format: `words.lst` holds one word per line; `embeddings.txt` holds one
 * whitespace-separated float vector per line; ROW i OF THE EMBEDDINGS FILE
 * BELONGS TO WORD i OF THE WORDLIST (pretrain.py:24 `dict(zip(words, embs))`).
 *
 * The Senna vocab is insertion-ordered with UNKNOWN as id 0
 * (pretrain.py:10 `Vocab(unk='UNKNOWN')`, then words added in file order).
 *
 * Fidelity note: the reference's preload loop (models.py:37-39) walks
 * `word2emb.keys()` — a Python 2 dict whose iteration order is hash-order —
 * and writes `W[i]` by ENUMERATION index, so which embedding row lands on
 * which vocab id is interpreter-dependent there. That behavior is not
 * reproducible (and was surely not intended); we implement the
 * deterministic intent: the embedding row of word w is written to vocab
 * id(w). Duplicate words in the wordlist: the LAST row wins, matching
 * `dict(zip(...))` overwrite semantics.
 *
 * Driver-side IO by design — this is a small side input (the reference
 * loads it in-process too); the resulting weights ship to executors inside
 * the broadcast [[Pipeline.ScoringBundle]].
 */
object Pretrain {

  /** words.lst: one word per line, trailing newline stripped
    * (pretrain.py:16-18 strips "\n" only). */
  def readWordList(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq

  /** embeddings.txt with np.loadtxt semantics: whitespace-separated floats,
    * blank lines skipped (pretrain.py:22). */
  def readEmbeddings(path: String): Array[Array[Float]] =
    Files.readAllLines(Paths.get(path)).asScala
      .map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").map(_.toFloat))
      .toArray

  /** The Senna vocab: UNKNOWN first (id 0), then the wordlist in file
    * order (pretrain.py:10-12). */
  def sennaVocab(words: Seq[String]): Vocab = {
    val v = new Vocab(Some("UNKNOWN"))
    words.foreach(v.add(_))
    v
  }

  /**
   * Preload pretrained vectors into the embedding table: for each wordlist
   * entry present in `wordVocab`, overwrite its embedding row; all other
   * rows (including UNK unless the wordlist contains "UNKNOWN") keep their
   * existing initialization — the reference behavior, where only the first
   * `len(word2emb)` rows are touched and the rest keep Keras init.
   */
  def preload(weights: ScorerWeights, wordVocab: VocabView,
      words: Seq[String], embs: Array[Array[Float]]): ScorerWeights = {
    require(words.length == embs.length,
      s"wordlist (${words.length}) and embeddings (${embs.length}) must align row-for-row")
    embs.foreach(e => require(e.length == weights.embDim,
      s"pretrained dim ${e.length} != model emb dim ${weights.embDim}"))
    val table = weights.embedding.map(_.clone())
    words.zip(embs).foreach { case (w, e) =>
      if (wordVocab.contains(w)) table(wordVocab(w)) = e.clone()
    }
    weights.copy(embedding = table)
  }

  /** One-call form: read both files and preload (the deploy-time path). */
  def loadAndPreload(weights: ScorerWeights, wordVocab: VocabView,
      wordsPath: String, embeddingsPath: String): ScorerWeights =
    preload(weights, wordVocab, readWordList(wordsPath), readEmbeddings(embeddingsPath))
}
