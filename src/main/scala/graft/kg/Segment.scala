package graft.kg

/**
 * Sentence segmentation + gazetteer mention detection (north-rule stages;
 * the reference receives pre-parsed, pre-linked sentences from the Stanford
 * KBP java pipeline upstream of kbp.py — these stages replace that process
 * boundary inside our engine).
 *
 * Pure functions; the Spark side runs them inside `mapPartitions` with the
 * gazetteer as a broadcast Map (small dimension table — broadcast, never a
 * shuffle join at this stage).
 */
object Segment {

  /** Deterministic sentence segmentation: break on newline, and after
    * [.!?] when followed by whitespace. */
  def sentences(text: String): Seq[String] =
    text.split("\n").toSeq
      .flatMap(_.split("(?<=[.!?])\\s+").toSeq)
      .map(_.trim)
      .filter(_.nonEmpty)

  /** Whitespace tokenization with terminal-punctuation splitting:
    * "dinner." → ["dinner", "."]. Deterministic, no locale. */
  def tokenize(sentence: String): Seq[String] =
    sentence.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { tok =>
      if (tok.length > 1 && ".,!?;:".indexOf(tok.last) >= 0)
        Seq(tok.dropRight(1), tok.takeRight(1))
      else Seq(tok)
    }

  /** Greedy longest-match gazetteer scan over lowercased tokens.
    * @param gazetteer joined-lowercase-surface → NER type
    * @param maxLen longest surface length in tokens */
  def detectMentions(tokens: Seq[String], gazetteer: Map[String, String], maxLen: Int): Seq[Mention] = {
    val lower = tokens.map(Adaptors.asciiLower).toIndexedSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    var i = 0
    while (i < lower.length) {
      var matched = false
      var len = math.min(maxLen, lower.length - i)
      while (len >= 1 && !matched) {
        val surface = lower.slice(i, i + len).mkString(" ")
        gazetteer.get(surface) match {
          case Some(ner) =>
            out += Mention(i, i + len, surface, ner)
            i += len
            matched = true
          case None => len -= 1
        }
      }
      if (!matched) i += 1
    }
    out.toSeq
  }

  /** NER types allowed as KBP slot-filling subjects. */
  val subjectNers: Set[String] = Set("PERSON", "ORGANIZATION")

  /** Candidate (subject, object) ordered pairs: subject NER restricted,
    * spans distinct (overlap rejection P13 happens again in the featurizer),
    * capped to bound worst-case blowup on mention-dense sentences. */
  def candidatePairs(mentions: Seq[Mention], maxPairs: Int = 20): Seq[(Mention, Mention)] = {
    val out = for {
      s <- mentions if subjectNers.contains(s.ner)
      o <- mentions if !(o.begin == s.begin && o.end == s.end)
    } yield (s, o)
    out.take(maxPairs)
  }

  /** Assemble the canonical [[SentenceExample]] for one candidate pair:
    * applies the adaptor row semantics (P3 digit zeroing, P4 lowercase,
    * P6 surface reconstruction, P7 NER span overwrite). The sent-model path
    * needs no dependency parse and no POS — filled with neutral values. */
  def toExample(tokens: Seq[String], subject: Mention, objectM: Mention): SentenceExample = {
    val words = Adaptors.zeroDigits(tokens.map(Adaptors.asciiLower))
    val ner = words.indices.map { i =>
      if (i >= subject.begin && i < subject.end) subject.ner
      else if (i >= objectM.begin && i < objectM.end) objectM.ner
      else "O"
    }
    SentenceExample(
      words = words, lemmas = words, pos = words.map(_ => "NN"), ner = ner,
      dependency = Seq.empty,
      subjectBegin = subject.begin, subjectEnd = subject.end,
      subject = words.slice(subject.begin, subject.end).mkString(" "),
      subjectNer = subject.ner,
      objectBegin = objectM.begin, objectEnd = objectM.end,
      objectVal = words.slice(objectM.begin, objectM.end).mkString(" "),
      objectNer = objectM.ner,
      relation = None,
      subjectId = None, objectId = None)
  }
}
