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

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Deterministic sentence segmentation: break on newline, and after
    * [.!?] when followed by whitespace. Hand-rolled scanner (the kernel's
    * hot path is allocation-bound — no regex, no intermediate arrays);
    * semantics identical to split("\n") + split("(?<=[.!?])\\s+") + trim. */
  def sentences(text: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = text.length
    var start = 0
    var i = 0
    def emit(end: Int): Unit = {
      var a = start
      var b = end
      while (a < b && isWs(text.charAt(a))) a += 1
      while (b > a && isWs(text.charAt(b - 1))) b -= 1
      if (b > a) out += text.substring(a, b)
    }
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n') { emit(i); start = i + 1; i += 1 }
      else if ((c == '.' || c == '!' || c == '?') && i + 1 < n && isWs(text.charAt(i + 1))
               && text.charAt(i + 1) != '\n') {
        emit(i + 1)
        i += 2
        while (i < n && isWs(text.charAt(i)) && text.charAt(i) != '\n') i += 1
        start = i
      } else i += 1
    }
    emit(n)
    out.toSeq
  }

  /** Whitespace tokenization with terminal-punctuation splitting:
    * "dinner." → ["dinner", "."]. Scanner-based; no regex. */
  def tokenize(sentence: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = sentence.length
    var i = 0
    while (i < n) {
      while (i < n && isWs(sentence.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(sentence.charAt(i))) i += 1
      if (i > start) {
        val last = sentence.charAt(i - 1)
        if (i - start > 1 && ".,!?;:".indexOf(last) >= 0) {
          out += sentence.substring(start, i - 1)
          out += sentence.substring(i - 1, i)
        } else out += sentence.substring(start, i)
      }
    }
    out.toIndexedSeq
  }

  /** [[tokenize]] fused with Python-2 ASCII lowercasing — one pass, one
    * string per token instead of tokenize-then-map (the kernel only ever
    * consumes lowercased tokens; byte-identical to
    * `tokenize(s).map(Adaptors.asciiLower)`). */
  def tokenizeLower(sentence: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = sentence.length
    val buf = new java.lang.StringBuilder(24)
    var i = 0
    @inline def lower(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    while (i < n) {
      while (i < n && isWs(sentence.charAt(i))) i += 1
      buf.setLength(0)
      while (i < n && !isWs(sentence.charAt(i))) { buf.append(lower(sentence.charAt(i))); i += 1 }
      if (buf.length > 0) {
        val last = buf.charAt(buf.length - 1)
        if (buf.length > 1 && ".,!?;:".indexOf(last) >= 0) {
          out += buf.substring(0, buf.length - 1)
          out += String.valueOf(last)
        } else out += buf.toString
      }
    }
    out.toIndexedSeq
  }

  /** Gazetteer pre-indexed by first token — the per-position scan compares
    * token arrays instead of building joined strings (the naive joined-key
    * lookup was the pipeline's top allocation site). */
  final class GazetteerIndex(gazetteer: Map[String, String]) extends Serializable {
    /** first token → candidate (surface tokens, ner, joined surface),
      * longest first (greedy longest-match order). */
    val byFirst: Map[String, Array[(Array[String], String, String)]] =
      gazetteer.toSeq
        .map { case (surface, ner) => (surface.split(" "), ner, surface) }
        .groupBy(_._1(0))
        .map { case (first, cands) =>
          first -> cands.sortBy { case (toks, _, surface) => (-toks.length, surface) }.toArray
        }
    val maxLen: Int = if (gazetteer.isEmpty) 0 else gazetteer.keys.map(_.count(_ == ' ') + 1).max
  }

  /** Greedy longest-match gazetteer scan over ALREADY-lowercased tokens. */
  def detectMentionsIndexed(lower: IndexedSeq[String], index: GazetteerIndex): Seq[Mention] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Mention]
    val n = lower.length
    var i = 0
    while (i < n) {
      var advanced = false
      index.byFirst.get(lower(i)) match {
        case Some(cands) =>
          var c = 0
          while (c < cands.length && !advanced) {
            val (toks, ner, surface) = cands(c)
            if (i + toks.length <= n) {
              var j = 1 // token 0 matched via the index key
              while (j < toks.length && toks(j) == lower(i + j)) j += 1
              if (j == toks.length) {
                out += Mention(i, i + toks.length, surface, ner)
                i += toks.length
                advanced = true
              }
            }
            c += 1
          }
        case None =>
      }
      if (!advanced) i += 1
    }
    out.toSeq
  }

  /** Surface-keyed convenience scan: lowercases then uses the indexed
    * matcher — same greedy longest-match semantics. Build the
    * [[GazetteerIndex]] once per task in hot paths. */
  def detectMentions(tokens: Seq[String], gazetteer: Map[String, String]): Seq[Mention] =
    detectMentionsIndexed(tokens.map(Adaptors.asciiLower).toIndexedSeq, new GazetteerIndex(gazetteer))

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
