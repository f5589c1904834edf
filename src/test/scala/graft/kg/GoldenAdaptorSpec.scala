package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/**
 * Full golden-row ports of tests/test_adaptors.py (the reference's raw
 * files are not vendored — downloaded by data/raw/download_raw.sh — so raw
 * rows are synthesized to decode to the reference's EXACT expected outputs,
 * with plausible pre-decode forms for the fields the decode transforms:
 * original casing, un-zeroed digits).
 */
class GoldenAdaptorSpec extends AnyFunSuite {

  private def encQuoted(tokens: Seq[String]): String =
    "[\"" + tokens.mkString("\",\"") + "\"]"
  private def encBrace(tokens: Seq[String]): String =
    "[" + tokens.mkString(",") + "]"
  private def lower(xs: Seq[String]): Seq[String] = xs.map(Adaptors.asciiLower)

  // ---- TestSupervised (test_adaptors.py:50-94) -----------------------------
  private val supWordsExpected = Seq(
    "Alexandra", "of", "Denmark", "-LRB-", "0000", "-", "0000", "-RRB-", "was", "Queen",
    "Consort", "to", "Edward", "VII", "of", "the", "United", "Kingdom", "and", "thus",
    "Empress", "of", "India", "during", "her", "husband", "'s", "reign", ".")
  private val supLemmasExpected = Seq(
    "Alexandra", "of", "Denmark", "-lrb-", "0000", "-", "0000", "-rrb-", "be", "Queen",
    "Consort", "to", "Edward", "VII", "of", "the", "United", "Kingdom", "and", "thus",
    "empress", "of", "India", "during", "she", "husband", "'s", "reign", ".")
  private val supNer = Seq(
    "PERSON", "PERSON", "PERSON", "O", "DATE", "DURATION", "DATE", "O", "O", "LOCATION",
    "LOCATION", "O", "PERSON", "PERSON", "O", "O", "LOCATION", "LOCATION", "O", "O", "O",
    "O", "LOCATION", "O", "O", "O", "O", "O", "O")
  private val supPos = Seq(
    "NNP", "IN", "NNP", "-LRB-", "CD", ":", "CD", "-RRB-", "VBD", "NNP", "NNP", "TO", "NNP",
    "NNP", "IN", "DT", "NNP", "NNP", "CC", "RB", "NN", "IN", "NNP", "IN", "PRP$", "NN",
    "POS", "NN", ".")

  test("supervised golden row (Alexandra of Denmark, per:spouse)") {
    // raw form: un-zeroed years, original casing
    val rawWords = supWordsExpected.updated(4, "1844").updated(6, "1925")
    val rawLemmas = supLemmasExpected.updated(4, "1844").updated(6, "1925")
    val row = Seq(
      "13\t9\tnsubj\n9\t0\troot", encQuoted(rawWords), encQuoted(rawLemmas),
      encQuoted(supPos), encQuoted(supNer),
      "0", "3", "0", "PERSON", "12", "13", "12", "PERSON", "per:spouse")
    val ex = Adaptors.supervisedToExample(row)
    assert(ex.words === lower(supWordsExpected))
    assert(ex.lemmas === lower(supLemmasExpected))
    assert(ex.ner === supNer)
    assert(ex.pos === supPos)
    assert(ex.subject === "alexandra of denmark")
    assert(ex.subjectNer === "PERSON")
    assert((ex.subjectBegin, ex.subjectEnd) === ((0, 3)))
    assert(ex.objectVal === "edward")
    assert(ex.objectNer === "PERSON")
    assert((ex.objectBegin, ex.objectEnd) === ((12, 13)))
    assert(ex.relation === Some("per:spouse"))
  }

  // ---- TestKBPTest (test_adaptors.py:97-139) --------------------------------
  private val kbpWords = Seq(
    "This", "recipe", "from", "Sean", "Baker", "of", "Gather", "in", "Berkeley", "is", "a",
    "vegan", "interpretation", "of", "a", "rustic", "seafood", "salad", "that", "typically",
    "includes", "mussels", ",", "squid", "and", "other", "shellfish", ".")
  private val kbpLemmas = Seq(
    "this", "recipe", "from", "Sean", "Baker", "of", "Gather", "in", "Berkeley", "be", "a",
    "vegan", "interpretation", "of", "a", "rustic", "seafood", "salad", "that", "typically",
    "include", "mussel", ",", "squid", "and", "other", "shellfish", ".")
  private val kbpNer = Seq(
    "O", "O", "O", "PERSON", "PERSON", "O", "O", "O", "CITY", "O", "O", "O", "O", "O", "O",
    "O", "O", "O", "O", "O", "O", "O", "O", "O", "O", "O", "CAUSE_OF_DEATH", "O")
  private val kbpPos = Seq(
    "DT", "NN", "IN", "NNP", "NNP", "IN", "NNP", "IN", "NNP", "VBZ", "DT", "JJ", "NN",
    "IN", "DT", "JJ", "NN", "NN", "WDT", "RB", "VBZ", "NNS", ",", "NN", "CC", "JJ",
    "NN", ".")

  test("KBP test-corpus golden row (Sean Baker / Berkeley, unlabeled)") {
    val row = Seq(
      "This recipe from Sean Baker of Gather in Berkeley ...",      // gloss
      "4\\t5\\tcompound\\n9\\t5\\tnmod:in", "d2", "d3",
      encBrace(kbpWords), encBrace(kbpLemmas), encBrace(kbpPos), encBrace(kbpNer),
      "ENG_SUBJ_ID", "Sean Baker", "0.92", "PERSON",
      "ENG_OBJ_ID", "Berkeley", "0.88", "CITY",
      "3", "5", "8", "9")
    val ex = Adaptors.kbpToExample(row)
    assert(ex.words === lower(kbpWords))
    assert(ex.lemmas === lower(kbpLemmas))
    assert(ex.ner === kbpNer)
    assert(ex.pos === kbpPos)
    assert(ex.subject === "sean baker")
    assert(ex.objectVal === "berkeley")
    assert((ex.subjectBegin, ex.subjectEnd, ex.objectBegin, ex.objectEnd) === ((3, 5, 8, 9)))
    assert(ex.relation === None)
    assert(ex.subjectId === Some("ENG_SUBJ_ID"))
    // dependency unescape + 1->0 indexing: Sean ←compound— Baker ←nmod:in— Berkeley
    assert(ex.dependency === Seq(DepEdge(3, 4, "compound"), DepEdge(8, 4, "nmod:in")))
    // the reference's real-corpus path assertion (test_dependency.py:40-53):
    // berkeley →nmod:in_from→ baker
    val path = new DependencyParse(ex.dependency)
      .getPathFromParse(ex.subjectBegin, ex.subjectEnd, ex.objectBegin, ex.objectEnd)
    assert(path === List(PathEdge(kbpWords.indexOf("Berkeley"), kbpWords.indexOf("Baker"), "nmod:in_from")))
  }

  // ---- TestKBPEvaluationTest (test_adaptors.py:142-185) ----------------------
  private val evalWords = Seq(
    "She", "waited", "for", "him", "to", "phone", "her", "that", "night", "so", "they",
    "could", "continue", "their", "discussion", ",", "but", "Pekar", "never", "called",
    ";", "he", "was", "found", "dead", "early", "the", "next", "morning", "by", "his",
    "wife", ",", "Joyce", "Brabner", ".")
  private val evalNer = Seq(
    "O", "O", "O", "O", "O", "O", "O", "O", "TIME", "O", "O", "O", "O", "O", "O", "O", "O",
    "PERSON", "O", "O", "O", "O", "O", "O", "O", "DATE", "DATE", "DATE", "DATE", "O", "O",
    "O", "O", "PERSON", "PERSON", "O")
  private val evalPos = Seq(
    "PRP", "VBD", "IN", "PRP", "TO", "VB", "PRP$", "DT", "NN", "IN", "PRP", "MD", "VB",
    "PRP$", "NN", ",", "CC", "NNP", "RB", "VBD", ":", "PRP", "VBD", "VBN", "JJ", "RB",
    "DT", "JJ", "NN", "IN", "PRP$", "NN", ",", "NNP", "NNP", ".")

  test("KBP evaluation golden row (Pekar / Joyce Brabner, per:spouse)") {
    val row = Seq(
      "gloss ...", "18\\t20\\tnsubj", "d2", "d3",
      encBrace(evalWords), encBrace(evalWords.map(Adaptors.asciiLower)),
      encBrace(evalPos), encBrace(evalNer),
      "ENG_PEKAR", "Pekar", "0.95", "PERSON",
      "ENG_BRABNER", "Joyce Brabner", "0.91", "PERSON",
      "17", "18", "33", "35",
      "[per:spouse]", "[]", "[]")
    val ex = Adaptors.kbpEvaluationToExample(row)
    assert(ex.words === lower(evalWords))
    assert(ex.ner === evalNer)
    assert(ex.pos === evalPos)
    assert(ex.subject === "pekar")
    assert(ex.objectVal === "joyce brabner")
    assert((ex.subjectBegin, ex.subjectEnd, ex.objectBegin, ex.objectEnd) === ((17, 18, 33, 35)))
    assert(ex.relation === Some("per:spouse"))
  }

  // ---- TestSelfTrainingAdaptor (test_adaptors.py:188-241) --------------------
  private val stWordsExpected = Seq(
    "-LSB-", "00", "-RSB-", "Y.F.", "Sasaki", ",", "K.", "Fujikawa", ",", "K.",
    "Ishida", ",", "N.", "Kawamura", ",", "Y.", "Nishikawa", ",", "S.", "Ohta",
    ",", "M.", "Satoh", ",", "H.", "Madarame", ",", "S.", "Ueno", ",", "N.",
    "Susa", ",", "N.", "Matsusaka", ",", "S.", "Tsuda", ",", "The", "alkaline",
    "single-cell", "gel", "electrophoresis", "assay", "with", "mouse",
    "multiple", "organs", ":", "results", "with", "00", "aromatic", "amines",
    "evaluated", "by", "the", "IARC", "and", "US", "NTP", ",", "Mutat", ".")
  private val stNer = Seq(
    "O", "NUMBER", "O", "PERSON", "PERSON", "O", "PERSON", "PERSON", "O", "PERSON",
    "PERSON", "O", "PERSON", "PERSON", "O", "PERSON", "PERSON", "O", "PERSON", "PERSON",
    "O", "PERSON", "PERSON", "O", "PERSON", "PERSON", "O", "PERSON", "PERSON", "O",
    "PERSON", "PERSON", "O", "PERSON", "PERSON", "O", "PERSON", "PERSON", "O", "O", "O",
    "O", "O", "O", "O", "O", "O", "O", "O", "O", "O", "O", "NUMBER", "O", "O", "O", "O",
    "O", "ORGANIZATION", "O", "COUNTRY", "ORGANIZATION", "O", "PERSON", "O")
  private val stPos = Seq(
    "-LRB-", "CD", "-RRB-", "NNP", "NNP", ",", "NNP", "NNP", ",", "NNP", "NNP", ",", "NNP",
    "NNP", ",", "NNP", "NNP", ",", "NNP", "NNP", ",", "NNP", "NNP", ",", "NNP", "NNP", ",",
    "NNP", "NNP", ",", "NNP", "NNP", ",", "NNP", "NNP", ",", "NNP", "NNP", ",", "DT", "NN",
    "JJ", "NN", "NN", "NN", "IN", "NN", "JJ", "NNS", ":", "NNS", "IN", "CD", "JJ", "NNS",
    "VBN", "IN", "DT", "NN", "CC", "NNP", "NNP", ",", "NNP", ".")

  test("self-training golden row (N. Susa / N. Matsusaka, no_relation)") {
    val rawWords = stWordsExpected.updated(1, "42").updated(52, "16") // un-zeroed digits
    val row = Seq(
      "gloss ...", "32\\t35\\tconj", "d2", "d3",
      encBrace(rawWords), encBrace(rawWords.map(Adaptors.asciiLower)),
      encBrace(stPos), encBrace(stNer),
      "ENG_SUSA", "N. Susa", "0.8", "PERSON",
      "ENG_MATSUSAKA", "N. Matsusaka", "0.8", "PERSON",
      "30", "32", "33", "35",
      "corpus_7", "[]", "[]", "")
    val ex = Adaptors.selfTrainingToExample(row)
    assert(ex.words === lower(stWordsExpected))
    assert(ex.ner === stNer)
    assert(ex.pos === stPos)
    assert(ex.subject === "n. susa")
    assert(ex.objectVal === "n. matsusaka")
    assert((ex.subjectBegin, ex.subjectEnd, ex.objectBegin, ex.objectEnd) === ((30, 32, 33, 35)))
    assert(ex.relation === Some("no_relation")) // '' → no_relation via the S4 map
  }
}
