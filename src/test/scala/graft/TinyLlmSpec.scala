package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TinyLlm

/**
 * TinyLlm model battery. The pinned values below were computed from an
 * INDEPENDENT implementation of the same closed-form model (and
 * cross-checked against the DuckDB recursive-CTE oracle over the sf0.001
 * corpus, 500/500 exact) — they pin the matmul/attention arithmetic, the
 * greedy first-argmax rule, and the zero-denominator degenerate branch.
 */
class TinyLlmSpec extends AnyFunSuite {

  test("greedy decode pins: full forward pass + 8-step decode match the " +
       "independent replay (tokens AND final logit)") {
    val u1 = "Input data (or flow file content):\n" +
      "hello world abcdefghijk\n\nDescribe."
    val (g1, l1) = TinyLlm.generate(u1)
    assert(g1 === IndexedSeq(2, 8, 5, 6, 2, 2, 2, 6))
    assert(l1 === 1528124556L)
    assert(TinyLlm.render(g1) === "cifgcccg")

    val u2 = "Input data (or flow file content):\n42\n\nQuestion: What is " +
      "the answer to life, the universe and everything?"
    val (g2, l2) = TinyLlm.generate(u2)
    assert(g2 === IndexedSeq(4, 1, 4, 5, 2, 2, 1, 8))
    assert(l2 === 117456966L)
  }

  test("single-step pin + zero-denominator degenerate branch: a context " +
       "whose ReLU² scores are all zero attends to the last position only") {
    assert(TinyLlm.nextToken(IndexedSeq(1, 2, 3)) === ((4, 133066107L)))
    // context [0] has every attention score <= 0 → D = 0 → ctx = v_last
    assert(TinyLlm.nextToken(IndexedSeq(0)) === ((6, 70L)))
  }

  test("tokenizer is codepoint-based (matches DuckDB unicode(substr)) — " +
       "a non-BMP char is ONE token, not two UTF-16 surrogates") {
    assert(TinyLlm.tokenize("ab").toSeq === Seq('a' % 16, 'b' % 16))
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, 2 UTF-16 units
    assert(clef.length === 2)
    assert(TinyLlm.tokenize(clef).toSeq === Seq(0x1D11E % 16))
    assert(TinyLlm.tokenize("a" + clef + "b").length === 3)
  }

  test("decode is deterministic and bounded: tokens in [0,16), length = " +
       "Steps, identical across calls") {
    val u = "Input data (or flow file content):\nxyz\n\nDescribe."
    val (a, la) = TinyLlm.generate(u)
    val (b, lb) = TinyLlm.generate(u)
    assert(a === b); assert(la === lb)
    assert(a.length === TinyLlm.Steps)
    assert(a.forall(t => t >= 0 && t < TinyLlm.Vocab))
    assert(TinyLlm.render(a).matches("[a-p]{8}"))
  }

  test("greedy decode is prefix-stable: a deeper decode extends the " +
       "8-step trace, never rewrites it (the bench's deep rows measure " +
       "the same model the oracle replays)") {
    val u = "Input data (or flow file content):\nprefix test\n\nDescribe."
    val (g8, _) = TinyLlm.generate(u)
    val (g64, _) = TinyLlm.generate(u, steps = 64)
    assert(g64.length === 64)
    assert(g64.take(8) === g8)
    assert(g64.forall(t => t >= 0 && t < TinyLlm.Vocab))
  }

  test("KV-cached decode is arithmetic-identical to the cache-free " +
       "single-step reference: same tokens AND same logits at every step") {
    val u = "Input data (or flow file content):\nkv cache check\n\nDescribe."
    val buf = scala.collection.mutable.ArrayBuffer(TinyLlm.tokenize(u): _*)
    val np = buf.length
    var lastUncached = 0L
    (0 until 32).foreach { _ =>
      val (t, lg) = TinyLlm.nextToken(buf)
      buf += t; lastUncached = lg
    }
    val (cached, lastCached) = TinyLlm.generate(u, steps = 32)
    assert(cached === buf.drop(np).toIndexedSeq)
    assert(lastCached === lastUncached)
  }

  test("empty/null input yields an empty generation, never an index " +
       "crash — the operator routes empty user messages to failure " +
       "BEFORE the model, so the model itself must stay total") {
    assert(TinyLlm.generate("") === ((IndexedSeq.empty[Int], 0L)))
    assert(TinyLlm.generate(null) === ((IndexedSeq.empty[Int], 0L)))
    assert(TinyLlm.render(TinyLlm.generate("")._1) === "")
    // the operator's empty-CONTENT path (banner dropped, user is the bare
    // prompt) — value cross-checked against the DuckDB oracle replay
    assert(TinyLlm.render(TinyLlm.generate("Describe.")._1) === "cccdegfc")
  }

  test("chatGenerate metric plane: ttft = prompt token count, " +
       "tokens/sec = decode length") {
    val u = "Input data (or flow file content):\nhi\n\nDescribe."
    val (text, ttft, tps) = TinyLlm.chatGenerate("{ignored}", u)
    assert(text === TinyLlm.render(TinyLlm.generate(u)._1))
    assert(ttft === u.length.toLong) // ASCII: chars == codepoints
    assert(tps === 8.0)
  }
}
