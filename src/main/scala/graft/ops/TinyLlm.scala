package graft.ops

/**
 * Deterministic tiny-transformer inference — the REAL model behind the
 * RunLlamaCppInference boundary (reference:
 * extensions/llamacpp/processors/RunLlamaCppInference.h:55, generation via
 * llama.cpp). The container ships no native inference lib, so the model
 * here is a seeded closed-form transformer: integer weights derived from
 * modular formulas, one self-attention layer with exact rational
 * (common-denominator) ReLU²-normalized attention, residual, linear
 * unembedding, greedy argmax decode. Every operation is exact int64
 * arithmetic, so the DuckDB oracle replays the full forward pass + decode
 * loop analytically (a recursive CTE over the same formulas) — the same
 * playbook that made image pixel decode real in r18 (synthetic lossless
 * PNG + analytic oracle). A llama.cpp JNI binding would replace
 * [[generate]] 1:1; everything around it (chat assembly, routing, metric
 * stamping, per-partition batching) is the production surface.
 *
 * Scale shape: inference is a pure per-row map — no shuffle, no state;
 * it rides the scan exactly like the quality-score projections. Cost per
 * row is O(steps · context · d²) int64 ops (≈ 8·80·16 here), flat per
 * document.
 *
 * Arithmetic envelope (why int64 never overflows): embeddings ∈ [-8,8],
 * projections |q|,|k|,|v| ≤ d·8·3 = 96, scores |q·k| ≤ d·96² ≈ 3.7e4,
 * ReLU² ≤ 1.4e9, denominator D ≤ ctxLen·1.4e9 ≈ 1.1e11 at ctxLen 80,
 * context numerator ≤ D·96 ≈ 1.1e13, h ≤ 8·D + 1.1e13 ≈ 1.2e13,
 * logits ≤ d·h·4 ≈ 1.9e14 « 2⁶³. DuckDB BIGINT (overflow-checked) holds
 * the same bound, so the oracle replay is bit-exact, not approximate.
 */
object TinyLlm {
  /** Vocabulary size: tokens are codepoint % Vocab, rendered 'a'+t. */
  val Vocab = 16
  /** Embedding/head dimension. */
  val Dim = 4
  /** Greedy decode length. */
  val Steps = 8
  /** Prompt window: chars of flow-file content fed as input data. */
  val ContentWindow = 24

  // Weight formulas — the "seed" is the constant offsets. These MUST stay
  // in lockstep with the oracle SQL generated in SparkEntry.tinyLlmSql.
  @inline private def emb(t: Long, p: Long, j: Long): Long =
    ((t * 131 + j * 31 + 7) % 9) - 4 + ((p * 89 + j * 53 + 11) % 9) - 4
  @inline private[graft] def wq(a: Long, j: Long): Long =
    ((a * 67 + j * 29 + 13) % 7) - 3
  @inline private[graft] def wk(a: Long, j: Long): Long =
    ((a * 61 + j * 37 + 17) % 7) - 3
  @inline private[graft] def wv(a: Long, j: Long): Long =
    ((a * 59 + j * 41 + 19) % 7) - 3
  @inline private def un(w: Long, j: Long): Long =
    ((w * 107 + j * 43 + 23) % 9) - 4

  /** Codepoint tokenizer (matches DuckDB `unicode(substr(u,i,1)) % 16` —
    * characters, not UTF-16 units; the corpus is ASCII but stay correct). */
  def tokenize(s: String): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out += (cp % Vocab)
      i += Character.charCount(cp)
    }
    out.toArray
  }

  /** One greedy step over the token context: (next token, its logit).
    * First argmax wins ties (list_position semantics in the oracle).
    * Precondition: non-empty context (callers route empty input to the
    * failure path; [[generate]] guards it). */
  def nextToken(toks: collection.IndexedSeq[Int]): (Int, Long) = {
    val n = toks.length
    val xl = Array.tabulate(Dim)(j => emb(toks(n - 1), n - 1L, j))
    val q = Array.tabulate(Dim) { j =>
      var s = 0L; var a = 0
      while (a < Dim) { s += xl(a) * wq(a, j); a += 1 }; s
    }
    // per-position k/v projections and ReLU² scores, one pass
    val ss = new Array[Long](n)
    val vs = Array.ofDim[Long](n, Dim)
    var i = 0
    while (i < n) {
      val x = Array.tabulate(Dim)(j => emb(toks(i), i, j))
      var sc = 0L
      var j = 0
      while (j < Dim) {
        var kj = 0L; var vj = 0L; var a = 0
        while (a < Dim) { kj += x(a) * wk(a, j); vj += x(a) * wv(a, j); a += 1 }
        sc += q(j) * kj
        vs(i)(j) = vj
        j += 1
      }
      val r = math.max(0L, sc)
      ss(i) = r * r
      i += 1
    }
    var dn = 0L
    i = 0; while (i < n) { dn += ss(i); i += 1 }
    // exact rational attention: context numerator over common denominator
    // dn; all-zero scores degenerate to attending the last position only
    val (dd, ctx) =
      if (dn == 0L) (1L, vs(n - 1))
      else (dn, Array.tabulate(Dim) { j =>
        var s = 0L; var k = 0
        while (k < n) { s += ss(k) * vs(k)(j); k += 1 }; s
      })
    val h = Array.tabulate(Dim)(j => xl(j) * dd + ctx(j))
    var best = 0; var bestLogit = Long.MinValue
    var w = 0
    while (w < Vocab) {
      var lg = 0L; var j = 0
      while (j < Dim) { lg += h(j) * un(w, j); j += 1 }
      if (lg > bestLogit) { bestLogit = lg; best = w } // strict: first argmax
      w += 1
    }
    (best, bestLogit)
  }

  /** Greedy decode `steps` tokens from the user message (default [[Steps]],
    * the oracle-replayed depth; greedy decode is prefix-stable, so a deeper
    * decode extends — never changes — the 8-step trace).
    * Returns (generated tokens, final step's winning logit).
    *
    * KV-CACHED (r19), the same optimization every llama.cpp deployment
    * runs: k_i/v_i depend only on (token_i, position_i), which never
    * change once emitted, so they are projected ONCE when the position
    * enters the context and each decode step is O(d² + n·d) instead of
    * the naive O(n·d²) full-recompute — identical arithmetic, identical
    * trace ([[nextToken]] stays as the cache-free single-step reference
    * and TinyLlmSpec pins their equality). */
  def generate(user: String, steps: Int = Steps): (IndexedSeq[Int], Long) = {
    // empty/null context: like llama.cpp, decoding needs at least one
    // token — the operator routes empty user messages to `failure` before
    // the model runs (runLlamaInference's guard), so the model itself
    // returns an empty generation instead of indexing toks(-1)
    if (user == null || user.isEmpty) return (IndexedSeq.empty, 0L)
    val toks = scala.collection.mutable.ArrayBuffer(tokenize(user): _*)
    val np = toks.length
    val ks = new scala.collection.mutable.ArrayBuffer[Array[Long]](np + steps)
    val vs = new scala.collection.mutable.ArrayBuffer[Array[Long]](np + steps)
    def pushKv(t: Int, p: Int): Unit = {
      val k = new Array[Long](Dim); val v = new Array[Long](Dim)
      var a = 0
      while (a < Dim) {
        val xa = emb(t, p, a)
        var j = 0
        while (j < Dim) { k(j) += xa * wk(a, j); v(j) += xa * wv(a, j); j += 1 }
        a += 1
      }
      ks += k; vs += v
    }
    var p = 0
    while (p < np) { pushKv(toks(p), p); p += 1 }
    var lastLogit = 0L
    var s = 0
    while (s < steps) {
      val n = toks.length
      val xl = Array.tabulate(Dim)(j => emb(toks(n - 1), n - 1L, j))
      val q = Array.tabulate(Dim) { j =>
        var acc = 0L; var a = 0
        while (a < Dim) { acc += xl(a) * wq(a, j); a += 1 }; acc
      }
      var dn = 0L
      val ctx = new Array[Long](Dim)
      var i = 0
      while (i < n) {
        val ki = ks(i)
        var sc = 0L; var j = 0
        while (j < Dim) { sc += q(j) * ki(j); j += 1 }
        val r = math.max(0L, sc)
        val ss = r * r
        dn += ss
        if (ss != 0L) {
          val vi = vs(i); var j2 = 0
          while (j2 < Dim) { ctx(j2) += ss * vi(j2); j2 += 1 }
        }
        i += 1
      }
      val (dd, cx) = if (dn == 0L) (1L, vs(n - 1)) else (dn, ctx)
      var best = 0; var bestLogit = Long.MinValue
      var w = 0
      while (w < Vocab) {
        var lg = 0L; var j = 0
        while (j < Dim) { lg += (xl(j) * dd + cx(j)) * un(w, j); j += 1 }
        if (lg > bestLogit) { bestLogit = lg; best = w }
        w += 1
      }
      toks += best
      pushKv(best, n)
      lastLogit = bestLogit
      s += 1
    }
    (toks.drop(np).toIndexedSeq, lastLogit)
  }

  /** Render tokens as text: token t → letter 'a'+t (a..p at Vocab=16). */
  def render(toks: Seq[Int]): String =
    toks.map(t => ('a' + t).toChar).mkString

  /**
   * The generate hook for [[Exec.runLlamaInference]]: (messagesJson, user)
   * → (generated text, time-to-first-token ms, tokens/sec). Wall timing is
   * not oracle-checkable, so the metric plane carries deterministic
   * proxies with the reference's exact formatting: ttft = prompt token
   * count (ms), tokens/sec = decode length. A llama.cpp binding would
   * consume messagesJson and report real timings here.
   */
  def chatGenerate(messagesJson: String, user: String)
      : (String, Long, Double) = {
    val (toks, _) = generate(user)
    (render(toks), tokenize(user).length.toLong, Steps.toDouble)
  }
}
