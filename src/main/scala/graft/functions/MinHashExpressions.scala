package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native per-document MinHash signature kernel (r20 optimization round).
 *
 * Computes, in ONE codegen'd call per document, the exact signature the
 * `Dedup.minHashSignatures` explode+hash-agg pipeline produces:
 *
 *   mh_k = min over word n-gram shingles of (h1 + k · h2m),  k < numHashes
 *   h1   = value of md5-hex chars 1..15   (= first 8 digest bytes BE >>> 4)
 *   h2m  = value of md5-hex chars 17..31 % (2⁵⁹ − 1)
 *                                         (= bytes 8..15 BE >>> 4, mod'd)
 *
 * — the Kirsch-Mitzenmacher double-hashing construction over the SAME md5
 * digest Spark's `conv(substring(md5(sh), p, 15), 16, 10)` derives, so the
 * longs are bit-identical to the SQL formulation (pinned by unit test) and
 * every oracle replay is untouched.
 *
 * Why a kernel (guide §1.2 step 2 / §2.4):
 *  - batch: the explode + Tungsten hash-agg shape paid, per shingle, a
 *    32-char hex rendering, two substring allocations, two radix-16 string
 *    parses, an exploded-row copy and a hash-map probe — and the
 *    groupBy(docId) re-grouping cost one full Exchange per LSH chain. The
 *    kernel computes the signature map-side inside the scan projection:
 *    the Exchange disappears outright.
 *  - streaming (`StatefulOps.bandDocs`): the per-row
 *    `transform(shingles, s => conv(substring(md5(s)...)))` lambdas run
 *    INTERPRETED (the documented ~20× penalty the batch path avoided);
 *    the kernel is the per-row formulation those rows needed all along.
 *
 * Shingling matches ShingleKernels.wordShingles (zero-copy slices,
 * whole-text fallback for docs shorter than n words). Duplicate shingles
 * need no distinct pass: min over a multiset equals min over its set.
 * NULL text returns a NULL signature — callers that filtered the null
 * shingle singleton drop such docs exactly as before.
 */
object MinHashKernels {
  val DoubleHashMod: Long = (1L << 59) - 1

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def beLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** The exact (h1, h2m) pair of the SQL formulation for one shingle's
    * bytes [start, start+len). */
  private def hashShingle(digest: java.security.MessageDigest,
                          b: Array[Byte], start: Int, len: Int,
                          out: Array[Long]): Unit = {
    digest.reset()
    digest.update(b, start, len)
    val d = digest.digest()
    out(0) = beLong(d, 0) >>> 4                     // hex chars 1..15
    out(1) = (beLong(d, 8) >>> 4) % DoubleHashMod   // hex chars 17..31
  }

  /** min_k(h1 + k·h2m) over all word n-gram shingles of `t`. */
  def signature(t: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val b = t.getBytes
    // space positions, one byte scan (0x20 never occurs mid-UTF8-sequence)
    var spaces = 0
    var i = 0
    while (i < b.length) { if (b(i) == ' ') spaces += 1; i += 1 }
    val pos = new Array[Int](spaces)
    var j = 0
    i = 0
    while (i < b.length) { if (b(i) == ' ') { pos(j) = i; j += 1 }; i += 1 }
    val numWords = spaces + 1
    val digest = md.get()
    val hp = new Array[Long](2)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    if (numWords < n) {
      // whole-text fallback shingle (ShingleKernels.wordShingles contract)
      hashShingle(digest, b, 0, b.length, hp)
      var k = 0
      while (k < numHashes) { mins(k) = hp(0) + k * hp(1); k += 1 }
    } else {
      var s = 0
      val numShingles = numWords - n + 1
      while (s < numShingles) {
        val start = if (s == 0) 0 else pos(s - 1) + 1
        val end = if (s + n == numWords) b.length else pos(s + n - 1)
        hashShingle(digest, b, start, end - start, hp)
        var k = 0
        while (k < numHashes) {
          val v = hp(0) + k * hp(1)
          if (v < mins(k)) mins(k) = v
          k += 1
        }
        s += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** Per-document MinHash signature array (codegen'd native kernel); NULL
  * text → NULL signature. Values bit-equal the explode+agg SQL shape. */
case class MinHashSigs(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  require(numHashes >= 1 && numHashes <= 8,
    "double-hashing construction sized for <= 8 permutations")
  override def prettyName: String = "graft_minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${child.dataType.sql}")

  override protected def nullSafeEval(t: Any): Any =
    MinHashKernels.signature(t.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernels.signature($c, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
