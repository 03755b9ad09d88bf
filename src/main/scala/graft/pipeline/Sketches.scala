package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, DoubleType, StructField, StructType}
import graft.pipeline.Staging.StagingOps

/**
 * Bounded-state frequency/cardinality sketches for corpus statistics — the
 * operations a 100 TB pipeline runs constantly ("how often does this token
 * appear", "how big is the vocabulary") where the EXACT answer needs a
 * corpus-cardinality shuffle (`groupBy(token)` over ~10^11 distinct keys)
 * but a configuration-bounded sketch answers within guaranteed error from
 * kilobytes of aggregate state:
 *
 *  - Count-min sketch (Cormode & Muthukrishnan 2005, "An improved data
 *    stream summary: the count-min sketch and its applications",
 *    J. Algorithms 55(1)): `depth`×`width` counters; point estimate =
 *    min over rows; never underestimates, overestimates by ≤ ε·N with
 *    probability 1−δ at width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.
 *  - HyperLogLog (Flajolet, Fusy, Gandouet & Meunier 2007, "HyperLogLog:
 *    the analysis of a near-optimal cardinality estimation algorithm",
 *    AofA 2007): 2^p max-rank registers; relative error ≈ 1.04/√(2^p).
 *
 * Unlike Spark's built-ins (`approx_count_distinct`'s HLL++ and
 * `DataFrameStatFunctions.countMinSketch`, whose register layouts are
 * engine-private), these sketches hash with the repo's engine-portable
 * md5-prefix construction, so DuckDB computes the IDENTICAL cells,
 * registers and estimates — the sketch itself is oracle-checkable.
 *
 * Scale shape (both): ONE corpus pass aggregating into config-bounded
 * state (depth·width counter cells / 2^p registers) via map-side partial
 * aggregation — the shuffle moves at most `cells × partitions` partial
 * rows regardless of corpus size; the collected sketch is driver metadata
 * of the same class as DSIR's bucket table, and estimation is either a
 * map-side literal lookup (CMS probes) or driver arithmetic on ≤2^p rows
 * (HLL).
 */
object Sketches {

  /** Row-`j` counter bucket of a token: first 48 md5 bits of the salted
    * token, mod `width` — pairwise-independent-enough per the md5
    * convention every hash here uses, identical in DuckDB via
    * CAST('0x'||substring(md5(...),1,12) AS BIGINT). */
  def cmsBucket(tok: Column, j: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$j|"), tok)), 1, 12), 16, 10)
      .cast("long") % width

  /**
   * The sketch-build pass: one explode over the token stream, each token
   * emitting its `depth` (row, bucket) cells, collapsed by ONE map-side
   * partial count into ≤ depth·width rows. Returns (j, b, c) cells.
   */
  def countMinCells(df: DataFrame, tokenCol: Column,
                    depth: Int = 4, width: Int = 1024): DataFrame =
    df.select(tokenCol.as("tok"))
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), cmsBucket(col("tok"), j, width).as("b"))): _*))
        .as("p"))
      .groupBy(col("p.j").as("j"), col("p.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /**
   * Point-query estimates for a probe set: the collected cells (bounded
   * driver metadata — at the 4×1024 default, 4096 longs) embed as ONE map
   * literal keyed j·width+b, and each probe's estimate is the min over
   * `depth` map-side lookups — no join, no corpus re-scan. A probe absent
   * from every row estimates 0 (CMS never underestimates, so 0 means
   * truly absent).
   */
  def cmsEstimates(cells: DataFrame, probes: DataFrame, tokenCol: Column,
                   depth: Int = 4, width: Int = 1024): DataFrame = {
    val cellMap: Map[Long, Long] = cells.collect().iterator.map { r =>
      (r.getAs[Int]("j").toLong * width + r.getAs[Long]("b")) ->
        r.getAs[Long]("c")
    }.toMap
    val lookups = (0 until depth).map { j =>
      coalesce(
        element_at(typedlit(cellMap),
          lit(j.toLong * width) + cmsBucket(tokenCol, j, width)),
        lit(0L))
    }
    probes.select(tokenCol.as("token"),
      (if (lookups.size == 1) lookups.head else least(lookups: _*))
        .as("est_count"))
  }

  /**
   * HyperLogLog distinct-count estimate over a token column, returned as
   * ONE metadata row (m, filled, zeros, s_scaled, est):
   *
   *  - register index = first 16 md5 bits mod m (m = 2^p registers),
   *    rank ρ = 1 + leading zeros of the NEXT 60 md5 bits (ρ ∈ [1, 61]);
   *    registers aggregate max(ρ) — one corpus pass, ≤ m rows of state.
   *  - the indicator sum Z = Σ 2^−M_j is kept EXACT by scaling to
   *    integer units of 2^−61: each register contributes 2^(61−M_j)
   *    (empty registers 2^61), summed as DECIMAL — order-independent,
   *    so `s_scaled` is bit-equal across engines; `est` then follows
   *    Flajolet's raw estimator α_m·m²·2^61/S with the small-range
   *    linear-counting correction (E ≤ 2.5m with empty registers →
   *    m·ln(m/zeros)). The large-range correction is omitted: it
   *    patches 32-BIT hash saturation and this rank stream is 60-bit.
   *
   * Estimate arithmetic runs on the driver over the exact integer S in
   * source order matching the SQL oracle expression (plain IEEE doubles,
   * the mixtureRates discipline), rounded HALF_UP to a long.
   */
  def hllEstimate(df: DataFrame, tokenCol: Column, p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "hll precision p must be in [4,16]")
    val m = 1 << p
    val h = md5(concat(lit("hll|"), tokenCol))
    val idx = conv(substring(h, 1, 4), 16, 10).cast("long") % m
    val v = conv(substring(h, 5, 15), 16, 10).cast("long")
    // rank = 61 − bit-length(v) + 1 zeros… concretely: 60-bit stream, so
    // ρ = 61 − length(bin(v)) for v > 0 (bin() has no leading zeros in
    // either engine) and ρ = 61 when the whole stream is zero
    val rho = when(v === 0L, lit(61)).otherwise(lit(61) - length(bin(v)))
    val regs = df.select(idx.as("idx"), rho.cast("int").as("rho"))
      .groupBy("idx").agg(max(col("rho")).as("r"))
      .collect()
    val filled = regs.length.toLong
    val zeros = m - filled
    val sScaled: BigInt = regs.iterator
      .map(r => BigInt(1) << (61 - r.getAs[Int]("r"))).sum +
      BigInt(zeros) * (BigInt(1) << 61)
    val sD = sScaled.toDouble
    // α_m · m² · 2^61 / S — literal 2^61 on both sides, same op order
    val raw = 0.7213 / (1.0 + 1.079 / m) * m * m * 2305843009213693952.0 / sD
    val estD =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    val est = BigDecimal(estD).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLong
    val spark = df.sparkSession
    spark.createDataFrame(
      java.util.List.of(Row(m.toLong, filled, zeros, sD, est)),
      StructType(Seq(
        StructField("m", LongType, nullable = false),
        StructField("filled", LongType, nullable = false),
        StructField("zeros", LongType, nullable = false),
        StructField("s_scaled", DoubleType, nullable = false),
        StructField("est_distinct", LongType, nullable = false))))
  }

  /**
   * KMV (k-minimum-values) distinct sketch per source — Bar-Yossef et al.
   * 2002 ("Counting distinct elements in a data stream", RANDOM) with the
   * (k−1)/U_(k) estimator of Beyer et al. 2007 (SIGMOD). Where HLL gives
   * ONE stream's cardinality, KMV sketches COMPOSE: the k smallest hash
   * values of A ∪ B are computable from the two sketches alone, so
   * union (and by inclusion-exclusion intersection) cardinalities across
   * sources come from |sources|·k rows of metadata — the set-operation
   * telemetry a multi-source corpus audit wants ("how many NEW shingles
   * does source B add?").
   *
   * Determinism: values are the 60-bit md5-prefix longs of distinct word
   * n-gram shingles — the k smallest form a canonical SET (no RNG, no
   * partition dependence), and the estimator divides exact integers in
   * DECIMAL(38,0) (truncating `div`, the classifier's device), so any
   * engine reproduces sketch AND estimate bit-exactly. A source with
   * fewer than k distinct shingles is EXACT by construction (the sketch
   * IS the value set) — the estimator switches to the plain count.
   *
   * Scale shape: one shingle explode → distinct (src, h) — the
   * sourceOverlap pass — then a per-source rank window whose output is
   * capped at k rows per source; pair ops run on |sources|²·k metadata.
   */
  def kmvSketch(df: DataFrame, sourceCol: Column, textCol: Column,
                n: Int = 5, k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2 (the estimator divides by h_(k))")
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(sourceCol.as("src"),
      explode(array_distinct(Dedup.shingles(textCol, n))).as("sh"))
      .filter(col("sh").isNotNull)
    val h1 = conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
    val hashed = sh.select(col("src"), h1.as("h")).distinct()
      .staged // sketch rank + exact count read it once each
    val nsh = hashed.groupBy("src").agg(count(lit(1)).as("nExact"))
    hashed
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("h"))).cast("long"))
      .filter(col("rnk") <= k)
      .join(nsh, "src")
  }

  /** 2^60 — the hash-space size of the 60-bit md5-prefix values, the
    * normalizer of the KMV estimator. */
  val KmvSpace: Long = 1L << 60

  /** Per-source estimates from a [[kmvSketch]] frame: exact when the
    * source holds fewer than k values, (k−1)·2⁶⁰ div h_(k) otherwise. */
  def kmvEstimates(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("src"))
      .agg(max(col("nExact")).as("n_exact"),
        count(lit(1)).as("nv"), max(col("h")).as("hk"))
      .withColumn("est_distinct",
        when(col("nv") < k, col("n_exact"))
          .otherwise(expr(s"CAST((${k - 1}) AS DECIMAL(38,0)) * " +
            s"CAST($KmvSpace AS DECIMAL(38,0)) div hk")))
      .select(col("src"), col("n_exact"), col("est_distinct"))

  /**
   * Pairwise set-operation estimates from the sketches alone: for each
   * unordered source pair, the k smallest DISTINCT hashes of the merged
   * sketches are a valid KMV of the union (identical shingles hash
   * identically across sources, so the merge dedups by h);
   * intersection = est_a + est_b − est_union, floored at 0. Pairs where
   * the merged set holds fewer than k values are exact unions.
   */
  def kmvPairOps(sketch: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val est = kmvEstimates(sketch, k)
    val slim = sketch.select(col("src"), col("h")).staged
    val srcs = slim.select(col("src")).distinct()
    val pairs = srcs.select(col("src").as("sa"))
      .crossJoin(srcs.select(col("src").as("sb")))
      .filter(col("sa") < col("sb"))
    // UNION of two equi-joins, not one disjunctive join (r17 review: an
    // OR predicate plans as a nested-loop join — fine at |sources|²·k
    // metadata scale, but it degrades quietly as source cardinality
    // grows; two hash joins keep the shape at any |sources|)
    val merged = pairs.join(slim.select(col("src").as("sa"), col("h")), Seq("sa"))
      .unionByName(
        pairs.join(slim.select(col("src").as("sb"), col("h")), Seq("sb")))
      .select(col("sa"), col("sb"), col("h")).distinct()
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("sa"), col("sb")).orderBy(col("h"))))
      .filter(col("rnk") <= k)
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("nv"), max(col("h")).as("hk"))
      .withColumn("est_union",
        when(col("nv") < k, col("nv").cast("long"))
          .otherwise(expr(s"CAST((${k - 1}) AS DECIMAL(38,0)) * " +
            s"CAST($KmvSpace AS DECIMAL(38,0)) div hk")))
    merged
      .join(est.select(col("src").as("sa"), col("est_distinct").as("est_a")),
        Seq("sa"))
      .join(est.select(col("src").as("sb"), col("est_distinct").as("est_b")),
        Seq("sb"))
      .withColumn("est_intersect",
        greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)))
      .select(col("sa"), col("sb"), col("est_a"), col("est_b"),
        col("est_union"), col("est_intersect"))
  }
}
