package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Benchmark main — runs the headline queries on SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric":...,"queries":{...}}. The headline set
 * covers one representative per operator family (agg, route/explode,
 * split+merge round trip, incremental pull, dedup LSH, ANN, text analysis)
 * rather than all registered queries, so the number tracks engine throughput
 * instead of oracle-surface size.
 */
object Bench {
  val headline: Seq[String] = Seq(
    "execute_sql", "rolling_window_time", "route_text", "merge_content",
    "query_database_table", "dedup_minhash_lsh", "embed_topk", "token_count",
    "pipeline_e2e")

  /** Dedup queries re-measured on a degenerate corpus (below): the rows
    * that prove the salt caps / keeper aggregates hold under mass
    * duplication instead of only on the uniform synthetic data. */
  val skewed: Seq[String] = Seq(
    "dedup_minhash_lsh", "dedup_minhash_lsh_capped", "dedup_segments",
    "pipeline_e2e",
    // r15: 30% identical docs make every paragraph window of the mass a
    // single hot segment — the bloom probe stays map-side and the keeper
    // min-agg collapses the mass before its shuffle (the dedup_segments
    // skew argument, now measured on the bloom plane too)
    "dedup_paragraphs_bloom",
    // r15: the 30% mass puts boilerplate terms (df ≈ 30%) in ~a third
    // of the queries — every such query's candidate set becomes the
    // whole mass, and the per-qid rank windows eat it. The capped twin
    // (df cap 20% < the mass's 30%) drops those terms from scoring, so
    // the pair brackets the stop-word funnel like the capped-LSH pair
    "bm25_topk", "bm25_topk_capped",
    // r16: SoftDedup on 30% identical docs — the content-hash window
    // funnels the mass into ONE partition's count; the row proves that
    // tail is a linear scan, not a blow-up (the dedup_segments argument
    // on the soft plane)
    "dedup_soft")

  /**
   * Derive a mass-duplicated variant of the sf documents table and stage it
   * as parquet so the skewed rows read from disk exactly like the uniform
   * rows: 30% of docs are replaced with ONE identical text (every LSH band
   * bucket, content hash, and segment set collides for that mass), and one
   * hot 20-word sentence is appended to EVERY doc (a single shingle/segment
   * with document frequency = |corpus|). This is the adversarial shape the
   * salt caps (Dedup.minHashLshPairs), keeper aggregates (Dedup.exact,
   * dedupSegments) and shingle df-caps are designed for.
   */
  private def stageSkewed(spark: SparkSession, sfDir: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-skew"
    val hot = (1 to 20).map(i => s"hotword$i").mkString(" ")
    val dupText = ("mass duplicated boilerplate sentence " * 12).trim
    // Duplicate in GROUPS (~10 copies of each of 149 texts at sf0.1), not as
    // one corpus-wide text: near-dup candidate pairs are inherently
    // quadratic per duplicate group, so a single 1500-doc group *correctly*
    // emits ~1.1M pairs — 10,000× the uniform output — which would measure
    // output volume, not plan robustness. (Exact dedup, which runs before
    // LSH in the composed pipeline, is the designed collapse for that case.)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text",
        concat(when(col("doc_id") % 10 < 3,
            concat(lit(dupText + " variant "), (col("doc_id") % 149).cast("string")))
          .otherwise(col("text")), lit(" " + hot)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    out
  }

  /** Queries re-measured across a scale decade (below): the rows that turn
    * the 100 TB plan claims into measured evidence — near-linear x10 wall
    * time means no stage is quadratic, single-reducer, or driver-bound. */
  val x10: Seq[String] = Seq(
    "dedup_minhash_lsh", "dedup_segments", "pipeline_e2e", "shuffle_export",
    "embed_topk", "embed_neardup", "embed_topk_lsh", "tfidf_topk",
    "curate_filters_map",
    // the consonant rotation preserves duplicate STRUCTURE (both members
    // of a duplicated span rotate identically per replica), so duplicated
    // windows scale exactly 10× (probed: 10,533 → 105,330 dup keys at
    // sf0.1) and stay disjoint across replicas. NOTE the measured pair is
    // fixed-cost-dominated on this corpus of short docs (~0.13 s at both
    // scales on 32 cores — ~2.7M windows is tiny); the row's value is the
    // REGRESSION GUARD: any quadratic span stage would inflate the x10
    // side immediately
    "dedup_substrings",
    // bucket table stays 1024 rows at ANY corpus size — the scale story
    // is the bounded-state aggregation; per-gram work is linear
    "dsir_weights",
    // same bounded-LM design as dsir_weights (≤2·1024-row model, map-side
    // lookup, one groupBy(doc)); per-bigram work is linear, both LM
    // histograms come from ONE reference pass, and the tertile cutpoints
    // are one rank-condition job over the reference score histogram
    "perplexity_buckets",
    // corpus pass is one word-frequency agg; the merge rounds (64
    // merges in 8 batched-greedy rounds since r15) run on the
    // distinct-word table (Zipf-bounded, grows sublinearly with the
    // corpus) — wall should track the corpus scan, not the loop
    "bpe_train",
    // deep-vocabulary BPE (r16): 512 merges in 20 rounds over the
    // construction-bounded ~6k-word derived vocabulary — the pair is the
    // round-bounded (not merge-bounded) growth evidence: both sides pay
    // the same 20 driver round trips, so the x10 delta should be pure
    // corpus-scan growth in the word-frequency agg
    "bpe_train_512",
    // unigram-LM train (r15): same bounded-loop class as bpe_train —
    // the corpus pass is one word-frequency agg, both EM rounds run on
    // the Zipf-bounded distinct-word table with ≤122-row vocab metadata
    "unigram_train",
    // D4 prototype pruning: broadcast assignment + rank window per
    // cluster, no pair enumeration — linear in rows at fixed k
    "dedup_prototypes",
    // PQ ANN (r15): codebooks are driver metadata, encoding map-side,
    // ADC tables ride the broadcast query side — candidate scoring
    // reads m code ints per corpus row, so the x10 side should track
    // the (much smaller) scan, not the pair count
    "embed_topk_pq",
    // GPT-3 quality filter (r15): ONE bounded training agg + one
    // map-side scoring pass + groupBy(doc) — the dsir_weights shape,
    // so the pair should scale with the token explode, near-linearly
    "quality_filter_pareto",
    // IVF-PQ (r15): the index build (coarse Lloyd + residual-PQ Lloyd)
    // is a fixed number of bounded jobs, so the x10 side should be
    // dominated by the probed-cell code scan — strongly sublinear
    "embed_topk_ivfpq",
    // CMS + HLL (r15): both sketches aggregate into config-bounded state
    // (4096 cells / 1024 registers) via map-side partials — the x10 side
    // should track the token-explode scan linearly with no growth in
    // shuffle or driver state
    "sketch_cms", "sketch_hll",
    // DoReMi (r15): the proxy-loss pass is the shared perplexity chain
    // (its scale pair lives in perplexity_buckets); the DRO loop itself
    // runs on ≤|domains| rows of collected metadata, so the x10 delta
    // should be pure scoring-pass growth
    "doremi_weights",
    // Dolma paragraph dedup (r15): bloom probe map-side + the
    // dedupSegments keeper/join/reassembly shapes — linear in segments
    "dedup_paragraphs_bloom",
    // k-means|| (r15): a fixed number of corpus passes against a
    // bounded candidate broadcast — the x10 side should track the scan
    "kmeans_parallel_init",
    // example export (r15): one per-token shuffle on exampleId — the
    // export's inherent volume; the pair should scale with token count
    "export_examples",
    // SlimPajama (r15): unlike the other compositions this one is NOT
    // content-sensitive (no langid markers, no stop-word rules — NFC is
    // content-independent, the 200-char gate is length-preserved by the
    // rotation, and the in-query clones scale 10× because rep-0 ids are
    // exactly the doc_id%10==0 set), so the full e2e carries a real
    // scale pair: expect the LSH stages to dominate, near-linearly
    "slimpajama_e2e",
    // Kneser-Ney perplexity (r15): the perplexity_buckets shape with a
    // bigger bounded model (three ≤B-row maps from one tagged reference
    // pass) — per-gram work is a lookup chain + two codegen'd lns, so
    // the pair should track the gram explode linearly
    "perplexity_kn",
    // BM25 (r15): queries (doc_id % 101) and corpus both grow 10×, but
    // the broadcast term semi-join keeps every shuffle on the
    // query-matching sliver — expect near-linear from the scan + sliver
    "bm25_topk",
    // WordPiece (r15): the bpe_train class — one corpus pass, 16
    // merges in 4 batched-greedy likelihood rounds on the Zipf-bounded
    // distinct-word table; wall should track the corpus scan, not the
    // merge loop
    "wordpiece_train",
    // source-overlap sketches (r15): aggregate state is |sources|·256
    // longs at ANY corpus size and the pair join reads only the sketch —
    // the x10 side should be pure shingle-scan growth
    "source_overlap",
    // trained logistic classifier (r15): the corpus is tokenized ONCE
    // into the checkpointed count sliver; each GD epoch is sliver-scale
    // shuffles + a ≤1024-row collect — the pair should track the token
    // pass, with the epochs flat across the decade
    "quality_logistic",
    // SQ8 ANN (r16): one scalar agg for the scale + the embed_topk
    // broadcast-query scoring shape on codes — the pair should track
    // embed_topk, with the encode riding the scan
    "embed_topk_sq8",
    // cluster-balanced sample (r16): broadcast assignment + ONE rank
    // window keyed on the cluster id — linear in rows at fixed k
    "cluster_sample",
    // SoftDedup (r16): one content-hash window, no join back — the
    // cheapest dedup-family pass; the pair should be pure scan+exchange
    "dedup_soft",
    // winnowing (r16): doc-keyed exchange + two window passes over the
    // same per-doc sort — the pair should scale with the shingle explode
    "winnow_fingerprints",
    // TinyLlm inference (r19): per-row int64 forward pass + greedy decode
    // riding the scan — content-INsensitive (fixed steps × context × d²
    // work per doc regardless of text), so the pair is a clean linear-
    // scaling row for the new REAL-inference plane
    "llm_inference")

  /** Measured at the uniform sf corpus only: the composed filter chain is
    * CONTENT-sensitive (stop-word and punctuation rules), and the x10
    * corpus's consonant rotation changes survivor counts 10× — an
    * x10 pair would measure corpus content shift, not scale (probed:
    * 142 vs 1433 survivors, inverted wall times). Its map-side prefix
    * (curate_filters_map: per-doc keep flags, no dedup) does the same
    * per-row work regardless of content, so THAT row carries the scale
    * pair in the x10 set. ccnet_e2e is content-sensitive the same way
    * (the consonant rotation strips the LID marker tokens, emptying the
    * predicted-en set at x10), so it is measured uniform-only too; its
    * stages' scale pairs live in dedup_segments and perplexity_buckets.
    * gpt3_e2e likewise (rotation moves the classifier's vocabulary and
    * so the survivor counts); its stages' pairs live in
    * quality_filter_pareto, dedup_minhash_lsh, and decontaminate. */
  val extra: Seq[String] = Seq("curate_filters_e2e", "ccnet_e2e", "gpt3_e2e",
    // r15: the Dolma and FineWeb compositions are content-sensitive the
    // same way (the rotation moves langid markers and filter survivor
    // sets), so uniform-only; their stages' scale pairs live in
    // dedup_paragraphs_bloom / dedup_minhash_lsh / curate_filters_map
    "dolma_e2e", "fineweb_e2e",
    // r15: DCLM is content-sensitive through its classifier (the
    // rotation moves the trained vocabulary and so the decile), so
    // uniform-only; its stages' scale pairs live in quality_logistic's
    // epochs (perplexity-class), dedup_paragraphs_bloom, and
    // curate_filters_map
    "dclm_e2e")

  /**
   * Stage a 10× corpus: the sf documents table replicated 10 times with
   * distinct ids (docId*10+rep). Replica texts are made DISJOINT documents
   * via a per-replica consonant rotation (`translate`), not near-copies:
   * replicating verbatim (or with a token appended) would hand LSH 10-doc
   * near-dup groups everywhere, and the measurement would track the
   * quadratic pair OUTPUT of a mass-duplicated corpus — that adversarial
   * shape is what the skew_* rows measure. The x10 rows answer a different
   * question: does wall time stay ~linear when a UNIFORM corpus grows 10×?
   * The rotation is codegen'd, content-deterministic, and keeps word/space
   * structure (token counts, shingle counts, segment windows all scale
   * exactly 10×); rep 0 is the original text.
   */
  /** Stage-once marker protocol shared by the staging helpers: ONE marker
    * may exist per staging dir. The dir's content is mutually exclusive
    * across scale factors (each restage OVERWRITES it), so a marker is
    * only trustworthy if every restage first deletes all other markers —
    * without that, running sf A then sf B then sf A again leaves A's stale
    * marker pointing at B's content (observed: an sf0.1 bench measuring
    * its x10 rows on the 10× corpus of sf0.01 — 10× smaller than claimed). */
  private def stageOnce(out: String, key: String)(stage: => Unit): Unit = {
    val dir = new java.io.File(out)
    val marker = new java.io.File(dir, ".staged3-" +
      java.lang.Long.toHexString(key.hashCode.toLong & 0xffffffffL))
    if (!marker.exists()) {
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith(".staged"))
        .foreach(_.delete())
      stage
      marker.createNewFile()
    }
  }

  private def stageX10(spark: SparkSession, sfDir: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-x10"
    stageOnce(out, sfDir) {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val alpha = "bcdfghjklmnpqrstvwxz" // consonants: rotation keeps vowels,
      // so rotated text still looks like words (segment/shingle shapes hold)
      val reps = (0 until 10).map { r =>
        val rot = alpha.drop(r) + alpha.take(r)
        base.select(
          (col("doc_id") * 10 + lit(r)).as("doc_id"),
          (if (r == 0) col("text")
           else translate(col("text"), alpha, rot)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      reps.reduce(_ unionAll _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
      // 10× embeddings for the ANN rows: replica r circularly shifts the
      // vector by r positions — same norm, distinct direction, so replicas
      // are DISJOINT points (not near-dups; same rationale as the text
      // rotation above). rep 0 keeps the original vector, and the query
      // subset (vec_id % 100 = 0) stays 1% of the corpus under id*10+rep.
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val embReps = (0 until 10).map { r =>
        emb.select(
          (col("vec_id") * 10 + lit(r)).as("vec_id"),
          (if (r == 0) col("embedding")
           else concat(slice(col("embedding"), r + 1, Int.MaxValue),
                       slice(col("embedding"), 1, r))).as("embedding"),
          col("label"))
      }
      embReps.reduce(_ unionAll _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    }
    out
  }

  /**
   * Long-doc variant for the EXACTSUBSTR pair (r13 verdict: the 1×/x10
   * dedup_substrings rows were fixed-overhead-dominated — ~0.2M windows
   * at sf0.1 is far below the ~0.1 s job-scheduling floor, so the 10×
   * corpus measured as fast as 1× and the pair proved nothing). Each doc
   * becomes the concatenation of `reps` sections, section j the doc's own
   * text with every token suffixed `_j` — token count ×`reps`, window
   * count ×`reps`, while duplicate STRUCTURE is preserved and scales
   * linearly: a span duplicated between docs A and B is duplicated
   * between their section-j copies, sections of one doc never collide
   * with each other, and (unlike a consonant-rotation family, whose
   * members COMPOSE with the x10 corpus's rotation — rot_j∘rot_r =
   * rot_{j+r} made every x10 replica pair share whole sections, an
   * accidental mass-duplication corpus) the suffix commutes with nothing.
   * With the window explode finally dominating, the longdoc 1×/x10 pair
   * is the scale evidence for the distributed EXACTSUBSTR formulation.
   */
  private[graft] def stageLongDocs(spark: SparkSession, docsDir: String,
                            tag: String, reps: Int = 16,
                            contentKey: String = ""): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-long-$tag"
    stageOnce(out, docsDir + "|" + contentKey + s"|$reps|v3") {
      val base = spark.read.parquet(s"$docsDir/documents.parquet")
      val long = concat_ws(" ", (0 until reps).map { r =>
        regexp_replace(col("text"), "(\\S+)", "$1_" + r)
      }: _*)
      base.select(col("doc_id"), long.as("text"), col("lang"),
        col("source"), col("n_chars"))
        // spread over 32 files: a staged corpus inherits its INPUT's file
        // count otherwise (the sf fixture is one row group → the 1× long
        // corpus exploded on ONE core while the x10 one, staged from 10
        // unioned files, got 10 — the r14 pair measured parallelism, not
        // data cost)
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    }
    out
  }

  /**
   * Mass-duplicated EXACTSUBSTR corpus (r15, the verdict's missing skew
   * row): one FIXED 24-token span appended to 30% of the long-doc
   * corpus's docs — its 17 interior 8-token windows each hash to a key
   * carried by ~0.3·|docs| copies (≈1,500 at sf0.1), the adversarial
   * shape for duplicate detection. The r14 `count().over(partitionBy(h))`
   * funneled every copy of such a key through one un-splittable reducer;
   * the r15 agg+join detection collapses them map-side before the
   * shuffle and lets AQE split the probe. (Boundary windows mixing doc
   * text with the span differ per doc — only the interior windows are
   * the hot mass, which is the point.)
   */
  private[graft] def stageSubstrSkew(spark: SparkSession, longDir: String,
                              contentKey: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-substrskew"
    stageOnce(out, longDir + "|" + contentKey) {
      val hot = (1 to 24).map(i => s"dupspan$i").mkString(" ")
      spark.read.parquet(s"$longDir/documents.parquet")
        .withColumn("text", when(col("doc_id") % 10 < 3,
          concat(col("text"), lit(" " + hot))).otherwise(col("text")))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    }
    out
  }

  /** Mass-duplication EXACTSUBSTR corpus (r16): 30% of the sf documents
    * gain the SAME token repeated ~10,800 times, so every interior
    * 8-window is ONE key carried by ~0.3·|docs|·10,745 copies (~48M at
    * sf0.1) — the single-hot-key funnel the dedupSubstrings
    * hotKeyThreshold salt exists for: unsalted, the count window drags
    * every copy through ONE task (a 24-distinct-key variant measured
    * BALANCED across 32 cores — no funnel, so the salt could only
    * lose); salted, the key splits into ~240 sub-partitions. */
  private[graft] def stageMassDup(spark: SparkSession, sfDir: String): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-massdup"
    stageOnce(out, sfDir + "|onekey2") {
      val rep = " massspan" * (448 * 24)
      spark.read.parquet(s"$sfDir/documents.parquet")
        .withColumn("text", when(col("doc_id") % 10 < 3,
          concat(col("text"), lit(rep))).otherwise(col("text")))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    }
    out
  }

  /** Degenerate-cluster embedding corpus (see the skew_dedup_semantic
    * rows in main): 70% of vectors become ONE exact direction.
    * `contentKey` must carry the UPSTREAM content identity when sfDir is
    * a fixed staging path (r16 verdict: the marker keyed on the constant
    * x10 tmp path, so an sf change left a stale, smaller skew corpus —
    * the r15 skew-semantic numbers were measured on it; the
    * stageTailCorpus fix applied here). */
  private[graft] def stageEmbSkew(spark: SparkSession, sfDir: String,
                                  tag: String = "",
                                  contentKey: String = ""): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-embskew$tag"
    stageOnce(out, sfDir + "|" + contentKey) {
      val dim = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .selectExpr("size(embedding) AS d").head().getInt(0)
      val hot = array((0 until dim).map(i =>
        lit(if (i == 0) 1.0f else 0.001f * i)): _*)
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .withColumn("embedding",
          when(col("vec_id") % 10 < 7, hot).otherwise(col("embedding")))
        .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")
    }
    out
  }

  /**
   * Stage a multi-file log corpus for the streaming row from a directory's
   * documents table: each document becomes a `<doc_id>`-headed message
   * split across 12-word continuation lines, hash-spread over 32 log
   * files with per-file contiguity (repartition by doc + partition-local
   * sort), so the tail source gets real per-file parallelism and the
   * defragment state real per-source reassembly work.
   *
   * `mult` replicates each document into that many distinct messages
   * (distinct header ids, identical bodies — splitting and reassembly are
   * content-insensitive, so replicas are valid THROUGHPUT work, unlike
   * the dedup rows' corpora). Round-11 finding: at mult=1 the drain was
   * fixed-overhead-dominated — the 10× corpus drained as fast as 1×
   * (1.095 vs 1.091 s), proving nothing about per-row cost. The measured
   * rows stage ~30× more lines so data cost dominates and the 1×/x10
   * pair separates.
   */
  private def stageTailCorpus(spark: SparkSession, docsDir: String,
                              tag: String, mult: Int = 1,
                              contentKey: String = ""): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-tail-$tag"
    // the marker keys on the CONTENT identity (docsDir + upstream sf),
    // not only the path: the staged-x10 dir keeps one fixed path across
    // scale factors, so a path-keyed marker silently reuses the previous
    // SF's corpus (observed: an sf0.1 run draining the sf0.01-staged 10×
    // corpus). stageOnce also invalidates other SFs' markers on restage.
    stageOnce(out, docsDir + "|" + contentKey) {
      val docs0 = spark.read.parquet(s"$docsDir/documents.parquet")
      val docs =
        if (mult == 1) docs0
        else docs0
          .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
          .select((col("doc_id") * mult + col("rep")).as("doc_id"),
            col("text"))
      val words = split(col("text"), " ")
      val nWin = greatest(ceil(size(words) / lit(12.0)).cast("int"), lit(1))
      val wins = transform(sequence(lit(0), nWin - 1),
        i => array_join(slice(words, i * lit(12) + 1, lit(12)), " "))
      docs.select(col("doc_id"), posexplode(wins).as(Seq("pos", "win")))
        .select(col("doc_id"), col("pos"),
          when(col("pos") === 0,
            concat(lit("<"), col("doc_id").cast("string"), lit("> "), col("win")))
            .otherwise(col("win")).as("value"))
        .repartition(32, col("doc_id"))
        .sortWithinPartitions("doc_id", "pos")
        .select("value")
        .write.mode(SaveMode.Overwrite).text(s"$out/logs")
    }
    s"$out/logs"
  }

  /**
   * One measured streaming drain: DSv2 TailFileSource over the staged log
   * files → a routing projection (header/body relationship, the
   * RouteOnAttribute shape) → stateful DefragmentText keyed per source
   * file (flatMapGroupsWithState) → relationship-partitioned parquet sink,
   * drained to completion (processAllAvailable over an on-disk corpus =
   * the AvailableNow batch-like run; FlowRuntime.runAvailable). Fresh
   * checkpoint + sink per rep so every rep tails the full corpus from
   * offset zero. Row value = wall seconds for the drain, same unit as the
   * batch rows; lines/value is the implied rows/s.
   */
  private[graft] def tailDrainSeconds(spark: SparkSession, corpus: String): Double = {
    import spark.implicits._
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-bench-tailrun-" +
      java.util.UUID.randomUUID
    val t0 = System.nanoTime()
    val tailed = spark.readStream
      .format("graft.streaming.TailFileSource")
      .option("path", corpus).option("glob", ".*\\.txt").load()
    val routed = tailed.withColumn("relationship",
      when(col("line").rlike("^<[0-9]+>"), "header").otherwise("body"))
    val frags = routed.select(col("path").as("source"),
      col("lineOffset").as("ord"), col("line").as("content"),
      lit(-1L).as("offset"), lit("").as("uuid"))
      .as[graft.streaming.StatefulOps.Fragment]
    val msgs = graft.streaming.StatefulOps.defragmentText(frags, "<[0-9]+>", 0)
    val q = graft.streaming.FlowRuntime.runAvailable(
      graft.streaming.FlowRuntime.relationshipSink(msgs.toDF(), s"$base/out"),
      s"$base/ckpt")
    q.stop()
    (System.nanoTime() - t0) / 1e9
  }

  /** Replicated corpus for the streaming near-dup drain: `mult` copies
    * of each document with every token suffixed by the replica id —
    * DISJOINT shingles across replicas (identical-body replicas would
    * make every replica pair a 1.0 near-dup and the drain would measure
    * hit OUTPUT volume, the stageSkewed anti-pattern; a token suffix
    * preserves within-replica near-dup structure and multiplies only
    * the banding/state work). Round-11 tail lesson applied here: at
    * mult=1 both drains sat on the ~5 s streaming fixed floor and the
    * 1×/x10 pair proved nothing. */
  private[graft] def stageNearDupCorpus(spark: SparkSession, docsDir: String,
                                        tag: String, mult: Int,
                                        contentKey: String = ""): String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-bench-nd-$tag"
    stageOnce(out, docsDir + "|" + contentKey + s"|$mult") {
      spark.read.parquet(s"$docsDir/documents.parquet")
        .withColumn("rep", explode(sequence(lit(0), lit(mult - 1))))
        .select((col("doc_id") * mult + col("rep")).as("doc_id"),
          regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_"), col("rep").cast("string"))).as("text"))
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
    }
    out
  }

  /** One measured streaming near-dup drain (r16 verdict #8: the
    * streaming dedup claim gets a bench row like the batch one): parquet
    * file-stream over the documents table → bandDocs (map-side MinHash
    * banding at the batch dedup_minhash_lsh parameters) → stateful
    * detectNearDuplicates (flatMapGroupsWithState, bucket state capped
    * at 150 signatures — bounded bytes at ANY corpus size) → noop sink,
    * drained with AvailableNow. Fresh checkpoint per rep so every rep
    * processes the full corpus from offset zero. */
  private[graft] def neardupDrainSeconds(spark: SparkSession, docsDir: String): Double = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-bench-ndrun-" +
      java.util.UUID.randomUUID
    val t0 = System.nanoTime()
    val schema = spark.read.parquet(s"$docsDir/documents.parquet").schema
    // two corpus layouts: the staged corpora ship documents.parquet as a
    // DIRECTORY of part files (stream path = that dir), the sf fixture
    // as ONE FILE (the file-stream source needs a directory path, so
    // stream the parent dir with a name filter — it lists leaf files
    // only, never descending into sibling .parquet dirs)
    val one = new java.io.File(s"$docsDir/documents.parquet")
    val docs =
      if (one.isDirectory)
        spark.readStream.schema(schema).parquet(s"$docsDir/documents.parquet")
      else
        spark.readStream.schema(schema)
          .option("pathGlobFilter", "documents.parquet").parquet(docsDir)
    val banded = graft.streaming.StatefulOps.bandDocs(docs, col("doc_id"),
      col("text"), col("doc_id"), n = 5, numHashes = 8, rowsPerBand = 2)
    val hits = graft.streaming.StatefulOps.detectNearDuplicates(banded,
      maxBucket = 150, minEstJaccard = 0.5)
    val q = hits.writeStream.format("noop")
      .option("checkpointLocation", s"$base/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    // all JSON emitters below use the f-interpolator (= String.format in
    // the DEFAULT locale): pin ROOT so a comma-decimal locale can never
    // emit unparseable "0,123" numbers (r19 ADVICE)
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm EVERY headline query once at the smallest scale before measuring:
    // profiled cold-vs-warm (graft.Profile, sf0.1) shows 5-7 s of one-time
    // codegen compile + classloading per distinct query shape vs 0.8-1.8 s
    // steady-state. A cluster run amortizes that one-time cost over hours,
    // so the number that predicts 100 TB throughput is the warm pass. The
    // warm-up runs at sf0.01 — an order of magnitude below the measured
    // scale, so no target-scale data is pre-cached, but with enough task
    // volume that the JIT actually tiers the generated code (one pass at
    // sf0.001 measured insufficient: the measured pass still paid compile).
    val warmDir = "/root/testdata/sf0.01"
    // warm EVERY benched query shape, not only the headline set — a
    // non-headline row whose first measured rep pays codegen compile
    // publishes an inverted 1×-vs-x10 pair (observed: a cold 1× row
    // slower than its warm x10 row)
    // Force FULL output materialization through the noop sink. r14 audit
    // (CountPlanProbe): under `.count()` Catalyst's column pruning +
    // unique-key outer-join elimination gutted several rows to a bare
    // parquet scan — dedup_substrings' count plan was literally
    // `count(1) over Relation` (probed 0.4 s counted vs 40+ s
    // materialized), token_count and curate_filters_map lost all their
    // per-doc computation, and shuffle_export shuffled only the 32-byte
    // key. The noop sink executes the exact output schema every engine
    // consumer would receive and discards it executor-side — no driver
    // collect, no files.
    def force(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    (0 until 2).foreach { _ =>
      (headline ++ skewed ++ x10 ++ extra).distinct.foreach { name =>
        try force(name, warmDir)
        catch { case e: Throwable => System.err.println(s"[bench] warm $name: $e") }
      }
    }
    // Min of N measured reps per query: the container's vCPUs see bursty
    // steal (same binary, same data: 0.4 s vs 2.9 s run-to-run; the composed
    // pipeline_e2e spans many job boundaries and swings 2-10 s), and min is
    // the noise-robust point estimate under one-sided interference noise —
    // every rep does the full sf-dir read, so no work is hidden, only
    // scheduler interference. The LSH rows get FIVE reps instead of three:
    // round 6 published a 2.325 s dedup_minhash_lsh that a rerun measured at
    // 0.699 s — all three reps had landed in one steal window. More reps (not
    // a different estimator) is the fix: min stays comparable round-over-
    // round, while median would sit on top of whatever noise the middle rep
    // caught.
    // pipeline_e2e spans many job boundaries and measured 1.5-2.7 s
    // run-to-run under scheduler steal — same fix as the LSH rows: more
    // reps, min stays the comparable estimator.
    // route_text and the ANN probe rows joined the set in round 12: the
    // published r11 numbers (route_text 0.799, x10_embed_topk_lsh 1.956)
    // were 2-4× one-sided steal spikes that min-of-3 failed to reject
    // (idle reruns: 0.524 / 0.498). The base name keys both the 1× and
    // x10/skew variants of a query.
    // r21 (r20 verdict #6, variance discipline): rows whose committed
    // max/min spread exceeded 2× between same-code runs get five reps —
    // dedup_substrings (its base name also keys the longdoc/skew/x10
    // variants, the 2-3× swingers of the r20 record) and dclm_e2e (the
    // r20 round's med swung 12.8-17.4 s under driver load while idle
    // runs read ~4 s). Additions-only: no existing row's timing loop or
    // estimator changed, reps ride along in the spread record.
    val wideNoise = Set("dedup_minhash_lsh", "dedup_minhash_lsh_capped",
      "pipeline_e2e", "route_text", "embed_topk_lsh", "embed_topk",
      "embed_neardup", "tfidf_topk",
      "dedup_substrings", "dclm_e2e")
    // r19 (verdict #4): per-ROW spread telemetry. Every published row keeps
    // min as its point estimate (noise-robust under one-sided steal, the
    // established round-over-round unit), but the full rep vector is
    // recorded so BENCH_LATEST.json carries min/median/max per row — cross-
    // run deltas (the driver re-run swung x10_slimpajama_e2e 68% vs the
    // committed idle run) can then be judged against a MEASURED band
    // instead of a remembered one.
    val repTimes = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    def rec(row: String, ts: Seq[Double]): (String, Double) = {
      repTimes(row) = ts
      row -> ts.min
    }
    def timesOfN(name: String, dir: String): Seq[Double] = {
      val reps = if (wideNoise(name)) 5 else 3
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { force(name, dir) }
        catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
        (System.nanoTime() - t0) / 1e9
      }
    }
    val results = headline.map(name => rec(name, timesOfN(name, sfDir)))
    // Degenerate-skew rows: same queries, mass-duplicated corpus. Staging
    // time is excluded (it is test-fixture construction, not query work);
    // each measured rep still reads the skewed parquet from disk. Skewed
    // queries outside the headline set also get a uniform comparator row;
    // neither counts toward the round-over-round total.
    // uniform comparator rows are measured BEFORE any staging write: a
    // just-finished multi-hundred-MB corpus write leaves GC/page-cache
    // pressure that outlasts min-of-3 (measured: a comparator row 5×
    // slower right after stageX10 vs identical in isolation)
    val skewComparators =
      skewed.filterNot(headline.contains)
        .map(name => rec(name, timesOfN(name, sfDir)))
    val x10Comparators =
      x10.filterNot(n => headline.contains(n) || skewed.contains(n))
        .map(name => rec(name, timesOfN(name, sfDir)))
    val skewDir = stageSkewed(spark, sfDir)
    val skewResults =
      skewComparators ++
      skewed.map(name => rec(s"skew_$name", timesOfN(name, skewDir)))
    // Scale-decade rows: same queries, a 10× corpus staged from the sf
    // documents (staging time excluded — fixture construction, not query
    // work). Each x10_* row pairs with a 1× row measured this same run
    // (headline or uniform comparator); the ratio is the near-linearity
    // evidence. Queries outside the headline set get their uniform
    // comparator row exactly like the skewed set does.
    val x10Dir = stageX10(spark, sfDir)
    // Pin a warm pass AT the x10 scale before measuring: r13's
    // x10_dedup_minhash_lsh published 0.723 s against a 1.051 s idle
    // rerun — this row's second >30% excursion in three rounds. The
    // sf0.01 warm-up tiers the codegen but leaves the first x10-scale rep
    // with cold page cache and un-scaled JIT profiles; one unmeasured
    // x10 pass makes every measured rep steady-state in both directions.
    x10.foreach { name =>
      try force(name, x10Dir)
      catch { case e: Throwable => System.err.println(s"[bench] x10 warm $name: $e") }
    }
    val x10Results =
      x10Comparators ++
      x10.map(name => rec(s"x10_$name", timesOfN(name, x10Dir)))
    // EXACTSUBSTR long-doc pair (see stageLongDocs): the same registered
    // query, 16× the tokens per doc — the explode/agg path dominates the
    // job floor, so THIS pair carries the near-linearity evidence; the
    // plain dedup_substrings rows above stay as the regression guard.
    val longDir1 = stageLongDocs(spark, sfDir, "1x")
    val longDir10 = stageLongDocs(spark, x10Dir, "10x", contentKey = sfDir)
    Seq(longDir1, longDir10).foreach { d =>
      try force("dedup_substrings", d)
      catch { case e: Throwable => System.err.println(s"[bench] long warm: $e") }
    }
    val longResults = Seq(
      rec("longdoc_dedup_substrings", timesOfN("dedup_substrings", longDir1)),
      rec("x10_longdoc_dedup_substrings",
        timesOfN("dedup_substrings", longDir10)))
    // Mass-duplication skew row for EXACTSUBSTR (see stageSubstrSkew):
    // pairs with longdoc_dedup_substrings above — a hot window key with
    // ~1,500 copies must stay within the capped-family band, not funnel
    val substrSkewDir = stageSubstrSkew(spark, longDir1, sfDir)
    try force("dedup_substrings", substrSkewDir)
    catch { case e: Throwable => System.err.println(s"[bench] substr skew warm: $e") }
    val substrSkewResults = Seq(
      rec("skew_longdoc_dedup_substrings",
        timesOfN("dedup_substrings", substrSkewDir)))
    // Mass-duplication EXACTSUBSTR pair (r16, the done-criterion for the
    // now-implemented hot-key salt): see stageMassDup — ONE window key
    // with ~0.3·|docs|·10,745 copies (~48M at sf0.1). Unsalted, that key
    // funnels through ONE count-window partition (probed 11.9 s vs 8.2 s
    // salted at sf0.1, the gap growing with the hot mass — measured as
    // the contrast row, min-of-2 like the uncapped semantic-skew row);
    // with hotKeyThreshold = 100k the heavy-hitter pre-pass salts it
    // into ~480 sub-partitions and the tail parallelizes.
    // A FAILED rep records a sentinel (1e9 s), never its wall time: this
    // pair is a head-to-head comparison, and publishing a crash's
    // elapsed time as the row would silently invert the conclusion.
    val massDupDir = stageMassDup(spark, sfDir)
    def substrOnce(dir: String, thr: Long): Unit =
      graft.pipeline.Dedup.dedupSubstrings(
        spark.read.parquet(s"$dir/documents.parquet"),
        col("doc_id"), col("text"), k = 8, hotKeyThreshold = thr)
        .write.format("noop").mode("overwrite").save()
    def substrTimes(dir: String, thr: Long, reps: Int): Seq[Double] =
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { substrOnce(dir, thr); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] massdup: $e"); 1e9 }
      }
    try substrOnce(massDupDir, 100000L) // warm the salted shape at scale
    catch { case e: Throwable => System.err.println(s"[bench] massdup warm: $e") }
    val massDupResults = Seq(
      rec("massdup_dedup_substrings", substrTimes(massDupDir, 0L, 2)),
      // r21: 5 reps (was 3) — committed same-code runs of this row read
      // 4.3 vs 8.5 s (r20 record); the unsalted twin stays min-of-2 (a
      // deliberately slow contrast row, more reps buy nothing)
      rec("massdup_dedup_substrings_salted",
        substrTimes(massDupDir, 100000L, 5)))
    // SemDeDup scale pair: the registered query's fixed nCentroids=8 would
    // make the intra-cluster pair join quadratic at 10× BY CONFIG (cluster
    // population ∝ N at fixed k) — the paper's own scale knob is cluster
    // count ∝ corpus (Abbas 2023 §3 runs 50k clusters on LAION), which
    // holds per-cluster population (and so pair volume per row) constant.
    // The x10 row scales k 8→80 accordingly; the pair ratio is the
    // linearity evidence UNDER the published scaling rule. (The 1× row
    // here matches dedup_semantic's registered config exactly.)
    def semDedupOnce(dir: String, nC: Int): Unit =
      graft.pipeline.Similarity.semDedup(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        threshold = 0.3, nCentroids = nC, lloydIters = 2)
        .write.format("noop").mode("overwrite").save()
    def semDedupTimes(dir: String, nC: Int): Seq[Double] =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        try semDedupOnce(dir, nC)
        catch { case e: Throwable => System.err.println(s"[bench] semdedup: $e") }
        (System.nanoTime() - t0) / 1e9
      }
    semDedupOnce(warmDir, 8); semDedupOnce(x10Dir, 80) // warm both shapes
    val semResults = Seq(
      rec("dedup_semantic", semDedupTimes(sfDir, 8)),
      rec("x10_dedup_semantic", semDedupTimes(x10Dir, 80)))
    // Full D4 pair, same cluster-count scaling rule as the SemDeDup pair
    // (k ∝ corpus per Abbas 2023 §3; the re-cluster phase scales with it)
    def d4Once(dir: String, nC: Int): Unit =
      graft.pipeline.Similarity.d4(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        threshold = 0.3, dropFraction = 0.3, nCentroids = nC, lloydIters = 2)
        .write.format("noop").mode("overwrite").save()
    def d4Times(dir: String, nC: Int): Seq[Double] =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        try d4Once(dir, nC)
        catch { case e: Throwable => System.err.println(s"[bench] d4: $e") }
        (System.nanoTime() - t0) / 1e9
      }
    d4Once(warmDir, 8); d4Once(x10Dir, 80)
    val d4Results = Seq(
      rec("d4_e2e", d4Times(sfDir, 8)),
      rec("x10_d4_e2e", d4Times(x10Dir, 80)))
    // r18 (#7): the 100 TB fault-tolerance mode, priced — the same
    // d4_e2e row under spark.graft.staging=reliable (durable checkpoint
    // instead of executor-local blocks at EVERY compute-once barrier;
    // results identical by StagingSpec). The gap vs d4_e2e is the
    // per-barrier durable write+read a deployment pays so the heaviest
    // staged chain survives executor loss.
    val d4ReliableResults = {
      spark.sparkContext.setCheckpointDir(
        s"${System.getProperty("java.io.tmpdir")}/graft-bench-ckpt")
      // restore whatever the conf held BEFORE the block (r18 ADVICE:
      // hardcoding "local" in the finally would silently clobber a
      // non-default spark.graft.staging for all subsequent rows)
      val prevStaging = spark.conf.getOption(graft.pipeline.Staging.ConfKey)
      spark.conf.set(graft.pipeline.Staging.ConfKey, "reliable")
      try {
        try d4Once(sfDir, 8) // warm the reliable shape
        catch { case e: Throwable =>
          System.err.println(s"[bench] d4 reliable warm: $e") }
        Seq(rec("d4_e2e_reliable", d4Times(sfDir, 8)))
      } finally prevStaging match {
        case Some(v) => spark.conf.set(graft.pipeline.Staging.ConfKey, v)
        case None    => spark.conf.unset(graft.pipeline.Staging.ConfKey)
      }
    }
    // Degenerate-cluster contrast set (r15, mirroring the capped LSH
    // pair): 70% of the corpus becomes ONE exact direction — identical
    // quantized vectors score identical cosines to every centroid and
    // the (negCos, cent) tie-break sends the whole mass to one cluster.
    // r17: the DEFAULT path is now exact-salted (the within-cluster pair
    // join splits block-wise past saltBlockSize), so skew_dedup_semantic
    // measures the default a naive caller gets; _unblocked disables the
    // salt (saltBlockSize = MaxValue, the r16 one-task quadratic) as the
    // contrast, and _capped keeps the recall-trade bound. The default
    // must land near the capped row, not the unblocked one.
    // staged from the x10 embeddings (20k vectors at sf0.1): at the 1×
    // corpus's 2,000 vectors the hot cluster's quadratic term is below
    // the job floor (probed 2.19 vs 2.13 uniform) and the pair proves
    // nothing — 14k identical vectors make the uncapped pair join ~100M
    // cosine evaluations, a contrast the cap must visibly bound
    val embSkewDir = stageEmbSkew(spark, x10Dir, "10x", contentKey = sfDir)
    def semDedupCappedOnce(dir: String, nC: Int, cap: Int): Unit =
      graft.pipeline.Similarity.semDedup(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        threshold = 0.3, nCentroids = nC, lloydIters = 2,
        maxClusterSize = cap)
        .write.format("noop").mode("overwrite").save()
    def semDedupCappedTimes(dir: String, nC: Int, cap: Int): Seq[Double] =
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        try semDedupCappedOnce(dir, nC, cap)
        catch { case e: Throwable => System.err.println(s"[bench] semdedup cap: $e") }
        (System.nanoTime() - t0) / 1e9
      }
    // the default (salted-exact) and capped rows get the usual warm +
    // min-of-3; the unblocked row is the deliberately-adversarial
    // contrast (r16 measured 42.3 s — ~100M cosine evaluations through
    // ONE task) and gets ONE rep with no separate warm: its code shape
    // is warmed by the other rows, and burning 80+ s on more reps of a
    // row whose point is an order-of-magnitude gap buys nothing. A
    // failed rep records the 1e9 sentinel (head-to-head contrast rows
    // must never publish a crash's wall time as a measurement).
    def semDedupUnblockedOnce(dir: String, nC: Int): Unit =
      graft.pipeline.Similarity.semDedup(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        threshold = 0.3, nCentroids = nC, lloydIters = 2,
        saltBlockSize = Int.MaxValue)
        .write.format("noop").mode("overwrite").save()
    semDedupOnce(embSkewDir, 80); semDedupCappedOnce(embSkewDir, 80, 64)
    val semSkewResults = Seq(
      rec("skew_dedup_semantic", semDedupTimes(embSkewDir, 80)),
      rec("skew_dedup_semantic_unblocked", Seq({
        val t0 = System.nanoTime()
        try { semDedupUnblockedOnce(embSkewDir, 80)
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] semskew unblocked: $e"); 1e9 }
      })),
      rec("skew_dedup_semantic_capped",
        semDedupCappedTimes(embSkewDir, 80, 64)))
    // Production-parameter IVFADC row (r16, the plan-literal-purge
    // done-criterion): nCells=256, m=16, k=256 on the x10 embeddings —
    // the parameter class where r15's typedlit cross-dot map (nCells·m·k
    // plan entries) exploded codegen; the broadcast cross-dot table makes
    // it a ~8 MB data question. min-of-2 (a completion-and-band probe,
    // like the uncapped skew contrast rows), warmed once.
    // r17: FAISS-style sampled codebook training (trainFraction) — the
    // Lloyd rounds (the honest bulk of the r16 51.6 s) run on a
    // deterministic 25% md5-fraction while the full corpus is still
    // assigned + encoded; the _sampled row is the production
    // configuration, the full-train row stays as the contrast.
    def ivfPqProd(dir: String, tf: Double, iters: Int) =
      graft.pipeline.Similarity.ivfPqTopK(
        spark.read.parquet(s"$dir/embeddings.parquet"),
        spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") % 100 === 0),
        topK = 5, nCells = 256, m = 16, k = 256, iters = iters, nProbe = 3,
        trainFraction = tf)
    def ivfPqProdOnce(dir: String, tf: Double, iters: Int = 1): Unit =
      ivfPqProd(dir, tf, iters)
        .write.format("noop").mode("overwrite").save()
    try ivfPqProdOnce(x10Dir, 0.25) // warm; guarded like every other warm pass
    catch { case e: Throwable => System.err.println(s"[bench] ivfpq prod warm: $e") }
    def ivfPqProdTimes(tf: Double, reps: Int, iters: Int = 1): Seq[Double] =
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        try { ivfPqProdOnce(x10Dir, tf, iters); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] ivfpq prod: $e"); 1e9 }
      }
    // r18 (#3): the depth contrast where Lloyd dominates. At iters=1 the
    // md5-fraction filter pass costs roughly what one Lloyd round saves
    // (r17 measured _sampled 4.90 vs full 4.39 s), so the trainFraction
    // knob shows nothing there. At production training depth (iters=4;
    // FAISS's own defaults run 10-25 rounds) codebook training is the
    // bulk of index-build cost — the regime the knob exists for. The
    // _deep_sampled fraction is 0.5, the FAISS training floor at THIS
    // corpus: k=256 codebooks want >= ~39·k ≈ 10k training points
    // (faiss's own min_points_per_centroid warning), and 0.5 of the 20k
    // x10 corpus sits exactly there — an r18 probe at 0.1 (2k points)
    // cost 6 recall points (12.5% vs 18.4% @5), the under-training the
    // floor exists to prevent. At deployment scale the floor is
    // trivially cleared (39·k of a billion-vector corpus is fraction
    // 1e-5), so trainFraction is a SCALE knob, not a small-corpus knob.
    // The warm passes double as the recall telemetry: recall@5 vs the
    // brute-force ground truth across the fraction ladder — sampling at
    // the floor must hold recall within noise of full training (raw set
    // agreement between variants is the WRONG metric: differently-
    // trained codebooks legitimately reorder a top-k whose tail cosines
    // tie near-exactly).
    def deepTopkSet(tf: Double): Set[(Long, Long)] =
      ivfPqProd(x10Dir, tf, iters = 4).select(col("qid"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    try {
      val brute = graft.pipeline.Similarity.bruteForceTopK(
        spark.read.parquet(s"$x10Dir/embeddings.parquet"),
        spark.read.parquet(s"$x10Dir/embeddings.parquet")
          .filter(col("vec_id") % 100 === 0), 5)
        .select(col("qid"), col("cid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(tf: Double): Double =
        (deepTopkSet(tf) & brute).size.toDouble / math.max(1, brute.size)
      System.err.println(f"[bench] ivfpq deep recall@5 vs brute force: " +
        f"full-train ${100 * recall(1.0)}%.1f%%, " +
        f"sampled(0.5, the 39·k floor) ${100 * recall(0.5)}%.1f%%, " +
        f"sampled(0.1, under the floor) ${100 * recall(0.1)}%.1f%%")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] ivfpq deep warm/recall: $e") }
    // r19 (verdict #3): the deep pair at reps=3 — the r18 min-of-2
    // direction flipped between the committed run and the driver's re-run
    // (6.832/7.851 vs 7.449/6.573), so min-of-2 cannot establish a timing
    // direction on this ~7 s row class. The per-row spread now published
    // alongside is the evidence either way: if the min±spread bands
    // overlap, the honest claim is "within run variance at this corpus".
    val ivfPqProdResults = Seq(
      rec("prod_embed_topk_ivfpq_sampled", ivfPqProdTimes(0.25, 2)),
      rec("prod_embed_topk_ivfpq", ivfPqProdTimes(1.0, 2)),
      rec("prod_embed_topk_ivfpq_deep_sampled",
        ivfPqProdTimes(0.5, 3, iters = 4)),
      rec("prod_embed_topk_ivfpq_deep", ivfPqProdTimes(1.0, 3, iters = 4)))
    // Streaming rows: every other row is batch; these measure the DSv2
    // tail source + stateful defragment + partitioned streaming sink at
    // 1× and 10× (corpora staged from the same sf/x10 documents; staging
    // excluded as fixture construction). One warm drain at the warm-up
    // scale pays the streaming plane's one-time codegen, like the batch
    // warm-up does.
    tailDrainSeconds(spark, stageTailCorpus(spark, warmDir, "warm"))
    // mult=30 per the round-11 finding (see stageTailCorpus): the drain
    // must be data-dominated before the 1×/x10 pair means anything. The
    // *_lines_per_sec rows carry the throughput number directly (the only
    // non-seconds rows in the map; the name is the unit).
    val tail1x = stageTailCorpus(spark, sfDir, "1x", mult = 30)
    val tail10x = stageTailCorpus(spark, x10Dir, "10x", mult = 30,
      contentKey = sfDir)
    val lines1x = spark.read.textFile(tail1x).count()
    val lines10x = spark.read.textFile(tail10x).count()
    // FIVE reps like the wide-noise batch rows: r12's published 10× drain
    // read 39% above an idle rerun (9.671 s vs 5.940 s) — min-of-3 still
    // let a steal window through on the longest-running row class
    val drain1xTimes = (0 until 5).map(_ => tailDrainSeconds(spark, tail1x))
    val drain10xTimes = (0 until 5).map(_ => tailDrainSeconds(spark, tail10x))
    val drain1x = drain1xTimes.min
    val drain10x = drain10xTimes.min
    // Streaming near-dup pair (r17): the tail drain's 1×/x10 device —
    // mult=10 suffix-disjoint replicas make the drain data-dominated
    // (see stageNearDupCorpus; at mult=1 both sides sat on the ~5 s
    // streaming fixed floor), banding is map-side, bucket state capped.
    neardupDrainSeconds(spark,
      stageNearDupCorpus(spark, warmDir, "warm", mult = 10))
    val nd1x = stageNearDupCorpus(spark, sfDir, "1x", mult = 10)
    val nd10x = stageNearDupCorpus(spark, x10Dir, "10x", mult = 10,
      contentKey = sfDir)
    val nd1xTimes = (0 until 3).map(_ => neardupDrainSeconds(spark, nd1x))
    val nd10xTimes = (0 until 3).map(_ => neardupDrainSeconds(spark, nd10x))
    val streamResults = Seq(
      rec("streaming_tail_e2e", drain1xTimes),
      rec("x10_streaming_tail_e2e", drain10xTimes),
      rec("streaming_neardup_e2e", nd1xTimes),
      rec("x10_streaming_neardup_e2e", nd10xTimes))
    // Deep-decode inference pair (r19): the registered llm_inference pair
    // is FIXED-COST-dominated (8-step decode over a 70-token context is
    // ~18k int64 mults per doc — far below the job floor at 50k docs, the
    // r13 dedup_substrings lesson), so the DATA-dominated scale evidence
    // for the inference plane is this pair: 512 greedy steps through the
    // KV-cached decode (the llama.cpp architecture — k/v projected once
    // per position, each step O(d² + n·d)) on the partition-batched
    // Exec.llmInference path. repartition(32) on BOTH sides: the sf
    // fixture is one row group, and without it the 1× side decodes on ONE
    // core while the staged x10 side gets ten — the r14 longdoc lesson
    // (the first cut of this pair measured 8.2 vs 8.6 s: pure parallelism
    // skew, not data cost). Greedy decode is prefix-stable (TinyLlmSpec),
    // so this measures the SAME model the oracle replays, just deeper.
    def llmDeepSeconds(dir: String): Double = {
      import spark.implicits._
      val t0 = System.nanoTime()
      try {
        // coalesce: a NULL text row must not surface as a null Dataset
        // element (the model guards empty, not null-from-concat)
        val users = spark.read.parquet(s"$dir/documents.parquet")
          .select(concat(lit("Input data (or flow file content):\n"),
            substring(coalesce(col("text"), lit("")), 1,
              graft.ops.TinyLlm.ContentWindow),
            lit("\n\nDescribe.")).as("u")).as[String]
          .repartition(32)
        graft.ops.Exec.llmInference(users,
            u => graft.ops.TinyLlm.render(
              graft.ops.TinyLlm.generate(u, steps = 512)._1))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch {
        // the 1e9 sentinel, same as substrTimes/semskew (r19 ADVICE): a
        // failed rep must be visible in BENCH_LATEST, not pass off its
        // partial wall time as a valid timing
        case e: Throwable =>
          System.err.println(s"[bench] llm deep: $e"); 1e9
      }
    }
    llmDeepSeconds(warmDir) // warm the shape (failures self-log + sentinel)
    val llmDeepResults = Seq(
      rec("llm_generate_deep", (0 until 3).map(_ => llmDeepSeconds(sfDir))),
      rec("x10_llm_generate_deep",
        (0 until 3).map(_ => llmDeepSeconds(x10Dir))))
    // throughput rows live in their own section with an explicit unit —
    // every row in `queries` is seconds, so round-over-round tooling can
    // no longer mix 1e6-lines/s values into a seconds comparison.
    // r20 (verdict #3): the NEARDUP pair gets a docs/s basis too — the
    // driver's post-commit rerun swung the trigger-drain WALL rows up to
    // 13× under machine load while compute rows stayed in band, so
    // cross-run comparisons of the streaming pairs should read the
    // work-normalized rate (each name carries its unit)
    val ndDocs1x = spark.read.parquet(s"$nd1x/documents.parquet").count()
    val ndDocs10x = spark.read.parquet(s"$nd10x/documents.parquet").count()
    val throughput = Seq(
      "streaming_tail_lines_per_sec" -> lines1x / drain1x,
      "x10_streaming_tail_lines_per_sec" -> lines10x / drain10x,
      "streaming_neardup_docs_per_sec" -> ndDocs1x / nd1xTimes.min,
      "x10_streaming_neardup_docs_per_sec" -> ndDocs10x / nd10xTimes.min)
    // total stays headline-only (round-over-round comparable); the skew_*,
    // x10_* and streaming rows ride along in the queries map for the
    // comparisons
    val extraResults = extra.map(name => rec(name, timesOfN(name, sfDir)))
    val allRows = results ++ skewResults ++ x10Results ++ longResults ++
      substrSkewResults ++ massDupResults ++ semResults ++ d4Results ++
      d4ReliableResults ++
      semSkewResults ++ ivfPqProdResults ++ streamResults ++
      llmDeepResults ++ extraResults
    val qs = allRows
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // per-row rep spread (verdict #4): min is the published point estimate
    // (same estimator as `queries`); med/max bound the band one idle run
    // actually spans, so a cross-run delta can be judged against it
    def median(ts: Seq[Double]): Double = {
      val s = ts.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val spread = repTimes.toSeq.map { case (k, ts) =>
      "\"" + k + "\":{" +
        f""""min":${ts.min}%.3f,"med":${median(ts)}%.3f,"max":${ts.max}%.3f,"reps":${ts.size}}"""
    }.mkString("{", ",", "}")
    val tp = throughput.map { case (k, v) => "\"" + k + f"\":$v%.0f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sumAll = allRows.map(_._2).sum
    val json = f"""{"metric":"headline_sum","value":$total%.3f,"unit":"sec","sum_all_rows":$sumAll%.3f,"queries":$qs,"spread":$spread,"throughput":{"unit":"per_sec (suffix carries the basis)","rows":$tp},"sf":"$sfDir"}"""
    // The driver's tail-capture window is smaller than this full ~6 KB
    // line — r15/r16/r17 all arrived HEAD-cut mid-JSON (BENCH_r{N}.json
    // parsed: null). So: print the full line early + persist it to
    // BENCH_LATEST.json (the canonical full row set), and make the LAST
    // printed line a compact summary JSON (total, sf, throughput, top-10
    // slowest rows) well under the ~2 KB window, so the driver's tail
    // always holds one complete parseable object.
    println(json)
    System.out.flush()
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LATEST.json"),
      (json + "\n").getBytes("UTF-8"))
    val top10 = allRows.sortBy(-_._2).take(10)
      .map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    // r19 (verdict #6): "value" stays the headline-subset sum (the stable
    // round-over-round unit); "sum_all_rows" is the sum over every row in
    // "rows", so the compact object reads correctly once parsed. With
    // `run / outputStrategy := StdoutOutput` in build.sbt (verdict #1) this
    // last line prints RAW — no sbt "[info] " prefix — so the driver's
    // per-line json.loads finally succeeds.
    val summary = f"""{"metric":"headline_sum","value":$total%.3f,"unit":"sec","sum_all_rows":$sumAll%.3f,"sf":"$sfDir","rows":${allRows.size},"full":"BENCH_LATEST.json","throughput":$tp,"top10":$top10}"""
    spark.stop()
    println(json); System.out.flush()
    println(summary)
    System.out.flush()
  }
}
