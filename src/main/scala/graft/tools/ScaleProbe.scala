package graft.tools

import graft.{GraftSession, SparkEntry, Tables}
import org.apache.spark.shuffle.cloud.ShuffleMetricsTap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One data point beyond sf0.1 on the scaling curve (VERDICT r5 item 8):
  * derive an sf1-shaped tier by replicating the sf0.1 FACT tables 10×
  * with shifted keys (dimensions stay fixed — dimension fan-in grows,
  * which is the conservative direction for join cost), write it as
  * parquet under /tmp, and run the SHIPPED heavy queries against the
  * derived dir (`Tables.load` only sees a path, so the query code is
  * byte-identical to what the bench runs). Documents replicate with
  * identical text on purpose: a corpus where every page has 10 exact
  * copies is precisely the regime dd12's exact-collapse exists for.
  *
  * Prints one line per query: wall seconds + shuffle bytes (tap over the
  * plugin-fed task metrics). Run:
  *   sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {

  private val Src = "/root/testdata/sf0.1"
  private val Dst = "/tmp/graft-sf1"
  private val DstP = "/tmp/graft-sf1p"

  /** 10 copies of `df` with `keys` shifted by copy·stride (joint keys
    * shift together across tables, so joins stay valid). */
  private def rep10(df: DataFrame, keys: Seq[String], stride: Long): DataFrame =
    (0 until 10).map { i =>
      keys.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * stride)))
    }.reduce(_ unionAll _)

  private def build(s: SparkSession): Unit = {
    // flag renamed when the tier's contents changed (r10 added the
    // replicated embeddings) so a stale /tmp tier rebuilds
    val done = new java.io.File(s"$Dst/_built_r10")
    if (done.exists()) return
    val stride = 100000000L
    def w(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$Dst/$name.parquet")
    // facts ×10; the orderkey shift is shared by lineitem and orders so
    // the order join keeps its 1:n shape
    w("lineitem", rep10(Tables.load(s, Src, "lineitem"), Seq("l_orderkey"), stride))
    w("orders", rep10(Tables.load(s, Src, "orders"), Seq("o_orderkey"), stride))
    w("events", rep10(Tables.load(s, Src, "events"), Seq("event_id"), stride))
    w("documents", rep10(Tables.load(s, Src, "documents"), Seq("doc_id"), stride))
    // embeddings ×10 with shifted ids (r10, for the ss10 probe): the
    // query set stays the original vec_id < 10, the candidate corpus
    // grows 10× — the linear regime of a serving shortlist search
    w("embeddings", rep10(Tables.load(s, Src, "embeddings"), Seq("vec_id"), stride))
    // dimensions verbatim
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      w(t, Tables.load(s, Src, t))
    done.createNewFile()
    ()
  }

  /** r11 (VERDICT r10 item 3): the ×10 EXACT-copy corpus saturates the
    * text operators' worst case (every dd16 window fingerprint occurs
    * ≥10×, pp08's gate drops every doc) — the right COST probe, but it
    * leaves the novel-corpus regime unmeasured beyond sf0.1. This tier
    * replicates documents ×10 with PERTURBED text (the dd13 planted-twin
    * discipline): copy 0 is the original; copies 1-9 deterministically
    * rewrite every 16th token (offset rotates with the copy index) so each
    * copy is a ~94%-similar NEAR-dup twin — new window fingerprints for
    * dd16, new chunk hashes for pp07, a grown novel vocabulary for tx11.
    * Only documents.parquet is written: the probed queries read nothing
    * else, and Tables.load resolves per table.
    */
  private def buildPerturbed(s: SparkSession): Unit = {
    val done = new java.io.File(s"$DstP/_built_r11")
    if (done.exists()) return
    val stride = 100000000L
    val copies = (0 until 10).map { i =>
      val base = Tables.load(s, Src, "documents")
        .withColumn("doc_id", col("doc_id") + lit(i * stride))
      if (i == 0) base
      else base.withColumn("text", array_join(
        transform(split(col("text"), " "),
          (t, j) => when(pmod(j + lit(i * 7), lit(16)) === 0,
            concat(t, lit("x"), lit(i))).otherwise(t)), " "))
    }
    copies.reduce(_ unionAll _).write.mode("overwrite")
      .parquet(s"$DstP/documents.parquet")
    done.createNewFile()
    ()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val tap = new ShuffleMetricsTap(spark.sparkContext)
    build(spark)
    // r7 (VERDICT r6 stretch): the dedup family end-to-end one decade
    // right — the replicated corpus (every page ×10 exact copies) is the
    // regime the exact-collapse front end exists for, so the growth
    // numbers measure the shipped pipeline under its own design premise
    val queries = Seq("q01_pricing_summary", "q05_regional_revenue",
      "q38_rollup_rank", "dd01_exact_dedup", "dd04_minhash_lsh_pairs",
      "dd07_prefix_join", "dd09_dup_components", "dd12_dedup_clusters",
      // r7 additions: the alternate component strategy and the
      // packing/gating stages (documents-based, so they ride the ×10
      // replicated corpus; pp05's benchmark slice inherits 10 exact
      // copies of every benchmark doc — the worst case for the
      // contamination join's hit rate)
      "dd15_cc_star", "pp04_pack_sequences", "pp05_decontaminate",
      "pp06_mixture_sample",
      // r10 additions: span-level dedup + chunking + LM scoring + MMR
      // serving. On the exact-copy ×10 corpus every window fingerprint
      // occurs ≥ 10× so dd16 saturates to coverage 1 and pp08's gate
      // drops every doc — the maximal-duplication worst case for their
      // join/agg volume, which is exactly what a cost probe should
      // measure (the novel-corpus regime is the sf0.1 column). ss10
      // rides the replicated embeddings: same 10 queries, 10× corpus.
      "dd16_substr_dedup", "pp07_chunk_overlap", "pp08_span_clean_chunks",
      "tx11_lm_coverage", "ss10_mmr_diversify",
      // r11: the bucketed rank-locate percentile one decade right — the
      // r10 sort-based shape's ×10 cold run was 23 s (each group's sort
      // serialized through one task); the rank-locate bound is scans +
      // sliver-sized bucket sorts
      "q35_percentiles", "q37_approx_sketches",
      // r12: token-budget selection. The exact-copy ×10 corpus is also
      // pp09's TIE regime — every replica scores the identical quality,
      // so the order key degenerates toward the doc_id tiebreak, the
      // case the range-partitioned two-level scan exists for (a quality
      // banding would serialize here; SkewSpec's tie bomb is the
      // unit-scale twin of this probe row)
      "pp09_token_budget_select",
      // r12 (late): the other two riders of the shared groupPrefixScan
      // primitive — weight-1 ranks over 8 md5 shards (pp12) and the
      // rebased per-source md5-rank split (tx07, whose exact-copy tier
      // is its TIE regime: every text's md5 repeats ×10, so rank order
      // inside a tie block is pure doc_id tiebreak)
      "pp12_shard_order", "tx07_hash_split",
      // r12 (late): DSIR importance selection. Exact-copy ×10 keeps the
      // bucket table at O(B)=4096 rows while the gram stream grows 10× —
      // the probe measures the map-side explode + broadcast lookup at
      // 10× gram volume with the weight/threshold exchanges pinned to
      // bucket/histogram size (the scale claim: corpus shuffles carry
      // ids+ints, never grams)
      "pp14_dsir_select",
      // r12 (session 2): the four late-round operators. tx13/tx12 are the
      // type-table scale demos — exact-copy ×10 multiplies every word and
      // bigram FREQUENCY by 10 while the type tables stay byte-identical,
      // so BPE rounds and KN marginals should be ~flat one decade right
      // (the Sennrich type-table argument, measured). dd17 rides the
      // dd12 artifact already built by this lane (clusters grow to ≥10
      // members — every original singleton becomes a 10-copy cluster,
      // the op's own design regime). ss11's corpus grows 10× in both
      // lanes (postings + brute-force vector); the fusion tail stays
      // O(queries·40) by construction
      "tx12_kn_lm_stats", "tx13_bpe_merges", "dd17_soft_dedup_sample",
      "ss11_hybrid_rrf",
      // r12 (session 2b): the quality gate is pure map + K-row rollup
      // (should be ~flat); BPE encode adds the corpus-tokens dictionary
      // join on top of tx13's flat training (linear in tokens, type
      // table unchanged on the exact-copy tier)
      "tx14_rule_cascade", "tx15_bpe_encode",
      // r13 (VERDICT r12 item 4): the late-r12 ops with no decade row.
      // pp10/pp13/pp15/pp16 are groupPrefixScan/rollup riders (~linear);
      // ss12 composes the two ANN lanes; ss14 is the double-index serve
      // (per-request work should stay ~FLAT one decade right — both
      // index reads prune to the request's buckets; the build costs ride
      // the first rep and fall out of the median); mm03/mm06 decode the
      // STAGED GIF corpus (r13: payloads materialize once per tier, so
      // these rows finally measure the decode path alone); cl03/cl04's
      // gated entries carry a vec_id < 1000 ground-truth cap, so their
      // rows here are flat BY CONSTRUCTION (same 1000 ids selected at
      // every tier — the artifact notes say so); the real DBSCAN growth
      // row is the uncapped machinery lane below
      "pp10_denylist_scrub", "pp13_source_upsample", "pp15_dataset_card",
      "pp16_curriculum_order", "ss12_ann_recall_report",
      "ss14_hybrid_index_serve", "mm03_frame_sample", "mm06_scene_change",
      "cl03_dbscan", "cl04_dbscan_blocked",
      // r13: the streaming hybrid drains ride the batch lane here (their
      // construction runs the full drain inside the timed block; the
      // BENCH_STREAM sf1 lane remains the canonical streaming decade).
      // ss15 is the double-index twin — its row should be ~flat like
      // ss14's (request-proportional serve against pruned indexes)
      "ss13_stream_hybrid_serve", "ss15_stream_index_serve")
    buildPerturbed(spark)
    // the text-operator lane runs on BOTH ×10 regimes: exact-copy (their
    // saturation worst case, inside `queries` below) and perturbed
    // near-dup twins (the novel-corpus regime — new fingerprints, grown
    // vocabulary, gate keeps most docs)
    val perturbedQueries = Seq("dd16_substr_dedup", "pp07_chunk_overlap",
      "pp08_span_clean_chunks", "tx11_lm_coverage",
      // r12: the perturbed twins score DIFFERENT qualities (every 16th
      // token rewritten moves the distinct-token ratio), so this lane
      // is pp09's spread-key regime — the pair of rows brackets both
      // ends of the quality-tie spectrum
      "pp09_token_budget_select",
      // r12: the perturbed twins mint NEW bigrams (every 16th token
      // rewritten), so this lane is pp14's score-spread regime — the
      // score histogram grows toward distinct-per-doc, the worst case
      // for the threshold scan's input (still O(distinct scores), never
      // O(corpus) in one task)
      "pp14_dsir_select",
      // r12 (session 2): the perturbed twins MINT new word and bigram
      // types (every 16th token rewritten), so this lane is the
      // vocabulary-GROWTH regime for the type-table pair — tx12's
      // marginals and tx13's per-round pair table grow with the minted
      // vocabulary (bounded by type count, never corpus tokens)
      "tx12_kn_lm_stats", "tx13_bpe_merges",
      // the perturbed twins change quality signals (tx14's gate sees
      // spread inputs) and mint new word types (tx15's dictionary grows)
      "tx14_rule_cascade", "tx15_bpe_encode",
      // r13 (VERDICT r12 item 4): dd07's missing perturbed-tier row —
      // the NOVEL-corpus regime where prefix blocking actually prunes
      // (the exact-copy row is output-bound quadratic by design; see
      // the artifact note)
      "dd07_prefix_join",
      // r14 (VERDICT r13 item 4): dd04 is named as dd07's SCALE PATH in
      // the exact-copy note, but its only decade row was that exact-copy
      // tier (×7.6, output-bound like dd07's). The multiplicity-1
      // perturbed row shows the banded blocking's pruning regime as a
      // number — same fixture as dd07's perturbed row, directly
      // comparable
      "dd04_minhash_lsh_pairs")
    // tier names are the artifact's stable keys; the dirs ride alongside
    // so a reader can reproduce any row
    val Src001 = "/root/testdata/sf0.01"
    val tierOf = Map(Src -> "sf0.1", Dst -> "sf1_exact",
      DstP -> "sf1_perturbed", Src001 -> "sf0.01")
    val jsonRows = Seq.newBuilder[String]
    def probe(dir: String, name: String,
        fn: Option[(SparkSession, String) => DataFrame] = None): Unit = {
      val mk = fn.getOrElse(SparkEntry.queries(name))
      // median-of-3 (r12): the r11 single-run numbers mixed first-query
      // JVM/codegen warmup and end-of-session GC pressure into the decade
      // columns (measured: dd16 on the perturbed tier read 17.5 s single
      // vs 4.5 s warm median in a fresh session) — unusable as the
      // mechanical diff baseline the artifact exists to be. Same protocol
      // as Bench; shuffle bytes are deterministic per plan, recorded from
      // the median rep's pass.
      var rows = -1L
      val walls = (1 to 3).map { i =>
        System.gc()
        tap.harvest()
        val t0 = System.nanoTime()
        // noop write, not count(): see Bench — a stacked count()
        // re-optimizes and can delete the operator under test (dd16/pp05's
        // final audit-table left joins). Row counts ride rep 1 as an
        // OBSERVED metric (ADVICE r13: the former separate count() was a
        // fourth full execution of the pipeline — for the uncapped DBSCAN
        // lanes, a fourth run of the candidate join): CollectMetrics is a
        // pass-through accumulator node, so rep 1's plan and cost are the
        // query's own, and join elimination never enters.
        val df = mk(spark, dir)
        val obs = if (i == 1) Some(org.apache.spark.sql.Observation()) else None
        val out = obs.map(o => df.observe(o, count(lit(1)).as("n"))).getOrElse(df)
        out.write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val (wb, rb) = tap.harvest()
        obs.foreach(o => rows = o.get.apply("n").asInstanceOf[Long])
        (sec, wb, rb)
      }
      val (sec, wb, rb) = walls.sortBy(_._1).apply(1)
      println(f"SCALEPROBE $dir $name rows=$rows wall=$sec%.2f s " +
        f"shuffle_w=${wb / 1e6}%.1f MB shuffle_r=${rb / 1e6}%.1f MB")
      jsonRows += f"""{"tier":"${tierOf(dir)}","query":"$name","rows":$rows,""" +
        f""""wall_s":$sec%.2f,"shuffle_w_mb":${wb / 1e6}%.1f,""" +
        f""""shuffle_r_mb":${rb / 1e6}%.1f}"""
    }
    for (dir <- Seq(Src, Dst); name <- queries) probe(dir, name)
    for (name <- perturbedQueries) probe(DstP, name)
    // r13: the uncapped DBSCAN machinery on the sf0.01→sf0.1 decade
    // (real fixtures, 500 → 5000 vectors) — the growth row the capped
    // gated entries cannot provide. sf1_exact is deliberately skipped:
    // ×100 candidate growth on 50k vectors would dominate the whole
    // probe run for a number the sf0.01→sf0.1 decade already states.
    for (dir <- Seq(Src001, Src))
      probe(dir, "cl04_blocked_uncapped",
        Some(graft.operators.Clustering.dbscanBlockedUncapped))
    // r14 (VERDICT r13 item 1): the bounded-degree kNN-graph tier's
    // growth lane — corpus-sized bucketing (knnBitsFor) holds candidate
    // volume at O(n log n), so unlike cl04's lane this one AFFORDS the
    // sf1 tier (20k vectors = a ×100 pair-volume decade cl04 would spend
    // the whole probe run on): three tiers, 500 → 2000 → 20000 vectors
    for (dir <- Seq(Src001, Src, Dst))
      probe(dir, "cl05_knn_uncapped",
        Some(graft.operators.Clustering.dbscanKnnUncapped))
    // growth expectations a reader needs to judge the rows (VERDICT r12
    // item 4: the dd07 ×35 decade number must read as explained, not as
    // a regression)
    val notes = Seq(
      "dd07_prefix_join@sf1_exact" ->
        ("output-bound quadratic BY CONSTRUCTION: exact pair enumeration's " +
          "output grows with duplicate multiplicity^2 (x10 exact copies => " +
          "x100 verified pairs per original pair); dd04's banded blocking " +
          "is the scale path, and the perturbed-tier row (novel twins, " +
          "multiplicity 1) is the pruning regime"),
      "cl03_dbscan@sf1_exact" ->
        ("flat by construction: the gated ground-truth tier caps at " +
          "vec_id < 1000, selecting the same rows at every tier; growth " +
          "lives in cl04_blocked_uncapped"),
      "cl04_dbscan_blocked@sf1_exact" ->
        ("flat by construction (same vec_id < 1000 cap as cl03); see " +
          "cl04_blocked_uncapped for the machinery's growth"),
      "cl04_blocked_uncapped@sf0.1" ->
        ("~quadratic candidate volume by design at eps=0.35 (the dd08 " +
          "lesson: low-threshold LSH buys join shape and a ~2.4x " +
          "constant, not an asymptotic cut); the fixture pair is a x4 " +
          "vector count (500 -> 2000 = x16 pair volume) across the " +
          "sf0.01 -> sf0.1 tier decade; cl05_knn_uncapped is the " +
          "subquadratic production shape"),
      "cl05_knn_uncapped@sf1_exact" ->
        ("the bounded-degree tier's growth claim as numbers: knnBitsFor " +
          "sizes LSH buckets to the corpus (bits = ceil(log2(n/24))), so " +
          "candidate volume is O(n log n) and the decomposition consumes " +
          "<= k edges per point — compare wall growth against pair " +
          "volume x100 from sf0.1 (2000 -> 20000 vectors); recall at " +
          "fixed tables decays as bits grow (SCALE.md section 3 states " +
          "the tables-for-recall trade this lane deliberately does not " +
          "pay)"),
      "dd04_minhash_lsh_pairs@sf1_perturbed" ->
        ("the pruning regime for the op named as dd07's scale path: " +
          "multiplicity-1 near-dup twins (no x100 output explosion), so " +
          "the row measures the banded blocking itself — compare " +
          "against the exact-copy tier's output-bound row"),
      "ss14_hybrid_index_serve@sf1_exact" ->
        ("serve-time work is request-proportional (both lanes read " +
          "partition-pruned indexes); residual growth is the one-time " +
          "per-tier index builds riding the first rep plus bigger pruned " +
          "buckets"))
      .map { case (k, v) => s""""$k":"$v"""" }.mkString(",")
    // the versioned machine-readable copy (VERDICT r11 item 4): the
    // SCALE.md decade tables were hand-transcribed single runs — this
    // file is what the next round diffs mechanically, and what
    // scripts/scale_table.py renders the markdown tables from.
    val json = s"""{"metric":"scaleprobe","method":"median3-noop-action",""" +
      s""""tiers":{"sf0.01":"$Src001","sf0.1":"$Src","sf1_exact":"$Dst",""" +
      s""""sf1_perturbed":"$DstP"},"notes":{$notes},""" +
      s""""rows":[${jsonRows.result().mkString(",")}]}"""
    val out = java.nio.file.Paths.get("target/scaleprobe.json")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
