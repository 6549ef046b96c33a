package graft.operators

import graft.Tables
import graft.functions.TextOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` fixture (SURVEY.md §2.3):
  * token counting, quality scoring, language-ID heuristics, fingerprints.
  * All per-document work is narrow (no shuffle); only the final rollups
  * shuffle — linear at any scale.
  */
object TextAnalysis {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** English-ish stopword markers used by the heuristics. */
  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  private def stopCount(ws: Column): Column =
    size(filter_function_stub(ws))

  // `filter` the SQL function collides with Dataset.filter in scope; alias.
  private def filter_function_stub(ws: Column): Column =
    org.apache.spark.sql.functions.filter(ws,
      w => w.isInCollection(stopwords))

  // forward references to vals defined below — lazy avoids init-order NPE
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ shingleQueries

  private lazy val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token counting: whitespace tokens + alpha-token regex count.
    "tx01_token_counts" -> ((s, d) => {
      docs(s, d)
        .select(col("source"),
          size(tokens(col("text"))).as("n_ws_tokens"),
          regexp_count(col("text"), lit("[a-z]+")).as("n_alpha_tokens"),
          length(col("text")).as("n_chars_m"))
        .groupBy(col("source"))
        .agg(sum(col("n_ws_tokens")).as("sum_ws_tokens"),
          sum(col("n_alpha_tokens")).as("sum_alpha_tokens"),
          sum(col("n_chars_m")).as("sum_chars"),
          count(lit(1)).as("n_docs"))
    }),

    // Per-document quality scoring: length, mean word length, stopword
    // ratio, distinct-token ratio → composite score.
    "tx02_quality_scores" -> ((s, d) => {
      val t = docs(s, d).select(col("doc_id"), col("lang"),
        tokens(col("text")).as("ws"), length(col("text")).as("len"))
      t.select(col("doc_id"), col("lang"),
          size(col("ws")).as("n_tokens"),
          ((col("len") - size(col("ws")) + 1).cast("double") / size(col("ws")))
            .as("avg_word_len"),
          (stopCount(col("ws")).cast("double") / size(col("ws"))).as("stop_ratio"),
          (size(array_distinct(col("ws"))).cast("double") / size(col("ws")))
            .as("distinct_ratio"))
        .withColumn("quality",
          round(least(lit(1.0),
            (col("stop_ratio") * 2 + col("distinct_ratio")) *
              when(col("n_tokens") >= 20, 1.0).otherwise(0.5)), 6))
    }),

    // Language-ID heuristic (confusion matrix vs the labeled lang column):
    // stopword-marker ratio decides en vs other — the fixtures' text is
    // synthetic English-ish for every label, so the heuristic's behavior
    // (not its accuracy) is what's verified.
    "tx03_lang_id" -> ((s, d) => {
      val t = docs(s, d).select(col("lang"), tokens(col("text")).as("ws"))
      t.select(col("lang"),
          when(stopCount(col("ws")).cast("double") / size(col("ws")) >= 0.05, "en")
            .otherwise("other").as("predicted"))
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    }),

    // TF-IDF top terms per document (bounded subset). Scoring is the
    // log-free rational form cnt·N / (doclen·df) — log() is only
    // 1-ulp-accurate and differs between libm and Math.log, which would
    // break cross-engine hash equality; the pure product/quotient chain,
    // evaluated in the same order on both engines, is bit-exact. Shape:
    // one explode + three hash aggregations + broadcast-joined scalar.
    "tx06_tfidf" -> ((s, d) => {
      val toks = docs(s, d).filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("cnt"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("doclen"))
      val df = toks.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
      val nd = toks.agg(countDistinct(col("doc_id")).as("n"))
      val scored = tf.join(dl, "doc_id").join(df, "term")
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("term"),
          (col("cnt").cast("double") * col("n") / col("doclen") / col("df")).as("score"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.select(col("doc_id"), col("term"), col("score"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
    }),

    // Corpus-relative quality scoring (CCNet-style): a document's
    // common-token density = mean corpus frequency of its token
    // instances. Boilerplate scores high, rare-vocabulary docs low — the
    // corpus-statistics complement to tx02's intra-document ratios.
    // Numerics: the score is assembled from EXACT integer sums (token
    // instance counts) and divided once at the end — no float
    // accumulation, so the result is shuffle-order-independent and
    // engine-exact (the tx06 rational-scoring discipline). Shape: explode
    // → corpus tf agg → UNHINTED dictionary join (tx10's discipline: the
    // term-frequency table is vocabulary-sized — AQE broadcasts it while
    // small, shuffles on the token key at corpus scale; a hard hint would
    // die at the 8 GB broadcast cap) → per-doc integer sum → global
    // top-k (TakeOrderedAndProject). Linear at any scale.
    "tx08_common_token_density" -> ((s, d) => {
      val toks = docs(s, d).select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      val nTotal = toks.agg(count(lit(1)).as("n_total"))
      toks.join(tf, "tok")
        .groupBy(col("doc_id"))
        .agg(sum(col("cnt")).as("sum_cnt"), count(lit(1)).as("n_tok"))
        .crossJoin(broadcast(nTotal))
        .select(col("doc_id"),
          round(col("sum_cnt").cast("double")
            / (col("n_tok") * col("n_total")), 9).as("density"),
          col("n_tok"))
        .orderBy(col("density").desc, col("doc_id"))
        .limit(20)
    }),

    // Deterministic train/val/test split: rank docs per source by content
    // hash (md5 — identical in every engine, unlike rand()), cut at
    // 80/90%. The standard reproducible-split op for training pipelines:
    // assignment depends only on content, never on partitioning or run
    // order. Two window passes + a rollup; linear at any scale.
    // r12: the md5 rank rides Pipelines.groupPrefixScan (range-partition
    // two-level scan) instead of a per-source row_number window — the
    // old shape pulled EVERY doc of a source through one window task,
    // the serial bottleneck the prefix-scan primitive removes. The
    // doc_id tiebreak makes the Spark-side order total; the oracle
    // still ranks by md5 alone, which is sound because byte-identical
    // texts (the only possible md5 ties) carry identical n_chars, so
    // the per-(source, split) rollup is invariant to how a tie block
    // permutes across a split boundary. Source sizes come from the
    // scan's own max(cum) — the text is scanned ONCE.
    "tx07_hash_split" -> ((s, d) => {
      val keyed = docs(s, d).select(col("doc_id"), col("source"),
        col("n_chars"), md5(col("text").cast("binary")).as("h"))
      val ranked = Pipelines.groupPrefixScan(keyed, Seq("source"),
        Seq(col("h"), col("doc_id")), lit(1L))
      val counts = ranked.groupBy(col("source")).agg(max(col("cum")).as("cnt"))
      ranked.join(counts, Seq("source"))
        .select(col("source"), col("n_chars"),
          when((col("cum") - 1).cast("double") / col("cnt") < 0.8, "train")
            .when((col("cum") - 1).cast("double") / col("cnt") < 0.9, "val")
            .otherwise("test").as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),

    // Document fingerprinting: md5 content hash + per-source uniqueness.
    "tx04_fingerprints" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), col("source"),
          fingerprint(col("text")).as("fp"),
          substring(fingerprint(col("text")), 1, 8).as("fp_prefix"))
    }),

    // Repetition filtering (the Gopher/MassiveText repetition rules):
    // per-document max token frequency, duplicate-token coverage (how many
    // token instances belong to a token that repeats), and max bigram
    // frequency — the signals that gate boilerplate/spam out of a training
    // corpus. Shape: ZERO shuffle — each metric is a run-length fold over
    // the document's own sorted token/bigram array (functions.aggregate),
    // so the whole operator is map-side; at 100 TB it is a pure scan with
    // no exchange at all (the oracle computes the same metrics the
    // explode+groupBy way — two independent algorithms, one answer).
    "tx09_repetition" -> ((s, d) => {
      val ws = tokens(col("text"))
      val bg = org.apache.spark.sql.graft.TextSignatures.bigrams(ws)
      val tokStats = runLengthStats(sort_array(ws))
      val bgStats = runLengthStats(sort_array(bg))
      docs(s, d)
        .select(col("doc_id"),
          size(ws).cast("long").as("n_tokens"),
          size(array_distinct(ws)).cast("long").as("n_distinct"),
          tokStats.getField("max_run").cast("long").as("max_tok_freq"),
          tokStats.getField("dup_cov").cast("long").as("dup_coverage"),
          bgStats.getField("max_run").cast("long").as("max_bigram_freq"))
    }),

    // Boilerplate detection — tx09's INTER-document complement: how many
    // of a document's distinct bigrams also occur in OTHER docs of the
    // same source? Crawl boilerplate (nav bars, footers, templates)
    // repeats across a source's pages; novel prose doesn't. Pure integer
    // outputs (shared/total distinct bigrams), top-20 most templated
    // docs. Shape: distinct (source, bigram, doc) → per-(source, bigram)
    // doc frequency → join back on the SAME key (the dictionary is
    // corpus-sized, never broadcastable at 100 TB — unhinted, the join
    // co-partitions with the aggregation's exchange, and AQE still
    // broadcasts when the dictionary happens to be small) → per-doc
    // integer sums → global top-k (TakeOrderedAndProject). Linear.
    // LM COVERAGE SCORING — the CCNet/KenLM-shaped quality tier: score
    // held-out documents against n-gram statistics TRAINED on a reference
    // corpus (here the deterministic doc_id % 10 != 0 slice; production
    // swaps in Wikipedia). A fluent in-domain doc has high unigram
    // coverage (its tokens exist in the reference vocabulary) and high
    // bigram coverage (its transitions were seen in reference text);
    // gibberish and out-of-domain text score low on the second even when
    // the first is high — the signal CCNet's perplexity filter extracts,
    // here in exact-integer form (known-gram counts + one final division,
    // the tx06/tx08 rational-scoring discipline — no log(), which is only
    // 1-ulp accurate and breaks cross-engine hash equality).
    //
    // Scale design: the reference vocab and bigram dictionaries are
    // corpus-sized — both joins UNHINTED (tx10's discipline: AQE
    // broadcasts them while small, hash-shuffles on the gram key at 100
    // TB). Everything else is map-side explode + per-doc integer sums;
    // linear at any scale.
    "tx11_lm_coverage" -> ((s, d) => {
      val bg = org.apache.spark.sql.graft.TextSignatures.bigrams _
      val t = docs(s, d).select(col("doc_id"), tokens(col("text")).as("ws"))
      val train = t.filter(col("doc_id") % 10 =!= 0)
      val test = t.filter(col("doc_id") % 10 === 0)
      val vocab = train.select(explode(col("ws")).as("tok")).distinct()
        .withColumn("kt", lit(1L))
      val trainBg = train.select(explode(bg(col("ws"))).as("bg")).distinct()
        .withColumn("kb", lit(1L))
      val tokStats = test.select(col("doc_id"), explode(col("ws")).as("tok"))
        .join(vocab, Seq("tok"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          sum(coalesce(col("kt"), lit(0L))).as("known_tok"))
      val bgStats = test.select(col("doc_id"), explode(bg(col("ws"))).as("bg"))
        .join(trainBg, Seq("bg"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bg"),
          sum(coalesce(col("kb"), lit(0L))).as("known_bg"))
      tokStats.join(bgStats, "doc_id")
        .select(col("doc_id"), col("n_tok").as("n_tokens"),
          round(col("known_tok").cast("double") / col("n_tok"), 6).as("token_cov"),
          round(col("known_bg").cast("double") / col("n_bg"), 6).as("bigram_cov"))
    }),

    "tx10_boilerplate" -> ((s, d) => {
      val bgs = docs(s, d)
        .select(col("source"), col("doc_id"),
          explode(array_distinct(
            org.apache.spark.sql.graft.TextSignatures.bigrams(tokens(col("text")))))
            .as("bg"))
      val df = bgs.groupBy(col("source"), col("bg"))
        // rows are already distinct in (source, bg, doc_id) — the
        // array_distinct upstream guarantees it — so a plain count equals
        // countDistinct(doc_id) without the extra distinct-agg pass
        .agg(count(lit(1)).as("ndocs"))
      bgs.join(df, Seq("source", "bg"))
        .groupBy(col("source"), col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"))
        .orderBy(col("n_shared").desc, col("doc_id"))
        .limit(20)
    })
  )

  /** Fold a SORTED array into (longest run, total elements in runs > 1) —
    * equal values are adjacent after the sort, so one linear pass gives
    * exact per-value frequencies without exploding the array into rows.
    * The map-side kernel behind tx09's repetition metrics. */
  private def runLengthStats(sorted: Column): Column =
    aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0).as("run"),
        lit(0).as("mx"), lit(0).as("cov")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1)
          .otherwise(lit(1))
        // closing a run of length > 1 adds its length to the coverage
        val cov = when(x === st.getField("prev"), st.getField("cov"))
          .otherwise(st.getField("cov") +
            when(st.getField("run") > 1, st.getField("run")).otherwise(lit(0)))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("mx"), run).as("mx"), cov.as("cov"))
      },
      st => struct(
        st.getField("mx").as("max_run"),
        (st.getField("cov") +
          when(st.getField("run") > 1, st.getField("run")).otherwise(lit(0)))
          .as("dup_cov")))

  private val stopList = stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Character 3-gram (shingle) Jaccard near-dup pairs on a bounded subset:
    * the n-gram-level complement of the word-set family — robust to
    * whitespace/token boundary edits. Shingles hash to sorted long sets
    * (strings touched once); merge-walk Jaccard verifies. Spark `sequence`
    * REVERSES when stop < start, so short docs are filtered out before
    * shingling on both engines. */
  private lazy val shingleQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tx05_shingle_jaccard" -> ((s, d) => {
      val sh = transform(sequence(lit(1), length(col("text")) - 2),
        i => col("text").substr(i, lit(3)))
      val w = docs(s, d)
        .filter(col("doc_id") < 200 && length(col("text")) >= 3)
        .select(col("doc_id"), tokenSetHashes(sh).as("shs"))
      val a = w.select(col("doc_id").as("a_id"), col("shs").as("a_shs"))
      val b = w.select(col("doc_id").as("b_id"), col("shs").as("b_shs"))
      a.join(b, col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          jaccardLong(col("a_shs"), col("b_shs")).as("jac"))
        .filter(col("jac") >= 0.6)
    })
  )

  val oracles: Map[String, String] = Map(
    // same split, same gram equivalence classes (space-joined bigrams over
    // space-split tokens are injective — tokens cannot contain spaces),
    // same integer sums + single final rounded division
    "tx11_lm_coverage" -> """
      WITH sp AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           tr AS (SELECT ws FROM sp WHERE doc_id % 10 <> 0),
           te AS (SELECT doc_id, ws FROM sp WHERE doc_id % 10 = 0),
           vocab AS (SELECT DISTINCT UNNEST(ws) AS tok FROM tr),
           trbg AS (SELECT DISTINCT UNNEST(list_transform(range(2, LEN(ws) + 1),
                      i -> ws[i - 1] || ' ' || ws[i])) AS bg FROM tr),
           tetok AS (SELECT doc_id, UNNEST(ws) AS tok FROM te),
           tebg AS (SELECT doc_id, UNNEST(list_transform(range(2, LEN(ws) + 1),
                      i -> ws[i - 1] || ' ' || ws[i])) AS bg FROM te),
           ts AS (SELECT t.doc_id, COUNT(*) AS n_tok,
                         CAST(SUM(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS known_tok
                  FROM tetok t LEFT JOIN vocab v ON t.tok = v.tok
                  GROUP BY t.doc_id),
           bs AS (SELECT t.doc_id, COUNT(*) AS n_bg,
                         CAST(SUM(CASE WHEN b.bg IS NOT NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS known_bg
                  FROM tebg t LEFT JOIN trbg b ON t.bg = b.bg
                  GROUP BY t.doc_id)
      SELECT ts.doc_id, CAST(ts.n_tok AS BIGINT) AS n_tokens,
             ROUND(CAST(known_tok AS DOUBLE) / ts.n_tok, 6) AS token_cov,
             ROUND(CAST(known_bg AS DOUBLE) / bs.n_bg, 6) AS bigram_cov
      FROM ts JOIN bs ON ts.doc_id = bs.doc_id""",

    // independent algorithm: explode + per-(doc,token) counts vs the Spark
    // side's map-only run-length fold — same integers either way
    "tx09_repetition" -> """
      WITH sp AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
           toks AS (SELECT doc_id, UNNEST(ws) AS tok FROM sp),
           tf AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
           tstats AS (
             SELECT doc_id,
                    CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                    CAST(COUNT(*) AS BIGINT) AS n_distinct,
                    CAST(MAX(cnt) AS BIGINT) AS max_tok_freq,
                    CAST(COALESCE(SUM(cnt) FILTER (WHERE cnt > 1), 0) AS BIGINT)
                      AS dup_coverage
             FROM tf GROUP BY 1),
           bgs AS (SELECT doc_id,
                          UNNEST(list_transform(range(2, LEN(ws) + 1),
                            i -> ws[i - 1] || ' ' || ws[i])) AS bigram
                   FROM sp),
           bf AS (SELECT doc_id, bigram, COUNT(*) AS cnt FROM bgs GROUP BY 1, 2),
           bstats AS (SELECT doc_id, CAST(MAX(cnt) AS BIGINT) AS max_bigram_freq
                      FROM bf GROUP BY 1)
      SELECT t.doc_id, t.n_tokens, t.n_distinct, t.max_tok_freq,
             t.dup_coverage, COALESCE(b.max_bigram_freq, 0) AS max_bigram_freq
      FROM tstats t LEFT JOIN bstats b USING (doc_id)""",

    "tx10_boilerplate" -> """
      WITH bgs AS (
        SELECT DISTINCT source, doc_id,
               UNNEST(list_transform(range(2, LEN(string_split(text, ' ')) + 1),
                 i -> string_split(text, ' ')[i - 1] || ' '
                      || string_split(text, ' ')[i])) AS bg
        FROM documents),
           df AS (
        SELECT source, bg, COUNT(DISTINCT doc_id) AS ndocs
        FROM bgs GROUP BY 1, 2)
      SELECT b.source, b.doc_id,
             COUNT(*) AS n_bigrams,
             CAST(SUM(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared
      FROM bgs b JOIN df USING (source, bg)
      GROUP BY 1, 2
      ORDER BY n_shared DESC, doc_id
      LIMIT 20""",

    // integer sums + single final division mirror the Spark side exactly
    "tx08_common_token_density" -> """
      WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        FROM documents),
      tf AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
      nt AS (SELECT COUNT(*) AS n_total FROM toks),
      per_doc AS (
        SELECT t.doc_id,
               CAST(SUM(tf.cnt) AS BIGINT) AS sum_cnt,
               COUNT(*) AS n_tok
        FROM toks t JOIN tf USING (tok)
        GROUP BY t.doc_id)
      SELECT doc_id,
             ROUND(CAST(sum_cnt AS DOUBLE) / (n_tok * nt.n_total), 9) AS density,
             n_tok
      FROM per_doc, nt
      ORDER BY density DESC, doc_id
      LIMIT 20""",

    "tx05_shingle_jaccard" -> """
      WITH w AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, LENGTH(text) - 1),
                 i -> SUBSTRING(text, i, 3))) AS sh
        FROM documents
        WHERE doc_id < 200 AND LENGTH(text) >= 3)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
               / (LEN(a.sh) + LEN(b.sh) - LEN(list_intersect(a.sh, b.sh))) AS jac
      FROM w a JOIN w b ON a.doc_id < b.doc_id
      WHERE CAST(LEN(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / (LEN(a.sh) + LEN(b.sh) - LEN(list_intersect(a.sh, b.sh))) >= 0.6""",

    "tx06_tfidf" -> """
      WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
        FROM documents WHERE doc_id < 100),
           tf AS (SELECT doc_id, term, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
           dl AS (SELECT doc_id, COUNT(*) AS doclen FROM toks GROUP BY 1),
           df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
           nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM toks),
           scored AS (
        SELECT tf.doc_id, tf.term,
               CAST(tf.cnt AS DOUBLE) * nd.n / dl.doclen / df.df AS score
        FROM tf JOIN dl USING (doc_id) JOIN df USING (term) CROSS JOIN nd),
           ranked AS (
        SELECT doc_id, term, score,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, term) AS rk
        FROM scored)
      SELECT doc_id, term, score, rk FROM ranked WHERE rk <= 3""",

    "tx07_hash_split" -> """
      WITH r AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text)) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS cnt
        FROM documents),
           s AS (
        SELECT source, n_chars,
               CASE WHEN CAST(rk - 1 AS DOUBLE) / cnt < 0.8 THEN 'train'
                    WHEN CAST(rk - 1 AS DOUBLE) / cnt < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM r)
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM s
      GROUP BY 1, 2""",

    "tx01_token_counts" -> """
      SELECT source,
             CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS sum_ws_tokens,
             CAST(SUM(LEN(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS sum_alpha_tokens,
             CAST(SUM(LENGTH(text)) AS BIGINT) AS sum_chars,
             COUNT(*) AS n_docs
      FROM documents
      GROUP BY source""",

    "tx02_quality_scores" -> s"""
      WITH t AS (
        SELECT doc_id, lang, string_split(text, ' ') AS ws, LENGTH(text) AS len
        FROM documents),
           m AS (
        SELECT doc_id, lang,
               LEN(ws) AS n_tokens,
               CAST(len - LEN(ws) + 1 AS DOUBLE) / LEN(ws) AS avg_word_len,
               CAST(LEN(list_filter(ws, w -> list_contains($stopList, w))) AS DOUBLE)
                 / LEN(ws) AS stop_ratio,
               CAST(LEN(list_distinct(ws)) AS DOUBLE) / LEN(ws) AS distinct_ratio
        FROM t)
      SELECT doc_id, lang, n_tokens, avg_word_len, stop_ratio, distinct_ratio,
             ROUND(LEAST(1.0,
               (stop_ratio * 2 + distinct_ratio) *
                 (CASE WHEN n_tokens >= 20 THEN 1.0 ELSE 0.5 END)), 6) AS quality
      FROM m""",

    "tx03_lang_id" -> s"""
      WITH t AS (SELECT lang, string_split(text, ' ') AS ws FROM documents)
      SELECT lang,
             CASE WHEN CAST(LEN(list_filter(ws, w -> list_contains($stopList, w))) AS DOUBLE)
                       / LEN(ws) >= 0.05
                  THEN 'en' ELSE 'other' END AS predicted,
             COUNT(*) AS n_docs
      FROM t
      GROUP BY 1, 2""",

    "tx04_fingerprints" -> """
      SELECT doc_id, source,
             md5(TRIM(LOWER(text))) AS fp,
             SUBSTRING(md5(TRIM(LOWER(text))), 1, 8) AS fp_prefix
      FROM documents"""
  )
}
