package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: tokenization, corpus
  * stats, quality scoring, language ID (stopword-hit heuristic).
  *
  * All operators are pure projections + one aggregation — no UDFs, only
  * codegen'd `functions._` (higher-order array functions), so they stay
  * inside WholeStageCodegen and scale linearly with no extra shuffles:
  * per-document scores are map-side only; the per-language rollups shuffle
  * once on the (low-cardinality) lang key with partial aggregation.
  */
object TextQueries {
  import QueryDsl._

  /** Whitespace tokens with empties dropped (parity with oracle list_filter). */
  private def toks(c: Column): Column = filter(split(c, " "), t => t =!= "")

  /** Distinct 3-token shingles of a `tk` token-array column — THE
    * decontamination unit shared by p01 (eval holdout), t26 (severity
    * audit) and p03 (ingest filter): the three queries' cross-claims
    * ("would have tripped d10", "d10's rule restated") hold only while
    * they shingle identically, so the expression lives once. Callers
    * must guard size(tk) >= 3 (sequence(1, 0) runs DESCENDING — the t21
    * slice rule). */
  private def sh3OfTk = expr("array_distinct(transform(sequence(1, size(tk) - 2), " +
    "i -> concat_ws(' ', element_at(tk,i), element_at(tk,i+1), element_at(tk,i+2))))")

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  val defs: Map[String, Q] = Map(
    "t01_token_count" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"), size(toks(col("text"))).as("n_tokens"))
    }),

    "t02_lang_stats" -> ((s, dir) => {
      tbl(s, dir, "documents")
        .select(col("lang"), col("n_chars"), size(toks(col("text"))).as("n_tokens"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"))
    }),

    "t03_quality_score" -> ((s, dir) => {
      val stopArr = array(stopEn.map(lit): _*)
      tbl(s, dir, "documents")
        .withColumn("tokens", toks(col("text")))
        .select(
          col("doc_id"),
          col("n_chars"),
          size(col("tokens")).as("n_tokens"),
          size(filter(col("tokens"), t => array_contains(stopArr, t))).as("n_stopwords"),
          size(array_distinct(col("tokens"))).as("n_unique"))
        // integer milli-ratios: exact in both engines (no float division);
        // greatest(.., 1) keeps empty docs at ratio 0 instead of an ANSI
        // divide-by-zero error
        .withColumn("stop_ratio_milli", expr("(1000L * n_stopwords) DIV greatest(n_tokens, 1)"))
        .withColumn("uniq_ratio_milli", expr("(1000L * n_unique) DIV greatest(n_tokens, 1)"))
    }),

    // Language ID via per-language stopword hits; deterministic argmax
    // (ties broken by picking the lexicographically LAST language, which is
    // what max-of-struct(hits, lang) gives in both a rerun and at any scale).
    "t04_lang_id" -> ((s, dir) => {
      val markers: Seq[(String, Seq[String])] = Seq(
        "en" -> Seq("the", "and", "of", "to", "in", "is"),
        "de" -> Seq("der", "die", "und", "das", "ist", "nicht"),
        "es" -> Seq("el", "la", "de", "los", "que", "es"),
        "fr" -> Seq("le", "la", "les", "et", "des", "est"),
        "zh" -> Seq("de", "le", "shi", "bu", "wo", "zai"))
      val d = tbl(s, dir, "documents").withColumn("tokens", toks(col("text")))
      val scored = markers.foldLeft(d) { case (df, (lg, words)) =>
        val arr = array(words.map(lit): _*)
        df.withColumn(s"hits_$lg", size(filter(col("tokens"), t => array_contains(arr, t))))
      }
      val structs = array(markers.map { case (lg, _) =>
        struct(col(s"hits_$lg").as("hits"), lit(lg).as("lg")) }: _*)
      scored
        .withColumn("pred_lang", array_max(structs).getField("lg"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
    }),

    "t06_bigram_freq" -> ((s, dir) => {
      // corpus bigram frequencies (n-gram language modeling input); the
      // shuffle key is the bigram string, map-side partial counts apply
      tbl(s, dir, "documents")
        .withColumn("tk", toks(col("text")))
        .filter(size(col("tk")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(tk)-1), i -> concat(element_at(tk,i), ' ', element_at(tk,i+1)))")).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
    }),

    "t07_hash_split" -> ((s, dir) => {
      // deterministic train/val/test split: bucket = first 4 hex digits of
      // md5(doc_id) → stable across engines, reruns, and cluster layouts
      // (the sampling story at 100 TB: never TABLESAMPLE for splits, which
      // is partition-order dependent — hash the key)
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10).cast("long")
      tbl(s, dir, "documents")
        .withColumn("split",
          when(bucket % 100 < 80, "train")
            .when(bucket % 100 < 90, "val")
            .otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    }),

    "t09_stratified_sample" -> ((s, dir) => {
      // per-stratum deterministic sampling: every language independently
      // keeps a hash-chosen 10% (salted with the stratum so strata do not
      // share a bucket sequence). Same rationale as t07: at 100 TB a split
      // must be a pure function of the key — partition-order-dependent
      // sampling is not reproducible across layouts
      val bucket = conv(substring(md5(
        concat(col("lang"), lit("|"), col("doc_id").cast("string"))), 1, 4), 16, 10).cast("long")
      tbl(s, dir, "documents")
        .filter(bucket % 100 < 10)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("sum_chars"))
    }),

    "t08_doc_top_terms" -> ((s, dir) => {
      // characteristic terms per document: top-3 by (term frequency desc,
      // document frequency asc, term asc) — tf-idf's ranking without the
      // float logarithm (ln differs by ulps across libms), so the result
      // is exactly reproducible in any engine. Uses the bounded top-k
      // aggregate: k rows per doc survive map-side.
      import org.apache.spark.sql.graft.functions.top_k_struct
      val tf = tbl(s, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      // tf is distinct on (doc_id, term) by construction (it IS the group
      // key), so document frequency is a plain count — countDistinct here
      // re-shuffles every (term, doc_id) pair through a distinct level
      // that AQE coalesces into one ~2 s single task at the 10× tier,
      // where count's partial aggregation ships vocab-sized rows per task
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(df, "term")
        .groupBy("doc_id")
        .agg(top_k_struct(struct((col("tf") * -1).as("neg_tf"), col("df"), col("term")), 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")))
        .select(col("doc_id"), (col("pos") + 1).cast("int").as("rank"),
          col("col.term"), (col("col.neg_tf") * -1).as("tf"), col("col.df"))
    }),

    "t10_repetition_ratio" -> ((s, dir) => {
      // within-document repetition (the Gopher-family quality filter that
      // catches boilerplate/looping generations): fraction of 3-gram
      // OCCURRENCES that are repeats of an earlier 3-gram in the same doc.
      // Pure map-side projection — zero shuffles, fully codegen'd:
      //   total    = max(n_tokens - 2, 1)   (the <3-token/empty cases
      //              collapse to the single whole-text/sentinel shingle,
      //              mirroring ShingleOps.shingleHashes)
      //   distinct = size(token_shingle_hashes(text, 3)) — the native
      //              expression already returns the DISTINCT hash set, so
      //              no interpreted higher-order transform runs per shingle
      // (hash-domain distinct equals string-domain distinct up to ~2^-64
      // collisions — same argument as the d08 oracle).
      import org.apache.spark.sql.graft.functions.token_shingle_hashes
      tbl(s, dir, "documents")
        .select(col("doc_id"),
          greatest(size(toks(col("text"))) - 2, lit(1)).as("n_shingles"),
          size(token_shingle_hashes(col("text"), 3)).as("n_distinct"))
        .withColumn("dup_ratio_milli",
          expr("(1000L * (n_shingles - n_distinct)) DIV n_shingles"))
    }),

    "t11_rarity_score" -> ((s, dir) => {
      // corpus-frequency rarity scoring — the perplexity-style LM filter
      // (CCNet lineage) re-expressed in exact integer arithmetic so any
      // engine reproduces it bit-for-bit: each token occurrence scores
      // 1e6 DIV corpus_count(token); a document's score is the sum, and
      // mean_rarity ranks documents exactly like mean negative
      // log-frequency would, without a cross-libm ln() in sight.
      // Scale shape: the vocabulary table is Zipf-bounded (≪ corpus size)
      // and BROADCAST, so scoring is map-side; the only shuffle carries
      // (doc_id, partial sum) rows after map-side combine. A vocabulary too
      // large to broadcast degrades to a shuffle join on the term — the
      // aggregation shape is unchanged.
      val post = tbl(s, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      val vocab = post.groupBy("term").agg(count(lit(1)).as("cnt"))
      post.join(broadcast(vocab), "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(expr("1000000L DIV cnt")).as("rarity_sum"))
        .withColumn("mean_rarity", expr("rarity_sum DIV n_tokens"))
    }),

    "t12_token_packing" -> ((s, dir) => {
      // sequence packing for pretraining: concatenate documents in a
      // deterministic order and cut fixed token-budget sequences — each doc
      // is assigned to the sequence where it STARTS (seq_id = tokens-before
      // DIV budget). Packing inside (lang, shard = doc_id DIV 100) windows
      // makes the operation embarrassingly parallel: every window is a
      // bounded, key-addressed unit of work, so the plan holds at any
      // corpus size — a window partitioned only by lang would funnel 100 TB
      // through 5 reducers. Pure integer arithmetic, layout-independent.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "shard").orderBy("doc_id")
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (col("doc_id") / 100).cast("long").as("shard"),
          size(toks(col("text"))).as("n_tokens"))
        .withColumn("cum_tokens",
          sum(col("n_tokens").cast("long")).over(w))
        .withColumn("seq_id", expr("(cum_tokens - n_tokens) DIV 2048"))
    }),

    "t13_quality_filter" -> ((s, dir) => {
      // the composite curation decision real pipelines run: every doc gets
      // the FIRST failing rule (or 'keep') from a fixed cascade — too
      // short, low vocabulary diversity, high internal repetition. All
      // inputs are the integer metrics of t03/t10, so the verdict is
      // bit-reproducible in any engine; the whole op is one map-side
      // projection (no shuffle), same as its ingredients.
      import org.apache.spark.sql.graft.functions.token_shingle_hashes
      tbl(s, dir, "documents")
        .withColumn("tk", toks(col("text")))
        .select(
          col("doc_id"),
          size(col("tk")).as("n_tokens"),
          size(array_distinct(col("tk"))).as("n_unique"),
          greatest(size(col("tk")) - 2, lit(1)).as("n_shingles"),
          size(token_shingle_hashes(col("text"), 3)).as("n_distinct"))
        // greatest(n_tokens, 1): an empty/all-whitespace doc must reach the
        // 'too_short' verdict, not throw DIVIDE_BY_ZERO under ANSI mode
        .withColumn("uniq_ratio_milli",
          expr("(1000L * n_unique) DIV greatest(n_tokens, 1)"))
        .withColumn("dup_ratio_milli",
          expr("(1000L * (n_shingles - n_distinct)) DIV n_shingles"))
        .withColumn("verdict", expr("""
          CASE WHEN n_tokens < 10 THEN 'too_short'
               WHEN uniq_ratio_milli < 300 THEN 'low_diversity'
               WHEN dup_ratio_milli > 300 THEN 'repetitive'
               ELSE 'keep' END"""))
        .select("doc_id", "n_tokens", "uniq_ratio_milli", "dup_ratio_milli", "verdict")
    }),

    "t14_corpus_card" -> ((s, dir) => {
      // per-source corpus report ("data card"): the mixing/reporting
      // aggregate a training-data pipeline publishes per snapshot. All
      // statistics are exact integers (counts, integer-milli ratios), so
      // the card is reproducible anywhere; one shuffle on the
      // low-cardinality source key with partial aggregation.
      tbl(s, dir, "documents")
        .select(col("source"), col("lang"), col("n_chars"),
          size(toks(col("text"))).as("n_tokens"), md5(col("text")).as("h"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_tokens").cast("long")).as("sum_tokens"),
          sum(col("n_chars")).as("sum_chars"),
          countDistinct(col("h")).as("n_unique_texts"))
        .withColumn("mean_tokens", expr("sum_tokens DIV n_docs"))
        .withColumn("dup_ratio_milli",
          expr("(1000L * (n_docs - n_unique_texts)) DIV n_docs"))
    }),

    "t05_fingerprint" -> ((s, dir) => {
      // Rolling fingerprint over the token sequence (order-sensitive, unlike
      // a bag-of-words hash): fp = fold(tokens, md5(acc || token)). Hash
      // chaining avoids ANSI-mode overflow, is deterministic on every
      // executor at any parallelism, and md5 is cross-engine (oracle parity).
      tbl(s, dir, "documents")
        .withColumn("tokens", toks(col("text")))
        .select(col("doc_id"),
          aggregate(col("tokens"), lit("graftseed"),
            (acc, t) => md5(concat(acc, t))).as("fingerprint"))
    }),

    "t15_pii_redact" -> ((s, dir) => {
      // PII scrubbing — the redaction pass every training corpus gets
      // before anything else: count and replace emails / phone spans /
      // IPv4 literals with typed placeholders. Pure regexp projections
      // (Spark's codegen'd regexp_count/regexp_replace — no UDF), so the
      // pass is map-side only and scales linearly; patterns are kept to
      // the Java∩RE2 common dialect (no lookaround) so the DuckDB oracle
      // hash-checks the REDACTED BYTES, not just the counts. The fixture
      // text contains no PII, so deterministic spans derived from doc_id
      // are appended first — the same construction runs in the oracle,
      // and the redactor is what's under test.
      val aug = concat(col("text"), expr(
        "CASE WHEN doc_id % 4 = 0 THEN ' contact agent' || CAST(doc_id AS STRING) || '@example.com now' " +
          "WHEN doc_id % 4 = 1 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || ' today' " +
          "WHEN doc_id % 4 = 2 THEN ' node 10.' || CAST(doc_id % 256 AS STRING) || '.0.' || CAST((doc_id * 7) % 256 AS STRING) || ' up' " +
          "ELSE '' END"))
      tbl(s, dir, "documents")
        .withColumn("t", aug)
        .withColumn("red",
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            PiiEmail, "[EMAIL]"), PiiIp, "[IP]"), PiiPhone, "[PHONE]"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(PiiEmail)).as("n_emails"),
          regexp_count(col("t"), lit(PiiPhone)).as("n_phones"),
          regexp_count(col("t"), lit(PiiIp)).as("n_ips"),
          md5(col("red")).as("redacted_md5"),
          length(col("red")).as("n_chars_clean"))
    }),

    "t17_gopher_repetition" -> ((s, dir) => {
      // Gopher/MassiveText repetition filters (Rae et al. 2021 §A1.1,
      // adapted to the newline-free fixture): (1) the fraction of token
      // characters claimed by the single most frequent 2-gram, and (2) the
      // fraction of token POSITIONS covered by some duplicated 5-gram —
      // span-union coverage, each position counted once even when several
      // duplicated grams overlap it. Both land as exact integer
      // milli-ratios, so the filter verdict is bit-reproducible anywhere.
      // Scale shape: every shuffle is keyed by (doc_id[, gram]) and carries
      // counters or positions, never text; n-gram groups are doc-local so
      // group size is bounded by document length, not corpus size. The
      // top-2-gram metric takes max(count · chars) directly — no argmax
      // tie-break needed, the metric IS the max of a per-gram product.
      // The fixture's random token streams never repeat a 5-gram, so 10%
      // of docs get a deterministic looped phrase appended (the t15
      // synthetic-PII precedent: the same construction runs in the oracle,
      // and the REPETITION DETECTOR is what's under test).
      // r21 (guide §1.2 step 1, §4): all three metrics are DOC-LOCAL, so
      // the whole operator is ONE map-side pass through the native
      // gopher_repetition_stats kernel — zero shuffles at any corpus size.
      // The relational formulation it replaces (kept alive as the
      // QueriesSpec equivalence witness) scanned documents 3×, tokenized
      // 4×, built every gram as a string through interpreted lambdas, and
      // paid 5 Exchanges + a Window sort; measured r21: main cpu_s
      // 2.35-2.85 → ~0.1, plan 39 nodes → 4 (plans/r21/). Gram grouping
      // moves to the chained-xxh64 hash domain (= string domain up to
      // ~2^-64 collisions, the t10/d08 argument); oracle unchanged and
      // hash-exact at sf0.001/0.01/0.1.
      import org.apache.spark.sql.graft.functions.gopher_repetition_stats
      val aug = concat(col("text"), expr(
        "CASE WHEN doc_id % 10 = 0 THEN repeat(' loop alpha beta gamma delta', 3) ELSE '' END"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), gopher_repetition_stats(aug).as("st"))
        .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
          col("st.tok_chars").as("tok_chars"),
          col("st.top2_chars").as("top2_chars"), col("st.cov5").as("cov5"))
        .withColumn("top2_milli", expr("(1000L * top2_chars) DIV greatest(tok_chars, 1)"))
        .withColumn("dup5_cov_milli", expr("(1000L * cov5) DIV greatest(n_tokens, 1)"))
        .withColumn("verdict", expr("""
          CASE WHEN top2_milli > 200 THEN 'rep_2gram'
               WHEN dup5_cov_milli > 300 THEN 'rep_5gram'
               ELSE 'keep' END"""))
    }),

    "t18_source_cap" -> ((s, dir) => {
      // per-source capping (the RefinedWeb/C4 "domain cap" curation step):
      // each source keeps only its top-10 documents by vocabulary
      // diversity, so no single domain dominates the training mix. Uses
      // the bounded top-k aggregate — k rows per source survive MAP-SIDE,
      // where a window row_number would shuffle and sort every document of
      // the source before discarding all but k (the difference between
      // O(k) and O(docs-per-domain) reducer state at 100 TB). Ordering is
      // (uniq_ratio desc, doc_id asc) — fully deterministic.
      import org.apache.spark.sql.graft.functions.top_k_struct
      val scored = tbl(s, dir, "documents")
        .withColumn("tk", toks(col("text")))
        .select(col("source"), col("doc_id"),
          size(col("tk")).as("n_tokens"),
          size(array_distinct(col("tk"))).as("n_unique"))
        .withColumn("uniq_ratio_milli", expr("(1000L * n_unique) DIV greatest(n_tokens, 1)"))
      scored.groupBy("source")
        .agg(top_k_struct(struct((col("uniq_ratio_milli") * -1).as("neg_u"), col("doc_id")), 10).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
          col("col.doc_id").as("doc_id"),
          (col("col.neg_u") * -1).as("uniq_ratio_milli"))
    }),

    "t16_model_score" -> ((s, dir) => {
      // quality-model inference — the fasttext-style linear classifier
      // pass that scores every document against offline-trained weights.
      // The weight vector ships as plan literals (the ivfPivots pattern:
      // model size is independent of corpus size, no join against a
      // weights table), features are the t03 fixed-point milli-ratios,
      // and the logit stays in exact integer arithmetic end to end →
      // bit-deterministic at any parallelism, oracle-checked exactly.
      val stopArr = array(stopEn.map(lit): _*)
      tbl(s, dir, "documents")
        .withColumn("tokens", toks(col("text")))
        .select(col("doc_id"),
          size(col("tokens")).as("n_tokens"),
          size(filter(col("tokens"), t => array_contains(stopArr, t))).as("n_stop"),
          size(array_distinct(col("tokens"))).as("n_unique"))
        .withColumn("logit_milli", expr(
          "3 * ((1000 * n_unique) DIV greatest(n_tokens, 1)) " +
            "- 2 * ((1000 * n_stop) DIV greatest(n_tokens, 1)) " +
            "+ 5 * least(n_tokens, 100) - 1500"))
        .select(col("doc_id"), col("logit_milli"),
          when(col("logit_milli") > 0, "keep").otherwise("drop").as("label"))
    }),

    "t19_mixture_epochs" -> ((s, dir) => {
      // data-mixture materialization with FRACTIONAL epochs — the step that
      // turns a curated corpus into a training mix (DoReMi / Llama-style
      // source weighting): each source gets a target weight w, and every
      // document is replicated floor(w) times plus one extra copy iff a
      // per-document hash lands below frac(w) — so a source weighted 2.4
      // contributes each doc twice and a deterministic, layout-independent
      // 40% of docs a third time. Weights stay in exact milli units
      // (250 + 500·(src_idx mod 8) → 0.25x..3.75x) and the extra-copy
      // choice is the t07/t09 hash-bucket rule, so the mix is a pure
      // function of (doc_id, source): reproducible across reruns, cluster
      // layouts, and engines. Scale shape: ZERO shuffles — one scan, a
      // map-side explode whose fan-out is the mixture weight itself (the
      // epoch column is what a downstream t12-style packer consumes).
      val wm = (lit(250) + (substring(col("source"), 4, 10).cast("int") % 8) * 500)
        .cast("long").as("weight_milli")
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 1000
      tbl(s, dir, "documents")
        .select(col("doc_id"), col("source"), wm)
        .withColumn("n_copies",
          expr("weight_milli DIV 1000") + when(bucket < col("weight_milli") % 1000, 1L).otherwise(0L))
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("source"), col("weight_milli"), col("n_copies"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("epoch"))
    }),

    "t20_bpe_learn" -> ((s, dir) => {
      // BPE tokenizer TRAINING (Sennrich et al. 2016 word-level form) —
      // the corpus-scale step that produces a tokenizer's merge table.
      // Shape is the real trainer's: ONE corpus scan builds the
      // Zipf-bounded (word, count) vocabulary; every merge iteration then
      // runs over the vocab table only — one pair-count shuffle (partial
      // aggregation over symbol bigrams weighted by word count), a 1-row
      // argmax collect (bounded driver artifact, the centroid precedent),
      // and a map-side merge projection. Words are '||'-separated symbol
      // strings, so the greedy leftmost merge IS plain non-regex REPLACE
      // of '|l||r|' with '|lr|': double separators make adjacent matches
      // share zero characters (['a','b','a','b'] merges BOTH pairs;
      // ['a','a','a'] merges exactly one — true BPE greedy semantics,
      // identical in Spark and the oracle). Ties break (count desc, left
      // asc, right asc) — fully deterministic; all counts are integers.
      import s.implicits._
      bpeLearnMerges(s, dir, iters = 6)
        .toDF("iter", "left_sym", "right_sym", "pair_count")
    }),

    "t22_bpe_encode" -> ((s, dir) => {
      // BPE ENCODING — the apply half of t20's trainer: tokenize the
      // corpus with the merge table the trainer just learned. The scale
      // lever is VOCABULARY-LEVEL encoding (what real trainers do): each
      // DISTINCT word is encoded once — the same 6 literal REPLACEs over
      // the Zipf-bounded vocab table, a per-vocab-entry cost — and the
      // corpus then just looks its words up: explode → broadcast-join the
      // (term, n_syms) vocab → one doc_id-keyed partial-agg shuffle.
      // Encoding per corpus TOKEN (a per-char symbol chain per occurrence)
      // would pay the merge chain n_tokens/n_vocab times over — pure
      // waste under any Zipf law. The vocab broadcast holds while min-
      // frequency pruning keeps tokenizer vocabs ~1e5-1e6 (standard);
      // past that, drop the hint and the lookup becomes a term-keyed
      // shuffle join — the plan is otherwise unchanged. n_syms counts the
      // `</w>` end-of-word marker, so n_bpe_tokens ≥ n_words and
      // expansion_milli ≥ 1000 by construction; more merges push it down
      // toward the compression a trained tokenizer buys.
      val merges = bpeLearnMerges(s, dir, iters = 6)
      val enc = merges.foldLeft(bpeWords0(s, dir)) { case (df, (_, l, r, _)) =>
        df.withColumn("word_sym", call_function("replace",
          col("word_sym"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
      }
        .withColumn("n_syms",
          size(filter(split(col("word_sym"), "\\|"), x => x =!= "")).cast("long"))
        .select("term", "n_syms")
      tbl(s, dir, "documents")
        .select(col("doc_id"), explode(toks(col("text"))).as("term"))
        .join(broadcast(enc), "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"))
        .withColumn("expansion_milli", expr("(1000L * n_bpe_tokens) DIV n_words"))
    }),

    "t23_bigram_lm_score" -> ((s, dir) => {
      // LM-perplexity quality filtering (the CCNet recipe: score documents
      // with a language model trained on the corpus' own clean split, keep
      // the low-perplexity head) — here the LM is a bigram model trained on
      // t07's hash-chosen 80% train split and the held-out 20% is scored.
      // t11 scores by UNIGRAM rarity; this is the contextual upgrade: a
      // token is surprising given its PREDECESSOR, so looping boilerplate
      // (common words in incoherent order) scores badly where a bag-of-
      // words filter waves it through. All arithmetic is exact-integer
      // fixed-point (the t11/q85 rule — no cross-libm ln): a bigram
      // occurrence's surprise is 1/p̂(w2|w1) in milli units,
      //   seen bigram:        (1000·cnt_uni) DIV cnt_big
      //   unseen, seen w1:    1000·(cnt_uni+1)   (≈ add-one smoothing)
      //   unseen prefix:      1_000_000          (fixed OOV penalty)
      // and a document's score is the mean over its bigrams — exactly the
      // ranking mean negative log-likelihood induces per-prefix, minus the
      // log's cross-term weighting, plus bit-identical replayability.
      // Scale shape: both LM tables are Zipf-bounded (bigram TYPES, not
      // occurrences) and BROADCAST, so scoring is map-side; the only
      // shuffles are the LM build's (w1,w2)-keyed partial count and the
      // doc_id-keyed partial sum — no row ever carries text past the scan.
      // A vocabulary too large to broadcast degrades to a term-keyed
      // shuffle join, shape otherwise unchanged (the t11 note).
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
      val docs = tbl(s, dir, "documents")
        .withColumn("tk", toks(col("text")))
        .filter(size(col("tk")) >= 2) // a bigram LM has nothing to say below 2 tokens
        .withColumn("is_train", bucket < 80)
      val bigrams = docs.select(col("doc_id"), col("is_train"), explode(expr(
        "transform(sequence(1, size(tk)-1), " +
          "i -> struct(element_at(tk,i) AS w1, element_at(tk,i+1) AS w2))")).as("g"))
        .select(col("doc_id"), col("is_train"), col("g.w1"), col("g.w2"))
      val big = bigrams.filter(col("is_train"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("cnt_big"))
      // prefix totals derived FROM the bigram table (Σ cnt_big over w2), so
      // p̂(w2|w1) = cnt_big/cnt_uni sums to exactly 1 per seen prefix
      val uni = big.groupBy("w1").agg(sum("cnt_big").as("cnt_uni"))
      bigrams.filter(!col("is_train"))
        .join(broadcast(big), Seq("w1", "w2"), "left")
        .join(broadcast(uni), Seq("w1"), "left")
        .withColumn("surprise_milli", expr(
          "CASE WHEN cnt_big IS NOT NULL THEN (1000L * cnt_uni) DIV cnt_big " +
            "WHEN cnt_uni IS NOT NULL THEN 1000L * (cnt_uni + 1) " +
            "ELSE 1000000L END"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum("surprise_milli").as("surprise_sum"))
        .withColumn("ppl_milli", expr("surprise_sum DIV n_bigrams"))
        // threshold at the observed corpus median (~31.6k): the CCNet-style
        // "keep the head" cut, deterministic because the score is
        .withColumn("verdict",
          when(col("ppl_milli") <= 32000L, "keep").otherwise("drop"))
    }),

    "p01_training_mix" -> ((s, dir) => {
      // END-TO-END curation pipeline — the composition the individual
      // operators exist FOR, as one declarative program Catalyst optimizes
      // whole: quality gate → exact dedup → benchmark decontamination →
      // deterministic split → sequence packing. Each stage is an
      // already-oracle-checked semantic (t03/t13 rules, d02's
      // normalized-key dedup, d10's shared-shingle rule, t07's hash
      // split, t12's packing) re-stated inline; the pipeline's own oracle
      // replays the whole chain, so stage WIRING is verified too —
      // filters compose before the scan, the dedup shuffle carries
      // digests not text, the eval posting list broadcasts, packing
      // windows stay (lang, shard)-bounded. Attrition at sf0.01:
      // 500 docs → eval held out → quality gate → first-per-digest →
      // decontaminated → 80% train split → packed sequences.
      val d = tbl(s, dir, "documents")
        .withColumn("tk", toks(col("text")))
        .withColumn("n_tokens", size(col("tk")))
      val isEval = col("doc_id") % 97 === 0
      val sh3 = sh3OfTk
      // stage 1 — rule gate, map-side (the t13 shape); eval docs are
      // benchmark data, never corpus
      val q = d.filter(!isEval)
        .withColumn("uniq_milli",
          expr("(1000L * size(array_distinct(tk))) DIV greatest(n_tokens, 1)"))
        .filter(col("n_tokens") >= 10 && col("uniq_milli") >= 300)
      // stage 2 — exact dedup on the normalized-text digest; the shuffle
      // carries (digest, doc_id), never text (d02's rule)
      val dd = q.withColumn("k", md5(lower(col("text"))))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy("doc_id")))
        .filter(col("rn") === 1)
      // stage 3 — decontamination: any 3 shared 3-shingles with the eval
      // set disqualify (d10's rule); the eval posting list is
      // benchmark-sized and broadcast
      val evalSh = d.filter(isEval).filter(size(col("tk")) >= 3)
        .select(explode(sh3).as("sh")).distinct()
      val contaminated = dd.filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(sh3).as("sh"))
        .join(broadcast(evalSh), "sh")
        .groupBy("doc_id").agg(count(lit(1)).as("hits"))
        .filter(col("hits") >= 3)
      val clean = dd.join(contaminated, Seq("doc_id"), "left_anti")
      // stages 4+5 — t07's hash split (train fold) and t12's packing in
      // bounded (lang, shard) windows
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy("lang", "shard").orderBy("doc_id")
      clean.filter(bucket < 80)
        .select(col("doc_id"), col("lang"),
          (col("doc_id") / 100).cast("long").as("shard"), col("n_tokens"))
        .withColumn("cum", sum(col("n_tokens").cast("long")).over(wp))
        .withColumn("seq_id", expr("(cum - n_tokens) DIV 2048"))
        .select("doc_id", "lang", "n_tokens", "seq_id")
    }),

    "t21_dedup_rewrite" -> ((s, dir) => {
      // duplicated-span REMOVAL — the rewrite half of t17's detector (the
      // RefinedWeb "exact-substring cut" applied at the 5-gram level):
      // every 5-gram occurrence whose gram already occurred EARLIER in the
      // same document marks its token span [p, p+4] for removal; the first
      // occurrence survives, and the cleaned text is the uncovered tokens
      // rejoined. Detection is DOC-LOCAL, so the whole operator is one
      // zero-shuffle codegen'd projection: grams, repeat test
      // (array_position = first index < current), span union, and the
      // index-aware filter all run as higher-order array functions inside
      // the scan — where a (doc_id, gram) group-by formulation (t17's, for
      // corpus metrics) would shuffle every document twice. Same 10%
      // looped-phrase augmentation as t17 so the remover has real work.
      // r21 (guide §1.2 step 1, §4): the whole rewrite is ONE pass through
      // the native dup_span_rewrite kernel. The higher-order formulation
      // it replaces (kept alive as the QueriesSpec equivalence witness)
      // was O(m²) PER DOCUMENT — array_position rescans the gram-string
      // array from the front for every position, through interpreted
      // lambdas, and the final index-aware filter paid O(m·|rm|)
      // array_contains probes — where the kernel finds repeats in
      // O(m log m) against the sorted gram-hash array and rewrites bytes
      // directly. Measured sf0.1: main cpu_s 1.13-1.35 → ~0.1. Gram
      // identity moves to the chained-xxh64 domain (the t10/d08
      // argument); oracle unchanged and hash-exact at sf0.001/0.01/0.1.
      import org.apache.spark.sql.graft.functions.dup_span_rewrite
      val aug = concat(col("text"), expr(
        "CASE WHEN doc_id % 10 = 0 THEN repeat(' loop alpha beta gamma delta', 3) ELSE '' END"))
      tbl(s, dir, "documents")
        .select(col("doc_id"), dup_span_rewrite(aug, 5).as("st"))
        .select(col("doc_id"), col("st.n_tokens").as("n_tokens"),
          col("st.n_removed").as("n_removed"),
          col("st.clean_text").as("clean_text"))
    }),

    "t24_score_lift" -> ((s, dir) => {
      // model-evaluation gains/lift table — the calibration readout every
      // quality-filter deployment needs before trusting t16's scores to
      // gate a corpus: rank all documents by score, cut into EXACT global
      // deciles, and report per-decile positive rate, cumulative capture
      // and lift. "Positive" is a deterministic reference label (the
      // document mentions 'spark'). Deciles come from GlobalOrderOps'
      // two-phase global rank — one range shuffle of (score, id) pairs,
      // never the single-task no-PARTITION window (NTILE's trap) — and
      // decile = ((rank−1)·10) DIV n + 1 so both engines share one integer
      // formula instead of trusting NTILE tie rules. The capture/lift
      // pass runs on the aggregated 10-row table (a bounded frame), and
      // all rates are exact floor-milli integers.
      import graft.operators.GlobalOrderOps
      import org.apache.spark.sql.expressions.Window
      val stopArr = array(stopEn.map(lit): _*)
      val scored = tbl(s, dir, "documents")
        .withColumn("tk", toks(col("text")))
        .select(col("doc_id"),
          size(col("tk")).as("n_tokens"),
          size(filter(col("tk"), t => array_contains(stopArr, t))).as("n_stop"),
          size(array_distinct(col("tk"))).as("n_unique"),
          array_contains(col("tk"), "spark").cast("long").as("pos"))
        .withColumn("logit_milli", expr(
          "3 * ((1000 * n_unique) DIV greatest(n_tokens, 1)) " +
            "- 2 * ((1000 * n_stop) DIV greatest(n_tokens, 1)) " +
            "+ 5 * least(n_tokens, 100) - 1500"))
        .select("doc_id", "logit_milli", "pos")
      val n = scored.count() // 1-row bounded driver artifact (q88 pattern)
      val deciles = GlobalOrderOps
        .withGlobalOrder(scored, Seq(col("logit_milli").desc, col("doc_id")), rankCol = "rk")
        .withColumn("decile", expr(s"CAST(((rk - 1) * 10) DIV ${n}L + 1 AS INT)"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), sum("pos").as("n_pos"))
      val w10 = Window.orderBy("decile")
      deciles
        .withColumn("cum_pos", sum("n_pos").over(
          w10.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total_pos", sum("n_pos").over(
          w10.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          expr("(1000 * cum_pos) DIV greatest(total_pos, 1)").as("capture_milli"),
          expr(s"(1000 * n_pos * ${n}L) DIV greatest(n_docs * total_pos, 1)").as("lift_milli"))
    }),

    "t25_rag_chunking" -> ((s, dir) => {
      // overlapping-window chunking — the EMBEDDING-side sibling of t12's
      // training packer: retrieval corpora cut documents into fixed-size
      // windows with overlap (here 64 tokens, stride 48 → 16-token
      // overlap) so no sentence straddling a boundary is lost to both
      // chunks. The window count is 1 + ⌈max(n−64,0)/48⌉ — every token
      // is covered, the final window reaches the document end, and no
      // window is fully contained in its predecessor. Entirely DOC-LOCAL:
      // chunk ids, slices and fingerprints are higher-order array
      // functions inside the scan projection — zero shuffle at any
      // corpus size (the chunk table is written or fed straight to an
      // embedding mapInPandas stage).
      tbl(s, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
        .withColumn("nc",
          expr("1 + (greatest(size(tk) - 64, 0) + 47) DIV 48"))
        .select(col("doc_id"), col("tk"),
          explode(expr("slice(sequence(0, nc), 1, nc)")).as("chunk_id"))
        .withColumn("chunk_tk", expr("slice(tk, chunk_id * 48 + 1, 64)"))
        .select(col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
          (col("chunk_id") * 48 + 1).cast("int").as("start_tok"),
          size(col("chunk_tk")).as("n_chunk_tokens"),
          expr("array_join(chunk_tk, ' ')").as("chunk_text"),
          md5(expr("array_join(chunk_tk, ' ')")).as("chunk_md5"))
    }),

    "p02_retrieval_index" -> ((s, dir) => {
      // the RETRIEVAL-ingestion pipeline end to end, as ONE declarative
      // plan (p01's sibling for the serving side): t25's overlapping
      // chunks → a deterministic 8-dim integer "embedding" per chunk (an
      // md5-derived stub standing in for the model forward pass — same
      // carve-out as m02/m03, which makes the WHOLE chain replayable in
      // SQL) → exact top-5 neighbor search of the query chunks (docs
      // 0/1) against the corpus chunks. Scale shape: chunking and
      // embedding are doc-local projections, the query side is bounded
      // and BROADCAST (the s01 pattern), scoring is a map-side integer
      // dot product over the corpus scan, and the per-query top-5 is the
      // bounded top-k aggregate — no corpus-sized sort, no vector ever
      // on a shuffle.
      import org.apache.spark.sql.graft.functions.top_k_struct
      val dims = 0 until 8
      def emb(prefix: String) = dims.map { j =>
        expr(s"CAST(conv(substring(md5(concat(chunk_md5, '|', $j)), 1, 8), 16, 10) " +
          s"AS BIGINT) % 2001 - 1000").as(s"$prefix$j")
      }
      val chunks = defs("t25_rag_chunking")(s, dir)
        .select(col("doc_id"), col("chunk_id"), col("chunk_md5"))
      val corpus = chunks.filter(col("doc_id") >= 2)
        .select(col("doc_id") +: col("chunk_id") +: emb("e"): _*)
      val queries = chunks.filter(col("doc_id") < 2)
        .select(col("doc_id").as("q_doc") +: col("chunk_id").as("q_chunk") +: emb("q"): _*)
      val dot = dims.map(j => col(s"e$j") * col(s"q$j")).reduce(_ + _)
      corpus.join(broadcast(queries))
        .select(col("q_doc"), col("q_chunk"), col("doc_id"), col("chunk_id"),
          dot.as("score"))
        .groupBy("q_doc", "q_chunk")
        .agg(top_k_struct(
          struct((col("score") * -1).as("neg"), col("doc_id"), col("chunk_id")), 5).as("top"))
        .select(col("q_doc"), col("q_chunk"), posexplode(col("top")))
        .select(col("q_doc"), col("q_chunk"), (col("pos") + 1).cast("int").as("rank"),
          col("col.doc_id"), col("col.chunk_id"), (col("col.neg") * -1).as("score"))
    }),

    "t26_contamination_severity" -> ((s, dir) => {
      // the EVAL-side companion of d10's decontamination: d10 flags which
      // TRAIN docs to drop; this audits how EXPOSED each benchmark (eval)
      // document already is — the readout that decides whether an eval
      // set must be retired rather than the corpus cleaned. For every
      // eval doc (p01's doc_id % 97 fold): the maximum number of distinct
      // 3-shingles it shares with any single train doc, bucketed into
      // severity levels (>=10 critical / >=3 high / >=1 low / clean —
      // the d10 disqualification threshold is 3, so 'high' is exactly
      // "would have tripped d10"). Scale shape: one shingle-keyed
      // posting join (ids only ride the shuffle — the eval side is
      // benchmark-sized), a (eval, train) pair count, and a max per eval
      // doc; eval docs with no overlap at all survive via the left join.
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), toks(col("text")).as("tk"))
      val isEval = col("doc_id") % 97 === 0
      val sh3 = sh3OfTk
      val trainSh = d.filter(!isEval).filter(size(col("tk")) >= 3)
        .select(col("doc_id").as("train_id"), explode(sh3).as("sh"))
      val overlap = d.filter(isEval).filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(sh3).as("sh"))
        .join(trainSh, "sh")
        .groupBy("doc_id", "train_id").agg(count(lit(1)).as("hits"))
        .groupBy("doc_id").agg(max("hits").as("max_overlap"))
      d.filter(isEval).select("doc_id")
        .join(overlap, Seq("doc_id"), "left")
        .withColumn("max_overlap", coalesce(col("max_overlap"), lit(0L)))
        .withColumn("severity", expr("""
          CASE WHEN max_overlap >= 10 THEN 'critical'
               WHEN max_overlap >= 3 THEN 'high'
               WHEN max_overlap >= 1 THEN 'low'
               ELSE 'clean' END"""))
    }),

    "p03_incremental_ingest" -> ((s, dir) => {
      // the CONTINUOUS-ingestion pipeline — p01 curates a frozen corpus,
      // p02 builds its index; p03 is what runs every day after: an
      // arrival batch lands (here the t07 md5-bucket >= 80 fold, ~20% of
      // docs — base is the other 80%) and each new document is routed
      // exact-dup filter → near-dup filter vs the BASE corpus → chunked
      // and sharded into the serving index. Stage semantics are the
      // proven ones restated: d12's digest filter (production keeps a
      // Bloom filter of base digests broadcast at every executor; the
      // exact digest anti-join below IS that filter with zero false
      // positives, so the chain stays hash-replayable), d10's >= 3
      // shared-3-shingle disqualification rule — here against the base
      // posting list, shuffle keyed by shingle and carrying only
      // (shingle, doc_id) — and t25's 64/48 chunk grid routed to 16
      // index shards by chunk-md5 (s14's upsert shape, doc-local via
      // higher-order array ops: no explode, no extra shuffle). Output is
      // the per-arrival ingestion ledger: verdict + how many chunks and
      // distinct shards the upsert touches (0 for rejected docs).
      val d = tbl(s, dir, "documents")
        .select(col("doc_id"), col("text"), toks(col("text")).as("tk"))
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 100)
        .withColumn("k", md5(lower(col("text"))))
      val base = d.filter(col("bucket") < 80)
      val arrivals = d.filter(col("bucket") >= 80)
      val sh3 = sh3OfTk
      val baseSh = base.filter(size(col("tk")) >= 3)
        .select(col("doc_id").as("base_id"), explode(sh3).as("sh"))
      val nearIds = arrivals.filter(size(col("tk")) >= 3)
        .select(col("doc_id"), explode(sh3).as("sh"))
        .join(baseSh, "sh")
        .groupBy("doc_id", "base_id").agg(count(lit(1)).as("hits"))
        .filter(col("hits") >= 3)
        .select("doc_id").distinct()
        .withColumn("near", lit(true))
      val exactIds = arrivals.join(base.select("k").distinct(), Seq("k"), "left_semi")
        .select("doc_id").withColumn("exact", lit(true))
      arrivals
        .join(exactIds, Seq("doc_id"), "left")
        .join(nearIds, Seq("doc_id"), "left")
        .withColumn("verdict",
          when(col("exact"), "exact_dup")
            .when(col("near"), "near_dup")
            .otherwise("ingested"))
        .withColumn("nc", expr("1 + (greatest(size(tk) - 64, 0) + 47) DIV 48"))
        .select(col("doc_id"), col("verdict"),
          when(col("verdict") === "ingested", col("nc").cast("long"))
            .otherwise(0L).as("n_chunks"),
          when(col("verdict") === "ingested", expr(
            "CAST(size(array_distinct(transform(sequence(0, nc - 1), c -> " +
              "CAST(CONV(SUBSTRING(MD5(CONCAT(CAST(doc_id AS STRING), ':', " +
              "CAST(c AS STRING))), 1, 4), 16, 10) AS BIGINT) % 16))) AS BIGINT)"))
            .otherwise(0L).as("n_shards"))
    })
  )

  /** (term, word_sym, cnt) base vocabulary shared by the BPE family (t20
    * learn, t22 encode): ONE corpus scan reduces any corpus to the
    * Zipf-bounded word-count table every later BPE step runs on. Words are
    * '||'-separated symbol strings (see t20's comment for why double
    * separators make leftmost REPLACE exactly greedy BPE). */
  private def bpeWords0(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(explode(toks(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .withColumn("word_sym", concat(lit("||"),
        array_join(expr("transform(sequence(1, length(term)), i -> substring(term, i, 1))"), "||"),
        lit("||</w>||")))
      .select("term", "word_sym", "cnt")

  /** t20's training loop, shared with t22: [[bpeWords0]] persisted, then
    * `iters` rounds of (pair-count shuffle over the VOCAB table only,
    * 1-row argmax collect — the bounded centroid-precedent driver
    * artifact, map-side REPLACE merge). Returns the learned merge table:
    * (iter, left, right, pair_count), `iters` rows. Deterministic: ties
    * break (count desc, left asc, right asc), all counts integers. */
  private def bpeLearnMerges(s: SparkSession, dir: String,
      iters: Int): Seq[(Int, String, String, Long)] = {
    val words0 = bpeWords0(s, dir).persist()
    var words = words0.toDF()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (it <- 1 to iters) {
      val bestDf = words
        .select(col("cnt"), filter(split(col("word_sym"), "\\|"), x => x =!= "").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(sym) - 1), " +
            "i -> named_struct('l', element_at(sym, i), 'r', element_at(sym, i + 1)))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pcnt"))
        .orderBy(desc("pcnt"), asc("l"), asc("r"))
        .limit(1)
      val best = QueryDsl.boundedCollect(bestDf, 1, "bpe best pair (limit 1)")(0)
      val (l, r) = (best.getString(0), best.getString(1))
      merges += ((it, l, r, best.getLong(2)))
      words = words.withColumn("word_sym", call_function("replace",
        col("word_sym"), lit(s"|$l||$r|"), lit(s"|$l$r|")))
    }
    words0.unpersist()
    merges.toSeq
  }

  /** The shared CTE chain for the BPE oracles: the driver loop unrolls
    * into chained MATERIALIZED CTEs (the q80 textrankOracle precedent) —
    * per iteration a weighted pair count, a (count desc, l, r) argmax,
    * and the same double-separator REPLACE merge. `term` rides through
    * every w_k so the encode oracle can key the vocab lookup. */
  private def bpeChain(iters: Int): String = {
    val base = """
      WITH w0 AS MATERIALIZED (
        SELECT term,
               '||' || ARRAY_TO_STRING(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(term)),
                 i -> SUBSTRING(term, i, 1)), '||') || '||</w>||' AS word_sym, cnt
        FROM (SELECT term, COUNT(*) AS cnt
              FROM (SELECT UNNEST(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS term
                    FROM documents)
              GROUP BY term))"""
    val steps = (1 to iters).map { k =>
      s"""
      p$k AS (
        SELECT s.sym[i] AS l, s.sym[i + 1] AS r, SUM(s.cnt) AS pcnt
        FROM (SELECT cnt, LIST_FILTER(STR_SPLIT(word_sym, '|'), x -> x <> '') AS sym
              FROM w${k - 1} WHERE LEN(LIST_FILTER(STR_SPLIT(word_sym, '|'), x -> x <> '')) >= 2) s,
             UNNEST(GENERATE_SERIES(1, LEN(s.sym) - 1)) AS t(i)
        GROUP BY 1, 2),
      b$k AS MATERIALIZED (SELECT l, r, pcnt FROM p$k ORDER BY pcnt DESC, l, r LIMIT 1),
      w$k AS MATERIALIZED (SELECT term, REPLACE(word_sym,
                       '|' || (SELECT l FROM b$k) || '||' || (SELECT r FROM b$k) || '|',
                       '|' || (SELECT l FROM b$k) || (SELECT r FROM b$k) || '|') AS word_sym, cnt
              FROM w${k - 1})"""
    }.mkString(",", ",", "")
    base + steps
  }

  /** DuckDB replay of [[defs t20_bpe_learn]]: the merge rows off
    * [[bpeChain]]'s per-iteration argmaxes. */
  private def bpeOracle(iters: Int): String = {
    val rows = (1 to iters).map { k =>
      s"SELECT $k AS iter, l AS left_sym, r AS right_sym, CAST(pcnt AS BIGINT) AS pair_count FROM b$k"
    }.mkString("\n      UNION ALL ")
    bpeChain(iters) + "\n      " + rows
  }

  /** DuckDB replay of [[defs t22_bpe_encode]]: the final merged vocab
    * (w`iters`) keyed by term, looked up per corpus token. */
  private def bpeEncodeOracle(iters: Int): String =
    bpeChain(iters) + s""",
      enc AS (SELECT term,
                     LEN(LIST_FILTER(STR_SPLIT(word_sym, '|'), x -> x <> '')) AS n_syms
              FROM w$iters),
      tk AS (SELECT doc_id, UNNEST(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS term
             FROM documents),
      agg AS (SELECT doc_id, COUNT(*) AS n_words, SUM(n_syms) AS n_bpe_tokens
              FROM tk JOIN enc USING (term) GROUP BY 1)
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
             CAST((1000 * n_bpe_tokens) // n_words AS BIGINT) AS expansion_milli
      FROM agg"""

  /** PII patterns, restricted to the Java∩RE2 common dialect (character
    * classes, bounded repeats, ASCII \b — no lookaround, no backrefs) so
    * Spark and the DuckDB oracle match identical spans. */
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiPhone = "\\b555-[0-9]{4}\\b"
  private[graft] val PiiIp = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val oracles: Map[String, String] = Map(
    "t01_token_count" -> """
      SELECT doc_id, lang,
             CAST(LEN(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS INT) AS n_tokens
      FROM documents""",

    "t02_lang_stats" -> """
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(SUM(CAST(LEN(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS BIGINT)) AS BIGINT) AS sum_tokens
      FROM documents
      GROUP BY lang""",

    "t06_bigram_freq" -> """
      SELECT bigram, COUNT(*) AS n
      FROM (
        SELECT UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-1),
                      i -> tk[i] || ' ' || tk[i+1])) AS bigram
        FROM (SELECT LIST_FILTER(STR_SPLIT(text, ' '), x -> x <> '') AS tk FROM documents)
        WHERE LEN(tk) >= 2)
      GROUP BY bigram
      HAVING COUNT(*) >= 5""",

    "t03_quality_score" -> """
      SELECT doc_id, n_chars, CAST(n_tokens AS INT) AS n_tokens,
             CAST(n_stopwords AS INT) AS n_stopwords, CAST(n_unique AS INT) AS n_unique,
             (1000 * n_stopwords) // GREATEST(n_tokens, 1) AS stop_ratio_milli,
             (1000 * n_unique) // GREATEST(n_tokens, 1) AS uniq_ratio_milli
      FROM (
        SELECT doc_id, n_chars,
               LEN(toks) AS n_tokens,
               LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t))) AS n_stopwords,
               LEN(LIST_DISTINCT(toks)) AS n_unique
        FROM (SELECT doc_id, n_chars, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS toks FROM documents))""",

    // argmax as GREATEST over zero-padded "hits|lang" strings: numeric on
    // hits, ties to the lexicographically-last language — exactly the
    // semantics of Spark's array_max over struct(hits, lang)
    "t04_lang_id" -> """
      WITH d AS (SELECT lang, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk FROM documents),
      h AS (SELECT lang,
        LEN(LIST_FILTER(tk, t -> LIST_CONTAINS(['the','and','of','to','in','is'], t))) AS h_en,
        LEN(LIST_FILTER(tk, t -> LIST_CONTAINS(['der','die','und','das','ist','nicht'], t))) AS h_de,
        LEN(LIST_FILTER(tk, t -> LIST_CONTAINS(['el','la','de','los','que','es'], t))) AS h_es,
        LEN(LIST_FILTER(tk, t -> LIST_CONTAINS(['le','la','les','et','des','est'], t))) AS h_fr,
        LEN(LIST_FILTER(tk, t -> LIST_CONTAINS(['de','le','shi','bu','wo','zai'], t))) AS h_zh
        FROM d),
      p AS (SELECT lang, STR_SPLIT(GREATEST(
          printf('%010d|%s', h_en, 'en'), printf('%010d|%s', h_de, 'de'),
          printf('%010d|%s', h_es, 'es'), printf('%010d|%s', h_fr, 'fr'),
          printf('%010d|%s', h_zh, 'zh')), '|')[2] AS pred_lang FROM h)
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
      FROM p GROUP BY lang""",

    "t07_hash_split" -> """
      SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM (
        SELECT n_chars,
               CASE WHEN b % 100 < 80 THEN 'train'
                    WHEN b % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT n_chars,
                     CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) AS b
              FROM documents))
      GROUP BY split""",

    "t09_stratified_sample" -> """
      SELECT lang, COUNT(*) AS n_sampled, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
      FROM (
        SELECT lang, n_chars,
               CAST(CONCAT('0x', SUBSTRING(md5(CONCAT(lang, '|', CAST(doc_id AS VARCHAR))), 1, 4)) AS BIGINT) AS b
        FROM documents)
      WHERE b % 100 < 10
      GROUP BY lang""",

    "t08_doc_top_terms" -> """
      WITH tf AS (
        SELECT doc_id, UNNEST(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS term
        FROM documents),
      tfc AS (SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
      dfc AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tfc GROUP BY term)
      SELECT doc_id, CAST(rank AS INT) AS rank, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
      FROM (
        SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df,
               ROW_NUMBER() OVER (PARTITION BY tfc.doc_id
                                  ORDER BY tfc.tf DESC, dfc.df, tfc.term) AS rank
        FROM tfc JOIN dfc USING (term))
      WHERE rank <= 3""",

    "t17_gopher_repetition" -> """
      WITH d AS (SELECT doc_id, LIST_FILTER(STR_SPLIT(
               text || CASE WHEN doc_id % 10 = 0 THEN REPEAT(' loop alpha beta gamma delta', 3) ELSE '' END,
               ' '), t -> t <> '') AS tk FROM documents),
      base AS (
        SELECT doc_id, LEN(tk) AS n_tokens,
               COALESCE(LIST_SUM(LIST_TRANSFORM(tk, t -> LEN(t))), 0) AS tok_chars
        FROM d),
      top2 AS (
        SELECT doc_id, MAX(c * (LEN(g) - 1)) AS top2_chars FROM (
          SELECT doc_id, g, COUNT(*) AS c FROM (
            SELECT doc_id, UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-1),
                           i -> tk[i] || ' ' || tk[i+1])) AS g
            FROM d WHERE LEN(tk) >= 2)
          GROUP BY doc_id, g)
        GROUP BY doc_id),
      five AS (
        SELECT doc_id, UNNEST(GENERATE_SERIES(1, LEN(tk)-4)) AS p,
               UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-4),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])) AS g
        FROM d WHERE LEN(tk) >= 5),
      dupstarts AS (
        SELECT doc_id, p FROM (
          SELECT doc_id, p, COUNT(*) OVER (PARTITION BY doc_id, g) AS c FROM five)
        WHERE c >= 2),
      cov AS (
        SELECT doc_id, COUNT(*) AS cov5 FROM (
          SELECT DISTINCT doc_id, cp FROM (
            SELECT doc_id, UNNEST(GENERATE_SERIES(p, p+4)) AS cp FROM dupstarts))
        GROUP BY doc_id)
      SELECT base.doc_id,
             CAST(n_tokens AS INT) AS n_tokens,
             CAST(tok_chars AS BIGINT) AS tok_chars,
             CAST(COALESCE(top2_chars, 0) AS BIGINT) AS top2_chars,
             CAST(COALESCE(cov5, 0) AS BIGINT) AS cov5,
             CAST((1000 * COALESCE(top2_chars, 0)) // GREATEST(tok_chars, 1) AS BIGINT) AS top2_milli,
             CAST((1000 * COALESCE(cov5, 0)) // GREATEST(n_tokens, 1) AS BIGINT) AS dup5_cov_milli,
             CASE WHEN (1000 * COALESCE(top2_chars, 0)) // GREATEST(tok_chars, 1) > 200 THEN 'rep_2gram'
                  WHEN (1000 * COALESCE(cov5, 0)) // GREATEST(n_tokens, 1) > 300 THEN 'rep_5gram'
                  ELSE 'keep' END AS verdict
      FROM base
      LEFT JOIN top2 ON base.doc_id = top2.doc_id
      LEFT JOIN cov ON base.doc_id = cov.doc_id""",

    "t18_source_cap" -> """
      WITH scored AS (
        SELECT source, doc_id,
               (1000 * LEN(LIST_DISTINCT(tk))) // GREATEST(LEN(tk), 1) AS uniq_ratio_milli
        FROM (SELECT source, doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk
              FROM documents)),
      r AS (SELECT source, doc_id, uniq_ratio_milli,
                   ROW_NUMBER() OVER (PARTITION BY source
                                      ORDER BY uniq_ratio_milli DESC, doc_id) AS rank
            FROM scored)
      SELECT source, CAST(rank AS INT) AS rank, doc_id,
             CAST(uniq_ratio_milli AS BIGINT) AS uniq_ratio_milli
      FROM r WHERE rank <= 10""",

    "t10_repetition_ratio" -> """
      SELECT doc_id,
             CAST(n_shingles AS INT) AS n_shingles,
             CAST(n_distinct AS INT) AS n_distinct,
             (1000 * (n_shingles - n_distinct)) // n_shingles AS dup_ratio_milli
      FROM (
        SELECT doc_id,
               GREATEST(LEN(tk) - 2, 1) AS n_shingles,
               CASE WHEN LEN(tk) = 0 THEN 1
                    WHEN LEN(tk) < 3 THEN 1
                    ELSE LEN(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk) - 2),
                                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))
               END AS n_distinct
        FROM (SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk FROM documents))""",

    "t11_rarity_score" -> """
      WITH post AS (
        SELECT doc_id, UNNEST(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS term
        FROM documents),
      vocab AS (SELECT term, COUNT(*) AS cnt FROM post GROUP BY term)
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(1000000 // cnt) AS BIGINT) AS rarity_sum,
             CAST(SUM(1000000 // cnt) // COUNT(*) AS BIGINT) AS mean_rarity
      FROM post JOIN vocab USING (term)
      GROUP BY doc_id""",

    "t12_token_packing" -> """
      SELECT doc_id, lang, shard, CAST(n_tokens AS INT) AS n_tokens,
             CAST(cum_tokens AS BIGINT) AS cum_tokens,
             CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS seq_id
      FROM (
        SELECT doc_id, lang, doc_id // 100 AS shard,
               LEN(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS n_tokens,
               SUM(LEN(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')))
                 OVER (PARTITION BY lang, doc_id // 100 ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
        FROM documents)""",

    "t13_quality_filter" -> """
      SELECT doc_id,
             CAST(n_tokens AS INT) AS n_tokens,
             (1000 * n_unique) // GREATEST(n_tokens, 1) AS uniq_ratio_milli,
             (1000 * (n_shingles - n_distinct)) // n_shingles AS dup_ratio_milli,
             CASE WHEN n_tokens < 10 THEN 'too_short'
                  WHEN (1000 * n_unique) // GREATEST(n_tokens, 1) < 300 THEN 'low_diversity'
                  WHEN (1000 * (n_shingles - n_distinct)) // n_shingles > 300 THEN 'repetitive'
                  ELSE 'keep' END AS verdict
      FROM (
        SELECT doc_id,
               LEN(tk) AS n_tokens,
               LEN(LIST_DISTINCT(tk)) AS n_unique,
               GREATEST(LEN(tk) - 2, 1) AS n_shingles,
               CASE WHEN LEN(tk) < 3 THEN 1
                    ELSE LEN(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk) - 2),
                                           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])))
               END AS n_distinct
        FROM (SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk FROM documents))""",

    "t14_corpus_card" -> """
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
             CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
             CAST(SUM(n_tokens) // COUNT(*) AS BIGINT) AS mean_tokens,
             (1000 * (COUNT(*) - COUNT(DISTINCT h))) // COUNT(*) AS dup_ratio_milli
      FROM (
        SELECT source, lang, n_chars,
               CAST(LEN(LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')) AS BIGINT) AS n_tokens,
               MD5(text) AS h
        FROM documents)
      GROUP BY source""",

    "t05_fingerprint" -> """
      SELECT doc_id,
             list_reduce(list_prepend('graftseed', LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '')),
                         (acc, x) -> md5(acc || x)) AS fingerprint
      FROM documents""",

    "t15_pii_redact" -> """
      WITH aug AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 4 = 0 THEN ' contact agent' || CAST(doc_id AS VARCHAR) || '@example.com now'
                            WHEN doc_id % 4 = 1 THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
                            WHEN doc_id % 4 = 2 THEN ' node 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' up'
                            ELSE '' END AS t
        FROM documents),
      r AS (
        SELECT doc_id, t,
               regexp_replace(regexp_replace(regexp_replace(t,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
                 '\b555-[0-9]{4}\b', '[PHONE]', 'g') AS red
        FROM aug)
      SELECT doc_id,
             CAST(LEN(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
             CAST(LEN(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS INT) AS n_phones,
             CAST(LEN(regexp_extract_all(t, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
             md5(red) AS redacted_md5,
             CAST(LEN(red) AS INT) AS n_chars_clean
      FROM r""",

    "t16_model_score" -> """
      WITH f AS (
        SELECT doc_id,
               LEN(toks) AS n_tokens,
               LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t))) AS n_stop,
               LEN(LIST_DISTINCT(toks)) AS n_unique
        FROM (SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS toks FROM documents)),
      g AS (
        SELECT doc_id,
               3 * ((1000 * n_unique) // GREATEST(n_tokens, 1))
                 - 2 * ((1000 * n_stop) // GREATEST(n_tokens, 1))
                 + 5 * LEAST(n_tokens, 100) - 1500 AS logit_milli
        FROM f)
      SELECT doc_id, CAST(logit_milli AS BIGINT) AS logit_milli,
             CASE WHEN logit_milli > 0 THEN 'keep' ELSE 'drop' END AS label
      FROM g""",

    // weights, the hash-bucket extra-copy rule, and the epoch fan-out all
    // replayed in exact integer arithmetic
    "t19_mixture_epochs" -> """
      WITH w AS (
        SELECT doc_id, source,
               CAST(250 + (CAST(SUBSTRING(source, 4) AS INT) % 8) * 500 AS BIGINT) AS weight_milli,
               CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 1000 AS b
        FROM documents),
      c AS (
        SELECT doc_id, source, weight_milli,
               weight_milli // 1000
                 + CASE WHEN b < weight_milli % 1000 THEN 1 ELSE 0 END AS n_copies
        FROM w)
      SELECT doc_id, source, weight_milli, CAST(n_copies AS BIGINT) AS n_copies,
             UNNEST(GENERATE_SERIES(0, n_copies - 1)) AS epoch
      FROM c WHERE n_copies > 0""",

    "t20_bpe_learn" -> bpeOracle(6),
    "t22_bpe_encode" -> bpeEncodeOracle(6),

    "p01_training_mix" -> """
      WITH d AS (
        SELECT doc_id, lang, text,
               LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk
        FROM documents),
      d2 AS (SELECT *, LEN(tk) AS n_tokens, doc_id % 97 = 0 AS is_eval FROM d),
      q AS (
        SELECT * FROM d2
        WHERE NOT is_eval AND n_tokens >= 10
          AND (1000 * LEN(LIST_DISTINCT(tk))) // GREATEST(n_tokens, 1) >= 300),
      dd AS (
        SELECT * FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(LOWER(text))
                                       ORDER BY doc_id) AS rn
          FROM q) WHERE rn = 1),
      ev AS (
        SELECT DISTINCT UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                 GENERATE_SERIES(1, LEN(tk) - 2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
        FROM d2 WHERE is_eval AND LEN(tk) >= 3),
      cont AS (
        SELECT doc_id FROM (
          SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                   GENERATE_SERIES(1, LEN(tk) - 2),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
          FROM dd WHERE LEN(tk) >= 3) x
        JOIN ev USING (sh)
        GROUP BY doc_id HAVING COUNT(*) >= 3),
      clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
      train AS (
        SELECT doc_id, lang, doc_id // 100 AS shard, n_tokens FROM clean
        WHERE CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 < 80)
      SELECT doc_id, lang, CAST(n_tokens AS INT) AS n_tokens,
             CAST((cum - n_tokens) // 2048 AS BIGINT) AS seq_id
      FROM (SELECT *, SUM(n_tokens) OVER (PARTITION BY lang, shard
                                          ORDER BY doc_id) AS cum
            FROM train)""",

    "t23_bigram_lm_score" -> """
      WITH d AS (
        SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk,
               CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS b
        FROM documents),
      d2 AS (SELECT doc_id, tk, b < 80 AS is_train FROM d WHERE LEN(tk) >= 2),
      bg AS (
        SELECT doc_id, is_train,
               UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk) - 1),
                 i -> {'w1': tk[i], 'w2': tk[i+1]})) AS g
        FROM d2),
      bgf AS (SELECT doc_id, is_train, g.w1 AS w1, g.w2 AS w2 FROM bg),
      big AS (SELECT w1, w2, COUNT(*) AS cnt_big FROM bgf WHERE is_train GROUP BY 1, 2),
      uni AS (SELECT w1, SUM(cnt_big) AS cnt_uni FROM big GROUP BY 1),
      sc AS (
        SELECT doc_id,
               CASE WHEN cnt_big IS NOT NULL THEN (1000 * cnt_uni) // cnt_big
                    WHEN cnt_uni IS NOT NULL THEN 1000 * (cnt_uni + 1)
                    ELSE 1000000 END AS s
        FROM bgf LEFT JOIN big USING (w1, w2) LEFT JOIN uni USING (w1)
        WHERE NOT is_train)
      SELECT doc_id, COUNT(*) AS n_bigrams,
             CAST(SUM(s) AS BIGINT) AS surprise_sum,
             CAST(SUM(s) // COUNT(*) AS BIGINT) AS ppl_milli,
             CASE WHEN SUM(s) // COUNT(*) <= 32000 THEN 'keep' ELSE 'drop' END AS verdict
      FROM sc GROUP BY doc_id""",

    // the full doc-local rewrite replayed: 5-gram list, first-index repeat
    // test, span union, index-aware filter (DuckDB lambda indexes are
    // 1-based where Spark's are 0-based — hence i vs i + 1)
    "t21_dedup_rewrite" -> """
      WITH d AS (
        SELECT doc_id,
               LIST_FILTER(STR_SPLIT(text || CASE WHEN doc_id % 10 = 0
                             THEN REPEAT(' loop alpha beta gamma delta', 3) ELSE '' END, ' '),
                           t -> t <> '') AS tk
        FROM documents),
      g AS (
        SELECT doc_id, tk,
               LIST_TRANSFORM(GENERATE_SERIES(1, GREATEST(LEN(tk) - 4, 0)),
                 i -> ARRAY_TO_STRING(tk[i:i+4], ' ')) AS gs
        FROM d),
      c AS (
        SELECT doc_id, tk,
               LIST_DISTINCT(FLATTEN(LIST_TRANSFORM(
                 LIST_FILTER(GENERATE_SERIES(1, LEN(gs)),
                   p -> LIST_POSITION(gs, gs[p]) < p),
                 p -> GENERATE_SERIES(p, p + 4)))) AS rm
        FROM g)
      SELECT doc_id, CAST(LEN(tk) AS INT) AS n_tokens,
             CAST(LEN(rm) AS INT) AS n_removed,
             COALESCE(ARRAY_TO_STRING(LIST_FILTER(tk, (t, i) -> NOT LIST_CONTAINS(rm, i)), ' '), '') AS clean_text
      FROM c""",

    // t16's feature/logit CTEs verbatim, then one shared integer decile
    // formula (((rank−1)·10) // n + 1 — NOT NTILE, whose tie handling
    // neither engine should be trusted to share) and milli rates
    "t24_score_lift" -> """
      WITH f AS (
        SELECT doc_id,
               LEN(toks) AS n_tokens,
               LEN(LIST_FILTER(toks, t -> LIST_CONTAINS(['the','a','of','and','to','in','is','on','for','with'], t))) AS n_stop,
               LEN(LIST_DISTINCT(toks)) AS n_unique,
               CASE WHEN LIST_CONTAINS(toks, 'spark') THEN 1 ELSE 0 END AS pos
        FROM (SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS toks FROM documents)),
      g AS (
        SELECT doc_id, pos,
               3 * ((1000 * n_unique) // GREATEST(n_tokens, 1))
                 - 2 * ((1000 * n_stop) // GREATEST(n_tokens, 1))
                 + 5 * LEAST(n_tokens, 100) - 1500 AS logit_milli
        FROM f),
      r AS (
        SELECT pos,
               ROW_NUMBER() OVER (ORDER BY logit_milli DESC, doc_id) AS rk,
               COUNT(*) OVER () AS n
        FROM g),
      d AS (
        SELECT CAST(((rk - 1) * 10) // n + 1 AS INT) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               MAX(n) AS n
        FROM r GROUP BY 1)
      SELECT decile, n_docs, n_pos,
             CAST((1000 * SUM(n_pos) OVER (ORDER BY decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                  // GREATEST(SUM(n_pos) OVER (), 1) AS BIGINT) AS capture_milli,
             CAST((1000 * n_pos * n)
                  // GREATEST(n_docs * SUM(n_pos) OVER (), 1) AS BIGINT) AS lift_milli
      FROM d""",

    // 1-based inclusive list slicing replays Spark's slice(tk, start, 64)
    // (both clamp at the list end); empty docs yield one empty chunk
    "t25_rag_chunking" -> """
      WITH d AS (
        SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk
        FROM documents),
      n AS (
        SELECT doc_id, tk,
               1 + (GREATEST(LEN(tk) - 64, 0) + 47) // 48 AS nc
        FROM d),
      c AS (
        SELECT doc_id, tk, UNNEST(GENERATE_SERIES(0, nc - 1)) AS chunk_id
        FROM n)
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
             CAST(chunk_id * 48 + 1 AS INT) AS start_tok,
             CAST(LEN(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS INT) AS n_chunk_tokens,
             COALESCE(ARRAY_TO_STRING(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' '), '') AS chunk_text,
             md5(COALESCE(ARRAY_TO_STRING(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' '), '')) AS chunk_md5
      FROM c""",

    // t25's chunk CTEs, then the md5-stub embedding and the exact integer
    // dot-product top-5 replayed relationally (join on the dim index)
    "p02_retrieval_index" -> """
      WITH d AS (
        SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk
        FROM documents),
      n AS (
        SELECT doc_id, tk,
               1 + (GREATEST(LEN(tk) - 64, 0) + 47) // 48 AS nc
        FROM d),
      c AS (
        SELECT doc_id, tk, UNNEST(GENERATE_SERIES(0, nc - 1)) AS chunk_id
        FROM n),
      ch AS (
        SELECT doc_id, chunk_id,
               md5(COALESCE(ARRAY_TO_STRING(tk[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' '), '')) AS chunk_md5
        FROM c),
      e AS (
        SELECT doc_id, chunk_id, t.j,
               CAST(CONCAT('0x', SUBSTRING(md5(chunk_md5 || '|' || t.j), 1, 8)) AS BIGINT) % 2001 - 1000 AS v
        FROM ch, UNNEST(GENERATE_SERIES(0, 7)) AS t(j)),
      s AS (
        SELECT q.doc_id AS q_doc, q.chunk_id AS q_chunk,
               c2.doc_id AS doc_id, c2.chunk_id AS chunk_id,
               CAST(SUM(q.v * c2.v) AS BIGINT) AS score
        FROM e q JOIN e c2 ON q.j = c2.j
        WHERE q.doc_id < 2 AND c2.doc_id >= 2
        GROUP BY 1, 2, 3, 4),
      r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_doc, q_chunk
                    ORDER BY score DESC, doc_id, chunk_id) AS rank
        FROM s)
      SELECT q_doc, CAST(q_chunk AS INT) AS q_chunk, CAST(rank AS INT) AS rank,
             doc_id, CAST(chunk_id AS INT) AS chunk_id, score
      FROM r WHERE rank <= 5""",

    "t26_contamination_severity" -> """
      WITH d AS (SELECT doc_id, LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk FROM documents),
      tsh AS (
        SELECT DISTINCT doc_id AS train_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
        FROM d WHERE doc_id % 97 <> 0 AND LEN(tk) >= 3),
      esh AS (
        SELECT DISTINCT doc_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
        FROM d WHERE doc_id % 97 = 0 AND LEN(tk) >= 3),
      ov AS (
        SELECT doc_id, MAX(hits) AS max_overlap FROM (
          SELECT esh.doc_id, tsh.train_id, COUNT(*) AS hits
          FROM esh JOIN tsh USING (sh)
          GROUP BY 1, 2)
        GROUP BY 1)
      SELECT e.doc_id,
             CAST(COALESCE(ov.max_overlap, 0) AS BIGINT) AS max_overlap,
             CASE WHEN COALESCE(ov.max_overlap, 0) >= 10 THEN 'critical'
                  WHEN COALESCE(ov.max_overlap, 0) >= 3 THEN 'high'
                  WHEN COALESCE(ov.max_overlap, 0) >= 1 THEN 'low'
                  ELSE 'clean' END AS severity
      FROM (SELECT doc_id FROM d WHERE doc_id % 97 = 0) e
      LEFT JOIN ov ON ov.doc_id = e.doc_id""",

    "p03_incremental_ingest" -> """
      WITH d AS (
        SELECT doc_id, text,
               LIST_FILTER(STR_SPLIT(text, ' '), t -> t <> '') AS tk,
               CAST(CONCAT('0x', SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS bucket,
               md5(LOWER(text)) AS k
        FROM documents),
      base AS (SELECT * FROM d WHERE bucket < 80),
      arr AS (SELECT * FROM d WHERE bucket >= 80),
      bsh AS (
        SELECT DISTINCT doc_id AS base_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
        FROM base WHERE LEN(tk) >= 3),
      ash AS (
        SELECT DISTINCT doc_id,
               UNNEST(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(tk)-2),
                 i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS sh
        FROM arr WHERE LEN(tk) >= 3),
      near AS (
        SELECT DISTINCT doc_id FROM (
          SELECT ash.doc_id, bsh.base_id, COUNT(*) AS hits
          FROM ash JOIN bsh USING (sh)
          GROUP BY 1, 2)
        WHERE hits >= 3),
      ex AS (SELECT DISTINCT a.doc_id FROM arr a JOIN base b ON a.k = b.k),
      v AS (
        SELECT a.doc_id, a.tk,
               CASE WHEN ex.doc_id IS NOT NULL THEN 'exact_dup'
                    WHEN near.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'ingested' END AS verdict,
               1 + (GREATEST(LEN(a.tk) - 64, 0) + 47) // 48 AS nc
        FROM arr a
        LEFT JOIN ex ON ex.doc_id = a.doc_id
        LEFT JOIN near ON near.doc_id = a.doc_id)
      SELECT doc_id, verdict,
             CAST(CASE WHEN verdict = 'ingested' THEN nc ELSE 0 END AS BIGINT) AS n_chunks,
             CAST(CASE WHEN verdict = 'ingested' THEN LEN(LIST_DISTINCT(
               LIST_TRANSFORM(GENERATE_SERIES(0, CAST(nc AS INT) - 1),
                 c -> CAST(CONCAT('0x', SUBSTRING(md5(CONCAT(doc_id, ':', c)), 1, 4)) AS BIGINT) % 16)))
               ELSE 0 END AS BIGINT) AS n_shards
      FROM v"""
  )
}
