package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data curation operators — the pipeline stages that sit between
  * a raw crawled corpus and a training run: eval-set decontamination,
  * repetition filtering, PII masking, stratified sampling, sequence
  * packing, and deterministic shard shuffling.
  *
  * Reference analogue: project-cortex curates its index corpus with hash
  * change-detection and chunk budgeting (internal/indexer/processor.go,
  * chunker.go:31); these operators generalize that curation stage to what
  * a 100 TB LLM training pipeline runs. The filtering heuristics follow
  * the published corpus-curation recipes (C4-style cleaning, Gopher
  * repetition rules, eval n-gram decontamination).
  *
  * Scale posture: everything here is one documents scan plus codegen'd
  * array/string expressions per row; the only shuffles are the explicit
  * per-key aggregations (decontamination hit counts) and the window
  * partitions (packing by source, shard ordering) — each a single
  * exchange on a key a 1000-executor cluster would partition by anyway.
  * The eval-holdout gram set broadcasts: eval corpora are MBs against a
  * 100 TB train side, exactly the asymmetry broadcast joins want.
  */
object CurateOps {

  private def tokens(c: Column): Column = graft.functions.Tokenize.tokens(c)

  private def shift(a: Column, by: Int): Column =
    graft.functions.Tokenize.shift(a, by)

  /** Positional word n-grams (n = 2 or 4) as space-joined strings, built
    * with the zip_with shift-chain (see TextOps.winnowed): b2[i] =
    * t[i]+" "+t[i+1], g4[i] = b2[i]+" "+b2[i+2] — array arguments of
    * zip_with are evaluated once per row, where indexing into an inlined
    * array expression re-evaluates it per element (the measured 10×+
    * duplication trap). Trimmed to the size-n+1 full grams; docs shorter
    * than n tokens get an empty array. */
  private[graft] def withGrams(df: DataFrame, n: Int, out: String): DataFrame = {
    require(n == 2 || n == 4, "gram sizes used by the curation ops")
    // one native pass (NGramJoin) — byte-identical to the former zip_with
    // shift-chain, whose interpreted lambdas + per-stage intermediate
    // arrays were the dominant cost of every gram-consuming op
    df.withColumn("_t", tokens(col("text")))
      .withColumn(out, graft.functions.ArrayFunctions.ngramJoin(col("_t"), n))
      .drop("_t")
  }

  /** Every doc_id divisible by this is the deterministic eval holdout —
    * the stand-in for a real pipeline's benchmark/eval corpus. Shared
    * with the oracle SQL (SparkEntry interpolates it). */
  val HoldoutMod = 97

  /** Decontamination n-gram size. Real pipelines use 8–13-token grams;
    * the synthetic corpus draws from a ~40-word vocabulary, so 4-grams
    * give the same discriminative behavior (collisions exist but are
    * rare) at this vocabulary size. The machinery is n-independent. */
  val DecontamN = 4

  /** Eval-set decontamination: flag training documents sharing any
    * [[DecontamN]]-token gram with the eval holdout, with the shared-gram
    * count as evidence. The holdout's distinct gram set BROADCASTS (eval
    * sets are tiny against a 100 TB train corpus); the train side is one
    * scan → gram explode → broadcast semi-ish join → per-doc count, so
    * the only shuffle is the final doc_id aggregation over the (rare)
    * contaminated grams. */
  /** One row per (doc_id, distinct decontamination gram); any extra
    * columns (e.g. a stream's event time) pass through. */
  private[graft] def gramRows(df: DataFrame): DataFrame = {
    val keep = df.columns.filter(_ != "text").map(col) :+
      explode(array_distinct(col("g"))).as("gram")
    withGrams(df, DecontamN, "g").select(keep.toIndexedSeq: _*)
  }

  /** The eval holdout's distinct gram set — broadcast-sized. */
  private[graft] def holdoutGrams(spark: SparkSession, dir: String): DataFrame =
    gramRows(Tables.documents(spark, dir)
        .filter(col("doc_id") % HoldoutMod === 0)
        .select(col("doc_id"), col("text")))
      .select(col("gram")).distinct()

  def curateDecontaminate(spark: SparkSession, dir: String): DataFrame =
    // persisted per (session, dir): the contaminated id set is read by
    // this query, curate_pipeline AND curate_report — one gram join, not
    // three (the holdout side was already memo-shaped via broadcast)
    graft.PlanCache.getOrBuild(spark, dir, "decontam") {
      decontaminateBuild(spark, dir)
    }

  /** Un-memoized [[curateDecontaminate]] plan (for plan-shape specs). */
  private[graft] def decontaminateBuild(spark: SparkSession, dir: String): DataFrame =
    gramRows(Tables.documents(spark, dir)
        .filter(col("doc_id") % HoldoutMod =!= 0)
        .select(col("doc_id"), col("text")))
      .join(broadcast(holdoutGrams(spark, dir)), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))

  /** Gopher-style repetition filter: fraction of duplicate word bigrams
    * and the count share of the single most frequent bigram, plus the
    * keep verdict at the 0.05 thresholds. All per-row array expressions
    * over one scan — no shuffle. The top-bigram share is the maximum run
    * length of the SORTED bigram array, computed with one aggregate()
    * fold — O(d log d) per row against the O(d²) distinct×filter
    * formulation, which measured 1.7 s vs ~0.6 s at sf0.1. */
  /** Both repetition metrics must stay at or under this for a doc to
    * keep its place in the training set. Shared with the oracle SQL and
    * the test suite (the WinnowDfCap drift lesson). */
  val RepetitionMax = 0.05

  /** Adds n_bigrams / dup_bigram_frac / top_bigram_frac / keep to any
    * frame with a `text` column (other columns pass through) — shared by
    * the batch op and the streaming curation gate; all expressions are
    * stateless so the same code runs unmodified over a stream. TOTAL: a
    * doc with fewer than two tokens has no bigrams and scores 0/0/keep
    * (nothing repeats in it) rather than vanishing — the streaming gate
    * must emit a verdict for every admitted document. */
  private[graft] def repetitionScored(df: DataFrame): DataFrame =
    withGrams(df, 2, "gs")
      .withColumn("_nb", size(col("gs")).cast("double"))
      // both fractions come from ONE native sort+scan over the gram
      // array (GramRunStats): the previous array_distinct + array_sort +
      // aggregate-fold ran its lambdas interpreted per ELEMENT (Spark
      // HOFs don't codegen) and allocated a struct per fold step —
      // measured as this op's dominant cost at the sf1 stress scale
      .withColumn("_st", graft.functions.ArrayFunctions.gramRunStats(col("gs")))
      .withColumn("_dup", when(col("_nb") > 0,
        lit(1.0) - col("_st.n_distinct").cast("double") / col("_nb"))
        .otherwise(lit(0.0)))
      .withColumn("_top", when(col("_nb") > 0,
        col("_st.max_run").cast("double") / col("_nb")).otherwise(lit(0.0)))
      .withColumn("n_bigrams", size(col("gs")))
      .withColumn("dup_bigram_frac", round(col("_dup"), 4))
      .withColumn("top_bigram_frac", round(col("_top"), 4))
      .withColumn("keep",
        (col("_dup") <= RepetitionMax && col("_top") <= RepetitionMax)
          .cast("int"))
      .drop("gs", "_nb", "_st", "_dup", "_top")

  def curateRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionScored(
        Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      // the CONTRACT row excludes bigram-less docs (the oracle's
      // len(ts) >= 2 guard); the streaming gate keeps them
      .filter(col("n_bigrams") >= 1)
      .select(col("doc_id"), col("dup_bigram_frac"), col("top_bigram_frac"),
        col("keep"))

  /** PII masking: redact email addresses then digit runs, reporting match
    * counts and the digest of the redacted text. The test corpus is
    * verified PII-free (no '@', no digits), so the op appends a
    * deterministic contact suffix derived from (source, doc_id) to
    * exercise the masking path with real hits — a deployment applies the
    * same expressions to raw text. Counts use the PRE-redaction text for
    * emails and the email-redacted text for numbers (an email's own
    * digits are not double-counted as standalone numbers). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val NumRe = "[0-9]+"

  /** Line-frequency boilerplate removal (the C4/CCNet cleaning step the
    * PII pass sits beside): a LINE shared by more than [[BoilerDf]]
    * distinct documents of the same source is boilerplate (nav bars,
    * footers, license headers) and is stripped from every document; the
    * output carries the removal counts and the digest of the cleaned
    * text. The corpus has no natural repeated lines, so — like the PII
    * op's injected contact suffix — a per-source footer plus a per-doc
    * unique line are appended, exercising both the strip and the keep
    * path; a deployment applies the same expressions to raw text.
    *
    * Shape: census scan (line explode → (source, line) count-distinct —
    * one exchange) reduces to the per-source high-df line set, which is
    * SMALL by construction (only lines shared across > cap docs) and
    * broadcasts back onto a second scan where the strip is a pure array
    * filter — no doc-level shuffle, no re-assembly join. At 100 TB the
    * census is the one statistics pass; hot sources with huge boilerplate
    * vocabularies are bounded because df > cap lines per source cannot
    * exceed (docs_in_source · lines_per_doc) / cap. */
  val BoilerDf = 3

  /** Text under boilerplate analysis: raw text + the injected footer
    * (df = docs-per-source, stripped) + a unique line (df = 1, kept) —
    * shared with the oracle SQL. */
  private def boilerLines: Column =
    split(concat(col("text"), lit("\nfooter generated by "), col("source"),
      lit("\nunique "), col("doc_id").cast("string")), "\n", -1)

  def curateBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), boilerLines.as("ls"))
    val boilerSets = d
      .select(col("doc_id"), col("source"), explode(col("ls")).as("line"))
      .groupBy(col("source"), col("line"))
      .agg(count_distinct(col("doc_id")).as("df"))
      .filter(col("df") > BoilerDf)
      .groupBy(col("source"))
      .agg(collect_list(col("line")).as("bl"))
    d.join(broadcast(boilerSets), Seq("source"), "left")
      .withColumn("_bl",
        coalesce(col("bl"), array().cast("array<string>")))
      .select(col("doc_id"),
        size(col("ls")).as("n_lines"),
        size(filter(col("ls"), l => array_contains(col("_bl"), l)))
          .as("n_removed"),
        md5(array_join(filter(col("ls"),
          l => !array_contains(col("_bl"), l)), "\n")).as("clean_md5"))
  }

  def curatePiiRedact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("_txt", concat(lower(col("text")),
        lit(" contact "), col("source"), lit("@example.com ext "),
        col("doc_id").cast("string")))
      .withColumn("_e", regexp_replace(col("_txt"), EmailRe, "<EMAIL>"))
      .withColumn("_n", regexp_replace(col("_e"), NumRe, "<NUM>"))
      // match counts read off the REPLACED strings (regexp_replace and
      // regexp_extract_all share one matcher semantics, so replacement
      // count = match count): two regex passes instead of four. The
      // markers cannot pre-exist — _txt is lowercased, the markers are
      // uppercase — and cannot overlap (<EMAIL> has no digits).
      .select(col("doc_id"),
        (size(split(col("_e"), "<EMAIL>")) - 1).as("n_emails"),
        (size(split(col("_n"), "<NUM>")) - 1).as("n_numbers"),
        md5(col("_n")).as("redacted_md5"))

  /** Per-language stratified sampling with a DETERMINISTIC hash gate:
    * keep a document iff the first two hex chars of md5(doc_id) fall
    * under the language's threshold (256ths granularity) — en 75%,
    * de/fr 50%, rest 25%. Hash gates are how a distributed pipeline
    * samples reproducibly: no RNG state, no global coordination, any
    * executor can evaluate membership locally, and re-runs produce the
    * identical sample. One scan, filter only. */
  /** Per-language keep rates as 2-hex-digit thresholds (256ths): en 75%,
    * de/fr 50%, rest 25%. Shared with the oracle SQL and the tests. */
  val RateEn = "c0"
  val RateMid = "80"
  val RateLow = "40"

  /** The per-language threshold the hash key is gated against. */
  private[graft] def stratifiedThreshold: Column =
    when(col("lang") === "en", RateEn)
      .when(col("lang").isin("de", "fr"), RateMid)
      .otherwise(RateLow)

  /** The hash key: first two hex chars of md5(doc_id). */
  private[graft] def stratifiedKey: Column =
    substring(md5(col("doc_id").cast("string")), 1, 2)

  def curateSampleStratified(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // NOTE: predicate pushdown re-inlines the hk expression below the
      // Project, so the md5 is still evaluated in both Filter and Project
      // (verified in the executed plan) — the staged column buys shared
      // code with the streaming gate, not a saved evaluation; the double
      // md5 over a short string is accepted as inherent
      .withColumn("hk", stratifiedKey)
      .filter(col("hk") < stratifiedThreshold)
      .select(col("doc_id"), col("lang"), col("hk"))

  /** Token budget per packed training sequence. */
  val PackBudget = 512

  /** Sequence packing: assign documents to fixed-token-budget training
    * sequences by contiguous fill in deterministic (source, doc_id)
    * order — seq_id/seq_offset are the cumulative token offset divided/
    * modulo the budget, so a document straddling a boundary starts the
    * next sequence's worth of tokens without re-scanning. One window
    * shuffle on source (the packing unit a real pipeline partitions by);
    * cumulative sums stream within each partition. */
  /** Contiguous-fill packing over any (doc_id, source, n_tok) frame —
    * ONE definition shared by the stage op and the end-to-end pipeline,
    * so a packing-contract change cannot desynchronize them. */
  private def packed(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("_cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("source"), col("n_tok"),
        floor((col("_cum") - col("n_tok")) / PackBudget).cast("long")
          .as("seq_id"),
        ((col("_cum") - col("n_tok")) % PackBudget).as("seq_offset"))
  }

  /** The per-document token-count relation (doc_id, source, n_tok),
    * persisted and memoized per (session, dir): the packing, mixing,
    * batching, pipeline and report stages all consume exactly this thin
    * projection, and each previously re-ran its own full tokenize scan
    * of the corpus — seven corpus passes per sweep collapse to one
    * materialization (the statistics-relation posture every other
    * PlanCache memo here follows; at cluster scale this is a ~16-byte/row
    * side table built once per corpus snapshot). */
  private[operators] def docTok(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(spark, dir, "doc_ntok") {
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
    }

  def curatePackSequences(spark: SparkSession, dir: String): DataFrame =
    packed(docTok(spark, dir))

  /** Domain-mixing gate granularity: rates quantize to 4096ths (three hex
    * chars of the gate hash), shared with the oracle SQL and the tests. */
  val MixGate = 4096

  /** Target mixing weight per source tier (source number mod 3 → tier):
    * tier 0 domains carry 4× the weight of tier 2, 1 each of the three
    * weights below. Shared with the oracle SQL and the tests. */
  val MixW0 = 4.0
  val MixW1 = 2.0
  val MixW2 = 1.0

  /** The per-source target weight — a static CASE over the source tier,
    * evaluable by any executor with no lookup table. */
  private[graft] def mixWeight: Column =
    when(substring(col("source"), 4, 10).cast("int") % 3 === 0, MixW0)
      .when(substring(col("source"), 4, 10).cast("int") % 3 === 1, MixW1)
      .otherwise(MixW2)

  /** Domain mixing (DoReMi-style static reweighting): downsample each
    * source so the KEPT token mass matches the target weight proportions,
    * retaining as much data as possible — rate_s = c·w_s/tok_s with
    * c = min_s(tok_s/w_s), so the scarcest-per-weight ("binding") tier
    * keeps everything and every other source is trimmed to match it.
    * Rates quantize to [[MixGate]]ths and gate on three hex chars of
    * md5("mix:"+doc_id) — the same deterministic hash-gate discipline as
    * [[curateSampleStratified]] (salted differently so the two samples
    * are independent), reproducible on any executor with no RNG state.
    *
    * Spark shape: two passes over documents — a per-source token
    * aggregate (one shuffle over ~#sources groups) producing a
    * rates table of #sources rows that BROADCASTS back onto the second
    * scan; the gate itself is filter-only. At 100 TB the totals pass is
    * the unavoidable statistics job every mixing run does once; the gate
    * pass is embarrassingly parallel. */
  /** The gate key for a given salt: three hex chars of the salted doc
    * hash as an int in [0, [[MixGate]]) — shared by the batch mixers and
    * the streaming gate, so the gates cannot drift (only salts differ). */
  private[graft] def gateKey(salt: String): Column =
    conv(substring(md5(concat(lit(salt),
      col("doc_id").cast("string"))), 1, 3), 16, 10).cast("int")

  private[graft] def mixGateKey: Column = gateKey("mix:")

  /** The one-scan per-source token census both mixers' rates derive
    * from — a single definition so a tokenization or weight change
    * cannot desynchronize the two statistics passes. */
  private def mixCensus(spark: SparkSession, dir: String): DataFrame =
    docTok(spark, dir)
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).cast("double").as("tok"))
      .withColumn("w", mixWeight)

  /** The per-source rates table (#sources rows) from the statistics pass
    * — broadcast by both the batch op and the streaming ingest gate (a
    * deployment recomputes it per mixing epoch, not per batch). */
  private[graft] def mixRates(spark: SparkSession, dir: String): DataFrame = {
    val totals = mixCensus(spark, dir)
    // c = min(tok/w) as a 1-row frame; cross-joined (broadcast) rather
    // than collect()ed so the whole plan stays one lazy DAG
    val c = totals.agg(min(col("tok") / col("w")).as("c"))
    totals.crossJoin(broadcast(c))
      .select(col("source"),
        // the BINDING source (its tok/w IS the min, bit-for-bit) keeps
        // everything by contract; computing its rate as (tok/w)·w/tok
        // can land at 0.999... in IEEE and floor to MixGate-1, silently
        // dropping ~1/4096 of the scarcest source — so it is pinned to
        // the full gate explicitly (mirrored in the oracle SQL)
        when(col("tok") / col("w") === col("c"), lit(MixGate))
          .otherwise(floor(col("c") * col("w") / col("tok") * MixGate)
            .cast("int"))
          .as("thr"))
  }

  def curateMixDomains(spark: SparkSession, dir: String): DataFrame =
    docTok(spark, dir)
      .join(broadcast(mixRates(spark, dir)), "source")
      .filter(mixGateKey < col("thr"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("thr"))

  /** Epoch mixing with UPSAMPLING — the other half of the mixing story:
    * [[curateMixDomains]] only ever downsamples (max retention at the
    * target mix), which shrinks the corpus when weights are skewed; a
    * training run that wants to KEEP its token budget instead repeats
    * rare high-weight domains (the published LLM data recipes upsample
    * small high-quality sources by 2-5 epochs). Here each source's rate
    * is (w_s/Σw)·T / tok_s — total kept mass stays ≈ the corpus size T —
    * and a document emits floor(rate) full copies plus one more iff the
    * salted hash gate passes the fractional remainder. Copies carry
    * copy_idx so a downstream shuffle can interleave them.
    *
    * Spark shape: the same census + broadcast-rates pattern as
    * [[curateMixDomains]], then a NARROW generate (explode of a
    * per-row sequence) — no extra shuffle; replication happens where
    * the row already lives. */
  def curateMixEpochs(spark: SparkSession, dir: String): DataFrame = {
    val totals = mixCensus(spark, dir)
    val g = totals.agg(sum(col("w")).as("sw"), sum(col("tok")).as("tt"))
    val rates = totals.crossJoin(broadcast(g))
      .withColumn("rate", col("w") / col("sw") * col("tt") / col("tok"))
      .select(col("source"),
        floor(col("rate")).cast("int").as("n_full"),
        floor((col("rate") - floor(col("rate"))) * MixGate).cast("int")
          .as("fthr"))
    docTok(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(broadcast(rates), "source")
      .withColumn("n_copies", col("n_full") +
        when(gateKey("epoch:") < col("fthr"), 1).otherwise(0))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("n_copies"),
        explode(sequence(lit(0), col("n_copies") - 1)).as("copy_idx"))
  }

  /** The END-TO-END pipeline — raw corpus to training sequences in ONE
    * declarative plan, composed entirely from the already-verified
    * stages: [[TextOps.corpusCurate]] admission (quality + language
    * gates, near-dup survivor-representative election), eval-holdout
    * exclusion + [[curateDecontaminate]] drop, then token-budget
    * sequence packing over the surviving set. This is the query a
    * reference user would actually schedule nightly; because it is one
    * lazy DAG, Catalyst sees every stage at once (shared scans stay
    * shared, filters push through the composition) and the oracle
    * verifies the whole composition end-to-end, not just the stages.
    */
  def curatePipeline(spark: SparkSession, dir: String): DataFrame = {
    val admitted = TextOps.corpusCurate(spark, dir).select(col("doc_id"))
    val contaminated = curateDecontaminate(spark, dir).select(col("doc_id"))
    val clean = admitted
      .filter(col("doc_id") % HoldoutMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    packed(docTok(spark, dir).join(clean, "doc_id"))
  }

  /** Batch size and length-bucket width for padding-efficient batching. */
  val BatchSize = 16
  val LenBucket = 64

  /** Padding-efficient length batching — the inference/eval counterpart
    * of sequence packing: grouping similar-length documents into
    * fixed-size batches makes per-batch padding (batch max minus own
    * length) small, where random batching wastes ~half the compute on
    * pad tokens. Scale-safe shape: a GLOBAL length sort would be one
    * giant range exchange; instead documents bucket by length/[[LenBucket]]
    * first (the shuffle key), then order by (n_tok, doc_id) within the
    * bucket — batches never span buckets, so padding is bounded by the
    * bucket width and the whole op is ONE hash exchange. The second
    * window (batch max) reuses the same partitioning: hashpartitioning
    * on the bucket already co-locates every (bucket, batch), so Spark
    * adds only a sort, not another exchange (plan-tested). */
  def curateLengthBatches(spark: SparkSession, dir: String): DataFrame = {
    val byLen = Window.partitionBy(col("lb"))
      .orderBy(col("n_tok"), col("doc_id"))
    val byBatch = Window.partitionBy(col("lb"), col("batch_idx"))
    // the shared relation carries n_tok as long; the contract schema
    // here is int (token counts fit trivially), so cast back
    docTok(spark, dir)
      .select(col("doc_id"), col("n_tok").cast("int").as("n_tok"))
      .withColumn("lb", (col("n_tok") / LenBucket).cast("int"))
      .withColumn("batch_idx",
        ((row_number().over(byLen) - 1) / BatchSize).cast("int"))
      .withColumn("batch_max", max(col("n_tok")).over(byBatch))
      .select(col("doc_id"), col("lb"), col("batch_idx"), col("n_tok"),
        col("batch_max"), (col("batch_max") - col("n_tok")).as("pad"))
  }

  /** Shard count for the deterministic training shuffle (one hex digit). */
  val NumShards = 16

  /** Deterministic global shuffle into training shards: shard = first hex
    * digit of md5(doc_id), in-shard order = full md5 then doc_id — the
    * "shuffle once, read in order" layout training jobs want. One shuffle
    * on the shard key with an in-partition sort; at cluster scale this is
    * exactly `repartition(shard).sortWithinPartitions(hk)` feeding a
    * partitioned writer (see [[writeShards]]). */
  def curateShuffleShards(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("hk"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("shard", conv(substring(col("hk"), 1, 1), 16, 10).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** DSIR target-seed partition (doc_id % [[DsirMod]] == 0 plays the
    * target-domain corpus), hashed-feature bucket count, and the keep
    * quantile — all shared with the oracle SQL. */
  val DsirMod = 7
  val DsirBuckets = 1024
  val DsirKeepQuantile = 0.75

  /** The 100 TB percentile switch (the q13→q13b convention as one
    * runtime conf): exact `percentile` materializes a per-group sorted
    * value list — fine at test SFs, detonating on a 100 TB doc relation —
    * while `percentile_approx` is a mergeable quantile sketch with
    * map-side partial aggregation. [[curateDsir]] and
    * [[curatePplBuckets]] read the flag at plan-build time; drift vs the
    * exact path is pinned ≤2% at sf0.1 in CurateSpec. */
  val ApproxPercentileConf = "spark.graft.approxPercentile"

  private def pct(spark: SparkSession, valueSql: String,
      quantileSql: String): Column =
    if (spark.conf.getOption(ApproxPercentileConf).exists(_.toBoolean))
      expr(s"percentile_approx($valueSql, $quantileSql, 10000)")
    else expr(s"percentile($valueSql, $quantileSql)")

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * arXiv:2302.03169): select raw-corpus documents whose HASHED n-gram
    * feature distribution looks like a target domain. Per document,
    * log importance weight lw = Σ_features [ln p̂_target(f) − ln p̂_raw(f)]
    * over hashed-bigram occurrences ([[DsirBuckets]] buckets, add-one
    * smoothed — the paper's bag-of-hashed-ngrams model), then keep the
    * top (1 − [[DsirKeepQuantile]]) weight quantile. Rank-free gate: the
    * exact-percentile threshold BROADCASTS like curate_ppl_buckets'
    * terciles (percentile_approx at 100 TB, q13b contract), so selection
    * is a filter expression, not a global sort (the paper's Gumbel
    * resampling randomizes the same ordering; the quantile gate is the
    * deterministic variant).
    *
    * Shape: both distribution estimates are aggregates over the SAME
    * feature-explode scan, bounded by [[DsirBuckets]] — the per-bucket
    * log-ratio table is ~1024 rows and BROADCASTS onto the scoring scan
    * (hash-bucketing exists precisely to make the statistics side tiny
    * at any corpus size); one per-doc aggregate ends the plan. Docs with
    * no bigram features carry a null weight and are never kept — a
    * selection stage must surface every input document. */
  def curateDsir(spark: SparkSession, dir: String): DataFrame = {
    // persisted per (session, dir): the target counts, raw counts,
    // totals AND the scoring join all read this relation — without the
    // memo each is its own tokenize+md5 pass over the corpus (measured
    // 3.75 s → 1.1 s at sf0.1)
    val feat = graft.PlanCache.getOrBuild(spark, dir, "dsir_feat") {
      withGrams(Tables.documents(spark, dir)
          .select(col("doc_id"), col("text")), 2, "g")
        .select(col("doc_id"), explode(col("g")).as("gram"))
        .select(col("doc_id"),
          (conv(substring(md5(col("gram")), 1, 15), 16, 10).cast("long")
            % DsirBuckets).as("f"))
    }
    // ONE pass over the feature relation: raw and target counts as
    // conditional aggregates of the same groupBy (count(when) ≡ the
    // former filter+left-join's coalesce(ct, 0)), and both totals derive
    // from the [[DsirBuckets]]-bounded count table (Σct, Σcr) instead of
    // two more corpus-sized count passes — 4 full-relation aggregates
    // collapse to 1 at any scale, identical counts by construction
    val isTgt = col("doc_id") % DsirMod === 0
    // the per-doc weight relation is memoized like curate_ppl_buckets'
    // ppl_lang: the threshold percentile and the final keep join BOTH
    // read it, and without the memo the whole feature-scoring pass ran
    // twice per evaluation (once inside the threshold's broadcast
    // subquery, once in the main plan — broadcast subqueries plan
    // independently, so ReuseExchange cannot unify them)
    val scored = graft.PlanCache.getOrBuild(spark, dir, "dsir_scored") {
      val counts = feat.groupBy(col("f"))
        .agg(count(lit(1)).as("cr"), count(when(isTgt, 1)).as("ct"))
      val consts = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
      val ratios = counts
        .crossJoin(broadcast(consts))
        .select(col("f"),
          (log((col("ct") + 1).cast("double") /
              (col("nt") + DsirBuckets)) -
            log((col("cr") + 1).cast("double") / (col("nr") + DsirBuckets)))
            .as("r"))
      feat.join(broadcast(ratios), "f")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_feat"),
          (round(sum(col("r")), 4) + lit(0.0)).as("lw"))
    }
    val thr = scored.agg(
      round(pct(spark, "lw", s"${DsirKeepQuantile}D"), 4).as("t"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(thr))
      .select(col("doc_id"),
        coalesce(col("n_feat"), lit(0L)).as("n_feat"), col("lw"),
        (col("lw").isNotNull && col("lw") >= col("t")).as("keep"))
  }

  /** Quality-classifier seed partition: doc_id % [[QcSeedMod]] == 0 is
    * the curated "reference" seed (the GPT-3 recipe's WebText role),
    * == 1 the raw-crawl negative seed. Shared with the oracle SQL. */
  val QcSeedMod = 5

  /** GPT-3-style quality classifier (Brown et al. 2020 appendix A): train
    * a linear classifier that separates a curated reference corpus from
    * raw crawl, then score EVERY document and keep the reference-like
    * ones. The classifier here is add-one-smoothed multinomial naive
    * Bayes over tokens — closed-form (two count passes), so the training
    * is expressible as aggregations and the whole train+score pipeline
    * stays one declarative plan (a fastText-style logistic fit would add
    * iterative gradient rounds; NB is the same model family GPT-3's
    * hashed-feature classifier approximates and is exactly computable by
    * the oracle). Seeds are deterministic doc_id partitions at test SFs;
    * at 100 TB the positive seed is a separate curated corpus (MBs–GBs
    * against the crawl, same asymmetry as decontamination's holdout).
    *
    * score(d) = ln(P_docs+/P_docs-) + Σ_t [ln p(t|+) − ln p(t|−)],
    * summed over token OCCURRENCES; tokens unseen in both seeds get the
    * smoothing-only odds ln((N−+V)/(N++V)). keep = score > 0 on the
    * 4-decimal-rounded score, so the verdict is cross-engine stable.
    *
    * Shape: seed token counts are vocabulary-bounded aggregates whose
    * full-outer merge BROADCASTS onto the scoring scan (corpus-sized,
    * one token explode), followed by one per-doc aggregate — the same
    * broadcast-statistics-then-scan shape as text_perplexity, with the
    * Zipfian-key join avoided the same way. Docs with zero tokens
    * surface with the prior alone (a filter must see every document). */
  /** The trained NB model as relations: per-token log-odds table and the
    * constants row (np, pd, nn, nd, v) — shared by the batch classifier
    * and the streaming gate's one-row model build. */
  /** The (doc_id, token) occurrence relation, persisted per (session,
    * dir): seed counts, vocabulary total and the scoring pass all read
    * it — five tokenize passes collapse to one materialization. */
  private def qcTok(spark: SparkSession, dir: String): DataFrame =
    graft.PlanCache.getOrBuild(spark, dir, "qc_tok") {
      Tables.documents(spark, dir)
        .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    }

  private[graft] def qualityModel(spark: SparkSession,
      dir: String): (DataFrame, DataFrame) = {
    val isPos = col("doc_id") % QcSeedMod === 0
    val isNeg = col("doc_id") % QcSeedMod === 1
    // ONE token-key exchange over the seed rows yields the per-class
    // vocab counts — and every corpus-sized constant then DERIVES from
    // that vocabulary-bounded table instead of its own pass over the
    // seed tokens: np/nn are Σcp/Σcn, v is the vocab row count. The two
    // distinct-doc counts (pd/nd) come from the thin per-doc token-count
    // memo: a doc appears in qcTok iff it has ≥1 token, i.e. n_tok > 0 —
    // identical counts, a 50k-row scan instead of a corpus-token scan.
    //
    // Both model relations are MEMOIZED per (session, dir) — the k-means
    // quantizer precedent: training is index-time work. Without the memo
    // the seed-token aggregate re-ran inside every broadcast subquery of
    // every evaluation (broadcast subqueries plan their subtrees
    // independently, so ReuseExchange never unifies them across
    // subqueries — measured 3× the seed scan per run, 21 jobs).
    val vocabCounts = graft.PlanCache.getOrBuild(spark, dir, "qc_lo_counts") {
      qcTok(spark, dir).filter(isPos || isNeg).groupBy(col("t"))
        .agg(count(when(isPos, 1)).as("cp"), count(when(isNeg, 1)).as("cn"))
    }
    val consts = graft.PlanCache.getOrBuild(spark, dir, "qc_model_consts") {
      val docConsts = docTok(spark, dir).filter(col("n_tok") > 0).agg(
        count(when(isPos, 1)).as("pd"),
        count(when(isNeg, 1)).as("nd"))
      vocabCounts
        // coalesce: an empty vocabulary must yield the former count()'s 0,
        // not sum()'s null (degenerate-corpus fixtures)
        .agg(coalesce(sum(col("cp")), lit(0L)).as("np"),
          coalesce(sum(col("cn")), lit(0L)).as("nn"),
          count(lit(1)).as("v"))
        .crossJoin(docConsts)
        .select(col("np"), col("pd"), col("nn"), col("nd"), col("v"))
    }
    val lo = graft.PlanCache.getOrBuild(spark, dir, "qc_model_lo") {
      vocabCounts
        .crossJoin(broadcast(consts))
        .select(col("t"),
          (log((col("cp") + 1).cast("double") / (col("np") + col("v"))) -
            log((col("cn") + 1).cast("double") / (col("nn") + col("v"))))
            .as("lo"))
    }
    (lo, consts)
  }

  /** The model collapsed to ONE broadcastable row for the streaming
    * ingest gate: token→log-odds map, the unseen-token default, and the
    * document prior. The map is vocabulary-bounded; a production gate
    * over an open vocabulary hashes tokens into a fixed bucket space
    * first (curate_dsir's trick), keeping the row O(buckets). */
  private[graft] def qualityModelRow(spark: SparkSession,
      dir: String): DataFrame = {
    val (lo, consts) = qualityModel(spark, dir)
    lo.agg(map_from_entries(collect_list(struct(col("t"), col("lo"))))
        .as("lo_map"))
      .crossJoin(consts.select(
        log(col("pd").cast("double") / col("nd")).as("prior"),
        log((col("nn") + col("v")).cast("double") / (col("np") + col("v")))
          .as("def_lo")))
  }

  def curateQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val tok = qcTok(spark, dir)
    val (lo, consts) = qualityModel(spark, dir)
    val scored = tok.join(broadcast(lo), Seq("t"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        coalesce(col("lo"),
          log((col("nn") + col("v")).cast("double") / (col("np") + col("v"))))
          .as("lo"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lo")).as("slo"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        // + 0.0 collapses IEEE -0.0 (a sum rounding to zero from below)
        // to +0.0 — the two stringify differently in the driver's hash
        (round(log(col("pd").cast("double") / col("nd")) +
          coalesce(col("slo"), lit(0.0)), 4) + lit(0.0)).as("score"))
      .withColumn("keep", col("score") > 0)
  }

  /** CCNet-style perplexity buckets (Wenzek et al. 2020): rank every
    * document by its LM perplexity WITHIN its language and split each
    * language into head / middle / tail terciles — the quality tiers
    * CCNet publishes its corpus in (head ≈ most Wikipedia-like; tail ≈
    * noise; training recipes pick per-tier mixing rates). The LM is the
    * self-trained bigram model of [[TextOps.textPerplexity]].
    *
    * Shape: the threshold pass is a per-language EXACT percentile
    * aggregate over the doc-level (doc_id, lang, ppl) relation — rows ∝
    * documents, one key shuffle — and the resulting languages×2
    * thresholds table BROADCASTS onto a second pass that assigns buckets
    * as a pure filter expression. No per-language global sort, no
    * low-cardinality window partition (5 languages would mean 5 straggler
    * partitions at 100 TB). At cluster scale swap the exact percentile
    * for percentile_approx exactly as q13 → q13b does — exact percentile
    * buffers each group's values, the sketch shuffles thin and merges
    * (accuracy contract pinned by q13b's test).
    *
    * Docs with no defined perplexity (< 2 tokens ⇒ no bigrams) land in an
    * explicit `undef` bucket and are EXCLUDED from the threshold
    * estimate — a filter stage must see every document, and the
    * degenerate ones must not drag the terciles.
    *
    * Thresholds and ppl both round to 4 decimals (identical doubles
    * cross-engine), so the `<=` boundary comparisons agree digit-for-
    * digit with the DuckDB oracle. */
  def curatePplBuckets(spark: SparkSession, dir: String): DataFrame = {
    // persisted per (session, dir): the threshold aggregate and the
    // assignment pass both read this doc-level relation — without the
    // memo each runs the whole bigram-LM scoring pipeline
    val scored = graft.PlanCache.getOrBuild(spark, dir, "ppl_lang") {
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("lang"))
        .join(TextOps.textPerplexity(spark, dir), "doc_id")
    }
    val thr = scored.filter(col("ppl").isNotNull)
      .groupBy(col("lang"))
      .agg(round(pct(spark, "ppl", "1.0D/3"), 4).as("t_head"),
        round(pct(spark, "ppl", "2.0D/3"), 4).as("t_mid"))
    scored.join(broadcast(thr), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("ppl"),
        when(col("ppl").isNull, "undef")
          .when(col("ppl") <= col("t_head"), "head")
          .when(col("ppl") <= col("t_mid"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Curation-funnel report: document and token counts at every
    * admission point of [[curatePipeline]] — raw corpus, language/
    * quality/near-dup admission, holdout removal, decontamination, and
    * the final packed-sequence count. The observability relation every
    * production pipeline ships next to its output (what fraction
    * survived each stage, and how many training sequences the run
    * yields); stage keys are ordinal-prefixed so the funnel reads in
    * order under any sort.
    *
    * Shape: ONE token-count scan of the corpus joined against each
    * stage's (tiny, broadcastable) id set, five single-row aggregates
    * unioned — the stage sets are the same PlanCache-backed relations
    * the pipeline itself composes, so the report never recomputes a
    * stage, only counts it. */
  /** Fraction of each cell's deduped members pruned as "too
    * prototypical" — D4's diversification knob. Shared with the oracle.
    * The drop count is floor(frac·n), so a small cell (n < 1/frac, e.g.
    * a singleton holding unique, non-duplicated content) keeps ALL its
    * members rather than losing its only one to a ceil round-up — D4
    * prunes a fraction of the redundant core, it never empties a cell. */
  val D4DropFrac = 0.25

  /** D4 (Tirumala et al. 2023, arXiv:2308.12284): document
    * de-duplication AND diversification — SemDeDup first removes
    * semantic near-dups, then the most PROTOTYPICAL survivors (highest
    * cosine to their cluster centroid — the redundant "core" the
    * embedding model sees thousands of times) are pruned per cluster at
    * a fixed fraction, keeping the diverse tail the paper shows improves
    * pretraining. Deterministic: prototypicality is rounded to 4
    * decimals and ties break by vec_id, so the verdict is cross-engine
    * stable.
    *
    * Shape: REUSES the memoized trained model end-to-end —
    * [[DedupOps.dedupSemantic]]'s verdicts (which reuse
    * [[SearchOps.kmeansAssigned]]) and the K-row centroid table
    * (broadcast). The rank and the cell count share ONE exchange on the
    * cluster key; cells are bounded by the same cap-and-route posture as
    * the dedup pass, so the per-cell window never sees a detonating
    * partition. */
  def curateD4(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.cosineSim
    val kept = DedupOps.dedupSemantic(spark, dir)
      .filter(col("keep")).select(col("vec_id"), col("cluster"))
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val byCell = Window.partitionBy(col("cluster"))
    val proto = kept
      .join(emb, "vec_id")
      .join(broadcast(SearchOps.kmeansCents(spark, dir)), "cluster")
      .select(col("vec_id"), col("cluster"),
        round(cosineSim(col("v"), col("c")), 4).as("proto"))
    proto
      .withColumn("r", row_number().over(
        byCell.orderBy(col("proto").desc, col("vec_id"))))
      .withColumn("n", count(lit(1)).over(byCell))
      .select(col("vec_id"), col("cluster"), col("proto"),
        (col("r") > floor(lit(D4DropFrac) * col("n"))).as("keep"))
  }

  def curateReport(spark: SparkSession, dir: String): DataFrame = {
    // The four nested admission stages (raw ⊇ admitted ⊇ holdout-removed
    // ⊇ decontaminated) fold into ONE pass over the token-count relation
    // with membership flags: both id sets are unique per doc (admission
    // elects one survivor per cluster; decontamination is a per-doc
    // groupBy), so a left join + conditional aggregate counts exactly
    // what the former four inner/anti joins + four aggregates counted —
    // at 100 TB that is one corpus-scale join chain instead of four, and
    // locally it cut the report's job count roughly in half.
    val admitted = TextOps.corpusCurate(spark, dir)
      .select(col("doc_id"), lit(true).as("_adm"))
    val dec = curateDecontaminate(spark, dir)
      .select(col("doc_id"), lit(true).as("_dec"))
    val isHeld = col("_adm") && (col("doc_id") % HoldoutMod =!= 0)
    val isClean = isHeld && col("_dec").isNull
    def cnt(f: Column) = count(when(f, 1))
    def tok(f: Column) = coalesce(sum(when(f, col("n_tok"))), lit(0L))
    val funnel = docTok(spark, dir).select(col("doc_id"), col("n_tok"))
      .join(admitted, Seq("doc_id"), "left")
      .join(dec, Seq("doc_id"), "left")
      .agg(count(lit(1)).as("d0"),
        coalesce(sum(col("n_tok")), lit(0L)).as("t0"),
        cnt(col("_adm")).as("d1"), tok(col("_adm")).as("t1"),
        cnt(isHeld).as("d2"), tok(isHeld).as("t2"),
        cnt(isClean).as("d3"), tok(isClean).as("t3"))
      .select(explode(array(
        struct(lit("00_raw").as("stage"), col("d0").as("n_docs"),
          col("t0").as("n_tok")),
        struct(lit("10_admitted").as("stage"), col("d1").as("n_docs"),
          col("t1").as("n_tok")),
        struct(lit("20_holdout_removed").as("stage"), col("d2").as("n_docs"),
          col("t2").as("n_tok")),
        struct(lit("30_decontaminated").as("stage"), col("d3").as("n_docs"),
          col("t3").as("n_tok")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_docs").as("n_docs"),
        col("r.n_tok").as("n_tok"))
    val seqs = curatePipeline(spark, dir)
      .agg(count_distinct(struct(col("source"), col("seq_id"))).as("n_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).as("n_tok"))
      .select(lit("40_sequences").as("stage"), col("n_docs"), col("n_tok"))
    funnel.unionAll(seqs)
  }

  /** The Gopher quality-rule battery (Rae et al. 2021, Appendix A) as a
    * per-document relation: every rule is its own boolean column plus the
    * conjunction `keep`, so a pipeline can audit WHICH rule rejected a
    * document (the per-rule columns are the audit relation the paper's
    * ablation tables are built from). [[TextOps.textQuality]] scores; this
    * op gates on the published thresholds:
    *
    *  - 50 <= word count <= 100,000
    *  - 3 <= mean word length <= 10
    *  - symbol-to-word ratio (# and ellipsis) <= 0.1
    *  - < 90% of lines start with a bullet, < 30% end with an ellipsis
    *  - >= 80% of words contain an alphabetic character
    *  - >= 2 distinct Gopher stop words present
    *
    * One scan, zero shuffles, every rule a codegen'd string/array
    * expression. Words are whitespace-split (punctuation kept — the
    * symbol/alpha rules need it); the stopword test uses the shared alnum
    * tokenizer. Mean word length is an int-sum/int-count single division,
    * so the driver hash-checks digit-for-digit.
    */
  def curateGopherRules(spark: SparkSession, dir: String): DataFrame = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    Tables.documents(spark, dir)
      // word count / length sum / has-letter count fold in ONE native
      // byte scan (WsWordStats) — replaces the regex \s+ split plus
      // three interpreted array-lambda walks (incl. an rlike per word).
      // Line / bullet / ellipsis counts fold in a second native byte
      // scan (LineStats) — replaces the regex \n split plus three
      // interpreted filter(…) walks with per-line trim copies; counts
      // value-identical by construction (same UTF8String trim/prefix/
      // suffix methods), pinned by LineStatsSpec.
      .select(col("doc_id"), col("text"),
        graft.functions.ArrayFunctions.wsWordStats(col("text")).as("wst"),
        graft.functions.ArrayFunctions.lineStats(col("text")).as("lst"),
        tokens(col("text")).as("ts"))
      .select(col("doc_id"),
        col("wst.n_words").as("n_words"),
        round(col("wst.len_sum").cast("double") /
          greatest(col("wst.n_words"), lit(1L)), 4).as("mean_word_len"),
        expr("(length(text) - length(replace(text, '#', ''))) + " +
          "(length(text) - length(replace(text, '...', ''))) div 3")
          .as("n_sym"),
        col("lst.n_bullet").as("n_bullet"),
        col("lst.n_ellip").as("n_ellip"),
        col("wst.n_alpha").as("n_alpha"),
        greatest(col("lst.n_lines"), lit(1)).as("n_lines"),
        size(array_intersect(array_distinct(col("ts")),
          array(stops.map(lit): _*))).as("n_stop"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        (col("n_words") >= 50 && col("n_words") <= 100000).as("r_word_count"),
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
          .as("r_mean_len"),
        (col("n_sym").cast("double") <=
          lit(0.1) * greatest(col("n_words"), lit(1L))).as("r_symbol_ratio"),
        (col("n_bullet").cast("double") <
          lit(0.9) * col("n_lines")).as("r_bullets"),
        (col("n_ellip").cast("double") <
          lit(0.3) * col("n_lines")).as("r_ellipsis"),
        (col("n_alpha").cast("double") >=
          lit(0.8) * greatest(col("n_words"), lit(1L))).as("r_alpha"),
        (col("n_stop") >= 2).as("r_stopwords"))
      .withColumn("keep",
        col("r_word_count") && col("r_mean_len") && col("r_symbol_ratio") &&
          col("r_bullets") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stopwords"))
  }

  /** The sink side of the shard shuffle: write the corpus as parquet
    * partitioned by shard, each shard's rows sorted by the shuffle hash —
    * the physical layout [[curateShuffleShards]] computes positions for.
    * repartition + sortWithinPartitions makes every output file a single
    * sorted run (no window, no global sort); tested against the
    * positions the query op reports. */
  def writeShards(spark: SparkSession, dir: String, outDir: String): Unit =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        md5(col("doc_id").cast("string")).as("hk"))
      .withColumn("shard", conv(substring(col("hk"), 1, 1), 16, 10).cast("int"))
      .repartition(NumShards, col("shard"))
      // shard leads the sort so the partitioned writer's required
      // ordering (partition cols first) is already satisfied — otherwise
      // it inserts its own non-stable sort on shard alone and the hk run
      // order is destroyed
      .sortWithinPartitions(col("shard"), col("hk"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
}
