package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Structural pattern search over the document corpus — the analogue of
  * the reference's AST pattern-matching tool (cortex_pattern,
  * internal/mcp/tools_pattern.go:20, backed by an external ast-grep
  * binary, internal/pattern/executor.go:17): a template of literal tokens
  * and `$NAME` metavariables matches structure, not just text, returning
  * each match's position and the text each metavariable captured.
  *
  * The binary-AST part of the reference is rightly out of scope (no
  * tree-sitter here); what this keeps is the QUERY MODEL — template →
  * validated AST → matches with captures — compiled, like FtsQuery, to
  * ONE codegen'd scan predicate: the template AST becomes a single
  * RE2-compatible regex evaluated by Spark's codegen'd regexp
  * expressions, so the whole operator is one parquet scan + projection +
  * TakeOrdered, no UDF, no shuffle before the final thin top-k.
  *
  * Token model: a token is a maximal `[a-z0-9]+` run of the lowercased
  * text (graft's canonical tokenizer); template elements must be
  * separated by at least one non-token character in the text. The
  * compiled regex is deliberately restricted to the RE2 subset (no
  * lookaround, no backreferences) so ANY regex engine — including the
  * DuckDB oracle's — computes identical matches.
  */
object PatternOps {

  sealed trait Elem
  /** A literal token that must appear verbatim (lowercase alnum). */
  final case class LitTok(tok: String) extends Elem
  /** A metavariable capturing exactly one token, like ast-grep's `$VAR`. */
  final case class MetaVar(name: String) extends Elem
  /** `$$$` — a non-capturing gap of ZERO OR MORE tokens between its
    * neighbours, like ast-grep's multi-node metavariable. Compiled to a
    * LAZY repetition (shortest gap wins, the minimal-match convention),
    * which RE2 and the JVM regex engine resolve identically for this
    * lookaround-free subset — verified empirically against the oracle
    * engine over the whole corpus at every SF. */
  case object Gap extends Elem

  final case class PatternQuery(elems: Seq[Elem]) {
    require(elems.nonEmpty, "pattern must contain at least one element")

    val metaNames: Seq[String] = elems.collect { case MetaVar(n) => n }

    /** The compiled scan predicate: core = elements joined by separator
      * runs. RE2 has no lookaround, so the LEADING boundary is a
      * consuming alternation and the TRAILING boundary is the zero-width
      * `\b` — consuming the trailing separator would swallow the next
      * match's leading boundary, silently dropping occurrences separated
      * by a single separator char ("hash a join hash b join" must count
      * 2). The one `\b`-vs-separator divergence: `_` is a word char to
      * `\b` but a separator to the tokenizer, so a match immediately
      * followed by `_` is treated as within-word and not counted — both
      * engines agree, and the corpus has no underscores. Group 1 is the
      * whole core; group 1+k is the k-th metavariable.
      */
    def regex: String = {
      def render(e: Elem): String = e match {
        case LitTok(t)  => t
        case MetaVar(_) => "([a-z0-9]+)"
        case Gap        => sys.error("unreachable: Gap renders as a joiner")
      }
      // a Gap REPLACES the plain separator between its neighbours with
      // "separator, then lazily zero or more (token, separator)" — zero
      // iterations degrades to the plain separator, so `a $$$ b` also
      // matches adjacent "a b"
      val sb = new StringBuilder(render(elems.head))
      var pendingGap = false
      elems.tail.foreach {
        case Gap => pendingGap = true
        case e =>
          sb.append(
            if (pendingGap) "[^a-z0-9]+(?:[a-z0-9]+[^a-z0-9]+)*?"
            else "[^a-z0-9]+")
          sb.append(render(e))
          pendingGap = false
      }
      s"(?:^|[^a-z0-9])(${sb.toString})\\b"
    }
  }

  object PatternQuery {
    private val Meta = "^\\$([A-Z][A-Z0-9_]*)$".r
    private val Lit = "^[a-z0-9]+$".r

    /** Output column names the operator itself emits — a metavariable
      * lowercasing to one of these would silently shadow an internal or
      * output column ($LT would replace the staged lowercased text), so
      * the parser rejects them at the untrusted boundary. */
    private val Reserved =
      Set("doc_id", "lt", "match_text", "hit_pos", "n_matches", "match_idx")

    /** Parse a whitespace-separated template (`"hash $KIND join"`). This
      * is an untrusted boundary like the FTS/DSL parsers: every malformed
      * shape comes back as IllegalArgumentException with the offending
      * element named. */
    def parse(template: String): PatternQuery = {
      val toks = template.trim.split("\\s+").toSeq.filter(_.nonEmpty)
      if (toks.isEmpty)
        throw new IllegalArgumentException("pattern template is empty")
      val elems: Seq[Elem] = toks.map {
        case "$$$"                        => Gap
        case Meta(name)                   => MetaVar(name)
        case t if Lit.matches(t)          => LitTok(t)
        case t => throw new IllegalArgumentException(
          s"pattern element '$t' is neither a lowercase token, a " +
            "$METAVAR, nor $$$")
      }
      if (elems.head == Gap || elems.last == Gap)
        throw new IllegalArgumentException(
          "$$$ needs anchoring elements on both sides")
      if (elems.sliding(2).exists(_.forall(_ == Gap)))
        throw new IllegalArgumentException("adjacent $$$ gaps are redundant")
      val names = elems.collect { case MetaVar(n) => n }
      if (names.distinct.sizeIs != names.size)
        throw new IllegalArgumentException(
          s"duplicate metavariable in '$template': binding the same name " +
            "twice needs backreferences, which the RE2-compatible target " +
            "does not support")
      names.filter(n => Reserved.contains(n.toLowerCase)).foreach { n =>
        throw new IllegalArgumentException(
          s"metavariable $$$n collides with the reserved output column " +
            s"'${n.toLowerCase}'")
      }
      PatternQuery(elems)
    }
  }

  /** Matches for `template` over the corpus: doc_id, a hit position (the
    * FIRST OCCURRENCE of the matched text, the instr convention
    * fts_snippet also uses — when the same byte sequence occurs earlier
    * mid-word, the reported position precedes the structural match
    * site), the matched text, the total non-overlapping match count,
    * and one lowercase-named column per metavariable with its captured
    * token from the first match. Ranked by match count (desc, doc_id
    * tiebreak), top `limit` — an ORDER BY + LIMIT that collapses to
    * TakeOrderedAndProject over the single scan.
    */
  def patternMatches(spark: SparkSession, dir: String, template: String,
      limit: Int): DataFrame = {
    val q = PatternQuery.parse(template)
    val r = q.regex
    // `lt` staged once: every regexp column reads the same alias instead
    // of re-lowercasing per expression (the staging rule from TextOps)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .withColumn("match_text", regexp_extract(col("lt"), r, 1))
      .filter(col("match_text") =!= "")
    val withMeta = q.metaNames.zipWithIndex.foldLeft(base) {
      case (df, (n, i)) =>
        df.withColumn(n.toLowerCase, regexp_extract(col("lt"), r, i + 2))
    }
    withMeta
      .select(Seq(
        col("doc_id"),
        expr("instr(lt, match_text)").cast("long").as("hit_pos"),
        col("match_text"),
        size(regexp_extract_all(col("lt"), lit(r), lit(1))).cast("long")
          .as("n_matches")) ++
        q.metaNames.map(n => col(n.toLowerCase)): _*)
      .orderBy(col("n_matches").desc, col("doc_id"))
      .limit(limit)
  }

  /** Contract row: the `defer $FUNC()`-shaped template of the reference's
    * own examples, phrased for this corpus — every "hash <something> join"
    * occurrence with the middle token captured. */
  def patternSearch(spark: SparkSession, dir: String): DataFrame =
    patternMatches(spark, dir, "hash $KIND join", 20)

  /** EVERY match occurrence, one row each — the reference's full result
    * list (a file can match a pattern many times; transformToResponse
    * emits one entry per match). All capture-group extractions run over
    * the row once (regexp_extract_all per group — the arrays align
    * because every group extraction walks the same non-overlapping match
    * sequence), then arrays_zip + posexplode fans out per occurrence.
    * Still one scan; the Generate is narrow, so at scale each task
    * explodes only its own rows.
    */
  def patternMatchesAll(spark: SparkSession, dir: String,
      template: String): DataFrame =
    matchAllProjection(Tables.documents(spark, dir), template)

  /** Streaming twin of [[patternMatchesAll]]: the projection is stateless
    * (per-row regexes, a narrow Generate, no aggregation), so the exact
    * same plan runs over a stream in append mode with no state store —
    * the cortex watch-mode query path for pattern search. Used by the
    * test suite over a MemoryStream. */
  def streamingPatternMatches(docs: DataFrame, template: String): DataFrame =
    matchAllProjection(docs, template)

  private def matchAllProjection(docs: DataFrame,
      template: String): DataFrame = {
    val q = PatternQuery.parse(template)
    val r = q.regex
    val metaCols = q.metaNames.map(n => s"_c_${n.toLowerCase}")
    var df = docs
      .select(col("doc_id"), lower(col("text")).as("lt"))
      .withColumn("_ms", regexp_extract_all(col("lt"), lit(r), lit(1)))
    q.metaNames.zip(metaCols).zipWithIndex.foreach { case ((_, c), i) =>
      df = df.withColumn(c, regexp_extract_all(col("lt"), lit(r), lit(i + 2)))
    }
    df.filter(size(col("_ms")) > 0)
      .select(col("doc_id"),
        posexplode(arrays_zip((col("_ms") +: metaCols.map(col)): _*)))
      .select(Seq(col("doc_id"), col("pos").cast("long").as("match_idx"),
        col("col._ms").as("match_text")) ++
        q.metaNames.zip(metaCols).map { case (n, c) =>
          col(s"col.$c").as(n.toLowerCase)
        }: _*)
  }

  /** Contract row for the all-occurrences surface. */
  def patternSearchAll(spark: SparkSession, dir: String): DataFrame =
    patternMatchesAll(spark, dir, "hash $KIND join")

  /** Contract row for the multi-token gap: any "hash ... join" span with
    * zero or more tokens between (the ast-grep `$$$` shape). */
  def patternSearchGap(spark: SparkSession, dir: String): DataFrame =
    patternMatches(spark, dir, "hash $$$ join", 20)

  /** The declaration templates [[symbolsExtract]] scans for: keyword →
    * the kind of symbol the NEXT token names — the `def f` / `class C` /
    * `type T` shape of real code, phrased over this corpus's vocabulary. */
  private[graft] val SymbolKinds =
    Seq("table" -> "type", "query" -> "function", "stream" -> "stream")

  /** The import-declaration keyword for the virtual `imports` table
    * (Tables.load): `batch X` reads as "this file imports X" — the
    * `import path` shape of the reference's imports table
    * (internal/storage/schema.go:282), phrased over this corpus. */
  private[graft] val ImportKeyword = "batch"

  /** Symbol extraction relation — the data-level stand-in for the
    * reference's tree-sitter extraction feeding its functions/types
    * tables (internal/indexer/extraction/, internal/storage/schema.go):
    * ONE scan over `documents` emits (doc_id, symbol, kind, pos) for
    * every keyword-declaration occurrence, where `pos` is the 1-based
    * token index of the declaring keyword. Real code swaps the keyword
    * table for the grammar's declaration nodes; the relational shape —
    * corpus scan → thin symbol relation the graph/metrics layers join —
    * is exactly what schema.go stores.
    *
    * All three templates evaluate over ONE staged token array (index-aware
    * transform + filter + narrow explode) — a single parquet scan, no
    * shuffle (plan-tested); at 100 TB this is an embarrassingly parallel
    * projection whose output is ~occurrences, not corpus bytes. */
  def symbolsExtract(spark: SparkSession, dir: String): DataFrame =
    keywordDeclsPreTok(indexedToks(spark, dir), SymbolKinds, Nil)

  /** The pre-tokenized docs index relation (doc_id, lang, source,
    * n_chars, toks) — tokenization is INDEX-time work (the cortex
    * chunk-writer posture IndexStore documents), so batch extractors
    * read the stored token arrays instead of re-running the tokenizer
    * regex over the corpus on every evaluation. Streaming twins keep the
    * expression form (their input is not the indexed corpus). */
  private[operators] def indexedToks(spark: SparkSession, dir: String): DataFrame =
    spark.table(graft.sources.IndexStore.docsTable(spark, dir))

  /** Streaming twin of [[symbolsExtract]] — the projection is stateless
    * (per-row array expressions + a narrow Generate, no aggregation), so
    * the same plan runs over a stream in append mode with no state
    * store: the watch-mode incremental symbol-table maintenance path
    * (changed files stream in, their fresh symbol rows stream out).
    * MemoryStream-tested in the suite. */
  def streamingSymbolsExtract(docs: DataFrame): DataFrame =
    symbolsProjection(docs)

  private def symbolsProjection(docs: DataFrame): DataFrame =
    keywordDecls(docs, SymbolKinds, Nil)

  /** Symbol-chunk TEXT assembly — the reference's formatter renders each
    * file's extracted symbols into the natural-language chunk the
    * embedding index actually stores (internal/indexer/formatter.go:19,
    * FormatSymbols: "Imports: N packages", then per-kind blocks of
    * "  - name (range)" lines). Same contract here as a relation: per
    * document, the import count block plus one block per symbol kind,
    * entries in source order — the text production step between
    * extraction (symbols_extract) and embedding (embed_*).
    *
    * Shape: the decls Generate feeds a (doc, kind) aggregate whose
    * collected state is the doc's OWN symbol list (bounded by doc size,
    * never corpus-sized), then a per-doc block fold — two thin key
    * shuffles, deterministic ordering via array_sort on (pos, symbol) /
    * (rank, block) structs, not collect order.
    */
  def symbolsFormat(spark: SparkSession, dir: String): DataFrame = {
    val kinds = SymbolKinds :+ (ImportKeyword -> "import")
    val decls = keywordDeclsPreTok(indexedToks(spark, dir), kinds, Nil)
    val header = when(col("kind") === "type", lit("Types:"))
      .when(col("kind") === "function", lit("Functions:"))
      .otherwise(lit("Streams:"))
    val rank = when(col("kind") === "import", lit(0))
      .when(col("kind") === "type", lit(1))
      .when(col("kind") === "function", lit(2)).otherwise(lit(3))
    decls
      .groupBy(col("doc_id"), col("kind"))
      .agg(count(lit(1)).as("n"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("symbol")))),
            e => concat(lit("  - "), e.getField("symbol"),
              lit(" (tok "), e.getField("pos"), lit(")"))),
          "\n").as("body"))
      .select(col("doc_id"), col("n"), rank.as("rk"),
        when(col("kind") === "import",
          concat(lit("Imports: "), col("n"), lit(" packages")))
          .otherwise(concat(header, lit("\n"), col("body"))).as("block"))
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("rk"), col("block")))),
            _.getField("block")), "\n\n").as("chunk_text"),
        sum(col("n")).as("n_entries"))
  }

  /** Shared keyword-declaration extraction: for each (keyword -> kind)
    * pair, emit (doc_id, symbol = the token AFTER the keyword, kind,
    * pos = 1-based keyword index), passing the caller's `keep` columns
    * through unchanged (the virtual `functions`/`types`/`imports` tables
    * need `source` for file_path/module_path without a second scan +
    * join back to documents). Single narrow Generate, no shuffle. */
  private[graft] def keywordDecls(docs: DataFrame,
      kinds: Seq[(String, String)], keep: Seq[String]): DataFrame =
    // ONE native token-array pass for all (keyword → kind) pairs
    // (KeywordDecls: symbol = token after the keyword, pos = 1-based
    // keyword index, per-pair output order = the concat of the former
    // per-keyword transform+filter walks)
    keywordDeclsTs(docs, graft.functions.Tokenize.tokens(col("text")),
      kinds, keep)

  /** [[keywordDecls]] over a frame that already carries the `toks`
    * array (the pre-tokenized docs index) — same Generate, no
    * re-tokenization. */
  private[graft] def keywordDeclsPreTok(docs: DataFrame,
      kinds: Seq[(String, String)], keep: Seq[String]): DataFrame =
    keywordDeclsTs(docs, col("toks"), kinds, keep)

  private def keywordDeclsTs(docs: DataFrame, ts: Column,
      kinds: Seq[(String, String)], keep: Seq[String]): DataFrame = {
    val keepCols = keep.map(col)
    docs
      .select(col("doc_id") +: keepCols :+ ts.as("ts"): _*)
      .select(col("doc_id") +: keepCols :+
        explode(graft.functions.ArrayFunctions.keywordDecls(col("ts"), kinds))
          .as("d"): _*)
      .select(col("doc_id") +: keepCols :+ col("d.symbol").as("symbol") :+
        col("d.kind").as("kind") :+ col("d.pos").as("pos"): _*)
  }
}
