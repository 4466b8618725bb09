package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Glob-pattern file discovery as pushed-down predicates.
  *
  * Reference analogue: the indexer's FileDiscovery walks the tree and
  * admits each file through three compiled glob sets — code patterns,
  * docs patterns, ignore patterns, first-match-wins with ignore checked
  * first and code before docs (internal/indexer/discovery.go:26-125);
  * ignore additionally probes the path with a directory-glob suffix
  * appended so a directory pattern covers the directory node itself
  * (discovery.go:119-123).
  *
  * Here discovery is DECLARATIVE: the same separator-aware glob
  * semantics (single star stops at '/', double star crosses it, '?' is
  * one non-'/' char — the gobwas/glob.Compile(pattern, '/') behavior
  * the reference relies on) compile once on the driver to anchored
  * regexes, and
  * admission is a pure filter+project over ONE corpus scan — no
  * filesystem walk, no shuffle, no Generate. At 100 TB the admission
  * predicate rides the same scan that feeds the downstream pipeline, so
  * discovery costs zero extra passes; only referenced columns are read
  * (plan-tested: no Exchange anywhere, pruned ReadSchema).
  *
  * The oracle interpolates the SAME compiled regexes (globToRegex runs
  * at oracle-string build time), so Spark and DuckDB can never drift on
  * pattern semantics.
  */
object DiscoveryOps {

  /** The contract pattern sets, phrased over this corpus's
    * `source/doc_id` path namespace (sources src0..src19): code = the
    * src1* subtree, docs = single-char-suffix sources, ignore = one
    * subtree + one filename shape. */
  private[graft] val CodePatterns   = Seq("src1*/**")
  private[graft] val DocsPatterns   = Seq("src?/**")
  private[graft] val IgnorePatterns = Seq("src13/**", "**/*7")

  /** Compile one glob to an anchored regex, '/'-separator semantics:
    * `**` crosses separators, `*` and `?` do not, `{a,b}` alternates.
    * Emits only constructs java.util.regex and DuckDB's RE2 share. */
  private[graft] def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    var i = 0
    var depth = 0
    while (i < glob.length) {
      glob(i) match {
        case '*' if i + 1 < glob.length && glob(i + 1) == '*' =>
          sb.append(".*"); i += 1
        case '*' => sb.append("[^/]*")
        case '?' => sb.append("[^/]")
        case '{' => sb.append("(?:"); depth += 1
        case ',' if depth > 0 => sb.append('|')
        case '}' if depth > 0 => sb.append(')'); depth -= 1
        case c if "\\.[]()^$+|".indexOf(c) >= 0 => sb.append('\\').append(c)
        case c => sb.append(c)
      }
      i += 1
    }
    require(depth == 0, s"unbalanced braces in glob: $glob")
    sb.append('$').toString
  }

  /** Fuse a whole pattern SET into one anchored alternation —
    * `^(?:re1|re2|…)$` — so admission costs ONE regex evaluation per set
    * per row instead of a linear scan of per-pattern rlikes. At a
    * realistic ignore set (hundreds of patterns) the fused automaton is
    * compiled once and shared; each alternative is the body of its
    * per-pattern regex (anchors stripped), and brace-alternation `|`s are
    * already inside `(?:…)` groups, so top-level `|` only ever separates
    * patterns. */
  private[graft] def fusedRegex(pats: Seq[String]): String =
    pats.map(p => globToRegex(p).stripPrefix("^").stripSuffix("$"))
      .mkString("^(?:", "|", ")$")

  private def matchesAny(pats: Seq[String], c: Column): Column =
    c.rlike(fusedRegex(pats))

  /** Classify every corpus file through the three pattern sets:
    * ignored paths (direct match OR with the reference's
    * directory-suffix probe) are dropped, the rest are admitted as
    * `code` before `docs` (discovery.go:88-99 precedence), files
    * matching neither set are not discovered. */
  def discoverGlob(spark: SparkSession, dir: String): DataFrame =
    classify(Tables.documents(spark, dir)
      .select(concat_ws("/", col("source"), col("doc_id")).as("file_path"),
        col("n_chars")))
      .select(col("file_path"), col("cls"), col("n_chars"))

  /** Streaming twin for the watch loop: admission is stateless narrow
    * predicates, so the SAME compiled plan fragment classifies files as
    * they arrive — newly discovered paths gate into code/docs (or drop)
    * per micro-batch with no state store. */
  def streamingDiscoverGlob(files: DataFrame): DataFrame = classify(files)

  /** The admission classifier over any relation carrying `file_path`
    * (payload columns pass through) — shared by the batch operator and
    * the streaming twin. */
  private def classify(files: DataFrame): DataFrame = {
    val ignored = matchesAny(IgnorePatterns, col("file_path")) ||
      matchesAny(IgnorePatterns, concat(col("file_path"), lit("/**")))
    files
      .filter(!ignored)
      .withColumn("cls",
        when(matchesAny(CodePatterns, col("file_path")), "code")
          .when(matchesAny(DocsPatterns, col("file_path")), "docs"))
      .filter(col("cls").isNotNull)
  }
}
