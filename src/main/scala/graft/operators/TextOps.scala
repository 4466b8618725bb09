package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for corpus curation: language-ID heuristic,
  * quality scoring, token counting, and document fingerprinting.
  *
  * Reference analogue: project-cortex's chunker tokenizes and budgets text
  * (internal/indexer/chunker.go:31, token estimate = chars/4) and tags
  * chunks with language metadata; these operators generalize that to the
  * scoring/filtering passes an LLM training pipeline runs over raw text.
  *
  * All pure codegen'd string/array expressions — one parquet scan each, no
  * UDFs, no shuffle except explicit aggregations.
  */
object TextOps {

  private def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))

  private def tf(toks: Column, terms: Seq[String]): Column =
    size(filter(toks, t => t.isin(terms: _*)))

  /** Marker-based language/register ID: argmax of three marker-set term
    * frequencies with a fixed tie priority (en > code > data). A real
    * deployment swaps the marker lists for per-language stopword tables —
    * the plan shape (scored case chain over one scan) is identical. */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val en = tf(t, Seq("the", "a", "is"))
    val code = tf(t, Seq("table", "query", "join"))
    val data = tf(t, Seq("data", "stream", "batch"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(en >= code && en >= data, "en")
          .when(code >= data, "code")
          .otherwise("data").as("pred_lang"))
  }

  /** Composite quality score: token volume, alphabetic density, stopword
    * ratio — the length/punct/stopword heuristics of corpus filtering. */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val nTok = size(t)
    val alpha = length(regexp_replace(lower(col("text")), "[^a-z]", ""))
      .cast("double") / greatest(col("n_chars"), lit(1))
    val stop = tf(t, Seq("the", "a")).cast("double") / greatest(nTok, lit(1))
    Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.as("n_tokens"),
        round(lit(0.3) * least(nTok.cast("double") / 50.0, lit(1.0)) +
          lit(0.4) * alpha + lit(0.3) * (lit(1.0) - stop), 4).as("quality"))
  }

  /** Token counting: whitespace-word tokens, unique tokens, and a BPE-ish
    * segmentation (letter runs / digit runs / single punctuation). */
  def textTokens(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), size(t).as("n_tokens"),
        size(array_distinct(t)).as("n_unique"),
        size(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n_bpeish"))
  }

  /** Content fingerprint: md5 over the sorted distinct token set — the
    * order/whitespace-insensitive identity used for fuzzy change
    * detection (cortex hashes raw bytes; this survives reformatting). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
          .as("fp"))
}
