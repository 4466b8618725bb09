package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The ONE canonical corpus tokenizer — every operator and every DuckDB
  * oracle (`regexp_extract_all(lower(text), '[a-z0-9]+')`) must agree on
  * tokenization or cross-engine verification falls apart, so it lives in
  * exactly one place.
  */
object Tokenize {
  def tokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z0-9]+"), lit(0))
}
