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

  /** `a` shifted left by `by` (size clamped at 0) — the building block of
    * every zip_with n-gram/window doubling chain (positional grams, MOSS
    * window minima). One definition: a change to the clamp semantics must
    * hit every gram builder at once or they silently diverge. */
  def shift(a: Column, by: Int): Column =
    slice(a, lit(by + 1), greatest(size(a) - by, lit(0)))
}
