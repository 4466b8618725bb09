package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins for hot keys.
  *
  * AQE's skew-join split (on by default in Spark 4) handles most runtime
  * skew; salting is the static fallback when a key is SO hot that even a
  * split partition overwhelms one task — e.g. one document id holding a
  * large share of all chunks. The pattern: replicate the small side
  * `salts` times, scatter the big side uniformly across the salt space,
  * join on (key, salt).
  */
object SkewOps {

  /** Join `big` to `small` on `key`, scattering the big side over `salts`
    * buckets. Result is row-identical to `big.join(small, key)` — verified
    * by the test suite — but the hottest key's rows now spread across
    * `salts` tasks instead of one.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    // Salt derives from row CONTENT (hash of every column), never from
    // monotonically_increasing_id(): a nondeterministic salt upstream of the
    // shuffle can re-scatter rows differently when a task is recomputed
    // after a fetch failure — the classic duplicated/lost-row hazard. A
    // content hash replays identically on retry. (Identical rows salting to
    // the same bucket is fine: uniformity suffers only if one exact row
    // repeats at hot-key scale.)
    val salted = big.withColumn("_salt",
      (pmod(hash(big.columns.map(col): _*), lit(salts))).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
