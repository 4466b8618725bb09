package graft

import org.apache.spark.SparkConf

/** Deploy-knob passthrough for the driver mains: SPARK_GRAFT_CONF holds
  * comma-separated `key=value` pairs applied to the session builder, so
  * Verify/Bench experiments can exercise knobs like
  * `spark.graft.indexBuckets=32` without a code edit (env vars cannot
  * carry dotted Spark keys as names, hence one packed variable). Only
  * `spark.*` keys are accepted — a typo should fail loudly, not silently
  * become an inert setting. */
object GraftConf {

  private[graft] val MiB = 1L << 20

  /** Scan split sizing (`spark.sql.files.maxPartitionBytes`) for the
    * driver mains, derived from corpus bytes instead of pinned.
    *
    * The corpus tables are ONE parquet file each (the oracle-registration
    * contract), so Spark's 128 MB default leaves a whole sf10 scan on a
    * single core — an interpreted transform/aggregate chain over 500k
    * docs then runs 30+ min on one task (observed round 11). Round 11
    * pinned 4 MB unconditionally, which fixed sf10 but shredded the tiny
    * (17 MB) sf0.1 corpus into ~30× more tasks per scan and regressed the
    * full sweep. Derived rule:
    *   - corpora under 1 GiB cannot fill 32 cores with meaningful work
    *     per task even at 4 MB splits — per-task overhead dominates — so
    *     they keep the 128 MB default (the configuration the local
    *     baselines in docs/BASELINE_LOCAL.md were pinned under);
    *   - larger corpora size splits as dirBytes/(16·cpus) clamped to
    *     [4 MB, 128 MB]: 4 MB at the 1.7 GiB sf10 regeneration (the
    *     round-11 measured-good setting, ~16 tasks per core per
    *     full-corpus pass), growing back toward the default as the corpus
    *     does — a 100 TB deployment sits at the 128 MB ceiling with
    *     parallelism coming from file count, as it should.
    * `SPARK_GRAFT_SPLIT_MB` overrides for experiments; Bench records the
    * resolved value in its artifact so round-over-round comparisons are
    * configuration-aware. */
  private[graft] def deriveSplitBytes(dirBytes: Long, cpus: Int): Long =
    if (dirBytes < (1L << 30)) 128 * MiB
    else math.min(128 * MiB, math.max(4 * MiB, dirBytes / (16L * cpus)))

  def splitBytes(sfDir: String, cpus: Int,
      env: Map[String, String] = sys.env): Long =
    env.get("SPARK_GRAFT_SPLIT_MB").map(_.trim.toLong * MiB)
      .getOrElse(deriveSplitBytes(dirBytes(sfDir), cpus))

  /** Total bytes of regular files under `dir` (0 when missing — the
    * derivation then lands on the default split, and the scan itself
    * reports the missing corpus). */
  private[graft] def dirBytes(dir: String): Long = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  def fromEnv(env: Map[String, String] = sys.env): SparkConf = {
    val conf = new SparkConf(false)
    env.get("SPARK_GRAFT_CONF").foreach { packed =>
      packed.split(',').map(_.trim).filter(_.nonEmpty).foreach { kv =>
        val i = kv.indexOf('=')
        require(i > 0, s"SPARK_GRAFT_CONF entry '$kv' is not key=value")
        val k = kv.take(i).trim
        require(k.startsWith("spark."),
          s"SPARK_GRAFT_CONF key '$k' must start with spark.")
        conf.set(k, kv.drop(i + 1).trim)
      }
    }
    conf
  }
}
