package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query steady-state seconds.
  *
  * Each query runs once untimed (JVM/codegen/broadcast warmup — local-mode
  * stand-in for a cluster's long-lived executors) and once timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop write, NOT count(): under count() Catalyst prunes every column,
    // so projection-only queries (fingerprints, embeddings, token stats)
    // would skip their real work and report fictional times. The noop sink
    // materializes every output column and discards the bytes.
    // A query that THROWS must surface as an error, not a fast wall-time —
    // otherwise a regression masquerades as a speedup.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[String] =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
      catch { case t: Throwable =>
        Some((t.getClass.getSimpleName + ": " + String.valueOf(t.getMessage)).take(300)) }
    SparkEntry.queries.foreach { case (_, fn) => run(fn) }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = run(fn)
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
