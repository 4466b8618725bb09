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
