package graft

import org.scalatest.funsuite.AnyFunSuite

/** SPARK_GRAFT_CONF passthrough: packed key=value pairs become builder
  * confs; malformed entries and non-spark keys fail loudly. */
class GraftConfSpec extends AnyFunSuite {

  test("packed pairs parse into a SparkConf") {
    val c = GraftConf.fromEnv(Map("SPARK_GRAFT_CONF" ->
      "spark.graft.indexBuckets=32, spark.sql.shuffle.partitions=64"))
    assert(c.get("spark.graft.indexBuckets") == "32")
    assert(c.get("spark.sql.shuffle.partitions") == "64")
  }

  test("absent env yields an empty conf") {
    assert(GraftConf.fromEnv(Map.empty).getAll.isEmpty)
  }

  test("malformed and non-spark keys fail loudly") {
    intercept[IllegalArgumentException](
      GraftConf.fromEnv(Map("SPARK_GRAFT_CONF" -> "nonsense")))
    intercept[IllegalArgumentException](
      GraftConf.fromEnv(Map("SPARK_GRAFT_CONF" -> "graft.indexBuckets=32")))
  }
}
