package graft

import graft.streaming.StreamingIngest

/** Guards for [[StreamingIngest.withStateShards]]: the streaming
  * differentials rely on it capping state sharding for the stream and
  * restoring the session conf before their batch reduce runs.
  */
class StateShardsSpec extends SparkSpec {
  private val key = "spark.sql.shuffle.partitions"

  test("withStateShards caps inside the body and restores after") {
    val before = spark.conf.get(key)
    val inside = StreamingIngest.withStateShards(spark, 2) { spark.conf.get(key) }
    assert(inside == "2")
    assert(spark.conf.get(key) == before)
  }

  test("withStateShards never RAISES the partition count and restores on throw") {
    val before = spark.conf.get(key)
    val inside = StreamingIngest.withStateShards(spark, 4096) { spark.conf.get(key) }
    assert(inside == before, "cap must be min(current, n), not an increase")
    intercept[RuntimeException] {
      StreamingIngest.withStateShards(spark, 2) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get(key) == before, "conf must restore even when the body throws")
  }
}
