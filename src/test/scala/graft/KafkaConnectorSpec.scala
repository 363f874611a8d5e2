package graft

import graft.sources.Sources

/** Guarded integration test for the Kafka source wiring (SURVEY.md §2A
  * #1/#4): the `spark-sql-kafka-0-10` connector jar is not shipped in
  * this offline environment, so the suite SKIPS (cancels) cleanly when
  * the provider class is absent and runs the broker-free parts of the
  * integration when present — Kafka's relation schema is static, so
  * `kafkaBatch(...)` resolves and the reference pipeline composes on it
  * without contacting a broker.
  */
class KafkaConnectorSpec extends SparkSpec {

  private val connectorPresent = scala.util
    .Try(Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider"))
    .isSuccess

  test("kafka source wiring resolves against the connector (skips when jar absent)") {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 not on classpath (offline env) — skipping")
    val df = Sources.kafkaBatch(spark, "localhost:65535", "graft-test-topic")
    // schema resolution is broker-free: the Kafka relation schema is fixed
    assert(Set("key", "value", "topic", "partition", "offset",
      "timestamp", "timestampType").subsetOf(df.columns.toSet))
    // the full reference pipeline (lenient JSON → latest-wins) composes
    // directly on the connector's frame shape
    val snap = Sources.kafkaShapedToSnapshot(df.limit(0), scoped = false)
    assert(snap.columns.toSet == Set("id", "msg"))
    val scoped = Sources.kafkaShapedToSnapshot(df.limit(0), scoped = true)
    assert(scoped.columns.toSet == Set("id", "msg", "partition"))
  }

  test("streaming flavor resolves and carries maxOffsetsPerTrigger (skips when jar absent)") {
    assume(connectorPresent,
      "spark-sql-kafka-0-10 not on classpath (offline env) — skipping")
    val st = Sources.kafkaStream(spark, "localhost:65535", "graft-test-topic",
      maxOffsetsPerTrigger = 1000L)
    assert(st.isStreaming)
    assert(Set("key", "value", "partition", "offset").subsetOf(st.columns.toSet))
  }
}
