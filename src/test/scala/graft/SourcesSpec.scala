package graft

import graft.operators.Ingest
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Source-path parity: kafka-shaped end-to-end pipeline, JSON-lines
  * round-trip, CSV strict mode.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("kafkaShapedToSnapshot: global vs scoped dedup end-to-end (reference E2/E3 trace)") {
    val frame = Seq(
      // (key, value-json, partition, offset)
      ("k", """{"id":7,"msg":"v1"}""", 0, 1L),
      ("k", """{"id":7,"msg":"v2"}""", 0, 5L),  // same partition: overwrites
      ("k", """{"id":7,"msg":"p1"}""", 1, 2L),  // other partition, lower offset than 5
      ("k", "garbage", 0, 6L),                  // dropped
      ("k", "{}", 1, 3L)                        // defaults id=0 msg=""
    ).toDF("key", "value", "partition", "offset")
      .withColumn("value", col("value").cast("binary")) // kafka wire type

    val global = Sources.kafkaShapedToSnapshot(frame, scoped = false)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(global.toSeq == Seq((0L, ""), (7L, "v2")))

    val scoped = Sources.kafkaShapedToSnapshot(frame, scoped = true)
      .orderBy("id", "partition").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(scoped.toSeq == Seq((0L, "", 1), (7L, "v2", 0), (7L, "p1", 1)))
  }

  test("JSON-lines snapshot round-trip: write then read yields the same rows") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    val rows = Seq((1L, "a"), (2L, "b"), (3L, ""))
    Ingest.writeSnapshotJson(rows.toDF("id", "msg"), dir)
    val back = Sources.readJsonLines(spark, dir, Ingest.msgSchema)
      .as[(Long, String)].collect().sorted
    assert(back.toSeq == rows.sorted)
  }

  test("ORC round-trip preserves rows and pushes filters to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val ev = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    Sources.writeOrc(ev, dir)
    val back = Sources.readOrc(spark, dir, ev.schema)
    assert(back.count() == ev.count())
    assert(back.except(ev).isEmpty && ev.except(back).isEmpty)
    val filtered = back.where(col("event_type") === "click").select("event_id")
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,click)]"),
      s"ORC scan must push the predicate:\n$scan")
  }

  test("CSV strict: explicit schema, malformed rows dropped") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "d.csv"),
      "id,msg\n1,hello\nnot-a-long,world\n3,ok\n")
    val got = Sources.readCsvStrict(spark, dir,
      org.apache.spark.sql.types.StructType(Ingest.msgSchema.fields))
      .as[(Long, String)].collect().sorted
    assert(got.toSeq == Seq((1L, "hello"), (3L, "ok")))
  }
}
