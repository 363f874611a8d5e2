package graft

import graft.streaming.StreamingIngest.{FunnelEvent, sequenceMatches}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The ListState streaming sequence matcher must emit exactly the batch
  * lead()-pattern matches on an ordered replay — including triples that
  * SPAN micro-batch boundaries (the buffer carry is the point).
  */
class SeqStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("streaming sequence matches equal the batch lead() pattern query") {
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .orderBy("ts", "user_id")
      .as[(Long, java.sql.Timestamp, String)]
      .collect()
      .map { case (u, t, e) => FunnelEvent(u, t, e) }

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
    try {
      val ms = MemoryStream[FunnelEvent]
      val q = sequenceMatches(ms.toDS(), Seq("view", "click", "purchase"))
        .writeStream.format("memory").queryName("seq_stream")
        .outputMode("append").start()
      try {
        // 5 uneven batches so triples cross batch boundaries
        ev.grouped(ev.length / 5 + 1).foreach { chunk =>
          ms.addData(chunk.toIndexedSeq)
          q.processAllAvailable()
        }
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val streamed = spark.table("seq_stream")
      .select(col("user_id"),
        date_format(col("match_start"), "yyyy-MM-dd HH:mm:ss").as("match_start"))
    val batch = graft.operators.EventOps.all
      .find(_.name == "events_sequence_match").get.run(spark, sf)
    assert(streamed.count() > 0)
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      s"streamed=${streamed.count()} batch=${batch.count()}")
  }

  test("single-element pattern does not crash on the empty retained tail") {
    // pattern.length == 1 retains an EMPTY tail between batches;
    // ListState.put rejects empty arrays, so the processor must clear
    // instead (regression guard for the buf.put(empty) crash)
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
    try {
      val ms = MemoryStream[FunnelEvent]
      val q = sequenceMatches(ms.toDS(), Seq("purchase"))
        .writeStream.format("memory").queryName("seq_stream_one")
        .outputMode("append").start()
      try {
        val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
        // two batches for the same user so state round-trips between them
        ms.addData(FunnelEvent(1L, t0, "view"), FunnelEvent(1L, t0, "purchase"))
        q.processAllAvailable()
        ms.addData(FunnelEvent(1L, t0, "purchase"), FunnelEvent(2L, t0, "view"))
        q.processAllAvailable()
      } finally q.stop()
      assert(spark.table("seq_stream_one").count() == 2)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
