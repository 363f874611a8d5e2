package graft

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.{FunnelEvent, funnelUpdates}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming MapState funnel must emit exactly the users the batch
  * conditional-min chain converts, with the same first/convert times,
  * when events replay in event-time order.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val stepMs = 3L * 24 * 3600 * 1000

  test("streaming funnel equals the batch windowed-funnel chain") {
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
      val q = funnelUpdates(ms.toDS(), Seq("view", "click", "purchase"), stepMs)
        .writeStream.format("memory").queryName("funnel_stream")
        .outputMode("append").start()
      try {
        ev.grouped(ev.length / 3 + 1).foreach { chunk =>
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
    val streamed = spark.table("funnel_stream")
      .select(col("user_id"), col("t_first"), col("t_convert"))

    // batch chain: first view, first qualifying click, first qualifying purchase
    val e = Tables.t(spark, sf, "events")
    val v = e.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min("ts").as("t1"))
    val c = e.where(col("event_type") === "click").as("e")
      .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
        col("e.ts") > col("t1") &&
        col("e.ts") <= col("t1") + expr("INTERVAL 3 DAYS"))
      .groupBy(col("e.user_id").as("user_id"), col("t1")).agg(min("e.ts").as("t2"))
    val p = e.where(col("event_type") === "purchase").as("e2")
      .join(c.as("c"), col("e2.user_id") === col("c.user_id") &&
        col("e2.ts") > col("t2") &&
        col("e2.ts") <= col("t2") + expr("INTERVAL 3 DAYS"))
      .groupBy(col("e2.user_id").as("user_id"), col("t1")).agg(min("e2.ts").as("t3"))
    val batch = p.select(col("user_id"), col("t1").as("t_first"),
      col("t3").as("t_convert"))

    assert(streamed.count() > 0)
    val extra = streamed.except(batch).collect()
    val missing = batch.except(streamed).collect()
    assert(extra.isEmpty && missing.isEmpty,
      s"streamed-only=${extra.take(3).toSeq} batch-only=${missing.take(3).toSeq} " +
        s"counts s=${streamed.count()} b=${batch.count()}")
    // exactly-once: one emission per converting user
    assert(streamed.groupBy("user_id").count().where(col("count") > 1).count() == 0)
  }
}
