package graft

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.{SessEvent, sessionize, sessionizeTws}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState sessionization with EVENT-TIME TIMERS must emit
  * the same closed sessions as the flatMapGroupsWithState form on the
  * same micro-batch replay.
  */
class TwsSessionSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def t(h: Int, m: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  private def feed(q: org.apache.spark.sql.streaming.StreamingQuery,
      ms: MemoryStream[SessEvent]): Unit = {
    ms.addData(
      SessEvent(1L, t(10, 0), 1.0), SessEvent(1L, t(10, 10), 2.0),
      SessEvent(1L, t(10, 50), 4.0),
      SessEvent(2L, t(10, 55), 8.0))
    q.processAllAvailable()
    ms.addData(SessEvent(9L, t(20, 0), 0.0))
    q.processAllAvailable()
    ms.addData(SessEvent(9L, t(21, 0), 0.0))
    q.processAllAvailable()
  }

  test("timer-based tws sessionization emits the fMGWS session set") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
    try {
      val msA = MemoryStream[SessEvent]
      val qA = sessionizeTws(msA.toDS(), gapMs = 30L * 60 * 1000)
        .writeStream.format("memory").queryName("tws_sess")
        .outputMode("append").start()
      try feed(qA, msA) finally qA.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val msB = MemoryStream[SessEvent]
    val qB = sessionize(msB.toDS(), gapMs = 30L * 60 * 1000)
      .writeStream.format("memory").queryName("fmgws_sess")
      .outputMode("append").start()
    try feed(qB, msB) finally qB.stop()

    def rows(tbl: String) = spark.table(tbl)
      .where(col("user_id") < 9).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString.substring(11, 16),
        r.getLong(2), r.getDouble(3))).sorted.toSeq
    val a = rows("tws_sess")
    val b = rows("fmgws_sess")
    assert(a == b, s"tws $a vs fMGWS $b")
    assert(a.nonEmpty && a.size == 3)
  }
}
