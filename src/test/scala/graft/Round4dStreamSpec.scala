package graft

import graft.streaming.StreamingIngest
import graft.streaming.StreamingIngest.KeyedRecord
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState (Spark 4 StatefulProcessor API) gates: the modern
  * latest-wins upsert must emit the exact update log of the
  * flatMapGroupsWithState form on the same replay.
  */
class Round4dStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState latest-wins emits the same update log as fMGWS") {
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)
    try {
      val ms = MemoryStream[KeyedRecord]
      val q = StreamingIngest.latestWinsUpdatesTws(ms.toDS())
        .writeStream.format("memory").queryName("tws_test").outputMode("update").start()
      try {
        ms.addData(KeyedRecord(1, "a", 10), KeyedRecord(2, "x", 5))
        q.processAllAvailable()
        ms.addData(KeyedRecord(1, "stale", 3)) // older version → no emit
        q.processAllAvailable()
        ms.addData(KeyedRecord(1, "b", 20), KeyedRecord(2, "x2", 6),
          KeyedRecord(3, "new", 1))
        q.processAllAvailable()
        ms.addData(KeyedRecord(3, "tie", 1)) // equal version → no emit
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table("tws_test").as[KeyedRecord].collect()
        .sortBy(r => (r.id, r.version))
      assert(rows.toSeq == Seq(
        KeyedRecord(1, "a", 10), KeyedRecord(1, "b", 20),
        KeyedRecord(2, "x", 5), KeyedRecord(2, "x2", 6),
        KeyedRecord(3, "new", 1)))
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
