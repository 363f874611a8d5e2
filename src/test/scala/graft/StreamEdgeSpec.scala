package graft

import graft.operators.StreamEdgeOps
import org.apache.spark.sql.functions._

/** Batch-equivalence gates for the watermark-edge streaming wave
  * (operators/StreamEdgeOps) — each registered stream is re-derived
  * against the equivalent batch plan on the same tables, in-JVM (the
  * DuckDB oracle re-proves it cross-engine).
  */
class StreamEdgeSpec extends SparkSpec {

  private def q(name: String) =
    StreamEdgeOps.all.find(_.name == name).get.run(spark, sf)

  test("streaming_dropdup_watermark: doubled feed reduces to exactly-once counts") {
    val out = q("streaming_dropdup_watermark").collect()
    val batch = Tables.t(spark, sf, "events")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_id")).as("n_ids"),
        round(sum("value"), 2).as("sv"))
      .orderBy("event_type").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq ==
      batch.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq)
    // every event arrived twice; dedup must keep n == n_ids per type
    assert(out.forall(r => r.getLong(1) == r.getLong(2)))
  }

  test("streaming_outer_join: unmatched views surface as null-extended rows") {
    val out = q("streaming_outer_join").collect()
    val nViews = Tables.t(spark, sf, "events")
      .where(col("event_type") === "view").count()
    // outer semantics: at least one user has a view with no purchase
    // within the hour (n_rows > n_matched), and no view is lost
    assert(out.exists(r => r.getLong(1) > r.getLong(2)))
    assert(out.map(_.getLong(2)).sum <= out.map(_.getLong(1)).sum)
    assert(out.map(_.getLong(1)).sum >= nViews) // >=: matched views fan out
  }

  test("streaming_chained_windows: two-stage rollup equals the batch rollup") {
    val out = q("streaming_chained_windows").collect()
    val batch = Tables.t(spark, sf, "events")
      .groupBy(window(col("ts").cast("timestamp"), "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .groupBy(window(col("window"), "1 hour"))
      .agg(sum("n").as("n_events"), count(lit(1)).as("n_user_quarters"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hs"),
        col("n_events"), col("n_user_quarters"))
      .orderBy("hs").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      batch.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }
}
