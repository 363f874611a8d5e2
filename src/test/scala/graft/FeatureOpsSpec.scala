package graft

import org.apache.spark.sql.functions._
import graft.operators.FeatureOps

/** Gates for the wave-9 featurization batch. */
class FeatureOpsSpec extends SparkSpec {

  private def q(name: String) =
    FeatureOps.all.find(_.name == name).get.run(spark, sf)

  test("point-in-time join covers every event exactly once, never leaks forward") {
    val out = q("join_point_in_time").cache()
    val ev = Tables.t(spark, sf, "events")
    assert(out.count() == ev.count(), "each event matches exactly one state")
    assert(out.groupBy("event_id").count().where(col("count") > 1).count() == 0)
    // no forward leakage: the attached state must equal the event's own
    // type whenever the event IS a change point (its state starts there)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val changePts = ev
      .withColumn("prev", lag("event_type", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("event_id"), col("event_type"))
    val joined = out.join(changePts, "event_id")
    assert(joined.where(col("state") =!= col("event_type")).count() == 0)
  }

  test("LOO encoding excludes the row's own label") {
    val out = q("feat_target_encode_loo").cache()
    val ev = Tables.t(spark, sf, "events")
    // recompute directly: (sum - y) / (n - 1)
    val g = ev.groupBy("event_type")
      .agg(sum("value").as("sv"), count(lit(1)).as("n"))
    val expect = ev.join(g, "event_type").where(col("n") > 1)
      .select(col("event_id"),
        round((col("sv") - col("value")) / (col("n") - 1), 4).as("loo"))
    assert(out.except(expect).isEmpty && expect.except(out).isEmpty)
    // and it differs from the plain mean for at least one row (leakage
    // actually removed, not a no-op)
    val mean = ev.join(g, "event_type")
      .select(col("event_id"), round(col("sv") / col("n"), 4).as("m"))
    assert(out.join(mean, "event_id").where(col("loo") =!= col("m")).count() > 0)
  }

  test("feature hashing conserves signed token mass per document") {
    val out = q("feat_hashing_trick").cache()
    assert(out.where(col("bucket") < 0 || col("bucket") > 63).count() == 0)
    // sum of |wt| per doc <= token count; equality iff no intra-bucket cancel
    val toks = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextOps.tokens(col("text"))).cast("long").as("tk"))
    val mass = out.groupBy("doc_id").agg(sum(abs(col("wt"))).as("m"))
    assert(mass.join(toks, "doc_id").where(col("m") > col("tk")).count() == 0)
  }
}
