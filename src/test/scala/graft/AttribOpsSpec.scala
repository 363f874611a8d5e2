package graft

import org.apache.spark.sql.functions._
import graft.operators.AttribOps

/** Gates for the wave-11 batch. */
class AttribOpsSpec extends SparkSpec {

  private def q(name: String) =
    AttribOps.all.find(_.name == name).get.run(spark, sf)

  test("attribution credit conserves one unit per converting journey") {
    val totalCredit = q("events_attribution_position")
      .agg(sum("credit")).head().getDouble(0)
    // journeys = users with >= 1 event strictly before their first purchase
    val ev = Tables.t(spark, sf, "events")
    val fp = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("fu")).agg(min("ts").as("pt"))
    val journeys = ev.join(fp,
        col("user_id") === col("fu") && col("ts") < col("pt"))
      .select("user_id").distinct().count()
    assert(math.abs(totalCredit - journeys) < 0.01,
      s"credit $totalCredit should equal journeys $journeys")
  }

  test("windowed funnel stages are monotone and bounded by plain reach") {
    val row = q("events_funnel_windowed").head()
    val (s1, s2, s3) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(s1 >= s2 && s2 >= s3, "stages must shrink")
    assert(s3 >= 0 && s1 > 0)
  }

  test("SCD2 snapshot has one state per user seen by the midpoint") {
    val out = q("ingest_scd2_snapshot").cache()
    assert(out.groupBy("user_id").count().where(col("count") > 1).count() == 0,
      "as-of snapshot must be unique per user")
    val ev = Tables.t(spark, sf, "events")
    val vMid = ev.agg((max("event_id") / 2).cast("long")).head().getLong(0)
    val expectUsers = ev.where(col("event_id") <= vMid)
      .select("user_id").distinct().count()
    assert(out.count() == expectUsers,
      "every user with history at the midpoint appears exactly once")
  }

  test("normal-equation OLS residuals are uncorrelated with features") {
    val row = q("stats_ols_normal_eq").head()
    val (b1, b2, b0) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_quantity").as("x1"), col("l_discount").as("x2"),
        col("l_extendedprice").as("y"))
      .withColumn("r", col("y") - (lit(b0) + lit(b1) * col("x1") + lit(b2) * col("x2")))
    // normal equations ⇒ corr(residual, feature) ≈ 0
    val c = li.agg(corr("r", "x1").as("c1"), corr("r", "x2").as("c2")).head()
    assert(math.abs(c.getDouble(0)) < 0.01 && math.abs(c.getDouble(1)) < 0.01)
  }
}
