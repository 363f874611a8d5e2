package graft

import graft.plans.BandJoin
import org.apache.spark.sql.functions._

/** Gates for the custom whole-operator band join: plan shape (the
  * custom physical node must actually plan), row-level equality with
  * the BroadcastNestedLoopJoin form, and the disjointness guard.
  */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tiers = Seq(
    ("bronze", 0.0, 100000.0),
    ("silver", 100000.0, 300000.0),
    ("gold", 300000.0, 1000000.0)).toDF("tier", "lo", "hi")

  test("band join plans BandJoinExec and equals the nested-loop form") {
    val orders = Tables.t(spark, sf, "orders")
    val custom = BandJoin.joinByBand(orders, tiers, "o_totalprice", "lo", "hi")
    assert(custom.queryExecution.executedPlan.toString.contains("BandJoin"),
      "the custom strategy must plan the custom physical operator")
    val bnlj = orders.join(broadcast(tiers),
      col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
    assert(custom.count() == bnlj.count())
    val a = custom.select("o_orderkey", "tier")
    val b = bnlj.select("o_orderkey", "tier")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("points outside every band drop (inner-join semantics)") {
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("shifted", col("o_totalprice") + 1000000.0)
    val joined = BandJoin.joinByBand(orders, tiers, "shifted", "lo", "hi")
    assert(joined.count() == 0)
  }

  test("decimal probe column and null-bound bands are handled") {
    // DecimalType evaluates to Spark's Decimal (not java.lang.Number) —
    // the probe-side eval must take the same toString path as `num`
    val orders = Tables.t(spark, sf, "orders")
      .withColumn("price_dec", col("o_totalprice").cast("decimal(18,2)"))
    val viaDec = BandJoin.joinByBand(orders, tiers, "price_dec", "lo", "hi")
    val viaDbl = BandJoin.joinByBand(orders, tiers, "o_totalprice", "lo", "hi")
    assert(viaDec.count() == viaDbl.count())
    // bands with null bounds can never match and must not trip the
    // disjointness guard (NaN comparisons are false)
    val withNull = Seq(
      (Option("bronze"), Option(0.0), Option(100000.0)),
      (Option("broken"), Option.empty[Double], Option(50.0)),
      (Option("silver"), Option(100000.0), Option(300000.0)),
      (Option("gold"), Option(300000.0), Option(1000000.0))
    ).toDF("tier", "lo", "hi")
    val j = BandJoin.joinByBand(Tables.t(spark, sf, "orders"), withNull,
      "o_totalprice", "lo", "hi")
    assert(j.count() == viaDbl.count())
    assert(j.where(col("tier") === "broken").count() == 0)
  }

  test("overlapping bands are rejected") {
    val bad = Seq(("x", 0.0, 10.0), ("y", 5.0, 15.0)).toDF("tier", "lo", "hi")
    val orders = Tables.t(spark, sf, "orders")
    val ex = intercept[Exception] {
      BandJoin.joinByBand(orders, bad, "o_totalprice", "lo", "hi").count()
    }
    assert(ex.getMessage.contains("disjoint") ||
      ex.getCause != null && ex.getCause.getMessage.contains("disjoint"))
  }
}
