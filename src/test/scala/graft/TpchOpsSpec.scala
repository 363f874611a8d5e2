package graft

import org.apache.spark.sql.functions._
import graft.operators.TpchOps

/** Gates for the TPC-H analog batch: plan shapes (semi/anti compilation)
  * and cross-formulation differentials the oracle hash can't see.
  */
class TpchOpsSpec extends SparkSpec {

  private def q(name: String) =
    TpchOps.all.find(_.name == name).get.run(spark, sf)

  test("q13 keeps zero-order customers and conserves the customer count") {
    val out = q("q13_customer_distribution").cache()
    val nCust = Tables.t(spark, sf, "customer").count()
    val total = out.agg(sum("custdist")).head().getLong(0)
    assert(total == nCust, "distribution buckets must partition all customers")
  }

  test("q21 compiles the EXISTS / NOT EXISTS chain to semi + anti joins") {
    val plan = q("q21_waiting_supplier").queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "EXISTS must become a left semi join")
    assert(plan.contains("LeftAnti"), "NOT EXISTS must become a left anti join")
  }

  test("q19 disjunctive result equals the union of its three conjuncts") {
    val li = Tables.t(spark, sf, "lineitem")
    val p = Tables.t(spark, sf, "part")
    val j = li.join(p, col("l_partkey") === col("p_partkey"))
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int) =
      j.where(col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi))
        .select(coalesce(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))),
          lit(0.0)).as("r"))
        .head().getDouble(0)
    val expect = BigDecimal(
      branch("Brand#12", 5, 1, 11) + branch("Brand#23", 10, 10, 20) +
        branch("Brand#3", 15, 20, 30))
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = q("q19_disjunctive").head()
    val got = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    assert(math.abs(got - expect) < 0.02, s"$got vs $expect")
  }

  test("q22 survivors have no urgent orders and beat the average balance") {
    val c = Tables.t(spark, sf, "customer")
    val avgBal = c.where(col("c_acctbal") > 0)
      .agg(avg("c_acctbal")).head().getDouble(0)
    val urgentCust = Tables.t(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val survivors = c.where(col("c_acctbal") > avgBal)
      .join(urgentCust, col("c_custkey") === col("o_custkey"), "left_anti")
    val expect = survivors.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("totacct"))
    val out = q("q22_idle_accounts")
    assert(out.except(expect).isEmpty && expect.except(out).isEmpty)
  }

  test("q8 market share is a valid ratio in [0, 1]") {
    val out = q("q8_market_share")
    assert(out.count() > 0)
    assert(out.where(col("mkt_share") < 0 || col("mkt_share") > 1).count() == 0)
  }

  test("q4 semi join never multiplies orders (n bounded by quarter's orders)") {
    val out = q("q4_order_priority")
    val quarter = Tables.t(spark, sf, "orders")
      .where(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
        col("o_orderdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
      .count()
    val total = out.agg(sum("n")).head().getLong(0)
    assert(total <= quarter, "semi-join output must not exceed probe rows")
  }
}
