package graft

import graft.operators.IncrOps
import graft.plans.SummaryRewriteRule
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The materialized-view aggregate-rewrite rule: fires on an exact
  * match (and on column subsets), preserves results and downstream
  * operator wiring (exprIds), and refuses anything it cannot prove —
  * filtered children, different groupings.
  */
class SummaryRewriteSpec extends SparkSpec {

  private lazy val orders = Tables.t(spark, sf, "orders")
  private lazy val mvDir = {
    val d = Files.createTempDirectory("graft_mv_spec").toString + "/monthly"
    IncrOps.monthlyPartials(orders).write.mode("overwrite").parquet(d)
    d
  }

  private def withRule[T](body: => T): T = {
    SummaryRewriteRule.clear()
    SummaryRewriteRule.register("monthly_orders",
      IncrOps.monthlyPartials(orders), spark.read.parquet(mvDir))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ SummaryRewriteRule
    try body finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq SummaryRewriteRule)
      SummaryRewriteRule.clear()
    }
  }

  private def scansMv(df: DataFrame): Boolean =
    SummaryRewriteRule.scansPath(df.queryExecution.optimizedPlan, "graft_mv_spec")

  test("exact-match aggregate rewrites to the summary scan with identical results") {
    val expected = IncrOps.monthlyPartials(orders)
      .orderBy("month").collect()
    withRule {
      val q = IncrOps.monthlyPartials(orders).orderBy("month")
      assert(scansMv(q), "rewrite did not fire:\n" + q.queryExecution.optimizedPlan)
      assert(q.collect().toSeq == expected.toSeq)
    }
  }

  test("a query needing a subset of the view's columns rewrites too") {
    withRule {
      val q = orders.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n"))
        .orderBy("month")
      assert(scansMv(q), "subset rewrite did not fire:\n" + q.queryExecution.optimizedPlan)
      val base = orders.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(count(lit(1)).as("n")).orderBy("month")
      // compare against a no-rule run of the same query
      SummaryRewriteRule.clear()
      assert(q.collect().toSeq == base.collect().toSeq)
    }
  }

  test("a filtered query must NOT rewrite (the view has no filter)") {
    withRule {
      val q = IncrOps.monthlyPartials(
        orders.where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")))
      assert(!scansMv(q), "rewrite fired on a filtered child:\n" +
        q.queryExecution.optimizedPlan)
    }
  }

  test("a different grouping must NOT rewrite") {
    withRule {
      val q = orders.groupBy(date_trunc("year", col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"))
      assert(!scansMv(q), "rewrite fired across groupings:\n" +
        q.queryExecution.optimizedPlan)
    }
  }

  test("an aggregate the view does not store must NOT rewrite") {
    withRule {
      val q = orders.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(max(col("o_totalprice")).as("mx"))
      assert(!scansMv(q), "rewrite fired for an unstored aggregate:\n" +
        q.queryExecution.optimizedPlan)
    }
  }

  test("scalar computation over stored aggregates rebases (date_format, div)") {
    withRule {
      val q = IncrOps.monthlyPartials(orders)
        .select(date_format(col("month"), "yyyy-MM").as("m"),
          expr("cents div n_orders").as("avg_cents"))
        .orderBy("m")
      assert(scansMv(q), "derived-output rewrite did not fire:\n" +
        q.queryExecution.optimizedPlan)
      SummaryRewriteRule.clear()
      val base = IncrOps.monthlyPartials(orders)
        .select(date_format(col("month"), "yyyy-MM").as("m"),
          expr("cents div n_orders").as("avg_cents"))
        .orderBy("m")
      assert(q.collect().toSeq == base.collect().toSeq)
    }
  }

  test("an avg() the view stores only as sum/count parts must NOT rewrite") {
    withRule {
      val q = orders.groupBy(date_trunc("month", col("o_orderdate")).as("month"))
        .agg(avg(col("o_totalprice")).as("a"))
      assert(!scansMv(q), "avg() wrongly rewrote:\n" + q.queryExecution.optimizedPlan)
    }
  }

  test("rewritten output composes with downstream operators (exprIds preserved)") {
    withRule {
      val m = IncrOps.monthlyPartials(orders)
      // join the rewritten aggregate with itself through a projection —
      // any broken exprId would fail analysis or return garbage
      val joined = m.as("a").join(m.as("b"), "month")
        .where(col("a.n_orders") === col("b.n_orders"))
        .select(col("month"), col("a.cents"))
      assert(scansMv(joined))
      assert(joined.count() == IncrOps.monthlyPartials(orders).count())
    }
  }
}
