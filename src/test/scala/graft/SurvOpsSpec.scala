package graft

import org.apache.spark.sql.functions._
import graft.operators.SurvOps

/** Gates for the wave-10 batch. */
class SurvOpsSpec extends SparkSpec {

  private def q(name: String) =
    SurvOps.all.find(_.name == name).get.run(spark, sf)

  test("KM curve is non-increasing within (0, 1]") {
    val s = q("survival_km").orderBy("d").select("s")
      .collect().map(_.getDouble(0))
    assert(s.nonEmpty)
    assert(s.forall(v => v > 0 && v <= 1))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b },
      "survival must never increase")
  }

  test("k-core survivors all have degree >= k within the peeled subgraph") {
    val out = q("graph_kcore_peel").cache()
    assert(out.count() > 0)
    assert(out.where(col("deg") < 80).count() == 0)
  }

  test("gini lies in [0, 1) and matches a mean-absolute-difference recomputation") {
    val row = q("agg_gini").head()
    val g = row.getDouble(0)
    assert(g >= 0 && g < 1)
    // G = mean |xi - xj| / (2 * mean x): recompute via the pair form on
    // a sample-sized table (|customers| at sf0.001 is small)
    val cr = Tables.t(spark, sf, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("x"))
    val n = cr.count().toDouble
    val meanX = cr.agg(avg("x")).head().getDouble(0)
    val mad = cr.as("a").crossJoin(cr.as("b"))
      .agg(avg(abs(col("a.x") - col("b.x")))).head().getDouble(0)
    val expect = mad / (2 * meanX)
    // rank formula equals pair formula up to the (n-1)/n finite-sample
    // factor: G_rank = G_pair * n/(n-1) - adjustments; allow loose bound
    assert(math.abs(g - expect) < 0.05, s"gini $g vs pair-form $expect")
    assert(row.getLong(1) == n.toLong)
  }

  test("benford shares sum to one and deviations are share - expected") {
    val out = q("benford_first_digit").cache()
    assert(out.count() == 9)
    val tot = out.agg(sum("share")).head().getDouble(0)
    assert(math.abs(tot - 1.0) < 0.001)
    assert(out.where(abs(col("dev") - (col("share") - col("benford"))) > 0.0001)
      .count() == 0)
  }
}
