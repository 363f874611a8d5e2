package graft

import org.apache.spark.sql.functions._
import graft.operators.{FuzzyOps, LabOps, SurvOps, WaveOps}

/** Scale-stress gates for the iterative graph operators: run at sf0.01
  * (10× the unit-test scale factor — 2000 nodes, ~230k directed edges)
  * and assert the structural invariants hold there too. The point is
  * that the frontier/peel/vote fixpoints neither blow up nor degenerate
  * when the graph is 10× denser.
  */
class GraphScaleSpec extends SparkSpec {
  private val sf01 = "/root/testdata/sf0.01"

  test("BFS at sf0.01: all reached, levels bounded, seeds at zero") {
    val out = FuzzyOps.all.find(_.name == "graph_bfs_levels").get
      .run(spark, sf01).cache()
    assert(out.count() == 2000, "dense co-purchase graph reaches every part")
    assert(out.agg(max("lvl")).head().getLong(0) <= 3)
    assert(out.where(col("lvl") === 0).count() ==
      out.where(col("node") % 100 === 0).count())
  }

  test("LPA at sf0.01: labels collapse but never exceed node count") {
    val out = WaveOps.all.find(_.name == "graph_label_propagation").get
      .run(spark, sf01).cache()
    val nodes = out.count()
    val labels = out.select(countDistinct("lbl")).head().getLong(0)
    assert(nodes == 2000)
    assert(labels < nodes / 10,
      s"2 voting rounds on a dense graph must collapse labels ($labels)")
  }

  test("k-core at sf0.01: survivors' in-subgraph degrees all >= k") {
    val out = SurvOps.all.find(_.name == "graph_kcore_peel").get
      .run(spark, sf01).cache()
    assert(out.count() > 0)
    assert(out.where(col("deg") < 80).count() == 0)
  }

  test("neighbor-jaccard at sf0.01: scores bounded, pairs canonical") {
    val out = LabOps.all.find(_.name == "graph_neighbor_jaccard_capped").get
      .run(spark, sf01).cache()
    assert(out.count() > 0)
    assert(out.where(col("pa") >= col("pb")).count() == 0)
    assert(out.where(col("nj") > 1.0).count() == 0)
  }
}
