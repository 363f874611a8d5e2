package graft

import org.apache.spark.sql.functions._
import graft.operators.PathOps

/** Gates for the wave-8 batch. */
class PathOpsSpec extends SparkSpec {

  private def q(name: String) =
    PathOps.all.find(_.name == name).get.run(spark, sf)

  test("top paths are 3-step, counts non-increasing, bounded by events") {
    val out = q("events_top_paths").cache()
    assert(out.count() == 10)
    assert(out.where(size(split(col("path"), ">")) =!= 3).count() == 0)
    val c = out.orderBy(desc("c"), asc("path")).select("c")
      .collect().map(_.getLong(0))
    assert(c.zip(c.tail).forall { case (a, b) => a >= b })
  }

  test("weighted sample is reproducible and favors heavy documents") {
    val a = q("sample_weighted").collect()
    val b = q("sample_weighted").collect()
    assert(a.toSeq == b.toSeq, "sample must be deterministic")
    // weight-proportional: the sampled docs' mean n_chars should beat
    // the corpus mean (u^(1/w) rises with w)
    val docs = Tables.t(spark, sf, "documents").where(col("n_chars") > 0)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val ids = a.map(_.getLong(0)).toSeq
    val sampleMean = docs.where(col("doc_id").isin(ids: _*))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("rank-with-ties keeps every row tied at the cut") {
    val out = q("window_topk_ties").cache()
    // rank() <= 3 keeps exactly the rows with FEWER than 3 strictly
    // greater rows in their partition — recompute that set directly
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
    val greater = li.groupBy("l_returnflag", "l_quantity").count()
    val strictlyAbove = greater.as("a").join(greater.as("b"),
        col("a.l_returnflag") === col("b.l_returnflag") &&
          col("b.l_quantity") > col("a.l_quantity"), "left")
      .groupBy(col("a.l_returnflag").as("f"), col("a.l_quantity").as("qv"),
        col("a.count").as("n"))
      .agg(coalesce(sum(col("b.count")), lit(0L)).as("above"))
    val expect = strictlyAbove.where(col("above") < 3)
      .agg(sum("n")).head().getLong(0)
    assert(out.count() == expect)
  }

  test("hierarchy shares sum to one within every region") {
    val sums = q("agg_hierarchy_share")
      .groupBy("r_name").agg(sum("share").as("s"))
    assert(sums.where(abs(col("s") - 1.0) > 0.001).count() == 0)
  }
}
