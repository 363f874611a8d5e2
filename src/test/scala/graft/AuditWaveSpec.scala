package graft

import graft.operators.{CorpusOps, CurateOps, EventOps, FuzzyOps, GraphOps, MoreOps, StatOps}
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

  test("agg_bitmap_distinct: bitmap popcount equals count_distinct exactly") {
    val out = run(MoreOps.all, "agg_bitmap_distinct").collect()
    val exact = Tables.t(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getLong(1) == exact(r.getString(0))))
  }

  test("parts_pareto_frontier: survivors undominated, non-survivors dominated") {
    val all = Tables.t(spark, sf, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("pc"),
        col("p_size").cast("long").as("sz"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def dominated(x: (Long, Long, Long)) = all.exists { o =>
      o._1 != x._1 && o._2 <= x._2 && o._3 >= x._3 &&
        (o._2 < x._2 || o._3 > x._3 || o._1 < x._1) // ties keep lowest key
    }
    val front = run(MoreOps.all, "parts_pareto_frontier")
      .collect().map(_.getLong(0)).toSet
    all.foreach(p => assert(front(p._1) == !dominated(p),
      s"part ${p._1}: frontier=${front(p._1)} dominated=${dominated(p)}"))
  }

  test("events_activity_streaks: streak bounds and one user re-derived") {
    val out = run(EventOps.all, "events_activity_streaks").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1)) // longest <= active days
      assert(r.getLong(3) >= 1 && r.getLong(2) >= 1)
    }
    val u = out.head.getLong(0)
    val days = Tables.t(spark, sf, "events")
      .where(col("user_id") === u)
      .select(to_date(col("ts")).as("d")).distinct()
      .collect().map(_.getDate(0).toLocalDate.toEpochDay).sorted
    var best = 1L; var cur = 1L
    days.toSeq.sliding(2).foreach {
      case Seq(a, b) =>
        cur = if (b == a + 1) cur + 1 else 1L
        best = math.max(best, cur)
      case _ =>
    }
    assert(out.head.getLong(2) == best)
    assert(out.head.getLong(1) == days.length.toLong)
  }

  test("er_golden_record: per-column survivorship honors priority and nulls") {
    val out = run(FuzzyOps.all, "er_golden_record").collect()
    val cust = Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2), r.getString(3))).toMap
    assert(out.length == cust.size)
    out.foreach { r =>
      val k = r.getLong(0)
      val (name, bal, seg) = cust(k)
      assert(r.getString(1) == name.toUpperCase) // CRM name always wins
      // CRM drops bal for k%3==0 → WEB supplies it; either way = source bal
      assert(math.abs(r.getDouble(2) - math.rint(bal * 100) / 100) < 1e-9)
      assert(r.getString(3) == seg) // seg from CRM (always present there)
      assert(r.getLong(4) == 2L)
    }
  }

  test("privacy_dp_geometric: noise bounded, arithmetic consistent, replay-stable") {
    val a = run(CurateOps.all, "privacy_dp_geometric").collect()
    a.foreach { r =>
      assert(r.getLong(3) >= -15 && r.getLong(3) <= 15)
      assert(r.getLong(4) == r.getLong(2) + r.getLong(3))
    }
    // hash-seeded draws: a second plan build yields byte-identical noise
    val b = run(CurateOps.all, "privacy_dp_geometric").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("docs_rendezvous_shard: growth moves docs ONLY into the new shard") {
    val out = run(CurateOps.all, "docs_rendezvous_shard").collect()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(out.map(_.getLong(1)).sum == nDocs)
    assert(out.map(_.getLong(2)).sum == nDocs)
    out.filter(_.getLong(0) < 8).foreach(r => assert(r.getLong(3) == 0L))
    val s8 = out.find(_.getLong(0) == 8L).get
    assert(s8.getLong(1) == 0L && s8.getLong(3) == s8.getLong(2))
    // elasticity: the moved fraction tracks 1/9, never the ~8/9 a
    // mod-hash reshard would force
    assert(s8.getLong(2).toDouble / nDocs < 2.0 / 9.0)
  }

  test("events_cuped_adjust: arms partition users; adjustment preserves scale") {
    val out = run(StatOps.all, "events_cuped_adjust").collect()
    assert(out.map(_.getLong(1)).sum ==
      Tables.t(spark, sf, "events").select("user_id").distinct().count())
    out.foreach { r =>
      assert(r.getDouble(4) >= 0 && r.getDouble(5) >= 0) // variances
      // theta-adjustment recenters but must not shift an arm's mean by
      // more than the cross-arm covariate imbalance allows (loose 20%)
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) <=
        0.2 * math.abs(r.getDouble(2)) + 1e-9)
    }
  }
}
