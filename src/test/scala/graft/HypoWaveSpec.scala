package graft

import graft.operators.{CurateOps, GraphOps, HypoOps, LabOps, SimilarityOps}
import org.apache.spark.sql.functions._

/** Invariant gates for the round-11 wave (the oracle differentials
  * prove cross-engine equality; these pin the statistics' semantics
  * against brute-force recomputation the oracle alone can't see).
  */
class HypoWaveSpec extends SparkSpec {

  private def run(all: Seq[GQuery], name: String) =
    all.find(_.name == name).get.run(spark, sf)

  test("stats_mann_whitney: U matches the brute-force pairwise count") {
    val r = run(HypoOps.all, "stats_mann_whitney").head()
    val (n1, n2, u1) = (r.getLong(0), r.getLong(1), r.getDouble(2))
    val vals = Tables.t(spark, sf, "events")
      .where(col("event_type").isin("purchase", "click") &&
        col("value").isNotNull)
      .select("event_type", "value").collect()
      .map(x => (x.getString(0), x.getDouble(1)))
    val a = vals.filter(_._1 == "purchase").map(_._2)
    val b = vals.filter(_._1 == "click").map(_._2)
    assert(a.length == n1 && b.length == n2)
    // U1 = #{(x,y): x>y} + 0.5·#{x==y} — O(n²) on the small SF only
    var u = 0.0
    for (x <- a; y <- b)
      u += (if (x > y) 1.0 else if (x == y) 0.5 else 0.0)
    assert(math.abs(u - u1) < 1e-6, s"brute U=$u query u1=$u1")
    assert(u1 >= 0 && u1 <= n1.toDouble * n2)
  }

  test("privacy_l_diversity_entropy: entropy-l bounded by distinct-l; group count agrees") {
    val r = run(HypoOps.all, "privacy_l_diversity_entropy").head()
    val (minE4, below2, recFail, groups) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(minE4 >= 10000) // exp(H) >= 1 always
    assert(below2 <= groups && recFail <= groups)
    val k = run(CurateOps.all, "privacy_k_anonymity").head()
    assert(groups == k.getAs[Long]("n_groups"))
    // per-group entropy-l <= distinct-l, so the minima order too
    assert(minE4 <= k.getAs[Long]("l_diversity") * 10000)
  }

  test("asof_join_nearest: sampled rows are truly the closest order, ties to prev") {
    val out = run(HypoOps.all, "asof_join_nearest")
      .limit(2000).collect()
    val ev = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("timestamp").cast("long").as("tsec")).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2))).toMap
    val orders = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"),
        col("o_orderdate").cast("timestamp").cast("long").as("osec"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, v) => k -> v.map(_.getLong(1)) }
    out.take(500).foreach { row =>
      val eid = row.getLong(0)
      val (uid, tsec) = ev(eid)
      val cand = orders.getOrElse(uid, Array.empty[Long])
      if (cand.isEmpty) assert(row.getString(2) == "none")
      else {
        val best = cand.map(o => math.abs(tsec - o)).min
        assert(row.getLong(4) == best,
          s"event $eid: diff ${row.getLong(4)} != nearest $best")
        // equal-distance both sides must resolve to the earlier order
        val dirn = row.getString(2)
        val hasPrevAtBest = cand.exists(o => tsec - o == best)
        if (hasPrevAtBest) assert(dirn == "prev")
      }
    }
  }

  test("ingest_fixed_width_parse: round-trip totals equal the source aggregates") {
    val out = run(HypoOps.all, "ingest_fixed_width_parse").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = Tables.t(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect()
    assert(src.nonEmpty && src.length == out.size)
    src.foreach { r =>
      val (n, cents) = out(r.getString(0))
      assert(n == r.getLong(1) && cents == r.getLong(2))
    }
  }

  test("graph_scc: component ids are min members, sizes consistent") {
    val out = run(GraphOps.all, "graph_scc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (node, id, _) => assert(id <= node) }
    val byId = out.groupBy(_._2)
    byId.foreach { case (id, members) =>
      assert(members.map(_._1).min == id) // id IS the min member
      members.foreach { case (_, _, size) =>
        assert(size == members.length)
      }
    }
  }

  test("events_mann_kendall: S matches brute-force over the daily series") {
    val out = run(LabOps.all, "events_mann_kendall").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val daily = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .orderBy("event_type", "day").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val cs = rows.sortBy(_._2).map(_._3)
      var sStat = 0L
      for (i <- cs.indices; j <- i + 1 until cs.length)
        sStat += java.lang.Long.signum(cs(j) - cs(i))
      val (n, qS) = out(et)
      assert(n == cs.length)
      assert(qS == sStat, s"$et: brute S=$sStat query S=$qS")
    }
  }

  test("docs_curriculum_schedule: round-robin residues and strides hold") {
    val out = run(CurateOps.all, "docs_curriculum_schedule").collect()
    assert(out.length == 4)
    val total = Tables.t(spark, sf, "documents").count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      val (bucket, n, minPos, maxPos) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(minPos == bucket)         // first round-robin slot
      assert(maxPos == bucket + 4 * (n - 1)) // stride-4 residue class
    }
  }

  test("stats_benjamini_hochberg: BH adjustment is a monotone step-up, bounds hold") {
    val out = run(HypoOps.all, "stats_benjamini_hochberg").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(1)).toSeq == (1L to out.length).toSeq)
    var prevAdj = Long.MinValue
    out.foreach { r =>
      val (p, adj) = (r.getLong(3), r.getLong(4))
      assert(p >= 0 && p <= 10000 && adj >= 0 && adj <= 10000)
      assert(adj >= p - 1) // step-up never drops below raw p (floor slack 1)
      assert(adj >= prevAdj) // running-min from behind => monotone in rank
      prevAdj = adj
      assert(r.getBoolean(5) == (adj <= 1000))
    }
  }

  test("orders_priority_markov: stationary vector is a distribution, converged") {
    val out = run(HypoOps.all, "orders_priority_markov").collect()
    assert(out.length == 5)
    val mass = out.map(_.getLong(1)).sum
    assert(mass >= 9995 && mass <= 10000, s"pi mass $mass")  // floor loss < 5
    out.foreach(r => assert(r.getLong(2) <= 10, s"L1 delta ${r.getLong(2)}"))
  }

  test("events_poisson_rate_test: z reproduces from the two counts") {
    val r = run(HypoOps.all, "events_poisson_rate_test").head()
    val (cw, cd, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val l1 = cw / 2.0; val l2 = cd / 5.0
    val expect = math.floor((l1 - l2) / math.sqrt(l1 / 2.0 + l2 / 5.0) * 10000).toLong
    assert(z == expect)
  }

  test("stats_poisson_bootstrap: CI brackets the sample mean") {
    val r = run(HypoOps.all, "stats_poisson_bootstrap").head()
    val (n, mean, lo, hi) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(n > 0)
    assert(lo < hi)
    assert(lo <= mean && mean <= hi,
      s"mean $mean outside bootstrap CI [$lo, $hi]")
  }

  test("agg_tdigest_quantiles: rank error well inside spec across partitionings") {
    import graft.functions.TDigestAggregator
    import org.apache.spark.sql.Encoders
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val tdU = udaf(TDigestAggregator.digest(qs), Encoders.scalaDouble)
    val xs = Tables.t(spark, sf, "lineitem")
      .select(col("l_extendedprice").as("x"))
    val sorted = xs.collect().map(_.getDouble(0)).sorted
    val n = sorted.length.toDouble
    // two different partitionings => different merge orders; both must
    // land within HALF the query's 0.025 budget
    for (parts <- Seq(3, 17)) {
      val est = xs.repartition(parts).agg(tdU(col("x")))
        .head().getSeq[Double](0)
      qs.zip(est).foreach { case (q, v) =>
        val rank = sorted.count(_ <= v) / n
        assert(math.abs(rank - q) <= 0.0125,
          s"q=$q parts=$parts: rank $rank est $v")
      }
    }
  }

  test("text_heaps_law: cumulative curve monotone, totals match the corpus") {
    val out = run(HypoOps.all, "text_heaps_law").collect()
    assert(out.length == 10)
    var (pt, pv) = (0L, 0L)
    out.foreach { r =>
      val (tok, ty, beta) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(tok >= pt && ty >= pv) // cumulative => monotone
      assert(ty <= tok)             // vocab can't exceed tokens
      assert(beta > 0 && beta <= 10000) // sublinear growth
      pt = tok; pv = ty
    }
    val totalTok = Tables.t(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").count()
    assert(out.last.getLong(1) == totalTok)
  }

  test("supplier_herfindahl: HHI within [1/n, 1]") {
    val out = run(HypoOps.all, "supplier_herfindahl").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, hhi) = (r.getLong(1), r.getDouble(2))
      assert(hhi <= 1.000001, s"${r.getString(0)}: hhi $hhi")
      assert(hhi >= 1.0 / n - 1e-6, s"${r.getString(0)}: hhi $hhi below 1/$n")
    }
  }

  test("docs_mix_waterfill: budget exhausted exactly, rates in (0,1]") {
    val out = run(HypoOps.all, "docs_mix_waterfill").collect()
    assert(out.nonEmpty)
    val totalChars = out.map(_.getLong(1)).sum
    val sampled = out.map(_.getLong(3)).sum
    // capped languages contribute whole mass, open ones exactly alloc:
    // the plan exhausts the budget up to floor loss per language
    assert(math.abs(sampled - 0.7 * totalChars) <= out.length + 1,
      s"sampled $sampled vs budget ${0.7 * totalChars}")
    out.foreach { r =>
      val (chars, rate, sc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(rate > 0 && rate <= 1000000)
      assert(sc <= chars)
      if (rate == 1000000) assert(sc == chars) // capped => taken whole
    }
  }

  test("dedup_cascade_funnel: monotone survivor funnel anchored at the corpus") {
    val out = run(HypoOps.all, "dedup_cascade_funnel").collect()
    assert(out.length == 4)
    val total = Tables.t(spark, sf, "documents").count()
    assert(out.head.getLong(2) == total)
    var (pd, pc) = (Long.MaxValue, Long.MaxValue)
    out.foreach { r =>
      val (d, c) = (r.getLong(2), r.getLong(3))
      assert(d <= pd && c <= pc, s"stage ${r.getLong(0)} grew")
      pd = d; pc = c
    }
  }

  test("emb_kmeans_iter: partition of the corpus, cosine bounds") {
    val out = run(SimilarityOps.all, "emb_kmeans_iter").collect()
    assert(out.length == 4)
    val total = Tables.t(spark, sf, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == total)
    out.foreach { r =>
      assert(r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001)
    }
  }
}
