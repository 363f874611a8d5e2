package graft

import graft.operators.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental MinHash-LSH (DedupOps.minhashLshPairsIncremental): the
  * delta-probe run must reproduce exactly the from-scratch pair set
  * restricted to pairs touching the delta, and chaining incremental runs
  * over successive batches (maintaining the band index by append) must
  * reproduce the from-scratch run over the grown corpus — the invariant
  * that lets a 100 TB corpus dedup each new batch without ever
  * re-pairing history against itself.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val (n, k, bands, minJ) = (3, 32, 8, 0.1)

  private def pairsOf(df: DataFrame): Set[(Long, Long, Double)] =
    df.select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("incremental run equals the full pair set restricted to delta-touching pairs") {
    val d = Tables.t(spark, sf, "documents")
    val base = d.where(col("doc_id") % 8 =!= 0)
    val delta = d.where(col("doc_id") % 8 === 0)
    val inc = DedupOps.minhashLshPairsIncremental(
      DedupOps.lshBandIndex(base, n, k, bands), delta, n, k, bands, minJ)
    val full = DedupOps.minhashLshPairs(d, n, k, bands, minJ)
      .where(col("doc_a") % 8 === 0 || col("doc_b") % 8 === 0)
    assert(pairsOf(inc) == pairsOf(full))
    // pair_kind is consistent with the split
    val kinds = inc.select(col("doc_a"), col("doc_b"), col("pair_kind"))
      .collect()
    assert(kinds.nonEmpty)
    kinds.foreach { r =>
      val expected =
        if (r.getLong(0) % 8 == 0 && r.getLong(1) % 8 == 0) "delta_delta"
        else "delta_base"
      assert(r.getString(2) == expected, s"bad kind for $r")
    }
  }

  test("chained incremental batches + index append reproduce the from-scratch run") {
    val d = Tables.t(spark, sf, "documents")
    val b = (0 to 2).map(i => d.where(col("doc_id") % 3 === i))
    // batch 0 bootstraps with a full run; each later batch probes the
    // index maintained so far, then appends its own index rows
    val idx0 = DedupOps.lshBandIndex(b(0), n, k, bands)
    val p0 = DedupOps.minhashLshPairs(b(0), n, k, bands, minJ)
    val p1 = DedupOps.minhashLshPairsIncremental(idx0, b(1), n, k, bands, minJ)
    val idx01 = idx0.unionByName(DedupOps.lshBandIndex(b(1), n, k, bands))
    val p2 = DedupOps.minhashLshPairsIncremental(idx01, b(2), n, k, bands, minJ)
    val accumulated = pairsOf(p0) ++ pairsOf(p1) ++ pairsOf(p2)
    val scratch = pairsOf(DedupOps.minhashLshPairs(d, n, k, bands, minJ))
    assert(accumulated == scratch)
    // and the increments are disjoint: no pair is rediscovered
    assert(pairsOf(p0).size + pairsOf(p1).size + pairsOf(p2).size == scratch.size)
  }

  test("cluster-aware split never separates near-duplicates and covers every doc") {
    val out = graft.SparkEntry.queries("split_cluster_aware")(spark, sf)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val d = Tables.t(spark, sf, "documents")
    assert(rows.length == d.count(), "every document must be assigned")
    // leakage guard: one split per cluster
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $cluster straddles splits: ${members.toSeq}")
    }
    // all three splits populated, train dominant (80/10/10 by md5 digit)
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "valid", "test"), s"got $bySplit")
    assert(bySplit("train") > bySplit("valid") && bySplit("train") > bySplit("test"))
    // and near-dup PAIRS specifically agree (the invariant the split is for)
    val split = rows.map(r => r._1 -> r._3).toMap
    DedupOps.jaccardPairs(d, n = 3, minJ = 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .foreach(r => assert(split(r.getLong(0)) == split(r.getLong(1))))
  }

  test("budget mixing: allocations respect availability, exhaust the budget, saturate by ratio") {
    val out = graft.SparkEntry.queries("docs_mix_budget")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))
    val totalAvail = out.map(_._2).sum
    val budget = totalAvail * 6 / 10
    out.foreach { case (src, avail, _, sat, alloc) =>
      assert(alloc >= 0 && alloc <= avail, s"$src alloc $alloc outside [0, $avail]")
      if (sat) assert(alloc == avail, s"saturated $src not taken whole")
    }
    val total = out.map(_._5).sum
    assert(total <= budget, s"overshoot: $total > $budget")
    // floors lose < 1 token per unsaturated source
    assert(budget - total <= out.count(!_._4) + 1, s"undershoot too large: $budget - $total")
    // saturation is a prefix of the availability/weight ratio order
    val byRatio = out.sortBy(r => (r._2.toDouble / r._3, r._1))
    val firstUnsat = byRatio.indexWhere(!_._4)
    if (firstUnsat >= 0)
      assert(byRatio.drop(firstUnsat).forall(!_._4), "saturated set is not a ratio prefix")
  }
}
