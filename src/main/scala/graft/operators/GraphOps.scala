package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics expressed as DataFrame fixpoints — the
  * companion to DedupOps' connected components: PageRank over the
  * co-purchase graph (parts linked when they appear in the same order).
  *
  * Scale design: the edge list (with per-source out-degree attached) is
  * materialized ONCE (localCheckpoint cuts lineage, exactly as the CC
  * rounds do); each iteration is then one join + one aggregate — the
  * canonical Pregel-as-DataFrame shape. Rank vectors are O(|V|) rows,
  * edges O(|E|); nothing quadratic ever forms. On a cluster the edge
  * list would be HASH-partitioned by src once and every iteration's
  * join reuses that partitioning (no re-shuffle of the big side).
  */
object GraphOps {

  /** Fixed-iteration damped PageRank over a DIRECTED edge list
    * (src, dst). Callers pass a bidirected list for undirected graphs.
    * Init rank 1.0 per node (unnormalized form — node count never needs
    * a global pass); every node must appear as a src (true for
    * bidirected lists), so the node set is stable across iterations.
    */
  def pagerank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val withDeg = edges.join(deg, "src").localCheckpoint()
    var ranks = withDeg.select(col("src").as("node")).distinct()
      .withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      ranks = withDeg.join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("dst").as("node"))
        .agg((lit(1.0 - damping) + lit(damping) * sum("c")).as("rank"))
    }
    ranks
  }

  val all: Seq[GQuery] = Seq(

    GQuery(
      "graph_pagerank",
      (s, dir) => {
        // Co-purchase graph: parts are linked when some order contains
        // both (lineitem self-join per order — pairs only within an
        // order's ~4 lines, never cross-order). 3 damped iterations;
        // ranks rounded to 6 dp so cross-engine double-summation-order
        // noise (~1e-13 on O(1) ranks) cancels.
        val li = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        val bidir = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        pagerank(bidir, iters = 3)
          .select(col("node"), round(col("rank"), 6).as("rank"))
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |           FROM lineitem a JOIN lineitem b
             |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |     bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
             |     deg AS (SELECT src, count(*) AS d FROM bidir GROUP BY src),
             |     r0 AS (SELECT src AS node, 1.0 AS rank FROM deg),
             |     r1 AS (SELECT bidir.dst AS node, 0.15 + 0.85 * sum(r0.rank / deg.d) AS rank
             |            FROM bidir JOIN r0 ON bidir.src = r0.node
             |                       JOIN deg ON bidir.src = deg.src
             |            GROUP BY bidir.dst),
             |     r2 AS (SELECT bidir.dst AS node, 0.15 + 0.85 * sum(r1.rank / deg.d) AS rank
             |            FROM bidir JOIN r1 ON bidir.src = r1.node
             |                       JOIN deg ON bidir.src = deg.src
             |            GROUP BY bidir.dst),
             |     r3 AS (SELECT bidir.dst AS node, 0.15 + 0.85 * sum(r2.rank / deg.d) AS rank
             |            FROM bidir JOIN r2 ON bidir.src = r2.node
             |                       JOIN deg ON bidir.src = deg.src
             |            GROUP BY bidir.dst)
             |SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node""".stripMargin)),

    GQuery(
      "graph_personalized_pagerank",
      (s, dir) => {
        // PERSONALIZED PageRank — the recommendation/retrieval variant:
        // restart mass returns only to a SEED set (every 50th part),
        // so rank measures proximity TO THE SEEDS, not global
        // centrality. Same Pregel-as-DataFrame shape as graph_pagerank
        // (one join + one partial-agg exchange per iteration, degree
        // table checkpointed once); the seed indicator rides the node
        // table and joins back each round for the (1−d)·s(v) restart
        // term. 3 iterations, 6 dp rounding for cross-engine summation
        // noise.
        val li = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct()
        val bidir = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
        val deg = bidir.groupBy("src").agg(count(lit(1)).as("deg"))
        val withDeg = bidir.join(deg, "src").localCheckpoint()
        val seeds = withDeg.select(col("src").as("node")).distinct()
          .withColumn("s", when(col("node") % 50 === 0, 1.0).otherwise(0.0))
        var ranks = seeds.select(col("node"), col("s").as("rank"))
        for (_ <- 1 to 3) {
          ranks = withDeg.join(ranks, col("src") === col("node"))
            .select(col("dst"), (col("rank") / col("deg")).as("c"))
            .groupBy(col("dst").as("node"))
            .agg(sum("c").as("m"))
            .join(seeds.withColumnRenamed("node", "node2"),
              col("node") === col("node2"))
            .select(col("node"), (lit(0.15) * col("s") + lit(0.85) * col("m")).as("rank"))
        }
        ranks.select(col("node"), round(col("rank"), 6).as("rank"))
          .where(col("rank") =!= 0.0)
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |           FROM lineitem a JOIN lineitem b
             |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |  bidir AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
             |  deg AS (SELECT src, count(*) AS d FROM bidir GROUP BY src),
             |  sd AS (SELECT src AS node,
             |                CASE WHEN src % 50 = 0 THEN 1.0 ELSE 0.0 END AS s
             |         FROM deg),
             |  r0 AS (SELECT node, s AS rank FROM sd),
             |  r1 AS (SELECT sd.node, 0.15 * sd.s + 0.85 * m AS rank
             |         FROM (SELECT bidir.dst AS node, sum(r0.rank / deg.d) AS m
             |               FROM bidir JOIN r0 ON bidir.src = r0.node
             |                          JOIN deg ON bidir.src = deg.src
             |               GROUP BY bidir.dst) t JOIN sd ON sd.node = t.node),
             |  r2 AS (SELECT sd.node, 0.15 * sd.s + 0.85 * m AS rank
             |         FROM (SELECT bidir.dst AS node, sum(r1.rank / deg.d) AS m
             |               FROM bidir JOIN r1 ON bidir.src = r1.node
             |                          JOIN deg ON bidir.src = deg.src
             |               GROUP BY bidir.dst) t JOIN sd ON sd.node = t.node),
             |  r3 AS (SELECT sd.node, 0.15 * sd.s + 0.85 * m AS rank
             |         FROM (SELECT bidir.dst AS node, sum(r2.rank / deg.d) AS m
             |               FROM bidir JOIN r2 ON bidir.src = r2.node
             |                          JOIN deg ON bidir.src = deg.src
             |               GROUP BY bidir.dst) t JOIN sd ON sd.node = t.node)
             |SELECT node, round(rank, 6) AS rank FROM r3
             |WHERE round(rank, 6) <> 0.0 ORDER BY node""".stripMargin)),

    GQuery(
      "graph_triangles",
      (s, dir) => {
        // Triangle census + global clustering coefficient over the
        // co-purchase graph. Edges are ORIENTED low-id → high-id, so the
        // two-hop join x→y→z closed by the check edge x→z counts each
        // triangle exactly once (the compact-forward algorithm).
        // Measured negative (round 8, sf0.1 local[32]): re-orienting by
        // (degree, id) — the textbook O(m^1.5) refinement that bounds
        // wedge fan-out by forward degree — ran warm_min 10.7s vs 7.4s
        // for this form. TPC-H part degrees are near-uniform (no hubs),
        // so orientation saves nothing while the degree attach adds two
        // joins and a checkpoint. On a skewed real-world graph the
        // (degree, id) orientation IS the 100 TB form; with uniform
        // degrees the id order already bounds fan-out at ~d/2.
        // Wedges (open two-paths) come from bidirected degrees:
        // Σ d·(d−1)/2; global CC = 3·triangles / wedges.
        val li = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .distinct().localCheckpoint()
        val tri = e.as("x").join(e.as("y"), col("x.dst") === col("y.src"))
          .join(e.as("z"),
            col("z.src") === col("x.src") && col("z.dst") === col("y.dst"))
          .agg(count(lit(1)).as("n_triangles"))
        val wedges = e.select(col("src").as("node"))
          .union(e.select(col("dst")))
          .groupBy("node").agg(count(lit(1)).as("d"))
          .agg(sum(col("d") * (col("d") - 1) / 2).cast("long").as("n_wedges"))
        tri.crossJoin(wedges)
          .select(col("n_triangles"), col("n_wedges"),
            round(col("n_triangles") * 3.0 / col("n_wedges"), 6).as("global_cc"))
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
             |           FROM lineitem a JOIN lineitem b
             |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
             |     tri AS (SELECT count(*) AS n_triangles
             |             FROM e x JOIN e y ON x.dst = y.src
             |                      JOIN e z ON z.src = x.src AND z.dst = y.dst),
             |     deg AS (SELECT node, count(*) AS d
             |             FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
             |             GROUP BY node),
             |     w AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
             |SELECT n_triangles, n_wedges,
             |       round(n_triangles * 3.0 / n_wedges, 6) AS global_cc
             |FROM tri, w""".stripMargin)),

    GQuery(
      "graph_weighted_khop",
      (s, dir) => {
        // WEIGHTED K-HOP SHORTEST PATHS (3 Bellman-Ford rounds) from
        // the seed set {parts ≡ 0 mod 97} over the co-purchase graph,
        // edge weight = co-occurring line pairs (integer — path costs
        // stay exact). Each round is ONE join frontier⋈edges + ONE
        // min-aggregate — the same Pregel-as-DataFrame shape as
        // pagerank above, with the weighted edge list checkpointed once
        // and reused by every round. Costs only ever shrink, so a
        // bounded-round unrolling is deterministic; the oracle unrolls
        // the identical three relaxations as CTEs.
        val li = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
        val e0 = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val edges = e0.union(
            e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
          .localCheckpoint()
        var dist = Tables.t(s, dir, "part")
          .where(col("p_partkey") % 97 === 0)
          .select(col("p_partkey").as("node"), lit(0L).as("cost"))
        (1 to 3).foreach { _ =>
          val relaxed = dist.join(edges, col("node") === col("src"))
            .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
          dist = dist.union(relaxed)
            .groupBy("node").agg(min("cost").as("cost"))
        }
        dist.orderBy("node")
      },
      Some("""WITH e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst,
             |                   CAST(count(*) AS BIGINT) AS w
             |            FROM lineitem a JOIN lineitem b
             |              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |            GROUP BY 1, 2),
             |  e AS (SELECT src, dst, w FROM e0
             |        UNION ALL SELECT dst, src, w FROM e0),
             |  d0 AS (SELECT p_partkey AS node, CAST(0 AS BIGINT) AS cost
             |         FROM part WHERE p_partkey % 97 = 0),
             |  d1 AS (SELECT node, min(cost) AS cost FROM (
             |           SELECT node, cost FROM d0
             |           UNION ALL SELECT e.dst, d0.cost + e.w FROM d0 JOIN e ON d0.node = e.src
             |         ) GROUP BY 1),
             |  d2 AS (SELECT node, min(cost) AS cost FROM (
             |           SELECT node, cost FROM d1
             |           UNION ALL SELECT e.dst, d1.cost + e.w FROM d1 JOIN e ON d1.node = e.src
             |         ) GROUP BY 1),
             |  d3 AS (SELECT node, min(cost) AS cost FROM (
             |           SELECT node, cost FROM d2
             |           UNION ALL SELECT e.dst, d2.cost + e.w FROM d2 JOIN e ON d2.node = e.src
             |         ) GROUP BY 1)
             |SELECT node, CAST(cost AS BIGINT) AS cost FROM d3 ORDER BY node""".stripMargin)),

    GQuery(
      "graph_scc",
      (s, dir) => {
        // STRONGLY CONNECTED COMPONENTS of the directed nation trade
        // graph (supplier nation → customer nation, edges kept when
        // the lane ships at least the mean lane volume — a relative
        // threshold, so the graph sparsifies the same way at every
        // SF). The 100 TB pattern this encodes: CONTRACT the raw
        // edge stream to a small quotient graph first (one aggregate),
        // then run the closure on the quotient — transitive closure
        // by PATH DOUBLING, ⌈log₂ diameter⌉ = 5 self-join rounds,
        // never an unbounded driver loop. SCC id = min mutually-
        // reachable node (identity edges make self-reach explicit);
        // component size falls out of the same mutual-pair frame.
        val li = Tables.t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
        val ord = Tables.t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val cust = Tables.t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val supp = Tables.t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val lanes = li
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
          .agg(count(lit(1)).as("w"))
          .where(col("src") =!= col("dst"))
        val mean = lanes.agg(avg(col("w")).as("mw"))
        val e = lanes.crossJoin(broadcast(mean))
          .where(col("w") >= col("mw")).select("src", "dst")
          .localCheckpoint()
        val nodes = e.select(col("src").as("v"))
          .union(e.select(col("dst"))).distinct()
        var r = e.union(nodes.select(col("v").as("src"), col("v").as("dst")))
          .distinct()
        for (_ <- 1 to 5) {
          r = r.as("a").join(r.as("b"), col("a.dst") === col("b.src"))
            .select(col("a.src"), col("b.dst"))
            .union(r).distinct().localCheckpoint()
        }
        val mutual = r.as("f")
          .join(r.as("g"),
            col("f.src") === col("g.dst") && col("f.dst") === col("g.src"))
          .select(col("f.src").cast("long").as("node"),
            col("f.dst").cast("long").as("peer"))
          .distinct()
        mutual.groupBy("node")
          .agg(min("peer").as("scc_id"), count(lit(1)).as("scc_size"))
          .orderBy("node")
      },
      Some("""WITH RECURSIVE lanes AS (
             |  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             |         CAST(count(*) AS BIGINT) AS w
             |  FROM lineitem l
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey
             |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
             |  WHERE s.s_nationkey <> c.c_nationkey
             |  GROUP BY 1, 2),
             | e AS (SELECT src, dst FROM lanes
             |       WHERE w >= (SELECT avg(w) FROM lanes)),
             | nodes AS (SELECT src AS v FROM e UNION SELECT dst FROM e),
             | reach(s, d) AS (
             |   SELECT v, v FROM nodes
             |   UNION
             |   SELECT r.s, e.dst FROM reach r JOIN e ON r.d = e.src),
             | mutual AS (
             |   SELECT DISTINCT a.s AS node, a.d AS peer
             |   FROM reach a JOIN reach b ON a.s = b.d AND a.d = b.s)
             |SELECT CAST(node AS BIGINT) AS node,
             |       CAST(min(peer) AS BIGINT) AS scc_id,
             |       CAST(count(*) AS BIGINT) AS scc_size
             |FROM mutual GROUP BY node ORDER BY node""".stripMargin))
  )
}
