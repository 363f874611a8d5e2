package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 7 — experimentation & applied-statistics operators:
  * Welch's t-test, chi-square independence, RFM quintile segmentation,
  * ABC/Pareto classing, neighbor-Jaccard link prediction, PMI
  * collocations, and label-centroid embedding outliers. All
  * DuckDB-oracle-checked.
  */
object LabOps {

  /** EXACT neighbor-set Jaccard over the co-purchase graph — the
    * test-side TRUTH GENERATOR for `graph_neighbor_jaccard_capped`
    * (demoted from the registry in round 6: the uncapped co-neighbor
    * self-join is quadratic in hub-posting size, the one registered
    * plan that would not survive 100 TB — the same demotion that moved
    * the all-pairs cosine truth behind `dedup_embedding_cosine`).
    * Measured negative results for rescuing it (sf0.1, warm):
    * recompute-both-sides 26-33 s; localCheckpoint of the 1.8M-row
    * edge list 38-47 s (breaks codegen fusion into the SMJ sorts);
    * shuffle_hash co-join 34-36 s. The production mitigation is the
    * posting-list cap — `graph_neighbor_jaccard_capped` (6-11 s warm,
    * high single-JVM variance: the cap bounds the pair stage at
    * ~cap²/2 rows per shared neighbor, tens of millions of generated
    * pairs feeding one partial+final count, which is GC-heavy at
    * local[32] but linear-in-data and shardable on a real cluster),
    * oracle-replayed; LabOpsSpec gates its recall against THIS truth.
    */
  def neighborJaccardExact(s: SparkSession, dir: String): DataFrame =
    neighborJaccardCapped(s, dir, cap = None)

  /** Neighbor-Jaccard with an optional per-shared-neighbor posting cap
    * (`cap = None` → the exact all-pairs form above; `Some(k)` → the
    * production mitigation registered as `graph_neighbor_jaccard_capped`).
    * With cap >= the max posting size the two forms are IDENTICAL —
    * LabOpsSpec asserts exactly that equivalence, which is the honest
    * gate: at fixture density the k=50 estimator legitimately diverges
    * from exact (capping reshapes degrees and scores), so a recall
    * bound against exact truth would gate noise, not correctness.
    */
  def neighborJaccardCapped(s: SparkSession, dir: String, cap: Option[Int]): DataFrame = {
    val li = Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val e0 = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("d"))
      .distinct()
    val e = cap match {
      case Some(k) =>
        e0.withColumn("rn", row_number().over(
            Window.partitionBy("d").orderBy("s")))
          .where(col("rn") <= k).drop("rn")
      case None => e0
    }
    val deg = e.groupBy("s").agg(count(lit(1)).as("dg"))
    // Pair stage carries ONLY (pa, pb): the co-neighbor explosion is the
    // dominant volume (C(cap,2) rows per shared neighbor), so the
    // per-node degrees — a parts-sized table — are broadcast-joined onto
    // the AGGREGATED pair counts instead of riding every exploded row
    // through the shuffle and widening the groupBy key from 2 longs to 4
    // (measured sf0.1 local[32]: warm-min 6.5 s → 5.8 s). The remaining
    // cost and its rep-to-rep variance are the 24.5M generated pairs
    // feeding an 18.5M-group count (sf0.1) — inherent volume, already
    // skew-bounded by the cap (every hub contributes ≤ C(50,2) pairs,
    // so salting the hub key has nothing to level), GC-noisy in one JVM
    // and linearly shardable across executors. Measured no-win (round
    // 6, exact form): recompute-both-sides / localCheckpoint /
    // shuffle_hash all slower — see neighborJaccardExact's scaladoc.
    val pairs = e.as("e1").join(e.as("e2"),
        col("e1.d") === col("e2.d") && col("e1.s") < col("e2.s"))
      .groupBy(col("e1.s").as("pa"), col("e2.s").as("pb"))
      .agg(count(lit(1)).as("common"))
      .join(broadcast(deg.select(col("s").as("pa"), col("dg").as("da"))), "pa")
      .join(broadcast(deg.select(col("s").as("pb"), col("dg").as("db"))), "pb")
    pairs
      .select(col("pa"), col("pb"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common"))).as("nj"))
      .where(col("nj") >= 0.1)
      .select(col("pa"), col("pb"), round(col("nj"), 4).as("nj"))
      .orderBy("pa", "pb")
  }

  val all: Seq[GQuery] = Seq(

    GQuery(
      "events_welch_ttest",
      (s, dir) => {
        // WELCH's t-statistic between two event cohorts — the unequal-
        // variance A/B test. One aggregate pass computes (mean, s², n)
        // per cohort; the statistic assembles from 6 numbers — at 100 TB
        // the experiment readout is a 2-row aggregate, never a data
        // move. (The co-moment partials are the same shape Spark's
        // var_samp already spills-proofs.)
        val g = Tables.t(s, dir, "events")
          .where(col("event_type").isin("purchase", "click"))
          .groupBy("event_type")
          .agg(avg("value").as("m"), var_samp("value").as("v"),
            count(lit(1)).as("n"))
        val a = g.where(col("event_type") === "purchase")
          .select(col("m").as("ma"), col("v").as("va"), col("n").as("na"))
        val b = g.where(col("event_type") === "click")
          .select(col("m").as("mb"), col("v").as("vb"), col("n").as("nb"))
        a.crossJoin(b)
          .select(round((col("ma") - col("mb")) /
            sqrt(col("va") / col("na") + col("vb") / col("nb")), 4).as("t"),
            col("na"), col("nb"))
      },
      Some("""WITH g AS (SELECT event_type, avg(value) AS m, var_samp(value) AS v,
             |                  count(*) AS n
             |           FROM events WHERE event_type IN ('purchase', 'click')
             |           GROUP BY 1)
             |SELECT round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t,
             |       a.n::BIGINT AS na, b.n::BIGINT AS nb
             |FROM g a, g b
             |WHERE a.event_type = 'purchase' AND b.event_type = 'click'""".stripMargin)),

    GQuery(
      "events_chi2_dow",
      (s, dir) => {
        // CHI-SQUARE independence test: is event mix independent of
        // weekday? Observed counts are one keyed aggregate; row/column
        // marginals are tiny rollups broadcast back; the statistic is a
        // 35-cell sum. The contingency-table shape behind every
        // categorical drift monitor. (Spark dayofweek is 1-based Sunday,
        // DuckDB 0-based — the -1 aligns.)
        val o = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("et"),
            (dayofweek(to_date(col("ts"))) - 1).as("dow"))
          .agg(count(lit(1)).cast("double").as("obs"))
        val rt = o.groupBy("et").agg(sum("obs").as("r"))
        val ct = o.groupBy("dow").agg(sum("obs").as("c"))
        val n = o.agg(sum("obs").as("t0"))
        val ex = col("r") * col("c") / col("t0")
        o.join(broadcast(rt), "et").join(broadcast(ct), "dow").crossJoin(broadcast(n))
          .agg(round(sum(pow(col("obs") - ex, 2) / ex), 4).as("chi2"),
            count(lit(1)).as("cells"))
      },
      Some("""WITH o AS (SELECT event_type AS et, dayofweek(ts::DATE) AS dow,
             |                  count(*)::DOUBLE AS obs
             |           FROM events GROUP BY 1, 2),
             | rt AS (SELECT et, sum(obs) AS r FROM o GROUP BY 1),
             | ct AS (SELECT dow, sum(obs) AS c FROM o GROUP BY 1),
             | n AS (SELECT sum(obs) AS t0 FROM o)
             |SELECT round(sum(pow(obs - rt.r * ct.c / n.t0, 2) /
             |                 (rt.r * ct.c / n.t0)), 4) AS chi2,
             |       count(*)::BIGINT AS cells
             |FROM o JOIN rt USING (et) JOIN ct USING (dow), n""".stripMargin)),

    GQuery(
      "customer_rfm",
      (s, dir) => {
        // RFM SEGMENTATION: recency/frequency/monetary quintiles per
        // customer — the classic marketing score. Orders collapse to one
        // row per customer first; three ntile windows run over that
        // |customers|-sized table (explicit customer-key tiebreaks make
        // the quintile cuts deterministic). At 100 TB the windows
        // range-partition by rank; the raw order stream never sorts.
        val m = Tables.t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(max("o_orderdate").as("r"), count(lit(1)).as("f"),
            round(sum("o_totalprice"), 2).as("mo"))
        val rfm = m.select(col("o_custkey"),
          ntile(5).over(Window.orderBy(desc("r"), asc("o_custkey"))).cast("long").as("rs"),
          ntile(5).over(Window.orderBy(desc("f"), asc("o_custkey"))).cast("long").as("fs"),
          ntile(5).over(Window.orderBy(desc("mo"), asc("o_custkey"))).cast("long").as("ms"))
        rfm.select(col("o_custkey"), col("rs"), col("fs"), col("ms"),
            concat(col("rs"), col("fs"), col("ms")).as("segment"))
          .orderBy("o_custkey")
      },
      Some("""WITH m AS (SELECT o_custkey, max(o_orderdate) AS r, count(*) AS f,
             |                  round(sum(o_totalprice), 2) AS mo
             |           FROM orders GROUP BY 1),
             | rfm AS (SELECT o_custkey,
             |                ntile(5) OVER (ORDER BY r DESC, o_custkey)::BIGINT AS rs,
             |                ntile(5) OVER (ORDER BY f DESC, o_custkey)::BIGINT AS fs,
             |                ntile(5) OVER (ORDER BY mo DESC, o_custkey)::BIGINT AS ms
             |         FROM m)
             |SELECT o_custkey, rs, fs, ms, rs || fs || ms AS segment
             |FROM rfm ORDER BY o_custkey""".stripMargin)),

    GQuery(
      "parts_abc_classes",
      (s, dir) => {
        // ABC / PARETO classing: parts ranked by revenue, classes cut at
        // 80% / 95% of cumulative share. Revenue is one keyed aggregate;
        // the cumulative window runs over |parts| rows in one
        // deterministic order (revenue desc, key) — identical sequential
        // summation in both engines, so the class boundaries replay
        // exactly.
        // ALL money math in exact decimals: the per-part revenue is a
        // decimal sum (order-independent — a double sum here measurably
        // flips cents between Spark's partial-agg order and DuckDB's
        // sequential one), the cumulative share casts the exact decimals
        // to double only at the final division, and class revenue
        // re-sums the exact decimals.
        val disc = lit(1).cast("decimal(18,2)") -
          col("l_discount").cast("decimal(18,2)")
        val rev = Tables.t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)") * disc).as("rdec"))
        val total = rev.agg(sum("rdec").as("totdec"))
        val cum = rev.crossJoin(broadcast(total))
          .withColumn("cumshare",
            sum("rdec").over(Window.orderBy(desc("rdec"), asc("l_partkey"))
              .rowsBetween(Window.unboundedPreceding, 0)).cast("double") /
              col("totdec").cast("double"))
        cum.withColumn("cls",
            when(col("cumshare") <= 0.8, "A")
              .when(col("cumshare") <= 0.95, "B").otherwise("C"))
          .groupBy("cls")
          .agg(count(lit(1)).as("n_parts"),
            sum("rdec").cast("string").as("revenue"))
          .orderBy("cls")
      },
      Some("""WITH rev AS (SELECT l_partkey,
             |                    sum(l_extendedprice::DECIMAL(18,2) *
             |                        (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2))) AS rdec
             |             FROM lineitem GROUP BY 1),
             | c AS (SELECT l_partkey, rdec,
             |              (sum(rdec) OVER (ORDER BY rdec DESC, l_partkey
             |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE /
             |                (SELECT sum(rdec) FROM rev)::DOUBLE AS cumshare
             |       FROM rev)
             |SELECT CASE WHEN cumshare <= 0.8 THEN 'A'
             |            WHEN cumshare <= 0.95 THEN 'B' ELSE 'C' END AS cls,
             |       count(*)::BIGINT AS n_parts,
             |       CAST(sum(rdec) AS VARCHAR) AS revenue
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    GQuery(
      "graph_neighbor_jaccard_capped",
      (s, dir) => {
        // The PRODUCTION form of neighbor-Jaccard: each shared
        // neighbor's POSTING list is capped at k=50 nodes (deterministic
        // id order — in practice top-k by edge weight) BEFORE the
        // co-neighbor join. The pair explosion is quadratic in POSTING
        // size, not out-degree — capping the wrong side barely helps
        // (measured): this cap bounds every shared neighbor's pair
        // contribution at C(k,2). Exactly replayed by the oracle — the
        // same hazard-mitigation stance as dedup_jaccard_prefix.
        neighborJaccardCapped(s, dir, cap = Some(50))
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
             |           FROM lineitem a JOIN lineitem b
             |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
             | capped AS (SELECT s, d FROM (
             |              SELECT s, d, row_number() OVER (PARTITION BY d ORDER BY s) AS rn
             |              FROM e) WHERE rn <= 50),
             | deg AS (SELECT s, count(*) AS dg FROM capped GROUP BY 1),
             | co AS (SELECT e1.s AS pa, e2.s AS pb, da.dg AS da, db.dg AS db,
             |               count(*) AS common
             |        FROM capped e1 JOIN capped e2 ON e1.d = e2.d AND e1.s < e2.s
             |        JOIN deg da ON e1.s = da.s JOIN deg db ON e2.s = db.s
             |        GROUP BY 1, 2, 3, 4)
             |SELECT pa, pb, round(common::DOUBLE / (da + db - common), 4) AS nj
             |FROM co WHERE common::DOUBLE / (da + db - common) >= 0.1
             |ORDER BY pa, pb""".stripMargin)),

    GQuery(
      "text_pmi_bigrams",
      (s, dir) => {
        // PMI COLLOCATIONS: pointwise mutual information of adjacent
        // word pairs vs their unigram probabilities — the collocation
        // extractor ("New York" scores high, "of the" low). Unigram and
        // bigram counts are two map-side-combined aggregates; totals
        // broadcast; PMI is a projection over |bigram vocab| rows.
        val tk = Tables.t(s, dir, "documents")
          .select(TextOps.tokens(col("text")).as("tk"))
        val uni = tk.select(explode(col("tk")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cu"))
        val n1 = uni.agg(sum("cu").cast("double").as("nu"))
        // zip_with pads the shorter slice with null → the trailing
        // (token, null) pair concats to null; drop it before counting
        val bi = tk.select(explode(
            zip_with(slice(col("tk"), 1, 100000),
              slice(col("tk"), 2, 100000),
              (x, y) => concat(x, lit(" "), y))).as("bg"))
          .where(col("bg").isNotNull)
          .groupBy("bg").agg(count(lit(1)).as("cb"))
          .where(col("cb") >= 20)
        val n2 = tk.select(
            (size(col("tk")) - 1).cast("long").as("nb"))
          .where(col("nb") > 0)
          .agg(sum("nb").cast("double").as("nbt"))
        bi.withColumn("w1", split(col("bg"), " ").getItem(0))
          .withColumn("w2", split(col("bg"), " ").getItem(1))
          .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("c1"))), "w1")
          .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("c2"))), "w2")
          .crossJoin(broadcast(n1)).crossJoin(broadcast(n2))
          // Cross-engine determinism: one division of two products of
          // exact integer counts (identical IEEE op order in Spark and
          // the oracle), then floor-scaled BIGINT — round(double, 4)
          // disagrees between engines on shortest-decimal boundaries.
          .select(col("bg"), col("cb"),
            floor(log((col("cb") * col("nu") * col("nu")) /
              (col("nbt") * col("c1") * col("c2"))) * 10000)
              .cast("long").as("pmi_e4"))
          .orderBy("bg")
      },
      Some("""WITH t AS (SELECT list_filter(string_split(text, ' '), x -> x <> '') AS tk
             |           FROM documents),
             | uni AS (SELECT unnest(tk) AS w FROM t),
             | uc AS (SELECT w, count(*) AS cu FROM uni GROUP BY 1),
             | n1 AS (SELECT sum(cu)::DOUBLE AS nu FROM uc),
             | bi AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
             |                       for i in range(1, len(tk))]) AS bg FROM t),
             | bc AS (SELECT bg, count(*) AS cb FROM bi GROUP BY 1 HAVING count(*) >= 20),
             | n2 AS (SELECT count(*)::DOUBLE AS nbt FROM bi)
             |SELECT bg, cb::BIGINT AS cb,
             |       floor(ln((cb * n1.nu * n1.nu) /
             |                (n2.nbt * uc1.cu * uc2.cu)) * 10000)::BIGINT AS pmi_e4
             |FROM bc
             |JOIN uc uc1 ON string_split(bg, ' ')[1] = uc1.w
             |JOIN uc uc2 ON string_split(bg, ' ')[2] = uc2.w, n1, n2
             |ORDER BY bg""".stripMargin)),

    GQuery(
      "emb_label_outliers",
      (s, dir) => {
        // LABEL-CENTROID outliers: each vector's squared L2 distance to
        // its class centroid — mislabeled/straggler detection in
        // embedding space (the first use of the `label` column). The
        // centroid is a per-(label, dim) average — posexplode feeds a
        // partial-aggregating groupBy, shuffling 10×64 cells, not
        // vectors; distances join the tiny centroid table back via
        // broadcast. Top-20 by distance with deterministic tiebreak.
        val e = Tables.t(s, dir, "embeddings")
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), _.cast("double")).as("em"))
        val dims = e.select(col("vec_id"), col("label"),
            posexplode(col("em")))
          .select(col("vec_id"), col("label"), col("pos"), col("col").as("x"))
        val cent = dims.groupBy("label", "pos").agg(avg("x").as("c"))
        val d2 = dims.join(broadcast(cent), Seq("label", "pos"))
          .groupBy("vec_id", "label")
          .agg(sum(pow(col("x") - col("c"), 2)).as("d2"))
        d2.select(col("vec_id"), col("label"), round(col("d2"), 4).as("d2"),
            row_number().over(Window.orderBy(desc("d2"), asc("vec_id")))
              .cast("long").as("rn"))
          .where(col("rn") <= 20)
          .orderBy("rn")
      },
      Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS em FROM embeddings),
             | dims AS (SELECT vec_id, label,
             |                 unnest([{'pos': i - 1, 'x': em[i]}
             |                         for i in range(1, len(em) + 1)],
             |                        recursive := true)
             |          FROM e),
             | cent AS (SELECT label, pos, avg(x) AS c FROM dims GROUP BY 1, 2),
             | d2 AS (SELECT vec_id, dims.label AS label, sum(pow(x - c, 2)) AS d2
             |        FROM dims JOIN cent ON dims.label = cent.label AND dims.pos = cent.pos
             |        GROUP BY 1, 2),
             | r AS (SELECT vec_id, label, round(d2, 4) AS d2,
             |              row_number() OVER (ORDER BY d2 DESC, vec_id) AS rn
             |       FROM d2)
             |SELECT vec_id, label, d2, rn::BIGINT AS rn
             |FROM r WHERE rn <= 20 ORDER BY rn""".stripMargin)),

    GQuery(
      "events_mann_kendall",
      (s, dir) => {
        // MANN-KENDALL trend test per event type: S = Σ_{i<j}
        // sign(c_j − c_i) over the DAILY count series, tie-corrected
        // normal variance, continuity-corrected z. The pairwise stage
        // runs on the AGGREGATED per-day series (bounded by calendar
        // days — ~730 rows per type, ≤1.6M pairs), never the raw
        // event stream; S and the tie terms are pure integers, so only
        // z (a sqrt chain) is transcendental → floor-scaled. At larger
        // n the same S folds from an O(n log n) inversion count; the
        // O(n²) form is kept because the series is calendar-bounded.
        val d = Tables.t(s, dir, "events")
          .groupBy(col("event_type").as("et"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val pairs = d.as("a").join(d.as("b"),
            col("a.et") === col("b.et") && col("a.day") < col("b.day"))
          .groupBy(col("a.et").as("et"))
          .agg(sum(when(col("b.c") > col("a.c"), 1L)
            .when(col("b.c") < col("a.c"), -1L).otherwise(0L)).as("s_stat"))
        val ties = d.groupBy("et", "c").agg(count(lit(1)).as("t"))
          .groupBy("et")
          .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tt"),
            sum(col("t")).as("n"))
        val z = {
          val varS = (col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tt")) / lit(18.0)
          when(col("s_stat") > 0, (col("s_stat") - 1) / sqrt(varS))
            .when(col("s_stat") < 0, (col("s_stat") + 1) / sqrt(varS))
            .otherwise(lit(0.0))
        }
        pairs.join(ties, "et")
          .select(col("et"), col("n"), col("s_stat"),
            floor(z * 10000).cast("long").as("z_e4"))
          .orderBy("et")
      },
      Some("""WITH d AS (SELECT event_type AS et, ts::DATE AS day,
             |                  CAST(count(*) AS BIGINT) AS c
             |           FROM events GROUP BY 1, 2),
             | p AS (SELECT a.et,
             |              CAST(sum(CASE WHEN b.c > a.c THEN 1
             |                            WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
             |       FROM d a JOIN d b ON a.et = b.et AND a.day < b.day
             |       GROUP BY 1),
             | t AS (SELECT et, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tt,
             |              CAST(sum(t) AS BIGINT) AS n
             |       FROM (SELECT et, c, count(*) AS t FROM d GROUP BY 1, 2)
             |       GROUP BY 1)
             |SELECT p.et, n, s_stat,
             |       CAST(floor(CASE
             |         WHEN s_stat > 0 THEN (s_stat - 1) / sqrt((n * (n - 1) * (2 * n + 5) - tt) / 18.0)
             |         WHEN s_stat < 0 THEN (s_stat + 1) / sqrt((n * (n - 1) * (2 * n + 5) - tt) / 18.0)
             |         ELSE 0.0 END * 10000) AS BIGINT) AS z_e4
             |FROM p JOIN t ON p.et = t.et ORDER BY p.et""".stripMargin))
  )
}
