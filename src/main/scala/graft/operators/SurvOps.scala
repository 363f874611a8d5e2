package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 10: survival analysis (Kaplan-Meier), k-core graph
  * peeling, the Gini inequality coefficient, and Benford first-digit
  * profiling. All DuckDB-oracle-checked.
  */
object SurvOps {

  val all: Seq[GQuery] = Seq(

    GQuery(
      "survival_km",
      (s, dir) => {
        // KAPLAN-MEIER survival curve for time-to-first-purchase, with
        // users who never purchase CENSORED at their last activity —
        // the estimator that handles censoring correctly (a plain mean
        // of observed times is biased). Per-user collapse → per-day
        // (deaths, at-risk) via one self-sized aggregate → the product
        // ∏(1 − dᵢ/nᵢ) as exp(Σ ln) over a |distinct days| window. All
        // heavy steps are keyed aggregates; the curve itself is tiny.
        val u = Tables.t(s, dir, "events")
          .groupBy("user_id")
          .agg(min("ts").as("t0"), max("ts").as("tlast"),
            min(when(col("event_type") === "purchase", col("ts"))).as("tp"))
        val obs = u.select(
          when(col("tp").isNotNull, datediff(to_date(col("tp")), to_date(col("t0"))))
            .otherwise(datediff(to_date(col("tlast")), to_date(col("t0"))))
            .cast("long").as("d"),
          col("tp").isNotNull.cast("int").as("ev"))
        val total = obs.count()
        // at-risk nᵢ = total − (# with d < dᵢ): one cumulative window
        // over the per-day rollup instead of a correlated per-row scan
        val byDay = obs.groupBy("d")
          .agg(sum("ev").cast("double").as("di"), count(lit(1)).as("cnt"))
        val wCum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
        val risk = byDay
          .withColumn("ni", (lit(total) - coalesce(sum("cnt").over(wCum), lit(0L)))
            .cast("double"))
          .where(col("di") > 0 && col("di") < col("ni"))
        risk.select(col("d"),
            round(exp(sum(log(lit(1) - col("di") / col("ni")))
              .over(Window.orderBy("d")
                .rowsBetween(Window.unboundedPreceding, 0))), 4).as("s"))
          .orderBy("d")
      },
      Some("""WITH u AS (SELECT user_id, min(ts) AS t0, max(ts) AS tlast,
             |                  min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
             |           FROM events GROUP BY 1),
             | obs AS (SELECT CASE WHEN tp IS NOT NULL
             |                     THEN date_diff('day', t0::DATE, tp::DATE)
             |                     ELSE date_diff('day', t0::DATE, tlast::DATE) END AS d,
             |                (tp IS NOT NULL)::INT AS ev
             |         FROM u),
             | risk AS (SELECT d, sum(ev)::DOUBLE AS di,
             |                 (SELECT count(*) FROM obs o2 WHERE o2.d >= obs.d)::DOUBLE AS ni
             |          FROM obs GROUP BY d HAVING sum(ev) > 0),
             | km AS (SELECT d, round(exp(sum(ln(1 - di / ni)) OVER (ORDER BY d)), 4) AS s
             |        FROM risk WHERE di < ni)
             |SELECT d, s FROM km ORDER BY d""".stripMargin)),

    GQuery(
      "graph_kcore_peel",
      (s, dir) => {
        // K-CORE peeling (k=80, two rounds): repeatedly drop nodes
        // whose degree falls below k, restricting edges to survivors —
        // the density-core extractor (community nuclei, spam-farm
        // detection). Each round is one degree aggregate + two semi
        // joins on the survivor set; at scale rounds run until
        // fixpoint, each touching only the shrinking subgraph
        // (localCheckpoint per round like the CC fixpoint).
        val K = 80
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("d"))
          .distinct().localCheckpoint()
        def degrees(edges: org.apache.spark.sql.DataFrame) =
          edges.groupBy("s").agg(count(lit(1)).as("dg"))
        val v1 = degrees(e).where(col("dg") >= K).select("s")
        val e1 = e.join(v1, Seq("s"), "left_semi")
          .join(v1.select(col("s").as("d")), Seq("d"), "left_semi")
          .localCheckpoint()
        degrees(e1).where(col("dg") >= K)
          .select(col("s").as("node"), col("dg").as("deg"))
          .orderBy("node")
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
             |           FROM lineitem a JOIN lineitem b
             |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
             | d0 AS (SELECT s, count(*) AS dg FROM e GROUP BY 1),
             | v1 AS (SELECT s FROM d0 WHERE dg >= 80),
             | e1 AS (SELECT e.s, e.d FROM e
             |        JOIN v1 a ON e.s = a.s JOIN v1 b ON e.d = b.s),
             | d1 AS (SELECT s, count(*) AS dg FROM e1 GROUP BY 1)
             |SELECT s AS node, dg::BIGINT AS deg FROM d1 WHERE dg >= 80
             |ORDER BY node""".stripMargin)),

    GQuery(
      "graph_assortativity",
      (s, dir) => {
        // Degree ASSORTATIVITY: correlation of endpoint degrees across
        // edges — do hubs link to hubs (assortative, social-network
        // style) or to leaves (disassortative, infrastructure style)?
        // One degree aggregate joined to both edge endpoints, then a
        // co-moment corr — the network-science summary number.
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
        val e = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("d"))
          .distinct()
        val deg = e.groupBy("s").agg(count(lit(1)).as("dg"))
        e.join(deg.select(col("s"), col("dg").as("da")), "s")
          .join(deg.select(col("s").as("d"), col("dg").as("db2")), "d")
          .agg(round(corr("da", "db2"), 4).as("assort"),
            count(lit(1)).as("n_edges"))
      },
      Some("""WITH e AS (SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
             |           FROM lineitem a JOIN lineitem b
             |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
             | deg AS (SELECT s, count(*) AS dg FROM e GROUP BY 1)
             |SELECT round(corr(da.dg, db.dg), 4) AS assort,
             |       count(*)::BIGINT AS n_edges
             |FROM e JOIN deg da ON e.s = da.s JOIN deg db ON e.d = db.s""".stripMargin)),

    GQuery(
      "events_entropy_rate",
      (s, dir) => {
        // Markov ENTROPY RATE of the event stream: H = −Σπ(i)·Σ
        // p(j|i)·ln p(j|i) over the per-user transition counts — how
        // predictable the next action is given the current one (0 =
        // deterministic flows, ln|types| = uniform chaos). Transition
        // counts are one lead() pass + one aggregate; the rate is
        // arithmetic over ≤ |types|² cells.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val c = Tables.t(s, dir, "events")
          .select(col("event_type").as("et"),
            lead("event_type", 1).over(w).as("nxt"))
          .where(col("nxt").isNotNull)
          .groupBy("et", "nxt").agg(count(lit(1)).cast("double").as("n"))
        val rowt = c.groupBy("et").agg(sum("n").as("rn"))
        val tot = c.agg(sum("n").as("t0"))
        c.join(broadcast(rowt), "et").crossJoin(broadcast(tot))
          .agg(round(-sum((col("rn") / col("t0")) * (col("n") / col("rn")) *
            log(col("n") / col("rn"))), 4).as("hrate"),
            count(lit(1)).as("cells"))
      },
      Some("""WITH o AS (SELECT user_id, event_type AS et,
             |                  lead(event_type) OVER (PARTITION BY user_id
             |                                         ORDER BY ts, event_id) AS nxt
             |           FROM events),
             | c AS (SELECT et, nxt, count(*)::DOUBLE AS n FROM o
             |       WHERE nxt IS NOT NULL GROUP BY 1, 2),
             | rowt AS (SELECT et, sum(n) AS rn FROM c GROUP BY 1),
             | tot AS (SELECT sum(n) AS t0 FROM c)
             |SELECT round(-sum((rowt.rn / tot.t0) * (c.n / rowt.rn) * ln(c.n / rowt.rn)), 4) AS hrate,
             |       count(*)::BIGINT AS cells
             |FROM c JOIN rowt USING (et), tot""".stripMargin)),

    GQuery(
      "agg_gini",
      (s, dir) => {
        // GINI coefficient of customer revenue — the inequality metric
        // behind "what share of revenue do the top customers hold".
        // Rank-based closed form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n: one
        // per-customer aggregate, one rank window with key tiebreak,
        // one final 3-number aggregate.
        val cr = Tables.t(s, dir, "orders")
          .groupBy("o_custkey").agg(sum("o_totalprice").as("x"))
        val rk = cr.select(col("x"),
          row_number().over(Window.orderBy(asc("x"), asc("o_custkey")))
            .cast("double").as("i"))
        rk.agg(count(lit(1)).cast("double").as("n"),
            sum("x").as("sx"), sum(col("i") * col("x")).as("six"))
          .select(round(lit(2.0) * col("six") / (col("n") * col("sx")) -
            (col("n") + 1.0) / col("n"), 6).as("gini"),
            col("n").cast("long").as("n_customers"))
      },
      Some("""WITH cr AS (SELECT o_custkey, sum(o_totalprice) AS x
             |            FROM orders GROUP BY 1),
             | rk AS (SELECT x, row_number() OVER (ORDER BY x, o_custkey)::DOUBLE AS i
             |        FROM cr),
             | agg AS (SELECT count(*)::DOUBLE AS n, sum(x) AS sx,
             |                sum(i * x) AS six
             |         FROM rk)
             |SELECT round(2.0 * six / (n * sx) - (n + 1.0) / n, 6) AS gini,
             |       n::BIGINT AS n_customers
             |FROM agg""".stripMargin)),

    GQuery(
      "benford_first_digit",
      (s, dir) => {
        // BENFORD first-digit profile with expected-frequency deviation
        // — the fraud/synthetic-data screen. First digit extracts in
        // codegen arithmetic (no string ops); observed shares compare
        // to log10(1 + 1/d). One aggregate + a 9-row projection.
        val fd = floor(col("o_totalprice") /
          pow(lit(10.0), floor(log10(col("o_totalprice"))))).cast("long")
        val total = Tables.t(s, dir, "orders")
          .where(col("o_totalprice") > 0).count()
        Tables.t(s, dir, "orders")
          .where(col("o_totalprice") > 0)
          .groupBy(fd.as("digit"))
          .agg(count(lit(1)).as("n"))
          .select(col("digit"), col("n"),
            round(col("n") / lit(total.toDouble), 6).as("share"),
            round(log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("benford"),
            round(col("n") / lit(total.toDouble) -
              log10(lit(1.0) + lit(1.0) / col("digit")), 6).as("dev"))
          .orderBy("digit")
      },
      Some("""WITH b AS (SELECT floor(o_totalprice / pow(10, floor(log10(o_totalprice))))::BIGINT AS digit,
             |                  count(*) AS n
             |           FROM orders WHERE o_totalprice > 0 GROUP BY 1),
             | t AS (SELECT sum(n)::DOUBLE AS tot FROM b)
             |SELECT digit, n::BIGINT AS n,
             |       round(n / tot, 6) AS share,
             |       round(log10(1.0 + 1.0 / digit), 6) AS benford,
             |       round(n / tot - log10(1.0 + 1.0 / digit), 6) AS dev
             |FROM b, t ORDER BY digit""".stripMargin))
  )
}
