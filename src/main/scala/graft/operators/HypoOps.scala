package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 surface wave: rank-based hypothesis testing
  * (Mann-Whitney U — the nonparametric sibling of
  * [[LabOps]]'s Welch t), the entropy/recursive tiers of l-diversity
  * (the stricter middle between `privacy_k_anonymity`'s distinct-count
  * l and `privacy_t_closeness`'s TV distance), a NEAREST as-of join
  * (either-direction completion of the backward/forward pair in
  * [[graft.plans.AsOfJoin]]), and fixed-width record ingest (the
  * mainframe/COBOL feed format the JSON/CSV/XML parsers don't cover).
  *
  * Scale stances:
  *  - Mann-Whitney runs in HISTOGRAM form: ranks are derived from
  *    per-distinct-value cohort counts, so the global window orders
  *    |distinct values| aggregated rows, never the raw stream — the
  *    same "aggregate first, window the summary" shape as
  *    `hist_equidepth`. All rank sums are multiples of 0.5 far below
  *    2^53, so they are EXACT in IEEE double regardless of summation
  *    order; only the final z (a sqrt chain) is transcendental and is
  *    emitted floor-scaled per the GQuery convention.
  *  - l-diversity is two keyed aggregates (cells → groups) plus a
  *    1-row summary — a pure map-side-combine shape at any scale.
  *  - the nearest as-of is ONE exchange: the right side enters the
  *    union-merged timeline TWICE (a backward-tagged and a
  *    forward-tagged copy, sides 0 and 2 around the probe's 1), and
  *    both direction candidates come from two frames over the SAME
  *    window sort — no second shuffle, no join of two as-of results.
  *  - fixed-width parse is map-only: render and parse are both
  *    substring arithmetic inside whole-stage codegen.
  */
object HypoOps {

  val all: Seq[GQuery] = Seq(

    GQuery(
      "stats_mann_whitney",
      (s, dir) => {
        // MANN-WHITNEY U (normal approximation, tie-corrected, no
        // continuity correction): purchase vs click cohorts on event
        // value. Histogram form: group by the measured VALUE first,
        // carry per-cohort counts, then derive average ranks from the
        // running total over distinct values — rank arithmetic touches
        // |distinct values| rows, the raw stream is aggregated once.
        val h = Tables.t(s, dir, "events")
          .where(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .groupBy("value")
          .agg(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ca"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cb"))
        val wb = Window.orderBy("value")
          .rowsBetween(Window.unboundedPreceding, -1)
        val r = h.withColumn("t", col("ca") + col("cb"))
          .withColumn("cumbefore", coalesce(sum(col("t")).over(wb), lit(0L)))
        val a = r.agg(
          sum("ca").as("n1"), sum("cb").as("n2"),
          sum(col("ca") * (col("cumbefore") + (col("t") + lit(1)) / lit(2.0))).as("r1"),
          sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
        val u1 = col("r1") - col("n1") * (col("n1") + lit(1)) / lit(2.0)
        val n = col("n1") + col("n2")
        val sigma = sqrt(col("n1") * col("n2") / lit(12.0) *
          ((n + lit(1)) - col("tie3") / (n * (n - lit(1)) * lit(1.0))))
        a.select(
          col("n1"), col("n2"),
          round(u1, 2).as("u1"),
          floor((u1 - col("n1") * col("n2") / lit(2.0)) / sigma * 10000)
            .cast("long").as("z_e4"))
      },
      Some("""WITH h AS (SELECT value,
             |                  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             |                  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             |           FROM events
             |           WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
             |           GROUP BY value),
             | r AS (SELECT ca, cb, ca + cb AS t,
             |              coalesce(sum(ca + cb) OVER (ORDER BY value
             |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumbefore
             |       FROM h),
             | a AS (SELECT CAST(sum(ca) AS BIGINT) AS n1, CAST(sum(cb) AS BIGINT) AS n2,
             |              sum(ca * (cumbefore + (t + 1) / 2.0)) AS r1,
             |              CAST(sum(t * t * t - t) AS BIGINT) AS tie3
             |       FROM r)
             |SELECT n1, n2,
             |       round(r1 - n1 * (n1 + 1) / 2.0, 2) AS u1,
             |       CAST(floor((r1 - n1 * (n1 + 1) / 2.0 - n1 * n2 / 2.0) /
             |              sqrt(n1 * n2 / 12.0 *
             |                   ((n1 + n2 + 1) - tie3 / ((n1 + n2) * (n1 + n2 - 1) * 1.0))) * 10000)
             |            AS BIGINT) AS z_e4
             |FROM a""".stripMargin)),

    GQuery(
      "privacy_l_diversity_entropy",
      (s, dir) => {
        // ENTROPY + RECURSIVE l-DIVERSITY: per QI group (nation,
        // balance band), entropy-l = exp(H) of the sensitive
        // (market-segment) distribution, and the recursive (c=2, l=2)
        // test (most frequent segment < c × rest). Distinct-count l
        // (privacy_k_anonymity) passes groups that are 99% one
        // segment; these tiers catch them. H folds from per-cell
        // counts alone: H = ln(n) − Σ c·ln(c)/n, the same no-
        // probability-column identity as text_entropy; entropy-l is
        // floor-scaled so the transcendental tail can't flake the
        // hash.
        val cells = Tables.t(s, dir, "customer")
          .select(col("c_nationkey"),
            floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
            col("c_mktsegment"))
          .groupBy("c_nationkey", "bal_band", "c_mktsegment")
          .agg(count(lit(1)).as("c"))
        val g = cells.groupBy("c_nationkey", "bal_band")
          .agg(sum("c").as("n"),
            sum(col("c").cast("double") * log(col("c"))).as("sclog"),
            max("c").as("maxc"))
          .select(col("n"), col("maxc"),
            floor(exp(log(col("n")) - col("sclog") / col("n")) * 10000)
              .cast("long").as("entl_e4"))
        g.agg(
          min(col("entl_e4")).as("min_entropy_l_e4"),
          sum(when(col("entl_e4") < 20000, 1L).otherwise(0L))
            .as("groups_entropy_below_2"),
          sum(when(col("maxc") >= lit(2) * (col("n") - col("maxc")), 1L)
            .otherwise(0L)).as("groups_recursive_fail"),
          count(lit(1)).as("n_groups"))
      },
      Some("""WITH cells AS (SELECT c_nationkey,
             |                      CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             |                      c_mktsegment, CAST(count(*) AS BIGINT) AS c
             |               FROM customer GROUP BY 1, 2, 3),
             | g AS (SELECT CAST(sum(c) AS BIGINT) AS n,
             |              sum(c::DOUBLE * ln(c::DOUBLE)) AS sclog,
             |              CAST(max(c) AS BIGINT) AS maxc
             |       FROM cells GROUP BY c_nationkey, bal_band),
             | e AS (SELECT n, maxc,
             |              CAST(floor(exp(ln(n::DOUBLE) - sclog / n) * 10000) AS BIGINT) AS entl_e4
             |       FROM g)
             |SELECT CAST(min(entl_e4) AS BIGINT) AS min_entropy_l_e4,
             |       CAST(sum(CASE WHEN entl_e4 < 20000 THEN 1 ELSE 0 END) AS BIGINT) AS groups_entropy_below_2,
             |       CAST(sum(CASE WHEN maxc >= 2 * (n - maxc) THEN 1 ELSE 0 END) AS BIGINT) AS groups_recursive_fail,
             |       CAST(count(*) AS BIGINT) AS n_groups
             |FROM e""".stripMargin)),

    GQuery(
      "asof_join_nearest",
      (s, dir) => {
        // NEAREST as-of join: each event gets the customer's CLOSEST
        // order in time, either direction, ties (equal distance, and
        // same-date) resolving to the at-or-before side. ONE exchange:
        // orders enter the merged timeline twice — a backward copy
        // (side 0, before probes at equal time) and a forward copy
        // (side 2, after probes) — and the two candidates are a
        // last() over [-inf, current] and a first() over
        // [current, +inf] on the SAME window sort, so Spark plans one
        // shuffle + one sort with two frames, never two as-of passes
        // joined back together. Same-date tiebreaks inside the sort:
        // backward takes max o_orderkey (last over ascending),
        // forward min (first over ascending) — mirroring
        // asof_join / asof_join_forward.
        val ev = Tables.t(s, dir, "events")
          .select(col("user_id").as("k"), col("ts").as("t"),
            lit(1).as("side"), col("event_id"),
            lit(null).cast("long").as("pk"), lit(null).cast("timestamp_ntz").as("pd"),
            lit(null).cast("long").as("nk"), lit(null).cast("timestamp_ntz").as("nd"),
            lit(null).cast("long").as("okey"))
        val ord = Tables.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        def tagged(side: Int, asPrev: Boolean) = ord.select(
          col("o_custkey").as("k"),
          col("o_orderdate").cast("timestamp_ntz").as("t"),
          lit(side).as("side"), lit(null).cast("long").as("event_id"),
          (if (asPrev) col("o_orderkey") else lit(null).cast("long")).as("pk"),
          (if (asPrev) col("o_orderdate") else lit(null).cast("timestamp_ntz")).as("pd"),
          (if (asPrev) lit(null).cast("long") else col("o_orderkey")).as("nk"),
          (if (asPrev) lit(null).cast("timestamp_ntz") else col("o_orderdate")).as("nd"),
          col("o_orderkey").as("okey"))
        val sortCols = Seq(col("t"), col("side"), col("okey"))
        val wB = Window.partitionBy("k").orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wF = Window.partitionBy("k").orderBy(sortCols: _*)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val merged = ev
          .unionByName(tagged(0, asPrev = true))
          .unionByName(tagged(2, asPrev = false))
          .select(col("side"), col("event_id"), col("k"), col("t"),
            last(col("pk"), ignoreNulls = true).over(wB).as("pk"),
            last(col("pd"), ignoreNulls = true).over(wB).as("pd"),
            first(col("nk"), ignoreNulls = true).over(wF).as("nk"),
            first(col("nd"), ignoreNulls = true).over(wF).as("nd"))
          .where(col("side") === 1)
        val tsS = col("t").cast("timestamp").cast("long")
        val db = tsS - col("pd").cast("timestamp").cast("long")
        val df = col("nd").cast("timestamp").cast("long") - tsS
        val dirn = when(col("pk").isNull && col("nk").isNull, "none")
          .when(col("nk").isNull || (col("pk").isNotNull && db <= df), "prev")
          .otherwise("next")
        merged.select(col("event_id"), col("k").as("user_id"),
            dirn.as("direction"),
            when(dirn === "prev", col("pk"))
              .when(dirn === "next", col("nk")).as("o_orderkey"),
            when(dirn === "prev", db).when(dirn === "next", df).as("diff_s"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id,
             |       CASE WHEN p.pk IS NULL AND f.nk IS NULL THEN 'none'
             |            WHEN f.nk IS NULL OR (p.pk IS NOT NULL AND
             |                 CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(p.pd::TIMESTAMP)) AS BIGINT)
             |                 <= CAST(floor(epoch(f.nd::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT))
             |            THEN 'prev' ELSE 'next' END AS direction,
             |       CASE WHEN p.pk IS NULL AND f.nk IS NULL THEN NULL
             |            WHEN f.nk IS NULL OR (p.pk IS NOT NULL AND
             |                 CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(p.pd::TIMESTAMP)) AS BIGINT)
             |                 <= CAST(floor(epoch(f.nd::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT))
             |            THEN p.pk ELSE f.nk END AS o_orderkey,
             |       CASE WHEN p.pk IS NULL AND f.nk IS NULL THEN NULL
             |            WHEN f.nk IS NULL OR (p.pk IS NOT NULL AND
             |                 CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(p.pd::TIMESTAMP)) AS BIGINT)
             |                 <= CAST(floor(epoch(f.nd::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT))
             |            THEN CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(p.pd::TIMESTAMP)) AS BIGINT)
             |            ELSE CAST(floor(epoch(f.nd::TIMESTAMP)) AS BIGINT) - CAST(floor(epoch(e.ts::TIMESTAMP)) AS BIGINT)
             |            END AS diff_s
             |FROM events e
             |LEFT JOIN LATERAL (
             |  SELECT o_orderkey AS pk, o_orderdate AS pd FROM orders o
             |  WHERE o.o_custkey = e.user_id AND o.o_orderdate::TIMESTAMP <= e.ts::TIMESTAMP
             |  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) p ON true
             |LEFT JOIN LATERAL (
             |  SELECT o_orderkey AS nk, o_orderdate AS nd FROM orders o
             |  WHERE o.o_custkey = e.user_id AND o.o_orderdate::TIMESTAMP >= e.ts::TIMESTAMP
             |  ORDER BY o.o_orderdate ASC, o.o_orderkey ASC LIMIT 1) f ON true
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "ingest_fixed_width_parse",
      (s, dir) => {
        // FIXED-WIDTH record ingest (the mainframe feed format):
        // render orders as 47-char fixed-layout lines (key 12
        // zero-padded | priority 15 space-padded | date yyyyMMdd |
        // cents 12 zero-padded), then parse the lines back by column
        // OFFSETS — substring + trim + cast, no delimiters — and
        // aggregate the parsed fields. Money stays integer cents
        // end-to-end so the round-trip is bit-exact. Map-only: both
        // render and parse are codegen'd string slicing; at 100 TB
        // this is the schema-on-read path for fixed-layout text
        // landed in object storage.
        val lines = Tables.t(s, dir, "orders").select(concat(
          lpad(col("o_orderkey").cast("string"), 12, "0"),
          rpad(col("o_orderpriority"), 15, " "),
          date_format(col("o_orderdate"), "yyyyMMdd"),
          lpad(round(col("o_totalprice") * 100).cast("long").cast("string"),
            12, "0")).as("line"))
        val parsed = lines.select(
          substring(col("line"), 1, 12).cast("long").as("okey"),
          trim(substring(col("line"), 13, 15)).as("prio"),
          to_date(substring(col("line"), 28, 8), "yyyyMMdd").as("d"),
          substring(col("line"), 36, 12).cast("long").as("cents"))
        parsed.groupBy("prio")
          .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"),
            min("okey").as("min_key"), max("okey").as("max_key"),
            count_distinct(col("d")).as("n_days"))
          .orderBy("prio")
      },
      Some("""WITH lines AS (SELECT lpad(CAST(o_orderkey AS VARCHAR), 12, '0') ||
             |                      rpad(o_orderpriority, 15, ' ') ||
             |                      strftime(o_orderdate, '%Y%m%d') ||
             |                      lpad(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 12, '0')
             |                      AS line
             |               FROM orders),
             | parsed AS (SELECT CAST(substr(line, 1, 12) AS BIGINT) AS okey,
             |                   trim(substr(line, 13, 15)) AS prio,
             |                   strptime(substr(line, 28, 8), '%Y%m%d')::DATE AS d,
             |                   CAST(substr(line, 36, 12) AS BIGINT) AS cents
             |            FROM lines)
             |SELECT prio, CAST(count(*) AS BIGINT) AS n,
             |       CAST(sum(cents) AS BIGINT) AS sum_cents,
             |       CAST(min(okey) AS BIGINT) AS min_key,
             |       CAST(max(okey) AS BIGINT) AS max_key,
             |       CAST(count(DISTINCT d) AS BIGINT) AS n_days
             |FROM parsed GROUP BY prio ORDER BY prio""".stripMargin)),

    GQuery(
      "stats_benjamini_hochberg",
      (s, dir) => {
        // BENJAMINI-HOCHBERG FDR correction over a FAMILY of tests:
        // one-vs-rest Welch z per event type, two-sided p from the
        // Abramowitz-Stegun 7.1.26 erf polynomial (the SAME literal
        // coefficient chain evaluated in both engines — no erf
        // builtin assumed anywhere), then the BH step-up adjustment
        // as a running min over the p-ranked family. Scale: the test
        // statistics fold from one moment aggregate (n, Σx, Σx² per
        // group — rest-of-family stats are COMPLEMENTS of the grand
        // totals, so no second scan); the BH window runs over m =
        // |tests| rows, a deliberately driver-sized frame.
        val g = Tables.t(s, dir, "events")
          .where(col("value").isNotNull)
          .groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).cast("double").as("n"),
            sum("value").as("sx"),
            sum(col("value") * col("value")).as("sxx"))
        val tot = g.agg(sum("n").as("tn"), sum("sx").as("tsx"),
          sum("sxx").as("tsxx"), count(lit(1)).as("m"))
        val r = g.crossJoin(broadcast(tot))
          .withColumn("rn", col("tn") - col("n"))
          .withColumn("rsx", col("tsx") - col("sx"))
          .withColumn("rsxx", col("tsxx") - col("sxx"))
        val mg = col("sx") / col("n")
        val mr = col("rsx") / col("rn")
        val vg = (col("sxx") - col("n") * mg * mg) / (col("n") - 1)
        val vr = (col("rsxx") - col("rn") * mr * mr) / (col("rn") - 1)
        val z = (mg - mr) / sqrt(vg / col("n") + vr / col("rn"))
        // p = 1 - erf(|z|/sqrt(2)), erf via A&S 7.1.26
        val x = abs(z) / sqrt(lit(2.0))
        val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
        val poly = ((((lit(1.061405429) * t + lit(-1.453152027)) * t +
          lit(1.421413741)) * t + lit(-0.284496736)) * t +
          lit(0.254829592)) * t
        val pval = poly * exp(-x * x)
        val scored = r.select(col("et"), col("m"),
          floor(z * 10000).cast("long").as("z_e4"), pval.as("p"))
        val wRank = Window.orderBy(col("p"), col("et"))
        val wAdj = Window.orderBy(col("p"), col("et"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        scored
          .withColumn("rk", row_number().over(wRank).cast("long"))
          .withColumn("adj", least(min(col("p") * col("m") / col("rk"))
            .over(wAdj), lit(1.0)))
          .select(col("et"), col("rk"), col("z_e4"),
            floor(col("p") * 10000).cast("long").as("p_e4"),
            floor(col("adj") * 10000).cast("long").as("adj_p_e4"),
            (floor(col("adj") * 10000) <= 1000).as("reject_fdr10"))
          .orderBy("rk")
      },
      Some("""WITH g AS (SELECT event_type AS et, count(*)::DOUBLE AS n,
             |                  sum(value) AS sx, sum(value * value) AS sxx
             |           FROM events WHERE value IS NOT NULL GROUP BY 1),
             | tot AS (SELECT sum(n) AS tn, sum(sx) AS tsx, sum(sxx) AS tsxx,
             |                CAST(count(*) AS BIGINT) AS m
             |         FROM g),
             | st AS (SELECT et, m,
             |               (sx / n - (tsx - sx) / (tn - n)) /
             |               sqrt(((sxx - n * (sx / n) * (sx / n)) / (n - 1)) / n +
             |                    (((tsxx - sxx) - (tn - n) * ((tsx - sx) / (tn - n)) * ((tsx - sx) / (tn - n))) / ((tn - n) - 1)) / (tn - n)) AS z
             |        FROM g, tot),
             | pp AS (SELECT et, m, z,
             |               (((((1.061405429 * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) + -1.453152027)
             |                   * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) + 1.421413741)
             |                   * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) + -0.284496736)
             |                   * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))) + 0.254829592)
             |                   * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0)))))
             |               * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))) AS p
             |        FROM st),
             | rk AS (SELECT et, m, z, p,
             |               CAST(row_number() OVER (ORDER BY p, et) AS BIGINT) AS rk
             |        FROM pp),
             | adj AS (SELECT et, rk, z, p,
             |                least(min(p * m / rk) OVER (ORDER BY p, et
             |                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 1.0) AS a
             |         FROM rk)
             |SELECT et, rk,
             |       CAST(floor(z * 10000) AS BIGINT) AS z_e4,
             |       CAST(floor(p * 10000) AS BIGINT) AS p_e4,
             |       CAST(floor(a * 10000) AS BIGINT) AS adj_p_e4,
             |       floor(a * 10000) <= 1000 AS reject_fdr10
             |FROM adj ORDER BY rk""".stripMargin)),

    GQuery(
      "orders_priority_markov",
      (s, dir) => {
        // MARKOV STATIONARY DISTRIBUTION of order-priority
        // transitions: per customer, consecutive orders (date order,
        // orderkey tiebreak) emit a prio→prio transition; the counts
        // row-normalize into a 5×5 chain and 8 power iterations from
        // the uniform start converge it. The iteration state is a
        // |states|-row vector and each step is one tiny join+agg —
        // the transition EXTRACTION is the only full-data pass
        // (one window over orders partitioned by customer). The
        // convergence witness (L1 delta of the last step) ships in
        // the output so a non-converged chain fails loudly.
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        val tr = Tables.t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
            col("o_orderpriority").as("p_from"))
          .withColumn("p_to", lead(col("p_from"), 1).over(w))
          .where(col("p_to").isNotNull)
          .groupBy("p_from", "p_to").agg(count(lit(1)).as("c"))
        val pm = tr.withColumn("rowsum",
            sum("c").over(Window.partitionBy("p_from")))
          .select(col("p_from"), col("p_to"),
            (col("c").cast("double") / col("rowsum")).as("p"))
          .localCheckpoint()
        var v = pm.select(col("p_from").as("prio")).distinct()
          .withColumn("v", lit(0.2))
        var prev = v
        for (_ <- 1 to 8) {
          prev = v
          v = pm.join(v, col("prio") === col("p_from"))
            .groupBy(col("p_to").as("prio"))
            .agg(sum(col("v") * col("p")).as("v"))
        }
        val delta = v.select(col("prio"), col("v").as("v8"))
          .join(prev.select(col("prio"), col("v").as("v7")), "prio")
          .agg(floor(sum(abs(col("v8") - col("v7"))) * 10000)
            .cast("long").as("l1_delta_e4"))
        v.crossJoin(broadcast(delta))
          .select(col("prio"), floor(col("v") * 10000).cast("long")
            .as("pi_e4"), col("l1_delta_e4"))
          .orderBy("prio")
      },
      Some("""WITH seq AS (SELECT o_custkey, o_orderpriority AS p_from,
             |                    lead(o_orderpriority) OVER (PARTITION BY o_custkey
             |                      ORDER BY o_orderdate, o_orderkey) AS p_to
             |             FROM orders),
             | tr AS (SELECT p_from, p_to, count(*)::DOUBLE AS c
             |        FROM seq WHERE p_to IS NOT NULL GROUP BY 1, 2),
             | pm AS (SELECT p_from, p_to, c / sum(c) OVER (PARTITION BY p_from) AS p
             |        FROM tr),
             | v0 AS (SELECT DISTINCT p_from AS prio, 0.2 AS v FROM pm),
             | v1 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v0 JOIN pm ON prio = p_from GROUP BY 1),
             | v2 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v1 JOIN pm ON prio = p_from GROUP BY 1),
             | v3 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v2 JOIN pm ON prio = p_from GROUP BY 1),
             | v4 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v3 JOIN pm ON prio = p_from GROUP BY 1),
             | v5 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v4 JOIN pm ON prio = p_from GROUP BY 1),
             | v6 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v5 JOIN pm ON prio = p_from GROUP BY 1),
             | v7 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v6 JOIN pm ON prio = p_from GROUP BY 1),
             | v8 AS (SELECT p_to AS prio, sum(v * p) AS v FROM v7 JOIN pm ON prio = p_from GROUP BY 1),
             | d AS (SELECT CAST(floor(sum(abs(v8.v - v7.v)) * 10000) AS BIGINT) AS l1_delta_e4
             |       FROM v8 JOIN v7 USING (prio))
             |SELECT v8.prio, CAST(floor(v8.v * 10000) AS BIGINT) AS pi_e4, d.l1_delta_e4
             |FROM v8, d ORDER BY v8.prio""".stripMargin)),

    GQuery(
      "events_poisson_rate_test",
      (s, dir) => {
        // TWO-SAMPLE POISSON RATE TEST (weekday vs weekend event
        // arrival): counts and exposure times are exact integers, the
        // unconditional z = (λ1−λ2)/√(λ1/t1+λ2/t2) is one scalar
        // chain. The whole readout is a 2-cell aggregate — at any
        // scale this is a map-side count, the canonical "did the
        // arrival rate change" monitor.
        val e = Tables.t(s, dir, "events")
          .select((dayofweek(to_date(col("ts"))) - 1).as("dow"))
          .withColumn("is_wkend",
            col("dow") === 0 || col("dow") === 6)
        val agg = e.groupBy("is_wkend").agg(count(lit(1)).as("c"))
        // exposure: weekdays 5 day-slots, weekend 2 (rate per slot)
        val wide = agg.agg(
          sum(when(col("is_wkend"), col("c")).otherwise(0L)).as("cw"),
          sum(when(!col("is_wkend"), col("c")).otherwise(0L)).as("cd"))
        val l1 = col("cw") / lit(2.0)
        val l2 = col("cd") / lit(5.0)
        wide.select(col("cw"), col("cd"),
          floor((l1 - l2) / sqrt(l1 / lit(2.0) + l2 / lit(5.0)) * 10000)
            .cast("long").as("z_e4"))
      },
      Some("""WITH e AS (SELECT CASE WHEN dayofweek(ts::DATE) IN (0, 6)
             |                       THEN true ELSE false END AS is_wkend
             |           FROM events),
             | a AS (SELECT CAST(sum(CASE WHEN is_wkend THEN 1 ELSE 0 END) AS BIGINT) AS cw,
             |              CAST(sum(CASE WHEN NOT is_wkend THEN 1 ELSE 0 END) AS BIGINT) AS cd
             |       FROM e)
             |SELECT cw, cd,
             |       CAST(floor((cw / 2.0 - cd / 5.0) /
             |              sqrt((cw / 2.0) / 2.0 + (cd / 5.0) / 5.0) * 10000) AS BIGINT) AS z_e4
             |FROM a""".stripMargin)),

    GQuery(
      "stats_poisson_bootstrap",
      (s, dir) => {
        // POISSON BOOTSTRAP confidence interval for the mean purchase
        // value — THE distributed bootstrap: resample b includes row i
        // with multiplicity ~ Poisson(1) drawn from a deterministic
        // per-(row, replica) hash, so no replica ever needs the global
        // row count or a shared sample — each partition resamples
        // independently and the replica means fold in one aggregate.
        // 50 replicas, inverse-CDF thresholds inlined as literals
        // (tail collapsed into m=5). The hash is a deliberately
        // PORTABLE linear-congruential mix (both engines replay it
        // bit-for-bit in BIGINT); production would swap xxhash64 —
        // same plan shape, engine-specific bits (the established
        // dedup_minhash_fast trade-off). Scale: |rows|×B expansion is
        // map-side (generated, never shuffled); the only exchange
        // carries B replica partials.
        val src = Tables.t(s, dir, "events")
          .where(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("event_id"), col("value"))
        val ex = src.select(col("event_id"), col("value"),
          explode(sequence(lit(0L), lit(49L))).as("b"))
        // event_id is reduced mod 2^31-1 BEFORE the multiply: Spark
        // wraps silently on BIGINT overflow while DuckDB raises, so the
        // engines would diverge (wrong-vs-error) past event_id ~3.4e9 —
        // the reduction keeps every intermediate below 2^63
        val u = (((col("event_id") % lit(2147483647L)) * lit(2654435761L) +
          col("b") * lit(1013904223L) + lit(1442695040888963407L))
          % lit(2147483647L)).cast("double") / lit(2147483647.0)
        // max intermediate: (2^31-2)*2654435761 + 49*1013904223 +
        // 1442695040888963407 ≈ 7.1e18 < 2^63-1 ≈ 9.2e18
        val m = when(u < 0.36787944117144233, 0L)
          .when(u < 0.7357588823428847, 1L)
          .when(u < 0.9196986029286058, 2L)
          .when(u < 0.9810118431238462, 3L)
          .when(u < 0.9963401531726563, 4L)
          .otherwise(5L)
        val reps = ex.withColumn("m", m)
          .groupBy("b")
          .agg((sum(col("m") * col("value")) / sum(col("m"))).as("mb"))
        val ci = reps.agg(
          round(percentile(col("mb"), lit(0.025)), 4).as("ci_lo"),
          round(percentile(col("mb"), lit(0.975)), 4).as("ci_hi"))
        val base = src.agg(count(lit(1)).as("n"),
          round(avg(col("value")), 4).as("mean"))
        base.crossJoin(broadcast(ci))
          .select(col("n"), col("mean"), col("ci_lo"), col("ci_hi"))
      },
      Some("""WITH src AS (SELECT event_id, value FROM events
             |             WHERE event_type = 'purchase' AND value IS NOT NULL),
             | ex AS (SELECT event_id, value, b
             |        FROM src, unnest(generate_series(0, 49)) AS t(b)),
             | mm AS (SELECT value, b,
             |          CASE WHEN u < 0.36787944117144233 THEN 0
             |               WHEN u < 0.7357588823428847 THEN 1
             |               WHEN u < 0.9196986029286058 THEN 2
             |               WHEN u < 0.9810118431238462 THEN 3
             |               WHEN u < 0.9963401531726563 THEN 4
             |               ELSE 5 END AS m
             |        FROM (SELECT value, b,
             |                CAST(((event_id % 2147483647) * 2654435761 +
             |                      b * 1013904223 +
             |                      1442695040888963407) % 2147483647 AS DOUBLE)
             |                / 2147483647.0 AS u
             |              FROM ex)),
             | reps AS (SELECT b, sum(m * value) / sum(m) AS mb
             |          FROM mm GROUP BY b),
             | ci AS (SELECT round(quantile_cont(mb, 0.025), 4) AS ci_lo,
             |               round(quantile_cont(mb, 0.975), 4) AS ci_hi
             |        FROM reps),
             | base AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |                 round(avg(value), 4) AS mean
             |          FROM src)
             |SELECT n, mean, ci_lo, ci_hi FROM base, ci""".stripMargin)),

    GQuery(
      "agg_tdigest_quantiles",
      (s, dir) => {
        // MERGEABLE QUANTILE SKETCH (t-digest, δ=100) as a typed
        // Aggregator vs the exact percentile: per-partition partial
        // digests merge through Spark's aggregate machinery — the
        // percentile path that never sorts the stream. Centroid layout
        // is merge-order dependent, so the HASH-STABLE output is the
        // agreement row: the exact value (oracle-recomputed) plus the
        // deterministic-when-in-spec rank-error check |rank(est) − q|
        // ≤ 0.025 (δ=100 worst case ≈ 0.01 at the median). Same
        // pattern as the xxhash64 MinHash production variant. One
        // extra scan scores the estimates' true ranks.
        import graft.functions.TDigestAggregator
        import org.apache.spark.sql.Encoders
        val qs = Seq(0.1, 0.5, 0.9, 0.99)
        val tdU = udaf(TDigestAggregator.digest(qs), Encoders.scalaDouble)
        val price = Tables.t(s, dir, "lineitem")
          .select(col("l_extendedprice").as("x"))
        // The per-row aggregate update (exact-percentile buffer insert
        // + digest append) dominates, and the single source file scans
        // as only a few splits — a round-robin repartition costs one
        // narrow 8-byte-row shuffle and buys full-width parallelism
        // for the update phase (measured 9.4 → 3.1 s warm at sf0.1
        // together with the shared-state percentile array below).
        val spread = price.repartition(32)
        // ONE percentile call with the percentage array — a single
        // shared value-buffer state; four separate percentile() aggs
        // would each keep their own copy of the stream (measured 4×
        // the partial-state cost).
        val one = spread.agg(
          tdU(col("x")).as("est"),
          percentile(col("x"),
            array(lit(0.1), lit(0.5), lit(0.9), lit(0.99))).as("ex"),
          count(lit(1)).cast("double").as("n"))
          .select(col("est"), col("n"),
            col("ex")(0).as("e10"), col("ex")(1).as("e50"),
            col("ex")(2).as("e90"), col("ex")(3).as("e99"))
        val ranked = price.crossJoin(broadcast(one)).agg(
          sum(when(col("x") <= col("est")(0), 1L).otherwise(0L)).as("r10"),
          sum(when(col("x") <= col("est")(1), 1L).otherwise(0L)).as("r50"),
          sum(when(col("x") <= col("est")(2), 1L).otherwise(0L)).as("r90"),
          sum(when(col("x") <= col("est")(3), 1L).otherwise(0L)).as("r99"),
          first(col("e10")).as("e10"), first(col("e50")).as("e50"),
          first(col("e90")).as("e90"), first(col("e99")).as("e99"),
          first(col("n")).as("n"))
        def rowFor(q: Double, e: String, r: String) = struct(
          lit(q).as("q"), round(col(e), 4).as("exact"),
          (abs(col(r) / col("n") - lit(q)) <= 0.025).as("rank_ok"))
        ranked.select(explode(array(
            rowFor(0.1, "e10", "r10"), rowFor(0.5, "e50", "r50"),
            rowFor(0.9, "e90", "r90"), rowFor(0.99, "e99", "r99")))
            .as("s"))
          .select(col("s.q"), col("s.exact"), col("s.rank_ok"))
          .orderBy("q")
      },
      Some("""SELECT q, exact, true AS rank_ok FROM (
             |  SELECT 0.1 AS q, round(quantile_cont(l_extendedprice, 0.1), 4) AS exact FROM lineitem
             |  UNION ALL
             |  SELECT 0.5, round(quantile_cont(l_extendedprice, 0.5), 4) FROM lineitem
             |  UNION ALL
             |  SELECT 0.9, round(quantile_cont(l_extendedprice, 0.9), 4) FROM lineitem
             |  UNION ALL
             |  SELECT 0.99, round(quantile_cont(l_extendedprice, 0.99), 4) FROM lineitem)
             |ORDER BY q""".stripMargin)),

    GQuery(
      "text_heaps_law",
      (s, dir) => {
        // HEAPS' LAW GROWTH CURVE: cumulative vocabulary size vs
        // cumulative token count across corpus deciles, plus the
        // per-decile Heaps exponent proxy β = ln V / ln N. The corpus
        // never re-scans per decile: each type contributes through its
        // FIRST-occurrence doc only (one min aggregate), per-decile
        // news and token counts fold to a 10-row frame, and the
        // cumulative curve is a window over those 10 rows. The
        // flattening of β across deciles is the dedup/quality signal
        // (a corpus whose vocabulary stops growing is repeating
        // itself).
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("text"))
        val dec = docs.select(col("doc_id"),
          ntile(10).over(Window.orderBy("doc_id")).cast("long").as("decile"))
        val tok = docs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("w"))
        val tokPerDoc = tok.groupBy("doc_id").agg(count(lit(1)).as("ntok"))
        val newTypes = tok.groupBy("w").agg(min("doc_id").as("first_doc"))
          .join(dec.withColumnRenamed("doc_id", "first_doc"), "first_doc")
          .groupBy("decile").agg(count(lit(1)).as("new_types"))
        val decTok = tokPerDoc.join(dec, "doc_id")
          .groupBy("decile").agg(sum("ntok").as("toks"))
        val wc = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        decTok.join(newTypes, Seq("decile"), "left")
          .select(col("decile"), col("toks"),
            coalesce(col("new_types"), lit(0L)).as("new_types"))
          .select(col("decile"),
            sum(col("toks")).over(wc).as("cum_tokens"),
            sum(col("new_types")).over(wc).as("cum_types"))
          .select(col("decile"), col("cum_tokens"), col("cum_types"),
            floor(log(col("cum_types")) / log(col("cum_tokens")) * 10000)
              .cast("long").as("beta_e4"))
          .orderBy("decile")
      },
      Some("""WITH dec AS (SELECT doc_id,
             |                    CAST(ntile(10) OVER (ORDER BY doc_id) AS BIGINT) AS decile
             |             FROM documents),
             | tok AS (SELECT doc_id,
             |                unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
             |         FROM documents),
             | tpd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS ntok FROM tok GROUP BY 1),
             | nt AS (SELECT decile, CAST(count(*) AS BIGINT) AS new_types
             |        FROM (SELECT w, min(doc_id) AS first_doc FROM tok GROUP BY w) f
             |        JOIN dec ON f.first_doc = dec.doc_id GROUP BY 1),
             | dt AS (SELECT decile, CAST(sum(ntok) AS BIGINT) AS toks
             |        FROM tpd JOIN dec USING (doc_id) GROUP BY 1),
             | cur AS (SELECT dt.decile,
             |                sum(dt.toks) OVER (ORDER BY dt.decile) AS cum_tokens,
             |                sum(coalesce(nt.new_types, 0)) OVER (ORDER BY dt.decile) AS cum_types
             |         FROM dt LEFT JOIN nt USING (decile))
             |SELECT decile, CAST(cum_tokens AS BIGINT) AS cum_tokens,
             |       CAST(cum_types AS BIGINT) AS cum_types,
             |       CAST(floor(ln(cum_types::DOUBLE) / ln(cum_tokens::DOUBLE) * 10000) AS BIGINT) AS beta_e4
             |FROM cur ORDER BY decile""".stripMargin)),

    GQuery(
      "supplier_herfindahl",
      (s, dir) => {
        // HERFINDAHL-HIRSCHMAN concentration INDEX of supplier revenue
        // within each part brand — the "is this slice of the corpus
        // dominated by one source" monitor, same math as a training-
        // mix concentration audit. Revenue folds once per (brand,
        // supplier); shares and HHI fold from that |brands×suppliers|
        // frame — the raw lineitem stream is touched exactly once.
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        val part = Tables.t(s, dir, "part").select("p_partkey", "p_brand")
        val bs = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("l_suppkey"))
          .agg(sum("rev").as("rev"))
        val tot = bs.groupBy("p_brand").agg(sum("rev").as("brand_rev"),
          count(lit(1)).as("n_suppliers"))
        bs.join(tot, "p_brand")
          .groupBy(col("p_brand"), col("n_suppliers"))
          .agg(round(sum(pow(col("rev") / col("brand_rev"), 2)), 6).as("hhi"))
          .select(col("p_brand"), col("n_suppliers"), col("hhi"))
          .orderBy("p_brand")
      },
      Some("""WITH bs AS (SELECT p.p_brand, l.l_suppkey,
             |                   sum(l.l_extendedprice * (1.0 - l.l_discount)) AS rev
             |            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
             |            GROUP BY 1, 2),
             | tot AS (SELECT p_brand, sum(rev) AS brand_rev,
             |                CAST(count(*) AS BIGINT) AS n_suppliers
             |         FROM bs GROUP BY 1)
             |SELECT bs.p_brand, tot.n_suppliers,
             |       round(sum(pow(bs.rev / tot.brand_rev, 2)), 6) AS hhi
             |FROM bs JOIN tot USING (p_brand)
             |GROUP BY bs.p_brand, tot.n_suppliers
             |ORDER BY bs.p_brand""".stripMargin)),

    GQuery(
      "docs_mix_waterfill",
      (s, dir) => {
        // WATER-FILLING MIX PLANNER: distribute a 0.7-of-corpus token
        // budget across languages with an equal-share target; languages
        // smaller than their share are taken WHOLE (rate 1) and their
        // unused budget redistributes among the rest — the classic
        // water-fill, unrolled to |groups| rounds (allocation is
        // monotone, so capped groups stay capped and |groups| rounds
        // is the fixpoint bound). The corpus is touched once for the
        // per-language sizes; every round is arithmetic on a
        // |languages|-row frame. Output: per-language sampling rate
        // and sampled mass — the plan a downstream weighted sampler
        // (docs_mix_weighted) executes.
        val l = Tables.t(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(sum("n_chars").cast("double").as("toks"))
          .localCheckpoint()
        val base = l.agg((sum("toks") * 0.7).as("b"),
          count(lit(1)).cast("double").as("k"))
        var alloc = base.select((col("b") / col("k")).as("alloc"), col("b"))
        for (_ <- 1 to 4) {
          alloc = l.crossJoin(broadcast(alloc)).agg(
            first(col("b")).as("b"),
            sum(when(col("toks") <= col("alloc"), col("toks"))
              .otherwise(0.0)).as("capped_mass"),
            sum(when(col("toks") <= col("alloc"), 0.0)
              .otherwise(1.0)).as("k_open"))
            .select(((col("b") - col("capped_mass")) / col("k_open"))
              .as("alloc"), col("b"))
        }
        l.crossJoin(broadcast(alloc))
          .select(col("lang"), col("toks").cast("long").as("chars"),
            floor(when(col("toks") <= col("alloc"), 1.0)
              .otherwise(col("alloc") / col("toks")) * 1000000)
              .cast("long").as("rate_e6"),
            floor(least(col("toks"), col("alloc"))).cast("long")
              .as("sampled_chars"))
          .orderBy("lang")
      },
      Some("""WITH l AS (SELECT lang, CAST(sum(n_chars) AS DOUBLE) AS toks
             |           FROM documents GROUP BY 1),
             | base AS (SELECT sum(toks) * 0.7 AS b,
             |                 CAST(count(*) AS DOUBLE) AS k FROM l),
             | a0 AS (SELECT b / k AS alloc, b FROM base),
             | a1 AS (SELECT (any_value(a0.b) - sum(CASE WHEN l.toks <= a0.alloc THEN l.toks ELSE 0 END)) /
             |               sum(CASE WHEN l.toks <= a0.alloc THEN 0 ELSE 1 END) AS alloc,
             |               any_value(a0.b) AS b
             |        FROM l, a0),
             | a2 AS (SELECT (any_value(a1.b) - sum(CASE WHEN l.toks <= a1.alloc THEN l.toks ELSE 0 END)) /
             |               sum(CASE WHEN l.toks <= a1.alloc THEN 0 ELSE 1 END) AS alloc,
             |               any_value(a1.b) AS b
             |        FROM l, a1),
             | a3 AS (SELECT (any_value(a2.b) - sum(CASE WHEN l.toks <= a2.alloc THEN l.toks ELSE 0 END)) /
             |               sum(CASE WHEN l.toks <= a2.alloc THEN 0 ELSE 1 END) AS alloc,
             |               any_value(a2.b) AS b
             |        FROM l, a2),
             | a4 AS (SELECT (any_value(a3.b) - sum(CASE WHEN l.toks <= a3.alloc THEN l.toks ELSE 0 END)) /
             |               sum(CASE WHEN l.toks <= a3.alloc THEN 0 ELSE 1 END) AS alloc,
             |               any_value(a3.b) AS b
             |        FROM l, a3)
             |SELECT lang, CAST(toks AS BIGINT) AS chars,
             |       CAST(floor(CASE WHEN toks <= alloc THEN 1.0
             |                       ELSE alloc / toks END * 1000000) AS BIGINT) AS rate_e6,
             |       CAST(floor(least(toks, alloc)) AS BIGINT) AS sampled_chars
             |FROM l, a4 ORDER BY lang""".stripMargin)),

    GQuery(
      "dedup_cascade_funnel",
      (s, dir) => {
        // DEDUP CASCADE ROI REPORT: the funnel a production corpus
        // pipeline runs tier by tier — exact text hash, then
        // bag-of-words fingerprint (md5 of the SORTED token list:
        // catches token-permuted copies exact hashing misses), then
        // 80-char prefix (catches template/boilerplate families).
        // Each tier keeps the min doc_id per key among the PREVIOUS
        // tier's survivors, so the report shows the marginal yield of
        // each tier — the number that justifies (or kills) the next,
        // more expensive dedup stage. Every tier is one hash
        // aggregate; the text column never shuffles (only its
        // fingerprint does).
        val d = Tables.t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            md5(col("text")).as("h_exact"),
            md5(concat_ws(" ", array_sort(TextOps.tokens(col("text")))))
              .as("h_bag"),
            md5(substring(col("text"), 1, 80)).as("h_prefix"))
          .localCheckpoint()
        def survivors(in: org.apache.spark.sql.DataFrame, key: String) =
          in.join(
            in.groupBy(col(key)).agg(min("doc_id").as("doc_id"))
              .select("doc_id"),
            Seq("doc_id"), "semi")
        val s1 = survivors(d, "h_exact")
        val s2 = survivors(s1, "h_bag")
        val s3 = survivors(s2, "h_prefix")
        def stage(df: org.apache.spark.sql.DataFrame, id: Int, nm: String) =
          df.agg(count(lit(1)).as("docs"), sum("n_chars").as("chars"))
            .select(lit(id).as("stage"), lit(nm).as("tier"),
              col("docs"), col("chars"))
        stage(d, 0, "raw")
          .unionByName(stage(s1, 1, "exact"))
          .unionByName(stage(s2, 2, "bag_of_words"))
          .unionByName(stage(s3, 3, "prefix80"))
          .select(col("stage").cast("long").as("stage"), col("tier"),
            col("docs"), col("chars"))
          .orderBy("stage")
      },
      Some("""WITH d AS (SELECT doc_id, n_chars,
             |                  md5(text) AS h_exact,
             |                  md5(array_to_string(list_sort(list_filter(string_split(text, ' '), x -> x <> '')), ' ')) AS h_bag,
             |                  md5(substr(text, 1, 80)) AS h_prefix
             |           FROM documents),
             | s1 AS (SELECT d.* FROM d
             |        JOIN (SELECT h_exact, min(doc_id) AS keep FROM d GROUP BY 1) k
             |          ON d.doc_id = k.keep),
             | s2 AS (SELECT s1.* FROM s1
             |        JOIN (SELECT h_bag, min(doc_id) AS keep FROM s1 GROUP BY 1) k
             |          ON s1.doc_id = k.keep),
             | s3 AS (SELECT s2.* FROM s2
             |        JOIN (SELECT h_prefix, min(doc_id) AS keep FROM s2 GROUP BY 1) k
             |          ON s2.doc_id = k.keep)
             |SELECT * FROM (
             |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS tier, CAST(count(*) AS BIGINT) AS docs,
             |         CAST(sum(n_chars) AS BIGINT) AS chars FROM d
             |  UNION ALL
             |  SELECT 1, 'exact', CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT) FROM s1
             |  UNION ALL
             |  SELECT 2, 'bag_of_words', CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT) FROM s2
             |  UNION ALL
             |  SELECT 3, 'prefix80', CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT) FROM s3)
             |ORDER BY stage""".stripMargin))
  )
}
