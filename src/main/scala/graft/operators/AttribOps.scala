package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 11: position-based marketing attribution, time-windowed
  * funnels, SCD2 as-of snapshot reconstruction, and two-feature OLS via
  * normal equations. All DuckDB-oracle-checked.
  */
object AttribOps {

  val all: Seq[GQuery] = Seq(

    GQuery(
      "events_attribution_position",
      (s, dir) => {
        // POSITION-BASED (U-shaped) attribution: touches before a
        // user's first purchase earn 40% first / 40% last / 20% split
        // across middles. One window pass ranks each journey; credit is
        // a projection; channel totals are one aggregate. No per-user
        // collects, no path explosion — the journey never materializes
        // as a row.
        val ev = Tables.t(s, dir, "events")
        val fp = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id").as("fu")).agg(min("ts").as("pt"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val j = ev.join(fp, col("user_id") === col("fu") && col("ts") < col("pt"))
          .select(col("user_id"), col("event_type").as("ch"),
            row_number().over(w).as("rn"),
            count(lit(1)).over(Window.partitionBy("user_id")).as("n"))
        val credit = when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(col("rn") === 1 || col("rn") === col("n"), lit(0.4))
          .otherwise(lit(0.2) / (col("n") - 2))
        j.select(col("ch"), credit.as("c"))
          .groupBy("ch").agg(round(sum("c"), 4).as("credit"))
          .orderBy("ch")
      },
      Some("""WITH fp AS (SELECT user_id, min(ts) AS pt FROM events
             |            WHERE event_type = 'purchase' GROUP BY 1),
             | j AS (SELECT e.user_id, e.event_type AS ch,
             |              row_number() OVER (PARTITION BY e.user_id
             |                                 ORDER BY e.ts, e.event_id) AS rn,
             |              count(*) OVER (PARTITION BY e.user_id) AS n
             |       FROM events e JOIN fp ON e.user_id = fp.user_id AND e.ts < fp.pt),
             | credit AS (SELECT ch,
             |                   CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
             |                        WHEN rn = 1 OR rn = n THEN 0.4
             |                        ELSE 0.2 / (n - 2) END AS c
             |            FROM j)
             |SELECT ch, round(sum(c), 4) AS credit
             |FROM credit GROUP BY 1 ORDER BY 1""".stripMargin)),

    GQuery(
      "events_funnel_windowed",
      (s, dir) => {
        // TIME-WINDOWED funnel: view → click within 3 days → purchase
        // within 3 days of the click. Each stage is a keyed min-ts
        // aggregate seeded by the previous stage's timestamps (the
        // conditional-min chain) — per-user state is one timestamp per
        // stage, never an event-pair join. The plain funnel can't
        // express the step deadline; this is the form product analytics
        // actually runs.
        val ev = Tables.t(s, dir, "events")
        val v = ev.where(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min("ts").as("t1"))
        val c = ev.where(col("event_type") === "click").as("e")
          .join(v.as("v"), col("e.user_id") === col("v.user_id") &&
            col("e.ts") > col("t1") &&
            col("e.ts") <= col("t1") + expr("INTERVAL 3 DAYS"))
          .groupBy(col("e.user_id").as("user_id")).agg(min("e.ts").as("t2"))
        val p = ev.where(col("event_type") === "purchase").as("e2")
          .join(c.as("c"), col("e2.user_id") === col("c.user_id") &&
            col("e2.ts") > col("t2") &&
            col("e2.ts") <= col("t2") + expr("INTERVAL 3 DAYS"))
          .groupBy(col("e2.user_id").as("user_id")).agg(min("e2.ts").as("t3"))
        v.agg(count(lit(1)).as("stage1"))
          .crossJoin(c.agg(count(lit(1)).as("stage2")))
          .crossJoin(p.agg(count(lit(1)).as("stage3")))
      },
      Some("""WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
             |           WHERE event_type = 'view' GROUP BY 1),
             | c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |       JOIN v ON e.user_id = v.user_id
             |       WHERE e.event_type = 'click' AND e.ts > v.t1
             |         AND e.ts <= v.t1 + INTERVAL 3 DAY
             |       GROUP BY 1),
             | p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |       JOIN c ON e.user_id = c.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts > c.t2
             |         AND e.ts <= c.t2 + INTERVAL 3 DAY
             |       GROUP BY 1)
             |SELECT (SELECT count(*) FROM v)::BIGINT AS stage1,
             |       (SELECT count(*) FROM c)::BIGINT AS stage2,
             |       (SELECT count(*) FROM p)::BIGINT AS stage3""".stripMargin)),

    GQuery(
      "ingest_scd2_snapshot",
      (s, dir) => {
        // AS-OF SNAPSHOT over SCD2 history — time travel: reconstruct
        // every user's state at version V (here the stream's midpoint)
        // from validity intervals with ONE filter: eff_from <= V < eff_to.
        // The historical table answers any point-in-time question
        // without replaying events — the reason SCD2 exists.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ev = Tables.t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        val vMid = ev.agg((max("event_id") / 2).cast("long")).first().getLong(0)
        val scd2 = ev
          .withColumn("prev", lag("event_type", 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("eff_to", lead("event_id", 1).over(w))
          .select(col("user_id"), col("event_type"),
            col("event_id").as("eff_from"), col("eff_to"))
        scd2.where(col("eff_from") <= vMid &&
            (col("eff_to").isNull || col("eff_to") > vMid))
          .select(col("user_id"), col("event_type"))
          .orderBy("user_id")
      },
      Some("""WITH o AS (SELECT user_id, ts, event_id, event_type,
             |                  lag(event_type) OVER (PARTITION BY user_id
             |                     ORDER BY ts, event_id) AS prev
             |           FROM events),
             | c AS (SELECT user_id, ts, event_id, event_type FROM o
             |       WHERE prev IS NULL OR prev <> event_type),
             | scd2 AS (SELECT user_id, event_type, event_id AS eff_from,
             |                 lead(event_id) OVER (PARTITION BY user_id
             |                    ORDER BY ts, event_id) AS eff_to
             |          FROM c),
             | v AS (SELECT (max(event_id) // 2) AS vmid FROM events)
             |SELECT user_id, event_type
             |FROM scd2, v
             |WHERE eff_from <= vmid AND (eff_to IS NULL OR eff_to > vmid)
             |ORDER BY user_id""".stripMargin)),

    GQuery(
      "stats_ols_normal_eq",
      (s, dir) => {
        // TWO-FEATURE OLS by normal equations — model training as pure
        // aggregates: nine sufficient statistics in ONE scan (sums,
        // squares, cross-products), then the 2×2 solve is arithmetic on
        // a single row. The pattern that fits millions of per-segment
        // models at 100 TB with a groupBy in front — no gradient loop,
        // no driver-side data.
        val m = Tables.t(s, dir, "lineitem").agg(
          count(lit(1)).cast("double").as("n"),
          sum("l_quantity").as("s1"), sum("l_discount").as("s2"),
          sum("l_extendedprice").as("sy"),
          sum(col("l_quantity") * col("l_quantity")).as("s11"),
          sum(col("l_quantity") * col("l_discount")).as("s12"),
          sum(col("l_discount") * col("l_discount")).as("s22"),
          sum(col("l_quantity") * col("l_extendedprice")).as("s1y"),
          sum(col("l_discount") * col("l_extendedprice")).as("s2y"))
        val c = m.select(col("n"),
          (col("s11") - col("s1") * col("s1") / col("n")).as("a"),
          (col("s12") - col("s1") * col("s2") / col("n")).as("b"),
          (col("s22") - col("s2") * col("s2") / col("n")).as("cc"),
          (col("s1y") - col("s1") * col("sy") / col("n")).as("dy1"),
          (col("s2y") - col("s2") * col("sy") / col("n")).as("dy2"),
          (col("s1") / col("n")).as("m1"), (col("s2") / col("n")).as("m2"),
          (col("sy") / col("n")).as("my"))
        val det = col("a") * col("cc") - col("b") * col("b")
        val b1 = (col("dy1") * col("cc") - col("dy2") * col("b")) / det
        val b2 = (col("dy2") * col("a") - col("dy1") * col("b")) / det
        c.select(round(b1, 4).as("b1"), round(b2, 4).as("b2"),
          round(col("my") - b1 * col("m1") - b2 * col("m2"), 4).as("b0"))
      },
      Some("""WITH m AS (SELECT count(*)::DOUBLE AS n,
             |                  sum(l_quantity) AS s1, sum(l_discount) AS s2,
             |                  sum(l_extendedprice) AS sy,
             |                  sum(l_quantity * l_quantity) AS s11,
             |                  sum(l_quantity * l_discount) AS s12,
             |                  sum(l_discount * l_discount) AS s22,
             |                  sum(l_quantity * l_extendedprice) AS s1y,
             |                  sum(l_discount * l_extendedprice) AS s2y
             |           FROM lineitem),
             | c AS (SELECT n, s11 - s1*s1/n AS a, s12 - s1*s2/n AS b,
             |              s22 - s2*s2/n AS cc, s1y - s1*sy/n AS dy1,
             |              s2y - s2*sy/n AS dy2,
             |              s1/n AS m1, s2/n AS m2, sy/n AS my
             |       FROM m)
             |SELECT round((dy1*cc - dy2*b) / (a*cc - b*b), 4) AS b1,
             |       round((dy2*a - dy1*b) / (a*cc - b*b), 4) AS b2,
             |       round(my - (dy1*cc - dy2*b)/(a*cc - b*b)*m1
             |                - (dy2*a - dy1*b)/(a*cc - b*b)*m2, 4) AS b0
             |FROM c""".stripMargin))
  )
}
