package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 14: linear time-series interpolation, null-skipping
  * window offsets, and the GROUP BY ALL / ORDER BY ALL SQL surface.
  * All DuckDB-oracle-checked.
  */
object TimeOps {

  val all: Seq[GQuery] = Seq(

    GQuery(
      "events_interpolate_linear",
      (s, dir) => {
        // LINEAR interpolation over each user's day spine — the
        // resampling step between forward-fill (events_gapfill) and
        // model-based imputation: gaps get the straight line between
        // the surrounding observations. Four IGNORE-NULLS window
        // passes over ONE per-user sort (prev/next value and their
        // dates); the blend is a projection. The spine never exceeds
        // |users| × |days| rows regardless of event volume.
        val daily = Tables.t(s, dir, "events")
          .where(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
          .groupBy("user_id", "d")
          .agg(round(max("value"), 2).as("v"))
        val spine = daily.groupBy("user_id")
          .agg(min("d").as("d0"), max("d").as("d1"))
          .select(col("user_id"),
            explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
        val back = Window.partitionBy("user_id").orderBy("d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val fwd = Window.partitionBy("user_id").orderBy("d")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        val obsD = when(col("v").isNotNull, col("d"))
        val interp = spine.join(daily, Seq("user_id", "d"), "left")
          .withColumn("pv", last("v", ignoreNulls = true).over(back))
          .withColumn("pd", last(obsD, ignoreNulls = true).over(back))
          .withColumn("nv", first("v", ignoreNulls = true).over(fwd))
          .withColumn("nd", first(obsD, ignoreNulls = true).over(fwd))
        // EXACT fixed-point blend: observations are integer cents, the
        // line value is rational (cents × day-ratio) — a double round()
        // here lands exactly ON the half boundary (terminating decimal
        // blends are common), where the engines' rounding of binary
        // doubles diverges. Integer numerator + floor `div` replays
        // bit-identically; output unit = 1e-4 of a value unit.
        val pvC = round(col("pv") * 100, 0).cast("long")
        val nvC = round(col("nv") * 100, 0).cast("long")
        interp
          .withColumn("pvc", pvC).withColumn("nvc", nvC)
          .withColumn("da", datediff(col("d"), col("pd")).cast("long"))
          .withColumn("db", datediff(col("nd"), col("pd")).cast("long"))
          .select(col("user_id"),
            date_format(col("d"), "yyyy-MM-dd").as("day"),
            col("v").as("v_obs"),
            when(col("v").isNotNull,
              round(col("v") * 100, 0).cast("long") * 100)
              .otherwise(expr("(pvc * db + (nvc - pvc) * da) * 100 div db"))
              .as("v_interp_e4"))
          .orderBy("user_id", "day")
      },
      Some("""WITH daily AS (SELECT user_id, ts::DATE AS d, round(max(value), 2) AS v
             |               FROM events WHERE event_type = 'purchase'
             |               GROUP BY user_id, ts::DATE),
             | bounds AS (SELECT user_id, min(d) AS d0, max(d) AS d1
             |            FROM daily GROUP BY user_id),
             | spine AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS d
             |           FROM bounds),
             | j AS (SELECT s.user_id, s.d, daily.v
             |       FROM spine s LEFT JOIN daily
             |         ON daily.user_id = s.user_id AND daily.d = s.d),
             | f AS (SELECT user_id, d, v,
             |              last_value(v IGNORE NULLS) OVER wb AS pv,
             |              last_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER wb AS pd,
             |              first_value(v IGNORE NULLS) OVER wf AS nv,
             |              first_value(CASE WHEN v IS NOT NULL THEN d END IGNORE NULLS) OVER wf AS nd
             |       FROM j
             |       WINDOW wb AS (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING),
             |              wf AS (PARTITION BY user_id ORDER BY d
             |                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, strftime(d, '%Y-%m-%d') AS day, v AS v_obs,
             |       CASE WHEN v IS NOT NULL THEN round(v * 100, 0)::BIGINT * 100
             |            ELSE (round(pv * 100, 0)::BIGINT * date_diff('day', pd, nd)
             |                  + (round(nv * 100, 0)::BIGINT - round(pv * 100, 0)::BIGINT)
             |                    * date_diff('day', pd, d)) * 100
             |                 // date_diff('day', pd, nd) END AS v_interp_e4
             |FROM f ORDER BY user_id, day""".stripMargin)),

    GQuery(
      "window_lead_skip_nulls",
      (s, dir) => {
        // IGNORE NULLS window offsets: for every event, the NEXT
        // purchase amount in that user's timeline — lead() that skips
        // non-qualifying rows, the "time to next conversion value"
        // primitive a plain lead(1) cannot express without a self-join.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.t(s, dir, "events")
          .select(col("event_id"),
            lead(when(col("event_type") === "purchase", col("value")),
              1, null, true).over(w).as("next_purchase"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |       lead(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
             |         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_purchase
             |FROM events ORDER BY event_id""".stripMargin)),

    GQuery(
      "events_autocorr",
      (s, dir) => {
        // Lag-1 AUTOCORRELATION of the daily total — the one-number
        // "is yesterday predictive of today" diagnostic (near zero ⇒
        // white noise ⇒ forecasting adds nothing over the mean). The
        // event stream collapses to |days| rows, the lag is one window
        // step, corr is a co-moment aggregate over ≤ |days| pairs.
        val daily = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(round(sum("value"), 2).as("tot"))
        val w = Window.orderBy("d")
        daily.withColumn("p", lag("tot", 1).over(w))
          .agg(round(corr("tot", "p"), 4).as("ac1"),
            count(col("p")).as("n_pairs"))
      },
      Some("""WITH daily AS (SELECT ts::DATE AS d, round(sum(value), 2) AS tot
             |               FROM events GROUP BY 1),
             | l AS (SELECT d, tot, lag(tot) OVER (ORDER BY d) AS p FROM daily)
             |SELECT round(corr(tot, p), 4) AS ac1, count(p)::BIGINT AS n_pairs
             |FROM l""".stripMargin)),

    GQuery(
      "agg_group_by_all",
      (s, dir) => {
        // GROUP BY ALL / ORDER BY ALL — the modern SQL surface that
        // derives grouping keys from the select list (both engines
        // support it; keeping analytics SQL portable means exercising
        // it). Same physical plan as the explicit form.
        Tables.registerAll(s, dir)
        s.sql("""SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
                |FROM events GROUP BY ALL ORDER BY ALL""".stripMargin)
      },
      Some("""SELECT event_type, ts::DATE AS d, count(*)::BIGINT AS n
             |FROM events GROUP BY ALL ORDER BY ALL""".stripMargin))
  )
}
