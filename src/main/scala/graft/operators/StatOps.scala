package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical surface beyond plain moments: bivariate aggregates
  * (correlation / covariance / linear regression), robust outlier
  * detection (median absolute deviation), running distinct counts over
  * ordered windows, and information-theoretic text scoring (token
  * entropy).
  *
  * Scale stances:
  *  - corr/covar/regr_* are single-pass co-moment aggregates — same
  *    partial/final shape as sum/avg, one shuffle of tiny per-group
  *    states regardless of input size.
  *  - MAD needs exact medians, so it is two aggregate passes over the
  *    stream plus a broadcast of the per-group stats (one row per
  *    event_type) back onto it — the stream itself is never shuffled.
  *  - Running COUNT(DISTINCT x) over a window is not directly
  *    executable in either engine; both sides use the first-occurrence
  *    flag identity: distinct-so-far == sum over is-first-occurrence,
  *    which is two window passes and one shuffle (same partition key).
  *  - Token entropy never materializes per-token probabilities: entropy
  *    = log2(n) - Σ c·log2(c) / n needs only the per-(doc, token)
  *    counts, and the output is floor-scaled to an integer so the
  *    transcendental tail can't flake the cross-engine hash compare.
  */
object StatOps {

  val all: Seq[GQuery] = Seq(

    GQuery(
      "agg_corr_regr",
      (s, dir) => {
        // Bivariate aggregate family over lineitem: how does quantity
        // co-vary with extended price within each return flag? corr,
        // sample covariance, and the OLS fit y=extendedprice ~
        // x=quantity — all one-pass co-moment aggregates (Welford-style
        // partial states), so the plan is a plain partial+final hash
        // aggregate: nothing but 3 group states crosses the wire.
        Tables.t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_qp"),
            round(regr_slope(col("l_extendedprice"), col("l_quantity")), 2).as("slope"),
            round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2).as("intercept"),
            round(regr_r2(col("l_extendedprice"), col("l_quantity")), 4).as("r2"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |       round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
             |       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
             |       round(regr_slope(l_extendedprice, l_quantity), 2) AS slope,
             |       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
             |       round(regr_r2(l_extendedprice, l_quantity), 4) AS r2,
             |       count(*)::BIGINT AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    GQuery(
      "events_outliers_mad",
      (s, dir) => {
        // ROBUST outlier gate: |value - median| > 3 · 1.4826 · MAD per
        // event_type (the 1.4826 factor makes MAD consistent with σ
        // under normality). Unlike the z-score gate (events_outliers),
        // a few extreme values cannot drag the threshold — medians
        // don't move. Two aggregate passes (median, then MAD around
        // it), each broadcasting its 5-row result back onto the
        // stream; the events stream itself is scanned, never shuffled.
        val e = Tables.t(s, dir, "events").select(col("event_type"), col("value"))
        val med = e.groupBy("event_type").agg(median(col("value")).as("med"))
        val stats = e.join(broadcast(med), "event_type")
          .groupBy("event_type")
          .agg(first("med").as("med"),
            median(abs(col("value") - col("med"))).as("mad"))
        e.join(broadcast(stats), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(when(abs(col("value") - col("med")) > lit(3 * 1.4826) * col("mad"), 1))
              .as("n_outliers"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (SELECT event_type, median(value) AS med
             |             FROM events GROUP BY event_type),
             |     st AS (SELECT e.event_type, any_value(med) AS med,
             |                   median(abs(value - med)) AS mad
             |            FROM events e JOIN med USING (event_type)
             |            GROUP BY e.event_type)
             |SELECT e.event_type, count(*)::BIGINT AS n,
             |       count(CASE WHEN abs(value - med) > 3 * 1.4826 * mad THEN 1 END)::BIGINT
             |         AS n_outliers
             |FROM events e JOIN st USING (event_type)
             |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin)),

    GQuery(
      "window_count_distinct",
      (s, dir) => {
        // Running COUNT(DISTINCT part) per supplier in ship order —
        // "how many distinct parts has this supplier shipped so far?".
        // Neither engine executes DISTINCT aggregates over running
        // window frames, so both use the first-occurrence identity:
        // flag the first (supplier, part) row under the total order,
        // then a running sum of flags. Two window passes over ONE
        // shuffle (both windows hash-partition by l_suppkey — Spark
        // reuses the exchange; the part key only affects the in-
        // partition sort of the first pass).
        val w1 = Window.partitionBy("l_suppkey", "l_partkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        val w2 = Window.partitionBy("l_suppkey")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.t(s, dir, "lineitem")
          .select(col("l_suppkey"), col("l_partkey"), col("l_shipdate"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("first_seen",
            when(row_number().over(w1) === 1, 1L).otherwise(0L))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            sum("first_seen").over(w2).as("n_distinct_parts"))
          .orderBy("l_orderkey", "l_linenumber")
      },
      Some("""WITH f AS (SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
             |                  CASE WHEN row_number() OVER (
             |                         PARTITION BY l_suppkey, l_partkey
             |                         ORDER BY l_shipdate, l_orderkey, l_linenumber) = 1
             |                       THEN 1 ELSE 0 END AS first_seen
             |           FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_suppkey,
             |       (sum(first_seen) OVER (PARTITION BY l_suppkey
             |          ORDER BY l_shipdate, l_orderkey, l_linenumber
             |          ROWS UNBOUNDED PRECEDING))::BIGINT AS n_distinct_parts
             |FROM f ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    GQuery(
      "agg_skew_kurt",
      (s, dir) => {
        // Higher-moment aggregates: population skewness and excess
        // kurtosis per return flag — one-pass central-moment partials
        // like corr/regr (scale-free). Engines disagree on the
        // DEFAULT estimator (Spark = population moments, DuckDB =
        // bias-corrected sample form), so the oracle converts DuckDB's
        // G1/G2 back to population g1/g2 with the standard exact
        // bias-correction identities — a genuine cross-engine check of
        // the moment math, not a same-formula echo.
        Tables.t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(skewness(col("l_quantity")), 4).as("skew_q"),
            round(kurtosis(col("l_quantity")), 4).as("kurt_q"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag")
      },
      Some("""WITH s AS (SELECT l_returnflag,
             |                  skewness(l_quantity) AS G1, kurtosis(l_quantity) AS G2,
             |                  count(*) AS n
             |           FROM lineitem GROUP BY l_returnflag)
             |SELECT l_returnflag,
             |       round(G1 * (n - 2) / sqrt(n * (n - 1.0)), 4) AS skew_q,
             |       round((G2 * (n - 2) * (n - 3) / (n - 1.0) - 6) / (n + 1), 4) AS kurt_q,
             |       n::BIGINT AS n
             |FROM s ORDER BY l_returnflag""".stripMargin)),

    GQuery(
      "basket_pairs",
      (s, dir) => {
        // Market-basket CO-OCCURRENCE (frequent pair mining, support>=3):
        // part pairs that recur across orders. The self-join explodes
        // each order into its within-order pairs — bounded combinatorics
        // (orders have ≤7 lines, so ≤21 pairs each), NOT an O(N²)
        // blow-up: pair generation is linear in orders, and the only
        // shuffle is the (part_a, part_b) support count. The same plan
        // shape mines n-gram co-occurrence in a corpus.
        val li = Tables.t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
          .agg(count(lit(1)).as("support"))
          .where(col("support") >= 3)
          .orderBy("part_a", "part_b")
      },
      Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
             |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |       count(*)::BIGINT AS support
             |FROM li a JOIN li b
             |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             |GROUP BY 1, 2 HAVING count(*) >= 3
             |ORDER BY part_a, part_b""".stripMargin)),

    GQuery(
      "text_entropy",
      (s, dir) => {
        // Per-document token Shannon entropy — the information-density
        // quality signal (boilerplate and keyword-stuffed docs score
        // low). Entropy is computed from per-(doc, token) counts alone
        // via H = log2(n) - Σ c·log2(c)/n: no probability column, no
        // second pass. Output is floor(H·10⁴) as BIGINT so the
        // transcendental tail (engine-order-of-summation noise ~1e-13)
        // can't flake the hash compare.
        val tok = Tables.t(s, dir, "documents")
          .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        tok.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n"),
            sum(col("c").cast("double") * log2(col("c"))).as("sclog"))
          .select(col("doc_id"), col("n"),
            floor((log2(col("n")) - col("sclog") / col("n")) * 10000)
              .cast("long").as("entropy_e4"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |                    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
             |             FROM documents),
             |     cnt AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
             |     ent AS (SELECT doc_id, sum(c) AS n,
             |                    sum(c::DOUBLE * log2(c::DOUBLE)) AS sclog
             |             FROM cnt GROUP BY doc_id)
             |SELECT doc_id, n::BIGINT AS n,
             |       floor((log2(n::DOUBLE) - sclog / n) * 10000)::BIGINT AS entropy_e4
             |FROM ent ORDER BY doc_id""".stripMargin)),

    GQuery(
      "table_stats_drift",
      (s, dir) => {
        // DISTRIBUTION DRIFT between two time slices — the data-quality
        // gate a continuously-fed pipeline runs before trusting a new
        // window of data: per event_type, compare row volume and value
        // level between the first and second half of the covered time
        // range (cut at the integer midpoint of [min ts, max ts] — a
        // deterministic, scalar-broadcast cut, no percentile needed).
        // All metrics are int64 (counts, floor-cent means, permille
        // ratios), so the oracle replays them bit-exactly. Scale: one
        // scan + one |types|-row aggregate; the min/max scalar
        // broadcast is the established 1-row crossJoin shape.
        val ev = Tables.t(s, dir, "events")
          .select(col("event_type"), expr("ts_ns div 1000").as("us"),
            col("value"))
        val bounds = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        ev.crossJoin(broadcast(bounds))
          .withColumn("in_b", col("us") >= expr("(lo + hi) div 2"))
          .groupBy("event_type")
          .agg(
            sum(when(!col("in_b"), 1L).otherwise(0L)).as("n_a"),
            sum(when(col("in_b"), 1L).otherwise(0L)).as("n_b"),
            sum(when(!col("in_b"), round(col("value") * 100).cast("long"))
              .otherwise(0L)).as("cents_a"),
            sum(when(col("in_b"), round(col("value") * 100).cast("long"))
              .otherwise(0L)).as("cents_b"))
          .select(col("event_type"), col("n_a"), col("n_b"),
            expr("n_b * 1000 div n_a").as("vol_ratio_permille"),
            expr("cents_a div n_a").as("mean_cents_a"),
            expr("cents_b div n_b").as("mean_cents_b"),
            expr("cents_b div n_b - cents_a div n_a").as("mean_shift_cents"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, epoch_us(ts::TIMESTAMP) AS us, value
             |            FROM events),
             |     b AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
             |     sliced AS (SELECT event_type, value,
             |                       us >= (lo + hi) // 2 AS in_b
             |                FROM ev, b),
             |     agg AS (SELECT event_type,
             |                    CAST(sum(CASE WHEN NOT in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             |                    CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
             |                    CAST(sum(CASE WHEN NOT in_b THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_a,
             |                    CAST(sum(CASE WHEN in_b THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_b
             |             FROM sliced GROUP BY event_type)
             |SELECT event_type, n_a, n_b,
             |       n_b * 1000 // n_a AS vol_ratio_permille,
             |       cents_a // n_a AS mean_cents_a,
             |       cents_b // n_b AS mean_cents_b,
             |       cents_b // n_b - cents_a // n_a AS mean_shift_cents
             |FROM agg ORDER BY event_type""".stripMargin)),

    GQuery(
      "events_ks_test",
      (s, dir) => {
        // TWO-SAMPLE KOLMOGOROV-SMIRNOV over event values (view vs
        // purchase): D = max_x |F1(x) - F2(x)|. Computed at
        // distinct-value granularity (per-value counts first — ties
        // must be absorbed BEFORE the sup, or mid-tie prefixes
        // overstate D), then one ordered cumulative pass. The statistic
        // is carried as the INTEGER cross-product |c1·n2 - c2·n1| —
        // exact in both engines — and only the final D divides.
        // Scale: the per-value aggregate shuffles |distinct values|
        // rows; the cumulative needs a global order over those — a
        // deliberate single-partition window over an already-reduced
        // frame (same stance as the changepoint/autocorr family); at
        // 100 TB swap the exact sup for a binned ECDF (the aggregate
        // becomes per-bin, the window stays |bins|).
        val pts = Tables.t(s, dir, "events")
          .where(col("event_type").isin("view", "purchase"))
          .groupBy("value")
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("d1"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("d2"))
        val wCum = Window.orderBy("value")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wAll = Window.orderBy("value")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        pts.select(
            sum("d1").over(wCum).as("c1"), sum("d2").over(wCum).as("c2"),
            sum("d1").over(wAll).as("n1"), sum("d2").over(wAll).as("n2"))
          .agg(first("n1").as("n1"), first("n2").as("n2"),
            max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("d_num"))
          .select(col("n1"), col("n2"), col("d_num"),
            round(col("d_num") / (col("n1") * col("n2")), 6).as("d"))
      },
      Some("""WITH pts AS (SELECT value,
             |                    CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             |                    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS d2
             |             FROM events WHERE event_type IN ('view', 'purchase')
             |             GROUP BY value),
             |     c AS (SELECT sum(d1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c1,
             |                  sum(d2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c2,
             |                  sum(d1) OVER () AS n1, sum(d2) OVER () AS n2
             |           FROM pts)
             |SELECT CAST(any_value(n1) AS BIGINT) AS n1,
             |       CAST(any_value(n2) AS BIGINT) AS n2,
             |       CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
             |       round(CAST(max(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
             |             / (any_value(n1) * any_value(n2)), 6) AS d
             |FROM c""".stripMargin)),

    GQuery(
      "events_cuped_adjust",
      (s, dir) => {
        // CUPED VARIANCE REDUCTION — the experimentation-platform
        // estimator: per-user post-period value adjusted by the
        // pre-period covariate, y' = y − θ·(x − x̄) with pooled
        // θ = cov(x,y)/var(x). Arms = user parity; pre/post = halves of
        // the event span (midpoint of [min,max] — rederivable by the
        // oracle). Shape: one per-user aggregate, a 1-row θ broadcast
        // back on, one per-arm rollup; var_pop of the adjusted metric
        // must shrink vs raw whenever pre and post correlate. All
        // ratios rounded to 4dp (central-moment merge order differs
        // across engines at ~1e-10 relative).
        val ev = Tables.t(s, dir, "events")
          .select(col("user_id"), col("value"),
            col("ts").cast("timestamp").cast("long").as("sec"))
        val mid = ev.agg(((min("sec") + max("sec")) / 2).cast("long"))
          .head().getLong(0)
        val perUser = ev.groupBy("user_id")
          .agg(sum(when(col("sec") < mid, col("value")).otherwise(0.0)).as("x"),
            sum(when(col("sec") >= mid, col("value")).otherwise(0.0)).as("y"))
        val theta = perUser.agg(
          (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("theta"),
          avg("x").as("mx"))
        perUser.crossJoin(broadcast(theta))
          .withColumn("y_adj", col("y") - col("theta") * (col("x") - col("mx")))
          .groupBy((col("user_id") % 2).as("arm"))
          .agg(count(lit(1)).as("n_users"),
            round(avg("y"), 4).as("mean_post"),
            round(avg("y_adj"), 4).as("mean_adj"),
            round(var_pop(col("y")), 4).as("var_post"),
            round(var_pop(col("y_adj")), 4).as("var_adj"))
          .orderBy("arm")
      },
      Some("""WITH ev AS (SELECT user_id, value, epoch(ts::TIMESTAMP)::BIGINT AS sec FROM events),
             |  m AS (SELECT ((min(sec) + max(sec)) // 2)::BIGINT AS mid FROM ev),
             |  pu AS (SELECT user_id,
             |                sum(CASE WHEN sec < mid THEN value ELSE 0.0 END) AS x,
             |                sum(CASE WHEN sec >= mid THEN value ELSE 0.0 END) AS y
             |         FROM ev, m GROUP BY user_id),
             |  th AS (SELECT covar_pop(x, y) / var_pop(x) AS theta, avg(x) AS mx FROM pu)
             |SELECT user_id % 2 AS arm,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(y), 4) AS mean_post,
             |       round(avg(y - theta * (x - mx)), 4) AS mean_adj,
             |       round(var_pop(y), 4) AS var_post,
             |       round(var_pop(y - theta * (x - mx)), 4) AS var_adj
             |FROM pu, th GROUP BY 1 ORDER BY arm""".stripMargin)),

    GQuery(
      "events_seasonality_strength",
      (s, dir) => {
        // SEASONALITY STRENGTH (STL-style variance decomposition on the
        // weekly cycle): 1 − var(residual)/var(total) over the daily
        // value series, residual = day value − its day-of-week mean.
        // ≈0 ⇒ the weekly pattern explains nothing; →1 ⇒ the series IS
        // its weekly cycle. Shape: one daily aggregate (corpus-sized
        // pass), a 7-row DOW model broadcast back, one variance
        // aggregate over |days| rows. Both variances are var_pop over
        // the SAME |days| rows, so the ratio is scale-free; 4 dp
        // rounding absorbs engine summation-order noise.
        val daily = Tables.t(s, dir, "events")
          .groupBy(to_date(col("ts")).as("d"))
          .agg(sum("value").as("v"))
          .withColumn("dow", dayofweek(col("d")))
        val model = daily.groupBy("dow").agg(avg("v").as("dow_mean"))
        daily.join(broadcast(model), "dow")
          .agg(
            count(lit(1)).as("n_days"),
            round(lit(1.0) - var_pop(col("v") - col("dow_mean")) / var_pop(col("v")), 4)
              .as("seasonality_strength"))
      },
      Some("""WITH daily AS (SELECT ts::DATE AS d, sum(value) AS v
             |               FROM events GROUP BY 1),
             |  dw AS (SELECT d, v, dayofweek(d) + 1 AS dow FROM daily),
             |  m AS (SELECT dow, avg(v) AS dow_mean FROM dw GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_days,
             |       round(1.0 - var_pop(v - dow_mean) / var_pop(v), 4)
             |         AS seasonality_strength
             |FROM dw JOIN m USING (dow)""".stripMargin)),

    GQuery(
      "stats_hill_tail_index",
      (s, dir) => {
        // HILL TAIL-INDEX estimator — the heavy-tail diagnostic that
        // decides whether a value column even HAS a finite variance
        // (α ≤ 2 ⇒ it doesn't): α̂ = 1 / (mean of ln(x_(i)/x_(k+1))
        // over the top-k order statistics). Shape at scale: a top-(k+1)
        // TakeOrdered (no global sort — k rows per partition survive
        // the map side) and one k-row aggregate. Reported at k ∈
        // {50, 100} because the Hill plot's stability ACROSS k is the
        // actual diagnostic; 4 dp rounding absorbs cross-engine
        // log-summation order noise.
        val x = Tables.t(s, dir, "orders")
          .select(col("o_totalprice").as("v")).where(col("v") > 0)
        import org.apache.spark.sql.expressions.Window
        // ties in v are harmless: the estimate depends only on the top-k
        // VALUE multiset, which any tie order preserves
        val ranked = x.withColumn("rn",
          row_number().over(Window.orderBy(desc("v"))))
        def hill(k: Int) = {
          val top = ranked.where(col("rn") <= k + 1).localCheckpoint()
          val xk1 = top.where(col("rn") === k + 1).select("v").head().getDouble(0)
          top.where(col("rn") <= k)
            .agg((lit(1.0) / avg(log(col("v") / lit(xk1)))).as("alpha"))
            .select(lit(k.toLong).as("k"), round(lit(xk1), 2).as("x_k1"),
              round(col("alpha"), 4).as("alpha_hat"))
        }
        hill(50).unionByName(hill(100)).orderBy("k")
      },
      Some("""WITH r AS (SELECT o_totalprice AS v,
             |                  row_number() OVER (ORDER BY o_totalprice DESC) AS rn
             |           FROM orders WHERE o_totalprice > 0),
             |  h AS (SELECT 50 AS k UNION ALL SELECT 100),
             |  xk AS (SELECT k, (SELECT v FROM r WHERE rn = k + 1) AS x_k1 FROM h)
             |SELECT CAST(k AS BIGINT) AS k, round(x_k1, 2) AS x_k1,
             |       round(1.0 / (SELECT avg(ln(v / x_k1)) FROM r WHERE rn <= k), 4)
             |         AS alpha_hat
             |FROM xk ORDER BY k""".stripMargin)),

    GQuery(
      "events_diff_in_diff",
      (s, dir) => {
        // DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator
        // next to CUPED: treatment effect = (post−pre) in the treated
        // arm MINUS (post−pre) in control, cancelling any shared time
        // trend. Arms = user parity, pre/post = halves of the event
        // span (same rederivable conventions as events_cuped_adjust).
        // Shape: ONE conditional aggregate per arm over the event
        // stream + a 2-row combine for the interaction term — nothing
        // row-scale shuffles twice. All means rounded 4dp; `did` is
        // computed from the unrounded cell means and carried on both
        // rows so the estimate itself is hash-gated.
        val ev = Tables.t(s, dir, "events")
          .select((col("user_id") % 2).as("arm"), col("value"),
            col("ts").cast("timestamp").cast("long").as("sec"))
        val mid = ev.agg(((min("sec") + max("sec")) / 2).cast("long"))
          .head().getLong(0)
        val arms = ev.groupBy("arm")
          .agg(
            count(when(col("sec") < mid, 1)).as("n_pre"),
            count(when(col("sec") >= mid, 1)).as("n_post"),
            avg(when(col("sec") < mid, col("value"))).as("pre_raw"),
            avg(when(col("sec") >= mid, col("value"))).as("post_raw"))
          .withColumn("delta_raw", col("post_raw") - col("pre_raw"))
        val did = arms.agg(sum(when(col("arm") === 1, col("delta_raw"))
            .otherwise(-col("delta_raw"))).as("did_raw"))
        arms.crossJoin(broadcast(did))
          .select(col("arm"), col("n_pre"), col("n_post"),
            round(col("pre_raw"), 4).as("pre_mean"),
            round(col("post_raw"), 4).as("post_mean"),
            round(col("delta_raw"), 4).as("delta"),
            round(col("did_raw"), 4).as("did"))
          .orderBy("arm")
      },
      Some("""WITH ev AS (SELECT user_id % 2 AS arm, value,
             |                   epoch(ts::TIMESTAMP)::BIGINT AS sec FROM events),
             |  m AS (SELECT ((min(sec) + max(sec)) // 2)::BIGINT AS mid FROM ev),
             |  arms AS (SELECT arm,
             |                  CAST(count(CASE WHEN sec < mid THEN 1 END) AS BIGINT) AS n_pre,
             |                  CAST(count(CASE WHEN sec >= mid THEN 1 END) AS BIGINT) AS n_post,
             |                  avg(CASE WHEN sec < mid THEN value END) AS pre_raw,
             |                  avg(CASE WHEN sec >= mid THEN value END) AS post_raw
             |           FROM ev, m GROUP BY arm),
             |  d AS (SELECT sum(CASE WHEN arm = 1 THEN post_raw - pre_raw
             |                        ELSE -(post_raw - pre_raw) END) AS did_raw
             |        FROM arms)
             |SELECT arm, n_pre, n_post,
             |       round(pre_raw, 4) AS pre_mean,
             |       round(post_raw, 4) AS post_mean,
             |       round(post_raw - pre_raw, 4) AS delta,
             |       round(did_raw, 4) AS did
             |FROM arms, d ORDER BY arm""".stripMargin))
  )
}
