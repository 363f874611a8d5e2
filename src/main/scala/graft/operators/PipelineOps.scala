package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 pipeline surface: time-series downsampling (OHLC bars),
  * exponential smoothing (truncated EWMA), columnar vector-column
  * statistics, BM25 relevance ranking, model-free quality scoring, and
  * at-least-once replay dedup.
  *
  * Scale stances:
  *  - OHLC bars are one partial+final hash aggregate keyed by
  *    (event_type, hour) — `min_by`/`max_by` carry a single (value,
  *    key) pair per group state, so only tiny states shuffle; the raw
  *    stream never re-sorts. The mean rides as exact integer cents so
  *    no cross-engine FP summation noise exists at any scale.
  *  - EWMA is one window pass (same single shuffle as any per-series
  *    sort); the 8-tap truncation bounds both state and the collected
  *    frame regardless of series length, and α=1/2 makes every weight a
  *    power of two — the fold is bit-exact in both engines.
  *  - Per-dimension embedding stats explode 64 floats per row but
  *    aggregate map-side into 64 partial states before any exchange —
  *    the shuffle carries (#partitions × 64) rows no matter how many
  *    vectors scanned.
  *  - BM25: document frequencies for the (tiny, fixed) query-term set
  *    and the global length stats are two scalar-sized aggregates
  *    broadcast back onto the per-(doc, term) tf stream — the corpus
  *    is scanned once and never shuffled except for the final top-k.
  *  - Quality scoring is pure map-side per-row arithmetic over the
  *    token array (a linear model with broadcast-able weights); the
  *    only shuffle is the presentation sort.
  *  - Replay dedup is the batch twin of
  *    `StreamingIngest.dedupWithinWatermark` (same keys, same
  *    first-wins answer): one hash aggregate on the dedup key.
  *
  * Reference anchors: the reference's reducer dedups replayed Kafka
  * records by key in an in-heap HashMap (`/root/reference/src/main/java/
  * hadoop/kafka/newconsumer/HadoopKafkaConsumer.java:55`) — `ingest_dedup_replay`
  * is that exact at-least-once contract as a distributed aggregate.
  */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.t(s, dir, "documents")

  private def cents(c: Column): Column = round(c * 100).cast("long")

  val all: Seq[GQuery] = Seq(

    GQuery(
      "events_ohlc",
      (s, dir) => {
        // Time-series DOWNSAMPLING to hourly OHLC bars per event_type:
        // open/close = value at the lowest/highest sequence id in the
        // bar (min_by/max_by — one (value, id) pair per group state),
        // high/low exact extremes, mean as exact integer cents
        // (floor(Σcents / n) is one IEEE divide over integers — bit-
        // identical cross-engine, immune to summation order). One
        // partial+final hash aggregate; the event stream itself never
        // shuffles, only ~(types × hours) group states do.
        Tables.t(s, dir, "events")
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
          .agg(
            min_by(col("value"), col("event_id")).as("open"),
            max(col("value")).as("high"),
            min(col("value")).as("low"),
            max_by(col("value"), col("event_id")).as("close"),
            floor(sum(cents(col("value"))).cast("double") / count(lit(1)))
              .cast("long").as("mean_c"),
            count(lit(1)).as("n"))
          .orderBy("event_type", "hour")
      },
      Some("""SELECT event_type, date_trunc('hour', ts::TIMESTAMP) AS hour,
             |       arg_min(value, event_id) AS open, max(value) AS high,
             |       min(value) AS low, arg_max(value, event_id) AS close,
             |       floor(sum(CAST(round(value * 100) AS BIGINT))::DOUBLE
             |             / count(*))::BIGINT AS mean_c,
             |       count(*)::BIGINT AS n
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    GQuery(
      "events_ewma",
      (s, dir) => {
        // Truncated EWMA (8 taps, α = 1/2) per event_type in sequence
        // order: the smoothing primitive behind anomaly baselines and
        // rate estimators. The left fold acc·½ + x over the trailing
        // frame gives newest-heavy weights ½^0..½^7 — all powers of
        // two, so numerator and weight-sum folds are EXACT IEEE chains
        // that match DuckDB's seed-first list_reduce step for step
        // (fold(0)·½ + x₁ ≡ seed x₁). One window pass = one shuffle on
        // event_type; the 8-row frame bounds memory per series at any
        // scale.
        val w = Window.partitionBy("event_type").orderBy("event_id")
          .rowsBetween(-7, 0)
        Tables.t(s, dir, "events")
          .withColumn("arr", collect_list(col("value")).over(w))
          .select(col("event_type"), col("event_id"),
            floor(
              expr("aggregate(arr, 0D, (acc, x) -> acc * 0.5D + x)") /
              expr("aggregate(arr, 0D, (acc, x) -> acc * 0.5D + 1.0D)") * 100)
              .cast("long").as("ewma_c"))
          .orderBy("event_id")
      },
      Some("""WITH w AS (
             |  SELECT event_type, event_id,
             |         list(value) OVER (PARTITION BY event_type ORDER BY event_id
             |                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS arr
             |  FROM events)
             |SELECT event_type, event_id,
             |       floor(list_reduce(arr, (acc, x) -> acc * 0.5 + x)
             |             / list_reduce(list_transform(arr, x -> 1.0::DOUBLE),
             |                           (acc, x) -> acc * 0.5 + x) * 100)::BIGINT AS ewma_c
             |FROM w ORDER BY event_id""".stripMargin)),

    GQuery(
      "emb_dim_stats",
      (s, dir) => {
        // Columnar statistics over the vector column: per-dimension
        // mean / stddev / min / max across the corpus — the profiling
        // pass before whitening or quantizing embeddings. posexplode
        // fans each row into 64 (dim, value) pairs, but partial hash
        // aggregation collapses them map-side to 64 states per
        // partition before the exchange — the shuffle is O(partitions ×
        // dims), independent of corpus size.
        Tables.t(s, dir, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("dim", "v")))
          .select(col("dim").cast("long").as("dim"), col("v").cast("double").as("v"))
          .groupBy("dim")
          .agg(
            round(avg(col("v")), 4).as("mean_v"),
            round(stddev(col("v")), 4).as("sd_v"),
            min(col("v")).as("min_v"),
            max(col("v")).as("max_v"),
            count(lit(1)).as("n"))
          .orderBy("dim")
      },
      Some("""WITH x AS (SELECT unnest(range(0, len(embedding)))::BIGINT AS dim,
             |                  unnest(embedding::DOUBLE[]) AS v
             |           FROM embeddings)
             |SELECT dim, round(avg(v), 4) AS mean_v, round(stddev(v), 4) AS sd_v,
             |       min(v) AS min_v, max(v) AS max_v, count(*)::BIGINT AS n
             |FROM x GROUP BY dim ORDER BY dim""".stripMargin)),

    GQuery(
      "text_bm25",
      (s, dir) => {
        // BM25 (k1 = 1.2, b = 0.75) relevance ranking for a fixed
        // query-term set — the IR scorer behind retrieval-based data
        // curation. Three corpus-wide inputs: per-(doc, term) tf (one
        // scan + one small aggregate), per-term df (3 rows), and the
        // global (N, avgdl) scalar — the last two broadcast back onto
        // the tf stream, so the corpus shuffles only by doc_id for the
        // per-doc score sum and the final top-50. Ranking uses the
        // FLOOR-SCALED score so cross-engine last-ulp noise in ln()
        // cannot reorder ties: ties break by doc_id in both engines.
        val terms = Seq("spark", "query", "vector")
        val tok = docs(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .select(col("doc_id"), col("tk"), size(col("tk")).cast("double").as("dl"))
        val stats = tok.agg(count(lit(1)).cast("double").as("n_docs"),
          avg(col("dl")).as("avgdl"))
        val tf = tok
          .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
          .where(col("term").isin(terms: _*))
          .groupBy("doc_id", "dl", "term")
          .agg(count(lit(1)).cast("double").as("tf"))
        // df via a window over tf — ONE corpus scan, no persist (a
        // session-lifetime cache leak across registry sweeps; a
        // separate df aggregate would also re-tokenize, since column
        // pruning gives the two subtrees different partial aggregates
        // and exchange reuse can't fire). The per-term exchange moves
        // ≤ docs × |query terms| rows.
        val scored = tf
          .withColumn("df",
            count(lit(1)).over(Window.partitionBy("term")).cast("double"))
          .crossJoin(broadcast(stats))
          .withColumn("idf", log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
          .withColumn("contrib",
            col("idf") * col("tf") * 2.2 /
              (col("tf") + (lit(0.25) + col("dl") / col("avgdl") * 0.75) * 1.2))
          .groupBy("doc_id")
          .agg(floor(sum(col("contrib")) * 10000).cast("long").as("score_e4"),
            count(lit(1)).as("n_terms"))
        // Top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
        // global sort), then rank the 50 survivors; the unpartitioned
        // row_number window only ever sees k rows.
        scored
          .orderBy(desc("score_e4"), asc("doc_id")).limit(50)
          .withColumn("rank", row_number().over(
            Window.orderBy(desc("score_e4"), asc("doc_id"))))
          .select(col("rank"), col("doc_id"), col("score_e4"), col("n_terms"))
          .orderBy("rank")
      },
      Some("""WITH tok AS (SELECT doc_id,
             |                    list_filter(string_split(text, ' '), x -> x <> '') AS tk
             |             FROM documents),
             |     t AS (SELECT doc_id, len(tk)::DOUBLE AS dl, tk FROM tok),
             |     stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM t),
             |     tf AS (SELECT doc_id, dl, term, count(*)::DOUBLE AS tf
             |            FROM (SELECT doc_id, dl, unnest(tk) AS term FROM t)
             |            WHERE term IN ('spark', 'query', 'vector')
             |            GROUP BY doc_id, dl, term),
             |     df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
             |     scored AS (
             |       SELECT doc_id,
             |              floor(sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |                        * tf * 2.2
             |                        / (tf + (0.25 + dl / avgdl * 0.75) * 1.2))
             |                    * 10000)::BIGINT AS score_e4,
             |              count(*)::BIGINT AS n_terms
             |       FROM tf JOIN df USING (term) CROSS JOIN stats
             |       GROUP BY doc_id)
             |SELECT row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS rank,
             |       doc_id, score_e4, n_terms
             |FROM scored
             |QUALIFY rank <= 50 ORDER BY rank""".stripMargin)),

    GQuery(
      "docs_quality_score",
      (s, dir) => {
        // Linear quality-model inference (fasttext-classifier shape,
        // deterministic handcrafted weights): per-doc features — token
        // count, mean token length, stopword ratio, unique-token ratio
        // — dotted with a broadcast-able weight vector; keep = score ≥
        // 0 decided on the floor-scaled integer so the cut is identical
        // in both engines. Pure map-side per-row arithmetic: at 100 TB
        // this is a scan-speed pass, no shuffle but the final sort.
        val d = docs(s, dir)
          .select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
          .withColumn("n_tok", size(col("tk")).cast("double"))
          .where(col("n_tok") > 0)
          .withColumn("mean_len",
            expr("aggregate(transform(tk, x -> length(x)), 0, (a, b) -> a + b)")
              .cast("double") / col("n_tok"))
          .withColumn("stop_ratio",
            size(expr("filter(tk, x -> x = 'a' OR x = 'the')")).cast("double") / col("n_tok"))
          .withColumn("uniq_ratio",
            size(array_distinct(col("tk"))).cast("double") / col("n_tok"))
        d.select(col("doc_id"),
            col("n_tok").cast("long").as("n_tok"),
            floor((col("uniq_ratio") * 2.0 - col("stop_ratio") * 1.5
              + col("mean_len") * 0.05 + col("n_tok") * 0.002 - 1.0) * 10000)
              .cast("long").as("score_e4"))
          .withColumn("keep", col("score_e4") >= 0)
          .orderBy("doc_id")
      },
      Some("""WITH f AS (
             |  SELECT doc_id,
             |         list_filter(string_split(text, ' '), x -> x <> '') AS tk
             |  FROM documents),
             |  feats AS (
             |  SELECT doc_id, len(tk)::DOUBLE AS n_tok,
             |         list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk) AS mean_len,
             |         len(list_filter(tk, x -> x = 'a' OR x = 'the'))::DOUBLE / len(tk) AS stop_ratio,
             |         len(list_distinct(tk))::DOUBLE / len(tk) AS uniq_ratio
             |  FROM f WHERE len(tk) > 0)
             |SELECT doc_id, n_tok::BIGINT AS n_tok,
             |       floor((uniq_ratio * 2.0 - stop_ratio * 1.5 + mean_len * 0.05
             |              + n_tok * 0.002 - 1.0) * 10000)::BIGINT AS score_e4,
             |       floor((uniq_ratio * 2.0 - stop_ratio * 1.5 + mean_len * 0.05
             |              + n_tok * 0.002 - 1.0) * 10000)::BIGINT >= 0 AS keep
             |FROM feats ORDER BY doc_id""".stripMargin)),

    GQuery(
      "ingest_dedup_replay",
      (s, dir) => {
        // At-least-once REPLAY dedup — the batch twin of
        // `StreamingIngest.dedupWithinWatermark` and the distributed
        // form of the reference reducer's in-heap HashMap dedup
        // (HadoopKafkaConsumer.java:55): a third of the stream arrives
        // twice (simulated redelivery), dedup by event_id keeps exactly
        // one copy. dropDuplicates is a hash aggregate on the key — at
        // 100 TB it shuffles each record once by event_id, no sort, and
        // AQE handles any hot-key skew. The duplicates are bit-
        // identical so first-wins vs any-wins cannot diverge.
        val ev = Tables.t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
        ev.unionAll(ev.where(col("event_id") % 3 === 0))
          .dropDuplicates("event_id")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value
             |FROM events ORDER BY event_id""".stripMargin)),

    GQuery(
      "events_debounce",
      (s, dir) => {
        // DE-BOUNCE: collapse bursts — drop an event when the SAME
        // (user, type) fired within the previous 60 s (sensor chatter /
        // double-click suppression). One lag window per series = one
        // shuffle; gaps compare in exact integer microseconds so the
        // threshold cut is identical cross-engine. Unlike rate limiting
        // (fixed buckets), the debounce window slides with each KEPT
        // burst-leader's own timing chain — classic stream-compaction
        // semantics done as one window pass.
        val w = Window.partitionBy("user_id", "event_type").orderBy("event_id")
        Tables.t(s, dir, "events")
          // integer `div`, NOT `/`: ns-since-epoch (~1.7e18) overflows
          // double precision, and / on longs is IEEE double division
          .withColumn("us", expr("ts_ns div 1000"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .where(col("gap_us").isNull || col("gap_us") > 60000000L)
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("gap_us").cast("long").as("gap_us"))
          .orderBy("event_id")
      },
      Some("""WITH g AS (
             |  SELECT event_id, user_id, event_type,
             |         epoch_us(ts::TIMESTAMP)
             |           - lag(epoch_us(ts::TIMESTAMP)) OVER
             |               (PARTITION BY user_id, event_type ORDER BY event_id) AS gap_us
             |  FROM events)
             |SELECT event_id, user_id, event_type, gap_us::BIGINT AS gap_us
             |FROM g WHERE gap_us IS NULL OR gap_us > 60000000
             |ORDER BY event_id""".stripMargin)),

    GQuery(
      "events_cohort_matrix",
      (s, dir) => {
        // Full COHORT RETENTION MATRIX: users grouped by first-activity
        // ISO week × week offset of each later active week → distinct
        // users. Generalizes events_retention's single d1 column to the
        // whole triangle. Two keyed aggregates (first week per user,
        // then matrix cell counts) + one join of |users|-sized sides —
        // event rows collapse to (user, week) pairs before any join.
        val e = Tables.t(s, dir, "events")
          .select(col("user_id"),
            to_date(date_trunc("week", col("ts"))).as("wk"))
          .distinct()
        val firstWk = e.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        firstWk.join(e, "user_id")
          .groupBy(col("cohort_wk"),
            (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("wk_offset"))
          .agg(countDistinct("user_id").as("n_users"))
          .select(date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_wk"),
            col("wk_offset"), col("n_users"))
          .orderBy("cohort_wk", "wk_offset")
      },
      Some("""WITH e AS (SELECT DISTINCT user_id,
             |                  date_trunc('week', ts::TIMESTAMP)::DATE AS wk
             |           FROM events),
             |     fw AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id)
             |SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_wk,
             |       ((wk - cohort_wk) / 7)::BIGINT AS wk_offset,
             |       count(DISTINCT fw.user_id)::BIGINT AS n_users
             |FROM fw JOIN e USING (user_id)
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    GQuery(
      "agg_share_of_total",
      (s, dir) => {
        // CONTRIBUTION analysis: each nation's share of global revenue.
        // The grand total comes from a broadcast cross join of a 1-row
        // aggregate — NOT a `sum() over ()` window, which would drag
        // every group through a single partition at scale. Revenue rides
        // as exact integer cents; the share is one IEEE divide of two
        // longs, floor-scaled — bit-identical cross-engine.
        val rev = Tables.t(s, dir, "orders")
          .join(Tables.t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
        val total = rev.agg(sum("rev_c").as("total_c"))
        rev.crossJoin(broadcast(total))
          .select(col("n_name"), col("rev_c"),
            floor(col("rev_c").cast("double") / col("total_c") * 1000000)
              .cast("long").as("share_e6"))
          .orderBy("n_name")
      },
      Some("""WITH rev AS (
             |  SELECT n_name, sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |              JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY n_name),
             |     tot AS (SELECT sum(rev_c) AS total_c FROM rev)
             |SELECT n_name, rev_c::BIGINT AS rev_c,
             |       floor(rev_c::DOUBLE / total_c * 1000000)::BIGINT AS share_e6
             |FROM rev CROSS JOIN tot ORDER BY n_name""".stripMargin)),

    GQuery(
      "asof_join_tolerance",
      (s, dir) => {
        // As-of join WITH TOLERANCE: the backward match is discarded
        // when staler than 30 days (market-data semantics: a quote too
        // old is no quote). Same single-shuffle union + carry-forward
        // plan as asof_join — the tolerance is a post-hoc null-out on
        // the carried right time, costing one projection, not a second
        // join or range explosion.
        val ev = Tables.t(s, dir, "events").select("event_id", "user_id", "ts")
        val ord = Tables.t(s, dir, "orders")
          .select("o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
        graft.plans.AsOfJoin.asof(ev, ord,
            leftKey = "user_id", rightKey = "o_custkey",
            leftTime = "ts", rightTime = "o_orderdate",
            rightPayload = Seq("o_orderkey", "o_totalprice", "o_orderdate"),
            rightTiebreak = Seq("o_orderkey"))
          .withColumn("gap_d",
            datediff(to_date(col("ts")), col("o_orderdate")).cast("long"))
          .select(col("event_id"), col("user_id"),
            when(col("gap_d") <= 30, col("o_orderkey")).as("o_orderkey_tol"),
            when(col("gap_d") <= 30, round(col("o_totalprice"), 2)).as("o_totalprice_tol"),
            when(col("gap_d") <= 30, col("gap_d")).as("gap_d"))
          .orderBy("event_id")
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderdate,
             |                  arg_max(o_orderkey, o_orderkey) AS o_orderkey,
             |                  arg_max(o_totalprice, o_orderkey) AS o_totalprice
             |           FROM orders GROUP BY o_custkey, o_orderdate),
             |     m AS (SELECT event_id, user_id, o_orderkey, o_totalprice,
             |                  (ts::TIMESTAMP)::DATE - o_orderdate::DATE AS gap_d
             |           FROM events ASOF LEFT JOIN o
             |             ON user_id = o_custkey AND ts::TIMESTAMP >= o_orderdate)
             |SELECT event_id, user_id,
             |       CASE WHEN gap_d <= 30 THEN o_orderkey END AS o_orderkey_tol,
             |       CASE WHEN gap_d <= 30 THEN round(o_totalprice, 2) END AS o_totalprice_tol,
             |       CASE WHEN gap_d <= 30 THEN gap_d::BIGINT END AS gap_d
             |FROM m ORDER BY event_id""".stripMargin)),

    GQuery(
      "ingest_csv_parse",
      (s, dir) => {
        // CSV round trip under a declared schema (source-format parity
        // with ingest_json_parse / ingest_xml_parse): serialize each
        // event to a CSV line (to_csv — quoting/escaping on), parse it
        // back with from_csv, emit the parsed columns. The oracle is the
        // identity selection — any quoting, escaping, or type-cast loss
        // breaks the hash. Pure per-row projection: map-only at scale.
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
        Tables.t(s, dir, "events")
          .select(to_csv(struct(col("event_id"), col("user_id"),
            col("event_type"), col("value"), col("props"))).as("line"))
          .select(from_csv(col("line"), schema, Map.empty[String, String]).as("r"))
          .select(col("r.event_id").as("event_id"), col("r.user_id").as("user_id"),
            col("r.event_type").as("event_type"), col("r.value").as("value"),
            col("r.props").as("props"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, event_type, value, props
             |FROM events ORDER BY event_id""".stripMargin)),

    GQuery(
      "events_winsorize",
      (s, dir) => {
        // WINSORIZATION (robust preprocessing): clip each event_type's
        // values at its empirical p05/p95 — by RANK, not interpolation:
        // the threshold is the value AT position ceil(p·n) of the sorted
        // multiset, which is engine-independent integer arithmetic
        // (interpolated percentiles differ cross-engine in the last
        // ulp). One row_number window per type (the same shuffle any
        // per-type sort pays), thresholds reduce to |types| rows and
        // broadcast back onto the stream for the map-side clip.
        val e = Tables.t(s, dir, "events")
          .select(col("event_type"), cents(col("value")).as("v_c"))
        val w = Window.partitionBy("event_type").orderBy("v_c")
        val ranked = e
          .withColumn("rk", row_number().over(w))
          .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
        val thresholds = ranked
          .withColumn("lo_k", greatest(lit(1L), ceil(col("n") * 0.05)))
          .withColumn("hi_k", ceil(col("n") * 0.95))
          .groupBy("event_type")
          .agg(min(when(col("rk") === col("lo_k"), col("v_c"))).as("p05_c"),
            min(when(col("rk") === col("hi_k"), col("v_c"))).as("p95_c"))
        e.join(broadcast(thresholds), "event_type")
          .groupBy("event_type")
          .agg(
            first(col("p05_c")).as("p05_c"),
            first(col("p95_c")).as("p95_c"),
            sum(least(greatest(col("v_c"), col("p05_c")), col("p95_c")))
              .as("clipped_sum_c"),
            sum(when(col("v_c") < col("p05_c"), 1L).otherwise(0L)).as("n_lo"),
            sum(when(col("v_c") > col("p95_c"), 1L).otherwise(0L)).as("n_hi"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type,
             |                  CAST(round(value * 100) AS BIGINT) AS v_c
             |           FROM events),
             |     r AS (SELECT event_type, v_c,
             |                  row_number() OVER (PARTITION BY event_type ORDER BY v_c) AS rk,
             |                  count(*) OVER (PARTITION BY event_type) AS n
             |           FROM e),
             |     th AS (SELECT event_type,
             |                   min(CASE WHEN rk = greatest(1, ceil(n * 0.05)) THEN v_c END) AS p05_c,
             |                   min(CASE WHEN rk = ceil(n * 0.95) THEN v_c END) AS p95_c
             |            FROM r GROUP BY event_type)
             |SELECT event_type, any_value(p05_c)::BIGINT AS p05_c,
             |       any_value(p95_c)::BIGINT AS p95_c,
             |       sum(least(greatest(v_c, p05_c), p95_c))::BIGINT AS clipped_sum_c,
             |       sum(CASE WHEN v_c < p05_c THEN 1 ELSE 0 END)::BIGINT AS n_lo,
             |       sum(CASE WHEN v_c > p95_c THEN 1 ELSE 0 END)::BIGINT AS n_hi
             |FROM e JOIN th USING (event_type)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    GQuery(
      "events_wow_growth",
      (s, dir) => {
        // Period-over-period: weekly revenue and its week-over-week
        // growth ratio. Events collapse to |weeks| rows in one keyed
        // aggregate BEFORE the lag window — the unpartitioned window is
        // fine because it only ever sees the aggregate, never the
        // stream. Revenue is exact cents; growth is one IEEE divide of
        // two longs, floor-scaled.
        val weekly = Tables.t(s, dir, "events")
          .groupBy(to_date(date_trunc("week", col("ts"))).as("wk"))
          .agg(sum(cents(col("value"))).as("rev_c"))
        weekly
          .withColumn("prev_c", lag("rev_c", 1).over(Window.orderBy("wk")))
          .select(date_format(col("wk"), "yyyy-MM-dd").as("wk"), col("rev_c"),
            floor(col("rev_c").cast("double") / col("prev_c") * 10000)
              .cast("long").as("growth_e4"))
          .orderBy("wk")
      },
      Some("""WITH weekly AS (
             |  SELECT date_trunc('week', ts::TIMESTAMP)::DATE AS wk,
             |         sum(CAST(round(value * 100) AS BIGINT)) AS rev_c
             |  FROM events GROUP BY 1)
             |SELECT strftime(wk, '%Y-%m-%d') AS wk, rev_c::BIGINT AS rev_c,
             |       floor(rev_c::DOUBLE / lag(rev_c) OVER (ORDER BY wk)
             |             * 10000)::BIGINT AS growth_e4
             |FROM weekly ORDER BY wk""".stripMargin)),

    GQuery(
      "text_normalize_dedup",
      (s, dir) => {
        // NORMALIZE-then-dedup (the "fuzzy-exact" stage of corpus
        // pipelines): case-fold, strip non-alphanumerics, collapse
        // whitespace, then count collisions of the normalized form.
        // Exercised on a constructed noisy field (type + JSON props —
        // braces, quotes, colons) so the normalization actually has
        // work to do. Map-side projection + one hash aggregate; at
        // 100 TB the normalized key shuffles ~once per distinct form
        // thanks to partial aggregation.
        Tables.t(s, dir, "events")
          .select(trim(regexp_replace(regexp_replace(
            lower(concat(col("event_type"), lit(" | "), col("props"))),
            "[^a-z0-9 ]", ""), " +", " ")).as("norm"))
          .groupBy("norm")
          .agg(count(lit(1)).as("n"))
          .orderBy("norm")
      },
      Some("""SELECT trim(regexp_replace(regexp_replace(
             |         lower(event_type || ' | ' || props),
             |         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm,
             |       count(*)::BIGINT AS n
             |FROM events GROUP BY norm ORDER BY norm""".stripMargin)))
}
