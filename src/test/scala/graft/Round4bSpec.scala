package graft

import graft.operators.PipelineOps
import graft.streaming.StreamingIngest
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Round-4 second wave: OHLC bars, truncated EWMA, embedding dimension
  * stats, BM25 ranking, quality scoring, replay dedup — invariants beyond
  * the DuckDB hash compare, plus the batch ≡ streaming differential for
  * the replay-dedup contract.
  */
class Round4bSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def q(name: String) =
    PipelineOps.all.find(_.name == name).get.run(spark, sf)

  test("ohlc bars: extremes bound open/close/mean, trade counts conserve") {
    val out = q("events_ohlc").cache()
    assert(out.count() > 0)
    assert(out.where(col("high") < col("low")).count() == 0)
    assert(out.where(col("open") > col("high") || col("open") < col("low"))
      .count() == 0)
    assert(out.where(col("close") > col("high") || col("close") < col("low"))
      .count() == 0)
    // mean (integer cents, floored) sits within the bar's range
    assert(out.where(col("mean_c") > ceil(col("high") * 100) ||
      col("mean_c") < floor(col("low") * 100) - 1).count() == 0)
    // every event lands in exactly one bar
    val total = Tables.t(spark, sf, "events").count()
    assert(out.agg(sum("n")).head().getLong(0) == total)
  }

  test("ewma: bounded by running extremes, seeds at first value") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id").rowsBetween(-7, 0)
    val ev = Tables.t(spark, sf, "events")
      .withColumn("lo", min("value").over(w))
      .withColumn("hi", max("value").over(w))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("event_id")))
    val joined = q("events_ewma").join(ev, Seq("event_type", "event_id"))
    // a convex combination of the frame can't leave the frame's range
    assert(joined.where(col("ewma_c") > ceil(col("hi") * 100) ||
      col("ewma_c") < floor(col("lo") * 100) - 1).count() == 0)
    // first row of each series: ewma == the value itself
    assert(joined.where(col("rn") === 1 &&
      col("ewma_c") =!= floor(col("value") * 100).cast("long")).count() == 0)
  }

  test("embedding dim stats: 64 dims, sd nonnegative, mean within extremes") {
    val out = q("emb_dim_stats").cache()
    assert(out.count() == 64)
    assert(out.where(col("sd_v") < 0).count() == 0)
    assert(out.where(col("mean_v") > col("max_v") || col("mean_v") < col("min_v"))
      .count() == 0)
    assert(out.select(countDistinct("n")).head().getLong(0) == 1)
  }

  test("bm25: dense ranks, non-increasing scores, hits contain a query term") {
    val out = q("text_bm25").cache()
    assert(out.count() == 50)
    assert(out.agg(min("rank"), max("rank"), countDistinct("rank")).head()
      .toSeq == Seq(1, 50, 50L))
    val pairs = out.orderBy("rank")
      .select("score_e4").as[Long].collect().toSeq
    assert(pairs == pairs.sorted.reverse, "scores non-increasing in rank")
    // every ranked doc really contains at least one query term
    val hits = out.join(Tables.t(spark, sf, "documents"), "doc_id")
      .where(!col("text").rlike("\\b(spark|query|vector)\\b"))
    assert(hits.count() == 0)
  }

  test("quality score: keep decision is exactly score_e4 >= 0") {
    val out = q("docs_quality_score").cache()
    assert(out.count() > 0)
    assert(out.where(col("keep") =!= (col("score_e4") >= 0)).count() == 0)
    // both classes present at this sf (weights were chosen to split)
    assert(out.select(countDistinct("keep")).head().getLong(0) == 2)
  }

  test("replay dedup: output identical to the pristine event stream") {
    val out = q("ingest_dedup_replay")
    val ev = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
    assert(out.except(ev).count() == 0)
    assert(ev.except(out).count() == 0)
  }

  test("debounce: burst leaders survive, every kept gap exceeds the window") {
    val out = q("events_debounce").cache()
    val total = Tables.t(spark, sf, "events").count()
    assert(out.count() > 0 && out.count() <= total)
    assert(out.where(col("gap_us").isNotNull && col("gap_us") <= 60000000L)
      .count() == 0)
    // first event of every (user, type) series is always kept
    val firsts = Tables.t(spark, sf, "events")
      .groupBy("user_id", "event_type").agg(min("event_id").as("event_id"))
    assert(firsts.join(out, Seq("user_id", "event_type", "event_id"), "left_anti")
      .count() == 0)
  }

  test("cohort matrix: offset-0 diagonal is the cohort size ceiling") {
    val out = q("events_cohort_matrix").cache()
    assert(out.count() > 0)
    assert(out.where(col("wk_offset") < 0).count() == 0)
    val sizes = out.where(col("wk_offset") === 0)
      .select(col("cohort_wk"), col("n_users").as("cohort_size"))
    // every cohort appears at offset 0, and no later cell exceeds it
    assert(out.join(sizes, "cohort_wk").where(col("n_users") > col("cohort_size"))
      .count() == 0)
    assert(out.select("cohort_wk").distinct().count() == sizes.count())
    // offset-0 sizes sum to the total user population
    val users = Tables.t(spark, sf, "events").select("user_id").distinct().count()
    assert(sizes.agg(sum("cohort_size")).head().getLong(0) == users)
  }

  test("share of total: shares sum to one within floor loss") {
    val out = q("agg_share_of_total").cache()
    val n = out.count()
    assert(n > 0)
    assert(out.where(col("rev_c") <= 0).count() == 0)
    val s = out.agg(sum("share_e6")).head().getLong(0)
    assert(s <= 1000000L && s >= 1000000L - n, s"share sum $s")
  }

  test("asof tolerance: stale matches nulled, fresh gaps within bound") {
    val out = q("asof_join_tolerance").cache()
    assert(out.count() == Tables.t(spark, sf, "events").count())
    assert(out.where(col("o_orderkey_tol").isNull =!= col("gap_d").isNull)
      .count() == 0)
    assert(out.where(col("gap_d") < 0 || col("gap_d") > 30).count() == 0)
    // where a fresh match exists it agrees with the untoleranced as-of
    val base = operators.Extras.all.find(_.name == "asof_join").get
      .run(spark, sf).select(col("event_id"), col("o_orderkey"))
    assert(out.where(col("o_orderkey_tol").isNotNull).join(base, "event_id")
      .where(col("o_orderkey_tol") =!= col("o_orderkey")).count() == 0)
  }

  test("csv round trip: parsed rows identical to the source") {
    val out = q("ingest_csv_parse")
    val ev = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value", "props")
    assert(out.except(ev).count() == 0)
    assert(ev.except(out).count() == 0)
  }

  test("winsorize: thresholds ordered, clip fractions bounded by 5%") {
    val out = q("events_winsorize").cache()
    assert(out.count() > 0)
    assert(out.where(col("p05_c") > col("p95_c")).count() == 0)
    val n = Tables.t(spark, sf, "events")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val j = out.join(n, "event_type")
    assert(j.where(col("n_lo") > col("n") * 0.05).count() == 0)
    assert(j.where(col("n_hi") > col("n") * 0.05).count() == 0)
    // clipped total sits inside the [n·p05, n·p95] envelope
    assert(j.where(col("clipped_sum_c") < col("n") * col("p05_c") ||
      col("clipped_sum_c") > col("n") * col("p95_c")).count() == 0)
  }

  test("wow growth: one row per week, only the first lacks a ratio") {
    val out = q("events_wow_growth").cache()
    val weeks = Tables.t(spark, sf, "events")
      .select(to_date(date_trunc("week", col("ts"))).as("wk")).distinct().count()
    assert(out.count() == weeks)
    assert(out.where(col("growth_e4").isNull).count() == 1)
    assert(out.orderBy("wk").limit(1).where(col("growth_e4").isNotNull)
      .count() == 0)
    assert(out.where(col("rev_c") <= 0).count() == 0)
  }

  test("normalize dedup: forms are canonical and counts conserve") {
    val out = q("text_normalize_dedup").cache()
    assert(out.where(col("norm").rlike("[^a-z0-9 ]")).count() == 0)
    assert(out.where(col("norm").contains("  ")).count() == 0)
    val total = Tables.t(spark, sf, "events").count()
    assert(out.agg(sum("n")).head().getLong(0) == total)
    // normalization actually collides distinct raw strings at this sf
    assert(out.count() < total)
  }

  test("replay dedup: streaming dropDuplicatesWithinWatermark matches batch") {
    val rows = Tables.t(spark, sf, "events")
      .select(col("event_id"), col("ts_ns"), col("user_id"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .collect().sortBy(_._2).toSeq
    val half = rows(rows.length / 2)._2
    val (first, second) = rows.partition(_._2 <= half)
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val in = ms.toDF().toDF("event_id", "ts_ns", "user_id", "event_type", "value")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
    val out = StreamingIngest.dedupWithinWatermark(in, "ts", "10 minutes", Seq("event_id"))
      .drop("ts", "ts_ns")
    val query = out.writeStream.format("memory").queryName("replay_dedup")
      .outputMode("append").start()
    try {
      // at-least-once delivery: each chunk's %3 ids are replayed in the
      // NEXT chunk (within the watermark horizon of their originals or
      // late — either way they must not re-emit)
      ms.addData(first)
      query.processAllAvailable()
      ms.addData(first.filter(_._1 % 3 == 0) ++ second)
      query.processAllAvailable()
      ms.addData(second.filter(_._1 % 3 == 0))
      query.processAllAvailable()
    } finally query.stop()
    val got = spark.table("replay_dedup")
      .select("event_id", "user_id", "event_type", "value")
    val want = q("ingest_dedup_replay")
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0)
    assert(want.except(got).count() == 0)
  }
}
