package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurateOps, Extras, MoreOps, StatOps}

/** Invariant gates for the round-4 operators — properties the driver's
  * hash compare can't express (bounds, conservation laws, and
  * independent recomputations of window/as-of semantics).
  */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  private def q(all: Seq[GQuery], name: String) =
    all.find(_.name == name).get.run(spark, sf)

  test("corr/regr aggregates satisfy analytic identities") {
    val out = q(StatOps.all, "agg_corr_regr").cache()
    assert(out.count() > 0)
    assert(out.where(abs(col("corr_qp")) > 1.0001).count() == 0)
    assert(out.where(col("r2") < -0.0001 || col("r2") > 1.0001).count() == 0)
    // r2 == corr² for simple linear regression (both rounded to 4)
    assert(out.where(abs(col("r2") - col("corr_qp") * col("corr_qp")) > 0.001)
      .count() == 0)
    out.unpersist()
  }

  test("MAD outlier gate flags a strict minority per type") {
    val out = q(StatOps.all, "events_outliers_mad")
    assert(out.count() > 0)
    assert(out.where(col("n_outliers") * 2 >= col("n")).count() == 0)
    assert(out.where(col("n_outliers") < 0).count() == 0)
  }

  test("running distinct count ends at the exact per-supplier distinct") {
    val out = q(StatOps.all, "window_count_distinct")
    val finals = out.groupBy("l_suppkey").agg(max("n_distinct_parts").as("got"))
    val exact = Tables.t(spark, sf, "lineitem")
      .groupBy("l_suppkey").agg(countDistinct("l_partkey").as("want"))
    assert(finals.join(exact, "l_suppkey")
      .where(col("got") =!= col("want")).count() == 0)
    // monotone non-decreasing along each supplier's timeline is implied
    // by max == final; also check it never exceeds rows-so-far
    assert(out.where(col("n_distinct_parts") < 1).count() == 0)
  }

  test("token entropy is bounded by log2(n) and zero for uniform-1 docs") {
    val out = q(StatOps.all, "text_entropy").cache()
    assert(out.count() > 0)
    assert(out.where(col("entropy_e4") < 0).count() == 0)
    // H <= log2(n_tokens) always (equality iff all tokens distinct)
    assert(out.where(col("entropy_e4") > floor(log2(col("n")) * 10000)).count() == 0)
    // docs where every token is distinct hit the bound exactly
    val distinctTok = Tables.t(spark, sf, "documents")
      .select(col("doc_id"),
        size(operators.TextOps.tokens(col("text"))).as("nt"),
        size(array_distinct(operators.TextOps.tokens(col("text")))).as("nd"))
      .where(col("nt") === col("nd") && col("nt") > 0)
    assert(out.join(distinctTok, "doc_id")
      .where(col("entropy_e4") =!= floor(log2(col("nt")) * 10000)).count() == 0)
    out.unpersist()
  }

  test("prefix dedup conserves docs and survivors are group minima") {
    val out = q(CurateOps.all, "text_prefix_dedup").cache()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(out.agg(sum("n_dups")).as[Long].head() == nDocs)
    assert(out.select("doc_id").distinct().count() == out.count())
    out.unpersist()
  }

  test("keep-best clusters conserve docs and keepers carry max n_chars") {
    val out = q(CurateOps.all, "dedup_keep_best").cache()
    val d = Tables.t(spark, sf, "documents").select(col("doc_id"), col("n_chars"))
    assert(out.agg(sum("n_members")).as[Long].head() == d.count())
    // the keeper's n_chars IS the cluster max (keep_chars)
    assert(out.join(d, col("keep_id") === col("doc_id"))
      .where(col("n_chars") =!= col("keep_chars")).count() == 0)
    // singleton clusters keep themselves
    assert(out.where(col("n_members") === 1 && col("keep_id") =!= col("cluster"))
      .count() == 0)
    out.unpersist()
  }

  test("weighted mix keeps everything at weight 1 and subsets elsewhere") {
    val out = q(CurateOps.all, "docs_mix_weighted").cache()
    assert(out.where(col("n_kept") > col("n_in")).count() == 0)
    // sources with index % 4 == 0 have threshold 256 > any 2-hex value
    val full = out.where(regexp_extract(col("source"), "src(\\d+)", 1)
      .cast("int") % 4 === 0)
    assert(full.count() > 0 && full.where(col("n_kept") =!= col("n_in")).count() == 0)
    out.unpersist()
  }

  test("rate limit keeps exactly the earliest event per (user, bucket)") {
    val out = q(CurateOps.all, "events_rate_limit").cache()
    assert(out.groupBy("user_id", "bucket").count().where(col("count") > 1)
      .count() == 0)
    // recompute the earliest event per bucket independently via min_by
    val e = Tables.t(spark, sf, "events")
      .withColumn("bucket",
        floor(col("ts").cast("timestamp").cast("double") / 600).cast("long"))
    val want = e.groupBy("user_id", "bucket")
      .agg(min_by(col("event_id"), struct(col("ts"), col("event_id"))).as("want_id"))
    assert(out.join(want, Seq("user_id", "bucket"))
      .where(col("event_id") =!= col("want_id")).count() == 0)
    assert(out.count() == want.count())
    out.unpersist()
  }

  test("forward as-of attaches the genuinely next event per order") {
    val out = q(Extras.all, "asof_join_forward").cache()
    val ord = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate")
    assert(out.count() == ord.count(), "left rows all survive")
    // independent recomputation by (bounded, test-scale) range join
    val ev = Tables.t(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id").as("want_id"))
    val want = ord.join(ev,
        col("o_custkey") === col("user_id") && col("ts") >= col("o_orderdate"),
        "left")
      .groupBy("o_orderkey")
      .agg(min_by(col("want_id"), struct(col("ts"), col("want_id"))).as("want_id"))
    assert(out.join(want, "o_orderkey")
      .where(coalesce(col("event_id"), lit(-1L)) =!= coalesce(col("want_id"), lit(-1L)))
      .count() == 0)
    out.unpersist()
  }

  test("equi-depth buckets are balanced and non-overlapping") {
    val out = q(MoreOps.all, "hist_equidepth").cache()
    assert(out.count() == 10)
    val Seq(mn, mx) = out.agg(min("n"), max("n")).as[(Long, Long)].head()
      .productIterator.map(_.asInstanceOf[Long]).toSeq
    assert(mx - mn <= 1, "equi-depth: bucket sizes differ by at most 1")
    // bucket ranges are ordered: each bucket's lo >= previous bucket's hi
    val rows = out.orderBy("bucket").select("lo", "hi").as[(Double, Double)].collect()
    assert(rows.sliding(2).forall {
      case Array((_, h1), (l2, _)) => l2 >= h1 - 1e-9
      case _ => true
    })
    out.unpersist()
  }

  test("basket pairs are ordered and genuinely co-occurring") {
    val out = q(StatOps.all, "basket_pairs").cache()
    assert(out.count() > 0)
    assert(out.where(col("part_a") >= col("part_b")).count() == 0)
    assert(out.where(col("support") < 3).count() == 0)
    out.unpersist()
  }

  test("cumulative users ends at total distinct and dominates daily news") {
    val out = q(operators.EventOps.all, "events_cum_users").cache()
    val total = Tables.t(spark, sf, "events").select("user_id").distinct().count()
    assert(out.agg(max("cum_users")).as[Long].head() == total)
    assert(out.where(col("n_new") > col("dau")).count() == 0)
    assert(out.agg(sum("n_new")).as[Long].head() == total)
    out.unpersist()
  }

  test("streaming rate limit reconstructs the batch first-per-bucket answer") {
    val streamed = q(Extras.all, "streaming_rate_limit")
    val batch = q(CurateOps.all, "events_rate_limit")
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0)
    assert(batch.except(streamed).count() == 0)
  }

  test("skewness/kurtosis match directly recomputed population moments") {
    val out = q(StatOps.all, "agg_skew_kurt").cache()
    val li = Tables.t(spark, sf, "lineitem")
    val mu = li.groupBy("l_returnflag").agg(avg("l_quantity").as("mu"))
    val mom = li.join(mu, "l_returnflag").groupBy("l_returnflag").agg(
      avg(pow(col("l_quantity") - col("mu"), 2)).as("m2"),
      avg(pow(col("l_quantity") - col("mu"), 3)).as("m3"),
      avg(pow(col("l_quantity") - col("mu"), 4)).as("m4"))
      .select(col("l_returnflag"),
        round(col("m3") / pow(col("m2"), 1.5), 4).as("want_skew"),
        round(col("m4") / pow(col("m2"), 2) - 3, 4).as("want_kurt"))
    assert(out.join(mom, "l_returnflag")
      .where(abs(col("skew_q") - col("want_skew")) > 0.0002 ||
        abs(col("kurt_q") - col("want_kurt")) > 0.0002).count() == 0)
    out.unpersist()
  }

  test("BPE merge candidates are 2-char pairs in non-increasing count order") {
    val out = q(operators.TextOps.all, "text_bpe_merges")
    val rows = out.collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getString(0).length == 2))
    assert(rows.map(_.getLong(1)).sliding(2).forall {
      case Array(a, b) => a >= b
      case _ => true
    })
  }

  test("forward as-of matches equal-time right rows with min tiebreak") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 01:00:00")
    val left = Seq((1L, t0, "L0"), (1L, t1, "L1"), (2L, t1, "L2"))
      .toDF("k", "t", "ltag")
    // key 1 has TWO right rows at exactly t0 (payload ids 9 and 5 — the
    // MIN id must win) and one later row; key 2 has none at/after t1
    val right = Seq((1L, t0, 9L), (1L, t0, 5L), (1L, t1, 7L), (2L, t0, 3L))
      .toDF("rk", "rt", "rid")
    val out = graft.plans.AsOfJoin.asofForward(left, right,
        leftKey = "k", rightKey = "rk", leftTime = "t", rightTime = "rt",
        rightPayload = Seq("rid"), rightTiebreak = Seq("rid"))
      .select("ltag", "rid").as[(String, Option[Long])].collect().toMap
    assert(out("L0").contains(5L), "equal-time right row visible, min id wins")
    assert(out("L1").contains(7L))
    assert(out("L2").isEmpty, "no right row at-or-after → null")
  }

  test("earliest-wins upsert is arrival-order independent") {
    import graft.streaming.StreamingIngest
    import graft.streaming.StreamingIngest.BucketEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val evs = Seq(
      BucketEvent(1, 10, 100, 7), BucketEvent(1, 10, 100, 3), // ts tie → min id
      BucketEvent(1, 10, 50, 9), // strictly earlier ts beats both
      BucketEvent(2, 10, 200, 1), BucketEvent(2, 11, 300, 2))
    val want = Map((1L, 10L) -> 9L, (2L, 10L) -> 1L, (2L, 11L) -> 2L)
    Seq(evs, evs.reverse, evs.sortBy(_.event_id)).zipWithIndex.foreach {
      case (order, i) =>
        val ms = MemoryStream[BucketEvent]
        val sink = s"rate_perm_$i"
        val q = StreamingIngest.earliestWinsUpdates(ms.toDS())
          .writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try {
          // one event per micro-batch = the worst-case arrival split
          order.foreach { e => ms.addData(e); q.processAllAvailable() }
        } finally q.stop()
        val got = spark.table(sink)
          .groupBy("user_id", "bucket")
          .agg(min_by(col("event_id"), struct(col("ts_us"), col("event_id")))
            .as("event_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
        assert(got == want, s"permutation $i diverged: $got")
    }
  }

  test("sort-merge join plan is pinned and matches the broadcast answer") {
    val q1 = q(operators.Relational.all, "join_sortmerge")
    val smj = q1.queryExecution.executedPlan.toString
    assert(smj.contains("SortMergeJoin"), "merge hint must pin SortMergeJoinExec")
    // same answer without the hint (whatever strategy AQE picks)
    val l = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables.t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    val free = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_lines"))
    assert(q1.except(free).count() == 0 && free.except(q1).count() == 0)
  }

  test("SCD2 intervals chain per user and open exactly one current row") {
    val out = q(operators.Ingest.all, "ingest_scd2").cache()
    // exactly one open interval (eff_to null) per user
    val opens = out.where(col("eff_to").isNull).groupBy("user_id").count()
    assert(opens.where(col("count") =!= 1).count() == 0)
    val users = Tables.t(spark, sf, "events").select("user_id").distinct().count()
    assert(opens.count() == users)
    // intervals chain: each non-open row's eff_to is the next row's eff_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("eff_from")
    val chained = out.withColumn("next_from", lead("eff_from", 1).over(w))
    assert(chained.where(col("eff_to").isNotNull &&
      col("eff_to") =!= col("next_from")).count() == 0)
    // consecutive versions always change the attribute
    val ch = out.withColumn("prev_type", lag("event_type", 1).over(w))
    assert(ch.where(col("prev_type").isNotNull &&
      col("prev_type") === col("event_type")).count() == 0)
    out.unpersist()
  }

  test("merge classification partitions the delta keys") {
    val out = q(operators.Ingest.all, "ingest_merge_classify").cache()
    assert(out.count() <= 3)
    assert(out.where(!col("action").isin("insert", "update", "touch")).count() == 0)
    out.unpersist()
  }

  test("frame sampling explodes 4 in-range frames per video, 1 otherwise") {
    val out = q(Extras.all, "multimodal_frames").cache()
    val perItem = out.groupBy("media_id", "kind")
      .agg(count(lit(1)).as("nf"), max("frame_idx").as("mx"))
    assert(perItem.where(col("kind") === "video" && col("nf") =!= 4).count() == 0)
    assert(perItem.where(col("kind") =!= "video" &&
      (col("nf") =!= 1 || col("mx") =!= 0)).count() == 0)
    // sampled indices stay inside the item's frame count
    assert(out.where(col("kind") === "video" &&
      col("frame_idx") >= pmod(col("media_id"), lit(100)) + 8).count() == 0)
    out.unpersist()
  }

  test("content-hash dedup collapses planted byte-identical copies") {
    val out = q(Extras.all, "multimodal_dedup").cache()
    val planted = Tables.t(spark, sf, "documents")
      .where(col("doc_id") % 7 === 0).count()
    assert(out.where(col("n_copies") >= 2).count() == planted)
    assert(out.agg(sum("n_copies")).as[Long].head() ==
      Tables.t(spark, sf, "documents").count() + planted)
    // keepers are the original ids, never the replayed ones
    assert(out.where(col("keeper") >= 1000000L).count() == 0)
    out.unpersist()
  }

  test("parse_url decomposition matches recomputed components") {
    val out = q(MoreOps.all, "scalar_url").cache()
    assert(out.count() > 0)
    assert(out.where(col("host") =!= "shop.example.com").count() == 0)
    val p = Tables.t(spark, sf, "part").select(col("p_partkey"),
      col("p_size").cast("string").as("want_size"),
      concat(lit("/brand/"), regexp_replace(lower(col("p_brand")), "#", "-"),
        lit("/item")).as("want_path"))
    assert(out.join(p, "p_partkey")
      .where(col("path") =!= col("want_path") || col("qsize") =!= col("want_size"))
      .count() == 0)
    out.unpersist()
  }
}
