package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusOps, EventOps, MoreOps, SimilarityOps, TextOps}

/** Gates for the round-3 batch-A operators. Oracle-checked queries get
  * invariant gates (properties the hash compare can't express); the
  * rows-only sketch query gets an accuracy gate against the exact answer.
  */
class Round3Spec extends SparkSpec {
  import spark.implicits._

  test("hll sketch-union estimate sits within 5% of exact distinct count") {
    val row = MoreOps.hllUnionEstimate(Tables.t(spark, sf, "lineitem"))
      .as[(Double, Long)].head()
    val li = Tables.t(spark, sf, "lineitem")
    val exact = li.select(countDistinct("l_partkey")).as[Long].head()
    assert(row._2 == li.count(), "n_rows must be the full table count")
    assert(math.abs(row._1 - exact) / exact.toDouble <= 0.05,
      s"HLL estimate ${row._1} vs exact $exact off by > 5%")
  }

  test("bloom-prefiltered decontamination is row-identical to exact form") {
    val exact = CorpusOps.all.find(_.name == "decontaminate_ngrams").get.run(spark, sf)
    val bloom = CorpusOps.all.find(_.name == "decontaminate_bloom").get.run(spark, sf)
    assert(bloom.except(exact).isEmpty && exact.except(bloom).isEmpty)
    assert(bloom.count() == exact.count())
  }

  test("chunk-overlap windows tile every document with stride 24") {
    val chunks = CorpusOps.all.find(_.name == "docs_chunk_overlap").get.run(spark, sf)
      .groupBy("doc_id")
      .agg(min("start_tok").as("first"), max(col("start_tok")).as("last_start"),
        max(col("start_tok") + col("n_tok")).as("covered"),
        max("n_tok").as("max_n"), count(lit(1)).as("n_chunks"))
    val docLens = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("len"))
      .where(col("len") > 0)
    val joined = chunks.join(docLens, "doc_id")
    assert(joined.count() == docLens.count(), "every non-empty doc is chunked")
    // every chunk starts on the stride grid, first at 0
    assert(joined.where(col("first") =!= 0).count() == 0)
    // windows cover the whole token stream and never exceed the window size
    assert(joined.where(col("covered") < col("len")).count() == 0)
    assert(joined.where(col("max_n") > 32).count() == 0)
    // stride grid: number of chunks is ceil(len / 24)
    assert(joined.where(col("n_chunks") =!= ceil(col("len") / 24.0).cast("long"))
      .count() == 0)
  }

  test("gap-fill spine is contiguous per user and filled after first obs") {
    val out = EventOps.all.find(_.name == "events_gapfill").get.run(spark, sf)
    // forward fill: v_filled null only before a user's first observation —
    // and the spine starts AT the first observed day, so never null at all
    assert(out.where(col("v_filled").isNull).count() == 0)
    // observed rows pass through unchanged
    assert(out.where(col("v_obs").isNotNull && col("v_obs") =!= col("v_filled"))
      .count() == 0)
    // gap rows (v_obs null) copy the most recent prior observation —
    // recomputed here with an independent window pass
    val wff = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("day")
      .rowsBetween(Long.MinValue, 0)
    val re = out.withColumn("expect",
      last(col("v_obs"), ignoreNulls = true).over(wff))
    assert(re.where(col("v_obs").isNull && col("v_filled") =!= col("expect"))
      .count() == 0)
    // spine density: per-user day count == (max day - min day + 1)
    val spine = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (datediff(max(to_date(col("day"))), min(to_date(col("day")))) + 1)
          .cast("long").as("span"))
    assert(spine.where(col("n") =!= col("span")).count() == 0)
  }

  test("semantic dedup pairs are co-bucketed, ordered, above threshold") {
    val out = SimilarityOps.all.find(_.name == "dedup_semantic").get.run(spark, sf)
      .cache()
    assert(out.count() > 0)
    assert(out.where(col("keeper") >= col("dup")).count() == 0)
    assert(out.where(col("score") < 0.45).count() == 0)
    // bucket assignment is a function: a vec_id appears in exactly one cell
    val cells = out.select(col("cell"), col("keeper").as("v"))
      .union(out.select(col("cell"), col("dup").as("v")))
      .distinct().groupBy("v").agg(countDistinct("cell").as("nc"))
    assert(cells.where(col("nc") > 1).count() == 0)
    out.unpersist()
  }

  test("variant extraction types the hit path and nulls the miss path") {
    val out = MoreOps.all.find(_.name == "scalar_variant").get.run(spark, sf)
    assert(out.where(col("missing").isNotNull).count() == 0)
    assert(out.where(col("k").isNull).count() == 0)
    assert(out.where(col("k_bucket") =!= col("k") % 10).count() == 0)
  }

  test("xml round-trip is lossless over orders") {
    val out = MoreOps.all.find(_.name == "ingest_xml_parse").get.run(spark, sf)
    val orders = Tables.t(spark, sf, "orders")
    assert(out.count() == orders.count())
    assert(out.where(col("k").isNull || col("st").isNull || col("pr").isNull)
      .count() == 0)
  }
}
