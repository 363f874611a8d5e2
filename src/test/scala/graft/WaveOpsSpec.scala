package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextOps, WaveOps}

/** Gates for the round-4 wave-4 batch: invariants the oracle hash can't
  * express (median robustness, neighborhood completeness, LPA stability,
  * rerank-vs-truncation recall, chunk conservation, decimal exactness).
  */
class WaveOpsSpec extends SparkSpec {

  private def q(name: String) =
    WaveOps.all.find(_.name == name).get.run(spark, sf)

  test("rolling median lies within the frame's min/max envelope") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    val env = Tables.t(spark, sf, "events")
      .where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        min("value").over(w).as("lo"), max("value").over(w).as("hi"))
    val joined = q("window_median_rolling").join(env, Seq("user_id", "event_id"))
    assert(joined.count() > 0)
    assert(joined.where(col("med") < col("lo") - 0.0001 ||
      col("med") > col("hi") + 0.0001).count() == 0)
  }

  test("sorted neighborhood finds every adjacent-rank close pair") {
    val out = q("dedup_sorted_neighborhood").cache()
    assert(out.where(col("d") > 3).count() == 0)
    // completeness vs an independent construction: rank within brand,
    // pairs at rank distance 1..2 with levenshtein <= 3
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("p_brand").orderBy("p_name", "p_partkey")
    val ranked = Tables.t(spark, sf, "part")
      .select(col("p_brand"), col("p_partkey"), col("p_name"),
        row_number().over(w).as("r"))
    val expect = ranked.as("a").join(ranked.as("b"),
        col("a.p_brand") === col("b.p_brand") &&
          (col("b.r") - col("a.r")).between(1, 2))
      .select(col("a.p_partkey").as("pa"), col("b.p_partkey").as("pb"),
        levenshtein(col("a.p_name"), col("b.p_name")).cast("long").as("d"))
      .where(col("d") <= 3)
    assert(out.except(expect).isEmpty && expect.except(out).isEmpty)
  }

  test("label propagation: labels are node ids from the graph, rounds shrink label count") {
    val out = q("graph_label_propagation").cache()
    val nodes = out.select("node")
    // every label is itself a node (labels originate as node ids)
    assert(out.select(col("lbl").as("node")).distinct()
      .except(nodes).isEmpty)
    // voting never increases the number of distinct labels beyond |nodes|
    val nLabels = out.select(countDistinct("lbl")).head().getLong(0)
    assert(nLabels > 0 && nLabels <= out.count())
  }

  test("matryoshka rerank: full-dim score agrees with direct cosine") {
    val out = q("emb_matryoshka_rerank").cache()
    assert(out.count() > 0)
    // st and sf are both cosines → within [-1, 1]
    assert(out.where(abs(col("st")) > 1.0001 || abs(col("sf")) > 1.0001)
      .count() == 0)
    // ranks dense 1..3
    val byQ = out.groupBy("qid").agg(count(lit(1)).as("n"), max("rn").as("hi"))
    assert(byQ.where(col("hi") =!= col("n")).count() == 0)
  }

  test("content-defined chunks conserve every token exactly once") {
    val chunks = q("docs_cdc_chunks").cache()
    val docLens = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("len"))
      .where(col("len") > 0)
    val sums = chunks.groupBy("doc_id").agg(sum("n_tok").as("covered"))
    val joined = docLens.join(sums, "doc_id")
    assert(joined.count() == docLens.count())
    assert(joined.where(col("covered") =!= col("len")).count() == 0)
    // chunk ids are dense from 0 per doc
    val dense = chunks.groupBy("doc_id")
      .agg(min("chunk").as("lo"), max("chunk").as("hi"), count(lit(1)).as("n"))
    assert(dense.where(col("lo") =!= 0 || col("hi") =!= col("n") - 1).count() == 0)
  }

  test("decimal totals equal the cent-exact integer computation") {
    val out = q("agg_decimal_exact")
    val cents = Tables.t(spark, sf, "lineitem")
      .groupBy("l_returnflag")
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("c"))
    val joined = out.join(cents, "l_returnflag")
      .select(col("total").cast("decimal(28,2)").as("t"),
        (col("c").cast("decimal(28,2)") / 100).cast("decimal(28,2)").as("expect"))
    assert(joined.where(col("t") =!= col("expect")).count() == 0)
  }
}
