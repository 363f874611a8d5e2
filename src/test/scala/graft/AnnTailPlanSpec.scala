package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r18 single-exchange ANN candidate tail
  * ([[SimilarityOps.annTopKPortableGrown]]) under AQE and under qid
  * skew (r18 verdict task 4): the explicit `repartition(col("qid"))`
  * plans as REPARTITION_BY_COL, which AQE must neither coalesce away
  * nor augment with a second dedup exchange — `hashpartitioning(qid)`
  * satisfies both the dropDuplicates aggregate (subset rule) and the
  * top-k window, so exactly ONE qid exchange may exist in the FINAL
  * adaptive plan, and no (qid, vec_id) exchange may reappear.
  *
  * The skew leg runs a pathological corpus — most vectors are jitter
  * siblings of one base vector, so they share buckets in every table
  * and every hot probe's candidates land in one qid partition. AQE's
  * skew-join splitting applies to the JOIN stage, not to the
  * repartition; the tail must stay correct (one row per (qid, vec_id),
  * rn dense per qid) and single-exchange regardless.
  */
class AnnTailPlanSpec extends SparkSpec {

  private val QidVecExchange = """hashpartitioning\(qid#\d+L?, vec_id""".r
  private val QidExchange = """hashpartitioning\(qid#\d+L?,\s*\d+\)""".r

  private def skewed(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(64)(rnd.nextGaussian())
    (0 until n).map { i =>
      val em =
        if (i % 5 == 4) Array.fill(64)(rnd.nextGaussian()) // 20% background
        else base.map(_ + rnd.nextGaussian() * 1e-3)       // 80% one hot cluster
      (i.toLong, em)
    }.toDF("vec_id", "em")
  }

  test("final adaptive plan keeps ONE qid exchange and never re-introduces the (qid, vec_id) dedup exchange") {
    val df = SimilarityOps.annTopKPortableGrown(skewed(400), k = 5, dims = 64)
    df.write.format("noop").mode("overwrite").save() // materialize → AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(QidVecExchange.findFirstIn(plan).isEmpty,
      "the (qid, vec_id) dedup exchange reappeared — the r18 single-exchange tail regressed")
    val qidExchanges = QidExchange.findAllIn(plan).size
    assert(qidExchanges === 1,
      s"expected exactly 1 hashpartitioning(qid) exchange in the final plan, found $qidExchanges:\n$plan")
  }

  test("skewed hot-probe corpus: tail results stay exact — unique (qid, vec_id), dense rn <= k per qid") {
    val out = SimilarityOps.annTopKPortableGrown(skewed(400), k = 5, dims = 64)
      .select(col("qid"), col("vec_id"), col("rn")).collect()
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs.distinct.size === pairs.size, "duplicate (qid, vec_id) survived the dedup")
    out.groupBy(_.getLong(0)).foreach { case (qid, rows) =>
      val rns = rows.map(_.getLong(2)).sorted.toSeq
      assert(rns === (1L to rns.size), s"qid $qid rn not dense: $rns")
      assert(rns.size <= 5, s"qid $qid returned more than k rows")
    }
  }
}
