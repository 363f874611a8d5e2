package graft

import graft.operators.IncrOps
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The plan-keyed result cache: semantically identical frames share one
  * entry (no recompute), different queries get different entries,
  * results round-trip exactly, and invalidation clears.
  */
class ResultCacheSpec extends SparkSpec {

  private lazy val orders = Tables.t(spark, sf, "orders")

  test("a rebuilt identical query HITS; results equal the uncached run") {
    val dir = Files.createTempDirectory("graft_rescache").toString
    def build = IncrOps.monthlyPartials(orders).orderBy("month")
    val direct = build.collect()
    val (first, hit1) = ResultCache.through(build, dir)
    assert(!hit1, "first run cannot hit")
    assert(first.collect().toSeq == direct.toSeq)
    // an independently-built frame (fresh exprIds) must hit the entry
    val (second, hit2) = ResultCache.through(build, dir)
    assert(hit2, "semantically identical rebuild must hit")
    assert(second.collect().toSeq == direct.toSeq)
  }

  test("different construction orders of one query share one key; output names matter") {
    // filter-then-project vs project-then-filter: the optimizer
    // normalizes both to the same canonical plan
    val a = orders.where(col("o_orderkey") > 100).select(col("o_orderkey").as("x"))
    val b = orders.select(col("o_orderkey").as("x")).where(col("x") > 100)
    assert(ResultCache.keyOf(a) == ResultCache.keyOf(b))
    // a different literal is a different query
    val c = orders.select(col("o_orderkey").as("x")).where(col("x") > 101)
    assert(ResultCache.keyOf(a) != ResultCache.keyOf(c))
    // and a different OUTPUT name is a different result (consumers read
    // the cached columns by name) — must NOT collide
    val renamed = orders.select(col("o_orderkey").as("y")).where(col("y") > 100)
    assert(ResultCache.keyOf(a) != ResultCache.keyOf(renamed))
  }

  test("invalidate clears entries; the next run re-materializes") {
    val dir = Files.createTempDirectory("graft_rescache_inv").toString
    def build = orders.groupBy("o_orderpriority").count()
    ResultCache.through(build, dir)
    ResultCache.invalidate(dir)
    val (_, hit) = ResultCache.through(build, dir)
    assert(!hit, "hit after invalidate")
  }

  test("a torn entry (no _SUCCESS) is re-materialized, not read") {
    val dir = Files.createTempDirectory("graft_rescache_torn").toString
    def build = orders.groupBy("o_orderstatus").count()
    val path = ResultCache.entryPath(dir, build)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ResultCache.through(build, dir)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    val (res, hit) = ResultCache.through(build, dir)
    assert(!hit, "torn entry treated as a hit")
    assert(res.count() == build.count())
  }
}
