package graft

/** Driver-contract smoke: entry() rows > 0; every query runs on sf0.001;
  * every oracle key exists in queries.
  */
class EntrySpec extends SparkSpec {

  test("entry returns > 0 rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val extra = SparkEntry.oracleSql.keySet.diff(qs)
    assert(extra.isEmpty, s"oracle without query: $extra")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
  }

  test("registry has no duplicate query names (map would silently drop one)") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry names: $dups")
    assert(names.size == SparkEntry.queries.size)
  }

  test("NOT IN goes empty when the subquery contains a NULL (3VL anti join)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("nin_left")
    Seq(Some(2L), None).toDF("v").createOrReplaceTempView("nin_right_null")
    Seq(Some(2L)).toDF("v").createOrReplaceTempView("nin_right")
    assert(spark.sql("SELECT k FROM nin_left WHERE k NOT IN (SELECT v FROM nin_right_null)").count() == 0,
      "a NULL in the NOT IN subquery must empty the result")
    assert(spark.sql("SELECT k FROM nin_left WHERE k NOT IN (SELECT v FROM nin_right)")
      .as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("no registered query plans a shuffle CartesianProduct") {
    // BroadcastNestedLoopJoin over a broadcast singleton/tiny side is a
    // deliberate pattern here (corpus-stat crossJoins, band joins); a
    // CartesianProductExec means two BIG sides met without a key — the
    // plan shape that detonates at scale. Streaming differential
    // queries execute work on construction, so this doubles as a cheap
    // second smoke at sf0.001.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("every query executes and returns rows on sf0.001") {
    val empties = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) empties += name
    }
    // join_anti may legitimately be small but should not be empty at sf0.001;
    // flag ANY empty result for a human look.
    assert(empties.result().isEmpty, s"queries with 0 rows: ${empties.result()}")
  }
}
