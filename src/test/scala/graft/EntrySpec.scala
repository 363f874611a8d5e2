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
