package graft

import graft.sources.SchemaCompat
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The compatibility matrix's load-bearing asymmetries, pinned without
  * a Spark session (the classifier is pure metadata).
  */
class SchemaCompatSpec extends AnyFunSuite {

  private def st(fs: (String, DataType, Boolean)*) =
    StructType(fs.map { case (n, t, nl) => StructField(n, t, nl) })

  test("identical schemas: no changes, compatible both ways") {
    val a = st(("k", LongType, false), ("v", StringType, true))
    assert(SchemaCompat.diff(a, a).isEmpty)
    assert(SchemaCompat.verdict(a, a) == (true, true))
  }

  test("widen is backward-only; the reverse narrow is forward-only") {
    val i = st(("x", IntegerType, true))
    val l = st(("x", LongType, true))
    assert(SchemaCompat.verdict(i, l) == (true, false), "int -> long")
    assert(SchemaCompat.verdict(l, i) == (false, true), "long -> int")
  }

  test("add nullable is the only fully-safe change; add required breaks backward") {
    val base = st(("k", LongType, false))
    val plusN = st(("k", LongType, false), ("n", StringType, true))
    val plusR = st(("k", LongType, false), ("r", StringType, false))
    assert(SchemaCompat.verdict(base, plusN) == (true, true))
    assert(SchemaCompat.verdict(base, plusR) == (false, true))
    assert(SchemaCompat.verdict(plusN, base) == (true, false), "drop")
  }

  test("incompatible type change breaks both directions") {
    val a = st(("x", StringType, true))
    val b = st(("x", LongType, true))
    assert(SchemaCompat.verdict(a, b) == (false, false))
  }

  test("one breaking field poisons the whole-schema verdict") {
    val from = st(("a", IntegerType, true), ("b", StringType, true))
    val to = st(("a", LongType, true), ("b", LongType, true)) // widen + incompatible
    assert(SchemaCompat.verdict(from, to) == (false, false))
  }
}
