package graft

import graft.operators.SimilarityOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the r19 fused SRP keying kernel ([[graft.functions.SrpSignBits]])
  * to the r14-r18 unfused CASE-WHEN tree it replaces: the fusion is a
  * PURE CODEGEN change (one loop over a reference-object sign matrix
  * instead of planes inlined-literal dot products), so every bucket key
  * must be bit-identical — including the null/malformed/NaN ladder and
  * Spark's NaN-aware `>=` semantics — under both codegen and
  * interpreted evaluation. The control leg is the same production tree,
  * selected by `-Dgraft.srp.kernel=casewhen`.
  */
class SrpSignBitsSpec extends SparkSpec {

  private def withKernel[A](mode: String)(body: => A): A = {
    val prev = sys.props.get("graft.srp.kernel")
    sys.props("graft.srp.kernel") = mode
    try body
    finally prev match {
      case Some(v) => sys.props("graft.srp.kernel") = v
      case None => sys.props.remove("graft.srp.kernel")
    }
  }

  private def emb: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("em"))

  private def keys(e: DataFrame, planes: Int, tables: Int): Seq[(Long, Long)] =
    SimilarityOps.srpKeyedGrown(e, planes, tables, dims = 64)
      .select(col("vec_id"), col("bk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  test("fused kernel computes bit-identical keys to the casewhen control tree (real embeddings, 3 widths)") {
    val e = emb
    for ((p, t) <- Seq((3, 2), (9, 16), (15, 22))) {
      val fused = keys(e, p, t)
      val unfused = withKernel("casewhen")(keys(e, p, t))
      assert(fused.nonEmpty, s"width $p:$t produced no keys")
      assert(fused === unfused, s"key divergence at width $p:$t")
    }
  }

  test("fused kernel parity holds on the f64 transit control leg too") {
    val prev = sys.props.get("graft.srp.transit")
    sys.props("graft.srp.transit") = "f64"
    try {
      val fused = keys(emb, 6, 4)
      val unfused = withKernel("casewhen")(keys(emb, 6, 4))
      assert(fused === unfused)
    } finally prev match {
      case Some(v) => sys.props("graft.srp.transit") = v
      case None => sys.props.remove("graft.srp.transit")
    }
  }

  // The null/malformed ladder: a null array, a wrong-length array, or
  // any null ELEMENT made every per-plane dot_product NULL in the
  // unfused tree, every `when` take its 0 branch, and the key collapse
  // to the bare table prefix. A NaN element makes every plane's dot
  // NaN, and Spark's NaN-aware `>=` SETS the bit (NaN compares greater
  // than everything — same as DuckDB). The fused kernel must reproduce
  // all four, not just the happy path.
  test("edge rows: null / wrong-length / null-element / NaN-element keys match the control tree exactly") {
    val edge = spark.range(5).toDF("vec_id").selectExpr("vec_id",
      """case
        |  when vec_id = 0 then transform(sequence(1, 64), i -> cast(i - 32 as double))
        |  when vec_id = 1 then cast(null as array<double>)
        |  when vec_id = 2 then array(cast(1.0 as double), cast(2.0 as double))
        |  when vec_id = 3 then transform(sequence(1, 64), i -> if(i = 5, cast(null as double), cast(i as double)))
        |  else transform(sequence(1, 64), i -> if(i = 5, cast('NaN' as double), cast(i as double)))
        |end as em""".stripMargin)
    val planes = 5
    val tables = 3
    val fused = keys(edge, planes, tables)
    val unfused = withKernel("casewhen")(keys(edge, planes, tables))
    assert(fused === unfused)
    val byId = fused.groupBy(_._1)
    // null, wrong-length, null-element rows: all sign bits 0 → bare prefix
    for (id <- Seq(1L, 2L, 3L); (_, bk) <- byId(id))
      assert((bk & ((1L << 40) - 1)) === 0L, s"row $id must key to the bare table prefix")
    // NaN row: every plane's dot is NaN → every bit SET (NaN-aware >=)
    for ((_, bk) <- byId(4L))
      assert((bk & ((1L << 40) - 1)) === (1L << planes) - 1,
        "NaN dot must SET the sign bit — Spark/DuckDB NaN semantics")
    // table prefixes present once per table for every row
    assert(byId(0L).map(_._2 >> 40).sorted === (0L until tables))
  }

  test("interpreted eval matches codegen (factoryMode control)") {
    val p = 7; val t = 2
    def run(mode: String): Seq[(Long, Long)] = {
      val s = spark.newSession()
      s.conf.set("spark.sql.codegen.factoryMode", mode)
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val e = s.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("em"))
      SimilarityOps.srpKeyedGrown(e, p, t, dims = 64)
        .select(col("vec_id"), col("bk"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(run("NO_CODEGEN") === run("CODEGEN_ONLY"))
  }

  test("cap guards fail loudly (r18 ADVICE): planes > 40 or tables >= 2^23 must not silently corrupt keys") {
    val e = emb
    intercept[IllegalArgumentException](SimilarityOps.srpKeyedGrown(e, 41, 2, 64))
    intercept[IllegalArgumentException](SimilarityOps.srpKeyedGrown(e, 3, 1 << 23, 64))
  }
}
