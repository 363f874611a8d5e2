package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** PORTABLE md5 k-gram hashes: element i is the first 32 bits of
  * md5(bytes[i..i+k)) as an unsigned long — bit-identical to the SQL
  * `conv(substring(md5(cast(substring(text,i,k) as binary)),1,8),16,10)`
  * and to DuckDB `('0x'||substring(md5(text[i:i+k-1]),1,8))::BIGINT`
  * (for ASCII text; both engines substring UTF-8 by codepoint, and the
  * fixtures are ASCII — the HOF form has the same caveat).
  *
  * One MessageDigest reused across grams, digesting the byte window
  * directly — no per-gram substring/UTF8String/hex-string allocations
  * and no interpreted lambda per element (the HOF form measured 5.6 s
  * at sf0.1; this ~1 s). md5 per gram is the portability contract:
  * DuckDB replays it, which a rolling recurrence can't — that is
  * [[RollingHashGrams]]'s job on the non-oracle path.
  */
case class Md5GramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "gram size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(Md5GramHashes.hashGrams(bytes, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Md5GramHashes.hashGrams($c.getBytes(), $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object Md5GramHashes {

  /** Shared kernel (also called from generated code). */
  def hashGrams(bytes: Array[Byte], k: Int): Array[Long] = {
    val n = bytes.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, i, k)
      val d = md.digest()
      out(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    out
  }

  /** Register `md5_gram_hashes(text, k)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_gram_hashes",
      exprs => Md5GramHashes(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()),
      "built-in")

  def md5_gram_hashes(textCol: String, k: Int): Column =
    expr(s"md5_gram_hashes($textCol, $k)")
}
