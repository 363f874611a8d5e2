package graft

import org.apache.spark.sql.functions._

/** Fixture contracts the byte-windowing text kernels depend on.
  *
  * RollingHashGrams windows over UTF-8 BYTES while its DuckDB oracle
  * substrings by CODEPOINT — the two agree only for ASCII text
  * (Md5GramHashes was switched to codepoint iteration in round 6 and
  * no longer depends on this). This suite pins that assumption to the
  * fixtures so a future non-ASCII documents table fails HERE with a
  * clear message instead of hash-diverging in the driver's oracle
  * compare (ADVICE r5: "add a cheap ASCII assertion on the fixture").
  */
class TextOpsSpec extends SparkSpec {

  test("documents fixture is pure ASCII (byte-window kernels == codepoint oracles)") {
    val docs = Tables.t(spark, sf, "documents")
    val nonAscii = docs
      .where(octet_length(col("text")) =!= length(col("text")) ||
        octet_length(col("source")) =!= length(col("source")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text: RollingHashGrams " +
        "windows over UTF-8 bytes but its DuckDB oracle substrings by " +
        "codepoint — gram hashes would silently diverge. Either keep " +
        "fixtures ASCII or switch the kernel to codepoint iteration " +
        "(as Md5GramHashes does).")
  }

  test("rolling-hash oracle constants replay the kernel's Long-wrap powers") {
    // The inlined B-power constants in rollingHashOracle must equal the
    // kernel's bPow chain (same Long overflow semantics); drift here
    // would silently desynchronize the oracle from the Expression.
    val sql = graft.operators.TextOps.rollingHashOracle(k = 8, win = 4)
    val B = 1000003L
    val expected = (0 until 8).map(j =>
      java.lang.Long.toUnsignedString(
        (0 until (7 - j)).foldLeft(1L)((acc, _) => acc * B)))
    expected.foreach(c => assert(sql.contains(s"$c::HUGEINT"),
      s"oracle SQL missing B-power constant $c"))
    assert(sql.contains("% 18446744073709551616::HUGEINT"))
  }
}
