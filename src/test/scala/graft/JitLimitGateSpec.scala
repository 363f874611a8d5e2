package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count}

/** Red/green gate for the never-JIT codegen window (r15 verdict task 1).
  *
  * HotSpot refuses to JIT methods over [[PlanLint.JitBytecodeLimit]]
  * (8000) bytecodes, but Spark's default
  * `spark.sql.codegen.hugeMethodLimit` (65535) keeps whole-stage
  * codegen active up to the class-file limit, so a generated method in
  * (8000, 65535] executes as interpreted bytecode forever. The
  * wide-literal SRP keying stage lives exactly there at production
  * widths (SCALE.md "Round-16: the hugeMethodLimit evidence" — KeyDump
  * table: kernel 3.8-4.9×; whole-query warm 2.36×). Every graft entry
  * point therefore pins the session limit to 8000 so Spark falls back
  * to non-WSCG execution, whose per-expression codegen splits into
  * small JIT-able methods.
  *
  * The gate: [[PlanLint.neverJitStages]] must fire on the SRP keying
  * plan under Spark's DEFAULT limit (red — proves both that the cliff
  * still exists at production widths and that the lint can see it; if
  * a refactor ever shrinks the keying method under the JIT ceiling,
  * the red leg fails and the global pin can be retired) and must be
  * empty under the production 8000 pin (green — the fallback closes
  * the window). Codegen size depends on widths, not rows, so an 8-row
  * in-memory frame exercises the exact production-grown stage.
  */
class JitLimitGateSpec extends SparkSpec {

  // AQE off: under AQE the WSCG wrappers only appear at query-stage
  // materialization mid-execution, hiding every stage from a static
  // sweep (same reason PlanLint's main disables it).
  private def sessionWith(hugeMethodLimit: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.codegen.hugeMethodLimit", hugeMethodLimit)
    s
  }

  // The production-grown SRP keying shape at the widest step that
  // still COMPILES under janino (12 planes / 16 tables — the cap-12
  // operating band, 59,476 bytecodes measured r18) unless overridden.
  // Under the r14-r17 string bucket key the janino 64 KB refusal
  // boundary sat past 13:18; the r18 LONG-packed key's generated
  // method is slightly larger per bit, so 13:18 now takes the loud
  // janino fallback (measured-equal speed, same class as 14:20+) and
  // the never-JIT window — which this gate exists to pin — spans the
  // widths that still compile: 6:16 = 28,660 / 9:16 = 44,068 / 12:16 =
  // 59,476 bytecodes (r18 probe), i.e. every width the oracle SFs and
  // the sf1 wave actually run.
  private def keyed(s: SparkSession, planes: Int = 12, tables: Int = 16): DataFrame = {
    import s.implicits._
    val e = (0 until 8).map(i => (i.toLong, Array.tabulate(64)(d => (i * 64 + d) * 0.01)))
      .toDF("vec_id", "em")
    graft.operators.SimilarityOps.srpKeyedGrown(e, planes, tables, dims = 64)
      .select(count(col("bk")).as("n"))
  }

  test("RED: under Spark's default hugeMethodLimit the SRP keying stage is never-JIT bytecode") {
    val offenders = PlanLint.neverJitStages(keyed(sessionWith("65535")))
    assert(offenders.nonEmpty,
      "the keying stage no longer exceeds the JIT ceiling — the global " +
        "hugeMethodLimit=8000 pin (Bench.scala) may be retirable")
    assert(offenders.exists(_._2 > PlanLint.JitBytecodeLimit))
  }

  test("GREEN: the production hugeMethodLimit=8000 pin closes the window (fallback, not interpretation)") {
    assert(PlanLint.neverJitStages(keyed(sessionWith("8000"))).isEmpty)
  }

  test("the shared test session carries the production pin every entry point sets") {
    assert(spark.conf.get("spark.sql.codegen.hugeMethodLimit") === "8000")
  }

  test("the pinned-fallback plan still computes the same keys as the never-JIT plan") {
    val a = keyed(sessionWith("65535")).collect().map(_.getLong(0)).toSeq
    val b = keyed(sessionWith("8000")).collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.head === 8L * 16) // one bucket key per (row, table)
  }

  // Past width 12:16 (13:18+ since the r18 long-packed key; 14:20+
  // under the r14-r17 string key) the keying method exceeds janino's
  // 64 KB
  // PER-METHOD class-file limit: WSCG compilation FAILS (loud
  // "Code grows beyond 64 KB" WARN storm on the sf32x/sf64x wave legs)
  // and Spark falls back to non-WSCG execution at either session
  // setting — measured at identical speed (SCALE.md r16 KeyDump
  // control row). These widths run at corpora past every oracle SF
  // (640k+ vectors), so this parity pin is their only correctness
  // gate; it is also the canary if a future Spark ever turns the
  // compile failure into an error instead of a fallback.
  test("widths past janino's method limit (15:22, the sf64x step) execute correctly via fallback") {
    val a = keyed(sessionWith("65535"), planes = 15, tables = 22)
      .collect().map(_.getLong(0)).toSeq
    val b = keyed(sessionWith("8000"), planes = 15, tables = 22)
      .collect().map(_.getLong(0)).toSeq
    assert(a === b)
    assert(a.head === 8L * 22)
  }

  // r17 verdict task 3: the lint's compile-failure tolerance was
  // `case _: Exception` — a codegen regression emitting invalid Java
  // would silently VANISH from the audit instead of surfacing. The
  // narrowed catch tolerates only janino's compile-failure types;
  // everything else falls through the `if` guard and propagates.
  test("GREEN: a real janino 64KB compile failure (15:22 keying) is tolerated, not thrown") {
    // doCodeGen+compile on the over-limit stage throws inside the lint;
    // the narrowed catch must classify it and keep auditing.
    val offenders = PlanLint.neverJitStages(
      keyed(sessionWith("65535"), planes = 15, tables = 22))
    // the over-limit stage is excluded (compile failed → runtime falls
    // back to non-WSCG, so it is not a never-JIT stage); what matters
    // here is that the call RETURNED instead of propagating
    assert(offenders.forall(_._2 <= 65535))
  }

  test("RED: a non-compile exception is classified for propagation, compile failures are not") {
    val janino = new org.codehaus.commons.compiler.CompileException(
      "Code of method grows beyond 64 KB", null)
    assert(PlanLint.isJaninoCompileFailure(janino))
    // Spark and Guava's compile cache both wrap — the causal chain is
    // what's walked
    assert(PlanLint.isJaninoCompileFailure(new RuntimeException("wrapped", janino)))
    assert(PlanLint.isJaninoCompileFailure(
      new java.util.concurrent.ExecutionException(new RuntimeException(janino))))
    // a genuine codegen defect surfaces as some OTHER type — these must
    // fall through the catch guard and propagate out of the lint
    assert(!PlanLint.isJaninoCompileFailure(new RuntimeException("boom")))
    assert(!PlanLint.isJaninoCompileFailure(
      new IllegalStateException(new NullPointerException())))
  }
}
