package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registry-checked temp-function registration.
  *
  * Every query constructor calls its expressions' `register(spark)` up
  * front (registration is a session-level side effect the constructor
  * can't know has happened), so a bare `createOrReplaceTempFunction`
  * re-registers per query and Spark logs "replaced a previously
  * registered function" each time. In the bench run those WARNs ate
  * ~800 of the driver's 2000-char stdout tail window — the JSON
  * artifact line had 72 chars of headroom left (r16 verdict). Tracking
  * the names THIS object registered (per session, weakly held) makes
  * re-registration a true no-op without ceding the name: if some other
  * party — a pre-existing user temp function, or a future Spark
  * built-in — already holds it, graft still createOrReplaces (the old
  * guarantee that graft's definition wins; r17 advisor), and the one
  * WARN that logs is the honest signal of that clobber, not a storm.
  */
private[functions] object FnReg {

  // WeakHashMap so a retired session doesn't pin its name set; guarded
  // by FnReg's monitor (registration is rare and cheap).
  private val owned =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()

  def once(spark: SparkSession, name: String)(
      builder: Seq[Expression] => Expression): Unit = synchronized {
    val names = owned.computeIfAbsent(spark, _ => new java.util.HashSet[String]())
    if (names.add(name))
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
