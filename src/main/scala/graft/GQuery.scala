package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability exposed through [[SparkEntry]]: a Spark
  * implementation plus (where SQL-expressible) an equivalent DuckDB SQL
  * oracle for the driver's differential correctness check.
  *
  * Conventions (required by the driver's hash compare):
  *  - output column names are identical between `run` and `oracle`;
  *  - every query ends in a total-order `ORDER BY`;
  *  - floating aggregates are rounded (2 for money, 4-6 for ratios) in
  *    BOTH engines so cross-engine summation-order noise cancels;
  *  - integer-typed outputs are BIGINT in both engines (DuckDB promotes
  *    `sum(BIGINT)` to HUGEINT, Spark's `count`/`sum` yield LongType —
  *    oracles cast accordingly);
  *  - `round(double, n)` itself diverges cross-engine on
  *    shortest-decimal boundaries — where a value is derived through
  *    transcendentals, emit `floor(x * 10^n)` as a scaled BIGINT and
  *    keep the pre-round arithmetic a single chain of identical IEEE
  *    ops (see text_pmi_bigrams);
  *  - engine-specific hashing is NOT oracle-able, but DETERMINISTIC
  *    constants computed at plan-build time (e.g. SRP sign arrays from
  *    MD5 parity) can be inlined as literals into both the Spark plan
  *    and the generated oracle SQL, making sketch-bucketed queries
  *    hash-verifiable (see SimilarityOps.srpSigns / srpPairsOracle).
  *
  * `bench = true` marks headline queries timed by [[Bench]].
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
