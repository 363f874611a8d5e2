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
  *    oracles cast accordingly).
  *
  * `bench = true` marks headline queries timed by [[Bench]].
  */
final case class GQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = false)
