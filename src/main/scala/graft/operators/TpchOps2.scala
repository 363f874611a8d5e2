package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H analogs for the partsupp-dependent queries (q2/q9/q11/q15/
  * q16/q20), re-based on the available schema: lineitem's (partkey,
  * suppkey) pairs stand in for partsupp, p_retailprice for supply cost,
  * s_acctbal for the q2 ranking. With these, every one of the 22 TPC-H
  * query SHAPES is represented in the registry.
  */
object TpchOps2 {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.t(s, dir, n)

  val all: Seq[GQuery] = Seq(

    GQuery(
      "q2_best_supplier",
      (s, dir) => {
        // Q2 shape: for each part in a class, the supplier(s) with the
        // maximum account balance among its actual suppliers — the
        // correlated-max pattern. The per-part max is ONE aggregate
        // joined back (broadcast); ties survive, exactly like the
        // correlated `= (SELECT max ...)` form.
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val cand = t(s, dir, "part")
          .where(col("p_size") <= 5 && col("p_type") === "STANDARD")
          .select("p_partkey")
          .join(ps, col("p_partkey") === col("l_partkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
            col("s_acctbal"))
        val mx = cand.groupBy(col("p_partkey").as("mk"))
          .agg(max("s_acctbal").as("mb"))
        cand.join(broadcast(mx),
            col("p_partkey") === col("mk") && col("s_acctbal") === col("mb"))
          .select(col("p_partkey"), col("s_suppkey"), col("s_name"),
            round(col("s_acctbal"), 2).as("bal"))
          .orderBy("p_partkey", "s_suppkey")
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             | cand AS (SELECT p_partkey, s_suppkey, s_name, s_acctbal
             |          FROM part JOIN ps ON p_partkey = l_partkey
             |          JOIN supplier ON l_suppkey = s_suppkey
             |          WHERE p_size <= 5 AND p_type = 'STANDARD')
             |SELECT p_partkey, s_suppkey, s_name, round(s_acctbal, 2) AS bal
             |FROM cand c
             |WHERE s_acctbal = (SELECT max(s_acctbal) FROM cand c2
             |                   WHERE c2.p_partkey = c.p_partkey)
             |ORDER BY p_partkey, s_suppkey""".stripMargin)),

    GQuery(
      "q9_profit",
      (s, dir) => {
        // Q9 shape: profit (revenue minus cost) by supplier nation and
        // year over a part-name class. All money in EXACT decimals —
        // profit is a large-group sum where double summation order
        // measurably flips cents (see memory of parts_abc), so the
        // decimal form is the only hash-stable one.
        val dec: String => org.apache.spark.sql.Column =
          c => col(c).cast("decimal(18,2)")
        val profit = dec("l_extendedprice") *
          (lit(1).cast("decimal(18,2)") - dec("l_discount")) -
          dec("p_retailprice") * dec("l_quantity")
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .where(col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, dir, "supplier")
            .select("s_suppkey", "s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("s_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast("long").as("yr"))
          .agg(sum(profit).cast("string").as("profit"))
          .orderBy("nation", "yr")
      },
      Some("""SELECT n_name AS nation, year(o_orderdate)::BIGINT AS yr,
             |       CAST(sum(l_extendedprice::DECIMAL(18,2) *
             |                (1::DECIMAL(18,2) - l_discount::DECIMAL(18,2)) -
             |                p_retailprice::DECIMAL(18,2) * l_quantity::DECIMAL(18,2))
             |            AS VARCHAR) AS profit
             |FROM lineitem
             |JOIN part ON l_partkey = p_partkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN orders ON l_orderkey = o_orderkey
             |WHERE p_name LIKE '%red%'
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    GQuery(
      "q11_important_parts",
      (s, dir) => {
        // Q11 shape: parts whose shipped value exceeds a fraction of
        // the global mean — the HAVING-against-scalar-subquery pattern.
        // The scalar (1.6×mean) is a 1-row broadcast; the filter is a
        // projection over the per-part aggregate.
        val pv = t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_extendedprice") * col("l_quantity")).as("v"))
        val thr = pv.agg((lit(1.6) * sum("v") / count(lit(1))).as("cut"))
        pv.crossJoin(broadcast(thr))
          .where(col("v") > col("cut"))
          .select(col("l_partkey"), round(col("v"), 2).as("value"))
          .orderBy("l_partkey")
      },
      Some("""WITH pv AS (SELECT l_partkey, sum(l_extendedprice * l_quantity) AS v
             |            FROM lineitem GROUP BY 1)
             |SELECT l_partkey, round(v, 2) AS value
             |FROM pv WHERE v > (SELECT 1.6 * sum(v) / count(*) FROM pv)
             |ORDER BY l_partkey""".stripMargin)),

    GQuery(
      "q15_top_supplier",
      (s, dir) => {
        // Q15 shape: the quarter's top-revenue supplier(s) — revenue
        // view + equality against its own max (ties kept). The max is a
        // 1-row broadcast against the |suppliers|-sized aggregate.
        val sr = t(s, dir, "lineitem")
          .where(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("tr"))
        val mx = sr.agg(max("tr").as("mt"))
        sr.crossJoin(broadcast(mx))
          .where(col("tr") === col("mt"))
          .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_name")),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), round(col("tr"), 2).as("total_rev"))
          .orderBy("s_suppkey")
      },
      Some("""WITH sr AS (SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS tr
             |            FROM lineitem
             |            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |              AND l_shipdate < TIMESTAMP '1996-04-01'
             |            GROUP BY 1)
             |SELECT s_suppkey, s_name, round(tr, 2) AS total_rev
             |FROM sr JOIN supplier ON l_suppkey = s_suppkey
             |WHERE tr = (SELECT max(tr) FROM sr)
             |ORDER BY s_suppkey""".stripMargin)),

    GQuery(
      "q16_supplier_counts",
      (s, dir) => {
        // Q16 shape: distinct-supplier counts per part class, excluding
        // a supplier blocklist — NOT IN compiles to a LEFT ANTI against
        // the (null-free) blocklist keys.
        val ps = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val bad = t(s, dir, "supplier").where(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        ps.join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), asc("p_brand"), asc("p_type"), asc("p_size"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
             |SELECT p_brand, p_type, p_size,
             |       count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
             |FROM ps JOIN part ON l_partkey = p_partkey
             |WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    GQuery(
      "q20_heavy_shippers",
      (s, dir) => {
        // Q20 shape: suppliers inside a nested IN whose aggregated
        // HAVING clears a volume bar — the IN-over-grouped-HAVING
        // pattern as a LEFT SEMI against the aggregated key set.
        val heavy = t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")
            .where(col("p_name").like("%red%")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .where(col("l_shipdate") >= expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'") &&
            col("l_shipdate") < expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
          .groupBy(col("l_suppkey"))
          .agg(sum("l_quantity").as("q"))
          .where(col("q") > 50)
          .select("l_suppkey")
        t(s, dir, "supplier")
          .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy("s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_name LIKE '%red%'
             |    AND l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate < TIMESTAMP '1997-01-01'
             |  GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
             |ORDER BY s_suppkey""".stripMargin))
  )
}
