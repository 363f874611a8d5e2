package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H analog queries q4/q7/q8/q13/q17/q19/q21/q22 — the classic
  * optimizer stress shapes this suite didn't cover yet: correlated
  * EXISTS with a non-equi time predicate, two-direction nation-pair
  * volume, market-share ratio-of-conditional-sums, left-join count
  * distribution (customers with zero orders INCLUDED), correlated
  * scalar-average quantity cut, OR-of-ANDs disjunctive pushdown,
  * EXISTS + NOT-EXISTS double correlation (the "waiting supplier"
  * anti-join chain), and an above-average anti-join rollup.
  *
  * Adapted to the synthetic schema where TPC-H columns are absent
  * (no partsupp/commitdate/receiptdate/container/phone — date-lag,
  * size, and priority predicates replace them; the PLAN SHAPES are the
  * point, and each carries its exact DuckDB oracle).
  */
object TpchOps {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.t(s, dir, n)

  private def tsNtz(lit0: String): Column = expr(s"TIMESTAMP_NTZ '$lit0'")

  val all: Seq[GQuery] = Seq(

    GQuery(
      "q4_order_priority",
      (s, dir) => {
        // Q4 shape: priority histogram of orders having at least one
        // "late" line (shipped > 60 days after order). EXISTS compiles
        // to a LEFT SEMI join on orderkey with the non-equi date lag in
        // the join condition — lineitem is never row-multiplied, and
        // the quarter filter prunes orders at the scan.
        val o = t(s, dir, "orders")
          .where(col("o_orderdate") >= tsNtz("1996-01-01 00:00:00") &&
            col("o_orderdate") < tsNtz("1996-04-01 00:00:00"))
        val l = t(s, dir, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(l, o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*)::BIGINT AS n
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GQuery(
      "q7_volume_shipping",
      (s, dir) => {
        // Q7 shape: bilateral trade volume between two nations by ship
        // year. The nation dimension joins twice under different roles
        // (supplier's vs customer's nation) — both broadcast; the
        // two-direction predicate is an OR over the pair, evaluated on
        // broadcast rows, never expanding the fact side.
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val n1 = t(s, dir, "nation")
          .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation")
          .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("sk"))
          .join(broadcast(n2), col("c_nationkey") === col("ck"))
          .where((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
            (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("yr"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy("supp_nation", "cust_nation", "yr")
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |       year(l_shipdate)::BIGINT AS yr,
             |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             |JOIN orders   ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey
             |JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
             |   OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    GQuery(
      "q8_market_share",
      (s, dir) => {
        // Q8 shape: one nation's share of a region's PROMO-part market
        // by order year — the ratio-of-conditional-sums pattern
        // (sum(CASE)/sum) computed in ONE aggregate pass, no self-join
        // of the filtered subset against the total.
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part").where(col("p_type") === "PROMO")
          .select("p_partkey")
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val n = t(s, dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
        val r = t(s, dir, "region").where(col("r_name") === "ASIA")
          .select("r_regionkey")
        val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n.as("nc")), col("c_nationkey") === col("nc.n_nationkey"))
          .join(broadcast(r), col("nc.n_regionkey") === col("r_regionkey"))
          .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n.as("ns")), col("s_nationkey") === col("ns.n_nationkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
          .agg(round(
            sum(when(col("ns.n_name") === "NATION_3", vol).otherwise(lit(0.0))) /
              sum(vol), 6).as("mkt_share"))
          .orderBy("yr")
      },
      Some("""SELECT year(o_orderdate)::BIGINT AS yr,
             |       round(sum(CASE WHEN ns.n_name = 'NATION_3'
             |                      THEN l_extendedprice * (1 - l_discount)
             |                      ELSE 0.0 END) /
             |             sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
             |FROM lineitem
             |JOIN part     ON l_partkey = p_partkey
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation nc ON c_nationkey = nc.n_nationkey
             |JOIN region   ON nc.n_regionkey = r_regionkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ns ON s_nationkey = ns.n_nationkey
             |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    GQuery(
      "q13_customer_distribution",
      (s, dir) => {
        // Q13 shape: order-count distribution over ALL customers — the
        // left join keeps zero-order customers (the bucket a plain join
        // silently drops), with the priority predicate INSIDE the join
        // condition, not a post-filter (a WHERE would turn the left
        // join back into an inner one).
        val c = t(s, dir, "customer").select("c_custkey")
        val o = t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
        c.join(o, col("c_custkey") === col("o_custkey") &&
            col("o_orderpriority") =!= "1-URGENT", "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""WITH co AS (SELECT c_custkey, count(o_orderkey) AS c_count
             |            FROM customer LEFT JOIN orders
             |              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |            GROUP BY 1)
             |SELECT c_count, count(*)::BIGINT AS custdist
             |FROM co GROUP BY 1
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    GQuery(
      "q17_small_quantity",
      (s, dir) => {
        // Q17 shape: revenue from orders of LESS than 20% of a part's
        // average quantity. The correlated scalar subquery becomes one
        // per-part average aggregate joined back (broadcast — it's
        // |parts in brand| rows). Quantities are integral, so the
        // per-part avg is exact-integer-sum / count: bit-identical
        // across engines and summation orders, making the 0.2·avg cut
        // hash-stable.
        val p = t(s, dir, "part")
          .where(col("p_brand") === "Brand#23" && col("p_size") <= 5)
          .select("p_partkey")
        val li = t(s, dir, "lineitem")
        val perPart = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey").as("ak"))
          .agg(avg("l_quantity").as("avg_qty"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .join(broadcast(perPart), col("l_partkey") === col("ak"))
          .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
          .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23' AND p_size <= 5
             |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
             |                    FROM lineitem l2
             |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin)),

    GQuery(
      "q19_disjunctive",
      (s, dir) => {
        // Q19 shape: revenue under an OR of three (brand, size range,
        // quantity range) conjunctions. The per-table halves of each
        // disjunct still push to the scans (Catalyst extracts
        // `p_size <= 15` ∨-common bounds and the join key), and the
        // residual OR evaluates post-join in codegen — the reference
        // test for disjunctive predicate handling.
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        val j = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        j.where(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    GQuery(
      "q21_waiting_supplier",
      (s, dir) => {
        // Q21 shape: suppliers who shipped LAST in multi-supplier
        // finished orders — EXISTS (another supplier in the order) as a
        // LEFT SEMI and NOT EXISTS (another supplier shipped later) as
        // a LEFT ANTI, both on orderkey with the supplier/date
        // predicates in the join conditions. The double-correlation
        // chain stays two keyed joins, no row explosion.
        val li = t(s, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
        val o = t(s, dir, "orders").where(col("o_orderstatus") === "F")
          .select("o_orderkey")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_name")
        val l1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"),
            col("l_shipdate").as("d1"))
        val semi = l1.join(li.as("l2"),
          col("k1") === col("l2.l_orderkey") && col("sk1") =!= col("l2.l_suppkey"),
          "left_semi")
        val anti = semi.join(li.as("l3"),
          col("k1") === col("l3.l_orderkey") && col("sk1") =!= col("l3.l_suppkey") &&
            col("l3.l_shipdate") > col("d1"),
          "left_anti")
        anti.join(broadcast(su), col("sk1") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), asc("s_name"))
          .limit(20)
      },
      Some("""SELECT s_name, count(*)::BIGINT AS numwait
             |FROM supplier
             |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
             |JOIN orders ON o_orderkey = l1.l_orderkey
             |WHERE o_orderstatus = 'F'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_shipdate > l1.l_shipdate)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)),

    GQuery(
      "q22_idle_accounts",
      (s, dir) => {
        // Q22 shape: above-average-balance customers with no urgent
        // orders, rolled up by nation. The scalar average is a 1-row
        // broadcast (never a single-partition window); the NOT EXISTS
        // is a LEFT ANTI against the urgent-order keys.
        val c = t(s, dir, "customer")
        val avgBal = c.where(col("c_acctbal") > 0)
          .agg(avg("c_acctbal").as("a"))
        val urgent = t(s, dir, "orders")
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        c.join(broadcast(avgBal))
          .where(col("c_acctbal") > col("a"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("totacct"))
          .orderBy("c_nationkey")
      },
      Some("""WITH ab AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
             |SELECT c_nationkey, count(*)::BIGINT AS n,
             |       round(sum(c_acctbal), 2) AS totacct
             |FROM customer, ab
             |WHERE c_acctbal > a
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
