package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 wave 8: clickstream path mining, weighted sampling without
  * replacement, rank-with-ties top-k semantics, and percent-of-parent
  * hierarchy shares. All DuckDB-oracle-checked.
  */
object PathOps {

  val all: Seq[GQuery] = Seq(

    GQuery(
      "events_top_paths",
      (s, dir) => {
        // PATH MINING: most common 3-step event sequences (the Sankey /
        // user-journey readout). Two lead() columns over one per-user
        // time sort turn every event into its 3-gram — no self-joins,
        // no per-user collect; path counting is one map-side-combined
        // aggregate over |paths| ≤ |event types|³ keys; TakeOrdered
        // caps the result at 10.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.t(s, dir, "events")
          .select(col("user_id"), col("event_type").as("e0"),
            lead("event_type", 1).over(w).as("e1"),
            lead("event_type", 2).over(w).as("e2"))
          .where(col("e2").isNotNull)
          .select(concat_ws(">", col("e0"), col("e1"), col("e2")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("c"))
          .orderBy(desc("c"), asc("path"))
          .limit(10)
      },
      Some("""WITH s AS (SELECT user_id, event_type AS e0,
             |                  lead(event_type, 1) OVER w AS e1,
             |                  lead(event_type, 2) OVER w AS e2
             |           FROM events
             |           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT e0 || '>' || e1 || '>' || e2 AS path, count(*)::BIGINT AS c
             |FROM s WHERE e2 IS NOT NULL
             |GROUP BY 1 ORDER BY c DESC, path LIMIT 10""".stripMargin)),

    GQuery(
      "sample_weighted",
      (s, dir) => {
        // WEIGHTED sampling without replacement (Efraimidis–Spirakis
        // A-ES): key = u^(1/w) with u a DETERMINISTIC hash-uniform —
        // the top-k by key is a valid weight-proportional sample, and
        // because u comes from the portable md5 hash (no RNG), the
        // sample is reproducible across runs, partitionings, and
        // engines. At 100 TB this is a map-only key projection +
        // TakeOrdered (per-partition heaps) — the distributed form of
        // weighted reservoir sampling.
        val u = (conv(substring(md5(
          concat(lit("ws:"), col("doc_id").cast("string")).cast("binary")),
          1, 8), 16, 10).cast("double") + 1) / 4294967296.0
        Tables.t(s, dir, "documents")
          .where(col("n_chars") > 0)
          .select(col("doc_id"), pow(u, lit(1.0) / col("n_chars")).as("k"))
          .orderBy(desc("k"), asc("doc_id"))
          .limit(10)
          .select(col("doc_id"), round(col("k"), 6).as("k"))
      },
      Some("""WITH h AS (SELECT doc_id, n_chars,
             |                  (('0x' || substring(md5('ws:' || doc_id::VARCHAR), 1, 8))::BIGINT + 1)
             |                    / 4294967296.0 AS u
             |           FROM documents WHERE n_chars > 0)
             |SELECT doc_id, round(pow(u, 1.0 / n_chars), 6) AS k
             |FROM h ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id LIMIT 10""".stripMargin)),

    GQuery(
      "window_topk_ties",
      (s, dir) => {
        // Top-k WITH TIES (rank(), not row_number()): every row tied
        // with the k-th survives — the semantics reports need when
        // "top 3 quantities" means all rows at those quantities. Same
        // one-exchange window plan; WindowGroupLimit still prunes with
        // rank()'s tie-aware limit.
        val w = Window.partitionBy("l_returnflag").orderBy(desc("l_quantity"))
        Tables.t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty"),
            rank().over(w).cast("long").as("rk"))
          .where(col("rk") <= 3)
          .orderBy("l_returnflag", "rk", "l_orderkey", "l_linenumber")
      },
      Some("""SELECT l_returnflag, l_orderkey, l_linenumber,
             |       l_quantity::BIGINT AS qty,
             |       rank() OVER (PARTITION BY l_returnflag
             |                    ORDER BY l_quantity DESC)::BIGINT AS rk
             |FROM lineitem QUALIFY rk <= 3
             |ORDER BY l_returnflag, rk, l_orderkey, l_linenumber""".stripMargin)),

    GQuery(
      "set_union_by_name",
      (s, dir) => {
        // Schema-evolution union: two relations with DIFFERENT column
        // sets combine BY NAME (missing columns null-filled) — the
        // heterogeneous-snapshot append every evolving pipeline needs,
        // where positional UNION would silently misalign columns.
        val a = Tables.t(s, dir, "orders")
          .where(col("o_orderkey") % 100 === 0)
          .select(col("o_custkey").as("k"), col("o_totalprice").as("amount"),
            col("o_orderpriority").as("prio"))
        val b = Tables.t(s, dir, "customer")
          .where(col("c_custkey") % 100 === 0)
          .select(col("c_custkey").as("k"), col("c_acctbal").as("amount"))
        a.unionByName(b, allowMissingColumns = true)
          .agg(count(lit(1)).as("n"), count(col("prio")).as("with_prio"),
            round(sum("amount"), 2).as("total"))
      },
      Some("""WITH a AS (SELECT o_custkey AS k, o_totalprice AS amount,
             |                  o_orderpriority AS prio
             |           FROM orders WHERE o_orderkey % 100 = 0),
             | b AS (SELECT c_custkey AS k, c_acctbal AS amount
             |       FROM customer WHERE c_custkey % 100 = 0),
             | u AS (SELECT * FROM a UNION ALL BY NAME SELECT * FROM b)
             |SELECT count(*)::BIGINT AS n, count(prio)::BIGINT AS with_prio,
             |       round(sum(amount), 2) AS total
             |FROM u""".stripMargin)),

    GQuery(
      "scalar_regexp_extract_all",
      (s, dir) => {
        // regexp_extract_all: EVERY match per row exploded to rows —
        // the multi-match extraction the single-match regexp_extract
        // can't express (mentions, tags, all URLs in a doc). Map-side
        // explode + one count aggregate.
        Tables.t(s, dir, "documents")
          .select(col("doc_id"),
            explode(regexp_extract_all(col("text"),
              lit("\\b\\w*(ow|ta)\\w*\\b"), lit(0))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n"))
          .orderBy("w")
      },
      Some("""SELECT w, count(*)::BIGINT AS n
             |FROM (SELECT doc_id,
             |             unnest(regexp_extract_all(text, '\b\w*(ow|ta)\w*\b')) AS w
             |      FROM documents)
             |GROUP BY w ORDER BY w""".stripMargin)),

    GQuery(
      "agg_hierarchy_share",
      (s, dir) => {
        // PERCENT-OF-PARENT: nation revenue as a share of its region —
        // the hierarchical contribution readout. Child aggregates
        // compute once (exact decimal money); the parent total is a
        // window over |nations| rows partitioned by region — never a
        // second scan, never a global single-partition window.
        val disc = col("o_totalprice").cast("decimal(18,2)")
        val rn = Tables.t(s, dir, "orders")
          .join(Tables.t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum(disc).as("rev"))
        rn.select(col("r_name"), col("n_name"),
            col("rev").cast("string").as("rev"),
            round(col("rev").cast("double") /
              sum("rev").over(Window.partitionBy("r_name")).cast("double"), 6)
              .as("share"))
          .orderBy("r_name", "n_name")
      },
      Some("""WITH rn AS (SELECT r_name, n_name,
             |                   sum(o_totalprice::DECIMAL(18,2)) AS rev
             |            FROM orders
             |            JOIN customer ON o_custkey = c_custkey
             |            JOIN nation ON c_nationkey = n_nationkey
             |            JOIN region ON n_regionkey = r_regionkey
             |            GROUP BY 1, 2)
             |SELECT r_name, n_name, CAST(rev AS VARCHAR) AS rev,
             |       round(rev::DOUBLE /
             |             (sum(rev) OVER (PARTITION BY r_name))::DOUBLE, 6) AS share
             |FROM rn ORDER BY r_name, n_name""".stripMargin))
  )
}
