package graft.operators

import graft.{GQuery, Tables}
import org.apache.spark.sql.functions._

/** Network-facing curation operators — the crawl-hygiene gates that sit at
  * the very front of a web-scale training-data pipeline, before any text
  * processing: domain blocklist filtering (the C4 / RefinedWeb "badwords
  * domains" step) and IP-range classification (bot/datacenter-traffic
  * triage over access logs).
  *
  * Both are deliberately built as BROADCAST EQUI-JOINS, not scans with a
  * LIKE/ OR-chain predicate: a production blocklist is 10⁵-10⁷ entries, far
  * past what an in-predicate or regex alternation compiles to, but a
  * kilobyte-to-megabytes broadcast table is nothing. The suffix-chain
  * explode (≤ label-count rows per host, bounded ~5) and the /8-bucket
  * residual check turn "does any list entry cover this row" into plain
  * hash lookups — per-row work is O(labels) / O(1), the corpus scan stays
  * map-side, and the only shuffle in either query is the final small
  * aggregate. That is the 100 TB plan: scan + broadcast hash join + one
  * keyed exchange over group-count rows.
  *
  * Reference provenance: the reference pipeline ingests raw crawl-shaped
  * JSON without any provenance gating (`HadoopKafkaConsumer.java:55-90`
  * keeps every well-formed record); these operators add the front-door
  * filters any corpus built from such a feed needs.
  */
object NetOps {

  /** All >=2-label suffixes of a dotted host — the blocklist probe keys
    * ("a.b.c.d" → ["a.b.c.d", "b.c.d", "c.d"]). A host is blocked iff
    * any of these equals a blocklist entry, which is exactly
    * host == d OR host endsWith "." + d (PropertySpec pins the
    * equivalence over generated hosts/blocklists).
    */
  def hostSuffixes(host: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val labels = split(host, "\\.")
    // the single-label guard matters: sequence(0, -1) would DESCEND and
    // fabricate garbage suffixes for a bare TLD / empty host
    when(size(labels) >= 2,
      transform(
        sequence(lit(0), size(labels) - 2),
        i => array_join(slice(labels, i + 1, size(labels) - i), ".")))
      .otherwise(array().cast("array<string>"))
  }

  /** Suffix-blocklist entries: a listed domain blocks the exact host and
    * every subdomain of it (host == d OR host ends with "." + d).
    */
  private val blockedDomains =
    Seq("badsite.net", "tracker3.example.com", "cdn.assets.io")

  /** CIDR table rows precomputed at plan-build time so both engines join
    * on identical integer literals: (label, first-octet bucket,
    * 2^(32-prefix) divisor, network-prefix quotient).
    * All prefixes here are >= 8, so each range lives inside exactly one
    * /8 bucket and the blocklist join is a pure equi-join on the first
    * octet with a one-division residual check. (A prefix < 8 range would
    * expand to 2^(8-prefix) bucket rows — still a tiny broadcast.)
    */
  private val cidrs: Seq[(String, Long, Long, Long)] = {
    def row(label: String, o1: Long, o2: Long, o3: Long, prefix: Int) = {
      val net = o1 * 16777216L + o2 * 65536L + o3 * 256L
      val div = 1L << (32 - prefix)
      (label, o1, div, net / div)
    }
    Seq(
      row("10.0.0.0/8", 10, 0, 0, 8),
      row("172.16.0.0/12", 172, 16, 0, 12),
      row("192.168.0.0/16", 192, 168, 0, 16),
      row("203.0.113.0/24", 203, 0, 113, 24))
  }

  val all: Seq[GQuery] = Seq(

    GQuery(
      "curate_domain_blocklist",
      (s, dir) => {
        import s.implicits._
        // DOMAIN-BLOCKLIST gate: drop every document whose crawl host is
        // a listed domain OR any subdomain of one. Hosts are derived
        // deterministically from doc_id (registrable domain by
        // (id div 7) % 4, subdomain shape by (id div 3) % 3), so the
        // corpus contains exact hits
        // (badsite.net itself), subdomain hits (cdn.badsite.net,
        // tracker3.example.com), and near-misses that share a suffix
        // with no list entry (tracker1.example.com) — the differential
        // exercises suffix semantics, not string equality.
        //
        // Scale shape: each host explodes into its >=2-label suffix
        // chain (bounded by label count, here <=3), which left-joins the
        // broadcast blocklist and immediately re-aggregates to one
        // hit-flag row per doc. The LIKE-'%.'||d formulation the oracle
        // uses would be a nested-loop over the whole list per row; the
        // suffix chain makes it one hash probe per label.
        // div-based residues (not plain doc_id mod): the testdata assigns
        // source by a small doc_id modulus, so mod-derived hosts would be
        // CONSTANT within a source and the per-source breakdown
        // degenerate (all-blocked / none-blocked rows); integer division
        // decorrelates from any doc_id mod class
        val d = col("doc_id")
        val host = concat(
          when(expr("doc_id div 3") % 3 === 1,
            concat(lit("tracker"), (expr("doc_id div 11") % 5).cast("string"), lit(".")))
            .when(expr("doc_id div 3") % 3 === 2, lit("cdn."))
            .otherwise(lit("")),
          when(expr("doc_id div 7") % 4 === 0, lit("example.com"))
            .when(expr("doc_id div 7") % 4 === 1, lit("badsite.net"))
            .when(expr("doc_id div 7") % 4 === 2, lit("assets.io"))
            .otherwise(lit("goodhost.org")))
        val docs = Tables.t(s, dir, "documents")
          .select(d, col("source"), host.as("host"))
        val suffixes = hostSuffixes(col("host"))
        docs
          .select(d, col("source"), explode(suffixes).as("suffix"))
          .join(
            broadcast(blockedDomains.toDF("suffix").withColumn("hit", lit(1))),
            Seq("suffix"), "left")
          // collapse the suffix-chain rows back to one row per doc BEFORE
          // the per-source rollup: a host matching two list entries still
          // counts once, the exploded rows partial-aggregate map-side
          // (they share an input partition), and — unlike a join back to
          // the doc table — nothing here ever sort-merges two large sides
          .groupBy("doc_id", "source")
          .agg(max(col("hit")).as("hit"))
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            count(col("hit")).as("n_blocked"),
            (count(lit(1)) - count(col("hit"))).as("n_kept"))
          .orderBy("source")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, source,
             |    CASE WHEN (doc_id // 3) % 3 = 1 THEN 'tracker' || ((doc_id // 11) % 5) || '.'
             |         WHEN (doc_id // 3) % 3 = 2 THEN 'cdn.'
             |         ELSE '' END ||
             |    CASE WHEN (doc_id // 7) % 4 = 0 THEN 'example.com'
             |         WHEN (doc_id // 7) % 4 = 1 THEN 'badsite.net'
             |         WHEN (doc_id // 7) % 4 = 2 THEN 'assets.io'
             |         ELSE 'goodhost.org' END AS host
             |  FROM documents),
             |b(domain) AS (VALUES ('badsite.net'), ('tracker3.example.com'), ('cdn.assets.io')),
             |blocked AS (
             |  SELECT DISTINCT h.doc_id FROM h JOIN b
             |    ON h.host = b.domain OR h.host LIKE '%.' || b.domain)
             |SELECT h.source,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(COUNT(bl.doc_id) AS BIGINT) AS n_blocked,
             |       CAST(COUNT(*) - COUNT(bl.doc_id) AS BIGINT) AS n_kept
             |FROM h LEFT JOIN blocked bl ON h.doc_id = bl.doc_id
             |GROUP BY h.source ORDER BY h.source""".stripMargin)),

    GQuery(
      "scalar_ip_cidr",
      (s, dir) => {
        import s.implicits._
        // IP-CIDR classification: parse a dotted-quad client IP and
        // attribute each event to the first matching CIDR range (ranges
        // here are disjoint) or 'unlisted'. The dotted string is BUILT
        // from event_id residues and then PARSED back (split + cast +
        // positional arithmetic) so the differential covers the parse,
        // not just the arithmetic; octet derivations are crafted so every
        // range has a real hit population (172.16/12 only when the second
        // octet lands in 16..31, 192.168/16 only on o2=168, 203.0.113/24
        // only on the crafted o2=0/o3=113 rows) plus near-miss rows that
        // share the first octet but fail the residual check.
        //
        // Scale shape: the CIDR list joins as a broadcast EQUI-join on
        // the /8 bucket (first octet) with a single integer-division
        // residual comparison — not a BroadcastNestedLoop over range
        // predicates — so a 10⁶-range bogon/datacenter list is still one
        // hash probe per row. Integer division (`div`) keeps both
        // engines in exact int64 arithmetic.
        val e = col("event_id")
        val o1 = when(e % 10 === 0, lit(10L))
          .when(e % 10 === 1, lit(172L))
          .when(e % 10 === 2, lit(192L))
          .when(e % 10 === 3, lit(203L))
          .otherwise(lit(20L) + (e % 100))
        // the crafted-hit conditions mix e%10 with (e div 10) residues —
        // a same-modulus pair like (e%10==1 AND e%2==0) is vacuously
        // false (e ending in 1 is odd), a bug the first cut of this
        // fixture actually had
        val o2 = when(e % 10 === 1 && expr("event_id div 10") % 2 === 0, lit(16L) + (e % 16))
          .when(e % 10 === 2 && e % 3 === 0, lit(168L))
          .when(e % 10 === 3 && expr("event_id div 10") % 4 === 0, lit(0L))
          .otherwise(lit(200L) + (e % 50))
        val o3 = when(e % 10 === 3 && expr("event_id div 10") % 4 === 0, lit(113L))
          .otherwise(e % 200)
        val o4 = e % 251
        val events = Tables.t(s, dir, "events")
          .select(e, col("user_id"),
            concat_ws(".", o1.cast("string"), o2.cast("string"),
              o3.cast("string"), o4.cast("string")).as("ip"))
        val parts = split(col("ip"), "\\.")
        val parsed = events.select(
          col("user_id"),
          parts.getItem(0).cast("long").as("o1"),
          (parts.getItem(0).cast("long") * 16777216L +
            parts.getItem(1).cast("long") * 65536L +
            parts.getItem(2).cast("long") * 256L +
            parts.getItem(3).cast("long")).as("ip_int"))
        val cidrDf = broadcast(cidrs.toDF("cidr", "o1", "divisor", "net_div"))
        parsed
          .join(cidrDf,
            parsed("o1") === cidrDf("o1") &&
              expr("ip_int div divisor") === cidrDf("net_div"),
            "left")
          .groupBy(coalesce(col("cidr"), lit("unlisted")).as("cidr"))
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("cidr")
      },
      Some("""WITH ev AS (
             |  SELECT event_id AS e, user_id FROM events),
             |oct AS (
             |  SELECT user_id,
             |    CASE WHEN e % 10 = 0 THEN 10 WHEN e % 10 = 1 THEN 172
             |         WHEN e % 10 = 2 THEN 192 WHEN e % 10 = 3 THEN 203
             |         ELSE 20 + (e % 100) END AS o1,
             |    CASE WHEN e % 10 = 1 AND (e // 10) % 2 = 0 THEN 16 + (e % 16)
             |         WHEN e % 10 = 2 AND e % 3 = 0 THEN 168
             |         WHEN e % 10 = 3 AND (e // 10) % 4 = 0 THEN 0
             |         ELSE 200 + (e % 50) END AS o2,
             |    CASE WHEN e % 10 = 3 AND (e // 10) % 4 = 0 THEN 113 ELSE e % 200 END AS o3,
             |    e % 251 AS o4
             |  FROM ev),
             |ip AS (
             |  SELECT user_id, o1 || '.' || o2 || '.' || o3 || '.' || o4 AS ip FROM oct),
             |parsed AS (
             |  SELECT user_id,
             |    CAST(string_split(ip, '.')[1] AS BIGINT) AS o1,
             |    CAST(string_split(ip, '.')[1] AS BIGINT) * 16777216 +
             |    CAST(string_split(ip, '.')[2] AS BIGINT) * 65536 +
             |    CAST(string_split(ip, '.')[3] AS BIGINT) * 256 +
             |    CAST(string_split(ip, '.')[4] AS BIGINT) AS ip_int
             |  FROM ip),
             |cidr(cidr, o1, divisor, net_div) AS (VALUES
             |  ('10.0.0.0/8',    10, 16777216, 10),
             |  ('172.16.0.0/12', 172, 1048576, 2753),
             |  ('192.168.0.0/16', 192, 65536, 49320),
             |  ('203.0.113.0/24', 203, 256, 13303921)),
             |matched AS (
             |  SELECT p.user_id, c.cidr
             |  FROM parsed p LEFT JOIN cidr c
             |    ON p.o1 = c.o1 AND p.ip_int // c.divisor = c.net_div)
             |SELECT COALESCE(cidr, 'unlisted') AS cidr,
             |       CAST(COUNT(*) AS BIGINT) AS n_events,
             |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM matched GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
