package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Scale stress for the production dedup path: a synthesized 20k-doc
  * corpus (40× the fixture) with 10k PLANTED near-dup pairs — each body
  * appears twice, once truncated by a token — plus per-replica unique
  * token tails so unrelated replicas share almost nothing. Gates:
  * recall on planted pairs, precision of the verify step, and
  * end-to-end clustering of the pair graph. This is the evidence the
  * sf fixtures can't give: the LSH band join and the CC fixpoint at a
  * corpus size where an O(N²) formulation would already be 200M pairs.
  */
class DedupScaleSpec extends SparkSpec {
  import spark.implicits._

  test("fast MinHash-LSH finds planted near-dups in a 20k-doc corpus; CC pairs them up") {
    val bodies = Tables.t(spark, sf, "documents")
      .select(col("doc_id").as("base_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val rnd = new scala.util.Random(19)
    // 10k bodies: base text + 2×|base| replica-unique tokens (tail
    // dominates, so two replicas of the same base sit at J ≈ 0.2 —
    // well under threshold — regardless of base length); two copies
    // each (B-copy loses its last token → planted pair at J ≈ 1)
    val docs = (0 until 10000).flatMap { i =>
      val (_, base) = bodies(i % bodies.length)
      val nTail = math.max(20, base.split(' ').count(_.nonEmpty) * 2)
      val uniq = (0 until nTail).map(_ => s"u${i}_${rnd.nextInt(1000000)}").mkString(" ")
      val body = s"$base $uniq"
      val truncated = body.split(' ').dropRight(1).mkString(" ")
      Seq((i.toLong * 2, body), (i.toLong * 2 + 1, truncated))
    }.toDF("doc_id", "text")

    val pairs = DedupOps.minhashLshPairsFast(docs, n = 3, k = 32, bands = 8, minJ = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 10000).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val recall = planted.intersect(pairs).size.toDouble / planted.size
    assert(recall >= 0.95, s"planted-pair recall $recall (found ${pairs.size} pairs)")

    // verify step guarantee: everything reported really is >= 0.5 exact
    // Jaccard, so any extra pairs are genuine near-dups (fixture bodies
    // recur across replicas only in their shared base prefix, which the
    // unique tails dilute below 0.5 — tolerate a small margin)
    assert(pairs.size <= planted.size * 1.05,
      s"unexpected extra pairs: ${pairs.size} vs ${planted.size} planted")

    // end-to-end: the pair graph clusters into 2-doc components
    val labels = DedupOps.connectedComponentsStar(
        pairs.toSeq.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect()
    val bySize = labels.groupBy(_._2).values.map(_.length)
    assert(bySize.forall(_ == 2), "every planted cluster must have exactly 2 docs")
  }

  test("hot-gram cap kills a planted viral shingle's pair explosion without losing planted pairs") {
    val rnd = new scala.util.Random(23)
    // 2k docs: each is 30 unique tokens + ONE shared viral 5-token
    // boilerplate ("legal footer") appended to EVERY doc. Uncapped,
    // the footer's 3 interior shingles have df = 2000 → posting lists
    // of 2000 → ~2M candidate pairs from boilerplate alone. 200 docs
    // also get a true near-dup twin (body copied, last token dropped).
    val footer = "all rights reserved contact support"
    val docs = (0 until 2000).flatMap { i =>
      val body = (0 until 30).map(_ => s"w${i}_${rnd.nextInt(1000000)}").mkString(" ")
      val full = s"$body $footer"
      if (i < 200) {
        val twin = full.split(' ').dropRight(1).mkString(" ")
        Seq((i.toLong * 2, full), (i.toLong * 2 + 1, twin))
      } else Seq((i.toLong * 2, full))
    }.toDF("doc_id", "text")

    val capped = DedupOps.jaccardPairsCapped(docs, n = 3, minJ = 0.5, maxDf = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 200).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    assert(planted.subsetOf(capped),
      s"cap must not lose planted near-dups: found ${planted.intersect(capped).size}/200")
    // the footer must not manufacture pairs between unrelated docs
    val spurious = capped -- planted
    assert(spurious.isEmpty,
      s"boilerplate-only pairs must die with the hot grams: ${spurious.take(5)}")
  }

  test("adaptive SimHash width: thresholds step, and each width equals its fixed twin") {
    // the width rule itself — smallest half-count whose 4 byte-per-half
    // bands keep expected bucket occupancy <= 4, capped at 4 halves
    assert(DedupOps.simhashHalves(500) == 1)
    assert(DedupOps.simhashHalves(1024) == 1)
    assert(DedupOps.simhashHalves(1025) == 2)
    assert(DedupOps.simhashHalves(5000) == 2)
    assert(DedupOps.simhashHalves(262145) == 3)
    assert(DedupOps.simhashHalves(100000000L) == 4)

    // pigeonhole completeness makes banding layout invisible in the
    // RESULT: at any width the scaled form must return exactly the
    // fixed form's pairs over the same signature bits — 1 half vs
    // dedup_simhash's 4×8-bit bands on the sf fixture (500 docs → the
    // adaptive rule picks 1), and 2 halves vs dedup_simhash_wide's
    // contiguous 16-bit bands on a 40×-replicated corpus (20k docs →
    // the rule picks 2, so the adaptivity is LIVE in this test).
    val base = Tables.t(spark, sf, "documents").select("doc_id", "text")
    val narrow = DedupOps.simhashPairsScaled(base, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val fixedNarrow = DedupOps.simhashPairs(base, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(narrow == fixedNarrow,
      s"1-half scaled form must equal simhashPairs: ${narrow.size} vs ${fixedNarrow.size}")

    val big = base.as[(Long, String)].collect().toSeq
    val corpus = big.flatMap { case (id, t) =>
      (0 until 40).map(j => (j * 1000L + id, s"$t tail${j}_$id"))
    }.toDF("doc_id", "text")
    assert(corpus.count() == 20000L)
    val scaledWide = DedupOps.simhashPairsScaled(corpus, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    val fixedWide = DedupOps.simhashPairsWide(corpus, maxHamming = 3)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(scaledWide == fixedWide,
      s"2-half scaled form must equal simhashPairsWide: ${scaledWide.size} vs ${fixedWide.size}")
  }
}
