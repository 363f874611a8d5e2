package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ScaleUp embedding content remap, pinned as pure-function laws.
  *
  * The r13 remap (circular rotation by replica index) had only 64
  * distinct images for a 64-dim vector, so embedding factors > 64
  * silently duplicated vectors and re-quadratized every ANN
  * measurement — the reason the ~500k-vector wave the r13 verdict asked
  * for could not be built. The signed permutation (π_r, s_r) has
  * 64!·2^64 images; these laws pin the properties the wave relies on.
  */
class ScaleUpRemapSpec extends AnyFunSuite {

  private val dims = 64

  test("replica 0 is the identity (sf0.1 results embed in every scaled run)") {
    val (p, s) = ScaleUp.signedPerm(0, dims)
    assert(p == (1 to dims) && s.forall(_ == 1.0))
  }

  test("each replica's remap is a signed permutation (norm-preserving by construction)") {
    (1L to 300L).foreach { r =>
      val (p, s) = ScaleUp.signedPerm(r, dims)
      assert(p.sorted == (1 to dims), s"replica $r: not a permutation of 1..$dims")
      assert(s.forall(x => x == 1.0 || x == -1.0), s"replica $r: non-±1 sign")
    }
  }

  test("remaps are deterministic per replica and pairwise distinct far past 64") {
    val a = (0L to 300L).map(r => ScaleUp.signedPerm(r, dims))
    val b = (0L to 300L).map(r => ScaleUp.signedPerm(r, dims))
    assert(a == b, "re-derivation must be byte-identical (re-runs replay)")
    assert(a.distinct.size == a.size,
      "301 replicas must have 301 distinct (perm, sign) pairs — the " +
        "rotation remap collapsed at 64")
  }
}
