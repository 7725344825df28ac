package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.relational.StatsProjection

/** Property-based invariants (SURVEY §5): pure-function properties run
  * under ScalaCheck directly (no scalatestplus bridge in the offline
  * cache); distributed properties are sampled in dedicated specs.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val smallVec = Gen.nonEmptyListOf(Gen.choose(-1e6, 1e6))

  test("quantileType7: bounded by min/max, monotone in q, endpoint-exact") {
    check("quantile", Prop.forAll(smallVec, Gen.choose(0.0, 1.0), Gen.choose(0.0, 1.0)) {
      (xs, q1, q2) =>
        val v = xs.map(x => math.rint(x) / 16.0) // dyadic → exact compares
        val (lo, hi) = (math.min(q1, q2), math.max(q1, q2))
        val a = StatsProjection.quantileType7(v, lo)
        val b = StatsProjection.quantileType7(v, hi)
        a >= v.min && b <= v.max && a <= b &&
          StatsProjection.quantileType7(v, 0.0) == v.min &&
          StatsProjection.quantileType7(v, 1.0) == v.max
    })
  }

  test("keyHash: stable and in range for any nonnegative key") {
    import graft.util.Parity
    check("keyHash", Prop.forAll(Gen.choose(0L, Long.MaxValue)) { k =>
      val h = (k % Parity.HashMod) * Parity.HashPrime % Parity.HashMod
      val h2 = (k % Parity.HashMod) * Parity.HashPrime % Parity.HashMod
      h >= 0 && h < Parity.HashMod && h == h2
    })
  }

  test("raising the stats threshold never adds columns (mask monotonicity)") {
    check("mask", Prop.forAll(Gen.listOfN(6, Gen.choose(0.0, 100.0))) { means =>
      val lowKept = means.zipWithIndex.filter(_._1 > 10.0).map(_._2)
      val highKept = means.zipWithIndex.filter(_._1 > 50.0).map(_._2)
      highKept.toSet.subsetOf(lowKept.toSet)
    })
  }

  test("LCG planes are in [-1,1] and deterministic") {
    import graft.similarity.Similarity.Planes
    check("planes", Prop.forAll(Gen.choose(0, 64), Gen.choose(0, 1024)) { (p, d) =>
      val v = Planes.value(p, d, 64)
      v >= -1.0 && v <= 1.0 && v == Planes.value(p, d, 64)
    })
  }

  test("Bloom: never a false negative, for arbitrary member sets") {
    import org.apache.spark.sql.graft.Bloom
    check("bloom", Prop.forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue))) {
      keys =>
        val bits = Bloom.build(keys.toArray)
        keys.forall(Bloom.mightContain(bits, _))
    })
  }

  test("z-value interleave is invertible (no two points share a z)") {
    import graft.relational.ZOrder
    check("zorder", Prop.forAll(Gen.choose(0L, 255L), Gen.choose(0L, 255L),
        Gen.choose(0L, 255L), Gen.choose(0L, 255L)) { (x1, y1, x2, y2) =>
      val same = x1 == x2 && y1 == y2
      (ZOrder.ref(x1, y1, 8) == ZOrder.ref(x2, y2, 8)) == same
    })
  }
}
