package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Welford

/** Property-based invariants (SURVEY §5 test plan #4) — driver-side
  * algebra only: the streaming accumulators must form a commutative
  * monoid for merge-anywhere correctness. ScalaCheck generators are
  * sampled with fixed seeds (deterministic; no scalatest bridge in the
  * offline cache).
  */
class PropertySpec extends AnyFunSuite {

  private val obs: Gen[(Double, Double)] = for {
    y <- Gen.choose(-1e3, 1e3)
    p <- Gen.choose(-1e3, 1e3)
  } yield (y, p)

  private val obsList: Gen[List[(Double, Double)]] = Gen.listOf(obs)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def fold(xs: Seq[(Double, Double)]): Welford.Buf =
    xs.foldLeft(Welford.Buf.zero)((b, o) => b.update(o._1, o._2))

  private def close(a: Double, b: Double): Boolean = {
    val scale = math.max(1.0, math.max(math.abs(a), math.abs(b)))
    math.abs(a - b) / scale < 1e-9
  }

  private def bufClose(a: Welford.Buf, b: Welford.Buf): Boolean =
    a.n == b.n && close(a.mean, b.mean) && close(a.m2, b.m2) &&
      close(a.ssRes, b.ssRes) && close(a.sumAbs, b.sumAbs)

  test("Welford merge at ANY split point ≡ sequential fold (200 cases)") {
    for (s <- 0 until 200) {
      val xs = sample(obsList, s)
      val k = if (xs.isEmpty) 0 else sample(Gen.choose(0, xs.size), s + 10000)
      val (l, r) = xs.splitAt(k)
      assert(bufClose(fold(l).merge(fold(r)), fold(xs)), s"seed $s split $k")
    }
  }

  test("Welford merge is commutative (200 cases)") {
    for (s <- 0 until 200) {
      val (a, b) = (sample(obsList, s), sample(obsList, s + 20000))
      assert(bufClose(fold(a).merge(fold(b)), fold(b).merge(fold(a))), s"seed $s")
    }
  }

  test("Welford merge is associative (200 cases)") {
    for (s <- 0 until 200) {
      val (a, b, c) =
        (sample(obsList, s), sample(obsList, s + 30000), sample(obsList, s + 40000))
      assert(bufClose(fold(a).merge(fold(b)).merge(fold(c)),
        fold(a).merge(fold(b).merge(fold(c)))), s"seed $s")
    }
  }

  test("zero is the merge identity") {
    for (s <- 0 until 100) {
      val f = fold(sample(obsList, s))
      assert(bufClose(f.merge(Welford.Buf.zero), f))
      assert(bufClose(Welford.Buf.zero.merge(f), f))
    }
  }

  test("running MAE non-negative; R² defined only with variance") {
    for (s <- 0 until 200) {
      val xs = sample(obsList, s)
      if (xs.nonEmpty) {
        val f = fold(xs)
        assert(f.mae.exists(_ >= 0.0))
        if (f.n >= 2 && f.m2 > 0) assert(f.r2.isDefined)
      }
    }
  }

  test("minhash mix constants are deterministic and well-formed") {
    val m = graft.dedup.Dedup.getClass.getDeclaredMethods
      .find(_.getName == "mixConstants").get
    m.setAccessible(true)
    def consts(k: Int, seed: Long) =
      m.invoke(graft.dedup.Dedup, Int.box(k), Long.box(seed))
        .asInstanceOf[Seq[(Long, Long)]]
    val c1 = consts(128, 42L)
    assert(c1 === consts(128, 42L)) // deterministic
    assert(c1.map(_._1).distinct.size === 128)
    c1.foreach { case (a, b) =>
      // 'a' odd and < 2^31 so a·h32 never overflows a signed long
      assert(a % 2 === 1 && a > 0 && a < (1L << 31))
      assert(b >= 0 && b <= 0xffffffffL)
    }
  }
}
