package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Randomized cross-checks for the round-5 eval/sketch operators:
  * each distributed result must equal an independent DRIVER-SIDE
  * reference implementation on seeded random fixtures (small integer
  * domains force heavy ties — the hard case for rank-based metrics).
  */
class Round5PropertySpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Tie-averaged DOUBLED ranks of xs (ascending), driver-side. */
  private def ranks2(xs: Seq[Double]): Map[Double, Long] = {
    val sorted = xs.sorted
    xs.distinct.map { v =>
      val lo = sorted.indexWhere(_ == v) + 1L
      val hi = sorted.lastIndexWhere(_ == v) + 1L
      v -> (lo + hi) // doubled average rank
    }.toMap
  }

  test("spearman ≡ driver reference on 8 random tied fixtures") {
    for (seed <- 0 until 8) {
      val rnd = new Random(seed)
      val n = 3 + rnd.nextInt(38)
      val data = Seq.fill(n)((rnd.nextInt(6).toDouble, rnd.nextInt(6).toDouble))
      val got = graft.ml.Eval
        .spearman(data.toDF("x", "y"), col("x"), col("y"))
        .select("spearman_rho").as[Option[Double]].head()
      // reference: Pearson over doubled average ranks, same pinned order
      val (xs, ys) = data.unzip
      val (rx, ry) = (ranks2(xs), ranks2(ys))
      val ra = xs.map(rx)
      val rb = ys.map(ry)
      val (sa, sb) = (ra.sum, rb.sum)
      val saa = ra.map(r => r * r).sum
      val sbb = rb.map(r => r * r).sum
      val sab = ra.zip(rb).map { case (a, b) => a * b }.sum
      val nn = n.toDouble
      val va = nn * saa.toDouble - sa.toDouble * sa.toDouble
      val vb = nn * sbb.toDouble - sb.toDouble * sb.toDouble
      val want =
        if (va > 0 && vb > 0)
          Some(round6((nn * sab.toDouble - sa.toDouble * sb.toDouble) /
            (math.sqrt(va) * math.sqrt(vb))))
        else None
      assert(got === want, s"seed $seed n $n")
    }
  }

  test("aucRoc ≡ driver reference on 8 random tied fixtures") {
    for (seed <- 100 until 108) {
      val rnd = new Random(seed)
      val n = 3 + rnd.nextInt(38)
      val data = Seq.fill(n)((rnd.nextInt(5) / 10.0, rnd.nextBoolean()))
      val got = graft.ml.Eval
        .aucRoc(data.toDF("s", "y"), col("s"), col("y"))
        .select("auc").as[Option[Double]].head()
      val rk = ranks2(data.map(_._1))
      val nPos = data.count(_._2).toLong
      val nNeg = n - nPos
      val r2 = data.filter(_._2).map(d => rk(d._1)).sum
      val want =
        if (nPos > 0 && nNeg > 0)
          Some(round6((r2 - nPos * (nPos + 1)).toDouble /
            (nPos.toDouble * nNeg.toDouble * 2.0)))
        else None
      assert(got === want, s"seed $seed n $n")
    }
  }

  test("CountMin never undercounts on 6 random multisets, any geometry") {
    for (seed <- 200 until 206) {
      val rnd = new Random(seed)
      val items = Seq.fill(30 + rnd.nextInt(70))(s"k${rnd.nextInt(12)}")
      val (depth, width) = (2 + rnd.nextInt(3), 2 << rnd.nextInt(4))
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sk = graft.sketch.CountMin.sketch(items.toDF("v"), col("v"), depth, width)
      val est = graft.sketch.CountMin
        .estimate(sk, exact.keys.toSeq.toDF("v"), col("v"), depth, width)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (k, c) =>
        assert(est(k) >= c, s"seed $seed $k d$depth w$width")
      }
      // total mass per sketch row is conserved: min estimate can never
      // exceed the multiset size either
      est.values.foreach(v => assert(v <= items.size))
    }
  }

  test("coverageCurve: monotone in k, saturates at vocab, mass-exact") {
    for (seed <- 300 until 306) {
      val rnd = new Random(seed)
      val text = Seq.fill(20 + rnd.nextInt(80))(s"w${rnd.nextInt(9)}").mkString(" ")
      val counts = text.split(" ").groupBy(identity).view.mapValues(_.size.toLong)
        .values.toSeq.sorted(Ordering[Long].reverse)
      val rows = graft.text.Corpus
        .coverageCurve(Seq((1L, text)).toDF("doc_id", "text"),
          col("text"), ks = Seq(1, 2, 4, 8, 16))
        .as[(Long, Long, Long, Long, Double)].collect()
      val shares = rows.map(_._5)
      assert(shares.zip(shares.tail).forall { case (a, b) => a <= b }, s"seed $seed")
      rows.foreach { case (k, used, covered, total, _) =>
        assert(total === counts.sum)
        assert(used === math.min(k, counts.size))
        assert(covered === counts.take(k.toInt).sum, s"seed $seed k $k")
      }
    }
  }

  test("brierLogLoss ≡ driver reference on 6 random fixtures") {
    for (seed <- 400 until 406) {
      val rnd = new Random(seed)
      val n = 2 + rnd.nextInt(30)
      val data = Seq.fill(n)((rnd.nextInt(101) / 100.0, rnd.nextBoolean()))
      val got = graft.ml.Eval
        .brierLogLoss(data.toDF("p", "y"), col("p"), col("y"))
        .as[(Long, Long, Double, Double)].head()
      val pm = data.map { case (p, _) => math.round(p * 1000000.0) }
      val sse = data.zip(pm).map { case ((_, y), m) =>
        val d = m - (if (y) 1000000L else 0L); d * d
      }.sum
      val sll = data.zip(pm).map { case ((_, y), m) =>
        val mc = math.min(math.max(m, 1L), 999999L)
        val q = (if (y) mc else 1000000L - mc).toDouble / 1000000.0
        math.round(-(math.log(q) / math.log(2.0)) * 1000000.0)
      }.sum
      assert(got._1 === n.toLong)
      assert(got._3 === round6(sse.toDouble / (n.toDouble * 1e12)), s"seed $seed")
      // reference derives log2 as log/log(2), which may sit one ulp
      // from the engine's log2 on a .5 micro-unit boundary — allow
      // one micro-unit per term
      assert(math.abs(got._4 - sll.toDouble / (n.toDouble * 1e6)) <= 2e-6,
        s"seed $seed")
    }
  }
}
