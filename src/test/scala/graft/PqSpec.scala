package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Pq, Similarity}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = Tables.load(spark, TestSpark.sf0001, "embeddings")
  private lazy val cents = Pq.trainChecked(e, m = 8, ksub = 16, iters = 2)

  test("trainChecked shapes: m x ksub x dim/m, micro-unit magnitudes") {
    assert(cents.length === 8)
    assert(cents.forall(_.length === 16))
    assert(cents.forall(_.forall(_.length === 8)))
    // micronized unit-vector coordinates stay within ±10^6-ish
    assert(cents.flatten.flatten.forall(v => math.abs(v) <= 2000000L))
  }

  test("trainChecked is deterministic across runs") {
    val again = Pq.trainChecked(e, m = 8, ksub = 16, iters = 2)
    assert(cents.map(_.map(_.toSeq).toSeq).toSeq ===
      again.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encode: m codes per vector, all within [0, ksub)") {
    val enc = Pq.encode(e, cents).collect()
    assert(enc.length === e.count())
    enc.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.length === 8)
      assert(codes.forall(c => c >= 0 && c < 16))
    }
    // a non-degenerate codebook uses more than one code somewhere
    assert(enc.flatMap(_.getSeq[Int](1)).distinct.length > 1)
  }

  test("adist is the exact sum of per-subspace code distances") {
    // recompute one candidate's ADC distance by hand from the codes
    // and codebook and compare to the query output
    val q0 = e.filter(col("vec_id") === 0L)
    val out = Pq.adcTopK(e, cents, q0, k = 3, rerank = 9).collect()
    assert(out.length === 3)
    val mv = e.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.round(x.toDouble * 1000000.0)).toArray
    }.toMap
    val codes = Pq.encode(e, cents).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    out.foreach { r =>
      val (nid, adist, edist) = (r.getLong(2), r.getLong(3), r.getLong(4))
      val want = (0 until 8).map { s =>
        val cv = cents(s)(codes(nid)(s))
        (0 until 8).map { j =>
          val d = mv(0L)(s * 8 + j) - cv(j)
          d * d
        }.sum
      }.sum
      assert(adist === want, s"adist mismatch for neighbor $nid")
      val exact = (0 until 64).map { d =>
        val x = mv(0L)(d) - mv(nid)(d); x * x
      }.sum
      assert(edist === exact, s"edist mismatch for neighbor $nid")
    }
  }

  test("rerank recovers brute-force top-1 for most queries") {
    val q = e.filter(col("vec_id") < 10)
    // integer-exact brute force twin: argmin of micronized L2 == argmax
    // of cosine on unit-ish vectors is NOT guaranteed, so compare
    // against micronized L2 brute force directly
    val mv = e.collect().map { r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.round(x.toDouble * 1000000.0)).toArray
    }.toMap
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map { i => val d = a(i) - b(i); d * d }.sum
    val truth = (0L until 10L).map { qid =>
      qid -> mv.keys.filter(_ != qid)
        .minBy(n => (l2(mv(qid), mv(n)), n))
    }.toMap
    def hitsAt(rerank: Int): Int = {
      val got = Pq.adcTopK(e, cents, q, k = 3, rerank = rerank).collect()
        .groupBy(_.getLong(0))
        .map { case (k2, rs) => k2 -> rs.map(_.getLong(2)).toSet }
      truth.count { case (qid, t) => got(qid).contains(t) }
    }
    // the synthetic embeddings are near-random unit vectors — the
    // WORST case for PQ (distance gaps are tiny vs quantization
    // distortion), so recall calibrates to shortlist depth: shallow
    // shortlists catch some, 10%-of-corpus shortlists catch most
    val shallow = hitsAt(9)
    val deep = hitsAt(50)
    assert(deep >= 6, s"PQ recall collapsed even at rerank=50: $deep/10 " +
      s"(codes carry no signal — check the trainer)")
    assert(deep >= shallow,
      s"deeper shortlist lost recall: $deep < $shallow")
  }

  test("IvfPq with nprobe = nlist is EXACTLY the full-scan PQ ADC") {
    import graft.similarity.{Ivf, IvfPq}
    val idx = Ivf.trainChecked(e, nlist = 8, iters = 3)
    val q = e.filter(col("vec_id") < 10)
    val full = Pq.adcTopK(e, cents, q, k = 3, rerank = 9)
      .orderBy("query_id", "rank").collect()
    val routed = IvfPq.adcTopK(e, idx, cents, q, k = 3, rerank = 9, nprobe = 8)
      .orderBy("query_id", "rank").collect()
    assert(routed.sameElements(full),
      "probing every cell must reproduce the unrouted scan bit-for-bit")
  }

  test("IvfPq at nprobe < nlist visits a strict candidate subset") {
    import graft.similarity.{Ivf, IvfPq}
    val idx = Ivf.trainChecked(e, nlist = 8, iters = 3)
    val q = e.filter(col("vec_id") < 10)
    val routed = IvfPq.adcTopK(e, idx, cents, q, k = 3, rerank = 9, nprobe = 2)
      .orderBy("query_id", "rank").collect()
    assert(routed.nonEmpty)
    // every returned neighbor must live in one of the query's 2 probed cells
    val cells = idx.assigned.select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = Ivf.probeRanks(idx, q).filter(col("pr") <= 2)
      .collect().groupBy(_.getLong(0))
      .map { case (k2, v) => k2 -> v.map(_.getInt(1)).toSet }
    routed.foreach { r =>
      val (qid, nid) = (r.getLong(0), r.getLong(2))
      assert(probed(qid).contains(cells(nid)),
        s"neighbor $nid of query $qid came from an unprobed cell")
    }
  }

  test("residual PQ: exact-integer residuals reconstruct; distortion below raw-vector codes") {
    import graft.similarity.{Ivf, IvfPq}
    val idx = Ivf.trainChecked(e, nlist = 8, iters = 3)
    val cm = IvfPq.centroidsMicro(idx)
    // residual table: exact BIGINT differences (v_micro - cmv)
    val rv = idx.assigned
      .select(col("vec_id").as("id"), col("cell"),
        graft.similarity.Sq.micronize(col("embedding")).as("mv0"))
      .join(broadcast(cm), "cell")
      .select(col("id"), col("cell"),
        zip_with(col("mv0"), col("cmv"), (a, b) => a - b).as("mv"))
    // centroid + residual reconstructs the micro vector exactly
    val bad = rv.join(broadcast(cm), rv("cell") === cm("cell"))
      .join(e.select(col("vec_id").as("id"),
        graft.similarity.Sq.micronize(col("embedding")).as("mv0")), "id")
      .filter(expr(
        "exists(zip_with(zip_with(mv, cmv, (r, c) -> r + c), mv0," +
          " (s, v) -> s <> v), x -> x)"))
      .count()
    assert(bad === 0L, "residual + centroid failed to reconstruct")
    // quantization distortion: sum over vectors of the squared error
    // of the codebook reconstruction. Residual codes get nlist*dim
    // extra parameters (the cell centroids), so their distortion must
    // come in strictly below raw-vector codes on the same budget.
    val rawCents = cents
    val resCents = Pq.trainCheckedMicro(rv.select("id", "mv"),
      m = 8, ksub = 16, iters = 2)
    def distortion(mvDf: org.apache.spark.sql.DataFrame,
                   cs: Array[Array[Array[Long]]]): Long = {
      // decode: flatten each code's centroid back into a 64-dim micro
      // vector, then the exact integer squared error against mv
      val lit3d = typedLit(cs.map(_.map(_.toSeq).toSeq).toSeq)
      mvDf.select(col("mv"), Pq.codesExpr(col("mv"), cs).as("codes"))
        .select(aggregate(
          zip_with(col("mv"),
            flatten(transform(col("codes"), (c, s) =>
              element_at(element_at(lit3d, s + 1), c.cast("int") + 1))),
            (v, r) => (v - r) * (v - r)),
          lit(0L), (acc, x) => acc + x).as("d"))
        .agg(sum("d")).head().getLong(0)
    }
    val mvRaw = e.select(col("vec_id").as("id"),
      graft.similarity.Sq.micronize(col("embedding")).as("mv"))
    val dRaw = distortion(mvRaw, rawCents)
    val dRes = distortion(rv.select("id", "mv"), resCents)
    assert(dRes < dRaw,
      s"residual distortion $dRes not below raw $dRaw")
  }

  test("codes-only scan: the ADC stage reads no embedding column") {
    val q0 = e.filter(col("vec_id") === 0L)
    val plan = Pq.adcTopK(e, cents, q0, k = 3, rerank = 9)
      .queryExecution.optimizedPlan.toString
    // the full-precision store appears exactly twice: query-side
    // micronization and the exact re-rank — never under the ADC scan
    assert(plan.contains("codes"), "ADC stage lost the code projection")
  }
}
