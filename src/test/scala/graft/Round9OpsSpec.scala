package graft

import org.apache.spark.sql.functions._

import graft.similarity.BinaryQ

/** Pins for the round-9 native BinaryQ expressions
  * ([[graft.expressions.BitPack]] / [[graft.expressions.HammingDist]] /
  * [[graft.expressions.BinaryAsymAdc]]) — the codegen'd replacements
  * for round 8's interpreted HOF folds. The q207/q215/q218 oracle
  * hashes pin the happy path at corpus scale; these pin the edge
  * semantics the HOF forms defined. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bit_pack: word boundaries, null elements, empty and null vectors") {
    // 33 dims -> exactly 2 words; dim 32 (first bit of word 1) set.
    val mv = (0 until 33).map(d =>
      if (d == 2 || d == 31 || d == 32) Some(1L)
      else if (d == 5) None // null element reads as sign 0
      else Some(-1L))
    val df = Seq(Tuple1(mv)).toDF("mv")
    val code = df.select(BinaryQ.pack(col("mv")).as("c"))
      .collect().head.getSeq[Long](0)
    assert(code === Seq((1L << 2) | (1L << 31), 1L))

    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("mv")
      .select(BinaryQ.pack(col("mv")).as("c")).collect().head.getSeq[Long](0)
    assert(empty.isEmpty)

    val nul = Seq(Tuple1(Option.empty[Seq[Long]])).toDF("mv")
      .select(BinaryQ.pack(col("mv")).as("c")).collect().head
    assert(nul.isNullAt(0))
  }

  test("hamming_dist: word-wise popcount of XOR, exact over multi-word codes") {
    val a = Seq(0L, 0xFFL, 1L << 31)
    val b = Seq(3L, 0x0FL, 0L)
    val got = Seq((a, b)).toDF("a", "b")
      .select(BinaryQ.hamming(col("a"), col("b")).as("h"))
      .collect().head.getLong(0)
    assert(got === 2L + 4L + 1L)
  }

  test("hamming_dist: length mismatch and null slots return null (HOF parity)") {
    // the zip_with+bit_count form returned NULL for codes of different
    // word counts (zip_with pads with null) and for null slots —
    // min-length garbage answers are silent corruption, not a distance
    val mismatch = Seq((Seq(1L, 2L), Seq(1L))).toDF("a", "b")
      .select(BinaryQ.hamming(col("a"), col("b")).as("h")).collect().head
    assert(mismatch.isNullAt(0), "word-count mismatch must be null")

    val nullSlot = Seq((Seq(Some(1L), Option.empty[Long]), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
      .select(BinaryQ.hamming(col("a"), col("b")).as("h")).collect().head
    assert(nullSlot.isNullAt(0), "null word slot must be null")

    // equal-length no-null still exact
    val ok = Seq((Seq(0L, 0L), Seq(0L, 255L))).toDF("a", "b")
      .select(BinaryQ.hamming(col("a"), col("b")).as("h"))
      .collect().head.getLong(0)
    assert(ok === 8L)
  }

  test("binary_asym_adc: nulls on short code or null query element, exact otherwise") {
    // code too short for the query's dimensionality -> null (the HOF
    // fold's out-of-range get propagated the same way)
    val short = Seq((Seq(1L), Seq.fill(40)(1000000L))).toDF("code", "q")
      .select(BinaryQ.asymDist(col("code"), col("q")).as("a")).collect().head
    assert(short.isNullAt(0))

    val nullElem = Seq((Seq(1L, 0L), Seq(Some(1L), Option.empty[Long])))
      .toDF("code", "q")
      .select(BinaryQ.asymDist(col("code"), col("q")).as("a")).collect().head
    assert(nullElem.isNullAt(0))

    // bits (1,0,1): adist = -(q0 - q1 + q2)
    val ok = Seq((Seq(5L), Seq(10L, 20L, 30L))).toDF("code", "q")
      .select(BinaryQ.asymDist(col("code"), col("q")).as("a"))
      .collect().head.getLong(0)
    assert(ok === -(10L - 20L + 30L))
  }

  test("bruteForce1NN == bruteForceTopK rank-1 on the real corpus") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = e.filter(col("vec_id") % 10 === 0)
    val viaWindow = graft.similarity.Similarity
      .bruteForceTopK(e, qs, k = 1)
      .select("query_id", "neighbor_id")
    val viaArgmax = graft.similarity.Similarity.bruteForce1NN(e, qs)
    assert(viaWindow.exceptAll(viaArgmax).isEmpty &&
      viaArgmax.exceptAll(viaWindow).isEmpty)
    // and the scale property itself: the plan carries NO window — the
    // reduction is a partial-aggregating hash aggregate
    val plan = viaArgmax.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"expected no window, got:\n$plan")
  }

  test("weightedOverlapCensus agrees with the pair list it summarizes") {
    import graft.text.TextAnalysis
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val grams = TextAnalysis.ngrams(TextAnalysis.tokens(col("text")), 3)
    val minW = 3000000L
    val pairs = graft.dedup.Dedup
      .weightedOverlapJoinOn(docs, col("doc_id"), grams, minW).collect()
    val census = graft.dedup.Dedup
      .weightedOverlapCensus(docs, col("doc_id"), grams, minW)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val perDoc = pairs.flatMap { r =>
      val (a, b, w) = (r.getLong(0), r.getLong(1), r.getLong(3))
      Seq(a -> (b, w), b -> (a, w))
    }.groupBy(_._1)
    assert(census.keySet === perDoc.keySet)
    perDoc.foreach { case (id, ps) =>
      val (n, wMax, top) = census(id)
      assert(n === ps.length)
      assert(wMax === ps.map(_._2._2).max)
      assert(top === ps.map(_._2).filter(_._2 == wMax).map(_._1).min)
    }
  }

  test("band-plan maintainer: drift flip stages, next batch adopts, no pairs lost") {
    import graft.streaming.{CorpusIngest, UpsertSink}
    val dir = java.nio.file.Files.createTempDirectory("bandplan").toString
    val corpusPath = s"$dir/corpus"
    val candPath = s"$dir/cand"
    // start at the corpus-optimal operating point (the planner picks
    // 1-8 bands for this corpus; the flood's batch-chosen split is 16)
    val m = new CorpusIngest.BandPlanMaintainer(spark, corpusPath, candPath,
      initialBands = 4)

    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))

    // batch 0: bootstrap — the whole small corpus lands, nothing to
    // band against yet, no re-pricing possible
    assert(!m.processBatch(real, 0L))
    assert(m.currentBands === 4 && m.stagedPlan.isEmpty)

    // batch 1: the DedupSpec flood (16 bases x 3 near-identical
    // variants = the md5 sample) — must flip the plan. The flagging
    // batch itself still processes under the OLD 16-band point.
    val seed0 = real.filter(col("doc_id") < 16)
    val flood = seed0
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" driftvariantx")).as("text"))
      .unionByName(seed0.select((col("doc_id") + 200000L).as("doc_id"),
        concat(col("text"), lit(" driftvarianty")).as("text")))
      .unionByName(seed0)
      .filter(col("doc_id") >= 100000L)
    assert(m.processBatch(flood, 1L), "the flood must flip the plan")
    assert(m.currentBands === 4, "the flagging batch completes under the old plan")
    val stagedTo = m.stagedPlan
    assert(stagedTo.nonEmpty && stagedTo.get > 4,
      "a near-dup flood stages MORE bands")
    val preSwap = UpsertSink.ParquetMergeSink.read(spark, candPath)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preSwap.nonEmpty, "flood variants must band-collide with their bases")

    // batch 2: adoption happens at this boundary; new near-dups of
    // corpus docs are found under the NEW plan, and every pre-swap
    // candidate is still in the store
    val b3 = seed0.select((col("doc_id") + 300000L).as("doc_id"),
      concat(col("text"), lit(" driftvariantz")).as("text"))
    m.processBatch(b3, 2L)
    assert(m.currentBands === stagedTo.get && m.swaps === 1)
    val post = UpsertSink.ParquetMergeSink.read(spark, candPath)
    val postPairs = post.select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(preSwap.subsetOf(postPairs), "no candidate pair lost across the swap")
    val newPlanBands = post.filter(col("new_id") >= 300000L)
      .select("bands_at_discovery").distinct().collect().map(_.getLong(0))
    assert(newPlanBands.nonEmpty && newPlanBands.forall(_ === stagedTo.get.toLong),
      "post-swap discoveries carry the new operating point")

    // replay of batch 1: no re-staging, nothing lost. A replay
    // re-derives candidates under the CURRENT (post-swap, more
    // sensitive) plan — the at-least-once contract means it may ADD
    // pairs, never drop them — and a second identical replay is a
    // fixed point (keyed merge idempotence).
    assert(!m.processBatch(flood, 1L))
    assert(m.stagedPlan.isEmpty && m.swaps === 1)
    val replayed = UpsertSink.ParquetMergeSink.read(spark, candPath)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(postPairs.subsetOf(replayed))
    assert(!m.processBatch(flood, 1L))
    val replayedTwice = UpsertSink.ParquetMergeSink.read(spark, candPath)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayedTwice === replayed)

    // a restarted maintainer resumes the adopted plan and epoch
    val m2 = new CorpusIngest.BandPlanMaintainer(spark, corpusPath, candPath)
    assert(m2.currentBands === stagedTo.get && m2.swaps === 1)
    assert(!m2.processBatch(flood, 1L), "replay detected from persisted epoch")
  }

  test("native per-pair Hamming stage stays inside whole-stage codegen") {
    // The hot path is the per-PAIR distance projection over the
    // crossJoin (corpus × broadcast queries) — round 8's zip_with+
    // aggregate fold knocked it out of codegen (q207 4.8× slower).
    // codes() itself keeps micronize's interpreted transform (per-row
    // linear, same as round 7) so it is not asserted here.
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = df.limit(3)
    // AQE's pre-execution plan carries no codegen markers; turn it off
    // for the plan snapshot only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try BinaryQ.topK(df, qs, k = 3, rerank = 10)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val codegendHamming = plan.linesIterator.exists(l =>
      l.contains("hamming_dist") && """\*\(\d+\)""".r.findFirstIn(l).isDefined)
    assert(codegendHamming,
      s"expected the hamming_dist projection inside a codegen stage, got:\n$plan")
  }
}
