package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for Bench's self-anomaly re-run trigger — the synthetic-
  * slowdown test the round-10 ghosts demanded: BENCH_r10.json carried
  * q220 at 16.2 s against a 2.0 s median across five solo runs, with
  * `blip_reruns` empty because the foreign-CPU gate saw nothing (the
  * slowdown had foreign ≈ 0). The trigger must catch exactly that
  * shape from the round's own prior artifacts, and must NOT fire on
  * the noise band or across scale factors. */
class BenchTriggerSpec extends AnyFunSuite {

  test("synthetic slowdown: the round-10 ghost shape fires the trigger") {
    // q220's actual round-10 numbers: 16.2 s measured, 2.01 s median
    assert(Bench.anomalousVsRef(16.2, Some(2.01)))
    // and the quiet-foreign-CPU part is the point: the trigger reads
    // only (measurement, reference) — no foreign-CPU input at all
  }

  test("in-band measurements do not fire") {
    assert(!Bench.anomalousVsRef(2.2, Some(2.01)))   // cold-band drift
    assert(!Bench.anomalousVsRef(5.9, Some(2.01)))   // just under 3x
    assert(!Bench.anomalousVsRef(6.2, None))         // new query: no ref
    assert(!Bench.anomalousVsRef(0.45, Some(0.1)))   // sub-0.5s noise band
    assert(!Bench.anomalousVsRef(1.0, Some(0.0)))    // degenerate ref
    assert(Bench.anomalousVsRef(0.9, Some(0.2)))     // >0.5s and >3x: fires
  }

  test("refMedians parses the artifact and refuses a cross-SF reference") {
    val dir = java.nio.file.Files.createTempDirectory("benchref")
    val f = dir.resolve("ref.json")
    java.nio.file.Files.write(f,
      """{"sf": "sf0.1", "note": "x",
        | "medians": {"q01_scan_filter": 1.45, "q220_adc_scan": 2.01}}"""
        .stripMargin.getBytes("UTF-8"))
    val got = Bench.refMedians(f.toString, "/root/testdata/sf0.1")
    assert(got === Map("q01_scan_filter" -> 1.45, "q220_adc_scan" -> 2.01))
    // medians measured at sf0.1 must not gate an sf1 run
    assert(Bench.refMedians(f.toString, "/root/testdata/sf1").isEmpty)
    // missing file: trigger disabled, never an error
    assert(Bench.refMedians(dir.resolve("nope.json").toString,
      "/root/testdata/sf0.1").isEmpty)
  }

  test("the shipped ref_medians.json is loadable at the driver's bench SF") {
    // anchor on the artifact's real location, not the test JVM's cwd —
    // under a runner with a different working directory the relative
    // path would silently resolve to nothing (refMedians swallows IO
    // errors by design) and this pin would assert on an empty map
    val shipped = java.nio.file.Paths.get(sys.props("user.dir"))
      .resolve("bench_artifacts/ref_medians.json")
    assume(java.nio.file.Files.exists(shipped),
      s"ref_medians.json not under user.dir=${sys.props("user.dir")}")
    val got = Bench.refMedians(shipped.toString, "/root/testdata/sf0.1")
    assert(got.size > 200)
    assert(got.contains("q220_adc_scan") || got.contains("q01_scan_filter"))
  }
}
