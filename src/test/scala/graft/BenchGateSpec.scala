package graft

import org.scalatest.funsuite.AnyFunSuite

/** The regression gate's prior-bench parser — pure JVM, no Spark session.
  *
  * Round-11 advice flagged two parser holes: `indexOf('}')` truncated the
  * queries object at the first close brace (any future nesting would
  * silently drop the tail), and the prior run's `failed` list was ignored
  * (a query whose prior "time" is a time-to-throw must not serve as a
  * regression baseline). Both are pinned here against hand-built JSON.
  */
class BenchGateSpec extends AnyFunSuite {

  private def write(json: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("benchspec", ".json")
    java.nio.file.Files.writeString(p, json)
    p.toFile.deleteOnExit()
    p
  }

  test("priorBench parses times, failed list, and calibration min") {
    val p = write(
      """{"metric":"total","value":3.0,"unit":"sec",
        |"queries":{"q01_agg":1.25,"q02_filter":0.5,"q99_x":1.5e-1},
        |"failed":["q02_filter"],
        |"calibration":[1.10,0.95,1.20],
        |"contended":false}""".stripMargin)
    val b = Bench.priorBench(p)
    assert(b.times === Map("q01_agg" -> 1.25, "q02_filter" -> 0.5, "q99_x" -> 0.15))
    assert(b.failed === Set("q02_filter"))
    assert(b.calibMin === Some(0.95))
  }

  test("queries parse survives nested objects after it (brace matching)") {
    // a nested object INSIDE queries must not truncate the scan before q03
    val p = write(
      """{"queries":{"q01":1.0,"meta":{"inner":2.0},"q03":3.0},
        |"failed":[],"calibration":[1.0]}""".stripMargin)
    val b = Bench.priorBench(p)
    assert(b.times.get("q01") === Some(1.0))
    assert(b.times.get("q03") === Some(3.0))
  }

  test("absent or malformed file yields an empty baseline, not a throw") {
    val missing = java.nio.file.Paths.get("/does/not/exist/bench.json")
    assert(Bench.priorBench(missing) ===
      Bench.PriorBench(Map.empty, Set.empty, None, None))
    val junk = write("{not json at all")
    val b = Bench.priorBench(junk)
    assert(b.times.isEmpty && b.failed.isEmpty && b.calibMin.isEmpty && b.cpus.isEmpty)
  }

  test("priorBench parses the baseline's cpus; absent field reads None") {
    val withCpus = write(
      """{"metric":"total","value":1.0,"unit":"sec","cpus":32,
        |"queries":{"q01":1.0},"failed":[],"calibration":[1.0]}""".stripMargin)
    assert(Bench.priorBench(withCpus).cpus === Some(32))
    val without = write(
      """{"queries":{"q01":1.0},"failed":[],"calibration":[1.0]}""")
    assert(Bench.priorBench(without).cpus === None)
  }

  // CORE-COUNT GATE (round 14): the r13 incident — a sweep taken at a
  // different core count than the baseline manufactured three phantom
  // regressions, and the calibration probe cannot catch it (the probe is
  // I/O-dominated and core-count-insensitive, so drift stays < 1.5x while
  // every shuffle-heavy query legitimately runs slower on fewer cores).
  // These cases prove a mismatched-cpus run produces NO regression flags
  // and says why in the emitted gate reason.
  test("gate is voided with a named reason when run cpus != baseline cpus") {
    val (ok, reason) = Bench.gateStatus(Some(32), Some(8), contended = false)
    assert(!ok)
    assert(reason === "voided: cpus mismatch (baseline 32 cores, run 8)")
  }

  test("gate stays active on matching cpus, and on unknown cpus either side") {
    assert(Bench.gateStatus(Some(32), Some(32), contended = false) ===
      ((true, "active")))
    // pre-round-14 baseline with no cpus field: nothing to compare
    assert(Bench.gateStatus(None, Some(32), contended = false)._1)
    // non-numeric master (local[*]): unknown run cpus, gate proceeds
    assert(Bench.gateStatus(Some(32), None, contended = false)._1)
  }

  test("contention voids the gate regardless of core-count agreement") {
    val (ok, reason) = Bench.gateStatus(Some(32), Some(32), contended = true)
    assert(!ok)
    assert(reason.startsWith("voided: contended"))
  }

  // WRITE QUARANTINE (round-14 review): only a box-certified,
  // core-comparable run may overwrite the committed baseline. An
  // uncontended run at the wrong core count produces legitimately
  // 2-4x-different numbers — writing them to bench.json would be the
  // round-13 poisoning through a different door.
  test("only a clean, core-matched run writes bench.json; indicted runs " +
    "quarantine to side files") {
    assert(Bench.outFile(contended = false, gateOk = true, adopted = true) ===
      "bench.json")
    assert(Bench.outFile(contended = true, gateOk = true, adopted = true) ===
      "bench.contended.json")
    assert(Bench.outFile(contended = false, gateOk = false, adopted = true) ===
      "bench.mismatch.json")
    // contention has naming priority over a simultaneous mismatch
    assert(Bench.outFile(contended = true, gateOk = false, adopted = false) ===
      "bench.contended.json")
  }

  // BASELINE-ADOPTION BAR (round 15): round 14 adopted a drift-1.4994 run
  // (0.04% under the 1.5 gate-void bar) as the committed baseline, and its
  // carried surface read +7.5% vs the prior clean run — near-threshold
  // noise became the next round's regression denominator. These cases
  // prove a 1.2–1.5-drift run GATES (regression diffs still adjudicate)
  // but never overwrites bench.json.
  test("adoption requires drift < 1.2; a 1.2-1.5 drift run gates but " +
    "quarantines to bench.noisy.json") {
    // the round-14 incident numbers: gate active, adoption declined
    val (adopted, reason) =
      Bench.adoptionStatus(1.4994, gateOk = true, gateReason = "active")
    assert(!adopted)
    assert(reason === "declined: drift 1.4994 >= 1.2 (gate active, baseline kept)")
    assert(Bench.outFile(contended = false, gateOk = true, adopted = false) ===
      "bench.noisy.json")
    // boundary: exactly 1.2 is declined
    assert(!Bench.adoptionStatus(1.2, gateOk = true, gateReason = "active")._1)
    // a genuinely quiet run is adopted
    val (ok, r) = Bench.adoptionStatus(1.05, gateOk = true, gateReason = "active")
    assert(ok && r === "adopted")
    // a gate-voided run is never adoptable regardless of drift
    val (vAdopt, vReason) = Bench.adoptionStatus(1.0, gateOk = false,
      gateReason = "voided: cpus mismatch (baseline 32 cores, run 8)")
    assert(!vAdopt && vReason.startsWith("declined: gate voided"))
  }

  // MIN-MERGE ADOPTION (round 15): when the box wobbles too much for any
  // single sweep to certify drift < 1.2, the baseline is constructed as
  // the per-query MIN across >= 2 sweeps (noise only inflates a min-of-
  // repeats timing, so the min across runs approaches the quiet-box
  // truth; the calibration anchor follows the same statistic).
  test("min-merge takes per-query minima, the min anchor, and intersects " +
    "failed lists (a query failing in one run uses the other's time)") {
    val a = Bench.MergeInput("a.json",
      Map("q1" -> 2.0, "q2" -> 5.0, "q3" -> 9.9),
      failed = Set("q2", "q3"), calibMin = 1.2, cpus = Some(32),
      sf = Some("/sf"))
    val b = Bench.MergeInput("b.json",
      Map("q1" -> 3.0, "q2" -> 4.0, "q3" -> 8.8),
      failed = Set("q3"), calibMin = 0.9, cpus = Some(32), sf = Some("/sf"))
    val json = Bench.mergeJson(Seq(a, b),
      Bench.PriorBench(Map.empty, Set.empty, None, None), "bench.json")
    val p = write(json)
    val m = Bench.priorBench(p)
    assert(m.times("q1") === 2.0)   // plain min
    // q2 failed in run a: a's 5.0 is a time-to-throw, b's 4.0 is the time
    assert(m.times("q2") === 4.0)
    // q3 failed everywhere: min time-to-throw, and stays failed
    assert(m.times("q3") === 8.8)
    assert(m.failed === Set("q3"))
    assert(m.calibMin === Some(0.9)) // the best probe across runs
    assert(m.cpus === Some(32))
    assert(json.contains("\"contended\":false"))
    assert(json.contains("\"baseline_adoption\":\"adopted: min-merge of 2 runs\""))
    assert(json.contains("\"merged_from\":[\"a.json\",\"b.json\"]"))
  }

  test("min-merge refuses mismatched cpus/sf/query sets and single runs") {
    val a = Bench.MergeInput("a.json", Map("q1" -> 1.0), Set.empty,
      1.0, Some(32), Some("/sf"))
    def prior = Bench.PriorBench(Map.empty, Set.empty, None, None)
    intercept[IllegalArgumentException](Bench.mergeJson(Seq(a), prior, "x"))
    intercept[IllegalArgumentException](Bench.mergeJson(
      Seq(a, a.copy(cpus = Some(8))), prior, "x"))
    intercept[IllegalArgumentException](Bench.mergeJson(
      Seq(a, a.copy(sf = Some("/other"))), prior, "x"))
    intercept[IllegalArgumentException](Bench.mergeJson(
      Seq(a, a.copy(times = Map("q9" -> 1.0))), prior, "x"))
  }

  test("min-merge diffs the merged numbers against the prior baseline " +
    "with the anchor normalization") {
    val a = Bench.MergeInput("a.json", Map("q1" -> 4.6, "q2" -> 1.0),
      Set.empty, 1.0, Some(32), Some("/sf"))
    val b = a.copy(path = "b.json", times = Map("q1" -> 4.5, "q2" -> 1.1))
    // prior: q1 was 1.5s at anchor 1.0 -> adjusted 4.5 > 2x and +1s: flag
    val prior = Bench.PriorBench(Map("q1" -> 1.5, "q2" -> 1.0),
      Set.empty, Some(1.0), Some(32))
    val json = Bench.mergeJson(Seq(a, b), prior, "bench.json")
    assert(json.contains("\"query\":\"q1\""))
    assert(!json.contains("\"query\":\"q2\""))
    // and a cpus-mismatched prior voids the diff entirely
    val voided = Bench.mergeJson(Seq(a, b),
      prior.copy(cpus = Some(8)), "bench.json")
    assert(voided.contains("\"regressions\":[]"))
    assert(voided.contains("voided: cpus mismatch"))
  }

  test("jsonEscape defuses quotes, backslashes, and control chars in " +
    "env-sourced strings") {
    assert(Bench.jsonEscape("local[32]") === "local[32]")
    assert(Bench.jsonEscape("a\"b\\c\nd\te") === "a\\\"b\\\\c\\nd\\te")
    assert(Bench.jsonEscape("x\u0001y") === "x\\u0001y")
  }
}
