package graft

import org.scalatest.funsuite.AnyFunSuite

/** The per-query bench self-gate (VERDICT r12 #5) replayed against the
  * exact BENCH_r12 pattern: a contended host stretch inflated the
  * q30–q40 family's MINIMA 3–9x while every suite-level tell stayed
  * quiet (spread 18.5% < 20%, warm 15.95 < 18.0). The per-query floors
  * must flag that stretch — and must NOT flag quiet-session jitter. */
class BenchGateSpec extends AnyFunSuite {

  // quiet floors (judge's n=3 quiet re-run of identical r12 code) and
  // the driver's contended recording, verbatim for the affected family
  private val floors = Map(
    "q30_lang_id" -> 0.163, "q31_quality_scores" -> 0.145,
    "q32_token_counts" -> 0.125, "q33_fingerprints" -> 0.123,
    "q34_top_keywords" -> 0.361, "q35_dedup_canonicalize" -> 0.361,
    "q36_rollup_revenue" -> 0.346, "q37_pii_scan" -> 0.140,
    "q38_repetition" -> 0.294, "q39_hash_sample" -> 0.147,
    "q40_asof_click_before_error" -> 0.216,
    "q01_pricing_summary" -> 0.248, "q73_curation_v1" -> 3.577,
    "q63_gopher_rules" -> 0.105)
  private val contendedMins = Seq(
    "q30_lang_id" -> 0.696, "q31_quality_scores" -> 0.878,
    "q32_token_counts" -> 0.809, "q33_fingerprints" -> 0.543,
    "q34_top_keywords" -> 2.368, "q35_dedup_canonicalize" -> 1.941,
    "q36_rollup_revenue" -> 1.679, "q37_pii_scan" -> 0.543,
    "q38_repetition" -> 1.341, "q39_hash_sample" -> 0.508,
    "q40_asof_click_before_error" -> 0.807,
    // quiet elsewhere in the same recording
    "q01_pricing_summary" -> 0.278, "q73_curation_v1" -> 3.700,
    "q63_gopher_rules" -> 0.110)

  test("flags the exact BENCH_r12 contended stretch, nothing else") {
    val flagged = Bench.contaminatedQueries(contendedMins, floors)
    assert(flagged.toSet === Set(
      "q30_lang_id", "q31_quality_scores", "q32_token_counts",
      "q33_fingerprints", "q34_top_keywords", "q35_dedup_canonicalize",
      "q36_rollup_revenue", "q37_pii_scan", "q38_repetition",
      "q39_hash_sample", "q40_asof_click_before_error"))
    assert(flagged.size >= 5) // flips the suite verdict
  }

  test("quiet-session jitter and new queries never flag") {
    // 2x a small floor but inside the absolute slack
    assert(Bench.contaminatedQueries(
      Seq("q63_gopher_rules" -> 0.30), floors).isEmpty)
    // no floor (new query this round) -> never flagged
    assert(Bench.contaminatedQueries(
      Seq("q999_new" -> 99.0), floors).isEmpty)
    // a single real regression flags the query (visible) but one query
    // alone does not flip the suite verdict (size < 5)
    val one = Bench.contaminatedQueries(
      Seq("q34_top_keywords" -> 2.368), floors)
    assert(one === Seq("q34_top_keywords") && one.size < 5)
  }

  test("loadFloors parses the committed calibration file") {
    val f = Bench.loadFloors("bench_floors.json")
    assert(f.size >= 100)
    assert(f.get("q01_pricing_summary").exists(v => v > 0.0 && v < 10.0))
    // missing file -> empty map, gate degrades to the suite tells
    assert(Bench.loadFloors("does_not_exist.json").isEmpty)
  }
}
