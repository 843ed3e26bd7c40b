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

  test("compactLine stays under budget at 200 queries; header always survives") {
    // the r14 artifact regression: 166 full per-query entries overran
    // the driver's ~2000-char stdout tail and truncated the total +
    // tells out of the artifact of record (VERDICT r14 #2)
    val header = """{"metric":"total","value":123.45,"unit":"sec","runs":5,""" +
      """"load0":0.50,"warm":11.80,"spread":2.10,"contaminated_queries":[],""" +
      """"contaminated":false,"failed":[],"sf":"/root/testdata/sf0.1""""
    val entries = (1 to 200).map(i => s"q$i" -> (i * 0.037 % 7.0))
    val line = Bench.compactLine(header, entries)
    assert(line.length <= 1800, s"line length ${line.length}")
    // parses as one JSON object with the header fields intact
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"value\":123.45"))
    assert(line.contains("\"contaminated\":false"))
    assert(line.contains("\"queries\":{"))
    // the cut is DECLARED, and what's kept is the slowest entries
    assert(line.contains("\"queries_omitted\":"))
    val slowest = entries.maxBy(_._2)
    assert(line.contains("\"" + slowest._1 + "\":"))
    // balanced braces = structurally parseable
    assert(line.count(_ == '{') === line.count(_ == '}'))
    // a small suite keeps EVERY query and omits the tag
    val small = Bench.compactLine(header, (1 to 40).map(i => s"q$i" -> 0.25))
    assert(!small.contains("queries_omitted"))
    assert((1 to 40).forall(i => small.contains(s""""q$i":""")))
  }

  test("compactLine prefix semantics: a boundary-rejected long entry is never emitted (ADVICE r15)") {
    // the r15 keep-loop counted the SET of individually-fitting entries
    // but emitted bySlow.take(kept): one long name rejected at the
    // boundary followed by short accepted ones re-overflowed the budget
    val header = """{"metric":"total","value":1.00,"unit":"sec","sf":"x""""
    val long = "q2_" + ("x" * 120) // slower, long — rejected at boundary
    val entries = Seq("q1_slowest" -> 9.0, long -> 8.0) ++
      (1 to 50).map(i => s"q$i" -> 0.5)
    val budget = header.length + 13 + 2 + 25 + 30 // room for ~2 short entries
    val line = Bench.compactLine(header, entries, budget)
    assert(line.length <= budget, s"line length ${line.length} > $budget")
    // prefix of the slowest-first order: once the long entry is cut,
    // nothing after it sneaks in — the kept set IS the declared prefix
    assert(line.contains("\"q1_slowest\":"))
    assert(!line.contains(long))
    assert(!line.contains("\"q1\":0.50"),
      "entries after the first non-fitting one must not be emitted")
    assert(line.count(_ == '{') === line.count(_ == '}'))
  }

  test("tail-retry clears the r15 noise stretch but a true regression survives (VERDICT r15 #5)") {
    // the judge's r15 re-run: a contended host stretch (q107-q121
    // shape, replayed here on the r12 names) raised 11 noise flags
    // that also masked the ONE real regression (q169-style: cmsMerge
    // recompute — above its tell on EVERY execution). Retries on the
    // post-suite idle JVM read quiet floors for the noise, but the
    // true regression exceeds its tell again.
    val trueRegFloors = floors + ("q169_cms_ingest_merge" -> 0.938)
    val recording = contendedMins :+ ("q169_cms_ingest_merge" -> 2.04)
    val initial = Bench.contaminatedQueries(recording, trueRegFloors)
    assert(initial.contains("q169_cms_ingest_merge") && initial.size === 12)
    // retries: the noise stretch lands back on its quiet floors; the
    // real regression re-measures 2.1x its floor
    val retries = initial.map { n =>
      n -> (if (n == "q169_cms_ingest_merge") 2.01 else trueRegFloors(n))
    }.toMap
    val confirmed = Bench.confirmedFlags(initial, retries, trueRegFloors)
    assert(confirmed === Seq("q169_cms_ingest_merge"))
    // post-retry the suite verdict no longer flips on noise (< 5)
    assert(confirmed.size < 5)
    // a flagged query with NO retry recorded keeps its flag
    assert(Bench.confirmedFlags(Seq("q34_top_keywords"), Map.empty,
      trueRegFloors) === Seq("q34_top_keywords"))
  }

  test("r16 replay: flags surviving retry under an inflated host probe go inconclusive, not confirmed (VERDICT r16 #4a)") {
    // the r16 driver recording: q160/q163/q164/q165 survived retries
    // taken on the still-loaded host at 2.1-2.8x floors — all four
    // cleared on an idle box. The retry-time probe read inflated, so
    // the survivors must be recorded as inconclusive_host (a judge
    // re-runs), never as confirmed regressions.
    val f = Map("q160_knn_label_purity" -> 0.35,
      "q163_token_dispersion" -> 0.38, "q164_oov_rate" -> 0.33,
      "q165_cms_frequency" -> 0.52, "q169_cms_ingest_merge" -> 0.938)
    val initial = Seq("q160_knn_label_purity", "q163_token_dispersion",
      "q164_oov_rate", "q165_cms_frequency")
    val retries = Map("q160_knn_label_purity" -> 0.95,
      "q163_token_dispersion" -> 1.05, "q164_oov_rate" -> 0.86,
      "q165_cms_frequency" -> 1.35) // 2.1-2.8x floors, still contended
    val (conf, inc) = Bench.adjudicateFlags(initial, retries, f,
      probeRetry = 0.68, probeQuiet = 0.30) // 2.3x the quiet norm
    assert(conf.isEmpty, "contended survivors must not confirm")
    assert(inc.toSet === initial.toSet)
    // quiet probe at the tail: the q169-style TRUE regression (above
    // its tell on every execution) still confirms
    val (c2, i2) = Bench.adjudicateFlags(Seq("q169_cms_ingest_merge"),
      Map("q169_cms_ingest_merge" -> 2.01), f, 0.31, 0.30)
    assert(c2 === Seq("q169_cms_ingest_merge") && i2.isEmpty)
    // a flag the retry CLEARED stays cleared in BOTH regimes — a fast
    // time under load is stronger evidence of no regression
    val (c3, i3) = Bench.adjudicateFlags(Seq("q160_knn_label_purity"),
      Map("q160_knn_label_purity" -> 0.41), f, 0.68, 0.30)
    assert(c3.isEmpty && i3.isEmpty)
    // near-boundary: a probe at 1.4x the norm is still trusted
    val (c4, i4) = Bench.adjudicateFlags(Seq("q169_cms_ingest_merge"),
      Map("q169_cms_ingest_merge" -> 2.01), f, 0.42, 0.30)
    assert(c4 === Seq("q169_cms_ingest_merge") && i4.isEmpty)
  }

  test("adjudicated_total carries per-query min(recorded min, retry) — one phantom cannot define the headline (VERDICT r16 #4b)") {
    // r16: q141 recorded a 39.4 s contended median whose retry read
    // 2.68 s, yet the headline summed the phantom
    val mins = Seq("q141" -> 39.4, "q01" -> 1.0, "q63" -> 0.5)
    val adj = Bench.adjudicatedTotal(mins, Map("q141" -> 2.68))
    assert(math.abs(adj - (2.68 + 1.0 + 0.5)) < 1e-9)
    // a retry SLOWER than the recorded min never raises the total
    assert(math.abs(Bench.adjudicatedTotal(mins,
      Map("q141" -> 2.68, "q01" -> 5.0)) - (2.68 + 1.0 + 0.5)) < 1e-9)
    // no retries: the adjudicated total is the sum of mins
    assert(math.abs(Bench.adjudicatedTotal(mins, Map.empty) - 40.9) < 1e-9)
  }

  test("the floor tell is ONE shared predicate (ADVICE r16)") {
    // contaminatedQueries and confirmedFlags must replay the same tell
    for ((m, f) <- Seq((0.30, 0.10), (0.95, 0.35), (0.51, 0.25),
      (0.21, 0.10), (0.59, 0.35))) {
      val viaInitial = Bench.contaminatedQueries(
        Seq("x" -> m), Map("x" -> f)).nonEmpty
      val viaRetry = Bench.confirmedFlags(
        Seq("x"), Map("x" -> m), Map("x" -> f)).nonEmpty
      assert(viaInitial === Bench.exceedsTell(m, f))
      assert(viaRetry === Bench.exceedsTell(m, f))
    }
  }

  test("loadFloors parses the committed calibration file") {
    val f = Bench.loadFloors("bench_floors.json")
    assert(f.size >= 100)
    assert(f.get("q01_pricing_summary").exists(v => v > 0.0 && v < 10.0))
    // missing file -> empty map, gate degrades to the suite tells
    assert(Bench.loadFloors("does_not_exist.json").isEmpty)
  }
}
