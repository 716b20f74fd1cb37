package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import WobbleWindow.{Entry, ratios, windows}

/** Pins the mechanized wobble-window adjudication: the clustering rule
  * on synthetic shapes, and — the tool's reason to exist — that running
  * it over the committed bench_runs artifacts reproduces the r15/r16
  * hand analyses recorded in SCALING.md (r16 run1's single contiguous
  * q110->q28 transient window at ~t=11..25 s; r15 run1's window
  * containing the q16-q24 exceedance cluster; r15 run2's "q40-q51 +
  * q109" adjudication as a window plus an isolated spike). */
class WobbleWindowSpec extends AnyFunSuite {

  private def entry(name: String, suspect: Double, best: Double, at: Double) =
    Entry(name, suspect, best, at)

  test("ratios pairs in emission order, accumulates the run-order clock, drops failed sentinels") {
    val suspect = Seq("a" -> 1.0, "b" -> -1.0, "c" -> 2.0)
    val others = Seq(Map("a" -> 0.5, "c" -> 1.0), Map("a" -> 0.8, "c" -> 4.0))
    val (es, unmatched) = ratios(suspect, others)
    assert(es.map(_.name) == Seq("a", "c") && unmatched.isEmpty)
    assert(es(0).othersBest == 0.5 && es(0).ratio == 2.0 && es(0).startSec == 0.0)
    // the failed "b" contributes nothing to the clock: c starts at 1.0
    assert(es(1).othersBest == 1.0 && es(1).startSec == 1.0)
  }

  test("a query absent from every comparison run is held neutral at 1.0x and reported") {
    val (es, unmatched) = ratios(Seq("a" -> 1.0, "b" -> 3.0),
      Seq(Map("a" -> 1.0, "b" -> -1.0)))
    assert(unmatched == Seq("b") && es(1).ratio == 1.0 && !es(1).hot)
  }

  test("hot entries within MaxGap merge into one window; a wider gap splits; windows rank by excess") {
    // hot at 0,1 … gap of exactly MaxGap=6 … hot at 8,9,10 — one window
    val merged = (0 to 10).map { i =>
      val hot = i <= 1 || i >= 8
      entry(s"q$i", if (hot) 1.5 else 1.0, 1.0, i)
    }
    val (w1, s1) = windows(merged)
    assert(w1.map(_.span) == Seq("q0 -> q10") && s1.isEmpty)
    assert(w1.head.hotCount == 5 && w1.head.entries.size == 11)
    // gap of MaxGap+1 splits; the 2-hot fragment demotes to spikes while
    // the 3-hot fragment stays a window
    val split = (0 to 11).map { i =>
      val hot = i <= 1 || i >= 9
      entry(s"q$i", if (hot) 1.5 else 1.0, 1.0, i)
    }
    val (w2, s2) = windows(split)
    assert(w2.map(_.span) == Seq("q9 -> q11") && s2.map(_.name) == Seq("q0", "q1"))
    // ranking: the window with more excess seconds leads regardless of order
    val two = Seq(
      entry("a1", 1.3, 1.0, 0), entry("a2", 1.3, 1.0, 1), entry("a3", 1.3, 1.0, 2),
      entry("gap1", 1.0, 1.0, 3), entry("gap2", 1.0, 1.0, 4),
      entry("gap3", 1.0, 1.0, 5), entry("gap4", 1.0, 1.0, 6),
      entry("gap5", 1.0, 1.0, 7), entry("gap6", 1.0, 1.0, 8),
      entry("gap7", 1.0, 1.0, 9),
      entry("b1", 9.0, 1.0, 10), entry("b2", 9.0, 1.0, 19), entry("b3", 9.0, 1.0, 28))
    val (w3, _) = windows(two)
    assert(w3.map(_.span) == Seq("b1 -> b3", "a1 -> a3"))
    assert(math.abs(w3.head.excessSec - 24.0) < 1e-9)
  }

  test("window accounting: span boundaries are hot, interior dips stay inside, times from the clock") {
    val es = Seq(
      entry("cold", 1.0, 1.0, 0.0),
      entry("h1", 1.6, 1.0, 1.0), entry("dip", 1.05, 1.0, 2.6),
      entry("h2", 1.4, 1.0, 3.65), entry("h3", 1.5, 1.0, 5.05),
      entry("tail", 1.0, 1.0, 6.55))
    val (ws, _) = windows(es)
    assert(ws.size == 1)
    val w = ws.head
    assert(w.span == "h1 -> h3" && w.entries.map(_.name).contains("dip"))
    assert(w.startSec == 1.0 && math.abs(w.endSec - 6.55) < 1e-9)
    assert(math.abs(w.medianRatio - 1.45) < 1e-9)
  }

  private def load(path: String): (Seq[(String, Double)], Map[String, Double]) = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    (DeriveBenchEnvelope.parseRunOrdered(text)._1,
      DeriveBenchEnvelope.parseRun(text)._1)
  }

  test("committed r16 artifacts: run1's transient reproduces SCALING.md verbatim — one dominant q110->q28 window at ~t=11..25 s") {
    val suspect = load("bench_runs/r16/run1.json")._1
    val others = Seq(load("bench_runs/r16/run2.json")._2,
      load("bench_runs/r16/run3.json")._2)
    val (es, unmatched) = ratios(suspect, others)
    assert(unmatched.isEmpty && es.size == 116)
    val (ws, _) = windows(es)
    val top = ws.head
    assert(top.span == "q110_incremental_distinct -> q28_lsh_bucketed_exact")
    assert(top.startSec > 10 && top.startSec < 12, top.startSec)
    assert(top.endSec > 24 && top.endSec < 26, top.endSec)
    // the derivation's three excluded spikes (q22/q27/q28) live INSIDE
    // this window — the r16 note's point that they were one event
    val names = top.entries.map(_.name).toSet
    assert(Seq("q22_stint_agg", "q27_rollup_totals", "q28_lsh_bucketed_exact")
      .forall(names))
    // dominant by tax: at least twice any other detected cluster's excess
    assert(ws.tail.forall(_.excessSec * 2 < top.excessSec),
      ws.map(w => w.span -> w.excessSec).toString)
  }

  test("bandExceedances: strict hi comparison, unknown queries skipped, run order kept") {
    val es = Seq(entry("a", 1.0, 1.0, 0), entry("b", 0.50, 0.4, 1),
      entry("c", 0.499, 0.4, 2), entry("nobody", 9.0, 1.0, 3))
    val got = WobbleWindow.bandExceedances(es,
      Map("a" -> 2.0, "b" -> 0.45, "c" -> 0.5))
    // a in-band; b over (0.50 > 0.45); c at 0.499 vs hi 0.5 NOT over
    // (exceed means strictly above, matching the derivation rule);
    // "nobody" has no committed band -> no verdict, not a crash
    assert(got.map { case (e, hi) => (e.name, hi) } == Seq(("b", 0.45)))
  }

  test("envelope verdicts on committed r17 artifacts: the confirm run's q19 1.20x is the SOLE band exceedance; all three derivation inputs are spotless") {
    // adjudicate against the R17-ERA envelope (committed as a fixture
    // next to the runs it governed — git 66b33f9^), NOT the live
    // Bench.envelope: a future legitimate hi raise must not silently
    // weaken this historical "spotless" pin, and raising q19's hi would
    // otherwise fail the 1.20x assertion for reasons unrelated to the
    // code under test (the r18 advisory). The era fixture's q19 hi is
    // additionally pinned at 0.5 below, the value the 1.20x claim needs.
    val eraText = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("bench_runs/r17/envelope.json")), "UTF-8")
    val hiBands = """"(q\w+)":\s*\{"lo":\s*[\d.]+,\s*"hi":\s*([\d.]+)\}""".r
      .findAllMatchIn(eraText).map(m => m.group(1) -> m.group(2).toDouble)
      .toMap
    assert(hiBands.size == 116 && hiBands("q19_json_roundtrip") == 0.5,
      s"r17 envelope fixture parsed ${hiBands.size} bands")
    def exceed(suspectFile: String, otherFiles: Seq[String]) = {
      val (es, _) = ratios(load(suspectFile)._1, otherFiles.map(load(_)._2))
      WobbleWindow.bandExceedances(es, hiBands)
    }
    val runs = (1 to 3).map(r => s"bench_runs/r17/run$r.json")
    // the r17 verdict's done-criterion: one command names q19's 1.20x
    // without the operator opening the envelope file
    val confirm = exceed("bench_runs/r17/confirm.json", runs)
    assert(confirm.map(_._1.name) == Seq("q19_json_roundtrip"),
      confirm.map(_._1.name).toString)
    val (e19, hi19) = confirm.head
    assert(math.abs(e19.suspect / hi19 - 1.20) < 0.01, s"${e19.suspect} / $hi19")
    // SCALING.md's r17 claim, machine-checked: the three derivation
    // inputs adjudicate at zero exceedances each against the envelope
    // they derived (the first all-spotless derivation)
    runs.foreach { r =>
      val got = exceed(r, runs.filterNot(_ == r))
      assert(got.isEmpty, s"$r: ${got.map(_._1.name)}")
    }
  }

  test("committed r15 artifacts: run1's dominant window contains the q16-q24 exceedance cluster; run2 yields the q40-q51 window with q109 as an isolated spike") {
    def adjudicate(suspectFile: String, otherFiles: Seq[String]) = {
      val (es, _) = ratios(load(suspectFile)._1, otherFiles.map(load(_)._2))
      windows(es)
    }
    val (w1, _) = adjudicate("bench_runs/r15/run1.json",
      Seq("bench_runs/r15/run2.json", "bench_runs/r15/run3.json"))
    val names1 = w1.head.entries.map(_.name).toSet
    assert(Seq("q16_sessionize", "q21_season_parse", "q22_stint_agg",
      "q23_stateful_scan", "q24_first_match").forall(names1), w1.head.span)
    val (w2, spikes2) = adjudicate("bench_runs/r15/run2.json",
      Seq("bench_runs/r15/run1.json", "bench_runs/r15/run3.json"))
    assert(w2.exists { w =>
      val ns = w.entries.map(_.name).toSet
      ns("q40_token_count") && ns("q51_decontaminate")
    }, w2.map(_.span).toString)
    assert(spikes2.map(_.name).contains("q109_embed_dedup_lsh"))
  }
}
