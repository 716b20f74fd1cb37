package graft.tools

import org.scalatest.funsuite.AnyFunSuite

import EnvelopeRule.{Band, adjudicate, excludeNoise}

/** Pins the committed envelope-derivation rule (lo = min(prior, 0.9x
  * best clean); hi raised only when crossed, to 1.05x worst clean;
  * provisional restore; r9 isolated-spike exclusion) so the automated
  * chore (DeriveBenchEnvelope) and the rule the rounds 11-13 notes
  * describe cannot drift. */
class EnvelopeRuleSpec extends AnyFunSuite {

  test("lo only tightens: 0.9x the best clean observation, floored at the prior") {
    val a = adjudicate(Band(0.5, 1.0, None), Seq(0.4, 0.45, 0.48))
    assert(a.band == Band(0.36, 1.0, None) && a.action == "lo_tightened")
    // a slower round never raises lo
    val b = adjudicate(Band(0.5, 1.0, None), Seq(0.7, 0.8))
    assert(b.band.lo == 0.5 && b.action == "kept")
  }

  test("hi is kept while clean observations stay inside; raised to 1.05x worst when crossed") {
    val kept = adjudicate(Band(0.5, 1.0, None), Seq(0.6, 0.9, 0.99))
    assert(kept.band.hi == 1.0)
    val raised = adjudicate(Band(0.5, 1.0, None), Seq(0.6, 0.9, 1.2))
    assert(raised.band.hi == 1.26 && raised.action.contains("hi_raised"),
      raised.toString)
  }

  test("a provisional bar restores once the worst clean observation fits back inside it") {
    val restored = adjudicate(Band(0.15, 0.28, Some(0.22)), Seq(0.17, 0.18, 0.2))
    assert(restored.band == Band(0.15, 0.22, None), restored.toString)
    assert(restored.action.contains("restored"))
    // still above the bar: the record is KEPT (hi untouched) — retiring
    // it is an operator decision, not the rule's
    val kept = adjudicate(Band(0.15, 0.28, Some(0.22)), Seq(0.24, 0.25))
    assert(kept.band == Band(0.15, 0.28, Some(0.22)), kept.toString)
  }

  test("r9 noise signal: an isolated spike is excluded only when 3+ runs contradict it") {
    assert(excludeNoise(Seq(0.5, 0.52, 1.4)) == (Seq(0.5, 0.52), Seq(1.4)))
    // two runs cannot outvote each other
    assert(excludeNoise(Seq(0.5, 1.4)) == (Seq(0.5, 1.4), Nil))
    // a sustained shift (spike corroborated by its neighbor) is NOT noise
    assert(excludeNoise(Seq(0.5, 1.3, 1.4)) == (Seq(0.5, 1.3, 1.4), Nil))
    // and the excluded spike does not reach the hi adjudication
    val a = adjudicate(Band(0.4, 0.8, None), Seq(0.5, 0.52, 1.4))
    assert(a.band.hi == 0.8 && a.excluded == Seq(1.4), a.toString)
  }

  test("a mistyped provisional bar ABOVE the committed hi fails loudly instead of raising under a 'restored' tag") {
    val e = intercept[IllegalArgumentException] {
      adjudicate(Band(0.15, 0.28, Some(0.35)), Seq(0.17, 0.18, 0.2))
    }
    assert(e.getMessage.contains("can only tighten"), e.getMessage)
    // the check guards the band's SHAPE, so it fires even when no
    // observation would trigger the restore branch
    intercept[IllegalArgumentException] {
      adjudicate(Band(0.15, 0.28, Some(0.35)), Seq(0.3, 0.31))
    }
    // a bar exactly at the hi is a legal (degenerate) record
    val ok = adjudicate(Band(0.15, 0.28, Some(0.28)), Seq(0.17, 0.2))
    assert(ok.band == Band(0.15, 0.28, None) && ok.action.contains("restored"))
  }

  test("parseRun fails loudly on a nested or partially-matching queries map instead of truncating") {
    val flat = """{"metric":"total","value":2.0,"unit":"sec","queries":{"q01_a":1.25,"q02_b":0.75},"sf":0.1}"""
    val (qs, (retimes, failed)) = DeriveBenchEnvelope.parseRun(flat)
    assert(qs == Map("q01_a" -> 1.25, "q02_b" -> 0.75) && retimes == 0 && failed == 0)
    val nested = """{"metric":"total","value":2.0,"queries":{"q01_a":{"observed":3.0},"q02_b":0.75}}"""
    val e1 = intercept[RuntimeException](DeriveBenchEnvelope.parseRun(nested))
    assert(e1.getMessage.contains("not flat"), e1.getMessage)
    val partial = """{"metric":"total","value":2.0,"queries":{"q01_a":1.25,"bogus":0.75}}"""
    val e2 = intercept[RuntimeException](DeriveBenchEnvelope.parseRun(partial))
    assert(e2.getMessage.contains("partial parse"), e2.getMessage)
  }

  test("graduation re-derives a provisional-wide hi at 1.05x the worst clean observation — in either direction") {
    // the q116 shape: hand-set generous hi, in-suite steady state far
    // below it — graduation LOWERS to the same bar mature bands meet
    val down = EnvelopeRule.graduate(Band(1.098, 3.6, None), Seq(1.15, 1.22, 1.19))
    assert(down.band == Band(1.035, 1.281, None), down.toString)
    assert(down.action == "lo_tightened,graduated")
    // steady state ABOVE the hand-set hi graduates upward with the
    // same formula — no special case
    val up = EnvelopeRule.graduate(Band(0.5, 1.0, None), Seq(1.1, 1.2, 1.15))
    assert(up.band.hi == 1.26 && up.action == "graduated", up.toString)
    // the r9 noise exclusion still shields the worst-read
    val noisy = EnvelopeRule.graduate(Band(0.5, 3.0, None), Seq(0.6, 0.62, 1.4))
    assert(noisy.band.hi == 0.651 && noisy.excluded == Seq(1.4), noisy.toString)
  }

  test("graduation refuses thin history and provisional-restore records") {
    // fewer than MinGraduationObs observations: band untouched
    val thin = EnvelopeRule.graduate(Band(1.0, 3.6, None), Seq(1.2, 1.3))
    assert(thin.band == Band(1.0, 3.6, None) && thin.action == "kept")
    // a band awaiting a provisional restore has its own lowering path
    intercept[IllegalArgumentException] {
      EnvelopeRule.graduate(Band(0.15, 0.28, Some(0.22)), Seq(0.17, 0.18, 0.2))
    }
  }

  test("empty observations keep the prior band; rounding is the committed 3 decimals") {
    assert(adjudicate(Band(0.5, 1.0, Some(0.9)), Nil) ==
      EnvelopeRule.Adjudication(Band(0.5, 1.0, Some(0.9)), Nil, "kept"))
    val a = adjudicate(Band(1.0, 1.0, None), Seq(0.3334))
    assert(a.band.lo == 0.3) // 0.9 * 0.3334 = 0.30006 -> 0.3
  }
}
