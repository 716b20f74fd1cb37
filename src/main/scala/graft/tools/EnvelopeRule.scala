package graft.tools

/** The bench-envelope adjudication rule as a pure function — the chore
  * the r12/r13 reviews noted was executed by hand each round, now
  * committed as code so the derivation is reproducible from the run
  * artifacts. One rule, stated once (and spec-pinned by
  * EnvelopeRuleSpec):
  *
  *   - lo  := min(prior lo, 0.9x the best clean observation) — lo only
  *     tightens; it brackets every fast observation on record.
  *   - hi  := prior hi, UNLESS the worst clean observation crossed it —
  *     then 1.05x that worst, so a clean run adjudicates at zero
  *     exceedances (the envelope's purpose). hi never silently lowers;
  *     lowering happens only through a provisional-bar restore.
  *   - provisional restore: an entry carrying a `provisional_hi` record
  *     (a pre-drift bar kept on file while the host ran slow) RESTORES
  *     — hi := the recorded bar, record dropped — once the worst clean
  *     observation fits back inside it.
  *   - noise exclusion (the r9 signal): an isolated spike contradicted
  *     by the runs around it is machine noise, not steady state — with
  *     >= 3 observations, the single worst is excluded (and reported)
  *     when it exceeds [[NoiseFactor]]x the second worst. Two runs
  *     cannot outvote each other, so nothing is excluded below 3.
  *
  * Inputs are CLEAN runs by the operator's selection (zero-retime full
  * passes; the per-file retime counts are surfaced by
  * [[DeriveBenchEnvelope]] exactly so that selection is informed).
  * Values round to 3 decimals — the committed file's precision. */
object EnvelopeRule {

  /** A committed band: lo/hi plus the optional pre-drift provisional
    * bar awaiting restoration. */
  final case class Band(lo: Double, hi: Double, provisionalHi: Option[Double])

  /** One query's adjudication: the new band, what was excluded as
    * noise, and a human-readable action tag ("kept" | "lo_tightened" |
    * "hi_raised" | "restored" — tags compose, comma-joined). */
  final case class Adjudication(band: Band, excluded: Seq[Double], action: String)

  /** An isolated spike must exceed this multiple of the second-worst
    * clean observation to be excluded as noise. */
  val NoiseFactor = 1.5

  private def round3(v: Double): Double = math.rint(v * 1000) / 1000

  /** Split observations into (clean, excluded) under the r9 signal. */
  def excludeNoise(obs: Seq[Double]): (Seq[Double], Seq[Double]) = {
    val sorted = obs.sorted
    if (sorted.length >= 3 && sorted.last > NoiseFactor * sorted(sorted.length - 2))
      (sorted.init, Seq(sorted.last))
    else (sorted, Nil)
  }

  /** Adjudicate one query's band from its prior band and this round's
    * observations (seconds; callers drop failed-run sentinels first).
    * Empty observations keep the prior band untouched ("kept"). */
  def adjudicate(prior: Band, obs: Seq[Double]): Adjudication = {
    require(obs.forall(_ >= 0), s"observations must be non-negative, got $obs")
    // a provisional bar is by construction the PRE-drift hi kept on file
    // while the committed hi ran raised — a record above the committed hi
    // is a mistyped record, and restoring it would RAISE the band while
    // tagging it "restored"; a restore may only tighten
    prior.provisionalHi.foreach(bar => require(bar <= prior.hi,
      f"provisional bar $bar%.3f above the committed hi ${prior.hi}%.3f " +
        "— a restore can only tighten; fix the provisional record"))
    if (obs.isEmpty) return Adjudication(prior, Nil, "kept")
    val (clean, excluded) = excludeNoise(obs)
    val best = clean.min
    val worst = clean.max
    val lo = math.min(prior.lo, round3(0.9 * best))
    val (hi, prov, hiTag) = prior.provisionalHi match {
      case Some(bar) if worst <= bar => (bar, None, Some("restored"))
      case keep =>
        if (worst > prior.hi) (round3(1.05 * worst), keep, Some("hi_raised"))
        else (prior.hi, keep, None)
    }
    val tags = Seq(
      if (lo < prior.lo) Some("lo_tightened") else None, hiTag).flatten
    Adjudication(Band(lo, hi, prov), excluded,
      if (tags.isEmpty) "kept" else tags.mkString(","))
  }

  /** A graduation needs at least one full round of clean runs — a
    * single observation must not set a band. */
  val MinGraduationObs = 3

  /** Graduate a provisional-WIDE band: a newly added query's hi is
    * hand-set generous ("until history accumulates" — q116 in round
    * 16) because fresh-JVM measurements overshoot the in-suite steady
    * state. Once a full round of clean in-suite history exists, the
    * band should meet the same bar as every mature one — so, unlike
    * [[adjudicate]] (whose hi only ever rises, or restores), a
    * graduation RE-DERIVES hi as 1.05x the worst clean observation in
    * whichever direction that lies. The caller names the graduating
    * queries explicitly (DeriveBenchEnvelope's --graduate flag): the
    * lowering power stays a deliberate, audited act, never the
    * default rule. lo follows the normal tightening rule and the r9
    * noise exclusion applies before the worst is read. Fewer than
    * [[MinGraduationObs]] observations keep the band untouched. */
  def graduate(prior: Band, obs: Seq[Double]): Adjudication = {
    require(obs.forall(_ >= 0), s"observations must be non-negative, got $obs")
    require(prior.provisionalHi.isEmpty,
      "a band cannot both await a provisional restore and graduate — " +
        "the restore already records the hi the band should return to")
    if (obs.size < MinGraduationObs) return Adjudication(prior, Nil, "kept")
    val (clean, excluded) = excludeNoise(obs)
    val lo = math.min(prior.lo, round3(0.9 * clean.min))
    val hi = round3(1.05 * clean.max)
    val tags = Seq(
      if (lo < prior.lo) Some("lo_tightened") else None,
      if (hi != prior.hi) Some("graduated") else None).flatten
    Adjudication(Band(lo, hi, None), excluded,
      if (tags.isEmpty) "kept" else tags.mkString(","))
  }
}
