package graft.tools

/** Derive the adjudicated bench envelope from recorded run JSONs —
  * `sbt 'runMain graft.tools.DeriveBenchEnvelope [--graduate=q,…]
  * [--watch=q,…] run1.json run2.json …'` — applying [[EnvelopeRule]]
  * per query against the CURRENT committed bands
  * ([[graft.Bench.envelope]] + its provisional records); queries named
  * by `--graduate` take [[EnvelopeRule.graduate]] (the
  * provisional-wide band's one-time re-derivation, which may lower hi)
  * instead; queries named by `--watch` get an explicit stderr
  * adjudication line even when kept (a flagged possibly-tight band
  * whose fresh runs come back clean otherwise leaves no audit trace).
  *
  * Ends the hand-executed envelope chore the r12/r13 reviews flagged:
  * the operator records N clean full runs (graft.Bench's stdout, one
  * file per run), points this main at them, and pastes the emitted
  * Scala rows into Bench.envelope (the single source of truth —
  * BenchEnvelopeSpec pins the committed JSON to it; regenerate the file
  * with [[WriteBenchEnvelope]] afterwards). Stderr carries the audit:
  * per-file retime/failed counts (a run with retimes is NOT clean —
  * drop it from the input set), every noise exclusion, and every
  * band change with its rule tag, so the adjudication is reviewable
  * without re-running anything.
  *
  * Parsing is deliberately narrow: only the `"queries":{…}` map of the
  * bench line is read (name -> seconds; failed-query `-1` sentinels are
  * dropped), via a regex that cannot match the `retimed` sub-objects or
  * the `slowest` trailer — no JSON library exists in the offline build,
  * and the bench emits exactly this shape ([[graft.Bench]]). */
object DeriveBenchEnvelope {

  private val QuerySeconds =
    """"(q\d+[A-Za-z0-9_]*)":(-?\d+(?:\.\d+)?(?:[eE]-?\d+)?)""".r

  /** name -> seconds for one recorded bench run (failed sentinels
    * dropped), plus (retimeCount, failedCount) for the cleanliness
    * audit. */
  private[tools] def parseRun(text: String): (Map[String, Double], (Int, Int)) = {
    val (seq, counts) = parseRunOrdered(text)
    (seq.filter(_._2 >= 0).toMap, counts)
  }

  /** Like [[parseRun]] but preserving the run's EMISSION order (the
    * order queries were timed — what [[WobbleWindow]]'s contiguous-
    * window analysis is defined over) and keeping failed sentinels in
    * place for the caller to drop. */
  private[tools] def parseRunOrdered(
      text: String): (Seq[(String, Double)], (Int, Int)) = {
    val line = text.linesIterator
      .find(l => l.contains("\"metric\":\"total\"") && l.contains("\"queries\":{"))
      .getOrElse(sys.error("no bench output line with a \"queries\" map found"))
    val qs = line.indexOf("\"queries\":{")
    val qe = line.indexOf("}", qs)
    val inner = line.substring(qs + "\"queries\":{".length, qe)
    // the narrow parse is correct ONLY for a flat map: a future nested
    // value would put a '{' before the first '}' and silently truncate
    // the run — fail loudly instead, and pin that every comma-separated
    // entry actually matched the name:seconds regex
    require(!inner.contains("{"),
      "queries map is not flat — the first-'}' parse would truncate the " +
        "run; extend the parser before deriving bands from this file")
    val entryCount = inner.split(",").count(_.trim.nonEmpty)
    val queries = QuerySeconds
      .findAllMatchIn(line.substring(qs, qe + 1))
      .map(m => m.group(1) -> m.group(2).toDouble).toSeq
    require(queries.size == entryCount &&
        queries.map(_._1).distinct.size == queries.size,
      s"parsed ${queries.size} of $entryCount entries in the queries map " +
        "(malformed or duplicate entries) — refusing to derive bands " +
        "from a partial parse")
    val retimes = "\"observed\":".r.findAllIn(line).length
    val failed = queries.count(_._2 < 0)
    (queries, (retimes, failed))
  }

  def main(args: Array[String]): Unit = {
    // --graduate=<query>[,<query>…]: re-derive these queries' hi bands
    // as 1.05x the worst clean observation in EITHER direction (the
    // provisional-wide graduation, EnvelopeRule.graduate) instead of
    // the raise-only default. Explicit and repeatable: lowering a band
    // is a deliberate act the audit trail names.
    val (flags, files) = args.toSeq.partition(_.startsWith("--"))
    val graduating = flags.flatMap {
      case s if s.startsWith("--graduate=") =>
        s.stripPrefix("--graduate=").split(',').filter(_.nonEmpty)
      case s if s.startsWith("--watch=") => Nil
      case s => sys.error(
        s"unknown flag $s (only --graduate=<q>[,<q>…] and --watch=<q>[,<q>…])")
    }.toSet
    // --watch=<query>[,<query>…]: print an explicit stderr adjudication
    // line for these queries EVEN WHEN their bands are kept — a band the
    // previous round flagged as possibly tight-by-luck otherwise leaves
    // no trace in the audit when the fresh runs simply come back clean
    // (the r17 verdict's q19/q01 watch directive: "done = the next
    // derivation's stderr adjudicates both explicitly").
    val watching = flags.flatMap {
      case s if s.startsWith("--watch=") =>
        s.stripPrefix("--watch=").split(',').filter(_.nonEmpty)
      case _ => Nil
    }.toSet
    for ((set, flag) <- Seq(graduating -> "--graduate", watching -> "--watch"))
      set.filterNot(q => graft.Bench.envelope.exists(_._1 == q)) match {
        case bad if bad.nonEmpty =>
          sys.error(s"$flag names unknown queries: ${bad.mkString(",")}")
        case _ => ()
      }
    require(files.nonEmpty,
      "usage: DeriveBenchEnvelope [--graduate=q,…] [--watch=q,…] " +
        "<bench-run.json> [more runs…]")
    val runs = files.map { f =>
      val text = new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
      val (qs, (retimes, failed)) = parseRun(text)
      System.err.println(
        s"[derive] $f: ${qs.size} queries, $retimes retimes, $failed failed" +
          (if (retimes > 0) "  <-- NOT a clean run; consider dropping it"
           else ""))
      qs
    }
    var changed = 0
    val rows = graft.Bench.envelope.map { case (name, lo, hi) =>
      val prior = EnvelopeRule.Band(lo, hi, graft.Bench.provisionalHi.get(name))
      val obs = runs.flatMap(_.get(name))
      if (obs.size < runs.size)
        System.err.println(
          s"[derive] WARN: $name present in only ${obs.size}/${runs.size} runs")
      val adj =
        if (graduating(name)) EnvelopeRule.graduate(prior, obs)
        else EnvelopeRule.adjudicate(prior, obs)
      if (graduating(name) && obs.size < EnvelopeRule.MinGraduationObs)
        System.err.println(s"[derive] WARN: $name cannot graduate on " +
          s"${obs.size} observation(s) (< ${EnvelopeRule.MinGraduationObs}) " +
          "— band kept")
      adj.excluded.foreach(x => System.err.println(
        f"[derive] $name: excluded $x%.3fs as an isolated spike " +
          s"(clean set ${adj.excluded.size} removed of ${obs.size})"))
      if (watching(name)) {
        // the verdict must agree with the adjudication it annotates: it
        // is computed from the CLEAN set (obs minus the noise
        // exclusions adjudicate already removed), not the raw max — a
        // watched query whose worst observation was excluded as an
        // isolated spike would otherwise print "crossed hi" on a band
        // the rule legitimately kept, a contradictory audit line (the
        // r18 advisory). Excluded observations are still named inline.
        val clean = adj.excluded.foldLeft(obs.toList) { (rem, x) =>
          val i = rem.indexOf(x)
          if (i >= 0) rem.patch(i, Nil, 1) else rem
        }
        val excludedNote =
          if (adj.excluded.isEmpty) ""
          else adj.excluded.map(x => f"$x%.3f")
            .mkString(" (excluded as noise: ", "/", ")")
        val verdict =
          if (clean.isEmpty) "NO CLEAN OBSERVATIONS" + excludedNote
          else if (clean.max > prior.hi)
            f"crossed hi (clean worst ${clean.max}%.3f > ${prior.hi}%.3f)" +
              excludedNote
          else f"all in-band (clean worst ${clean.max}%.3f vs hi " +
            f"${prior.hi}%.3f, ${clean.max / prior.hi * 100}%.0f%% of " +
            "the bar)" + excludedNote
        System.err.println(
          s"[derive] WATCH $name: obs " +
            obs.map(o => f"$o%.3f").mkString("/") +
            f" vs band ${prior.lo}%.3f..${prior.hi}%.3f — $verdict; " +
            s"band ${adj.action}")
      }
      if (adj.action != "kept") {
        changed += 1
        System.err.println(f"[derive] $name: ${adj.action} " +
          f"(${lo}%.3f..${hi}%.3f -> ${adj.band.lo}%.3f..${adj.band.hi}%.3f" +
          adj.band.provisionalHi.fold("")(p => f", provisional $p%.3f kept") + ")")
      }
      name -> adj.band
    }
    System.err.println(s"[derive] $changed of ${rows.size} bands changed; " +
      "paste the rows below into Bench.envelope, move any remaining " +
      "provisional entries into Bench.provisionalHi, then regenerate the " +
      "committed file with WriteBenchEnvelope")
    rows.foreach { case (name, b) =>
      val lo = if (b.lo == b.lo.toLong) b.lo.toLong.toString else b.lo.toString
      val hi = if (b.hi == b.hi.toLong) b.hi.toLong.toString else b.hi.toString
      println(s"""    ("$name", $lo, $hi),""")
    }
    val prov = rows.collect { case (n, EnvelopeRule.Band(_, _, Some(p))) =>
      s""""$n" -> $p""" }
    println(prov.mkString("  provisionalHi: Map(", ", ", ")"))
  }
}
