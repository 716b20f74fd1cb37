package graft.corpus

/** The tiny shared CLI surface of the corpus mains: `--key value` pairs
  * with a closed flag set, and the `src:cut,src:cut` mix-rate grammar —
  * one parser, so a grammar fix cannot land in one main and miss the
  * other. Exits (2) with `usage` on any malformed input, matching the
  * reference scripts' argparse behavior — including malformed VALUES
  * (`--capacity ten`), which must die with the usage line, not an
  * uncaught NumberFormatException stack trace. */
private[corpus] object Cli {

  /** Parse `argv` as `--key value` pairs. Exits with `usage` when argv is
    * odd, any key position lacks the `--` prefix (a dropped pair would
    * silently disable the stage the user asked for), any VALUE position
    * starts with `--` (an omitted value otherwise consumes the next flag
    * while argv stays even — `--output --capacity` would create a
    * directory literally named "--capacity" and silently drop the
    * capacity flag), a flag repeats (silent last-wins hides a typo), a
    * flag is outside `allowed`, or a `required` flag is absent. */
  def parseArgs(argv: Array[String], allowed: Set[String],
      required: Set[String], usage: String): Map[String, String] = {
    val pairs = argv.grouped(2).toSeq
    val keys = pairs.collect { case Array(k, _) => k }
    val values = pairs.collect { case Array(_, v) => v }
    val args = pairs.collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    if (argv.length % 2 != 0 ||
        keys.exists(!_.startsWith("--")) ||
        values.exists(_.startsWith("--")) ||
        keys.distinct.length != keys.length ||
        (args.keySet -- allowed).nonEmpty ||
        !required.subsetOf(args.keySet)) {
      System.err.println(usage)
      sys.exit(2)
    }
    args
  }

  /** Convert a flag's value, turning any conversion failure into the
    * documented exit-2-with-usage instead of a stack trace. */
  private def converted[A](flag: String, value: String, kind: String,
      usage: String)(f: String => A): A =
    try f(value)
    catch { case _: IllegalArgumentException => // NumberFormatException included
      System.err.println(s"bad --$flag value '$value' (want $kind)")
      System.err.println(usage)
      sys.exit(2)
    }

  def toInt(args: Map[String, String], flag: String, usage: String): Option[Int] =
    args.get(flag).map(converted(flag, _, "an integer", usage)(_.toInt))

  def toLong(args: Map[String, String], flag: String, usage: String): Option[Long] =
    args.get(flag).map(converted(flag, _, "an integer", usage)(_.toLong))

  def toDouble(args: Map[String, String], flag: String, usage: String): Option[Double] =
    args.get(flag).map(converted(flag, _, "a number", usage)(_.toDouble))

  def toBoolean(args: Map[String, String], flag: String, usage: String): Option[Boolean] =
    args.get(flag).map(converted(flag, _, "true|false", usage)(_.toBoolean))

  /** Parse the `--split-cuts tt:vv` pair: two lowercase hex bytes with
    * tt strictly below vv (the train upper bound below the val upper
    * bound — equal cuts would silently publish an empty val split, a
    * config bug). The cuts compare against md5-prefix strings, so
    * fixed-width lowercase hex is required for the `<` ordering to mean
    * what it reads as. */
  def parseSplitCuts(spec: String, usage: String): (String, String) =
    spec.split(':') match {
      case Array(t, v) if t.matches("[0-9a-f]{2}") &&
          v.matches("[0-9a-f]{2}") && t < v => (t, v)
      case _ =>
        System.err.println(s"bad --split-cuts value '$spec' " +
          "(want tt:vv — two lowercase hex bytes, tt < vv)")
        System.err.println(usage)
        sys.exit(2)
    }

  /** Parse the `src0:ff,src1:7f` mix-rate list. */
  def parseMix(spec: String): Seq[(String, String)] =
    spec.split(',').toSeq.map { kv =>
      kv.split(':') match {
        case Array(s, c) => s -> c
        case _ =>
          System.err.println(s"bad --mix entry '$kv' (want source:cut)")
          sys.exit(2)
      }
    }
}
