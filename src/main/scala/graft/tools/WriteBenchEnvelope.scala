package graft.tools

/** Regenerate BENCH_ENVELOPE.json from [[graft.Bench.envelope]] — run
  * after editing the envelope table (`sbt 'runMain
  * graft.tools.WriteBenchEnvelope'`). BenchEnvelopeSpec fails the build
  * whenever the committed file and the in-code table drift, so the bands
  * the bench adjudicates against are always the ones a reader sees. */
object WriteBenchEnvelope {
  def main(args: Array[String]): Unit = {
    val target = java.nio.file.Paths.get(
      args.headOption.getOrElse("BENCH_ENVELOPE.json"))
    java.nio.file.Files.write(target,
      graft.Bench.envelopeJson.getBytes("UTF-8"))
    System.err.println(s"wrote $target")
  }
}
