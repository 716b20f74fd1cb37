package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's self-adjudication contract: the committed envelope file is
  * byte-identical to the in-code table the retime pass actually uses, and
  * the table tracks the query registry — so BENCH_r{N}.json totals are
  * explainable from BENCH_ENVELOPE.json without a manual rerun. */
class BenchEnvelopeSpec extends AnyFunSuite {

  test("BENCH_ENVELOPE.json mirrors Bench.envelope exactly (no drift)") {
    val onDisk = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("BENCH_ENVELOPE.json")), "UTF-8")
    assert(onDisk == Bench.envelopeJson,
      "envelope file drifted from Bench.envelope — regenerate with " +
        "sbt 'runMain graft.tools.WriteBenchEnvelope'")
  }

  test("the envelope covers the registry one-to-one with sane bands") {
    val names = Bench.envelope.map(_._1)
    assert(names.distinct == names, "duplicate envelope entries")
    assert(names.toSet == SparkEntry.queries.keySet,
      s"envelope and registry must track: only-envelope=" +
        s"${names.toSet -- SparkEntry.queries.keySet} only-registry=" +
        s"${SparkEntry.queries.keySet -- names.toSet}")
    Bench.envelope.foreach { case (q, lo, hi) =>
      assert(lo > 0 && hi >= lo, s"$q band [$lo, $hi] is not a band")
    }
  }
}
