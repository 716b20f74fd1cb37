package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Retry semantics of the REST source (api/smart.py:548-583). */
class FetcherSpec extends AnyFunSuite {

  private val req = Endpoints.gameRotation("0022400236")

  private class Flaky(failures: Int) extends Fetcher.Transport {
    var calls = 0
    def get(r: Endpoints.Request): String = {
      calls += 1
      if (calls <= failures) throw new RuntimeException(s"boom ${calls}")
      s"""{"resultSets":[]}"""
    }
  }

  test("succeeds after transient failures, with backoff between attempts") {
    val t = new Flaky(3)
    val sleeps = scala.collection.mutable.ListBuffer.empty[Long]
    val body = Fetcher.fetch(t, req, retries = 10, backoffMs = 7, sleep = sleeps += _)
    assert(body.contains("resultSets"))
    assert(t.calls == 4)
    assert(sleeps.toSeq == Seq(7, 14, 21)) // linear backoff
  }

  test("exhausts the retry budget and propagates the last error (reference raises after 10)") {
    val t = new Flaky(Int.MaxValue)
    val e = intercept[Fetcher.FetchFailedException] {
      Fetcher.fetch(t, req, retries = 10, backoffMs = 0, sleep = _ => ())
    }
    assert(t.calls == 10)
    assert(e.getMessage.contains("after 10 attempts"))
    assert(e.getCause.getMessage == "boom 10")
  }

  test("endpoint catalog carries the reference's parameter tuples") {
    val gl = Endpoints.teamsGameLog(season = "2024-25")
    assert(gl.path == "leaguegamelog")
    assert(gl.param("sorter").contains("DATE") && gl.param("direction").contains("ASC"))
    assert(gl.param("Season").contains("2024-25") && gl.param("playerOrTeam").contains("T"))
  }
}
