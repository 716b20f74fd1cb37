package graft.sources

/** The HTTP half of the REST source (reference: api/smart.py:548-583;
  * SURVEY.md §2.1 S1/S2): fetch an endpoint with a bounded retry budget.
  *
  * The transport is an interface because this environment has zero egress —
  * production would drop in a `java.net.http.HttpClient` implementation;
  * tests use deterministic fakes. Retry semantics match the reference
  * (any failure or non-200 retries, 10 attempts, then the last error
  * propagates) with one deliberate improvement: linear backoff instead of
  * the reference's immediate recursive retry (api/smart.py:551-583 hammers
  * the API with zero delay; its SLEEP_TIME rate limiter is defined but
  * never called, utils/utils.py:17,62-63).
  *
  * At scale the fan-out over game-ids runs as `mapPartitions` over an RDD
  * of requests (SURVEY.md §2.1 S1) — each task owns its retry loop, and
  * Spark task retries add a second layer for free.
  */
object Fetcher {

  trait Transport extends Serializable {
    /** Return the response body for a 200, or throw. */
    def get(request: Endpoints.Request): String
  }

  final class FetchFailedException(msg: String, cause: Throwable)
    extends RuntimeException(msg, cause)

  def fetch(
      transport: Transport,
      request: Endpoints.Request,
      retries: Int = 10,
      backoffMs: Long = 100,
      sleep: Long => Unit = Thread.sleep): String = {
    var attempt = 0
    var last: Throwable = null
    while (attempt < retries) {
      try return transport.get(request)
      catch {
        // NonFatal only: an InterruptedException (Spark killing the task)
        // or an Error must propagate immediately, not burn the retry
        // budget re-issuing requests for a dead task
        case e: Throwable if scala.util.control.NonFatal(e) =>
          last = e
          attempt += 1
          if (attempt < retries) sleep(backoffMs * attempt)
      }
    }
    throw new FetchFailedException(
      s"${request.path} failed after $retries attempts", last)
  }
}
