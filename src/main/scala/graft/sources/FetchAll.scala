package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The at-scale composition of the REST source — S1's distributed form
  * (SURVEY.md §2.1): a `Dataset[Endpoints.Request]` fans out over the
  * cluster via `mapPartitions`, each task fetching its slice through
  * [[Fetcher.fetch]] (so every request owns an independent retry budget),
  * and the bodies decode through [[RestDecoder.parse]] — fully distributed
  * end to end, no driver-side loop.
  *
  * Reference analog: the ThreadPoolExecutor fan-out
  * (etl/play_by_play_with_players.py:227-239) and the per-game fetch loops
  * (etl/rotations.py:128-140). Spark tasks replace worker threads, so the
  * same shape scales from one process to a 1000-executor cluster purely by
  * partition count: `requests.repartition(n)` picks the fetch parallelism,
  * and within a partition requests go out sequentially with Fetcher's
  * linear backoff — which is also the natural per-connection rate limit
  * (T5) an API-friendly crawl wants.
  */
object FetchAll {

  /** One fetch outcome: the request identity plus either the body or the
    * error, never both. A request that exhausts its retry budget becomes
    * DATA (an error row), not a task death — the reference catches per game
    * and keeps going (etl/rotations.py:129-137); letting the Spark task die
    * would instead re-fetch every healthy request in the partition on the
    * task retry. */
  final case class Fetched(
      path: String,
      params: Seq[(String, String)],
      body: Option[String],
      error: Option[String])

  /** Distributed fan-out fetch. Per-request isolation: one request's
    * failures burn only its own retry budget and, if terminal, only its own
    * row. The transport is serialized into each task (it is `Serializable`
    * by contract); connection/client init belongs in the transport's lazy
    * state so it happens once per task, not per request. */
  def fetchRaw(
      requests: Dataset[Endpoints.Request],
      transport: Fetcher.Transport,
      retries: Int = 10,
      backoffMs: Long = 100): Dataset[Fetched] = {
    import requests.sparkSession.implicits._
    requests.mapPartitions { it =>
      it.map { r =>
        try Fetched(r.path, r.params,
          Some(Fetcher.fetch(transport, r, retries, backoffMs)), None)
        catch {
          case e: Fetcher.FetchFailedException =>
            val cause = Option(e.getCause).map(c => s": ${c.getMessage}").getOrElse("")
            Fetched(r.path, r.params, None, Some(s"${e.getMessage}$cause"))
        }
      }
    }
  }

  /** The quarantine side of a fetch pass (T4): requests that exhausted
    * their retry budget, with the terminal error. */
  def failures(fetched: Dataset[Fetched]): Dataset[Fetched] =
    fetched.filter(_.error.isDefined)

  /** The composed operator the sources documented all along:
    * fan-out fetch -> distributed envelope decode. Returns the parsed
    * (name, headers, row) frame of every SUCCESSFUL fetch — callers slice
    * result sets out with [[RestDecoder.resultSet]]/[[RestDecoder.cast]],
    * and inspect the quarantine via [[fetchRaw]]+[[failures]] when they
    * need per-request error accounting. */
  def fetchAll(
      requests: Dataset[Endpoints.Request],
      transport: Fetcher.Transport,
      retries: Int = 10,
      backoffMs: Long = 100)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    RestDecoder.parse(
      fetchRaw(requests, transport, retries, backoffMs).flatMap(_.body))
  }
}
