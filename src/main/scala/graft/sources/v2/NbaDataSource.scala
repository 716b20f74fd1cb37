package graft.sources.v2

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{Endpoints, Fetcher}

/** DataSourceV2 table over the REST source: `spark.read.format("nba")`
  * plans a partitioned, column-pruned scan whose input partitions are
  * id-range slices of the request fan-out — the V2 rendering of
  * [[graft.sources.FetchAll]] (each task fetches its slice with Fetcher's
  * per-request retry budget and decodes the declared result set).
  *
  * Options:
  *   - `path`        endpoint path, e.g. "gamerotation" (required)
  *   - `resultSet`   result-set name to decode, e.g. "AwayTeam" (required)
  *   - `ids`         comma-separated id list to fan out over (required)
  *   - `idParam`     request key the id binds to (default "GameID" —
  *                   case-preserved: the stats API is case-sensitive)
  *   - `idsPerPartition` fan-out granularity (default 8): one input
  *                   partition per slice, so scan parallelism = ids/slice
  *   - `transport`   FQCN of a [[Fetcher.Transport]] (no-arg class or
  *                   Scala object); instantiated per partition reader on
  *                   the executor (required — production would default to
  *                   an HttpClient transport; this environment has none)
  *   - `retries` / `backoffMs`  Fetcher budget (defaults 10 / 100)
  *   - `onError`     "fail" (default: a terminal fetch failure fails the
  *                   scan) or "skip" (one dead id costs its rows, logged —
  *                   the reference's per-game try/except; without this a
  *                   deterministic dead id would re-fail the task until
  *                   maxFailures kills the whole job)
  *
  * Schema: inferred by probing the FIRST id at planning time (headers →
  * all-string columns, the decode-as-strings contract of RestDecoder), or
  * user-supplied via `.schema(...)` with string/long/int/double/float/
  * boolean columns cast at read time. Column pruning is pushed into the
  * scan (`SupportsPushDownRequiredColumns`), so `select(one column)` reads
  * only that column out of each decoded row.
  *
  * Reference analog: the per-game fetch loops (etl/rotations.py:128-140)
  * — here as a first-class table any Spark query can scan, prune and join.
  */
class NbaDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nba"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NbaScanConf(options.asCaseSensitiveMap().asScala.toMap).probeSchema()

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NbaTable(schema, NbaScanConf(properties.asScala.toMap))
}

/** Parsed, serializable scan configuration (keys case-insensitive like the
  * option map they come from; values case-preserved). */
final case class NbaScanConf(options: Map[String, String]) {
  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  private def req(key: String): String = opt(key).getOrElse(
    throw new IllegalArgumentException(s"the nba source requires option '$key'"))

  def path: String = req("path")
  def resultSet: String = req("resultSet")
  def ids: Seq[String] = req("ids").split(",").map(_.trim).filter(_.nonEmpty).toSeq
  def idParam: String = opt("idParam").getOrElse("GameID")
  def idsPerPartition: Int = opt("idsPerPartition").map(_.toInt).getOrElse(8)
  def retries: Int = opt("retries").map(_.toInt).getOrElse(10)
  def backoffMs: Long = opt("backoffMs").map(_.toLong).getOrElse(100L)
  def skipErrors: Boolean = opt("onError").exists(_.equalsIgnoreCase("skip"))

  def request(id: String): Endpoints.Request =
    Endpoints.Request(path, Seq(idParam -> id))

  /** Instantiate the transport by FQCN — a Scala `object` (trailing '$',
    * via MODULE$) or a no-arg class. Called lazily on the executor. */
  def transport(): Fetcher.Transport = {
    val cn = req("transport")
    val cls = Class.forName(cn)
    val inst =
      if (cn.endsWith("$")) cls.getField("MODULE$").get(null)
      else cls.getDeclaredConstructor().newInstance()
    inst.asInstanceOf[Fetcher.Transport]
  }

  /** Planning-time schema probe: fetch one id, take the result set's
    * headers as all-string columns. Honors onError=skip — a dead FIRST id
    * must not fail the whole scan at planning time, so the probe walks the
    * id list until one fetch decodes (without skip, the first failure
    * propagates, matching the scan's own failure mode).
    *
    * Every body the probe successfully fetches is parked in [[ProbeCache]]
    * so the scan ships it to the executor inside the InputPartition instead
    * of paying the probe id's fetch a second time. */
  def probeSchema(): StructType = {
    require(ids.nonEmpty, "the nba source needs at least one id")
    val t = transport()
    val headers = ids.iterator
      .map { id =>
        val rq = request(id)
        try {
          val body = Fetcher.fetch(t, rq, retries, backoffMs)
          ProbeCache.put(rq, body)
          NbaEnvelope.headersOf(body, resultSet)
        } catch {
          case e: Fetcher.FetchFailedException if skipErrors =>
            System.err.println(s"[nba] schema probe skipping id $id: ${e.getMessage}")
            None
        }
      }
      .collectFirst { case Some(h) => h }
      .getOrElse(throw new IllegalArgumentException(
        s"result set '$resultSet' absent from every probe fetch of $path"))
    StructType(headers.map(StructField(_, StringType)))
  }
}

/** Driver-side cache of probe-fetched bodies: the planning-time schema
  * probe already paid for a full response, so the scan reuses it rather
  * than refetching the probe id. Consume-once (taken at planInputPartitions
  * time): a re-planned scan of the same table simply refetches, so a
  * cached body can never be served twice — staleness is bounded by one
  * plan of one read. Driver-only by construction: both probeSchema and
  * planInputPartitions run at planning; the body travels to the executor
  * serialized inside [[NbaIdSlice]]. */
private[v2] object ProbeCache {
  private val bodies =
    new java.util.concurrent.ConcurrentHashMap[Endpoints.Request, String]()
  def put(request: Endpoints.Request, body: String): Unit =
    bodies.put(request, body)
  def take(request: Endpoints.Request): Option[String] =
    Option(bodies.remove(request))
}

/** Jackson-based envelope decode for the V2 readers (RestDecoder's Spark
  * JSON reader needs a session; partition readers must not). */
object NbaEnvelope {
  // one mapper per JVM: ObjectMapper is thread-safe for readTree and
  // costs real setup time — per-request allocation would tax every fetch
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def sets(body: String) =
    mapper.readTree(body).path("resultSets").elements().asScala

  def headersOf(body: String, name: String): Option[Seq[String]] =
    sets(body).find(_.path("name").asText() == name)
      .map(_.path("headers").elements().asScala.map(_.asText()).toSeq)

  /** (headers, rows) of one named result set; absent/empty sets yield no
    * rows (reference skips empty sets, api/smart.py:570). */
  def rowsOf(body: String, name: String): (Seq[String], Iterator[Array[String]]) =
    sets(body).find(_.path("name").asText() == name) match {
      case None => (Seq.empty, Iterator.empty)
      case Some(rs) =>
        val headers = rs.path("headers").elements().asScala.map(_.asText()).toSeq
        val rows = rs.path("rowSet").elements().asScala.map { row =>
          row.elements().asScala.map(c => if (c.isNull) null else c.asText()).toArray
        }
        (headers, rows)
    }
}

class NbaTable(tableSchema: StructType, conf: NbaScanConf) extends Table with SupportsRead {
  override def name(): String = s"nba:${conf.path}/${conf.resultSet}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NbaScanBuilder(tableSchema, conf)
}

class NbaScanBuilder(full: StructType, conf: NbaScanConf)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new NbaScan(required, conf)
}

class NbaScan(required: StructType, conf: NbaScanConf) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"nba ${conf.path}/${conf.resultSet} over ${conf.ids.length} ids"

  /** One input partition per id slice — the scan's parallelism contract:
    * ceil(|ids| / idsPerPartition) tasks, each owning its fetch loop. Ids
    * whose body the schema probe already fetched ride along prefetched, so
    * the executor skips their fetch. Memoized: Spark calls
    * planInputPartitions more than once per query (physical planning and
    * execution each ask), and the ProbeCache take() is consume-once — the
    * slices must be computed exactly once per Scan so the call that
    * consumes the cache is the one whose slices actually execute. */
  private lazy val slices: Array[InputPartition] =
    conf.ids.grouped(conf.idsPerPartition).map { s =>
      val pre = s.flatMap(id => ProbeCache.take(conf.request(id)).map(id -> _)).toMap
      NbaIdSlice(s.toArray, pre)
    }.toArray

  override def planInputPartitions(): Array[InputPartition] = slices

  override def createReaderFactory(): PartitionReaderFactory =
    NbaReaderFactory(required, conf)
}

final case class NbaIdSlice(ids: Array[String],
    prefetched: Map[String, String] = Map.empty) extends InputPartition

final case class NbaReaderFactory(schema: StructType, conf: NbaScanConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NbaPartitionReader(schema, conf, p.asInstanceOf[NbaIdSlice])
}

class NbaPartitionReader(schema: StructType, conf: NbaScanConf, slice: NbaIdSlice)
    extends PartitionReader[InternalRow] {
  private lazy val transport = conf.transport() // once per partition
  private val idIt = slice.ids.iterator
  private var rowIt: Iterator[InternalRow] = Iterator.empty

  override def next(): Boolean = {
    while (!rowIt.hasNext && idIt.hasNext) rowIt = fetchRows(idIt.next())
    rowIt.hasNext
  }
  override def get(): InternalRow = rowIt.next()
  override def close(): Unit = ()

  private def fetchRows(id: String): Iterator[InternalRow] = {
    // onError=skip: one dead id costs its rows, not the task — a task
    // death would re-fetch every healthy id in the slice on the task
    // retry, and maxFailures task deaths kill the scan. The catch covers
    // the DECODE too: a 200 response carrying an unparsable body (the
    // HTML-error-page-with-200 failure mode) is the same per-id loss.
    val (headers, rows) =
      try {
        val body = slice.prefetched.getOrElse(id,
          Fetcher.fetch(transport, conf.request(id), conf.retries, conf.backoffMs))
        NbaEnvelope.rowsOf(body, conf.resultSet)
      } catch {
        case scala.util.control.NonFatal(e) if conf.skipErrors =>
          System.err.println(s"[nba] skipping id $id: ${e.getMessage}")
          return Iterator.empty
      }
    // case-insensitive, like every other name in this source; a declared
    // column the response lacks fails NAMING the column (API drift must
    // not surface as a silently all-null column)
    val idx = schema.fields.map { f =>
      val i = headers.indexWhere(_.equalsIgnoreCase(f.name))
      if (i < 0 && rows.hasNext) throw new IllegalArgumentException(
        s"result set '${conf.resultSet}' lacks declared column '${f.name}' " +
          s"(headers: ${headers.mkString(", ")})")
      i
    }
    rows.map { cells =>
      new GenericInternalRow(schema.fields.zip(idx).map { case (f, i) =>
        convert(if (i >= 0 && i < cells.length) cells(i) else null, f.dataType)
      }.asInstanceOf[Array[Any]])
    }
  }

  private def convert(v: String, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v)
      case LongType => v.toLong
      case IntegerType => v.toInt
      case DoubleType => v.toDouble
      case FloatType => v.toFloat
      case BooleanType => v.toBoolean
      case other => throw new IllegalArgumentException(
        s"the nba source cannot cast to $other (string/long/int/double/float/boolean)")
    }
}
