package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 granule-catalog source with filter pushdown — the Spark
  * analog of the reference's CMR catalog search, where temporal / cloud-
  * cover / day-night predicates travel as API query parameters instead of
  * post-filtering downloads (SURVEY.md §2.1 src_catalog_search; reference
  * searcher.py:27-36; the only custom pushdown in the engine, §4 #1).
  *
  * The "remote catalog" here is a local pipe-delimited granule file; the
  * pushdown boundary is real: supported predicates are evaluated inside
  * the reader ("server side"), unsupported ones are returned to Spark as
  * residuals, and required-column pruning drops unread fields — exactly
  * the contract a networked CMR client would implement.
  *
  * Usage: spark.read.format("graft-catalog").option("path", f).load()
  *
  * Record format (one granule per line):
  *   granule_ur|tile_id|begin_time|cloud_cover|day_night|url1,url2,...
  */
class CatalogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-catalog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CatalogSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CatalogTable(properties.get("path"))

  override def supportsExternalMetadata(): Boolean = false
}

object CatalogSource {
  val Schema: StructType = StructType(Seq(
    StructField("granule_ur", StringType),
    StructField("tile_id", StringType),
    StructField("begin_time", StringType), // ISO-8601; lexicographic == chronological
    StructField("cloud_cover", IntegerType),
    StructField("day_night", StringType),
    StructField("urls", ArrayType(StringType))))

  /** Last pushdown decision, for tests/inspection (driver-side only). */
  @volatile var lastPushed: Seq[String] = Nil
  @volatile var lastResidual: Seq[String] = Nil
  @volatile var lastColumns: Seq[String] = Nil

  /** Resilience observability + fault injection (driver and executors
    * share the JVM in local mode; a cluster deployment would surface
    * these through accumulators/metrics instead). */
  val injectFailures = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var lastAttempts: Int = 0
  @volatile var lastAuthHeader: String = ""

  private[sources] def maybeInjectFailure(): Unit =
    if (injectFailures.getAndUpdate(n => math.max(n - 1, 0)) > 0)
      throw new java.io.IOException("injected transient catalog failure")

  /** Process-wide catalog credential cache — authenticator.py defaults:
    * 1.5 h token expiry, 10 min refresh margin; the mint is a local
    * deterministic counter standing in for the identity provider. */
  private val mintCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  val tokens = new Resilience.TokenCache(
    mint = () => s"graft-token-${mintCounter.incrementAndGet()}",
    expiryMs = 90L * 60 * 1000, marginMs = 10L * 60 * 1000)

  /** Predicates the "catalog API" can evaluate remotely: comparisons and
    * IN on the scalar catalog fields (searcher.py pushes temporal,
    * cloud_cover and day_night exactly this way). */
  private[sources] def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => scalarField(a)
    case GreaterThan(a, _) => scalarField(a)
    case GreaterThanOrEqual(a, _) => scalarField(a)
    case LessThan(a, _) => scalarField(a)
    case LessThanOrEqual(a, _) => scalarField(a)
    case In(a, _) => scalarField(a)
    case IsNotNull(a) => scalarField(a)
    case IsNull(a) => scalarField(a)
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  private def scalarField(a: String): Boolean =
    Seq("granule_ur", "tile_id", "begin_time", "cloud_cover", "day_night").contains(a)

  private[sources] final case class Granule(
      ur: String, tile: String, begin: String, cloud: Int, dayNight: String,
      urls: Seq[String]) {
    def field(name: String): Any = name match {
      case "granule_ur" => ur
      case "tile_id" => tile
      case "begin_time" => begin
      case "cloud_cover" => cloud
      case "day_night" => dayNight
    }
  }

  private[sources] def eval(f: Filter, g: Granule): Boolean = f match {
    case EqualTo(a, v) => g.field(a) == v
    case GreaterThan(a, v) => cmp(g.field(a), v) > 0
    case GreaterThanOrEqual(a, v) => cmp(g.field(a), v) >= 0
    case LessThan(a, v) => cmp(g.field(a), v) < 0
    case LessThanOrEqual(a, v) => cmp(g.field(a), v) <= 0
    case In(a, vs) => vs.contains(g.field(a))
    case IsNotNull(a) => g.field(a) != null
    case IsNull(a) => g.field(a) == null
    case And(l, r) => eval(l, g) && eval(r, g)
    case _ => true
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Int, y: Number) => java.lang.Integer.compare(x, y.intValue())
    case (x: String, y) => x.compareTo(String.valueOf(y))
    case _ => 0
  }

  private[sources] def parse(line: String): Option[Granule] = {
    val parts = line.split("\\|", -1)
    if (parts.length != 6 || line.isBlank) None
    else Some(Granule(parts(0), parts(1), parts(2), parts(3).toInt, parts(4),
      if (parts(5).isEmpty) Nil else parts(5).split(",").toSeq))
  }
}

private[sources] class CatalogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft-catalog($path)"
  override def schema(): StructType = CatalogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CatalogScanBuilder(Option(path).getOrElse(options.get("path")),
      options.getInt("maxRetries", 3),
      options.getLong("retryBaseMs", 1000L))
}

private[sources] class CatalogScanBuilder(path: String,
    maxRetries: Int, retryBaseMs: Long)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = CatalogSource.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(CatalogSource.supported)
    pushed = sup
    CatalogSource.lastPushed = sup.map(_.toString).toSeq
    CatalogSource.lastResidual = residual.map(_.toString).toSeq
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
    CatalogSource.lastColumns = requiredSchema.fieldNames.toSeq
  }

  override def build(): Scan =
    new CatalogScan(path, pushed, required, maxRetries, retryBaseMs)
}

private[sources] class CatalogScan(path: String, pushed: Array[Filter],
    required: StructType, maxRetries: Int, retryBaseMs: Long)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-catalog PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    Array(CatalogInputPartition(path))

  override def createReaderFactory(): PartitionReaderFactory =
    new CatalogReaderFactory(pushed, required, maxRetries, retryBaseMs)
}

private[sources] final case class CatalogInputPartition(path: String)
    extends InputPartition

private[sources] class CatalogReaderFactory(pushed: Array[Filter],
    required: StructType, maxRetries: Int, retryBaseMs: Long)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[CatalogInputPartition].path
    new PartitionReader[InternalRow] {
      // The open path is where a remote catalog client authenticates and
      // issues the request — bounded retry with exponential backoff
      // absorbs transient failures (processor.py:46-94); what survives
      // rethrows into Spark's task-retry machinery.
      private val lines = Resilience.withRetry(maxRetries, retryBaseMs) { attempt =>
        CatalogSource.lastAttempts = attempt + 1
        CatalogSource.lastAuthHeader = CatalogSource.tokens.bearer
        CatalogSource.maybeInjectFailure()
        scala.io.Source.fromFile(path)
      }
      private val it = lines.getLines()
        .flatMap(CatalogSource.parse)
        .filter(g => pushed.forall(CatalogSource.eval(_, g)))
      private var current: CatalogSource.Granule = _

      override def next(): Boolean =
        if (it.hasNext) { current = it.next(); true } else false

      override def get(): InternalRow = {
        val values = required.fieldNames.map {
          case "granule_ur" => UTF8String.fromString(current.ur)
          case "tile_id" => UTF8String.fromString(current.tile)
          case "begin_time" => UTF8String.fromString(current.begin)
          case "cloud_cover" => java.lang.Integer.valueOf(current.cloud)
          case "day_night" => UTF8String.fromString(current.dayNight)
          case "urls" => new GenericArrayData(
            current.urls.map(UTF8String.fromString).toArray[Any])
        }
        new GenericInternalRow(values.toArray[Any])
      }

      override def close(): Unit = lines.close()
    }
  }
}
