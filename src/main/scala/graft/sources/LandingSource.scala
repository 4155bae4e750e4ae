package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the JSON landing zone — the Spark-native
  * re-expression of the reference's glob-the-landing-dir loader
  * (crypto_app/load_data.py:104-146): `data/<coin>/<coin>_YYYY-MM-DD.json`,
  * one API response document per file, with `coin_id` and `fetch_date`
  * derived from the PATH, not the payload.
  *
  * Why a connector instead of `spark.read.json` + `input_file_name()`
  * (which [[CoinGecko.coinHistory]] still provides as the typed path):
  * the path-derived columns become first-class to the planner —
  *
  *  - **filter pushdown = file pruning.** `WHERE coin_id = 'bitcoin' AND
  *    fetch_date >= '2024-01-01'` is evaluated against FILENAMES during
  *    `planInputPartitions`; non-matching files are never opened, the
  *    V2 equivalent of partition pruning on a `coin_id=x/` Hive layout.
  *    At a 100 TB landing zone (millions of response docs) this is the
  *    difference between touching one coin-day and scanning everything.
  *  - **column pruning = skipping the payload.** A projection of only
  *    path-derived columns (the "what did we land when" audit query)
  *    never reads file CONTENTS at all — zero payload I/O.
  *
  * The `doc` column is the raw document text; pair with
  * `from_json(doc, CoinGecko.docSchema)` for the typed view. Scale note:
  * file listing happens on the driver (fine for a landing zone's
  * file counts; a petabyte-scale listing would come from a manifest
  * table instead — the planning hook is the same either way).
  */
class LandingSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-landing"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LandingSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new LandingTable(properties.get("path"))
}

object LandingSource {
  val schema: StructType = StructType(Seq(
    StructField("coin_id", StringType, nullable = false),
    StructField("fetch_date", DateType, nullable = false),
    StructField("doc", StringType, nullable = true)))

  private val FileRe = raw"([a-z0-9-]+)_(\d{4}-\d{2}-\d{2})\.json$$".r.unanchored

  /** (path, coin_id, fetch_date-as-epoch-day) for every landing file whose
    * name matches the reference's `<coin>_<date>.json` convention. */
  private[sources] def listFiles(dir: String): Seq[(String, String, Int)] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) return Seq.empty
    val subdirs = Files.list(root).iterator().asScala.filter(Files.isDirectory(_)).toVector
    subdirs.flatMap { d =>
      Files.list(d).iterator().asScala.flatMap { f =>
        f.getFileName.toString match {
          case FileRe(coin, date) =>
            Some((f.toString, coin, LocalDate.parse(date).toEpochDay.toInt))
          case _ => None
        }
      }
    }.sortBy(_._1)
  }
}

private[sources] class LandingTable(dir: String) extends Table with SupportsRead {
  override def name(): String = s"graft_landing($dir)"
  override def schema(): StructType = LandingSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LandingScanBuilder(dir)
}

private[sources] class LandingScanBuilder(dir: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = LandingSource.schema

  /** Accept exactly the filters we can decide from the filename alone;
    * those are consumed HERE (Spark drops them from the post-scan plan)
    * because the filename derivation is exact, not approximate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(LandingScanBuilder.supported)
    pushed = sup
    unsup
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new LandingScan(dir, pushed, required)
}

private[sources] object LandingScanBuilder {
  private def dateDays(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: LocalDate     => Some(d.toEpochDay.toInt)
    case s: String        => Some(LocalDate.parse(s).toEpochDay.toInt)
    case _                => None
  }

  def supported(f: Filter): Boolean = f match {
    case EqualTo("coin_id", _: String)                      => true
    case In("coin_id", vs) if vs.forall(_.isInstanceOf[String]) => true
    case EqualTo("fetch_date", v)            => dateDays(v).isDefined
    case GreaterThan("fetch_date", v)        => dateDays(v).isDefined
    case GreaterThanOrEqual("fetch_date", v) => dateDays(v).isDefined
    case LessThan("fetch_date", v)           => dateDays(v).isDefined
    case LessThanOrEqual("fetch_date", v)    => dateDays(v).isDefined
    case IsNotNull("coin_id") | IsNotNull("fetch_date")     => true
    case _                                                  => false
  }

  /** Evaluate a pushed filter against one file's (coin, epochDay). */
  def eval(f: Filter, coin: String, day: Int): Boolean = f match {
    case EqualTo("coin_id", v: String)       => coin == v
    case In("coin_id", vs)                   => vs.exists(_ == coin)
    case EqualTo("fetch_date", v)            => dateDays(v).contains(day)
    case GreaterThan("fetch_date", v)        => dateDays(v).exists(day > _)
    case GreaterThanOrEqual("fetch_date", v) => dateDays(v).exists(day >= _)
    case LessThan("fetch_date", v)           => dateDays(v).exists(day < _)
    case LessThanOrEqual("fetch_date", v)    => dateDays(v).exists(day <= _)
    case IsNotNull(_)                        => true
    case _                                   => true
  }
}

private[sources] class LandingScan(dir: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-landing $dir, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    LandingSource.listFiles(dir)
      .filter { case (_, coin, day) =>
        pushed.forall(LandingScanBuilder.eval(_, coin, day)) }
      .map { case (p, coin, day) => LandingPartition(p, coin, day): InputPartition }
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LandingReaderFactory(required)
}

private[sources] case class LandingPartition(path: String, coin: String, day: Int)
    extends InputPartition

private[sources] class LandingReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LandingReader(partition.asInstanceOf[LandingPartition], required)
}

/** One row per file. The payload is read ONLY if the projection asks for
  * `doc` — a path-only projection does zero payload I/O (see class doc). */
private[sources] class LandingReader(p: LandingPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean =
    if (done) false
    else {
      val values = required.fields.map(_.name).map {
        case "coin_id"    => UTF8String.fromString(p.coin)
        case "fetch_date" => p.day
        case "doc"        => UTF8String.fromString(Files.readString(Paths.get(p.path)))
        case other        => throw new IllegalArgumentException(s"unknown column $other")
      }
      row = InternalRow.fromSeq(values.toSeq)
      done = true
      true
    }
  override def get(): InternalRow = row
  override def close(): Unit = ()
}
