package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector: a deterministic synthetic documents
  * source (`spark.read.format("graft.sources.SyntheticDocs")`), the
  * source-level extension surface next to the engine's custom scalar
  * expression, UDAF, and Generator. Three capabilities a 100 TB-grade
  * connector must implement, all spec-asserted:
  *
  *  - **partition planning**: `rows` split into `partitions` contiguous
  *    id ranges, each an independent `InputPartition` (the parallelism
  *    contract — readers never coordinate);
  *  - **filter pushdown** (`SupportsPushDownFilters`): >=/>/<=/< bounds
  *    on `doc_id` narrow the generated ranges BEFORE readers run, so a
  *    point query materializes one partition's slice, not the corpus;
  *  - **column pruning** (`SupportsPushDownRequiredColumns`): readers
  *    materialize exactly the pruned schema — a `doc_id`-only scan never
  *    computes the md5 body.
  *
  * Content is pure arithmetic on `doc_id` (md5-derived), so an external
  * SQL engine replays the whole table from a `range()` — the property
  * that lets the driver hash-check a source that owns its own data.
  *
  * Options: `rows` (default 1000), `partitions` (default 4), `salt`.
  */
class SyntheticDocs extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.SCHEMA

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      partitions = Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      salt = Option(properties.get("salt")).getOrElse("syn"))
}

object SyntheticDocs {
  val SCHEMA: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("body_hash", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))

  /** `md5(doc_id|salt)` hex — the deterministic "body". */
  def bodyHash(id: Long, salt: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id|$salt".getBytes("UTF-8"))
    d.map(b => f"$b%02x").mkString
  }

  /** 10..99 tokens, derived from the first 56 bits of the body hash —
    * replayable as `10 + ('0x'||substr(md5(...),1,14))::BIGINT % 90`.
    */
  def nTokens(id: Long, salt: String): Long =
    10L + java.lang.Long.parseLong(bodyHash(id, salt).take(14), 16) % 90L
}

private class SyntheticDocsTable(rows: Long, partitions: Int, salt: String)
    extends Table with SupportsRead {

  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions, salt)
}

private class SyntheticDocsScanBuilder(rows: Long, partitions: Int, salt: String)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {

  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticDocs.SCHEMA

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case GreaterThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThanOrEqual("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case LessThan("doc_id", _: java.lang.Long | _: java.lang.Integer) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual(_, v) => lo = math.max(lo, toLong(v))
      case GreaterThan(_, v)        => lo = math.max(lo, toLong(v) + 1)
      case LessThanOrEqual(_, v)    => hi = math.min(hi, toLong(v) + 1)
      case LessThan(_, v)           => hi = math.min(hi, toLong(v))
      case _                        => ()
    }
    pushed = accepted
    rejected // Spark re-applies anything we did not accept
  }

  private def toLong(v: Any): Long = v match {
    case l: java.lang.Long    => l
    case i: java.lang.Integer => i.toLong
    case other                => other.toString.toLong
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** LIMIT n over a synthetic range is just a tighter upper bound — a
    * `limit 5` over a billion-row source plans 5 ids, not the corpus.
    * Filters push before limits in Spark's pushdown order, so shrinking
    * `hi` after the bounds is exact.
    */
  override def pushLimit(limit: Int): Boolean = {
    hi = math.min(hi, lo + limit)
    true // fully handled: Spark may still re-apply a residual limit
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private var aggs: Option[Seq[String]] = None

  /** COUNT(*) / MIN(doc_id) / MAX(doc_id) over an id range are closed
    * forms — COMPLETE pushdown: `count(*)` over a trillion-row table is
    * O(1) arithmetic on the (filter-narrowed) bounds, no reader runs per
    * id. Anything else is declined and Spark aggregates above the scan.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    translate(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean =
    translate(aggregation) match {
      case some @ Some(_) => aggs = some; true
      case None => false
    }

  private def translate(a: Aggregation): Option[Seq[String]] = {
    if (a.groupByExpressions.nonEmpty) return None
    def isDocId(e: Any): Boolean = e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }
    val onDocId: PartialFunction[Any, String] = {
      case _: CountStar => "count"
      case m: Min if isDocId(m.column) => "min"
      case m: Max if isDocId(m.column) => "max"
      case c: Count if !c.isDistinct && isDocId(c.column) => "count"
    }
    val kinds = a.aggregateExpressions.toSeq.map(e => onDocId.lift(e))
    if (kinds.forall(_.isDefined)) Some(kinds.flatten) else None
  }

  override def build(): Scan = aggs match {
    case Some(kinds) =>
      new SyntheticDocsAggScan(lo, math.max(lo, hi), kinds)
    case None =>
      new SyntheticDocsScan(lo, math.max(lo, hi), partitions, salt, required)
  }
}

/** Completely-pushed-down aggregate: one partition, one closed-form row. */
private class SyntheticDocsAggScan(lo: Long, hi: Long, kinds: Seq[String])
    extends Scan with Batch {

  override def readSchema(): StructType =
    StructType(kinds.zipWithIndex.map { case (k, i) =>
      StructField(s"${k}_$i", LongType, nullable = false)
    })

  override def description(): String =
    s"SyntheticDocs bounds=[$lo,$hi) agg=${kinds.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    Array(DocRange(0, 1))

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsAggReaderFactory(kinds.map {
      case "count" => math.max(0L, hi - lo)
      case "min"   => lo
      case "max"   => hi - 1
    })
}

private class SyntheticDocsAggReaderFactory(values: Seq[Long])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values)
      override def close(): Unit = ()
    }
}

private case class DocRange(from: Long, until: Long) extends InputPartition

private class SyntheticDocsScan(
    lo: Long, hi: Long, partitions: Int, salt: String, required: StructType)
    extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String =
    s"SyntheticDocs bounds=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) return Array.empty
    val per = math.max(1L, (n + partitions - 1) / partitions)
    (lo until hi by per).map(s => DocRange(s, math.min(s + per, hi))).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(salt, required)
}

private class SyntheticDocsReaderFactory(salt: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val r = partition.asInstanceOf[DocRange]
    new PartitionReader[InternalRow] {
      private var id = r.from - 1
      override def next(): Boolean = { id += 1; id < r.until }
      override def get(): InternalRow =
        // materialize ONLY the pruned columns, in the pruned order
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "doc_id"    => id
          case "body_hash" => UTF8String.fromString(SyntheticDocs.bodyHash(id, salt))
          case "n_tokens"  => SyntheticDocs.nTokens(id, salt)
        })
      override def close(): Unit = ()
    }
  }
}
