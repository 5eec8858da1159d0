package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 SINK: accepts any schema and records a write
  * audit — per-partition row counts carried back to the driver as
  * `WriterCommitMessage`s and aggregated in `commit()`. The write-side
  * twin of [[SyntheticDocs]], demonstrating the contract a distributed
  * sink lives by at 100 TB:
  *
  *  - every partition gets an independent `DataWriter` (no coordination
  *    while writing);
  *  - a writer's output becomes visible ONLY through the commit message
  *    it returns — the two-phase pattern that makes task retries and
  *    speculative duplicates safe (losers' messages never reach
  *    `commit`);
  *  - `commit(messages)` runs once on the driver with exactly one
  *    message per successful partition; `abort` runs instead if any
  *    partition ultimately fails, and nothing is published.
  *
  * The audit lands in a driver-side registry keyed by the `runId`
  * option (same-JVM observable — the registry stands in for the
  * metastore/manifest a production sink would publish to).
  *
  * Usage: `df.write.format("graft.sources.AuditSink")
  *   .option("runId", "...").mode("append").save()`
  */
class AuditSink extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // sink: schema always comes from the written query

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditSinkTable(
      schema, // external metadata: the written query's schema, echoed back
      Option(properties.get("runId")).getOrElse("default"),
      Option(properties.get("failPartition")).map(_.toInt))
}

object AuditSink {
  /** One completed (or aborted) write. `partitionRows(i)` = rows written
    * by partition i's WINNING task attempt.
    */
  case class Audit(committed: Boolean, partitionRows: Map[Int, Long]) {
    def totalRows: Long = partitionRows.values.sum
  }

  /** Driver-side audit registry, keyed by runId. */
  val results: scala.collection.concurrent.TrieMap[String, Audit] =
    scala.collection.concurrent.TrieMap.empty
}

private class AuditSinkTable(
    writeSchema: StructType, runId: String, failPartition: Option[Int])
    extends Table with SupportsWrite {

  override def name(): String = s"audit_sink($runId)"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this // overwrite == fresh audit
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(runId, failPartition)
      }
    }
}

private case class AuditMessage(partitionId: Int, rows: Long)
    extends WriterCommitMessage

private class AuditBatchWrite(runId: String, failPartition: Option[Int])
    extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(failPartition)

  override def commit(messages: Array[WriterCommitMessage]): Unit =
    AuditSink.results(runId) = AuditSink.Audit(
      committed = true,
      partitionRows = messages.map { case AuditMessage(p, n) => p -> n }.toMap)

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    AuditSink.results(runId) = AuditSink.Audit(
      committed = false,
      partitionRows = Map.empty) // nothing is published on abort
}

private class AuditWriterFactory(failPartition: Option[Int])
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      override def write(record: InternalRow): Unit = {
        if (failPartition.contains(partitionId))
          throw new RuntimeException(s"injected failure in partition $partitionId")
        rows += 1
      }
      override def commit(): WriterCommitMessage = AuditMessage(partitionId, rows)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
