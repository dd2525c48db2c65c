package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the DataSource V2 surface ([[SyntheticDocs]] is the
  * read half): an audit sink that aggregates each batch write into one
  * atomic (row count, order-independent checksum) record under the V2
  * commit protocol — the same coordinator/task contract every
  * transactional sink (Iceberg/Delta commit services, JDBC upserts)
  * builds on:
  *
  *  - each task's `DataWriter` accumulates its own partial audit and
  *    surfaces it ONLY through its `commit()` message — rows written by
  *    an attempt that dies or aborts are invisible to the final result;
  *  - `BatchWrite.commit(messages)` folds the per-task messages and
  *    publishes the ONE batch record atomically (a failed/aborted job
  *    publishes NOTHING — no partial state, which is the property that
  *    makes retries and speculative attempts safe at 1000 executors);
  *  - `abort()` records the rollback for observability.
  *
  * The checksum folds `fnv64(first long column) XOR`-style per row, so
  * it is partitioning- and order-independent — two writes of the same
  * data through any plan commit identical audits. Options: `name` (the
  * audit key, required), `explode` (test hook: the partition-0 writer
  * throws mid-stream to exercise the abort path).
  */
class AuditSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only: schema comes from the DataFrame
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AuditTable(schema,
      Option(properties.get("name")).getOrElse(
        throw new IllegalArgumentException("audit sink requires option 'name'")),
      "true".equalsIgnoreCase(properties.getOrDefault("explode", "false")))
  override def supportsExternalMetadata(): Boolean = true
}

object AuditSink {
  val Format = "graft.sources.AuditSink"

  /** Committed audits: name -> (rows, checksum). Driver-side, test- and
    * pipeline-observable; only `BatchWrite.commit` writes here. */
  val commits = new TrieMap[String, (Long, Long)]
  /** Names whose writes were aborted (observability for the drill). */
  val aborts = new TrieMap[String, Int]

  /** 64-bit FNV-1a over the long's 8 bytes — stable, seedless. */
  def fnv64(v: Long): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < 8) { h ^= (v >>> (8 * i)) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }
}

private class AuditTable(schema0: StructType, name: String, explode: Boolean)
    extends Table with SupportsWrite {
  override def name(): String = s"graft_audit($name)"
  override def schema(): StructType = schema0
  // BATCH_WRITE only: advertising TRUNCATE without SupportsTruncate on
  // the builder would pass the analyzer and then fail at write planning
  // (review finding r11d) — a capability set must not promise more than
  // the builder implements
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().nonEmpty && info.schema().fields.head.dataType == LongType,
      s"audit sink checksums the FIRST column, which must be LongType; " +
        s"got ${info.schema().simpleString}")
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new AuditBatchWrite(name, explode)
      }
    }
  }
}

private case class AuditMessage(rows: Long, checksum: Long) extends WriterCommitMessage

private class AuditBatchWrite(name: String, explode: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(explode)
  /** The atomic publish: per-task messages fold into ONE registry row.
    * Nothing below this line ever ran for failed attempts — their
    * writers aborted and produced no message. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (rows, sum) = messages.foldLeft((0L, 0L)) { case ((r, c), m) =>
      val a = m.asInstanceOf[AuditMessage]
      (r + a.rows, c ^ a.checksum)
    }
    AuditSink.commits.put(name, (rows, sum))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    AuditSink.aborts.updateWith(name) { c => Some(c.getOrElse(0) + 1) }
    () // nothing to roll back: no state was published
  }
}

private class AuditWriterFactory(explode: Boolean) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var checksum = 0L
      override def write(record: InternalRow): Unit = {
        if (explode && partitionId == 0 && rows == 2)
          throw new java.io.IOException("audit sink test explosion")
        rows += 1
        checksum ^= AuditSink.fnv64(record.getLong(0))
      }
      override def commit(): WriterCommitMessage = AuditMessage(rows, checksum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
