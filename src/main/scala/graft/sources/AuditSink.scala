package graft.sources

import java.util

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The WRITE half of the DataSource V2 surface ([[SyntheticDocs]] is the
  * read half): an audit sink that aggregates each write into one atomic
  * (row count, order-independent checksum) record under the V2 commit
  * protocol — the same coordinator/task contract every transactional
  * sink (Iceberg/Delta commit services, JDBC upserts) builds on:
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
  * Write-side contracts beyond the bare protocol:
  *
  *  - `SupportsTruncate` (capability TRUNCATE): `mode("overwrite")`
  *    REPLACES the audit record; `mode("append")` folds into it (rows
  *    add, checksums XOR — well-defined because the checksum is
  *    order-independent). The truncate decision rides the WriteBuilder,
  *    so one table object serves both modes.
  *  - `RequiresDistributionAndOrdering`: options `distributeBy=<col>` /
  *    `sortBy=<col>` make the WRITE demand a clustered distribution and
  *    a within-partition sort from the ENGINE — Spark inserts the
  *    exchange/sort below the write node (the Iceberg write-distribution
  *    contract that keeps a 100 TB write from producing one file per
  *    task per partition key). The writers then MEASURE what arrived —
  *    per-task distinct key sets and per-task sortedness — and
  *    `commit()` publishes whether clustering held (no key split across
  *    tasks) and every task arrived sorted: the engine's compliance is
  *    an auditable artifact, not an assumption.
  *  - `STREAMING_WRITE`: the same audit fold per EPOCH — `commit(epoch,
  *    messages)` publishes one (rows, checksum) record per micro-batch
  *    under exactly-once replay (a re-run epoch overwrites its own slot
  *    idempotently, the Iceberg/Delta epoch-commit convention).
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
      "true".equalsIgnoreCase(properties.getOrDefault("explode", "false")),
      Option(properties.get("distributeBy")),
      Option(properties.get("sortBy")))
  override def supportsExternalMetadata(): Boolean = true
}

object AuditSink {
  val Format = "graft.sources.AuditSink"

  /** Committed audits: name -> (rows, checksum). Driver-side, test- and
    * pipeline-observable; only commit paths write here. */
  val commits = new TrieMap[String, (Long, Long)]
  /** Write-layout audit for the last committed batch write that requested
    * distribution/ordering: name -> (clusteringHeld, sortedWithinTasks).
    * Each verdict is present ONLY for the property the write actually
    * demanded — a sortBy-only write must not publish a clustering
    * verdict nothing measured (review finding r12b). */
  val layout = new TrieMap[String, (Option[Boolean], Option[Boolean])]
  /** Per-epoch streaming audits: name -> epoch -> (rows, checksum). */
  val epochCommits = new TrieMap[String, scala.collection.immutable.SortedMap[Long, (Long, Long)]]
  /** Names whose writes were aborted (observability for the drill). */
  val aborts = new TrieMap[String, Int]

  /** 64-bit FNV-1a over the long's 8 bytes — stable, seedless. */
  def fnv64(v: Long): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < 8) { h ^= (v >>> (8 * i)) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Per-task distinct-key tracking cap: the clustering audit exists for
    * partition-grained keys (a write clustered by `lang` sees ≤|langs|
    * per task); a high-cardinality distribute column would make the
    * commit messages themselves the bottleneck, so fail loudly. */
  val MaxTrackedKeys = 100000
}

private class AuditTable(schema0: StructType, name: String, explode: Boolean,
    distributeBy: Option[String], sortBy: Option[String])
    extends Table with SupportsWrite {
  override def name(): String = s"graft_audit($name)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(info.schema().nonEmpty && info.schema().fields.head.dataType == LongType,
      s"audit sink checksums the FIRST column, which must be LongType; " +
        s"got ${info.schema().simpleString}")
    def colIdx(opt: Option[String], what: String): Int = opt match {
      case None => -1
      case Some(c) =>
        val i = info.schema().fieldNames.indexOf(c)
        require(i >= 0, s"audit sink $what column '$c' not in written schema " +
          info.schema().simpleString)
        val dt = info.schema().fields(i).dataType
        require(dt == LongType || dt == IntegerType || dt == StringType,
          s"audit sink $what column '$c' must be bigint/int/string, got ${dt.simpleString}")
        i
    }
    val dIdx = colIdx(distributeBy, "distributeBy")
    val sIdx = colIdx(sortBy, "sortBy")
    new WriteBuilder with SupportsTruncate {
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write =
        new AuditWrite(name, explode, replace, info.schema(), distributeBy, sortBy,
          dIdx, sIdx)
    }
  }
}

private class AuditWrite(name: String, explode: Boolean, replace: Boolean,
    schema: StructType, distributeBy: Option[String], sortBy: Option[String],
    dIdx: Int, sIdx: Int)
    extends Write with RequiresDistributionAndOrdering {
  /** The engine-facing demand: cluster by the distribute column (all rows
    * of a key land in ONE task) and sort within each task. Unspecified
    * when the options are absent — the write then accepts whatever
    * partitioning the query produced. */
  override def requiredDistribution(): Distribution = distributeBy match {
    case Some(c) => Distributions.clustered(Array(Expressions.identity(c)))
    case None    => Distributions.unspecified()
  }
  override def requiredOrdering(): Array[SortOrder] = sortBy match {
    case Some(c) => Array(Expressions.sort(Expressions.column(c),
      SortDirection.ASCENDING))
    case None    => Array.empty
  }
  private def dt(i: Int): DataType = if (i >= 0) schema.fields(i).dataType else NullType
  override def toBatch: BatchWrite =
    new AuditBatchWrite(name, explode, replace, dIdx, sIdx, dt(dIdx), dt(sIdx))
  override def toStreaming: StreamingWrite =
    new AuditStreamingWrite(name, explode, dIdx, sIdx, dt(dIdx), dt(sIdx))
}

private[graft] case class AuditMessage(rows: Long, checksum: Long,
    keys: Array[String], sorted: Boolean) extends WriterCommitMessage

/** Fold per-task messages into one audit record + layout verdict.
  * Clustering held iff no key appears in two tasks' distinct sets —
  * i.e. Σ per-task |keys| equals |∪ keys|. */
private[graft] object AuditFold {
  def apply(messages: Array[WriterCommitMessage]): (Long, Long, Boolean, Boolean) = {
    var rows = 0L; var sum = 0L; var perTask = 0L; var sorted = true
    val union = new java.util.HashSet[String]
    messages.foreach { m =>
      val a = m.asInstanceOf[AuditMessage]
      rows += a.rows; sum ^= a.checksum; sorted &&= a.sorted
      perTask += a.keys.length
      a.keys.foreach(union.add)
    }
    (rows, sum, perTask == union.size.toLong, sorted)
  }
}

private class AuditBatchWrite(name: String, explode: Boolean, replace: Boolean,
    dIdx: Int, sIdx: Int, dType: DataType, sType: DataType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new AuditWriterFactory(explode, dIdx, sIdx, dType, sType)
  /** The atomic publish: per-task messages fold into ONE registry row —
    * REPLACING the record under truncate (mode overwrite), FOLDING into
    * it otherwise (mode append; checksums XOR, counts add). Nothing
    * below this line ever ran for failed attempts — their writers
    * aborted and produced no message. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (rows, sum, clustered, sorted) = AuditFold(messages)
    if (replace) AuditSink.commits.put(name, (rows, sum))
    else AuditSink.commits.updateWith(name) {
      case Some((r0, c0)) => Some((r0 + rows, c0 ^ sum))
      case None           => Some((rows, sum))
    }
    if (dIdx >= 0 || sIdx >= 0) AuditSink.layout.put(name,
      (if (dIdx >= 0) Some(clustered) else None,
        if (sIdx >= 0) Some(sorted) else None))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    AuditSink.aborts.updateWith(name) { c => Some(c.getOrElse(0) + 1) }
    () // nothing to roll back: no state was published
  }
}

/** Epoch-granular commit protocol (`STREAMING_WRITE`): each micro-batch
  * folds to its own (rows, checksum) slot, keyed by the engine's epoch
  * id — a replayed epoch (failure recovery re-runs the last uncommitted
  * batch) overwrites its own slot with the identical fold, which is the
  * idempotence that gives the sink end-to-end exactly-once on top of the
  * source's replayable offsets. */
private class AuditStreamingWrite(name: String, explode: Boolean,
    dIdx: Int, sIdx: Int, dType: DataType, sType: DataType) extends StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new AuditStreamingWriterFactory(explode, dIdx, sIdx, dType, sType)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val (rows, sum, _, _) = AuditFold(messages)
    AuditSink.epochCommits.updateWith(name) { cur =>
      Some(cur.getOrElse(scala.collection.immutable.SortedMap.empty[Long, (Long, Long)])
        .updated(epochId, (rows, sum)))
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    AuditSink.aborts.updateWith(name) { c => Some(c.getOrElse(0) + 1) }
    ()
  }
}

private class AuditStreamingWriterFactory(explode: Boolean, dIdx: Int, sIdx: Int,
    dType: DataType, sType: DataType) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : DataWriter[InternalRow] =
    AuditWriters.create(explode, dIdx, sIdx, dType, sType, partitionId)
}

private class AuditWriterFactory(explode: Boolean, dIdx: Int, sIdx: Int,
    dType: DataType, sType: DataType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    AuditWriters.create(explode, dIdx, sIdx, dType, sType, partitionId)
}

private object AuditWriters {
  /** One writer implementation for both protocols: accumulate the audit
    * fold; when a distribute/sort column index is set, also record the
    * task's distinct key set / verify non-descending arrival order. */
  def create(explode: Boolean, dIdx: Int, sIdx: Int, dType: DataType,
      sType: DataType, partitionId: Int): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var checksum = 0L
      private var sorted = true
      private var prev: Any = null
      private val keys = new java.util.HashSet[String]

      private def keyString(r: InternalRow, i: Int): String =
        if (r.isNullAt(i)) "_null" // real keys are "s:"/"n:"-prefixed
        else r.get(i, dType) match {
          case s: UTF8String => "s:" + s.toString
          case v             => "n:" + v.toString
        }
      // nulls-first ordering over the three accepted column types
      private def leq(a: Any, b: Any): Boolean = (a, b) match {
        case (null, _)                        => true
        case (_, null)                        => false
        case (x: java.lang.Long, y: java.lang.Long)       => x <= y
        case (x: java.lang.Integer, y: java.lang.Integer) => x <= y
        case (x: UTF8String, y: UTF8String)   => x.compareTo(y) <= 0
        case _                                => false
      }
      private def sortVal(r: InternalRow): Any =
        if (r.isNullAt(sIdx)) null
        else r.get(sIdx, sType) match {
          case s: UTF8String => s.clone() // row buffers are reused per-batch
          case v             => v
        }

      override def write(record: InternalRow): Unit = {
        if (explode && partitionId == 0 && rows == 2)
          throw new java.io.IOException("audit sink test explosion")
        if (dIdx >= 0) {
          keys.add(keyString(record, dIdx))
          require(keys.size <= AuditSink.MaxTrackedKeys,
            s"audit sink clustering audit tracks <= ${AuditSink.MaxTrackedKeys} " +
              "distinct keys per task; distribute by a partition-grained column")
        }
        if (sIdx >= 0) {
          val v = sortVal(record)
          if (rows > 0 && !leq(prev, v)) sorted = false
          prev = v
        }
        rows += 1
        checksum ^= AuditSink.fnv64(record.getLong(0))
      }
      override def commit(): WriterCommitMessage =
        AuditMessage(rows, checksum, keys.toArray(new Array[String](keys.size)), sorted)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
