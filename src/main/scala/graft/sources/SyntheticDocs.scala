package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A full DataSource V2 connector (`format("graft-synthetic")`): a
  * deterministic document generator whose rows are pure arithmetic in
  * `doc_id` — so an external oracle can re-derive every value from
  * `generate_series` and the scan's own claims (pruning, pushdown,
  * partition skipping) are hash-checkable end-to-end.
  *
  * No reference counterpart (the reference reads only local text files,
  * `MasterNode.java:60-75`); this is the Spark-native seam a production
  * engine needs for "table that isn't a file": the connector surface is
  * the same one JDBC/Kafka/Iceberg connectors implement.
  *
  * Engine integration, all three scan-shaping contracts:
  *
  *  - `SupportsPushDownRequiredColumns`: the reader materializes ONLY the
  *    projected columns (a `SELECT count(lang)` never computes text);
  *  - `SupportsPushDownFilters`: `doc_id` range/equality predicates are
  *    consumed by the source (returned as empty residual), narrowing the
  *    generated id range BEFORE partition planning;
  *  - partition planning: the (post-pushdown) id range splits into
  *    `partitions` even slices — each an independent `InputPartition`, so
  *    a 1000-executor cluster scans in parallel and a pushed
  *    `doc_id < k` prunes whole partitions, not rows.
  *
  * Options: `rows` (total ids, default 1000), `partitions` (default 8).
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "8").toInt,
      properties.getOrDefault("streamBatch", "4096").toLong)
  override def supportsExternalMetadata(): Boolean = false
}

object SyntheticDocs {
  val Format = "graft.sources.SyntheticDocs"

  /** Observability for the runtime-filter path (spec assertions). */
  val runtimeFilterLog = new java.util.concurrent.ConcurrentLinkedQueue[String]

  /** Test seam: build a scan, deliver a runtime `doc_id IN (ids)` V2
    * predicate exactly as Spark's DPP machinery would, and return the
    * resulting partition plan — pins that the scan narrows its id range
    * and drops whole partitions on runtime-filter arrival. */
  private[graft] def planAfterRuntimeIn(rows: Long, parts: Int,
      ids: Array[Long]): Array[(Long, Long)] = {
    import org.apache.spark.sql.connector.expressions.Expressions
    val scan = new SyntheticScanBuilder(rows, parts, 4096L).build()
      .asInstanceOf[SyntheticScan]
    type V2Expr = org.apache.spark.sql.connector.expressions.Expression
    val lits: Seq[V2Expr] = ids.toSeq.map(id => Expressions.literal(id))
    val children = ((Expressions.column("doc_id"): V2Expr) +: lits).toArray
    scan.filter(Array(
      new org.apache.spark.sql.connector.expressions.filter.Predicate("IN", children)))
    scan.planInputPartitions().map {
      case SyntheticPartition(s, e) => (s, e)
    }
  }

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val Langs = Array("de", "en", "fr", "ja", "zh")
  val Sources = Array("books", "code", "web", "wiki")

  /** Column generators — ONE definition of the row arithmetic, used by the
    * reader and re-derivable in SQL:
    * lang = Langs[id % 5], source = Sources[id % 4],
    * n_tokens = id % 97 + 3, text = "w<id%13> " repeated n_tokens times.
    */
  def lang(id: Long): String = Langs((id % 5).toInt)
  def source(id: Long): String = Sources((id % 4).toInt)
  def nTokens(id: Long): Long = id % 97 + 3
  def text(id: Long): String = {
    val w = s"w${id % 13}"
    val sb = new StringBuilder
    var i = 0L
    while (i < nTokens(id)) { if (i > 0) sb.append(' '); sb.append(w); i += 1 }
    sb.toString
  }
}

private class SyntheticDocsTable(rows: Long, partitions: Int, streamBatch: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions, streamBatch)
}

private class SyntheticScanBuilder(rows: Long, partitions: Int, streamBatch: Long)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var lo = 0L            // inclusive id lower bound after pushdown
  private var hi = rows          // exclusive id upper bound after pushdown
  private var required: StructType = SyntheticDocs.schema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Consume doc_id range/equality predicates into the generated id
    * range; everything else stays a residual for Spark to evaluate.
    * Pushed filters return an EMPTY residual (the source is exact for
    * them), so they vanish from the post-scan Filter node entirely.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", _: Long) | GreaterThanOrEqual("doc_id", _: Long) |
           LessThan("doc_id", _: Long) | LessThanOrEqual("doc_id", _: Long) |
           EqualTo("doc_id", _: Long) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v)
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v)
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1)
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _                                     => ()
    }
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new SyntheticScan(lo, hi, partitions, streamBatch, required)
}

private case class SyntheticPartition(start: Long, end: Long) extends InputPartition

/** Streaming offset = exclusive upper id already emitted. */
private case class SyntheticOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

private class SyntheticScan(private var lo: Long, private var hi: Long,
    partitions: Int, streamBatch: Long, required: StructType)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering {

  /** Runtime (DPP-style) V2 filtering: after the build side of a join
    * materializes, Spark hands this scan the concrete `doc_id IN (...)`
    * predicate; the id range narrows to [min, max] of the set BEFORE
    * `planInputPartitions` runs, so whole partitions vanish at runtime —
    * the V2 analog of dynamic partition pruning on a file source.
    * Invocations are recorded in [[SyntheticDocs.runtimeFilterLog]] so a
    * spec can assert the filter actually arrived (a silently-ignored
    * runtime filter would still be CORRECT, just not pruned).
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (required.fieldNames.contains("doc_id"))
      Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))
    else Array.empty
  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    predicates.foreach(p => SyntheticDocs.runtimeFilterLog.add(s"got:${p.describe()}"))
    predicates.foreach { p =>
      if (p.name() == "IN" && p.children().nonEmpty) {
        val ids = p.children().drop(1).collect {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Long] => l.value().asInstanceOf[Long]
        }
        if (ids.nonEmpty) {
          lo = math.max(lo, ids.min)
          hi = math.min(hi, ids.max + 1)
          SyntheticDocs.runtimeFilterLog.add(s"IN(${ids.length}) -> [$lo, $hi)")
        }
      }
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic ids [$lo, $hi) over $partitions slices, cols=${required.fieldNames.mkString(",")}"

  /** CBO integration (`SupportsReportStatistics`): the scan reports its
    * EXACT post-pushdown row count and a per-column size estimate, so
    * Catalyst's join planning sees the truth — a filtered synthetic side
    * under the broadcast threshold gets a BroadcastHashJoin without any
    * hint, exactly as a file source with collected stats would
    * (SourcesSpec pins this). Pushdown happens before `build()`, so the
    * numbers already reflect consumed doc_id bounds and pruned columns.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rowCount = math.max(hi - lo, 0L)
    private val rowBytes = required.fieldNames.map {
      case "doc_id" | "n_tokens" => 8L
      case "lang"                => 2L
      case "source"              => 5L
      case "text"                => 300L // n_tokens averages ~51 tokens of ~5 chars
      case _                     => 8L
    }.sum
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rowCount * math.max(rowBytes, 1L))
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rowCount)
  }

  /** MICRO_BATCH_READ: the id space replays as a bounded stream —
    * offsets are plain id watermarks, each trigger emits the next
    * `streamBatch` ids, and `SupportsTriggerAvailableNow` pins the drain
    * target so `Trigger.AvailableNow` processes exactly [lo, hi) across
    * several micro-batches and stops. Same partition slicing and column
    * pruning as the batch path (the ScanBuilder ran before this). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SyntheticMicroBatchStream(lo, hi, partitions, streamBatch, required)

  /** Even id slices of the POST-pushdown range: a pushed `doc_id < k`
    * shrinks the range before this split, so out-of-range partitions are
    * never created — partition-level pruning, the file-source
    * `PartitionFilters` analog. */
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, math.min(partitions.toLong, math.max(hi - lo, 1L))).toInt
    val span = hi - lo
    if (span <= 0) return Array.empty
    (0 until n).map { i =>
      SyntheticPartition(lo + span * i / n, lo + span * (i + 1) / n)
    }.filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames)
}

private class SyntheticMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    streamBatch: Long, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  // AvailableNow drain target; without the trigger it is simply "all"
  private var target: Long = hi
  override def prepareForTriggerAvailableNow(): Unit = target = hi

  override def initialOffset(): Offset = SyntheticOffset(lo)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("latestOffset(start, limit) is used")
  // SupportsAdmissionControl: the source DECLARES its per-trigger cap as
  // the default limit and then HONORS whatever limit the engine passes —
  // declaring allAvailable while silently capping would make Trigger.Once
  // read one partial batch and terminate "successfully" (review finding
  // r11d: the admission-control contract, not an optimization)
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(streamBatch)
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadMaxRows}
    val s = start.asInstanceOf[SyntheticOffset].id
    val cap = limit match {
      case m: ReadMaxRows      => s + m.maxRows()
      case _: ReadAllAvailable => target
      case _                   => s + streamBatch
    }
    SyntheticOffset(math.min(cap, target))
  }
  override def reportLatestOffset(): Offset = SyntheticOffset(target)
  override def deserializeOffset(json: String): Offset =
    SyntheticOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SyntheticOffset].id
    val e = end.asInstanceOf[SyntheticOffset].id
    val span = e - s
    if (span <= 0) return Array.empty
    val n = math.max(1L, math.min(partitions.toLong, span)).toInt
    (0 until n).map(i => SyntheticPartition(s + span * i / n, s + span * (i + 1) / n))
      .filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames)
}

private class SyntheticReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = {
        // only the REQUIRED columns are computed — pruning is real work
        // saved, not cosmetic schema narrowing
        val vals = cols.map {
          case "doc_id"   => id
          case "lang"     => UTF8String.fromString(SyntheticDocs.lang(id))
          case "source"   => UTF8String.fromString(SyntheticDocs.source(id))
          case "n_tokens" => SyntheticDocs.nTokens(id)
          case "text"     => UTF8String.fromString(SyntheticDocs.text(id))
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
