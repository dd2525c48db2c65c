package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate
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
  /** Options parse through one validator: a malformed `rows=abc` or a
    * silent `partitions=-3` must surface as IllegalArgumentException
    * naming the option, not a raw NumberFormatException mid-planning or
    * a nonsense plan (GraftCatalog.parse got the same hardening r11d).
    */
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    def opt(name: String, default: Long, min: Long): Long = {
      val raw = properties.getOrDefault(name, default.toString)
      val v = try raw.toLong catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft-synthetic option '$name' must be a number, got '$raw'") }
      if (v < min) throw new IllegalArgumentException(
        s"graft-synthetic option '$name' must be >= $min, got $v")
      v
    }
    val parts = opt("partitions", 8, 1)
    if (parts > Int.MaxValue) throw new IllegalArgumentException(
      s"graft-synthetic option 'partitions' must fit an Int, got $parts")
    // `buckets=B` switches the batch layout from contiguous range slices
    // to B mod-interleaved bucket partitions (the SPJ layout). The
    // catalog grammar `docs<N>_b<B>` sets the same thing.
    val buckets = Option(properties.get("buckets")).map { _ =>
      val b = opt("buckets", 0, 1)
      if (b > Int.MaxValue) throw new IllegalArgumentException(
        s"graft-synthetic option 'buckets' must fit an Int, got $b")
      b.toInt
    }
    new SyntheticDocsTable(opt("rows", 1000, 0), parts.toInt,
      opt("streamBatch", 4096, 1), buckets)
  }
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
      case SyntheticPartition(s, e, _) => (s, e)
    }
  }

  /** Test seam: what offset the micro-batch stream advances to from
    * `start` under an engine-delivered ReadLimit — pins the admission-
    * control arithmetic (incl. CompositeReadLimit unpacking) without a
    * full streaming run. */
  private[graft] def latestOffsetUnder(rows: Long, streamBatch: Long,
      start: Long,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Long = {
    val s = new SyntheticMicroBatchStream(0L, rows, 4, streamBatch, schema)
    s.latestOffset(SyntheticOffset(start), limit)
      .asInstanceOf[SyntheticOffset].id
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

  /** Floor-mod bucket id — THE bucketing function: the bucketed layout's
    * partition planner, the per-partition reader, and the catalog's
    * [[BucketBound]] V2 function (which Spark's SPJ resolution binds to
    * the reported transform) all call this one definition, so "the rows
    * in partition k are exactly bucket k" is true by construction. */
  def bucketOf(n: Int, id: Long): Int = { val m = (id % n).toInt; if (m < 0) m + n else m }
  def text(id: Long): String = {
    val w = s"w${id % 13}"
    val sb = new StringBuilder
    var i = 0L
    while (i < nTokens(id)) { if (i > 0) sb.append(' '); sb.append(w); i += 1 }
    sb.toString
  }

  /** Closed forms over an id range [lo, hi) — the aggregate-pushdown
    * reader computes its single output row from these, so a pushed
    * `count/sum/min/max` over a billion ids is O(1) arithmetic, not a
    * scan. Each is the exact value the row generators above would
    * produce; SourcesSpec cross-checks them against brute force.
    */
  def sumIds(lo: Long, hi: Long): Long = {
    val span = hi - lo
    // (lo + hi - 1) * span / 2 with the even factor divided first so the
    // intermediate doesn't overflow before the division
    if (span % 2 == 0) (span / 2) * (lo + hi - 1) else span * ((lo + hi - 1) / 2)
  }
  def sumNTokens(lo: Long, hi: Long): Long = {
    // sum of id % 97 over [0, n): full 97-cycles each sum 97*96/2 = 4656
    def f(n: Long): Long = { val r = n % 97; (n / 97) * 4656 + r * (r - 1) / 2 }
    3 * (hi - lo) + f(hi) - f(lo)
  }
  def minNTokens(lo: Long, hi: Long): Long = {
    val span = hi - lo; val a = lo % 97
    if (span >= 97 || a + span > 97) 3 else a + 3 // residue wrap includes 0
  }
  def maxNTokens(lo: Long, hi: Long): Long = {
    val span = hi - lo; val a = lo % 97
    if (span >= 97 || a + span > 97) 99 else a + span - 1 + 3
  }
}

private class SyntheticDocsTable(rows: Long, partitions: Int, streamBatch: Long,
    buckets: Option[Int] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft_synthetic($rows)"
  override def schema(): StructType = SyntheticDocs.schema

  /** `SupportsMetadataColumns`: `_partition` is the input-partition
    * ordinal the row was read from — the bucket id under the bucketed
    * layout, the slice index under the range layout (the `_file`/
    * `_spec_id` analog an Iceberg-class table exposes). Hidden from
    * `SELECT *`; materialized by the reader only when referenced, like
    * any other pruned column. */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = "_partition"
      override def dataType(): DataType = IntegerType
      override def isNullable: Boolean = false
      override def comment(): String =
        "input-partition ordinal (bucket id when bucketed, slice index otherwise)"
    })
  /** Bucketed layout advertises itself as table metadata too (DESCRIBE/
    * catalog introspection); the scan-side KeyGroupedPartitioning report
    * below is what SPJ actually consumes. */
  override def partitioning(): Array[Transform] = buckets match {
    case Some(b) => Array(
      org.apache.spark.sql.connector.expressions.Expressions.bucket(b, "doc_id"))
    case None => Array.empty
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions, streamBatch, buckets)
}

private class SyntheticScanBuilder(rows: Long, partitions: Int, streamBatch: Long,
    val buckets: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownV2Filters
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownTopN with SupportsPushDownOffset
    with SupportsPushDownJoin {
  private var lo = 0L            // inclusive id lower bound after pushdown
  private var hi = rows          // exclusive id upper bound after pushdown
  private var required: StructType = SyntheticDocs.schema
  private var pushed: Array[Filter] = Array.empty
  private var pushedV2: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty
  private var aggFns: Option[Array[aggregate.AggregateFunc]] = None
  private var topNPushed = false
  // after a pushed join: output-column name -> underlying generator column
  private var outMap: Map[String, String] = Map.empty
  private def resolve(n: String): String = outMap.getOrElse(n, n)

  /** V2 JOIN pushdown (`SupportsPushDownJoin`, Spark 4.1 — the
    * JDBC-federation contract): an INNER equi-join of two synthetic
    * tables on `doc_id` is absorbed into THIS builder. Both sides
    * enumerate exactly their post-pushdown id ranges once each, so the
    * joined stream is the generator over the ranges' INTERSECTION with
    * the right side's columns emitted beside the left's (same id ⇒ same
    * row arithmetic) — the join never exists at execution time: no
    * exchange, no build side, and the scan's reported statistics are the
    * EXACT post-join cardinality, which is what join pushdown buys a
    * 100 TB federation plan. Phase order matters: per-side filters are
    * already consumed into each [lo, hi) when the join arrives, and a
    * later un-grouped aggregate can then collapse the JOINED scan to one
    * closed-form row (`count(*)` of a join, O(1)). Declined shapes fall
    * back to Spark's join over the two pruned scans: non-inner joins,
    * conditions other than a single doc_id equality, bucketed layouts
    * (their key-grouped report is the SPJ path), and already-joined
    * builders (one level — a second join would need alias-aware range
    * algebra this table doesn't model).
    */
  override def isOtherSideCompatibleForJoin(other: SupportsPushDownJoin): Boolean =
    other match {
      case o: SyntheticScanBuilder =>
        buckets.isEmpty && o.buckets.isEmpty &&
        aggFns.isEmpty && o.aggFns.isEmpty &&
        !topNPushed && !o.topNPushed &&
        outMap.isEmpty && o.outMap.isEmpty
      case _ => false
    }
  override def pushDownJoin(other: SupportsPushDownJoin,
      joinType: org.apache.spark.sql.connector.join.JoinType,
      leftRequired: Array[SupportsPushDownJoin.ColumnWithAlias],
      rightRequired: Array[SupportsPushDownJoin.ColumnWithAlias],
      condition: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Boolean = {
    if (joinType != org.apache.spark.sql.connector.join.JoinType.INNER_JOIN)
      return false
    if (!isOtherSideCompatibleForJoin(other)) return false
    val right = other.asInstanceOf[SyntheticScanBuilder]
    val base = SyntheticDocs.schema.fieldNames.toSet
    if (!(leftRequired ++ rightRequired).forall(c => base(c.colName))) return false
    def out(c: SupportsPushDownJoin.ColumnWithAlias): String =
      Option(c.alias).getOrElse(c.colName)
    // the condition arrives over the JOINED OUTPUT names — find each
    // side's doc_id under its output name and demand exactly one equality
    val leftId  = leftRequired.find(_.colName == "doc_id").map(out)
    val rightId = rightRequired.find(_.colName == "doc_id").map(out)
    val ok = (leftId, rightId) match {
      case (Some(l), Some(r)) if l != r &&
          condition.name() == "=" && condition.children().length == 2 =>
        condition.children().flatMap(colName).toSet == Set(l, r)
      case _ => false
    }
    if (!ok) return false
    SyntheticDocs.runtimeFilterLog.add("join:" +
      leftRequired.map(c => s"${c.colName}->${out(c)}").mkString("L[", ",", "]") +
      rightRequired.map(c => s"${c.colName}->${out(c)}").mkString(" R[", ",", "]") +
      s" cond=${condition.describe()}")
    lo = math.max(lo, right.lo)
    hi = math.min(hi, right.hi)
    outMap = (leftRequired ++ rightRequired).map(c => out(c) -> c.colName).toMap
    // the builder's schema IS the joined output now — Spark wraps the
    // built scan positionally in the joined attributes (left required
    // then right required, under their aliases); a later pruneColumns
    // narrows this aliased schema like any other
    required = StructType((leftRequired ++ rightRequired).map { c =>
      val f = SyntheticDocs.schema(c.colName)
      StructField(out(c), f.dataType, f.nullable)
    })
    true
  }

  /** Single-column reference name, if the V2 expression is one. */
  private def colName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: org.apache.spark.sql.connector.expressions.NamedReference
        if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Aggregate pushdown (`SupportsPushDownAggregates`) — COMPLETE mode:
    * un-grouped count/min/max/sum over the generated columns have closed
    * forms in the id range (see SyntheticDocs.sumIds etc.), so the scan
    * answers them with ONE row of O(1) arithmetic and no Aggregate node
    * survives above it. `SELECT count(*) FROM docs(1e6)` moves one row,
    * not a million — the contract a JDBC/Iceberg-class connector
    * implements so a 100 TB `count(*)` never leaves the source. Grouped
    * or exotic aggregates are declined (Spark plans them normally over
    * the pruned scan). Pushed filters have already narrowed [lo, hi), so
    * the closed forms see the post-filter range.
    */
  private def aggSupported(agg: aggregate.Aggregation): Boolean = {
    // post-join the aggregate references the joined OUTPUT names; resolve
    // to the underlying generator column before the closed-form check
    val numeric = Set("doc_id", "n_tokens")
    def res(e: org.apache.spark.sql.connector.expressions.Expression) =
      colName(e).map(resolve)
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
    agg.aggregateExpressions.forall {
      case _: aggregate.CountStar => true
      case c: aggregate.Count => !c.isDistinct &&
        res(c.column).exists(SyntheticDocs.schema.fieldNames.contains)
      case m: aggregate.Min => res(m.column).exists(numeric)
      case m: aggregate.Max => res(m.column).exists(numeric)
      case s: aggregate.Sum => !s.isDistinct && res(s.column).exists(numeric)
      case _ => false
    }
  }
  override def supportCompletePushDown(agg: aggregate.Aggregation): Boolean =
    aggSupported(agg)
  override def pushAggregation(agg: aggregate.Aggregation): Boolean =
    aggSupported(agg) && { aggFns = Some(agg.aggregateExpressions); true }

  /** LIMIT pushdown: any `limit` ids of the range are a valid LIMIT
    * result, so take the first — the scan's row count is bounded BEFORE
    * partition planning and the Limit node vanishes (fully pushed).
    * Declined once an aggregate is absorbed (the limit then applies to
    * aggregate output rows, not ids).
    */
  override def pushLimit(limit: Int): Boolean =
    aggFns.isEmpty && { hi = math.min(hi, lo + limit); true }
  // fully pushed for plain LIMIT (exactly the first `limit` ids remain);
  // only RANGE-narrowed for TopN, where Spark must still do the final
  // global sort+limit because multi-slice output order is not guaranteed
  override def isPartiallyPushed(): Boolean = topNPushed

  /** TopN (sort+limit) pushdown on `doc_id`: ids generate in order, so
    * ORDER BY doc_id ASC LIMIT k is the first k ids and DESC the last k
    * — the range narrows to exactly the top-N set; Spark keeps the final
    * sort (partial pushdown), but over k rows instead of the table.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    if (aggFns.nonEmpty || orders.length != 1) return false
    val o = orders(0)
    colName(o.expression()) match {
      case Some("doc_id") =>
        if (o.direction() == SortDirection.ASCENDING) hi = math.min(hi, lo + limit)
        else lo = math.max(lo, hi - limit)
        topNPushed = true; true
      case _ => false
    }
  }

  /** OFFSET pushdown: skipping the first `offset` ids is a valid OFFSET
    * result (no order requested ⇒ any `offset` rows may be skipped).
    * Spark only pushes OFFSET after LIMIT/TopN per its own contract, so
    * narrowing lo here composes with the bounds above.
    */
  override def pushOffset(offset: Int): Boolean =
    aggFns.isEmpty && !topNPushed && { lo = math.min(lo + offset, hi); true }

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

  /** The MODERN filter contract (`SupportsPushDownV2Filters`): when a
    * ScanBuilder implements it, Spark delivers `Predicate` trees here and
    * never calls the V1 `pushFilters` path above (which stays for the
    * API-compat surface a production connector keeps). Same semantics:
    * doc_id range/equality comparisons are consumed into [lo, hi) with an
    * empty residual; literal-op-column forms (`5 < doc_id`) are the
    * mirrored comparisons — V2 predicates preserve the user's operand
    * order, unlike translated V1 filters, so both orders must narrow.
    */
  private def docIdBounds(
      p: org.apache.spark.sql.connector.expressions.filter.Predicate)
      : Option[(Long, Long)] = {
    def longLit(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[Long] = e match {
      case l: org.apache.spark.sql.connector.expressions.Literal[_]
          if l.value().isInstanceOf[Long] => Some(l.value().asInstanceOf[Long])
      case _ => None
    }
    if (p.children().length != 2) return None
    val (a, b) = (p.children()(0), p.children()(1))
    // (isDocId, literal, literalOnLeft)
    val shape = (colName(a), longLit(b), colName(b), longLit(a)) match {
      case (Some("doc_id"), Some(v), _, _) => Some((v, false))
      case (_, _, Some("doc_id"), Some(v)) => Some((v, true))
      case _                               => None
    }
    shape.flatMap { case (v, litLeft) =>
      // normalize to doc_id OP v by mirroring when the literal is on the left
      val op = if (!litLeft) p.name() else p.name() match {
        case ">" => "<" case ">=" => "<=" case "<" => ">" case "<=" => ">="
        case other => other
      }
      op match {
        case "="  => Some((v, v + 1))
        case ">"  => if (v == Long.MaxValue) Some((v, v)) else Some((v + 1, Long.MaxValue))
        case ">=" => Some((v, Long.MaxValue))
        case "<"  => Some((Long.MinValue, v))
        case "<=" => if (v == Long.MaxValue) Some((Long.MinValue, v)) else Some((Long.MinValue, v + 1))
        case _    => None
      }
    }
  }
  override def pushPredicates(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
    val (accepted, residual) = predicates.partition(docIdBounds(_).isDefined)
    accepted.flatMap(docIdBounds).foreach { case (l, h) =>
      lo = math.max(lo, l); hi = math.min(hi, h)
    }
    pushedV2 = accepted
    residual
  }
  override def pushedPredicates()
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = pushedV2

  override def build(): Scan = aggFns match {
    case Some(fns) => new SyntheticAggScan(lo, hi, fns, outMap)
    case None => new SyntheticScan(lo, hi, partitions, streamBatch, required,
      buckets, outMap)
  }
}

/** The scan an absorbed aggregation builds: ONE partition, ONE row,
  * each cell a closed form over [lo, hi) (all supported aggregates are
  * LongType in Spark's complete-pushdown schema: count→bigint,
  * sum/min/max of bigint→bigint). Empty range ⇒ count 0, sum/min/max
  * NULL — exactly Spark's un-grouped aggregate over empty input.
  */
private class SyntheticAggScan(lo: Long, hi: Long,
    fns: Array[aggregate.AggregateFunc],
    outMap: Map[String, String] = Map.empty) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(fns.zipWithIndex.map { case (_, i) =>
      StructField(s"agg_$i", LongType, nullable = true) })
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-synthetic AGGREGATED ids [$lo, $hi): ${fns.map(_.describe()).mkString(", ")}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SyntheticPartition(lo, hi))
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticAggReaderFactory(fns, outMap)
}

private class SyntheticAggReaderFactory(fns: Array[aggregate.AggregateFunc],
    outMap: Map[String, String])
    extends PartitionReaderFactory {
  // post-join aggregates reference joined OUTPUT names; map to generators
  private def name(e: org.apache.spark.sql.connector.expressions.Expression): String = {
    val n = e.asInstanceOf[org.apache.spark.sql.connector.expressions.NamedReference]
      .fieldNames()(0)
    outMap.getOrElse(n, n)
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val SyntheticPartition(lo, hi, _) = partition.asInstanceOf[SyntheticPartition]
    val empty = hi <= lo
    val vals: Array[Any] = fns.map {
      case _: aggregate.CountStar          => math.max(hi - lo, 0L)
      case _: aggregate.Count              => math.max(hi - lo, 0L) // all cols non-null
      case _ if empty                      => null
      case m: aggregate.Min => name(m.column) match {
        case "doc_id" => lo
        case "n_tokens" => SyntheticDocs.minNTokens(lo, hi)
      }
      case m: aggregate.Max => name(m.column) match {
        case "doc_id" => hi - 1
        case "n_tokens" => SyntheticDocs.maxNTokens(lo, hi)
      }
      case s: aggregate.Sum => name(s.column) match {
        case "doc_id" => SyntheticDocs.sumIds(lo, hi)
        case "n_tokens" => SyntheticDocs.sumNTokens(lo, hi)
      }
    }
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted && { emitted = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(vals.toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}

private case class SyntheticPartition(start: Long, end: Long, idx: Int = 0)
    extends InputPartition

/** One bucket of the bucketed layout: ids ≡ `bucket` (mod `nBuckets`)
  * within [lo, hi). `HasPartitionKey` is the SPJ handshake — Spark groups
  * partitions by this key and aligns them across join sides, so the key
  * MUST be exactly what the reported transform (`bucket(n, doc_id)`)
  * evaluates to on every row the partition emits. */
private case class SyntheticBucketPartition(lo: Long, hi: Long,
    bucket: Int, nBuckets: Int) extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

/** Streaming offset = exclusive upper id already emitted. */
private case class SyntheticOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

private class SyntheticScan(private var lo: Long, private var hi: Long,
    partitions: Int, streamBatch: Long, required: StructType,
    buckets: Option[Int] = None,
    outMap: Map[String, String] = Map.empty)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeV2Filtering with SupportsReportPartitioning
    with SupportsReportOrdering {
  // joined scans read OUTPUT names; the reader generates by the
  // underlying column (identical for both sides — same id, same row)
  private def underlying(n: String): String = outMap.getOrElse(n, n)

  /** `SupportsReportOrdering`: every partition — range slice or bucket —
    * enumerates ids ascending, so the scan declares doc_id ASC
    * per-partition order and Spark drops the Sort it would otherwise
    * plan under a merge join or sort-ordered window. Combined with the
    * key-grouped report above, the bucketed self-join plans as a BARE
    * SortMergeJoin over the scans: no exchange, no sort — the full
    * Iceberg-class "storage does the heavy lifting" read contract. */
  override def outputOrdering(): Array[SortOrder] =
    required.fieldNames.find(n => underlying(n) == "doc_id") match {
      case Some(idCol) =>
        Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
          org.apache.spark.sql.connector.expressions.Expressions.column(idCol),
          SortDirection.ASCENDING))
      case None => Array.empty
    }

  /** Storage-partitioned join (`SupportsReportPartitioning`): the
    * bucketed layout reports `bucket(B, doc_id)` KeyGroupedPartitioning —
    * Spark resolves the transform through the table's FunctionCatalog
    * ([[BucketFunction]]) and, when both join sides report the same
    * canonical function + bucket count over the join key, plans the join
    * with NO exchange on either side (the Iceberg-bucketed-table
    * contract; requires `spark.sql.sources.v2.bucketing.enabled`, set in
    * GraftSession). The range layout reports unknown partitioning, which
    * Spark ignores. At 100 TB this is the difference between a co-located
    * merge join and shuffling both fact tables. */
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    buckets match {
      case Some(b) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(b, "doc_id")), b)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(
          partitions)
    }

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
    // Bucketed mode DECLINES runtime filtering: a runtime-narrowed range
    // may not drop or reorder key-grouped partitions (Spark requires the
    // grouped layout be preserved across runtime filtering, and a
    // changed partition-value set would break the co-partitioning the
    // join was planned on), so the conservative correct choice is to
    // keep all B buckets and let the residual filter do the work.
    // joined scans also decline: the runtime filter would reference an
    // aliased output column and the conservative fallback is correct
    if (buckets.isEmpty && outMap.isEmpty &&
        required.fieldNames.contains("doc_id"))
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
    private val rowBytes = required.fieldNames.map(underlying).map {
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
    new SyntheticMicroBatchStream(lo, hi, partitions, streamBatch, required,
      outMap)

  /** Range layout: even id slices of the POST-pushdown range — a pushed
    * `doc_id < k` shrinks the range before this split, so out-of-range
    * partitions are never created (partition-level pruning, the
    * file-source `PartitionFilters` analog). Bucketed layout: ALWAYS
    * exactly B partitions, one per bucket (possibly empty) — the
    * partition-value set must be stable so two scans of co-bucketed
    * tables stay alignable whatever each side's pushed range is; a
    * pushed filter still narrows [lo, hi) WITHIN every bucket. */
  override def planInputPartitions(): Array[InputPartition] = buckets match {
    case Some(b) =>
      (0 until b).map(SyntheticBucketPartition(lo, hi, _, b)).toArray
    case None =>
      val n = math.max(1, math.min(partitions.toLong, math.max(hi - lo, 1L))).toInt
      val span = hi - lo
      if (span <= 0) return Array.empty
      (0 until n).map { i =>
        SyntheticPartition(lo + span * i / n, lo + span * (i + 1) / n, i)
      }.filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames.map(underlying))
}

private class SyntheticMicroBatchStream(lo: Long, hi: Long, partitions: Int,
    streamBatch: Long, required: StructType,
    outMap: Map[String, String] = Map.empty)
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
    import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, ReadAllAvailable, ReadLimit, ReadMaxRows}
    val s = start.asInstanceOf[SyntheticOffset].id
    // A CompositeReadLimit (e.g. maxRows ∧ minRows, which some trigger
    // configs deliver) must honor the TIGHTEST contained row cap — the
    // default branch would silently exceed an engine cap below
    // streamBatch (ADVICE r11). minRows has no upper-bound meaning for a
    // bounded replay source, so only maxRows/allAvailable constrain.
    def cap(l: ReadLimit): Long = l match {
      case m: ReadMaxRows        => s + m.maxRows()
      case _: ReadAllAvailable   => target
      case c: CompositeReadLimit => c.getReadLimits.map(cap).min
      case _                     => s + streamBatch
    }
    SyntheticOffset(math.min(cap(limit), target))
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
    (0 until n).map(i => SyntheticPartition(s + span * i / n, s + span * (i + 1) / n, i))
      .filter(p => p.end > p.start).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(
      required.fieldNames.map(n => outMap.getOrElse(n, n)))
}

private class SyntheticReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  /** Id enumeration per layout: a range slice steps by 1 through
    * [start, end); a bucket partition steps by nBuckets from the first
    * id ≥ lo in its residue class — either way the reader materializes
    * ONLY the required columns (pruning is real work saved, not
    * cosmetic schema narrowing). */
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val (start, end, step, pIdx) = partition match {
      case SyntheticPartition(s, e, i) => (s, e, 1L, i)
      case SyntheticBucketPartition(lo, hi, b, n) =>
        (lo + SyntheticDocs.bucketOf(n, b - lo), hi, n.toLong, b)
    }
    new PartitionReader[InternalRow] {
      private var id = start - step
      override def next(): Boolean = { id += step; id < end }
      override def get(): InternalRow = {
        val vals = cols.map {
          case "doc_id"     => id
          case "lang"       => UTF8String.fromString(SyntheticDocs.lang(id))
          case "source"     => UTF8String.fromString(SyntheticDocs.source(id))
          case "n_tokens"   => SyntheticDocs.nTokens(id)
          case "text"       => UTF8String.fromString(SyntheticDocs.text(id))
          case "_partition" => pIdx
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
