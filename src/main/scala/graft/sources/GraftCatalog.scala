package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A V2 `TableCatalog` plugin — the third DSv2 integration surface after
  * the read/write connector paths: tables resolve by IDENTIFIER through
  * the session's catalog manager (`graft_cat.<ns>.docs<N>[_p<P>]`), so
  * plain SQL reaches the connector with no `format(...)` call and the
  * analyzer sees a real catalog table (name, schema, capabilities).
  * This is the seam Iceberg/Unity-style catalogs plug into; here the
  * "metastore" is the identifier grammar itself — `docs<N>` is the
  * N-row [[SyntheticDocs]] table (optionally `_p<P>` for P input
  * slices), which keeps the catalog deterministic and the gate's oracle
  * a pure `generate_series` recompute.
  *
  * Register lazily at runtime (catalogs resolve on first lookup):
  * `spark.conf.set("spark.sql.catalog.graft_cat", classOf[GraftCatalog].getName)`.
  * Read-only: the mutation surface throws — a query engine should fail
  * loudly rather than pretend to persist into an arithmetic namespace.
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = "graft_cat"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  // ---- FunctionCatalog: catalog-scoped V2 scalar functions ----
  // `bucket` is also the storage-partitioned-join resolution hook: when a
  // scan reports KeyGroupedPartitioning over a bucket transform, Spark's
  // V2ExpressionUtils loads `bucket` from THIS catalog (empty namespace)
  // and compares the bound function's canonicalName across join sides to
  // decide the sides are co-partitioned.
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "fnv64"), Identifier.of(namespace, "bucket"))
  override def functionExists(ident: Identifier): Boolean =
    ident.name == "fnv64" || ident.name == "bucket"
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name match {
      case "fnv64"  => new Fnv64Function
      case "bucket" => new BucketFunction
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
          catalogName, ident.name())
    }

  private val TablePat = "docs([0-9]+)(?:_p([0-9]+)|_b([0-9]+))?".r

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "docs1000"))

  /** (rows, partitions, buckets) iff the identifier parses AND fits its
    * numeric types — digits past Long.MaxValue must read as "no such
    * table", not an unhandled NumberFormatException mid-analysis (review
    * r11d). `_p<P>` = P contiguous range slices; `_b<B>` = bucketed
    * layout (B mod-interleaved partitions, reported as
    * bucket(B, doc_id) key-grouped partitioning — the SPJ contract).
    * A zero slice/bucket count parses but is not a table. */
  private def parse(name: String): Option[(Long, Int, Option[Int])] = name match {
    case TablePat(n, p, b) =>
      try {
        val parts = Option(p).map(_.toInt).getOrElse(8)
        val buckets = Option(b).map(_.toInt)
        if (parts < 1 || buckets.exists(_ < 1)) None
        else Some((n.toLong, buckets.getOrElse(parts), buckets))
      } catch { case _: NumberFormatException => None }
    case _ => None
  }

  override def tableExists(ident: Identifier): Boolean =
    parse(ident.name).isDefined

  override def loadTable(ident: Identifier): Table = parse(ident.name) match {
    case Some((rows, parts, buckets)) =>
      new SyntheticDocsTable(rows, parts, 4096L, buckets)
    case None =>
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(
        (catalogName +: ident.namespace().toSeq :+ ident.name()).toSeq)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}

/** `graft_cat.<ns>.fnv64(BIGINT) -> BIGINT` as a V2 catalog function —
  * the analyzer binds it through [[GraftCatalog.loadFunction]], and the
  * `invoke` MAGIC method lets codegen call it with a static dispatch on
  * unboxed longs (no per-row InternalRow boxing; `produceResult` is the
  * interpreted fallback the contract also requires). Same byte fold as
  * [[AuditSink.fnv64]], so the ev41 oracle arithmetic gates it.
  */
class Fnv64Function
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.BoundFunction
  override def name(): String = "fnv64"
  override def description(): String = "fnv64(id BIGINT) -> BIGINT (FNV-1a over 8 LE bytes)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields.head.dataType == org.apache.spark.sql.types.LongType,
      s"fnv64 takes one BIGINT argument, got ${inputType.simpleString}")
    new Fnv64Bound
  }
}

class Fnv64Bound
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
    Array(org.apache.spark.sql.types.LongType)
  override def resultType(): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.LongType
  override def name(): String = "fnv64"
  override def canonicalName(): String = "graft.fnv64"
  override def isDeterministic: Boolean = true
  /** Codegen path: static-dispatch on the unboxed long. */
  def invoke(v: Long): Long = AuditSink.fnv64(v)
  /** Interpreted fallback. */
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
    AuditSink.fnv64(input.getLong(0))
}

/** `bucket(n INT, id BIGINT) -> INT` — the transform function behind the
  * bucketed table layout (`docs<N>_b<B>`). Spark's SPJ machinery loads it
  * by name when a scan reports `bucket(B, doc_id)` key-grouped
  * partitioning (`V2ExpressionUtils.loadV2FunctionOpt`, identifier with
  * EMPTY namespace) and binds it with (numBuckets literal, column) — so
  * the input type is fixed (INT, BIGINT) and `canonicalName` is the
  * cross-side co-partitioning identity. Semantics: floor-mod, matching
  * [[SyntheticDocs.bucketOf]] — the single definition the bucketed
  * reader enumerates ids with.
  */
class BucketFunction
    extends org.apache.spark.sql.connector.catalog.functions.UnboundFunction {
  import org.apache.spark.sql.connector.catalog.functions.BoundFunction
  import org.apache.spark.sql.types.{IntegerType, LongType}
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n INT, id BIGINT) -> INT (floor-mod bucket id)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType &&
      inputType.fields(1).dataType == LongType,
      s"bucket takes (INT numBuckets, BIGINT id), got ${inputType.simpleString}")
    new BucketBound
  }
}

class BucketBound
    extends org.apache.spark.sql.connector.catalog.functions.ScalarFunction[java.lang.Integer] {
  override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
    Array(org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
  override def resultType(): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def isDeterministic: Boolean = true
  /** Codegen path: static-dispatch, unboxed. */
  def invoke(n: Int, id: Long): Int = SyntheticDocs.bucketOf(n, id)
  /** Interpreted fallback. */
  override def produceResult(input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Integer =
    SyntheticDocs.bucketOf(input.getInt(0), input.getLong(1))
}
