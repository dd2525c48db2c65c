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
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "fnv64"))
  override def functionExists(ident: Identifier): Boolean =
    ident.name == "fnv64"
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    ident.name match {
      case "fnv64" => new Fnv64Function
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(
          catalogName, ident.name())
    }

  private val TablePat = "docs([0-9]+)(?:_p([0-9]+))?".r

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "docs1000"))

  /** (rows, partitions) iff the identifier parses AND fits its numeric
    * types — digits past Long.MaxValue must read as "no such table", not
    * an unhandled NumberFormatException mid-analysis (review r11d). */
  private def parse(name: String): Option[(Long, Int)] = name match {
    case TablePat(n, p) =>
      try Some((n.toLong, Option(p).map(_.toInt).getOrElse(8)))
      catch { case _: NumberFormatException => None }
    case _ => None
  }

  override def tableExists(ident: Identifier): Boolean =
    parse(ident.name).isDefined

  override def loadTable(ident: Identifier): Table = parse(ident.name) match {
    case Some((rows, parts)) => new SyntheticDocsTable(rows, parts, 4096L)
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
