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
class GraftCatalog extends TableCatalog {
  private var catalogName: String = "graft_cat"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val TablePat = "docs([0-9]+)(?:_p([0-9]+))?".r

  override def listTables(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "docs1000"))

  override def tableExists(ident: Identifier): Boolean =
    TablePat.pattern.matcher(ident.name).matches()

  override def loadTable(ident: Identifier): Table = ident.name match {
    case TablePat(n, p) =>
      new SyntheticDocsTable(n.toLong,
        Option(p).map(_.toInt).getOrElse(8), 4096L)
    case _ =>
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
