package graft.core

/** Typed views of the fixture tables — the `Dataset[T]` surface for code
  * where compile-time field safety beats raw-Row flexibility. Each case
  * class is a SUBSET of its table's columns (Spark's `as[T]` upcast drops
  * the rest), so library users can define the projection they need without
  * mirroring full schemas.
  *
  * Tradeoff, stated once here: typed lambdas (`ds.filter(_.x > 1)`) are
  * opaque to Catalyst — no predicate pushdown, no column pruning beyond
  * the encoder's fields. Use the typed path for business-logic safety and
  * typed `Aggregator`s (which DO keep partial aggregation); keep scans and
  * hot filters on the Column API.
  */
object Schemas {
  final case class LineitemQty(
      l_orderkey: Long, l_quantity: Double, l_returnflag: String)
  final case class OrderRow(
      o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
      o_orderstatus: String, o_orderpriority: String)
  final case class DocRow(doc_id: Long, source: String, lang: String, text: String)
  final case class EventRow(
      event_id: Long, user_id: Long, event_type: String, value: Double)
  final case class EmbeddingRow(vec_id: Long, label: String, embedding: Seq[Float])
}
