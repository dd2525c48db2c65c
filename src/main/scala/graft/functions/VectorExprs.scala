package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types._

/** Native vector kernels (cosine similarity, sign-random-projection LSH
  * buckets) — same rationale as [[HashExprs]]: the `zip_with`/`aggregate`
  * higher-order formulation is CodegenFallback and pays interpreted
  * lambda overhead per dimension; these run one JVM loop per row and keep
  * the projection inside whole-stage codegen.
  *
  * Numeric contract: all folds are left-to-right double accumulation —
  * bit-identical to the HOF formulation they replace and to DuckDB's
  * `list_cosine_similarity`, so oracle-gated results are unchanged.
  */
object VectorImpl {
  /** cosine(a, b) = Σaᵢbᵢ / (√Σaᵢ² · √Σbᵢ²), left-to-right. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The (planeIdx, dim) hyperplane component used by [[srpBucket]] —
    * exposed so oracle SQL can be generated from the SAME deterministic
    * plane matrix (the values are interpolated as literals into the
    * ann02 DuckDB oracle). Must stay bit-in-sync with the srpBucket loop
    * below (both are two chained `XXH64.hashInt` calls, seed 42, folded
    * by Long.MaxValue).
    */
  def planeComponent(planeIdx: Int, d: Int): Double = {
    val seed = XXH64.hashInt(planeIdx, 42L)
    XXH64.hashInt(d, seed).toDouble / Long.MaxValue.toDouble
  }

  /** One bucket id from `nPlanes` pseudo-random hyperplane sign bits.
    * Plane component (p, d) = xxhash64(p, d) folded to [-1, 1) — identical
    * to the Column formulation it replaces (hash of two long columns,
    * seed 42, divided by Long.MaxValue).
    */
  def srpBucket(v: ArrayData, nPlanes: Int, planeOffset: Int): Long = {
    val dims = v.numElements()
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      val seed = XXH64.hashInt(p + planeOffset, 42L)
      var d = 0
      while (d < dims) {
        // hashInt×2, seed 42: bit-identical to xxhash64(lit(p), i) over the
        // int-typed sequence() in the Column formulation this replaces
        val h = XXH64.hashInt(d, seed)
        proj += v.getDouble(d) * (h.toDouble / Long.MaxValue.toDouble)
        d += 1
      }
      if (proj >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }
}

private[functions] trait DoubleArrayInputs extends Expression {
  protected def arrayOk(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** `cosine_sim(a, b)` over two array<double> columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with DoubleArrayInputs {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(left.dataType) && arrayOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> inputs, got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorImpl.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorImpl.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `srp_bucket(vec, nPlanes, planeOffset)` → bigint LSH bucket id. */
case class SrpBucket(child: Expression, nPlanes: Int, planeOffset: Int)
    extends UnaryExpression with DoubleArrayInputs {
  require(nPlanes > 0 && nPlanes <= 63, "nPlanes must be in [1, 63]")
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"
  override def checkInputDataTypes(): TypeCheckResult =
    if (arrayOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got ${child.dataType.simpleString}")
  override protected def nullSafeEval(input: Any): Any =
    VectorImpl.srpBucket(input.asInstanceOf[ArrayData], nPlanes, planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorImpl.srpBucket($c, $nPlanes, $planeOffset)")
  override protected def withNewChildInternal(newChild: Expression): SrpBucket =
    copy(child = newChild)
}

object VectorExprs {
  def cosineSim(a: Column, b: Column): Column =
    ColumnShim.column(CosineSim(ColumnShim.expression(a), ColumnShim.expression(b)))
  def srpBucket(vec: Column, nPlanes: Int, planeOffset: Int): Column =
    ColumnShim.column(SrpBucket(ColumnShim.expression(vec), nPlanes, planeOffset))
}
