package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** vec_dot(a, b): strict in-order left-fold dot product of two
  * array<double> columns — the similarity-search hot loop.
  *
  * Accumulation order is index order, exactly like the HOF
  * `aggregate(zip_with(a,b,*), 0d, +)` it replaces and the DuckDB
  * `list_reduce` oracle — double addition is order-sensitive, so this is a
  * correctness contract, not a style choice (SimilaritySpec pins it).
  * At sf0.1 the interpreted HOF made the 2M-pair cosine scan take 49 s;
  * this runs the same scan as one codegen'd loop.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  // null also for mismatched-length (non-null) inputs, matching the HOF
  // zip_with+aggregate reference and the DuckDB oracle
  override def nullable: Boolean = true

  private def isDoubleArray(t: DataType) = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot(a: array<double>, b: array<double>)")

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null else VecDot.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.plans.VecDot$$.MODULE$$.dot($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot =
    copy(left = l, right = r)
}

object VecDot {
  /** Lengths are pre-checked equal by the expression (mismatch → NULL). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    (c: Seq[Expression]) => VecDot(c.head, c(1)))
}

/** lsh_bucket(vec, planes, dims): random-hyperplane LSH bucket id — the
  * `planes` sign bits of deterministic pseudo-random projections packed
  * into a long. The ANN probe hot loop (every query row pays it).
  *
  * Replaces the interpreted HOF formulation
  * (`aggregate(transform(sequence(...)))` per plane — 4 planes × 64 dims ×
  * two lambda evals per element, per row) with one codegen'd loop over
  * cached coefficients. Coefficient formula is the portable integer hash
  * `(((j*dims + d + 1) * 2654435761) % 1e9+7) % 2001 - 1000) / 1000`, so
  * any engine (and the DuckDB oracle) reproduces the buckets exactly;
  * projections accumulate in index order like the HOF and the oracle's
  * `list_reduce` (parity pinned in NativeExprsSpec).
  */
case class LshBucket(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override def checkInputDataTypes(): TypeCheckResult = (first.dataType, second.dataType, third.dataType) match {
    case (ArrayType(DoubleType, _), IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "lsh_bucket(vec: array<double>, planes: int, dims: int)")
  }

  protected override def nullSafeEval(v: Any, p: Any, d: Any): Any =
    LshBucket.bucket(v.asInstanceOf[ArrayData], p.asInstanceOf[Int], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, d) => s"graft.plans.LshBucket$$.MODULE$$.bucket($v, $p, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): LshBucket =
    copy(first = f, second = s, third = t)
}

object LshBucket {
  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]

  /** coef(j, d) for plane j, dim d — flat per-plane arrays, computed once
    * per (planes, dims) per JVM.
    */
  private def coefs(planes: Int, dims: Int): Array[Array[Double]] =
    coefCache.computeIfAbsent((planes, dims), { case (p, dm) =>
      Array.tabulate(p, dm) { (j, d) =>
        ((((j.toLong * dm + d + 1) * 2654435761L) % 1000000007L % 2001L) - 1000L) / 1000.0
      }
    })

  /** Vectors are expected to carry exactly `dims` elements; shorter arrays
    * project over their own length (same sign result as padding with 0).
    */
  def bucket(vec: ArrayData, planes: Int, dims: Int): Long = {
    val cs = coefs(planes, dims)
    val n = math.min(dims, vec.numElements())
    var bits = 0L
    var j = 0
    while (j < planes) {
      val c = cs(j)
      var proj = 0d
      var d = 0
      while (d < n) {
        proj += vec.getDouble(d) * c(d)
        d += 1
      }
      if (proj >= 0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lsh_bucket"),
    new ExpressionInfo(classOf[LshBucket].getName, "lsh_bucket"),
    (c: Seq[Expression]) => LshBucket(c.head, c(1), c(2)))
}

/** nearest_centroid(vec, centroids, dims): index of the L2-nearest centroid
  * in a flattened k×dims centroid array — the IVF assignment/probe hot
  * loop, fully codegen'd (one fused loop per row; the centroid model rides
  * along as a literal, so it broadcasts with the plan and the corpus never
  * shuffles for assignment).
  */
case class NearestCentroid(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def checkInputDataTypes(): TypeCheckResult = (first.dataType, second.dataType, third.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "nearest_centroid(vec: array<double>, centroids: array<double>, dims: int)")
  }

  protected override def nullSafeEval(v: Any, c: Any, d: Any): Any =
    NearestCentroid.nearest(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, d) => s"graft.plans.NearestCentroid$$.MODULE$$.nearest($v, $c, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): NearestCentroid =
    copy(first = f, second = s, third = t)
}

object NearestCentroid {
  /** Ties (equal distance) break toward the lower centroid index, so the
    * assignment is total and engine-independent.
    */
  def nearest(vec: ArrayData, cents: ArrayData, dims: Int): Int = {
    val k = cents.numElements() / dims
    val n = math.min(dims, vec.numElements())
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val off = c * dims
      var d = 0d
      var i = 0
      while (i < n) {
        val diff = vec.getDouble(i) - cents.getDouble(off + i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nearest_centroid"),
    new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid"),
    (c: Seq[Expression]) => NearestCentroid(c.head, c(1), c(2)))
}
