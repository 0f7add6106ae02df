package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, QuaternaryExpression, TernaryExpression}
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
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]

  /** coef(j, d) for FLAT plane `first + j`, dim d — per-plane arrays,
    * computed once per (first, planes, dims) per JVM. The schedule is a
    * single flat plane-index sequence: callers needing more sign bits
    * than one long holds chunk across calls with `first` offsets and the
    * coefficients line up exactly (the oracle replays flat j, oblivious
    * to chunking).
    */
  private def coefs(first: Int, planes: Int, dims: Int): Array[Array[Double]] =
    coefCache.computeIfAbsent((first, planes, dims), { case (f, p, dm) =>
      Array.tabulate(p, dm) { (j, d) =>
        (((((f + j).toLong * dm + d + 1) * 2654435761L) % 1000000007L % 2001L) - 1000L) / 1000.0
      }
    })

  /** Vectors are expected to carry exactly `dims` elements; shorter arrays
    * project over their own length (same sign result as padding with 0).
    */
  def bucket(vec: ArrayData, planes: Int, dims: Int): Long =
    bucketFrom(vec, planes, dims, 0)

  /** [[bucket]] over flat planes `first .. first + planes - 1`. */
  def bucketFrom(vec: ArrayData, planes: Int, dims: Int, first: Int): Long = {
    val cs = coefs(first, planes, dims)
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

/** lsh_bucket_from(vec, planes, dims, firstPlane): [[LshBucket]] with the
  * coefficient schedule starting at flat plane `firstPlane`. One long
  * carries at most 62 sign bits; OR-amplified banding past that chunks
  * its bands across several calls with increasing offsets, and because
  * the schedule is flat-plane-indexed the bits are identical to a
  * hypothetical single wide call — `lsh_bucket_from(v, p, d, 0)` equals
  * `lsh_bucket(v, p, d)` bit for bit (NativeExprsSpec pins both).
  */
case class LshBucketFrom(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket_from"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "lsh_bucket_from(vec: array<double>, planes: int, dims: int, firstPlane: int)")
    }

  protected override def nullSafeEval(v: Any, p: Any, d: Any, f: Any): Any =
    LshBucket.bucketFrom(v.asInstanceOf[ArrayData], p.asInstanceOf[Int],
      d.asInstanceOf[Int], f.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, d, f) =>
      s"graft.plans.LshBucket$$.MODULE$$.bucketFrom($v, $p, $d, $f)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, fo: Expression): LshBucketFrom =
    copy(first = f, second = s, third = t, fourth = fo)
}

object LshBucketFrom {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lsh_bucket_from"),
    new ExpressionInfo(classOf[LshBucketFrom].getName, "lsh_bucket_from"),
    (c: Seq[Expression]) => LshBucketFrom(c.head, c(1), c(2), c(3)))
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
    nearestSub(vec, 0, cents, 0, math.min(dims, vec.numElements()),
      cents.numElements() / dims, dims)
  }

  /** Shared argmin-L2 kernel over a subrange: compares `vec[vOff..vOff+n)`
    * against `k` centroids of stride `dims` starting at `cOff`, accumulating
    * squared diffs in index order (the FP-order contract every oracle
    * replays with a strict left fold).
    */
  def nearestSub(vec: ArrayData, vOff: Int, cents: ArrayData, cOff: Int,
                 n: Int, k: Int, dims: Int): Int = {
    var best = -1
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val off = cOff + c * dims
      var d = 0d
      var i = 0
      while (i < n) {
        val diff = vec.getDouble(vOff + i) - cents.getDouble(off + i)
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

/** pq_codes(vec, codebooks, subdims): product-quantization code assignment —
  * the vector is split into m = len(vec)/subdims contiguous subvectors, and
  * each is assigned the index of its L2-nearest centroid in that subspace's
  * codebook. Returns array<int> of length m.
  *
  * Codebook layout is a single flat array<double> literal: entry
  * `(j*k + c)*subdims + t` holds dim `t` of centroid `c` of subspace `j`,
  * with k = len(codebooks)/len(vec) centroids per subspace — the whole
  * model rides into executors as one plan literal (O(m·k·subdims) doubles,
  * independent of corpus size), so code assignment is a zero-shuffle
  * codegen'd scan, exactly like IVF's `nearest_centroid`.
  *
  * Ties break toward the lower code index; per-subspace squared diffs
  * accumulate in dim order (both FP-order contracts the DuckDB oracle
  * replays). A trailing partial subspace (len(vec) % subdims != 0) is
  * ignored — callers pass vectors whose length is m*subdims by contract.
  */
case class PqCodes(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult = (first.dataType, second.dataType, third.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_codes(vec: array<double>, codebooks: array<double>, subdims: int)")
  }

  protected override def nullSafeEval(v: Any, c: Any, d: Any): Any =
    PqCodes.codes(v.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c, d) => s"graft.plans.PqCodes$$.MODULE$$.codes($v, $c, $d)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PqCodes =
    copy(first = f, second = s, third = t)
}

object PqCodes {
  def codes(vec: ArrayData, cents: ArrayData, subDims: Int): ArrayData = {
    val m = vec.numElements() / subDims
    val k = if (m == 0) 0 else cents.numElements() / (m * subDims)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      out(j) = NearestCentroid.nearestSub(
        vec, j * subDims, cents, j * k * subDims, subDims, k, subDims)
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_codes"),
    new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
    (c: Seq[Expression]) => PqCodes(c.head, c(1), c(2)))
}

/** pq_adc(qvec, codes, codebooks): asymmetric distance computation — the
  * squared L2 distance between a full-precision query vector and a
  * PQ-compressed corpus vector, i.e. the L2 to the code's RECONSTRUCTION
  * (the concatenation of each subspace's chosen centroid). The PQ search
  * hot loop: every (query, candidate) pair pays exactly this.
  *
  * Geometry is inferred: m = len(codes), subdims = len(qvec)/m,
  * k = len(codebooks)/len(qvec). Accumulation order is global dim order
  * (subspace-major), identical to a strict left fold over the
  * reconstructed vector — the DuckDB oracle rebuilds the reconstruction
  * with an ordered list aggregate and folds the same way. A code outside
  * [0, k) (never produced by `pq_codes`) yields NULL.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (first.dataType, second.dataType, third.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "pq_adc(qvec: array<double>, codes: array<int>, codebooks: array<double>)")
  }

  protected override def nullSafeEval(q: Any, c: Any, cb: Any): Any =
    PqAdc.adc(q.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c, cb) =>
      s"""
         |Object r = graft.plans.PqAdc$$.MODULE$$.adc($q, $c, $cb);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Double) r).doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): PqAdc =
    copy(first = f, second = s, third = t)
}

object PqAdc {
  /** Boxed Double (null on an out-of-range code). */
  def adc(q: ArrayData, codes: ArrayData, cents: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    if (m == 0) return 0d
    val subDims = q.numElements() / m
    val k = cents.numElements() / (m * subDims)
    var acc = 0d
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return null
      val cOff = (j * k + c) * subDims
      val qOff = j * subDims
      var t = 0
      while (t < subDims) {
        val diff = q.getDouble(qOff + t) - cents.getDouble(cOff + t)
        acc += diff * diff
        t += 1
      }
      j += 1
    }
    acc
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_adc"),
    new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
    (c: Seq[Expression]) => PqAdc(c.head, c(1), c(2)))
}

/** sorted_inter_count(a, b): number of elements common to two SORTED
  * ascending array<long> columns (distinct elements within each array —
  * the adjacency-list contract), as one codegen'd merge walk.
  *
  * The triangle-count hot loop: per oriented edge (u, v) the triangle
  * closers are |N+(u) ∩ N+(v)|, and counting them by merge-walking two
  * pre-sorted neighbor arrays replaces the wedge-enumeration join — the
  * exchange that carried Σ out-deg² wedge ROWS now carries Σ out-deg
  * array elements attached to E edge rows (guide §2.3: shuffle bytes ≈
  * the proxy, not the fan-out). `array_intersect` computes the same count
  * but builds a hash set and materializes the intersection array per row;
  * the merge walk allocates nothing.
  */
case class SortedInterCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_inter_count"

  private def isLongArray(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sorted_inter_count(a: array<bigint>, b: array<bigint>) — both sorted ascending")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    SortedInterCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedInterCount$$.MODULE$$.count($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedInterCount =
    copy(left = l, right = r)
}

object SortedInterCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sorted_inter_count"),
    new ExpressionInfo(classOf[SortedInterCount].getName, "sorted_inter_count"),
    (c: Seq[Expression]) => SortedInterCount(c.head, c(1)))
}
