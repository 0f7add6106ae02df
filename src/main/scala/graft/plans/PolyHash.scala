package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst implementation of the engine's portable polynomial hash
  * (`h = (h*31 + codepoint) mod 1e9+7`, see functions/TextFunctions.scala).
  *
  * The HOF formulation (`aggregate(transform(split(s,""), ascii), …)`)
  * allocates a per-character array per row and evaluates two lambdas per
  * character; this expression walks the UTF8String bytes in place (ASCII
  * fast path, codepoint fallback) and participates in whole-stage codegen
  * via `defineCodeGen`, so fingerprint/minhash scans stay in one generated
  * loop. Same value as the HOF version and the DuckDB oracle, proven in
  * PolyHashSpec.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires a string argument, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash$$.MODULE$$.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  val Mod: Long = graft.functions.TextFunctions.HashMod

  /** ASCII strings hash byte-by-byte (bytes == codepoints); anything else
    * falls back to codepoint iteration, matching `ascii()` / DuckDB
    * `ascii()` semantics on each character.
    */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var ascii = true
    var i = 0
    while (i < n) {
      if (s.getByte(i) < 0) { ascii = false; i = n }
      i += 1
    }
    var h = 0L
    if (ascii) {
      i = 0
      while (i < n) {
        h = (h * 31 + s.getByte(i)) % Mod
        i += 1
      }
    } else {
      val it = s.toString.codePoints().iterator()
      while (it.hasNext) h = (h * 31 + it.next()) % Mod
    }
    h
  }

  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
    (children: Seq[Expression]) => PolyHash(children.head))
}

/** Column-API entry points + SQL registration. */
object GraftFunctions {

  /** The native poly-hash as a Column. Resolves through the function
    * registry, so the session must have called [[register]] (Queries.all
    * wraps every query to do this; `GraftExtensions` covers sessions built
    * with `spark.sql.extensions`).
    */
  def poly_hash(c: Column): Column = call_function("poly_hash", c)

  private[plans] val descriptors = Seq(
    PolyHash.descriptor, ShingleHashes.descriptor, CharGramHashes.descriptor,
    MinHashSig.descriptor, SimHashOf.descriptor, WinnowFps.descriptor,
    VecDot.descriptor, LshBucket.descriptor, LshBucketFrom.descriptor,
    NearestCentroid.descriptor,
    PqCodes.descriptor, PqAdc.descriptor, SortedInterCount.descriptor)

  /** Register all engine functions on a live session (idempotent overwrite). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injects the engine's
  * functions at session build time (SURVEY.md §7.3's one custom-function
  * slot; more land here as they are promoted to native expressions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}
