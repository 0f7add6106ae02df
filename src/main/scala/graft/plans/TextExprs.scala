package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup pipeline. The HOF formulations in
  * functions/TextFunctions (kept as *Hof for parity specs) pay one
  * interpreted lambda eval + boxing per element; at sf0.1 that made MinHash
  * signatures the whole-bench bottleneck (~69 s of 231 s). These walk the
  * data in tight JVM loops and stay inside whole-stage codegen.
  *
  * Value-compatibility contract: bit-identical to the HOF versions and the
  * DuckDB oracles (token split on single space, '_'-joined n-gram shingles,
  * first-occurrence-distinct, h*31+codepoint mod 1e9+7, minhash perms
  * a_i=2654435761*(i+1) mod p / b_i=40503*(i+1)+17 mod p).
  */
object TextExprs {
  private val Mod = PolyHash.Mod

  /** Distinct '_'-joined n-token shingle hashes of a text, one pass.
    * ASCII texts hash bytes in place; any non-ASCII byte falls back to a
    * String-based path with identical codepoint semantics.
    */
  def shingleHashes(s: UTF8String, n: Int): ArrayData = {
    val bytes = new Array[Byte](s.numBytes())
    s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    var ascii = true
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) { ascii = false; i = bytes.length }; i += 1 }
    if (ascii) shingleHashesAscii(bytes, n)
    else shingleHashesCodepoints(s.toString, n)
  }

  private def shingleHashesAscii(b: Array[Byte], n: Int): ArrayData = {
    // token boundaries: split on ' ', drop empties
    val starts = mutable.ArrayBuffer[Int]()
    val ends = mutable.ArrayBuffer[Int]()
    var i = 0
    while (i < b.length) {
      while (i < b.length && b(i) == ' ') i += 1
      if (i < b.length) {
        starts += i
        while (i < b.length && b(i) != ' ') i += 1
        ends += i
      }
    }
    val t = starts.length
    if (t < n) return new GenericArrayData(Array.empty[Long])
    val seen = new mutable.LinkedHashSet[Long]()
    var s0 = 0
    while (s0 <= t - n) {
      var h = 0L
      var k = 0
      while (k < n) {
        if (k > 0) h = (h * 31 + '_') % Mod
        var j = starts(s0 + k)
        val e = ends(s0 + k)
        while (j < e) { h = (h * 31 + b(j)) % Mod; j += 1 }
        k += 1
      }
      seen += h
      s0 += 1
    }
    new GenericArrayData(seen.toArray)
  }

  private def shingleHashesCodepoints(str: String, n: Int): ArrayData = {
    val toks = str.split(" ").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val seen = new mutable.LinkedHashSet[Long]()
    var i = 0
    while (i <= toks.length - n) {
      val shingle = toks.slice(i, i + n).mkString("_")
      seen += PolyHash.hash(UTF8String.fromString(shingle))
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** Positional (non-distinct) '_'-joined n-token shingle hashes — the
    * winnowing input, where position identity matters. Same tokenization
    * and hash arithmetic as [[shingleHashes]] minus the dedup.
    */
  private def positionalShingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val bytes = new Array[Byte](s.numBytes())
    s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    var ascii = true
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) { ascii = false; i = bytes.length }; i += 1 }
    if (ascii) {
      val starts = mutable.ArrayBuffer[Int]()
      val ends = mutable.ArrayBuffer[Int]()
      i = 0
      while (i < bytes.length) {
        while (i < bytes.length && bytes(i) == ' ') i += 1
        if (i < bytes.length) {
          starts += i
          while (i < bytes.length && bytes(i) != ' ') i += 1
          ends += i
        }
      }
      val t = starts.length
      if (t < n) return Array.empty[Long]
      val out = new Array[Long](t - n + 1)
      var s0 = 0
      while (s0 <= t - n) {
        var h = 0L
        var k = 0
        while (k < n) {
          if (k > 0) h = (h * 31 + '_') % Mod
          var j = starts(s0 + k)
          val e = ends(s0 + k)
          while (j < e) { h = (h * 31 + bytes(j)) % Mod; j += 1 }
          k += 1
        }
        out(s0) = h
        s0 += 1
      }
      out
    } else {
      val toks = s.toString.split(" ").filter(_.nonEmpty)
      if (toks.length < n) return Array.empty[Long]
      Array.tabulate(toks.length - n + 1) { j =>
        PolyHash.hash(UTF8String.fromString(toks.slice(j, j + n).mkString("_")))
      }
    }
  }

  /** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03): each
    * w-window over the positional n-shingle hash sequence selects its
    * LEFTMOST minimum; distinct (position, hash) selections return encoded
    * as `(pos << 32) | hash` (poly hashes are < 2³⁰, so the low word is
    * exact). One monotonic-deque pass — O(tokens) total, vs the HOF
    * formulation's O(tokens × w) slice + array_min rescans — and the
    * output order (first selection first) matches the HOF's
    * array_distinct order exactly.
    */
  def winnowEncoded(s: UTF8String, n: Int, w: Int): ArrayData = {
    val hs = positionalShingleHashes(s, n)
    if (hs.length < w) return new GenericArrayData(Array.empty[Long])
    val sel = new mutable.LinkedHashSet[Long]()
    val dq = new Array[Int](hs.length)
    var head = 0
    var tail = 0
    var j = 0
    while (j < hs.length) {
      // strict > keeps the earliest index among equal values at the front,
      // which IS the leftmost-min tie rule
      while (tail > head && hs(dq(tail - 1)) > hs(j)) tail -= 1
      dq(tail) = j
      tail += 1
      val winStart = j - w + 1
      if (winStart >= 0) {
        while (dq(head) < winStart) head += 1
        val p = dq(head)
        sel += (p.toLong << 32) | hs(p)
      }
      j += 1
    }
    new GenericArrayData(sel.toArray)
  }

  /** Distinct poly-hashes of every length-g CODEPOINT gram of a text, one
    * rolling O(len) pass — the canary-prefilter primitive (operators
    * .Canary): a doc containing a phrase verbatim contains the phrase's
    * first g codepoints as one of these grams, so membership of
    * poly_hash(substring(phrase, 1, g)) in this set is a recall-1.0
    * candidate test. Gram hash arithmetic is [[PolyHash]]'s
    * (h·31 + codepoint mod 1e9+7) over the gram's codepoints, so the two
    * sides match by construction. Texts shorter than g codepoints yield
    * an empty array.
    */
  def charGramHashes(s: UTF8String, g: Int): ArrayData = {
    if (g <= 0) return new GenericArrayData(Array.empty[Long])
    val bytes = new Array[Byte](s.numBytes())
    s.writeToMemory(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    var ascii = true
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) { ascii = false; i = bytes.length }; i += 1 }
    val cps: Array[Int] =
      if (ascii) {
        val a = new Array[Int](bytes.length)
        var j = 0
        while (j < a.length) { a(j) = bytes(j); j += 1 }
        a
      } else s.toString.codePoints().toArray
    if (cps.length < g) return new GenericArrayData(Array.empty[Long])
    // 31^(g-1) mod p for the roll-out of the leaving codepoint
    var pow = 1L
    var t = 1
    while (t < g) { pow = pow * 31 % Mod; t += 1 }
    val seen = new mutable.LinkedHashSet[Long]()
    var h = 0L
    var j = 0
    while (j < g) { h = (h * 31 + cps(j)) % Mod; j += 1 }
    seen += h
    while (j < cps.length) {
      // (h − c_out·31^(g−1))·31 + c_in, kept in [0, Mod): codepoints are
      // < 2^21 and Mod < 2^30, so every intermediate fits a long
      h = ((h - cps(j - g) * pow % Mod + Mod) % Mod * 31 + cps(j)) % Mod
      seen += h
      j += 1
    }
    new GenericArrayData(seen.toArray)
  }

  /** SimHash over a hash set: bit j of the result is set iff more than half
    * of the hashes have bit j set (ties -> 0, matching the HOF `2*ones > n`).
    */
  def simhash(hashes: ArrayData, bits: Int): Long = {
    val m = hashes.numElements()
    val ones = new Array[Int](bits)
    var j = 0
    while (j < m) {
      val h = hashes.getLong(j)
      var b = 0
      while (b < bits) {
        ones(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (2 * ones(b) > m) out |= (1L << b)
      b += 1
    }
    out
  }

  /** k-entry MinHash signature over a hash set (domain [0, Mod); values are
    * floor-modded in for safety). Empty input -> k sentinels (Mod).
    */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val m = hashes.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val a = java.lang.Math.floorMod(2654435761L * (i + 1), Mod)
      val bb = java.lang.Math.floorMod(40503L * (i + 1) + 17, Mod)
      var best = Mod
      var j = 0
      while (j < m) {
        val x = java.lang.Math.floorMod(hashes.getLong(j), Mod)
        val v = (a * x + bb) % Mod
        if (v < best) best = v
        j += 1
      }
      out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** shingle_hashes(text, n) -> array<long> */
case class ShingleHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "shingle_hashes(text: string, n: int literal)")

  protected override def nullSafeEval(text: Any, n: Any): Any =
    TextExprs.shingleHashes(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.plans.TextExprs$$.MODULE$$.shingleHashes($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ShingleHashes =
    copy(left = l, right = r)
}

/** winnow_fps(text, n, w) -> array<long> of (pos << 32) | shingle_hash */
case class WinnowFps(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == StringType &&
        second.dataType == IntegerType && second.foldable &&
        third.dataType == IntegerType && third.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "winnow_fps(text: string, n: int literal, w: int literal)")

  protected override def nullSafeEval(text: Any, n: Any, w: Any): Any =
    TextExprs.winnowEncoded(
      text.asInstanceOf[UTF8String], n.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n, w) => s"graft.plans.TextExprs$$.MODULE$$.winnowEncoded($t, $n, $w)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): WinnowFps = copy(f, s, t)
}

object WinnowFps {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("winnow_fps"),
    new ExpressionInfo(classOf[WinnowFps].getName, "winnow_fps"),
    (c: Seq[Expression]) => WinnowFps(c.head, c(1), c(2)))
}

/** char_gram_hashes(text, g) -> array<long> of distinct codepoint-gram
  * poly-hashes (see [[TextExprs.charGramHashes]]).
  */
case class CharGramHashes(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType && right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "char_gram_hashes(text: string, g: int literal)")

  protected override def nullSafeEval(text: Any, g: Any): Any =
    TextExprs.charGramHashes(text.asInstanceOf[UTF8String], g.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, g) => s"graft.plans.TextExprs$$.MODULE$$.charGramHashes($t, $g)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CharGramHashes =
    copy(left = l, right = r)
}

object CharGramHashes {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_gram_hashes"),
    new ExpressionInfo(classOf[CharGramHashes].getName, "char_gram_hashes"),
    (c: Seq[Expression]) => CharGramHashes(c.head, c(1)))
}

/** minhash_sig(hashes, k) -> array<long> */
case class MinHashSig(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "minhash_sig(hashes: array<long>, k: int literal)")
  }

  protected override def nullSafeEval(hashes: Any, k: Any): Any =
    TextExprs.minhashSig(hashes.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, k) => s"graft.plans.TextExprs$$.MODULE$$.minhashSig($h, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinHashSig =
    copy(left = l, right = r)
}

/** simhash_of(hashes, bits) -> long */
case class SimHashOf(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_of"

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, _) if right.dataType == IntegerType && right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "simhash_of(hashes: array<long>, bits: int literal)")
  }

  protected override def nullSafeEval(hashes: Any, bits: Any): Any =
    TextExprs.simhash(hashes.asInstanceOf[ArrayData], bits.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, b) => s"graft.plans.TextExprs$$.MODULE$$.simhash($h, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SimHashOf =
    copy(left = l, right = r)
}

object SimHashOf {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash_of"),
    new ExpressionInfo(classOf[SimHashOf].getName, "simhash_of"),
    (c: Seq[Expression]) => SimHashOf(c.head, c(1)))
}

object ShingleHashes {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (c: Seq[Expression]) => ShingleHashes(c.head, c(1)))
}

object MinHashSig {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (c: Seq[Expression]) => MinHashSig(c.head, c(1)))
}
