package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.QualityModel

/** The trainable quality classifier pinned two ways: an INDEPENDENT plain-
  * Scala replay of the whole descent on a hand-sized fixture (every round's
  * weights must match to the last of the 12 pinned decimals — the decimal-
  * sum + rational-sigmoid design means there is no tolerance to hide in),
  * and the optimization property itself (squared-error loss strictly below
  * the zero-weight 0.25 after training on the real corpus).
  */
class QualityModelSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val Mod = 1000000007L
  private def ph(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % Mod)

  /** Plain-collections replay of trainLogistic's contract. */
  private def handTrain(docs: Seq[(String, Double)], f: Int,
                        rounds: Int, lr: Double): Seq[Array[Double]] = {
    val rows = docs.map { case (text, y) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val n = toks.length.toDouble
      val xs = 1.0 +: (1 to f).map(j =>
        toks.count(t => ph(t) % f == j - 1) / n).toArray
      (y, xs)
    }.filter(_._2.length == f + 1)
    var w = Array.fill(f + 1)(0.0)
    (1 to rounds).map { _ =>
      val sums = Array.fill(f + 1)(BigDecimal(0))
      rows.foreach { case (y, xs) =>
        val z = xs.zip(w).map { case (x, wj) => wj * x }.reduceLeft(_ + _)
        val sig = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
        for (j <- 0 to f)
          sums(j) += BigDecimal(java.math.BigDecimal.valueOf((sig - y) * xs(j))
            .setScale(12, java.math.RoundingMode.HALF_UP))
      }
      val n = rows.size.toDouble
      w = Array.tabulate(f + 1) { j =>
        java.math.BigDecimal.valueOf(w(j) - lr * (sums(j).toDouble / n))
          .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
      }
      w.clone()
    }
  }

  test("trainLogistic == the plain-Scala descent replay, every round, all 12 decimals") {
    val fixture = Seq(
      ("the cat sat on the mat and purred a lot today", 1.0),
      ("a dog ran far", 1.0),
      ("zz zz zz zz zz", 0.0),
      ("qq ww ee rr tt yy uu", 0.0),
      ("the quick brown fox jumps over a lazy dog", 1.0),
      ("k1 k2 k3", 0.0))
    val df = fixture.toDF("text", "y")
    val got = QualityModel.trainLogistic(df, "text", col("y"),
      f = 4, rounds = 3, lr = 0.5)
    val hand = handTrain(fixture, f = 4, rounds = 3, lr = 0.5)
    assert(got.size == 3)
    for (r <- 0 until 3)
      assert(got(r).toSeq == hand(r).toSeq,
        s"round ${r + 1}: engine ${got(r).toSeq} != hand ${hand(r).toSeq}")
    // and the weights moved (a zero gradient would hide a dead plan)
    assert(got.head.exists(_ != 0.0))
  }

  test("trainLogistic == hand replay on random corpora and labels (property)") {
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (ci <- 0 until 6) {
      val rnd = new scala.util.Random(500 + ci)
      val fixture = (0 until 5 + rnd.nextInt(15)).map { _ =>
        val text = (0 until 1 + rnd.nextInt(20))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (text, if (rnd.nextBoolean()) 1.0 else 0.0)
      }
      val f = 2 + rnd.nextInt(4)
      val lr = 0.25 + rnd.nextDouble()
      val got = QualityModel.trainLogistic(fixture.toDF("text", "y"),
        "text", col("y"), f = f, rounds = 2, lr = lr)
      val hand = handTrain(fixture, f = f, rounds = 2, lr = lr)
      assert(got.map(_.toSeq) == hand.map(_.toSeq),
        s"case $ci (f=$f, lr=$lr): engine ${got.map(_.toSeq)} != hand ${hand.map(_.toSeq)}")
    }
  }

  test("training reduces squared-error loss below the zero-weight 0.25 on the corpus") {
    val docs = Tables.load(spark, TestSession.sf, "documents")
    // the q161 label: the Gopher-pass verdict
    val toks = graft.functions.TextFunctions.tokens($"text")
    val n = size(toks).cast("double")
    val meanLen = aggregate(toks, lit(0L), (acc, tk) => acc + length(tk))
      .cast("double") / n
    val label = (size(toks) >= 10 && size(toks) <= 500 &&
      meanLen >= 2.0 && meanLen <= 8.0 &&
      size(filter(toks, tk => tk.isin("a", "the"))) >= 1 &&
      size(array_distinct(toks)) / n >= 0.3).cast("double")
    val ws = QualityModel.trainLogistic(docs, "text", label,
      f = 6, rounds = 5, lr = 0.5)
    def loss(w: Array[Double]): Double = docs
      .filter(size(toks) > 0) // the training population (features defined)
      .select(label.as("y"), QualityModel.score($"text", w).as("s"))
      .select(avg(pow($"s" - $"y", 2)).as("l"))
      .as[Double].head()
    val l0 = loss(Array.fill(7)(0.0))
    val lFinal = loss(ws.last)
    assert(math.abs(l0 - 0.25) < 1e-9, s"zero-weight loss must be 0.25, got $l0")
    assert(lFinal < l0 - 0.01,
      s"training must reduce loss materially: $l0 -> $lFinal")
    // monotone-ish: the final round is no worse than the first round
    assert(lFinal <= loss(ws.head) + 1e-12)
  }

  test("hold-out eval: train on split!=0, score split 0 — beats the majority baseline on docs it never saw") {
    import graft.operators.Dedup
    // two separable families by hashed-feature residue (ph(t) % 6):
    // pos words all hash to residue 2, neg words to residue 4 — so x2/x4
    // carry the signal; per-doc serial tokens add feature noise and keep
    // the near-dup clusters honest (each doc is its own cluster except
    // the planted twins)
    val pos = Seq("alpha", "charlie", "juliet", "mike", "oscar", "quebec")
    val neg = Seq("bravo", "golf", "papa", "whiskey", "yankee", "star")
    def doc(i: Int, fam: Seq[String]) =
      s"${fam(i % 6)} ${fam((i + 1) % 6)} ${fam((i + 2) % 6)} " +
        s"${fam((i + 3) % 6)} s$i t$i u$i v$i w$i"
    val base = (0 until 30).map(i => (i.toLong, doc(i, pos))) ++
      (30 until 60).map(i => (i.toLong, doc(i, neg)))
    // planted near-dup twins (first token swapped -> 3-shingle J = 6/8):
    // the split must keep each twin with its original or the eval leaks
    val twinOf = Seq(0, 7, 33, 41)
    val twins = twinOf.map { i =>
      (i + 1000L, base(i)._2.replaceFirst("^\\S+", "delta"))
    }
    val docs = (base ++ twins).toDF("doc_id", "text")
    val label = arrays_overlap(
      graft.functions.TextFunctions.tokens($"text"),
      lit(pos.toArray)).cast("double")
    val split = Dedup.clusterSafeSplit(docs, "doc_id", "text",
      n = 3, k = 16, bands = 4, threshold = 0.5, buckets = 5)
      .select($"doc_id", $"split")
    val sm = split.as[(Long, Long)].collect().toMap
    twinOf.foreach { i =>
      assert(sm(i.toLong) == sm(i + 1000L),
        s"twin $i must share its original's split (cluster-safety)")
    }
    val train = docs.join(split.filter($"split" =!= 0).select($"doc_id"), Seq("doc_id"))
    val heldOut = docs.join(split.filter($"split" === 0).select($"doc_id"), Seq("doc_id"))
    val w = QualityModel.trainLogistic(train, "text", label,
      f = 6, rounds = 20, lr = 2.0).last
    val eval = heldOut
      .select(label.as("y"), QualityModel.score($"text", w).as("s"))
      .select($"y".cast("int").as("y"), ($"s" >= 0.5).cast("int").as("pred"))
      .as[(Int, Int)].collect()
    assert(eval.nonEmpty, "held-out split is empty — rebucket the fixture")
    val ys = eval.map(_._1)
    assert(ys.toSet == Set(0, 1),
      s"held-out set must carry both classes, got ${ys.toSeq}")
    val acc = eval.count { case (y, p) => y == p }.toDouble / eval.length
    val majority = math.max(ys.sum, ys.length - ys.sum).toDouble / ys.length
    assert(acc > majority,
      s"held-out accuracy $acc must beat the majority baseline $majority " +
        s"(zero-weight scores 0.5 -> all-positive, <= majority)")
  }
}
