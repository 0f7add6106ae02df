package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/** BPE train/apply vs an independent reference implementation:
  *
  *  - `mergeOnce` (the engine's scan-local fold) against a textbook
  *    index-walk apply on random symbol sequences, including the
  *    same-symbol-run case (a == b) where naive string replacement
  *    diverges from left-to-right semantics;
  *  - `train` round-for-round against a reference greedy trainer on the
  *    Sennrich fixture — identical merges in identical order AND
  *    identical final encodings;
  *  - `applyMerges` encodes UNSEEN words exactly as the reference would.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  /** Textbook apply: walk the word once, merging (a, b) at each match
    * and skipping past the consumed pair — the left-to-right
    * non-overlapping contract stated independently of the fold.
    */
  private def refApply(word: Vector[String], a: String, b: String): Vector[String] = {
    val buf = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      if (i + 1 < word.length && word(i) == a && word(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += word(i); i += 1 }
    }
    buf.result()
  }

  /** Reference greedy trainer: per-position weighted pair counts, pick
    * (cnt desc, a asc, b asc), apply everywhere, repeat.
    */
  private def refTrain(vocab0: Seq[(String, Long)], rounds: Int)
      : (List[(String, String)], Map[String, Vector[String]]) = {
    var v = vocab0.map { case (w, f) => (w, w.map(_.toString).toVector, f) }
    var merges = List.empty[(String, String)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((_, syms, f) <- v; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges = merges :+ ((a, b))
        v = v.map { case (w, syms, f) => (w, refApply(syms, a, b), f) }
      }
    }
    (merges, v.map { case (w, syms, _) => w -> syms }.toMap)
  }

  test("mergeOnce == index-walk reference on random symbol sequences (incl. a == b runs)") {
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "c")
    val cases = (0 until 200).map { i =>
      val syms = Vector.fill(rnd.nextInt(12) + 1)(alphabet(rnd.nextInt(3)))
      val a = alphabet(rnd.nextInt(3))
      val b = if (rnd.nextBoolean()) a else alphabet(rnd.nextInt(3)) // bias toward runs
      (i, syms, a, b)
    }
    val df = cases.map { case (i, syms, a, b) => (i, syms, a, b) }
      .toDF("id", "syms", "a", "b")
      .withColumn("merged", Bpe.mergeOnce(col("syms"), col("a"), col("b")))
    val got = df.select($"id", $"merged").as[(Int, Seq[String])].collect().toMap
    cases.foreach { case (i, syms, a, b) =>
      val want = refApply(syms, a, b)
      assert(got(i) == want, s"case $i: syms=$syms merge=($a,$b): got ${got(i)}, want $want")
    }
    // the canonical run case stays pinned explicitly
    val run = Seq((0, Vector("a", "a", "a", "a", "a"))).toDF("id", "syms")
      .select(Bpe.mergeOnce(col("syms"), lit("a"), lit("a")))
      .as[Seq[String]].head()
    assert(run == Seq("aa", "aa", "a"))
  }

  test("train: round-for-round merge agreement with the reference greedy trainer (Sennrich fixture)") {
    val fixture = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val rounds = 8
    val (refMerges, refEncoded) = refTrain(fixture, rounds)
    val (merges, encoded) = Bpe.train(fixture.toDF("word", "freq"), "word", "freq", rounds)
    assert(merges == refMerges,
      s"merge sequences diverged:\n engine: $merges\n ref:    $refMerges")
    val got = encoded.select($"word", $"syms").as[(String, Seq[String])]
      .collect().toMap
    fixture.foreach { case (w, _) =>
      assert(got(w) == refEncoded(w), s"'$w': got ${got(w)}, want ${refEncoded(w)}")
    }
    // the fixture's first merges are the textbook ones: 'es'+'t' family
    assert(merges.head._1.nonEmpty && merges.size == rounds)
  }

  test("merges persist round-trip: train -> parquet -> reload -> identical encodings") {
    val fixture = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val (merges, _) = Bpe.train(fixture.toDF("word", "freq"), "word", "freq", 6)
    val dir = java.nio.file.Files.createTempDirectory("bpe-merges").toString
    Bpe.mergesToDF(spark, merges).write.mode("overwrite").parquet(dir)
    val reloaded = Bpe.mergesFromDF(spark.read.parquet(dir))
    assert(reloaded == merges, "rank order must survive the round-trip")
    val words = Seq("lowest", "newest").toDF("word")
    def enc(m: Seq[(String, String)]) = words
      .select($"word", Bpe.applyMerges(Bpe.charSyms($"word"), m).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    assert(enc(reloaded) == enc(merges))
  }

  test("applyMerges encodes unseen words with the trained table, rank order respected") {
    val fixture = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val (merges, _) = Bpe.train(fixture.toDF("word", "freq"), "word", "freq", 8)
    val unseen = Seq("lowest", "wider", "newer")
    val got = unseen.toDF("word")
      .select($"word", Bpe.applyMerges(Bpe.charSyms($"word"), merges).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    unseen.foreach { w =>
      val want = merges.foldLeft(w.map(_.toString).toVector) {
        case (syms, (a, b)) => refApply(syms, a, b)
      }
      assert(got(w) == want, s"'$w': got ${got(w)}, want $want")
    }
  }
}
