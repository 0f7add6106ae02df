package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding, train AND apply (Sennrich et al., ACL 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") — the
  * tokenize-to-subwords step a training-data build runs between curation
  * and packing. q104 computes the first iteration's merge statistics;
  * this operator runs the full bounded-round loop and, crucially, can
  * ENCODE text against a trained merges table.
  *
  * Scale design (the published algorithm's own move): all per-round work
  * runs over the (word, freq) VOCABULARY — Heaps-law sublinear in corpus
  * tokens — never over the corpus itself. Encoding arbitrary text is a
  * zero-shuffle scan-local fold: the merges ride the plan as literals
  * (a trained table is thousands of rows), so at 100 TB the encode stage
  * fuses into whatever scan precedes it; alternatively encode the
  * dictionary once and broadcast-join tokens to it.
  *
  * Determinism contract: merge selection is (corpus-weighted count desc,
  * pair asc) — exact long arithmetic and binary string order, so a SQL
  * engine replays every round bit-for-bit (q146's chained-CTE oracle
  * replays the rounds through an independent island-parity formulation
  * of the same merge semantics).
  */
object Bpe {

  /** Left-to-right non-overlapping application of ONE merge (a, b) → ab
    * over a symbol array — algorithm 1's inner replacement as a
    * scan-local `aggregate` fold. The fold invariant: the accumulator's
    * last element is merged at most once, because a just-merged symbol
    * `ab` can never equal `a` (b is non-empty) — which reproduces
    * left-to-right semantics exactly on same-symbol runs: "a a a a a"
    * under (a, a) → "aa aa a", never "aa a aa" (BpeSpec pins this
    * against an index-walk reference on random inputs).
    */
  def mergeOnce(syms: Column, a: Column, b: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === a && x === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(concat(a, b))))
        .otherwise(concat(acc, array(x))))

  /** Character seed symbols of a word (the q104 character-split
    * discipline — `substr` positions, engine-portable).
    */
  def charSyms(word: Column): Column =
    transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1)))

  /** ENCODE: fold an ordered merges table over a symbol array — every
    * merge applies once, in training rank order (the original Sennrich
    * apply). Pure column expression: zero shuffle, codegen-friendly,
    * merges inlined as literals.
    */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (a, b)) => mergeOnce(c, lit(a), lit(b)) }

  /** An ordered merges table as a DataFrame (rank, a, b) — the artifact
    * a training job persists (`.write.parquet`) so later encode jobs
    * apply the SAME subword vocabulary without retraining.
    */
  def mergesToDF(spark: org.apache.spark.sql.SparkSession,
                 merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "a", "b")
  }

  /** Load a persisted merges table back into apply order. The collect is
    * bounded by contract: a merges table is the trained vocabulary
    * budget (thousands of rows — it becomes plan literals in
    * [[applyMerges]], which is only viable at that size anyway).
    */
  def mergesFromDF(df: DataFrame): Seq[(String, String)] =
    df.select(col("rank").cast("long"), col("a"), col("b"))
      .collect().sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Train `rounds` merges on a (wordCol, freqCol) vocabulary. Returns
    * (merges in rank order, encoded vocab as (word, freq, syms)).
    *
    * Driver-synchronous bounded loop — the q142 fixpoint class: each
    * round is one narrow pair-count aggregate over the dictionary, a
    * top-1 TakeOrdered collected to the driver (O(1) rows, the
    * bounded-by-contract collect convention), and a scan-local fold;
    * the vocab is localCheckpoint'd per round so round k's action does
    * not recompute rounds 1..k-1 and the plan stays flat. Stops early
    * if the vocabulary runs out of adjacent pairs.
    */
  def train(vocab: DataFrame, wordCol: String, freqCol: String, rounds: Int)
      : (Seq[(String, String)], DataFrame) = {
    require(rounds >= 1, s"train: rounds must be >= 1, got $rounds")
    var v = vocab.select(col(wordCol).as("word"),
        col(freqCol).cast("long").as("freq"),
        charSyms(col(wordCol)).as("syms"))
      .localCheckpoint(graft.core.Mat.eager)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var k = 0
    var exhausted = false
    while (k < rounds && !exhausted) {
      val top = v.filter(size(col("syms")) > 1)
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        v = v.withColumn("syms", mergeOnce(col("syms"), lit(a), lit(b)))
          .localCheckpoint(graft.core.Mat.eager)
        k += 1
      }
    }
    (merges.toSeq, v)
  }
}
