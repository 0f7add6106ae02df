package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{polyHash, tokens}

/** Trainable quality classifier — the training half that completes q90
  * (fixed-weight scoring) the way q146 completed q104: the linear
  * quality-filter family of GPT-3's data work (Brown et al. 2020, App. A:
  * a classifier scores documents against a high-quality reference) and
  * CCNet (Wenzek et al., LREC 2020), as a quasi-logistic
  * model over hashed bag-of-token features (the hashing trick —
  * Weinberger et al., ICML 2009 — is what keeps the model
  * fixed-size rather than vocabulary-sized), fit by BOUNDED driver-
  * synchronous gradient-descent rounds (the `Bpe.train` / q142 fixpoint
  * discipline). Everything is engine-replayable by construction:
  *
  *  - features: x_0 = 1 (bias), x_j = |tokens hashing to residue j−1| /
  *    n_tok for j = 1..F — exact integer counts over the portable
  *    poly-hash, divided once (deterministic IEEE division);
  *  - link: the RATIONAL sigmoid σ(z) = 0.5 + z / (2·(1 + |z|)) — same
  *    shape and gradient sign as the logistic, but pure +,·,/,abs
  *    arithmetic, so engines agree bit-for-bit where exp() might differ
  *    in the last ulp;
  *  - z = ((w_0·x_0 + w_1·x_1) + …): an EXPLICIT left-associated chain
  *    with the round's weights as literals — one fixed fold order, like
  *    the native dot;
  *  - gradients: per-doc terms (σ − y)·x_j are rounded to 12 dp and
  *    summed as DECIMAL(38,18) — exact, order-independent addition (the
  *    dsum discipline), so the shuffle-order nondeterminism of a double
  *    sum can never leak into the model;
  *  - update: w'_j = round(w_j − lr·(g_j / n), 12) — weights stay short
  *    exact decimals, so every round's model is a replayable literal.
  *
  * Scale shape: each round is ONE map-side-combined aggregate of F+2
  * numbers (decimal gradient sums + the count) over a scan-local feature
  * projection — no shuffle wider than the partial-agg exchange, no
  * vocab-sized state (F is fixed, not vocabulary-sized: hashed features
  * are the standard trick precisely because the model must not grow with
  * the corpus). Rounds are the driver-synchronous cost (R collects of
  * F+2 numbers), the q146/q142 class.
  */
object QualityModel {

  /** x_1..x_F as columns over a token array column. */
  def hashedFeatures(toks: Column, f: Int): Seq[Column] = {
    require(f >= 1, s"QualityModel: feature count must be >= 1, got $f")
    (1 to f).map { j =>
      size(filter(toks, t => pmod(polyHash(t), lit(f)) === (j - 1)))
        .cast("double") / size(toks).cast("double")
    }
  }

  /** The rational sigmoid — replayable in any engine. */
  def sigma(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** z = ((w0·1 + w1·x1) + …) with literal weights, fixed fold order. */
  private def zOf(weights: Array[Double], xs: Seq[Column]): Column =
    xs.zip(weights).map { case (x, w) => lit(w) * x }
      .reduceLeft(_ + _)

  /** Fit by `rounds` GD rounds from zero weights; returns the weight
    * vector AFTER each round (length F+1, bias first). `labelCol` must
    * be a deterministic 0/1 double; rows with no tokens are excluded
    * (their features are undefined).
    */
  def trainLogistic(docs: DataFrame, textCol: String, labelCol: Column,
                    f: Int, rounds: Int, lr: Double): Seq[Array[Double]] = {
    require(rounds >= 1 && lr > 0,
      s"QualityModel.trainLogistic: need rounds >= 1 and lr > 0, got $rounds/$lr")
    val toks = tokens(col(textCol))
    val xs = lit(1.0) +: hashedFeatures(col("__toks"), f)
    val base = docs
      .select(labelCol.cast("double").as("__y"), toks.as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select((col("__y") +: xs.zipWithIndex.map {
        case (x, j) => x.as(s"__x$j") }): _*)
      // persist (NOT localCheckpoint): the R rounds re-scan these narrow
      // rows instead of the text, and cache-manager persistence is the
      // form unpersist() can actually free in the finally below —
      // Dataset.unpersist is a no-op on a localCheckpoint's RDD blocks
      .persist()
    try {
      var w = Array.fill(f + 1)(0.0)
      val out = Seq.newBuilder[Array[Double]]
      for (_ <- 1 to rounds) {
        val z = zOf(w, (0 to f).map(j => col(s"__x$j")))
        val sig = sigma(z)
        val aggs = (0 to f).map { j =>
          sum(round((sig - col("__y")) * col(s"__x$j"), 12)
            .cast("decimal(38,18)")).as(s"__g$j")
        } :+ count(lit(1)).as("__n")
        val row = base.agg(aggs.head, aggs.tail: _*).collect()(0)
        val n = row.getLong(f + 1)
        // fail-loud, not NPE-on-NULL-sums / NaN weights: an empty
        // training population is a caller bug
        require(n > 0,
          "QualityModel.trainLogistic: no documents with tokens to train on")
        w = Array.tabulate(f + 1) { j =>
          val g = row.getDecimal(j).doubleValue()
          BigDecimal(w(j) - lr * (g / n.toDouble))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        out += w.clone()
      }
      out.result()
    } finally { base.unpersist(); () }
  }

  /** Per-(input, params) memo — the `Ivf.trainCached` convention: the
    * descent is deterministic (decimal-summed gradients), so callers
    * composing train + score (q161/q162) share one training instead of
    * paying the R driver-synchronous rounds twice.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Array[Double]]]

  def trainCached(docs: DataFrame, cacheKey: String, textCol: String,
                  labelCol: Column, f: Int, rounds: Int,
                  lr: Double): Seq[Array[Double]] =
    modelCache.computeIfAbsent(cacheKey,
      _ => trainLogistic(docs, textCol, labelCol, f, rounds, lr))

  /** Score a text with a trained (or fixed) weight vector — q90's scoring
    * completed with weights the pipeline LEARNED.
    */
  def score(textCol: Column, weights: Array[Double]): Column = {
    val toks = tokens(textCol)
    val xs = lit(1.0) +: hashedFeatures(toks, weights.length - 1)
    sigma(zOf(weights, xs))
  }
}
