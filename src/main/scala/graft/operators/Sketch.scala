package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

import graft.functions.TextFunctions.{polyHash, HashMod}

/** Count-min sketch construction shared by the batch query (q101) and the
  * streaming form: a d×w counter grid, built as (i, bucket, c) cells so it
  * stays a plain aggregate — which is exactly what makes it work at scale:
  *
  *  - cells fold map-side to ≤ d·w partials per partition, so the
  *    exchange is O(d·w) rows at any corpus size;
  *  - the grid is MERGEABLE by cell-wise addition — union two shards'
  *    cells and re-sum, or run the same aggregate on a stream in update
  *    mode and the running cells ARE the sketch of everything seen;
  *  - estimates never under-count (min over d rows ≥ true count), the
  *    invariant SketchQueriesSpec pins.
  *
  * Bucket arithmetic reuses the MinHash permutation family
  * (a_i·x + b_i mod p, folded to w), so every engine — and the DuckDB
  * oracle — replays the grid bit-for-bit.
  */
object Sketch {
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Row-i pairwise-independent bucket of a pre-hashed key. */
  def cmsBucket(x: Column, i: Int): Column = {
    val a = java.lang.Math.floorMod(2654435761L * (i + 1), HashMod)
    val b = java.lang.Math.floorMod(40503L * (i + 1) + 17, HashMod)
    pmod(pmod(lit(a) * x + lit(b), lit(HashMod)), lit(CmsWidth))
  }

  /** (i, bucket) fan-out of one key column — d rows per input row. */
  def cmsEntries(key: Column): Column =
    explode(array((0 until CmsDepth).map { i =>
      struct(lit(i).as("i"), cmsBucket(polyHash(key), i).as("bucket"))
    }: _*))

  /** The sketch grid (i, bucket, c) over a string key column. Works
    * unchanged on a streaming DataFrame (update/complete output mode):
    * the running aggregate is the sketch of the whole stream so far.
    */
  def cmsCells(df: DataFrame, keyCol: String): DataFrame =
    df.select(cmsEntries(col(keyCol)).as("e"))
      .groupBy(col("e.i").as("i"), col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Point estimates for `probes` (any DataFrame with `keyCol`) against a
    * cells grid: min over the d probed cells. The grid broadcasts —
    * ≤ d·w rows by construction.
    */
  def cmsEstimate(probes: DataFrame, keyCol: String, cells: DataFrame): DataFrame = {
    val keyed = probes.select(col(keyCol), cmsEntries(col(keyCol)).as("p"))
      .select(col(keyCol), col("p.i").as("i"), col("p.bucket").as("bucket"))
    keyed.join(broadcast(cells), Seq("i", "bucket"))
      .groupBy(col(keyCol))
      .agg(min(col("c")).as("est"))
  }

  /** HyperLogLog register count (m = 2^8). Standard error ≈ 1.04/√m ≈ 6.5%
    * — the cardinality-sketch sibling of the CMS grid above and q102's KMV:
    * CMS answers "how often", KMV draws a sample, HLL answers "how many
    * distinct" in O(m) state per group at ANY input size.
    */
  val HllM = 256

  /** Bit width of the rho word `h div m`: polyHash < HashMod (1e9+7), so
    * `h div 256 < 2^22`. rho = leading-zero count within that word + 1,
    * i.e. `23 - bitlength(w)` (w = 0 → 23).
    */
  private val HllRhoMax = 23

  /** (group..., reg, mr): the HLL registers of `keyCol` per group — the
    * MERGEABLE sketch state. `max` folds map-side, so the exchange carries
    * ≤ |groups|·m narrow rows regardless of input size; union two shards'
    * registers and re-`max` to merge, or run the same aggregate on a
    * stream in update mode and the running registers ARE the sketch of
    * everything seen (the CMS contract, max instead of sum).
    *
    * Register index and rho both derive from the engine's portable
    * poly-hash, so the DuckDB oracle replays every register bit-for-bit:
    * reg = h mod m, rho from the bit length of h div m (`bin()` has
    * identical no-leading-zeros semantics in Spark and DuckDB).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], keyCol: String): DataFrame = {
    val h = polyHash(col(keyCol))
    val w = floor(h / lit(HllM.toDouble)).cast("long") // h < 2^30: exact in double
    val rho = when(w === 0, lit(HllRhoMax))
      .otherwise(lit(HllRhoMax) - length(bin(w)))
    df.select((groupCols.map(col) :+ pmod(h, lit(HllM.toLong)).as("reg")
      :+ rho.as("rho")): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("mr"))
  }

  /** Per-group cardinality estimate from [[hllRegisters]] output — the
    * original Flajolet et al. estimator with the small-range linear
    * counting correction.
    *
    * Hash-range bias correction: the Flajolet constants assume rho is
    * geometric over a power-of-two word, but the portable poly-hash is
    * uniform over [0, 1e9+7) — not [0, 2^30) — so every register's rho
    * is inflated by log2(2^30 / HashMod) bits on average, a systematic
    * ≈ +7.4% overestimate the 6.5% standard error does not cover (the
    * oracle replays the same arithmetic, so hash verification alone
    * cannot see it). `alphaM2` therefore carries the first-order
    * correction factor HashMod / 2^30 ≈ 0.9313; the residual bias from
    * the non-power-of-two range is second-order (≪ the standard error).
    *
    * Determinism (why this hash-matches a DuckDB replay despite double
    * arithmetic): every register term is an exact power of two ≥ 2^-23,
    * so each partial sum is a binary fraction needing ≤ 8+23 mantissa
    * bits < 53 — ALL additions are exact, and the harmonic sum is
    * order-independent. The only libm call (`ln`) sits on the small-range
    * branch and is rounded away at 4 decimals.
    */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val m = HllM.toDouble
    // trailing factor = HashMod / 2^30 (hash-range bias, see scaladoc);
    // operand order must match the oracle's expression exactly
    val alphaM2 = 0.7213 / (1.0 + 1.079 / m) * m * m *
      (1000000007.0 / 1073741824.0)
    val zeros = lit(HllM.toLong) - col("filled")
    val raw = lit(alphaM2) / (col("s") + zeros.cast("double"))
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("filled"),
        sum(lit(1.0) / pow(lit(2.0), col("mr"))).as("s"))
      .withColumn("est",
        round(when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m) * log(lit(m) / zeros.cast("double"))).otherwise(raw), 4))
      .select((groupCols.map(col) :+ col("filled") :+ col("est")): _*)
  }

  /** Sampled per-group quantiles: exact quantile-by-rank over a
    * DETERMINISTIC bottom-k hash sample of each group's rows — the
    * percentile answer at a scale where the exact forms (q43's
    * percentile aggregate, q82's ntile histogram) would sort the full
    * group. The sample is q102's KMV discipline applied per group: the
    * k rows with the smallest portable poly-hash of a salted id are a
    * uniform group sample on any engine, any partitioning, any day (no
    * rand()), so the approximate answer is still bit-replayable — and
    * the sample-quantile error is the classical |F(v̂) − q| ≲ 1/√k
    * (spec-measured), with groups at or under k rows answered EXACTLY
    * (the sample is the group).
    *
    * Per quantile q the reported value is the sample's
    * ceil(q·m)-th smallest (percentile-disc convention, m = sample
    * size; value ties broken by id so the picked ROW is well-defined on
    * every engine).
    *
    * Plan shape (the 100 TB grade): the per-group bottom-k rank
    * compiles to WindowGroupLimit — each map task forwards at most k
    * rows per group, so the ONE group-key exchange carries ≤ k·|groups|
    * narrow (group, val, hk, id) rows no matter the corpus size; the
    * value-rank window and the sample-size count reuse the same
    * partitioning (no further exchange), and the quantile list joins as
    * a broadcast literal.
    */
  def sampledQuantiles(df: DataFrame, groupCols: Seq[String],
                       valCol: Column, idCol: String,
                       k: Int, qs: Seq[Double]): DataFrame = {
    require(k >= 1, s"sampledQuantiles: k must be >= 1, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"sampledQuantiles: quantiles must lie in (0, 1], got $qs")
    // the select keeps only groupCols + idCol, so the collision surface
    // is those names against the operator's working/output columns
    for (c <- Seq("__hk", "__srank", "__vrank", "__m", "val", "q",
                  "value", "sample_n"))
      require(!groupCols.contains(c) && idCol != c,
        s"sampledQuantiles: column name '$c' is reserved by the operator")
    val g = groupCols.map(col)
    val keyed = df.select((g :+ col(idCol) :+ valCol.as("val")): _*)
      .withColumn("__hk",
        polyHash(concat(lit("qtile|"), col(idCol).cast("string"))))
    val sampleW = Window.partitionBy(g: _*)
      .orderBy(col("__hk").asc, col(idCol).asc)
    val sample = keyed
      .withColumn("__srank", row_number().over(sampleW))
      .filter(col("__srank") <= k) // int rank: a cast would block the
      // InferWindowGroupLimit rewrite (the q92 prototypes note)
    val valueW = Window.partitionBy(g: _*)
      .orderBy(col("val").asc, col(idCol).asc)
    val countW = Window.partitionBy(g: _*)
    val ranked = sample
      .withColumn("__vrank", row_number().over(valueW))
      .withColumn("__m", count(lit(1)).over(countW))
    val qFrame = broadcast(
      df.sparkSession.range(1).select(
        explode(array(qs.map(lit): _*)).as("q")))
    ranked.crossJoin(qFrame)
      .filter(col("__vrank") === ceil(col("q") * col("__m")).cast("int"))
      .select((g :+ col("q") :+ col("val").as("value") :+
        col("__m").cast("long").as("sample_n")): _*)
  }

  /** WEIGHTED per-group quantiles over a deterministic A-ES sample — the
    * weighted companion of [[sampledQuantiles]]: "the value under which
    * fraction q of the WEIGHT lives" (e.g. token-mass length percentiles,
    * where a long doc counts by its tokens, not once). Two q119 races
    * compose: the sample is Efraimidis–Spirakis without replacement
    * (key = −ln(u)/w, u a pure integer-hash function of the id, k
    * smallest keys win — inclusion ∝ weight, deterministic on any
    * engine), and the answer is the weighted empirical quantile over the
    * sample: the first value, in (value, id) order, whose running weight
    * reaches q·(total sample weight).
    *
    * Weights must be > 0 (the A-ES contract — checked fail-loud at
    * construction, the pageRankWeighted style: a silent w ≤ 0 would make
    * −ln(u)/w reorder or NaN the race). The check is one bounded scan per
    * call; composed pipelines that already validated the weight column can
    * pass `checkWeights = false` to skip it — the default stays fail-loud.
    *
    * Plan shape: the A-ES key is scan-local arithmetic; the per-group
    * sample cut compiles to WindowGroupLimit (≤ k rows per group per map
    * task into ONE group-key exchange); the running-weight window and
    * total reuse that partitioning; the quantile list joins as a
    * broadcast literal and the final per-(group, q) argmin is a
    * min(struct) aggregate over ≤ k·|qs| rows per group.
    */
  def weightedSampledQuantiles(df: DataFrame, groupCols: Seq[String],
                               valCol: Column, weightCol: Column,
                               idCol: String, k: Int,
                               qs: Seq[Double],
                               checkWeights: Boolean = true): DataFrame = {
    require(k >= 1, s"weightedSampledQuantiles: k must be >= 1, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"weightedSampledQuantiles: quantiles must lie in (0, 1], got $qs")
    for (c <- Seq("__u", "__key", "__srank", "__w", "__cum", "__tot",
                  "__pick", "val", "q", "value", "sample_w"))
      require(!groupCols.contains(c) && idCol != c,
        s"weightedSampledQuantiles: column name '$c' is reserved by the operator")
    val g = groupCols.map(col)
    val keyed = df.select((g :+ col(idCol) :+ valCol.as("val") :+
        weightCol.cast("long").as("__w")): _*)
    if (checkWeights) {
      val bad = keyed.filter(col("__w") <= 0).limit(1).collect()
      require(bad.isEmpty,
        s"weightedSampledQuantiles: contract weight > 0 violated at " +
          s"$idCol=${bad.headOption.map(_.get(groupCols.size)).orNull}")
    }
    // q119's deterministic-uniform: u in (0, 1] from the id's
    // multiplicative hash — the oracle replays the identical integers.
    // The id is reduced mod the prime BEFORE multiplying (floorMod), so
    // ids past ~3.47e9 (or negative) never wrap the long product — the
    // wrapped form admitted NULL keys first under the ascending sample
    // window while DuckDB raised an overflow error on the same input.
    val u = (pmod(col(idCol).cast("long"), lit(1000000007L))
      * lit(2654435761L) % lit(1000000007L) + 1).cast("double") / 1000000008d
    val sampleW = Window.partitionBy(g: _*)
      .orderBy(col("__key").asc, col(idCol).asc)
    val sample = keyed
      .withColumn("__key", -log(u) / col("__w").cast("double"))
      .withColumn("__srank", row_number().over(sampleW))
      .filter(col("__srank") <= k)
    val valueW = Window.partitionBy(g: _*)
      .orderBy(col("val").asc, col(idCol).asc)
    val groupW = Window.partitionBy(g: _*)
    val cum = sample
      .withColumn("__cum", sum(col("__w")).over(
        valueW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(groupW))
    val qFrame = broadcast(
      df.sparkSession.range(1).select(
        explode(array(qs.map(lit): _*)).as("q")))
    cum.crossJoin(qFrame)
      .filter(col("__cum").cast("double") >= col("q") * col("__tot").cast("double"))
      .groupBy((g :+ col("q")): _*)
      .agg(min(struct(col("val"), col(idCol), col("__tot"))).as("__pick"))
      .select((g :+ col("q") :+ col("__pick.val").as("value") :+
        col("__pick.__tot").cast("long").as("sample_w")): _*)
  }

  /** Fail-loud integral-type contract for the streaming twins: their O(k)
    * Aggregator state carries longs, so a non-integral value/id column
    * would silently truncate relative to the batch answer the twin is
    * documented to converge to bit-for-bit. The batch forms keep the
    * native type; the streaming forms therefore REQUIRE integral inputs.
    */
  private def requireIntegral(df: DataFrame, c: Column, what: String,
                              op: String): Unit = {
    val dt = df.select(c).schema.head.dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
        dt == LongType,
      s"$op: $what must be an integral type (byte/short/int/long) — its " +
        s"long-state Aggregator would silently truncate $dt; cast or " +
        s"round explicitly at the call site if that is intended")
  }

  /** Streaming [[weightedSampledQuantiles]]: the A-ES bottom-k race kept
    * as O(k) mergeable state per group (`functions.WeightedBottomKAgg` —
    * the k smallest keys of a union are the k smallest of the two
    * bottom-ks), run as a plain aggregate in complete/update mode. The
    * weighted running-sum selection walks the finished sample with an
    * `aggregate` HOF fold (a window after a streaming aggregation is
    * disallowed; the fold is the same arithmetic as a stateless
    * projection). The w > 0 contract is enforced per row with
    * `assert_true` — a stream cannot run the batch form's eager check.
    * Converges to the batch answer on the same rows (spec-pinned,
    * shuffled arrival).
    */
  def weightedSampledQuantilesStream(df: DataFrame, groupCols: Seq[String],
                                     valCol: Column, weightCol: Column,
                                     idCol: String, k: Int,
                                     qs: Seq[Double]): DataFrame = {
    require(k >= 1, s"weightedSampledQuantilesStream: k must be >= 1, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"weightedSampledQuantilesStream: quantiles must lie in (0, 1], got $qs")
    for (c <- Seq("__id", "__val", "__w", "__key", "__vals", "__qr", "__tot",
                  "q", "value", "sample_w"))
      require(!groupCols.contains(c) && idCol != c,
        s"weightedSampledQuantilesStream: column name '$c' is reserved by the operator")
    requireIntegral(df, valCol, "valCol", "weightedSampledQuantilesStream")
    requireIntegral(df, col(idCol), s"idCol '$idCol'",
      "weightedSampledQuantilesStream")
    val race = udaf(new graft.functions.WeightedBottomKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong))
    val g = groupCols.map(col)
    // id reduced mod the prime before multiplying — see the batch twin
    val u = (pmod(col("__id"), lit(1000000007L)) * lit(2654435761L)
      % lit(1000000007L) + 1).cast("double") / 1000000008d
    val agged = df
      .select((g :+ col(idCol).cast("long").as("__id") :+
        valCol.cast("long").as("__val") :+
        weightCol.cast("long").as("__w")): _*)
      // a filter anchor: an unused assert_true column would be pruned
      .filter(assert_true(col("__w") > 0,
        concat(lit("weightedSampledQuantilesStream: contract weight > 0 " +
          "violated at id "), col("__id"))).isNull)
      .withColumn("__key", -log(u) / col("__w").cast("double"))
      .groupBy(g: _*)
      .agg(race(col("__key"), col("__id"), col("__val"), col("__w"))
        .as("__vals"))
    val tot = aggregate(col("__vals"), lit(0L),
      (acc, x) => acc + x.getField("_2"))
    def pick(q: Double) = aggregate(col("__vals"),
      struct(lit(0L).as("cum"), lit(null).cast("long").as("ans")),
      (acc, x) => struct(
        (acc.getField("cum") + x.getField("_2")).as("cum"),
        coalesce(acc.getField("ans"),
          when((acc.getField("cum") + x.getField("_2")).cast("double")
            >= lit(q) * col("__tot").cast("double"), x.getField("_1")))
          .as("ans")),
      acc => acc.getField("ans"))
    agged
      .withColumn("__tot", tot)
      .select((g :+ explode(array(qs.map(q => struct(lit(q).as("q"),
        pick(q).as("value"))): _*)).as("__qr") :+
        col("__tot").cast("long").as("sample_w")): _*)
      .select((g :+ col("__qr.q").as("q") :+ col("__qr.value").as("value") :+
        col("sample_w")): _*)
  }

  /** Streaming [[sampledQuantiles]]: the same bottom-k hash sample kept
    * as O(k) MERGEABLE state per group (`functions.BottomKAgg` — bottom-k
    * of a union is the bottom-k of the two bottom-ks, so partial
    * aggregation and micro-batch accumulation both compose), run as a
    * plain aggregate in complete/update mode. The per-quantile rows come
    * from an explode over the finished sample (the batch form's
    * broadcast-literal join is a join-after-aggregation, which streaming
    * disallows — the explode is the same arithmetic as a stateless
    * projection). Converges to the batch answer on the same rows
    * (spec-pinned, shuffled arrival): identical (hash, id) admission and
    * identical (value, id) rank order.
    */
  def sampledQuantilesStream(df: DataFrame, groupCols: Seq[String],
                             valCol: Column, idCol: String,
                             k: Int, qs: Seq[Double]): DataFrame = {
    require(k >= 1, s"sampledQuantilesStream: k must be >= 1, got $k")
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      s"sampledQuantilesStream: quantiles must lie in (0, 1], got $qs")
    for (c <- Seq("__id", "__val", "__hk", "__vals", "__qr",
                  "q", "value", "sample_n"))
      require(!groupCols.contains(c) && idCol != c,
        s"sampledQuantilesStream: column name '$c' is reserved by the operator")
    requireIntegral(df, valCol, "valCol", "sampledQuantilesStream")
    requireIntegral(df, col(idCol), s"idCol '$idCol'", "sampledQuantilesStream")
    val bottomK = udaf(new graft.functions.BottomKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
    val g = groupCols.map(col)
    val agged = df
      .select((g :+ col(idCol).cast("long").as("__id") :+
        valCol.cast("long").as("__val")): _*)
      .withColumn("__hk",
        polyHash(concat(lit("qtile|"), col("__id").cast("string"))))
      .groupBy(g: _*)
      .agg(bottomK(col("__hk"), col("__id"), col("__val")).as("__vals"))
    val m = size(col("__vals"))
    agged
      .select((g :+ m.cast("long").as("sample_n") :+
        explode(array(qs.map(q => struct(lit(q).as("q"),
          element_at(col("__vals"),
            ceil(lit(q) * m).cast("int")).as("value"))): _*)).as("__qr")): _*)
      .select((g :+ col("__qr.q").as("q") :+ col("__qr.value").as("value") :+
        col("sample_n")): _*)
  }
}
