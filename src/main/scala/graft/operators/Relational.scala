package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Reusable relational operators distilled from SURVEY.md §2.
  *
  * Each is a pure `DataFrame => DataFrame` transform built from declarative
  * Spark primitives so Catalyst keeps full pushdown/pruning/codegen freedom.
  * Scale notes are on each method: these run on 100 TB inputs, so nothing
  * here collects to the driver or forces a single partition.
  */
object Relational {

  /** Last-row-wins dedup by unique key (SURVEY §2.7 D1; reference keeps
    * max-`row_op_ts` row per order_detail_id via keyed state + timer,
    * …/app/dws/DwsTradeOrderWindow.java:122-164).
    *
    * Batch form: `row_number() = 1` over (key, order desc). One shuffle on
    * `keys`; at scale prefer pre-bucketed storage on the same keys to make
    * this shuffle-free. `tieBreakers` must make the ordering total or the
    * result is nondeterministic under retries.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderBy.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Top-k rows per group by a total ordering (SURVEY §2.7 — absent in the
    * reference, provided because Catalyst gives it nearly free). Spark
    * rewrites rank-filter windows into a per-partition top-k (WindowGroupLimit)
    * so only k rows per group survive the shuffle.
    */
  def topKPerGroup(df: DataFrame, partitionCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Gap-based sessionization (SURVEY §2.9 T6's session notion, batch form).
    * A new session starts when the gap to the previous event of the same key
    * exceeds `gapSeconds`. Event order must be total — pass an id column.
    * One shuffle on `keyCol`; both window functions share the same
    * partitioning so Catalyst plans a single exchange + sort.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(idCol))
    // compare at whole-second resolution: parity with engines that floor
    // sub-second precision differently (events.ts is ns; Spark keeps micros)
    val sec = col(tsCol).cast("long")
    val prevSec = lag(sec, 1).over(w)
    val newSession = when(prevSec.isNull || sec - prevSec > gapSeconds, 1).otherwise(0)
    df.withColumn("__new_session", newSession)
      .withColumn("session_id", sum(col("__new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new_session")
  }

  /** As-of join (SURVEY §2.5 lists it absent from reference and Spark):
    * for each left row, the single right row with the greatest
    * `rightTs <= leftTs` per key.
    *
    * Implemented as union + last-observation-carried-forward window rather
    * than the naive `join(rightTs <= leftTs)` + rank: the naive form blows
    * up to O(|matches|) pairs before ranking; this shape is ONE shuffle on
    * (key) and O(n log n) sort, no intermediate blowup — the scalable plan
    * at 100 TB. Right rows must be unique per (key, rightTs) — pre-dedup
    * with `latestByKey` if not. At equal timestamps the right row is
    * visible to the left row (<= semantics, DuckDB ASOF-compatible).
    *
    * `carried`: right columns to attach (null when no prior right row).
    * All carried values come from the SAME as-of right row: they travel as
    * one struct through a single LOCF `last(ignoreNulls)` — per-column
    * fills would let a legitimately-NULL carried value fall through to an
    * OLDER right row, mixing rows in the output (DuckDB-ASOF-incompatible).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, carried: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(keys.forall(right.columns.contains),
      s"asOfJoin: keys ${keys.mkString(",")} must exist in right under the same names")
    require(carried.forall(!leftCols.contains(_)),
      "asOfJoin: carried right columns must not collide with left column names")
    val payloadType = StructType(carried.map(c => StructField(c, right.schema(c).dataType)))
    // the payload struct is NULL (not a struct of nulls) on left rows, so
    // ignoreNulls skips exactly the non-right rows
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) ++
        Seq(lit(null).cast(payloadType).as("__p"), col("__ts"), col("__side"))): _*)
    // key columns must carry the SAME names on both sides; non-key left
    // columns are null-padded on right rows
    val rKeyed = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(carried.map(col): _*).cast(payloadType).as("__p"),
          col("__ts"), col("__side"))): _*)
    val unioned = lTagged.unionByName(rKeyed)
    // right (side 0) sorts before left (side 1) at equal ts -> <= semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ carried.map(c => col(s"__f.$c").as(c)): _*)
  }

  /** Skew-breaking salted equi-join (SURVEY §2 "Optimize for scale").
    *
    * A hot key on the probe side overloads one shuffle partition; salting
    * spreads it: the big side gets a per-row salt in [0, buckets), the
    * small side is exploded `buckets`× (one copy per salt), and the join
    * runs on (key, salt). Result set provably equals the plain join (spec);
    * cost trades `buckets`× duplication of the SMALL side for even
    * distribution of the BIG side. AQE's skew-join split handles moderate
    * skew automatically; salting is for the pathological keys AQE can't
    * split (single-key hot spots inside one task).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, buckets: Int,
                 joinType: String = "inner"): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets.toLong - 1))))
    salted.join(exploded,
      salted(bigKey) === exploded(smallKey) && salted("__salt") === exploded("__salt"),
      joinType)
      .drop("__salt")
  }

  /** Working column names [[bandedIntervalJoin]] claims on both sides. */
  private val BandReserved = Seq("__band", "__salt", "__graft_bus")

  /** Banded (bucketed) interval join — the KEYLESS time-range scale path.
    * All (l, r) pairs with `lowerUs ≤ rightTs − leftTs ≤ upperUs` in
    * microseconds, as an EQUI-join: without a key conjunct, a plain range
    * predicate forces Spark into a nested-loop/cartesian plan — O(|L|·|R|)
    * at any scale. Banding makes it shuffle-partitionable: with band
    * width w = upper − lower, every qualifying right timestamp lies in
    * exactly the band of leftTs+lower or the one after it, so the left
    * side emits TWO (band, row) keys, the right side one, and an
    * equi-join on the band + the exact residual filter reproduces the
    * range join exactly (spec-pinned against the naive form). Shuffle
    * carries 2|L| + |R| narrow-keyed rows; per-band row count is the
    * stream's rate × w — the knob that bounds task size. A band hotter
    * than a task fits needs the salted form: [[bandedIntervalJoinAuto]]
    * measures occupancy once and engages it.
    *
    * Integer-exact: all arithmetic on `unix_micros` longs (epoch-positive
    * timestamps by contract — SQL `div` truncates toward zero, which
    * equals floor only for non-negative operands; the one `expr` runs
    * over the engine's own working column, so caller column names never
    * reach SQL text unquoted). Column names must be disjoint across the
    * two sides (same contract as [[asOfJoin]]) and may not include the
    * reserved working names (`__band`, `__salt`, `__graft_bus`).
    * Returns left.* ++ right.* for qualifying pairs (inner).
    */
  def bandedIntervalJoin(left: DataFrame, right: DataFrame,
                         leftTsCol: String, rightTsCol: String,
                         lowerUs: Long, upperUs: Long): DataFrame =
    bandedJoin(left, right, leftTsCol, rightTsCol, lowerUs, upperUs,
      saltBuckets = 1, saltLeft = false)

  /** [[bandedIntervalJoin]] with the hot-band fallback EXECUTABLE — the
    * q80 `keysCeiling` / Ed-Join `shortsCeiling` discipline: measure once
    * at construction, degrade deliberately instead of letting one giant
    * band partition straggle or OOM a task. One construction-time job
    * counts per-band occupancy of BOTH sides (a narrow ts-column scan);
    * if the hottest band fits `bandRowsCeiling` the plan is exactly
    * [[bandedIntervalJoin]]'s, otherwise the HOTTER side's rows are
    * salted across ⌈hottest / ceiling⌉ buckets (≤ `maxSaltBuckets`) and
    * the other side's band keys replicate buckets× — the [[saltedJoin]]
    * trade applied to the band key, same output (RelationalSpec pins a
    * bursty fixture with the fallback engaged against the plain form).
    *
    * When BOTH sides run hot in the same band, salting the hotter side
    * still leaves each task holding the cooler side's full band — that
    * residual is the problem's irreducible pair volume (output rows ~
    * |L_band|·|R_band|), not a partitioning artifact.
    *
    * EAGER: the occupancy measurement runs when this method returns (the
    * q80 eager-construction caveat) and snapshots the inputs as of now —
    * construct it once, at execution time, not in plan-only paths.
    */
  def bandedIntervalJoinAuto(left: DataFrame, right: DataFrame,
                             leftTsCol: String, rightTsCol: String,
                             lowerUs: Long, upperUs: Long,
                             bandRowsCeiling: Long = 1L << 20,
                             maxSaltBuckets: Int = 256): DataFrame = {
    require(bandRowsCeiling >= 1 && maxSaltBuckets >= 1,
      s"bandedIntervalJoinAuto: ceilings must be >= 1, got " +
        s"bandRowsCeiling=$bandRowsCeiling maxSaltBuckets=$maxSaltBuckets")
    checkBandArgs(left, right, lowerUs, upperUs)
    val w = math.max(1L, upperUs - lowerUs)
    // one job: both sides' band occupancy in a single union-aggregate
    // (narrow: one long key + one tag per row)
    val occ = bandOf(left, leftTsCol, lowerUs, w).select(col("__band"),
        lit(0).as("__side"))
      .unionAll(bandOf(right, rightTsCol, 0L, w).select(col("__band"),
        lit(1).as("__side")))
      .groupBy(col("__side"), col("__band")).count()
      .groupBy(col("__side")).agg(max(col("count")).as("mx"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (maxL, maxR) = (occ.getOrElse(0, 0L), occ.getOrElse(1, 0L))
    val hottest = math.max(maxL, maxR)
    if (hottest <= bandRowsCeiling)
      bandedJoin(left, right, leftTsCol, rightTsCol, lowerUs, upperUs, 1, saltLeft = false)
    else {
      val buckets = math.min(maxSaltBuckets.toLong,
        (hottest + bandRowsCeiling - 1) / bandRowsCeiling).toInt
      bandedJoin(left, right, leftTsCol, rightTsCol, lowerUs, upperUs,
        buckets, saltLeft = maxL >= maxR)
    }
  }

  private def checkBandArgs(left: DataFrame, right: DataFrame,
                            lowerUs: Long, upperUs: Long): Unit = {
    require(upperUs >= lowerUs,
      s"bandedIntervalJoin: need upperUs >= lowerUs, got [$lowerUs, $upperUs]")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "bandedIntervalJoin: column names must be disjoint across sides")
    for (c <- BandReserved; side <- Seq(left, right))
      require(!side.columns.contains(c),
        s"bandedIntervalJoin: column name '$c' is reserved by the operator")
  }

  /** (input.* , __band) — the shifted microsecond band index of `tsCol`.
    * The `div` runs over the engine's own `__graft_bus` column (exact
    * long floor-division for the contract's non-negative operands); the
    * caller's column resolves through `col(...)`, never SQL splicing.
    */
  private def bandOf(df: DataFrame, tsCol: String, shiftUs: Long,
                     w: Long): DataFrame =
    df.withColumn("__graft_bus", unix_micros(col(tsCol)) + lit(shiftUs))
      .withColumn("__band", expr(s"__graft_bus div ${w}L"))
      .drop("__graft_bus")

  private def bandedJoin(left: DataFrame, right: DataFrame,
                         leftTsCol: String, rightTsCol: String,
                         lowerUs: Long, upperUs: Long,
                         saltBuckets: Int, saltLeft: Boolean): DataFrame = {
    checkBandArgs(left, right, lowerUs, upperUs)
    val w = math.max(1L, upperUs - lowerUs)
    val l = bandOf(left, leftTsCol, lowerUs, w)
      .withColumn("__band", explode(array(col("__band"), col("__band") + 1)))
    val r = bandOf(right, rightTsCol, 0L, w)
    val joined =
      if (saltBuckets <= 1) l.join(r, Seq("__band"))
      else {
        // the salted side's rows split across buckets; the other side's
        // band rows replicate buckets× (the saltedJoin trade on the band
        // key) — join on (band, salt) keeps the result set identical
        val range = sequence(lit(0L), lit(saltBuckets - 1L))
        val salt = pmod(monotonically_increasing_id(), lit(saltBuckets.toLong))
        val (ls, rs) =
          if (saltLeft) (l.withColumn("__salt", salt),
            r.withColumn("__salt", explode(range)))
          else (l.withColumn("__salt", explode(range)),
            r.withColumn("__salt", salt))
        ls.join(rs, Seq("__band", "__salt"))
      }
    val lag = unix_micros(col(rightTsCol)) - unix_micros(col(leftTsCol))
    joined.filter(lag >= lowerUs && lag <= upperUs)
      .drop("__band", "__salt")
  }

  /** Status-transition detection (SURVEY §2.3 P7: `old['order_status'] is not
    * null and order_status='1003'` — here generalized to (prev, next) pairs
    * via `lag` since the batch tables carry no CDC `old` map).
    */
  def transitions(df: DataFrame, keyCol: String, orderCol: String, stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    df.withColumn("prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("prev_state").isNotNull)
  }

  /** Slowly-changing-dimension type 2: collapse a per-key change log into
    * versioned validity intervals. A new version opens only when `attrCol`
    * actually CHANGES (consecutive duplicates fold into the open version —
    * the change-detection half of SCD2 that a raw snapshot diff misses);
    * `valid_to` is the next version's `valid_from`, NULL on the current row.
    *
    * Scale shape: two windows over the same (key × order) partitioning —
    * one exchange + one sort, reused by both (the change filter shrinks
    * rows between them but keeps the partitioning, so no second shuffle).
    * The order column must be a total order per key (pass a tie-breaking
    * struct when the business timestamp can collide).
    *
    * Returns the input keys plus (attr, valid_from, valid_to, version,
    * is_current) with version numbered from 1 per key.
    */
  def scd2(df: DataFrame, keyCol: String, orderCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
    val changes = df
      .withColumn("prev_attr", lag(col(attrCol), 1).over(w))
      .filter(col("prev_attr").isNull || col("prev_attr") =!= col(attrCol))
    changes
      .withColumn("valid_to", lead(col(orderCol), 1).over(w))
      .select(col(keyCol), col(attrCol).as("attr"),
        col(orderCol).as("valid_from"), col("valid_to"),
        row_number().over(w).cast("long").as("version"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Point-in-time (temporal) dimension join: each fact row picks the
    * [[scd2]] version whose validity interval CONTAINS the fact
    * timestamp — valid_from ≤ factTs < valid_to, NULL valid_to = open.
    * "What was this dimension worth at order time" — the query SCD2
    * histories exist to answer. Composition of [[asOfJoin]] (latest
    * valid_from ≤ ts per key — for a well-formed tiling history the
    * as-of version IS the containing one) plus the valid_to guard, which
    * bites exactly when a key's history has gaps (retired keys with a
    * closed last version): facts falling in a gap, before the first
    * version, or on unknown keys carry NULL payloads (left semantics).
    * `factTs` and `validFrom`/`validTo` must be mutually comparable
    * (same numeric/timestamp type); carried column names must not
    * collide with fact columns (the [[asOfJoin]] contract).
    */
  def temporalJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                   factTs: String, validFrom: String, validTo: String,
                   carried: Seq[String]): DataFrame = {
    val joined = asOfJoin(facts, dim, keys, factTs, validFrom, carried :+ validTo)
    val contained = col(validTo).isNull || col(factTs) < col(validTo)
    carried.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(contained, col(c)))
    }.drop(validTo)
  }
}
