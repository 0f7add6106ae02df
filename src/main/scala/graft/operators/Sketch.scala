package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
