package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared skew engine behind every salted self-pairing operator
  * (q85 MinHash buckets, q151 semantic-dedup clusters, q152 banded
  * hyperplane buckets, q153 top-k buckets): every unordered pair of
  * distinct rows sharing a key, EXACTLY ONCE PER SHARED KEY, with
  * per-task pair work bounded by a ceiling for keys of ANY occupancy.
  *
  * Construction (the q85 triangular cell decomposition): one cheap pass
  * counts key occupancy (map-side-combined — only key columns ride that
  * exchange); keys under `hotThreshold` take the plain self-join with the
  * `id_1 < id_2` cut. A hot key of m rows splits into
  * ns = min(⌈m/hotThreshold⌉, maxSaltBuckets) salt groups by portable id
  * hash, and the join runs per CELL of the upper-triangular ns×ns grid: a
  * row with salt s serves cells (s, j≥s) on one side and (i≤s, s) on the
  * other, so a cross-salt pair (salts a < b) meets ONLY in cell (a, b) —
  * the reverse orientation (b, a) matches no cell — and same-salt cells
  * (a, a) carry both orders, cut to one by the id comparison. Each task
  * then holds one (key, cell): ≤ ~hotThreshold rows per side, ≤
  * ~hotThreshold² pair work, at the cost of replicating hot rows ns+1
  * ways (aSide ns−s copies + bSide s+1 copies). Exactly-once is what
  * lets ONE engine serve both the threshold operators (which could absorb
  * duplicates in a terminal dedup) and the top-k ones (which could NOT —
  * a duplicate pair row would displace a real pair inside the limit).
  *
  * Payloads ride the replicated cell exchange deliberately — the q147
  * measured decision: scoring must stream through the join; generating
  * id-only pairs and re-attaching payloads materializes the pair fan-out
  * through an exchange plus sorts, which is the side that actually blows
  * up. Callers that want key-only shuffles project before calling.
  *
  * The hot-key list broadcasts at O(total_rows / hotThreshold) entries —
  * bounded by the same ceiling that bounds task size.
  */
private[graft] object SaltedCells {

  /** Every unordered pair of distinct rows of `df` sharing `keyCols`,
    * exactly once per shared key, as suffixed columns: each non-key
    * column `c` appears as `c_1` and `c_2`, oriented so `idCol_1` <
    * `idCol_2`. Key columns are dropped from the output (a pair sharing
    * several keys — e.g. colliding in several LSH bands — appears once
    * per shared key; multi-key dedup stays the caller's contract, as it
    * is for the plain self-joins this replaces).
    *
    * `idCol` must be a key-unique, totally ordered column (the same
    * contract the plain `d1 < d2` self-joins already assume).
    */
  def pairs(df: DataFrame, keyCols: Seq[String], idCol: String,
            hotThreshold: Int, maxSaltBuckets: Int = 256): DataFrame = {
    require(hotThreshold >= 1 && maxSaltBuckets >= 1,
      s"SaltedCells.pairs: ceilings must be >= 1, got " +
        s"hotThreshold=$hotThreshold maxSaltBuckets=$maxSaltBuckets")
    require(keyCols.nonEmpty && keyCols.forall(df.columns.contains) &&
      df.columns.contains(idCol) && !keyCols.contains(idCol),
      s"SaltedCells.pairs: keyCols $keyCols and idCol '$idCol' must name " +
        s"distinct input columns of ${df.columns.toSeq}")
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    for (c <- Seq("__cnt", "__ns", "__salt", "__ci", "__cj") ++
         payload.flatMap(c => Seq(s"${c}_1", s"${c}_2")))
      require(!df.columns.contains(c),
        s"SaltedCells.pairs: column name '$c' is reserved by the operator")
    val keys = keyCols.map(col)
    val hot = df.groupBy(keys: _*)
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= hotThreshold)
    val tagged = df.join(broadcast(hot), keyCols, "left_outer")

    def side(d: DataFrame, extra: Seq[String], suffix: String) =
      d.select((keyCols ++ extra).map(col) ++
        payload.map(c => col(c).as(s"${c}_$suffix")): _*)

    val cold = tagged.filter(col("__cnt").isNull)
    val coldPairs = side(cold, Nil, "1")
      .join(side(cold, Nil, "2"), keyCols)
      .filter(col(s"${idCol}_1") < col(s"${idCol}_2"))
      .select(payload.flatMap(c => Seq(col(s"${c}_1"), col(s"${c}_2"))): _*)

    val hotKeyed = tagged.filter(col("__cnt").isNotNull)
      .withColumn("__ns", least(
        ceil(col("__cnt") / lit(hotThreshold.toDouble)),
        lit(maxSaltBuckets.toLong)).cast("int"))
      .withColumn("__salt", pmod(xxhash64(col(idCol)), col("__ns")).cast("int"))
    val aSide = side(hotKeyed
        .withColumn("__cj", explode(sequence(col("__salt"), col("__ns") - 1)))
        .withColumn("__ci", col("__salt")),
      Seq("__ci", "__cj"), "1")
    val bSide = side(hotKeyed
        .withColumn("__ci", explode(sequence(lit(0), col("__salt"))))
        .withColumn("__cj", col("__salt")),
      Seq("__ci", "__cj"), "2")
    val lt = col(s"${idCol}_1") < col(s"${idCol}_2")
    val hotPairs = aSide.join(bSide, keyCols ++ Seq("__ci", "__cj"))
      .filter((col("__ci") =!= col("__cj")) || lt)
      // cross-salt pairs arrive in arbitrary orientation: swap payload
      // column-pairs (not rows) so every pair leaves as id_1 < id_2
      .select(payload.flatMap(c => Seq(
        when(lt, col(s"${c}_1")).otherwise(col(s"${c}_2")).as(s"${c}_1"),
        when(lt, col(s"${c}_2")).otherwise(col(s"${c}_1")).as(s"${c}_2"))): _*)

    coldPairs.unionAll(hotPairs)
  }
}
