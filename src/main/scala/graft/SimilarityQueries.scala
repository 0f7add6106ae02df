package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Similarity

/** Similarity search over the 64-dim `embeddings` table: brute-force cosine
  * kNN (baseline), global most-similar pairs, and the LSH-bucketed ANN scale
  * path. Oracles fold dot products in identical index order (strict left
  * fold, double), so cosines match bit-for-bit.
  */
object SimilarityQueries {
  import Queries.Q

  private def t(s: org.apache.spark.sql.SparkSession, dir: String) = Tables.Tpch(s, dir)

  val DIMS = 64
  val PLANES = 4

  val q31_knn: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    Similarity.knn(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 5)
      .select(col("query_id"), col("neighbor_id"), col("cos"),
        col("rank").cast("long").as("rank"))
  }

  val q32_top_pairs: Q = (s, dir) =>
    Similarity.topPairs(t(s, dir).embeddings, "vec_id", "embedding", 100)

  val q33_lsh_ann: Q = (s, dir) =>
    Similarity.lshTopPairs(t(s, dir).embeddings, "vec_id", "embedding", PLANES, DIMS, 50)

  /** IVF ANN (no SQL oracle — k-means is not SQL-expressible; the driver
    * records the rows-only check, and IvfSpec pins recall + exactness
    * against the brute-force baseline).
    */
  val q61_ivf_ann: Q = (s, dir) => {
    val emb = t(s, dir).embeddings
    val cents = graft.operators.Ivf.train(emb, "vec_id", "embedding",
      k = 8, dims = DIMS, iters = 2)
    val corpus = graft.operators.Ivf.assign(emb, "embedding", cents, DIMS)
    graft.operators.Ivf.knn(s, corpus, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", cents, DIMS, nprobe = 2, kNeighbors = 5)
  }

  /** Embedding-cosine near-dup pairs at threshold 0.35. The synthetic
    * embeddings carry no true duplicates (max same-bucket cosine ≈ 0.48),
    * so the low threshold exercises the operator shape; a production
    * near-dup pass runs the same plan at ~0.95.
    */
  val q64_embedding_neardup: Q = (s, dir) =>
    Similarity.lshNearDupPairs(t(s, dir).embeddings, "vec_id", "embedding",
      PLANES, DIMS, 0.35)

  def all: Map[String, Q] = Map(
    "q31_knn" -> q31_knn,
    "q32_top_pairs" -> q32_top_pairs,
    "q33_lsh_ann" -> q33_lsh_ann,
    "q61_ivf_ann" -> q61_ivf_ann,
    "q64_embedding_neardup" -> q64_embedding_neardup)

  // ——— oracle SQL helpers (DuckDB) ———
  private def foldSum(terms: String) =
    s"list_reduce(list_prepend(0.0, $terms), (x, y) -> x + y)"
  private def dotSql(a: String, b: String) =
    foldSum(s"list_transform(range($DIMS), i -> $a[i+1] * $b[i+1])")
  private def cosSql(a: String, b: String) =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  private val vCte =
    "v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)"

  def oracles: Map[String, String] = Map(
    "q31_knn" ->
      s"""WITH $vCte,
         |s AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         ${cosSql("q.v", "c.v")} AS cos
         |  FROM v q JOIN v c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, neighbor_id, cos, rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
         |WHERE rank <= 5""".stripMargin,
    "q32_top_pairs" ->
      s"""WITH $vCte
         |SELECT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM v a JOIN v b ON a.vec_id < b.vec_id
         |ORDER BY cos DESC, d1 ASC, d2 ASC LIMIT 100""".stripMargin,
    "q33_lsh_ann" ->
      s"""WITH $vCte,
         |pr AS (
         |  SELECT vec_id, j,
         |    ${foldSum(s"""list_transform(range($DIMS), d ->
         |      v[d+1] * (((((j*$DIMS + d + 1) * 2654435761) % 1000000007) % 2001 - 1000) / 1000.0))""")} AS proj
         |  FROM v, (SELECT unnest(range($PLANES)) AS j)),
         |bk AS (
         |  SELECT vec_id,
         |    sum(CASE WHEN proj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
         |  FROM pr GROUP BY vec_id),
         |vb AS (SELECT v.vec_id, v.v, bk.bucket FROM v JOIN bk ON v.vec_id = bk.vec_id)
         |SELECT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |ORDER BY cos DESC, d1 ASC, d2 ASC LIMIT 50""".stripMargin,
    "q64_embedding_neardup" ->
      s"""WITH $vCte,
         |pr AS (
         |  SELECT vec_id, j,
         |    ${foldSum(s"""list_transform(range($DIMS), d ->
         |      v[d+1] * (((((j*$DIMS + d + 1) * 2654435761) % 1000000007) % 2001 - 1000) / 1000.0))""")} AS proj
         |  FROM v, (SELECT unnest(range($PLANES)) AS j)),
         |bk AS (
         |  SELECT vec_id,
         |    sum(CASE WHEN proj >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS bucket
         |  FROM pr GROUP BY vec_id),
         |vb AS (SELECT v.vec_id, v.v, bk.bucket FROM v JOIN bk ON v.vec_id = bk.vec_id)
         |SELECT a.vec_id AS d1, b.vec_id AS d2, ${cosSql("a.v", "b.v")} AS cos
         |FROM vb a JOIN vb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= 0.35""".stripMargin)
}
