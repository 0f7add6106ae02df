package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.functions.TextFunctions
import graft.operators.Similarity

/** Native expressions must be bit-identical to their HOF reference
  * formulations (which in turn are what the DuckDB oracles replicate).
  */
class NativeExprsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, TestSession.sf, "documents")
  lazy val emb = Tables.load(spark, TestSession.sf, "embeddings")

  test("shingle_hashes native == HOF on the corpus + edge cases") {
    val edge = Seq((9001L, ""), (9002L, "a b"), (9003L, "  x   y  z  "),
      (9004L, "中文 分词 测试 句子")).toDF("doc_id", "text")
    val all = docs.select($"doc_id", $"text").unionByName(edge)
    val diff = all.select(
      TextFunctions.shingleHashes($"text", 3).as("native"),
      TextFunctions.shingleHashesHof($"text", 3).as("hof"))
      .filter(not($"native" <=> $"hof"))
    assert(diff.count() == 0)
  }

  test("char_gram_hashes native == substring-window reference incl. unicode + shorter-than-g") {
    val g = 7
    val edge = Seq((9001L, ""), (9002L, "short"), (9003L, "exactly"),
      (9004L, "中文分词测试句子标点符号"), (9005L, "aaaaaaaaaaaa"),
      (9006L, "abcdef")).toDF("doc_id", "text")
    val all = docs.select($"doc_id", $"text").unionByName(edge)
    // reference: distinct poly-hash of every codepoint window, first
    // occurrence first (array_distinct order == the native's LinkedHashSet)
    val ref = when(length($"text") >= g,
      array_distinct(transform(sequence(lit(1), length($"text") - (g - 1)),
        i => TextFunctions.polyHash($"text".substr(i, lit(g))))))
      .otherwise(array().cast("array<long>"))
    val diff = all.select(
      call_function("char_gram_hashes", $"text", lit(g)).as("native"),
      ref.as("hof")).filter(not($"native" <=> $"hof"))
    assert(diff.count() == 0)
    // the prefix contract the canary prefilter relies on: the hash of a
    // phrase's g-prefix is a member of any containing text's gram set
    val got = Seq(("xx PLANTED-PHRASE yy", "PLANTED-PHRASE"))
      .toDF("text", "phrase")
      .select(array_contains(
        call_function("char_gram_hashes", $"text", lit(g)),
        TextFunctions.polyHash($"phrase".substr(lit(1), lit(g)))).as("hit"))
      .as[Boolean].head()
    assert(got)
  }

  test("minhash_sig native == HOF including empty-set sentinel") {
    val diff = docs.select(TextFunctions.shingleHashes($"text", 3).as("hs"))
      .select(
        TextFunctions.minhash($"hs", 16).as("native"),
        TextFunctions.minhashHof($"hs", 16).as("hof"))
      .filter(not($"native" <=> $"hof"))
    assert(diff.count() == 0)
    val empty = Seq(Seq.empty[Long]).toDF("hs")
      .select(TextFunctions.minhash($"hs", 4).as("sig"))
      .as[Seq[Long]].head()
    assert(empty == Seq.fill(4)(TextFunctions.HashMod))
  }

  test("winnow_fps native == HOF on the corpus + edge cases (order included)") {
    // edge cases: empty, fewer shingles than the window, exactly one
    // window, ties (equal hashes from repeated tokens), non-ASCII
    val edge = Seq((9001L, ""), (9002L, "a b c"), (9003L, "a b c d e f"),
      (9004L, "x x x x x x x x"), (9005L, "中文 分词 测试 句子 中文 分词 测试 句子"))
      .toDF("doc_id", "text")
    val all = docs.select($"doc_id", $"text").unionByName(edge)
    val diff = all.select(
      TextFunctions.winnowFps($"text", 3, 4).as("native"),
      TextFunctions.winnowFpsHof($"text", 3, 4).as("hof"))
      .filter(not($"native" <=> $"hof"))
    assert(diff.count() == 0)
  }

  test("simhash_of native == HOF incl. distinct-token path") {
    val diff = docs.select(
      TextFunctions.simhash(TextFunctions.shingleHashes($"text", 1), 24).as("native"),
      TextFunctions.simhashHof(
        array_distinct(TextFunctions.hashAll(TextFunctions.tokens($"text"))), 24).as("hof"))
      .filter(not($"native" <=> $"hof"))
    assert(diff.count() == 0)
  }

  test("vec_dot native == HOF fold (order-sensitive double sum)") {
    val v = emb.select(Similarity.asDouble($"embedding").as("v")).limit(100)
    val pairs = v.crossJoin(v.select($"v".as("w")).limit(7))
    val diff = pairs.select(
      Similarity.dot($"v", $"w").as("native"),
      Similarity.dotHof($"v", $"w").as("hof"))
      .filter($"native" =!= $"hof") // exact equality: same fold order
    assert(diff.count() == 0)
  }

  test("vec_dot mismatched lengths -> NULL, agreeing with the HOF path") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)),     // mismatch -> null
      (Seq(1.0, 2.0), Seq(3.0, 4.0))           // match -> 11.0
    ).toDF("a", "b")
    val got = df.select(
      Similarity.dot($"a", $"b").as("native"),
      Similarity.dotHof($"a", $"b").as("hof"))
    val rows = got.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1))
    assert(rows(1).getDouble(0) == 11.0 && rows(1).getDouble(1) == 11.0)
  }

  test("lsh_bucket native == HOF over the corpus; buckets non-degenerate") {
    val v = emb.select(Similarity.asDouble($"embedding").as("v"))
    val diff = v.select(
      Similarity.lshBucket($"v", 4, 64).as("native"),
      Similarity.lshBucketHof($"v", 4, 64).as("hof"))
      .filter(not($"native" <=> $"hof"))
    assert(diff.count() == 0)
    // sanity: hyperplanes split the corpus into more than one bucket
    val nb = v.select(Similarity.lshBucket($"v", 4, 64).as("b"))
      .distinct().count()
    assert(nb > 1)
  }

  test("lsh_bucket_from: offset 0 == lsh_bucket; offset bits align with the flat schedule") {
    val v = emb.select(Similarity.asDouble($"embedding").as("v"))
    // seed 0 is bit-identical to the 3-arg form
    val z = v.select(
      Similarity.lshBucket($"v", 8, 64).as("plain"),
      Similarity.lshBucketFrom($"v", 8, 64, 0).as("seeded"))
      .filter(not($"plain" <=> $"seeded"))
    assert(z.count() == 0)
    // planes [16, 24) via offset == bits 16..23 of one wide 24-plane call:
    // the flat coefficient schedule is oblivious to chunk boundaries
    val a = v.select(
      Similarity.lshBucketFrom($"v", 8, 64, 16).as("chunk"),
      (shiftright(Similarity.lshBucket($"v", 24, 64), 16)
        .bitwiseAND(lit(0xFFL))).as("wide"))
      .filter(not($"chunk" <=> $"wide"))
    assert(a.count() == 0)
  }

  test("sorted_inter_count == size(array_intersect) on sorted distinct long arrays") {
    // deterministic pseudo-random sorted-distinct pairs incl. empty,
    // disjoint, identical, and subset cases — the adjacency-list contract
    val rows = (0 until 200).map { i =>
      def arr(seed: Long, n: Int) =
        (0 until n).map(j => ((seed * 31 + j * 2654435761L) % 97)).distinct.sorted.toArray
      (arr(i, i % 13), arr(i * 7 + 3, (i * 5) % 17))
    } ++ Seq(
      (Array.empty[Long], Array(1L, 2L)),
      (Array(1L, 2L, 3L), Array.empty[Long]),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array(1L, 5L), Array(2L, 6L)))
    val df = rows.toDF("a", "b")
    val diff = df.select(
      call_function("sorted_inter_count", $"a", $"b").as("native"),
      size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .filter(not($"native" <=> $"ref"))
    assert(diff.count() == 0)
  }
}
