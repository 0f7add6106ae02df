package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Relational}
import graft.plans.PolyHash
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants over generated inputs (raw ScalaCheck Gen —
  * the scalatest bridge artifact is not in the offline cache, so cases are
  * drawn explicitly with a fixed seed for reproducibility).
  */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("PolyHash.hash in [0, Mod) and equals the definitional fold (100 random ASCII strings)") {
    val asciiText = Gen.listOf(Gen.frequency(
      (9, Gen.alphaNumChar), (3, Gen.const(' ')), (1, Gen.oneOf('_', '-', '.'))))
      .map(_.mkString)
    cases(asciiText, 100).foreach { s =>
      val h = PolyHash.hash(UTF8String.fromString(s))
      assert(h >= 0 && h < PolyHash.Mod)
      val expected = s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % PolyHash.Mod)
      assert(h == expected, s"mismatch for '$s'")
    }
  }

  test("minhash: entries bounded, order-invariant over the input set") {
    val hashes = Gen.nonEmptyListOf(Gen.chooseNum(0L, PolyHash.Mod - 1))
    cases(hashes, 50).foreach { hs =>
      val sig = graft.plans.TextExprs.minhashSig(new GenericArrayData(hs.toArray), 8)
      val shuffled = graft.plans.TextExprs.minhashSig(
        new GenericArrayData(new scala.util.Random(7).shuffle(hs).toArray), 8)
      (0 until 8).foreach { i =>
        assert(sig.getLong(i) >= 0 && sig.getLong(i) < PolyHash.Mod)
        assert(sig.getLong(i) == shuffled.getLong(i))
      }
    }
  }

  test("shingles (zip_with form) equals the definitional sliding window for random token lists and n in 1..4") {
    import graft.functions.TextFunctions
    val tokList = Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
    val drawn = cases(tokList, 40)
    for (n <- 1 to 4) {
      val got = drawn.zipWithIndex.toDF("toks", "i")
        .select($"i", TextFunctions.shingles($"toks", n).as("sh"))
        .as[(Int, Seq[String])].collect().toMap
      drawn.zipWithIndex.foreach { case (toks, i) =>
        val expected = if (toks.length < n) Seq.empty
          else toks.sliding(n).map(_.mkString("_")).toSeq
        assert(got(i) == expected, s"n=$n toks=$toks: ${got(i)} != $expected")
      }
    }
    // NULL token array -> empty array, not NULL (the pre-rewrite contract)
    val onNull = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("toks")
      .select(graft.functions.TextFunctions.shingles($"toks", 2).as("sh"))
      .as[Seq[String]].head()
    assert(onNull == Seq.empty, s"shingles(NULL) must be [], got $onNull")
  }

  test("simhashPairs first-match dedup equals brute-force Hamming pairs on random corpora") {
    // small random corpora of near-duplicate-prone texts: draw from a tiny
    // vocabulary so block collisions and multi-block collisions both occur
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta")
    val doc = Gen.chooseNum(3, 8).flatMap(k => Gen.listOfN(k, word).map(_.mkString(" ")))
    val corpus = cases(Gen.listOfN(12, doc), 5)
    corpus.foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val bits = 32
      val maxH = 3
      val all = Dedup.simhashPairs(df, "doc_id", "text", bits, maxH)
        .select($"d1", $"d2").as[(Long, Long)].collect()
      val sims = Dedup.simhashOf(df, "doc_id", "text", bits)
        .as[(Long, Long)].collect().toMap
      val expected = (for {
        a <- sims.keys; b <- sims.keys if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= maxH
      } yield (a, b)).toSet
      assert(all.toSet == expected, s"pairs mismatch on corpus $docs")
      // and no pair is emitted twice (the first-match rule's whole point)
      assert(all.length == all.distinct.length, "duplicate pair emitted")
    }
  }

  test("simhash: deterministic, within bit width, hamming-to-self 0") {
    val hashes = Gen.nonEmptyListOf(Gen.chooseNum(0L, PolyHash.Mod - 1))
    cases(hashes, 50).foreach { hs =>
      val arr = new GenericArrayData(hs.toArray)
      val a = graft.plans.TextExprs.simhash(arr, 24)
      val b = graft.plans.TextExprs.simhash(new GenericArrayData(hs.toArray), 24)
      assert(a == b)
      assert(a >= 0 && a < (1L << 24))
    }
  }

  test("saltedJoin == plain join across bucket counts") {
    val big = spark.range(500).select(($"id" % 7).as("k"), $"id".as("p"))
    val small = spark.range(7).select($"id".as("sk"), concat(lit("v"), $"id").as("v"))
    val plain = big.join(small, $"k" === $"sk").select($"p", $"v")
      .as[(Long, String)].collect().sorted.toSeq
    for (buckets <- Seq(1, 2, 5, 16)) {
      val salted = Relational.saltedJoin(big, small, "k", "sk", buckets)
        .select($"p", $"v").as[(Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"buckets=$buckets")
    }
  }

  test("asOfJoin: preserves left cardinality for any right side") {
    val rightsGen = Gen.listOfN(20,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.chooseNum(0L, 100L)))
    cases(rightsGen, 5).foreach { rights =>
      val left = Seq(("a", 10L, "p1"), ("a", 50L, "p2"), ("b", 0L, "p3"), ("d", 99L, "p4"))
        .toDF("k", "lts", "pid")
      // as-of contract requires unique (k, rts) on the right
      val right = rights.distinct.zipWithIndex
        .map { case ((k, t), i) => (k, t * 200 + i, s"v$i") }
        .toDF("k", "rts", "vid")
      val out = Relational.asOfJoin(left, right, Seq("k"), "lts", "rts", Seq("vid"))
      assert(out.count() == 4, s"left rows must survive 1:1, rights=$rights")
    }
  }

  test("duplicateClusters: labels form valid components on random graphs") {
    val edgesGen = Gen.listOfN(25, Gen.zip(Gen.chooseNum(1L, 15L), Gen.chooseNum(1L, 15L)))
      .map(_.filter { case (a, b) => a != b })
      .suchThat(_.nonEmpty)
    cases(edgesGen, 5).foreach { edges =>
      val pairs = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct.toDF("d1", "d2")
      val labels = Dedup.duplicateClusters(pairs).as[(Long, Long)].collect().toMap
      // every edge endpoint is labeled, endpoints agree, and each label is
      // the minimum of its own component (a fixpoint property)
      edges.foreach { case (a, b) =>
        assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
      }
      labels.values.foreach(l => assert(labels(l) == l, s"label $l is not a root"))
      labels.foreach { case (v, l) => assert(l <= v) }
    }
  }

  test("cdcChunks: contiguous ids, non-empty chunks, token counts partition random docs") {
    val tokList = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))
    val drawn = cases(tokList, 40)
    val df = drawn.zipWithIndex.map { case (toks, i) => (i.toLong, toks.mkString(" ")) }
      .toDF("doc_id", "text")
    val byDoc = Dedup.cdcChunks(df, "doc_id", "text", 8)
      .select($"doc_id", $"chunk", $"n_toks").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
    drawn.zipWithIndex.foreach { case (toks, i) =>
      val cs = byDoc(i.toLong)
      assert(cs.map(_._1) == cs.indices.map(_.toLong), s"case $i: chunk ids not contiguous")
      assert(cs.map(_._2).sum == toks.length, s"case $i: token counts must partition the doc")
      assert(cs.forall(_._2 >= 1), s"case $i: empty chunk")
    }
  }

  test("exactDedup: distinct representatives, one per normalized text") {
    val docsGen = Gen.listOfN(30, Gen.oneOf("a b", "c d", "e f", "A B ", "x"))
    cases(docsGen, 5).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val kept = Dedup.exactDedup(df, "doc_id", "text").as[Long].collect()
      assert(kept.distinct.length == kept.length)
      assert(kept.toSet.subsetOf(texts.indices.map(_.toLong).toSet))
      assert(kept.length == texts.map(_.trim.toLowerCase).distinct.length)
    }
  }

  test("winnowEncoded equals the definitional window scan on random docs (n=3, w=4)") {
    // small token alphabet forces repeated shingle hashes, exercising the
    // deque's leftmost-min tie rule
    val doc = Gen.listOf(Gen.oneOf("aa", "bb", "cc", "dd")).map(_.mkString(" "))
    val (n, w) = (3, 4)
    cases(doc, 100).foreach { text =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val hs = (0 to toks.length - n).map { i =>
        toks.slice(i, i + n).mkString("_")
          .foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % PolyHash.Mod)
      }
      val expected = (0 to hs.length - w).map { i =>
        val win = hs.slice(i, i + w)
        val p = i + win.indexOf(win.min)
        (p.toLong << 32) | hs(p)
      }.distinct
      val got = graft.plans.TextExprs
        .winnowEncoded(UTF8String.fromString(text), n, w)
        .toLongArray().toSeq
      assert(got == expected, s"mismatch for '$text'")
    }
  }

  test("containmentJoin == brute-force coverage on random set corpora and thresholds") {
    import graft.operators.SetSim
    val corpus = Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.chooseNum(0, 25).map(i => s"e$i")).map(_.distinct))
    val drawn = cases(corpus, 12)
    for ((sets0, ci) <- drawn.zipWithIndex; (tn, td) <- Seq((1, 2), (2, 3), (1, 1))) {
      val df = sets0.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("doc_id", "tk")
      // probe = even ids, index = odd ids: exercises the R×S asymmetry
      val probe = df.filter($"doc_id" % 2 === 0)
      val index = df.filter($"doc_id" % 2 === 1)
      val got = SetSim.containmentJoin(probe, index, "doc_id", "tk", tn, td)
        .select($"d1", $"d2").as[(Long, Long)].collect().toSet
      // Seq, not Map: a for-comprehension whose outer generator is a Map
      // would YIELD a Map and silently collapse same-d1 pairs
      val lookup = sets0.map(_.toSet).zipWithIndex.map(_.swap)
      val want = (for {
        (i, x) <- lookup if i % 2 == 0
        (j, y) <- lookup if j % 2 == 1
        if (x & y).size * td >= x.size * tn
      } yield (i.toLong, j.toLong)).toSet
      assert(got == want, s"case $ci t=$tn/$td: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("bandedIntervalJoin == naive range join on random timestamp sets and bounds") {
    val tsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 10000L))
    val boundsGen = for {
      lo <- Gen.chooseNum(-500L, 500L)
      span <- Gen.chooseNum(0L, 1000L)
    } yield (lo, lo + span)
    val lefts = cases(tsGen, 8)
    val rights = cases(tsGen, 8)
    val bounds = cases(boundsGen, 8)
    for (((ls, rs), (loMs, upMs)) <- lefts.zip(rights).zip(bounds)) {
      // timestamps at millisecond grain; bounds scaled to µs for the join
      val (lo, up) = (loMs * 1000, upMs * 1000)
      val l = ls.distinct.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(t)) }.toDF("lid", "lts")
      val r = rs.distinct.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(t)) }.toDF("rid", "rts")
      val got = Relational.bandedIntervalJoin(l, r, "lts", "rts", lo, up)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (lt, li) <- ls.distinct.zipWithIndex
        (rt, ri) <- rs.distinct.zipWithIndex
        lag = (rt - lt) * 1000
        if lag >= lo && lag <= up
      } yield (li.toLong, ri.toLong)).toSet
      assert(got == want, s"[$lo,$up]: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("bandedIntervalJoinAuto == naive range join on random inputs, salted and plain paths both drawn") {
    val tsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 5000L))
    val lefts = cases(tsGen, 6)
    val rights = cases(tsGen, 6)
    // a tiny ceiling forces the salted fallback on dense draws and the
    // plain path on sparse ones — both plans must reproduce the naive join
    for (((ls, rs), ci) <- lefts.zip(rights).zipWithIndex) {
      val (lo, up) = (0L, 1000L * 1000)
      val l = ls.distinct.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(t)) }.toDF("lid", "lts")
      val r = rs.distinct.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(t)) }.toDF("rid", "rts")
      val got = Relational.bandedIntervalJoinAuto(l, r, "lts", "rts", lo, up,
          bandRowsCeiling = 3, maxSaltBuckets = 4)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (lt, li) <- ls.distinct.zipWithIndex
        (rt, ri) <- rs.distinct.zipWithIndex
        lag = (rt - lt) * 1000
        if lag >= lo && lag <= up
      } yield (li.toLong, ri.toLong)).toSet
      assert(got == want,
        s"case $ci: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    }
  }

  test("Canary.contaminatedIds == brute-force contains on random corpora, both routes") {
    // small alphabet so shared substrings (and gram-hash candidates that
    // fail the exact verify) occur naturally; canaries mix REAL slices of
    // docs with noise, all >= 4 codepoints (the gated route's contract)
    val corpusGen = for {
      n <- Gen.chooseNum(3, 25)
      texts <- Gen.listOfN(n, Gen.chooseNum(5, 60).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)))
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    cases(corpusGen, 10).zipWithIndex.foreach { case (rows, ci) =>
      val rnd = new scala.util.Random(1000 + ci)
      val planted = rows.map(_._2).filter(_.length >= 8).take(4).map { t =>
        val start = rnd.nextInt(t.length - 7)
        t.substring(start, start + 4 + rnd.nextInt(4))
      }
      val noise = Seq.fill(3)(
        (0 until 4 + rnd.nextInt(5)).map(_ => "abc "(rnd.nextInt(4))).mkString)
      val canaries = (planted ++ noise).filter(_.trim.length >= 4).distinct
      val want = rows.filter { case (_, t) => canaries.exists(t.contains) }
        .map(_._1).toSet
      val df = rows.toDF("doc_id", "text")
      val can = canaries.toDF("phrase")
      // ceiling 1000 = the broadcast BNLJ route; ceiling 1 = the
      // char-gram prefilter (when >1 canaries) — identical verdicts is
      // the gate's whole contract
      for (ceiling <- Seq(1L, 1000L)) {
        val got = graft.operators.Canary
          .contaminatedIds(df, "doc_id", "text", can, "phrase", ceiling)
          .as[Long].collect().toSet
        assert(got == want,
          s"case $ci ceiling=$ceiling canaries=$canaries: " +
            s"missing=${want -- got} extra=${got -- want}")
      }
    }
  }

  test("SaltedCells.pairs == brute-force key pairs, exactly once, at random thresholds") {
    // random (key, id, payload) tables with deliberately skewed keys so
    // hot and cold routes are both drawn; every ceiling must yield the
    // identical MULTISET of oriented pairs (exactly-once is the contract
    // the top-k caller depends on, so duplicates are failures even when
    // a set comparison would hide them)
    val tableGen = for {
      n <- Gen.chooseNum(2, 60)
      keys <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.const(0L)), (3, Gen.chooseNum(1L, 3L)), (1, Gen.chooseNum(4L, 20L))))
      payloads <- Gen.listOfN(n, Gen.chooseNum(-100L, 100L))
    } yield keys.zip(payloads).zipWithIndex.map {
      case ((k, p), i) => (k, i.toLong, p)
    }
    cases(tableGen, 12).zipWithIndex.foreach { case (rows, ci) =>
      val df = rows.toDF("k", "id", "p")
      val want = (for {
        a <- rows; b <- rows
        if a._1 == b._1 && a._2 < b._2
      } yield (a._2, b._2, a._3, b._3))
        .groupBy(identity).map { case (r, o) => r -> o.size }
      for (ceiling <- Seq(1, 3, 64)) {
        val got = graft.operators.SaltedCells
          .pairs(df, Seq("k"), "id", ceiling, maxSaltBuckets = 4)
          .select($"id_1", $"id_2", $"p_1", $"p_2")
          .as[(Long, Long, Long, Long)].collect().toSeq
          .groupBy(identity).map { case (r, o) => r -> o.size }
        assert(got == want,
          s"case $ci ceiling=$ceiling: " +
            s"missing=${(want.keySet -- got.keySet).take(3)} " +
            s"extra=${(got.keySet -- want.keySet).take(3)} " +
            s"dups=${got.filter(_._2 > 1).take(3)}")
      }
    }
  }
}
