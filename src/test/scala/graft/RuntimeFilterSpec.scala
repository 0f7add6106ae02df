package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.operators.RuntimeFilter

/** The bloom-pruned join must be EXACTLY the plain join (false positives
  * are removed by the real join; false negatives must not exist), and the
  * bloom pre-filter must actually drop rows before the shuffle — that
  * pre-shuffle reduction is the operator's entire reason to exist.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def tables = Tables.Tpch(spark, TestSession.sf)

  test("bloomPrunedJoin equals the plain join exactly") {
    val urgent = tables.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val pruned = RuntimeFilter.bloomPrunedJoin(
      tables.lineitem, urgent, "l_orderkey", "o_orderkey")
    val plain = tables.lineitem
      .join(urgent, $"l_orderkey" === $"o_orderkey")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("bloom pre-filter drops most non-joining rows scan-local") {
    val urgent = tables.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val words = RuntimeFilter.bloomBits(urgent, $"o_orderkey")
    val total = tables.lineitem.count()
    val joining = tables.lineitem
      .join(urgent, $"l_orderkey" === $"o_orderkey").count()
    val surviving = tables.lineitem
      .filter(RuntimeFilter.mightContain($"l_orderkey", words)).count()
    // no false negatives: every joining row survives the bloom
    assert(surviving >= joining)
    // and the filter is selective: the survivors are much closer to the
    // joining set than to the full table (~20% of orders are URGENT, so a
    // low-fpp bloom keeps well under half the fact rows)
    assert(surviving < total / 2,
      s"bloom kept $surviving of $total rows — filter not selective")
  }

  test("membership probe never false-negatives on any build key") {
    val keys = tables.orders.select($"o_orderkey").limit(2000)
    val words = RuntimeFilter.bloomBits(keys, $"o_orderkey")
    val missed = keys
      .filter(!RuntimeFilter.mightContain($"o_orderkey", words)).count()
    assert(missed === 0, s"$missed build keys missing from their own bloom")
  }

  test("mixed-width integral keys: bloom hashes through one canonical type") {
    // INT probe vs BIGINT build — the exact join matches via implicit
    // cast, so the bloom must too (xxhash64 is type-sensitive)
    val probe = Seq(1, 2, 3, 7).toDF("pk") // int
    val build = Seq(2L, 7L, 9L).toDF("bk") // long
    val got = RuntimeFilter.bloomPrunedJoin(probe, build, "pk", "bk")
      .select($"pk").as[Int].collect().sorted.toSeq
    assert(got == Seq(2, 7), s"mixed-width join lost rows: $got")
  }

  test("standalone prune canonicalizes mixed integral widths like the join") {
    val build = Seq(5, 6).toDF("k") // int
    val words = RuntimeFilter.bloomBits(build, $"k")
    val probe = Seq(5L, 6L, 7L, 8L).toDF("k") // long
    val kept = RuntimeFilter.prune(probe, $"k", words).as[Long].collect().toSet
    assert(Set(5L, 6L).subsetOf(kept), s"build keys must survive prune: $kept")
  }

  test("same-named keys on both sides join unambiguously") {
    val probe = Seq((1L, "a"), (2L, "b")).toDF("k", "pv")
    val build = Seq((2L, "x")).toDF("k", "bv")
    val got = RuntimeFilter.bloomPrunedJoin(probe, build, "k", "k")
    assert(got.count() == 1 && got.select($"pv").as[String].head() == "b")
  }

  test("non-integral mismatched key types are rejected, not silently empty") {
    val probe = Seq("1").toDF("pk")
    val build = Seq(1L).toDF("bk")
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrunedJoin(probe, build, "pk", "bk")
    }
  }

  test("Spark's own AQE runtime bloom filter injects on the same join shape") {
    // the built-in automatic path this operator complements: with the size
    // thresholds lowered to the test scale, InjectRuntimeFilter plants a
    // bloom_filter subquery on the fact side of the selective join
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // the probe side must look big enough to be worth filtering — the
      // default is 10GB, far above any test-scale scan
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffled join
    val saved = confs.map { case (k, _) => k -> util.Try(spark.conf.get(k)).toOption }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val urgent = tables.orders
        .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
      val joined = tables.lineitem.join(urgent, $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") || plan.contains("might_contain"),
        s"expected an injected runtime bloom filter in:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sized bloom at ~100k build keys keeps a useful fpp (default 2^16 would saturate)") {
    // 100k keys on the fixed 2^16/3 default projects fpp ≈ 97% — a no-op
    // filter; the sized build must measure the cardinality and scale bits
    val build = spark.range(100000).toDF("k")
    assert(RuntimeFilter.projectedFpp(100000, 1 << 16, 3) > 0.9)
    val (words, bits, hashes) = RuntimeFilter.bloomBitsSized(build, $"k")
    assert(bits > (1 << 16), s"sized build must grow past the default, got $bits bits")
    // measured fpp on a DISJOINT probe range: target 3% + estimate headroom
    val probe = spark.range(100000, 200000).toDF("k")
    val fp = probe.filter(RuntimeFilter.mightContain($"k".cast("long"), words, bits, hashes)).count()
    assert(fp < 100000 * 0.08, s"measured fpp ${fp / 100000.0} — sized bloom not useful")
    // and no false negatives, as always
    val missed = build.filter(!RuntimeFilter.mightContain($"k".cast("long"), words, bits, hashes)).count()
    assert(missed === 0)
  }

  test("sized bloom refuses loudly when no affordable bitset can prune") {
    // 100k keys but maxBits capped at the old default: projected fpp ~97%
    // busts any sane ceiling — the operator must throw, not ship a no-op
    val build = spark.range(100000).toDF("k")
    val e = intercept[IllegalArgumentException] {
      RuntimeFilter.bloomBitsSized(build, $"k", maxBits = 1L << 16)
    }
    assert(e.getMessage.contains("not selective enough"),
      s"refusal must explain itself: ${e.getMessage}")
  }

  test("bloomPrunedJoinSized equals the plain join exactly") {
    val urgent = tables.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val pruned = RuntimeFilter.bloomPrunedJoinSized(
      tables.lineitem, urgent, "l_orderkey", "o_orderkey")
    val plain = tables.lineitem
      .join(urgent, $"l_orderkey" === $"o_orderkey")
    assert(pruned.count() === plain.count())
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("saturation math matches the documented landmarks") {
    // ~15k keys on 2^16 bits / 3 hashes ≈ 12.5% fpp (the sharp edge the
    // sized path exists to avoid); requiredBits is monotone in keys and
    // inverse-monotone in fpp
    val fpp15k = RuntimeFilter.projectedFpp(15000, 1 << 16, 3)
    assert(fpp15k > 0.08 && fpp15k < 0.18, s"15k-key fpp landmark drifted: $fpp15k")
    assert(RuntimeFilter.requiredBits(100000, 0.03) > RuntimeFilter.requiredBits(10000, 0.03))
    assert(RuntimeFilter.requiredBits(10000, 0.01) > RuntimeFilter.requiredBits(10000, 0.1))
    assert(RuntimeFilter.requiredBits(1000, 0.03) % 64 === 0)
  }

  test("auto: selective build blooms; non-selective build degrades to the plain join — identical output") {
    // parquet-backed tables: an in-memory LocalRelation would let
    // ConvertToLocalRelation fold the probe filter out of the plan text
    val urgent = tables.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val plain = tables.lineitem.join(urgent, $"l_orderkey" === $"o_orderkey")
    // selective (affordable bitset): the bloom path engages — scan-local
    // xxhash64 probe in the plan
    val autoSel = RuntimeFilter.bloomPrunedJoinAuto(
      tables.lineitem, urgent, "l_orderkey", "o_orderkey")
    assert(autoSel.queryExecution.executedPlan.toString.contains("xxhash64"),
      "a selective build must take the bloom path")
    assert(autoSel.exceptAll(plain).isEmpty && plain.exceptAll(autoSel).isEmpty)
    // same build under a bit cap too tight for its cardinality: the fpp
    // ceiling trips, the operator must SKIP the bloom (no probe in the
    // plan) and still return the exact join
    val autoSat = RuntimeFilter.bloomPrunedJoinAuto(
      tables.lineitem, urgent, "l_orderkey", "o_orderkey",
      targetFpp = 0.03, maxBits = 256)
    assert(!autoSat.queryExecution.executedPlan.toString.contains("xxhash64"),
      "a saturating build must degrade to the plain join, not a no-op bloom")
    assert(autoSat.exceptAll(plain).isEmpty && plain.exceptAll(autoSat).isEmpty)
  }

  test("auto: a build beyond keysCeiling degrades to the plain join — the literal bitset is plan poison there") {
    // measured (BASELINE.md): at ~3.3M build keys the 2^24-bit bitset is
    // 262k Literal nodes — the pruned join ran 24–39 s vs 6.4 s plain at
    // 100x, so size alone must trip the degrade even when fpp looks fine
    val urgent = tables.orders
      .filter($"o_orderpriority" === "1-URGENT").select($"o_orderkey")
    val plain = tables.lineitem.join(urgent, $"l_orderkey" === $"o_orderkey")
    val capped = RuntimeFilter.bloomPrunedJoinAuto(
      tables.lineitem, urgent, "l_orderkey", "o_orderkey", keysCeiling = 2L)
    assert(!capped.queryExecution.executedPlan.toString.contains("xxhash64"),
      "a build beyond keysCeiling must skip the bloom entirely")
    assert(capped.exceptAll(plain).isEmpty && plain.exceptAll(capped).isEmpty)
  }

  test("one-pass auto: fill estimate tracks true cardinality and fold-down loses no build key") {
    // the round-9 single-pass redesign: the auto path builds ONE bitset at
    // AutoProbeBits, estimates cardinality from its fill, and folds down —
    // estimate and fold are the two pieces that must not drift
    val keys = tables.orders.select($"o_orderkey").limit(2000)
    val full = RuntimeFilter.bloomBits(keys, $"o_orderkey",
      RuntimeFilter.AutoProbeBits, RuntimeFilter.AutoHashes)
    val setBits = full.map(java.lang.Long.bitCount(_).toLong).sum
    val est = RuntimeFilter.estimateKeysFromFill(
      setBits, RuntimeFilter.AutoProbeBits, RuntimeFilter.AutoHashes)
    val truth = keys.distinct().count()
    assert(math.abs(est - truth) <= math.max(5L, truth / 10),
      s"fill estimate $est vs true $truth — outside 10%")
    // fold 2^21 → 2^12 and probe every build key through the folded bits:
    // membership must be preserved exactly (no false negatives)
    val folded = RuntimeFilter.foldBits(full, 1 << 12)
    val missed = keys.filter(!RuntimeFilter.mightContain(
      $"o_orderkey".cast("long"), folded, 1 << 12, RuntimeFilter.AutoHashes)).count()
    assert(missed === 0, s"$missed build keys lost by fold-down")
    // and the folded bitset is what a direct build at 2^12 produces
    val direct = RuntimeFilter.bloomBits(keys, $"o_orderkey",
      1 << 12, RuntimeFilter.AutoHashes)
    assert(folded.toSeq === direct.toSeq,
      "fold-down must equal a direct build at the target size")
  }

  test("NULL probe keys are dropped, matching inner-join semantics") {
    val build = Seq(1L, 2L, 3L).toDF("k")
    val words = RuntimeFilter.bloomBits(build, $"k")
    val probe = Seq(Some(1L), None, Some(99L)).toDF("k")
    val keptRows = probe.filter(RuntimeFilter.mightContain($"k", words)).collect()
    assert(keptRows.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L),
      "build key 1 must pass its own bloom")
    assert(!keptRows.exists(_.isNullAt(0)), "NULL key must not pass the bloom")
  }
}
