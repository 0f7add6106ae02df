package graft

import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed recovery of the COMPOSED order chain: the 6-stateful-op
  * query (3 interval joins + dedup + flags + window) stops and restarts
  * from its checkpoint across several runs; join state, dedup state,
  * per-user flag state, and window state must all survive, each finalized
  * window must be delivered exactly once, and the per-user first-ever
  * flag must NOT reset across restarts (its keyed state is the part a
  * naive restart would lose). Chain driving lives in [[ChainHarness]]
  * (shared with the RocksDB-provider variant in RocksDbStateSpec).
  */
class ChainRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("6-op chain restarts from checkpoint: windows exactly once, flag state survives") {
    val h = new ChainHarness(spark)

    // run 1: u9's first-ever order in window 100-110
    h.write(h.orderPair("o1", "d1", "u9", 100, "7.00"))
    h.startRun()
    // runs 2..n: nudge the watermark forward with disjoint later traffic;
    // each restart resumes ALL six operators' state from the checkpoint
    var t = 600L
    for (_ <- 1 to 6) {
      h.write(h.orderPair(s"o$t", s"d$t", "uz", t, "1.00"))
      t += 200
      h.startRun()
    }
    assert(h.windowsAt(100L) == Seq((100L, 1L, 1L)),
      s"window 100 must finalize exactly once with uu=1,nu=1: ${h.seen}")

    // u9 orders again much later: flag state survived the restarts, so the
    // same user is NOT new (nu=0) though a fresh day makes them uu=1 again
    val day = 86400L
    h.write(h.orderPair("o-next", "d-next", "u9", day + 100, "3.00"))
    h.startRun()
    for (_ <- 1 to 6) {
      h.write(h.orderPair(s"o$t", s"d$t", "uz", day + t, "1.00"))
      t += 200
      h.startRun()
    }
    assert(h.windowsAt(day + 100L) == Seq((day + 100L, 1L, 0L)),
      s"u9 must be uu=1 nu=0 after restart (state survived): ${h.seen}")
  }
}
