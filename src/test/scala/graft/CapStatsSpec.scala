package graft

import org.scalatest.funsuite.AnyFunSuite

/** The deferred no-silent-caps contract (r18): a registered count does NOT
  * run at registration (the r17 eager shape serialized a full cache-build
  * job before each cap-bearing query's planning; a concurrent shape
  * double-computed cache partitions at sf1 — see CapStats), but it MUST
  * have run — recorded and WARNed — before any stats read returns, and
  * CacheRegistry.releaseAll must run it before dropping the caches it
  * scans. Failures surface at await, named by tag.
  */
class CapStatsSpec extends AnyFunSuite {

  test("deferred count runs at first stats read, not at registration") {
    CapStats.clear()
    var ran = 0
    CapStats.recordDeferred("spec_tag")({ ran += 1; 7L })(_ => ())
    assert(ran == 0, "count must not run at registration")
    assert(CapStats.lastDrop("spec_tag").contains(7L))
    assert(ran == 1, "count must have run exactly once by the first read")
    // idempotent: further reads don't re-run the thunk
    assert(CapStats.lastDrop("spec_tag").contains(7L))
    assert(ran == 1)
    CapStats.clear()
  }

  test("warn fires only for positive counts, and releaseAll drains pending") {
    CapStats.clear()
    var warned = List.empty[Long]
    CapStats.recordDeferred("spec_zero")(0L)(n => warned ::= n)
    CapStats.recordDeferred("spec_pos")(3L)(n => warned ::= n)
    CacheRegistry.releaseAll() // the harness sweep must drain pending counts
    assert(CapStats.snapshot().get("spec_zero").contains(0L),
      "zero is recorded too — 'cap checked, nothing dropped' stays distinguishable")
    assert(CapStats.snapshot().get("spec_pos").contains(3L))
    assert(warned == List(3L), s"warn must fire exactly for the positive count, got $warned")
    CapStats.clear()
  }

  test("a failing deferred count surfaces at await, named by its tag") {
    CapStats.clear()
    CapStats.recordDeferred("spec_boom")(throw new IllegalStateException("boom"))(_ => ())
    val e = intercept[RuntimeException](CapStats.await())
    assert(e.getMessage.contains("spec_boom"), e.getMessage)
    CapStats.clear()
  }
}
