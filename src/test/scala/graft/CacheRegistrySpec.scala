package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the session-scoped persist registry — in particular the
  * r10 `release(key)` API: dropping ONE keyed relation must both
  * unpersist it and evict the memo entry, so a later getOrPersist
  * under the same key rebuilds a fresh persisted instance instead of
  * serving an unpersisted frame (the failure mode a bare
  * `df.unpersist()` on the returned DataFrame leaves behind).
  */
class CacheRegistrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("getOrPersist memoizes per key and release evicts exactly that key") {
    // distinct plans per key: Spark's CacheManager dedupes cache
    // entries BY LOGICAL PLAN, so two keys over the same plan would
    // share one entry and unpersisting either kills both — a property
    // of Spark, not of the registry under test
    var builds = 0
    def build(n: Int) = { builds += 1; spark.range(n).toDF("n") }
    val a1 = CacheRegistry.getOrPersist(spark, "spec.reg.a")(build(10))
    val a2 = CacheRegistry.getOrPersist(spark, "spec.reg.a")(build(10))
    val b1 = CacheRegistry.getOrPersist(spark, "spec.reg.b")(build(20))
    assert(builds == 2, "same key must reuse the memoized relation")
    assert(a1 eq a2)
    assert(a1.storageLevel.useMemory, "memoized relation must be persisted")

    CacheRegistry.release(spark, "spec.reg.a")
    assert(a1.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "release must unpersist the keyed relation")
    assert(b1.storageLevel.useMemory, "release must not touch other keys")

    val a3 = CacheRegistry.getOrPersist(spark, "spec.reg.a")(build(10))
    assert(builds == 3, "released key must rebuild, not serve the stale memo")
    assert(!(a3 eq a1))
    assert(a3.storageLevel.useMemory, "rebuilt relation must be persisted again")

    // releasing an unknown key is a no-op, not an error
    CacheRegistry.release(spark, "spec.reg.never-registered")
    CacheRegistry.release(spark, "spec.reg.a")
    CacheRegistry.release(spark, "spec.reg.b")
  }

  test("getOrComputeLong memoizes per (session, key) and survives clear") {
    var computes = 0
    def compute(v: Long) = { computes += 1; v }
    assert(CacheRegistry.getOrComputeLong(spark, "spec.cnt.a")(compute(7L)) == 7L)
    assert(CacheRegistry.getOrComputeLong(spark, "spec.cnt.a")(compute(99L)) == 7L,
      "same key must serve the memoized value, not recompute")
    assert(CacheRegistry.getOrComputeLong(spark, "spec.cnt.b")(compute(8L)) == 8L)
    assert(computes == 2, "one compute per distinct key")
    // clear() releases persisted RELATIONS; a keyed scalar is a pure
    // function of the session's input data and stays valid (contract
    // in the scaladoc) — the sizing job must not re-run per clear
    CacheRegistry.clear(spark)
    assert(CacheRegistry.getOrComputeLong(spark, "spec.cnt.a")(compute(99L)) == 7L)
    assert(computes == 2)
    // clear(dropScalars = true) is the escape hatch for callers that
    // REWRITE data under a keyed path in-session (r11 ADVICE): the
    // memoized count must be recomputed, not served stale
    CacheRegistry.clear(spark, dropScalars = true)
    assert(CacheRegistry.getOrComputeLong(spark, "spec.cnt.a")(compute(42L)) == 42L)
    assert(computes == 3, "dropScalars must force recomputation")
  }
}
