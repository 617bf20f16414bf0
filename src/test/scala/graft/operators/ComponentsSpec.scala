package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The adaptive small-graph fast path (driver union-find under the
  * edge bound) must be OUTPUT-IDENTICAL to the distributed min-label
  * loop — same (node, lab) set, lab = component min id — on every
  * graph shape the dedup chains produce: chains (the q148 8-round
  * case), stars (q226's 1-round case), cliques, singletons-in-edges,
  * and a mixed forest. The distributed path is forced by setting
  * spark.graft.components.localSolveMaxEdges=0.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.toDF("a", "b")
  }

  private def run(edges: Seq[(Long, Long)], forceDistributed: Boolean)
      : Map[Long, Long] = {
    val key = "spark.graft.components.localSolveMaxEdges"
    val prev = spark.conf.getOption(key)
    try {
      if (forceDistributed) spark.conf.set(key, "0")
      else spark.conf.unset(key)
      Components.minLabel(pairsDf(edges), "a", "b").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  // chain 1-2-3-4-5-6-7 (deep diameter), star 10-{11,12,13}, clique
  // {20,21,22}, cross-component id interleave 8-30
  private val mixed: Seq[(Long, Long)] = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
    (10L, 11L), (10L, 12L), (10L, 13L),
    (20L, 21L), (21L, 22L), (20L, 22L),
    (30L, 8L))

  private val expectMixed: Map[Long, Long] = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L,
    10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L,
    8L -> 8L, 30L -> 8L)

  test("local union-find path: min-id labels on the mixed forest") {
    assert(run(mixed, forceDistributed = false) == expectMixed)
  }

  test("distributed loop path: identical fixpoint on the same forest") {
    assert(run(mixed, forceDistributed = true) == expectMixed)
  }

  test("reversed/duplicated edge listings do not change the fixpoint (either path)") {
    val noisy = mixed.map { case (a, b) => (b, a) } ++ mixed ++ mixed.take(3)
    assert(run(noisy, forceDistributed = false) == expectMixed)
    assert(run(noisy, forceDistributed = true) == expectMixed)
  }

  test("empty pair graph yields empty labels on both paths") {
    assert(run(Nil, forceDistributed = false).isEmpty)
    assert(run(Nil, forceDistributed = true).isEmpty)
  }
}
