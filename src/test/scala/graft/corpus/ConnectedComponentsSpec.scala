package graft.corpus

import graft.SparkSpec
import graft.dedup.Dedup

/** Connected-components cluster resolution over near-dup pair graphs. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def components(pairs: Seq[(Long, Long)], maxIters: Int = 50) =
    Dedup.connectedComponents(pairs.toDF("id1", "id2"), maxIters = maxIters)
      .as[(Long, Long)].collect().toMap

  test("chain merges transitively where greedy pair rules under-merge") {
    // (2,3) and (1,3): greedy drop-larger keeps both 1 and 2; CC puts
    // all three in cluster 1.
    val got = components(Seq((2L, 3L), (1L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("long chain needs diameter rounds, still converges to the min") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    val got = components(chain)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == (1L to 10L).toSet)
  }

  test("separate components keep separate min labels; star resolves in one round") {
    val got = components(Seq((5L, 9L), (5L, 7L), (20L, 30L)))
    assert(got == Map(5L -> 5L, 9L -> 5L, 7L -> 5L, 20L -> 20L, 30L -> 20L))
  }

  test("non-convergence inside maxIters fails loudly") {
    val chain = (1L until 10L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      components(chain, maxIters = 2)
    }
  }
}
