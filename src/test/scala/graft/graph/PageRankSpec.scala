package graft.graph

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force reference: the same damped recurrence as a Scala map
    * fold, for cross-checking the distributed operator exactly. */
  private def ref(edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = out.size.toDouble
    val in = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    (1 to iters).foldLeft(out.keys.map(_ -> 1.0 / n).toMap) { (r, _) =>
      in.map { case (v, srcs) =>
        v -> ((1.0 - d) / n + d * srcs.map(u => r(u) / out(u)).sum)
      }
    }
  }

  private val path = Seq((1L, 2L), (2L, 3L)) // 1 - 2 - 3
  private def sym(p: Seq[(Long, Long)]) = p ++ p.map(_.swap)

  test("pageRank matches the hand-computed one-iteration path graph") {
    val got = rows(PageRank.pageRank(sym(path).toDF("src", "dst"), iters = 1)
      .orderBy("id")).map(r => (r(0), r(1)))
    // N=3, p0=1/3 each: ends get 0.05 + 0.85/6, the middle 0.05 + 0.85*2/3
    assert(got == Seq((1L, 0.191667), (2L, 0.616667), (3L, 0.191667)))
  }

  test("symmetric = true returns identical ranks with the guard waived") {
    // The waiver changes the PLAN (no distinct/anti-join guard branch),
    // never the values: both variants must agree to the last rounded
    // digit on a symmetrize() output.
    val guarded = rows(PageRank.pageRank(sym(path).toDF("src", "dst"), iters = 2)
      .orderBy("id")).map(r => (r(0), r(1)))
    val waived = rows(PageRank.pageRank(sym(path).toDF("src", "dst"), iters = 2,
      symmetric = true).orderBy("id")).map(r => (r(0), r(1)))
    assert(waived == guarded)
    // and the waived plan really dropped the guard: no raise_error left
    val plan = PageRank.pageRank(sym(path).toDF("src", "dst"), iters = 2,
      symmetric = true).queryExecution.analyzed.toString()
    assert(!plan.contains("raise_error"), "guard branch still in the waived plan")
  }

  test("pageRank matches the brute-force recurrence over 3 iterations") {
    val star = sym(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (1L, 2L)))
    val want = ref(star, iters = 3, d = 0.85)
      .map { case (k, v) => k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
    val got = rows(PageRank.pageRank(star.toDF("src", "dst"), iters = 3).orderBy("id"))
      .map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Double]).toMap
    assert(got == want)
    // the hub out-ranks every leaf
    assert(got(10L) > got.removed(10L).values.max)
  }

  test("rank mass is conserved on a symmetric graph (sums to 1)") {
    val g = sym(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L)))
    val total = PageRank.pageRank(g.toDF("src", "dst"), iters = 3)
      .agg(org.apache.spark.sql.functions.sum("rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-4)
  }

  test("a plain directed graph with a sink fails loudly, not wrongly") {
    // 3 is a pure sink (dst, never src): its mass would silently vanish
    // after one superstep — the guard must reject instead of returning
    // a non-PageRank result. The guard is IN-PLAN (raise_error under a
    // broadcast 1-row crossJoin, same as the incremental path), so the
    // failure surfaces at the output action.
    val err = intercept[Exception] {
      PageRank.pageRank(path.toDF("src", "dst"), iters = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("dangling")), s"unnamed failure: $err")
    // the symmetrized version of the same graph is accepted
    assert(PageRank.pageRank(sym(path).toDF("src", "dst"), iters = 1).count() == 3)
  }

  test("symmetrize emits both directions of every pair") {
    val got = rows(PageRank.symmetrize(Seq((1L, 2L)).toDF("id1", "id2")).orderBy("src"))
    assert(got == Seq(Seq(1L, 2L), Seq(2L, 1L)))
  }

  /** Two-phase reference for the incremental operator: the state
    * trajectory from uniform, ROUNDED at the checkpoint (what the
    * persisted state holds), then the merged-graph refresh seeded from
    * it — new nodes at 1/N of the merged graph. */
  private def incRef(stateEdges: Seq[(Long, Long)], incEdges: Seq[(Long, Long)],
                     kState: Int, kInc: Int, d: Double): Map[Long, Double] = {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val seed = ref(stateEdges, kState, d).map { case (k, v) => k -> r6(v) }
    val merged = stateEdges ++ incEdges
    val out = merged.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    val n = out.size.toDouble
    val in = merged.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val init = out.keys.map(k => k -> seed.getOrElse(k, 1.0 / n)).toMap
    (1 to kInc).foldLeft(init) { (r, _) =>
      in.map { case (v, srcs) =>
        v -> ((1.0 - d) / n + d * srcs.map(u => r(u) / out(u)).sum)
      }
    }.map { case (k, v) => k -> r6(v) }
  }

  test("incrementalPageRank matches the two-phase reference: moved mass, " +
    "merged components, fresh nodes seeded at 1/N") {
    // state: a triangle {1,2,3} and a pair {4,5}; the increment bridges
    // the components (3-4) and attaches a brand-new node 6 to the hub 2.
    val statePairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))
    val incPairs = Seq((3L, 4L), (2L, 6L))
    val stateRanks = PageRank.pageRank(sym(statePairs).toDF("src", "dst"),
      iters = 3, damping = 0.85, roundTo = 6)
      .withColumnRenamed("rank", "rank") // (id, rank)
    val got = rows(PageRank.incrementalPageRank(
        sym(statePairs).toDF("src", "dst"), sym(incPairs).toDF("src", "dst"),
        stateRanks, iters = 2, damping = 0.85, roundTo = 6).orderBy("id"))
      .map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Double]).toMap
    val want = incRef(sym(statePairs), sym(incPairs), kState = 3, kInc = 2, d = 0.85)
    assert(got == want)
    // the fresh node landed and carries real rank
    assert(got.contains(6L) && got(6L) > 0)
  }

  test("incrementalPageRank at iters = 6 stays linear: per-superstep cache " +
    "keys outlive CacheOnce's per-name LRU") {
    // Under ONE shared cache name, CacheOnce keeps only maxPerName = 4
    // plans — at iters >= 5 the earliest supersteps' r/deg frames would
    // be unpersisted BEFORE the terminal action, re-expanding the
    // 2^iters lineage. Per-superstep keys pin every round; the stage
    // count submitted by the action is the observable (an exponential
    // re-execution at iters = 6 submits hundreds of stages, the linear
    // plan a few dozen).
    val statePairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))
    val incPairs = Seq((3L, 4L), (2L, 6L))
    val stateRanks = PageRank.pageRank(sym(statePairs).toDF("src", "dst"),
      iters = 3, damping = 0.85, roundTo = 6)
    val submitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        submitted.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val got = try {
      val out = rows(PageRank.incrementalPageRank(
          sym(statePairs).toDF("src", "dst"), sym(incPairs).toDF("src", "dst"),
          stateRanks, iters = 6, damping = 0.85, roundTo = 6).orderBy("id"))
        .map(r => r(0).asInstanceOf[Long] -> r(1).asInstanceOf[Double]).toMap
      // listener delivery is async: poll until the count settles
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      while (submitted.get() != last && System.nanoTime() < deadline) {
        last = submitted.get(); Thread.sleep(200)
      }
      out
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(got == incRef(sym(statePairs), sym(incPairs), kState = 3, kInc = 6, d = 0.85))
    assert(submitted.get() < 120,
      s"expected a linear superstep plan (< 120 stages), got ${submitted.get()} — " +
        "per-superstep rpd frames were evicted before the action")
  }

  test("incrementalPageRank rejects a non-symmetric increment loudly") {
    val stateRanks = PageRank.pageRank(sym(path).toDF("src", "dst"), iters = 1)
    // The incremental guard is IN-PLAN (raise_error under a broadcast
    // 1-row crossJoin — no separate count() action per refresh), so the
    // failure surfaces as a runtime error at the output action, not a
    // driver require at build time. Still loud, still named.
    val e = intercept[Exception] {
      // (1 -> 9) one-way: 9 receives mass but never appears as a src in
      // the merged graph — a dangling sink, same contract as pageRank
      PageRank.incrementalPageRank(sym(path).toDF("src", "dst"),
        Seq((1L, 9L)).toDF("src", "dst"), stateRanks, iters = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("dangling node")),
      s"expected the dangling-node message, got: ${messages(e).mkString(" | ")}")
  }

  test("assertNoDangles passes a symmetrize() output and rejects a dangling table") {
    // The build-time twin of the waived in-plan dangle guard
    // (preparePageRankState's symmetric=true read-back waiver).
    PageRank.assertNoDangles(
      PageRank.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")), "spec edges")
    val e = intercept[IllegalArgumentException] {
      PageRank.assertNoDangles(Seq((1L, 9L)).toDF("src", "dst"), "spec edges")
    }
    assert(e.getMessage.contains("not symmetric"))
  }
}
