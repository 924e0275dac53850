package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property pins for the round's analytics operators: each distributed
  * implementation must equal a SEQUENTIAL reference over randomized
  * inputs — the same style as MixingSpec's serpentine/global-rank pin. */
class AnalyticsPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- SCD2: a chain of random snapshots vs the sequential replay ----

  private type Snap = Map[Long, (Option[Double], String)]

  private val snapGen: Gen[Snap] =
    (1L to 8L).foldLeft(Gen.const(Map.empty: Snap)) { (acc, k) =>
      for {
        m <- acc
        present <- Gen.prob(0.7)
        bal <- Gen.oneOf(Some(1.0), Some(2.0), None)
        seg <- Gen.oneOf("A", "B")
      } yield if (present) m + (k -> ((bal, seg))) else m
    }

  private def toDf(s: Snap) =
    df("k BIGINT, bal DOUBLE, seg STRING")(
      s.toSeq.sortBy(_._1).map { case (k, (b, sg)) =>
        Row(k, b.map(Double.box).orNull, sg) })

  /** Sequential SCD2 replay of snapshots v1..vn at versions 1..n. */
  private def refScd2(snaps: Seq[Snap]): Set[(Long, Option[Double], String, Long, Option[Long], Boolean)] = {
    val out = Set.newBuilder[(Long, Option[Double], String, Long, Option[Long], Boolean)]
    val keys = snaps.flatMap(_.keys).toSet
    keys.foreach { k =>
      var open: Option[(Long, (Option[Double], String))] =
        snaps.head.get(k).map(v => (1L, v))
      (2 to snaps.size).foreach { ver =>
        val next = snaps(ver - 1).get(k)
        (open, next) match {
          case (Some((_, ov)), Some(nv)) if ov == nv => ()
          case (Some((f, ov)), Some(nv)) =>
            out += ((k, ov._1, ov._2, f, Some(ver.toLong), false))
            open = Some((ver.toLong, nv))
          case (Some((f, ov)), None) =>
            out += ((k, ov._1, ov._2, f, Some(ver.toLong), false))
            open = None
          case (None, Some(nv)) => open = Some((ver.toLong, nv))
          case (None, None) => ()
        }
      }
      open.foreach { case (f, v) => out += ((k, v._1, v._2, f, None, true)) }
    }
    out.result()
  }

  test("property: scd2Merge + scd2Apply chain == sequential snapshot replay") {
    (1L to 10L).foreach { seed =>
      val snaps = Seq(sample(snapGen, seed), sample(snapGen, seed + 100),
        sample(snapGen, seed + 200))
      val h12 = ScdOps.scd2Merge(toDf(snaps(0)), toDf(snaps(1)),
        Seq("k"), Seq("bal", "seg"), 1L, 2L)
      val h = ScdOps.scd2Apply(h12, toDf(snaps(2)), Seq("k"), Seq("bal", "seg"), 3L)
      val got = h.collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]), r.getString(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getBoolean(5))).toSet
      assert(got == refScd2(snaps), s"seed=$seed snaps=$snaps")
    }
  }

  // ---- funnel: random event streams vs the sequential recurrence ----

  private val stages = Seq("signup", "click", "purchase")
  private val evGen: Gen[List[(Long, String, Long)]] = Gen.listOfN(60,
    for {
      u <- Gen.choose(1L, 5L)
      t <- Gen.oneOf(stages ++ Seq("view", "error"))
      m <- Gen.choose(0L, 500L)
    } yield (u, t, m))

  private def refFunnel(evs: Seq[(Long, String, Long)]): Seq[(String, Long, Long, Option[Double])] = {
    val perUser = evs.groupBy(_._1)
    // per user: greedy stage arrival times in MICROSECONDS since epoch
    val reached: Map[Long, Seq[Long]] = perUser.flatMap { case (u, es) =>
      val byType = es.groupBy(_._2)
      def minAfter(tp: String, lo: Option[Long]) =
        byType.getOrElse(tp, Nil).map(_._3).filter(m => lo.forall(m * 60000000L >= _))
          .map(_ * 60000000L).minOption
      val arr = stages.foldLeft(Seq.empty[Long]) { (acc, tp) =>
        if (acc.size < stages.indexOf(tp)) acc
        else minAfter(tp, acc.lastOption).fold(acc)(acc :+ _)
      }
      if (arr.isEmpty) None else Some(u -> arr)
    }
    stages.zipWithIndex.map { case (st, i) =>
      val deltas = reached.values.collect { case arr if arr.size > i => arr(i) - arr.head }.toSeq
      val avg = if (deltas.isEmpty) None
        else Some(BigDecimal((deltas.sum.toDouble / deltas.size) / 3600000000.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (st, (i + 1).toLong, deltas.size.toLong, avg)
    }
  }

  test("property: distributed funnel == sequential greedy recurrence") {
    import spark.implicits._
    (1L to 10L).foreach { seed =>
      val evs = sample(evGen, seed)
      val d = evs.map { case (u, t, m) =>
        (u, t, new Timestamp(1700000000000L + m * 60000L)) }
        .toDF("user_id", "event_type", "ts")
      val got = EventAnalytics.funnel(d, "user_id", "ts", "event_type", stages)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSeq.sortBy(_._2)
      assert(got == refFunnel(evs), s"seed=$seed")
    }
  }

  // ---- budgetSelect: random buckets/tokens vs the naive cumsum ----

  test("property: budgetSelect == naive global cumsum on random inputs") {
    val gen = Gen.listOfN(40, for {
      b <- Gen.choose(1L, 6L)
      t <- Gen.choose(1L, 30L)
    } yield (b, t))
    (1L to 10L).foreach { seed =>
      val rows0 = sample(gen, seed).zipWithIndex
        .map { case ((b, t), i) => (i.toLong, b, t) }
      val d = df("doc_id BIGINT, qb BIGINT, tok BIGINT")(
        rows0.map { case (i, b, t) => Row(i, b, t) })
      val frac = (seed % 11) / 10.0
      val budget = math.floor(frac * rows0.map(_._3).sum.toDouble).toLong
      val want = rows0.sortBy(r => (r._2, r._1))
        .scanLeft((0L, 0L)) { case ((_, c), (id, _, t)) => (id, c + t) }
        .tail.takeWhile(_._2 <= budget).map(_._1).toSet
      val got = graft.text.Mixing.budgetSelect(d, "doc_id", "tok", "qb", frac)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"seed=$seed frac=$frac")
    }
  }
}
