package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Hilbert index: bijectivity, the defining unit-step locality
  * property (which Morton does NOT have — the reason sc7 exists), the
  * d↔(x,y) round trip, and expression/util agreement through codegen. */
class HilbertSpec extends SparkSpec {

  test("bijection: a 64x64 grid maps exactly onto 0..4095") {
    val order = 6
    val ds = for (x <- 0 until 64; y <- 0 until 64)
      yield HilbertUtil.hilbert2(x, y, order)
    assert(ds.toSet == (0 until 4096).map(_.toLong).toSet)
  }

  test("unit-step locality: consecutive indices are ALWAYS adjacent cells") {
    // The Hilbert property Morton lacks: |d2 - d1| = 1 implies Manhattan
    // distance 1 on the grid. (Morton's Z jumps corner-to-corner at
    // every power-of-two seam — checked below as the contrast.)
    val order = 6
    val inv = (0 until 4096).map(d => HilbertUtil.hilbertInverse(d, order))
    inv.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step ($x1,$y1) -> ($x2,$y2)")
    }
    // The Morton contrast, pinned structurally: index 1 -> 2 jumps from
    // (1,0) to (0,1) — Manhattan distance 2, a seam on the very first
    // step of the walk.
    assert(ZOrderUtil.morton2(1, 0) == 1L && ZOrderUtil.morton2(0, 1) == 2L)
  }

  test("round trip: hilbertInverse(hilbert2(x, y)) == (x, y) at order 16") {
    val rng = new scala.util.Random(9)
    (0 until 500).foreach { _ =>
      val x = rng.nextInt(1 << 16).toLong
      val y = rng.nextInt(1 << 16).toLong
      val d = HilbertUtil.hilbert2(x, y, 16)
      assert(d >= 0 && d < (1L << 32))
      assert(HilbertUtil.hilbertInverse(d, 16) == (x, y), s"($x,$y) via $d")
    }
  }

  test("expression matches the util through the DataFrame path") {
    val rows = (0 until 200).map(i => Row(i.toLong * 7 % 1500, i.toLong * 13 % 366))
    val d = df("x bigint, y bigint")(rows)
    val got = d.select(col("x"), col("y"),
        HilbertFunctions.hilbert2(col("x"), col("y")).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == HilbertUtil.hilbert2(r.getLong(0), r.getLong(1), 16))
    }
  }

  test("range decomposition covers a window EXACTLY (exhaustive at order 3)") {
    // Every possible window on the 8x8 grid: the union of the returned
    // intervals must equal the brute-force index set — no false
    // negatives (lost rows) and, uncoarsened, no false positives.
    val order = 3; val n = 1 << order
    for (xlo <- 0 until n; xhi <- xlo until n;
         ylo <- 0 until n; yhi <- ylo until n) {
      val want = (for (x <- xlo to xhi; y <- ylo to yhi)
        yield HilbertUtil.hilbert2(x, y, order)).toSet
      val rs = HilbertRanges.ranges(xlo, xhi, ylo, yhi, order,
        maxRanges = Int.MaxValue)
      val got = rs.flatMap { case (lo, hi) => lo to hi }.toSet
      assert(got == want, s"window [$xlo,$xhi]x[$ylo,$yhi]: $rs")
      // Disjoint, sorted, non-mergeable.
      rs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"unmerged: $rs")
        case _ =>
      }
    }
  }

  test("range decomposition: random windows at order 16, coarsening over-covers") {
    val rng = new scala.util.Random(31)
    (0 until 100).foreach { _ =>
      val xlo = rng.nextInt(60000); val xhi = xlo + rng.nextInt(300)
      val ylo = rng.nextInt(60000); val yhi = ylo + rng.nextInt(300)
      val exact = HilbertRanges.ranges(xlo, xhi, ylo, yhi, 16,
        maxRanges = Int.MaxValue)
      // Exact cover: spot-check membership both ways (full enumeration
      // is the order-3 test's job; 2^32 cells is not enumerable here).
      (0 until 20).foreach { _ =>
        val x = xlo + rng.nextInt(xhi - xlo + 1).toLong
        val y = ylo + rng.nextInt(yhi - ylo + 1).toLong
        val d = HilbertUtil.hilbert2(x, y, 16)
        assert(exact.exists { case (lo, hi) => d >= lo && d <= hi },
          s"cell ($x,$y) d=$d escaped the cover")
      }
      exact.foreach { case (lo, hi) =>
        Seq(lo, hi).foreach { d =>
          val (x, y) = HilbertUtil.hilbertInverse(d, 16)
          assert(x >= xlo && x <= xhi && y >= ylo && y <= yhi,
            s"range endpoint $d -> ($x,$y) outside the window")
        }
      }
      // Coarsened: never more than the cap, and a SUPERSET of exact.
      val coarse = HilbertRanges.ranges(xlo, xhi, ylo, yhi, 16, maxRanges = 8)
      assert(coarse.size <= 8)
      exact.foreach { case (lo, hi) =>
        assert(coarse.exists { case (clo, chi) => clo <= lo && hi <= chi },
          s"coarsening dropped [$lo,$hi]")
      }
    }
    // Degenerate inputs: empty and out-of-grid windows yield nothing.
    assert(HilbertRanges.ranges(5, 4, 0, 10, 16) == Nil)
    assert(HilbertRanges.ranges(70000, 80000, 0, 10, 16) == Nil)
    // Full grid collapses to ONE interval.
    assert(HilbertRanges.ranges(0, 65535, 0, 65535, 16) ==
      Seq((0L, (1L << 32) - 1)))
  }

  test("adversarial wide window at order 31 stays budget-bounded (no perimeter blow-up)") {
    // A grid-wide 3-row band at order 31: the EXACT cover would be
    // O(2^31) intervals — the budgeted walk must return within the cap,
    // quickly, and still cover the window (over-cover only).
    val side = 1L << 31
    val t0 = System.nanoTime()
    val rs = HilbertRanges.ranges(0, side - 1, 1000, 1002, 31, maxRanges = 32)
    assert((System.nanoTime() - t0) < 10e9, "budgeted cover took >10s")
    assert(rs.nonEmpty && rs.size <= 32)
    // Sampled window cells must be covered.
    Seq(0L, side / 3, side / 2, side - 1).foreach { x =>
      val d = HilbertUtil.hilbert2(x, 1001L, 31)
      assert(rs.exists { case (lo, hi) => lo <= d && d <= hi },
        s"cell ($x,1001) -> $d not covered")
    }
  }

  test("hilbert3 bijection: the 8x8x8 cube maps exactly onto 0..511") {
    val order = 3
    val ds = for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield HilbertUtil.hilbert3(x, y, z, order)
    assert(ds.toSet == (0 until 512).map(_.toLong).toSet)
  }

  test("hilbert3 unit-step locality: consecutive indices are adjacent cells") {
    val order = 3
    val inv = (0 until 512).map(d => HilbertUtil.hilbert3Inverse(d, order))
    inv.sliding(2).foreach { case Seq((x1, y1, z1), (x2, y2, z2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"non-adjacent step ($x1,$y1,$z1) -> ($x2,$y2,$z2)")
    }
  }

  test("hilbert3 round trip at order 14") {
    val rng = new scala.util.Random(17)
    (0 until 500).foreach { _ =>
      val x = rng.nextInt(1 << 14).toLong
      val y = rng.nextInt(1 << 14).toLong
      val z = rng.nextInt(1 << 14).toLong
      val d = HilbertUtil.hilbert3(x, y, z, 14)
      assert(d >= 0 && d < (1L << 42))
      assert(HilbertUtil.hilbert3Inverse(d, 14) == ((x, y, z)), s"($x,$y,$z) via $d")
    }
  }

  test("hilbert3 aligned-block property: every sub-cube is one aligned contiguous block") {
    // The property ranges3's aligned-block trick rests on: each
    // axis-aligned sub-cube of side 2^k maps to a CONTIGUOUS index
    // block of length 8^k ALIGNED to a multiple of 8^k. Exhaustive at
    // order 4 over every level and every sub-cube.
    val order = 4; val side = 1 << order
    for (k <- 1 until order) {
      val s = 1 << k; val block = 1L << (3 * k)
      for (cx <- 0 until side by s; cy <- 0 until side by s; cz <- 0 until side by s) {
        val ds = for (x <- cx until cx + s; y <- cy until cy + s; z <- cz until cz + s)
          yield HilbertUtil.hilbert3(x, y, z, order)
        val lo = ds.min; val hi = ds.max
        assert(hi - lo + 1 == block && lo % block == 0 && ds.toSet.size == block.toInt,
          s"sub-cube ($cx,$cy,$cz) side $s: [$lo,$hi] not an aligned 8^$k block")
      }
    }
  }

  test("hilbert3 expression matches the util through the DataFrame path") {
    val rows = (0 until 200).map(i =>
      Row(i.toLong * 7 % 1500, i.toLong * 13 % 366, i.toLong * 5 % 24))
    val d = df("x bigint, y bigint, z bigint")(rows)
    val got = d.select(col("x"), col("y"), col("z"),
        HilbertFunctions.hilbert3(col("x"), col("y"), col("z")).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ==
        HilbertUtil.hilbert3(r.getLong(0), r.getLong(1), r.getLong(2), 14))
    }
  }

  test("ranges3 covers a window EXACTLY (exhaustive at order 2)") {
    val order = 2; val n = 1 << order
    for (xlo <- 0 until n; xhi <- xlo until n;
         ylo <- 0 until n; yhi <- ylo until n;
         zlo <- 0 until n; zhi <- zlo until n) {
      val want = (for (x <- xlo to xhi; y <- ylo to yhi; z <- zlo to zhi)
        yield HilbertUtil.hilbert3(x, y, z, order)).toSet
      val rs = HilbertRanges.ranges3(xlo, xhi, ylo, yhi, zlo, zhi, order,
        maxRanges = Int.MaxValue)
      val got = rs.flatMap { case (lo, hi) => lo to hi }.toSet
      assert(got == want, s"window [$xlo,$xhi]x[$ylo,$yhi]x[$zlo,$zhi]: $rs")
      rs.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1 + 1, s"unmerged: $rs")
        case _ =>
      }
    }
  }

  test("ranges3: random windows at order 14, coarsening over-covers") {
    val rng = new scala.util.Random(43)
    (0 until 50).foreach { _ =>
      val xlo = rng.nextInt(15000); val xhi = xlo + rng.nextInt(200)
      val ylo = rng.nextInt(300); val yhi = ylo + rng.nextInt(30)
      val zlo = rng.nextInt(20); val zhi = zlo + rng.nextInt(10)
      val exact = HilbertRanges.ranges3(xlo, xhi, ylo, yhi, zlo, zhi, 14,
        maxRanges = Int.MaxValue)
      (0 until 20).foreach { _ =>
        val x = xlo + rng.nextInt(xhi - xlo + 1).toLong
        val y = ylo + rng.nextInt(yhi - ylo + 1).toLong
        val z = zlo + rng.nextInt(zhi - zlo + 1).toLong
        val d = HilbertUtil.hilbert3(x, y, z, 14)
        assert(exact.exists { case (lo, hi) => d >= lo && d <= hi },
          s"cell ($x,$y,$z) d=$d escaped the cover")
      }
      val coarse = HilbertRanges.ranges3(xlo, xhi, ylo, yhi, zlo, zhi, 14,
        maxRanges = 8)
      assert(coarse.size <= 8)
      exact.foreach { case (lo, hi) =>
        assert(coarse.exists { case (clo, chi) => clo <= lo && hi <= chi },
          s"coarsening dropped [$lo,$hi]")
      }
    }
    assert(HilbertRanges.ranges3(5, 4, 0, 10, 0, 10, 14) == Nil)
    assert(HilbertRanges.ranges3(20000, 30000, 0, 10, 0, 10, 14) == Nil)
    assert(HilbertRanges.ranges3(0, 16383, 0, 16383, 0, 16383, 14) ==
      Seq((0L, (1L << 42) - 1)))
  }

  test("ranges3: adversarial wide window at order 20 stays budget-bounded") {
    val side = 1L << 20
    val t0 = System.nanoTime()
    val rs = HilbertRanges.ranges3(0, side - 1, 1000, 1002, 0, side - 1, 20,
      maxRanges = 32)
    assert((System.nanoTime() - t0) < 10e9, "budgeted 3-D cover took >10s")
    assert(rs.nonEmpty && rs.size <= 32)
    Seq(0L, side / 3, side / 2, side - 1).foreach { x =>
      val d = HilbertUtil.hilbert3(x, 1001L, side / 2, 20)
      assert(rs.exists { case (lo, hi) => lo <= d && d <= hi },
        s"cell ($x,1001,${side / 2}) -> $d not covered")
    }
  }

  test("locality beats Morton on window straddling (the sc7 claim in miniature)") {
    // Sort a 128x128 grid by each curve, cut into 64 equal "row groups",
    // and count groups whose [min,max] on BOTH axes overlap a fixed
    // 16x16 window. Hilbert's compact blobs must never do worse than
    // Morton's seamed Zs on this aggregate claim.
    val order = 7
    val cells = for (x <- 0 until 128; y <- 0 until 128) yield (x.toLong, y.toLong)
    def overlapping(key: (Long, Long) => Long): Int = {
      val sorted = cells.sortBy { case (x, y) => key(x, y) }
      sorted.grouped(256).count { g =>
        val xs = g.map(_._1); val ys = g.map(_._2)
        xs.max >= 40 && xs.min <= 55 && ys.max >= 40 && ys.min <= 55
      }
    }
    val h = overlapping(HilbertUtil.hilbert2(_, _, order))
    val m = overlapping(ZOrderUtil.morton2)
    assert(h <= m, s"hilbert straddled $h groups vs morton $m")
    assert(h <= 8, s"hilbert window spread too wide: $h of 64 groups")
  }
}
