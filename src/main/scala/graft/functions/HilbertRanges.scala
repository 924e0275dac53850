package graft.functions

import scala.collection.mutable.ArrayBuffer

/** BIGMIN-style query decomposition for the Hilbert-clustered layout:
  * a 2-D window [xlo,xhi]×[ylo,yhi] becomes a small set of CONTIGUOUS
  * Hilbert-index intervals, so a table sorted by `hilbert2(x, y)` can
  * be range-predicated on the sort key ITSELF. That is the scale-safe
  * plan: per-dimension footer stats happen to be tight on a
  * Hilbert-clustered table today, but with more dimensions, wider row
  * groups, or a store that only keeps stats for the cluster key, the
  * dimension columns' [min,max] stop pruning — the cluster key's own
  * stats always do, because the layout is sorted by it (cf. Lawder &
  * King's Hilbert range-query decomposition; the BIGMIN/LITMAX walk
  * published for UB-trees is the Morton analog).
  *
  * The cover is computed by quadrant recursion mirroring
  * [[HilbertUtil.hilbert2]]'s own rotate-and-accumulate frames: a
  * quadrant fully inside the window contributes its whole contiguous
  * index block without descending; a partial quadrant recurses with
  * the window mapped through that quadrant's coordinate transform; a
  * disjoint quadrant is skipped. The exact cover is then coarsened to
  * at most `maxRanges` intervals by closing the SMALLEST inter-range
  * gaps first — coarsening only ever OVER-covers, so callers keep the
  * exact per-dimension predicates as the residual row filter and the
  * key ranges stay a safe pre-filter (false positives re-filtered,
  * never false negatives).
  */
object HilbertRanges {

  /** Hilbert-index intervals (inclusive, sorted, disjoint) covering
    * every cell of [xlo,xhi]×[ylo,yhi] on the 2^order grid. The window
    * is clipped to the grid; an empty window yields no ranges. At most
    * `maxRanges` intervals are returned (over-covering when coarsened).
    */
  def ranges(xlo: Long, xhi: Long, ylo: Long, yhi: Long, order: Int,
             maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(order >= 1 && order <= 31, "hilbert ranges: order must be in [1, 31]")
    require(maxRanges >= 1, "hilbert ranges: maxRanges must be >= 1")
    val side = 1L << order
    val cxlo = math.max(xlo, 0L); val cxhi = math.min(xhi, side - 1)
    val cylo = math.max(ylo, 0L); val cyhi = math.min(yhi, side - 1)
    if (cxlo > cxhi || cylo > cyhi) return Nil
    val out = ArrayBuffer.empty[(Long, Long)]
    // The EXACT cover is O(window perimeter) intervals — at order 31 an
    // adversarial grid-wide window would allocate billions of tuples
    // before coarsening ever ran. The walk therefore carries an
    // interval budget (a small multiple of maxRanges: enough slack for
    // the gap-ranked coarsening to pick good separators); once spent,
    // partial quadrants emit their WHOLE contiguous block instead of
    // descending. That only ever over-covers — exactly the coarsening
    // contract callers already re-filter behind.
    cover(order, cxlo, cxhi, cylo, cyhi, 0L, out, maxRanges.toLong * 64L)
    coarsen(merge(out), maxRanges)
  }

  /** 3-D analog of [[ranges]]: Hilbert-index intervals (inclusive,
    * sorted, disjoint) covering every cell of
    * [xlo,xhi]×[ylo,yhi]×[zlo,zhi] on the 2^order cube, against
    * [[HilbertUtil.hilbert3]]. At most `maxRanges` intervals are
    * returned (over-covering when coarsened) — the (user, day, hour)
    * layout predicate for a table sorted by `hilbert3`.
    *
    * Unlike the 2-D walk, the cover does NOT mirror the curve's
    * per-octant coordinate transforms (Skilling's construction makes
    * those state-dependent and fiddly). It exploits the one property
    * any Hilbert curve has BY CONSTRUCTION: every axis-aligned
    * sub-cube of side 2^k maps to one contiguous index block of
    * length 8^k, aligned to a multiple of 8^k (the curve fills each
    * octant completely before leaving it, at every level — pinned
    * exhaustively in HilbertSpec). So the walk recurses over GLOBAL
    * octant cubes, and a cube that is fully inside the window (or hit
    * by the budget) emits its whole block as
    * `d − (d mod 8^k)` where d is the full-order index of ANY of its
    * cells — no inverse orientation state machine needed.
    */
  def ranges3(xlo: Long, xhi: Long, ylo: Long, yhi: Long,
              zlo: Long, zhi: Long, order: Int,
              maxRanges: Int = 32): Seq[(Long, Long)] = {
    require(order >= 1 && order <= 20, "hilbert ranges3: order must be in [1, 20]")
    require(maxRanges >= 1, "hilbert ranges3: maxRanges must be >= 1")
    val side = 1L << order
    val cxlo = math.max(xlo, 0L); val cxhi = math.min(xhi, side - 1)
    val cylo = math.max(ylo, 0L); val cyhi = math.min(yhi, side - 1)
    val czlo = math.max(zlo, 0L); val czhi = math.min(zhi, side - 1)
    if (cxlo > cxhi || cylo > cyhi || czlo > czhi) return Nil
    val out = ArrayBuffer.empty[(Long, Long)]
    // Same budget contract as the 2-D walk: the exact 3-D cover is
    // O(window surface) intervals; once the budget is spent, partial
    // octants emit their whole aligned block (over-cover only).
    cover3(order, 0L, 0L, 0L, cxlo, cxhi, cylo, cyhi, czlo, czhi, order,
      out, maxRanges.toLong * 64L)
    coarsen(merge(out), maxRanges)
  }

  /** Recursive global-octant walk for [[ranges3]]. The cube has corner
    * (cx, cy, cz) and side 2^k; the window is clipped to the grid and
    * known to intersect the cube. */
  private def cover3(k: Int, cx: Long, cy: Long, cz: Long,
                     xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                     zlo: Long, zhi: Long, order: Int,
                     out: ArrayBuffer[(Long, Long)], budget: Long): Unit = {
    val s = 1L << k
    if ((xlo <= cx && cx + s - 1 <= xhi &&
         ylo <= cy && cy + s - 1 <= yhi &&
         zlo <= cz && cz + s - 1 <= zhi) || out.size >= budget) {
      val block = 1L << (3 * k)
      val d = HilbertUtil.hilbert3(cx, cy, cz, order)
      val start = d - (d & (block - 1))
      out += ((start, start + block - 1)); return
    }
    val h = s >> 1
    var oct = 0
    while (oct < 8) {
      val ox = cx + (if ((oct & 1) != 0) h else 0L)
      val oy = cy + (if ((oct & 2) != 0) h else 0L)
      val oz = cz + (if ((oct & 4) != 0) h else 0L)
      if (xlo <= ox + h - 1 && ox <= xhi &&
          ylo <= oy + h - 1 && oy <= yhi &&
          zlo <= oz + h - 1 && oz <= zhi)
        cover3(k - 1, ox, oy, oz, xlo, xhi, ylo, yhi, zlo, zhi, order,
          out, budget)
      oct += 1
    }
  }

  /** Recursive quadrant walk. The window is non-empty and clipped to
    * the current frame's [0, 2^k)² grid; the frame's curve spans
    * indices [d0, d0 + 4^k). Quadrants are visited in curve order
    * (rx,ry) = (0,0),(0,1),(1,1),(1,0) — quadrant q's sub-curve starts
    * at d0 + q·s² — and the window is mapped into each sub-curve's
    * canonical frame by the same transform hilbert2 applies to points:
    * lower-left reflects across the main diagonal, lower-right across
    * the anti-diagonal, the upper half passes through untouched.
    * Interval boxes stay interval boxes under all three. */
  private def cover(k: Int, xlo: Long, xhi: Long, ylo: Long, yhi: Long,
                    d0: Long, out: ArrayBuffer[(Long, Long)],
                    budget: Long): Unit = {
    val side = 1L << k
    if (xlo == 0 && ylo == 0 && xhi == side - 1 && yhi == side - 1
      || out.size >= budget) {
      out += ((d0, d0 + side * side - 1)); return
    }
    val s = side >> 1
    var q = 0
    while (q < 4) {
      val rx = if (q == 2 || q == 3) 1L else 0L
      val ry = if (q == 1 || q == 2) 1L else 0L
      val qxlo = math.max(xlo, rx * s); val qxhi = math.min(xhi, rx * s + s - 1)
      val qylo = math.max(ylo, ry * s); val qyhi = math.min(yhi, ry * s + s - 1)
      if (qxlo <= qxhi && qylo <= qyhi) {
        val lxlo = qxlo - rx * s; val lxhi = qxhi - rx * s
        val lylo = qylo - ry * s; val lyhi = qyhi - ry * s
        val base = d0 + q * s * s
        if (ry == 1L) cover(k - 1, lxlo, lxhi, lylo, lyhi, base, out, budget)
        else if (rx == 0L) cover(k - 1, lylo, lyhi, lxlo, lxhi, base, out, budget)
        else cover(k - 1, s - 1 - lyhi, s - 1 - lylo, s - 1 - lxhi, s - 1 - lxlo,
          base, out, budget)
      }
      q += 1
    }
  }

  /** Sort + merge adjacent/overlapping intervals. */
  private def merge(rs: ArrayBuffer[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = rs.sortBy(_._1)
    val acc = ArrayBuffer.empty[(Long, Long)]
    sorted.foreach { case (lo, hi) =>
      if (acc.nonEmpty && lo <= acc.last._2 + 1)
        acc(acc.size - 1) = (acc.last._1, math.max(acc.last._2, hi))
      else acc += ((lo, hi))
    }
    acc.toVector
  }

  /** Close the smallest gaps until at most `max` intervals remain —
    * each closed gap admits false positives (re-filtered by the exact
    * dimension predicates) but never drops a covered index. */
  private def coarsen(rs: Vector[(Long, Long)], max: Int): Vector[(Long, Long)] = {
    if (rs.size <= max) return rs
    // Gap i sits between rs(i) and rs(i+1); keep the (max-1) LARGEST
    // gaps as separators, close the rest.
    val gaps = rs.indices.dropRight(1)
      .map(i => (rs(i + 1)._1 - rs(i)._2, i))
      .sortBy(-_._1)
    val keep = gaps.take(max - 1).map(_._2).toSet
    val acc = ArrayBuffer.empty[(Long, Long)]
    var curLo = rs.head._1
    var curHi = rs.head._2
    rs.indices.dropRight(1).foreach { i =>
      if (keep(i)) { acc += ((curLo, curHi)); curLo = rs(i + 1)._1 }
      curHi = rs(i + 1)._2
    }
    acc += ((curLo, curHi))
    acc.toVector
  }
}
