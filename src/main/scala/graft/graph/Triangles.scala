package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected pair graph — the
  * local-clustering signal over the near-dup graph (a doc in many
  * triangles sits inside a densely inter-duplicated template family;
  * a doc whose near-dups are mutually unrelated is a hub of
  * coincidental collisions).
  *
  * The naive wedge enumeration pivots at every vertex and explodes on
  * hubs: a degree-d vertex yields d² wedges, so one boilerplate hub
  * dominates the shuffle. The standard fix (Suri & Vassilvitskii's
  * MR triangle counting): orient every edge from its lower-(degree,id)
  * endpoint to the higher, and enumerate wedges only at each vertex's
  * OUT-edges — out-degrees are bounded by O(sqrt(|E|)) regardless of
  * hub size, so wedge volume is Σ outdeg² = O(|E|^1.5) worst case and
  * skew-free in practice. Each triangle is then found exactly once, at
  * its lowest-(degree,id) corner. */
object Triangles {

  /** Per-node triangle membership counts over undirected `pairs`
    * (cols `id1` < `id2`, distinct). Returns (id, triangles) for nodes
    * in at least one triangle. */
  def perNodeCounts(pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("id1"), col("id2"))
    // Total degree per node (the orientation key) — from both endpoints.
    val deg = p.select(col("id1").as("id")).union(p.select(col("id2").as("id")))
      .groupBy("id").agg(count(lit(1)).as("_d"))
    // Orient each edge low -> high by (degree, id); carry nothing else.
    val d1 = deg.select(col("id").as("id1"), col("_d").as("_d1"))
    val d2 = deg.select(col("id").as("id2"), col("_d").as("_d2"))
    val oriented = p.join(d1, Seq("id1")).join(d2, Seq("id2"))
      .select(
        when(col("_d1") < col("_d2") ||
          (col("_d1") === col("_d2") && col("id1") < col("id2")),
          struct(col("id1").as("src"), col("id2").as("dst")))
          .otherwise(struct(col("id2").as("src"), col("id1").as("dst")))
          .as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
    // Wedges at each vertex's out-edges (dst1 < dst2 dedups the pair),
    // closed by the UNDIRECTED edge between the two endpoints — probe
    // the canonical id-sorted pair set, which contains every edge once.
    val e1 = oriented.select(col("src"), col("dst").as("_x"))
    val e2 = oriented.select(col("src"), col("dst").as("_y"))
    val wedges = e1.join(e2, Seq("src")).filter(col("_x") < col("_y"))
    val closing = p.select(
      least(col("id1"), col("id2")).as("_x2"),
      greatest(col("id1"), col("id2")).as("_y2"))
    val tri = wedges.join(closing,
      least(col("_x"), col("_y")) === col("_x2") &&
        greatest(col("_x"), col("_y")) === col("_y2"))
      .select(col("src").as("a"), col("_x").as("b"), col("_y").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }
}
