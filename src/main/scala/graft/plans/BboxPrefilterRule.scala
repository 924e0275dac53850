package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.spatial.PointInPolygon

/** Optimizer rule (SURVEY.md §4 stretch): a `Filter` containing
  * `PointInPolygon(lon, lat, poly)` gains the conjunction
  * `lon BETWEEN poly.minX AND poly.maxX AND lat BETWEEN poly.minY AND
  * poly.maxY`. The custom expression itself can never reach the parquet
  * reader, but the injected range predicates are plain comparisons on
  * scan columns, so the data source prunes row groups / pushes filters —
  * at 100 TB that's the difference between scanning the world and
  * scanning the geofence. The exact ray-cast test still runs on the
  * survivors, so results are bit-identical with or without the rule.
  *
  * Idempotent: bounds are only added when not already syntactically
  * present in the filter condition.
  */
object BboxPrefilterRule extends Rule[LogicalPlan] {

  private def bounds(p: PointInPolygon): Seq[Expression] = Seq(
    GreaterThanOrEqual(p.lon, Literal(p.poly.minX)),
    LessThanOrEqual(p.lon, Literal(p.poly.maxX)),
    GreaterThanOrEqual(p.lat, Literal(p.poly.minY)),
    LessThanOrEqual(p.lat, Literal(p.poly.maxY)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val existing = cond.collect { case e => e.canonicalized }.toSet
      // Only for PIP predicates that must hold for the row to survive —
      // i.e. conjuncts of the top-level AND. A PIP under OR/NOT must not
      // contribute mandatory bounds.
      val conjuncts = splitConjuncts(cond)
      val pips = conjuncts.collect { case p: PointInPolygon => p }
      val extra = pips.flatMap(bounds).filterNot(b => existing.contains(b.canonicalized))
      if (extra.isEmpty) f
      else Filter(extra.foldLeft(cond)((acc, b) => And(acc, b)), child)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` for cluster
  * configs: the bbox-prefilter optimizer rule plus every graft SQL
  * function ([[GraftSqlFunctions]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => BboxPrefilterRule)
    GraftSqlFunctions.all.foreach(ext.injectFunction)
  }
}

object GraftOptimizations {
  /** Runtime enablement on an existing session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(BboxPrefilterRule))
      spark.experimental.extraOptimizations = cur :+ BboxPrefilterRule
  }
}
