package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, FilterExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Executed-plan shape assertions for the registered queries whose SCALE
  * claim is a layout property ("the persisted state is probed
  * exchange-free", "nothing sketches the full corpus") — REQUIREd from
  * the EXECUTED plan, not from comments, so a regression in the physical
  * strategy fails the correctness gate instead of silently reintroducing
  * a shuffle. Pure read-only traversal helpers; no Catalyst mutation. */
object PlanChecks {

  /** Children, descending THROUGH the indirections a plain `.children`
    * walk stops at: cached relations (InMemoryTableScan → the cached
    * plan — a CacheOnce'd stage hides its producing plan there), reused
    * exchanges, and AQE wrappers. Without this, a layout REQUIRE goes
    * vacuously green the moment the stage under test is cached. */
  def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case im: InMemoryTableScanExec => Seq(im.relation.cachedPlan)
    case r: ReusedExchangeExec     => Seq(r.child)
    case a: AdaptiveSparkPlanExec  => Seq(a.executedPlan)
    case q: QueryStageExec         => Seq(q.plan)
    case other                     => other.children
  }

  /** Every root→target path (inclusive at both ends) to a node matching
    * `isTarget`, via [[kids]]. */
  def pathsTo(p: SparkPlan)(isTarget: SparkPlan => Boolean): Seq[List[SparkPlan]] =
    if (isTarget(p)) Seq(List(p))
    else kids(p).flatMap(c => pathsTo(c)(isTarget).map(p :: _))

  /** All file scans whose relation root path mentions `pathFragment`,
    * with their root→scan paths. */
  def fileScanPaths(plan: SparkPlan,
                    pathFragment: String): Seq[(FileSourceScanExec, List[SparkPlan])] =
    pathsTo(plan) {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",").contains(pathFragment)
      case _ => false
    }.map(path => (path.last.asInstanceOf[FileSourceScanExec], path))

  /** True when the scan or a Filter on its path carries a predicate whose
    * string rendering contains `fragment` (e.g. the increment split's
    * `% 3`) — the "this scan is NOT the unfiltered corpus" witness. */
  def pathHasPredicate(scan: FileSourceScanExec, path: List[SparkPlan],
                       fragment: String): Boolean =
    scan.dataFilters.exists(_.toString.contains(fragment)) ||
      path.exists {
        case f: FilterExec => f.condition.toString.contains(fragment)
        case _             => false
      }

  /** True when a left-semi join sits on the path above the scan — the
    * collision-pruning witness for a state-side text rescan. */
  def pathHasLeftSemi(path: List[SparkPlan]): Boolean =
    path.exists {
      case j: BaseJoinExec => j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi
      case _               => false
    }

  /** All joins whose two subtrees scan files matching `fragA` and
    * `fragB` respectively (either orientation) — the delta-join-rule
    * counting witness: an IVM merge plan joining table A against table
    * B more often than its delta terms allow is recomputing history. */
  def joinsBetween(plan: SparkPlan, fragA: String,
                   fragB: String): Seq[BaseJoinExec] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p +: kids(p).flatMap(walk)
    def scansOf(p: SparkPlan): Set[String] = walk(p).collect {
      case f: FileSourceScanExec => f.relation.location.rootPaths.mkString(",")
    }.toSet
    walk(plan).collect {
      case j: BaseJoinExec
        if scansOf(j).exists(_.contains(fragA)) &&
           scansOf(j).exists(_.contains(fragB)) => j
    }
  }

  /** REQUIREs that a bucketed file scan exists in `plan` and that NO
    * shuffle exchange sits between the join consuming it and the scan —
    * i.e. the persisted state enters its probe join riding its
    * bucketing. Downstream stages above that join may shuffle
    * legitimately; the claim is only about the state side's path. */
  def requireExchangeFreeBucketedProbe(plan: SparkPlan, what: String): Unit = {
    // EVERY bucketed-scan path is asserted, not an arbitrary first one:
    // a plan carrying two bucketed scans (state + some other persisted
    // table) would otherwise let the un-inspected one re-shuffle behind
    // a green REQUIRE.
    val paths = pathsTo(plan) {
      case f: FileSourceScanExec => f.relation.bucketSpec.isDefined && f.bucketedScan
      case _                     => false
    }
    require(paths.nonEmpty,
      s"$what did not plan a bucketed scan — the persisted bucket layout regressed")
    paths.foreach { path =>
      val joinIdx = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
      require(joinIdx >= 0, s"no join consumes the bucketed $what scan")
      require(!path.drop(joinIdx + 1).exists(_.isInstanceOf[ShuffleExchangeLike]),
        s"Exchange between the probe join and the bucketed $what scan — " +
          "the state side re-shuffled despite its bucketing")
    }
  }

  /** REQUIRE: on every path matching `pathFragment` from the consuming
    * join down to the file scan, no Sort sits between them — the
    * sorted-CTAS claim. A bucketed table written sortBy(joinKeys) with
    * ONE file per bucket exposes its ordering at the scan, so the
    * sort-merge probe's state-side Sort must vanish; a Sort here means
    * the layout regressed (multi-file buckets, wrong sort columns, or
    * a stale pre-sortCols generation) and every refresh is paying a
    * full |state| re-sort it was designed not to (r16 advisory: two
    * 33M-row sorts per triangle refresh at 100×). */
  def requireSortFreeBucketedScan(plan: SparkPlan, pathFragment: String,
                                  what: String): Unit = {
    val paths = fileScanPaths(plan, pathFragment).map(_._2)
    require(paths.nonEmpty,
      s"$what: no file scan matching '$pathFragment' in the plan")
    paths.foreach { path =>
      val joinIdx = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
      val below = if (joinIdx >= 0) path.drop(joinIdx + 1) else path
      require(!below.exists(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]),
        s"$what: a Sort re-sorts the bucketed scan below its consuming " +
          s"join — the sorted bucket layout regressed:\n${path.mkString("\n")}")
    }
  }

  // ---- AQE-FINAL re-check -------------------------------------------
  // requireExchangeFreeBucketedProbe asserts the plan BEFORE execution
  // (AQE's initial plan): a runtime re-plan could, in principle, slip a
  // shuffle under a green REQUIRE. The final-plan watch closes that
  // window: queries register their state tables' path fragments, a
  // QueryExecutionListener walks every successfully executed FINAL plan
  // (kids() descends AdaptiveSparkPlanExec.executedPlan, which holds
  // the post-replan tree), and any scan of a watched state table that
  // feeds a join through a shuffle is RECORDED — not thrown, because
  // listener exceptions are swallowed by the bus and delivery is async;
  // instead Verify prints the drained list loudly and
  // FinalPlanCheckSpec pins both the clean and the violating shape.

  final case class FinalPlanViolation(what: String, fragment: String)

  private val watchedFragments =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(String, String)]()
  private val finalViolations =
    new java.util.concurrent.CopyOnWriteArrayList[FinalPlanViolation]()
  private val watchedSessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[org.apache.spark.sql.SparkSession, java.lang.Boolean]())

  /** Watch `pathFragment` (a state table/path name) in every plan this
    * session executes from now on: a scan of it that reaches a join
    * through a ShuffleExchange records a [[FinalPlanViolation]].
    * Unlike the pre-execution REQUIRE this covers the scan whether or
    * not the bucketed read survived (a state side demoted to a
    * non-bucketed read and reshuffled is exactly the regression), and
    * it sees the plan AQE actually ran. Idempotent per (session,
    * fragment). */
  def watchFinalPlans(spark: org.apache.spark.sql.SparkSession,
                      pathFragment: String, what: String): Unit = {
    watchedFragments.add((pathFragment, what))
    if (watchedSessions.add(spark)) {
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 durationNs: Long): Unit =
            checkFinalPlan(qe.executedPlan)
          override def onFailure(funcName: String,
                                 qe: org.apache.spark.sql.execution.QueryExecution,
                                 exception: Exception): Unit = ()
        })
    }
  }

  /** Walk one (final) plan against every watched fragment — exposed for
    * the spec, which needs synchronous assertions the async listener
    * bus can't give. The violation is precisely "the state re-shuffled
    * ON ITS OWN BUCKET KEY on the way into a join" — the exchange its
    * bucketing exists to delete. A watched scan with no join above it
    * is fine (the prep CTAS reads its own table), and a shuffle that
    * RE-KEYS the data (degree aggregation over a union, a
    * different-key downstream stage) is a real repartition, not a
    * layout regression — both are deliberately not flagged, so the
    * watch can run globally without false-positiving legitimate plans.
    * (Conservative by name: a rename between scan and shuffle hides
    * the match — an under-approximation, never a false alarm.) */
  private[graft] def checkFinalPlan(plan: SparkPlan): Unit =
    watchedFragments.forEach { case (fragment, what) =>
      fileScanPaths(plan, fragment).foreach { case (scan, path) =>
        val joinIdx = path.lastIndexWhere(_.isInstanceOf[BaseJoinExec])
        val bucketCols = scan.relation.bucketSpec
          .map(_.bucketColumnNames.toSet).getOrElse(Set.empty)
        if (joinIdx >= 0 && bucketCols.nonEmpty) {
          val rekeyedOnBucketCols = path.drop(joinIdx + 1).exists {
            case sh: ShuffleExchangeLike => sh.outputPartitioning match {
              case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
                val names = h.expressions.collect {
                  case a: org.apache.spark.sql.catalyst.expressions.AttributeReference => a.name
                }.toSet
                names == bucketCols
              case _ => false
            }
            case _ => false
          }
          if (rekeyedOnBucketCols)
            finalViolations.add(FinalPlanViolation(what, fragment))
        }
      }
    }

  /** Return and clear the recorded violations. */
  def drainFinalPlanViolations(): Seq[FinalPlanViolation] = {
    import scala.jdk.CollectionConverters._
    val out = finalViolations.asScala.toList
    finalViolations.clear()
    out
  }
}
