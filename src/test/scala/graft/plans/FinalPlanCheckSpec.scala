package graft.plans

import graft.SparkSpec
import graft.ops.ScaleOps
import org.apache.spark.sql.functions._

/** Pins the AQE-final layout watch (PlanChecks.watchFinalPlans): the
  * pre-execution REQUIREs assert the initial plan; the watch re-checks
  * every EXECUTED plan behind the QueryExecutionListener bus. Both
  * directions are pinned — a clean exchange-free probe records nothing
  * (including through the async listener path, flushed via the shim),
  * and a probe that re-shuffles the state on its own bucket key records
  * a violation (checked synchronously via checkFinalPlan, because a
  * deliberately-bad plan should not be executed just to see the bus
  * deliver it). */
class FinalPlanCheckSpec extends SparkSpec {
  import spark.implicits._

  private val table = "fpc_state"

  private def withState[A](f: => A): A =
    try {
      ScaleOps.ensureBucketed(
        (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"), table, "k", 4)
      f
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")

  test("clean bucketed probe records no violation through the listener bus") {
    withState {
      PlanChecks.drainFinalPlanViolations()
      PlanChecks.watchFinalPlans(spark, table, "spec state")
      val probe = Seq((2L, "x"), (5L, "y")).toDF("k", "p")
      spark.table(table).hint("merge").join(probe, Seq("k")).count()
      org.apache.spark.sql.GraftShim.flushListenerBus(spark)
      val vio = PlanChecks.drainFinalPlanViolations().filter(_.fragment == table)
      assert(vio.isEmpty, s"clean probe flagged: $vio")
    }
  }

  test("state re-shuffled on its own bucket key into a join IS flagged") {
    withState {
      PlanChecks.drainFinalPlanViolations()
      PlanChecks.watchFinalPlans(spark, table, "spec state")
      val probe = Seq((2L, "x"), (5L, "y")).toDF("k", "p")
      // The regression shape: an explicit repartition ON THE BUCKET KEY
      // between the state scan and its probe join — the exchange the
      // bucketing exists to delete.
      val bad = spark.table(table).repartition(8, col("k")).join(probe, Seq("k"))
      PlanChecks.checkFinalPlan(bad.queryExecution.executedPlan)
      val vio = PlanChecks.drainFinalPlanViolations().filter(_.fragment == table)
      assert(vio.nonEmpty, "bucket-key re-shuffle not flagged")
    }
  }

  test("a re-keying shuffle (different column) is NOT a violation") {
    withState {
      PlanChecks.drainFinalPlanViolations()
      PlanChecks.watchFinalPlans(spark, table, "spec state")
      val probe = Seq(("v2", 1L), ("v5", 2L)).toDF("v", "p")
      // Joining on a non-bucket column legitimately re-shuffles.
      val rekeyed = spark.table(table).join(probe.hint("merge"), Seq("v"))
      PlanChecks.checkFinalPlan(rekeyed.queryExecution.executedPlan)
      val vio = PlanChecks.drainFinalPlanViolations().filter(_.fragment == table)
      assert(vio.isEmpty, s"legitimate re-key flagged: $vio")
    }
  }
}
