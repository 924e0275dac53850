package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deterministic HLL-register sketch behind ivm_daily_users_hll:
  * the IVM invariant (registers merged by max across any split of the
  * events equal the registers of the whole — the property that makes
  * sketch state maintainable), register-count bounds, and loose
  * accuracy bands for the fixed-point estimate (LC regime small, raw
  * HLL regime large). */
class HllSketchSpec extends SparkSpec {
  import spark.implicits._

  private def events(users: Seq[Long], day: String = "2024-01-05") =
    users.zipWithIndex.map { case (u, i) => (day, "click", u, i.toLong) }
      .toDF("d", "event_type", "user_id", "event_id")
      .select(to_timestamp(col("d")).as("ts"), col("event_type"),
        col("user_id"), col("event_id"))

  private def estOf(users: Seq[Long]): (Double, Long) = {
    val row = CorpusQueries.hllPresent(CorpusQueries.hllRegisters(events(users)))
      .select(col("users_est_milli"), col("v_zero")).head()
    (row.getLong(0) / 1000.0, row.getLong(1))
  }

  test("merge-of-sketches == sketch-of-all across arbitrary splits") {
    val rnd = new scala.util.Random(11)
    val users = Seq.fill(400)(rnd.nextLong().abs % 10000)
    val (a, b) = users.partition(_ => rnd.nextBoolean())
    val whole = CorpusQueries.hllRegisters(events(users))
    val merged = CorpusQueries.hllRegisters(events(a))
      .unionByName(CorpusQueries.hllRegisters(events(b)))
      .groupBy("obs_date", "event_type", "bucket").agg(max(col("r")).as("r"))
    val w = whole.as[(java.sql.Date, String, Long, Int)].collect().toSet
    val m = merged.as[(java.sql.Date, String, Long, Int)].collect().toSet
    assert(w == m)
  }

  test("at most 64 registers per group; rho in 1..59") {
    val regs = CorpusQueries.hllRegisters(events((1L to 5000L)))
      .as[(java.sql.Date, String, Long, Int)].collect()
    assert(regs.length <= 64)
    assert(regs.forall(r => r._3 >= 0 && r._3 < 64))
    assert(regs.forall(r => r._4 >= 1 && r._4 <= 59))
  }

  test("small range rides linear counting; duplicate users do not move it") {
    val (est, vz) = estOf(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(vz > 0)
    assert(est > 4 && est < 14, s"LC estimate $est for 8 users")
    // distinct-ness: repeating every user 10x leaves registers unchanged
    val (est2, _) = estOf(Seq.fill(10)(Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)).flatten)
    assert(est == est2)
  }

  test("large range within the m=64 error band (~13% sigma; assert 3 sigma)") {
    val (est, _) = estOf((1L to 2000L))
    assert(math.abs(est - 2000) / 2000.0 < 0.40, s"estimate $est for 2000 users")
  }
}
