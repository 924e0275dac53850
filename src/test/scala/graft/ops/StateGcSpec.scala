package graft.ops

import java.nio.file.Files
import graft.SparkSpec

/** State-generation GC: the verdict-16 contract — two fingerprints, a
  * live probe after every destructive pass, table AND layout kinds, and
  * the dry-run reporting shape. The spec family prefix `graft_specgc_`
  * scopes every sweep away from the real state families sharing the
  * test warehouse. */
class StateGcSpec extends SparkSpec {

  test("fingerprint key matching accepts exact/params/options forms only") {
    val fps = Set("10:111", "20:222")
    assert(StateGc.fpMatches("10:111", fps))
    assert(StateGc.fpMatches("10:111:tz=AWST,v=3", fps))      // eventsTag form
    assert(StateGc.fpMatches("20:222|parquet.block.size=1048576", fps)) // options form
    assert(!StateGc.fpMatches("10:112", fps))                 // rolled mtime
    assert(!StateGc.fpMatches("10:1110", fps))                // no bare-prefix match
    assert(!StateGc.fpMatches("30:333", fps))
  }

  test("GC keeps live generations, drops stale (second fingerprint) and dead ones") {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val src = Files.createTempDirectory("gcsrc")
    val fpFile = src.resolve("state.bin")
    Files.write(fpFile, "v1".getBytes)
    val f1 = ScaleOps.fileFingerprint(fpFile.toString)
    val tag = StateGc.tagOf(src.toString)
    val tbl = s"graft_specgc_tbl_$tag"
    val lay = new java.io.File(wh, s"graft_specgc_lay_$tag").toString
    ScaleOps.ensureBucketed(spark.range(10).toDF("id"), tbl, "id", 2, f1)
    ScaleOps.ensureSortedBy(spark.range(5).toDF("id"), lay, "id", 1, f1 + ":p=1")

    // Dry run against the live source: everything reports keep, nothing
    // is touched.
    val dry = StateGc.run(spark, wh, Seq(src.toString), "graft_specgc_").collect()
    assert(dry.length == 2 && dry.forall(_.getString(5) == "keep"))
    assert(dry.forall(r => r.getBoolean(2) && r.getBoolean(3) && r.getLong(4) > 0))
    assert(dry.map(_.getString(1)).sorted.toSeq == Seq("layout", "table"))

    // Destructive pass against the live source: still keep — and the
    // live probe: both generations read back intact.
    val live = StateGc.run(spark, wh, Seq(src.toString), "graft_specgc_",
      dryRun = false).collect()
    assert(live.forall(_.getString(5) == "keep"))
    assert(spark.table(tbl).count() == 10)
    assert(spark.read.parquet(lay).count() == 5)

    // Second fingerprint: the source file rolls (len AND mtime change),
    // so both generations are stale under a still-live tag — dropped.
    Thread.sleep(5)
    Files.write(fpFile, "v2-longer".getBytes)
    val stale = StateGc.run(spark, wh, Seq(src.toString), "graft_specgc_",
      dryRun = false).collect()
    assert(stale.length == 2 && stale.forall(_.getString(5) == "drop"))
    assert(stale.forall(r => r.getBoolean(2) && !r.getBoolean(3)))
    assert(!spark.catalog.tableExists(tbl))
    assert(!new java.io.File(lay).exists())

    // Dead source: rebuild under the new fingerprint, then GC with no
    // live dirs at all — tag_live false, dropped.
    val f2 = ScaleOps.fileFingerprint(fpFile.toString)
    ScaleOps.ensureBucketed(spark.range(3).toDF("id"), tbl, "id", 2, f2)
    val dead = StateGc.run(spark, wh, Seq.empty, "graft_specgc_",
      dryRun = false).collect()
    assert(dead.length == 1 && !dead.head.getBoolean(2) &&
      dead.head.getString(5) == "drop")
    assert(!spark.catalog.tableExists(tbl))
  }

  test("unfingerprinted generation under a live tag is kept (conservative)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val src = Files.createTempDirectory("gcsrc2")
    Files.write(src.resolve("x.bin"), "x".getBytes)
    val tag = StateGc.tagOf(src.toString)
    val dir = new java.io.File(wh, s"graft_specgc_nofp_$tag").toString
    spark.range(2).toDF("id").coalesce(1).write.mode("overwrite").parquet(dir)
    val r = StateGc.run(spark, wh, Seq(src.toString), "graft_specgc_",
      dryRun = false).collect()
    assert(r.length == 1 && r.head.getString(5) == "keep")
    assert(spark.read.parquet(dir).count() == 2)
    // and the same generation with the source gone is reclaimed
    val r2 = StateGc.run(spark, wh, Seq.empty, "graft_specgc_", dryRun = false).collect()
    assert(r2.length == 1 && r2.head.getString(5) == "drop")
  }

  test("colliding lossy tags: a generation serving the SHADOWED dir " +
    "survives a destructive pass (fingerprints union per tag)") {
    // tagOf is lossy: "<base>/gc a" and "<base>/gc_a" both render to
    // tag "..._gc_a". Before r17 liveDirs.toMap kept ONE dir's
    // fingerprints per tag, so a live generation keyed to the shadowed
    // dir's fingerprint was dropped as stale — GC deleting a
    // live-serving generation, the one failure it must never have.
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val base = Files.createTempDirectory("gccollide")
    val dirA = base.resolve("gc a"); Files.createDirectory(dirA)
    val dirB = base.resolve("gc_a"); Files.createDirectory(dirB)
    Files.write(dirA.resolve("a.bin"), "aaaa".getBytes)
    Thread.sleep(5) // distinct mtimes → distinct fingerprints
    Files.write(dirB.resolve("b.bin"), "bb-longer".getBytes)
    val tagA = StateGc.tagOf(dirA.toString)
    assert(tagA == StateGc.tagOf(dirB.toString), "fixture must collide")
    val fpB = ScaleOps.fileFingerprint(dirB.resolve("b.bin").toString)
    val gen = new java.io.File(wh, s"graft_specgc_collide_$tagA").toString
    try {
      // Generation keyed to dir B's fingerprint; both dirs declared live
      // (dir A listed FIRST, the order that used to shadow B's fps).
      ScaleOps.ensureSortedBy(spark.range(4).toDF("id"), gen, "id", 1, fpB)
      val r = StateGc.run(spark, wh, Seq(dirA.toString, dirB.toString),
        "graft_specgc_", dryRun = false).collect()
      assert(r.length == 1 && r.head.getString(5) == "keep",
        s"live-serving generation dropped under tag collision: ${r.toSeq}")
      assert(spark.read.parquet(gen).count() == 4)
    } finally {
      val d = new java.io.File(gen)
      if (d.exists()) ScaleOps.deleteLocal(d)
    }
  }

  test("concurrent demo audits sharing one warehouse do not clobber each " +
    "other (per-session family suffix — ADVICE r17)") {
    // Two sessions, interleaved destructive demoAudit cycles. Before the
    // per-session suffix, session B's scorched-earth pre-clean could
    // delete session A's freshly built live generation between build and
    // the post-GC probe — demoAudit's own require would then fail
    // spuriously. With the suffix each session sweeps only its own
    // family, so both must settle to the canonical 3-row report on
    // every iteration.
    val sf = "/root/testdata/sf0.001"
    val s2 = spark.newSession()
    val expected = Set(("dead", "drop"), ("live", "keep"), ("stale", "drop"))
    val ex = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val tasks = Seq(spark, s2).map { s =>
        ex.submit(new java.util.concurrent.Callable[Seq[Set[(String, String)]]] {
          def call(): Seq[Set[(String, String)]] = (1 to 3).map { _ =>
            StateGc.demoAudit(s, sf).collect()
              .map(r => (r.getString(0), r.getString(2))).toSet
          }
        })
      }
      tasks.foreach { t =>
        val reports = t.get(300, java.util.concurrent.TimeUnit.SECONDS)
        reports.foreach(r => assert(r == expected, s"clobbered report: $r"))
      }
    } finally { ex.shutdownNow(); () }
  }
}
