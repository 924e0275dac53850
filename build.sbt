ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ningalooturtleetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked program's stdout/stderr through RAW instead of via
// sbt's logger: the logger prefixes every stdout line with "[info] ",
// which breaks line-oriented JSON consumers of graft.Bench's single
// record line (a tail parser sees `[info] {"metric":...}` — not JSON).
// With StdoutOutput the record line is bare and machine-parseable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  // jdk.incubator.vector unlocks dev.ludovic.netlib's VectorBLAS (the
  // fastest pure-JVM BLAS tier — SIMD kernels, no native library): the
  // driver-side eigensolver (stats.ParallelEig) shards its GEMM/GEMV
  // work across threads, each calling the vectorized single-threaded
  // kernels. NOTE the flag itself requires a JDK that ships the
  // incubator module (16+; this toolchain is 17) — on such JDKs it is
  // a no-op for everything but netlib's tier selection, and only if
  // the MODULE were absent at runtime would netlib fall back to
  // Java11BLAS.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs ALL executor threads inside this one JVM: heap must
  // be sized per-core like a real executor would be (~0.75 GB/core
  // execution+storage for 32 task slots), not like a thin driver. At
  // 8g a full 168-query bench run degrades progressively — storage
  // eviction + GC thrash inflated the identical query set 243s -> 137s
  // when resized (measured on the round-11 host; single queries in
  // isolation were unaffected, so it is purely heap pressure, and 24g
  // still leaves ~100 GB of the host's RAM to the OS page cache).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
