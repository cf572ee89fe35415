ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hoardspark"
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
// forward run output verbatim (no [info] prefix) so the bench/verify
// JSON lines are machine-parseable from stdout
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
// Honest JVM sizing (r13 verdict item 2): local[N] runs N concurrent
// tasks in ONE driver JVM, so the heap must scale with the machine, not
// sit at a constant tuned for 8 tasks. The r13 driver bench collapsed
// 922s@32cores vs 335s@8cores on the same box because 32 tasks shared
// an 8 GB heap (~150 MB execution memory per task) and spilled every
// sort/join to a ~250 MB/s scratch disk. Default: 1/4 of physical RAM,
// clamped to [8g, 48g] — a machine-derived size that is identical at
// every core count (the driver benches the same box at 32 and 8 cores,
// so the heap must NOT depend on $SPARK_GRAFT_CPUS or the scaling
// comparison would measure two different JVMs). SPARK_DRIVER_MEM still
// overrides for experiments.
val defaultDriverMem: String = {
  val quarterGb: Long = scala.util.Try {
    val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
      .collectFirst { case l if l.startsWith("MemTotal:") =>
        "\\d+".r.findFirstIn(l).get.toLong }
      .getOrElse(32L * 1024 * 1024)
    kb / (1024 * 1024) / 4
  }.getOrElse(8L)
  s"${math.max(8L, math.min(48L, quarterGb))}g"
}
// Scratch placement (r13 verdict item 2, guide §6): every shuffle
// spill, streaming state-store commit, stream checkpoint and temp
// store build goes through java.io.tmpdir (Spark's local.dir defaults
// to it). This sandbox's root disk writes buffered data at ~4 MB/s
// with ~0.25 s/MB of SYSTEM time (dd conv=fsync: 256 MB in 66 s, 60 s
// sys — a throttled virtio device), which is what collapsed the
// r13 driver bench's streaming family (s3: 38.6 s on the disk vs
// 6.1 s on tmpfs, measured this round, same code). Production
// clusters put exactly this traffic on fast local NVMe via
// spark.local.dir; the single-node equivalent on a 128 GiB box is
// tmpfs. Default: /dev/shm/graft-scratch when /dev/shm has >= 32 GiB
// usable (a 64 MB container shm falls back to the system tmpdir);
// SPARK_GRAFT_SCRATCH overrides both ways — scale sweeps (sf >= 10
// write tens of GB of shuffle) should point it at a real disk.
val scratchDir: String = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.getUsableSpace > 32L * (1L << 30)) {
    val d = new java.io.File(shm, "graft-scratch")
    d.mkdirs()
    d.getAbsolutePath
  } else sys.props("java.io.tmpdir")
})
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultDriverMem)}",
  s"-Djava.io.tmpdir=$scratchDir",
)
