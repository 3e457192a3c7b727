ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "featurefactoryspark"
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
// Pass forked stdout through unprefixed so the bench JSON line is parseable
// from the raw output (sbt would otherwise wrap it in [info]).
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK-8192647 mitigation: JNI GetPrimitiveArrayCritical sections
  // (java.util.zip Inflater/Deflater on the gzip/deflate/PDF-Flate
  // paths, zstd-jni on .warc.zst) stall GC; a concurrent allocating
  // thread retries only GCLockerRetryAllocationCount times (DEFAULT 2)
  // before throwing a SPURIOUS OutOfMemoryError — observed as a 2-WORD
  // "heap space" OOM killing a 32-thread bench at 8g with gigabytes
  // actually free. Fixed properly in JDK 21+ (GCLocker removed); on 17
  // raising the retry count is the standard mitigation.
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=64",
)
