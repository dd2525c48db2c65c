ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduce_4sl08spark"
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
  // the rest of spark-submit's injected defaults (JavaModuleOptions):
  // without the netty flags, shuffle/broadcast buffers silently fall back
  // from pooled direct memory to per-allocation heap buffers
  "-XX:+IgnoreUnrecognizedVMOptions",
  "--add-opens=java.security.jgss/sun.security.krb5=ALL-UNNAMED",
  "-Djdk.reflect.useDirectMethodHandleAccessor=false",
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dio.netty.allocator.type=pooled",
  "--enable-native-access=ALL-UNNAMED",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs the whole "cluster" in one JVM: 32 concurrent tasks
  // share this heap, and the wide LSH/join intermediates at sf0.1 GC-thrash
  // an 8g heap (measured: MinHash dedup 3x slower at 8g than 24g)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Xms=Xmx: avoids adaptive heap-resize churn between the bench's
  // per-query System.gc() calls (r13). The COLLECTOR stays the JVM
  // default (G1): ParallelGC was tried against the r12 "interference"
  // hypothesis — per-stage jvmGCTime drops to ~0 and one sx02 profile
  // halved — but a 3x-interleaved A/B on the six most GC-suspect
  // queries measured a wash in wall (PGC median 14.65 s vs G1 15.01 s
  // for the set), so the non-default flag is not kept.
  // SPARK_GRAFT_GC remains a measurement override.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_GRAFT_GC").toSeq
