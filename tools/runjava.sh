#!/bin/bash
# Runs a graft main class with the same JVM flags sbt's fork injects
# (build.sbt javaOptions): Spark 4.x on JDK 17 needs the add-opens set.
# Usage: runjava.sh [-Xmx…] <mainClass> [args...]
XMX="-Xmx${SPARK_DRIVER_MEM:-24g}"
if [[ "$1" == -Xmx* ]]; then XMX="$1"; shift; fi
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
exec java -cp "$CP" \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  --add-opens java.security.jgss/sun.security.krb5=ALL-UNNAMED \
  -XX:+IgnoreUnrecognizedVMOptions \
  -Djdk.reflect.useDirectMethodHandleAccessor=false \
  -Dio.netty.tryReflectionSetAccessible=true \
  -Dio.netty.allocator.type=pooled \
  --enable-native-access=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  "$XMX" \
  "$@"
