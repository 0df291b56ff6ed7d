#!/bin/bash
# Dev runner: java directly against compiled classes + /opt/spark/jars,
# skipping sbt JVM spawn overhead. Usage: dev/run.sh graft.Verify <args...>
set -e
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*:$HOME/.ivy2/cache/org.scala-lang/scala-library/jars/*"
OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
export LC_ALL=C.UTF-8
exec java $OPENS -Dfile.encoding=UTF-8 -Dsun.jnu.encoding=UTF-8 -Xmx"${SPARK_DRIVER_MEM:-8g}" -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp "$CP" "$@"
