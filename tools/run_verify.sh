#!/bin/bash
# usage: run_verify.sh <sfDir> <outDir> [names]
CP=$(ls /opt/spark/jars/*.jar | paste -sd:):target/scala-2.13/classes
exec java -cp "$CP" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  -Xmx24g graft.Verify "$@"
