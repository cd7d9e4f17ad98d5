#!/usr/bin/env bash
# Compile and run the library-consumer demo against the built classes.
# Usage: examples/run_demo.sh [sfDir]   (default /root/testdata/sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
sf=${1:-/root/testdata/sf0.001}

ADD_OPENS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io \
    java.net java.nio java.util java.util.concurrent \
    java.util.concurrent.atomic sun.nio.ch sun.nio.cs sun.security.action \
    sun.util.calendar; do
  printf -- "--add-opens java.base/%s=ALL-UNNAMED " "$p"
done)

out=$(mktemp -d /tmp/graft-demo.XXXXXX)
trap 'rm -rf "$out"' EXIT
java -cp "/opt/spark/jars/*" scala.tools.nsc.Main \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  -d "$out" examples/CurationDemo.scala
java $ADD_OPENS -Dspark.ui.enabled=false \
  -cp "$out:target/scala-2.13/classes:/opt/spark/jars/*" \
  CurationDemo "$sf"
