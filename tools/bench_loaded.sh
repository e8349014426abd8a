#!/bin/bash
# Loaded-mode bench: run graft.Bench under a DELIBERATE background
# stressor (CPU spinners + an IO churner), the contention profile a
# shared judge/CI machine shows — a 100 TB cluster runs under contention
# as the normal case, so the gate must hold there, not only quiet.
#
# Usage: bench_loaded.sh [out.json] [sfDir] [nSpin]
#   out.json defaults to /tmp/bench_loaded.json
#   sfDir    defaults to /root/testdata/sf0.1
#   nSpin    CPU spinners, defaults to half the cores
#
# Gate the result with family-aware normalization (family-correlated IO
# amplification is load, not regression — clamped so a real family-wide
# regression still fails):
#   python3 tools/check_bench.py /tmp/bench_loaded.json --per-family
set -u
OUT="${1:-/tmp/bench_loaded.json}"
SF="${2:-/root/testdata/sf0.1}"
CORES=$(nproc)
NSPIN="${3:-$((CORES / 2))}"

PIDS=()
cleanup() {
  for p in "${PIDS[@]}"; do kill "$p" 2>/dev/null; done
  # the churner's in-flight dd is a CHILD of the killed sh and survives
  # it — reap it too, then remove the stress file AFTER the writers are
  # gone (an rm before the kill gets recreated by the surviving dd)
  pkill -f '/tmp/.bench_stress_io' 2>/dev/null
  wait 2>/dev/null
  rm -f /tmp/.bench_stress_io
}
trap cleanup EXIT

# CPU pressure: nSpin busy loops
for _ in $(seq 1 "$NSPIN"); do
  sh -c 'while :; do :; done' &
  PIDS+=($!)
done
# IO pressure: continuous 256 MiB write+read churn in tmp
sh -c 'while :; do dd if=/dev/zero of=/tmp/.bench_stress_io bs=1M count=256 conv=fsync 2>/dev/null; cat /tmp/.bench_stress_io > /dev/null; done' &
PIDS+=($!)

CP=$(ls /opt/spark/jars/*.jar | paste -sd:):target/scala-2.13/classes
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="$OUT" java -cp "$CP" \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  -Xmx24g graft.Bench
