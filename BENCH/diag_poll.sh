#!/bin/bash
# Poll JVM code cache + metaspace + Python worker RSS while a bench session
# runs. Usage: diag_poll.sh <outfile>. Stops when no rps_bench JVM remains.
OUT="$1"
: > "$OUT"
# wait for the bench JVM to appear
for i in $(seq 1 60); do
  PID=$(pgrep -f 'java.*rps_bench|java.*pyspark-shell' | head -1)
  [ -n "$PID" ] && break
  sleep 2
done
[ -z "$PID" ] && { echo "no JVM found" >> "$OUT"; exit 1; }
echo "jvm_pid=$PID" >> "$OUT"
while kill -0 "$PID" 2>/dev/null; do
  TS=$(date +%s)
  CC=$(jcmd "$PID" Compiler.codecache 2>/dev/null | grep -E 'CodeHeap|CodeCache' | tr '\n' '|')
  MS=$(jcmd "$PID" VM.metaspace 2>/dev/null | grep -E '^  Both:' | head -1)
  JRSS=$(awk '/VmRSS/{print $2}' /proc/$PID/status 2>/dev/null)
  PYW=$(pgrep -f pyspark.daemon | wc -l)
  PYRSS=$(pgrep -f pyspark.daemon | xargs -I{} awk '/VmRSS/{print $2}' /proc/{}/status 2>/dev/null | awk '{s+=$1} END {print s+0}')
  FULLMSG=$(jcmd "$PID" VM.flags 2>/dev/null | grep -o 'ReservedCodeCacheSize=[0-9]*' | head -1)
  echo "t=$TS jvm_rss_kb=$JRSS py_workers=$PYW py_rss_kb=$PYRSS $FULLMSG cc={$CC}" >> "$OUT"
  sleep 10
done
echo "done" >> "$OUT"
