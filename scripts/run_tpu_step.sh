#!/bin/bash
# run_tpu_step.sh <logfile> <stall_secs> <cmd...>
#
# Runs one TPU job with a hang watchdog: twice this round a process lost
# its tunnel TCP connection mid-compile (relay stayed up, ESTAB pair
# vanished) and blocked forever on a futex. Restart the step (≤3
# attempts) when its log has been quiet for stall_secs AND no tunnel
# connection exists; a quiet log WITH a live connection is a normal long
# remote compile and is left alone.
log=$1; stall=$2; shift 2
for attempt in 1 2 3; do
  : > "$log"
  setsid "$@" >> "$log" 2>&1 &
  pid=$!
  stalled=0
  while kill -0 "$pid" 2>/dev/null; do
    sleep 30
    age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    conns=$(ss -tnH 'sport = :8083 or dport = :8083' 2>/dev/null | wc -l)
    if [ "$age" -gt "$stall" ] && [ "$conns" -eq 0 ]; then
      echo "[watchdog] log quiet ${age}s + no tunnel conn: kill attempt $attempt" >> "$log"
      stalled=1
      kill -- -"$pid" 2>/dev/null; sleep 5
      kill -9 -- -"$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"; rc=$?
  if [ "$stalled" -eq 0 ]; then
    exit "$rc"          # clean exit (success or a real failure)
  fi
  sleep 10
done
echo "[watchdog] gave up after 3 stalled attempts" >> "$log"
exit 1
