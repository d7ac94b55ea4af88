#!/bin/bash
# Poll the host-health probe; when a healthy window appears, run the full
# bench (+ scaling) and exit. Writes /tmp/bench_r5_healthy.json on success.
# Gives up after MAX_WAIT_SEC of polling and runs one final bench anyway
# (self-labeling: host_throttled will be true in the artifact).
cd /root/repo || exit 1
MAX_WAIT_SEC=${MAX_WAIT_SEC:-14400}
POLL_SLEEP=${POLL_SLEEP:-120}
start=$(date +%s)
while :; do
  healthy=$(python - 2>>/tmp/bench_watch.log <<'EOF'
import sys
sys.path.insert(0, '/root/repo')
import bench
p = bench.host_probe()
print(1 if p["healthy"] else 0, p["tmpfs_write_gb_s"], p["matmul_gflops_1core"])
EOF
)
  echo "$(date +%T) probe: $healthy" >> /tmp/bench_watch.log
  set -- $healthy
  if [ "$1" = "1" ]; then
    echo "$(date +%T) healthy window — running bench" >> /tmp/bench_watch.log
    GRAFT_PROBE_RETRIES=2 python bench.py > /tmp/bench_r5_healthy.json 2> /tmp/bench_r5_healthy.log
    rc=$?
    echo "$(date +%T) bench rc=$rc" >> /tmp/bench_watch.log
    if [ $rc -eq 0 ]; then
      python bench.py --scaling > /tmp/bench_r5_healthy_scaling.json 2> /tmp/bench_r5_healthy_scaling.log
      echo "$(date +%T) scaling rc=$?" >> /tmp/bench_watch.log
      exit 0
    fi
  fi
  now=$(date +%s)
  if [ $((now - start)) -gt "$MAX_WAIT_SEC" ]; then
    echo "$(date +%T) giving up waiting; final throttled bench" >> /tmp/bench_watch.log
    GRAFT_PROBE_RETRIES=2 python bench.py > /tmp/bench_r5_final.json 2> /tmp/bench_r5_final.log
    exit 2
  fi
  sleep "$POLL_SLEEP"
done
