#!/bin/bash
# Tunnel watcher: probe every 4 min, log every attempt (the log is the
# link-state evidence for BENCH), launch tools/tpu_ab.py after 2
# consecutive healthy probes.  Exits after the sweep or at the deadline.
cd /root/repo
LOG=tools/tpu_watch_r4.log
DEADLINE=$(( $(date +%s) + 36000 ))   # 10 h
good=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 90 python -c "
import jax, numpy as np
x = jax.device_put(np.ones(1<<20, np.uint8)); np.asarray(x); print('PROBE_OK')
" 2>/dev/null | grep -q PROBE_OK; then
    echo "$(date -u +%FT%TZ) probe ok" >> "$LOG"
    good=$((good+1))
  else
    echo "$(date -u +%FT%TZ) probe FAIL (1MB d2h, 90s timeout)" >> "$LOG"
    good=0
  fi
  if [ "$good" -ge 2 ]; then
    echo "$(date -u +%FT%TZ) tunnel healthy -> launching tpu_ab" >> "$LOG"
    python tools/tpu_ab.py --reps 10 > tools/tpu_ab_r4.jsonl 2> tools/tpu_ab_r4.err
    echo "$(date -u +%FT%TZ) tpu_ab rc=$?" >> "$LOG"
    exit 0
  fi
  sleep 240
done
echo "$(date -u +%FT%TZ) deadline reached, tunnel never healthy" >> "$LOG"
