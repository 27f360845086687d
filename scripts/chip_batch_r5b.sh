#!/bin/bash
# Round-5 chip batch B: rung-protocol re-measure (the post-crash 0.867
# reading needs a clean-relay confirmation), conservation rerun with
# pre-warmed capacities (first attempt died 152 steps short of 2000 at
# the 3000 s cap — heal re-runs), then bench.
cd /root/repo
set -x

echo "=== [1/3] rung-protocol steps/s (clean relay) ==="
timeout 1200 python scripts/profile_p3m.py --rungs | tee /tmp/rungs_r5b.out
grep '^{' /tmp/rungs_r5b.out | tail -1 > /tmp/rung_steps_b.json

echo "=== [2/3] long-horizon conservation (pre-warmed) ==="
timeout 5000 python scripts/energy_longrun.py

echo "=== [3/3] bench (clustered co-headline fields) ==="
timeout 1200 python bench.py | tee /tmp/bench_r5.out

echo "=== chip batch B done ==="
