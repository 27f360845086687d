#!/bin/bash
# Round-5 serialized chip batch (ONE TPU process at a time — relay rule).
# 1. roofline rerun -> refresh tests/data/column_roofline.json WITH the
#    clustered true-pairs decomposition (VERDICT item 2)
# 2. rung-protocol steps/s -> tests/data/rung_steps.json (VERDICT item 8)
# 3. 2000-step production-tier conservation -> tests/data/energy_longrun.json
#    (VERDICT item 7)
cd /root/repo
set -x

echo "=== [1/3] column roofline + clustered decomposition ==="
timeout 1500 python scripts/exp_col_roofline.py \
  --out tests/data/column_roofline.json

echo "=== [2/3] rung-protocol steps/s ==="
timeout 1200 python scripts/profile_p3m.py --rungs \
  | tee /tmp/rungs_r5.out
grep '^{' /tmp/rungs_r5.out | tail -1 > tests/data/rung_steps.json

echo "=== [2b/3] clustered rung-protocol steps/s ==="
timeout 1200 python scripts/profile_p3m.py --rungs --clustered \
  | tee /tmp/rungs_cl_r5.out
grep '^{' /tmp/rungs_cl_r5.out | tail -1 > /tmp/rung_steps_clustered.json

echo "=== [3/3] long-horizon production-tier conservation ==="
timeout 3000 python scripts/energy_longrun.py

echo "=== chip batch done ==="
