#!/bin/bash
# Round-5 serialized TPU measurement queue (single CPU core — NEVER run two
# Python processes concurrently; see CLAUDE.md environment facts).
#
# Steps (each resumable; rc logged, queue continues on failure):
#   1. bf16 mixed-precision arms on torus + helix (VERDICT item 2)
#   2. vox11 sphere lambda=200 auto train + ctx_post encode/eval
#      (fresh checkpoint for the ctx_tail decision, VERDICT item 3,
#       + cross-validates the round-3 vox11 recipe)
#   3. ctx_tail capacity decision on that checkpoint (real coded bits)
#   4. fresh vox10 ctx trains on torus/helix with D1+D2 (VERDICT item 7)
#   5. vox11 torus auto train + capacity baselines (second-cloud ctx_post
#      economics, VERDICT item 6)
set -u
cd /root/repo
mkdir -p /tmp/r5queue results/round5
run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r5queue/queue.log
  "$@" > "/tmp/r5queue/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] END $name rc=$rc" | tee -a /tmp/r5queue/queue.log
}

# synth clouds used below (deterministic; skip if present)
python - <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
from scripts.synth_cloud import SHAPES
from nvfpcc_tpu.io.ply import write_ply_points
for shape, depth in [("torus", 10), ("helix", 10), ("sphere", 11), ("torus", 11)]:
    p = f"/tmp/{shape}_vox{depth}.ply"
    if not os.path.exists(p):
        pts = SHAPES[shape](depth)
        write_ply_points(p, pts)
        print(f"{p}: {len(pts)} pts", flush=True)
EOF

run mp_torus python scripts/r3_mixed_precision_ab.py --shape torus --arms bf16 \
    --workdir /tmp/r5mpab_torus --out results/round5/mp_ab_torus.json
run mp_helix python scripts/r3_mixed_precision_ab.py --shape helix --arms bf16 \
    --workdir /tmp/r5mpab_helix --out results/round5/mp_ab_helix.json

run v11_sphere python scripts/r3_v11_ctxpost_sweep.py --lambdas 200 \
    --workdir /tmp/r5v11 --out_dir results/round5

run ctx_tail python scripts/r4_ctx_capacity2.py \
    --ckpt /tmp/r5v11/l200/ckpts --candidates h8,h16,h32,h32t16,h32t24 \
    --with_baselines --out results/round5/ctx_capacity2.json

run ctx_d2 python scripts/r3_multiseq_auto.py --shapes torus,helix \
    --entropy_mode ctx --tag ctx --workdir /tmp/r5ms_ctx --out_dir results/round5

echo "=== queue done" | tee -a /tmp/r5queue/queue.log
