#!/bin/bash
# Round-5 second queue (the first queue's /tmp workdirs were wiped by a
# session restart). Serialized — single CPU core, never two Python
# processes at once (CLAUDE.md environment facts). Workdirs live under
# /root/repo/.work (gitignored) so a restart cannot eat a 35-min train.
#
# Steps:
#   1. bench.py — warms the TPU persistent compile cache so the
#      end-of-round driver capture hits warm disk (VERDICT item 1)
#   2. vox11 sphere lambda=200 auto train + ctx_post encode/eval
#      (fresh checkpoint for the ctx_tail decision, VERDICT item 3)
#   3. ctx_tail capacity decision on that checkpoint, real coded bits
#   4. vox11 TORUS lambda=200 auto train + encode/eval (second-cloud
#      ctx_post economics, VERDICT item 6)
#   5. post-hoc fit economics (h8/h16/h32) on the torus checkpoint
#   6. dryrun_multichip(8) — confirms the bounded dryrun exits 0
set -u
cd /root/repo
mkdir -p /tmp/r5queue results/round5 .work
run() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] START $name" | tee -a /tmp/r5queue/queue.log
  "$@" > "/tmp/r5queue/$name.log" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] END $name rc=$rc" | tee -a /tmp/r5queue/queue.log
}

# synth clouds (deterministic; skip if present)
python - <<'EOF'
import os, sys
sys.path.insert(0, "/root/repo")
from scripts.synth_cloud import SHAPES
from nvfpcc_tpu.io.ply import write_ply_points
for shape, depth in [("sphere", 11), ("torus", 11)]:
    p = f"/tmp/{shape}_vox{depth}.ply"
    if not os.path.exists(p):
        pts = SHAPES[shape](depth)
        write_ply_points(p, pts)
        print(f"{p}: {len(pts)} pts", flush=True)
EOF

run bench python bench.py

run v11_sphere python scripts/r3_v11_ctxpost_sweep.py --lambdas 200 \
    --workdir .work/r5v11 --out_dir results/round5

run ctx_tail python scripts/r4_ctx_capacity2.py \
    --ckpt .work/r5v11/l200/ckpts --candidates h16,h32,h32t16,h32t24 \
    --with_baselines --out results/round5/ctx_capacity2.json

run v11_torus python scripts/r3_v11_ctxpost_sweep.py --lambdas 200 \
    --cloud /tmp/torus_vox11.ply --tag torus \
    --workdir .work/r5v11t --out_dir results/round5

NPTS_TORUS=$(python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from nvfpcc_tpu.io.ply import read_ply_points
print(len(read_ply_points("/tmp/torus_vox11.ply")))
EOF
)
run ctx_econ_torus python scripts/r4_ctx_capacity2.py \
    --ckpt .work/r5v11t/l200/ckpts --candidates h8,h16,h32 \
    --with_baselines --n_points "$NPTS_TORUS" \
    --out results/round5/ctx_capacity2_torus.json

run dryrun python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "=== queue done" | tee -a /tmp/r5queue/queue.log
