#!/bin/bash
# Round-5 queue, part 4 — demo-count scaling ablation + the big-demo
# arm (round-4 VERDICT item 3's "does success scale with demo count",
# isolated on the SAME round-5 physics).
set -u
cd "$(dirname "$0")/../.."
LOGS=benchmarks/crosseval/logs
POLS=benchmarks/crosseval/policies
RUN="tools/tpu_run.sh"
export STALL_SECS=${STALL_SECS:-1800}

# (a) 30 expert demos only (the r4 demo set) on the round-5 physics
DONE_RE="stage....cross_eval" bash $RUN $LOGS/r5_relocate_dapg_30demo.jsonl \
  python examples/dapg_relocate.py \
    --demos benchmarks/crosseval/relocate_demos_real.pkl \
    --dapg_iters 220 --ntraj 50 --lam_0 0.05 --bc_epochs 80 \
    --cross_eval_episodes 50 \
    --save $POLS/r5_relocate_dapg_30demo.pkl

# (b) ~300-demo arm: expert + both bootstrap generations
python - <<'PY'
import pickle
sets = []
for f in ("relocate_demos_real.pkl", "relocate_demos_boot.pkl",
          "relocate_demos_boot2.pkl"):
    try:
        sets.append(pickle.load(open(f"benchmarks/crosseval/{f}", "rb")))
    except FileNotFoundError:
        sets.append([])
merged = sum(sets, [])
pickle.dump(merged, open("benchmarks/crosseval/relocate_demos_300.pkl", "wb"))
print("merged:", [len(s) for s in sets], "->", len(merged))
PY
DONE_RE="stage....cross_eval" bash $RUN $LOGS/r5_relocate_dapg_300demo.jsonl \
  python examples/dapg_relocate.py \
    --demos benchmarks/crosseval/relocate_demos_300.pkl \
    --dapg_iters 220 --ntraj 50 --lam_0 0.05 --bc_epochs 80 \
    --cross_eval_episodes 50 \
    --save $POLS/r5_relocate_dapg_300demo.pkl

echo "queue14 done"
