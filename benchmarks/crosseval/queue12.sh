#!/bin/bash
# Round-5 queue, part 2 — runs after queue11 (the launcher waits for its
# "queue11 done" marker).  Flagship retrain on the round-5 physics with
# the enlarged demo set, the elliptic 300-iter extension, and the
# humanoid batch bisect.
set -u
cd "$(dirname "$0")/../.."
LOGS=benchmarks/crosseval/logs
POLS=benchmarks/crosseval/policies
RUN="tools/tpu_run.sh"
export STALL_SECS=${STALL_SECS:-1800}

# 1) Flagship DAPG retrain — round-5 physics (Newton + noslip + exact
#    manifolds) + merged demo set (30 expert + bootstrapped).  The
#    built-in cross-eval stage emits in-sim AND real success together.
python - <<'PY'
import pickle
old = pickle.load(open("benchmarks/crosseval/relocate_demos_real.pkl", "rb"))
try:
    boot = pickle.load(open("benchmarks/crosseval/relocate_demos_boot.pkl", "rb"))
except FileNotFoundError:
    boot = []
merged = old + boot
pickle.dump(merged, open("benchmarks/crosseval/relocate_demos_merged.pkl", "wb"))
print(f"merged demos: {len(old)} expert + {len(boot)} bootstrapped")
PY
DONE_RE="stage....cross_eval" bash $RUN $LOGS/r5_relocate_dapg.jsonl \
  python examples/dapg_relocate.py \
    --demos benchmarks/crosseval/relocate_demos_merged.pkl \
    --dapg_iters 220 --ntraj 50 --lam_0 0.05 --bc_epochs 80 \
    --cross_eval_episodes 50 \
    --save $POLS/r5_relocate_dapg.pkl

# 2) Hopper elliptic: extend 150 -> 300 iters via the resume checkpoint
#    (same jsonl continues; chasing the 3000 class — VERDICT #8).
DONE_RE='"iters": 300' bash $RUN $LOGS/r5_hopper_elliptic005_300.jsonl \
  python tools/train_gym.py --env Hopper-v3 --solver pgs --cone elliptic \
    --iters 300 --ntraj 100 --horizon 1000 --step_size 0.05 --seed 123 \
    --ckpt $POLS/r5_hopper_elliptic005.pkl.ckpt \
    --save $POLS/r5_hopper_elliptic005.pkl --resume

# 3) Humanoid batch bisect: 512 envs (1024 faulted the device).
bash $RUN $LOGS/r5_humanoid_512.jsonl \
  python tools/train_gym.py --env Humanoid-v3 --solver pgs --iters 150 \
    --ntraj 512 --horizon 1000 --step_size 0.05 --init_log_std -0.5 \
    --seed 123 --save $POLS/r5_humanoid_512.pkl --resume

echo "queue12 done"
