#!/bin/bash
# Round-4 training queue (VERDICT items 2-5): KL-guard validation,
# elliptic learning run, multi-seed locomotion headlines, the
# NPG-vs-TRPO / linear-vs-MLP sweep (linear_nn_comparison.py shape),
# and Humanoid at large batch.  STRICTLY SEQUENTIAL — concurrent
# processes starve each other on the single axon TPU tunnel.
set -x
cd "$(dirname "$0")/../.."
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

# ---- KL-guard validation at the round-3 collapsing config -----------
# (hopper seed 123 step 0.1 runs FIRST, launched by hand; here the
# remaining seeds double as the multi-seed band)
python tools/train_gym.py --env Hopper-v3 --iters 100 --step_size 0.1 \
  --seed 124 --save $P/r4_hopper_s124.pkl > $L/r4_hopper_s124.jsonl 2>&1
python tools/train_gym.py --env Hopper-v3 --iters 100 --step_size 0.1 \
  --seed 125 --save $P/r4_hopper_s125.pkl > $L/r4_hopper_s125.jsonl 2>&1

# ---- elliptic cone under actual training load (queue7 config) -------
python tools/train_gym.py --env Hopper-v3 --cone elliptic --iters 100 \
  --step_size 0.1 --save $P/r4_hopper_elliptic.pkl \
  > $L/r4_hopper_elliptic.jsonl 2>&1

# ---- multi-seed Walker2d / Ant bands --------------------------------
for S in 123 124 125; do
  python tools/train_gym.py --env Walker2d-v3 --iters 100 \
    --step_size 0.1 --seed $S --save $P/r4_walker_s$S.pkl \
    > $L/r4_walker_s$S.jsonl 2>&1
done
for S in 123 124 125; do
  python tools/train_gym.py --env Ant-v3 --iters 300 --step_size 0.05 \
    --init_log_std -0.5 --seed $S --save $P/r4_ant_s$S.pkl \
    > $L/r4_ant_s$S.jsonl 2>&1
done

# ---- NPG vs TRPO, linear vs MLP on Hopper (BASELINE configs[2]) -----
python tools/train_gym.py --env Hopper-v3 --iters 100 --algo trpo \
  --step_size 0.1 --seed 123 --save $P/r4_hopper_trpo.pkl \
  > $L/r4_hopper_trpo.jsonl 2>&1
python tools/train_gym.py --env Hopper-v3 --iters 100 --policy linear \
  --step_size 0.1 --seed 123 --save $P/r4_hopper_linear.pkl \
  > $L/r4_hopper_linear.jsonl 2>&1
python tools/train_gym.py --env Hopper-v3 --iters 100 --algo trpo \
  --policy linear --step_size 0.1 --seed 123 \
  --save $P/r4_hopper_trpo_linear.pkl \
  > $L/r4_hopper_trpo_linear.jsonl 2>&1

# ---- Humanoid at large batch (BASELINE configs[3]) ------------------
python tools/train_gym.py --env Humanoid-v3 --iters 300 --ntraj 4096 \
  --horizon 1000 --step_size 0.05 --init_log_std -0.5 --seed 123 \
  --save $P/r4_humanoid_big.pkl > $L/r4_humanoid_big.jsonl 2>&1

echo QUEUE8 DONE
