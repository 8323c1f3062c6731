#!/bin/bash
# Round-3 TPU queue #4: multi-seed parity curves (VERDICT item 7) and the
# peg-insertion learning result (VERDICT item 8).
set -x
cd /root/repo
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

for seed in 501 502; do
  python benchmarks/parity/run_ours.py --env point_mass --seed $seed \
    >> $L/ours_seeds.log 2>&1
done
for seed in 124 125; do
  python benchmarks/parity/run_ours.py --env swimmer --seed $seed \
    >> $L/ours_seeds.log 2>&1
done

# Peg insertion NPG under the shipped newton/frozen-row default
python tools/train_gym.py --env mjrl_peg_insertion-v0 --iters 100 \
  --ntraj 100 --step_size 0.05 --save $P/peg_newton.pkl \
  > $L/peg_newton.jsonl 2>&1

echo QUEUE4_DONE
