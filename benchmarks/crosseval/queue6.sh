#!/bin/bash
# Round-3 TPU queue #6 (replaces the tails of queue3/queue5, reordered so
# the flagship DAPG relocate pipeline is not stuck behind Humanoid-newton):
#   1. wait for the in-flight Humanoid-penalty run to release the TPU
#   2. Adroit relocate scripted demos (persistent jit cache amortizes the
#      36-dof compile)
#   3. BC warm start + DAPG fine-tune on those demos
#   4. peg-insertion NPG retry under the divergence-rescue guard
#   5. Humanoid NPG under the implicit (newton) solver
set -x
cd /root/repo
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

while kill -0 "$(cat /tmp/humanoid_penalty.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done

python tools/make_relocate_demos.py --episodes 30 --horizon 200 \
  --out benchmarks/crosseval/relocate_demos.pkl \
  > $L/relocate_demos.log 2>&1

python examples/dapg_relocate.py --demos benchmarks/crosseval/relocate_demos.pkl \
  --save $P/relocate_dapg.pkl \
  > $L/relocate_dapg.jsonl 2>&1

python tools/train_gym.py --env mjrl_peg_insertion-v0 --iters 150 \
  --ntraj 100 --step_size 0.05 --save $P/peg_newton2.pkl \
  > $L/peg_newton2.jsonl 2>&1

python tools/train_gym.py --env Humanoid-v3 --solver pgs --iters 150 \
  --step_size 0.05 --init_log_std -0.5 --save $P/humanoid_newton.pkl \
  > $L/humanoid_newton.jsonl 2>&1

echo QUEUE6_DONE
