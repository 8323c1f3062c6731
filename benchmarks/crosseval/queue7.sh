#!/bin/bash
# Round-3 TPU queue #7 (follows queue6's humanoid-newton run):
#   1. wait for humanoid-newton to release the TPU
#   2. Adroit relocate scripted demos — now compile-feasible: the
#      36-dof step lowers to 4.8M HLO chars (was 13.5M) after the
#      native-Cholesky + unified-substep-body program diet
#   3. BC warm start + DAPG fine-tune on those demos (the BASELINE.json
#      flagship config)
#   4. Hopper NPG under the ELLIPTIC cone on the planar fast path
#      (learning validation for the round-3 elliptic planar support)
set -x
cd /root/repo
P=benchmarks/crosseval/policies
L=benchmarks/crosseval/logs

while kill -0 "$(cat /tmp/humanoid_newton.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30
done

python tools/make_relocate_demos.py --episodes 30 --horizon 200 \
  --out benchmarks/crosseval/relocate_demos.pkl \
  > $L/relocate_demos2.log 2>&1

python examples/dapg_relocate.py --demos benchmarks/crosseval/relocate_demos.pkl \
  --save $P/relocate_dapg.pkl \
  > $L/relocate_dapg.jsonl 2>&1

python tools/train_gym.py --env Hopper-v3 --cone elliptic --iters 100 \
  --step_size 0.1 --save $P/hopper_elliptic.pkl \
  > $L/hopper_elliptic.jsonl 2>&1

echo QUEUE7_DONE
