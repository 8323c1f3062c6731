#!/bin/bash
# Round-5 queue, part 5: cheetah TRPO/linear extensions (the 100-iter
# arms were underbudgeted — cheetah's return crosses zero slowly).
set -u
cd "$(dirname "$0")/../.."
LOGS=benchmarks/crosseval/logs
POLS=benchmarks/crosseval/policies
RUN="tools/tpu_run.sh"
export STALL_SECS=${STALL_SECS:-1500}

DONE_RE='"iters": 400' bash $RUN $LOGS/r5_cheetah_trpo_400.jsonl \
  python tools/train_gym.py --env HalfCheetah-v3 --iters 400 --ntraj 100 \
    --horizon 1000 --algo trpo --step_size 0.1 --seed 123 \
    --ckpt $POLS/r5_cheetah_trpo.pkl.ckpt \
    --save $POLS/r5_cheetah_trpo.pkl --resume

DONE_RE='"iters": 400' bash $RUN $LOGS/r5_cheetah_linear_400.jsonl \
  python tools/train_gym.py --env HalfCheetah-v3 --iters 400 --ntraj 100 \
    --horizon 1000 --policy linear --step_size 0.1 --seed 123 \
    --ckpt $POLS/r5_cheetah_linear.pkl.ckpt \
    --save $POLS/r5_cheetah_linear.pkl --resume

echo "queue15 done"
