#!/bin/bash
# Multi-seed parity curves (VERDICT round-2 item 7): >=3 seeds per env
# through both the unmodified reference (torch + real MuJoCo 3.10) and
# mjrl_tpu, summarized by compare.py.
set -x
cd "$(dirname "$0")"

for seed in 500 501 502; do
  [ -f curves/reference_point_mass_seed${seed}.json ] || \
    python run_reference.py --env point_mass --seed $seed
  [ -f curves/mjrl_tpu_point_mass_seed${seed}.json ] || \
    python run_ours.py --env point_mass --seed $seed
done
for seed in 123 124 125; do
  [ -f curves/reference_swimmer_seed${seed}.json ] || \
    python run_reference.py --env swimmer --seed $seed
  [ -f curves/mjrl_tpu_swimmer_seed${seed}.json ] || \
    python run_ours.py --env swimmer --seed $seed
done
echo SEEDS_DONE
