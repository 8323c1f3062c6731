"""CLI: replay pickled trajectories (qpos sequences or paths with
env-state dicts) as rendered GIFs (reference
run_experiments/utils/visualize_trajectories.py, without the external
trajopt dependency).

    python -m mjrl_tpu.utils.visualize_trajectories \
        --env_name mjrl_point_mass-v0 --file paths.pickle --save_dir ./vis
"""

import argparse
import pickle

import numpy as np

from mjrl_tpu.envs.gym_env import GymEnv
from mjrl_tpu.utils.render import render_trajectory


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env_name", type=str, required=True)
    parser.add_argument("--file", type=str, required=True,
                        help="pickle containing a list of paths (with "
                             "env_infos.state qp sequences) or qpos arrays")
    parser.add_argument("--save_dir", type=str, default="traj_vis")
    parser.add_argument("--max_traj", type=int, default=5)
    args = parser.parse_args()

    e = GymEnv(args.env_name)
    with open(args.file, "rb") as f:
        data = pickle.load(f)

    import os
    os.makedirs(args.save_dir, exist_ok=True)
    for i, item in enumerate(data[: args.max_traj]):
        if isinstance(item, dict):
            states = item.get("env_infos", {}).get("state")
            if states is not None and "qp" in states:
                qpos_seq = np.asarray(states["qp"])
            else:
                qpos_seq = np.asarray(item["observations"])
        else:
            qpos_seq = np.asarray(item)
        render_trajectory(
            e.env.model, qpos_seq,
            gif_path=f"{args.save_dir}/traj_{i}.gif")
        print(f"rendered trajectory {i}")


if __name__ == "__main__":
    main()
