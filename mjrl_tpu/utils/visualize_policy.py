"""CLI: render a pickled policy on an environment
(reference mjrl/utils/visualize_policy.py — a click CLI over
GymEnv.visualize_policy; here offscreen GIF rendering, no interactive
viewer on TPU hosts).

    python -m mjrl_tpu.utils.visualize_policy --env_name mjrl_point_mass-v0 \
        --policy <policy.pickle> --episodes 3 --save_dir ./vis
"""

import argparse
import pickle

from mjrl_tpu.envs.gym_env import GymEnv
from mjrl_tpu.utils.render import visualize_policy


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--env_name", type=str, required=True)
    parser.add_argument("--policy", type=str, required=True,
                        help="path to pickled policy")
    parser.add_argument("--episodes", type=int, default=3)
    parser.add_argument("--save_dir", type=str, default="policy_vis")
    parser.add_argument("--stochastic", action="store_true",
                        help="sample actions instead of the mean")
    args = parser.parse_args()

    e = GymEnv(args.env_name)
    with open(args.policy, "rb") as f:
        policy = pickle.load(f)
    n = visualize_policy(e, policy, num_episodes=args.episodes,
                         mean_action=not args.stochastic,
                         save_dir=args.save_dir)
    print(f"rendered {n} frames to {args.save_dir}")


if __name__ == "__main__":
    main()
