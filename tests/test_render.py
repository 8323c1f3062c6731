"""Rendering tests: trajectory -> GIF, policy visualization."""

import os

import numpy as np

from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.utils.render import render_trajectory, visualize_policy


def test_render_trajectory_gif(tmp_path):
    e = GymEnv("mjrl_point_mass-v0")
    qpos_seq = np.linspace([-1, -1], [1, 1], 8)
    gif = str(tmp_path / "t.gif")
    n = render_trajectory(e.env.model, qpos_seq, gif_path=gif)
    assert n == 8
    assert os.path.getsize(gif) > 1000


def test_render_frames_dir(tmp_path):
    e = GymEnv("mjrl_reacher_7dof-v0")
    qpos_seq = np.zeros((3, 7))
    render_trajectory(e.env.model, qpos_seq, save_dir=str(tmp_path))
    assert len(list(tmp_path.glob("frame_*.png"))) == 3


def test_visualize_policy(tmp_path):
    e = GymEnv("mjrl_point_mass-v0")
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(8,)), seed=0)
    n = visualize_policy(e, pol, num_episodes=1, horizon=5,
                         save_dir=str(tmp_path))
    assert n >= 5
    assert os.path.exists(tmp_path / "episode_0.mp4")
    assert os.path.getsize(tmp_path / "episode_0.mp4") > 1000
    n = visualize_policy(e, pol, num_episodes=1, horizon=3,
                         save_dir=str(tmp_path), video_format="gif")
    assert os.path.exists(tmp_path / "episode_0.gif")
