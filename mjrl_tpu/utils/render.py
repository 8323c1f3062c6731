"""Offscreen trajectory rendering (the TPU-host replacement for the
reference's MjViewer / skvideo offscreen renderer —
mjrl/envs/mujoco_env.py:128-135, 167-194).

Draws every geom of a model (plane grid, spheres, capsules as stadium
outlines, boxes, cylinders) from forward-kinematics poses with matplotlib
3D, per frame, and writes PNG frames or an animated GIF.  No interactive
viewer is needed on TPU hosts; trajectories render from recorded qpos
sequences.
"""

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from mjrl_tpu.physics.kinematics import fwd_kinematics  # noqa: E402
from mjrl_tpu.physics.model import (BOX, CAPSULE, CYLINDER, PLANE,  # noqa
                                    SPHERE)


def _sphere_pts(c, r, n=12):
    u = np.linspace(0, 2 * np.pi, n)
    v = np.linspace(0, np.pi, n)
    x = c[0] + r * np.outer(np.cos(u), np.sin(v))
    y = c[1] + r * np.outer(np.sin(u), np.sin(v))
    z = c[2] + r * np.outer(np.ones_like(u), np.cos(v))
    return x, y, z


def draw_model(ax, model, qpos, alpha=0.8):
    """Draw all geoms at configuration qpos on a 3D axis."""
    import jax.numpy as jnp
    data = fwd_kinematics(model, jnp.asarray(qpos, jnp.float32))
    gx = np.asarray(data.geom_xpos)
    gm = np.asarray(data.geom_xmat)
    size = np.asarray(model.geom_size)

    for g in range(model.ngeom):
        t = model.geom_type[g]
        if t == PLANE:
            n = gm[g][:, 2]
            # draw a grid patch around the plane origin
            s = min(max(size[g][0], 1.0), 5.0)
            xs = np.linspace(-s, s, 2)
            xx, yy = np.meshgrid(xs, xs)
            pts = (gx[g][:, None, None]
                   + gm[g][:, 0][:, None, None] * xx[None]
                   + gm[g][:, 1][:, None, None] * yy[None])
            ax.plot_surface(pts[0], pts[1], pts[2], alpha=0.15,
                            color="gray")
        elif t == SPHERE:
            x, y, z = _sphere_pts(gx[g], size[g][0], 8)
            ax.plot_surface(x, y, z, alpha=alpha, color="tab:blue")
        elif t in (CAPSULE, CYLINDER):
            axis = gm[g][:, 2]
            a = gx[g] - axis * size[g][1]
            b = gx[g] + axis * size[g][1]
            ax.plot(*zip(a, b), linewidth=max(size[g][0] * 100, 2),
                    alpha=alpha, color="tab:orange",
                    solid_capstyle="round")
        elif t == BOX:
            # 12 edges of the box
            corners = np.array([[sx, sy, sz] for sx in (-1, 1)
                                for sy in (-1, 1) for sz in (-1, 1)])
            corners = corners * size[g][None, :]
            world = gx[g][None, :] + corners @ gm[g].T
            edges = [(0, 1), (0, 2), (0, 4), (3, 1), (3, 2), (3, 7),
                     (5, 1), (5, 4), (5, 7), (6, 2), (6, 4), (6, 7)]
            for i, j in edges:
                ax.plot(*zip(world[i], world[j]), color="tab:green",
                        alpha=alpha)


def render_trajectory(model, qpos_seq, save_dir=None, gif_path=None,
                      site_pos_override=None, fps=20, elev=20, azim=-60,
                      max_frames=200):
    """Render a qpos sequence.  Writes per-frame PNGs to ``save_dir``
    and/or an animated GIF to ``gif_path``."""
    qpos_seq = np.asarray(qpos_seq)
    stride = max(1, len(qpos_seq) // max_frames)
    frames = []
    m = model
    if site_pos_override is not None:
        m = model.replace(site_pos=site_pos_override)
    for t in range(0, len(qpos_seq), stride):
        fig = plt.figure(figsize=(5, 4))
        ax = fig.add_subplot(projection="3d")
        draw_model(ax, m, qpos_seq[t])
        ax.set_title(f"t = {t}")
        ax.view_init(elev=elev, azim=azim)
        fig.tight_layout()
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            fig.savefig(os.path.join(save_dir, f"frame_{t:05d}.png"),
                        dpi=80)
        if gif_path is not None:
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            frames.append(buf.copy())
        plt.close(fig)

    if gif_path is not None and frames:
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(gif_path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
    return len(frames)


def visualize_policy(env, policy, num_episodes=1, horizon=None,
                     mean_action=True, save_dir="policy_vis", seed=123):
    """Roll the policy and render each episode (the reference's
    GymEnv.visualize_policy, gym_env.py:154-169, as offscreen video)."""
    import jax
    import jax.numpy as jnp
    fenv = env.env if hasattr(env, "env") and hasattr(env.env, "reset") \
        else env
    horizon = horizon or fenv.horizon
    key = jax.random.PRNGKey(seed)
    n_frames = 0
    for ep in range(num_episodes):
        key, k_reset, k_ep = jax.random.split(key, 3)
        state = fenv.reset(k_reset)
        qpos_seq = [np.asarray(state.physics.qpos)]
        for t in range(horizon):
            a, info = policy.get_action(np.asarray(state.obs))
            act = info["evaluation"] if mean_action else a
            state = fenv.step(state, jnp.asarray(act, state.obs.dtype))
            qpos_seq.append(np.asarray(state.physics.qpos))
            if bool(state.done):
                break
        model = fenv._patched_model(state.scenery) \
            if hasattr(fenv, "_patched_model") else fenv.model
        n_frames += render_trajectory(
            model, np.array(qpos_seq),
            gif_path=os.path.join(save_dir, f"episode_{ep}.gif"),
            save_dir=None)
        os.makedirs(save_dir, exist_ok=True)
    return n_frames
