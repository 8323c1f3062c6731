"""Offscreen trajectory rendering (the TPU-host replacement for the
reference's MjViewer / skvideo offscreen renderer —
mjrl/envs/mujoco_env.py:128-135, 167-194).

Renders every geom of a model as a shaded triangle mesh (Lambertian
lighting, painter-sorted faces, checkerboard ground plane) from
forward-kinematics poses, and writes mp4 (OpenCV), animated GIF (PIL) or
per-frame PNGs.  No interactive viewer is needed on TPU hosts;
trajectories render from recorded qpos sequences.
"""

import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from mpl_toolkits.mplot3d.art3d import Poly3DCollection  # noqa: E402
import numpy as np  # noqa: E402

from mjrl_tpu.physics.kinematics import fwd_kinematics  # noqa: E402
from mjrl_tpu.physics.model import (BOX, CAPSULE, CYLINDER, PLANE,  # noqa
                                    SPHERE)

_LIGHT = np.array([0.35, -0.4, 0.85])
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)
_PALETTE = [(0.26, 0.45, 0.76), (0.88, 0.52, 0.21), (0.34, 0.64, 0.37),
            (0.75, 0.31, 0.32), (0.58, 0.47, 0.71), (0.55, 0.57, 0.67)]


def _uv_sphere(r, n=10):
    u = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    v = np.linspace(0, np.pi, n)
    uu, vv = np.meshgrid(u, v)
    pts = np.stack([r * np.cos(uu) * np.sin(vv),
                    r * np.sin(uu) * np.sin(vv),
                    r * np.cos(vv)], axis=-1)
    faces = []
    rows, cols = pts.shape[:2]
    verts = pts.reshape(-1, 3)
    for i in range(rows - 1):
        for j in range(cols):
            j2 = (j + 1) % cols
            a, b = i * cols + j, i * cols + j2
            c, d = (i + 1) * cols + j, (i + 1) * cols + j2
            faces += [(a, b, d), (a, d, c)]
    return verts, np.array(faces)


def _capsule(r, half, n=10):
    """Capsule along +z: cylinder wall + two hemispherical caps."""
    verts_s, faces_s = _uv_sphere(r, n)
    top = verts_s[verts_s[:, 2] >= -1e-9] + [0, 0, half]
    bot = verts_s[verts_s[:, 2] <= 1e-9] - [0, 0, half]
    u = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    ring_t = np.stack([r * np.cos(u), r * np.sin(u),
                       np.full_like(u, half)], axis=-1)
    ring_b = ring_t - [0, 0, 2 * half]
    verts = np.concatenate([top, bot, ring_t, ring_b])
    hull = _convexish_faces(verts)
    return verts, hull


def _cylinder(r, half, n=12):
    u = np.linspace(0, 2 * np.pi, n, endpoint=False)
    ring = np.stack([r * np.cos(u), r * np.sin(u), np.zeros_like(u)],
                    axis=-1)
    top = ring + [0, 0, half]
    bot = ring - [0, 0, half]
    verts = np.concatenate([top, bot, [[0, 0, half]], [[0, 0, -half]]])
    ct, cb = 2 * n, 2 * n + 1
    faces = []
    for j in range(n):
        j2 = (j + 1) % n
        faces += [(j, j2, n + j2), (j, n + j2, n + j)]      # wall
        faces += [(ct, j, j2), (cb, n + j2, n + j)]          # caps
    return verts, np.array(faces)


def _box(size):
    sx, sy, sz = size
    verts = np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
                      for z in (-sz, sz)])
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    return verts, np.array(faces)


def _convexish_faces(verts):
    """Triangulate a point cloud via its convex hull (scipy), falling back
    to a crude fan if scipy is unavailable."""
    try:
        from scipy.spatial import ConvexHull
        return ConvexHull(verts).simplices
    except Exception:
        n = len(verts)
        return np.array([(0, i, i + 1) for i in range(1, n - 1)])


def _geom_mesh(gtype, size):
    if gtype == SPHERE:
        return _uv_sphere(size[0])
    if gtype == CAPSULE:
        return _capsule(size[0], size[1])
    if gtype == CYLINDER:
        return _cylinder(size[0], size[1])
    if gtype == BOX:
        return _box(size)
    return None


def _model_meshes(model):
    """Static per-geom unit meshes (host-side, computed once)."""
    size = np.asarray(model.geom_size)
    meshes = []
    for g in range(model.ngeom):
        meshes.append(_geom_mesh(model.geom_type[g], size[g]))
    return meshes


def _shade(base, normals):
    lam = np.clip(normals @ _LIGHT, 0.0, 1.0)[:, None]
    amb = 0.35
    rgb = np.asarray(base)[None, :] * (amb + (1 - amb) * lam)
    return np.clip(rgb, 0, 1)


def draw_model(ax, model, qpos, meshes=None, alpha=1.0):
    """Draw all geoms at configuration qpos as shaded meshes."""
    import jax.numpy as jnp
    data = fwd_kinematics(model, jnp.asarray(qpos, jnp.float32))
    gx = np.asarray(data.geom_xpos)
    gm = np.asarray(data.geom_xmat)
    size = np.asarray(model.geom_size)
    if meshes is None:
        meshes = _model_meshes(model)

    polys, colors = [], []
    for g in range(model.ngeom):
        t = model.geom_type[g]
        if t == PLANE:
            n_sq, s = 8, min(max(float(size[g][0]), 1.0), 4.0)
            xs = np.linspace(-s, s, n_sq + 1)
            for i in range(n_sq):
                for j in range(n_sq):
                    quad = np.array([[xs[i], xs[j], 0], [xs[i + 1], xs[j], 0],
                                     [xs[i + 1], xs[j + 1], 0],
                                     [xs[i], xs[j + 1], 0]])
                    world = gx[g][None] + quad @ gm[g].T
                    polys.append(world)
                    shade = 0.82 if (i + j) % 2 else 0.70
                    colors.append((shade, shade, shade))
            continue
        mesh = meshes[g]
        if mesh is None:
            continue
        verts, faces = mesh
        world = gx[g][None] + verts @ gm[g].T
        tri = world[faces]                                  # (F, 3, 3)
        n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        norm = np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12
        n = n / norm
        # orient normals outward from the geom center
        cent = tri.mean(axis=1) - gx[g][None]
        flip = np.sign(np.sum(n * cent, axis=-1))[:, None]
        n = n * np.where(flip == 0, 1.0, flip)
        base = _PALETTE[model.geom_body[g] % len(_PALETTE)]
        rgb = _shade(base, n)
        polys.extend(tri)
        colors.extend(rgb)

    col = Poly3DCollection(polys, facecolors=colors, edgecolors="none",
                           alpha=alpha)
    ax.add_collection3d(col)


def _frame_bounds(model, qpos_seq):
    import jax
    import jax.numpy as jnp
    fk = jax.jit(jax.vmap(lambda q: fwd_kinematics(
        model, q).geom_xpos))
    pts = np.asarray(fk(jnp.asarray(qpos_seq, jnp.float32)))
    lo = pts.reshape(-1, 3).min(axis=0) - 0.5
    hi = pts.reshape(-1, 3).max(axis=0) + 0.5
    c = 0.5 * (lo + hi)
    r = max(float((hi - lo).max()) * 0.5, 0.6)
    return c, r


def _write_video(path, frames, fps):
    """mp4 via OpenCV; .gif via PIL."""
    if path.endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
        return
    import cv2
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (w, h))
    for f in frames:
        vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    vw.release()


def render_trajectory(model, qpos_seq, save_dir=None, gif_path=None,
                      video_path=None, site_pos_override=None, fps=20,
                      elev=18, azim=-60, max_frames=200, dpi=110):
    """Render a qpos sequence.  Writes mp4 to ``video_path`` (OpenCV),
    GIF to ``gif_path``, and/or per-frame PNGs to ``save_dir``."""
    qpos_seq = np.asarray(qpos_seq)
    stride = max(1, len(qpos_seq) // max_frames)
    frames = []
    m = model
    if site_pos_override is not None:
        m = model.replace(site_pos=site_pos_override)
    meshes = _model_meshes(m)
    center, radius = _frame_bounds(m, qpos_seq[::stride])
    want_frames = gif_path is not None or video_path is not None
    for t in range(0, len(qpos_seq), stride):
        fig = plt.figure(figsize=(6, 4.5))
        ax = fig.add_subplot(projection="3d")
        draw_model(ax, m, qpos_seq[t], meshes=meshes)
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[1] - radius, center[1] + radius)
        ax.set_zlim(max(center[2] - radius, -0.05), center[2] + radius)
        ax.set_box_aspect((1, 1, 1))
        ax.view_init(elev=elev, azim=azim)
        ax.set_axis_off()
        ax.set_title(f"t = {t}", fontsize=9)
        fig.tight_layout(pad=0.1)
        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            fig.savefig(os.path.join(save_dir, f"frame_{t:05d}.png"),
                        dpi=dpi)
        if want_frames:
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
            frames.append(buf.copy())
        plt.close(fig)

    if frames:
        if gif_path is not None:
            _write_video(gif_path, frames, fps)
        if video_path is not None:
            _write_video(video_path, frames, fps)
    return max(len(frames),
               len(range(0, len(qpos_seq), stride)) if save_dir else 0)


def visualize_policy(env, policy, num_episodes=1, horizon=None,
                     mean_action=True, save_dir="policy_vis", seed=123,
                     video_format="mp4"):
    """Roll the policy and render each episode (the reference's
    GymEnv.visualize_policy, gym_env.py:154-169, as offscreen video).
    ``video_format``: 'mp4' (OpenCV) or 'gif'."""
    import jax
    import jax.numpy as jnp
    fenv = env.env if hasattr(env, "env") and hasattr(env.env, "reset") \
        else env
    horizon = horizon or fenv.horizon
    key = jax.random.PRNGKey(seed)
    n_frames = 0
    os.makedirs(save_dir, exist_ok=True)
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
        path = os.path.join(save_dir, f"episode_{ep}.{video_format}")
        kw = {"video_path" if video_format == "mp4" else "gif_path": path}
        n_frames += render_trajectory(model, np.array(qpos_seq), **kw)
    return n_frames
