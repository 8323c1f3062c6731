"""Quaternion / rotation / spatial-vector math for the rigid-body engine.

Conventions (MuJoCo-compatible so models can be validated against golden
MuJoCo data):

- quaternions are (w, x, y, z), unit norm.
- rotation matrices are world-from-local.
- spatial motion vectors are Plücker coordinates at the *world origin*:
  v = (omega, v0) where v0 is the velocity of the body-fixed point
  instantaneously at the origin (Featherstone RBDA; same convention as
  MuJoCo's cvel/cdof after translation to the origin).
- spatial force vectors are (torque-about-origin, force).

All functions are pure jnp and vmap/jit safe.
"""

import jax.numpy as jnp


def quat_to_mat(q):
    """(...,4) wxyz -> (...,3,3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_mul(a, b):
    """Hamilton product, (...,4) x (...,4) -> (...,4)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q, v):
    """Rotate vector(s) v (...,3) by quaternion q (...,4)."""
    return jnp.einsum("...ij,...j->...i", quat_to_mat(q), v)


def axis_angle_quat(axis, angle):
    """Unit axis (...,3), angle (...) -> quaternion."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_inv(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


def mat_to_quat(m):
    """(3,3) rotation matrix -> wxyz unit quaternion (Shepperd's method:
    the division always uses the largest of the four candidate
    magnitudes, so it is numerically stable and differentiable in a
    neighbourhood of every rotation)."""
    t = m[0, 0] + m[1, 1] + m[2, 2]
    cand = jnp.stack([1.0 + t,                          # 4w^2
                      1.0 + m[0, 0] - m[1, 1] - m[2, 2],  # 4x^2
                      1.0 - m[0, 0] + m[1, 1] - m[2, 2],  # 4y^2
                      1.0 - m[0, 0] - m[1, 1] + m[2, 2]])  # 4z^2
    # branch-free: compute all four formulations, select by argmax
    sw = 2.0 * jnp.sqrt(jnp.maximum(cand[0], 1e-12))
    qw = jnp.stack([0.25 * sw, (m[2, 1] - m[1, 2]) / sw,
                    (m[0, 2] - m[2, 0]) / sw, (m[1, 0] - m[0, 1]) / sw])
    sx = 2.0 * jnp.sqrt(jnp.maximum(cand[1], 1e-12))
    qx = jnp.stack([(m[2, 1] - m[1, 2]) / sx, 0.25 * sx,
                    (m[0, 1] + m[1, 0]) / sx, (m[0, 2] + m[2, 0]) / sx])
    sy = 2.0 * jnp.sqrt(jnp.maximum(cand[2], 1e-12))
    qy = jnp.stack([(m[0, 2] - m[2, 0]) / sy, (m[0, 1] + m[1, 0]) / sy,
                    0.25 * sy, (m[1, 2] + m[2, 1]) / sy])
    sz = 2.0 * jnp.sqrt(jnp.maximum(cand[3], 1e-12))
    qz = jnp.stack([(m[1, 0] - m[0, 1]) / sz, (m[0, 2] + m[2, 0]) / sz,
                    (m[1, 2] + m[2, 1]) / sz, 0.25 * sz])
    k = jnp.argmax(cand)
    # nested selects, not a dynamic gather (vmap-friendly on TPU)
    q = jnp.where(k == 0, qw,
                  jnp.where(k == 1, qx, jnp.where(k == 2, qy, qz)))
    return q / jnp.sqrt(jnp.sum(q * q) + 1e-24)


def quat_to_rotvec(q):
    """Rotation vector (axis * angle, angle in [-pi, pi]) of a unit
    quaternion — MuJoCo mju_quat2Vel at unit timestep (used by ball-joint
    springs and ball/free actuator transmissions)."""
    w = q[..., 0]
    v = q[..., 1:]
    sin_half = jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    angle = jnp.where(angle > jnp.pi, angle - 2.0 * jnp.pi, angle)
    return v * (angle / sin_half)[..., None]


def skew(v):
    """(...,3) -> (...,3,3) cross-product matrix: skew(a) @ b = a x b."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y,
                   z, zero, -x,
                   -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Unrolled small-matrix primitives.
#
# XLA:TPU cannot fuse elementwise chains through dot_general, so chained
# batched 3x3 einsums serialize into separate tiny-matmul kernels (~4x
# slower than straight-line VPU code; measured with 10-deep chains at
# batch 4096).  These unrolled forms keep the whole FK/dynamics chain in
# one fused elementwise kernel.
# ---------------------------------------------------------------------------

def mat_mul(a, b):
    """(..., 3, 3) @ (..., 3, 3), unrolled."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(a[..., i, 0] * b[..., 0, j]
                       + a[..., i, 1] * b[..., 1, j]
                       + a[..., i, 2] * b[..., 2, j])
    return jnp.stack(out, axis=-1).reshape(a.shape[:-2] + (3, 3))


def mat_vec(a, v):
    """(..., 3, 3) @ (..., 3), unrolled."""
    return jnp.stack(
        [a[..., i, 0] * v[..., 0] + a[..., i, 1] * v[..., 1]
         + a[..., i, 2] * v[..., 2] for i in range(3)], axis=-1)


def mat_t_vec(a, v):
    """(..., 3, 3)^T @ (..., 3), unrolled."""
    return jnp.stack(
        [a[..., 0, i] * v[..., 0] + a[..., 1, i] * v[..., 1]
         + a[..., 2, i] * v[..., 2] for i in range(3)], axis=-1)


def rot_diag_rot_t(r, d):
    """R diag(d) R^T for (..., 3, 3) rotations and (..., 3) diagonals."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(r[..., i, 0] * d[..., 0] * r[..., j, 0]
                       + r[..., i, 1] * d[..., 1] * r[..., j, 1]
                       + r[..., i, 2] * d[..., 2] * r[..., j, 2])
    return jnp.stack(out, axis=-1).reshape(r.shape[:-2] + (3, 3))


def cross(a, b):
    """(..., 3) x (..., 3), unrolled (jnp.cross lowers similarly but this
    keeps dtype/layout uniform with the other helpers)."""
    return jnp.stack([
        a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
        a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
        a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
    ], axis=-1)


# ---------------------------------------------------------------------------
# Spatial algebra (6-vectors at the world origin)
# ---------------------------------------------------------------------------

def motion_cross(v, m):
    """v x m for motion vectors v, m = (omega, lin)."""
    w, l = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate([
        cross(w, mw),
        cross(w, ml) + cross(l, mw),
    ], axis=-1)


def force_cross(v, f):
    """v x* f for motion v = (omega, lin), force f = (torque, force)."""
    w, l = v[..., :3], v[..., 3:]
    ft, ff = f[..., :3], f[..., 3:]
    return jnp.concatenate([
        cross(w, ft) + cross(l, ff),
        cross(w, ff),
    ], axis=-1)


def spatial_inertia(mass, inertia_world, com):
    """6x6 spatial inertia at the world origin.

    mass: scalar; inertia_world: (3,3) rotational inertia about the CoM in
    world axes; com: (3,) CoM world position.  (Featherstone RBDA eq. 2.63.)
    """
    cx = skew(com)
    top_left = inertia_world + mass * (cx @ cx.T)
    top_right = mass * cx
    bot_left = mass * cx.T
    bot_right = mass * jnp.eye(3, dtype=cx.dtype)
    return jnp.block([[top_left, top_right], [bot_left, bot_right]])


def point_velocity(v, p):
    """Linear velocity of a body point at world position p given the body's
    spatial motion vector v = (omega, v0)."""
    return v[..., 3:] + cross(v[..., :3], p)
