"""Forward kinematics: world poses for bodies, joints, geoms, sites.

MuJoCo-compatible semantics (validated against golden mjData):

- a body's frame = parent frame ∘ (body_pos, body_quat) ∘ joint transforms
  applied in declaration order;
- each joint's world anchor/axis are computed in the pre-this-joint frame;
  a hinge rotates the body frame about its anchor, a slide translates along
  its axis by (qpos - ref).

The body loop is a Python loop over static topology — it unrolls at trace
time (nbody <= ~20 for all supported models) into straight-line unrolled
3x3 math (pm.mat_mul / mat_vec, no dot_general) so the whole FK fuses
into one elementwise XLA kernel over the env batch.
"""

from typing import Any

import jax.numpy as jnp
from flax import struct

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.model import BALL, FREE, HINGE, SLIDE, Model


class Data(struct.PyTreeNode):
    """Per-state kinematic (and later dynamic) quantities."""
    xpos: Any       # (nbody, 3) body frame origin, world
    xmat: Any       # (nbody, 3, 3) body orientation, world
    xipos: Any      # (nbody, 3) body CoM, world
    ximat: Any      # (nbody, 3, 3) principal-inertia frame, world
    xanchor: Any    # (njnt, 3) joint anchor, world
    xaxis: Any      # (njnt, 3) joint axis, world
    site_xpos: Any  # (nsite, 3)
    geom_xpos: Any  # (ngeom, 3)
    geom_xmat: Any  # (ngeom, 3, 3)


def _axis_angle_mat(axis, angle):
    """Rotation matrix about unit ``axis`` by ``angle`` (Rodrigues),
    unrolled."""
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    ic = 1.0 - c
    rows = [
        c + x * x * ic, x * y * ic - z * s, x * z * ic + y * s,
        y * x * ic + z * s, c + y * y * ic, y * z * ic - x * s,
        z * x * ic - y * s, z * y * ic + x * s, c + z * z * ic,
    ]
    return jnp.stack(rows, axis=-1).reshape(axis.shape[:-1] + (3, 3))


def fwd_kinematics(model: Model, qpos) -> Data:
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xmat = [jnp.eye(3, dtype=dtype)]
    xanchor = [None] * model.njnt
    xaxis = [None] * model.njnt

    for b in range(1, model.nbody):
        p = model.body_parent[b]
        mat = pm.mat_mul(xmat[p], pm.quat_to_mat(model.body_quat[b]))
        pos = xpos[p] + pm.mat_vec(xmat[p], model.body_pos[b])
        for j in model.body_jnts[b]:
            adr = model.jnt_qposadr[j]
            if model.jnt_type[j] == FREE:
                # floating base: qpos holds the absolute world pose
                pos = qpos[adr:adr + 3]
                quat = qpos[adr + 3:adr + 7]
                quat = quat / jnp.sqrt(jnp.sum(quat * quat) + 1e-12)
                mat = pm.quat_to_mat(quat)
                xanchor[j] = pos
                xaxis[j] = mat[:, 2]
                continue
            anchor = pos + pm.mat_vec(mat, model.jnt_pos[j])
            axis_w = pm.mat_vec(mat, model.jnt_axis[j])
            xanchor[j] = anchor
            xaxis[j] = axis_w
            if model.jnt_type[j] == BALL:
                # rotate about the anchor by the local quaternion (MuJoCo:
                # xaxis stays in the PRE-rotation frame — probed vs mjData)
                q4 = qpos[adr:adr + 4]
                q4 = q4 / jnp.sqrt(jnp.sum(q4 * q4) + 1e-12)
                mat = pm.mat_mul(mat, pm.quat_to_mat(q4))
                pos = anchor - pm.mat_vec(mat, model.jnt_pos[j])
                continue
            q = qpos[adr] - model.jnt_ref[j]
            if model.jnt_type[j] == SLIDE:
                pos = pos + axis_w * q
            elif model.jnt_type[j] == HINGE:
                # local right-multiplication: axis fixed in pre-joint frame
                rot = _axis_angle_mat(axis_w, q)
                mat = pm.mat_mul(rot, mat)
                pos = anchor - pm.mat_vec(mat, model.jnt_pos[j])
            else:
                raise NotImplementedError(
                    f"joint type {model.jnt_type[j]} not supported")
        xpos.append(pos)
        xmat.append(mat)

    xpos = jnp.stack(xpos)
    xmat = jnp.stack(xmat)

    # CoM / inertial frames
    xipos = xpos + pm.mat_vec(xmat, model.body_ipos)
    ximat = pm.mat_mul(xmat, pm.quat_to_mat(model.body_iquat))

    # sites and geoms
    if model.nsite:
        sb = jnp.asarray(list(model.site_body))
        site_xpos = xpos[sb] + pm.mat_vec(xmat[sb], model.site_pos)
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
    if model.ngeom:
        gb = jnp.asarray(list(model.geom_body))
        geom_xpos = xpos[gb] + pm.mat_vec(xmat[gb], model.geom_pos)
        geom_xmat = pm.mat_mul(xmat[gb], pm.quat_to_mat(model.geom_quat))
    else:
        geom_xpos = jnp.zeros((0, 3), dtype)
        geom_xmat = jnp.zeros((0, 3, 3), dtype)

    xanchor = (jnp.stack(xanchor) if model.njnt
               else jnp.zeros((0, 3), dtype))
    xaxis = (jnp.stack(xaxis) if model.njnt
             else jnp.zeros((0, 3), dtype))

    return Data(xpos=xpos, xmat=xmat, xipos=xipos, ximat=ximat,
                xanchor=xanchor, xaxis=xaxis, site_xpos=site_xpos,
                geom_xpos=geom_xpos, geom_xmat=geom_xmat)
