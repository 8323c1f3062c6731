"""Forward kinematics: world poses for bodies, joints, geoms, sites.

MuJoCo-compatible semantics (validated against golden mjData):

- a body's frame = parent frame ∘ (body_pos, body_quat) ∘ joint transforms
  applied in declaration order;
- each joint's world anchor/axis are computed in the pre-this-joint frame;
  a hinge rotates the body frame about its anchor, a slide translates along
  its axis by (qpos - ref).

The body loop is a Python loop over static topology — it unrolls at trace
time (nbody <= ~20 for all supported models) into pure vectorized math, so
the whole FK is fusable XLA code with no dynamic control flow.
"""

from typing import Any

import jax.numpy as jnp
from flax import struct

from mjrl_tpu.physics import math as pm
from mjrl_tpu.physics.model import HINGE, SLIDE, Model


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
    """Rotation matrix about unit ``axis`` by ``angle`` (Rodrigues)."""
    k = pm.skew(axis)
    s = jnp.sin(angle)
    c = jnp.cos(angle)
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + s * k + (1.0 - c) * (k @ k)


def fwd_kinematics(model: Model, qpos) -> Data:
    dtype = qpos.dtype
    xpos = [jnp.zeros(3, dtype)]
    xmat = [jnp.eye(3, dtype=dtype)]
    xanchor = [None] * model.njnt
    xaxis = [None] * model.njnt

    for b in range(1, model.nbody):
        p = model.body_parent[b]
        mat = xmat[p] @ pm.quat_to_mat(model.body_quat[b])
        pos = xpos[p] + xmat[p] @ model.body_pos[b]
        for j in model.body_jnts[b]:
            anchor = pos + mat @ model.jnt_pos[j]
            axis_w = mat @ model.jnt_axis[j]
            xanchor[j] = anchor
            xaxis[j] = axis_w
            q = qpos[j] - model.jnt_ref[j]
            if model.jnt_type[j] == SLIDE:
                pos = pos + axis_w * q
            elif model.jnt_type[j] == HINGE:
                # local right-multiplication: axis fixed in pre-joint frame
                rot = _axis_angle_mat(axis_w, q)
                mat = rot @ mat
                pos = anchor - mat @ model.jnt_pos[j]
            else:
                raise NotImplementedError(
                    f"joint type {model.jnt_type[j]} not supported")
        xpos.append(pos)
        xmat.append(mat)

    xpos = jnp.stack(xpos)
    xmat = jnp.stack(xmat)

    # CoM / inertial frames
    xipos = xpos + jnp.einsum("bij,bj->bi", xmat, model.body_ipos)
    ximat = jnp.einsum("bij,bjk->bik", xmat, pm.quat_to_mat(model.body_iquat))

    # sites and geoms
    if model.nsite:
        sb = list(model.site_body)
        site_xpos = (xpos[jnp.asarray(sb)] +
                     jnp.einsum("sij,sj->si", xmat[jnp.asarray(sb)],
                                model.site_pos))
    else:
        site_xpos = jnp.zeros((0, 3), dtype)
    if model.ngeom:
        gb = jnp.asarray(list(model.geom_body))
        geom_xpos = (xpos[gb] +
                     jnp.einsum("gij,gj->gi", xmat[gb], model.geom_pos))
        geom_xmat = jnp.einsum("gij,gjk->gik", xmat[gb],
                               pm.quat_to_mat(model.geom_quat))
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
