"""Contact-manifold parity vs live MuJoCo: capsule-box and box-box.

Round-5 narrowphase (collision.py): analytic 2-point capsule-box
manifolds (mjc_CapsuleBox semantics) and 4-corner box-box face
manifolds (mjc_BoxBox face case).  Each scene pins contact COUNT,
position, and depth against mujoco.mj_forward — the defects these
catch (5 axis-sampled contacts all active, dropped box-box pairs,
center-anchored deep positions) were the round-4 Adroit grasp gap
(docs/ROADMAP.md item 11)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mjrl_tpu.physics.collision import find_contacts
from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.mjcf import load_mjcf

BASE = """
<mujoco><option timestep="0.002"/>
<worldbody>
  <geom name="table" type="box" size="{tsize}" pos="0 0 -0.1"/>
  <body name="b" pos="{pos}" euler="{euler}">
    <joint type="slide" axis="1 0 0"/><joint type="slide" axis="0 1 0"/>
    <joint type="slide" axis="0 0 1"/>
    <joint type="hinge" axis="1 0 0"/><joint type="hinge" axis="0 1 0"/>
    <joint type="hinge" axis="0 0 1"/>
    {geom}
  </body>
</worldbody></mujoco>"""

CAP = '<geom type="capsule" size="0.03 0.1"/>'
BOX = '<geom type="box" size="0.04 0.03 0.02"/>'
TINY = '<geom type="box" size="0.001 0.001 0.001"/>'

# (label, table size, body pos, body euler, geom)
SCENES = [
    ("capsule flat 2pt", "0.5 0.5 0.1", "0 0 0.028", "0 90 0", CAP),
    ("capsule tilt20 1pt", "0.5 0.5 0.1", "0 0 0.05", "0 70 0", CAP),
    ("capsule upright 1pt", "0.5 0.5 0.1", "0 0 0.125", "0 0 0", CAP),
    ("capsule overhang clip", "0.06 0.5 0.1", "0.08 0 0.028", "0 90 0", CAP),
    ("capsule tilt2 drops 2nd", "0.06 0.5 0.1", "0 0 0.028", "0 88 0", CAP),
    ("box flat 4 corners", "0.5 0.5 0.1", "0 0 0.015", "0 0 0", BOX),
    ("box tilt10 2 corners", "0.5 0.5 0.1", "0 0 0.02", "10 0 0", BOX),
    ("tiny box sunk", "0.5 0.5 0.1", "0 0 -0.011", "20 30 0", TINY),
    ("deep sphere inside", "0.5 0.5 0.1", "0 0 -0.023", "0 0 0",
     '<geom type="sphere" size="0.035"/>'),
]


@pytest.mark.parametrize("label,tsize,pos,euler,geom",
                         SCENES, ids=[s[0] for s in SCENES])
def test_manifold_matches_live_mujoco(label, tsize, pos, euler, geom):
    mujoco = pytest.importorskip("mujoco")
    xml = BASE.format(tsize=tsize, pos=pos, euler=euler, geom=geom)
    m = mujoco.MjModel.from_xml_string(xml)
    d = mujoco.MjData(m)
    mujoco.mj_forward(m, d)
    mj = sorted((round(-c.dist, 4), tuple(np.round(c.pos, 3)))
                for c in d.contact)

    model = load_mjcf(xml_string=xml).finalize(jnp.float64, solver="newton")
    data = fwd_kinematics(model, jnp.zeros(model.nq))
    depths, point, normal, g1, g2 = find_contacts(model, data)
    depths = np.asarray(depths)
    pts = np.stack([np.asarray(p) for p in point], -1)
    ours = sorted((round(float(depths[c]), 4), tuple(np.round(pts[c], 3)))
                  for c in np.nonzero(depths > 0)[0])

    assert len(ours) == len(mj), (label, ours, mj)
    for (do, po), (dm, pm) in zip(ours, mj):
        assert abs(do - dm) < 2e-3, (label, ours, mj)
        assert np.linalg.norm(np.array(po) - np.array(pm)) < 2e-3, \
            (label, ours, mj)
