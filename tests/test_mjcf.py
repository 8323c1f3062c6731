"""MJCF parser tests: parse the reference assets and compare the compiled
model tables against the golden MuJoCo data (same assertions as the
programmatic builders)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from mjrl_tpu.physics.mjcf import load_mjcf

REF_ASSETS = "/root/reference/mjrl/envs/assets"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

CASES = {
    "point_mass": "point_mass.xml",
    "swimmer": "swimmer.xml",
    "reacher": "sawyer.xml",
    "peg_insertion": "peg_insertion.xml",
}


def _inertia_tensor(iquat, idiag):
    from mjrl_tpu.physics.model import _np_quat_to_mat
    r = _np_quat_to_mat(np.asarray(iquat, np.float64))
    return r @ np.diag(np.asarray(idiag, np.float64)) @ r.T


@pytest.mark.parametrize("name", sorted(CASES))
def test_parse_reference_asset_matches_golden(name):
    xml = os.path.join(REF_ASSETS, CASES[name])
    gpath = os.path.join(GOLDEN, f"{name}.npz")
    if not os.path.exists(xml):
        pytest.skip("reference assets not available")
    if not os.path.exists(gpath):
        pytest.skip("golden data not available")
    g = np.load(gpath)
    model = load_mjcf(xml).finalize(jnp.float64)

    assert model.nv == g["nv"]
    assert model.nu == g["nu"]
    assert model.nbody == g["nbody"]
    assert tuple(g["body_parent"])[1:] == model.body_parent[1:]
    np.testing.assert_allclose(model.body_mass, g["body_mass"], rtol=1e-5,
                               atol=1e-9)
    np.testing.assert_allclose(model.body_pos, g["body_pos"], atol=1e-8)
    massive = np.asarray(g["body_mass"]) > 1e-12
    np.testing.assert_allclose(np.asarray(model.body_ipos)[massive],
                               g["body_ipos"][massive], atol=1e-6)
    for b in np.where(massive)[0]:
        mine = _inertia_tensor(np.asarray(model.body_iquat)[b],
                               np.asarray(model.body_inertia)[b])
        ref = _inertia_tensor(g["body_iquat"][b], g["body_inertia"][b])
        np.testing.assert_allclose(mine, ref, rtol=1e-4, atol=1e-9,
                                   err_msg=f"{name} body {b}")
    np.testing.assert_allclose(model.jnt_axis, g["jnt_axis"], atol=1e-8)
    np.testing.assert_allclose(model.jnt_range, g["jnt_range"], atol=1e-8)
    np.testing.assert_allclose(model.dof_damping, g["dof_damping"],
                               atol=1e-9)
    np.testing.assert_allclose(model.dof_armature, g["dof_armature"],
                               atol=1e-9)
    np.testing.assert_allclose(model.gear, g["gear"], atol=1e-9)
    np.testing.assert_allclose(float(model.timestep), g["timestep"],
                               atol=1e-12)
    np.testing.assert_allclose(model.gravity, g["gravity"], atol=1e-12)
    np.testing.assert_allclose(float(model.viscosity), g["viscosity"],
                               atol=1e-12)
    np.testing.assert_allclose(float(model.density), g["density"],
                               atol=1e-12)


def test_parse_inline_degrees_and_defaults():
    xml = """
    <mujoco model="t">
      <compiler angle="degree"/>
      <option timestep="0.004" gravity="0 0 -9.81"/>
      <default>
        <joint damping="0.5" limited="true"/>
        <default class="sub">
          <joint damping="2.0"/>
        </default>
      </default>
      <worldbody>
        <body pos="0 0 1" name="b1">
          <joint type="hinge" axis="0 1 0" range="-90 90" name="j1"/>
          <geom type="sphere" size="0.1"/>
          <body pos="0 0 0.5" name="b2">
            <joint type="hinge" class="sub" axis="0 1 0" range="-45 45"
                   name="j2"/>
            <geom type="capsule" fromto="0 0 0 0 0 0.4" size="0.05"/>
          </body>
        </body>
      </worldbody>
      <actuator>
        <motor joint="j1" gear="5" ctrlrange="-1 1" ctrllimited="true"/>
      </actuator>
    </mujoco>
    """
    b = load_mjcf(xml_string=xml)
    model = b.finalize()
    assert model.njnt == 2 and model.nu == 1
    # degrees converted
    np.testing.assert_allclose(np.asarray(model.jnt_range[0]),
                               [-np.pi / 2, np.pi / 2], atol=1e-6)
    # default-class damping inheritance and override
    np.testing.assert_allclose(np.asarray(model.dof_damping), [0.5, 2.0])
    assert float(model.timestep) == pytest.approx(0.004)


def test_parsed_model_steps():
    """A parsed model must run through the engine."""
    import jax
    from mjrl_tpu.physics.model import State
    from mjrl_tpu.physics.step import step_n
    xml = os.path.join(REF_ASSETS, "point_mass.xml")
    if not os.path.exists(xml):
        pytest.skip("reference assets not available")
    model = load_mjcf(xml).finalize()
    s = State(qpos=jnp.zeros(2), qvel=jnp.zeros(2))
    out = jax.jit(lambda s: step_n(model, s, jnp.ones(2), 5))(s)
    assert np.all(np.isfinite(np.asarray(out.qpos)))


def test_gymnasium_locomotion_tables_match_mujoco():
    """Mass/inertia tables for the full gymnasium locomotion suite vs
    the live MuJoCo compiler (catches compiler directives like
    half_cheetah's settotalmass that per-geom math alone misses)."""
    import os
    import numpy as np
    import jax.numpy as jnp
    mujoco = pytest.importorskip("mujoco")
    gymnasium = pytest.importorskip("gymnasium")
    gp = os.path.join(os.path.dirname(gymnasium.__file__),
                      "envs/mujoco/assets")
    for name in ("hopper", "walker2d", "half_cheetah", "swimmer",
                 "ant", "inverted_pendulum"):
        path = os.path.join(gp, f"{name}.xml")
        m = load_mjcf(path).finalize(jnp.float64)
        mm = mujoco.MjModel.from_xml_path(path)
        assert (m.nq, m.nv, m.nu) == (mm.nq, mm.nv, mm.nu), name
        np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass,
                                   rtol=1e-9, atol=1e-12, err_msg=name)
        np.testing.assert_allclose(np.asarray(m.body_inertia),
                                   mm.body_inertia, rtol=1e-7,
                                   atol=1e-12, err_msg=name)
        np.testing.assert_allclose(np.asarray(m.body_ipos), mm.body_ipos,
                                   atol=1e-9, err_msg=name)


def test_gymnasium_reacher_pusher_tables_match_mujoco():
    """Bring-your-own-MJCF breadth gate: gymnasium's Reacher and Pusher
    (slide+hinge arms, cylinders, motors) parse and match the MuJoCo
    compiler's model tables."""
    import os
    import numpy as np
    import jax.numpy as jnp
    mujoco = pytest.importorskip("mujoco")
    gymnasium = pytest.importorskip("gymnasium")
    gp = os.path.join(os.path.dirname(gymnasium.__file__),
                      "envs/mujoco/assets")
    for name in ("reacher", "pusher"):
        path = os.path.join(gp, f"{name}.xml")
        m = load_mjcf(path).finalize(jnp.float64)
        mm = mujoco.MjModel.from_xml_path(path)
        assert (m.nq, m.nv, m.nu) == (mm.nq, mm.nv, mm.nu), name
        np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass,
                                   atol=1e-9, err_msg=name)
        np.testing.assert_allclose(np.asarray(m.body_inertia),
                                   mm.body_inertia, atol=1e-9,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(m.qpos0), mm.qpos0,
                                   atol=1e-12, err_msg=name)
        np.testing.assert_allclose(np.asarray(m.dof_damping),
                                   mm.dof_damping, atol=1e-12,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(m.gear),
                                   mm.actuator_gear[:, 0], atol=1e-12,
                                   err_msg=name)
