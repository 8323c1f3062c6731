"""Environment-layer tests: obs/reward contracts, env golden rollouts,
registry and GymEnv wrapper parity."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu import envs
from mjrl_tpu.envs import GymEnv, PegEnv, PointMassEnv, Reacher7DOFEnv, \
    SwimmerEnv

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _load(name):
    path = os.path.join(GOLDEN, f"env_{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"no env golden {name}")
    return np.load(path)


def test_registry():
    assert {"mjrl_point_mass-v0", "mjrl_swimmer-v0",
            "mjrl_reacher_7dof-v0", "mjrl_peg_insertion-v0",
            "Hopper-v3"} <= set(envs.registered_ids())
    e = envs.make("mjrl_point_mass-v0")
    assert isinstance(e, PointMassEnv)


@pytest.mark.parametrize("env_id,obs_dim,act_dim,horizon", [
    ("mjrl_point_mass-v0", 6, 2, 25),
    ("mjrl_swimmer-v0", 12, 4, 500),
    ("mjrl_reacher_7dof-v0", 20, 7, 50),
    ("mjrl_peg_insertion-v0", 20, 7, 50),
])
def test_specs_and_reset_step(env_id, obs_dim, act_dim, horizon):
    env = envs.make(env_id, dtype=jnp.float64)
    spec = env.spec
    assert spec.observation_dim == obs_dim
    assert spec.action_dim == act_dim
    assert spec.horizon == horizon
    state = env.reset(jax.random.PRNGKey(0))
    assert state.obs.shape == (obs_dim,)
    state2 = env.step(state, jnp.zeros(act_dim))
    assert state2.obs.shape == (obs_dim,)
    assert state2.t == 1
    assert np.isfinite(float(state2.reward))


def _teleport_compare(env, state, g, ep, set_state_fn, atol):
    """Teleport to each golden pre-step state, take one control step, and
    compare obs on constraint-free steps (no error accumulation)."""
    step = jax.jit(env.step)
    clean = g[f"ep{ep}_clean"]
    checked = 0
    for t, a in enumerate(g[f"ep{ep}_actions"]):
        if not clean[t]:
            continue
        state = set_state_fn(state, g[f"ep{ep}_qpos_before"][t],
                             g[f"ep{ep}_qvel_before"][t])
        state = step(state, jnp.asarray(a))
        np.testing.assert_allclose(state.obs, g[f"ep{ep}_obs"][t],
                                   atol=atol, err_msg=f"ep {ep} step {t}")
        checked += 1
    return checked, state


def test_point_mass_golden_rollouts():
    g = _load("point_mass")
    env = PointMassEnv(dtype=jnp.float64)
    total = 0
    for ep in range(int(g["n_eps"])):
        state = env.reset(jax.random.PRNGKey(0))
        z = float(env.model.site_pos[env._target_sid, 2])
        state = env.set_env_state(state, dict(
            qp=g[f"ep{ep}_qp"], qv=np.zeros(2),
            target_pos=np.concatenate([g[f"ep{ep}_target"], [z]])))
        np.testing.assert_allclose(state.obs, g[f"ep{ep}_obs0"], atol=1e-8)

        def set_state(s, qp, qv):
            return s.replace(physics=s.physics.replace(
                qpos=jnp.asarray(qp), qvel=jnp.asarray(qv)))

        checked, state = _teleport_compare(env, state, g, ep, set_state, 1e-6)
        total += checked
        # reward from obs must match the reference formula
        want_r = PointMassEnv.reward_fn(jnp.asarray(g[f"ep{ep}_obs"][-1]))
        if bool(g[f"ep{ep}_clean"][-1]):
            np.testing.assert_allclose(float(state.reward), float(want_r),
                                       atol=1e-6)
    assert total >= 30


def test_swimmer_golden_rollouts():
    g = _load("swimmer")
    env = SwimmerEnv(dtype=jnp.float64)
    step = jax.jit(env.step)
    total = 0
    for ep in range(int(g["n_eps"])):
        state = env.reset(jax.random.PRNGKey(0))
        state = env.set_env_state(state, dict(qp=g[f"ep{ep}_qp"],
                                              qv=np.zeros(7)))
        np.testing.assert_allclose(state.obs, g[f"ep{ep}_obs0"], atol=1e-8)
        clean = g[f"ep{ep}_clean"]
        for t, a in enumerate(g[f"ep{ep}_actions"]):
            if not clean[t]:
                continue
            state = state.replace(physics=state.physics.replace(
                qpos=jnp.asarray(g[f"ep{ep}_qpos_before"][t]),
                qvel=jnp.asarray(g[f"ep{ep}_qvel_before"][t])))
            state = step(state, jnp.asarray(a))
            np.testing.assert_allclose(
                state.obs, g[f"ep{ep}_obs"][t], atol=1e-5,
                err_msg=f"ep {ep} step {t}")
            np.testing.assert_allclose(
                float(state.reward), g[f"ep{ep}_rewards"][t], atol=1e-5)
            total += 1
    assert total >= 15


def test_reacher_golden_rollouts():
    g = _load("reacher")
    env = Reacher7DOFEnv(dtype=jnp.float64)
    total = 0
    for ep in range(int(g["n_eps"])):
        state = env.reset(jax.random.PRNGKey(0))
        state = env.set_env_state(state, dict(
            qp=np.zeros(7), qv=np.zeros(7), target_pos=g[f"ep{ep}_target"]))
        np.testing.assert_allclose(state.obs, g[f"ep{ep}_obs0"], atol=1e-8)

        def set_state(s, qp, qv):
            return s.replace(physics=s.physics.replace(
                qpos=jnp.asarray(qp), qvel=jnp.asarray(qv)))

        checked, _ = _teleport_compare(env, state, g, ep, set_state, 1e-5)
        total += checked
    assert total >= 8


def test_peg_env_runs():
    env = PegEnv(dtype=jnp.float64)
    state = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(10):
        state = step(state, jnp.zeros(7))
    assert np.all(np.isfinite(np.asarray(state.obs)))
    # goal bodies moved consistently with scenery
    es = env.get_env_state(state)
    assert abs(float(es["target_pos"][1]) - float(state.scenery["goal_y"])) \
        < 1e-6


def test_divergence_rescue_keeps_state_finite():
    """MuJoCo resets the sim on non-finite / >mjMAXVAL state
    (mj_checkPos/mj_checkVel) so learners never see NaN observations;
    our step applies the same rescue (envs/base.py _rescue_divergence):
    pre-step qpos is kept and qvel zeroed."""
    env = PegEnv()
    state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    state = step(state, jnp.zeros(7))
    qpos_before = np.asarray(state.physics.qpos).copy()

    # poison the carry: NaN qvel propagates NaN through the whole solve
    bad = state.replace(physics=state.physics.replace(
        qvel=jnp.full_like(state.physics.qvel, jnp.nan)))
    out = step(bad, jnp.ones(7))
    assert np.all(np.isfinite(np.asarray(out.physics.qpos)))
    assert np.all(np.asarray(out.physics.qvel) == 0.0)
    np.testing.assert_allclose(np.asarray(out.physics.qpos), qpos_before)
    assert np.all(np.isfinite(np.asarray(out.obs)))

    # overflow (finite but past mjMAXVAL) is rescued too
    big = state.replace(physics=state.physics.replace(
        qvel=jnp.full_like(state.physics.qvel, 1e12)))
    out2 = step(big, jnp.zeros(7))
    assert np.all(np.isfinite(np.asarray(out2.physics.qpos)))
    assert np.all(np.abs(np.asarray(out2.physics.qpos)) < 1e10)


def test_point_mass_path_reward_shift():
    env = PointMassEnv()
    obs = jnp.asarray(np.random.RandomState(0).randn(3, 5, 6), jnp.float32)
    paths = {"observations": obs}
    out = env.compute_path_rewards(paths)
    r = PointMassEnv.reward_fn(obs)
    np.testing.assert_allclose(out["rewards"][:, :-1], r[:, 1:], rtol=1e-6)
    np.testing.assert_allclose(out["rewards"][:, -1], r[:, -1], rtol=1e-6)


def test_evaluate_success_rule():
    # any solved in last 4 -> success (point_mass.py:67-80)
    paths = [
        {"env_infos": {"solved": np.array([0, 0, 0, 0, 1, 0, 0, 0],
                                          dtype=bool)}},
        {"env_infos": {"solved": np.array([1, 1, 0, 0, 0, 0, 0, 0],
                                          dtype=bool)}},
    ]
    assert PointMassEnv.evaluate_success(paths) == 50.0


def test_gym_env_wrapper():
    e = GymEnv("mjrl_point_mass-v0")
    assert e.horizon == 25
    assert e.spec.observation_dim == 6
    obs = e.reset(seed=1)
    assert obs.shape == (6,)
    o2, r, done, info = e.step(np.array([0.5, -0.5]))
    assert o2.shape == (6,)
    assert not done
    assert "solved" in info and "state" in info
    # env state round trip
    s = e.get_env_state()
    e2 = GymEnv("mjrl_point_mass-v0")
    e2.reset(seed=2)
    e2.set_env_state(s)
    np.testing.assert_allclose(e2.get_obs(), e.get_obs(), atol=1e-6)


def test_gym_env_act_repeat():
    e = GymEnv("mjrl_point_mass-v0", act_repeat=5)
    assert e.horizon == 5
    e.reset(seed=0)
    _, r, _, _ = e.step(np.zeros(2))
    assert np.isfinite(r)


def test_gym_env_evaluate_policy():
    from mjrl_tpu.models import GaussianMLP, Policy
    e = GymEnv("mjrl_point_mass-v0")
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(8,)), seed=0)
    stats = e.evaluate_policy(pol, num_episodes=2, mean_action=True,
                              percentile=[50])
    base, pct, full = stats
    assert len(base) == 4 and np.isfinite(base[0])
    assert len(pct) == 1
    assert full is None


def test_gym_env_render():
    e = GymEnv("mjrl_point_mass-v0")
    e.reset(seed=0)
    img = e.render()
    assert img.ndim == 3 and img.shape[-1] == 3
    assert img.max() > 0


def test_mjcf_env_generic():
    """MJCFEnv: any MJCF file becomes a functional env (obs = [qpos, qvel],
    user reward/done), jit/vmap-safe."""
    from mjrl_tpu.envs import MJCFEnv
    XML = """
    <mujoco>
      <option timestep="0.002" gravity="0 0 -9.81"/>
      <worldbody>
        <body pos="0 0 1">
          <joint name="b" type="ball" limited="true" range="0 40"
                 damping="0.05"/>
          <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/>
          <body pos="0.3 0 0">
            <joint name="h" type="hinge" axis="0 1 0" damping="0.02"/>
            <geom type="sphere" size="0.04"/>
          </body>
        </body>
      </worldbody>
      <actuator><motor joint="h" gear="5" ctrlrange="-1 1"/></actuator>
    </mujoco>
    """
    env = MJCFEnv(xml_string=XML, frame_skip=2, horizon=30,
                  reset_noise=0.01,
                  reward_fn=lambda obs, act: -jnp.sum(obs[:4] ** 2),
                  done_fn=lambda obs: obs[-1] > 1e6)
    assert env.observation_dim == 5 + 4  # nq (ball 4 + hinge 1) + nv (3 + 1)
    s = env.reset(jax.random.PRNGKey(0))
    assert s.obs.shape == (env.model.nq + env.model.nv,)
    step = jax.jit(env.step)
    for _ in range(5):
        s = step(s, jnp.ones(1))
    assert np.isfinite(float(s.reward)) and not bool(s.done)

    # batched rollout through the sampler
    from mjrl_tpu.models import GaussianMLP
    from mjrl_tpu.samplers import rollout_batch
    pol = GaussianMLP(env.observation_dim, 1, hidden_sizes=(8,))
    params, tr = pol.init(jax.random.PRNGKey(1))
    batch = jax.jit(lambda p, t, k: rollout_batch(
        env, pol, p, t, k, num_traj=3, horizon=10))(
        params, tr, jax.random.PRNGKey(2))
    assert batch["observations"].shape == (3, 10, env.observation_dim)
    assert np.all(np.isfinite(np.asarray(batch["rewards"])))


def test_mjcf_env_requires_actuators():
    from mjrl_tpu.envs import MJCFEnv
    import pytest
    with pytest.raises(ValueError, match="actuator"):
        MJCFEnv(xml_string="""
        <mujoco><worldbody><body pos="0 0 1"><joint type="hinge"/>
        <geom type="sphere" size="0.1"/></body></worldbody></mujoco>""")
