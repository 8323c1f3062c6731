"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import LinearBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.parallel import batch_sharding, make_mesh
from mjrl_tpu.samplers import rollout_batch


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("batch",)


def test_sharded_rollout_matches_unsharded():
    env = GymEnv("mjrl_point_mass-v0").env
    pol = GaussianMLP(6, 2, hidden_sizes=(8,))
    params, transforms = pol.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    mesh = make_mesh()

    plain = jax.jit(lambda p, tr, k: rollout_batch(
        env, pol, p, tr, k, num_traj=16, horizon=5))(params, transforms, key)
    sharded = jax.jit(lambda p, tr, k: rollout_batch(
        env, pol, p, tr, k, num_traj=16, horizon=5, mesh=mesh))(
        params, transforms, key)
    np.testing.assert_allclose(np.asarray(plain["observations"]),
                               np.asarray(sharded["observations"]),
                               atol=1e-5)
    # rollout really is partitioned over devices
    shards = sharded["observations"].sharding
    assert len(shards.device_set) == 8


def test_sharded_npg_train_step():
    mesh = make_mesh()
    env = GymEnv("mjrl_point_mass-v0")
    pol = Policy(GaussianMLP(6, 2, hidden_sizes=(16,)), seed=0)
    bl = LinearBaseline(env.spec)
    agent = NPG(env, pol, bl, normalized_step_size=0.05, seed=0,
                save_logs=True, mesh=mesh)
    stats = agent.train_step(N=16, gamma=0.95, gae_lambda=0.97, horizon=10)
    assert len(stats) == 5
    assert np.isfinite(stats[0])
    log = agent.logger.get_current_log()
    assert np.isfinite(log["kl_dist"])


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_update_matches_unsharded():
    """Full NPG train step: identical results with and without the mesh
    (GSPMD partitioning must be numerically transparent)."""
    def make_agent(mesh):
        env = GymEnv("mjrl_point_mass-v0")
        pol = Policy(GaussianMLP(6, 2, hidden_sizes=(8,)), seed=4)
        bl = LinearBaseline(env.spec)
        return NPG(env, pol, bl, normalized_step_size=0.05, seed=9,
                   save_logs=False, mesh=mesh)

    a1 = make_agent(None)
    a2 = make_agent(make_mesh())
    s1 = a1.train_step(N=16, gamma=0.95, gae_lambda=0.97, horizon=6)
    s2 = a2.train_step(N=16, gamma=0.95, gae_lambda=0.97, horizon=6)
    # partitioned reductions reorder float sums; only tiny drift allowed
    np.testing.assert_allclose(s1[:4], s2[:4], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(a1.policy.get_param_values(),
                               a2.policy.get_param_values(),
                               rtol=1e-2, atol=1e-3)


def test_sharded_contact_rollout_matches_unsharded():
    """Contact-rich env (Hopper: planar implicit contact solver + early
    termination masks) — mesh sharding must be numerically transparent
    to the rollout, including frozen post-termination tails."""
    env = GymEnv("Hopper-v3").env
    pol = GaussianMLP(11, 3, hidden_sizes=(8,))
    params, transforms = pol.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    mesh = make_mesh()

    plain = jax.jit(lambda p, tr, k: rollout_batch(
        env, pol, p, tr, k, num_traj=16, horizon=6))(params, transforms,
                                                     key)
    sharded = jax.jit(lambda p, tr, k: rollout_batch(
        env, pol, p, tr, k, num_traj=16, horizon=6, mesh=mesh))(
        params, transforms, key)
    np.testing.assert_allclose(np.asarray(plain["observations"]),
                               np.asarray(sharded["observations"]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(plain["mask"]),
                               np.asarray(sharded["mask"]))
    assert len(sharded["observations"].sharding.device_set) == 8


def test_sharded_contact_npg_update_matches():
    """Full NPG train step on Hopper (contacts + termination masks across
    the mesh): sharded and unsharded agents take the same step."""
    def make_agent(mesh):
        env = GymEnv("Hopper-v3")
        pol = Policy(GaussianMLP(11, 3, hidden_sizes=(8,)), seed=4)
        bl = LinearBaseline(env.spec)
        return NPG(env, pol, bl, normalized_step_size=0.05, seed=9,
                   save_logs=False, mesh=mesh)

    a1 = make_agent(None)
    a2 = make_agent(make_mesh())
    s1 = a1.train_step(N=16, gamma=0.995, gae_lambda=0.97, horizon=6)
    s2 = a2.train_step(N=16, gamma=0.995, gae_lambda=0.97, horizon=6)
    np.testing.assert_allclose(s1[:4], s2[:4], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(a1.policy.get_param_values(),
                               a2.policy.get_param_values(),
                               rtol=1e-2, atol=1e-3)


def test_pallas_dispatch_requires_no_mesh():
    """The planar Pallas kernel owns its own env tiling and cannot be
    GSPMD-partitioned: under a mesh (or autoreset, or non-multiple-of-1024
    batches) rollout_batch must take the shardable vmap path."""
    from mjrl_tpu.samplers.rollout import pallas_eligible
    env = GymEnv("mjrl_swimmer-v0").env   # planar, never terminates
    # eligible on a TPU backend at kernel-friendly batch sizes...
    assert pallas_eligible(env, 1024, backend="tpu")
    # ...but never with a mesh, autoreset, ragged batches, or on CPU
    assert not pallas_eligible(env, 1024, mesh=make_mesh(), backend="tpu")
    assert not pallas_eligible(env, 1024, autoreset=True, backend="tpu")
    assert not pallas_eligible(env, 1000, backend="tpu")
    assert not pallas_eligible(env, 1024, backend="cpu")
    # contact envs (hopper) stay on the vmapped stacked path (measured
    # NO-GO for the in-kernel contact dual — docs/ROADMAP.md item 3)
    hopper = GymEnv("Hopper-v3").env
    assert not pallas_eligible(hopper, 1024, backend="tpu")


def test_ensemble_model_axis_sharding():
    """World-model ensemble fitting with the stacked-model axis sharded
    across devices (ensemble parallelism)."""
    from mjrl_tpu.algos import WorldModelEnsemble
    rng = np.random.RandomState(0)
    s = rng.randn(256, 4).astype(np.float32)
    a = rng.randn(256, 2).astype(np.float32)
    sp = (s + 0.1 * np.tanh(a @ rng.randn(2, 4))).astype(np.float32)

    mesh = make_mesh()
    ens = WorldModelEnsemble(8, 4, 2, seed=0, mesh=mesh)
    losses = ens.fit_dynamics(s, a, sp, fit_mb_size=64, fit_epochs=3)
    assert losses.shape == (8, 3)
    assert np.isfinite(losses).all()
    preds = ens.predict_all(s[:8], a[:8])
    assert preds.shape == (8, 8, 4)
