"""Gym/MuJoCo-parity locomotion environments (Hopper, HalfCheetah,
Walker2d, InvertedPendulum).

The reference trains on gym MuJoCo tasks via the same GymEnv wrapper
(examples/example_configs/hopper_npg.txt; tests/hydra runs Hopper-v3).
Here the MJCF models are parsed from the installed ``gymnasium`` package's
assets with mjrl_tpu's own parser and stepped by the JAX engine — fully
on-device, no MuJoCo dependency at run time.

Semantics follow the gym v3 task definitions:
- Hopper-v3: obs [qpos[1:], clip(qvel, ±10)] (11,); reward = healthy(1) +
  x-velocity - 1e-3 |a|^2; terminate when z < 0.7, |angle| > 0.2, or any
  state coordinate leaves (-100, 100); reset noise U(-5e-3, 5e-3).
- HalfCheetah-v3: obs (17,); reward = x-velocity - 0.1 |a|^2; no early
  termination; reset noise U(-0.1, 0.1) on qpos, 0.1 N(0,1) on qvel.
- Walker2d-v3: obs (17,); healthy z in (0.8, 2), angle in (-1, 1).
- InvertedPendulum-v2: obs (4,); reward 1; terminate when |angle| > 0.2.
- Ant-v3 (floating base, free joint): obs [qpos[2:], qvel] (27, i.e. the
  v4 ``use_contact_forces=False`` observation — this engine exposes no
  cfrc_ext); reward = healthy(1) + x-velocity - 0.5 |a|^2 (the reference
  gym env additionally subtracts a small contact cost); terminate when
  z leaves (0.2, 1.0).

Solver defaults are per env (``default_solver``): the whole
locomotion suite — Hopper, Walker2d, HalfCheetah, Ant and Humanoid —
uses the implicit soft-constraint solver (physics/solver.py, contact
qacc <=2% vs MuJoCo goldens) — each flip is validated by LEARNING +
cross-simulator transfer: policies trained under newton score as well
or better when rolled inside real MuJoCo (docs/BENCHMARKS.md
"Cross-simulator validation": Hopper 3196 -> 3285, Ant 2582 -> 3041,
Humanoid 442 -> 499), while penalty-trained policies collapse or
degrade there (Ant 12330 -> -338, Humanoid 584 -> 310).  Pass
``solver="newton"``/"penalty" to override.
"""

import os

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.base import MujocoLikeEnv


def _gym_asset(name):
    import gymnasium
    path = os.path.join(os.path.dirname(gymnasium.__file__), "envs",
                        "mujoco", "assets", name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"gymnasium MJCF asset not found: {path}")
    return path


class _GymMujocoEnv(MujocoLikeEnv):
    xml_name: str
    reset_noise = 5e-3
    vel_noise = None   # None -> uniform reset_noise; float -> gaussian scale
    needs_fk_obs = False  # whole suite observes qpos/qvel only
    # per-env solver default; "newton" where the implicit response is
    # validated to IMPROVE learning and to TRANSFER (cross-eval inside
    # real MuJoCo — docs/BENCHMARKS.md: Hopper 3196->3285, Walker2d
    # 2765->3186, Ant 2582->3041; penalty-trained hopper drops
    # 3094->1188 and penalty ant 12330->-338).
    default_solver = "penalty"

    def __init__(self, dtype=jnp.float32, solver=None, cone=None):
        solver = solver or self.default_solver
        from mjrl_tpu.physics.mjcf import load_mjcf
        builder = load_mjcf(_gym_asset(self.xml_name))
        if cone is not None:
            from mjrl_tpu.physics.model import ELLIPTIC, PYRAMIDAL
            builder.opt["cone"] = (ELLIPTIC
                                   if str(cone).lower() == "elliptic"
                                   else PYRAMIDAL)
        self.model = builder.finalize(dtype, solver=solver)
        self.dtype = dtype
        # MuJoCo init_qpos = qpos0 (free joints: body pose; else jnt ref)
        self.init_qpos = self.model.qpos0
        self.nq = self.model.nq
        self.nv = self.model.nv

    def _reset_scenery(self, key):
        return {}

    def _reset_qpos_qvel(self, key):
        kq, kv = jax.random.split(key)
        qpos = self.init_qpos + jax.random.uniform(
            kq, (self.nq,), self.dtype, -self.reset_noise, self.reset_noise)
        if self.vel_noise is None:
            qvel = jax.random.uniform(kv, (self.nv,), self.dtype,
                                      -self.reset_noise, self.reset_noise)
        else:
            qvel = self.vel_noise * jax.random.normal(kv, (self.nv,),
                                                      self.dtype)
        return qpos, qvel


class HopperEnv(_GymMujocoEnv):
    xml_name = "hopper.xml"
    observation_dim = 11
    frame_skip = 4
    default_solver = "newton"
    horizon = 1000
    healthy_z = (0.7, jnp.inf)
    healthy_angle = (-0.2, 0.2)
    healthy_reward = 1.0
    ctrl_cost = 1e-3
    forward_weight = 1.0

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos[1:],
                                jnp.clip(physics.qvel, -10.0, 10.0)])

    def _reward(self, obs, action, prev_state, new_physics):
        x_vel = (new_physics.qpos[0] - prev_state.physics.qpos[0]) / self.dt
        ctrl = self.ctrl_cost * jnp.sum(jnp.square(action))
        return self.healthy_reward + self.forward_weight * x_vel - ctrl

    def _done(self, obs, physics):
        z, angle = physics.qpos[1], physics.qpos[2]
        state = jnp.concatenate([physics.qpos[2:], physics.qvel])
        healthy = ((z > self.healthy_z[0]) & (z < self.healthy_z[1])
                   & (angle > self.healthy_angle[0])
                   & (angle < self.healthy_angle[1])
                   & jnp.all(jnp.abs(state) < 100.0)
                   & jnp.all(jnp.isfinite(obs)))
        return ~healthy


class Walker2dEnv(HopperEnv):
    xml_name = "walker2d.xml"
    observation_dim = 17
    frame_skip = 4
    default_solver = "newton"
    healthy_z = (0.8, 2.0)
    healthy_angle = (-1.0, 1.0)

    def _done(self, obs, physics):
        z, angle = physics.qpos[1], physics.qpos[2]
        healthy = ((z > self.healthy_z[0]) & (z < self.healthy_z[1])
                   & (angle > self.healthy_angle[0])
                   & (angle < self.healthy_angle[1])
                   & jnp.all(jnp.isfinite(obs)))
        return ~healthy


class HalfCheetahEnv(_GymMujocoEnv):
    xml_name = "half_cheetah.xml"
    observation_dim = 17
    frame_skip = 5
    default_solver = "newton"
    horizon = 1000
    reset_noise = 0.1
    vel_noise = 0.1
    ctrl_cost = 0.1

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos[1:], physics.qvel])

    def _reward(self, obs, action, prev_state, new_physics):
        x_vel = (new_physics.qpos[0] - prev_state.physics.qpos[0]) / self.dt
        return x_vel - self.ctrl_cost * jnp.sum(jnp.square(action))


class AntEnv(_GymMujocoEnv):
    xml_name = "ant.xml"
    observation_dim = 27
    frame_skip = 5
    # flipped round 3: ant-penalty NPG reaches a fantastical 12330
    # in-sim but scores -338 in real MuJoCo (contact exploit); newton's
    # 2582 transfers to 3041 (docs/BENCHMARKS.md cross-eval table)
    default_solver = "newton"
    horizon = 1000
    reset_noise = 0.1
    vel_noise = 0.1
    healthy_z = (0.2, 1.0)
    healthy_reward = 1.0
    ctrl_cost = 0.5

    def _reset_qpos_qvel(self, key):
        qpos, qvel = super()._reset_qpos_qvel(key)
        # renormalize the root quaternion after additive reset noise
        quat = qpos[3:7]
        qpos = qpos.at[3:7].set(
            quat / jnp.sqrt(jnp.sum(quat * quat) + 1e-12))
        return qpos, qvel

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos[2:], physics.qvel])

    def _reward(self, obs, action, prev_state, new_physics):
        x_vel = (new_physics.qpos[0] - prev_state.physics.qpos[0]) / self.dt
        ctrl = self.ctrl_cost * jnp.sum(jnp.square(action))
        return self.healthy_reward + x_vel - ctrl

    def _done(self, obs, physics):
        z = physics.qpos[2]
        healthy = ((z > self.healthy_z[0]) & (z < self.healthy_z[1])
                   & jnp.all(jnp.isfinite(obs)))
        return ~healthy


class HumanoidEnv(_GymMujocoEnv):
    """Humanoid (17 actuators, floating base).  obs = [qpos[2:], qvel]
    (45, the v4 observation without the cinert/cvel/qfrc/cfrc blocks);
    reward = healthy(5) + 1.25 x-velocity - 0.1 |a|^2; terminate when z
    leaves (1.0, 2.0).  Forward velocity is measured at the root joint
    (the gym env uses the whole-model center of mass — small documented
    deviation).

    Defaults to the implicit solver (flipped round 3): the NPG policy
    trained under it (step 0.05, init_log_std -0.5, 150 iters, 442
    in-sim) transfers to 499 +- 48 in real MuJoCo, while the
    penalty-trained arm (584 in-sim) drops to 310 there —
    docs/BENCHMARKS.md cross-eval table."""
    xml_name = "humanoid.xml"
    default_solver = "newton"
    observation_dim = 45
    frame_skip = 5
    horizon = 1000
    reset_noise = 0.01
    healthy_z = (1.0, 2.0)
    healthy_reward = 5.0
    ctrl_cost = 0.1
    forward_weight = 1.25

    def _reset_qpos_qvel(self, key):
        qpos, qvel = super()._reset_qpos_qvel(key)
        quat = qpos[3:7]
        qpos = qpos.at[3:7].set(
            quat / jnp.sqrt(jnp.sum(quat * quat) + 1e-12))
        return qpos, qvel

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos[2:], physics.qvel])

    def _reward(self, obs, action, prev_state, new_physics):
        x_vel = (new_physics.qpos[0] - prev_state.physics.qpos[0]) / self.dt
        ctrl = self.ctrl_cost * jnp.sum(jnp.square(action))
        return self.healthy_reward + self.forward_weight * x_vel - ctrl

    def _done(self, obs, physics):
        z = physics.qpos[2]
        healthy = ((z > self.healthy_z[0]) & (z < self.healthy_z[1])
                   & jnp.all(jnp.isfinite(obs)))
        return ~healthy


class InvertedPendulumEnv(_GymMujocoEnv):
    xml_name = "inverted_pendulum.xml"
    observation_dim = 4
    frame_skip = 2
    horizon = 1000
    reset_noise = 0.01

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([physics.qpos, physics.qvel])

    def _reward(self, obs, action, prev_state, new_physics):
        return jnp.ones((), obs.dtype)

    def _done(self, obs, physics):
        return (jnp.abs(physics.qpos[1]) > 0.2) | \
            ~jnp.all(jnp.isfinite(obs))
