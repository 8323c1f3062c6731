"""Peg-insertion environment (reference mjrl/envs/peg_insertion_sawyer.py).

obs = [qpos (7), qvel (7), peg_bottom site xyz, target site xyz] (20,)
(peg_insertion_sawyer.py:24-30); reward = -l1 - 5 l2 + 5*(l2 < 0.06) on obs
clipped to [-10, 10] (peg_insertion_sawyer.py:32-48); reset randomizes the
hole position: goal_y ~ U(0.1, 0.5) shifts the bodies target/w4/w3 in y by
(goal_y - 0.29) from their initial positions (peg_insertion_sawyer.py:64-73).
"""

import jax
import jax.numpy as jnp

from mjrl_tpu.envs.assets import peg_insertion_model
from mjrl_tpu.envs.base import MujocoLikeEnv


class PegEnv(MujocoLikeEnv):
    observation_dim = 20
    frame_skip = 4
    horizon = 50

    # default = implicit solver: contacts with the table/hole get true
    # complementarity + boxed-cone friction instead of penalties, at a
    # measured ~25% rollout-throughput cost (docs/BENCHMARKS.md) — viable
    # because the dual solve never materializes the ~1.4k-row A matrix
    def __init__(self, dtype=jnp.float32, solver="pgs"):
        builder = peg_insertion_model()
        self._target_sid = builder.names["site"]["target"]
        self._peg_sid = builder.names["site"]["peg_bottom"]
        self._moved_bodies = tuple(builder.names["body"][n]
                                   for n in ("target", "w4", "w3"))
        # per-control-step row freeze: peg contacts are quasi-static
        # (zero gravity, guided insertion) and its 474-pair row assembly
        # dominates a dynamics eval — the amortization is what makes the
        # implicit solver faster than penalty here (docs/BENCHMARKS.md).
        # GATED, not just asserted: full frozen-config control steps
        # match live MuJoCo to median 4.8e-9 qpos on the golden contact
        # states, and the per-substep-rebuild path shows the SAME tail
        # (tests/test_solver.py::
        #  test_peg_frozen_rows_match_live_mujoco_control_steps)
        self.model = builder.finalize(dtype, solver=solver,
                                      row_freeze_step=True)
        self._init_body_pos = self.model.body_pos
        self.dtype = dtype

    def _patched_model(self, scenery):
        # shift the 3 goal bodies in y by (goal_y - 0.29)
        # (peg_insertion_sawyer.py:66-71)
        delta = scenery["goal_y"] - 0.29
        body_pos = self._init_body_pos
        for b in self._moved_bodies:
            body_pos = body_pos.at[b, 1].add(delta)
        return self.model.replace(body_pos=body_pos)

    def _reset_scenery(self, key):
        return {"goal_y": jax.random.uniform(key, (), self.dtype, 0.1, 0.5)}

    def _reset_qpos_qvel(self, key):
        return (jnp.zeros((7,), self.dtype), jnp.zeros((7,), self.dtype))

    def _obs(self, data, scenery, physics):
        return jnp.concatenate([
            physics.qpos, physics.qvel,
            data.site_xpos[self._peg_sid],
            data.site_xpos[self._target_sid]])

    @staticmethod
    def reward_fn(obs):
        obs = jnp.clip(obs, -10.0, 10.0)
        hand = obs[..., -6:-3]
        target = obs[..., -3:]
        l1 = jnp.sum(jnp.abs(hand - target), axis=-1)
        l2 = jnp.linalg.norm(hand - target, axis=-1)
        bonus = 5.0 * (l2 < 0.06)
        return -l1 - 5.0 * l2 + bonus

    def _reward(self, obs, action, prev_state, new_physics):
        return self.reward_fn(obs)

    def batched_reward(self, obs):
        return self.reward_fn(obs)

    def get_env_state(self, state):
        # reference stores the full target body pos (sawyer peg :88-92)
        delta = state.scenery["goal_y"] - 0.29
        tb = self._moved_bodies[0]
        target_pos = self._init_body_pos[tb].at[1].add(delta)
        return dict(qp=state.physics.qpos, qv=state.physics.qvel,
                    target_pos=target_pos)

    def set_env_state(self, state, env_state):
        goal_y = jnp.asarray(env_state["target_pos"])[1]
        return super().set_env_state(
            state, dict(qp=env_state["qp"], qv=env_state["qv"],
                        goal_y=goal_y))
