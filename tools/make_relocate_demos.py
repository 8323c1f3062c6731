"""Scripted relocate expert + demo generation (the reference pipeline's
demo source: /root/reference/examples/behavior_clone.py:47-50 samples
expert paths; the original DAPG project used human teleop demos —
here a hand-crafted pick-and-place controller plays that role).

The Adroit arm's position servos make a scripted expert natural: the
action IS a target joint configuration.  The controller is a
three-phase state machine in palm-relative coordinates:

  reach: drive the palm to a hover point above the ball, fingers open
  grasp: descend onto the ball and close fingers + thumb
  lift : servo the palm (ball in hand) toward the target site

The arm's slide joints map to world axes as palm_x ~ -ARTx,
palm_y ~ +ARTz, palm_z ~ +ARTy (Jacobian at qpos0), so the reach/lift
phases are resolved-rate control on three decoupled slides.  Actions
are emitted in the env's normalized [-1, 1] space.

    python tools/make_relocate_demos.py --episodes 25 --out demos.pkl
"""

import argparse
import json
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


# actuator index blocks (XML order: arm 0-5, wrist 6-7, FF 8-11,
# MF 12-15, RF 16-19, LF 20-24, thumb 25-29)
ARTX, ARTY, ARTZ = 0, 1, 2
WRIST = [6, 7]
FINGER_FLEX = [9, 10, 11,       # A_FFJ2 A_FFJ1 A_FFJ0 (ctrlrange 0..1.6)
               13, 14, 15,      # A_MFJ2 A_MFJ1 A_MFJ0
               17, 18, 19,      # A_RFJ2 A_RFJ1 A_RFJ0
               22, 23, 24]      # A_LFJ2 A_LFJ1 A_LFJ0
FINGER_SPREAD = [8, 12, 16, 21]  # A_FFJ3 A_MFJ3 A_RFJ3 A_LFJ3 (abduction)
LFJ4 = 20                        # little-finger CMC
THUMB = [25, 26, 27, 28, 29]     # A_THJ4 A_THJ3 A_THJ2 A_THJ1 A_THJ0


def norm_action(env, ctrl_targets):
    """Absolute ctrl targets -> normalized [-1, 1] action."""
    mid = np.asarray(env._act_mid)
    rng = np.asarray(env._act_rng)
    return np.clip((np.asarray(ctrl_targets) - mid) / np.maximum(rng, 1e-8),
                   -1.0, 1.0)


class ScriptedRelocateExpert:
    """Condition-driven feedback controller (per-episode phase progress
    is the only state, keyed by batch index so lockstep batches work).

    The arm slides are position servos with a first-order tracking lag:
    commanding a target ``d`` ahead of the current position moves the
    palm only ~0.066 d per control step (measured).  Time-scheduled
    phases therefore expired long before the palm arrived (the round-3
    0/30 demo failure) — phases now advance on REACHED CONDITIONS, and
    the per-step lookahead ``rate`` adapts to distance: large when far
    (speed), small near the ball (no punting — unclamped targets flung
    the ball 2.5 m in an earlier iteration)."""

    CLOSE_T = 22   # steps to hold still while the fingers wrap

    def __init__(self, env, hover=0.09, descend=0.035, grip=1.0, seed=0):
        self.env = env
        self.hover = hover
        self.descend = descend
        self.grip = grip
        self.rng = np.random.default_rng(seed)
        self.noise = 0.0   # exploration noise scale in normalized units
        self._closing = {}   # batch index -> steps since grasp close began
        self._integ = {}     # batch index -> integral bias (palm frame)

    def reset(self):
        self._closing = {}
        self._integ = {}

    def action(self, obs, qpos, t, b=0):
        env = self.env
        palm_obj = obs[30:33]       # palm - obj
        palm_tgt = obs[33:36]       # palm - target
        arm = np.array(qpos[:6])
        ctrl = np.zeros(30)
        ctrl[:3] = arm[:3]          # slides: servo from current position
        # arm rotations (dofs 3-5) are PINNED to the zero reference —
        # "hold current" position targets integrate gravity sag into
        # drift (observed: ARRy wandered to 1.05 rad and broke the
        # slide->palm axis mapping, stalling the reach at |palm-obj|~0.3)
        ctrl[3:6] = 0.0

        def servo_palm(delta, rate, kp=0.6, ki=0.008):
            # palm_x ~ -ARTx, palm_y ~ +ARTz, palm_z ~ +ARTy.  The
            # per-step target increment is RATE-LIMITED.  The arm
            # actuators are affine with gainprm=500 / biasprm=(0,-200,0)
            # (adroit_relocate.xml): force = 500 ctrl - 200 qpos, i.e.
            # the equilibrium position is 2.5x ctrl — so the desired
            # joint position must be scaled by 200/500 = 0.4 when
            # written into ctrl.  (The wrist and finger actuators are
            # unit-gain position servos; their targets below ARE joint
            # positions.)  kp < 1 damps the tracking limit cycle the
            # pure rate-clamped target produced (observed +-0.05 xy
            # oscillation); the anti-windup integrator cancels the
            # vertical gravity droop (equilibrium = 2.5 ctrl - mg/200,
            # ~0.05-0.07 m low — the palm stalled below the hover point
            # without it).
            delta = np.asarray(delta)
            I = self._integ.get(b)
            if I is None:
                I = np.zeros(3)
            I = np.clip(I + ki * np.clip(delta, -0.05, 0.05), -0.25, 0.25)
            self._integ[b] = I
            d = np.clip(kp * delta, -rate, rate) + I
            ctrl[ARTX] = 0.4 * (arm[0] - d[0])
            ctrl[ARTZ] = 0.4 * (arm[2] + d[1])
            ctrl[ARTY] = 0.4 * (arm[1] + d[2])

        xy_err = float(np.hypot(palm_obj[0], palm_obj[1]))
        closing = self._closing.get(b, 0)
        # The vertical slide (ARTY, jnt_range [0, 0.2]) RESTS AT ITS
        # BOTTOM LIMIT: the palm cannot descend below ~0.07 over the
        # ball center — the grasp happens at that height, fingers
        # reaching down around the ball.  "Ready" is therefore pure xy
        # alignment (the z condition the earlier controller waited on
        # was unsatisfiable, which is how the 0/30 run stalled mid-air).
        ready = xy_err < 0.028 and abs(float(palm_obj[2])) < 0.095

        if closing == 0 and not ready:
            if xy_err > 0.10:
                # phase 1 — reach: coarse xy alignment above the ball,
                # fingers open (lateral sweeps at speed with curled
                # fingers can clip the ball)
                delta = np.array([-palm_obj[0], -palm_obj[1], 0.0])
                servo_palm(delta, rate=0.15)
                ctrl[FINGER_FLEX] = 0.1
                ctrl[THUMB] = 0.0
            else:
                # phase 2 — fine xy alignment, fingers pre-curled,
                # thumb prepositioned for the oppose
                delta = np.array([-palm_obj[0], -palm_obj[1], 0.0])
                servo_palm(delta, rate=0.04)
                ctrl[FINGER_FLEX] = 0.25
                ctrl[THUMB] = [0.8, 0.0, 0.0, 0.0, 0.0][:]
        else:
            # phase 3 — close the grip in place, then lift to the target
            self._closing[b] = closing + 1
            ctrl[FINGER_FLEX] = self.grip * 1.4
            ctrl[FINGER_SPREAD] = 0.0
            ctrl[THUMB] = [1.0, 1.2, 0.25, 0.5, -1.2][:]
            if closing < self.CLOSE_T:
                # hold the palm still while the fingers wrap
                delta = np.array([-palm_obj[0], -palm_obj[1], 0.0])
                servo_palm(delta, rate=0.008)
            else:
                dist = float(np.linalg.norm(palm_tgt))
                rate = 0.12 if dist > 0.12 else 0.04
                servo_palm(-palm_tgt, rate)

        a = norm_action(env, ctrl)
        if self.noise > 0:
            a = np.clip(a + self.noise * self.rng.standard_normal(30),
                        -1, 1)
        return a


_STEP_CACHE = {}


def _jitted_step(env):
    """One traced step per env instance (re-jitting per episode would
    re-trace the 36-dof contact model every time)."""
    import jax
    fn = _STEP_CACHE.get(id(env))
    if fn is None:
        fn = _STEP_CACHE[id(env)] = jax.jit(env.step)
    return fn


def run_episode(env, expert, key, horizon=200):
    state = env.reset(key)
    expert.reset()
    step = _jitted_step(env)
    obs_l, act_l, rew_l, goal_l, qpos_l = [], [], [], [], []
    env_state0 = {k: np.asarray(v)
                  for k, v in env.get_env_state(state).items()}
    for t in range(horizon):
        obs = np.asarray(state.obs)
        qpos = np.asarray(state.physics.qpos)
        a = expert.action(obs, qpos, t)
        obs_l.append(obs)
        act_l.append(a)
        state = step(state, a)
        rew_l.append(float(state.reward))
        goal_l.append(bool(state.info["goal_achieved"]))
        qpos_l.append(qpos)
    return dict(observations=np.array(obs_l), actions=np.array(act_l),
                rewards=np.array(rew_l),
                env_infos={"goal_achieved": np.array(goal_l)},
                init_state=env_state0,
                terminated=False)


def run_batch(env, expert, keys, horizon=200):
    """All episodes in lockstep: ONE vmapped jitted step per control
    step (one compile total) instead of per-episode host loops — the
    36-dof Adroit model's remote-compile cost made sequential episodes
    impractical on the axon tunnel."""
    import jax
    import jax.numpy as jnp
    B = len(keys)
    state = jax.jit(jax.vmap(env.reset))(jnp.stack(keys))
    expert.reset()
    step_b = jax.jit(jax.vmap(env.step))
    es0 = {k: np.asarray(v) for k, v in env.get_env_state(state).items()}
    obs_l, act_l, rew_l, goal_l = [], [], [], []
    for t in range(horizon):
        obs = np.asarray(state.obs)
        qpos = np.asarray(state.physics.qpos)
        acts = np.stack([expert.action(obs[b], qpos[b], t, b)
                         for b in range(B)])
        obs_l.append(obs)
        act_l.append(acts)
        state = step_b(state, jnp.asarray(acts))
        rew_l.append(np.asarray(state.reward))
        goal_l.append(np.asarray(state.info["goal_achieved"]))
    obs_a = np.stack(obs_l, 1)         # (B, T, ...)
    act_a = np.stack(act_l, 1)
    rew_a = np.stack(rew_l, 1)
    goal_a = np.stack(goal_l, 1)
    out = []
    for b in range(B):
        out.append(dict(
            observations=obs_a[b], actions=act_a[b], rewards=rew_a[b],
            env_infos={"goal_achieved": goal_a[b]},
            init_state={k: v[b] for k, v in es0.items()},
            terminated=False))
    return out


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=25)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--noise", type=float, default=0.0)
    args = ap.parse_args()

    from mjrl_tpu.envs.adroit import AdroitRelocateEnv
    env = AdroitRelocateEnv()
    expert = ScriptedRelocateExpert(env, seed=args.seed)
    expert.noise = args.noise

    keys = [jax.random.PRNGKey(args.seed * 1000 + ep)
            for ep in range(args.episodes)]
    paths = run_batch(env, expert, keys, args.horizon)
    demos, succ = [], 0
    for ep, path in enumerate(paths):
        ok = int(np.sum(path["env_infos"]["goal_achieved"]) > 25)
        succ += ok
        print(json.dumps({
            "ep": ep, "return": round(float(path["rewards"].sum()), 1),
            "goal_steps": int(np.sum(path["env_infos"]["goal_achieved"])),
            "success": bool(ok)}), flush=True)
        if ok:
            demos.append(path)
    print(json.dumps({"episodes": args.episodes, "successes": succ,
                      "rate": round(100.0 * succ / args.episodes, 1)}),
          flush=True)
    if args.out and demos:
        with open(args.out, "wb") as f:
            pickle.dump(demos, f)
        print(json.dumps({"saved": args.out, "demos": len(demos)}),
              flush=True)


if __name__ == "__main__":
    main()
