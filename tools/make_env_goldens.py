"""Golden *environment* rollouts: scripted action sequences through raw
MuJoCo, replicating the reference envs' obs assembly (mjrl/envs/*.py), to
validate the mjrl_tpu env layer (obs construction, scenery patching, reward
plumbing) end-to-end.

Output: tests/golden/env_<name>.npz with per-episode (init state, scenery,
actions, obs sequence).
"""

import os

import numpy as np

import mujoco

REF = "/root/reference/mjrl/envs/assets"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def rollout(model, data, frame_skip, actions, obs_fn):
    """Per-control-step records: state before, obs after, and a clean flag
    (True when no constraints fired during the whole frame_skip window) —
    lets tests teleport to each state and compare single steps with no
    error accumulation, skipping constraint-active steps (penalty-contact
    deviation is a documented approximation)."""
    qpos_b, qvel_b, obs_seq, clean = [], [], [], []
    for a in actions:
        qpos_b.append(data.qpos.copy())
        qvel_b.append(data.qvel.copy())
        data.ctrl[:] = np.clip(a, model.actuator_ctrlrange[:, 0],
                               model.actuator_ctrlrange[:, 1])
        step_clean = True
        for _ in range(frame_skip):
            mujoco.mj_step(model, data)
            if data.nefc > 0 or data.ncon > 0:
                step_clean = False
        # refresh kinematics: mj_step leaves site/body positions one
        # sub-step stale; the rebuild computes obs from fresh FK
        # (capability parity, not quirk parity)
        mujoco.mj_forward(model, data)
        obs_seq.append(obs_fn(model, data))
        clean.append(step_clean)
    return (np.array(qpos_b), np.array(qvel_b), np.array(obs_seq),
            np.array(clean))


def golden_point_mass(rng, n_eps=5, horizon=10):
    model = mujoco.MjModel.from_xml_path(os.path.join(REF, "point_mass.xml"))
    agent_bid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "agent")
    target_sid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, "target")

    def obs_fn(m, d):
        return np.concatenate([d.xpos[agent_bid][:2], d.qvel.ravel(),
                               d.site_xpos[target_sid][:2]])

    eps = []
    for _ in range(n_eps):
        data = mujoco.MjData(model)
        qp = rng.uniform(-1, 1, 2)
        target = rng.uniform(-1, 1, 2)
        model.site_pos[target_sid][0] = target[0]
        model.site_pos[target_sid][1] = target[1]
        data.qpos[:] = qp
        data.qvel[:] = 0
        mujoco.mj_forward(model, data)
        actions = rng.uniform(-1, 1, (horizon, model.nu))
        obs0 = obs_fn(model, data)
        qpb, qvb, obs, clean = rollout(model, data, 5, actions, obs_fn)
        eps.append(dict(qp=qp, target=target, actions=actions, obs0=obs0,
                        obs=obs, qpos_before=qpb, qvel_before=qvb,
                        clean=clean))
    return eps


def golden_swimmer(rng, n_eps=3, horizon=20):
    model = mujoco.MjModel.from_xml_path(os.path.join(REF, "swimmer.xml"))

    def obs_fn(m, d):
        return np.concatenate([d.qpos.flat[2:], d.qvel.flat])

    eps = []
    for _ in range(n_eps):
        data = mujoco.MjData(model)
        qp = np.zeros(model.nq)
        qp[2] = rng.uniform(-np.pi, np.pi)
        data.qpos[:] = qp
        data.qvel[:] = 0
        mujoco.mj_forward(model, data)
        actions = rng.uniform(-0.5, 0.5, (horizon, model.nu))
        obs0 = obs_fn(model, data)
        rewards, obs_seq, qpb, qvb, clean = [], [], [], [], []
        for a in actions:
            qpb.append(data.qpos.copy())
            qvb.append(data.qvel.copy())
            xb = data.qpos[0]
            data.ctrl[:] = np.clip(a, -1, 1)
            step_clean = True
            for _ in range(5):
                mujoco.mj_step(model, data)
                if data.nefc > 0 or data.ncon > 0:
                    step_clean = False
            rewards.append(-10.0 * (data.qpos[0] - xb))
            obs_seq.append(obs_fn(model, data))
            clean.append(step_clean)
        eps.append(dict(qp=qp, actions=actions, obs0=obs0,
                        obs=np.array(obs_seq), rewards=np.array(rewards),
                        qpos_before=np.array(qpb), qvel_before=np.array(qvb),
                        clean=np.array(clean)))
    return eps


def golden_reacher(rng, n_eps=4, horizon=15):
    model = mujoco.MjModel.from_xml_path(os.path.join(REF, "sawyer.xml"))
    hand_sid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, "finger")
    target_sid = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_SITE, "target")
    dt = model.opt.timestep * 4

    def obs_fn(m, d):
        return np.concatenate([d.qpos.flat, d.qvel.ravel() * dt,
                               d.site_xpos[hand_sid],
                               d.site_xpos[target_sid]])

    eps = []
    for _ in range(n_eps):
        data = mujoco.MjData(model)
        target = np.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.2, 0.2),
                           rng.uniform(-0.25, 0.25)])
        model.site_pos[target_sid] = target
        data.qpos[:] = 0
        data.qvel[:] = 0
        mujoco.mj_forward(model, data)
        actions = rng.uniform(-1, 1, (horizon, model.nu))
        obs0 = obs_fn(model, data)
        qpb, qvb, obs, clean = rollout(model, data, 4, actions, obs_fn)
        eps.append(dict(target=target, actions=actions, obs0=obs0, obs=obs,
                        qpos_before=qpb, qvel_before=qvb, clean=clean))
    return eps


def save(name, eps):
    rec = {"n_eps": len(eps)}
    for i, ep in enumerate(eps):
        for k, v in ep.items():
            rec[f"ep{i}_{k}"] = v
    path = os.path.join(OUT, f"env_{name}.npz")
    np.savez_compressed(path, **rec)
    print("wrote", path)


if __name__ == "__main__":
    rng = np.random.RandomState(42)
    save("point_mass", golden_point_mass(rng))
    save("swimmer", golden_swimmer(rng))
    save("reacher", golden_reacher(rng))
