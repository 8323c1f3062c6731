"""Instrumented single-episode relocate expert run — per-step phase,
palm/obj/target geometry, grip state.  Diagnosis tool for the scripted
demo expert (tools/make_relocate_demos.py)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(__file__), "..",
                                       ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--horizon", type=int, default=200)
    ap.add_argument("--every", type=int, default=5)
    args = ap.parse_args()

    from mjrl_tpu.envs.adroit import AdroitRelocateEnv
    from tools.make_relocate_demos import ScriptedRelocateExpert, _jitted_step

    env = AdroitRelocateEnv()
    expert = ScriptedRelocateExpert(env, seed=args.seed)
    key = jax.random.PRNGKey(args.seed * 1000)
    state = env.reset(key)
    expert.reset()
    step = _jitted_step(env)
    print("obj0", np.asarray(state.scenery["obj_pos"]),
          "target", np.asarray(state.scenery["target_pos"]))
    for t in range(args.horizon):
        obs = np.asarray(state.obs)
        qpos = np.asarray(state.physics.qpos)
        a = expert.action(obs, qpos, t)
        state = step(state, a)
        if t % args.every == 0 or t == args.horizon - 1:
            palm_obj = obs[30:33]
            palm_tgt = obs[33:36]
            obj_tgt = obs[36:39]
            obj_z = qpos[-4] if False else None
            print(f"t={t:3d} xy_err={np.hypot(palm_obj[0], palm_obj[1]):.3f} "
                  f"palm_obj={np.round(palm_obj, 3)} "
                  f"|obj-tgt|={np.linalg.norm(obj_tgt):.3f} "
                  f"closing={expert._closing.get(0, 0)} "
                  f"arm={np.round(qpos[:6], 3)} "
                  f"rew={float(state.reward):.2f} "
                  f"goal={bool(state.info['goal_achieved'])}")
    # final object height/location via kinematics
    from mjrl_tpu.physics.kinematics import fwd_kinematics
    model = env._patched_model(state.scenery)
    data = fwd_kinematics(model, state.physics.qpos)
    obj, palm, target = env._task_vectors(data)
    print("final obj", np.round(np.asarray(obj), 3),
          "palm", np.round(np.asarray(palm), 3),
          "target", np.round(np.asarray(target), 3))


if __name__ == "__main__":
    main()
