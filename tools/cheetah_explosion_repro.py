"""Reproduce the HalfCheetah TRPO velocity explosion (ROADMAP 12).

Rolls the exploit policy in our sim, captures escalation states (qvel
crossing 20/50/150/1000) from an exploding episode into
tests/golden/cheetah_explosion_states.npz for the round-6 bisection.
The blowup is noise-stream dependent: expect several clean episodes
per hit.

    python tools/cheetah_explosion_repro.py
"""

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, pickle
from mjrl_tpu.envs.gym_suite import HalfCheetahEnv

env = HalfCheetahEnv()
with open("benchmarks/crosseval/policies/r5_cheetah_trpo_best.pkl", "rb") as f:
    pol = pickle.load(f)
step = jax.jit(env.step)
for ep in range(12):
    key = jax.random.PRNGKey(100 + ep)
    s = env.reset(key)
    snaps = {}
    ths = [20.0, 50.0, 150.0, 1000.0]
    exploded = False
    for t in range(1000):
        a, info = pol.get_action(np.asarray(s.obs, np.float64))
        qp, qv = np.asarray(s.physics.qpos), np.asarray(s.physics.qvel)
        vmax = float(np.max(np.abs(qv)))
        for th in list(ths):
            if vmax > th:
                snaps[th] = dict(t=t, qpos=qp, qvel=qv,
                                 action=np.asarray(a))
                ths.remove(th)
        if vmax > 1e4:
            exploded = True
            break
        s = step(s, jnp.asarray(a))
    print(f"ep {ep}: exploded={exploded} snaps={sorted(snaps)} "
          f"final vmax={vmax:.1f}")
    if exploded:
        out = {}
        for th, d in snaps.items():
            for k, v in d.items():
                out[f"{k}_{int(th)}"] = v
        np.savez("tests/golden/cheetah_explosion_states.npz", **out)
        print("saved escalation states from exploding episode",
              {th: d["t"] for th, d in snaps.items()})
        break
