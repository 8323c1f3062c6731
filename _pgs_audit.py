"""PGS vs penalty solver audit on the real chip: rollout throughput and
compile time for reacher (limits, 10 rows) and peg insertion (contacts,
~1.4k rows)."""
import time, json
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

from mjrl_tpu.envs import Reacher7DOFEnv as ReacherEnv, PegEnv
from mjrl_tpu.models import GaussianMLP
from mjrl_tpu.samplers import rollout_batch

BATCH = 1024
STEPS = 50

for Env in (ReacherEnv, PegEnv):
    for solver in ("penalty", "pgs"):
        env = Env(solver=solver)
        pol = GaussianMLP(env.observation_dim, env.action_dim,
                          hidden_sizes=(64, 64))
        params, transforms = pol.init(jax.random.PRNGKey(0))
        roll = jax.jit(lambda p, tr, k: rollout_batch(
            env, pol, p, tr, k, num_traj=BATCH, horizon=STEPS))
        t0 = time.perf_counter()
        out = roll(params, transforms, jax.random.PRNGKey(1))
        out["rewards"].block_until_ready()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for r in range(2):
            t0 = time.perf_counter()
            for i in range(3):
                out = roll(params, transforms, jax.random.PRNGKey(2 + 3*r + i))
            out["rewards"].block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 3)
        sps = BATCH * STEPS / best
        print(json.dumps({"env": Env.__name__, "solver": solver,
                          "compile_s": round(compile_s, 1),
                          "steps_per_sec": round(sps)}), flush=True)
