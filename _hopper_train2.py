"""Longer Hopper NPG run with compilation cache."""
import os, time, numpy as np
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception as e:
    print("cache cfg:", e)
from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP

e = GymEnv("Hopper-v3")
policy = MLP(e.spec, hidden_sizes=(64, 64), seed=123, init_log_std=-0.25)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2, learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.05, seed=123, save_logs=True)

t0 = time.time()
best = -1e9
for i in range(200):
    stats = agent.train_step(N=100, sample_mode="trajectories", horizon=1000,
                             gamma=0.995, gae_lambda=0.97)
    best = max(best, stats[0])
    if i % 10 == 0 or stats[0] > 2500:
        print(f"iter {i}: ret {stats[0]:8.1f} max {stats[3]:8.1f} best {best:8.1f} "
              f"elapsed {time.time()-t0:6.1f}s", flush=True)
    if stats[0] >= 3000:
        print(f"REACHED 3000 at iter {i}, elapsed {time.time()-t0:.1f}s", flush=True)
        break
print("done best", best, "total", time.time()-t0, flush=True)
