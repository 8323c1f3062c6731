"""Reacher NPG training with the new PGS default solver — validates the
default flip still learns (previous penalty result: -273 -> -142 in 30
iters / 39 s)."""
import time, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP

e = GymEnv("mjrl_reacher_7dof-v0")
policy = MLP(e.spec, hidden_sizes=(64, 64), seed=123)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2,
                       learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.05, seed=123,
            save_logs=True)

t0 = time.time()
for i in range(30):
    stats = agent.train_step(N=40, sample_mode="trajectories",
                             gamma=0.95, gae_lambda=0.97)
    if i % 5 == 0 or i == 29:
        print(f"iter {i}: ret {stats[0]:8.1f} max {stats[3]:8.1f} "
              f"t {time.time()-t0:5.1f}s", flush=True)
print("total", round(time.time()-t0, 1), "s")
