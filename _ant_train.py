"""Ant NPG learning trial on TPU (free-joint locomotion)."""
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP

e = GymEnv("Ant-v3")
policy = MLP(e.spec, hidden_sizes=(64, 64), seed=1, init_log_std=-0.3)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2, learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.05, seed=1, save_logs=True)
t0 = time.time()
for i in range(60):
    stats = agent.train_step(N=120, sample_mode="trajectories", horizon=500,
                             gamma=0.99, gae_lambda=0.97)
    if i % 5 == 0 or i == 59:
        print(f"iter {i}: ret {stats[0]:8.1f} max {stats[3]:8.1f} "
              f"elapsed {time.time()-t0:6.1f}s", flush=True)
print("done", time.time()-t0, flush=True)
