"""HalfCheetah NPG + reacher NPG validation trials."""
import time, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP

for env_id, iters, n, horizon, step in [("mjrl_reacher_7dof-v0", 30, 50, 50, 0.1),
                                        ("HalfCheetah-v3", 40, 80, 500, 0.1)]:
    e = GymEnv(env_id)
    pol = MLP(e.spec, hidden_sizes=(64, 64), seed=7, init_log_std=-0.25)
    bl = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2, learn_rate=1e-3)
    agent = NPG(e, pol, bl, normalized_step_size=step, seed=7, save_logs=True)
    t0 = time.time(); rets = []
    for i in range(iters):
        stats = agent.train_step(N=n, horizon=horizon, gamma=0.995, gae_lambda=0.97)
        rets.append(stats[0])
    print(f"{env_id}: start {np.mean(rets[:3]):.1f} -> end {np.mean(rets[-3:]):.1f} "
          f"({time.time()-t0:.0f}s)", flush=True)
