"""Quick Hopper NPG training trial on the TPU."""
import time, numpy as np, jax
from mjrl_tpu.algos import NPG
from mjrl_tpu.baselines import MLPBaseline
from mjrl_tpu.envs import GymEnv
from mjrl_tpu.models.policies import MLP

e = GymEnv("Hopper-v3")
policy = MLP(e.spec, hidden_sizes=(64, 64), seed=123, init_log_std=-0.25)
baseline = MLPBaseline(e.spec, reg_coef=1e-3, batch_size=64, epochs=2, learn_rate=1e-3)
agent = NPG(e, policy, baseline, normalized_step_size=0.05, seed=123, save_logs=True)

t0 = time.time()
for i in range(10):
    ts = time.time()
    stats = agent.train_step(N=100, sample_mode="trajectories", horizon=1000,
                             gamma=0.995, gae_lambda=0.97)
    log = agent.logger.get_current_log()
    print(f"iter {i}: ret {stats[0]:8.1f}  max {stats[3]:8.1f}  kl {log['kl_dist']:.4f} "
          f"samp {log['num_samples']:7.0f}  t {time.time()-ts:5.1f}s")
print("total", time.time()-t0, "s")
