import time, jax, jax.numpy as jnp
from mjrl_tpu.envs import SwimmerEnv
from mjrl_tpu.models import GaussianMLP
from mjrl_tpu.samplers import rollout_batch

env = SwimmerEnv()
pol = GaussianMLP(12, 4, hidden_sizes=(64, 64))
params, transforms = pol.init(jax.random.PRNGKey(0))

import sys
B, T = int(sys.argv[1]), int(sys.argv[2])
roll = jax.jit(lambda p, tr, k: rollout_batch(env, pol, p, tr, k, num_traj=B, horizon=T))
out = roll(params, transforms, jax.random.PRNGKey(1))
out["rewards"].block_until_ready()
t0 = time.perf_counter()
for i in range(2):
    out = roll(params, transforms, jax.random.PRNGKey(2+i))
out["rewards"].block_until_ready()
dt = (time.perf_counter()-t0)/2
print(f"B={B} T={T}: {B*T/dt/1e3:.0f}k steps/s")
