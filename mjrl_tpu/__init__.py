"""mjrl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) reinforcement-learning framework.

Capability-parity rebuild of mjrl (aravindr93/mjrl) designed TPU-first:

- physics: from-scratch rigid-body engine in generalized coordinates
  (MJCF parse -> CRBA/RNEA), pure ``step(model, state, ctrl)`` functions
  that are ``vmap``/``scan``/``jit`` safe.  Replaces the reference's
  external MuJoCo C engine (reference: mjrl/envs/mujoco_env.py:11-15).
- sampling: ``vmap(lax.scan(...))`` batched rollouts on-device.  Replaces
  the reference's multiprocessing.Pool sampler (mjrl/samplers/core.py:99-210).
- algorithms: REINFORCE / NPG / TRPO / PPO / BC / DAPG / model-based
  (world-model ensembles, MPPI planning, model-accelerated NPG), all with
  jit-compiled update steps (HVP via jvp-of-vjp, CG as fori_loop).
- parallel: multi-chip scaling via jax.sharding.Mesh + shard_map; gradient
  and CG reductions ride ICI as psums.
"""

__version__ = "0.1.0"
