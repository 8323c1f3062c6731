"""Model-accelerated NPG on the 7-DoF reacher — the reference's headline
MBRL config (configs/reacher.txt) scaled to 10 outer iterations."""
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from mjrl_tpu.algos.model_accel.run_experiments.run_model_accel_npg import run

job = dict(env_name="mjrl_reacher_7dof-v0", seed=123, num_iter=10,
           iter_samples=500, eval_rollouts=5, num_models=4, save_freq=5,
           hidden_size=(256, 256), activation="relu", fit_lr=1e-3,
           fit_wd=0.0, buffer_size=20000, fit_mb_size=64, fit_epochs=20,
           refresh_fit=False, init_log_std=-0.5, min_log_std=-2.5,
           init_samples=2500, init_policy=None, policy_size=(64, 64),
           inner_steps=5, step_size=0.05, update_paths=250,
           start_state="init", horizon=50)
agent, logger = run("/tmp/mbrl_reacher", job)
log = logger.log
print("rollout_score trajectory:", [round(x,1) for x in log["rollout_score"]])
print("eval_score trajectory:", [round(x,1) for x in log.get("eval_score", [])])
