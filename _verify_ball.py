"""Verification drive: ball joints + euler fix + samples accounting,
through the public package surface."""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

# ---- 1. user flow: load a ball-pendulum MJCF, simulate, watch physics ----
from mjrl_tpu.physics.mjcf import load_mjcf
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.step import step_n

PEND = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="ball" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03"/>
    </body>
  </worldbody>
</mujoco>
"""
model = load_mjcf(xml_string=PEND).finalize(jnp.float32)
s = State(qpos=model.qpos0, qvel=jnp.zeros(model.nv))  # rod horizontal
roll = jax.jit(lambda st, n: step_n(model, st, jnp.zeros(0), n),
               static_argnums=1)

from mjrl_tpu.physics.kinematics import fwd_kinematics
def tip_z(st):
    d = fwd_kinematics(model, st.qpos)
    return float(d.xpos[1][2] + np.asarray(d.xmat[1])[:, 0][2] * 0.4)

print("t=0   tip z:", round(tip_z(s), 4), "quat:", np.asarray(s.qpos).round(3))
traj = []
for k in range(8):
    s = roll(s, 250)  # 0.5 s chunks
    traj.append((round(tip_z(s), 4), round(float(jnp.linalg.norm(s.qpos)), 6),
                 round(float(jnp.linalg.norm(s.qvel)), 4)))
for i, (z, qn, vn) in enumerate(traj):
    print(f"t={0.5*(i+1):.1f}s tip z={z:+.4f} |quat|={qn} |qvel|={vn}")
assert traj[0][0] < 0.95, "pendulum should have swung down"
assert all(abs(qn - 1.0) < 1e-4 for _, qn, _ in traj), "quat norm drift"
assert traj[-1][2] < traj[0][2], "damping should bleed energy"
print("PENDULUM OK: swings about ball joint, damped, quaternion normalized")

# ---- 2. probe: limited ball joint -> clean error ----
LIM = PEND.replace('type="ball"', 'type="ball" limited="true" range="0 30"')
try:
    load_mjcf(xml_string=LIM).finalize()
    print("PROBE FAIL: limited ball accepted silently")
except NotImplementedError as e:
    print("PROBE OK (limited ball):", e)

# ---- 3. euler attribute now intrinsic (multi-axis) ----
import mujoco
E = """
<mujoco><worldbody><body pos="0 0 1" euler="25 40 65"><joint type="free"/>
<geom type="box" size="0.1 0.2 0.3"/></body></worldbody></mujoco>
"""
mdl = load_mjcf(xml_string=E).finalize(jnp.float64)
mm = mujoco.MjModel.from_xml_string(E)
err = np.abs(np.asarray(mdl.qpos0[3:7]) - mm.qpos0[3:7]).max()
print(f"EULER OK: multi-axis euler body quat matches MuJoCo (err {err:.2e})")
assert err < 1e-6  # f32 model dtype in this drive; f64 goldens show 1e-12

# ---- 4. samples-mode valid-step accounting (early-terminating env) ----
from mjrl_tpu import envs
from mjrl_tpu.models import GaussianMLP, Policy
from mjrl_tpu.samplers import sample_data_batch
env = envs.make("Hopper-v3")
pol = Policy(GaussianMLP(11, 3, hidden_sizes=(16,), init_log_std=1.0), seed=0)
paths = sample_data_batch(120, env, pol, horizon=40, base_seed=3)
lens = [p["rewards"].shape[0] for p in paths]
print(f"SAMPLES: requested 120 valid steps -> got {sum(lens)} across "
      f"{len(paths)} paths, lengths {lens}")
assert sum(lens) >= 120 and any(l < 40 for l in lens)
print("ALL VERIFICATION DRIVES PASSED")
