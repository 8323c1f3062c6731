import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
import mujoco

g = np.load("tests/golden/ball.npz", allow_pickle=True)
from mjrl_tpu.physics.mjcf import load_mjcf
from mjrl_tpu.physics.kinematics import fwd_kinematics

xml = str(g["xml"])
model = load_mjcf(xml_string=xml).finalize(jnp.float64)
m = mujoco.MjModel.from_xml_string(xml)
d = mujoco.MjData(m)

i = 0
d.qpos[:] = g["qpos"][i]; d.qvel[:] = g["qvel"][i]
mujoco.mj_forward(m, d)
data = fwd_kinematics(model, jnp.asarray(g["qpos"][i]))
for b in range(model.nbody):
    print(f"body {b}: xpos err {np.abs(np.asarray(data.xpos[b]) - d.xpos[b]).max():.2e}  "
          f"xmat err {np.abs(np.asarray(data.xmat[b]) - d.xmat[b].reshape(3,3)).max():.2e}")
for j in range(model.njnt):
    print(f"jnt {j}: anchor err {np.abs(np.asarray(data.xanchor[j]) - d.xanchor[j]).max():.2e}  "
          f"axis err {np.abs(np.asarray(data.xaxis[j]) - d.xaxis[j]).max():.2e}")
print("jnt order mine:", model.jnt_type, "adr", model.jnt_qposadr)
print("jnt order muj :", m.jnt_type, m.jnt_qposadr)
print("qpos:", g["qpos"][i])
