import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np
import jax.numpy as jnp

g = np.load("tests/golden/ball.npz", allow_pickle=True)
from mjrl_tpu.physics.mjcf import load_mjcf
from mjrl_tpu.physics.model import State
from mjrl_tpu.physics.step import step_n
from mjrl_tpu.physics import dynamics as dyn
from mjrl_tpu.physics.kinematics import fwd_kinematics
from mjrl_tpu.physics.step import qacc_smooth

model = load_mjcf(xml_string=str(g["xml"])).finalize(jnp.float64)
print("nq", model.nq, "nv", model.nv, "(golden:", g["nq"], g["nv"], ")")
np.testing.assert_allclose(np.asarray(model.body_mass), g["body_mass"], rtol=1e-6)

errs = {k: 0.0 for k in ["xpos", "ximat", "xanchor", "qM", "bias", "qacc",
                         "next_qpos", "next_qvel"]}
for i in range(len(g["qpos"])):
    qpos = jnp.asarray(g["qpos"][i]); qvel = jnp.asarray(g["qvel"][i])
    data = fwd_kinematics(model, qpos)
    errs["xpos"] = max(errs["xpos"], np.abs(np.asarray(data.xpos) - g["xpos"][i]).max())
    errs["ximat"] = max(errs["ximat"], np.abs(np.asarray(data.ximat) - g["ximat"][i]).max())
    errs["xanchor"] = max(errs["xanchor"], np.abs(np.asarray(data.xanchor) - g["xanchor"][i]).max())
    cdof = dyn.compute_cdof(model, data)
    cvel, cdofdot = dyn.compute_velocities(model, data, cdof, qvel)
    M, bias = dyn.mass_and_bias(model, data, cdof, cvel, cdofdot, qvel)
    errs["qM"] = max(errs["qM"], np.abs(np.asarray(M) - g["qM"][i]).max())
    errs["bias"] = max(errs["bias"], np.abs(np.asarray(bias) - g["qfrc_bias"][i]).max())
    s = State(qpos=qpos, qvel=qvel)
    qacc = qacc_smooth(model, s, jnp.zeros(0))
    errs["qacc"] = max(errs["qacc"], np.abs(np.asarray(qacc) - g["qacc"][i]).max())
    out = step_n(model, s, jnp.zeros(0), 5)
    errs["next_qpos"] = max(errs["next_qpos"], np.abs(np.asarray(out.qpos) - g["next_qpos"][i]).max())
    errs["next_qvel"] = max(errs["next_qvel"], np.abs(np.asarray(out.qvel) - g["next_qvel"][i]).max())
for k, v in errs.items():
    print(f"{k}: {v:.3e}")

# trajectories
for integ in ("euler", "rk4"):
    xml = str(g["xml"])
    if integ == "rk4":
        xml = xml.replace('integrator="Euler"', 'integrator="RK4"')
    mdl = load_mjcf(xml_string=xml).finalize(jnp.float64)
    s = State(qpos=jnp.asarray(g[f"traj_{integ}_qpos0"]),
              qvel=jnp.asarray(g[f"traj_{integ}_qvel0"]))
    out = step_n(mdl, s, jnp.zeros(0), int(g[f"traj_{integ}_steps"]))
    print(integ, "traj qpos err:", np.abs(np.asarray(out.qpos) - g[f"traj_{integ}_qpos_end"]).max(),
          "qvel err:", np.abs(np.asarray(out.qvel) - g[f"traj_{integ}_qvel_end"]).max())
