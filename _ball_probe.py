"""Probe MuJoCo's ball-joint conventions: cdof frame, cdofdot velocity,
FK composition, xaxis. Compares hypotheses numerically."""
import numpy as np
import mujoco

XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="b1" pos="0.1 0.2 0.5" quat="0.9 0.1 0.3 0.2">
      <joint name="ball1" type="ball" pos="0.05 -0.02 0.08" damping="0.1" armature="0.01"/>
      <geom type="capsule" fromto="0 0 0 0.3 0.1 -0.2" size="0.04"/>
      <body name="b2" pos="0.3 0.1 -0.2" euler="10 20 30">
        <joint name="h1" type="hinge" axis="0 1 0" pos="0.01 0.02 0.03" damping="0.05"/>
        <geom type="sphere" size="0.05" pos="0.1 0 0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

m = mujoco.MjModel.from_xml_string(XML)
d = mujoco.MjData(m)
rng = np.random.RandomState(0)
q = rng.uniform(-1, 1, 4)
d.qpos[:4] = q / np.linalg.norm(q)
d.qpos[4] = 0.7
d.qvel[:] = rng.uniform(-1, 1, m.nv)
mujoco.mj_forward(m, d)

print("nq", m.nq, "nv", m.nv, "jnt_qposadr", m.jnt_qposadr, "jnt_dofadr", m.jnt_dofadr)
print("xanchor[0]", d.xanchor[0], "xaxis[0]", d.xaxis[0])
print("xmat b1:\n", d.xmat[1].reshape(3, 3))

# hypothesis FK for body 1: world pose = (body_pos, body_quat) then rotate
# about anchor by local quat
def quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1-2*(y*y+z*z), 2*(x*y-w*z), 2*(x*z+w*y)],
        [2*(x*y+w*z), 1-2*(x*x+z*z), 2*(y*z-w*x)],
        [2*(x*z-w*y), 2*(y*z+w*x), 1-2*(x*x+y*y)]])

bq = m.body_quat[1] / np.linalg.norm(m.body_quat[1])
mat0 = quat_to_mat(bq)
pos0 = m.body_pos[1].copy()
anchor = pos0 + mat0 @ m.jnt_pos[0]
mat1 = mat0 @ quat_to_mat(d.qpos[:4])
pos1 = anchor - mat1 @ m.jnt_pos[0]
print("FK pos err:", np.abs(pos1 - d.xpos[1]).max(),
      "mat err:", np.abs(mat1 - d.xmat[1].reshape(3,3)).max(),
      "anchor err:", np.abs(anchor - d.xanchor[0]).max())
# xaxis hypothesis: mat1 @ jnt_axis (axis default 0 0 1)
print("xaxis err (post-rot):", np.abs(mat1 @ m.jnt_axis[0] - d.xaxis[0]).max(),
      "xaxis err (pre-rot):", np.abs(mat0 @ m.jnt_axis[0] - d.xaxis[0]).max())

# cdof: world-origin motion vectors. MuJoCo cdof is about the subtree CoM
# frame (data.subtree_com of body 0's root? it's d.subtree_com[m.body_rootid]).
# Convert: MuJoCo cdof at point c => world-origin: lin' = lin + w x (-c)?
# mjrl_tpu uses world origin; MuJoCo uses root subtree CoM. Compare angular
# part + translate linear part.
root_com = d.subtree_com[m.body_rootid[1]]
cdof = d.cdof.copy()  # (nv, 6): (ang, lin) at root_com
for i in range(m.nv):
    w_, v_ = cdof[i, :3], cdof[i, 3:]
    # velocity of world-origin point: v_origin = v_c + w x (0 - c)... point
    # velocity field: v(p) = v_c + w x (p - c)
    v0 = v_ + np.cross(w_, 0 - root_com)
    cdof[i, 3:] = v0
print("cdof (world origin):\n", cdof.round(6))
# hypotheses for ball cdof angular axes: columns of xmat[1] (post) anchored
# at xanchor
for i in range(3):
    a = d.xmat[1].reshape(3,3)[:, i]
    expect = np.concatenate([a, np.cross(anchor, a)])
    print(f"ball cdof[{i}] err (xmat post cols, anchored):",
          np.abs(expect - cdof[i]).max())

# cdofdot: convention check. d.cdof_dot at root_com; convert to world origin:
# cdofdot is d/dt cdof. For a motion vector field translated to origin:
# cdofdot_origin = cdofdot_c with lin' = lin + wdot x (0-c) - w x cdot?
# Simpler: verify via finite differences of our OWN cdof implementation later.
print("cdof_dot raw:\n", d.cdof_dot.round(6))
cvel1 = d.cvel[1].copy()  # at root_com
print("cvel[1] raw:", cvel1.round(6))
# hypothesis A (sequential/pre): cdofdot[i] = cross_motion(cvel_before_ball, cdof[i]) = 0 (parent=world)
# hypothesis B (full body vel): cdofdot[i] = cross_motion(cvel_after_ball, cdof[i])
def motion_cross(v, mvec):
    w, l = v[:3], v[3:]
    mw, ml = mvec[:3], mvec[3:]
    return np.concatenate([np.cross(w, mw), np.cross(w, ml) + np.cross(l, mw)])
# cvel[1] includes all 4 dofs? cvel[1] is body1+... no, cvel[1] is body 1's velocity (ball only)
for i in range(3):
    hb = motion_cross(d.cvel[1], d.cdof[i])
    print(f"cdofdot[{i}]: raw={d.cdof_dot[i].round(6)} hypB={hb.round(6)} "
          f"errB={np.abs(hb - d.cdof_dot[i]).max():.2e} "
          f"errA={np.abs(d.cdof_dot[i]).max():.2e}")
