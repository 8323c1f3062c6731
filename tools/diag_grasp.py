"""Discriminating diagnostic for the Adroit grasp-solve gap (ROADMAP 11).

On the 40-state contact_adroit golden set, measure qacc error vs live
MuJoCo under a grid of (APGD sweeps, contact_topk) to separate the three
ranked suspects:

  (a) contact-POINT placement (manifolds)  -> error flat as budget grows
  (b) APGD convergence at 50 sweeps        -> error falls with sweeps
  (c) topk=64 active-set cap               -> error falls when uncapped

Also dumps, for the worst states, our active contact set next to
MuJoCo's mjData.contact (pair identity, count, depth, position) to see
where the rows themselves differ.

    python tools/diag_grasp.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks", "parity"))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # env var is ignored on this box
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def qacc_err(model, g, sweeps, n=40):
    from mjrl_tpu.physics.model import State
    from mjrl_tpu.physics.step import _qacc
    acc = jax.jit(lambda q, v, u: _qacc(
        model, State(qpos=q, qvel=v), u, sweeps=sweeps)[0])
    errs = []
    for i in range(min(len(g["qpos"]), n)):
        ours = np.asarray(acc(jnp.asarray(g["qpos"][i]),
                              jnp.asarray(g["qvel"][i]),
                              jnp.asarray(g["ctrl"][i])))
        scale = max(np.abs(g["qacc"][i]).max(), 1.0)
        errs.append(np.abs(ours - g["qacc"][i]).max() / scale)
    return np.array(errs)


def contact_compare(model, g, i, mj_model, mj_data, names=None):
    """Print our active contacts vs MuJoCo's for golden state i."""
    import mujoco
    from mjrl_tpu.physics.collision import find_contacts, contact_geom_ids
    from mjrl_tpu.physics.kinematics import fwd_kinematics
    from mjrl_tpu.physics.model import State

    mj_data.qpos[:] = g["qpos"][i]
    mj_data.qvel[:] = g["qvel"][i]
    mj_data.ctrl[:] = g["ctrl"][i]
    mujoco.mj_forward(mj_model, mj_data)

    data = fwd_kinematics(model, jnp.asarray(g["qpos"][i]))
    depths, point, normal, g1, g2 = find_contacts(model, data)
    depths = np.asarray(depths)
    pts = np.stack([np.asarray(p) for p in point], -1)
    g1 = np.asarray(g1)
    g2 = np.asarray(g2)

    def gname(mj_gid):
        return mujoco.mj_id2name(mj_model, mujoco.mjtObj.mjOBJ_GEOM,
                                 mj_gid) or f"g{mj_gid}"

    print(f"--- state {i}: MuJoCo ncon={mj_data.ncon}, "
          f"ours active={int((depths > 0).sum())}")
    mj_set = {}
    for c in range(mj_data.ncon):
        con = mj_data.contact[c]
        key = (gname(con.geom1), gname(con.geom2))
        mj_set.setdefault(key, []).append(
            (round(-con.dist, 5), np.round(con.pos, 4).tolist()))
    for k, v in sorted(mj_set.items()):
        print(f"  MJ  {k[0]:<22} {k[1]:<22} x{len(v)} {v}")
    our_set = {}
    for c in np.nonzero(depths > 0)[0]:
        key = (int(g1[c]), int(g2[c]))
        our_set.setdefault(key, []).append(
            (round(float(depths[c]), 5), np.round(pts[c], 4).tolist()))
    for k, v in sorted(our_set.items()):
        n1 = names.get(k[0], f"g{k[0]}") if names else str(k[0])
        n2 = names.get(k[1], f"g{k[1]}") if names else str(k[1])
        print(f"  OUR {n1:<22} {n2:<22} x{len(v)} {v}")


def main():
    import mujoco
    from mjrl_tpu.envs.adroit import adroit_asset
    from real_adroit import patched_relocate_xml

    golden = os.path.join(os.path.dirname(__file__), "..", "tests",
                          "golden", "contact_adroit.npz")
    g = np.load(golden)
    print(f"golden states: {len(g['qpos'])}")

    mj_model = mujoco.MjModel.from_xml_path(patched_relocate_xml())
    mj_data = mujoco.MjData(mj_model)

    from mjrl_tpu.physics.mjcf import load_mjcf
    if "--grid" in sys.argv:
        grid = [(50, 64), (200, 64), (800, 64), (800, 0), (3200, 0)]
        for sweeps, topk in grid:
            builder = load_mjcf(adroit_asset())
            model = builder.finalize(jnp.float64, solver="newton",
                                     contact_topk=topk)
            errs = qacc_err(model, g, sweeps)
            print(f"sweeps={sweeps:5d} topk={topk:3d}: "
                  f"median={np.median(errs):.4f} "
                  f"p90={np.percentile(errs, 90):.4f}"
                  f" max={errs.max():.4f}")
            order = np.argsort(errs)
            print("  per-state:", np.round(errs[order], 3).tolist())
            print("  worst ids:", order[-6:].tolist())

    # contact-set comparison on named states (default: 3200-sweep worst)
    builder = load_mjcf(adroit_asset())
    model = builder.finalize(jnp.float64, solver="newton", contact_topk=0)
    inv = {v: k for k, v in builder.names["geom"].items()}
    states = [int(a) for a in sys.argv[1:] if a.isdigit()]
    for i in states:
        mj_data2 = mujoco.MjData(mj_model)
        contact_compare(model, g, int(i), mj_model, mj_data2, names=inv)


if __name__ == "__main__":
    main()
