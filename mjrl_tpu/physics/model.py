"""Static model description + dynamic state for the rigid-body engine.

``Model`` replaces MuJoCo's compiled mjModel (the reference's native C
dependency — mjrl/envs/mujoco_env.py:11-15): a pytree whose numeric fields
are jnp arrays (so they can be vmapped for domain randomization and swapped
under jit, e.g. moving goal sites) and whose *topology* (parents, joint
types, geom types) is static aux data baked into the trace.

``ModelBuilder`` is the host-side compiler: it turns body/joint/geom/site/
actuator declarations (from the MJCF parser or programmatic env definitions)
into a Model, computing per-body mass, CoM and principal inertia from geoms
exactly like MuJoCo's ``inertiafromgeom`` compiler path so models validate
against golden MuJoCo data.

Supported joint types: slide, hinge (1 dof / 1 qpos each), ball
(3 dofs / 4 qpos: local wxyz quaternion, angular velocity in the
post-joint body frame — MuJoCo conventions, validated against mjData
probes) and free (6 dofs / 7 qpos: world position + wxyz quaternion; must
sit on a direct child of the world, like MuJoCo floating bases).  Ball
joint limits constrain the total rotation angle to jnt_range[1]
(dynamics.ball_limit_terms).  Quaternion springs (stiffness on
ball/free joints) and the affine actuator family — motors,
position/velocity servos, general gain/bias, vector gears on ball/free
transmissions — are supported and golden-validated against MuJoCo 3.10
(tests/test_actuators.py).
"""

from dataclasses import dataclass, field
from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp
from flax import struct

# joint types (MuJoCo enum values)
FREE = 0
BALL = 1
SLIDE = 2
HINGE = 3

# dof/qpos widths per joint type
JNT_NQ = {FREE: 7, BALL: 4, SLIDE: 1, HINGE: 1}
JNT_NV = {FREE: 6, BALL: 3, SLIDE: 1, HINGE: 1}

# geom types (MuJoCo enum values for golden-data compatibility)
PLANE = 0
SPHERE = 2
CAPSULE = 3
CYLINDER = 5
BOX = 6

EULER = 0
RK4 = 1

# constraint solver modes
PENALTY = 0   # explicit penalties (default; fast, approximate)
PGS = 1       # implicit dual with projected Jacobi (physics/solver.py)

# friction-cone types (MuJoCo mjtCone)
PYRAMIDAL = 0  # 4 facet rows per condim-3 contact (MuJoCo default)
ELLIPTIC = 1   # 3 rows [n, t1, t2] + second-order-cone dual projection

# equality constraint kinds (MuJoCo mjtEq values)
EQ_CONNECT = 0   # 3-dof ball joint between body points
EQ_WELD = 1      # 6-dof pose weld between two bodies
EQ_JOINT = 2     # quartic polynomial coupling of two scalar joints


class Model(struct.PyTreeNode):
    # ---- static topology (trace constants) ----
    nbody: int = struct.field(pytree_node=False)
    njnt: int = struct.field(pytree_node=False)
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nu: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)
    nsite: int = struct.field(pytree_node=False)
    body_parent: Tuple[int, ...] = struct.field(pytree_node=False)
    body_jnts: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False)
    jnt_type: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_body: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_qposadr: Tuple[int, ...] = struct.field(pytree_node=False)
    jnt_dofadr: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_body: Tuple[int, ...] = struct.field(pytree_node=False)
    geom_type: Tuple[int, ...] = struct.field(pytree_node=False)
    site_body: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_joint: Tuple[int, ...] = struct.field(pytree_node=False)
    integrator: int = struct.field(pytree_node=False)
    solver: int = struct.field(pytree_node=False, default=0)
    # collision pairs: tuple of (geom1, geom2) indices — the dynamic
    # contype/conaffinity pairs plus any explicit <contact><pair>
    # declarations (minus <exclude>d body pairs), computed at build
    contact_pairs: Tuple[Tuple[int, int], ...] = struct.field(
        pytree_node=False, default=())
    # contact dimensionality per geom (1 = frictionless normal, 3 =
    # normal + tangential friction); pair condim = max (MuJoCo rule).
    # Static: it decides the constraint-row structure at trace time.
    geom_condim: Tuple[int, ...] = struct.field(pytree_node=False,
                                                default=())
    # per-PAIR condim aligned with contact_pairs: max of the geom
    # condims for dynamic pairs, the pair element's own condim for
    # explicit <contact><pair> declarations (MuJoCo pair semantics —
    # Adroit disables finger-finger friction this way).  condim 4/6
    # (torsional/rolling friction) is accepted and treated as 3: the
    # torsional row is not implemented (documented deviation).
    contact_pair_condim: Tuple[int, ...] = struct.field(
        pytree_node=False, default=())
    # implicit-solver active-set cap: when a condim class has more
    # candidate contacts than this, only the contact_topk deepest are
    # given constraint rows (top-k per dynamics eval; 0 = no cap).
    # Narrowphase still evaluates every pair — this bounds the DUAL
    # system size, which dominates contact-rich models (peg: 474
    # candidates, <~20 ever simultaneously active).
    contact_topk: int = struct.field(pytree_node=False, default=0)
    # primal-Newton constraint solver iterations (0 = dual APGD).  The
    # Newton path (solver.solve_qacc_newton) is MuJoCo's own algorithm
    # and converges quadratically on many-row coupled systems (Adroit
    # grasps) where first-order dual sweeps stall; pyramidal cones only.
    newton_iters: int = struct.field(pytree_node=False, default=0)
    # MuJoCo <option noslip_iterations>: > 0 enables the noslip
    # friction post-pass (solver.noslip_qacc) after each implicit solve
    noslip_iters: int = struct.field(pytree_node=False, default=0)
    # RK4 constraint-row freeze granularity: by default rows (contact
    # geometry, impedance, active set) are rebuilt at EVERY RK4 stage,
    # matching MuJoCo's mj_RungeKutta (one full mj_forward per stage).
    # Any coarser freeze was measured to inject energy at impacts:
    # per-control-step freezing bounced the ant to 2x its drop height,
    # and even per-substep freezing made random-action ants exit the
    # healthy range through the TOP (16/16 terminations at z>=1.0,
    # survival median 34 vs real MuJoCo's 51).  row_freeze_step=True
    # freezes the substep-0 rows across stages AND the whole frame_skip
    # control step — an opt-in amortization for quasi-static contact
    # models (peg: zero gravity, guided insertion, 474-pair assembly
    # dominates the dynamics evaluation).
    row_freeze_step: bool = struct.field(pytree_node=False, default=False)
    # friction-cone type for the implicit solver's contact rows
    # (<option cone="pyramidal|elliptic">): PYRAMIDAL emits 4 facet
    # rows per condim-3 contact; ELLIPTIC emits 3 rows [n, t1, t2] and
    # the dual solve projects each contact triple onto the
    # second-order cone mu*lam_n >= |lam_t| (solver.py solve_qacc).
    cone: int = struct.field(pytree_node=False, default=0)

    # ---- numeric fields (jnp leaves) ----
    body_pos: Any = None          # (nbody, 3) frame offset in parent frame
    body_quat: Any = None         # (nbody, 4)
    body_ipos: Any = None         # (nbody, 3) CoM in body frame
    body_iquat: Any = None        # (nbody, 4) principal-inertia frame
    body_mass: Any = None         # (nbody,)
    body_inertia: Any = None      # (nbody, 3) principal moments
    jnt_axis: Any = None          # (njnt, 3) in body frame
    jnt_pos: Any = None           # (njnt, 3) anchor in body frame
    jnt_range: Any = None         # (njnt, 2)
    jnt_limited: Any = None       # (njnt,) float mask
    jnt_stiffness: Any = None     # (njnt,)
    jnt_ref: Any = None           # (njnt,) reference pose (slide/hinge)
    qpos0: Any = None             # (nq,) default configuration
    dof_damping: Any = None       # (nv,)
    dof_armature: Any = None      # (nv,)
    # per-dof limit/spring tables (free dofs: limited = 0)
    dof_limited: Any = None       # (nv,)
    dof_range: Any = None         # (nv, 2)
    dof_solref: Any = None        # (nv, 2)
    dof_solimp: Any = None        # (nv, 5) (d0, dwidth, width, mid, power)
    dof_stiffness: Any = None     # (nv,)
    dof_ref: Any = None           # (nv,)
    dof_margin: Any = None        # (nv,) limit activation distance
    dof_frictionloss: Any = None  # (nv,) dry-friction force bound
    dof_qpos_idx: Tuple[int, ...] = struct.field(pytree_node=False,
                                                 default=())
    dof_invweight0: Any = None    # (nv,) diag(M^-1) at qpos0
    limit_solref: Any = None      # (njnt, 2) (timeconst, dampratio)
    limit_solimp: Any = None      # (njnt, 5)
    body_invweight0: Any = None   # (nbody, 2) mean CoM inv inertia (trn,rot)
    gear: Any = None              # (nu,) scalar gear (col 0 of gearv)
    ctrlrange: Any = None         # (nu, 2)
    ctrllimited: Any = None       # (nu,) float mask
    # general affine actuator model (MuJoCo gaintype=fixed,
    # biastype=affine): f_act = gain * ctrl + b0 + b1*length + b2*vel;
    # motor = (gain 1, bias 0); position kp,kv = (kp, (0,-kp,-kv));
    # velocity kv = (kv, (0,0,-kv))
    actuator_gain: Any = None     # (nu,)
    actuator_bias: Any = None     # (nu, 3)
    actuator_gearv: Any = None    # (nu, 6) vector gear (ball: :3, free: :6)
    # static fast-path flag: all transmissions scalar, all biases zero
    actuator_simple: bool = struct.field(pytree_node=False, default=True)
    # ball/free joints with nonzero stiffness (quaternion springs)
    jnt_spring_quat: Tuple[int, ...] = struct.field(pytree_node=False,
                                                    default=())
    # ---- fixed tendons (MuJoCo <tendon><fixed>): length = ten_J @ qpos
    # over scalar dofs, so the Jacobian is CONSTANT — passive spring/
    # damper forces, limit rows and actuator transmissions all reuse it
    ntendon: int = struct.field(pytree_node=False, default=0)
    ten_J: Any = None             # (ntendon, nv) constant coef matrix
    ten_range: Any = None         # (ntendon, 2)
    ten_limited: Any = None       # (ntendon,) float mask
    ten_solref: Any = None        # (ntendon, 2) limit solref
    ten_solimp: Any = None        # (ntendon, 5) limit solimp
    ten_stiffness: Any = None     # (ntendon,)
    ten_damping: Any = None       # (ntendon,)
    ten_springlength: Any = None  # (ntendon, 2) deadband [lo, hi]
    ten_invweight0: Any = None    # (ntendon,) diag(J M0^-1 J^T)
    # per-actuator tendon transmission id (-1 = joint transmission)
    actuator_tendon: Tuple[int, ...] = struct.field(pytree_node=False,
                                                    default=())
    # ---- equality constraints (MuJoCo <equality>): bilateral soft
    # constraint rows solved by the implicit solver (unclamped impulses)
    # or a reference-acceleration approximation on the penalty path
    neq: int = struct.field(pytree_node=False, default=0)
    eq_kind: Tuple[int, ...] = struct.field(pytree_node=False,
                                            default=())  # EQ_CONNECT/EQ_JOINT
    eq_obj1: Tuple[int, ...] = struct.field(pytree_node=False,
                                            default=())  # body / joint id
    eq_obj2: Tuple[int, ...] = struct.field(pytree_node=False,
                                            default=())  # -1 = world/none
    eq_data: Any = None           # (neq, 11), MuJoCo layout per kind:
    #   joint:   [0:5] quartic polycoef
    #   connect: [0:3] anchor (body1 local), [3:6] anchor2 (body2 local)
    #   weld:    [0:3] anchor (body2 local), [3:6] anchor1 (body1 local
    #            = relpose pos), [6:10] relpose quat, [10] torquescale
    eq_solref: Any = None         # (neq, 2)
    eq_solimp: Any = None         # (neq, 5)
    eq_active: Any = None         # (neq,) float mask
    geom_pos: Any = None          # (ngeom, 3) in body frame
    geom_quat: Any = None         # (ngeom, 4)
    geom_size: Any = None         # (ngeom, 3)
    geom_friction: Any = None     # (ngeom, 3)
    geom_margin: Any = None       # (ngeom,)
    geom_solref: Any = None       # (ngeom, 2)
    geom_solimp: Any = None       # (ngeom, 5)
    site_pos: Any = None          # (nsite, 3) in body frame
    site_quat: Any = None         # (nsite, 4)
    timestep: Any = None          # scalar
    gravity: Any = None           # (3,)
    viscosity: Any = None         # scalar
    density: Any = None           # scalar (fluid medium density)




class State(struct.PyTreeNode):
    """Dynamic physics state (per environment instance)."""
    qpos: Any
    qvel: Any


# ===========================================================================
# Host-side model building (numpy; runs once at env construction)
# ===========================================================================

_GEOM_TYPES = {"plane": PLANE, "sphere": SPHERE, "capsule": CAPSULE,
               "cylinder": CYLINDER, "box": BOX}
_JNT_TYPES = {"free": FREE, "ball": BALL, "slide": SLIDE, "hinge": HINGE}


def _np_quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                     w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                     w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                     w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2])


def _np_quat_conj(q):
    return np.array([q[0], -q[1], -q[2], -q[3]])


def _np_mat_to_quat(m):
    """Host-side rotation matrix -> wxyz quaternion (largest-component
    branch)."""
    t = np.trace(m)
    cand = np.array([1.0 + t,
                     1.0 + m[0, 0] - m[1, 1] - m[2, 2],
                     1.0 - m[0, 0] + m[1, 1] - m[2, 2],
                     1.0 - m[0, 0] - m[1, 1] + m[2, 2]])
    k = int(np.argmax(cand))
    s = 2.0 * np.sqrt(max(cand[k], 1e-12))
    if k == 0:
        q = [0.25 * s, (m[2, 1] - m[1, 2]) / s,
             (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s]
    elif k == 1:
        q = [(m[2, 1] - m[1, 2]) / s, 0.25 * s,
             (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s]
    elif k == 2:
        q = [(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
             0.25 * s, (m[1, 2] + m[2, 1]) / s]
    else:
        q = [(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
             (m[1, 2] + m[2, 1]) / s, 0.25 * s]
    q = np.asarray(q)
    return q / np.linalg.norm(q)


def _np_quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)]])


def _zaxis_quat(z):
    """Quaternion rotating (0,0,1) onto unit vector z (for fromto geoms)."""
    z = np.asarray(z, np.float64)
    z = z / np.linalg.norm(z)
    a = np.cross([0.0, 0.0, 1.0], z)
    na = np.linalg.norm(a)
    w = 1.0 + z[2]
    if na < 1e-12 and w > 1e-8:        # aligned
        return np.array([1.0, 0, 0, 0])
    if na < 1e-12:                      # anti-aligned
        return np.array([0.0, 1.0, 0.0, 0.0])
    q = np.array([w, a[0], a[1], a[2]])
    return q / np.linalg.norm(q)


def _geom_mass_inertia(gtype, size, density, mass):
    """Mass and diagonal inertia (about geom CoM, in geom frame) for one
    geom, matching MuJoCo's inertiafromgeom compiler."""
    pi = np.pi
    if gtype == PLANE:
        return 0.0, np.zeros(3)
    if gtype == SPHERE:
        r = size[0]
        vol = 4.0 / 3.0 * pi * r ** 3
        m = mass if mass is not None else density * vol
        i = 0.4 * m * r * r
        return m, np.array([i, i, i])
    if gtype == CAPSULE:
        r, h = size[0], size[1]
        vc = pi * r * r * (2 * h)
        vs = 4.0 / 3.0 * pi * r ** 3
        if mass is not None:
            density = mass / (vc + vs)
        mc, ms = density * vc, density * vs
        m = mc + ms
        iz = 0.5 * mc * r * r + 0.4 * ms * r * r
        d = h + 0.375 * r  # hemisphere CoM offset from center: h + 3r/8
        ix = (mc * (r * r / 4.0 + h * h / 3.0)
              + ms * (83.0 / 320.0 * r * r + d * d))
        return m, np.array([ix, ix, iz])
    if gtype == CYLINDER:
        r, h = size[0], size[1]
        vol = pi * r * r * (2 * h)
        m = mass if mass is not None else density * vol
        iz = 0.5 * m * r * r
        ix = m * (r * r / 4.0 + h * h / 3.0)
        return m, np.array([ix, ix, iz])
    if gtype == BOX:
        a, b, c = size
        vol = 8.0 * a * b * c
        m = mass if mass is not None else density * vol
        return m, m / 3.0 * np.array([b * b + c * c, a * a + c * c,
                                      a * a + b * b])
    raise ValueError(f"unsupported geom type {gtype}")


def _invweights(model):
    """MuJoCo mj_setConst inverse-weight tables, evaluated at qpos0 on the
    host CPU (one-time, at model build): ``dof_invweight0 = diag(M0^-1)``
    and ``body_invweight0[b] = (trace(Jc M0^-1 Jc^T)/3, trace(Jr M0^-1
    Jr^T)/3)`` with Jc/Jr the CoM translational/rotational Jacobians.
    These feed the constraint solver's diagonal regularizer (solver.py),
    matching MuJoCo's diagApprox exactly (verified vs mjModel tables)."""
    import jax
    from mjrl_tpu.physics import dynamics as dyn
    from mjrl_tpu.physics.kinematics import fwd_kinematics
    with jax.default_device(jax.devices("cpu")[0]):
        data = fwd_kinematics(model, model.qpos0)
        cdof = dyn.compute_cdof(model, data)
        qvel0 = jnp.zeros((model.nv,), model.qpos0.dtype)
        cvel, cdofdot = dyn.compute_velocities(model, data, cdof, qvel0)
        m, _ = dyn.mass_and_bias(model, data, cdof, cvel, cdofdot, qvel0)
    m = np.asarray(m, np.float64)
    cdof_np = np.asarray(cdof, np.float64)
    xipos = np.asarray(data.xipos, np.float64)
    minv = np.linalg.inv(m)
    dof_iw = np.diag(minv).copy()
    mask = np.asarray(dyn.ancestor_mask(model), np.float64)   # (nbody, nv)
    body_iw = np.zeros((model.nbody, 2))
    ang, lin = cdof_np[:, :3], cdof_np[:, 3:]
    for b in range(1, model.nbody):
        mk = mask[b][:, None]
        jt = (lin + np.cross(ang, xipos[b][None, :])) * mk    # (nv, 3)
        jr = ang * mk
        body_iw[b, 0] = np.trace(jt.T @ minv @ jt) / 3.0
        body_iw[b, 1] = np.trace(jr.T @ minv @ jr) / 3.0
    if model.ntendon:
        tj = np.asarray(model.ten_J, np.float64)
        ten_iw = np.einsum("ti,ij,tj->t", tj, minv, tj)
    else:
        ten_iw = np.zeros((0,))
    return dof_iw, body_iw, ten_iw


def _actuators_simple(actuators, joints):
    """True when every actuator is a plain motor on a scalar joint —
    the one-scatter fast path in dynamics.actuator_force."""
    return all(a["tendon"] < 0
               and joints[a["joint"]]["type"] not in (FREE, BALL)
               and not np.any(a["bias"]) and a["gain"] == 1.0
               for a in actuators)


def _solver_id(solver):
    try:
        return {"penalty": PENALTY, "pgs": PGS, "newton": PGS,
                "implicit": PGS}[solver]
    except KeyError:
        raise ValueError(
            f"unknown solver {solver!r}: choose 'penalty' (explicit, fast,"
            " approximate) or 'newton' (implicit primal Newton, MuJoCo-"
            "grade limits/contacts; aliases 'pgs', 'implicit')") from None


@dataclass
class _Body:
    parent: int
    pos: np.ndarray
    quat: np.ndarray
    joints: list = field(default_factory=list)
    geoms: list = field(default_factory=list)
    inertial: dict = None   # explicit <inertial> override (see add_body)


class ModelBuilder:
    def __init__(self, timestep=0.002, gravity=(0, 0, -9.81), integrator="euler",
                 viscosity=0.0, density=0.0, settotalmass=None,
                 cone="pyramidal", noslip_iterations=0):
        self.opt = dict(timestep=timestep, gravity=np.asarray(gravity, np.float64),
                        integrator=EULER if integrator.lower() == "euler" else RK4,
                        viscosity=viscosity, density=density,
                        cone=ELLIPTIC if str(cone).lower() == "elliptic"
                        else PYRAMIDAL,
                        noslip_iters=int(noslip_iterations))
        # <compiler settotalmass="m"/>: rescale all body masses+inertias
        # after compilation so they sum to m (mujoco mj_setTotalmass)
        self.settotalmass = settotalmass
        # body 0 = world
        self.bodies = [_Body(parent=-1, pos=np.zeros(3),
                             quat=np.array([1.0, 0, 0, 0]))]
        self.joints = []
        self.geoms = []
        self.sites = []
        self.actuators = []
        self.tendons = []
        self.equalities = []
        # explicit <contact><pair> declarations: (g1, g2, condim or None)
        # and <exclude> body pairs (b1, b2)
        self.explicit_pairs = []
        self.excluded_body_pairs = []
        self.names = {"body": {"world": 0}, "site": {}, "geom": {},
                      "joint": {}, "tendon": {}}

    # ---- declaration API -------------------------------------------------
    def add_body(self, parent, pos=(0, 0, 0), quat=(1, 0, 0, 0), name=None,
                 inertial=None):
        """``inertial``: optional explicit <inertial> spec overriding the
        inertiafromgeom computation — dict with mass, pos (CoM in body
        frame), diaginertia (3 principal moments) and optional quat
        (principal frame), exactly MuJoCo's explicit-inertial path."""
        self.bodies.append(_Body(parent=parent,
                                 pos=np.asarray(pos, np.float64),
                                 quat=np.asarray(quat, np.float64),
                                 inertial=inertial))
        bid = len(self.bodies) - 1
        if name:
            self.names["body"][name] = bid
        return bid

    def add_joint(self, body, jnt_type, axis=(0, 0, 1), pos=(0, 0, 0),
                  jnt_range=None, damping=0.0, armature=0.0, stiffness=0.0,
                  ref=0.0, limited=None, solref=(0.02, 1.0),
                  solimp=(0.9, 0.95, 0.001, 0.5, 2.0), margin=0.0,
                  frictionloss=0.0, name=None):
        if limited is None:
            limited = jnt_range is not None
        if _JNT_TYPES[jnt_type] == FREE:
            limited = False
            assert self.bodies[body].parent == 0, \
                "free joints require a direct child of the world"
        if _JNT_TYPES[jnt_type] == BALL and limited:
            # MuJoCo ball limits constrain the total rotation angle to
            # range[1] (range[0] must be 0)
            assert jnt_range is not None and float(jnt_range[0]) == 0.0, \
                "ball joint range must be (0, max_angle)"
        # ball/free stiffness = quaternion spring toward the reference
        # orientation (dynamics.spring_force); scalar-dof springs go
        # through dof_stiffness
        jid = len(self.joints)
        axis = np.asarray(axis, np.float64)
        axis = axis / np.linalg.norm(axis)
        self.joints.append(dict(
            body=body, type=_JNT_TYPES[jnt_type], axis=axis,
            pos=np.asarray(pos, np.float64),
            range=np.asarray(jnt_range if jnt_range is not None else (0.0, 0.0),
                             np.float64),
            limited=float(bool(limited)), damping=damping, armature=armature,
            stiffness=stiffness, ref=ref, solref=np.asarray(solref, np.float64),
            solimp=np.asarray(solimp, np.float64), margin=float(margin),
            frictionloss=float(frictionloss)))
        self.bodies[body].joints.append(jid)
        if name:
            self.names["joint"][name] = jid
        return jid

    def add_geom(self, body, gtype, size=(0, 0, 0), pos=(0, 0, 0),
                 quat=(1, 0, 0, 0), fromto=None, density=1000.0, mass=None,
                 contype=1, conaffinity=1, friction=(1.0, 0.005, 0.0001),
                 margin=0.0, solref=(0.02, 1.0),
                 solimp=(0.9, 0.95, 0.001, 0.5, 2.0), condim=3, name=None):
        if condim not in (1, 3, 4, 6):
            raise NotImplementedError(
                f"condim {condim} not supported (1 = frictionless, 3 = "
                "tangential, 4 = +torsional, 6 = +rolling friction)")
        condim = int(condim)
        size = np.array(list(size) + [0.0] * (3 - len(size)), np.float64)
        pos = np.asarray(pos, np.float64)
        quat = np.asarray(quat, np.float64)
        if fromto is not None:
            f = np.asarray(fromto, np.float64)
            a, b = f[:3], f[3:]
            pos = 0.5 * (a + b)
            quat = _zaxis_quat(b - a)
            size = np.array([size[0], 0.5 * np.linalg.norm(b - a), 0.0])
        gid = len(self.geoms)
        self.geoms.append(dict(
            body=body, type=_GEOM_TYPES[gtype], size=size, pos=pos, quat=quat,
            density=density, mass=mass, contype=int(contype),
            conaffinity=int(conaffinity),
            friction=np.asarray(friction, np.float64), margin=margin,
            solref=np.asarray(solref, np.float64),
            solimp=np.asarray(solimp, np.float64), condim=int(condim)))
        self.bodies[body].geoms.append(gid)
        if name:
            self.names["geom"][name] = gid
        return gid

    def add_site(self, body, pos=(0, 0, 0), quat=(1, 0, 0, 0), name=None):
        sid = len(self.sites)
        self.sites.append(dict(body=body, pos=np.asarray(pos, np.float64),
                               quat=np.asarray(quat, np.float64)))
        if name:
            self.names["site"][name] = sid
        return sid

    def add_contact_pair(self, geom1, geom2, condim=None):
        """Explicit <contact><pair>: always a collision candidate,
        regardless of contype/conaffinity (MuJoCo predefined-pair
        semantics); ``condim`` overrides the geom-max rule (None keeps
        it).  Adroit declares its finger-finger contacts this way with
        condim 1."""
        if condim is not None and int(condim) not in (1, 3, 4, 6):
            raise NotImplementedError(
                f"pair condim {condim} not supported (1 = frictionless, "
                "3 = tangential, 4 = +torsional, 6 = +rolling friction)")
        self.explicit_pairs.append((int(geom1), int(geom2),
                                    None if condim is None else int(condim)))

    def add_contact_exclude(self, body1, body2):
        """<contact><exclude>: drop every dynamic geom pair between the
        two bodies (explicit pairs are NOT excluded — MuJoCo rule)."""
        self.excluded_body_pairs.append((int(body1), int(body2)))

    def add_tendon(self, joints, ten_range=None, limited=None,
                   stiffness=0.0, damping=0.0, springlength=None,
                   solref=(0.02, 1.0), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
                   name=None):
        """Fixed tendon (MuJoCo <tendon><fixed>): length = sum coef *
        qpos over the listed scalar joints.  ``joints`` is a list of
        (joint_id, coef).  ``springlength`` is the deadband pair
        [lo, hi] (scalar = both); None or (-1, -1) = (0, 0), matching
        the MuJoCo 3.10 compiler's sentinel resolution."""
        for jid, _ in joints:
            assert self.joints[jid]["type"] in (SLIDE, HINGE), \
                "fixed tendons couple scalar (slide/hinge) joints only"
        if limited is None:
            limited = ten_range is not None
        if springlength is not None:
            springlength = np.atleast_1d(
                np.asarray(springlength, np.float64))
            if len(springlength) == 1:
                springlength = np.repeat(springlength, 2)
        tid = len(self.tendons)
        self.tendons.append(dict(
            joints=[(int(j), float(c)) for j, c in joints],
            range=np.asarray(
                ten_range if ten_range is not None else (0.0, 0.0),
                np.float64),
            limited=float(bool(limited)), stiffness=float(stiffness),
            damping=float(damping), springlength=springlength,
            solref=np.asarray(solref, np.float64),
            solimp=np.asarray(solimp, np.float64)))
        if name:
            self.names["tendon"][name] = tid
        return tid

    def add_equality_joint(self, joint1, joint2=None,
                           polycoef=(0.0, 1.0, 0.0, 0.0, 0.0),
                           solref=(0.02, 1.0),
                           solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
                           active=True):
        """Quartic joint coupling (MuJoCo <equality><joint>):
        (q1 - q1_0) = poly(q2 - q2_0); joint2 None pins joint1 at
        q1_0 + polycoef[0]."""
        for jid in (joint1,) + (() if joint2 is None else (joint2,)):
            assert self.joints[jid]["type"] in (SLIDE, HINGE), \
                "joint equality couples scalar (slide/hinge) joints only"
        data = np.zeros(11)
        data[:5] = np.asarray(polycoef, np.float64)[:5]
        data[10] = 1.0      # MuJoCo stores the default torquescale
        self.equalities.append(dict(
            kind=EQ_JOINT, obj1=int(joint1),
            obj2=-1 if joint2 is None else int(joint2), data=data,
            solref=np.asarray(solref, np.float64),
            solimp=np.asarray(solimp, np.float64),
            active=float(bool(active))))
        return len(self.equalities) - 1

    def add_equality_connect(self, body1, body2, anchor,
                             solref=(0.02, 1.0),
                             solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
                             active=True):
        """3-dof connect constraint (MuJoCo <equality><connect>):
        ``anchor`` is in body1's local frame; the coincident body2-local
        point is computed at qpos0 by finalize() (the MuJoCo compiler
        rule).  body2 = 0 welds the point to the world."""
        data = np.zeros(11)
        data[:3] = np.asarray(anchor, np.float64)
        data[10] = 1.0      # MuJoCo stores the default torquescale
        data[3:6] = np.nan                # resolved at finalize
        self.equalities.append(dict(
            kind=EQ_CONNECT, obj1=int(body1), obj2=int(body2), data=data,
            solref=np.asarray(solref, np.float64),
            solimp=np.asarray(solimp, np.float64),
            active=float(bool(active))))
        return len(self.equalities) - 1

    def add_equality_weld(self, body1, body2, anchor=(0, 0, 0),
                          relpose=None, torquescale=1.0,
                          solref=(0.02, 1.0),
                          solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
                          active=True):
        """6-dof weld (MuJoCo <equality><weld>): body1's pose is locked
        to body2's.  ``anchor`` is in body2's local frame (the MuJoCo
        convention); ``relpose`` = (pos(3), quat(4)) of body1 relative
        to body2, or None / all-zero quat to capture the relative pose
        at qpos0 in finalize() (the compiler rule).  ``torquescale``
        scales the 3 orientation rows against the 3 position rows."""
        data = np.zeros(11)
        data[:3] = np.asarray(anchor, np.float64)
        if relpose is None:
            data[3:10] = np.nan           # resolved at finalize
        else:
            rp = np.asarray(relpose, np.float64)
            assert rp.shape == (7,), "relpose = (pos 3, quat 4)"
            data[3:10] = rp
            if not np.any(rp[3:]):        # all-zero quat sentinel
                data[6:10] = np.nan
        data[10] = float(torquescale)
        self.equalities.append(dict(
            kind=EQ_WELD, obj1=int(body1), obj2=int(body2), data=data,
            solref=np.asarray(solref, np.float64),
            solimp=np.asarray(solimp, np.float64),
            active=float(bool(active))))
        return len(self.equalities) - 1

    def add_actuator(self, joint=None, gear=1.0, ctrlrange=(-1.0, 1.0),
                     ctrllimited=True, gain=1.0, bias=(0.0, 0.0, 0.0),
                     tendon=None):
        """Affine actuator (MuJoCo gaintype=fixed biastype=affine) on a
        joint or fixed-tendon transmission.  ``gear`` is a scalar for
        slide/hinge/tendon, or a vector (3 for ball, 6 for free
        joints).  motor: defaults; position servo: gain=kp,
        bias=(0,-kp,-kv); velocity servo: gain=kv, bias=(0,0,-kv)."""
        assert (joint is None) != (tendon is None), \
            "actuator needs exactly one of joint= or tendon="
        gear = np.atleast_1d(np.asarray(gear, np.float64))
        if tendon is None:
            jt = self.joints[joint]["type"]
            need = {FREE: 6, BALL: 3}.get(jt, 1)
        else:
            need = 1
        if len(gear) == 1:
            gear = np.concatenate([gear, np.zeros(need - 1)]) \
                if need > 1 else gear
        assert len(gear) >= need, \
            f"gear needs {need} elements for this joint type"
        gearv = np.zeros(6)
        gearv[:len(gear[:6])] = gear[:6]
        self.actuators.append(dict(
            joint=-1 if joint is None else joint,
            tendon=-1 if tendon is None else tendon,
            gear=float(gearv[0]), gearv=gearv,
            gain=float(gain), bias=np.asarray(bias, np.float64),
            ctrlrange=np.asarray(ctrlrange, np.float64),
            ctrllimited=float(bool(ctrllimited))))
        return len(self.actuators) - 1

    # ---- compilation ------------------------------------------------------
    def _body_inertial(self, body):
        """Combine geom inertias -> (mass, ipos, iquat, principal inertia).
        An explicit <inertial> spec (add_body inertial=...) wins outright,
        matching MuJoCo's inertiafromgeom="auto" default (geom-derived
        inertia only fills in when the body declares none)."""
        if body.inertial is not None:
            inr = body.inertial
            q = np.asarray(inr.get("quat", (1.0, 0, 0, 0)), np.float64)
            return (float(inr["mass"]),
                    np.asarray(inr.get("pos", (0.0, 0, 0)), np.float64),
                    q / np.linalg.norm(q),
                    np.asarray(inr["diaginertia"], np.float64))
        total_m = 0.0
        com = np.zeros(3)
        for gid in body.geoms:
            g = self.geoms[gid]
            m, _ = _geom_mass_inertia(g["type"], g["size"], g["density"],
                                      g["mass"])
            total_m += m
            com += m * g["pos"]
        if total_m < 1e-12:
            # massless body: MuJoCo would reject it unless it's the world or
            # has children carrying mass; give tiny defaults.
            return 0.0, np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3)
        com = com / total_m
        if len(body.geoms) == 1:
            # single geom: inertia is diagonal in the geom frame — use it
            # directly (matches MuJoCo; with anisotropic fluid drag the
            # *choice* of principal axes in a degenerate subspace is
            # physically meaningful, so eigh's arbitrary basis won't do).
            g = self.geoms[body.geoms[0]]
            m, idiag = _geom_mass_inertia(g["type"], g["size"], g["density"],
                                          g["mass"])
            return m, g["pos"].copy(), g["quat"] / np.linalg.norm(g["quat"]), \
                idiag
        itot = np.zeros((3, 3))
        for gid in body.geoms:
            g = self.geoms[gid]
            m, idiag = _geom_mass_inertia(g["type"], g["size"], g["density"],
                                          g["mass"])
            r = _np_quat_to_mat(g["quat"])
            i_body = r @ np.diag(idiag) @ r.T
            d = g["pos"] - com
            i_body += m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
            itot += i_body
        evals, evecs = np.linalg.eigh(itot)
        # descending order like MuJoCo
        order = np.argsort(evals)[::-1]
        evals = evals[order]
        evecs = evecs[:, order]
        if np.linalg.det(evecs) < 0:
            evecs[:, 2] *= -1
        # rotation matrix -> quaternion
        t = np.trace(evecs)
        if t > 0:
            s = np.sqrt(t + 1.0) * 2
            q = np.array([0.25 * s, (evecs[2, 1] - evecs[1, 2]) / s,
                          (evecs[0, 2] - evecs[2, 0]) / s,
                          (evecs[1, 0] - evecs[0, 1]) / s])
        else:
            i = np.argmax(np.diag(evecs))
            j, k = (i + 1) % 3, (i + 2) % 3
            s = np.sqrt(1.0 + evecs[i, i] - evecs[j, j] - evecs[k, k]) * 2
            q = np.zeros(4)
            q[0] = (evecs[k, j] - evecs[j, k]) / s
            q[1 + i] = 0.25 * s
            q[1 + j] = (evecs[j, i] + evecs[i, j]) / s
            q[1 + k] = (evecs[k, i] + evecs[i, k]) / s
        q = q / np.linalg.norm(q)
        return total_m, com, q, np.maximum(evals, 0.0)

    def _contact_pairs(self):
        """MuJoCo pair filtering -> (pairs, pair_condims).

        Dynamic pairs: different bodies, not parent-child, (contype1 &
        conaffinity2) or (contype2 & conaffinity1), minus <exclude>d
        body pairs; condim = max of geom condims.  Explicit
        <contact><pair> declarations are appended (deduplicated against
        the dynamic set, their condim override winning — MuJoCo gives
        predefined pairs precedence) and are immune to excludes."""
        excl = {tuple(sorted(p)) for p in self.excluded_body_pairs}
        pairs, condims = [], []
        for i, g1 in enumerate(self.geoms):
            for j in range(i + 1, len(self.geoms)):
                g2 = self.geoms[j]
                b1, b2 = g1["body"], g2["body"]
                if b1 == b2:
                    continue
                if tuple(sorted((b1, b2))) in excl:
                    continue
                p1, p2 = self.bodies[b1].parent, self.bodies[b2].parent
                # exclude parent-child (MuJoCo default; world-body geoms
                # like floors are exempt from the parent-child exclusion)
                if (p1 == b2 and b2 != 0) or (p2 == b1 and b1 != 0):
                    continue
                if (g1["contype"] & g2["conaffinity"]) or \
                   (g2["contype"] & g1["conaffinity"]):
                    pairs.append((i, j))
                    condims.append(max(g1["condim"], g2["condim"]))
        index = {p: k for k, p in enumerate(pairs)}
        for (i, j, cd) in self.explicit_pairs:
            key = (i, j) if i < j else (j, i)
            cd = (max(self.geoms[i]["condim"], self.geoms[j]["condim"])
                  if cd is None else cd)
            if key in index:
                condims[index[key]] = cd
            else:
                index[key] = len(pairs)
                pairs.append(key)
                condims.append(cd)
        return tuple(pairs), tuple(condims)

    def _sort_by_body(self):
        """MuJoCo orders geoms/sites grouped by body in tree order; match
        that so golden-index comparisons line up."""
        for kind, items in (("geom", self.geoms), ("site", self.sites)):
            order = sorted(range(len(items)), key=lambda i: items[i]["body"])
            remap = {old: new for new, old in enumerate(order)}
            items[:] = [items[i] for i in order]
            self.names[kind] = {k: remap[v] for k, v in self.names[kind].items()}
            if kind == "geom":
                for b in self.bodies:
                    b.geoms = [remap[g] for g in b.geoms]
                self.explicit_pairs = [
                    (remap[i], remap[j], cd)
                    for (i, j, cd) in self.explicit_pairs]

    def finalize(self, dtype=jnp.float32, solver="penalty",
                 contact_topk=None, row_freeze_step=False,
                 newton_iters=0):
        """``contact_topk``: implicit-solver active-set cap (see Model);
        None = auto (cap at 64 when a model has more expanded contact
        candidates than that — bounds the dual system on contact-rich
        models like peg insertion without touching small ones).
        ``row_freeze_step``: freeze RK4 constraint rows across the whole
        control step instead of rebuilding them at every RK4 stage
        (see Model.row_freeze_step).
        ``newton_iters``: > 0 switches the implicit path to the primal
        Newton solver with that iteration budget (see Model)."""
        self._sort_by_body()
        nbody = len(self.bodies)
        njnt = len(self.joints)
        nu = len(self.actuators)
        ngeom = len(self.geoms)
        nsite = len(self.sites)

        mass = np.zeros(nbody)
        ipos = np.zeros((nbody, 3))
        iquat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
        inertia = np.zeros((nbody, 3))
        # body 0 is the static world: zero mass regardless of its geoms
        for b in range(1, nbody):
            m, c, q, i = self._body_inertial(self.bodies[b])
            mass[b], ipos[b], iquat[b], inertia[b] = m, c, q, i
        if self.settotalmass is not None and self.settotalmass > 0 \
                and mass.sum() > 0:
            scale = float(self.settotalmass) / mass.sum()
            mass *= scale
            inertia *= scale

        def arr(x):
            return jnp.asarray(np.asarray(x), dtype)

        j = self.joints
        # qpos/dof addressing (free joints: 7 qpos, 6 dofs)
        jnt_qposadr, jnt_dofadr = [], []
        nq = nv = 0
        for x in j:
            jnt_qposadr.append(nq)
            jnt_dofadr.append(nv)
            nq += JNT_NQ[x["type"]]
            nv += JNT_NV[x["type"]]

        # per-dof tables
        dof_damping = np.zeros(nv)
        dof_armature = np.zeros(nv)
        dof_limited = np.zeros(nv)
        dof_range = np.zeros((nv, 2))
        dof_solref = np.tile([0.02, 1.0], (nv, 1))
        dof_solimp = np.tile([0.9, 0.95, 0.001, 0.5, 2.0], (nv, 1))
        dof_stiffness = np.zeros(nv)
        dof_ref = np.zeros(nv)
        dof_margin = np.zeros(nv)
        dof_frictionloss = np.zeros(nv)
        dof_qpos_idx = np.zeros(nv, np.int64)
        qpos0 = np.zeros(nq)
        for ji, x in enumerate(j):
            qa, da = jnt_qposadr[ji], jnt_dofadr[ji]
            ndof = JNT_NV[x["type"]]
            dof_damping[da:da + ndof] = x["damping"]
            dof_armature[da:da + ndof] = x["armature"]
            if x["type"] == FREE:
                body = self.bodies[x["body"]]
                qpos0[qa:qa + 3] = body.pos
                qpos0[qa + 3:qa + 7] = body.quat / np.linalg.norm(body.quat)
                dof_qpos_idx[da:da + ndof] = qa  # unused (unlimited)
            elif x["type"] == BALL:
                qpos0[qa] = 1.0  # identity quaternion
                dof_qpos_idx[da:da + ndof] = qa  # unused (unlimited)
            else:
                qpos0[qa] = x["ref"]
                dof_limited[da] = x["limited"]
                dof_range[da] = x["range"]
                dof_solref[da] = x["solref"]
                dof_solimp[da] = x["solimp"]
                dof_stiffness[da] = x["stiffness"]
                dof_ref[da] = x["ref"]
                dof_margin[da] = x.get("margin", 0.0)
                dof_qpos_idx[da] = qa
            # dry friction applies to every scalar dof incl. ball axes
            # (MuJoCo dof_frictionloss; free joints keep 0 by default
            # in the suite's models)
            if x["type"] not in (FREE,):
                dof_frictionloss[da:da + ndof] = x.get("frictionloss", 0.0)

        # fixed-tendon tables: constant Jacobian over scalar dofs.
        # springlength: the exact (-1, -1) sentinel (MuJoCo's unset
        # default) resolves to (0, 0); any other value — including
        # negative fixed-tendon lengths, which are legal signed sums —
        # is literal (verified against the MuJoCo 3.10 compiler).
        ntendon = len(self.tendons)
        ten_J = np.zeros((ntendon, nv))
        ten_spring = np.zeros((ntendon, 2))
        for ti, t in enumerate(self.tendons):
            for jid, coef in t["joints"]:
                ten_J[ti, jnt_dofadr[jid]] += coef
            sl = t["springlength"]
            if sl is None or (sl[0] == -1 and sl[1] == -1):
                sl = np.zeros(2)
            ten_spring[ti] = sl

        pairs_, pair_condim_ = self._contact_pairs()

        model = Model(
            nbody=nbody, njnt=njnt, nq=nq, nv=nv, nu=nu, ngeom=ngeom,
            nsite=nsite,
            body_parent=tuple(b.parent for b in self.bodies),
            body_jnts=tuple(tuple(b.joints) for b in self.bodies),
            jnt_type=tuple(x["type"] for x in j),
            jnt_body=tuple(x["body"] for x in j),
            jnt_qposadr=tuple(jnt_qposadr),
            jnt_dofadr=tuple(jnt_dofadr),
            geom_body=tuple(g["body"] for g in self.geoms),
            geom_type=tuple(g["type"] for g in self.geoms),
            geom_condim=tuple(g["condim"] for g in self.geoms),
            site_body=tuple(s["body"] for s in self.sites),
            actuator_joint=tuple(a["joint"] for a in self.actuators),
            integrator=self.opt["integrator"],
            solver=_solver_id(solver),
            cone=self.opt.get("cone", PYRAMIDAL),
            noslip_iters=self.opt.get("noslip_iters", 0),
            contact_pairs=pairs_,
            contact_pair_condim=pair_condim_,
            body_pos=arr([b.pos for b in self.bodies]),
            body_quat=arr([b.quat for b in self.bodies]),
            body_ipos=arr(ipos), body_iquat=arr(iquat),
            body_mass=arr(mass), body_inertia=arr(inertia),
            jnt_axis=arr([x["axis"] for x in j]).reshape(njnt, 3),
            jnt_pos=arr([x["pos"] for x in j]).reshape(njnt, 3),
            jnt_range=arr([x["range"] for x in j]).reshape(njnt, 2),
            jnt_limited=arr([x["limited"] for x in j]).reshape(njnt),
            jnt_stiffness=arr([x["stiffness"] for x in j]).reshape(njnt),
            jnt_ref=arr([x["ref"] for x in j]).reshape(njnt),
            qpos0=arr(qpos0),
            dof_damping=arr(dof_damping),
            dof_armature=arr(dof_armature),
            dof_limited=arr(dof_limited),
            dof_range=arr(dof_range),
            dof_margin=arr(dof_margin),
            dof_frictionloss=arr(dof_frictionloss),
            dof_solref=arr(dof_solref),
            dof_solimp=arr(dof_solimp),
            dof_stiffness=arr(dof_stiffness),
            dof_ref=arr(dof_ref),
            dof_qpos_idx=tuple(int(i) for i in dof_qpos_idx),
            limit_solref=arr([x["solref"] for x in j]).reshape(njnt, 2),
            limit_solimp=arr([x["solimp"] for x in j]).reshape(njnt, 5),
            gear=arr([a["gear"] for a in self.actuators]).reshape(nu),
            ctrlrange=arr([a["ctrlrange"] for a in self.actuators]).reshape(nu, 2),
            ctrllimited=arr([a["ctrllimited"] for a in self.actuators]).reshape(nu),
            actuator_gain=arr([a["gain"] for a in self.actuators]).reshape(nu),
            actuator_bias=arr([a["bias"] for a in self.actuators]).reshape(nu, 3),
            actuator_gearv=arr([a["gearv"] for a in self.actuators]).reshape(nu, 6),
            actuator_simple=_actuators_simple(self.actuators, j),
            jnt_spring_quat=tuple(
                ji for ji, x in enumerate(j)
                if x["type"] in (BALL, FREE) and x["stiffness"]),
            ntendon=ntendon,
            ten_J=arr(ten_J),
            ten_range=arr([t["range"] for t in self.tendons]
                          ).reshape(ntendon, 2),
            ten_limited=arr([t["limited"] for t in self.tendons]
                            ).reshape(ntendon),
            ten_solref=arr([t["solref"] for t in self.tendons]
                           ).reshape(ntendon, 2),
            ten_solimp=arr([t["solimp"] for t in self.tendons]
                           ).reshape(ntendon, 5),
            ten_stiffness=arr([t["stiffness"] for t in self.tendons]
                              ).reshape(ntendon),
            ten_damping=arr([t["damping"] for t in self.tendons]
                            ).reshape(ntendon),
            ten_springlength=arr(ten_spring),
            actuator_tendon=tuple(a["tendon"] for a in self.actuators),
            neq=len(self.equalities),
            eq_kind=tuple(e["kind"] for e in self.equalities),
            eq_obj1=tuple(e["obj1"] for e in self.equalities),
            eq_obj2=tuple(e["obj2"] for e in self.equalities),
            eq_data=arr([e["data"] for e in self.equalities]
                        ).reshape(len(self.equalities), 11),
            eq_solref=arr([e["solref"] for e in self.equalities]
                          ).reshape(len(self.equalities), 2),
            eq_solimp=arr([e["solimp"] for e in self.equalities]
                          ).reshape(len(self.equalities), 5),
            eq_active=arr([e["active"] for e in self.equalities]
                          ).reshape(len(self.equalities)),
            geom_pos=arr([g["pos"] for g in self.geoms]).reshape(ngeom, 3),
            geom_quat=arr([g["quat"] for g in self.geoms]).reshape(ngeom, 4),
            geom_size=arr([g["size"] for g in self.geoms]).reshape(ngeom, 3),
            geom_friction=arr([g["friction"] for g in self.geoms]).reshape(ngeom, 3),
            geom_margin=arr([g["margin"] for g in self.geoms]).reshape(ngeom),
            geom_solref=arr([g["solref"] for g in self.geoms]).reshape(ngeom, 2),
            geom_solimp=arr([g["solimp"] for g in self.geoms]).reshape(ngeom, 5),
            site_pos=arr([s["pos"] for s in self.sites]).reshape(nsite, 3),
            site_quat=arr([s["quat"] for s in self.sites]).reshape(nsite, 4),
            timestep=arr(self.opt["timestep"]),
            gravity=arr(self.opt["gravity"]),
            viscosity=arr(self.opt["viscosity"]),
            density=arr(self.opt["density"]),
        )
        dof_iw, body_iw, ten_iw = _invweights(model)
        if contact_topk is None:
            from mjrl_tpu.physics.collision import contact_geom_ids
            n_expanded = len(contact_geom_ids(model)[0])
            contact_topk = 64 if n_expanded > 64 else 0
        # resolve connect anchors: the body2-local point coincident with
        # body1's anchor at qpos0 (the MuJoCo compiler rule)
        eq_data = np.array(model.eq_data, np.float64) \
            if model.neq else None
        if model.neq and np.isnan(eq_data).any():
            import jax
            from mjrl_tpu.physics.kinematics import fwd_kinematics
            with jax.default_device(jax.devices("cpu")[0]):
                data0 = fwd_kinematics(model, model.qpos0)
            xpos = np.asarray(data0.xpos, np.float64)
            xmat = np.asarray(data0.xmat, np.float64)
            for i, e in enumerate(self.equalities):
                if e["kind"] == EQ_CONNECT:
                    b1, b2 = e["obj1"], e["obj2"]
                    p1 = xpos[b1] + xmat[b1] @ eq_data[i, :3]
                    eq_data[i, 3:6] = xmat[b2].T @ (p1 - xpos[b2])
                elif e["kind"] == EQ_WELD:
                    b1, b2 = e["obj1"], e["obj2"]
                    if np.isnan(eq_data[i, 3:6]).any():
                        # body1-local coords of body2's anchor at qpos0
                        p2 = xpos[b2] + xmat[b2] @ eq_data[i, :3]
                        eq_data[i, 3:6] = xmat[b1].T @ (p2 - xpos[b1])
                    if np.isnan(eq_data[i, 6:10]).any():
                        # relq s.t. vec(q2^-1 q1 relq) = 0 at qpos0
                        q1 = _np_mat_to_quat(xmat[b1])
                        q2 = _np_mat_to_quat(xmat[b2])
                        relq = _np_quat_mul(_np_quat_conj(q1), q2)
                        eq_data[i, 6:10] = relq / np.linalg.norm(relq)
        return model.replace(dof_invweight0=arr(dof_iw),
                             body_invweight0=arr(body_iw),
                             ten_invweight0=arr(ten_iw),
                             eq_data=(arr(eq_data) if eq_data is not None
                                      else model.eq_data),
                             contact_topk=int(contact_topk),
                             row_freeze_step=bool(row_freeze_step),
                             newton_iters=int(newton_iters))
