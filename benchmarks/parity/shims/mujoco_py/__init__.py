"""Import-time stub for ``mujoco_py`` so the reference package imports.

The reference's own env classes are never instantiated by the parity
harness (envs are rebuilt on MuJoCo 3.10 in mujoco310_envs.py); these
symbols only need to exist for module-level ``from mujoco_py import ...``
statements in mjrl/envs/*.py.
"""


def _unavailable(*args, **kwargs):
    raise RuntimeError("mujoco_py stub: reference envs are replaced by "
                       "mujoco310_envs in the parity harness")


load_model_from_path = _unavailable
MjSim = _unavailable
MjViewer = _unavailable
MjSimState = _unavailable
