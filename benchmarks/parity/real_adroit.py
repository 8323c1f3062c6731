"""Load gymnasium-robotics' AdroitHandRelocate-v1 under MuJoCo >= 3.3.

The installed gymnasium-robotics 1.4.1 ships `adroit_assets.xml` with
`<option apirate="200"/>`; the `apirate` attribute was removed from the
MJCF schema in MuJoCo 3.3, so `gymnasium.make("AdroitHandRelocate-v1")`
raises a schema violation with the installed mujoco 3.10.  This shim
copies the Adroit asset tree into a temp dir with the stale attribute
stripped and redirects the env's model path there.

Usage:
    from real_adroit import make_real_relocate
    env = make_real_relocate(max_episode_steps=200)
"""

import os
import re
import shutil
import tempfile

_PATCHED_DIR = None


def patched_relocate_xml():
    """Copy the adroit_hand asset dir to a temp tree with `apirate`
    removed; return the patched adroit_relocate.xml path."""
    global _PATCHED_DIR
    if _PATCHED_DIR is None:
        import gymnasium_robotics
        src = os.path.join(os.path.dirname(gymnasium_robotics.__file__),
                           "envs", "assets", "adroit_hand")
        _PATCHED_DIR = tempfile.mkdtemp(prefix="adroit_patched_")
        dst = os.path.join(_PATCHED_DIR, "adroit_hand")
        os.makedirs(dst)
        # meshes/textures: symlink (large binaries); XMLs: copy + patch
        os.symlink(os.path.join(src, "resources"),
                   os.path.join(dst, "resources"))
        for fn in os.listdir(src):
            if fn.endswith(".xml"):
                txt = open(os.path.join(src, fn)).read()
                txt = re.sub(r'\s*apirate="[^"]*"', "", txt)
                with open(os.path.join(dst, fn), "w") as f:
                    f.write(txt)
    return os.path.join(_PATCHED_DIR, "adroit_hand", "adroit_relocate.xml")


def make_real_relocate(max_episode_steps=200, **env_kwargs):
    """gymnasium.make('AdroitHandRelocate-v1') with the patched model
    path swapped in via a scoped MujocoEnv.__init__ wrapper."""
    import gymnasium
    import gymnasium_robotics  # noqa: F401  (registers the Adroit ids)
    from gymnasium.envs.mujoco.mujoco_env import MujocoEnv

    xml = patched_relocate_xml()
    orig_init = MujocoEnv.__init__

    def patched_init(self, model_path, *a, **kw):
        return orig_init(self, xml, *a, **kw)

    MujocoEnv.__init__ = patched_init
    try:
        env = gymnasium.make("AdroitHandRelocate-v1",
                             max_episode_steps=max_episode_steps,
                             **env_kwargs)
    finally:
        MujocoEnv.__init__ = orig_init
    return env
