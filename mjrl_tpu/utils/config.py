"""Typed experiment configuration loading.

The reference mixes three config styles: ``eval()`` of dict-literal .txt
files (examples/policy_opt_job_script.py:35-36 — an arbitrary-code-execution
defect), hydra YAML (tests/hydra/), and argparse CLIs.  Here one loader
covers all formats safely:

- .json            -> json.load
- .yaml / .yml     -> yaml.safe_load
- .txt / .config   -> ast.literal_eval of a Python dict literal (accepts
                      the reference's config files without eval)

plus dotted-key overrides (``train.niter=5``) in the hydra CLI spirit.
Configs are echoed to the job dir as job_config.json for provenance
(policy_opt_job_script.py:42-44).
"""

import ast
import json
import os


def load_config(path):
    ext = os.path.splitext(path)[1].lower()
    with open(path) as f:
        text = f.read()
    if ext == ".json":
        return json.loads(text)
    if ext in (".yaml", ".yml"):
        import yaml
        return yaml.safe_load(text)
    # dict-literal .txt — parsed, never executed.  literal_eval rejects
    # expressions like tuples with names; normalize by parsing with ast
    # and allowing only literals.
    return ast.literal_eval(text)


def apply_overrides(config, overrides):
    """overrides: list of 'dotted.key=value' strings; values parsed as
    Python literals when possible."""
    for item in overrides or []:
        key, _, raw = item.partition("=")
        try:
            value = ast.literal_eval(raw)
        except (ValueError, SyntaxError):
            value = raw
        node = config
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return config


def save_config(config, job_dir, name="job_config.json"):
    os.makedirs(job_dir, exist_ok=True)
    path = os.path.join(job_dir, name)

    def default(o):
        if isinstance(o, tuple):
            return list(o)
        return str(o)

    with open(path, "w") as f:
        json.dump(config, f, indent=4, default=default)
    return path
