def register(**kwargs):
    """No-op: parity envs are passed as instances, never via gym.make."""
