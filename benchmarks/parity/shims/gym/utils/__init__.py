from gym.utils import seeding  # noqa: F401


class EzPickle:
    def __init__(self, *args, **kwargs):
        pass
