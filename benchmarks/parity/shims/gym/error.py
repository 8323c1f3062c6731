class Error(Exception):
    pass


class DependencyNotInstalled(Exception):
    pass
