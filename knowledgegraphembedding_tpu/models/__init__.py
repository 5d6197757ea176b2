from . import kge, scorers  # noqa: F401
