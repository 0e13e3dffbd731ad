from .coop import CoOp  # noqa: F401 (registration side effects)
