from . import checkpoint, observability, badcells  # noqa: F401
