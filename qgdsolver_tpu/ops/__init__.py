from . import fvsc  # noqa: F401
from .pad import ghost_pad  # noqa: F401
