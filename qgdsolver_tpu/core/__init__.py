from .mesh import Mesh  # noqa: F401
from . import bc  # noqa: F401
from .registry import register, create, available  # noqa: F401
