from . import foamdict, foam_case  # noqa: F401
