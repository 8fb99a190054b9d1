from . import thermo, qgdcoeffs  # noqa: F401
