"""mulesQHDFoam — QHD with MULES-bounded temperature transport.

Re-design of reference QGDsolver/mulesQHDFoam (mulesQHDFoam_8C_source.html:
85-155): the p/U sequence of QHDFoam with the T-equation replaced by
`MULES::explicitSolve` bounded advection (global gMax/gMin bounds) plus an
implicit diffusion correction (MULESTEqn_8H_source.html:41-64).

Implemented as the shared QHD step with t_equation="mules".
"""
from __future__ import annotations

from .qhd import QHDFoam, State  # noqa: F401


def MulesQHDFoam(**kwargs) -> QHDFoam:
    kwargs.setdefault("t_equation", "mules")
    return QHDFoam(**kwargs)
