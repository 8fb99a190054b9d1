"""SRFQHDFoam — QHD in a single rotating frame.

Re-design of reference QGDsolver/SRFQHDFoam (SRFQHDFoam_8C_source.html:61-129):
identical p/U/T sequence to QHDFoam solving the RELATIVE velocity Urel, with
the body force gaining the Coriolis term
    BdFrc = beta*T*g - 2*Omega x U
(SRFQHDFoam_2updateFields_8H:73; SRF model constructed in
SRFQHDFoam_2createFields_8H:35-38).  The centrifugal part is absorbed into
the reduced pressure, as in the reference's SRFModel usage.

Implementation: a thin configuration of the shared QHD step with `omega` set —
the reference reuses the very same QHDpEqn/QHDUEqn/QHDTEqn includes.
"""
from __future__ import annotations

from .qhd import QHDFoam, State  # noqa: F401 — re-export state type


def SRFQHDFoam(*, omega, **kwargs) -> QHDFoam:
    """Build the SRF solver: QHDFoam with rotation vector `omega` (3-tuple;
    in 2D only omega_z acts)."""
    return QHDFoam(omega=tuple(omega), **kwargs)
