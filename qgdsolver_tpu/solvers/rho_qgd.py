"""rhoQGDFoam — compressible QGD solver with arbitrary equation of state.

The reference README advertises rhoQGDFoam ("solver for compressible flows
with arbitrary equation of state at all Mach numbers"); its thermo layer
rhoQGDThermo/heRhoQGDThermo is in the snapshot
(heRhoQGDThermo_8C_source.html:39-136) and the flux stack is QGDFoam's.

Here the shared QGD step already takes any thermo exposing the uniform
interface (T_from_e / p_from_rho_T / rho_from_p_T / c_from_pT / mu / alphah),
so rhoQGDFoam is QGDFoam configured with a `RhoThermo` (pluggable EoS:
perfectGas, stiffenedGas, ... — physics/thermo.py).
"""
from __future__ import annotations

from .qgd import QGDFoam, State  # noqa: F401
from ..physics.thermo import RhoThermo


def RhoQGDFoam(*, thermo: RhoThermo, **kwargs) -> QGDFoam:
    """Build the arbitrary-EoS QGD solver (rhoQGDFoam equivalent)."""
    assert isinstance(thermo, RhoThermo)
    return QGDFoam(thermo=thermo, **kwargs)
