"""QHDDyMFoam — QHD on a moving mesh.

Re-design of reference QGDsolver/QHDDyMFoam (QHDDyMFoam_8C_source.html:
44-60 createDynamicFvMesh, :109-135 mesh.update() + fvc::makeRelative(phi,U)
+ mesh-Courant check).  The TPU-native structured-mesh counterpart supports
prescribed rigid mesh motion: the convective flux is made relative to the
mesh face flux and the Courant number uses the relative face speed.
(Deforming per-axis dilation is a planned extension of the same hook.)

Implemented as the shared QHD step with `mesh_velocity` set.
"""
from __future__ import annotations

from .qhd import QHDFoam, State  # noqa: F401


def QHDDyMFoam(*, mesh_velocity, **kwargs) -> QHDFoam:
    """mesh_velocity: callable t -> (ndim,) rigid mesh velocity."""
    return QHDFoam(mesh_velocity=mesh_velocity, **kwargs)
