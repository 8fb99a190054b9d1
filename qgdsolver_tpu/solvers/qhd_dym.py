"""QHDDyMFoam — QHD on a moving/deforming mesh.

Re-design of reference QGDsolver/QHDDyMFoam (QHDDyMFoam_8C_source.html:
44-60 createDynamicFvMesh, :109-135 mesh.update() + fvc::makeRelative(phi,U)
+ mesh-Courant check).  The TPU-native structured-mesh counterpart supports
two prescribed motion classes:

* rigid translation (`mesh_velocity`: t -> (ndim,)) — the convective flux
  is made relative to the mesh face flux and the Courant number uses the
  relative face speed;
* per-axis dilation (`mesh_scale`: t -> (ndim,) scale factors, physical
  faces x_a(t) = s_a(t)*xi_a) — the step runs on the logical grid with
  metric factors on every operator, discrete-GCL-exact mesh face fluxes
  (Thomas-Lombard mixed-area weighting) and moving-volume ddt, so a uniform
  field on an oscillating-compression grid is preserved to solver tolerance
  (the space-conservation property of the reference's mesh.update() path).

Both may be combined.  Implemented as the shared QHD step with the motion
hooks set (solvers/qhd.py step: metric factors, phim assembly).
"""
from __future__ import annotations

from .qhd import QHDFoam, State  # noqa: F401


def QHDDyMFoam(*, mesh_velocity=None, mesh_scale=None, **kwargs) -> QHDFoam:
    """mesh_velocity: callable t -> (ndim,) rigid mesh velocity;
    mesh_scale: callable t -> (ndim,) per-axis dilation factors."""
    assert mesh_velocity is not None or mesh_scale is not None
    return QHDFoam(mesh_velocity=mesh_velocity, mesh_scale=mesh_scale,
                   **kwargs)
