"""Mesh-quality screening — the selectBadCells utility equivalent.

The reference utility (utils/selectBadCells, selectBadCells_8C_source.html:
47-186) flags cells whose faces are near-parallel (badFaceAngle,
|n_i . n_k| >= faceCosine) and cells with aspectRatio > maxAspectRatio
(highAspectRatio), writing cellSets read from system/QGDCellQuality.

On a rectilinear block mesh face normals are axis-aligned (the angle
criterion is trivially satisfied between distinct axes and trivially violated
between opposite faces of the same axis — which the reference's
`i != k` face-pair loop deliberately includes only for faces sharing a
vertex; on bricks opposite faces share no vertex, so the angle check passes
by construction).  What remains meaningful are aspect ratio and expansion
(grading) ratio, both reported here as boolean cell masks — the "cellSet"
analogue.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.mesh import Mesh


@dataclasses.dataclass(frozen=True)
class CellQualityReport:
    high_aspect_ratio: np.ndarray  # bool mask, cells
    high_expansion: np.ndarray  # bool mask, cells
    max_aspect_ratio: float
    max_expansion: float

    @property
    def n_bad(self) -> int:
        return int(np.sum(self.high_aspect_ratio | self.high_expansion))


def select_bad_cells(mesh: Mesh, max_aspect_ratio: float = 100.0,
                     max_expansion: float = 3.0) -> CellQualityReport:
    """Screen the mesh (config mirror of system/QGDCellQuality:
    selectBadCells_8C:62-75 reads faceCosine/maxAspectRatio)."""
    nd = mesh.ndim
    dxs = [np.asarray(d) for d in mesh.dx]

    # aspect ratio: max over axis pairs of dx_a/dx_b per cell
    ar = np.ones(mesh.shape)
    for a in range(nd):
        for b in range(nd):
            if a == b:
                continue
            da = _bcast(dxs[a], a, nd)
            db = _bcast(dxs[b], b, nd)
            ar = np.maximum(ar, np.broadcast_to(da / db, mesh.shape))
    # expansion ratio: neighbour dx ratio along each axis
    ex = np.ones(mesh.shape)
    for a in range(nd):
        d = dxs[a]
        r = np.ones_like(d)
        if d.shape[0] > 1:
            r[1:] = np.maximum(d[1:] / d[:-1], d[:-1] / d[1:])
            r[0] = r[1]
        ex = np.maximum(ex, np.broadcast_to(_bcast(r, a, nd), mesh.shape))

    return CellQualityReport(
        high_aspect_ratio=ar > max_aspect_ratio,
        high_expansion=ex > max_expansion,
        max_aspect_ratio=float(ar.max()),
        max_expansion=float(ex.max()),
    )


def _bcast(arr, axis, nd):
    shape = [1] * nd
    shape[axis] = arr.shape[0]
    return arr.reshape(shape)
