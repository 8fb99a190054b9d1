"""Stairstep immersed solid regions — dead cells of L-shaped multi-block
meshes (backward-facing steps, cavities with obstacles).

The reference runs such geometries as unstructured meshes that simply omit
the solid cells; the structured-block design instead keeps the bounding
rectangle and marks blocked-out cells in `Mesh.solid`.  Wall behavior comes
from MIRROR GHOST filling: before each step, every solid cell adjacent to
fluid receives the no-slip mirror of its fluid neighbors (U <- -avg(U_nb),
zero-gradient scalars <- avg), so the shared face sees a zero face-normal
velocity and the wall pressure force — exactly the domain-boundary ghost
convention of ops.pad applied to interior stairstep walls.  Solid cells
average over ALL adjacent fluid neighbors, so convex stairstep corners are
first-order (the standard stairstep-IB compromise); cells deep inside the
solid keep their initial values and never influence the flow.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


class StairstepSolid:
    """Static neighbor stencils + mirror-fill over a boolean solid mask."""

    def __init__(self, solid):
        solid = np.asarray(solid, dtype=bool)
        self.solid = solid
        nd = solid.ndim
        fluid = ~solid
        self.nb = []  # (axis, shift, mask of solid cells with that fluid nb)
        cnt = np.zeros(solid.shape, dtype=np.int32)
        for a in range(nd):
            for s in (1, -1):
                nf = np.roll(fluid, -s, axis=a)
                edge = [slice(None)] * nd
                edge[a] = slice(-1, None) if s == 1 else slice(0, 1)
                nf[tuple(edge)] = False  # kill the wrapped entries
                m = nf & solid
                if m.any():
                    self.nb.append((a, s, m))
                cnt += m
        self.count = np.maximum(cnt, 1).astype(np.float64)
        self.boundary = (cnt > 0) & solid

    def mirror(self, f, sign: float = 1.0):
        """Solid boundary cells <- sign * avg(adjacent fluid values);
        sign=+1 is the zero-gradient mirror (scalars), sign=-1 the no-slip
        mirror (velocity components).  Non-boundary cells pass through."""
        acc = jnp.zeros_like(f)
        for a, s, m in self.nb:
            acc = acc + jnp.where(m, jnp.roll(f, -s, axis=a), 0.0)
        fill = (sign / self.count) * acc
        return jnp.where(self.boundary, fill.astype(f.dtype), f)

    def mirror_vector(self, U):
        """No-slip mirror of a (nd, *cells) velocity stack."""
        return jnp.stack([self.mirror(U[i], sign=-1.0)
                          for i in range(U.shape[0])])
