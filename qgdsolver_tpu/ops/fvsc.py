"""Face-centered differential operators ("fvsc" layer).

TPU-native re-design of the reference's fvsc library (reference QGD/fvsc/:
fvsc_8C.html:87-167 dispatch; leastSquaresStencil / GaussVolPointStencil /
reducedFaceNormalStencil implementations).  On a structured rectilinear mesh
the two full-stencil schemes (leastSquares, GaussVolPoint) coincide with the
tensor-product vertex reconstruction implemented here as `scheme="full"`;
`scheme="reduced"` is the face-normal-only operator (reference
reducedFaceNormalStencil_8C.html:53-108: grad f ~= nf * snGrad(f)).

All operators are pure slicing + multiply-add on ghost-padded arrays: XLA
fuses them into a handful of HBM passes, and under GSPMD sharding the shifted
slices lower to collective-permute halo exchanges.

Conventions
-----------
* Cell fields: trailing `mesh.ndim` axes are spatial; leading axes (vector /
  tensor components) are broadcast through untouched.
* Face fields: a tuple with one array per axis; along axis `a` the array has
  n_a+1 entries.
* Vector gradients follow OpenFOAM: (grad U)[i, j] = d U_j / d x_i.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.mesh import Mesh
from ..core import bc as bcm
from .pad import ghost_pad, trim_other_axes, _spatial_axis


# ---------------------------------------------------------------------------
# slicing helpers (trailing-axis indexing so leading component dims broadcast)
# ---------------------------------------------------------------------------

def _ax(arr, mesh_ndim, a):
    return _spatial_axis(arr.ndim, mesh_ndim, a)


def _sl(arr, axis, s):
    idx = [slice(None)] * arr.ndim
    idx[axis] = s
    return arr[tuple(idx)]


def _bcast_1d(vals, arr_ndim, axis, dtype):
    shape = [1] * arr_ndim
    shape[axis] = len(vals)
    return jnp.asarray(vals, dtype=dtype).reshape(shape)


def _interp_padded(fp, mesh: Mesh, a: int):
    """Linear interpolation along axis a of an array padded along a."""
    ax = _ax(fp, mesh.ndim, a)
    w = _bcast_1d(mesh.w_face[a], fp.ndim, ax, fp.dtype)
    return w * _sl(fp, ax, slice(0, -1)) + (1.0 - w) * _sl(fp, ax, slice(1, None))


def _sn_grad_padded(fp, mesh: Mesh, a: int):
    """Face-normal gradient along axis a of an array padded along a."""
    ax = _ax(fp, mesh.ndim, a)
    d = _bcast_1d(mesh.d_centers[a], fp.ndim, ax, fp.dtype)
    return (_sl(fp, ax, slice(1, None)) - _sl(fp, ax, slice(0, -1))) / d


def _tangential_deriv(fa, mesh: Mesh, b: int):
    """d/dx_b at a-face centers, from a-face values still padded along b.

    Two 1-D linear ops: interpolate the padded cell line to the b-vertices,
    then difference across each cell.  Exact for multilinear fields — the
    structured-mesh specialisation of the reference's extended vertex stencil
    (extendedFaceStencilScalarGrad / GaussVolPointBase tangential part).
    """
    ax = _ax(fa, mesh.ndim, b)
    wv = _bcast_1d(mesh.w_vertex[b], fa.ndim, ax, fa.dtype)
    v = wv * _sl(fa, ax, slice(0, -1)) + (1.0 - wv) * _sl(fa, ax, slice(1, None))
    dxb = _bcast_1d(mesh.dx[b], fa.ndim, ax, fa.dtype)
    return (_sl(v, ax, slice(1, None)) - _sl(v, ax, slice(0, -1))) / dxb


# ---------------------------------------------------------------------------
# public operators
# ---------------------------------------------------------------------------

def interpolate(field, bcs: bcm.FieldBCs, mesh: Mesh, t=0.0, vector=False):
    """qgdInterpolate: linear cell->face interpolation (reference
    QGDInterpolate_8H.html:38-67, default scheme = linear).

    Returns a face tuple; leading component axes of `field` pass through.
    """
    fp = ghost_pad(field, bcs, mesh, t=t, vector=vector)
    return interp_from_padded(fp, mesh)


def interp_from_padded(fp, mesh: Mesh):
    """Face interpolation of an already ghost-padded array (pad once, reuse
    for several operators — one HBM pass per primitive)."""
    out = []
    for a in range(mesh.ndim):
        fa = _interp_padded(fp, mesh, a)
        out.append(trim_other_axes(fa, mesh.ndim, a))
    return tuple(out)


def interp_axis_from_padded(fp, mesh: Mesh, a: int):
    """Face interpolation of a padded array to faces of a single axis."""
    return trim_other_axes(_interp_padded(fp, mesh, a), mesh.ndim, a)


def interpolate_padded(field, bcs: bcm.FieldBCs, mesh: Mesh, t=0.0, vector=False):
    """Like `interpolate` but keeps ghost layers on the non-face axes
    (needed when a tangential derivative of the result follows)."""
    fp = ghost_pad(field, bcs, mesh, t=t, vector=vector)
    return tuple(_interp_padded(fp, mesh, a) for a in range(mesh.ndim))


def grad(field, bcs: bcm.FieldBCs, mesh: Mesh, scheme="full", t=0.0, vector=False):
    """fvsc::grad — face-centered gradient.

    Scalar input (..., cells) -> per-axis arrays of shape (ndim, ..., faces_a):
    leading new axis = derivative direction i, value = d field / d x_i.

    Vector input (d, cells) [vector=True] -> per-axis (ndim, d, faces_a):
    G[i, j] = d U_j / d x_i (OpenFOAM convention).

    scheme: "full" (vertex tangential completion, == reference leastSquares /
    GaussVolPoint on bricks) or "reduced" (nf*snGrad only, reference
    reducedFaceNormalStencil).
    """
    fp = ghost_pad(field, bcs, mesh, t=t, vector=vector)
    return grad_from_padded(fp, mesh, scheme=scheme)


def scheme_for(spec, term: str) -> str:
    """Per-term fvsc scheme selection — the reference reads the fvSchemes
    `fvsc` sub-dict per operator name (`grad(p)`, `div(rhoU)`, ...) with a
    `default` fallback (fvsc_8C_source.html:47-58).  `spec` is either one
    scheme word applied to every term, or a dict keyed by term name with an
    optional "default" entry."""
    if isinstance(spec, str):
        return spec
    return spec.get(term, spec.get("default", "full"))


def normalize_scheme(scheme: str, ndim: int) -> str:
    """Map reference fvsc scheme names onto the structured-mesh kernels.

    On rectilinear bricks leastSquares / leastSquaresOpt / GaussVolPoint all
    coincide with the tensor-product vertex reconstruction ("full"); the
    reference forbids leastSquares[Opt] on 3D meshes (fvsc_8C:60-82) and the
    same guard is kept here for config parity."""
    aliases = {"leastSquares": "full", "leastSquaresOpt": "full",
               "GaussVolPoint": "full", "full": "full", "reduced": "reduced"}
    if scheme not in aliases:
        raise ValueError(f"unknown fvsc scheme {scheme!r}")
    if ndim == 3 and scheme in ("leastSquares", "leastSquaresOpt"):
        raise ValueError(
            "leastSquares fvsc schemes are forbidden on 3D meshes "
            "(reference fvsc_8C:60-82); use GaussVolPoint/full")
    return aliases[scheme]


def grad_from_padded(fp, mesh: Mesh, scheme="full"):
    """fvsc::grad of an already ghost-padded array (see `grad`)."""
    scheme = normalize_scheme(scheme, mesh.ndim)
    nd = mesh.ndim
    out = []
    for a in range(nd):
        comps = [None] * nd
        ga = _sn_grad_padded(fp, mesh, a)
        comps[a] = trim_other_axes(ga, nd, a)
        if scheme == "full" and nd > 1:
            fa = _interp_padded(fp, mesh, a)
            for b in range(nd):
                if b == a:
                    continue
                tb = _tangential_deriv(fa, mesh, b)
                # tb consumed the b-ghosts; trim remaining ghost axes (c != a, b)
                sl = [slice(None)] * tb.ndim
                for c in range(nd):
                    if c != a and c != b:
                        sl[_ax(tb, nd, c)] = slice(1, -1)
                comps[b] = tb[tuple(sl)]
        elif scheme == "reduced" or nd == 1:
            for b in range(nd):
                if b != a:
                    comps[b] = jnp.zeros_like(comps[a])
        else:
            raise ValueError(f"unknown fvsc scheme {scheme!r}")
        out.append(jnp.stack(comps, axis=0))
    return tuple(out)


def div_face(face_grad_tuple, mesh: Mesh):
    """fvsc::div(volVector)->surfaceScalar == trace of the face gradient
    (reference fvsc_8C.html div overloads)."""
    out = []
    for a, g in enumerate(face_grad_tuple):
        # g: (ndim, ndim_components, ..., faces); trace over (deriv, comp)
        tr = sum(g[i, i] for i in range(mesh.ndim))
        out.append(tr)
    return tuple(out)


def div_flux(phi_faces, mesh: Mesh):
    """Cell divergence of an area-included face flux: fvc::div(phi).

    phi_faces: per-axis arrays (..., n_a+1 along a), already multiplied by
    |S_f|.  Returns (..., cells) = sum_a diff_a(phi_a) / V.
    """
    nd = mesh.ndim
    vol = mesh.cell_volume
    tot = None
    for a, phi in enumerate(phi_faces):
        ax = _ax(phi, nd, a)
        d = _sl(phi, ax, slice(1, None)) - _sl(phi, ax, slice(0, -1))
        tot = d if tot is None else tot + d
    return tot / vol


def grad_cell(field, bcs: bcm.FieldBCs, mesh: Mesh, t=0.0):
    """fvc::grad — Gauss cell-centered gradient of a scalar:
    (1/V) sum_f S_f f_f; on rectilinear = diff(face interp)/dx per axis.
    Returns (ndim, ..., cells)."""
    return grad_cell_from_faces(interpolate(field, bcs, mesh, t=t), mesh)


def grad_cell_from_faces(faces, mesh: Mesh):
    """fvc::grad from already-interpolated face values — lets solvers
    reuse their padded interpolations (one fewer ghost_pad, hence one
    fewer halo exchange per step under spmd decomposition)."""
    nd = mesh.ndim
    comps = []
    for a in range(nd):
        fa = faces[a]
        ax = _ax(fa, nd, a)
        dxa = _bcast_1d(mesh.dx[a], fa.ndim, ax, fa.dtype)
        comps.append((_sl(fa, ax, slice(1, None)) - _sl(fa, ax, slice(0, -1))) / dxa)
    return jnp.stack(comps, axis=0)


def grad_cell_vector(U, bcs: bcm.FieldBCs, mesh: Mesh, t=0.0):
    """fvc::grad of a vector field -> cell tensor (ndim, d, cells),
    G[i, j] = d U_j / d x_i."""
    faces = interpolate(U, bcs, mesh, t=t, vector=True)
    nd = mesh.ndim
    rows = []
    for a in range(nd):
        fa = faces[a]
        ax = _ax(fa, nd, a)
        dxa = _bcast_1d(mesh.dx[a], fa.ndim, ax, fa.dtype)
        rows.append((_sl(fa, ax, slice(1, None)) - _sl(fa, ax, slice(0, -1))) / dxa)
    return jnp.stack(rows, axis=0)


def laplacian_explicit(gamma_faces, field, bcs: bcm.FieldBCs, mesh: Mesh, t=0.0,
                       vector=False):
    """fvc::laplacian(Gamma_f, x) = (1/V) sum_f Gamma_f |S_f| snGrad(x).

    gamma_faces: per-axis face arrays (or scalars) of the diffusivity.
    """
    fp = ghost_pad(field, bcs, mesh, t=t, vector=vector)
    nd = mesh.ndim
    tot = None
    for a in range(nd):
        g = _sn_grad_padded(fp, mesh, a)
        g = trim_other_axes(g, nd, a)
        flux = gamma_faces[a] * mesh.face_area(a) * g
        ax = _ax(flux, nd, a)
        d = _sl(flux, ax, slice(1, None)) - _sl(flux, ax, slice(0, -1))
        tot = d if tot is None else tot + d
    return tot / mesh.cell_volume


def sn_grad(field, bcs: bcm.FieldBCs, mesh: Mesh, t=0.0, vector=False):
    """Face-normal gradient per axis (face tuple)."""
    fp = ghost_pad(field, bcs, mesh, t=t, vector=vector)
    return sn_grad_from_padded(fp, mesh)


def sn_grad_from_padded(fp, mesh: Mesh):
    return tuple(
        trim_other_axes(_sn_grad_padded(fp, mesh, a), mesh.ndim, a)
        for a in range(mesh.ndim)
    )


def div_flux_cellvol(phi_faces, mesh: Mesh):
    """Like div_flux but without the 1/V factor (raw face-sum)."""
    nd = mesh.ndim
    tot = None
    for a, phi in enumerate(phi_faces):
        ax = _ax(phi, nd, a)
        d = _sl(phi, ax, slice(1, None)) - _sl(phi, ax, slice(0, -1))
        tot = d if tot is None else tot + d
    return tot
