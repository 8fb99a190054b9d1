"""OpenFOAM mesh + field-file ingestion: blockMeshDict and `0/` directories.

Completes the end-to-end case path the reference gets from OpenFOAM's L0
substrate (SURVEY.md §2.5): every solver's createFields MUST_READs the
prognostic fields with their boundary dictionaries at startup (reference
QGDFoam_2createFields_8H orig. lines 3-35) and BC types dispatch from the
field files' `boundaryField` type words (qgdFluxFvPatchScalarField_8C etc.).

Scope — the structured-brick subset this framework targets:
  * blockMeshDict with ONE hex block, optional simpleGrading (geometric
    per-axis expansion), named boundary patches; `empty` patches collapse the
    normal axis (OpenFOAM's 2D convention) so a 2D case yields a 2D Mesh.
  * `0/<field>` files: `internalField uniform ...` or
    `nonuniform List<...> (...)` (OpenFOAM cell ordering: x fastest), and
    `boundaryField` entries mapped onto (axis, side) through the
    blockMeshDict patch planes.

BC type words resolve through the same `core.registry` "bc" table the JSON
config path uses, so qgdFlux/qhdFlux/cosVelocity/inletOutlet all work from
field dictionaries exactly as in the reference.
"""
from __future__ import annotations

import os

import numpy as np

from . import foamdict
from ..core.mesh import Mesh
from ..core import bc as bcm
from ..core import config as _config  # noqa: F401 — registers the BC words
from ..core.registry import create


# ---------------------------------------------------------------------------
# blockMeshDict -> Mesh
# ---------------------------------------------------------------------------


def _graded_faces(x0, x1, n, ratio):
    """Face coordinates for n cells over [x0, x1] with simpleGrading `ratio`
    (OpenFOAM: size(last cell)/size(first cell); geometric progression)."""
    if n == 1 or abs(ratio - 1.0) < 1e-12:
        return np.linspace(x0, x1, n + 1, dtype=np.float64)
    k = ratio ** (1.0 / (n - 1))  # adjacent-cell size ratio
    first = (x1 - x0) * (1.0 - k) / (1.0 - k**n)
    sizes = first * k ** np.arange(n)
    return x0 + np.concatenate([[0.0], np.cumsum(sizes)])


def _as_float_list(v):
    return [float(x) for x in v]


def parse_block_mesh(bmd: dict):
    """blockMeshDict dict -> (Mesh, patch_map, kept_axes).

    patch_map: {patch_name: (type, ((mesh_axis, side), ...), ranges)} for
    the non-collapsed axes, where `ranges[(mesh_axis, side)]` holds the
    patch's tangential cell-index rectangles on that plane (split-side
    patch support); kept_axes: the original xyz axes retained in the Mesh
    (2D cases drop the `empty`-patch axis).
    """
    scale = float(bmd.get("convertToMeters", bmd.get("scale", 1.0)) or 1.0)
    verts = [np.asarray(_as_float_list(v)) * scale for v in bmd["vertices"]]

    blocks = bmd["blocks"]
    # tokens: repeated [hex (v0..v7) (nx ny nz) [simpleGrading (gx gy gz)]]
    if not isinstance(blocks, list) or "hex" not in blocks:
        raise ValueError("blockMeshDict has no hex blocks")
    specs = []  # (hex_verts, counts, grading) per block
    i = 0
    while i < len(blocks):
        if blocks[i] != "hex":
            i += 1
            continue
        hex_verts = [int(j) for j in blocks[i + 1]]
        counts = [int(n) for n in blocks[i + 2]]
        grading = [1.0, 1.0, 1.0]
        j = i + 3
        while j < len(blocks) and not isinstance(blocks[j], list) \
                and blocks[j] != "hex":
            if blocks[j] in ("simpleGrading", "edgeGrading"):
                g = blocks[j + 1]
                if blocks[j] == "edgeGrading":
                    # per-edge grading: first edge of each axis group
                    grading = [float(g[0]), float(g[4]), float(g[8])]
                else:
                    grading = [float(x) for x in g]
                j += 2
            else:
                j += 1
        specs.append((hex_verts, counts, grading))
        i = j
    hex_verts, counts, grading = specs[0]

    # boundary patches -> (axis, side) by the constant-coordinate plane
    patch_entries = bmd.get("boundary", [])
    # parser emits [name, {..}, name, {..}] or [[name, {...}], ...]
    pairs = []
    i = 0
    while i < len(patch_entries):
        e = patch_entries[i]
        if isinstance(e, str) and i + 1 < len(patch_entries) and \
                isinstance(patch_entries[i + 1], dict):
            pairs.append((e, patch_entries[i + 1]))
            i += 2
        elif isinstance(e, list) and len(e) == 2:
            pairs.append((e[0], e[1]))
            i += 1
        else:
            i += 1

    # wedge (axisymmetric) detection: a one-cell sector about the x axis
    # with vertices rotated +-theta/2.  Unroll to the (x, r) half-plane:
    # r = hypot(y, z); the swept axis (z) collapses like an `empty` pair and
    # the result is an AxisymmetricMesh with r-weighted metrics (the
    # reference runs wedges through OpenFOAM's own mesh geometry,
    # fvsc_8C_source.html:60-82 guards only GaussVolPoint against them).
    wedge = any(e.get("type") == "wedge" for _, e in pairs)
    if wedge:
        verts = [np.asarray([v[0], float(np.hypot(v[1], v[2])), 0.0])
                 for v in verts]

    # per-block brick validation + extents
    block_ext = []  # (lo3, hi3, counts, grading) per block
    for hv, cnt, grd in specs:
        vs = np.stack([verts[i] for i in hv])  # (8, 3)
        blo, bhi = vs.min(axis=0), vs.max(axis=0)
        for ax in range(3):
            vals = np.unique(np.round(vs[:, ax], 12))
            if len(vals) != 2 and not (wedge and ax == 2 and len(vals) == 1):
                raise ValueError(
                    "blockMeshDict hex is not an axis-aligned brick "
                    f"(axis {ax} vertex coords {vals})")
        block_ext.append((blo, bhi, cnt, grd))
    lo = np.min([b[0] for b in block_ext], axis=0)
    hi = np.max([b[1] for b in block_ext], axis=0)

    # multi-block rectilinear composition: per axis, the union splits into
    # segments at the block extents; every block covering a segment must
    # subdivide it identically, and every (seg_x, seg_y, seg_z) cell of the
    # segment grid must be covered by exactly one block (no dead cells:
    # L-shaped unions are not supported by the un-masked solvers)
    multi = len(block_ext) > 1
    seg_pts = []
    seg_faces = []  # per axis: list of per-segment face arrays
    seg_counts = []
    tol = 1e-12 + 1e-9 * np.max(np.abs(hi - lo))

    def _seg_index(pts, v):
        k = int(np.argmin(np.abs(pts - v)))
        if abs(pts[k] - v) > tol:
            raise ValueError(
                "multi-block blockMeshDict: block extents do not tile "
                f"(coordinate {v} not on the segment grid {pts})")
        return k

    for ax in range(3):
        pts = np.unique(np.round(
            [b[0][ax] for b in block_ext] + [b[1][ax] for b in block_ext],
            12))
        seg_pts.append(pts)
        faces_ax = [None] * (len(pts) - 1)
        counts_ax = [None] * (len(pts) - 1)
        for blo, bhi, cnt, grd in block_ext:
            if wedge and ax == 2:
                continue  # collapsed swept axis: no face grid
            k0 = _seg_index(pts, blo[ax])
            k1 = _seg_index(pts, bhi[ax])
            if k1 - k0 != 1:
                raise ValueError(
                    "multi-block blockMeshDict: a block spans several "
                    f"segments on axis {ax}; split it at the shared planes")
            f = _graded_faces(blo[ax], bhi[ax], cnt[ax], grd[ax])
            if faces_ax[k0] is None:
                faces_ax[k0] = f
                counts_ax[k0] = cnt[ax]
            elif (counts_ax[k0] != cnt[ax]
                  or not np.allclose(faces_ax[k0], f, atol=tol)):
                raise ValueError(
                    "multi-block blockMeshDict: blocks sharing axis-"
                    f"{ax} segment [{pts[k0]}, {pts[k0 + 1]}] disagree on "
                    "its subdivision")
        if any(f is None for f in faces_ax):
            raise ValueError(
                f"multi-block blockMeshDict: axis-{ax} segment grid has "
                "uncovered intervals")
        seg_faces.append(faces_ax)
        seg_counts.append(counts_ax)

    solid = None
    if multi:
        # coverage over the segment grid; uncovered segments become the
        # dead-cell (solid) mask — L-shaped unions (backward-facing steps)
        # run as stairstep immersed walls (core.solid.StairstepSolid)
        # wedge: the swept axis collapses to zero segments, which would make
        # `covered` empty and silence both guards below — clamp it to one
        # segment so overlap/dead-cell detection works on the kept axes
        nseg = [max(len(p) - 1, 1) for p in seg_pts]
        covered = np.zeros(nseg, dtype=int)
        for blo, bhi, cnt, grd in block_ext:
            idx = []
            for ax in range(3):
                if wedge and ax == 2:
                    idx.append(slice(0, 1))
                    continue
                k0 = _seg_index(seg_pts[ax], blo[ax])
                k1 = max(_seg_index(seg_pts[ax], bhi[ax]), k0 + 1)
                idx.append(slice(k0, k1))
            covered[tuple(idx)] += 1
        if (covered > 1).any():
            raise ValueError("multi-block blockMeshDict: blocks overlap")
        if (covered == 0).any():
            if wedge:
                raise NotImplementedError(
                    "dead-cell regions on wedge meshes are not supported")
            dead3 = covered == 0
            for ax in range(3):
                reps = np.asarray(seg_counts[ax], dtype=int)
                dead3 = np.repeat(dead3, reps, axis=ax)
            solid = dead3
        counts = [int(sum(c)) if c else 1 for c in seg_counts]

    empty_axes = set()
    raw_patch_plane = {}
    raw_rects = {}  # name -> {(ax, side): [ {global axis b: (lo, hi)} ]}
    for name, entry in pairs:
        ptype = entry.get("type", "patch")
        faces = entry.get("faces", [])
        if faces and not isinstance(faces[0], list):
            faces = [faces]
        axes_sides = set()
        rects = {}
        for quad in faces:
            pts = np.stack([verts[int(i)] for i in quad])
            for ax in range(3):
                if np.ptp(pts[:, ax]) < 1e-9:
                    key = None
                    if abs(pts[0, ax] - hi[ax]) < 1e-9:
                        key = (ax, 1)
                    elif abs(pts[0, ax] - lo[ax]) < 1e-9:
                        key = (ax, 0)
                    # else: a face on an INTERNAL plane — a wall of a
                    # dead-cell region; the stairstep solid mask supplies
                    # the wall behavior, no (axis, side) BC slot exists
                    if key is not None:
                        axes_sides.add(key)
                        # the quad's tangential coordinate extents — the
                        # face rectangle this patch owns on the side plane
                        # (split-side patch support)
                        rects.setdefault(key, []).append({
                            b: (float(pts[:, b].min()),
                                float(pts[:, b].max()))
                            for b in range(3) if b != ax
                        })
                    break
            else:
                raise ValueError(f"patch {name}: face {quad} is not axis-aligned")
        raw_patch_plane[name] = (ptype, axes_sides)
        raw_rects[name] = rects
        if ptype == "empty" and not wedge:
            empty_axes.update(ax for ax, _ in axes_sides)
        # wedge meshes: ONLY the swept axis collapses (added below); an
        # `empty`-typed axis patch at r=0 must not eat the radial axis
    if wedge:
        # both unrolled wedge planes land on z=0; the swept axis collapses
        empty_axes.add(2)
        if 0 in empty_axes or 1 in empty_axes:
            raise ValueError("wedge mesh must sweep about the x axis with "
                             "the radius along y")

    kept_axes = [ax for ax in range(3) if counts[ax] > 0 and ax not in empty_axes]
    # OpenFOAM 2D: the empty axis has one cell
    for ax in empty_axes:
        if counts[ax] != 1:
            raise ValueError(f"empty axis {ax} must have 1 cell, got {counts[ax]}")

    def _axis_faces(ax):
        parts = [seg_faces[ax][0]]
        for f in seg_faces[ax][1:]:
            parts.append(f[1:])
        return np.concatenate(parts)

    x_faces = tuple(_axis_faces(ax) for ax in kept_axes)
    if wedge:
        from ..core.mesh import AxisymmetricMesh

        assert tuple(kept_axes) == (0, 1)
        mesh = AxisymmetricMesh(x_faces=x_faces)
    else:
        solid_kept = (_squeeze_to(solid, kept_axes)
                      if solid is not None else None)
        mesh = Mesh(x_faces=x_faces, solid=solid_kept)

    axis_of = {ax: i for i, ax in enumerate(kept_axes)}

    def _cell_index(mesh_axis, coord):
        faces = np.asarray(mesh.x_faces[mesh_axis], dtype=float)
        k = int(np.argmin(np.abs(faces - coord)))
        if abs(faces[k] - coord) > tol:
            raise ValueError(
                f"patch rectangle coordinate {coord} is not on the axis-"
                f"{mesh_axis} face grid")
        return k

    patch_map = {}
    for name, (ptype, axes_sides) in raw_patch_plane.items():
        if ptype == "empty" or ptype == "wedge":
            continue
        mapped = {(axis_of[ax], side) for ax, side in axes_sides
                  if ax in axis_of}
        if not mapped:
            continue
        # tangential cell-index rectangles per mapped side, for split-side
        # (Segmented) BC assembly: rect = ((lo, hi) half-open cell ranges)
        # per tangential KEPT axis in ascending mesh-axis order
        ranges = {}
        for ax, side in axes_sides:
            if ax not in axis_of:
                continue
            ma = axis_of[ax]
            rect_list = []
            for rc in raw_rects[name].get((ax, side), []):
                rect = []
                for b in sorted(axis_of):
                    if b == ax:
                        continue
                    mb = axis_of[b]
                    if b in rc:
                        lo_c, hi_c = rc[b]
                        rect.append((_cell_index(mb, lo_c),
                                     _cell_index(mb, hi_c)))
                    else:  # degenerate quad info: cover the full axis
                        rect.append((0, mesh.shape[mb]))
                rect_list.append(tuple(rect))
            ranges[(ma, side)] = tuple(rect_list)
        patch_map[name] = (ptype, tuple(sorted(mapped)), ranges)
    return mesh, patch_map, tuple(kept_axes)


def load_block_mesh(case_dir: str):
    """Read system/blockMeshDict (or constant/polyMesh/blockMeshDict)."""
    for rel in ("system/blockMeshDict", "constant/polyMesh/blockMeshDict"):
        p = os.path.join(case_dir, rel)
        if os.path.exists(p):
            return parse_block_mesh(foamdict.parse_file(p))
    raise FileNotFoundError(f"no blockMeshDict under {case_dir}")


# ---------------------------------------------------------------------------
# 0/<field> files
# ---------------------------------------------------------------------------


def _uniform_value(tokens, kept_axes=None, vector=False):
    """`uniform 300` / `uniform (1 2 3)` token list -> scalar or component
    list (vector components restricted to the kept axes)."""
    if isinstance(tokens, list) and tokens and tokens[0] == "uniform":
        v = tokens[1]
    else:
        v = tokens
    if isinstance(v, list):
        if vector and kept_axes is not None:
            return [float(v[ax]) for ax in kept_axes]
        return [float(x) for x in v]
    return float(v)


def _internal_field(tokens, mesh: Mesh, kept_axes, counts3, vector):
    """internalField entry -> ndarray over mesh.shape (leading component axis
    for vectors).  Handles `uniform ...` and `nonuniform List<T> n (...)`
    with OpenFOAM cell ordering (x fastest, then y, then z)."""
    nd = mesh.ndim
    if isinstance(tokens, list) and tokens and tokens[0] == "nonuniform":
        vals = tokens[-1]  # the parenthesised list
        arr = np.asarray(vals, dtype=np.float64)
        if vector:
            # (ncells, 3) in x-fastest order
            comps = []
            for ax in kept_axes:
                comp = arr[:, ax].reshape(tuple(counts3), order="F")
                comps.append(_squeeze_to(comp, kept_axes))
            return np.stack(comps, axis=0)
        full = arr.reshape(tuple(counts3), order="F")
        return _squeeze_to(full, kept_axes)
    v = _uniform_value(tokens, kept_axes, vector)
    if vector:
        return np.stack([np.full(mesh.shape, c) for c in v], axis=0)
    return np.full(mesh.shape, v)


def _squeeze_to(arr3, kept_axes):
    """Drop the collapsed (empty) axes of a (nx, ny, nz) array."""
    drop = tuple(ax for ax in range(3) if ax not in kept_axes)
    return np.squeeze(arr3, axis=drop) if drop else arr3


def _bc_from_entry(entry: dict, ndim: int, kept_axes, vector: bool) -> bcm.BC:
    """boundaryField patch entry -> BC via the registry (field-file `type`
    word dispatch, the OpenFOAM fvPatchField RTS equivalent)."""
    word = entry.get("type", "zeroGradient")
    if isinstance(word, list):
        word = word[0]
    kw = {"ndim": ndim}
    if "value" in entry:
        kw["value"] = _uniform_value(entry["value"], kept_axes, vector)
    if "inletValue" in entry:
        kw["inletValue"] = _uniform_value(entry["inletValue"], kept_axes, vector)
    if "gradient" in entry:
        kw["gradient"] = _uniform_value(entry["gradient"], kept_axes, vector)
    for extra in ("amplitude", "omega0", "phi0", "height", "fieldInf",
                  "lInf"):
        if extra in entry:
            kw[extra] = float(entry[extra])
    word_map = {
        "empty": "zeroGradient",
        "calculated": "zeroGradient",
        "symmetryPlane": "symmetry",
        # contact-angle alpha BCs: the FIELD behaves as zeroGradient; the
        # angle itself is extracted by foam_case._read_contact_angles and
        # applied through qInterfaceProperties' correction
        "constantAlphaContactAngle": "zeroGradient",
        "dynamicAlphaContactAngle": "zeroGradient",
    }
    word = word_map.get(str(word), str(word))
    try:
        return create("bc", word, **kw)
    except KeyError:
        raise ValueError(f"unsupported boundary type word {word!r}")


def _bc_equal(a, b) -> bool:
    """Equality of two parsed BCs, tolerant of array-valued fields (whose
    dataclass __eq__ would raise on ambiguous elementwise comparison)."""
    if type(a) is not type(b):
        return False
    try:
        return bool(a == b)
    except Exception:  # noqa: BLE001 — array-valued specs
        return repr(a) == repr(b)


def parse_field_file(path: str, mesh: Mesh, patch_map, kept_axes,
                     counts3=None, default_bc=None):
    """0/<field> file -> (internal ndarray, FieldBCs).

    The field class word (volScalarField / volVectorField) decides vector
    handling; vector components are restricted to the kept mesh axes.
    """
    d = foamdict.parse_file(path)
    cls = str(d.get("FoamFile", {}).get("class", "volScalarField"))
    vector = "Vector" in cls
    nd = mesh.ndim
    if counts3 is None:
        counts3 = [1, 1, 1]
        for i, ax in enumerate(kept_axes):
            counts3[ax] = mesh.shape[i]

    internal = _internal_field(d.get("internalField", 0.0), mesh, kept_axes,
                               counts3, vector)

    default = default_bc or bcm.ZeroGradient()
    rows = [[default, default] for _ in range(nd)]
    # claims[axis][side] = ordered [(patch name, bc, rects)]
    claims = [[[], []] for _ in range(nd)]
    bfield = d.get("boundaryField", {})
    for name, entry in bfield.items():
        if name not in patch_map:
            continue
        ptype, sides = patch_map[name][:2]
        ranges = patch_map[name][2] if len(patch_map[name]) > 2 else {}
        if not isinstance(entry, dict):
            continue
        bc = _bc_from_entry(entry, nd, kept_axes, vector)
        for axis, side in sides:
            claims[axis][side].append(
                (name, bc, ranges.get((axis, side), ())))
    for axis in range(nd):
        for side in (0, 1):
            cl = claims[axis][side]
            if not cl:
                continue
            if len(cl) == 1 or all(_bc_equal(cl[0][1], b) for _, b, _ in cl):
                rows[axis][side] = cl[0][1]
                continue
            # split side: several patches with DIFFERENT BCs share this
            # plane -> a Segmented BC over their face rectangles
            # (reference: per-patch boundary handling,
            # extendedFaceStencilScalarGrad_8C_source.html:86-109)
            _validate_side_coverage(cl, axis, mesh, path)
            for nm, b, _ in cl:
                if isinstance(b, (bcm.QGDFluxP, bcm.QHDFluxP)):
                    raise NotImplementedError(
                        f"patch {nm!r}: qgdFlux/qhdFlux inside a split "
                        f"side (axis {axis}, side {side}) of {path} is "
                        "not supported (the lagged-gradient state is "
                        "whole-side)")
            rows[axis][side] = bcm.Segmented(
                tuple((rects, b) for _, b, rects in cl))
    # cyclic patches declared in blockMeshDict apply even if boundaryField
    # names them with type cyclic
    for name, val in patch_map.items():
        ptype, sides = val[:2]
        if ptype == "cyclic":
            for axis, side in sides:
                rows[axis][side] = bcm.Periodic()
    return internal, bcm.FieldBCs(tuple(tuple(r) for r in rows))


def _validate_side_coverage(claims, axis, mesh, path):
    """Every tangential cell of the side must be covered exactly once by
    the claiming patches' rectangles (OpenFOAM guarantees disjoint
    patches; holes would silently take another patch's ghost value)."""
    tang = [b for b in range(mesh.ndim) if b != axis]
    shape = tuple(mesh.shape[b] for b in tang)
    cover = np.zeros(shape, dtype=int)
    for name, _, rects in claims:
        if not rects:
            raise ValueError(
                f"patch {name!r} claims a split side of {path} but has no "
                "face rectangles (blockMeshDict boundary faces missing)")
        for rect in rects:
            sl = tuple(slice(lo, hi) for lo, hi in rect)
            cover[sl] += 1
    if (cover == 0).any():
        raise ValueError(
            f"split side (axis {axis}) of {path}: boundary cells "
            f"{np.argwhere(cover == 0)[:5].tolist()} are covered by no "
            "patch")
    if (cover > 1).any():
        raise ValueError(
            f"split side (axis {axis}) of {path}: boundary cells "
            f"{np.argwhere(cover > 1)[:5].tolist()} are claimed by "
            "several patches")


def load_initial_fields(case_dir: str, mesh: Mesh, patch_map, kept_axes,
                        time_name: str = "0"):
    """Read every field file in `<case>/<time_name>/` ->
    {name: (array, FieldBCs)}."""
    tdir = os.path.join(case_dir, time_name)
    out = {}
    if not os.path.isdir(tdir):
        return out
    counts3 = [1, 1, 1]
    for i, ax in enumerate(kept_axes):
        counts3[ax] = mesh.shape[i]
    for fn in sorted(os.listdir(tdir)):
        p = os.path.join(tdir, fn)
        if not os.path.isfile(p) or fn.startswith("."):
            continue
        try:
            out[fn] = parse_field_file(p, mesh, patch_map, kept_axes, counts3)
        except Exception as e:
            raise ValueError(f"failed to parse field file {p}: {e}") from e
    return out
