"""Fused single-pass Pallas TPU kernel for the 2D explicit QGDFoam step.

Motivation (measured on the bench chip, a v5p-class part: ~2.7 TB/s HBM,
~120 MB usable VMEM): the composable XLA step materialises every intermediate
face field — ~1600 bytes of HBM traffic per grid point per step — and runs at
~96% of HBM bandwidth, i.e. it is purely memory-bound on materialisation
traffic.  The physics needs only the 4 primitive fields in and 4 out
(~50 B/point), so a fused kernel has ~10x headroom.

Design
------
State carried across steps = the GHOST-PADDED primitive fields (p, T, Ux, Uy),
each stored (nx+2, Wp) where Wp = ny+2 rounded up to a multiple of 128 (TPU
lane tiling; tail columns are dead lanes).  The whole-field step runs as ONE
single-program pallas_call with every field resident in VMEM (the bench field
set is ~10 MB, far under the ~120 MB VMEM of this part):

  1. XLA pre-pass (fuses into ~4 HBM read passes, no materialisation):
     acoustic Courant number + min face tau -> new dt (reference
     QGDCourantNo.H + setDeltaT-QGDQHD.H semantics, identical to the
     composable path).
  2. pallas kernel, entirely in VMEM/VPU registers:
     primitives -> thermo (rho, e, c, H) -> tau coefficients
     (constScPrModel1 family) -> face interpolations -> fvsc "full" vertex
     gradients -> QGD fluxes (jm, Pi, q — reference
     QGDFoam_2updateFluxes_8H:41-139) -> explicit rho/rhoU/rhoE update
     (QGDRhoEqn/QGDUEqn/QGDEEqn) -> new primitives -> boundary-condition
     ghost layers (sequential-axis pad semantics identical to ops.pad).

Mosaic restricts lane/sublane repositioning (slices and concats must respect
the (8, 128) tile), so ALL neighbour access is expressed as full-frame
rotations (pltpu.roll) and ghost/edge handling as iota masks — every array in
the kernel keeps the full (nx+2, Wp) frame, and face/cell indexing is a
convention on which rows/lanes are live:
  * x-faces: face r+1/2 lives at row r (rows 0..nx live);
  * y-faces: face s+1/2 lives at lane s (lanes 0..M live);
  * cells:   cell (r, s) lives at row r+1, lane s+1.

HBM traffic per step: 4 reads (pre-pass) + 4 reads + 4 writes (kernel
pipeline) ~= 50 B/point — ~8x less than the composable path, leaving the step
VPU-bound.  Numerics are IDENTICAL op-for-op (same formulas, same association
order) up to f32 non-associativity of XLA vs Mosaic scheduling.

Restrictions (checked in `supported()`): 2D uniform planar mesh, f32,
PerfectGasThermo, ConstScPrModel1-family or varScModel5 tau model, explicit
diffusion, the `full` vertex stencil for every gradient term, BC types
{FixedValue (static value), ZeroGradient, FixedGradient (static), Symmetry,
Extrapolated, InletOutlet (in-kernel flux switch), axis-0 qgdFlux p-BC},
and a frame set inside the measured VMEM live-set budget (larger grids take
the HBM-tiled slab pipeline).  Everything else falls back to the composable
step.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import bc as bcm
from ..ops import fvsc
from ..physics.thermo import PerfectGasThermo, ConstTransport
from ..physics.qgdcoeffs import ConstScPrModel1, VarScModel5
from ..solvers import common

LANE = 128


class FusedState(tp.NamedTuple):
    """Scan carry of the fused step: ghost-padded primitives + time state.

    Arrays are (nx+2, Wp); columns [0, ny+2) are live (ghost, cells, ghost),
    the rest dead lane-padding.
    """

    p: jax.Array
    T: jax.Array
    ux: jax.Array
    uy: jax.Array
    t: jax.Array
    dt: jax.Array
    # varScModel5 only: the carried ScQGD sensor frame (same layout); None
    # for constScPr configs (static pytree hole)
    sc: tp.Any = None


# ---------------------------------------------------------------------------
# capability check
# ---------------------------------------------------------------------------

_SIMPLE_BCS = (bcm.FixedValue, bcm.ZeroGradient, bcm.FixedGradient,
               bcm.Symmetry, bcm.Extrapolated, bcm.InletOutlet)


def _n_state(solver) -> int:
    """Carried kernel input frames: 4 primitives (+ the varScModel5 sensor)."""
    return 5 if isinstance(solver.tau_model, VarScModel5) else 4


# Straight-line whole-frame kernel live set, MEASURED on the bench chip (r3
# compile smoke): the untransposed 1024x512 build OOMs requesting 126.9 MB
# = ~48.1 sublane-padded f32[1032, 640] frames, while the transposed build
# (~115 MB) compiles.  49 frames (+3 for the varsc variant's sensor/csm
# extras) against a 119 MB budget keeps margin without demoting the
# production transposed 1024x512 primary off the whole-frame path.
WHOLE_LIVE_FRAMES = 49
WHOLE_LIVE_FRAMES_VARSC = 52
VMEM_WHOLE_BUDGET = 119 * 1024 * 1024


def fits_vmem(nx: int, ny: int, n_state: int = 4) -> bool:
    """Whole-frame kernel VMEM feasibility: peak live set = ~49 frame-sized
    temporaries of the straight-line Mosaic program (NOT just the
    n_state+4 in/out fields — the r2 mistake).  Infeasible grids use the
    HBM-tiled slab pipeline (build_tiled_fused_step) instead."""
    rows = -(-(nx + 2) // 8) * 8
    wp = max(LANE, -(-(ny + 2) // LANE) * LANE)
    live = WHOLE_LIVE_FRAMES_VARSC if n_state > 4 else WHOLE_LIVE_FRAMES
    return live * rows * wp * 4 <= VMEM_WHOLE_BUDGET


def whole_frame_viable(solver) -> bool:
    """True if build_fused_step yields a whole-frame kernel for this config
    in SOME orientation — native, or the auto-layout transpose (the
    production 1024x512 jet fits ONLY transposed: 115 MB vs 127 MB)."""
    nx, ny = solver.mesh.shape
    ns = _n_state(solver)
    if fits_vmem(nx, ny, n_state=ns):
        return True
    if (_frame_elems(ny, nx) < _frame_elems(nx, ny)
            and fits_vmem(ny, nx, n_state=ns)):
        alt = _transposed_solver(solver)
        return alt is not None and supported(alt)
    return False


def supported(solver, sharded: bool = False) -> bool:
    """True if this solver config can run on the fused kernel.

    sharded=True answers for the shard_map wrapper
    (build_sharded_fused_step), which covers the full fused config space —
    including the FLAGSHIP varScModel5 + qgdFlux (sensor pre-pass under the
    spmd context, in-kernel flux rows on the owning edge shard); per-shard
    VMEM feasibility is asserted at build time against the local block.
    """
    from ..solvers.qgd import QGDFoam

    if type(solver) is not QGDFoam:
        return False
    mesh = solver.mesh
    if mesh.ndim != 2:
        return False
    if getattr(mesh, "axisymmetric", False):
        return False  # hoop sources + r-weighted metrics: composable only
    if getattr(mesh, "solid", None) is not None:
        return False  # stairstep solid masks: composable only
    if np.dtype(mesh.dtype) != np.float32:
        return False
    for a in range(2):
        d = mesh.dx[a]
        if not np.allclose(d, d[0]):
            return False
    nx, ny = mesh.shape
    if not isinstance(solver.thermo, PerfectGasThermo):
        return False
    tm = solver.tau_model
    if isinstance(tm, VarScModel5):
        if tm.const_sc_mask is not None:
            return False
    elif not isinstance(tm, ConstScPrModel1):
        return False
    if solver.implicit_diffusion:
        return False
    if (getattr(solver, "qgdflux_limit", None) is not None
            or getattr(solver, "qgdflux_relax", 1.0) != 1.0):
        return False  # qgdFlux limiter/relaxation: composable only
    for term in ("grad(U)", "grad(e)", "grad(rho)", "grad(p)"):
        if fvsc.scheme_for(solver.fvsc_scheme, term) != "full":
            return False
    # qgdFlux p-BC: supported on axis-0 sides (the lagged dp/dn is computed
    # in-kernel from this step's phiwStar/tau_f boundary rows)
    if any(a != 0 for a, _ in solver._flux_sides()):
        return False
    for bcs in solver._bcs():
        for a in range(2):
            for side in (0, 1):
                b = bcs[a, side]
                if isinstance(b, bcm.QGDFluxP):
                    continue
                if not isinstance(b, _SIMPLE_BCS):
                    return False
                raw = (b.value if isinstance(b, bcm.FixedValue)
                       else b.grad if isinstance(b, bcm.FixedGradient)
                       else b.inlet_value if isinstance(b, bcm.InletOutlet)
                       else None)
                if raw is not None and not _value_is_static(raw, mesh, a,
                                                            side):
                    return False  # time-dependent BC: composable only
    # sharded=True: per-shard VMEM feasibility is checked by
    # build_sharded_fused_step against the LOCAL block dims (the global
    # frame never materialises); varScModel5 runs its sensor pre-pass
    # inside the shard body under the spmd context, and qgdFlux rows are
    # computed in-kernel on the owning edge shard — no extra restriction
    return True


# ---------------------------------------------------------------------------
# BC spec compilation (static, evaluated at build time)
# ---------------------------------------------------------------------------


def _eval_static_value(v, mesh, a, side, vector_comp=None, t=0.0):
    """Evaluate a BC value/gradient spec to a static numpy array over the
    ghost layer (mirrors pad._layer_coords; time-DEPENDENT callables are
    rejected by `supported()` via `_value_is_static`, so evaluating at one
    time is exact for the callables that reach the kernel build)."""
    if callable(v):
        nd = mesh.ndim
        coords = []
        for b in range(nd):
            if b == a:
                c = jnp.asarray(mesh.x_faces[a][0 if side == 0 else -1],
                                dtype=mesh.dtype).reshape((1,) * nd)
            else:
                vals = mesh.centers[b]
                shape = [1] * nd
                shape[b] = len(vals)
                c = jnp.asarray(vals, dtype=mesh.dtype).reshape(shape)
            coords.append(c)
        out = np.asarray(v(t, tuple(coords)))
        if vector_comp is not None:
            out = out[vector_comp]
        return out.astype(mesh.dtype)
    v = np.asarray(v, dtype=mesh.dtype)
    if vector_comp is not None and v.ndim >= 1 and v.shape[0] == mesh.ndim:
        v = v[vector_comp]
    return v


def _value_is_static(v, mesh, a, side) -> bool:
    """True if a BC value spec is time-independent: plain arrays always;
    callables (spatial profiles like the jet inlet) only when evaluating at
    two distinct times agrees — a time-dependent BC (e.g. cosVelocity)
    must NOT reach the fused kernel, which would silently freeze it."""
    if not callable(v):
        return True
    # three pairwise-incommensurate sample times: a periodic profile whose
    # period divides one gap cannot divide the others too, so coincidental
    # equality at all three is implausible
    try:
        va = _eval_static_value(v, mesh, a, side, t=0.0)
        vb = _eval_static_value(v, mesh, a, side, t=0.3183098861837907)
        vc = _eval_static_value(v, mesh, a, side, t=1.4142135623730951)
    except Exception:  # noqa: BLE001 — be conservative on odd specs
        return False
    return (np.array_equal(np.asarray(va), np.asarray(vb))
            and np.array_equal(np.asarray(va), np.asarray(vc)))


@dataclasses.dataclass(frozen=True)
class _BCSpec:
    kind: str             # 'fixed' | 'zg' | 'grad' | 'sym' | 'extrap'
    value: tp.Any = None  # float, or ("input", idx) for array values
    sign: float = 1.0     # symmetry sign for the component


def _compile_bcs(solver, mesh, wp, nr=None, m=None):
    """-> (specs, bc_inputs): specs[field][axis][side] = _BCSpec, bc_inputs =
    list of np arrays fed to the kernel (for non-scalar BC values).

    Array-valued BCs on axis 0 become (1, wp) lane profiles; on axis 1 they
    become (nr, 1) row profiles (single-chip path only — `nr` is None in the
    sharded builder, where per-shard slab slicing is not implemented).

    `m`: local lane cell count for a y-decomposed sharded kernel build —
    the arrays then only fix the operand SHAPE (the sharded wrapper slices
    the true global profile per shard at call time)."""
    bc_U, bc_p, bc_T = solver._bcs()
    bc_inputs: list[np.ndarray] = []

    def make(bc, a, side, comp=None):
        if isinstance(bc, bcm.QGDFluxP):
            # lagged dp/dn computed in-kernel from phiwStar/tau_f
            # (qgdFluxFvPatchScalarField_8C updateCoeffs); axis-0 only
            assert a == 0, "qgdFlux supported on axis-0 sides only"
            return _BCSpec("qgdflux")
        if isinstance(bc, bcm.ZeroGradient):
            return _BCSpec("zg")
        if isinstance(bc, bcm.Symmetry):
            sign = -1.0 if (comp is not None and comp == a) else 1.0
            return _BCSpec("sym", sign=sign)
        if isinstance(bc, bcm.Extrapolated):
            return _BCSpec("extrap")
        if isinstance(bc, (bcm.FixedValue, bcm.FixedGradient,
                           bcm.InletOutlet)):
            if isinstance(bc, bcm.FixedValue):
                raw, kind = bc.value, "fixed"
            elif isinstance(bc, bcm.FixedGradient):
                raw, kind = bc.grad, "grad"
            else:
                # inletOutlet: per-lane/row switch on the NEW adjacent-cell
                # outward normal velocity — zeroGradient where flow leaves,
                # fixedValue(inletValue) where it enters (the entrainment
                # BC of the reference jet tutorials; resolve_inlet_outlet
                # parity, the fused ghosts being next step's start state)
                raw, kind = bc.inlet_value, "io"
            v = _eval_static_value(raw, mesh, a, side, vector_comp=comp)
            if v.ndim == 0 or v.size == 1:
                return _BCSpec(kind, value=float(v.reshape(())))
            if a == 0:
                # x-side layer over y: full lane width, cell lanes 1..ny,
                # edge-padded into the corner lanes
                ny = mesh.shape[1]
                prof = np.broadcast_to(v.reshape(-1), (ny,))
                ny = ny if m is None else m
                arr = np.zeros((1, wp), dtype=mesh.dtype)
                arr[0, 1:ny + 1] = prof[:ny]
                arr[0, 0] = arr[0, 1]
                arr[0, ny + 1] = arr[0, ny]
            else:
                if nr is None:
                    raise NotImplementedError(
                        "array-valued BCs on axis 1 not supported by the "
                        "sharded fused kernel")
                nx = mesh.shape[0]
                arr = np.zeros((nr, 1), dtype=mesh.dtype)
                arr[1:nx + 1, 0] = np.broadcast_to(v.reshape(-1), (nx,))
                arr[0, 0] = arr[1, 0]
                arr[nx + 1, 0] = arr[nx, 0]
            bc_inputs.append(arr)
            return _BCSpec(kind, value=("input", len(bc_inputs) - 1))
        raise NotImplementedError(bc)

    specs = {}
    for name, bcs, vec in (("p", bc_p, False), ("T", bc_T, False),
                           ("ux", bc_U, 0), ("uy", bc_U, 1)):
        comp = vec if vec is not False else None
        specs[name] = tuple(
            tuple(make(bcs[a, side], a, side, comp) for side in (0, 1))
            for a in range(2)
        )
    return specs, bc_inputs


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# layout auto-orientation: rows pad to 8 sublanes, lanes to 128; when the
# transposed assignment wastes fewer padded elements (e.g. the 1024x512 jet:
# (1032, 640) -> (520, 1152), -9.3%), build the kernel on the transposed case
# and convert at the to_fused/from_fused boundary.
# ---------------------------------------------------------------------------


def _frame_elems(nx, ny):
    return (-(-(nx + 2) // 8) * 8) * max(LANE, -(-(ny + 2) // LANE) * LANE)


def _transpose_bc(b, vector):
    """BC for the axis-swapped case; None if not transposable."""
    if isinstance(b, (bcm.ZeroGradient, bcm.Symmetry, bcm.Extrapolated)):
        return b
    if isinstance(b, (bcm.FixedValue, bcm.FixedGradient, bcm.InletOutlet)):
        if isinstance(b, bcm.FixedValue):
            raw = b.value
        elif isinstance(b, bcm.FixedGradient):
            raw = b.grad
        else:
            raw = b.inlet_value
        if callable(raw):
            def wrapped(t, coords, _f=raw):
                out = _f(t, tuple(coords)[::-1])
                return out[::-1] if vector else out

            new = wrapped
        else:
            v = np.asarray(raw)
            if v.ndim == 0 or v.size == 1:
                new = raw
            elif vector and v.ndim == 1 and v.shape[0] == 2:
                new = v[::-1]
            else:
                return None  # positional array profile: orientation unclear
        if isinstance(b, bcm.FixedValue):
            return bcm.FixedValue(new)
        if isinstance(b, bcm.FixedGradient):
            return bcm.FixedGradient(new)
        return bcm.InletOutlet(new)
    return None


def _transposed_solver(solver):
    """Axis-swapped QGDFoam (2D), or None when a BC resists transposition."""
    from ..core.mesh import Mesh

    bc_U, bc_p, bc_T = solver._bcs()
    new = {}
    for name, fb, vec in (("bc_U", bc_U, True), ("bc_p", bc_p, False),
                          ("bc_T", bc_T, False)):
        rows = []
        for a in (1, 0):
            row = []
            for side in (0, 1):
                tb = _transpose_bc(fb[a, side], vec)
                if tb is None:
                    return None
                row.append(tb)
            rows.append(tuple(row))
        new[name] = bcm.FieldBCs(tuple(rows))
    mesh_t = Mesh(x_faces=solver.mesh.x_faces[::-1], dtype=solver.mesh.dtype)
    return dataclasses.replace(solver, mesh=mesh_t, **new)


def _transpose_state(s, pbc=()):
    """QGDFoam State on the axis-swapped mesh (involution)."""
    from ..solvers.qgd import State

    return State(rho=s.rho.T, rhoU=s.rhoU[::-1].transpose(0, 2, 1),
                 rhoE=s.rhoE.T, sc=s.sc.T, t=s.t, dt=s.dt, pbc=pbc)


def build_fused_step(solver, interpret: tp.Optional[bool] = None,
                     _local_nx: tp.Optional[int] = None,
                     _local_ny: tp.Optional[int] = None,
                     _distributed: bool = False,
                     _y_distributed: bool = False,
                     _tiled: bool = False,
                     _frame_fn: bool = False,
                     auto_layout: bool = True,
                     **_unused):
    """Build (step, to_fused, from_fused) for a supported QGDFoam solver.

    step: FusedState -> FusedState, jittable / scannable.
    to_fused(State) -> FusedState;  from_fused(FusedState) -> State.

    auto_layout: when the transposed (rows, lanes) assignment has fewer
    padded frame elements, build on the axis-swapped case and transpose at
    the State boundary (every frame op is ~element-count bound).

    _local_nx/_distributed are internal hooks for the shard_map wrapper
    (build_sharded_fused_step): the kernel then operates on a LOCAL x-slab,
    takes (is_lo, is_hi) edge flags + an externally reduced dt, and leaves
    halo-row exchange to the caller.

    _frame_fn=True returns the pure per-frame physics closure instead of a
    pallas_call (the HBM-tiled grid pipeline embeds it in its own kernel):
    frame_fn(dtv, flags, ph, Th, ux, uy, scf, bc_vals) ->
    ([(body, glo, ghi)] * 4 fields, dt_new).
    """
    from ..solvers.qgd import State

    assert supported(solver), "solver config not supported by the fused kernel"
    ns_frames = _n_state(solver)
    if auto_layout and _local_nx is None and not _distributed:
        nx0, ny0 = solver.mesh.shape
        if _frame_elems(ny0, nx0) < _frame_elems(nx0, ny0):
            alt = _transposed_solver(solver)
            if (alt is not None and supported(alt)
                    and fits_vmem(ny0, nx0, n_state=ns_frames)):
                stepT, to_T, from_T = build_fused_step(
                    alt, interpret=interpret, auto_layout=False)
                return (stepT,
                        lambda s: to_T(_transpose_state(s)),
                        lambda fs: _transpose_state(from_T(fs)))
    if _local_nx is None and not _distributed:
        # feasibility of THIS orientation (the auto-layout rewrite above,
        # when taken, returned already)
        assert fits_vmem(*solver.mesh.shape, n_state=ns_frames), \
            "frame exceeds VMEM budget — use build_tiled_fused_step"
    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    tc = solver.time
    gnx, gny = mesh.shape
    nx = gnx if _local_nx is None else _local_nx
    M = gny if _local_ny is None else _local_ny   # local ny
    NR = nx + 2                   # stored rows (local slab when distributed)
    Wp = max(LANE, -(-(M + 2) // LANE) * LANE)
    dtype = np.dtype(mesh.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    f = float
    dx, dy = f(mesh.dx[0][0]), f(mesh.dx[1][0])
    vol = dx * dy
    ax_area, ay_area = dy, dx          # |S_f| per axis (2D)
    h_cell = f(np.asarray(mesh.h_cell).reshape(-1)[0])
    hfx, hfy = dx, dy                  # uniform h_face
    R, Cv, gamma = f(th.R), f(th.Cv), f(th.gamma)
    Pr_th = f(th.Pr)
    has_varsc = isinstance(tm, VarScModel5)
    alpha, Pr_tau = f(tm.alpha), f(tm.Pr)
    Sc = 0.0 if has_varsc else f(tm.Sc)
    mu_is_const0 = (isinstance(th.transport, ConstTransport)
                    and th.transport.mu0 == 0.0)
    n_state = 5 if has_varsc else 4
    flux_sides = solver._flux_sides()
    qf_lo = (0, 0) in flux_sides
    qf_hi = (0, 1) in flux_sides

    specs, bc_inputs_np = _compile_bcs(solver, mesh, Wp,
                                       nr=None if _distributed else NR,
                                       m=M if _distributed else None)
    n_bc = len(bc_inputs_np)

    def bc_ghost(spec: _BCSpec, interior, interior2, d, bc_refs, rows=None,
                 un=None, side=0):
        """Ghost layer from its interior neighbours (pad.py `one()` parity).
        `rows` restricts an (NR, 1) axis-1 value profile to the row slice the
        interior occupies (corner handling on the x-ghost rows).  `un` is the
        adjacent-cell outward-axis velocity for the inletOutlet switch."""
        if spec.kind == "zg":
            return interior
        if spec.kind == "sym":
            return interior if spec.sign == 1.0 else -interior
        if spec.kind == "extrap":
            return 2.0 * interior - interior2
        if isinstance(spec.value, tuple):
            v = bc_refs[spec.value[1]][:]
            if rows is not None and v.shape[0] > 1:
                v = v[rows]
        else:
            v = spec.value
        if spec.kind == "fixed":
            return 2.0 * v - interior
        if spec.kind == "io":
            # FluxSwitched parity: zeroGradient where flow leaves the
            # domain, fixedValue mirror where it enters
            outflow = (un < 0) if side == 0 else (un > 0)
            return jnp.where(outflow, interior, 2.0 * v - interior)
        return interior + v * d  # fixedGradient (outward-normal convention)

    def frame_fn(dtv, flags, ph, Th, ux, uy, scf, bc_refs, emit=None,
                 emit_dt=None, emit_sc=None):
        """Pure per-frame physics: one explicit QGD step on a ghost-padded
        (NR, Wp) frame set.  flags = (is_lo, is_hi, is_lo_y, is_hi_y), each a
        Python bool or a traced scalar bool.  Returns
        ([(body, glo, ghi)] per field p/T/ux/uy, dt_new) where `body` is the
        full frame with lane ghosts applied (x-ghost rows stale), and
        glo/ghi are the fresh (1, Wp) x-ghost rows.

        `emit(k, body, glo, ghi)`: write-as-you-go hook — calling it per
        field INSIDE the loop lets Mosaic retire each output frame before
        the next field's ghosts are built, keeping the straight-line
        program's peak VMEM live set ~4 frames lower than returning all
        results (the difference between fitting and OOMing the 1024x512
        whole-frame kernel).  With emit set, the returned list is empty."""
        is_lo, is_hi, is_lo_y, is_hi_y = flags

        # full-frame neighbour access: rotations only (Mosaic-legal)
        def rup(x):   # rup(x)[r] = x[r+1]
            return pltpu.roll(x, shift=NR - 1, axis=0)

        def rdn(x):   # rdn(x)[r] = x[r-1]
            return pltpu.roll(x, shift=1, axis=0)

        def shl(x):   # shl(x)[s] = x[s+1]
            return pltpu.roll(x, shift=Wp - 1, axis=1)

        def shr(x):   # shr(x)[s] = x[s-1]
            return pltpu.roll(x, shift=1, axis=1)

        colid = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)
        rowid = jax.lax.broadcasted_iota(jnp.int32, (NR, 1), 0)

        # ---- pointwise thermo on the padded frame (hePsiQGDThermo) ---------
        rho = ph / (R * Th)
        e = Cv * Th
        # one rsqrt feeds c, alpha/c and mu: c = sqrt(gRT) = gRT * rsqrt(gRT)
        gRT = (gamma * R) * Th
        rcs = jax.lax.rsqrt(gRT)
        c_snd = gRT * rcs
        rux = rho * ux
        ruy = rho * uy
        ke = ux * ux + uy * uy
        H = (Cv + R) * Th + 0.5 * ke   # e + p/rho = Cp*T for perfect gas
        # tau coefficients (constScPrModel1): coefficient fields interpolate
        # with ZERO-GRADIENT ghosts (`calculated` patches), not primitive BCs
        # -> override their ghost layers with the interior edge value.
        aoc = alpha * rcs
        if has_varsc:
            # muQGD = p*Sc*tau with the per-cell sensor field (varScModel5
            # _finish); tau_f uses alpha/interp(c), see face sections
            mu_eff = scf * (((alpha * h_cell) * ph) * rcs)
        else:
            mu_eff = ((Sc * alpha * h_cell) * ph) * rcs
        if not mu_is_const0:
            mm = th.mu(None, Th)
            alphau_eff = mu_eff / Pr_tau + mm / Pr_th
            mu_eff = mu_eff + mm
        else:
            # alphau = mu/Pr is a constant multiple -> apply it to the FACE
            # values after interpolation instead of carrying a third
            # coefficient frame through zg_override + 2 interpolations
            alphau_eff = None

        def zg_override(fld):
            # coefficient-field ghost handling: zero-gradient at PHYSICAL
            # boundaries only — at shard boundaries the halo row/lane carries
            # the neighbour's true cell value and must pass through
            if _distributed and _y_distributed:
                lo_c = jnp.where(is_lo_y, fld[:, 1:2], fld[:, 0:1])
                hi_c = jnp.where(is_hi_y, fld[:, M:M + 1],
                                 fld[:, M + 1:M + 2])
            else:
                lo_c, hi_c = fld[:, 1:2], fld[:, M:M + 1]
            fld = jnp.where(colid == 0, lo_c,
                            jnp.where(colid == M + 1, hi_c, fld))
            first = jnp.where(is_lo, fld[1:2, :], fld[0:1, :])
            last = jnp.where(is_hi, fld[-2:-1, :], fld[-1:, :])
            return jnp.where(rowid == 0, first,
                             jnp.where(rowid == NR - 1, last, fld))

        csm = zg_override(c_snd) if has_varsc else None
        aoc = zg_override(aoc)
        mu_eff = zg_override(mu_eff)
        if alphau_eff is not None:
            alphau_eff = zg_override(alphau_eff)

        # ---- x-faces (axis a=0): face r+1/2 at row r, live rows 0..nx ------
        def xint(fld):
            return 0.5 * (fld + rup(fld))

        def xsn(fld):
            return (rup(fld) - fld) * (1.0 / dx)

        def ytan(fx_):           # central d/dy at cell lanes
            return (shl(fx_) - shr(fx_)) * (1.0 / (2.0 * dy))

        pfx = xint(ph)
        rfx = xint(rho)
        uxfx = xint(ux)
        uyfx = xint(uy)
        efx = xint(e)
        ruxf = xint(rux)
        ruyf = xint(ruy)
        Hfx = xint(H)
        mufx = xint(mu_eff)
        afx = (mufx * (1.0 / Pr_tau) if alphau_eff is None
               else xint(alphau_eff))
        # varScModel5 interpolates c separately: tau_f = alpha/interp(c)*h_f
        # (varScModel5_8C:204-205); model1 interpolates alpha/c as one field
        taufx = ((alpha / xint(csm)) * hfx if has_varsc
                 else xint(aoc) * hfx)
        urr0x = xint(ux * rux)
        urr1x = xint(ux * ruy)
        cfx = xint(c_snd)

        gU00 = xsn(ux); gU01 = xsn(uy)          # dU_j/dx at x-faces
        gU10 = ytan(uxfx); gU11 = ytan(uyfx)    # dU_j/dy at x-faces
        gRx = xsn(rho); gRy = ytan(rfx)
        gPx = xsn(ph); gPy = ytan(pfx)
        gex = xsn(e); gey = ytan(efx)

        divU = gU00 + gU11
        u_gradrho = uxfx * gRx + uyfx * gRy
        rg0 = ruxf * gU00 + ruyf * gU10
        ws0 = taufx * (u_gradrho * uxfx + ruxf * divU + rg0)
        jmx = ruxf - (ws0 + taufx * gPx)
        phiJm_x = jmx * ax_area
        u_gradp = uxfx * gPx + uyfx * gPy
        iso = u_gradp + gamma * pfx * divU
        pi0 = taufx * (urr0x * gU00 + urr1x * gU10 + uxfx * gPx + iso) \
            + mufx * (2.0 * gU00 - (2.0 / 3.0) * divU)
        pi1 = taufx * (urr0x * gU01 + urr1x * gU11 + uxfx * gPy) \
            + mufx * (gU01 + gU10)
        de0 = gex - (pfx / (rfx * rfx)) * gRx
        de1 = gey - (pfx / (rfx * rfx)) * gRy
        qx = -taufx * (urr0x * de0 + urr1x * de1) - afx * gex
        # axis-x flux sums (area folded in)
        fx_rho = phiJm_x
        fx_m0 = phiJm_x * uxfx + ax_area * (pfx - pi0)
        fx_m1 = phiJm_x * uyfx - ax_area * pi1
        fx_E = phiJm_x * Hfx + ax_area * (qx - (pi0 * uxfx + pi1 * uyfx))

        # ---- y-faces (axis a=1): face s+1/2 at lane s, live lanes 0..M -----
        def yint(fld):
            return 0.5 * (fld + shl(fld))

        def ysn(fld):
            return (shl(fld) - fld) * (1.0 / dy)

        def xtan(fy_):           # central d/dx at cell rows
            return (rup(fy_) - rdn(fy_)) * (1.0 / (2.0 * dx))

        pfy = yint(ph)
        rfy = yint(rho)
        uxfy = yint(ux)
        uyfy = yint(uy)
        efy = yint(e)
        ruxfy = yint(rux)
        ruyfy = yint(ruy)
        Hfy = yint(H)
        mufy = yint(mu_eff)
        afy = (mufy * (1.0 / Pr_tau) if alphau_eff is None
               else yint(alphau_eff))
        taufy = ((alpha / yint(csm)) * hfy if has_varsc
                 else yint(aoc) * hfy)
        urr0y = yint(uy * rux)
        urr1y = yint(uy * ruy)
        cfy = yint(c_snd)

        hU10 = ysn(ux); hU11 = ysn(uy)          # dU_j/dy at y-faces
        hU00 = xtan(uxfy); hU01 = xtan(uyfy)    # dU_j/dx at y-faces
        hRx = xtan(rfy); hRy = ysn(rho)
        hPx = xtan(pfy); hPy = ysn(ph)
        hex = xtan(efy); hey = ysn(e)

        divUy = hU00 + hU11
        u_gradrho_y = uxfy * hRx + uyfy * hRy
        rg1y = ruxfy * hU01 + ruyfy * hU11
        ws1y = taufy * (u_gradrho_y * uyfy + ruyfy * divUy + rg1y)
        jmy = ruyfy - (ws1y + taufy * hPy)
        phiJm_y = jmy * ay_area
        u_gradp_y = uxfy * hPx + uyfy * hPy
        isoy = u_gradp_y + gamma * pfy * divUy
        qi0 = taufy * (urr0y * hU00 + urr1y * hU10 + uyfy * hPx) \
            + mufy * (hU00 + hU10)
        qi1 = taufy * (urr0y * hU01 + urr1y * hU11 + uyfy * hPy + isoy) \
            + mufy * (2.0 * hU11 - (2.0 / 3.0) * divUy)
        he0 = hex - (pfy / (rfy * rfy)) * hRx
        he1 = hey - (pfy / (rfy * rfy)) * hRy
        qy = -taufy * (urr0y * he0 + urr1y * he1) - afy * hey
        fy_rho = phiJm_y
        fy_m0 = phiJm_y * uxfy - ay_area * qi0
        fy_m1 = phiJm_y * uyfy + ay_area * (pfy - qi1)
        fy_E = phiJm_y * Hfy + ay_area * (qy - (qi0 * uxfy + qi1 * uyfy))

        # ---- QGDCourantNo.H + setDeltaT-QGDQHD.H, fully in-frame ---------
        # (QGDCourantNo_8H_source.html:44-50; setDeltaT-QGDQHD_8H:41-61)
        # distributed mode: dt is globally reduced OUTSIDE (pmax over shards
        # for the shard_map wrapper, an XLA pre-pass for the tiled pipeline)
        # and passed in; the in-frame path is whole-frame single-chip only
        if _distributed:
            dt_new = dtv
        else:
          live_x = jnp.logical_and(rowid <= nx,
                                   jnp.logical_and(colid >= 1, colid <= M))
          live_y = jnp.logical_and(jnp.logical_and(rowid >= 1, rowid <= nx),
                                   colid <= M)
          neg = jnp.float32(-np.inf)
          pos = jnp.float32(np.inf)
          # max(|u+c|, |u-c|) = |u| + c for c >= 0
          wave_x = jnp.abs(uxfx) + cfx
          wave_y = jnp.abs(uyfy) + cfy
          # scalar dt/h hoisted out of the max — exact (max commutes with
          # monotone positive scaling)
          co = jnp.maximum(
              jnp.max(jnp.where(live_x, wave_x, neg)) * dtv / hfx,
              jnp.max(jnp.where(live_y, wave_y, neg)) * dtv / hfy)
          tau_min = jnp.minimum(
              jnp.min(jnp.where(live_x, taufx, pos)),
              jnp.min(jnp.where(live_y, taufy, pos)))
          if tc.adjust_time_step:
              max_fact = tc.max_co / (co + common.SMALL)
              fact = jnp.minimum(
                  jnp.minimum(max_fact, 1.0 + 0.1 * max_fact), 1.2)
              max_dt1 = jnp.minimum(tc.max_dt, tc.c_tau * tau_min)
              dt_new = jnp.minimum(fact * dtv, max_dt1)
          else:
              dt_new = dtv

        # ---- explicit update (QGDRhoEqn/QGDUEqn/QGDEEqn, 1/V face sums) ----
        sdt = dt_new * (1.0 / vol)

        def div(fx_, fy_):       # live rows 1..nx, lanes 1..M
            return (fx_ - rdn(fx_)) + (fy_ - shr(fy_))

        rhon = rho - sdt * div(fx_rho, fy_rho)
        rux_n = rux - sdt * div(fx_m0, fy_m0)
        ruy_n = ruy - sdt * div(fx_m1, fy_m1)
        rhoE = rho * (e + 0.5 * ke)
        rhoEn = rhoE - sdt * div(fx_E, fy_E)

        inv_rhon = 1.0 / rhon
        uxn = rux_n * inv_rhon
        uyn = ruy_n * inv_rhon
        en = rhoEn * inv_rhon - 0.5 * (uxn * uxn + uyn * uyn)
        Tn = en * (1.0 / Cv)
        pn = rhon * R * Tn

        # ---- ghost layers (sequential-axis pad: x rows first from interior
        # values, then y lanes over all rows — matches ops.pad.ghost_pad) ----
        fields = {"p": pn, "T": Tn, "ux": uxn, "uy": uyn}

        # inletOutlet switches on the adjacent-cell outward velocity of the
        # FRESH fields (= next step's start state, matching the composable
        # path's start-of-step resolve); x-ghost corner rows use the edge
        # interior row's velocity (pad.py mask edge-replication parity)
        uyn_f = fields["uy"]
        uxn_f = fields["ux"]

        def _un_rows(rows):
            if rows is None:
                return slice(None)
            if rows.start == 0:
                return slice(1, 2)
            return slice(NR - 2, NR - 1)

        def col_ghosts(name, arr, rows=None):
            ur = _un_rows(rows)
            lo = bc_ghost(specs[name][1][0], arr[:, 1:2], arr[:, 2:3], dy,
                          bc_refs, rows=rows, un=uyn_f[ur, 1:2], side=0)
            hi = bc_ghost(specs[name][1][1], arr[:, M:M + 1], arr[:, M - 1:M],
                          dy, bc_refs, rows=rows, un=uyn_f[ur, M:M + 1],
                          side=1)
            if _distributed and _y_distributed:
                # shard-interior y edges: keep the halo lane (the wrapper
                # overwrites it with the neighbour's row after the kernel)
                lo = jnp.where(is_lo_y, lo, arr[:, 0:1])
                hi = jnp.where(is_hi_y, hi, arr[:, M + 1:M + 2])
            return jnp.where(colid == 0, lo,
                             jnp.where(colid == M + 1, hi, arr))

        results = []
        fresh = {}
        for k, name in enumerate(("p", "T", "ux", "uy")):
            arr = fields[name]
            # y-ghost lanes for the interior rows (full-frame select), then
            # x-ghost rows as separate (1, Wp) slices (the caller patches
            # them by 1-row stores — cheaper than row selects);
            # each ghost row is itself y-ghosted -> sequential pad semantics.
            body = col_ghosts(name, arr)
            if name == "p" and qf_lo:
                # qgdFlux: dp/dn = -phiwStar/(tau_f*|Sf|); the area cancels,
                # leaving w_star/tau_f at the boundary face row — ws0 here
                # already carries the tau_f factor, so the lag is this step's
                # fluxes exactly like the reference's registered-field lookup
                # (qgdFluxFvPatchScalarField_8C updateCoeffs)
                glo = arr[1:2, :] + (ws0[0:1, :] / taufx[0:1, :]) * dx
            else:
                glo = bc_ghost(specs[name][0][0], arr[1:2, :], arr[2:3, :],
                               dx, bc_refs, un=uxn_f[1:2, :], side=0)
            if name == "p" and qf_hi:
                ghi = arr[-2:-1, :] - (
                    ws0[NR - 2:NR - 1, :] / taufx[NR - 2:NR - 1, :]) * dx
            else:
                ghi = bc_ghost(specs[name][0][1], arr[-2:-1, :],
                               arr[-3:-2, :], dx, bc_refs,
                               un=uxn_f[-2:-1, :], side=1)
            if _distributed:
                glo = jnp.where(is_lo, glo, arr[1:2, :])
                ghi = jnp.where(is_hi, ghi, arr[-2:-1, :])
            triple = (body,
                      col_ghosts(name, glo, rows=slice(0, 1)),
                      col_ghosts(name, ghi, rows=slice(NR - 1, NR)))
            if emit is None:
                results.append(triple)
            else:
                emit(k, *triple)
            if emit_dt is not None and (
                    name in ("T", "ux", "uy")
                    or (emit_sc is not None and name == "p")):
                fresh[name] = triple

        if emit_dt is not None:
            # Courant/tau partials over the FRESH fields — the start state
            # of the NEXT step, whose dt controller consumes them (folds
            # the tiled pipeline's XLA dt pre-pass into the grid; the
            # inter-slab boundary faces are completed by a thin strip pass
            # in the wrapper).  x-faces: between live rows 1..nx-1, plus
            # the physical boundary faces against the fresh ghost rows on
            # edge slabs; y-faces: all lanes 0..M of the live rows.
            def full(name):
                b, glo, ghi = fresh[name]
                b = jnp.where(rowid == 0, glo,
                              jnp.where(rowid == NR - 1, ghi, b))
                return b

            Tn_f = full("T")
            uxn_g = full("ux")
            uyn_g = full("uy")
            gRTn = (gamma * R) * Tn_f
            rcsn = jax.lax.rsqrt(gRTn)
            cn = gRTn * rcsn
            neg = jnp.float32(-np.inf)
            pos = jnp.float32(np.inf)
            # x-faces at rows r..r+1: include r=0 / r=NR-2 only on the
            # physical edges (fresh ghosts); interior slab-boundary faces
            # (stale halos) are excluded and strip-completed outside
            lo_row = jnp.where(is_lo, 0, 1)
            hi_row = jnp.where(is_hi, NR - 2, NR - 3)
            live_x = jnp.logical_and(
                jnp.logical_and(rowid >= lo_row, rowid <= hi_row),
                jnp.logical_and(colid >= 1, colid <= M))
            wave_x = jnp.abs(0.5 * (uxn_g + rup(uxn_g))) \
                + 0.5 * (cn + rup(cn))
            live_y = jnp.logical_and(
                jnp.logical_and(rowid >= 1, rowid <= NR - 2), colid <= M)
            wave_y = jnp.abs(0.5 * (uyn_g + shl(uyn_g))) \
                + 0.5 * (cn + shl(cn))
            co_rate = jnp.maximum(
                jnp.max(jnp.where(live_x, wave_x, neg)) * (1.0 / hfx),
                jnp.max(jnp.where(live_y, wave_y, neg)) * (1.0 / hfy))
            # tau faces use zero-gradient COEFFICIENT ghosts: interior-face
            # averages, plus the raw edge-cell value at PHYSICAL boundary
            # faces only (x edges gate on is_lo/is_hi; y edges are always
            # physical — the tiled pipeline has no y decomposition)
            live_rows = jnp.logical_and(rowid >= 1, rowid <= NR - 2)
            live_cx = jnp.logical_and(
                jnp.logical_and(rowid >= 1, rowid <= NR - 3),
                jnp.logical_and(colid >= 1, colid <= M))
            live_cy = jnp.logical_and(
                live_rows, jnp.logical_and(colid >= 1, colid <= M - 1))
            edge_x = jnp.logical_and(
                jnp.logical_or(jnp.logical_and(rowid == 1, is_lo),
                               jnp.logical_and(rowid == NR - 2, is_hi)),
                jnp.logical_and(colid >= 1, colid <= M))
            edge_y = jnp.logical_and(
                live_rows,
                jnp.logical_or(colid == 1, colid == M))
            if has_varsc:
                cf_x = 0.5 * (cn + rup(cn))
                cf_y = 0.5 * (cn + shl(cn))
                cmaxx = jnp.maximum(
                    jnp.max(jnp.where(live_cx, cf_x, neg)),
                    jnp.max(jnp.where(edge_x, cn, neg)))
                cmaxy = jnp.maximum(
                    jnp.max(jnp.where(live_cy, cf_y, neg)),
                    jnp.max(jnp.where(edge_y, cn, neg)))
                tau_min = jnp.minimum((alpha / cmaxx) * hfx,
                                      (alpha / cmaxy) * hfy)
            else:
                aocn = alpha * rcsn
                af_x = 0.5 * (aocn + rup(aocn))
                af_y = 0.5 * (aocn + shl(aocn))
                tfx = jnp.minimum(
                    jnp.min(jnp.where(live_cx, af_x, pos)),
                    jnp.min(jnp.where(edge_x, aocn, pos)))
                tfy = jnp.minimum(
                    jnp.min(jnp.where(live_cy, af_y, pos)),
                    jnp.min(jnp.where(edge_y, aocn, pos)))
                tau_min = jnp.minimum(tfx * hfx, tfy * hfy)
            emit_dt(co_rate, tau_min)

            if emit_sc is not None:
                # RAW varScModel5 sensor over the FRESH fields — next
                # step's pre-smooth Sc (VarScModel5.sc_raw_update folded
                # into the slab kernel; arithmetic mirrors fvsc.grad_cell
                # on a uniform mesh).  Rows whose x-gradient reads the
                # stale slab halo are strip-recomputed by the wrapper.
                pn_f = full("p")
                # psi-form rho (p * 1/(R T)) for bitwise agreement with
                # th.rho_from_p_T in the composable sc_raw_update
                rho_z = zg_override(pn_f * (1.0 / (R * Tn_f)))
                fa = 0.5 * rho_z + 0.5 * rup(rho_z)
                gx = (fa - rdn(fa)) / dx
                fb = 0.5 * rho_z + 0.5 * shl(rho_z)
                gy = (fb - shr(fb)) / dy
                mag = jnp.sqrt(gx * gx + gy * gy)
                sc_raw = (tm.rC * (mag * h_cell / rho_z)
                          + (1.0 - tm.rC) * scf)
                sc_raw = jnp.clip(sc_raw, tm.minSc, tm.maxSc)
                sc_raw = jnp.maximum(sc_raw, tm.cqSc)
                # FIRST fvc::smooth relaxation ring, folded in-kernel
                # (VERDICT r4 next #1): f1 = max(f, nbr_max(f)/maxRatio)
                # with edge-replicated neighbours at PHYSICAL boundaries
                # (qgdcoeffs._neighbour_max convention; division kept for
                # bitwise parity).  Rows whose 3x3 neighbourhood touches a
                # stale slab halo are strip-recomputed by the wrapper.
                f_ = sc_raw
                up_n = rup(f_)
                up_n = jnp.where(
                    jnp.logical_and(is_hi, rowid == NR - 2), f_, up_n)
                dn_n = rdn(f_)
                dn_n = jnp.where(
                    jnp.logical_and(is_lo, rowid == 1), f_, dn_n)
                le_n = jnp.where(colid == M, f_, shl(f_))
                ri_n = jnp.where(colid == 1, f_, shr(f_))
                nb = jnp.maximum(jnp.maximum(up_n, dn_n),
                                 jnp.maximum(le_n, ri_n))
                sc_s1 = jnp.maximum(f_, nb / (1.0 + tm.smoothCoeff))
                # change partial over the live cells EXCLUDING the rows
                # whose f1 saw stale halo data (local rows 1-2 / S-1..S on
                # interior slab boundaries): those are exactly the rows the
                # wrapper strip-fix re-checks, and a stale false-positive
                # here would fire the (frame-sweeping) XLA continuation
                # every step
                live_sc = jnp.logical_and(
                    jnp.logical_and(
                        jnp.logical_or(is_lo, rowid >= 3),
                        jnp.logical_or(is_hi, rowid <= NR - 4)),
                    jnp.logical_and(
                        jnp.logical_and(rowid >= 1, rowid <= NR - 2),
                        jnp.logical_and(colid >= 1, colid <= M)))
                chg = jnp.max(jnp.where(live_sc, sc_s1 - sc_raw, 0.0))
                emit_sc(sc_raw, sc_s1, chg)
        return results, dt_new

    if _frame_fn:
        return frame_fn

    def kernel(dt_ref, flag_ref, *refs):
        ph = refs[0][:]
        Th = refs[1][:]
        ux = refs[2][:]
        uy = refs[3][:]
        scf = refs[4][:] if has_varsc else None
        bc_vals = [refs[n_state + i][:] for i in range(n_bc)]
        outs = refs[n_state + n_bc:n_state + n_bc + 4]
        dt_out = None if _distributed else refs[n_state + n_bc + 4]

        if _distributed:
            is_lo = flag_ref[0, 0] == 1
            is_hi = flag_ref[0, 1] == 1
            # keep y-edge selects OUT of the graph when y is not decomposed:
            # (n, 1) meshes then stay bitwise-identical to the serial kernel
            if _y_distributed:
                is_lo_y = flag_ref[0, 2] == 1
                is_hi_y = flag_ref[0, 3] == 1
            else:
                is_lo_y = is_hi_y = True
        else:
            is_lo = is_hi = is_lo_y = is_hi_y = True

        def emit(k, body, glo, ghi):
            outs[k][:] = body
            outs[k][0:1, :] = glo
            outs[k][NR - 1:NR, :] = ghi

        _, dt_new = frame_fn(dt_ref[0, 0],
                             (is_lo, is_hi, is_lo_y, is_hi_y),
                             ph, Th, ux, uy, scf, bc_vals, emit=emit)
        if not _distributed:
            dt_out[:] = jnp.full((8, LANE), dt_new, dtype=dt_new.dtype)

    # ---- pallas_call wrapper ----------------------------------------------
    fshape = jax.ShapeDtypeStruct((NR, Wp), dtype)
    bc_inputs = tuple(jnp.asarray(a, dtype=dtype) for a in bc_inputs_np)

    n_out = 4 if _distributed else 5
    pcall = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_state + n_bc),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_out,
        out_shape=[fshape] * 4
        + ([] if _distributed else [jax.ShapeDtypeStruct((8, LANE), dtype)]),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )
    if _distributed:
        return pcall

    W = M + 2

    def _lane_pad(arr):
        # cast: composable-state inputs (pbc gradients, sc) may have been
        # promoted to f64 by numpy mesh scalars under jax_enable_x64
        return jnp.pad(arr.astype(dtype), ((0, 0), (0, Wp - W)), mode="edge")

    def _sc_frame(sc_int):
        # cast: the composable sensor promotes via the f64 numpy h_cell
        # scalar under jax_enable_x64
        return _lane_pad(jnp.pad(sc_int.astype(dtype), ((1, 1), (1, 1)),
                                 mode="edge"))

    ones_flags = jnp.ones((1, 4), dtype=jnp.int32)

    def step(fs: FusedState) -> FusedState:
        dts = jnp.reshape(fs.dt.astype(dtype), (1, 1))
        extra = ()
        sc_new = None
        if has_varsc:
            # XLA pre-pass: the sensor (cell gradient + global fvc::smooth
            # fixed point) shares VarScModel5.sc_update with the composable
            # path verbatim; its frame feeds the kernel as a 5th field
            p_int = fs.p[1:-1, 1:M + 1]
            T_int = fs.T[1:-1, 1:M + 1]
            rho_int = th.rho_from_p_T(p_int, T_int)
            sc_new = _sc_frame(tm.sc_update(
                mesh, rho_int, fs.sc[1:-1, 1:M + 1]).astype(dtype))
            extra = (sc_new,)
        p2, T2, ux2, uy2, dt_arr = pcall(dts, ones_flags,
                                         fs.p, fs.T, fs.ux, fs.uy,
                                         *extra, *bc_inputs)
        dt_new = dt_arr[0, 0]
        return FusedState(p=p2, T=T2, ux=ux2, uy=uy2,
                          t=fs.t + dt_new, dt=dt_new, sc=sc_new)

    # ---- conversions to/from the composable State --------------------------
    to_fused, from_fused = _make_state_io(solver, NR, M, Wp, dtype)
    return step, to_fused, from_fused


def _make_state_io(solver, NR, M, Wp, dtype):
    """(to_fused, from_fused) between the composable QGDFoam State and the
    ghost-padded (NR, Wp) frame layout — shared by the whole-frame and the
    HBM-tiled builders."""
    from ..solvers.qgd import State
    from ..ops.pad import ghost_pad

    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    has_varsc = isinstance(tm, VarScModel5)
    flux_sides = solver._flux_sides()
    bc_U, bc_p, bc_T = solver._bcs()
    W = M + 2
    dx = float(mesh.dx[0][0])

    def _lane_pad(arr):
        # cast: composable-state inputs (pbc gradients, sc) may have been
        # promoted to f64 by numpy mesh scalars under jax_enable_x64
        return jnp.pad(arr.astype(dtype), ((0, 0), (0, Wp - W)), mode="edge")

    def _sc_frame(sc_int):
        return _lane_pad(jnp.pad(sc_int.astype(dtype), ((1, 1), (1, 1)),
                                 mode="edge"))

    def to_fused(s: "State") -> FusedState:
        bc_pp = bc_p
        for i, (a, side) in enumerate(flux_sides):
            bc_pp = bc_pp.replace(a, side, bcm.FixedGradient(s.pbc[i]))
        U, e, T, p = solver.primitives(s)
        bc_Ur = bcm.resolve_inlet_outlet(bc_U, U, 2)
        bc_pp = bcm.resolve_inlet_outlet(bc_pp, U, 2)
        bc_Tr = bcm.resolve_inlet_outlet(bc_T, U, 2)
        Upad = ghost_pad(U, bc_Ur, mesh, t=s.t, vector=True)
        return FusedState(
            p=_lane_pad(ghost_pad(p, bc_pp, mesh, t=s.t)),
            T=_lane_pad(ghost_pad(T, bc_Tr, mesh, t=s.t)),
            ux=_lane_pad(Upad[0]), uy=_lane_pad(Upad[1]),
            t=s.t, dt=s.dt,
            sc=_sc_frame(s.sc) if has_varsc else None,
        )

    def from_fused(fs: FusedState) -> "State":
        p = fs.p[1:-1, 1:M + 1]
        T = fs.T[1:-1, 1:M + 1]
        U = jnp.stack([fs.ux[1:-1, 1:M + 1], fs.uy[1:-1, 1:M + 1]])
        rho = th.rho_from_p_T(p, T)
        e = th.e_from_T(T)
        # lagged qgdFlux gradients recovered from the p ghost rows
        # (ghost = interior + g*dx on both sides, ops.pad convention)
        pbc = []
        for a, side in flux_sides:
            if side == 0:
                g = (fs.p[0:1, 1:M + 1] - fs.p[1:2, 1:M + 1]) * (1.0 / dx)
            else:
                g = (fs.p[NR - 1:NR, 1:M + 1]
                     - fs.p[NR - 2:NR - 1, 1:M + 1]) * (1.0 / dx)
            pbc.append(g)
        sc = (fs.sc[1:-1, 1:M + 1] if has_varsc
              else jnp.full_like(rho, tm.Sc))
        return State(rho=rho, rhoU=rho[None] * U,
                     rhoE=rho * e + 0.5 * rho * jnp.sum(U * U, axis=0),
                     sc=sc, t=fs.t, dt=fs.dt, pbc=tuple(pbc))

    return to_fused, from_fused

# ---------------------------------------------------------------------------
# multi-chip: shard_map over an x-axis device ring
# ---------------------------------------------------------------------------


def build_sharded_fused_step(solver, dmesh, axis_name: str = "X",
                             axis_name_y: str = "Y",
                             interpret: tp.Optional[bool] = None):
    """Fused step domain-decomposed over a 2-D (X, Y) TPU chip mesh.

    The TPU-native replacement of the reference's MPI decomposition for the
    fused path: each shard owns an (x, y) block carried WITH its one-cell
    halo frame (local arrays (nx/px + 2, pad128(ny/py + 2))); per step each
    shard runs the whole-block VMEM kernel, then exchanges halos with its
    mesh neighbours via jax.lax.ppermute (ICI) in TWO PHASES — rows over X,
    then lanes over Y including the fresh halo rows, which transports the
    diagonal corner cells exactly like the reference's corner-process
    machinery (SURVEY.md §2.4) without a third exchange.  Courant/tau
    reductions are jax.lax.pmax/pmin over both axes.

    A (n, 1) device mesh reduces to the pure x-ring decomposition.

    Returns (step, to_sharded, from_sharded):
      carry = FusedState whose arrays are (px, py, NRl, Wpl) stacked local
      blocks, sharded P(X, Y, None, None).
    """
    from jax.sharding import PartitionSpec as P

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    from ..core.mesh import Mesh
    from ..parallel import spmd
    from ..solvers.qgd import State
    from ..ops.pad import ghost_pad

    assert supported(solver, sharded=True)
    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    tc = solver.time
    has_varsc = isinstance(tm, VarScModel5)
    flux_sides = solver._flux_sides()
    nx, ny = mesh.shape
    px = dmesh.shape[axis_name]
    py = dmesh.shape.get(axis_name_y, 1) if hasattr(dmesh.shape, "get") \
        else dmesh.shape[axis_name_y]
    assert nx % px == 0, (nx, px)
    assert ny % py == 0, (ny, py)
    nxl, nyl = nx // px, ny // py
    assert fits_vmem(nxl, nyl, n_state=5 if has_varsc else 4), \
        "per-shard block exceeds the whole-frame VMEM live-set budget"
    NRl = nxl + 2
    Ml = nyl
    Wl = Ml + 2
    Wpl = max(LANE, -(-Wl // LANE) * LANE)
    dtype = np.dtype(mesh.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    # local block mesh + spmd context for the XLA pre-passes that run
    # INSIDE the shard body (the varScModel5 sensor's cell gradient and
    # global fvc::smooth fixed point)
    local_mesh = Mesh(x_faces=(mesh.x_faces[0][: nxl + 1],
                               mesh.x_faces[1][: nyl + 1]), dtype=mesh.dtype)
    sctx = spmd.SpmdContext(
        axes=(spmd.AxisShard(axis_name, px, nxl) if px > 1 else None,
              spmd.AxisShard(axis_name_y, py, nyl) if py > 1 else None),
        global_shape=(nx, ny), global_mesh=mesh)
    zg2 = bcm.FieldBCs.uniform(bcm.ZeroGradient(), 2)

    pcall = build_fused_step(solver, interpret=interpret, _local_nx=nxl,
                             _local_ny=nyl, _distributed=True,
                             _y_distributed=py > 1)
    # global-width profiles for array-valued axis-0 BCs: sliced per shard
    # below (the kernel-side arrays from the _distributed _compile_bcs only
    # fix operand shapes)
    specs_g, bc_inputs_g = _compile_bcs(solver, mesh, ny + 2, nr=None)
    bc_inputs_glob = tuple(jnp.asarray(a, dtype=dtype) for a in bc_inputs_g)

    f = float
    dx, dy = f(mesh.dx[0][0]), f(mesh.dx[1][0])
    gamma, R = f(th.gamma), f(th.R)
    alpha = f(tm.alpha)
    fwd_x = [(i, i + 1) for i in range(px - 1)]
    bwd_x = [(i + 1, i) for i in range(px - 1)]
    fwd_y = [(i, i + 1) for i in range(py - 1)]
    bwd_y = [(i + 1, i) for i in range(py - 1)]

    def local_dt(p_, T_, ux_, uy_, dt, edges):
        """Masked local Courant/tau partials -> pmax/pmin -> setDeltaT
        (QGDCourantNo.H + setDeltaT-QGDQHD.H over the decomposed mesh)."""
        is_lo, is_hi, is_lo_y, is_hi_y = edges
        Tl = T_[:, :Wl]
        c = jnp.sqrt((gamma * R) * Tl)
        uxl, uyl = ux_[:, :Wl], uy_[:, :Wl]
        # shared shard faces counted twice; max is idempotent
        cfx = 0.5 * (c[:-1] + c[1:])
        ufx = 0.5 * (uxl[:-1] + uxl[1:])
        wave_x = (jnp.abs(ufx) + cfx)[:, 1:-1]
        cfy = 0.5 * (c[:, :-1] + c[:, 1:])
        ufy = 0.5 * (uyl[:, :-1] + uyl[:, 1:])
        wave_y = (jnp.abs(ufy) + cfy)[1:-1, :]
        co = jnp.maximum(jnp.max(wave_x) * dt / dx,
                         jnp.max(wave_y) * dt / dy)
        # tau_f with zero-gradient coefficient ghosts at PHYSICAL edges:
        # interior halo rows/lanes already hold neighbour values.
        # Convention parity with the kernel: constScPr interpolates a/c
        # (interp(aoc)); varScModel5 interpolates c and divides
        # (alpha/interp(c), varScModel5_8C:204-205 / kernel taufx).
        coef = c if has_varsc else alpha / c
        lo = jnp.where(is_lo, coef[1:2], coef[0:1])
        hi = jnp.where(is_hi, coef[-2:-1], coef[-1:])
        coef = jnp.concatenate([lo, coef[1:-1], hi], axis=0)
        if py > 1:
            lo_c = jnp.where(is_lo_y, coef[:, 1:2], coef[:, 0:1])
            hi_c = jnp.where(is_hi_y, coef[:, -2:-1], coef[:, -1:])
        else:
            lo_c, hi_c = coef[:, 1:2], coef[:, -2:-1]
        coef = jnp.concatenate([lo_c, coef[:, 1:-1], hi_c], axis=1)
        fx = 0.5 * (coef[:-1] + coef[1:])
        fy = 0.5 * (coef[:, :-1] + coef[:, 1:])
        if has_varsc:
            taux = ((alpha / fx) * dx)[:, 1:-1]
            tauy = ((alpha / fy) * dy)[1:-1, :]
        else:
            taux = (fx * dx)[:, 1:-1]
            tauy = (fy * dy)[1:-1, :]
        tau_min = jnp.minimum(jnp.min(taux), jnp.min(tauy))
        co = jax.lax.pmax(jax.lax.pmax(co, axis_name), axis_name_y)
        tau_min = jax.lax.pmin(jax.lax.pmin(tau_min, axis_name), axis_name_y)
        return common.set_delta_t(dt, co, tau_min, tc)

    colid_l = jax.lax.broadcasted_iota(jnp.int32, (NRl, Wpl), 1)

    def local_step(pl_, Tl_, uxl_, uyl_, scl_, t, dt):
        p_, T_, ux_, uy_ = pl_[0, 0], Tl_[0, 0], uxl_[0, 0], uyl_[0, 0]
        ix = jax.lax.axis_index(axis_name)
        iy = jax.lax.axis_index(axis_name_y)
        is_lo = ix == 0
        is_hi = ix == px - 1
        is_lo_y = iy == 0
        is_hi_y = iy == py - 1
        dt_new = local_dt(p_, T_, ux_, uy_, dt,
                          (is_lo, is_hi, is_lo_y, is_hi_y))
        dts = jnp.reshape(dt_new.astype(dtype), (1, 1))
        flags = jnp.stack([is_lo, is_hi, is_lo_y, is_hi_y]).astype(
            jnp.int32).reshape(1, 4)
        # slice the global lane profiles to this shard's y-window
        bc_loc = []
        for g in bc_inputs_glob:
            win = jax.lax.dynamic_slice(
                g, (jnp.zeros((), iy.dtype), iy * nyl), (1, Wl))
            arr = jnp.zeros((1, Wpl), dtype=dtype)
            bc_loc.append(jax.lax.dynamic_update_slice(arr, win, (0, 0)))
        extra = ()
        sc_frame = scl_
        if has_varsc:
            # varScModel5 sensor pre-pass INSIDE the shard body: the spmd
            # context routes grad-rho ghosts and the fvc::smooth fixed
            # point's neighbour-max + termination test across shards —
            # VarScModel5.sc_update runs verbatim (bit-parity with serial)
            with spmd.active(sctx):
                rho_int = th.rho_from_p_T(p_[1:-1, 1:Ml + 1],
                                          T_[1:-1, 1:Ml + 1])
                sc_new = tm.sc_update(
                    local_mesh, rho_int,
                    scl_[0, 0][1:-1, 1:Ml + 1]).astype(dtype)
                # frame ghosts: neighbour values at shard edges, edge
                # replication at physical boundaries (serial _sc_frame)
                scf = ghost_pad(sc_new, zg2, local_mesh)
            scf = jnp.pad(scf, ((0, 0), (0, Wpl - Wl)), mode="edge")
            sc_frame = scf[None, None]
            extra = (scf,)
        outs = pcall(dts, flags, p_, T_, ux_, uy_, *extra, *bc_loc)

        def exchange(a):
            # phase 1: halo rows over X (full width incl. current lanes)
            from_prev = jax.lax.ppermute(a[-2:-1, :], axis_name, fwd_x)
            from_next = jax.lax.ppermute(a[1:2, :], axis_name, bwd_x)
            row0 = jnp.where(is_lo, a[0:1, :], from_prev)
            rowN = jnp.where(is_hi, a[-1:, :], from_next)
            a = jnp.concatenate([row0, a[1:-1, :], rowN], axis=0)
            if py > 1:
                # phase 2: halo lanes over Y including the fresh halo rows
                # -> corner ghosts = diagonal neighbours' cells (two-phase
                # exchange transports corners for free)
                from_left = jax.lax.ppermute(a[:, Ml:Ml + 1], axis_name_y,
                                             fwd_y)
                from_right = jax.lax.ppermute(a[:, 1:2], axis_name_y, bwd_y)
                col0 = jnp.where(is_lo_y, a[:, 0:1], from_left)
                colM = jnp.where(is_hi_y, a[:, Ml + 1:Ml + 2], from_right)
                a = jnp.where(colid_l == 0, col0,
                              jnp.where(colid_l == Ml + 1, colM, a))
            return a

        outs = [exchange(a)[None, None] for a in outs]
        return (*outs, sc_frame, t + dt_new, dt_new)

    pspec = P(axis_name, axis_name_y, None, None)
    sc_spec = pspec if has_varsc else P()
    kw = dict(
        mesh=dmesh,
        in_specs=(pspec, pspec, pspec, pspec, sc_spec, P(), P()),
        out_specs=(pspec, pspec, pspec, pspec, sc_spec, P(), P()),
    )
    try:  # jax >= 0.8 renamed check_rep -> check_vma
        sstep = shard_map(local_step, check_vma=False, **kw)
    except TypeError:
        sstep = shard_map(local_step, check_rep=False, **kw)

    def step(fs: FusedState) -> FusedState:
        sc_in = fs.sc if has_varsc else jnp.zeros((), dtype=dtype)
        p2, T2, ux2, uy2, sc2, t2, dt2 = sstep(fs.p, fs.T, fs.ux, fs.uy,
                                               sc_in, fs.t, fs.dt)
        return FusedState(p=p2, T=T2, ux=ux2, uy=uy2, t=t2, dt=dt2,
                          sc=sc2 if has_varsc else None)

    # ---- conversions --------------------------------------------------------
    bc_U, bc_p, bc_T = solver._bcs()

    def to_sharded(s: State) -> FusedState:
        bc_pp = bc_p
        for i, (a, side) in enumerate(flux_sides):
            bc_pp = bc_pp.replace(a, side, bcm.FixedGradient(s.pbc[i]))
        U, e, T, p = solver.primitives(s)
        bc_Ur = bcm.resolve_inlet_outlet(bc_U, U, 2)
        bc_pr = bcm.resolve_inlet_outlet(bc_pp, U, 2)
        bc_Tr = bcm.resolve_inlet_outlet(bc_T, U, 2)
        Upad = ghost_pad(U, bc_Ur, mesh, t=s.t, vector=True)
        padded = {
            "p": ghost_pad(p, bc_pr, mesh, t=s.t),
            "T": ghost_pad(T, bc_Tr, mesh, t=s.t),
            "ux": Upad[0], "uy": Upad[1],
        }

        def split(a):
            # overlapped blocks: block (i, j) = rows [i*nxl, i*nxl + NRl) x
            # lanes [j*nyl, j*nyl + Wl), lane-padded to Wpl.  Cast: f64 BC
            # values under jax_enable_x64 promote ghost_pad's output
            a = a.astype(dtype)
            blocks = []
            for i in range(px):
                row = []
                for j in range(py):
                    blk = a[i * nxl:i * nxl + NRl, j * nyl:j * nyl + Wl]
                    row.append(jnp.pad(blk, ((0, 0), (0, Wpl - Wl)),
                                       mode="edge"))
                blocks.append(jnp.stack(row))
            return jnp.stack(blocks)

        sc_blocks = None
        if has_varsc:
            sc_pad = jnp.pad(s.sc.astype(dtype), ((1, 1), (1, 1)),
                             mode="edge")
            sc_blocks = split(sc_pad)
        return FusedState(p=split(padded["p"]), T=split(padded["T"]),
                          ux=split(padded["ux"]), uy=split(padded["uy"]),
                          t=s.t, dt=s.dt, sc=sc_blocks)

    def from_sharded(fs: FusedState) -> State:
        def join(a):
            # interior cells of each block + the global ghost frame
            rows = []
            for i in range(px):
                cols = [a[i, j, :, 1:Ml + 1] for j in range(py)]
                mid = jnp.concatenate(cols, axis=1)
                lo = a[i, 0, :, 0:1]
                hi = a[i, py - 1, :, Ml + 1:Ml + 2]
                rows.append(jnp.concatenate([lo, mid, hi], axis=1))
            interior = jnp.concatenate([r[1:-1] for r in rows], axis=0)
            return jnp.concatenate([rows[0][0:1], interior, rows[-1][-1:]],
                                   axis=0)

        pj = join(fs.p)
        p = pj[1:-1, 1:-1]
        T = join(fs.T)[1:-1, 1:-1]
        U = jnp.stack([join(fs.ux)[1:-1, 1:-1], join(fs.uy)[1:-1, 1:-1]])
        rho = th.rho_from_p_T(p, T)
        e = th.e_from_T(T)
        # lagged qgdFlux gradients recovered from the joined p ghost rows
        # (ghost = interior + g*dx, ops.pad convention)
        dxv = float(mesh.dx[0][0])
        pbc = []
        for a, side in flux_sides:
            if side == 0:
                g = (pj[0:1, 1:-1] - pj[1:2, 1:-1]) * (1.0 / dxv)
            else:
                g = (pj[-1:, 1:-1] - pj[-2:-1, 1:-1]) * (1.0 / dxv)
            pbc.append(g)
        sc = (join(fs.sc)[1:-1, 1:-1] if has_varsc
              else jnp.full_like(rho, tm.Sc))
        return State(rho=rho, rhoU=rho[None] * U,
                     rhoE=rho * e + 0.5 * rho * jnp.sum(U * U, axis=0),
                     sc=sc, t=fs.t, dt=fs.dt, pbc=tuple(pbc))

    return step, to_sharded, from_sharded


# ---------------------------------------------------------------------------
# HBM-tiled x-slab pipeline: grids beyond whole-frame VMEM residency
# ---------------------------------------------------------------------------


class TiledState(tp.NamedTuple):
    """Scan carry of the HBM-tiled fused step.

    p/T/ux/uy are (nx, Wp) CELL-row frames (no x-ghost rows; lane ghosts at
    columns 0 and M+1, dead lane padding beyond).  gl/gh carry the x-ghost
    rows separately as 4-tuples (p, T, ux, uy order) of (8, Wp) tiles — the
    live ghost row sits at row 7 of gl (so it is the last row of an 8-row
    HBM tile, matching the halo BlockSpec) and at row 0 of gh.  sc is the
    (nx, Wp) varScModel5 sensor frame or None.
    """

    p: jax.Array
    T: jax.Array
    ux: jax.Array
    uy: jax.Array
    gl: tp.Tuple[jax.Array, ...]
    gh: tp.Tuple[jax.Array, ...]
    t: jax.Array
    dt: jax.Array
    sc: tp.Any = None
    # carried Courant/tau rates of the CURRENT fields (computed by the
    # previous kernel pass over its fresh outputs + the inter-slab strip
    # completion) — replaces the full-frame XLA dt pre-pass
    co_rate: tp.Any = None
    tau_rate: tp.Any = None
    # carried RAW varScModel5 sensor of the CURRENT fields (pre-smooth,
    # emitted by the previous kernel pass; rows adjacent to slab
    # boundaries are strip-recomputed before the smooth)
    sc_raw: tp.Any = None
    # carried FIRST fvc::smooth ring of sc_raw + its per-slab change
    # partials (also kernel-emitted; VERDICT r4 next #1 — only the
    # rarely-firing fixed-point continuation stays XLA-side)
    sc_s1: tp.Any = None
    sc_chg: tp.Any = None


# Live-set model of the straight-line slab kernel: Mosaic holds ~50
# (SLAB+2, Wp) f32 temporaries at the peak (measured from the r2 VMEM-oom
# dump on the bench chip), plus the pipeline's double-buffered in/out
# blocks.  _pick_slab sizes slabs against this, not the 8-frame field
# budget that sank round 2.
TILED_LIVE_FRAMES = 52
TILED_VMEM_BUDGET = 100 * 1024 * 1024


def _slab_vmem_bytes(slab: int, wp: int, n_state: int) -> int:
    # n_state > 4 => the varsc fold: ring-1 temporaries (+8 live frames)
    # and the extra sc_s1 output block
    extra = 1 if n_state > 4 else 0
    io = 2 * (n_state + 4 + extra) * slab * wp * 4  # double-buffered blocks
    body = (TILED_LIVE_FRAMES + 8 * extra) * (slab + 2) * wp * 4
    small = (4 * n_state + 24) * 8 * wp * 4       # halo blocks + ghost tiles
    return io + body + small


def _pick_slab(nx: int, wp: int, n_state: int = 4) -> tp.Optional[int]:
    """Largest slab row count (multiple of 8, dividing nx) whose PIPELINED
    working set — kernel live temporaries + double-buffered blocks — fits
    the VMEM budget."""
    if nx % 8 != 0:
        return None
    for slab in (512, 384, 256, 192, 128, 96, 64, 48, 32, 16, 8):
        if (slab < nx and nx % slab == 0
                and _slab_vmem_bytes(slab, wp, n_state) <= TILED_VMEM_BUDGET):
            return slab
    return None


def tiled_supported(solver) -> bool:
    """True if the config runs on the x-slab tiled fused pipeline."""
    if not supported(solver):
        return False
    nx, ny = solver.mesh.shape
    wp = max(LANE, -(-(ny + 2) // LANE) * LANE)
    if _pick_slab(nx, wp, _n_state(solver)) is None:
        return False
    # axis-1 array-valued BC profiles are not sliceable here (same
    # restriction as the sharded builder)
    try:
        _compile_bcs(solver, solver.mesh, wp, nr=None, m=ny)
    except NotImplementedError:
        return False
    return True


def build_tiled_fused_step(solver, interpret: tp.Optional[bool] = None,
                           slab_rows: tp.Optional[int] = None):
    """Fused step as a Mosaic-pipelined pallas_call grid over x-slabs.

    The whole-frame kernel requires every field in VMEM; past ~3M cells it
    cannot launch.  Here the cell-row frames stay in HBM and the step runs
    ONE pallas_call with grid=(nx/SLAB,): program i reads, per field, its
    (SLAB, Wp) cell-row block plus two 8-row halo blocks (the row above and
    below the slab — the update stencil is 1-ring in rows), assembles the
    (SLAB+2, Wp) ghost-framed window in VMEM, runs the shared frame physics
    (`build_fused_step(_frame_fn=True)`), and writes the SLAB fresh cell
    rows to its output block.  Mosaic double-buffers every block
    (HBM->VMEM DMA of slab i+1 overlaps compute of slab i), so throughput
    stays VPU-bound like the whole-frame kernel — this replaces the round-2
    fori_loop + dynamic_slice structure that serialised the copies and
    mis-budgeted VMEM.  Boundary slabs also refresh the carried x-ghost
    rows (TiledState.gl/gh) as revisited (8, Wp) output tiles.

    dt (QGDCourantNo + setDeltaT) and the varScModel5 sensor (cell gradient
    + global fvc::smooth fixed point, VarScModel5.sc_update) are XLA
    pre-passes over the frames — the sensor's smoothing wave must cross slab
    boundaries, so it cannot live inside the slab kernel.

    Replaces the reference's whole-mesh hot loop (QGDFoam_8C_source.html:
    90-163) for meshes of any size; supports varScModel5 coefficients and
    the axis-0 qgdFlux pressure BC like the whole-frame path.
    """
    assert supported(solver), "config not supported by the fused kernel"
    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    tc = solver.time
    nx, M = mesh.shape
    W = M + 2
    Wp = max(LANE, -(-W // LANE) * LANE)
    dtype = np.dtype(mesh.dtype)
    has_varsc = isinstance(tm, VarScModel5)
    n_state = _n_state(solver)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    SLAB = slab_rows if slab_rows is not None else _pick_slab(nx, Wp, n_state)
    assert SLAB is not None and nx % SLAB == 0 and SLAB % 8 == 0, (nx, SLAB)
    n_slabs = nx // SLAB
    sb8 = SLAB // 8
    nb8 = nx // 8

    frame = build_fused_step(solver, _local_nx=SLAB, _local_ny=M,
                             _distributed=True, _y_distributed=False,
                             _tiled=True, _frame_fn=True)
    # fold the raw sensor into the kernel when its inputs are scalars
    # (per-cell cqSc floors / cellSets keep the XLA pre-pass)
    fold_sc = (has_varsc and np.ndim(tm.cqSc) == 0
               and tm.const_sc_mask is None)
    # axis-0 lane profiles are already global-width (local ny == global ny)
    _, bc_inputs_np = _compile_bcs(solver, mesh, Wp, nr=None, m=M)
    bc_inputs = tuple(jnp.asarray(a, dtype=dtype) for a in bc_inputs_np)
    n_bc = len(bc_inputs)

    def kernel(dt_ref, *refs):
        i = pl.program_id(0)
        is_lo = i == 0
        is_hi = i == n_slabs - 1
        A = [refs[3 * k] for k in range(n_state)]
        B = [refs[3 * k + 1] for k in range(n_state)]
        C = [refs[3 * k + 2] for k in range(n_state)]
        off = 3 * n_state
        gl = [refs[off + 2 * k] for k in range(4)]
        gh = [refs[off + 2 * k + 1] for k in range(4)]
        off += 8
        bc_vals = [refs[off + k][:] for k in range(n_bc)]
        off += n_bc
        out_int = refs[off:off + 4]
        out_gl = refs[off + 4:off + 8]
        out_gh = refs[off + 8:off + 12]

        def window(k, ghosted):
            # (SLAB+2, Wp) frame: halo row above (carried ghost at the first
            # slab), the slab's cell rows, halo row below (ghost at the last)
            a = A[k][:]
            top = B[k][7:8, :]
            bot = C[k][0:1, :]
            if ghosted:
                top = jnp.where(is_lo, gl[k][7:8, :], top)
                bot = jnp.where(is_hi, gh[k][0:1, :], bot)
            else:  # sc: edge-padded ghost rows (zero-gradient sensor)
                top = jnp.where(is_lo, a[0:1, :], top)
                bot = jnp.where(is_hi, a[SLAB - 1:SLAB, :], bot)
            return jnp.concatenate([top, a, bot], axis=0)

        wp_, wT, wux, wuy = (window(k, True) for k in range(4))
        wsc = window(4, False) if has_varsc else None

        out_co = refs[off + 12]
        out_tau = refs[off + 13]
        out_sc = refs[off + 14] if fold_sc else None
        out_sc1 = refs[off + 15] if fold_sc else None
        out_chg = refs[off + 16] if fold_sc else None

        def emit(k, body, glo, ghi):
            out_int[k][:] = body[1:SLAB + 1]

            @pl.when(is_lo)
            def _():
                out_gl[k][:] = jnp.broadcast_to(glo, (8, Wp))

            @pl.when(is_hi)
            def _():
                out_gh[k][:] = jnp.broadcast_to(ghi, (8, Wp))

        def emit_dt(co_rate, tau_min):
            out_co[:] = jnp.full((8, LANE), co_rate, dtype)
            out_tau[:] = jnp.full((8, LANE), tau_min, dtype)

        emit_sc = None
        if fold_sc:
            def emit_sc(sc_raw, sc_s1, chg):
                out_sc[:] = sc_raw[1:SLAB + 1]
                out_sc1[:] = sc_s1[1:SLAB + 1]
                out_chg[:] = jnp.full((8, LANE), chg, dtype)

        frame(dt_ref[0, 0], (is_lo, is_hi, True, True),
              wp_, wT, wux, wuy, wsc, bc_vals, emit=emit, emit_dt=emit_dt,
              emit_sc=emit_sc)

    vm = pltpu.VMEM
    a_spec = pl.BlockSpec((SLAB, Wp), lambda i: (i, 0), memory_space=vm)
    b_spec = pl.BlockSpec((8, Wp),
                          lambda i: (jnp.maximum(i * sb8 - 1, 0), 0),
                          memory_space=vm)
    c_spec = pl.BlockSpec((8, Wp),
                          lambda i: (jnp.minimum((i + 1) * sb8, nb8 - 1), 0),
                          memory_space=vm)
    g_spec = pl.BlockSpec((8, Wp), lambda i: (0, 0), memory_space=vm)
    r_spec = pl.BlockSpec((8, LANE), lambda i: (i, 0), memory_space=vm)
    bc_specs = [pl.BlockSpec(arr.shape, lambda i, nd=arr.ndim: (0,) * nd,
                             memory_space=vm) for arr in bc_inputs]
    fshape = jax.ShapeDtypeStruct((nx, Wp), dtype)
    gshape = jax.ShapeDtypeStruct((8, Wp), dtype)
    rshape = jax.ShapeDtypeStruct((n_slabs * 8, LANE), dtype)
    pcall = pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [a_spec, b_spec, c_spec] * n_state
        + [g_spec] * 8 + bc_specs,
        out_specs=[a_spec] * 4 + [g_spec] * 8 + [r_spec] * 2
        + ([a_spec, a_spec, r_spec] if fold_sc else []),
        out_shape=[fshape] * 4 + [gshape] * 8 + [rshape] * 2
        + ([fshape, fshape, rshape] if fold_sc else []),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )

    f = float
    dx, dy = f(mesh.dx[0][0]), f(mesh.dx[1][0])
    R, gamma = f(th.R), f(th.gamma)
    alpha = f(tm.alpha)

    def _init_rates(ts: TiledState):
        """Courant/tau RATES of the carried frames (QGDCourantNo.H without
        the dt factor) — used once at to_fused time; thereafter the kernel
        emits per-slab partials over its fresh outputs and the step only
        strip-completes the inter-slab faces."""
        TI = ts.T[:, :W]
        uxI = ts.ux[:, :W]
        uyI = ts.uy[:, :W]
        gRT = (gamma * R) * TI
        rcs = jax.lax.rsqrt(gRT)
        c = gRT * rcs

        def snd(Trow):
            g = (gamma * R) * Trow
            return g * jax.lax.rsqrt(g)

        # acoustic Courant: x-faces = interior row pairs + the two boundary
        # faces against the carried ghost rows; live lanes 1..M
        Tgl, Tgh = ts.gl[1][7:8, :W], ts.gh[1][0:1, :W]
        ugl, ugh = ts.gl[2][7:8, :W], ts.gh[2][0:1, :W]
        wave_in = (jnp.abs(0.5 * (uxI[:-1] + uxI[1:]))
                   + 0.5 * (c[:-1] + c[1:]))[:, 1:M + 1]
        wave_lo = (jnp.abs(0.5 * (ugl + uxI[0:1]))
                   + 0.5 * (snd(Tgl) + c[0:1]))[:, 1:M + 1]
        wave_hi = (jnp.abs(0.5 * (uxI[-1:] + ugh))
                   + 0.5 * (c[-1:] + snd(Tgh)))[:, 1:M + 1]
        wx = jnp.maximum(jnp.max(wave_in),
                         jnp.maximum(jnp.max(wave_lo), jnp.max(wave_hi)))
        # y-faces: every cell row, faces at lanes 0..M (lane ghosts live)
        wy = jnp.max(jnp.abs(0.5 * (uyI[:, :-1] + uyI[:, 1:]))
                     + 0.5 * (c[:, :-1] + c[:, 1:]))
        co_rate = jnp.maximum(wx / dx, wy / dy)

        # min face tau with zero-gradient coefficient ghosts: boundary faces
        # collapse to the edge-cell value; the division/mult by positive
        # scalars is monotone and correctly rounded, so min(a/c_f)*h equals
        # the kernel's per-face min exactly
        if has_varsc:
            cin = c[:, 1:M + 1]
            cfx = jnp.maximum(jnp.max(0.5 * (cin[:-1] + cin[1:])),
                              jnp.maximum(jnp.max(cin[0:1]),
                                          jnp.max(cin[-1:])))
            cfy = jnp.maximum(jnp.max(0.5 * (c[:, 1:M] + c[:, 2:M + 1])),
                              jnp.maximum(jnp.max(c[:, 1:2]),
                                          jnp.max(c[:, M:M + 1])))
            tau_min = jnp.minimum((alpha / cfx) * dx, (alpha / cfy) * dy)
        else:
            aoc = alpha * rcs
            ain = aoc[:, 1:M + 1]
            tfx = jnp.minimum(jnp.min(0.5 * (ain[:-1] + ain[1:])),
                              jnp.minimum(jnp.min(ain[0:1]),
                                          jnp.min(ain[-1:])))
            tfy = jnp.minimum(jnp.min(0.5 * (aoc[:, 1:M] + aoc[:, 2:M + 1])),
                              jnp.minimum(jnp.min(aoc[:, 1:2]),
                                          jnp.min(aoc[:, M:M + 1])))
            tau_min = jnp.minimum(tfx * dx, tfy * dy)
        return co_rate, tau_min

    def _strip_rates(Tn, uxn):
        """Inter-slab x-face Courant/tau rates from the FRESH frames: the
        kernel partials exclude faces against stale halos; this thin pass
        reads only the 2*(n_slabs-1) boundary rows.  Arithmetic mirrors the
        kernel's exactly (c = gRT*rsqrt, aoc = alpha*rsqrt) so the combined
        reduction is bitwise the whole-frame one."""
        lo = slice(SLAB - 1, nx - 1, SLAB)
        hi = slice(SLAB, nx, SLAB)
        T_lo, T_hi = Tn[lo, :W], Tn[hi, :W]
        u_lo, u_hi = uxn[lo, :W], uxn[hi, :W]
        g_lo, g_hi = (gamma * R) * T_lo, (gamma * R) * T_hi
        r_lo, r_hi = jax.lax.rsqrt(g_lo), jax.lax.rsqrt(g_hi)
        c_lo, c_hi = g_lo * r_lo, g_hi * r_hi
        wave = (jnp.abs(0.5 * (u_lo + u_hi))
                + 0.5 * (c_lo + c_hi))[:, 1:M + 1]
        co_rate = jnp.max(wave) * (1.0 / dx)
        if has_varsc:
            cf = (0.5 * (c_lo + c_hi))[:, 1:M + 1]
            tau = (alpha / jnp.max(cf)) * dx
        else:
            af = (0.5 * (alpha * r_lo + alpha * r_hi))[:, 1:M + 1]
            tau = jnp.min(af) * dx
        return co_rate, tau

    def _sc_strip_fix(sc_raw_cells, ts):
        """Recompute the raw sensor at the cell rows whose in-kernel
        x-gradient read a stale slab halo (rows i*S-1 and i*S per interior
        boundary), from the carried fresh frames — arithmetic mirrors the
        kernel's exactly."""
        def rho_rows(sl):
            row_p = ts.p[sl, :W]
            row_T = ts.T[sl, :W]
            r = row_p * (1.0 / (R * row_T))
            # zero-gradient lane ghosts (coefficient convention)
            return jnp.concatenate([r[:, 1:2], r[:, 1:-1], r[:, -2:-1]],
                                   axis=1)

        a = rho_rows(slice(SLAB - 2, nx - 2, SLAB))
        b = rho_rows(slice(SLAB - 1, nx - 1, SLAB))
        c_ = rho_rows(slice(SLAB, nx, SLAB))
        d = rho_rows(slice(SLAB + 1, nx + 1, SLAB))

        def shl1(x):
            return jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)

        def shr1(x):
            return jnp.concatenate([x[:, 0:1], x[:, :-1]], axis=1)

        def raw_row(rm, r0, rp, sc_prev_row):
            fa_lo = 0.5 * rm + 0.5 * r0
            fa_hi = 0.5 * r0 + 0.5 * rp
            gx = (fa_hi - fa_lo) / dx
            fb = 0.5 * r0 + 0.5 * shl1(r0)
            gy = (fb - shr1(fb)) / dy
            mag = jnp.sqrt(gx * gx + gy * gy)
            sc = (tm.rC * (mag * h_cell0 / r0)
                  + (1.0 - tm.rC) * sc_prev_row)
            sc = jnp.clip(sc, tm.minSc, tm.maxSc)
            return jnp.maximum(sc, float(tm.cqSc))

        sc_prev_b = ts.sc[slice(SLAB - 1, nx - 1, SLAB), :W]
        sc_prev_c = ts.sc[slice(SLAB, nx, SLAB), :W]
        row_b = raw_row(a, b, c_, sc_prev_b)[:, 1:M + 1]
        row_c = raw_row(b, c_, d, sc_prev_c)[:, 1:M + 1]
        sc_raw_cells = sc_raw_cells.at[SLAB - 1: nx - 1: SLAB].set(row_b)
        return sc_raw_cells.at[SLAB: nx: SLAB].set(row_c)

    h_cell0 = float(np.asarray(mesh.h_cell).reshape(-1)[0])

    def _s1_strip_fix(s1_cells, raw_cells):
        """Recompute the folded smooth ring at the cell rows whose 3x3
        neighbourhood touched a stale slab halo (rows i*S-2 .. i*S+1 per
        interior boundary) from the STRIP-FIXED raw frame; returns the
        repaired ring-1 cells and whether any repaired row changed
        (arithmetic mirrors qgdcoeffs._neighbour_max exactly)."""
        rows = np.asarray(sorted({
            r for i in range(1, n_slabs)
            for r in (i * SLAB - 2, i * SLAB - 1, i * SLAB, i * SLAB + 1)
            if 0 <= r < nx}))
        rm = raw_cells[np.clip(rows - 1, 0, nx - 1)]
        r0 = raw_cells[rows]
        rp = raw_cells[np.clip(rows + 1, 0, nx - 1)]
        le = jnp.concatenate([r0[:, :1], r0[:, :-1]], axis=1)
        ri = jnp.concatenate([r0[:, 1:], r0[:, -1:]], axis=1)
        nb = jnp.maximum(jnp.maximum(rm, rp), jnp.maximum(le, ri))
        f1 = jnp.maximum(r0, nb / (1.0 + float(tm.smoothCoeff)))
        return s1_cells.at[rows].set(f1), jnp.any(f1 > r0)

    def step(ts: TiledState) -> TiledState:
        dtv = ts.dt.astype(dtype)
        # setDeltaT from the CARRIED rates (emitted by the previous kernel
        # pass over its fresh fields + strip completion) — no frame reads
        dt_new = common.set_delta_t(dtv, ts.co_rate * dtv, ts.tau_rate, tc)
        dts = jnp.reshape(dt_new, (1, 1))
        frames = [ts.p, ts.T, ts.ux, ts.uy]
        sc_new = None
        if has_varsc:
            if fold_sc:
                sc_raw_c = ts.sc_raw[:, 1:M + 1]
                sc_s1_c = ts.sc_s1[:, 1:M + 1]
                chg = jnp.max(ts.sc_chg) > 0.0
                if n_slabs > 1:
                    sc_raw_c = _sc_strip_fix(sc_raw_c, ts)
                    sc_s1_c, chg_s = _s1_strip_fix(sc_s1_c, sc_raw_c)
                    chg = jnp.logical_or(chg, chg_s)
                from ..physics.qgdcoeffs import fvc_smooth_continue

                sc_int = fvc_smooth_continue(
                    sc_s1_c, chg, tm.smoothCoeff).astype(dtype)
            else:
                rho_int = th.rho_from_p_T(ts.p[:, 1:M + 1],
                                          ts.T[:, 1:M + 1])
                sc_int = tm.sc_update(mesh, rho_int,
                                      ts.sc[:, 1:M + 1]).astype(dtype)
            sc_new = jnp.pad(jnp.pad(sc_int, ((0, 0), (1, 1)), mode="edge"),
                             ((0, 0), (0, Wp - W)), mode="edge")
            frames.append(sc_new)
        ops = [dts]
        for fr in frames:
            ops += [fr, fr, fr]
        for k in range(4):
            ops += [ts.gl[k], ts.gh[k]]
        ops += list(bc_inputs)
        outs = pcall(*ops)
        co_rate = jnp.max(outs[12])
        tau_rate = jnp.min(outs[13])
        if n_slabs > 1:
            co_s, tau_s = _strip_rates(outs[1], outs[2])
            co_rate = jnp.maximum(co_rate, co_s)
            tau_rate = jnp.minimum(tau_rate, tau_s)
        return TiledState(p=outs[0], T=outs[1], ux=outs[2], uy=outs[3],
                          gl=tuple(outs[4:8]), gh=tuple(outs[8:12]),
                          t=ts.t + dt_new, dt=dt_new, sc=sc_new,
                          co_rate=co_rate, tau_rate=tau_rate,
                          sc_raw=outs[14] if fold_sc else None,
                          sc_s1=outs[15] if fold_sc else None,
                          sc_chg=outs[16] if fold_sc else None)

    to_fused0, from_fused = _make_tiled_state_io(solver, nx, M, Wp, dtype)

    def to_fused(s):
        ts = to_fused0(s)
        co_rate, tau_rate = _init_rates(ts)
        sc_raw = sc_s1 = sc_chg = None
        if fold_sc:
            from ..physics.qgdcoeffs import _neighbour_max

            rho_int = th.rho_from_p_T(ts.p[:, 1:M + 1], ts.T[:, 1:M + 1])
            raw = tm.sc_raw_update(mesh, rho_int,
                                   ts.sc[:, 1:M + 1]).astype(dtype)

            def lane_pad(a):
                return jnp.pad(jnp.pad(a, ((0, 0), (1, 1)), mode="edge"),
                               ((0, 0), (0, Wp - W)), mode="edge")

            f1 = jnp.maximum(raw, _neighbour_max(raw)
                             / (1.0 + float(tm.smoothCoeff))).astype(dtype)
            sc_raw = lane_pad(raw)
            sc_s1 = lane_pad(f1)
            sc_chg = jnp.full((n_slabs * 8, LANE),
                              jnp.where(jnp.any(f1 > raw), 1.0, 0.0),
                              dtype=dtype)
        return ts._replace(co_rate=co_rate, tau_rate=tau_rate,
                           sc_raw=sc_raw, sc_s1=sc_s1, sc_chg=sc_chg)

    return step, to_fused, from_fused


def _make_tiled_state_io(solver, nx, M, Wp, dtype):
    """(to_fused, from_fused) between the composable QGDFoam State and the
    TiledState cell-row + ghost-tile layout."""
    from ..solvers.qgd import State
    from ..ops.pad import ghost_pad

    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    has_varsc = isinstance(tm, VarScModel5)
    flux_sides = solver._flux_sides()
    bc_U, bc_p, bc_T = solver._bcs()
    W = M + 2
    dx = float(mesh.dx[0][0])

    def _lane_pad(arr):
        return jnp.pad(arr.astype(dtype), ((0, 0), (0, Wp - W)), mode="edge")

    def to_fused(s: "State") -> TiledState:
        bc_pp = bc_p
        for i, (a, side) in enumerate(flux_sides):
            bc_pp = bc_pp.replace(a, side, bcm.FixedGradient(s.pbc[i]))
        U, e, T, p = solver.primitives(s)
        bc_Ur = bcm.resolve_inlet_outlet(bc_U, U, 2)
        bc_pp = bcm.resolve_inlet_outlet(bc_pp, U, 2)
        bc_Tr = bcm.resolve_inlet_outlet(bc_T, U, 2)
        Upad = ghost_pad(U, bc_Ur, mesh, t=s.t, vector=True)
        frames = (_lane_pad(ghost_pad(p, bc_pp, mesh, t=s.t)),
                  _lane_pad(ghost_pad(T, bc_Tr, mesh, t=s.t)),
                  _lane_pad(Upad[0]), _lane_pad(Upad[1]))
        ints = tuple(fr[1:-1] for fr in frames)
        gls = tuple(jnp.broadcast_to(fr[0:1], (8, Wp)) for fr in frames)
        ghs = tuple(jnp.broadcast_to(fr[-1:], (8, Wp)) for fr in frames)
        sc = None
        if has_varsc:
            sc = _lane_pad(jnp.pad(s.sc.astype(dtype), ((0, 0), (1, 1)),
                                   mode="edge"))
        return TiledState(p=ints[0], T=ints[1], ux=ints[2], uy=ints[3],
                          gl=gls, gh=ghs, t=s.t, dt=s.dt, sc=sc)

    def from_fused(ts: TiledState) -> "State":
        p = ts.p[:, 1:M + 1]
        T = ts.T[:, 1:M + 1]
        U = jnp.stack([ts.ux[:, 1:M + 1], ts.uy[:, 1:M + 1]])
        rho = th.rho_from_p_T(p, T)
        e = th.e_from_T(T)
        # lagged qgdFlux gradients recovered from the carried p ghost rows
        pbc = []
        for a, side in flux_sides:
            if side == 0:
                g = (ts.gl[0][7:8, 1:M + 1] - p[0:1]) * (1.0 / dx)
            else:
                g = (ts.gh[0][0:1, 1:M + 1] - p[-1:]) * (1.0 / dx)
            pbc.append(g)
        sc = (ts.sc[:, 1:M + 1] if has_varsc
              else jnp.full_like(rho, tm.Sc))
        return State(rho=rho, rhoU=rho[None] * U,
                     rhoE=rho * e + 0.5 * rho * jnp.sum(U * U, axis=0),
                     sc=sc, t=ts.t, dt=ts.dt, pbc=tuple(pbc))

    return to_fused, from_fused
