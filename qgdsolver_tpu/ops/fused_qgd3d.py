"""Fused 3D QGDFoam step: an x-slab Mosaic-pipelined Pallas kernel.

The reference's primary workload is 3D (GaussVolPointBase3D is its largest
single component, GaussVolPointBase3D_8C_source.html:41-963); until now 3D
ran the composable XLA step at ~1600 B/point of HBM traffic.  This kernel
fuses the whole explicit step (updateFields + updateFluxes + RhoEqn/UEqn/
EEqn + ghost refresh, QGDFoam_8C_source.html:90-163) into one pallas_call
so each field is read and written once per step (~40 B/point).

Layout (f32):
  * cell-plane frames (nx, NYp, Wp): y is the SUBLANE axis (ghost sublanes
    0 and ny+1, dead padding to NYp = ceil8(ny+2)), z is the LANE axis
    (ghost lanes 0 and nz+1, dead padding to Wp = ceil128(nz+2));
  * carried x-ghost planes gl/gh: (1, NYp, Wp) per field.

Grid = (nx/SLAB,): program i reads, per field, its (SLAB, NYp, Wp) block
plus ONE neighbour plane above and below (x is the UNTILED leading axis, so
1-plane halo blocks are legal — unlike the 2D kernel's 8-row tiles), builds
the (SLAB+2, NYp, Wp) window, runs the 3-axis physics (y/z neighbours via
pltpu.roll, x via leading-axis concat/slice), and writes the fresh planes;
edge slabs also refresh gl/gh.  Mosaic double-buffers all blocks, so HBM
load of slab i+1 overlaps compute of slab i.

dt (QGDCourantNo + setDeltaT, QGDCourantNo_8H_source.html:44-50 /
setDeltaT-QGDQHD_8H:41-61) is an XLA pre-pass over the frames, exactly as
in the 2D tiled pipeline (the reduction spans every slab).

Scope (r5, the FLAGSHIP feature set): constScPrModel1 family AND
varScModel5 (raw sensor folded in-kernel over the fresh fields, the
fvc::smooth fixed point + slab-boundary strip fix as the XLA pre-pass —
the 2D tiled recipe), perfect-gas + const transport, explicit diffusion,
qgdFlux p-BC on the x sides (ghost planes computed in-kernel from this
step's phiwStar/tau_f boundary faces), and array-valued/static-callable
BC plane profiles on the x sides (3D jet inlets).  y/z sides keep
scalar simple BCs.  Everything else falls back to the composable step.

`build_sharded_fused_step_3d` decomposes the pipeline over an x-ring of
devices: each shard runs the tiled kernel on its x-range with the carried
gl/gh planes holding the neighbour shard's fresh edge planes (ppermute
exchange after each step), dt partials pmax/pmin-reduced, and the varsc
sensor smooth running under the spmd context so its wave crosses shards.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import bc as bcm
from ..physics.thermo import PerfectGasThermo, ConstTransport
from ..physics.qgdcoeffs import ConstScPrModel1, VarScModel5
from ..solvers import common
from . import fvsc

LANE = 128

# Live-set model: the 3-axis straight-line body holds ~70 (SLAB+2, NYp, Wp)
# f32 temporaries at peak (axis fluxes accumulated per axis), plus the
# pipeline's double-buffered blocks.  Calibrated against the bench chip's
# 120 MB scoped VMEM like the 2D models (fused_qgd2d.py).
LIVE_FRAMES_3D = 70
VMEM_BUDGET_3D = 100 * 1024 * 1024


class Fused3DState(tp.NamedTuple):
    """Carried frames: 5 primitives as (nx, NYp, Wp) cell-plane frames plus
    (1, NYp, Wp) x-ghost planes per field (p, T, ux, uy, uz order).  For
    varScModel5 configs, `sc` carries the smoothed sensor frame (edge
    ghost sublanes/lanes) and `sc_raw` the kernel-emitted RAW sensor of
    the CURRENT fields (slab-boundary planes strip-fixed before the
    fvc::smooth pre-pass — the 2D tiled recipe)."""

    p: jax.Array
    T: jax.Array
    ux: jax.Array
    uy: jax.Array
    uz: jax.Array
    gl: tp.Tuple[jax.Array, ...]
    gh: tp.Tuple[jax.Array, ...]
    t: jax.Array
    dt: jax.Array
    sc: tp.Any = None
    sc_raw: tp.Any = None


def _slab_bytes(slab: int, nyp: int, wp: int, n_state: int = 5) -> int:
    plane = nyp * wp * 4
    body = (LIVE_FRAMES_3D + 3 * (n_state - 5)) * (slab + 2) * plane
    io = 2 * 2 * (n_state + 1) * slab * plane  # double-buffered ins + outs
    halo = 2 * 2 * 5 * 4 * plane    # b/c/gl/gh blocks
    return body + io + halo


def pick_slab(nx: int, nyp: int, wp: int, n_state: int = 5
              ) -> tp.Optional[int]:
    for slab in (64, 32, 16, 8, 4, 2, 1):
        if slab <= nx and nx % slab == 0 \
                and _slab_bytes(slab, nyp, wp, n_state) <= VMEM_BUDGET_3D:
            return slab
    return None


def _scalar_bc(bc, axis, side, comp=None):
    """-> (kind, value, sign) for the in-kernel ghost formula; None if the
    BC is not representable (array/callable values, flux BCs, ...)."""
    if isinstance(bc, bcm.ZeroGradient):
        return ("zg", 0.0, 1.0)
    if isinstance(bc, bcm.Symmetry):
        sign = -1.0 if (comp is not None and comp == axis) else 1.0
        return ("sym", 0.0, sign)
    if isinstance(bc, bcm.Extrapolated):
        return ("extrap", 0.0, 1.0)
    if isinstance(bc, (bcm.FixedValue, bcm.FixedGradient, bcm.InletOutlet)):
        raw = (bc.value if isinstance(bc, bcm.FixedValue)
               else bc.grad if isinstance(bc, bcm.FixedGradient)
               else bc.inlet_value)
        if callable(raw):
            return None
        v = np.asarray(raw, dtype=np.float64)
        if comp is not None and v.ndim >= 1 and v.shape[0] >= comp + 1:
            v = v[comp]
        if np.asarray(v).size != 1:
            return None  # spatial profiles: composable fallback (for now)
        kind = ("fixed" if isinstance(bc, bcm.FixedValue)
                else "grad" if isinstance(bc, bcm.FixedGradient) else "io")
        return (kind, float(np.asarray(v).reshape(())), 1.0)
    return None


def _plane_value(bc, mesh, side, comp=None):
    """Evaluate an x-side BC's value/gradient spec to a static (ny, nz)
    plane, or None if not static.  Callables are evaluated on the ghost
    layer coordinates at two times (t=0, t=1) and must agree (the 2D
    `_value_is_static` rule: time-dependent BCs stay composable)."""
    raw = (bc.value if isinstance(bc, bcm.FixedValue)
           else bc.grad if isinstance(bc, bcm.FixedGradient)
           else bc.inlet_value)
    ny, nz = mesh.shape[1], mesh.shape[2]
    if callable(raw):
        coords = []
        for b in range(3):
            if b == 0:
                c = jnp.asarray(mesh.x_faces[0][0 if side == 0 else -1],
                                dtype=np.float64).reshape((1, 1, 1))
            else:
                vals = mesh.centers[b]
                shape = [1, 1, 1]
                shape[b] = len(vals)
                c = jnp.asarray(vals, dtype=np.float64).reshape(shape)
            coords.append(c)
        try:
            v0 = np.asarray(raw(0.0, tuple(coords)), dtype=np.float64)
            v1 = np.asarray(raw(1.0, tuple(coords)), dtype=np.float64)
        except Exception:  # noqa: BLE001 — non-static callables
            return None
        if not np.allclose(v0, v1, rtol=0.0, atol=0.0):
            return None
        v = v0
        if comp is not None and v.ndim >= 3 and v.shape[0] >= comp + 1:
            v = v[comp]
        v = np.squeeze(np.asarray(v))
    else:
        v = np.asarray(raw, dtype=np.float64)
        if comp is not None and v.ndim >= 1 and v.shape[0] >= comp + 1:
            v = v[comp]
        v = np.squeeze(v)
    try:
        return np.broadcast_to(v, (ny, nz)).astype(np.float64)
    except ValueError:
        return None


def _x_bc_spec(bc, side, comp, mesh, planes):
    """BC spec for an x side: scalar kinds as `_scalar_bc`, array/static-
    callable values as ("*_arr", plane_index, 1.0) with the padded plane
    appended to `planes`.  None -> unsupported."""
    sc = _scalar_bc(bc, 0, side, comp)
    if sc is not None:
        return sc
    if isinstance(bc, bcm.QGDFluxP):
        return ("qgdflux", 0.0, 1.0)
    if not isinstance(bc, (bcm.FixedValue, bcm.FixedGradient,
                           bcm.InletOutlet)):
        return None
    v = _plane_value(bc, mesh, side, comp)
    if v is None:
        return None
    kind = ("fixed_arr" if isinstance(bc, bcm.FixedValue)
            else "grad_arr" if isinstance(bc, bcm.FixedGradient)
            else "io_arr")
    planes.append(v)
    return (kind, len(planes) - 1, 1.0)


def supported(solver) -> bool:
    """True if the 3D fused kernel covers this config."""
    from ..solvers.qgd import QGDFoam

    if type(solver) is not QGDFoam:
        return False
    mesh = solver.mesh
    if mesh.ndim != 3:
        return False
    if getattr(mesh, "axisymmetric", False) or getattr(mesh, "solid",
                                                       None) is not None:
        return False
    if np.dtype(mesh.dtype) != np.float32:
        return False
    for a in range(3):
        d = mesh.dx[a]
        if not np.allclose(d, d[0]):
            return False
    if not isinstance(solver.thermo, PerfectGasThermo):
        return False
    if not isinstance(solver.thermo.transport, ConstTransport):
        return False
    tm = solver.tau_model
    if isinstance(tm, VarScModel5):
        # per-cell cqSc floors / const-Sc cellSets: composable fallback
        if np.ndim(tm.cqSc) != 0 or tm.const_sc_mask is not None:
            return False
    elif not isinstance(tm, ConstScPrModel1):
        return False
    elif type(tm).__name__ not in ("ConstScPrModel1", "ConstScPrModel1n",
                                   "ConstScPrModel2"):
        return False
    if solver.implicit_diffusion:
        return False
    # qgdFlux p-BC: x sides only (the lagged dp/dn ghost planes are
    # computed in-kernel from this step's boundary-face fluxes)
    if any(a != 0 for a, _ in solver._flux_sides()):
        return False
    if (getattr(solver, "qgdflux_limit", None) is not None
            or getattr(solver, "qgdflux_relax", 1.0) != 1.0):
        return False
    for term in ("grad(U)", "grad(e)", "grad(rho)", "grad(p)"):
        if fvsc.scheme_for(solver.fvsc_scheme, term) != "full":
            return False
    bc_U, bc_p, bc_T = solver._bcs()
    scratch = []
    for bcs, vec in ((bc_p, False), (bc_T, False), (bc_U, True)):
        for a in range(3):
            for side in (0, 1):
                comps = range(3) if vec else (None,)
                for c in comps:
                    if a == 0:
                        ok = _x_bc_spec(bcs[a, side], side, c, mesh,
                                        scratch) is not None
                    else:
                        ok = _scalar_bc(bcs[a, side], a, side, c) is not None
                    if not ok:
                        return False
    nx, ny, nz = mesh.shape
    nyp = -(-(ny + 2) // 8) * 8
    wp = max(LANE, -(-(nz + 2) // LANE) * LANE)
    n_state = 6 if isinstance(tm, VarScModel5) else 5
    return pick_slab(nx, nyp, wp, n_state) is not None


def build_fused_step_3d(solver, interpret: tp.Optional[bool] = None,
                        slab: tp.Optional[int] = None,
                        _distributed: bool = False,
                        _local_nx: tp.Optional[int] = None):
    """(step, to_fused, from_fused) for a supported 3D QGDFoam solver.

    _distributed/_local_nx: internal — build the slab pipeline over a
    shard's local x-range for `build_sharded_fused_step_3d`; returns the
    raw pieces instead of the serial step closure.
    """
    from ..solvers.qgd import State
    from .pad import ghost_pad

    assert supported(solver), "config not supported by the 3D fused kernel"
    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    tc = solver.time
    has_varsc = isinstance(tm, VarScModel5)
    n_state = 6 if has_varsc else 5
    nx_g, ny, nz = mesh.shape
    nx = _local_nx if _local_nx is not None else nx_g
    NYp = -(-(ny + 2) // 8) * 8
    Wp = max(LANE, -(-(nz + 2) // LANE) * LANE)
    dtype = np.dtype(mesh.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    S = slab if slab is not None else pick_slab(nx, NYp, Wp, n_state)
    assert S is not None and nx % S == 0, (nx, S)
    n_slabs = nx // S

    f = float
    dx, dy, dz = (f(mesh.dx[a][0]) for a in range(3))
    d_ = (dx, dy, dz)
    vol = dx * dy * dz
    area = tuple(vol / d_[a] for a in range(3))
    h_cell = f(np.asarray(mesh.h_cell).reshape(-1)[0])
    R, Cv, gamma = f(th.R), f(th.Cv), f(th.gamma)
    Pr_th, alpha, Pr_tau = f(th.Pr), f(tm.alpha), f(tm.Pr)
    Sc = 0.0 if has_varsc else f(tm.Sc)
    mu0 = f(th.transport.mu0)
    flux_sides = solver._flux_sides()
    qf_lo = (0, 0) in flux_sides
    qf_hi = (0, 1) in flux_sides

    # static per-field BC tables + x-side plane profiles
    bc_U, bc_p, bc_T = solver._bcs()
    planes_np = []
    specs = {}
    for name, bcs, comp in (("p", bc_p, None), ("T", bc_T, None),
                            ("ux", bc_U, 0), ("uy", bc_U, 1),
                            ("uz", bc_U, 2)):
        rows = []
        for a in range(3):
            row = []
            for side in (0, 1):
                if a == 0:
                    row.append(_x_bc_spec(bcs[a, side], side, comp, mesh,
                                          planes_np))
                else:
                    row.append(_scalar_bc(bcs[a, side], a, side, comp))
            rows.append(tuple(row))
        specs[name] = tuple(rows)

    def _pad_plane(v):
        # (ny, nz) -> (1, NYp, Wp) with one edge-replicated ghost ring
        # (live at sublanes/lanes 1..n; the x-ghost formula runs BEFORE
        # y_z_ghosts, so only live positions matter)
        v = np.pad(np.asarray(v, dtype=np.float64), ((1, 1), (1, 1)),
                   mode="edge")
        v = np.pad(v, ((0, NYp - (ny + 2)), (0, Wp - (nz + 2))),
                   mode="edge")
        return jnp.asarray(v[None], dtype=dtype)

    bc_planes = tuple(_pad_plane(v) for v in planes_np)
    n_planes = len(bc_planes)

    rC = f(getattr(tm, "rC", 0.0))
    minSc = f(getattr(tm, "minSc", 0.0))
    maxSc = f(getattr(tm, "maxSc", 1.0))
    cqSc = f(getattr(tm, "cqSc", 0.0)) if has_varsc else 0.0

    FLD = ("p", "T", "ux", "uy", "uz")

    def kernel(dt_ref, fl_ref, *refs):
        i = pl.program_id(0)
        is_lo = i == 0
        is_hi = i == n_slabs - 1
        glob_lo = fl_ref[0, 0] > 0
        glob_hi = fl_ref[0, 1] > 0
        is_lo_g = jnp.logical_and(is_lo, glob_lo)
        is_hi_g = jnp.logical_and(is_hi, glob_hi)
        A = [refs[3 * k] for k in range(n_state)]
        B = [refs[3 * k + 1] for k in range(n_state)]
        C = [refs[3 * k + 2] for k in range(n_state)]
        off = 3 * n_state
        gl = [refs[off + 2 * k] for k in range(n_state)]
        gh = [refs[off + 2 * k + 1] for k in range(n_state)]
        off += 2 * n_state
        bpl = [refs[off + j][:] for j in range(n_planes)]
        off += n_planes
        out_int = refs[off:off + 5]
        out_gl = refs[off + 5:off + 10]
        out_gh = refs[off + 10:off + 15]
        out_sc = refs[off + 15] if has_varsc else None
        dtv = dt_ref[0, 0]

        def window(k):
            a = A[k][:]
            top = jnp.where(is_lo, gl[k][:], B[k][:])
            bot = jnp.where(is_hi, gh[k][:], C[k][:])
            return jnp.concatenate([top, a, bot], axis=0)

        ph, Th, ux, uy, uz = (window(k) for k in range(5))
        wsc = window(5) if has_varsc else None
        u3 = (ux, uy, uz)

        # ---- neighbour access helpers --------------------------------------
        def up(x, a):      # up(x)[r] = x[r+1] along axis a
            if a == 0:
                return jnp.concatenate([x[1:], x[-1:]], axis=0)
            n = x.shape[a]
            return pltpu.roll(x, shift=n - 1, axis=a)

        def dn(x, a):      # dn(x)[r] = x[r-1] along axis a
            if a == 0:
                return jnp.concatenate([x[0:1], x[:-1]], axis=0)
            return pltpu.roll(x, shift=1, axis=a)

        def tan(x, b):     # central d/dx_b at the current positions
            return (up(x, b) - dn(x, b)) * (1.0 / (2.0 * d_[b]))

        rowid = jax.lax.broadcasted_iota(jnp.int32, (1, NYp, 1), 1)
        colid = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wp), 2)

        # ---- pointwise thermo on the padded window (hePsiQGDThermo) --------
        rho = ph / (R * Th)
        e = Cv * Th
        gRT = (gamma * R) * Th
        rcs = jax.lax.rsqrt(gRT)
        ru = tuple(rho * u for u in u3)
        ke = ux * ux + uy * uy + uz * uz
        H = (Cv + R) * Th + 0.5 * ke
        aoc = alpha * rcs
        cs = gRT * rcs   # sound speed (varsc tau_f interpolates c)
        if has_varsc:
            mu_qgd = ((alpha * h_cell) * wsc * ph) * rcs
        else:
            mu_qgd = ((Sc * alpha * h_cell) * ph) * rcs
        if mu0 == 0.0:
            mu_eff = mu_qgd
            alphau_eff = None   # alphau = mu/Pr_tau, applied at faces
        else:
            mu_eff = mu_qgd + mu0
            alphau_eff = mu_qgd * (1.0 / Pr_tau) + mu0 * (1.0 / Pr_th)

        def zg_override(fld):
            # coefficient-field ghosts: zero-gradient at PHYSICAL edges;
            # slab/shard-interior halo planes keep the neighbour value
            first = jnp.where(is_lo_g, fld[1:2], fld[0:1])
            last = jnp.where(is_hi_g, fld[S:S + 1], fld[S + 1:S + 2])
            fld = jnp.concatenate([first, fld[1:S + 1], last], axis=0)
            # sublane/lane ghosts copy the adjacent interior value:
            # up(fld)[0] = fld[1] (lo ghost), dn(fld)[n+1] = fld[n] (hi)
            fld = jnp.where(rowid == 0, up(fld, 1),
                            jnp.where(rowid == ny + 1, dn(fld, 1), fld))
            fld = jnp.where(colid == 0, up(fld, 2),
                            jnp.where(colid == nz + 1, dn(fld, 2), fld))
            return fld

        aoc = zg_override(aoc)
        cz = zg_override(cs) if has_varsc else None
        mu_eff = zg_override(mu_eff)
        if alphau_eff is not None:
            alphau_eff = zg_override(alphau_eff)

        # ---- per-axis face fluxes, accumulated into cell divergences ------
        acc = [None] * 5   # rho, m0, m1, m2, E
        ws_x = None
        tauf_x = None

        for a in range(3):
            def aint(x, _a=a):
                return 0.5 * (x + up(x, _a))

            def asn(x, _a=a):
                return (up(x, _a) - x) * (1.0 / d_[_a])

            tang = [b for b in range(3) if b != a]
            pf = aint(ph)
            rf = aint(rho)
            ef = aint(e)
            Hf = aint(H)
            uf = [aint(u3[j]) for j in range(3)]
            ruf = [aint(ru[j]) for j in range(3)]
            muf = aint(mu_eff)
            af = (muf * (1.0 / Pr_tau) if alphau_eff is None
                  else aint(alphau_eff))
            if has_varsc:
                # reference varScModel5 tau_f: interp(a)/interp(c)*h_f
                # (varScModel5_8C_source.html:204-205)
                tauf = (alpha / aint(cz)) * d_[a]
            else:
                tauf = aint(aoc) * d_[a]
            urr = [aint(u3[a] * ru[k]) for k in range(3)]

            # gradient tensor at a-faces: gU[i][j] = dU_j/dx_i
            gU = [[None] * 3 for _ in range(3)]
            for j in range(3):
                gU[a][j] = asn(u3[j])
                for b in tang:
                    gU[b][j] = tan(uf[j], b)
            gR = [None] * 3
            gP = [None] * 3
            ge = [None] * 3
            gR[a] = asn(rho)
            gP[a] = asn(ph)
            ge[a] = asn(e)
            for b in tang:
                gR[b] = tan(rf, b)
                gP[b] = tan(pf, b)
                ge[b] = tan(ef, b)

            divU = gU[0][0] + gU[1][1] + gU[2][2]
            u_gradrho = sum(uf[i] * gR[i] for i in range(3))
            rg = sum(ruf[i] * gU[i][a] for i in range(3))
            ws = tauf * (u_gradrho * uf[a] + ruf[a] * divU + rg)
            if a == 0:
                ws_x = ws          # phiwStar/|Sf| at x faces (tau included)
                tauf_x = tauf
            jm = ruf[a] - (ws + tauf * gP[a])
            u_gradp = sum(uf[i] * gP[i] for i in range(3))
            iso = u_gradp + gamma * pf * divU
            pi = []
            for j in range(3):
                pij = tauf * (
                    sum(urr[k] * gU[k][j] for k in range(3))
                    + uf[a] * gP[j] + (iso if j == a else 0.0))
                pij = pij + muf * (
                    gU[a][j] + gU[j][a]
                    - ((2.0 / 3.0) * divU if j == a else 0.0))
                pi.append(pij)
            inv_rf2 = pf / (rf * rf)
            de = [ge[k] - inv_rf2 * gR[k] for k in range(3)]
            q = -tauf * sum(urr[k] * de[k] for k in range(3)) - af * ge[a]

            Aa = area[a]
            phiJm = jm * Aa
            fl = [phiJm,
                  phiJm * uf[0] + Aa * ((pf if a == 0 else 0.0) - pi[0]),
                  phiJm * uf[1] + Aa * ((pf if a == 1 else 0.0) - pi[1]),
                  phiJm * uf[2] + Aa * ((pf if a == 2 else 0.0) - pi[2]),
                  phiJm * Hf + Aa * (q - (pi[0] * uf[0] + pi[1] * uf[1]
                                          + pi[2] * uf[2]))]
            for k in range(5):
                dflux = fl[k] - dn(fl[k], a)
                acc[k] = dflux if acc[k] is None else acc[k] + dflux

        # ---- explicit update ----------------------------------------------
        sdt = dtv * (1.0 / vol)
        rhon = rho - sdt * acc[0]
        run_ = [ru[j] - sdt * acc[1 + j] for j in range(3)]
        rhoE = rho * (e + 0.5 * ke)
        rhoEn = rhoE - sdt * acc[4]
        inv_rhon = 1.0 / rhon
        un = [r_ * inv_rhon for r_ in run_]
        en = rhoEn * inv_rhon - 0.5 * (un[0] * un[0] + un[1] * un[1]
                                       + un[2] * un[2])
        Tn = en * (1.0 / Cv)
        pn = rhon * R * Tn

        fields = {"p": pn, "T": Tn, "ux": un[0], "uy": un[1], "uz": un[2]}

        # ---- RAW varScModel5 sensor over the FRESH fields ------------------
        # (VarScModel5.sc_raw_update folded in-kernel — the 2D tiled
        # recipe; rows bordering slab halos are strip-fixed XLA-side)
        if has_varsc:
            # rho recomputed from the STORED fresh p/T (not the
            # conservative rhon): the XLA strip fix reads the frames and
            # must reproduce these bits exactly (the 2D recipe)
            rg_ = pn * (1.0 / (R * Tn))
            first = jnp.where(is_lo_g, rg_[1:2], rg_[0:1])
            last = jnp.where(is_hi_g, rg_[S:S + 1], rg_[S + 1:S + 2])
            rg_ = jnp.concatenate([first, rg_[1:S + 1], last], axis=0)
            rg_ = jnp.where(rowid == 0, up(rg_, 1),
                            jnp.where(rowid == ny + 1, dn(rg_, 1), rg_))
            rg_ = jnp.where(colid == 0, up(rg_, 2),
                            jnp.where(colid == nz + 1, dn(rg_, 2), rg_))
            gx = tan(rg_, 0)
            gy = tan(rg_, 1)
            gz = tan(rg_, 2)
            mag = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            sraw = (rC * (mag * h_cell / rg_)
                    + (1.0 - rC) * wsc)
            sraw = jnp.clip(sraw, minSc, maxSc)
            sraw = jnp.maximum(sraw, cqSc)
            out_sc[:] = sraw[1:S + 1]

        # ---- ghost application (sequential-axis pad semantics: x planes
        # first, then y sublanes over everything, then z lanes) -------------
        def ghost(spec, interior, interior2, d_ax, un_adj, side):
            kind, v, sign = spec
            if kind == "zg":
                return interior
            if kind == "sym":
                return interior if sign == 1.0 else -interior
            if kind == "extrap":
                return 2.0 * interior - interior2
            if kind == "fixed":
                return 2.0 * v - interior
            if kind == "fixed_arr":
                return 2.0 * bpl[v] - interior
            if kind == "grad_arr":
                return interior + bpl[v] * d_ax
            if kind == "io":
                outflow = (un_adj < 0) if side == 0 else (un_adj > 0)
                return jnp.where(outflow, interior, 2.0 * v - interior)
            if kind == "io_arr":
                outflow = (un_adj < 0) if side == 0 else (un_adj > 0)
                return jnp.where(outflow, interior, 2.0 * bpl[v] - interior)
            if kind == "qgdflux":
                # dp/dn = -phiwStar/(tau_f*|Sf|): the area cancels leaving
                # ws/tau_f at the boundary face — this step's fluxes,
                # exactly the reference's registered-field lag
                # (qgdFluxFvPatchScalarField_8C updateCoeffs)
                if side == 0:
                    return interior + (ws_x[0:1] / tauf_x[0:1]) * d_ax
                return interior - (ws_x[S:S + 1] / tauf_x[S:S + 1]) * d_ax
            return interior + v * d_ax   # fixedGradient, outward normal

        def y_z_ghosts(name, arr, un_y, un_z):
            # y sublanes (axis 1), then z lanes (axis 2) — each ghost layer
            # computed from the already-padded previous axes
            sp = specs[name]
            lo = ghost(sp[1][0], arr[:, 1:2, :], arr[:, 2:3, :], dy,
                       un_y[:, 1:2, :], 0)
            hi = ghost(sp[1][1], arr[:, ny:ny + 1, :],
                       arr[:, ny - 1:ny, :], dy, un_y[:, ny:ny + 1, :], 1)
            arr = jnp.where(rowid == 0, lo,
                            jnp.where(rowid == ny + 1, hi, arr))
            lo = ghost(sp[2][0], arr[:, :, 1:2], arr[:, :, 2:3], dz,
                       un_z[:, :, 1:2], 0)
            hi = ghost(sp[2][1], arr[:, :, nz:nz + 1],
                       arr[:, :, nz - 1:nz], dz, un_z[:, :, nz:nz + 1], 1)
            return jnp.where(colid == 0, lo,
                             jnp.where(colid == nz + 1, hi, arr))

        un_y = fields["uy"]
        un_z = fields["uz"]
        un_x = fields["ux"]
        for k, name in enumerate(FLD):
            arr = fields[name]
            sp = specs[name]
            body = y_z_ghosts(name, arr, un_y, un_z)
            out_int[k][:] = body[1:S + 1]
            # x ghost planes from the fresh interior cell planes (rows 1/S)
            glo = ghost(sp[0][0], arr[1:2], arr[2:3], dx, un_x[1:2], 0)
            ghi = ghost(sp[0][1], arr[S:S + 1], arr[S - 1:S], dx,
                        un_x[S:S + 1], 1)
            glo = y_z_ghosts(name, glo, un_y[1:2], un_z[1:2])
            ghi = y_z_ghosts(name, ghi, un_y[S:S + 1], un_z[S:S + 1])

            @pl.when(is_lo)
            def _(k=k, glo=glo):
                out_gl[k][:] = glo

            @pl.when(is_hi)
            def _(k=k, ghi=ghi):
                out_gh[k][:] = ghi

    vm = pltpu.VMEM
    a_spec = pl.BlockSpec((S, NYp, Wp), lambda i: (i, 0, 0),
                          memory_space=vm)
    b_spec = pl.BlockSpec((1, NYp, Wp),
                          lambda i: (jnp.maximum(i * S - 1, 0), 0, 0),
                          memory_space=vm)
    c_spec = pl.BlockSpec((1, NYp, Wp),
                          lambda i: (jnp.minimum((i + 1) * S, nx - 1), 0, 0),
                          memory_space=vm)
    g_spec = pl.BlockSpec((1, NYp, Wp), lambda i: (0, 0, 0),
                          memory_space=vm)
    fshape = jax.ShapeDtypeStruct((nx, NYp, Wp), dtype)
    gshape = jax.ShapeDtypeStruct((1, NYp, Wp), dtype)
    pcall = pl.pallas_call(
        kernel,
        grid=(n_slabs,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 2
        + [a_spec, b_spec, c_spec] * n_state + [g_spec] * (2 * n_state)
        + [g_spec] * n_planes,
        out_specs=[a_spec] * 5 + [g_spec] * 10
        + ([a_spec] if has_varsc else []),
        out_shape=[fshape] * 5 + [gshape] * 10
        + ([fshape] if has_varsc else []),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )

    def _dt_prepass(fs: Fused3DState, glob_lo=True, glob_hi=True):
        """Acoustic Courant + min face tau over every slab (XLA; the same
        expressions as the in-kernel coefficients).  glob_lo/glob_hi:
        False when the x edge is a partition face (sharded wrapper) — the
        edge face coefficient then uses the neighbour ghost plane instead
        of the zero-gradient boundary collapse."""
        dtv = fs.dt.astype(dtype)
        # live region incl. ghost sublanes/lanes (faces against ghosts)
        T_ = fs.T[:, : ny + 2, : nz + 2]
        us = [u[:, : ny + 2, : nz + 2]
              for u in (fs.ux, fs.uy, fs.uz)]
        Tgl = fs.gl[1][:, : ny + 2, : nz + 2]
        Tgh = fs.gh[1][:, : ny + 2, : nz + 2]

        def snd(Tv):
            g = (gamma * R) * Tv
            return g * jax.lax.rsqrt(g)

        c = snd(T_)
        co = jnp.zeros((), dtype)
        tau_min = jnp.full((), np.inf, dtype)
        live_yz = (slice(None), slice(1, ny + 1), slice(1, nz + 1))
        for a in range(3):
            if a == 0:
                ug = [fs.gl[2 + j][:, 1:ny + 1, 1:nz + 1] for j in range(3)]
                uh = [fs.gh[2 + j][:, 1:ny + 1, 1:nz + 1] for j in range(3)]
                cgl = snd(Tgl)[:, 1:ny + 1, 1:nz + 1]
                cgh = snd(Tgh)[:, 1:ny + 1, 1:nz + 1]
                ci = c[live_yz]
                ui = us[0][live_yz]
                wave = jnp.maximum(
                    jnp.max(jnp.abs(0.5 * (ui[:-1] + ui[1:]))
                            + 0.5 * (ci[:-1] + ci[1:])),
                    jnp.maximum(
                        jnp.max(jnp.abs(0.5 * (ug[0] + ui[0:1]))
                                + 0.5 * (cgl + ci[0:1])),
                        jnp.max(jnp.abs(0.5 * (ui[-1:] + uh[0]))
                                + 0.5 * (ci[-1:] + cgh))))
                # tau faces use ZERO-GRADIENT coefficient ghosts at
                # PHYSICAL edges (composable _interp_zg); partition edges
                # use the neighbour plane's coefficient.  Convention:
                # constScPr interpolates a/c, varScModel5 interpolates c
                # and divides (varScModel5_8C:204-205).
                if has_varsc:
                    cfin = 0.5 * (ci[:-1] + ci[1:])
                    cflo = jnp.where(glob_lo, ci[0:1],
                                     0.5 * (cgl + ci[0:1]))
                    cfhi = jnp.where(glob_hi, ci[-1:],
                                     0.5 * (ci[-1:] + cgh))
                    cfmax = jnp.maximum(jnp.max(cfin),
                                        jnp.maximum(jnp.max(cflo),
                                                    jnp.max(cfhi)))
                    tmin = alpha / cfmax
                else:
                    aoci = alpha / ci
                    alo = jnp.where(glob_lo, aoci[0:1],
                                    0.5 * (alpha / cgl + aoci[0:1]))
                    ahi = jnp.where(glob_hi, aoci[-1:],
                                    0.5 * (aoci[-1:] + alpha / cgh))
                    tmin = jnp.minimum(
                        jnp.min(0.5 * (aoci[:-1] + aoci[1:])),
                        jnp.minimum(jnp.min(alo), jnp.min(ahi)))
            else:
                # faces along y/z: primitive ghost layers live in the frames
                n_a = ny if a == 1 else nz
                sl_lo = [slice(None)] * 3
                sl_hi = [slice(None)] * 3
                sl_lo[a] = slice(0, n_a + 1)
                sl_hi[a] = slice(1, n_a + 2)
                # restrict the OTHER tangential dims to live cells
                for b in range(1, 3):
                    if b != a:
                        sl_lo[b] = slice(1, (ny if b == 1 else nz) + 1)
                        sl_hi[b] = slice(1, (ny if b == 1 else nz) + 1)
                ulo, uhi = us[a][tuple(sl_lo)], us[a][tuple(sl_hi)]
                clo, chi = c[tuple(sl_lo)], c[tuple(sl_hi)]
                wave = jnp.max(jnp.abs(0.5 * (ulo + uhi))
                               + 0.5 * (clo + chi))
                sl_in = list(sl_lo)
                sl_in[a] = slice(1, n_a + 1)
                c_in = c[tuple(sl_in)]   # live cells along a

                def _asl(x, s, _a=a):
                    idx = [slice(None)] * 3
                    idx[_a] = s
                    return x[tuple(idx)]

                if has_varsc:
                    cfmax = jnp.maximum(
                        jnp.max(0.5 * (_asl(c_in, slice(0, n_a - 1))
                                       + _asl(c_in, slice(1, n_a)))),
                        jnp.maximum(jnp.max(_asl(c_in, slice(0, 1))),
                                    jnp.max(_asl(c_in,
                                                 slice(n_a - 1, n_a)))))
                    tmin = alpha / cfmax
                else:
                    aoc_in = alpha / c_in
                    tmin = jnp.minimum(
                        jnp.min(0.5 * (_asl(aoc_in, slice(0, n_a - 1))
                                       + _asl(aoc_in, slice(1, n_a)))),
                        jnp.minimum(
                            jnp.min(_asl(aoc_in, slice(0, 1))),
                            jnp.min(_asl(aoc_in, slice(n_a - 1, n_a)))))
            co = jnp.maximum(co, wave * dtv / d_[a])
            tau_min = jnp.minimum(tau_min, tmin * d_[a])
        return co, tau_min

    # ---- varScModel5 XLA pre-pass helpers ---------------------------------
    def _sc_strip_fix(sc_raw_cells, fs):
        """Recompute the raw sensor at the cell planes whose in-kernel
        x-gradient read a stale slab halo (planes i*S-1 and i*S per
        interior slab boundary) from the carried fresh frames —
        arithmetic mirrors the kernel's exactly."""
        def rho_planes(sl):
            pp = fs.p[sl, 1:ny + 1, 1:nz + 1]
            TT = fs.T[sl, 1:ny + 1, 1:nz + 1]
            r = pp * (1.0 / (R * TT))
            # zero-gradient sublane/lane ghosts (coefficient convention)
            r = jnp.concatenate([r[:, 0:1], r, r[:, -1:]], axis=1)
            return jnp.concatenate([r[:, :, 0:1], r, r[:, :, -1:]], axis=2)

        a = rho_planes(slice(S - 2, nx - 2, S))
        b = rho_planes(slice(S - 1, nx - 1, S))
        c_ = rho_planes(slice(S, nx, S))
        d2 = rho_planes(slice(S + 1, nx + 1, S))

        def raw_plane(rm, r0, rp, sc_prev):
            gx = (rp - rm) * (1.0 / (2.0 * dx))
            gy = (r0[:, 2:] - r0[:, :-2]) * (1.0 / (2.0 * dy))
            gz = (r0[:, :, 2:] - r0[:, :, :-2]) * (1.0 / (2.0 * dz))
            live = (slice(None), slice(1, ny + 1), slice(1, nz + 1))
            mag = jnp.sqrt(gx[live] ** 2
                           + gy[:, :, 1:nz + 1] ** 2
                           + gz[:, 1:ny + 1] ** 2)
            sc = (rC * (mag * h_cell / r0[live])
                  + (1.0 - rC) * sc_prev)
            sc = jnp.clip(sc, minSc, maxSc)
            return jnp.maximum(sc, cqSc)

        live_yz = (slice(None), slice(1, ny + 1), slice(1, nz + 1))
        prev_b = fs.sc[slice(S - 1, nx - 1, S), 1:ny + 1, 1:nz + 1]
        prev_c = fs.sc[slice(S, nx, S), 1:ny + 1, 1:nz + 1]
        row_b = raw_plane(a, b, c_, prev_b)
        row_c = raw_plane(b, c_, d2, prev_c)
        sc_raw_cells = sc_raw_cells.at[S - 1: nx - 1: S].set(row_b)
        return sc_raw_cells.at[S: nx: S].set(row_c)

    def _sc_frame_from_int(sc_int):
        """(nx, ny, nz) smoothed sensor -> edge-ghosted padded frame +
        edge-replicated gl/gh planes (zero-gradient sensor ghosts)."""
        arr = jnp.pad(sc_int.astype(dtype), ((0, 0), (1, 1), (1, 1)),
                      mode="edge")
        arr = jnp.pad(arr, ((0, 0), (0, NYp - (ny + 2)),
                            (0, Wp - (nz + 2))), mode="edge")
        return arr, arr[0:1], arr[-1:]

    pieces = dict(
        pcall=pcall, dt_prepass=_dt_prepass, n_state=n_state,
        has_varsc=has_varsc, n_slabs=n_slabs, S=S, NYp=NYp, Wp=Wp,
        dtype=dtype, bc_planes=bc_planes, sc_strip_fix=_sc_strip_fix,
        sc_frame_from_int=_sc_frame_from_int, flux_sides=flux_sides,
        nx=nx, ny=ny, nz=nz, dx=dx,
    )
    if _distributed:
        return pieces

    ones2 = jnp.ones((1, 2), dtype=jnp.int32)

    def step(fs: Fused3DState) -> Fused3DState:
        co, tau_min = _dt_prepass(fs)
        dt_new = common.set_delta_t(fs.dt.astype(dtype), co, tau_min, tc)
        dts = jnp.reshape(dt_new, (1, 1))
        sc_triple = None
        if has_varsc:
            sc_raw_c = fs.sc_raw[:, 1:ny + 1, 1:nz + 1]
            if n_slabs > 1:
                sc_raw_c = _sc_strip_fix(sc_raw_c, fs)
            from ..physics.qgdcoeffs import fvc_smooth

            sc_int = fvc_smooth(sc_raw_c, f(tm.smoothCoeff)).astype(dtype)
            sc_triple = _sc_frame_from_int(sc_int)
        ops = [dts, ones2]
        frames = [fs.p, fs.T, fs.ux, fs.uy, fs.uz]
        if has_varsc:
            frames.append(sc_triple[0])
        for fr in frames:
            ops += [fr, fr, fr]
        for k in range(5):
            ops += [fs.gl[k], fs.gh[k]]
        if has_varsc:
            ops += [sc_triple[1], sc_triple[2]]
        ops += list(bc_planes)
        outs = pcall(*ops)
        return Fused3DState(p=outs[0], T=outs[1], ux=outs[2], uy=outs[3],
                            uz=outs[4], gl=tuple(outs[5:10]),
                            gh=tuple(outs[10:15]),
                            t=fs.t + dt_new, dt=dt_new,
                            sc=sc_triple[0] if has_varsc else None,
                            sc_raw=outs[15] if has_varsc else None)

    # ---- conversions -------------------------------------------------------
    def _frame(padded):
        """(nx+2, ny+2, nz+2) ghost-padded cells -> cell-plane frame + the
        two x-ghost planes, edge-padding the dead sublane/lane area."""
        arr = jnp.pad(padded.astype(dtype),
                      ((0, 0), (0, NYp - (ny + 2)), (0, Wp - (nz + 2))),
                      mode="edge")
        return arr[1:-1], arr[0:1], arr[-1:]

    def to_fused(s: State) -> Fused3DState:
        bc_pp = bc_p
        for i, (a, side) in enumerate(flux_sides):
            bc_pp = bc_pp.replace(a, side, bcm.FixedGradient(s.pbc[i]))
        U, e, T, p = solver.primitives(s)
        bc_Ur = bcm.resolve_inlet_outlet(bc_U, U, 3)
        bc_pr = bcm.resolve_inlet_outlet(bc_pp, U, 3)
        bc_Tr = bcm.resolve_inlet_outlet(bc_T, U, 3)
        Upad = ghost_pad(U, bc_Ur, mesh, t=s.t, vector=True)
        frames = {}
        gls, ghs = [], []
        for name, padded in (("p", ghost_pad(p, bc_pr, mesh, t=s.t)),
                             ("T", ghost_pad(T, bc_Tr, mesh, t=s.t)),
                             ("ux", Upad[0]), ("uy", Upad[1]),
                             ("uz", Upad[2])):
            body, glo, ghi = _frame(padded)
            frames[name] = body
            gls.append(glo)
            ghs.append(ghi)
        sc_f = sc_raw_f = None
        if has_varsc:
            sc_f, _, _ = _sc_frame_from_int(s.sc.astype(dtype))
            raw = tm.sc_raw_update(
                mesh, th.rho_from_p_T(
                    frames["p"][:, 1:ny + 1, 1:nz + 1],
                    frames["T"][:, 1:ny + 1, 1:nz + 1]),
                s.sc.astype(dtype)).astype(dtype)
            sc_raw_f, _, _ = _sc_frame_from_int(raw)
        return Fused3DState(p=frames["p"], T=frames["T"], ux=frames["ux"],
                            uy=frames["uy"], uz=frames["uz"],
                            gl=tuple(gls), gh=tuple(ghs),
                            t=s.t, dt=s.dt, sc=sc_f, sc_raw=sc_raw_f)

    def from_fused(fs: Fused3DState) -> State:
        sl = (slice(None), slice(1, ny + 1), slice(1, nz + 1))
        p = fs.p[sl]
        T = fs.T[sl]
        U = jnp.stack([fs.ux[sl], fs.uy[sl], fs.uz[sl]])
        rho = th.rho_from_p_T(p, T)
        e = th.e_from_T(T)
        # lagged qgdFlux gradients recovered from the carried p ghost
        # planes (ghost = interior + g*dx, ops.pad convention)
        pbc = []
        for a, side in flux_sides:
            if side == 0:
                g = (fs.gl[0][0, 1:ny + 1, 1:nz + 1] - p[0]) * (1.0 / dx)
            else:
                g = (fs.gh[0][0, 1:ny + 1, 1:nz + 1] - p[-1]) * (1.0 / dx)
            pbc.append(g[None])
        sc = (fs.sc[sl] if has_varsc else jnp.full_like(rho, tm.Sc))
        return State(rho=rho, rhoU=rho[None] * U,
                     rhoE=rho * e + 0.5 * rho * jnp.sum(U * U, axis=0),
                     sc=sc, t=fs.t, dt=fs.dt, pbc=tuple(pbc))

    return step, to_fused, from_fused


def build_sharded_fused_step_3d(solver, dmesh, interpret=None,
                                axis_name=None):
    """Fused 3D pipeline decomposed over an x-ring of devices.

    Each shard runs the x-slab tiled kernel on its nx/px plane range; the
    carried gl/gh planes hold the neighbour shard's FRESH edge planes
    (ppermute exchange after each kernel pass — the 3D counterpart of
    build_sharded_fused_step's halo rows), dt partials reduce with
    pmax/pmin, and the varScModel5 sensor's partition-edge planes are
    strip-fixed from the exchanged planes before the fvc::smooth fixed
    point runs under the spmd context (its relaxation wave and
    termination test cross shards).

    Returns (step, to_sharded, from_sharded); the sharded state is a
    Fused3DState whose frames shard over x and whose gl/gh stack one
    plane per shard (leading shard axis).
    """
    from jax.sharding import PartitionSpec as P

    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pre-0.8 jax
        from jax.experimental.shard_map import shard_map

    from ..parallel import spmd
    from ..solvers.qgd import State

    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    tc = solver.time
    nx, ny, nz = mesh.shape
    names = list(dmesh.axis_names)
    axis_name = axis_name or names[0]
    px = int(dmesh.shape[axis_name])
    assert nx % px == 0, (nx, px)
    for nm in names:
        if nm != axis_name and int(dmesh.shape[nm]) != 1:
            raise NotImplementedError(
                "3D sharded-fused: x-ring decomposition only")
    nxl = nx // px
    pieces = build_fused_step_3d(solver, interpret=interpret,
                                 _distributed=True, _local_nx=nxl)
    pcall = pieces["pcall"]
    dt_prepass = pieces["dt_prepass"]
    has_varsc = pieces["has_varsc"]
    n_slabs = pieces["n_slabs"]
    S = pieces["S"]
    NYp, Wp = pieces["NYp"], pieces["Wp"]
    dtype = pieces["dtype"]
    bc_planes = pieces["bc_planes"]
    sc_strip_fix = pieces["sc_strip_fix"]
    sc_frame_from_int = pieces["sc_frame_from_int"]
    flux_sides = pieces["flux_sides"]
    dx = pieces["dx"]
    f = float
    R = f(th.R)
    rC = f(getattr(tm, "rC", 0.0))
    minSc = f(getattr(tm, "minSc", 0.0))
    maxSc = f(getattr(tm, "maxSc", 1.0))
    cqSc = f(getattr(tm, "cqSc", 0.0)) if has_varsc else 0.0
    h_cell = f(np.asarray(mesh.h_cell).reshape(-1)[0])
    dy, dz = f(mesh.dx[1][0]), f(mesh.dx[2][0])
    sctx = spmd.SpmdContext(
        axes=(spmd.AxisShard(axis_name, px, nxl) if px > 1 else None,
              None, None),
        global_shape=(nx, ny, nz), global_mesh=mesh)
    fwd = [(i, i + 1) for i in range(px - 1)]
    bwd = [(i + 1, i) for i in range(px - 1)]

    def _fix_partition_planes(sc_raw_c, fs, glob_lo, glob_hi):
        """Recompute the raw sensor at the shard-edge cell planes (their
        in-kernel x-gradient read last step's halo planes) from the
        carried fresh frames + exchanged gl/gh — arithmetic mirrors the
        kernel's exactly.  Physical edges keep the kernel's (exact,
        zero-gradient) value."""
        def zg_yz(r):
            r = jnp.concatenate([r[:, 0:1], r, r[:, -1:]], axis=1)
            return jnp.concatenate([r[:, :, 0:1], r, r[:, :, -1:]], axis=2)

        def rho_of(pp, TT):
            return zg_yz(pp * (1.0 / (R * TT)))

        live = (slice(None), slice(1, ny + 1), slice(1, nz + 1))

        def raw_plane(rm, r0, rp, sc_prev):
            gx = (rp - rm) * (1.0 / (2.0 * dx))
            gy = (r0[:, 2:] - r0[:, :-2]) * (1.0 / (2.0 * dy))
            gz = (r0[:, :, 2:] - r0[:, :, :-2]) * (1.0 / (2.0 * dz))
            mag = jnp.sqrt(gx[live] ** 2
                           + gy[:, :, 1:nz + 1] ** 2
                           + gz[:, 1:ny + 1] ** 2)
            sc = (rC * (mag * h_cell / r0[live])
                  + (1.0 - rC) * sc_prev)
            sc = jnp.clip(sc, minSc, maxSc)
            return jnp.maximum(sc, cqSc)

        def cells(sl):
            return rho_of(fs.p[sl, 1:ny + 1, 1:nz + 1],
                          fs.T[sl, 1:ny + 1, 1:nz + 1])

        # lo edge: plane 0 needs rho at plane -1 = gl (neighbour's last)
        r_m1 = rho_of(fs.gl[0][:, 1:ny + 1, 1:nz + 1],
                      fs.gl[1][:, 1:ny + 1, 1:nz + 1])
        r0 = cells(slice(0, 1))
        r1 = cells(slice(1, 2))
        prev0 = fs.sc[0:1, 1:ny + 1, 1:nz + 1]
        fix0 = raw_plane(r_m1, r0, r1, prev0)
        sc_raw_c = sc_raw_c.at[0:1].set(
            jnp.where(glob_lo, sc_raw_c[0:1], fix0))
        # hi edge: plane nxl-1 needs rho at plane nxl = gh
        r_p1 = rho_of(fs.gh[0][:, 1:ny + 1, 1:nz + 1],
                      fs.gh[1][:, 1:ny + 1, 1:nz + 1])
        rn = cells(slice(nxl - 1, nxl))
        rm = cells(slice(nxl - 2, nxl - 1))
        prevn = fs.sc[nxl - 1:nxl, 1:ny + 1, 1:nz + 1]
        fixn = raw_plane(rm, rn, r_p1, prevn)
        return sc_raw_c.at[nxl - 1:nxl].set(
            jnp.where(glob_hi, sc_raw_c[nxl - 1:nxl], fixn))

    def local_step(p_, T_, ux_, uy_, uz_, gl_, gh_, sc_, sc_raw_, t, dt):
        ix = jax.lax.axis_index(axis_name)
        glob_lo = ix == 0
        glob_hi = ix == px - 1
        NYpl, Wpl = NYp, Wp
        gl = tuple(g.reshape((1, NYpl, Wpl)) for g in gl_)
        gh = tuple(g.reshape((1, NYpl, Wpl)) for g in gh_)
        fs = Fused3DState(p=p_, T=T_, ux=ux_, uy=uy_, uz=uz_,
                          gl=gl, gh=gh, t=t, dt=dt,
                          sc=sc_ if has_varsc else None,
                          sc_raw=sc_raw_ if has_varsc else None)
        co, tau_min = dt_prepass(fs, glob_lo=glob_lo, glob_hi=glob_hi)
        co = jax.lax.pmax(co, axis_name)
        tau_min = jax.lax.pmin(tau_min, axis_name)
        dt_new = common.set_delta_t(dt.astype(dtype), co, tau_min, tc)
        dts = jnp.reshape(dt_new, (1, 1))
        flags = jnp.stack([glob_lo, glob_hi]).astype(jnp.int32).reshape(1, 2)

        sc_triple = None
        if has_varsc:
            sc_raw_c = fs.sc_raw[:, 1:ny + 1, 1:nz + 1]
            if n_slabs > 1:
                sc_raw_c = sc_strip_fix(sc_raw_c, fs)
            if px > 1:
                sc_raw_c = _fix_partition_planes(sc_raw_c, fs, glob_lo,
                                                 glob_hi)
            from ..physics.qgdcoeffs import fvc_smooth

            with spmd.active(sctx):
                sc_int = fvc_smooth(sc_raw_c,
                                    f(tm.smoothCoeff)).astype(dtype)
            sc_frame, sgl, sgh = sc_frame_from_int(sc_int)
            if px > 1:
                from_prev = jax.lax.ppermute(sc_frame[-1:], axis_name, fwd)
                from_next = jax.lax.ppermute(sc_frame[0:1], axis_name, bwd)
                sgl = jnp.where(glob_lo, sgl, from_prev)
                sgh = jnp.where(glob_hi, sgh, from_next)
            sc_triple = (sc_frame, sgl, sgh)

        ops = [dts, flags]
        frames = [fs.p, fs.T, fs.ux, fs.uy, fs.uz]
        if has_varsc:
            frames.append(sc_triple[0])
        for fr in frames:
            ops += [fr, fr, fr]
        for k in range(5):
            ops += [gl[k], gh[k]]
        if has_varsc:
            ops += [sc_triple[1], sc_triple[2]]
        ops += list(bc_planes)
        outs = pcall(*ops)

        # exchange the fresh edge planes: partition gl/gh = neighbour's
        # fresh cell planes (already y/z ghosted); physical edges keep the
        # kernel's BC ghost planes
        gl_new, gh_new = [], []
        for k in range(5):
            if px > 1:
                from_prev = jax.lax.ppermute(outs[k][-1:], axis_name, fwd)
                from_next = jax.lax.ppermute(outs[k][0:1], axis_name, bwd)
                gln = jnp.where(glob_lo, outs[5 + k], from_prev)
                ghn = jnp.where(glob_hi, outs[10 + k], from_next)
            else:
                gln, ghn = outs[5 + k], outs[10 + k]
            gl_new.append(gln[None])
            gh_new.append(ghn[None])
        sc_out = sc_triple[0] if has_varsc else jnp.zeros((), dtype)
        raw_out = outs[15] if has_varsc else jnp.zeros((), dtype)
        return (outs[0], outs[1], outs[2], outs[3], outs[4],
                tuple(gl_new), tuple(gh_new), sc_out, raw_out,
                t + dt_new, dt_new)

    fr_spec = P(axis_name, None, None)
    g_spec = P(axis_name, None, None)   # (px, 1, NYp, Wp) stacked planes
    sc_spec = fr_spec if has_varsc else P()
    kw = dict(
        mesh=dmesh,
        in_specs=(fr_spec, fr_spec, fr_spec, fr_spec, fr_spec,
                  (g_spec,) * 5, (g_spec,) * 5, sc_spec, sc_spec,
                  P(), P()),
        out_specs=(fr_spec, fr_spec, fr_spec, fr_spec, fr_spec,
                   (g_spec,) * 5, (g_spec,) * 5, sc_spec, sc_spec,
                   P(), P()),
    )
    try:  # jax >= 0.8 renamed check_rep -> check_vma
        sstep = shard_map(local_step, check_vma=False, **kw)
    except TypeError:
        sstep = shard_map(local_step, check_rep=False, **kw)

    def step(fs: Fused3DState) -> Fused3DState:
        sc_in = fs.sc if has_varsc else jnp.zeros((), dtype)
        raw_in = fs.sc_raw if has_varsc else jnp.zeros((), dtype)
        outs = sstep(fs.p, fs.T, fs.ux, fs.uy, fs.uz, fs.gl, fs.gh,
                     sc_in, raw_in, fs.t, fs.dt)
        return Fused3DState(p=outs[0], T=outs[1], ux=outs[2], uy=outs[3],
                            uz=outs[4], gl=outs[5], gh=outs[6],
                            t=outs[9], dt=outs[10],
                            sc=outs[7] if has_varsc else None,
                            sc_raw=outs[8] if has_varsc else None)

    ser_step, ser_to, ser_from = build_fused_step_3d(solver,
                                                     interpret=interpret)

    def to_sharded(s: State) -> Fused3DState:
        fs = ser_to(s)

        def stack_gl(k):
            planes = [fs.gl[k]]
            for i in range(1, px):
                planes.append(getattr(fs, FLD3[k])[i * nxl - 1: i * nxl])
            return jnp.concatenate(planes, axis=0)[:, None]

        def stack_gh(k):
            planes = []
            for i in range(px - 1):
                planes.append(getattr(fs, FLD3[k])[
                    (i + 1) * nxl: (i + 1) * nxl + 1])
            planes.append(fs.gh[k])
            return jnp.concatenate(planes, axis=0)[:, None]

        return fs._replace(gl=tuple(stack_gl(k) for k in range(5)),
                           gh=tuple(stack_gh(k) for k in range(5)))

    def from_sharded(fs: Fused3DState) -> State:
        ser = fs._replace(gl=tuple(g[0:1, 0] for g in fs.gl),
                          gh=tuple(g[px - 1:px, 0] for g in fs.gh))
        return ser_from(ser)

    return step, to_sharded, from_sharded


FLD3 = ("p", "T", "ux", "uy", "uz")
