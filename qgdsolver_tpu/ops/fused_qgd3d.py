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

Scope (first 3D cut): constScPrModel1 family, perfect-gas + const
transport, explicit diffusion, scalar-valued simple BCs (fixedValue /
zeroGradient / symmetry / extrapolated / inletOutlet).  Everything else
falls back to the composable step.
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
from ..physics.qgdcoeffs import ConstScPrModel1
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
    (1, NYp, Wp) x-ghost planes per field (p, T, ux, uy, uz order)."""

    p: jax.Array
    T: jax.Array
    ux: jax.Array
    uy: jax.Array
    uz: jax.Array
    gl: tp.Tuple[jax.Array, ...]
    gh: tp.Tuple[jax.Array, ...]
    t: jax.Array
    dt: jax.Array


def _slab_bytes(slab: int, nyp: int, wp: int) -> int:
    plane = nyp * wp * 4
    body = LIVE_FRAMES_3D * (slab + 2) * plane
    io = 2 * 2 * 5 * slab * plane   # double-buffered A-ins + outs, 5 fields
    halo = 2 * 2 * 5 * 4 * plane    # b/c/gl/gh blocks
    return body + io + halo


def pick_slab(nx: int, nyp: int, wp: int) -> tp.Optional[int]:
    for slab in (64, 32, 16, 8, 4, 2, 1):
        if slab <= nx and nx % slab == 0 \
                and _slab_bytes(slab, nyp, wp) <= VMEM_BUDGET_3D:
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
    if not isinstance(tm, ConstScPrModel1):
        return False
    if type(tm).__name__ not in ("ConstScPrModel1", "ConstScPrModel1n",
                                 "ConstScPrModel2"):
        return False
    if solver.implicit_diffusion:
        return False
    if solver._flux_sides():
        return False
    for term in ("grad(U)", "grad(e)", "grad(rho)", "grad(p)"):
        if fvsc.scheme_for(solver.fvsc_scheme, term) != "full":
            return False
    bc_U, bc_p, bc_T = solver._bcs()
    for bcs, vec in ((bc_p, False), (bc_T, False), (bc_U, True)):
        for a in range(3):
            for side in (0, 1):
                comps = range(3) if vec else (None,)
                for c in comps:
                    if _scalar_bc(bcs[a, side], a, side, c) is None:
                        return False
    nx, ny, nz = mesh.shape
    nyp = -(-(ny + 2) // 8) * 8
    wp = max(LANE, -(-(nz + 2) // LANE) * LANE)
    return pick_slab(nx, nyp, wp) is not None


def build_fused_step_3d(solver, interpret: tp.Optional[bool] = None,
                        slab: tp.Optional[int] = None):
    """(step, to_fused, from_fused) for a supported 3D QGDFoam solver."""
    from ..solvers.qgd import State
    from .pad import ghost_pad

    assert supported(solver), "config not supported by the 3D fused kernel"
    mesh = solver.mesh
    th = solver.thermo
    tm = solver.tau_model
    tc = solver.time
    nx, ny, nz = mesh.shape
    NYp = -(-(ny + 2) // 8) * 8
    Wp = max(LANE, -(-(nz + 2) // LANE) * LANE)
    dtype = np.dtype(mesh.dtype)
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    S = slab if slab is not None else pick_slab(nx, NYp, Wp)
    assert S is not None and nx % S == 0, (nx, S)
    n_slabs = nx // S

    f = float
    dx, dy, dz = (f(mesh.dx[a][0]) for a in range(3))
    d_ = (dx, dy, dz)
    vol = dx * dy * dz
    area = tuple(vol / d_[a] for a in range(3))
    h_cell = f(np.asarray(mesh.h_cell).reshape(-1)[0])
    R, Cv, gamma = f(th.R), f(th.Cv), f(th.gamma)
    Pr_th, alpha, Pr_tau, Sc = f(th.Pr), f(tm.alpha), f(tm.Pr), f(tm.Sc)
    mu0 = f(th.transport.mu0)

    # static per-field BC tables: specs[f][axis][side] = (kind, val, sign)
    bc_U, bc_p, bc_T = solver._bcs()
    specs = {}
    for name, bcs, comp in (("p", bc_p, None), ("T", bc_T, None),
                            ("ux", bc_U, 0), ("uy", bc_U, 1),
                            ("uz", bc_U, 2)):
        specs[name] = tuple(
            tuple(_scalar_bc(bcs[a, side], a, side, comp)
                  for side in (0, 1))
            for a in range(3))

    FLD = ("p", "T", "ux", "uy", "uz")

    def kernel(dt_ref, *refs):
        i = pl.program_id(0)
        is_lo = i == 0
        is_hi = i == n_slabs - 1
        A = [refs[3 * k] for k in range(5)]
        B = [refs[3 * k + 1] for k in range(5)]
        C = [refs[3 * k + 2] for k in range(5)]
        gl = [refs[15 + 2 * k] for k in range(5)]
        gh = [refs[15 + 2 * k + 1] for k in range(5)]
        out_int = refs[25:30]
        out_gl = refs[30:35]
        out_gh = refs[35:40]
        dtv = dt_ref[0, 0]

        def window(k):
            a = A[k][:]
            top = jnp.where(is_lo, gl[k][:], B[k][:])
            bot = jnp.where(is_hi, gh[k][:], C[k][:])
            return jnp.concatenate([top, a, bot], axis=0)

        ph, Th, ux, uy, uz = (window(k) for k in range(5))
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
        mu_qgd = ((Sc * alpha * h_cell) * ph) * rcs
        if mu0 == 0.0:
            mu_eff = mu_qgd
            alphau_eff = None   # alphau = mu/Pr_tau, applied at faces
        else:
            mu_eff = mu_qgd + mu0
            alphau_eff = mu_qgd * (1.0 / Pr_tau) + mu0 * (1.0 / Pr_th)

        def zg_override(fld):
            # coefficient-field ghosts: zero-gradient at PHYSICAL edges;
            # slab-interior halo planes keep the neighbour's value
            first = jnp.where(is_lo, fld[1:2], fld[0:1])
            last = jnp.where(is_hi, fld[S:S + 1], fld[S + 1:S + 2])
            fld = jnp.concatenate([first, fld[1:S + 1], last], axis=0)
            # sublane/lane ghosts copy the adjacent interior value:
            # up(fld)[0] = fld[1] (lo ghost), dn(fld)[n+1] = fld[n] (hi)
            fld = jnp.where(rowid == 0, up(fld, 1),
                            jnp.where(rowid == ny + 1, dn(fld, 1), fld))
            fld = jnp.where(colid == 0, up(fld, 2),
                            jnp.where(colid == nz + 1, dn(fld, 2), fld))
            return fld

        aoc = zg_override(aoc)
        mu_eff = zg_override(mu_eff)
        if alphau_eff is not None:
            alphau_eff = zg_override(alphau_eff)

        # ---- per-axis face fluxes, accumulated into cell divergences ------
        acc = [None] * 5   # rho, m0, m1, m2, E

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
            if kind == "io":
                outflow = (un_adj < 0) if side == 0 else (un_adj > 0)
                return jnp.where(outflow, interior, 2.0 * v - interior)
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
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [a_spec, b_spec, c_spec] * 5 + [g_spec] * 10,
        out_specs=[a_spec] * 5 + [g_spec] * 10,
        out_shape=[fshape] * 5 + [gshape] * 10,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )

    def _dt_prepass(fs: Fused3DState):
        """Acoustic Courant + min face tau over every slab (XLA; the same
        expressions as the in-kernel coefficients)."""
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
                # tau faces use ZERO-GRADIENT coefficient ghosts (composable
                # _interp_zg): boundary faces collapse to the edge cell
                aoci = alpha / ci
                tmin = jnp.minimum(
                    jnp.min(0.5 * (aoci[:-1] + aoci[1:])),
                    jnp.minimum(jnp.min(aoci[0:1]), jnp.min(aoci[-1:])))
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
                aoc_in = alpha / c[tuple(sl_in)]   # live cells along a

                def _asl(x, s, _a=a):
                    idx = [slice(None)] * 3
                    idx[_a] = s
                    return x[tuple(idx)]

                tmin = jnp.minimum(
                    jnp.min(0.5 * (_asl(aoc_in, slice(0, n_a - 1))
                                   + _asl(aoc_in, slice(1, n_a)))),
                    jnp.minimum(jnp.min(_asl(aoc_in, slice(0, 1))),
                                jnp.min(_asl(aoc_in, slice(n_a - 1, n_a)))))
            co = jnp.maximum(co, wave * dtv / d_[a])
            tau_min = jnp.minimum(tau_min, tmin * d_[a])
        return common.set_delta_t(dtv, co, tau_min, tc)

    def step(fs: Fused3DState) -> Fused3DState:
        dt_new = _dt_prepass(fs)
        dts = jnp.reshape(dt_new, (1, 1))
        ops = [dts]
        for fr in (fs.p, fs.T, fs.ux, fs.uy, fs.uz):
            ops += [fr, fr, fr]
        for k in range(5):
            ops += [fs.gl[k], fs.gh[k]]
        outs = pcall(*ops)
        return Fused3DState(p=outs[0], T=outs[1], ux=outs[2], uy=outs[3],
                            uz=outs[4], gl=tuple(outs[5:10]),
                            gh=tuple(outs[10:15]),
                            t=fs.t + dt_new, dt=dt_new)

    # ---- conversions -------------------------------------------------------
    def _frame(padded):
        """(nx+2, ny+2, nz+2) ghost-padded cells -> cell-plane frame + the
        two x-ghost planes, edge-padding the dead sublane/lane area."""
        arr = jnp.pad(padded.astype(dtype),
                      ((0, 0), (0, NYp - (ny + 2)), (0, Wp - (nz + 2))),
                      mode="edge")
        return arr[1:-1], arr[0:1], arr[-1:]

    def to_fused(s: State) -> Fused3DState:
        U, e, T, p = solver.primitives(s)
        bc_Ur = bcm.resolve_inlet_outlet(bc_U, U, 3)
        bc_pr = bcm.resolve_inlet_outlet(bc_p, U, 3)
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
        return Fused3DState(p=frames["p"], T=frames["T"], ux=frames["ux"],
                            uy=frames["uy"], uz=frames["uz"],
                            gl=tuple(gls), gh=tuple(ghs),
                            t=s.t, dt=s.dt)

    def from_fused(fs: Fused3DState) -> State:
        sl = (slice(None), slice(1, ny + 1), slice(1, nz + 1))
        p = fs.p[sl]
        T = fs.T[sl]
        U = jnp.stack([fs.ux[sl], fs.uy[sl], fs.uz[sl]])
        rho = th.rho_from_p_T(p, T)
        e = th.e_from_T(T)
        return State(rho=rho, rhoU=rho[None] * U,
                     rhoE=rho * e + 0.5 * rho * jnp.sum(U * U, axis=0),
                     sc=jnp.full_like(rho, tm.Sc), t=fs.t, dt=fs.dt, pbc=())

    return step, to_fused, from_fused
