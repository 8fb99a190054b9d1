"""interQHDFoam — two-phase incompressible VoF QHD solver with surface tension.

Re-design of reference QGDsolver/interQHDFoam (interQHDFoam_8C_source.html:
71-358).  Per step:
  thermo.correct : mixture rho/mu/tau + interface curvature (physics/twophase)
  updateFields   (interQHDFoam_2updateFields_8H:43-73): gradUf, gradAlpha1f,
    da1dt = -(U.grad alpha1), cFrc = reconstruct(stf*|Sf|),
    BdFrc = g*(rho + da1dt*(Tau1*rho1 - Tau2*rho2))
  updateFluxes   (:40-51): phiwon = Sf&((Uf.grad)U - g);
    phiwo_k = (phiwon - phicf/rho_k)*Tau_k
  mixture pEqn   (interQHDFoam_8C:147-171):
    div(phiu) + div(phiwm) - lap(alpha1f*Tau1/rho1 + alpha2f*Tau2/rho2, p)=0,
    phiwm = -phiwo1*alpha1f - phiwo2*alpha2f + phiu*da1dtf*(Tau1-Tau2);
    per-phase fluxes phiw_k = phiwo_k + (Tau_k/rho_k)|Sf| snGrad p;
    phi = phiu + phiwm + pEqn.flux()
  alpha1 eqn     (:179-273): QGD relative-flux terms + interface compression
    cAlpha*|phi|*nHatf + MULES limit to [0,1]; explicit solve + clip
  mass fluxes    (:279-293): rhoPhi = phiAlpha1f*rho1 + phiAlpha2f*rho2
  UEqn           (:296-345): ddt(rho,U) + div(rhoPhi*Uf - phiu*(alpha1f rho1 W1
    + alpha2f rho2 W2)) - lap(mu_f, U) - div(transpose) - BdFrc
    + (reconstruct(snGrad(p)|Sf|) - cFrc)*(1 + da1dt*(Tau1-Tau2)) = 0
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..core.mesh import Mesh
from ..core import bc as bcm
from ..ops import fvsc, linsolve, mules
from ..physics.twophase import TwoPhaseProperties, interface_properties, reconstruct
from . import common
from .common import TimeControls


class State(tp.NamedTuple):
    U: jax.Array  # (d, *cells)
    alpha1: jax.Array
    p: jax.Array
    t: jax.Array
    dt: jax.Array


@dataclasses.dataclass(frozen=True)
class InterQHDFoam:
    mesh: Mesh
    props: TwoPhaseProperties
    g: tp.Tuple[float, ...] = None
    bc_U: tp.Optional[bcm.FieldBCs] = None
    bc_alpha: tp.Optional[bcm.FieldBCs] = None
    bc_p: tp.Optional[bcm.FieldBCs] = None
    time: TimeControls = TimeControls()
    implicit_diffusion: bool = True
    p_ref_value: float = 0.0
    cg_tol: float = 1e-8
    cg_maxiter: int = 1000
    fvsc_scheme: tp.Any = "full"
    mules_n_iter: int = 3
    # wall contact angles: {(axis, side): twophase.ContactAngle}
    # (qInterfaceProperties::correctContactAngle equivalent)
    contact_angles: tp.Optional[dict] = None
    # CLI alpha-smoothing flags (interQHDFoam_8C:73-75, smoothSolution.H):
    # alpha1 <- (1-c)*alpha1 + c*faceAverage(alpha1), nSmoothIters times
    smooth_alpha: bool = False
    n_smooth_iters: int = 1
    # OpenFOAM field-file name of the phase-1 fraction ("alpha.<phase1>");
    # ingestion sets it to the case's actual file so write->resume
    # roundtrips keep the right filename for non-water phase pairs
    alpha_field: str = "alpha.water"
    # Axisymmetric (wedge) meshes are supported: the r-weighted metrics
    # carry the interface curvature's hoop part and the UEqn adds the
    # viscous hoop source.  Interfaces may CROSS the axis: the r4-era
    # near-axis CSF-noise limitation no longer reproduces after the pEqn
    # projection fix + zero-area axis-face guards — an axis-centered
    # spherical drop holds the full 2*sigma/R Laplace jump with ~2e-6 m/s
    # spurious currents (tests/test_axisymmetric.py).
    smooth_coeff: float = 0.5

    def _bcs(self):
        nd = self.mesh.ndim
        bu = self.bc_U or bcm.FieldBCs.uniform(bcm.FixedValue(jnp.zeros(nd)), nd)
        ba = self.bc_alpha or bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        bp = self.bc_p or bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        return bu, ba, bp

    def init(self, U0, alpha0, p0=None, t0=0.0) -> State:
        alpha0 = jnp.asarray(alpha0)
        p0 = jnp.zeros_like(alpha0) if p0 is None else jnp.asarray(p0)
        dt = jnp.asarray(self.time.dt0, dtype=alpha0.dtype)
        return State(U=jnp.asarray(U0), alpha1=alpha0, p=p0,
                     t=jnp.asarray(t0, dtype=alpha0.dtype), dt=dt)

    def make_step(self):
        mesh = self.mesh
        nd = mesh.ndim
        pr = self.props
        bc_U, bc_a, bc_p0 = self._bcs()
        tc = self.time
        scheme = self.fvsc_scheme
        sch_U = fvsc.scheme_for(scheme, "grad(U)")
        sch_a = fvsc.scheme_for(scheme, "grad(alpha1)")
        sch_p = fvsc.scheme_for(scheme, "grad(p)")
        bc_zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        gvec = jnp.asarray(self.g if self.g is not None else (0.0,) * nd)
        gb = gvec.reshape((nd,) + (1,) * nd)
        area = tuple(mesh.face_area(a) for a in range(nd))
        rho1, rho2, Tau1, Tau2 = pr.rho1, pr.rho2, pr.tau1, pr.tau2
        singular = all(
            not isinstance(bc_p0[a, s], bcm.FixedValue)
            for a in range(nd) for s in (0, 1)
        )

        def upwind_flux(phi_a, fld, a):
            """fvc::flux(phi, fld) with upwind donor along axis a."""
            ax_f = fld.ndim - nd + a
            pad_lo = jnp.take(fld, jnp.asarray([0]), axis=ax_f)
            pad_hi = jnp.take(fld, jnp.asarray([-1]), axis=ax_f)
            fe = jnp.concatenate([pad_lo, fld, pad_hi], axis=ax_f)
            n = fe.shape[ax_f]
            lo = jnp.take(fe, jnp.arange(0, n - 1), axis=ax_f)
            hi = jnp.take(fe, jnp.arange(1, n), axis=ax_f)
            return jnp.where(phi_a >= 0, lo, hi) * phi_a

        def step(s: State) -> State:
            U, alpha1, p, t, dt = s
            alpha2 = 1.0 - alpha1
            rho_old = pr.rho(alpha1)
            mu = pr.mu(alpha1)

            # ---- thermo.correct(): interface machinery -------------------
            iface = interface_properties(alpha1, bc_a, mesh, pr.sigma, t=t,
                                         contact_angles=self.contact_angles)

            # ---- updateFields.H ------------------------------------------
            gradUf = fvsc.grad(U, bc_U, mesh, scheme=sch_U, t=t, vector=True)
            gradA1f = fvsc.grad(alpha1, bc_a, mesh, scheme=sch_a, t=t)
            muf = fvsc.interpolate(mu, bc_zg, mesh)
            Uf = fvsc.interpolate(U, bc_U, mesh, t=t, vector=True)
            a1f = fvsc.interpolate(alpha1, bc_a, mesh, t=t)
            a1f = tuple(jnp.clip(f, 0.0, 1.0) for f in a1f)
            a2f = tuple(1.0 - f for f in a1f)
            da1dtf = tuple(
                -sum(Uf[a][i] * gradA1f[a][i] for i in range(nd))
                for a in range(nd)
            )
            grad_a1_cell = fvsc.grad_cell(alpha1, bc_a, mesh, t=t)
            da1dt = -jnp.sum(U * grad_a1_cell, axis=0)
            cFrc = reconstruct(
                tuple(iface.stf[a] * area[a] for a in range(nd)), mesh
            )
            cFrcf = iface.stf  # stf * Sf/|Sf| -> normal component = stf
            BdFrc = gb * (rho_old + da1dt * (Tau1 * rho1 - Tau2 * rho2))[None]

            # ---- updateFluxes.H ------------------------------------------
            u_gradU = tuple(
                [sum(Uf[a][i] * gradUf[a][i, j] for i in range(nd))
                 for j in range(nd)]
                for a in range(nd)
            )
            phiu = tuple(Uf[a][a] * area[a] for a in range(nd))
            phiwon = tuple(
                (u_gradU[a][a] - gvec[a]) * area[a] for a in range(nd)
            )
            phicf = tuple(cFrcf[a] * area[a] for a in range(nd))
            phiwo1 = tuple((phiwon[a] - phicf[a] / rho1) * Tau1 for a in range(nd))
            phiwo2 = tuple((phiwon[a] - phicf[a] / rho2) * Tau2 for a in range(nd))

            # ---- Courant + setDeltaT (mQGDCourantNo is the QHD advective) -
            co = common.courant_advective(Uf, dt, mesh)
            tau_f_all = tuple(
                a1f[a] * Tau1 + a2f[a] * Tau2 for a in range(nd)
            )
            dt_new = common.set_delta_t(dt, co, common.tau_f_min(tau_f_all), tc)

            # ---- mixture pEqn (interQHDFoam_8C:138-171) ------------------
            phiwm = tuple(
                -phiwo1[a] * a1f[a] - phiwo2[a] * a2f[a]
                + phiu[a] * da1dtf[a] * (Tau1 - Tau2)
                for a in range(nd)
            )
            coeffp = tuple(
                a1f[a] * Tau1 / rho1 + a2f[a] * Tau2 / rho2 for a in range(nd)
            )
            # mQhdFlux p BC (mixture qhdFlux): the reference sets the
            # outward gradient to phiwm/coeffp/|Sf| at the patch
            # (mQhdFluxFvPatchScalarField_8C_source.html:185-193), so the
            # pEqn laplacian boundary flux cancels phiwm and phi reduces to
            # the velocity-BC flux phiu there.  Substituted per step like
            # solvers/qhd.py:317-328.
            flux_grads = {}
            for a in range(nd):
                for side in (0, 1):
                    if isinstance(bc_p0[a, side], bcm.QHDFluxP):
                        idx = jnp.asarray([0 if side == 0 else -1])
                        # face arrays may carry leading singleton dims
                        # (stf does): index the trailing spatial axes
                        wm = jnp.take(phiwm[a], idx,
                                      axis=phiwm[a].ndim - nd + a)
                        cp = jnp.take(coeffp[a], idx,
                                      axis=coeffp[a].ndim - nd + a)
                        ar = jnp.take(
                            jnp.broadcast_to(jnp.asarray(area[a]),
                                             mesh.face_shape(a)),
                            idx, axis=a)
                        sign = -1.0 if side == 0 else 1.0
                        # phiwm is +axis oriented; outward flux at the low
                        # side is -phiwm.  Zero-area (wedge-axis) faces
                        # carry zero flux: guard the 0/0.
                        g = jnp.where(ar > 0.0,
                                      sign * wm / (cp * jnp.where(
                                          ar > 0.0, ar, 1.0)), 0.0)
                        flux_grads[(a, side)] = g
            bc_p = bc_p0
            for (a, side), g in flux_grads.items():
                bc_p = bc_p.replace(a, side, bcm.FixedGradient(g))
            rhs_p = fvsc.div_flux(phiu, mesh) + fvsc.div_flux(phiwm, mesh)
            # solve_helmholtz solves diag*x - lap(gamma, x) = rhs, so the
            # reference equation lap(coeffp, p) == div(phiu) + div(phiwm)
            # (interQHDFoam_8C:147-171) takes rhs = -rhs_p — the sign QHDFoam
            # uses; with +rhs_p the correction DOUBLES the divergence
            # (div(phi) = 2*rhs_p) instead of projecting it out
            res = linsolve.solve_helmholtz(
                diag_coeff=0.0, gamma_faces=coeffp, rhs=-rhs_p, x0=p,
                bcs=bc_p, mesh=mesh, t=t, tol=self.cg_tol,
                maxiter=self.cg_maxiter, singular=singular,
            )
            p_new = res.x
            if singular:
                p_new = p_new + (self.p_ref_value - p_new[(0,) * nd])

            snp = fvsc.sn_grad(p_new, bc_p, mesh, t=t)
            phiw1 = tuple(
                phiwo1[a] + (Tau1 / rho1) * area[a] * snp[a] for a in range(nd)
            )
            phiw2 = tuple(
                phiwo2[a] + (Tau2 / rho2) * area[a] * snp[a] for a in range(nd)
            )
            phi = tuple(
                phiu[a] + phiwm[a] - coeffp[a] * area[a] * snp[a]
                for a in range(nd)
            )

            # ---- W1/W2 (velocity regularizers, :173-177) -----------------
            gradpf = fvsc.grad(p_new, bc_p, mesh, scheme=sch_p, t=t)
            cFrcf_lin = fvsc.interpolate(cFrc, bc_zg, mesh, vector=True)
            W1 = tuple(
                jnp.stack([
                    (u_gradU[a][j] + gradpf[a][j] / rho1 - gvec[j]
                     - cFrcf_lin[a][j] / rho1) * Tau1
                    for j in range(nd)
                ], axis=0) for a in range(nd)
            )
            W2 = tuple(
                jnp.stack([
                    (u_gradU[a][j] + gradpf[a][j] / rho2 - gvec[j]
                     - cFrcf_lin[a][j] / rho2) * Tau2
                    for j in range(nd)
                ], axis=0) for a in range(nd)
            )

            # ---- alpha1 equation (:179-273) ------------------------------
            phiWr = tuple((phiw1[a] - phiw2[a]) * a2f[a] for a in range(nd))
            phiA1 = [
                phi[a] * a1f[a] - phiWr[a] * a1f[a]
                + phiu[a] * da1dtf[a] * (Tau1 - a1f[a] * (Tau1 - Tau2))
                for a in range(nd)
            ]
            if pr.c_alpha > 1e-30:
                for a in range(nd):
                    # |phi|/|Sf| is the face speed; r-weighted metrics have
                    # ZERO-area faces on the wedge axis (phi is 0 there
                    # too) — guard the 0/0
                    ar = jnp.broadcast_to(
                        jnp.asarray(area[a]),
                        phi[a].shape[phi[a].ndim - nd:])
                    phic = pr.c_alpha * jnp.where(
                        ar > 0.0, jnp.abs(phi[a]) / jnp.where(ar > 0.0, ar,
                                                              1.0), 0.0)
                    # zero compression at uncoupled boundary faces (:219-234)
                    if not isinstance(bc_a[a, 0], bcm.Periodic):
                        ax = phic.ndim - nd + a
                        n = phic.shape[ax]
                        mask = jnp.ones((n,))
                        mask = mask.at[0].set(0.0).at[-1].set(0.0)
                        shape = [1] * phic.ndim
                        shape[ax] = n
                        phic = phic * mask.reshape(shape)
                    phir = phic * iface.n_hat_f[a]  # nHatf includes |Sf|
                    inner = -upwind_flux(-phir, alpha2, a)
                    phiA1[a] = phiA1[a] + upwind_flux(inner, alpha1, a)

            # MULES limit to [0,1] + explicit solve + clip (:246-273)
            alpha1_new, phiA1_lim = mules.explicit_solve(
                alpha1, phi, tuple(phiA1), dt_new, mesh, 1.0, 0.0,
                n_iter=self.mules_n_iter,
            )
            alpha1_new = jnp.clip(alpha1_new, 0.0, 1.0)
            if self.smooth_alpha:
                # smoothSolution.H: blend toward the area-weighted average of
                # the face-interpolated field (fvc::average analogue);
                # per-face areas vary on r-weighted (axisymmetric) metrics
                def _areas(a):
                    ar = jnp.broadcast_to(mesh.face_area(a),
                                          mesh.face_shape(a))
                    lo = jnp.take(ar, jnp.arange(0, mesh.shape[a]), axis=a)
                    hi = jnp.take(ar, jnp.arange(1, mesh.shape[a] + 1),
                                  axis=a)
                    return lo, hi

                pair_areas = [_areas(a) for a in range(nd)]
                wsum = sum(lo + hi for lo, hi in pair_areas)
                for _ in range(self.n_smooth_iters):
                    af = fvsc.interpolate(alpha1_new, bc_a, mesh, t=t)
                    avg = sum(
                        (jnp.take(af[a], jnp.arange(0, mesh.shape[a]),
                                  axis=a) * pair_areas[a][0]
                         + jnp.take(af[a], jnp.arange(1, mesh.shape[a] + 1),
                                    axis=a) * pair_areas[a][1])
                        for a in range(nd)) / wsum
                    alpha1_new = ((1.0 - self.smooth_coeff) * alpha1_new
                                  + self.smooth_coeff * avg)
                alpha1_new = jnp.clip(alpha1_new, 0.0, 1.0)
            alpha2_new = 1.0 - alpha1_new

            # ---- mixture density + mass fluxes (:275-293) ----------------
            rho_new = pr.rho(alpha1_new)
            phiA2 = tuple(phi[a] - phiA1_lim[a] for a in range(nd))
            rhoPhi = tuple(
                phiA1_lim[a] * rho1 + phiA2[a] * rho2 for a in range(nd)
            )
            phiRhofWf = tuple(
                phiu[a] * (a1f[a] * rho1 * W1[a] + a2f[a] * rho2 * W2[a])
                for a in range(nd)
            )
            phiUfRhof = tuple(
                rhoPhi[a] * Uf[a] - phiRhofWf[a] for a in range(nd)
            )

            # ---- UEqn (:296-345) -----------------------------------------
            snp_flux = tuple(snp[a] * area[a] for a in range(nd))
            press_frc = (reconstruct(snp_flux, mesh) - cFrc) * (
                1.0 + da1dt * (Tau1 - Tau2)
            )[None]
            # (Sf & T(gradU))_j = |Sf| * dU_a/dx_j = column a of the
            # G[i, j] = dU_j/dx_i tensor (see solvers/qhd.py)
            gradU_cell = fvsc.grad_cell_vector(U, bc_U, mesh, t=t)
            gradU_f = fvsc.interpolate(
                gradU_cell.reshape((nd * nd,) + mesh.shape),
                bc_zg, mesh,
            )
            transp_flux = tuple(
                muf[a] * area[a]
                * gradU_f[a].reshape((nd, nd) + mesh.face_shape(a))[:, a]
                for a in range(nd)
            )
            rhs_U = (
                rho_old[None] * U / dt_new
                - fvsc.div_flux(phiUfRhof, mesh)
                + fvsc.div_flux(transp_flux, mesh)
                + BdFrc
                - press_frc
            )
            if mesh.axisymmetric:
                # wedge (x, r) cylindrical vector laplacian: the r-weighted
                # face metrics supply (1/r)d(r d()/dr); the remaining hoop
                # term of (lap U)_r is -mu u_r/r^2 (mirrors qhd.py; the
                # interface curvature's hoop part comes free through the
                # r-weighted div in interface_properties)
                r_c = mesh.cell_coords(1)
                rhs_U = rhs_U.at[1].add(-mu * U[1] / (r_c * r_c))
            if self.implicit_diffusion:
                resU = linsolve.solve_helmholtz(
                    diag_coeff=rho_new / dt_new, gamma_faces=muf, rhs=rhs_U,
                    x0=U, bcs=bc_U, mesh=mesh, t=t, vector=True,
                    tol=self.cg_tol, maxiter=self.cg_maxiter,
                )
                U_new = resU.x
            else:
                lapU = fvsc.laplacian_explicit(muf, U, bc_U, mesh, t=t,
                                               vector=True)
                U_new = (rhs_U + lapU) * dt_new / rho_new[None]

            return State(U=U_new, alpha1=alpha1_new, p=p_new,
                         t=t + dt_new, dt=dt_new)

        return step
