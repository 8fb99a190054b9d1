"""scalarTransportQHDFoam — passive-scalar QHD advection-diffusion.

Re-design of reference QGDsolver/scalarTransportQHDFoam
(scalarTransportQHDFoam_8C_source.html:60-144): frozen velocity U, T
transported with the QGD regularizing flux
  phiTf      = phiu * T_f                       (qgdFlux, linear)
  phiTauTReg = tau_f * phiu * (U_f . grad_f T)  (:111)
  solve  ddt(T) + div(phiTf) - Sp(div(phiu), T)
         - laplacian(Hi_f, T) - div(phiTauTReg) = 0     (:116-124)
with Hi_f = alpha_f/rho_f, advective Courant dt control (:86-98), and the
implicit diffusion solved by matrix-free CG (the fvm::laplacian replacement).

The whole step is one jitted function of the state pytree.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..core.mesh import Mesh
from ..core import bc as bcm
from ..ops import fvsc, linsolve
from ..physics.thermo import RhoConstThermo
from ..physics.qgdcoeffs import TauModel, HbyUQHD
from . import common
from .common import TimeControls


class State(tp.NamedTuple):
    T: jax.Array
    U: jax.Array  # frozen velocity (d, *cells)
    t: jax.Array
    dt: jax.Array


@dataclasses.dataclass(frozen=True)
class ScalarTransportQHD:
    """Config + step factory for the scalar-transport solver."""

    mesh: Mesh
    thermo: RhoConstThermo
    tau_model: TauModel = HbyUQHD()
    bc_T: tp.Optional[bcm.FieldBCs] = None
    bc_U: tp.Optional[bcm.FieldBCs] = None
    time: TimeControls = TimeControls()
    implicit_diffusion: bool = True
    cg_tol: float = 1e-8
    cg_maxiter: int = 500

    def _bcs(self):
        nd = self.mesh.ndim
        bt = self.bc_T or bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        bu = self.bc_U or bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        return bt, bu

    def init(self, T0, U0, t0=0.0) -> State:
        dt = jnp.asarray(self.time.dt0, dtype=jnp.asarray(T0).dtype)
        return State(T=jnp.asarray(T0), U=jnp.asarray(U0),
                     t=jnp.asarray(t0, dtype=dt.dtype), dt=dt)

    def make_step(self):
        mesh = self.mesh
        nd = mesh.ndim
        bc_T, bc_U = self._bcs()
        thermo = self.thermo
        tc = self.time

        def step(s: State) -> State:
            T, U, t, dt = s
            rho = thermo.rho(None, T)
            alpha = thermo.alphah(None, T)

            # updateFields.H: gradTf, alphaf, rhof, Tf, Hif.  Coefficient
            # fields interpolate with zero-gradient (`calculated`) ghosts —
            # homogeneous FixedValue ghosts would zero the boundary
            # diffusivity and decouple fixed-T walls entirely (bug caught by
            # the axisymmetric annulus-conduction validation).
            bc_zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
            gradTf = fvsc.grad(T, bc_T, mesh, t=t)
            alphaf = fvsc.interpolate(alpha, bc_zg, mesh)
            rhof = fvsc.interpolate(rho, bc_zg, mesh)
            Tf = fvsc.interpolate(T, bc_T, mesh, t=t)
            Uf = fvsc.interpolate(U, bc_U, mesh, t=t, vector=True)
            Hif = tuple(alphaf[a] / rhof[a] for a in range(nd))

            # tau coefficients
            coeffs = self.tau_model.correct(
                mesh, p=T, T=T, ref=T, mu=thermo.mu(None, T), rho=rho, c=None
            )

            # updateFluxes.H: phiu = Sf & Uf (area-included normal flux)
            phiu = tuple(
                common.face_normal_speed(Uf[a], a) * mesh.face_area(a)
                for a in range(nd)
            )

            # Courant + setDeltaT (mag(Uf) variant, :86-98)
            co = common.courant_mag(Uf, dt, mesh)
            dt_new = common.set_delta_t(dt, co, common.tau_f_min(coeffs.tau_f), tc)

            # T equation
            phiTf = tuple(phiu[a] * Tf[a] for a in range(nd))
            u_dot_gradT = tuple(
                jnp.sum(Uf[a] * gradTf[a], axis=0) for a in range(nd)
            )
            phiTauTReg = tuple(
                coeffs.tau_f[a] * phiu[a] * u_dot_gradT[a] for a in range(nd)
            )
            div_phiTf = fvsc.div_flux(phiTf, mesh)
            div_phiu = fvsc.div_flux(phiu, mesh)
            div_reg = fvsc.div_flux(phiTauTReg, mesh)

            # ddt(T) + div(phiTf) - Sp(div(phiu),T) - lap(Hif,T) - div(reg) = 0
            rhs = T / dt_new - div_phiTf + div_phiu * T + div_reg
            if self.implicit_diffusion:
                res = linsolve.solve_helmholtz(
                    diag_coeff=1.0 / dt_new, gamma_faces=Hif, rhs=rhs, x0=T,
                    bcs=bc_T, mesh=mesh, t=t + dt_new,
                    tol=self.cg_tol, maxiter=self.cg_maxiter,
                )
                T_new = res.x
            else:
                lap = fvsc.laplacian_explicit(Hif, T, bc_T, mesh, t=t)
                T_new = dt_new * (rhs + lap)

            return State(T=T_new, U=U, t=t + dt_new, dt=dt_new)

        return step
