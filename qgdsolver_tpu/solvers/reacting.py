"""reactingLagrangianQGDFoam's Eulerian core: multicomponent reacting QGD.

Re-design of reference QGDsolver/reactingLagrangianQGDFoam
(reactingLagrangianQGDFoam_8C_source.html:46-150).  Per step, on top of the
QGDFoam flux stack:
  * species fluxes (updateFluxes.H:117-132): per active specie
      phiJmY_i = phiJm*Yf_i - phi*tau_f*(Uf.grad Yf_i),
    the tau term doubling as the specie diffusive flux bookkeeping;
  * QGDYEqn.H:35-92: combustion->correct, Qdot; per active specie
      ddt(rho,Yi) + div(phiJmYi) - laplacian(muf/Sc_i, Yi)
        = R(Yi) [+ parcel sources],
    diffusive-flux accounting + inert-specie closure Y_inert = 1 - sum(Y);
  * addEnergyFluxes.H:42-88: per-specie enthalpy transport added to phiQ:
      phiQ += diffusiveFlux_i*Hs_i_f + snGrad(Y_i)|Sf|*(Es_i*alphaEff)_f;
  * QGDEEqn with rhoESu = parcels.Sh + Qdot (here: Qdot + optional hook).

The mixture thermo (physics/species.py) supplies Y-dependent gamma/c/psi —
gammaf becomes a face field exactly as the reference's qgdInterpolate(gamma).
Lagrangian parcel sources enter through the optional `sources` hook
(solvers/particles.py provides the cloud implementation).
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..core.mesh import Mesh
from ..core import bc as bcm
from ..ops import fvsc, linsolve
from ..ops.pad import ghost_pad
from ..physics.species import MixtureThermo
from ..physics.chemistry import CombustionModel, NoCombustion
from ..physics.qgdcoeffs import TauModel, ConstScPrModel1
from . import common
from .common import TimeControls


class State(tp.NamedTuple):
    rho: jax.Array
    rhoU: jax.Array  # (d, *cells)
    rhoE: jax.Array
    Y: jax.Array  # (n_species, *cells)
    T: jax.Array  # carried as the Newton initial guess (diagnostic)
    sc: jax.Array
    t: jax.Array
    dt: jax.Array
    # DeviceISAT table dict when tabulation is configured (static None hole
    # otherwise) — rides in the scan carry so retrieval works under jit
    tab: tp.Any = None


@dataclasses.dataclass(frozen=True)
class ReactingQGDFoam:
    mesh: Mesh
    mixture: MixtureThermo
    combustion: CombustionModel = NoCombustion()
    # chemistry integrator for the stiff source (makeChemistrySolversQGD
    # equivalents: none / EulerImplicit / ode — physics.chemistry)
    chemistry_solver: tp.Any = None
    # device-resident rate tabulation (physics.chemistry.DeviceISAT): the
    # table rides in State.tab so retrieval/insert run inside the jitted
    # step — the runtime-selectable TDAC tabulation of the reference
    # (BasicChemistryModelsQGD_8C_source.html:48-60).  A TDAC
    # chemistry_solver carrying a DeviceISAT engages it automatically.
    tabulation: tp.Any = None
    tau_model: TauModel = ConstScPrModel1()
    bc_U: tp.Optional[bcm.FieldBCs] = None
    bc_p: tp.Optional[bcm.FieldBCs] = None
    bc_T: tp.Optional[bcm.FieldBCs] = None
    # one FieldBCs for all species, or a per-specie tuple of FieldBCs
    bc_Y: tp.Any = None
    time: TimeControls = TimeControls()
    implicit_diffusion: bool = False
    cg_tol: float = 1e-8
    cg_maxiter: int = 500
    fvsc_scheme: tp.Any = "full"

    def _bcs(self):
        nd = self.mesh.ndim
        zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        return (self.bc_U or zg, self.bc_p or zg, self.bc_T or zg,
                self.bc_Y or zg)

    def _tabulation(self):
        """(DeviceISAT or None, chemistry solver to use for misses): a
        directly-configured `tabulation`, or one owned by a TDAC
        chemistry_solver (whose own tabulation hook is then bypassed so the
        stateful device table does the caching)."""
        from ..physics.chemistry import DeviceISAT, TDACChemistrySolver

        solver = self.chemistry_solver
        tabu = self.tabulation
        if tabu is None and isinstance(solver, TDACChemistrySolver) and \
                isinstance(solver.tabulation, DeviceISAT):
            tabu = solver.tabulation
            solver = dataclasses.replace(solver, tabulation=None)
        return tabu, solver

    def init(self, p0, T0, U0, Y0, t0=0.0) -> State:
        mix = self.mixture
        p0, T0, U0, Y0 = map(jnp.asarray, (p0, T0, U0, Y0))
        rho = mix.rho_from_p_T(Y0, p0, T0)
        e = mix.e_from_T(Y0, T0)
        rhoU = rho[None] * U0
        rhoE = rho * e + 0.5 * rho * jnp.sum(U0 * U0, axis=0)
        dt = jnp.asarray(self.time.dt0, dtype=rho.dtype)
        tabu, _ = self._tabulation()
        tab = (tabu.init(mix.n_species, dtype=rho.dtype)
               if tabu is not None else None)
        return State(rho=rho, rhoU=rhoU, rhoE=rhoE, Y=Y0, T=T0,
                     sc=jnp.zeros_like(rho),
                     t=jnp.asarray(t0, dtype=rho.dtype), dt=dt, tab=tab)

    def primitives(self, s: State):
        mix = self.mixture
        U = s.rhoU / s.rho[None]
        e = s.rhoE / s.rho - 0.5 * jnp.sum(U * U, axis=0)
        T = mix.T_from_e(s.Y, e, s.T)
        p = mix.p_from_rho_T(s.Y, s.rho, T)
        return U, e, T, p

    def make_step(self, sources: tp.Optional[tp.Callable] = None):
        """sources(state, primitives, dt) -> (rhoSu, rhoUSu, rhoESu, YSu) —
        the parcels.SU/Sh/SYi hook (zero when None); `dt` is the dt actually
        applied this step, so exchange terms conserve exactly under adaptive
        time stepping."""
        mesh = self.mesh
        nd = mesh.ndim
        mix = self.mixture
        ns = mix.n_species
        inert = mix.inert
        sc_nums = mix.sc_numbers()
        bc_U, bc_p0, bc_T, bc_Y = self._bcs()
        tc = self.time
        scheme = self.fvsc_scheme
        sch_U = fvsc.scheme_for(scheme, "grad(U)")
        sch_e = fvsc.scheme_for(scheme, "grad(e)")
        sch_rho = fvsc.scheme_for(scheme, "grad(rho)")
        sch_p = fvsc.scheme_for(scheme, "grad(p)")
        sch_Y = fvsc.scheme_for(scheme, "grad(Yi)")
        bc_zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        area = tuple(mesh.face_area(a) for a in range(nd))

        tabu, chem_solver = self._tabulation()

        def step(s: State) -> State:
            rho, rhoU, rhoE, Y = s.rho, s.rhoU, s.rhoE, s.Y
            sc_prev, t, dt = s.sc, s.t, s.dt
            U, e, T, p = self.primitives(s)
            # resolve inletOutlet markers against the current flow direction
            bc_Us = bcm.resolve_inlet_outlet(bc_U, U, nd)
            bc_Ts = bcm.resolve_inlet_outlet(bc_T, U, nd)
            bc_ps = bcm.resolve_inlet_outlet(bc_p0, U, nd)
            bc_Ys = (bcm.resolve_inlet_outlet(bc_Y, U, nd)
                     if isinstance(bc_Y, bcm.FieldBCs)
                     else tuple(bcm.resolve_inlet_outlet(b, U, nd) for b in bc_Y))
            c = mix.c_from_pT(Y, p, T)
            mu_mol = mix.mu(p, T)
            alphau_mol = mix.alphah(p, T)

            coeffs = self.tau_model.correct(
                mesh, c=c, p=p, rho=rho, sc_prev=sc_prev, mu=mu_mol,
                bc_p=bc_ps, t=t,
            )
            tau_f = coeffs.tau_f
            mu_eff = mu_mol + coeffs.mu_qgd
            alphau_eff = alphau_mol + coeffs.alphau_qgd

            # padded primitives with thermodynamically-consistent ghosts
            p_pad = ghost_pad(p, bc_ps, mesh, t=t)
            T_pad = ghost_pad(T, bc_Ts, mesh, t=t)
            U_pad = ghost_pad(U, bc_Us, mesh, t=t, vector=True)
            Y_pad = _pad_species(Y, bc_Ys, mesh, t)  # leading species axis
            rho_pad = mix.rho_from_p_T(Y_pad, p_pad, T_pad)
            e_pad = mix.e_from_T(Y_pad, T_pad)
            rhoU_pad = rho_pad[None] * U_pad
            rhoE_pad = rho_pad * e_pad + 0.5 * rho_pad * jnp.sum(U_pad * U_pad, 0)
            H_pad = (rhoE_pad + p_pad) / rho_pad
            c_pad = mix.c_from_pT(Y_pad, p_pad, T_pad)
            gamma_pad = mix.gamma(Y_pad, T_pad)

            rhof = fvsc.interp_from_padded(rho_pad, mesh)
            Uf = fvsc.interp_from_padded(U_pad, mesh)
            rhoUf = fvsc.interp_from_padded(rhoU_pad, mesh)
            UrhoUf_row = tuple(
                fvsc.interp_axis_from_padded(U_pad[a] * rhoU_pad, mesh, a)
                for a in range(nd)
            )
            pf = fvsc.interp_from_padded(p_pad, mesh)
            cf = fvsc.interp_from_padded(c_pad, mesh)
            Hf = fvsc.interp_from_padded(H_pad, mesh)
            gammaf = fvsc.interp_from_padded(gamma_pad, mesh)
            Yf = fvsc.interp_from_padded(Y_pad, mesh)
            muf = fvsc.interpolate(mu_eff, bc_zg, mesh)
            alphauf = fvsc.interpolate(alphau_eff, bc_zg, mesh)

            gradUf = fvsc.grad_from_padded(U_pad, mesh, scheme=sch_U)
            gradef = fvsc.grad_from_padded(e_pad, mesh, scheme=sch_e)
            gradRhof = fvsc.grad_from_padded(rho_pad, mesh, scheme=sch_rho)
            gradPf = fvsc.grad_from_padded(p_pad, mesh, scheme=sch_p)
            gradYf = fvsc.grad_from_padded(Y_pad, mesh, scheme=sch_Y)
            snYf = fvsc.sn_grad_from_padded(Y_pad, mesh)

            phiJm = [None] * nd
            phiJmU = [None] * nd
            phiP = [None] * nd
            phiPi = [None] * nd
            phiJmH = [None] * nd
            phiQ = [None] * nd
            phiPiU = [None] * nd
            phi_mass = [None] * nd  # phi = Sf & rhoUf (plain)
            phiJmY = [[None] * nd for _ in range(ns)]
            diffusiveFlux = [[None] * nd for _ in range(ns)]

            for a in range(nd):
                gU = gradUf[a]
                uf = Uf[a]
                ruf = rhoUf[a]
                divU = sum(gU[i, i] for i in range(nd))
                u_gradrho = sum(uf[i] * gradRhof[a][i] for i in range(nd))
                rhoU_gradU = [
                    sum(ruf[i] * gU[i, j] for i in range(nd)) for j in range(nd)
                ]
                w_star = [
                    tau_f[a] * (u_gradrho * uf[j] + ruf[j] * divU + rhoU_gradU[j])
                    for j in range(nd)
                ]
                jm_n = ruf[a] - (w_star[a] + tau_f[a] * gradPf[a][a])
                phiJm[a] = jm_n * area[a]
                phi_mass[a] = ruf[a] * area[a]

                phiJmU[a] = phiJm[a] * uf
                phiP[a] = area[a] * pf[a]
                u_gradp = sum(uf[i] * gradPf[a][i] for i in range(nd))
                iso = u_gradp + gammaf[a] * pf[a] * divU
                urr = UrhoUf_row[a]
                pi_row = []
                for j in range(nd):
                    pij = tau_f[a] * (
                        sum(urr[k] * gU[k, j] for k in range(nd))
                        + uf[a] * gradPf[a][j]
                        + (iso if j == a else 0.0)
                    )
                    if not self.implicit_diffusion:
                        pij = pij + muf[a] * (
                            gU[a, j] + gU[j, a]
                            - ((2.0 / 3.0) * divU if j == a else 0.0)
                        )
                    pi_row.append(pij)
                phiPi[a] = area[a] * jnp.stack(pi_row, axis=0)

                phiJmH[a] = phiJm[a] * Hf[a]
                de = [
                    gradef[a][k] - (pf[a] / rhof[a] ** 2) * gradRhof[a][k]
                    for k in range(nd)
                ]
                q_n = -tau_f[a] * sum(urr[k] * de[k] for k in range(nd))
                if not self.implicit_diffusion:
                    q_n = q_n - alphauf[a] * gradef[a][a]
                phiQ[a] = q_n * area[a]
                phiPiU[a] = area[a] * sum(pi_row[j] * uf[j] for j in range(nd))

                # species fluxes (updateFluxes.H:117-132)
                for i in range(ns):
                    if i == inert:
                        continue
                    # gradYf[a][k, i] = dY_i/dx_k (deriv axis leads)
                    u_gradY = sum(uf[k] * gradYf[a][k, i] for k in range(nd))
                    dydtflux = -phi_mass[a] * tau_f[a] * u_gradY
                    phiJmY[i][a] = phiJm[a] * Yf[a][i] + dydtflux
                    diffusiveFlux[i][a] = dydtflux

            co = common.courant_acoustic(Uf, cf, dt, mesh)
            dt_new = common.set_delta_t(dt, co, common.tau_f_min(tau_f), tc)

            # optional source hook (parcels.SU/Sh/SYi)
            rhoSu = rhoUSu = rhoESu_extra = YSu = None
            if sources is not None:
                rhoSu, rhoUSu, rhoESu_extra, YSu = sources(s, (U, e, T, p),
                                                           dt_new)

            # --- QGDRhoEqn
            rho_new = rho - dt_new * fvsc.div_flux(tuple(phiJm), mesh)
            if rhoSu is not None:
                rho_new = rho_new + dt_new * rhoSu

            # --- QGDYEqn (combustion + species transport + inert closure)
            # gradient-limited families (diffusion/diffusionMulticomponent)
            # and EDC read auxiliary fields; computed only when declared
            aux = None
            if getattr(self.combustion, "needs_aux", False):
                aux = {"mu_eff": mu_eff}
                if getattr(self.combustion, "needs_grad", False):
                    aux["gradY"] = tuple(
                        fvsc.grad_cell(Y[i], _bc_species(bc_Ys, i), mesh, t=t)
                        for i in range(ns))
            from ..physics.chemistry import _call as _comb_call

            def _rates(Yc, rhoc, Tc, pc, dtc, miss=None):
                if chem_solver is not None:
                    return chem_solver.rates(self.combustion, mix, Yc, rhoc,
                                             Tc, pc, dtc, aux=aux)
                return _comb_call(self.combustion, mix, Yc, rhoc, Tc, pc,
                                  dtc, aux=aux)

            if tabu is not None:
                (RR, Qdot), tab_new = tabu.rates_stateful(
                    s.tab, _rates, mix, tuple(Y), rho, T, p, dt_new)
            else:
                RR, Qdot = _rates(tuple(Y), rho, T, p, dt_new)
                tab_new = s.tab
            Y_new = [None] * ns
            Yt = 0.0
            for i in range(ns):
                if i == inert:
                    continue
                gamma_y = tuple(muf[a] / sc_nums[i] for a in range(nd))
                lap_Yi = fvsc.laplacian_explicit(
                    gamma_y, Y[i], _bc_species(bc_Ys, i), mesh, t=t
                )
                rhs = rho * Y[i] / dt_new - fvsc.div_flux(
                    tuple(phiJmY[i]), mesh
                ) + RR[i]
                if YSu is not None:
                    rhs = rhs + YSu[i]
                if self.implicit_diffusion:
                    res = linsolve.solve_helmholtz(
                        diag_coeff=rho_new / dt_new, gamma_faces=gamma_y,
                        rhs=rhs, x0=Y[i], bcs=_bc_species(bc_Ys, i), mesh=mesh,
                        t=t, tol=self.cg_tol, maxiter=self.cg_maxiter,
                    )
                    Yi = res.x
                else:
                    Yi = (rhs + lap_Yi) * dt_new / rho_new
                Yi = jnp.maximum(Yi, 0.0)
                Y_new[i] = Yi
                Yt = Yt + Yi
                # diffusive flux completion (QGDYEqn_8H:64/:82 adds the
                # laplacian face flux; the physical down-gradient specie mass
                # flux is -Gamma*snGrad(Yi)*|Sf|, matching YEqn.flux() of the
                # -fvm::laplacian term in the implicit branch)
                for a in range(nd):
                    diffusiveFlux[i][a] = diffusiveFlux[i][a] - \
                        (muf[a] / sc_nums[i]) * snYf[a][i] * area[a]
            Y_new[inert] = jnp.maximum(1.0 - Yt, 0.0)
            Y_new = jnp.stack(Y_new, axis=0)

            # --- addEnergyFluxes.H: specie enthalpy fluxes into phiQ
            Hs_cells = jnp.stack([mix.hs_i(i, T) for i in range(ns)], axis=0)
            Es_alpha = jnp.stack(
                [mix.es_i(i, T) * alphau_eff for i in range(ns)], axis=0
            )
            Hs_f = fvsc.interpolate(Hs_cells, bc_zg, mesh)
            EsA_f = fvsc.interpolate(Es_alpha, bc_zg, mesh)
            for a in range(nd):
                extra = 0.0
                for i in range(ns):
                    if i == inert:
                        continue
                    extra = extra + diffusiveFlux[i][a] * Hs_f[a][i] \
                        + snYf[a][i] * area[a] * EsA_f[a][i]
                # inert specie: diffusiveFlux[inert] = -sum(others)
                inert_flux = -sum(
                    diffusiveFlux[i][a] for i in range(ns) if i != inert
                )
                extra = extra + inert_flux * Hs_f[a][inert] \
                    + snYf[a][inert] * area[a] * EsA_f[a][inert]
                phiQ[a] = phiQ[a] + extra

            # --- QGDUEqn (explicit)
            from .qgd import eye_vec

            mom_flux = tuple(
                phiJmU[a] + eye_vec(phiP[a], a, nd) - phiPi[a] for a in range(nd)
            )
            rhoU_new = rhoU - dt_new * fvsc.div_flux(mom_flux, mesh)
            if rhoUSu is not None:
                rhoU_new = rhoU_new + dt_new * rhoUSu
            U_new = rhoU_new / rho_new[None]

            phiSigmaDotU = None
            if self.implicit_diffusion:
                # implicit NS diffusion sub-step (QGDUEqn_8H:54-75)
                gradU_cell = fvsc.grad_cell_vector(U, bc_Us, mesh, t=t)
                from .qgd import dev2T

                tauMC = mu_eff * dev2T(gradU_cell, nd)
                tauMC_f = fvsc.interpolate(
                    tauMC.reshape((nd * nd,) + mesh.shape), bc_zg, mesh
                )
                phiTauMC = tuple(
                    area[a] * tauMC_f[a].reshape((nd, nd) + mesh.face_shape(a))[a]
                    for a in range(nd)
                )
                resU = linsolve.solve_helmholtz(
                    diag_coeff=rho_new / dt_new, gamma_faces=muf,
                    rhs=rho_new * U_new / dt_new + fvsc.div_flux(phiTauMC, mesh),
                    x0=U_new, bcs=bc_Us, mesh=mesh, t=t, vector=True,
                    tol=self.cg_tol, maxiter=self.cg_maxiter,
                )
                U_new = resU.x
                rhoU_new = rho_new[None] * U_new
                gradU_lin_f = fvsc.interpolate(
                    gradU_cell.reshape((nd * nd,) + mesh.shape), bc_zg, mesh
                )
                phiSigmaDotU = tuple(
                    area[a] * jnp.sum(
                        (muf[a] * gradU_lin_f[a].reshape(
                            (nd, nd) + mesh.face_shape(a))
                         + tauMC_f[a].reshape((nd, nd) + mesh.face_shape(a)))[a]
                        * Uf[a], axis=0)
                    for a in range(nd)
                )

            # --- QGDEEqn with rhoESu = Qdot (+ parcels)
            e_flux = tuple(
                phiJmH[a] + phiQ[a] - phiPiU[a]
                - (phiSigmaDotU[a] if phiSigmaDotU is not None else 0.0)
                for a in range(nd)
            )
            rhoE_new = rhoE - dt_new * fvsc.div_flux(e_flux, mesh) \
                + dt_new * Qdot
            if rhoESu_extra is not None:
                rhoE_new = rhoE_new + dt_new * rhoESu_extra

            e_new = rhoE_new / rho_new - 0.5 * jnp.sum(U_new * U_new, axis=0)
            if self.implicit_diffusion:
                # implicit heat diffusion sub-step (QGDEEqn_8H:53-64)
                resE = linsolve.solve_helmholtz(
                    diag_coeff=rho_new / dt_new, gamma_faces=alphauf,
                    rhs=rho_new * e_new / dt_new, x0=e_new, bcs=bc_zg,
                    mesh=mesh, t=t, tol=self.cg_tol, maxiter=self.cg_maxiter,
                )
                e_new = resE.x
                rhoE_new = rho_new * (e_new + 0.5 * jnp.sum(U_new * U_new, axis=0))
            T_new = mix.T_from_e(Y_new, e_new, T)

            return State(rho=rho_new, rhoU=rhoU_new, rhoE=rhoE_new, Y=Y_new,
                         T=T_new, sc=coeffs.sc, t=t + dt_new, dt=dt_new,
                         tab=tab_new)

        return step


def _bc_species(bc_Y, i: int) -> bcm.FieldBCs:
    """Per-specie BC view: bc_Y may be one FieldBCs applied uniformly, or a
    sequence with one FieldBCs per specie — the reference's species fields
    each carry their own boundary dictionaries (QGDYEqn_8H_source.html:35-92
    solves each specie with its own Y_i patches)."""
    if isinstance(bc_Y, bcm.FieldBCs):
        return bc_Y
    return bc_Y[i]


def _pad_species(Y, bc_Y, mesh, t):
    """Ghost-pad the (ns, *cells) species stack under per-specie BCs."""
    from ..ops.pad import ghost_pad as _gp

    if isinstance(bc_Y, bcm.FieldBCs):
        return _gp(Y, bc_Y, mesh, t=t)
    import jax.numpy as _jnp

    return _jnp.stack(
        [_gp(Y[i], bc_Y[i], mesh, t=t) for i in range(Y.shape[0])], axis=0
    )
