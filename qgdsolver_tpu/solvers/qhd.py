"""QHDFoam — incompressible quasi-hydrodynamic solver with Boussinesq buoyancy.

Re-design of reference QGDsolver/QHDFoam (QHDFoam_8C_source.html:60-145):
per step —
  updateFields.H  : gradUf/gradTf (fvsc), interpolations, BdFrc = beta*T*g
                    (QHDFoam_2updateFields_8H:36-73)
  updateFluxes.H  : phiu = Sf&Uf; phiwo = Sf&(tau_f((Uf.grad)U - BdFrc)_f);
                    taubyrhof = tau_f/rho_f (QHDFoam_2updateFluxes_8H:33-38)
  QHDCourantNo.H + setDeltaT
  QHDpEqn.H       : div(phiu) - div(phiwo) - laplacian(tau/rho, p) = 0;
                    phi = phiu - phiwo + pEqn.flux()   (QHDpEqn_8H:33-48)
  QHDUEqn.H       : Wf = tau_f((Uf.grad)U + gradPf/rho_f - BdFrcf);
                    ddt(U) + div(phi*Uf - phiu*Wf) - lap(nu_f, U)
                    - div(nu_f Sf.(gradU)^T_f) = -grad(p)/rho + BdFrc
                    (QHDUEqn_8H:36-85)
  QHDTEqn.H       : ddt(T) + div(phi*Tf) - lap(Hi_f, T)
                    - div(tau_f*phiu*(Uf.gradTf)) = 0  (QHDTEqn_8H:64-95)
  p reference fix (QHDFoam_8C:123-131)

The Poisson solve and implicit diffusion use the matrix-free CG; the flux
`phi` is assembled exactly like `pEqn.flux()` — the same face expression whose
divergence the CG drove to zero — so div(phi) == 0 to solver tolerance.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp

from ..core.mesh import Mesh
from ..core import bc as bcm
from ..ops import fvsc, linsolve, mules
from ..ops.pad import ghost_pad
from ..physics.thermo import RhoConstThermo
from ..physics.qgdcoeffs import TauModel, HbyUQHD
from . import common
from .common import TimeControls


class State(tp.NamedTuple):
    U: jax.Array  # (d, *cells)
    T: jax.Array
    p: jax.Array
    t: jax.Array
    dt: jax.Array


def _cross_omega(omega, U, nd):
    """Omega x U for a 3-vector Omega and an nd-component velocity field.
    2D fields live in the z=const plane: only omega_z acts."""
    if nd == 2:
        wz = omega[2] if omega.shape[0] == 3 else omega[0]
        return jnp.stack([-wz * U[1], wz * U[0]], axis=0)
    return jnp.stack([
        omega[1] * U[2] - omega[2] * U[1],
        omega[2] * U[0] - omega[0] * U[2],
        omega[0] * U[1] - omega[1] * U[0],
    ], axis=0)


def _sub_flux_bc(bc_p, grads):
    """Replace QHDFluxP/QGDFluxP markers with per-step FixedGradient arrays."""
    out = bc_p
    for (a, side), g in grads.items():
        out = out.replace(a, side, bcm.FixedGradient(g))
    return out


@dataclasses.dataclass(frozen=True)
class QHDFoam:
    mesh: Mesh
    thermo: RhoConstThermo
    tau_model: TauModel = HbyUQHD()
    g: tp.Tuple[float, ...] = None  # gravity vector, len = ndim
    omega: tp.Optional[tp.Tuple[float, float, float]] = None  # SRF rotation
    # QHDDyMFoam: prescribed rigid mesh-motion velocity U_mesh(t) -> (ndim,).
    # Convective fluxes are made relative (fvc::makeRelative(phi, U),
    # QHDDyMFoam_8C_source.html:109-135); the grid is treated as moving with
    # the frame, so solutions are reported in mesh coordinates.
    mesh_velocity: tp.Optional[tp.Callable] = None
    # QHDDyMFoam, DEFORMING mesh: prescribed per-axis dilation s(t) ->
    # (ndim,) scale factors; physical face positions are x_a(t) =
    # s_a(t)*xi_a (+ rigid offset from mesh_velocity).  The step runs on the
    # logical grid with metric factors applied to every operator, mesh face
    # fluxes u_m = sdot_a*xi_a + odot_a with Thomas-Lombard mixed-area
    # weighting (discrete GCL exact: sum of mesh fluxes == (V'-V)/dt per
    # cell), and moving-volume ddt (V/V')*old/dt — the structured-mesh
    # re-design of the reference's arbitrary dynamicFvMesh mesh.update() +
    # makeRelative (QHDDyMFoam_8C_source.html:44-60, 109-135).
    mesh_scale: tp.Optional[tp.Callable] = None
    # QHDDyMFoam, GENERAL per-axis motion: prescribed face-coordinate
    # trajectories t -> tuple of (n_a+1,) arrays (absolute positions,
    # strictly increasing).  Subsumes rigid translation and dilation and
    # adds arbitrary 1-D motions (pistons, oscillating walls, moving
    # refinement zones).  OpenFOAM order (QHDDyMFoam_8C:109-135): Courant
    # + setDeltaT on the pre-motion mesh, mesh.update(), then the whole
    # step on the POST-motion geometry (a per-trace core.mesh.TracedMesh)
    # with moving-volume ddt (V_old/V_new)*old/dt and Thomas-Lombard
    # mixed-area mesh fluxes (discrete GCL exact).  Mutually exclusive
    # with mesh_velocity/mesh_scale.
    mesh_faces: tp.Optional[tp.Callable] = None
    # checkMeshCourantNo analogue (controlDict option of the DyM solvers):
    # fold the mesh-flux Courant number into the dt controller so mesh
    # motion cannot outrun the grid (the reference only warns; capping is
    # the jit-compatible equivalent)
    check_mesh_courant: bool = False
    bc_U: tp.Optional[bcm.FieldBCs] = None
    bc_T: tp.Optional[bcm.FieldBCs] = None
    bc_p: tp.Optional[bcm.FieldBCs] = None
    time: TimeControls = TimeControls()
    implicit_diffusion: bool = True
    p_ref_value: float = 0.0
    cg_tol: float = 1e-8
    cg_maxiter: int = 1000
    fvsc_scheme: tp.Any = "full"
    # "standard" = QHDTEqn.H; "mules" = MULESTEqn.H bounded explicit
    # advection + implicit diffusion correction (mulesQHDFoam)
    t_equation: str = "standard"
    mules_n_iter: int = 3

    def _bcs(self):
        nd = self.mesh.ndim
        bu = self.bc_U or bcm.FieldBCs.uniform(bcm.FixedValue(jnp.zeros(nd)), nd)
        bt = self.bc_T or bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        bp = self.bc_p or bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        return bu, bt, bp

    def _p_singular(self, bp) -> bool:
        """Pure-Neumann p system? (needs reference fix, QHDFoam_8C:123)."""
        for a in range(self.mesh.ndim):
            for s in (0, 1):
                if isinstance(bp[a, s], bcm.FixedValue):
                    return False
        return True

    def init(self, U0, T0, p0=None, t0=0.0) -> State:
        T0 = jnp.asarray(T0)
        p0 = jnp.zeros_like(T0) if p0 is None else jnp.asarray(p0)
        dt = jnp.asarray(self.time.dt0, dtype=T0.dtype)
        return State(U=jnp.asarray(U0), T=T0, p=p0,
                     t=jnp.asarray(t0, dtype=T0.dtype), dt=dt)

    def make_step(self):
        if self.mesh_scale is not None and self.t_equation == "mules":
            raise NotImplementedError(
                "mules T-equation on a deforming mesh")
        general = self.mesh_faces is not None
        if general and (self.mesh_scale is not None
                        or self.mesh_velocity is not None):
            raise ValueError(
                "mesh_faces is the general motion spec — do not combine "
                "with mesh_velocity/mesh_scale")
        if general and self.t_equation == "mules":
            raise NotImplementedError(
                "mules T-equation on a deforming mesh")
        mesh = self.mesh
        nd = mesh.ndim
        bc_U, bc_T, bc_p0 = self._bcs()
        thermo = self.thermo
        tc = self.time
        gvec = jnp.asarray(self.g if self.g is not None else (0.0,) * nd)
        singular = self._p_singular(bc_p0)
        bc_zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
        scheme = self.fvsc_scheme
        sch_U = fvsc.scheme_for(scheme, "grad(U)")
        sch_T = fvsc.scheme_for(scheme, "grad(T)")
        sch_p = fvsc.scheme_for(scheme, "grad(p)")

        # stairstep immersed solid regions (dead cells of L-shaped
        # multi-block meshes): no-slip mirror fill before the step, masked
        # Helmholtz/Poisson operators (zero-flux faces, linsolve
        # fluid_mask), solid clamp after — the masked counterpart of the
        # reference's mesh-agnostic pEqn (QHDpEqn_8H_source.html:33-48)
        wall = None
        fluid_mask = None
        fmasks = None
        ref_cell = (0,) * nd
        if getattr(mesh, "solid", None) is not None:
            import numpy as _np

            from ..core.solid import StairstepSolid

            if (self.mesh_scale is not None
                    or self.mesh_velocity is not None or general):
                raise NotImplementedError("solid masks on a deforming mesh")
            wall = StairstepSolid(mesh.solid)
            fluid_np = ~_np.asarray(mesh.solid, dtype=bool)
            fluid_mask = fluid_np
            fmasks = linsolve.face_fluid_masks(mesh.solid, mesh)
            # the pRef cell must be a FLUID cell (cell (0,..,0) is solid in
            # a backward-facing step)
            ref_cell = tuple(int(i) for i in _np.argwhere(fluid_np)[0])

        mesh_c = mesh

        def step(s: State) -> State:
            mesh = mesh_c
            U, T, p, t, dt = s
            if wall is not None:
                # mirror-ghost fill of solid boundary cells: shared faces
                # see zero normal velocity and zero-gradient scalars
                T = wall.mirror(T)
                p = wall.mirror(p)
                U = wall.mirror_vector(U)
            # resolve inletOutlet markers against the current flow direction
            bc_Us = bcm.resolve_inlet_outlet(bc_U, U, nd)
            bc_Ts = bcm.resolve_inlet_outlet(bc_T, U, nd)
            rho = thermo.rho(p, T)
            mu = thermo.mu(p, T)
            alpha = thermo.alphah(p, T)

            # ---- general per-axis mesh motion (mesh_faces) ---------------
            # OpenFOAM order: Courant + setDeltaT on the PRE-motion mesh,
            # mesh.update(), then the whole step on the post-motion
            # geometry (QHDDyMFoam_8C_source.html:109-135)
            dt_pre = None
            vol_ratio = None
            mesh_sweep = None
            if general:
                from ..core.mesh import TracedMesh

                ctx = common.spmd.current()

                def mk_mesh(faces):
                    """Traced post-motion geometry; under an spmd
                    decomposition each shard windows the GLOBAL traced
                    arrays (ShardMesh over a TracedMesh — partition faces
                    see the true neighbour-side spacings)."""
                    tm = TracedMesh(
                        tuple(jnp.asarray(f, dtype=T.dtype)
                              for f in faces), dtype=mesh_c.dtype)
                    if ctx is None:
                        return tm
                    from ..parallel.shardmesh import ShardMesh

                    starts = []
                    shape_l = []
                    for b in range(nd):
                        axb = ctx.axes[b]
                        if axb is None or axb.size == 1:
                            starts.append(0)
                            shape_l.append(ctx.global_shape[b])
                        else:
                            starts.append(jax.lax.axis_index(axb.name)
                                          * axb.n_local)
                            shape_l.append(axb.n_local)
                    return ShardMesh(tm, starts, shape_l)

                m_old = mk_mesh(self.mesh_faces(t))
                m_est = mk_mesh(self.mesh_faces(t + dt))
                Uf0 = fvsc.interpolate(U, bc_Us, m_old, t=t, vector=True)
                Uf_rel0 = []
                mesh_co = jnp.zeros((), dtype=T.dtype)
                for a in range(nd):
                    um_f = m_old.bcast(
                        (m_est.x_faces[a] - m_old.x_faces[a]) / dt, a)
                    rel = jnp.concatenate(
                        [Uf0[a][i:i + 1] - (um_f[None] if i == a else 0.0)
                         for i in range(nd)], axis=0)
                    Uf_rel0.append(rel)
                    if self.check_mesh_courant:
                        mesh_co = jnp.maximum(
                            mesh_co,
                            common.spmd.all_max(jnp.max(jnp.abs(um_f)))
                            * dt / common.spmd.all_min(
                                jnp.min(m_old.h_face(a))))
                co0 = common.courant_advective(tuple(Uf_rel0), dt, m_old)
                if self.check_mesh_courant:
                    co0 = jnp.maximum(co0, mesh_co)
                coeffs0 = self.tau_model.correct(m_old, p=p, T=T, ref=T,
                                                 mu=mu, rho=rho)
                dt_pre = common.set_delta_t(
                    dt, co0, common.tau_f_min(coeffs0.tau_f), tc)
                # mesh.update(): every operator below runs on the moved
                # geometry via the traced-mesh view
                mesh = mk_mesh(self.mesh_faces(t + dt_pre))
                vol_ratio = (m_old.cell_volume
                             / mesh.cell_volume).astype(T.dtype)
                # Thomas-Lombard mixed-area mesh fluxes (axis a: NEW
                # spacings for b < a, OLD for b > a): the face sweeps
                # telescope to V_new - V_old per cell EXACTLY — the
                # discrete geometric conservation law.  All pieces come
                # from the (possibly shard-windowed) mesh accessors.
                dx_o = m_old.dx
                dx_n = mesh.dx

                def rs(v, a):
                    shape = [1] * nd
                    shape[a] = v.shape[0]
                    return v.reshape(shape)

                mesh_sweep = []
                for a in range(nd):
                    sw = rs((mesh.x_faces[a] - m_old.x_faces[a])
                            * (1.0 / dt_pre), a)
                    for b in range(nd):
                        if b < a:
                            sw = sw * rs(dx_n[b], b)
                        elif b > a:
                            sw = sw * rs(dx_o[b], b)
                    mesh_sweep.append(sw)

            # ---- updateFields.H ------------------------------------------
            deform = self.mesh_scale is not None
            gradUf = fvsc.grad(U, bc_Us, mesh, scheme=sch_U, t=t, vector=True)
            gradTf = fvsc.grad(T, bc_Ts, mesh, scheme=sch_T, t=t)
            if deform:
                # per-axis dilation: logical-grid derivatives pick up 1/s_i
                # metric factors (x_i = s_i(t)*xi_i)
                s_old = [jnp.asarray(v, dtype=T.dtype)
                         for v in self.mesh_scale(t)]
                gradUf = tuple(
                    jnp.stack([gradUf[a][i] / s_old[i] for i in range(nd)])
                    for a in range(nd))
                gradTf = tuple(
                    jnp.stack([gradTf[a][i] / s_old[i] for i in range(nd)])
                    for a in range(nd))
            muf = fvsc.interpolate(mu, bc_zg, mesh)
            alphaf = fvsc.interpolate(alpha, bc_zg, mesh)
            rhof = fvsc.interpolate(rho, bc_zg, mesh)
            Uf = fvsc.interpolate(U, bc_Us, mesh, t=t, vector=True)
            Tf = fvsc.interpolate(T, bc_Ts, mesh, t=t)
            BdFrc = thermo.beta * T[None] * gvec.reshape((nd,) + (1,) * nd)
            if self.omega is not None:
                # SRF body force: BdFrc -= 2*Omega x U (Coriolis, reference
                # SRFQHDFoam_2updateFields_8H:73: beta*T*g - 2.0*(SRF->omega()^U))
                BdFrc = BdFrc - 2.0 * _cross_omega(jnp.asarray(self.omega), U, nd)
            BdFrcf = fvsc.interpolate(BdFrc, bc_zg, mesh, vector=True)
            Hif = tuple(alphaf[a] / rhof[a] for a in range(nd))

            coeffs = self.tau_model.correct(mesh, p=p, T=T, ref=T, mu=mu, rho=rho)
            tau_f = coeffs.tau_f

            # ---- updateFluxes.H ------------------------------------------
            # (Uf & gradUf)_a[j] = sum_i Uf_i dU_j/dx_i  at a-faces
            # (unrolled component arithmetic — no dot_general, see qgd.py)
            u_dot_gradU = tuple(
                jnp.stack(
                    [sum(Uf[a][i] * gradUf[a][i, j] for i in range(nd))
                     for j in range(nd)], axis=0)
                for a in range(nd)
            )
            area = tuple(mesh.face_area(a) for a in range(nd))
            phiu = tuple(Uf[a][a] * area[a] for a in range(nd))
            wo = tuple(tau_f[a] * (u_dot_gradU[a] - BdFrcf[a]) for a in range(nd))
            phiwo = tuple(wo[a][a] * area[a] for a in range(nd))
            taubyrhof = tuple(tau_f[a] / rhof[a] for a in range(nd))
            # NOTE: phiu/phiwo are NOT masked at immersed faces — the
            # mirror fill already reproduces the body-fitted wall face
            # values exactly (Uf_n = 0 so phiu = 0; phiwo carries the
            # same tau*(0 - BdFrc) wall value a body-fitted boundary does)

            # ---- Courant + setDeltaT -------------------------------------
            if general:
                pass  # dt chosen on the pre-motion mesh above
            elif deform:
                # physical h_face = h_log*s: fold 1/s into the velocity.
                # The mesh face speed is the FULL u_m = sdot_a*xi_a + um0_a
                # the mesh fluxes use below — fast dilation must limit dt
                # like rigid motion does (advisor r2 fix; only the normal
                # component enters the advective Courant)
                sv = jnp.stack(s_old).reshape((nd,) + (1,) * nd)
                um0 = (jnp.asarray(self.mesh_velocity(t)).reshape(
                    (nd,) + (1,) * nd) if self.mesh_velocity is not None
                    else 0.0)
                s_fwd = [jnp.asarray(v, dtype=T.dtype)
                         for v in self.mesh_scale(t + dt)]
                mesh_co = jnp.zeros((), dtype=T.dtype)
                Uf_co = []
                for a in range(nd):
                    sdot_a = (s_fwd[a] - s_old[a]) / dt
                    xi = jnp.asarray(mesh.x_faces[a], dtype=T.dtype).reshape(
                        tuple(-1 if b == a else 1 for b in range(nd)))
                    dil = jnp.broadcast_to(sdot_a * xi,
                                           Uf[a].shape[1:])[None]
                    dil = jnp.concatenate(
                        [dil if i == a else jnp.zeros_like(dil)
                         for i in range(nd)], axis=0)
                    Uf_co.append((Uf[a] - um0 - dil) / sv)
                    # global reductions under spmd decomposition (the
                    # local h/face-speed extrema differ per shard)
                    h_phys = (common.spmd.all_min(
                        jnp.min(jnp.asarray(mesh.h_face(a),
                                            dtype=T.dtype))) * s_old[a])
                    um0_a = (jnp.asarray(self.mesh_velocity(t))[a]
                             if self.mesh_velocity is not None else 0.0)
                    mesh_co = jnp.maximum(
                        mesh_co,
                        common.spmd.all_max(
                            jnp.max(jnp.abs(sdot_a * xi + um0_a)))
                        * dt / h_phys)
                co = common.courant_advective(tuple(Uf_co), dt, mesh)
                if self.check_mesh_courant:
                    co = jnp.maximum(co, mesh_co)
            elif self.mesh_velocity is not None:
                um = jnp.asarray(self.mesh_velocity(t)).reshape((nd,) + (1,) * nd)
                Uf_rel = tuple(Uf[a] - um for a in range(nd))
                co = common.courant_advective(Uf_rel, dt, mesh)
                if self.check_mesh_courant:
                    umv = jnp.asarray(self.mesh_velocity(t))
                    mesh_co = jnp.max(jnp.stack([
                        jnp.abs(umv[a]) * dt
                        / common.spmd.all_min(
                            jnp.min(jnp.asarray(mesh.h_face(a),
                                                dtype=umv.dtype)))
                        for a in range(nd)]))
                    co = jnp.maximum(co, mesh_co)
            else:
                co = common.courant_advective(Uf, dt, mesh)
            if general:
                dt_new = dt_pre
            else:
                dt_new = common.set_delta_t(dt, co,
                                            common.tau_f_min(tau_f), tc)

            # ---- deforming-mesh metric factors (identity when static) ----
            if deform:
                s_new = [jnp.asarray(v, dtype=T.dtype)
                         for v in self.mesh_scale(t + dt_new)]
                sp_old = s_old[0]
                sp_new = s_new[0]
                for b in range(1, nd):
                    sp_old = sp_old * s_old[b]
                    sp_new = sp_new * s_new[b]
                fA = [sp_new / s_new[a] for a in range(nd)]  # face areas
                vr = sp_old / sp_new     # moving-volume ddt: (V/V')*old/dt
                inv_v = 1.0 / sp_new     # physical divergence factor
                phiu = tuple(phiu[a] * fA[a] for a in range(nd))
                phiwo = tuple(phiwo[a] * fA[a] for a in range(nd))
                gam_p = tuple(taubyrhof[a] / (s_new[a] * s_new[a])
                              for a in range(nd))
            else:
                s_new = None
                # moving-volume ddt on the general motion path: the
                # operators already live on the post-motion geometry, so
                # only the (V_old/V_new)*old/dt ratio enters
                vr = vol_ratio if general else 1.0
                inv_v = 1.0
                gam_p = taubyrhof

            # ---- QHDpEqn.H ----------------------------------------------
            # qhdFlux p BC: dp/dn = -phiwStar*rho_f/(tau_f*|Sf|); here
            # phiwStar = phiwo (velocity regularizer flux without grad p)
            flux_grads = {}
            for a in range(nd):
                for side in (0, 1):
                    if isinstance(bc_p0[a, side], bcm.QHDFluxP):
                        idx = 0 if side == 0 else -1
                        wn = jnp.take(wo[a][a], jnp.asarray([idx]), axis=a)
                        rf = jnp.take(rhof[a], jnp.asarray([idx]), axis=a)
                        tf = jnp.take(tau_f[a], jnp.asarray([idx]), axis=a)
                        sign = -1.0 if side == 0 else 1.0
                        # outward-normal gradient; wn/tau = phiwStar/(tau|Sf|)
                        flux_grads[(a, side)] = -sign * wn * rf / tf
            bc_p = bcm.resolve_inlet_outlet(_sub_flux_bc(bc_p0, flux_grads), U, nd)

            rhs_p = (fvsc.div_flux(phiu, mesh)
                     - fvsc.div_flux(phiwo, mesh)) * inv_v
            res = linsolve.solve_helmholtz(
                diag_coeff=0.0, gamma_faces=gam_p, rhs=-rhs_p, x0=p,
                bcs=bc_p, mesh=mesh, t=t, tol=self.cg_tol,
                maxiter=self.cg_maxiter, singular=singular,
                fluid_mask=fluid_mask,
            )
            p_new = res.x
            if singular:
                # reference-cell fix (QHDFoam_8C:123-131), cell (0,...,0) —
                # or the first FLUID cell on solid-masked meshes; under spmd
                # decomposition the GLOBAL corner shard owns it
                p_ref = common.spmd.first_shard_value(p_new[ref_cell])
                p_new = p_new + (self.p_ref_value - p_ref)
            if wall is not None:
                # the solve leaves solid cells at 0; every consumer of
                # p_new below (gradPf, grad_p_cell, snp) must see the wall
                # mirror instead (body-fitted zg ghost parity)
                p_new = wall.mirror(p_new)

            # phi = phiu - phiwo + pEqn.flux()  (QHDpEqn_8H:47); under
            # deformation the laplacian face flux is sp_new*gam_p*A_log*snp
            # — exactly the flux the CG drove to balance, so div_phys(phi)
            # still vanishes to solver tolerance
            snp = fvsc.sn_grad(p_new, bc_p, mesh, t=t)
            if deform:
                tb_flux = tuple(taubyrhof[a] * fA[a] / s_new[a]
                                for a in range(nd))
            else:
                tb_flux = taubyrhof
            phi = tuple(
                phiu[a] - phiwo[a] - tb_flux[a] * area[a] * snp[a]
                for a in range(nd)
            )
            if fmasks is not None:
                # the LAPLACIAN part of the pEqn flux is masked exactly
                # like the masked operator that produced p_new: kill the
                # snp term at immersed faces (snp is 0 there up to the
                # mirror's fp noise); phiu/phiwo keep their wall values
                phi = tuple(
                    phiu[a] - phiwo[a]
                    - tb_flux[a] * area[a] * snp[a] * fmasks[a]
                    for a in range(nd))
            if general:
                # fvc::makeRelative(phi, U) with the Thomas-Lombard sweeps
                phi = tuple(phi[a] - mesh_sweep[a] for a in range(nd))
            elif self.mesh_velocity is not None or deform:
                # fvc::makeRelative(phi, U): subtract the mesh face flux
                # (QHDDyMFoam_8C:109-135).  Dilation: u_m = sdot*xi + odot
                # with Thomas-Lombard mixed areas (axis a uses new scales
                # for b<a, old for b>a) so that sum_f u_m·A*dt == V'-V per
                # cell EXACTLY — the discrete geometric conservation law.
                um = (jnp.asarray(self.mesh_velocity(t))
                      if self.mesh_velocity is not None
                      else jnp.zeros((nd,), dtype=T.dtype))
                phim = []
                for a in range(nd):
                    if deform:
                        sdot = (s_new[a] - s_old[a]) / dt_new
                        xi = jnp.asarray(mesh.x_faces[a], dtype=T.dtype)
                        xi = xi.reshape(tuple(
                            -1 if b == a else 1 for b in range(nd)))
                        a_mesh = area[a]
                        for b in range(nd):
                            if b < a:
                                a_mesh = a_mesh * s_new[b]
                            elif b > a:
                                a_mesh = a_mesh * s_old[b]
                        phim.append((sdot * xi + um[a]) * a_mesh)
                    else:
                        phim.append(um[a] * area[a])
                phi = tuple(phi[a] - phim[a] for a in range(nd))

            # ---- QHDUEqn.H ----------------------------------------------
            gradPf = fvsc.grad(p_new, bc_p, mesh, scheme=sch_p, t=t)
            if deform:
                gradPf = tuple(
                    jnp.stack([gradPf[a][i] / s_new[i] for i in range(nd)])
                    for a in range(nd))
            Wf = tuple(
                tau_f[a] * (u_dot_gradU[a] + gradPf[a] / rhof[a] - BdFrcf[a])
                for a in range(nd)
            )
            # phiUf = qgdFlux(phi,U,Uf) - Sf&(Uf*Wf) = phi*Uf - phiu*Wf
            phiUf = tuple(phi[a] * Uf[a] - phiu[a] * Wf[a] for a in range(nd))
            nuf = tuple(muf[a] / rhof[a] for a in range(nd))

            # explicit transpose-stress: div(nu_f * Sf & interp(T(gradU))).
            # (Sf & T(gradU))_j = |Sf| * dU_a/dx_j at an a-face; with the
            # G[i, j] = dU_j/dx_i cell-tensor convention that is column a of
            # the UN-transposed tensor: G[:, a][j] = dU_a/dx_j.
            gradU_cell = fvsc.grad_cell_vector(U, bc_Us, mesh, t=t)  # (i,j,cells)
            if wall is not None:
                # zg-parity at immersed faces: solid cells take the
                # adjacent fluid cell's gradient, so the face interp
                # reproduces the body-fitted zeroGradient boundary value
                gradU_cell = jnp.stack([
                    jnp.stack([wall.mirror(gradU_cell[i, j])
                               for j in range(nd)])
                    for i in range(nd)])
            gradU_f = fvsc.interpolate(
                gradU_cell.reshape((nd * nd,) + mesh.shape), bc_zg, mesh,
                vector=False
            )
            transp_flux = tuple(
                nuf[a] * area[a]
                * gradU_f[a].reshape((nd, nd) + mesh.face_shape(a))[:, a]
                for a in range(nd)
            )
            if deform:
                # flux component j carries d/dx_j -> 1/s_j; A_phys = A*fA
                transp_flux = tuple(
                    jnp.stack([transp_flux[a][i] * (fA[a] / s_new[i])
                               for i in range(nd)])
                    for a in range(nd))
                nuf_lap = tuple(nuf[a] / (s_new[a] * s_new[a])
                                for a in range(nd))
            else:
                nuf_lap = nuf

            grad_p_cell = fvsc.grad_cell(p_new, bc_p, mesh, t=t)
            if deform:
                grad_p_cell = jnp.stack(
                    [grad_p_cell[i] / s_new[i] for i in range(nd)])
            rhs_U = (
                U * vr / dt_new
                - fvsc.div_flux(phiUf, mesh) * inv_v
                + fvsc.div_flux(transp_flux, mesh) * inv_v
                - grad_p_cell / rho[None]
                + BdFrc
            )
            if mesh.axisymmetric:
                # cylindrical vector laplacian: the r-weighted face metrics
                # supply (1/r)d(r d()/dr); the remaining hoop term of
                # (lap U)_r is -u_r/r^2 (wedge-mesh counterpart)
                r_c = mesh.cell_coords(1)
                rhs_U = rhs_U.at[1].add(-(mu / rho) * U[1] / (r_c * r_c))
            if self.implicit_diffusion:
                resU = linsolve.solve_helmholtz(
                    diag_coeff=1.0 / dt_new, gamma_faces=nuf_lap, rhs=rhs_U,
                    x0=U, bcs=bc_Us, mesh=mesh, t=t, vector=True,
                    tol=self.cg_tol, maxiter=self.cg_maxiter,
                    fluid_mask=fluid_mask, solid_wall_dirichlet=True,
                )
                U_new = resU.x
            else:
                # explicit diffusion on immersed walls: the mirror-filled
                # U already encodes the no-slip ghost, so the unmasked
                # laplacian reproduces the body-fitted wall flux
                lapU = fvsc.laplacian_explicit(nuf_lap, U, bc_Us, mesh, t=t,
                                               vector=True)
                U_new = dt_new * (rhs_U + lapU)

            phiTf = tuple(phi[a] * Tf[a] for a in range(nd))
            if self.t_equation == "mules":
                # ---- MULESTEqn.H (mulesQHDFoam_8C:128-134): bounded
                # explicit advection with global gMax/gMin bounds, then
                # implicit diffusion correction (MULESTEqn_8H:41-64)
                t_max = common.spmd.all_max(jnp.max(T))
                t_min = common.spmd.all_min(jnp.min(T))
                T_adv, _ = mules.explicit_solve(
                    T, phi, phiTf, dt_new, mesh, t_max, t_min,
                    n_iter=self.mules_n_iter,
                )
                if self.implicit_diffusion:
                    resT = linsolve.solve_helmholtz(
                        diag_coeff=1.0 / dt_new, gamma_faces=Hif,
                        rhs=T_adv / dt_new, x0=T_adv, bcs=bc_Ts, mesh=mesh,
                        t=t, tol=self.cg_tol, maxiter=self.cg_maxiter,
                        fluid_mask=fluid_mask,
                    )
                    T_new = resT.x
                else:
                    Hif_m = (tuple(Hif[a] * fmasks[a] for a in range(nd))
                             if fmasks is not None else Hif)
                    lapT = fvsc.laplacian_explicit(Hif_m, T_adv, bc_Ts,
                                                   mesh, t=t)
                    T_new = T_adv + dt_new * lapT
            else:
                # ---- QHDTEqn.H ------------------------------------------
                u_dot_gradT = tuple(
                    jnp.sum(Uf[a] * gradTf[a], axis=0) for a in range(nd)
                )
                phiTauTReg = tuple(
                    tau_f[a] * phiu[a] * u_dot_gradT[a] for a in range(nd)
                )
                Hif_lap = (tuple(Hif[a] / (s_new[a] * s_new[a])
                                 for a in range(nd)) if deform else Hif)
                rhs_T = (
                    T * vr / dt_new
                    - fvsc.div_flux(phiTf, mesh) * inv_v
                    + fvsc.div_flux(phiTauTReg, mesh) * inv_v
                )
                if self.implicit_diffusion:
                    resT = linsolve.solve_helmholtz(
                        diag_coeff=1.0 / dt_new, gamma_faces=Hif_lap,
                        rhs=rhs_T, x0=T, bcs=bc_Ts, mesh=mesh, t=t,
                        tol=self.cg_tol, maxiter=self.cg_maxiter,
                        fluid_mask=fluid_mask,
                    )
                    T_new = resT.x
                else:
                    if fmasks is not None:
                        Hif_lap = tuple(Hif_lap[a] * fmasks[a]
                                        for a in range(nd))
                    lapT = fvsc.laplacian_explicit(Hif_lap, T, bc_Ts, mesh,
                                                   t=t)
                    T_new = dt_new * (rhs_T + lapT)

            if wall is not None:
                # solid cells are not prognostic: keep their carried values
                # (the mirror fill regenerates the wall ghosts next step)
                sld = jnp.asarray(wall.solid)
                U_new = jnp.where(sld[None], s.U, U_new)
                T_new = jnp.where(sld, s.T, T_new)
                p_new = jnp.where(sld, s.p, p_new)
            return State(U=U_new, T=T_new, p=p_new, t=t + dt_new, dt=dt_new)

        return step
