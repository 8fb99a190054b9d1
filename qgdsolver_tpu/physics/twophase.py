"""Two-phase (VoF) thermo + interface machinery backing interQHDFoam.

Re-design of reference TwoPhaseQGD/ (SURVEY.md §2.2b):
  * `constTwoPhaseProperties` — per-phase constants nu1/nu2, rho1/rho2 and
    per-phase relaxation times Tau1/Tau2
    (constTwoPhaseProperties_8H_source.html:48-93);
  * `twoPhaseIcoQGDThermo` — mixture rho = (rho1-rho2)*alpha1 + rho2,
    mu = (rho1*nu1 - rho2*nu2)*alpha1 + rho2*nu2
    (twoPhaseIcoQGDThermo_8C_source.html:127-135);
  * `twoPhaseConstTau` tau-model — tau = alpha1*Tau1 + (1-alpha1)*Tau2
    (twoPhaseConstTau_8C_source.html:81-104);
  * `qInterfaceProperties` — interface normals nHatf, curvature
    K = -div(nHatf), surface tension force interp(sigma*K)*snGrad(alpha1)
    (qInterfaceProperties_8C_source.html:111-157, 216-227).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..core.mesh import Mesh
from ..core import bc as bcm
from ..ops import fvsc


@dataclasses.dataclass(frozen=True)
class TwoPhaseProperties:
    """constTwoPhaseProperties + interface constants."""

    rho1: float
    rho2: float
    nu1: float
    nu2: float
    tau1: float
    tau2: float
    sigma: float = 0.0  # surface tension coefficient
    c_alpha: float = 1.0  # interface compression (cAlpha)

    # -- mixture closures (twoPhaseIcoQGDThermo) ----------------------------
    def rho(self, alpha1):
        return (self.rho1 - self.rho2) * alpha1 + self.rho2

    def mu(self, alpha1):
        return (self.rho1 * self.nu1 - self.rho2 * self.nu2) * alpha1 \
            + self.rho2 * self.nu2

    def tau(self, alpha1):
        """twoPhaseConstTau blend (twoPhaseConstTau_8C:92)."""
        return alpha1 * self.tau1 + (1.0 - alpha1) * self.tau2


@dataclasses.dataclass(frozen=True)
class Interface:
    """Per-step interface quantities (pytree)."""

    n_hat_f: tuple  # per-axis face normal flux nHatf = nHat & Sf
    K: object  # cell curvature
    stf: tuple  # per-axis surface tension force (face scalar)


def delta_n(mesh: Mesh) -> float:
    """Stabilisation deltaN = 1e-8/cbrt(mean V)
    (qInterfaceProperties_8C:177-180)."""
    return 1e-8 / float(np.cbrt(np.mean(np.broadcast_to(
        mesh.cell_volume, mesh.shape))))


@dataclasses.dataclass(frozen=True)
class ContactAngle:
    """Wall contact-angle spec (constant/dynamicAlphaContactAngle BCs used
    by qInterfaceProperties::correctContactAngle,
    qInterfaceProperties_8H_source.html:74-144).

    theta0 in RADIANS.  Dynamic variant (uTheta > 0):
    theta = theta0 + (thetaA - thetaR) * tanh(u_wall / uTheta)."""

    theta0: float
    uTheta: float = 0.0
    thetaA: float = 0.0
    thetaR: float = 0.0

    def theta(self, u_wall=0.0):
        if self.uTheta <= 0.0:
            return self.theta0
        return self.theta0 + (self.thetaA - self.thetaR) * jnp.tanh(
            jnp.asarray(u_wall) / self.uTheta)


def _apply_contact_angle(n_hat_f, contact_angles, mesh, u_wall):
    """correctContactAngle on a structured brick mesh: at a wall on (axis a,
    side s) the corrected UNIT interface normal satisfies nHat.nf = cos
    (theta) with nf the OUTWARD wall normal, so the wall-face normal flux is
    +/- cos(theta)*|Sf| directly (the tangential part does not enter nHatf).
    The reference rotation nHat' = a*nf + b*nHat (with a, b solved so that
    |nHat'| = 1) lands exactly on nHat'.nf = cos(theta) — see
    interfaceProperties::correctContactAngle: a + b*a12 = b1 = cos(theta) —
    so the wall-face flux needs no knowledge of the tangential part."""
    nd = mesh.ndim
    out = list(n_hat_f)
    for (a, side), ca in contact_angles.items():
        th = ca.theta(u_wall.get((a, side), 0.0)
                      if isinstance(u_wall, dict) else u_wall)
        cosv = jnp.cos(th)
        f = out[a]
        ax = f.ndim - nd + a
        n = f.shape[ax]
        idx = 0 if side == 0 else n - 1
        layer = jax.lax.index_in_dim(f, idx, axis=ax, keepdims=True)
        # outward normal at the lo side is -e_a: nHat.(+e_a) = -cos(theta)
        orient = -1.0 if side == 0 else 1.0
        new_layer = (orient * cosv * mesh.face_area(a)
                     * jnp.ones_like(layer))
        iota = jax.lax.broadcasted_iota(jnp.int32, f.shape, ax)
        out[a] = jnp.where(iota == idx, new_layer, f)
    return tuple(out)


def interface_properties(alpha1, bc_alpha, mesh: Mesh, sigma: float,
                         t=0.0, contact_angles=None,
                         u_wall=0.0) -> Interface:
    """nHatf, curvature and surface-tension force
    (qInterfaceProperties_8C:111-157, 223-227).  `contact_angles` maps
    (axis, side) -> ContactAngle for wall patches; `u_wall` is the wall
    slip speed (scalar, or {(axis, side): value}) for the dynamic variant.

    Wedge-axis note (VERDICT r4 next #9): the curvature's hoop part
    n_r/r is NOT 0/0-amplified here — the r-weighted conservative
    divergence with zero-area axis faces carries it as
    [r*n_r]_faces / (r_c*dr), which limits cleanly to 2*dn_r/dr on the
    first ring.  Measured (tests/test_axisymmetric.py axis-centered
    drop): curvature error is FLAT across the first eight axis rings and
    an axis-crossing spherical interface holds static equilibrium with
    ~2e-6 m/s spurious currents — no axis-special treatment is needed
    (an experimental even-extension of kappa across the axis changed
    nothing at the interface and was dropped)."""
    nd = mesh.ndim
    dN = delta_n(mesh)
    grad_a = fvsc.grad_cell(alpha1, bc_alpha, mesh, t=t)  # (d, cells)
    bc_zg = bcm.FieldBCs.uniform(bcm.ZeroGradient(), nd)
    grad_af = fvsc.interpolate(grad_a, bc_zg, mesh, vector=False)
    n_hat_f = []
    for a in range(nd):
        g = grad_af[a]
        mag = jnp.sqrt(jnp.sum(g * g, axis=0)) + dN
        n_hat_f.append(g[a] / mag * mesh.face_area(a))  # nHat & Sf
    if contact_angles:
        n_hat_f = list(_apply_contact_angle(tuple(n_hat_f), contact_angles,
                                            mesh, u_wall))
    K = -fvsc.div_flux(tuple(n_hat_f), mesh)
    sigK_f = fvsc.interpolate(sigma * K, bc_zg, mesh)
    sn_a = fvsc.sn_grad(alpha1, bc_alpha, mesh, t=t)
    stf = tuple(sigK_f[a] * sn_a[a] for a in range(nd))
    return Interface(n_hat_f=tuple(n_hat_f), K=K, stf=stf)


def reconstruct(face_flux, mesh: Mesh):
    """fvc::reconstruct of a face-normal flux field (X & Sf) into a cell
    vector: comp a = (flux_lo + flux_hi)/(area_lo + area_hi) — on constant
    per-axis areas that is the brick formula (lo+hi)/(2|S_a|); on
    r-weighted (axisymmetric) metrics the per-face areas differ."""
    nd = mesh.ndim
    comps = []
    for a, f in enumerate(face_flux):
        ax = f.ndim - nd + a
        n = f.shape[ax]
        area = jnp.broadcast_to(mesh.face_area(a), f.shape[f.ndim - nd:])
        lo = jnp.take(f, jnp.arange(0, n - 1), axis=ax)
        hi = jnp.take(f, jnp.arange(1, n), axis=ax)
        a_lo = jnp.take(area, jnp.arange(0, n - 1), axis=ax - (f.ndim - nd))
        a_hi = jnp.take(area, jnp.arange(1, n), axis=ax - (f.ndim - nd))
        comps.append((lo + hi) / (a_lo + a_hi))
    return jnp.stack(comps, axis=0)
