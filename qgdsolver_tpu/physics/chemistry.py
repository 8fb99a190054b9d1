"""Chemistry & combustion models (ChemistryQGD/CombustionQGD equivalents).

The reference registers OpenFOAM's chemistry/combustion hierarchies against
psiQGDReactionThermo via pure template-instantiation shims (SURVEY.md §2.3:
BasicChemistryModelsQGD_8C:48-60, CombustionQGDModels_8C:48, one file per
combustion family laminar/EDC/PaSR/noCombustion/...).  The capability being
registered is: given (Y, rho, T, p), produce per-specie reaction sources
R(Yi) [kg/m^3/s] and a heat release Qdot [W/m^3] (QGDYEqn_8H:36-37,57).

Here the same capability is a `CombustionModel` registry of pure functions.
`Laminar` is finite-rate Arrhenius kinetics (the laminar combustion model +
StandardChemistryModel path); `EddyDissipation` is the classic mixing-limited
model (EDC family's algebraic core); `NoCombustion` returns zeros.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax.numpy as jnp

from ..core.registry import register
from .species import MixtureThermo, R_UNIVERSAL


@dataclasses.dataclass(frozen=True)
class Reaction:
    """Irreversible Arrhenius reaction: k = A T^beta exp(-Ta/T).

    lhs/rhs: {specie_index: stoichiometric coefficient}."""

    lhs: tp.Tuple[tp.Tuple[int, float], ...]
    rhs: tp.Tuple[tp.Tuple[int, float], ...]
    A: float
    beta: float = 0.0
    Ta: float = 0.0  # activation temperature Ea/Ru

    def rate(self, conc, T):
        """omega [kmol/m^3/s] from molar concentrations conc[i]."""
        k = self.A * jnp.power(T, self.beta) * jnp.exp(-self.Ta / jnp.maximum(T, 1.0))
        w = k
        for i, nu in self.lhs:
            w = w * jnp.power(jnp.maximum(conc[i], 0.0), nu)
        return w


class CombustionModel:
    """Base: correct(mix, Y, rho, T, p) -> (RR[i] tuple, Qdot)."""


@register("combustion", "none")
@register("combustion", "noCombustion")
@dataclasses.dataclass(frozen=True)
class NoCombustion(CombustionModel):
    """noCombustion family (noCombustionsQGD_8C shim)."""

    def correct(self, mix: MixtureThermo, Y, rho, T, p):
        zero = jnp.zeros_like(T)
        return tuple(zero for _ in mix.species), zero


@register("combustion", "laminar")
@dataclasses.dataclass(frozen=True)
class Laminar(CombustionModel):
    """Finite-rate Arrhenius kinetics (laminar combustion +
    StandardChemistryModel path, laminarsQGD_8C shim)."""

    reactions: tp.Tuple[Reaction, ...]

    def correct(self, mix: MixtureThermo, Y, rho, T, p):
        ns = mix.n_species
        conc = [rho * Y[i] / mix.species[i].W for i in range(ns)]  # kmol/m^3
        rr = [jnp.zeros_like(T) for _ in range(ns)]
        for rxn in self.reactions:
            w = rxn.rate(conc, T)
            for i, nu in rxn.lhs:
                rr[i] = rr[i] - nu * w * mix.species[i].W
            for i, nu in rxn.rhs:
                rr[i] = rr[i] + nu * w * mix.species[i].W
        # Qdot = -sum_i hf_i * RR_i (heat release from formation enthalpies)
        qdot = -sum(mix.species[i].hf * rr[i] for i in range(ns))
        return tuple(rr), qdot


@register("combustion", "eddyDissipation")
@dataclasses.dataclass(frozen=True)
class EddyDissipation(CombustionModel):
    """Mixing-limited single-step model (EDC/eddyDissipationDiffusion
    family's algebraic core): fuel burns at rate C_EDC*rho*min(Y_F,
    Y_O/s)/t_mix with a fixed mixing time."""

    fuel: int
    oxidizer: int
    products: tp.Tuple[tp.Tuple[int, float], ...]  # (index, mass yield)
    s: float  # stoichiometric oxidizer/fuel mass ratio
    C: float = 4.0
    t_mix: float = 1e-3
    q_fuel: float = 0.0  # heat release per kg fuel

    def correct(self, mix: MixtureThermo, Y, rho, T, p):
        ns = mix.n_species
        rate = self.C / self.t_mix * rho * jnp.minimum(
            jnp.maximum(Y[self.fuel], 0.0),
            jnp.maximum(Y[self.oxidizer], 0.0) / self.s,
        )
        rr = [jnp.zeros_like(T) for _ in range(ns)]
        rr[self.fuel] = -rate
        rr[self.oxidizer] = -self.s * rate
        for i, yield_i in self.products:
            rr[i] = rr[i] + yield_i * rate
        qdot = self.q_fuel * rate
        return tuple(rr), qdot

@register("combustion", "infinitelyFastChemistry")
@dataclasses.dataclass(frozen=True)
class InfinitelyFastChemistry(CombustionModel):
    """Mixed-is-burnt single-step model (infinitelyFastChemistrysQGD_8C
    shim): fuel consumed at rho*min(Y_F, Y_O/s)/(C*dt) — complete combustion
    of the deficient reactant within C timesteps."""

    fuel: int
    oxidizer: int
    products: tp.Tuple[tp.Tuple[int, float], ...]
    s: float
    C: float = 5.0
    q_fuel: float = 0.0

    def correct(self, mix: MixtureThermo, Y, rho, T, p, dt=None):
        ns = mix.n_species
        dt = 1e-6 if dt is None else dt
        rate = rho * jnp.minimum(
            jnp.maximum(Y[self.fuel], 0.0),
            jnp.maximum(Y[self.oxidizer], 0.0) / self.s,
        ) / (self.C * dt)
        rr = [jnp.zeros_like(T) for _ in range(ns)]
        rr[self.fuel] = -rate
        rr[self.oxidizer] = -self.s * rate
        for i, yield_i in self.products:
            rr[i] = rr[i] + yield_i * rate
        return tuple(rr), self.q_fuel * rate


@register("combustion", "PaSR")
@dataclasses.dataclass(frozen=True)
class PaSR(CombustionModel):
    """Partially-Stirred Reactor (PaSRsQGD_8C shim): finite-rate kinetics
    scaled by the reacting-fraction kappa = tau_c/(tau_c + tau_mix), with the
    chemical time estimated from the current consumption rates."""

    base: "Laminar"
    t_mix: float = 1e-4

    def correct(self, mix: MixtureThermo, Y, rho, T, p, dt=None):
        rr, qdot = self.base.correct(mix, Y, rho, T, p)
        # tau_c ~ rho * sum(max(Y,0)) / sum(|RR|) (OpenFOAM PaSR::tc analogue)
        denom = sum(jnp.abs(r) for r in rr) + 1e-30
        tau_c = rho * sum(jnp.maximum(Y[i], 0.0)
                          for i in range(mix.n_species)) / denom
        kappa = tau_c / (tau_c + self.t_mix)
        return tuple(kappa * r for r in rr), kappa * qdot


@register("combustion", "eddyDissipationDiffusion")
@dataclasses.dataclass(frozen=True)
class EddyDissipationDiffusion(CombustionModel):
    """eddyDissipationDiffusion family: mixing-limited rate with an
    additional diffusion-limited bound via the product mass fraction
    (rate ~ min(Y_F, Y_O/s, C_d*Y_P/(1+s)))."""

    fuel: int
    oxidizer: int
    products: tp.Tuple[tp.Tuple[int, float], ...]
    s: float
    C: float = 4.0
    Cd: float = 0.5
    t_mix: float = 1e-3
    q_fuel: float = 0.0

    def correct(self, mix: MixtureThermo, Y, rho, T, p, dt=None):
        ns = mix.n_species
        yp = sum(jnp.maximum(Y[i], 0.0) for i, _ in self.products)
        lim = jnp.minimum(
            jnp.minimum(jnp.maximum(Y[self.fuel], 0.0),
                        jnp.maximum(Y[self.oxidizer], 0.0) / self.s),
            self.Cd * yp / (1.0 + self.s),
        )
        rate = self.C / self.t_mix * rho * lim
        rr = [jnp.zeros_like(T) for _ in range(ns)]
        rr[self.fuel] = -rate
        rr[self.oxidizer] = -self.s * rate
        for i, yield_i in self.products:
            rr[i] = rr[i] + yield_i * rate
        return tuple(rr), self.q_fuel * rate


@register("combustion", "zoneCombustion")
@dataclasses.dataclass(frozen=True)
class ZoneCombustion(CombustionModel):
    """zoneCombustion family (zoneCombustionsQGD_8C shim): delegates to a
    base model but zeroes the sources outside a static cell mask."""

    base: CombustionModel
    mask: tp.Any  # (cells) 0/1 array

    def correct(self, mix: MixtureThermo, Y, rho, T, p, dt=None):
        rr, qdot = _call(self.base, mix, Y, rho, T, p, dt)
        m = jnp.asarray(self.mask)
        return tuple(m * r for r in rr), m * qdot


def _call(model, mix, Y, rho, T, p, dt):
    """Invoke correct() passing dt only to models that accept it."""
    try:
        return model.correct(mix, Y, rho, T, p, dt=dt)
    except TypeError:
        return model.correct(mix, Y, rho, T, p)


# ---------------------------------------------------------------------------
# chemistry solvers (makeChemistrySolversQGD_8C equivalents): integrate the
# stiff reaction sources over dt by sub-cycling, returning EFFECTIVE mean
# rates for the operator-split YEqn (noChemistrySolver / EulerImplicit / ode).
# ---------------------------------------------------------------------------


class ChemistrySolver:
    """Base: rates(model, mix, Y, rho, T, p, dt) -> (RR tuple, Qdot)."""


@register("chemistrySolver", "none")
@dataclasses.dataclass(frozen=True)
class DirectRates(ChemistrySolver):
    """noChemistrySolver: instantaneous rates, no sub-integration."""

    def rates(self, model, mix, Y, rho, T, p, dt):
        return _call(model, mix, Y, rho, T, p, dt)


@register("chemistrySolver", "EulerImplicit")
@register("chemistrySolver", "euler")
@dataclasses.dataclass(frozen=True)
class SubcycledEuler(ChemistrySolver):
    """EulerImplicit analogue: n_sub forward-Euler sub-steps of the source
    ODE dY/dt = RR/rho at frozen (rho, T, p); returns the mean rate over dt
    so the split YEqn advances Y exactly to the sub-integrated endpoint."""

    n_sub: int = 8

    def rates(self, model, mix, Y, rho, T, p, dt):
        h = dt / self.n_sub
        Yc = list(Y)
        q_acc = 0.0
        for _ in range(self.n_sub):
            rr, qdot = _call(model, mix, tuple(Yc), rho, T, p, h)
            for i in range(mix.n_species):
                Yc[i] = Yc[i] + h * rr[i] / rho
            q_acc = q_acc + qdot
        rr_eff = tuple((Yc[i] - Y[i]) * rho / dt for i in range(mix.n_species))
        return rr_eff, q_acc / self.n_sub


@register("chemistrySolver", "ode")
@dataclasses.dataclass(frozen=True)
class SubcycledRK4(ChemistrySolver):
    """ode (RK) analogue: RK4 sub-steps at frozen (rho, T, p)."""

    n_sub: int = 4

    def rates(self, model, mix, Y, rho, T, p, dt):
        ns = mix.n_species
        h = dt / self.n_sub

        def f(Yc):
            rr, qdot = _call(model, mix, tuple(Yc), rho, T, p, h)
            return [r / rho for r in rr], qdot

        Yc = list(Y)
        q_acc = 0.0
        for _ in range(self.n_sub):
            k1, q1 = f(Yc)
            k2, _ = f([Yc[i] + 0.5 * h * k1[i] for i in range(ns)])
            k3, _ = f([Yc[i] + 0.5 * h * k2[i] for i in range(ns)])
            k4, _ = f([Yc[i] + h * k3[i] for i in range(ns)])
            Yc = [Yc[i] + h / 6.0 * (k1[i] + 2 * k2[i] + 2 * k3[i] + k4[i])
                  for i in range(ns)]
            q_acc = q_acc + q1
        rr_eff = tuple((Yc[i] - Y[i]) * rho / dt for i in range(ns))
        return rr_eff, q_acc / self.n_sub
