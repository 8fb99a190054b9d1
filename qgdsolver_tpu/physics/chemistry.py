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
