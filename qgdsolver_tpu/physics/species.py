"""Multicomponent mixture thermodynamics (psiQGDReactionThermo equivalent).

The reference's reacting thermo (psiQGDReactionThermo_8H, instantiated over
janaf/hConst x const/sutherland mixtures, psiQGDReactionThermos_8C_source.
html:66-...) exposes a species table with per-specie Hs/Es
(addEnergyFluxes_8H_source.html:51-52) and mixture psi/cp/gamma.

Here a `Specie` couples a gas constant with either a constant-cp or JANAF
caloric polynomial; `MixtureThermo` mass-fraction-weights them and inverts
e(T, Y) with a short fixed-iteration Newton (the THE equivalent).  All
methods are elementwise jnp — species axis is a leading axis of Y.
"""
from __future__ import annotations

import dataclasses
import typing as tp

import jax.numpy as jnp

from .thermo import Transport, ConstTransport, JanafThermo

R_UNIVERSAL = 8314.46261815324  # J/(kmol K)


@dataclasses.dataclass(frozen=True)
class Specie:
    """One chemical specie: molar mass W [kg/kmol] + caloric model.

    Constant-cp mode: give Cp and hf (formation enthalpy, J/kg).
    JANAF mode: give `janaf` (then Cp/hf are ignored).
    """

    name: str
    W: float
    Cp: float = 1000.0
    hf: float = 0.0
    janaf: tp.Optional[JanafThermo] = None
    Sc: float = 1.0  # per-specie Schmidt number (readScNumbers equivalent)

    @property
    def R(self) -> float:
        return R_UNIVERSAL / self.W

    # sensible enthalpy/energy + absolute (with formation) quantities
    def cp(self, T):
        if self.janaf is not None:
            return self.janaf.cp(T)
        return jnp.full_like(T, self.Cp)

    def cv(self, T):
        return self.cp(T) - self.R

    def hs(self, T, Tref=298.15):
        """Sensible enthalpy (reference composition().Hs)."""
        if self.janaf is not None:
            return self.janaf.h_abs(T) - self.janaf.h_abs(
                jnp.full_like(T, Tref)
            )
        return self.Cp * (T - Tref)

    def es(self, T, Tref=298.15):
        """Sensible internal energy Es = Hs - R(T - Tref) ~ Hs - p/rho + ..."""
        return self.hs(T, Tref) - self.R * (T - Tref)

    def ha(self, T, Tref=298.15):
        """Absolute enthalpy (sensible + formation)."""
        return self.hs(T, Tref) + self.hf


@dataclasses.dataclass(frozen=True)
class MixtureThermo:
    """Mass-fraction-weighted mixture with sensibleInternalEnergy caloric
    variable: e_s = sum_i Y_i Es_i(T)."""

    species: tp.Tuple[Specie, ...]
    inert_index: int = -1  # defaults to last specie
    transport: Transport = ConstTransport(1.8e-5)
    Pr: float = 0.7
    Tref: float = 298.15

    @property
    def n_species(self) -> int:
        return len(self.species)

    @property
    def inert(self) -> int:
        return self.inert_index % len(self.species)

    def R(self, Y):
        return sum(Y[i] * sp.R for i, sp in enumerate(self.species))

    def cp(self, Y, T):
        return sum(Y[i] * sp.cp(T) for i, sp in enumerate(self.species))

    def cv(self, Y, T):
        return self.cp(Y, T) - self.R(Y)

    def e_from_T(self, Y, T):
        return sum(Y[i] * sp.es(T, self.Tref) for i, sp in enumerate(self.species))

    def T_from_e(self, Y, e, T0, iters: int = 8):
        """Newton inversion of e(T) (OpenFOAM THE equivalent)."""
        T = T0
        for _ in range(iters):
            T = T - (self.e_from_T(Y, T) - e) / jnp.maximum(self.cv(Y, T), 1e-3)
            T = jnp.clip(T, 10.0, 20000.0)
        return T

    def psi(self, Y, T):
        return 1.0 / (self.R(Y) * T)

    def rho_from_p_T(self, Y, p, T):
        return p * self.psi(Y, T)

    def p_from_rho_T(self, Y, rho, T):
        return rho * self.R(Y) * T

    def gamma(self, Y, T):
        cp = self.cp(Y, T)
        return cp / (cp - self.R(Y))

    def c_from_pT(self, Y, p, T):
        """c = sqrt(gamma/psi) (hePsiQGDThermo_8C:123-124)."""
        return jnp.sqrt(self.gamma(Y, T) / self.psi(Y, T))

    def mu(self, p, T):
        return self.transport.mu(p, T)

    def alphah(self, p, T):
        return self.transport.mu(p, T) / self.Pr

    def hs_i(self, i, T):
        return self.species[i].hs(T, self.Tref)

    def es_i(self, i, T):
        return self.species[i].es(T, self.Tref)

    def sc_numbers(self):
        return tuple(sp.Sc for sp in self.species)
