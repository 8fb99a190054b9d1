"""Typed case-configuration tree — the dictionary/RTS system equivalent.

The reference is driven by OpenFOAM dictionaries + run-time-selection tables
(SURVEY.md §2.5): `fvSchemes.fvsc` picks the stencil scheme
(fvsc_8C_source.html:50-58), `thermophysicalProperties.QGD.QGDCoeffs` picks
the tau model (QGDThermo_8C_source.html:54-60), `makeThermo` tables pick the
thermo combination, field files pick BC types, `controlDict` supplies time
controls (setDeltaT-QGDQHD_8H:41-48).

Here a case is a plain JSON-able dict with the same four selection points,
resolved through `core.registry` into the frozen solver dataclass (which IS
the typed config).  `build_solver(cfg)` is the `main()`-startup equivalent.
"""
from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from . import bc as bcm
from .mesh import Mesh
from .registry import register, create, available
from ..solvers.common import TimeControls

# ---------------------------------------------------------------------------
# BC registry (field-file "type" words)
# ---------------------------------------------------------------------------

register("bc", "fixedValue")(lambda value=0.0, **_: bcm.FixedValue(jnp.asarray(value)))
register("bc", "zeroGradient")(lambda **_: bcm.ZeroGradient())
register("bc", "fixedGradient")(lambda gradient=0.0, **_: bcm.FixedGradient(jnp.asarray(gradient)))
register("bc", "symmetry")(lambda **_: bcm.Symmetry())
register("bc", "slip")(lambda **_: bcm.Symmetry())
register("bc", "cyclic")(lambda **_: bcm.Periodic())
register("bc", "periodic")(lambda **_: bcm.Periodic())
register("bc", "inletOutlet")(
    lambda inletValue=0.0, **_: bcm.InletOutlet(jnp.asarray(inletValue)))
register("bc", "extrapolated")(lambda **_: bcm.Extrapolated())
register("bc", "noSlip")(lambda ndim=3, **_: bcm.noslip(ndim))
register("bc", "qgdFlux")(lambda **_: bcm.QGDFluxP())
register("bc", "waveTransmissive")(
    lambda fieldInf=0.0, lInf=0.0, **_: bcm.WaveTransmissive(
        field_inf=float(fieldInf), l_inf=float(lInf)))
register("bc", "qhdFlux")(lambda **_: bcm.QHDFluxP())
register("bc", "mQhdFlux")(lambda **_: bcm.QHDFluxP())
register("bc", "cosVelocity")(
    lambda amplitude, omega0, phi0, height, ndim, **kw: bcm.cos_velocity(
        amplitude, omega0, phi0, height, ndim, **kw
    )
)


def build_mesh(cfg: dict) -> Mesh:
    if "x_faces" in cfg:
        return Mesh(x_faces=tuple(np.asarray(f) for f in cfg["x_faces"]),
                    dtype=np.dtype(cfg.get("dtype", "float32")))
    return Mesh.uniform(
        tuple(cfg["shape"]), lengths=tuple(cfg.get("lengths") or []) or None,
        origin=tuple(cfg.get("origin") or []) or None,
        dtype=np.dtype(cfg.get("dtype", "float32")),
    )


def build_bcs(cfg: dict, ndim: int):
    """boundary sub-dict {axis_side: {"type": word, ...params}} per field;
    sides named x_lo/x_hi/y_lo/y_hi/z_lo/z_hi (axis order x,y,z)."""
    names = ["x", "y", "z"][:ndim]
    rows = []
    for a, nm in enumerate(names):
        row = []
        for side, suffix in ((0, "_lo"), (1, "_hi")):
            entry = cfg.get(nm + suffix, {"type": "zeroGradient"})
            kw = {k: v for k, v in entry.items() if k != "type"}
            kw.setdefault("ndim", ndim)
            row.append(create("bc", entry["type"], **kw))
        rows.append(tuple(row))
    return bcm.FieldBCs(tuple(rows))


def build_thermo(cfg: dict):
    kw = {k: v for k, v in cfg.items()
          if k not in ("type", "transport", "eos", "janaf")}
    if "janaf" in cfg:
        from ..physics.thermo import JanafThermo

        kw["janaf"] = JanafThermo(
            R=cfg["janaf"]["R"],
            low=tuple(cfg["janaf"]["low"]),
            high=tuple(cfg["janaf"]["high"]),
            Tcommon=cfg["janaf"].get("Tcommon", 1000.0),
        )
    if "transport" in cfg:
        tcfg = cfg["transport"]
        kw["transport"] = create(
            "transport", tcfg["type"],
            **{k: v for k, v in tcfg.items() if k != "type"},
        )
    if "eos" in cfg:
        ecfg = cfg["eos"]
        kw["eos"] = create(
            "eos", ecfg["type"], **{k: v for k, v in ecfg.items() if k != "type"}
        )
    return create("thermo", cfg["type"], **kw)


def build_tau_model(cfg: dict):
    return create("tau", cfg["type"],
                  **{k: v for k, v in cfg.items() if k != "type"})


def build_time_controls(cfg: dict) -> TimeControls:
    """controlDict equivalents (adjustTimeStep/maxCo/maxDeltaT/cTau)."""
    return TimeControls(
        adjust_time_step=cfg.get("adjustTimeStep", True),
        max_co=cfg.get("maxCo", 0.5),
        max_dt=cfg.get("maxDeltaT", 1.0),
        c_tau=cfg.get("cTau", 0.75),
        dt0=cfg.get("deltaT", 1e-6),
    )


def build_solver(cfg: dict):
    """Top-level case builder (the solver-main startup equivalent)."""
    # solver classes register themselves lazily to avoid import cycles
    from ..solvers.qgd import QGDFoam
    from ..solvers.zqgd import ZQGDFoam
    from ..solvers.qhd import QHDFoam
    from ..solvers.scalar_transport import ScalarTransportQHD
    from ..solvers.inter_qhd import InterQHDFoam

    solvers = {
        "QGDFoam": QGDFoam, "rhoQGDFoam": QGDFoam, "zQGDFoam": ZQGDFoam,
        "QHDFoam": QHDFoam, "SRFQHDFoam": QHDFoam, "mulesQHDFoam": QHDFoam,
        "scalarTransportQHDFoam": ScalarTransportQHD,
        "interQHDFoam": InterQHDFoam,
    }
    name = cfg["solver"]
    cls = solvers[name]
    mesh = build_mesh(cfg["mesh"])
    nd = mesh.ndim

    kw = dict(mesh=mesh)
    if "thermo" in cfg:
        kw["thermo"] = build_thermo(cfg["thermo"])
    if "tau" in cfg:
        kw["tau_model"] = build_tau_model(cfg["tau"])
    if "controlDict" in cfg:
        kw["time"] = build_time_controls(cfg["controlDict"])
    if "fvsc" in cfg and cls is not ScalarTransportQHD:
        kw["fvsc_scheme"] = cfg["fvsc"]
    bnd = cfg.get("boundary", {})
    fieldmap = {"U": "bc_U", "p": "bc_p", "T": "bc_T", "alpha1": "bc_alpha"}
    for field, attr in fieldmap.items():
        if field in bnd and hasattr(cls, "__dataclass_fields__") and \
                attr in cls.__dataclass_fields__:
            kw[attr] = build_bcs(bnd[field], nd)
    for extra in ("g", "omega", "implicit_diffusion", "p_ref_value"):
        if extra in cfg and extra in cls.__dataclass_fields__:
            kw[extra] = tuple(cfg[extra]) if isinstance(cfg[extra], list) else cfg[extra]
    if name == "mulesQHDFoam":
        kw["t_equation"] = "mules"
    return cls(**kw)


def load_case(path: str):
    """Load a JSON case file and build its solver."""
    with open(path) as f:
        return build_solver(json.load(f))
