"""Map OpenFOAM case dictionaries onto the TPU framework's config tree.

Mirrors the reference's startup reads (SURVEY.md §2.5):
  * system/controlDict: adjustTimeStep, maxCo, maxDeltaT, cTau, deltaT
    (setDeltaT-QGDQHD_8H:41-48);
  * system/fvSchemes `fvsc` sub-dict: per-term stencil scheme with `default`
    fallback (fvsc_8C:50-58) — leastSquares/GaussVolPoint map to the
    structured-mesh "full" vertex stencil, `reduced` to face-normal-only;
  * constant/thermophysicalProperties `QGD` sub-dict: QGDCoeffs model word +
    its coefficients + implicitDiffusion (QGDThermo_8C:54-79).
"""
from __future__ import annotations

import os

from . import foamdict
from ..core.registry import create
from ..solvers.common import TimeControls

# reference scheme words -> structured-mesh stencils (SURVEY.md §7.1: both
# full reference schemes coincide with the tensor-product vertex stencil on
# rectilinear bricks)
_SCHEME_MAP = {
    "leastSquares": "full",
    "leastSquaresOpt": "full",
    "GaussVolPoint": "full",
    "reduced": "reduced",
}

# QGDCoeffs dict keys -> our tau-model constructor kwargs
_TAU_KEYS = {
    "aQGD": "alpha",
    "ScQGD": "Sc",
    "PrQGD": "Pr",
    "Tau": "tau0",
    "UQGD": "U0",
    "rC": "rC",
    "minSc": "minSc",
    "maxSc": "maxSc",
    "cqSc": "cqSc",
    "cSc1": "cSc1",
    "smoothCoeff": "smoothCoeff",
    "T0": "T0",
    "Gr": "Gr",
}


def time_controls(control_dict: dict) -> TimeControls:
    """controlDict -> TimeControls (reference setDeltaT-QGDQHD.H reads)."""
    d = control_dict
    return TimeControls(
        adjust_time_step=bool(d.get("adjustTimeStep", False)),
        max_co=float(d.get("maxCo", 0.5)),
        max_dt=float(d.get("maxDeltaT", 1.0)),
        c_tau=float(d.get("cTau", 0.75)),
        dt0=float(d.get("deltaT", 1e-6)),
    )


def fvsc_scheme(fv_schemes: dict, term: str = "default") -> str:
    """fvSchemes.fvsc lookup with `default` fallback (fvsc_8C:50-58)."""
    sub = fv_schemes.get("fvsc", {})
    word = sub.get(term, sub.get("default", "GaussVolPoint"))
    if isinstance(word, list):
        word = word[0]
    return _SCHEME_MAP.get(str(word), "full")


def tau_model(thermo_props: dict):
    """thermophysicalProperties.QGD -> tau model instance
    (QGDCoeffs::New word dispatch, QGDCoeffs_8C:58-117)."""
    qgd = thermo_props.get("QGD", {})
    name = qgd.get("QGDCoeffs", "constScPrModel1")
    if isinstance(name, list):
        name = name[0]
    kwargs = {}
    for k, v in qgd.items():
        if k in _TAU_KEYS:
            kwargs[_TAU_KEYS[k]] = float(v) if not isinstance(v, list) else float(v[-1])
    return create("tau", str(name), **kwargs)


def implicit_diffusion(thermo_props: dict) -> bool:
    """QGD.implicitDiffusion, default true (QGDThermo_8C:70-79)."""
    qgd = thermo_props.get("QGD", {})
    return bool(qgd.get("implicitDiffusion", True))


def load_case(case_dir: str) -> dict:
    """Read the standard case files that exist under `case_dir` and return
    {controlDict, fvSchemes, thermophysicalProperties, transportProperties,
    time_controls, fvsc, tau_model, implicit_diffusion}."""
    out = {}
    paths = {
        "controlDict": "system/controlDict",
        "fvSchemes": "system/fvSchemes",
        "thermophysicalProperties": "constant/thermophysicalProperties",
        "transportProperties": "constant/transportProperties",
        "gravitationalProperties": "constant/gravitationalProperties",
    }
    for key, rel in paths.items():
        p = os.path.join(case_dir, rel)
        if os.path.exists(p):
            out[key] = foamdict.parse_file(p)
    if "controlDict" in out:
        out["time_controls"] = time_controls(out["controlDict"])
    if "fvSchemes" in out:
        out["fvsc"] = fvsc_scheme(out["fvSchemes"])
    if "thermophysicalProperties" in out:
        out["tau_model"] = tau_model(out["thermophysicalProperties"])
        out["implicit_diffusion"] = implicit_diffusion(
            out["thermophysicalProperties"])
    return out
