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


def fvsc_schemes(fv_schemes: dict):
    """Whole fvSchemes.fvsc sub-dict -> per-term {term: scheme} mapping with
    a `default` entry — the reference dispatches one stencil per operator
    name (fvsc_8C:47-85); solvers consume this via ops.fvsc.scheme_for."""
    sub = fv_schemes.get("fvsc", {})
    out = {}
    for term, word in sub.items():
        if isinstance(word, list):
            word = word[0]
        out[term] = _SCHEME_MAP.get(str(word), "full")
    out.setdefault("default", "full")
    return out


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


_RR = 8314.462618  # universal gas constant [J/(kmol K)], OpenFOAM's RR


def build_foam_thermo(thermo_props: dict):
    """constant/thermophysicalProperties thermoType + mixture dicts -> a
    thermo instance (the makeThermo-table dispatch, reference
    psiQGDThermos_8C/rhoQGDThermos_8C instantiations)."""
    from ..physics import thermo as tm

    tt = thermo_props.get("thermoType", {})
    word = str(tt.get("type", "hePsiQGDThermo"))
    caloric = str(tt.get("thermo", "hConst"))
    transport_word = str(tt.get("transport", "const"))
    eos_word = str(tt.get("equationOfState", "perfectGas"))
    mix = thermo_props.get("mixture", {})
    spec = mix.get("specie", {})
    thermodyn = mix.get("thermodynamics", {})
    transp = mix.get("transport", {})
    eosd = mix.get("equationOfState", {})

    W = float(spec.get("molWeight", 28.96))
    R = _RR / W
    Pr = float(transp.get("Pr", 1.0))

    if transport_word == "sutherland":
        transport = tm.SutherlandTransport(As=float(transp.get("As", 1.458e-6)),
                                           Ts=float(transp.get("Ts", 110.4)))
    elif transport_word == "polynomial" or transport_word == "powerLaw":
        transport = tm.PowerLawTransport(mu0=float(transp.get("mu0", 1.8e-5)),
                                         T0=float(transp.get("T0", 273.0)),
                                         k=float(transp.get("k", 0.7)))
    else:
        transport = tm.ConstTransport(mu0=float(transp.get("mu", 0.0)))

    if caloric == "janaf":
        lo = [float(x) for x in thermodyn.get("lowCpCoeffs", [])]
        hi = [float(x) for x in thermodyn.get("highCpCoeffs", [])]
        j = tm.JanafThermo(R=R, low=tuple(lo), high=tuple(hi),
                           Tcommon=float(thermodyn.get("Tcommon", 1000.0)))
        return tm.JanafPerfectGasThermo(janaf=j, transport=transport, Pr=Pr)

    Cp = float(thermodyn.get("Cp", 1004.5))
    if word.startswith("heRho") or word.startswith("rho"):
        if eos_word == "rhoConst":
            rho0 = float(eosd.get("rho", eosd.get("rho0", 1000.0)))
            mu0 = float(transp.get("mu", 1e-3))
            beta = float(thermo_props.get("beta",
                                          transp.get("beta", 0.0)) or 0.0)
            return tm.RhoConstThermo(rho0=rho0, Cp=Cp, mu0=mu0, Pr=Pr,
                                     beta=beta)
        eos = tm.PerfectGasEoS(R=R)
        return tm.RhoThermo(eos=eos, Cp=Cp, R=R, transport=transport, Pr=Pr)
    return tm.PerfectGasThermo(R=R, Cp=Cp, transport=transport, Pr=Pr)


def build_case(case_dir: str):
    """Full end-to-end case ingestion: blockMeshDict + system/constant dicts
    + `0/` field files -> (solver, initial state).

    The startup equivalent of a reference solver's main() preamble:
    createMesh + createFields (MUST_READ field dictionaries, e.g.
    QGDFoam_2createFields_8H orig. lines 3-35) + thermo/New RTS dispatch.
    Dispatches on controlDict `application`.
    """
    import jax.numpy as jnp
    from .foam_fields import load_block_mesh, load_initial_fields

    cfg = load_case(case_dir)
    control = cfg.get("controlDict", {})
    app = str(control.get("application", "QGDFoam"))
    mesh, patch_map, kept_axes = load_block_mesh(case_dir)
    fields = load_initial_fields(case_dir, mesh, patch_map, kept_axes)

    tc = cfg.get("time_controls", TimeControls())
    fvsc = fvsc_schemes(cfg.get("fvSchemes", {}))
    tau = cfg.get("tau_model", None)
    impl = cfg.get("implicit_diffusion", False)
    thermo = (build_foam_thermo(cfg["thermophysicalProperties"])
              if "thermophysicalProperties" in cfg else None)

    def fld(name):
        if name not in fields:
            raise ValueError(f"case {case_dir} is missing 0/{name}")
        arr, bcs = fields[name]
        return jnp.asarray(arr), bcs

    if app in ("QGDFoam", "rhoQGDFoam", "zQGDFoam"):
        from ..solvers.qgd import QGDFoam
        from ..solvers.zqgd import ZQGDFoam

        U0, bc_U = fld("U")
        p0, bc_p = fld("p")
        T0, bc_T = fld("T")
        cls = ZQGDFoam if app == "zQGDFoam" else QGDFoam
        kw = dict(mesh=mesh, thermo=thermo, bc_U=bc_U, bc_p=bc_p, bc_T=bc_T,
                  time=tc, implicit_diffusion=impl, fvsc_scheme=fvsc)
        if tau is not None:
            kw["tau_model"] = tau
        solver = cls(**kw)
        return solver, solver.init(p0=p0, T0=T0, U0=U0)

    if app in ("QHDFoam", "SRFQHDFoam", "mulesQHDFoam", "QHDDyMFoam"):
        from ..solvers.qhd import QHDFoam

        U0, bc_U = fld("U")
        T0, bc_T = fld("T")
        p0, bc_p = (fields["p"][0], fields["p"][1]) if "p" in fields else (None, None)
        g = _read_gravity(case_dir, kept_axes)
        kw = dict(mesh=mesh, thermo=thermo, bc_U=bc_U, bc_T=bc_T,
                  time=tc, implicit_diffusion=True, fvsc_scheme=fvsc)
        if bc_p is not None:
            kw["bc_p"] = bc_p
        if tau is not None:
            kw["tau_model"] = tau
        if g is not None:
            kw["g"] = g
        if app == "mulesQHDFoam":
            kw["t_equation"] = "mules"
        if app == "SRFQHDFoam":
            omega = _read_srf_omega(case_dir)
            if omega is not None:
                kw["omega"] = omega
        solver = QHDFoam(**kw)
        p_init = jnp.asarray(p0) if p0 is not None else None
        return solver, solver.init(U0=U0, T0=T0, p0=p_init)

    if app == "scalarTransportQHDFoam":
        from ..solvers.scalar_transport import ScalarTransportQHD

        U0, bc_U = fld("U")
        T0, bc_T = fld("T")
        kw = dict(mesh=mesh, bc_T=bc_T, time=tc)
        if tau is not None:
            kw["tau_model"] = tau
        solver = ScalarTransportQHD(**kw)
        return solver, solver.init(T0=T0, U0=U0)

    raise ValueError(f"unsupported application {app!r}")


def _read_gravity(case_dir: str, kept_axes):
    p = os.path.join(case_dir, "constant", "g")
    if not os.path.exists(p):
        return None
    d = foamdict.parse_file(p)
    v = d.get("value", [0.0, 0.0, 0.0])
    return tuple(float(v[ax]) for ax in kept_axes)


def _read_srf_omega(case_dir: str):
    p = os.path.join(case_dir, "constant", "SRFProperties")
    if not os.path.exists(p):
        return None
    d = foamdict.parse_file(p)
    sub = d.get("rpmCoeffs", {})
    if "rpm" in sub:
        w = float(sub["rpm"]) * 2.0 * 3.141592653589793 / 60.0
        axis = d.get("axis", [0.0, 0.0, 1.0])
        return tuple(w * float(a) for a in axis)
    if "omega" in d:
        v = d["omega"]
        if isinstance(v, list):
            return tuple(float(x) for x in v)
        return (0.0, 0.0, float(v))
    return None


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
