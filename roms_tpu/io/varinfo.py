"""Output variable metadata registry.

The analog of the reference's ROMS/External/varinfo.yaml (620 entries) +
mod_ncparam.F field IDs: every output field carries CF-style metadata.
Only fields the framework currently produces are registered; the registry
is data, extend freely.
"""

from dataclasses import dataclass


@dataclass(frozen=True)
class VarInfo:
    name: str
    long_name: str
    units: str
    grid: str          # r2, u2, v2, r3, w3 (rho/u/v points, 2D/3D)
    time: bool = True


REGISTRY = {
    "zeta": VarInfo("zeta", "free-surface", "meter", "r2"),
    "ubar": VarInfo("ubar", "vertically integrated u-momentum component",
                    "meter second-1", "u2"),
    "vbar": VarInfo("vbar", "vertically integrated v-momentum component",
                    "meter second-1", "v2"),
    "u": VarInfo("u", "u-momentum component", "meter second-1", "r3"),
    "v": VarInfo("v", "v-momentum component", "meter second-1", "r3"),
    "temp": VarInfo("temp", "potential temperature", "Celsius", "r3"),
    "salt": VarInfo("salt", "salinity", "nondimensional", "r3"),
    "AKv": VarInfo("AKv", "vertical viscosity coefficient",
                   "meter2 second-1", "w3"),
    "hsbl": VarInfo("hsbl", "depth of oceanic surface boundary layer",
                    "meter", "r2"),
    # static grid variables
    "h": VarInfo("h", "bathymetry at RHO-points", "meter", "r2",
                 time=False),
    "f": VarInfo("f", "Coriolis parameter at RHO-points", "second-1",
                 "r2", time=False),
    "pm": VarInfo("pm", "curvilinear coordinate metric in XI", "meter-1",
                  "r2", time=False),
    "pn": VarInfo("pn", "curvilinear coordinate metric in ETA", "meter-1",
                  "r2", time=False),
    "x_rho": VarInfo("x_rho", "x-locations of RHO-points", "meter", "r2",
                     time=False),
    "y_rho": VarInfo("y_rho", "y-locations of RHO-points", "meter", "r2",
                     time=False),
    "Cs_r": VarInfo("Cs_r", "S-coordinate stretching curves at RHO-points",
                    "nondimensional", "sr", time=False),
    "Cs_w": VarInfo("Cs_w", "S-coordinate stretching curves at W-points",
                    "nondimensional", "sw", time=False),
    # biological tracers (varinfo.yaml NPZD entries)
    "NO3": VarInfo("NO3", "nitrate concentration", "millimole_NO3 meter-3",
                   "r3"),
    "phytoplankton": VarInfo("phytoplankton", "phytoplankton concentration",
                             "millimole_N meter-3", "r3"),
    "zooplankton": VarInfo("zooplankton", "zooplankton concentration",
                           "millimole_N meter-3", "r3"),
    "detritus": VarInfo("detritus", "detritus concentration",
                        "millimole_N meter-3", "r3"),
}

_NPZD_NAMES = ("NO3", "phytoplankton", "zooplankton", "detritus")


def tracer_names(cfg):
    """Output names for every tracer index (mod_ncparam idTvar analog):
    temp, salt, then biology names (cfg.ibio order) or generic
    tracerN, with VarInfo entries registered on the fly."""
    names = {}
    if cfg.ntracers >= 1:
        names[0] = "temp"
    if cfg.ntracers >= 2:
        names[1] = "salt"
    bio = dict(zip(cfg.ibio, _NPZD_NAMES)) if cfg.biology else {}
    for i in range(2, cfg.ntracers):
        nm = bio.get(i, f"tracer{i}")
        if nm not in REGISTRY:
            REGISTRY[nm] = VarInfo(nm, f"passive tracer {i}",
                                   "nondimensional", "r3")
        names[i] = nm
    return names
