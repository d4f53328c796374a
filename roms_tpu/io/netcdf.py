"""NetCDF history/averages/restart output.

The analog of the reference's def_his/wrt_his (ROMS/Utility/def_his.F,
wrt_his.F) using NetCDF3-classic via scipy (no external netCDF library in
the image).  Fields are written with interior-only extents (halo stripped),
CF metadata from the varinfo registry, and a config stamp (the reference's
wrt_info.F global attributes).  Adler-32 checksums of each record mirror
get_hash.F.
"""

from __future__ import annotations

import json
import zlib
from typing import Dict, Optional

import numpy as np
from scipy.io import netcdf_file

from ..config import Config
from .varinfo import REGISTRY


def _interior(cfg: Config, a: np.ndarray) -> np.ndarray:
    H = cfg.halo
    return a[..., H:H + cfg.Mm, H:H + cfg.Lm]


def adler32(a: np.ndarray) -> int:
    """Field checksum (the reference's get_hash.F Adler-32)."""
    return zlib.adler32(np.ascontiguousarray(a).tobytes())


class HistoryWriter:
    """Append-mode NetCDF writer for time records of model fields."""

    GRID_DIMS = {
        "r2": ("ocean_time", "eta_rho", "xi_rho"),
        "u2": ("ocean_time", "eta_rho", "xi_rho"),
        "v2": ("ocean_time", "eta_rho", "xi_rho"),
        "r3": ("ocean_time", "s_rho", "eta_rho", "xi_rho"),
        "w3": ("ocean_time", "s_w", "eta_rho", "xi_rho"),
    }

    def __init__(self, path: str, cfg: Config, grid=None,
                 fields=("zeta", "ubar", "vbar", "u", "v", "temp", "salt")):
        self.path = path
        self.cfg = cfg
        # extra tracers (biology etc.): append their registered names
        # to the default field list (mod_ncparam idTvar analog)
        self._tracer_idx = {}
        from .varinfo import tracer_names
        tnames = tracer_names(cfg)
        if fields == HistoryWriter.__init__.__defaults__[1] and \
                cfg.ntracers > 2:
            fields = tuple(fields) + tuple(
                tnames[i] for i in range(2, cfg.ntracers))
        self._tracer_idx = {v: k for k, v in tnames.items()}
        self.fields = fields
        self.checksums = []
        self._nrec = 0

        f = netcdf_file(path, "w")
        f.createDimension("ocean_time", None)   # unlimited must come first
        f.createDimension("xi_rho", cfg.Lm)
        f.createDimension("eta_rho", cfg.Mm)
        f.createDimension("s_rho", cfg.N)
        f.createDimension("s_w", cfg.N + 1)
        f.history = "roms_tpu history file"
        f.type = "ROMS-compatible history"
        # config stamp (wrt_info.F analog)
        f.config = json.dumps(
            {k: v for k, v in cfg.__dict__.items()
             if isinstance(v, (int, float, str, bool))}).encode()

        tvar = f.createVariable("ocean_time", "d", ("ocean_time",))
        tvar.units = b"seconds since initialization"
        self._tvar = tvar

        if grid is not None:
            for name, src in (("h", grid.h), ("f", grid.f),
                              ("pm", grid.pm), ("pn", grid.pn),
                              ("x_rho", grid.xr), ("y_rho", grid.yr)):
                v = f.createVariable(name, "d", ("eta_rho", "xi_rho"))
                info = REGISTRY[name]
                v.long_name = info.long_name.encode()
                v.units = info.units.encode()
                v[:] = _interior(cfg, np.asarray(src))
            for name, src in (("Cs_r", grid.Cs_r), ("Cs_w", grid.Cs_w)):
                dim = "s_rho" if name == "Cs_r" else "s_w"
                v = f.createVariable(name, "d", (dim,))
                v[:] = np.asarray(src)

        self._vars = {}
        for name in fields:
            info = REGISTRY[name]
            v = f.createVariable(name, "d", self.GRID_DIMS[info.grid])
            v.long_name = info.long_name.encode()
            v.units = info.units.encode()
            self._vars[name] = v
        self._f = f

    def write(self, state, time: Optional[float] = None):
        """Append one record from a State (or dict of arrays)."""
        n = self._nrec
        t = float(state.time) if time is None else time
        self._tvar[n] = t
        rec_sums: Dict[str, int] = {}
        for name in self.fields:
            if name in self._tracer_idx:
                a = np.asarray(state.t[self._tracer_idx[name]])
            elif name == "AKv":
                a = np.asarray(state.Akv)
            else:
                a = np.asarray(getattr(state, name))
            a = _interior(self.cfg, a)
            self._vars[name][n] = a
            rec_sums[name] = adler32(a)
        self.checksums.append(rec_sums)
        self._nrec += 1

    def close(self):
        self._f.flush()
        self._f.close()


def read_history(path: str):
    """Read a history file back into dict of numpy arrays."""
    f = netcdf_file(path, "r", mmap=False)
    out = {k: v[:].copy() for k, v in f.variables.items()}
    f.close()
    return out
