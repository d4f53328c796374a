"""Run-mode driver: the analog of the reference's driver layer
(ROMS/Drivers/nl_roms.h ROMS_initialize / ROMS_run / ROMS_finalize) and
main3d's orchestration of I/O, diagnostics, and blowup handling.

    sim = Simulation(cfg, grid, state0, forcing_fn,
                     his_file="his.nc", nhis=10, nrst=100)
    sim.run(nsteps)
    sim.finalize()
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

from .config import Config
from .grid import Grid
from .state import State
from . import stepping
from .utils import diag as diag_mod
from .utils.timers import Profiler


class BlowupError(RuntimeError):
    pass


class Simulation:
    # mod_average.F accumulator set: prognostic fields + mixing
    # coefficients + boundary-layer depths + fast-time-averaged
    # transports (set_avg.F field list)
    AVG_FIELDS = ("zeta", "ubar", "vbar", "u", "v", "t", "Akv", "Akt",
                  "hsbl", "hbbl", "tke", "DU_avg1", "DV_avg1")
    AVG_OUT = ("zeta", "ubar", "vbar", "u", "v", "temp", "salt", "AKv",
               "AKt", "hsbl", "hbbl", "tke", "DU_avg1", "DV_avg1",
               "zeta2", "ubar2", "vbar2", "uu", "vv", "uv", "Huon",
               "Hvom", "rho")

    # quadratic / derived accumulators (set_avg.F:2352-3952: squared
    # prognostics for eddy statistics, mass fluxes, in-situ density)
    @staticmethod
    def _avg_derived():
        import jax.numpy as jnp
        from . import vgrid
        from .grid import hc_of
        from .ops import eos
        from .ops.omega import set_massflux

        def huon(cfg, grid, s):
            _, _, Hz = vgrid.set_depth(
                grid.h, s.zeta, hc_of(cfg), grid.sc_r, grid.Cs_r,
                grid.sc_w, grid.Cs_w, cfg.vtransform, zice=grid.zice)
            return set_massflux(cfg, grid, s.u, s.v, Hz)[0]

        def hvom(cfg, grid, s):
            _, _, Hz = vgrid.set_depth(
                grid.h, s.zeta, hc_of(cfg), grid.sc_r, grid.Cs_r,
                grid.sc_w, grid.Cs_w, cfg.vtransform, zice=grid.zice)
            return set_massflux(cfg, grid, s.u, s.v, Hz)[1]

        def rho(cfg, grid, s):
            z_r, _, _ = vgrid.set_depth(
                grid.h, s.zeta, hc_of(cfg), grid.sc_r, grid.Cs_r,
                grid.sc_w, grid.Cs_w, cfg.vtransform, zice=grid.zice)
            return eos.rho_eos(cfg, s.t, z_r)

        from .ops.stencil import ip1, jp1
        return {
            "zeta2": lambda c, g, s: s.zeta * s.zeta,
            "ubar2": lambda c, g, s: s.ubar * s.ubar,
            "vbar2": lambda c, g, s: s.vbar * s.vbar,
            "uu": lambda c, g, s: (0.5 * (s.u + ip1(s.u))) ** 2,
            "vv": lambda c, g, s: (0.5 * (s.v + jp1(s.v))) ** 2,
            "uv": lambda c, g, s: 0.25 * (s.u + ip1(s.u)) *
                                  (s.v + jp1(s.v)),
            "Huon": huon, "Hvom": hvom, "rho": rho,
        }
    QCK_FIELDS = ("zeta", "ubar", "vbar", "temp_sur", "salt_sur",
                  "u_sur", "v_sur")

    def __init__(self, cfg: Config, grid: Grid, state: State,
                 forcing_fn: Optional[Callable] = None,
                 his_file: Optional[str] = None, nhis: int = 0,
                 rst_file: Optional[str] = None, nrst: int = 0,
                 avg_file: Optional[str] = None, navg: int = 0,
                 dia_file: Optional[str] = None, ndia: int = 0,
                 qck_file: Optional[str] = None, nqck: int = 0,
                 ndef_his: int = 0,
                 ninfo: int = 10, log: Callable = print,
                 steps_per_call: int = 1):
        self.cfg = cfg
        self.grid = grid
        # private copy: stepping donates state buffers, the caller's
        # arrays must stay alive
        self.state = jax.tree_util.tree_map(
            lambda x: jax.numpy.asarray(x).copy(), state)
        self.forcing_fn = forcing_fn
        self.ninfo = ninfo
        self.nhis = nhis
        self.nrst = nrst
        self.rst_file = rst_file
        self.log = log
        self.profiler = Profiler()
        self.steps_per_call = max(1, steps_per_call)
        self.navg = navg
        self.ndia = ndia
        self.avg_writer = None
        self.dia_writer = None
        self._avg_acc = None
        self._dia_acc = None
        avg_on = bool(avg_file and navg > 0)
        dia_on = bool(dia_file and ndia > 0)
        if avg_on and navg % self.steps_per_call:
            raise ValueError(
                f"navg={navg} must be a multiple of "
                f"steps_per_call={self.steps_per_call}")
        if dia_on and self.steps_per_call != 1:
            raise ValueError("diagnostics stream requires "
                             "steps_per_call == 1")

        n = self.steps_per_call
        if dia_on:
            # per-step budget increments (DIAGNOSTICS_TS/UV)
            self._step = jax.jit(lambda s: stepping.step(
                cfg, grid, s, forcing_fn, collect_diags=True))
        elif avg_on:
            # averaging accumulates ON DEVICE every step so batched
            # dispatch (steps_per_call > 1) still samples each state
            drv = self._avg_derived()
            self._step = jax.jit(
                lambda s: stepping.run_accum(cfg, grid, s, n, forcing_fn,
                                             fields=self.AVG_FIELDS,
                                             derived=drv),
                donate_argnums=(0,))
        elif n == 1:
            self._step = stepping.make_stepper(cfg, grid, forcing_fn,
                                               donate=True)
        else:
            self._step = jax.jit(
                lambda s: stepping.run(cfg, grid, s, n, forcing_fn),
                donate_argnums=(0,))
        self._mode = ("dia" if dia_on else
                      "avg" if avg_on else "plain")

        from .io.netcdf import HistoryWriter, DiagWriter, FileRing
        self.writer = None
        if his_file and nhis > 0:
            if ndef_his > 0:
                self.writer = FileRing(HistoryWriter, his_file,
                                       ndef_his, cfg, grid)
            else:
                self.writer = HistoryWriter(his_file, cfg, grid)
        self.qck_writer = None
        self.nqck = nqck
        if qck_file and nqck > 0:
            self.qck_writer = HistoryWriter(qck_file, cfg, grid,
                                            fields=self.QCK_FIELDS)
        if avg_on:
            self.avg_writer = HistoryWriter(avg_file, cfg, grid,
                                            fields=self.AVG_OUT)
        if dia_on:
            self.dia_writer = DiagWriter(dia_file, cfg)

    # -- ROMS_run ------------------------------------------------------
    def run(self, nsteps: int):
        cfg = self.cfg
        done = 0
        while done < nsteps:
            with self.profiler.region("3d time stepping"):
                if self._mode == "avg":
                    self.state, sums = self._step(self.state)
                    if self._avg_acc is None:
                        self._avg_acc = sums
                    else:
                        self._avg_acc = jax.tree_util.tree_map(
                            jax.numpy.add, self._avg_acc, sums)
                elif self._mode == "dia":
                    self.state, dia = self._step(self.state)
                    if self._dia_acc is None:
                        self._dia_acc = dia
                    else:
                        self._dia_acc = jax.tree_util.tree_map(
                            jax.numpy.add, self._dia_acc, dia)
                else:
                    self.state = self._step(self.state)
            done += self.steps_per_call
            iic = int(self.state.iic)
            if self.ninfo and iic % self.ninfo == 0:
                with self.profiler.region("diagnostics"):
                    d = jax.device_get(diag_mod.diagnostics(
                        cfg, self.grid, self.state))
                self.log(
                    f" {iic:7d} {float(self.state.time) / 86400.0:10.4f} "
                    f"KE={float(d['ke']):.6E} "
                    f"umax={float(d['umax']):.4f} "
                    f"zmax={float(d['zmax']):.4f}")
                if diag_mod.blowup(cfg, d):
                    # graceful stop with final restart (nl_roms.h:367-375)
                    if self.rst_file:
                        self._write_rst()
                    raise BlowupError(
                        f"blowup detected at step {iic}: "
                        f"umax={float(d['umax'])}, finite={bool(d['finite'])}")
            if self.writer and iic % self.nhis == 0:
                with self.profiler.region("output: history"):
                    self.writer.write(jax.device_get(self.state))
            if self.qck_writer and iic % self.nqck == 0:
                with self.profiler.region("output: quick"):
                    self.qck_writer.write(jax.device_get(self.state))
            if self.avg_writer and iic % self.navg == 0 and \
                    self._avg_acc is not None:
                with self.profiler.region("output: averages"):
                    mean = jax.device_get(jax.tree_util.tree_map(
                        lambda a: a / self.navg, self._avg_acc))
                    state_part = {k: mean[k] for k in self.AVG_FIELDS}
                    extra = {k: v for k, v in mean.items()
                             if k not in self.AVG_FIELDS}
                    rec = self.state.replace(**state_part)
                    self.avg_writer.write(
                        jax.device_get(rec),
                        time=float(self.state.time) -
                        0.5 * self.navg * self.cfg.dt,
                        extra=extra)
                    self._avg_acc = None
            if self.dia_writer and iic % self.ndia == 0 and \
                    self._dia_acc is not None:
                with self.profiler.region("output: diagnostics"):
                    self.dia_writer.write(
                        jax.device_get(self._dia_acc),
                        time=float(self.state.time) -
                        0.5 * self.ndia * self.cfg.dt,
                        scale=1.0 / self.ndia)
                    self._dia_acc = None
            if self.rst_file and self.nrst and iic % self.nrst == 0:
                with self.profiler.region("output: restart"):
                    self._write_rst()
        return self.state

    def _write_rst(self):
        from .io import checkpoint
        checkpoint.save(self.rst_file, self.state)

    # -- ROMS_finalize -------------------------------------------------
    def finalize(self):
        for w in (self.writer, self.avg_writer, self.qck_writer,
                  self.dia_writer):
            if w:
                w.close()
        self.log(self.profiler.report())


def restart(cfg: Config, rst_file: str, template: State) -> State:
    from .io import checkpoint
    return checkpoint.restore(rst_file, template)
