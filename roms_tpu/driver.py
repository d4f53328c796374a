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
    AVG_FIELDS = ("zeta", "ubar", "vbar", "u", "v", "t")

    def __init__(self, cfg: Config, grid: Grid, state: State,
                 forcing_fn: Optional[Callable] = None,
                 his_file: Optional[str] = None, nhis: int = 0,
                 rst_file: Optional[str] = None, nrst: int = 0,
                 avg_file: Optional[str] = None, navg: int = 0,
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
        if self.steps_per_call == 1:
            self._step = stepping.make_stepper(cfg, grid, forcing_fn,
                                               donate=True)
        else:
            n = self.steps_per_call
            self._step = jax.jit(
                lambda s: stepping.run(cfg, grid, s, n, forcing_fn),
                donate_argnums=(0,))
        self.writer = None
        if his_file and nhis > 0:
            from .io.netcdf import HistoryWriter
            self.writer = HistoryWriter(his_file, cfg, grid)
        # time-averaged output (mod_average.F accumulators, set_avg.F)
        self.navg = navg
        self.avg_writer = None
        self._avg_acc = None
        if avg_file and navg > 0:
            from .io.netcdf import HistoryWriter
            self.avg_writer = HistoryWriter(avg_file, cfg, grid)
            import jax.numpy as jnp
            self._avg_add = jax.jit(
                lambda acc, s: {k: acc[k] + getattr(s, k)
                                for k in self.AVG_FIELDS})
            self._avg_zero = {
                k: jax.numpy.zeros_like(getattr(state, k))
                for k in self.AVG_FIELDS}
            self._avg_acc = dict(self._avg_zero)

    # -- ROMS_run ------------------------------------------------------
    def run(self, nsteps: int):
        cfg = self.cfg
        done = 0
        while done < nsteps:
            with self.profiler.region("3d time stepping"):
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
            if self.avg_writer:
                with self.profiler.region("output: averages"):
                    self._avg_acc = self._avg_add(self._avg_acc,
                                                  self.state)
                    if iic % self.navg == 0:
                        mean = jax.device_get(jax.tree_util.tree_map(
                            lambda a: a / self.navg, self._avg_acc))
                        rec = self.state.replace(**mean)
                        self.avg_writer.write(
                            jax.device_get(rec),
                            time=float(self.state.time) -
                            0.5 * self.navg * self.cfg.dt)
                        self._avg_acc = dict(self._avg_zero)
            if self.rst_file and self.nrst and iic % self.nrst == 0:
                with self.profiler.region("output: restart"):
                    self._write_rst()
        return self.state

    def _write_rst(self):
        from .io import checkpoint
        checkpoint.save(self.rst_file, self.state)

    # -- ROMS_finalize -------------------------------------------------
    def finalize(self):
        if self.writer:
            self.writer.close()
        if self.avg_writer:
            self.avg_writer.close()
        self.log(self.profiler.report())


def restart(cfg: Config, rst_file: str, template: State) -> State:
    from .io import checkpoint
    return checkpoint.restore(rst_file, template)
