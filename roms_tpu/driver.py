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
    def __init__(self, cfg: Config, grid: Grid, state: State,
                 forcing_fn: Optional[Callable] = None,
                 his_file: Optional[str] = None, nhis: int = 0,
                 rst_file: Optional[str] = None, nrst: int = 0,
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
        self.log(self.profiler.report())


def restart(cfg: Config, rst_file: str, template: State) -> State:
    from .io import checkpoint
    return checkpoint.restore(rst_file, template)
