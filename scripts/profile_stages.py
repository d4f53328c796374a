"""Stage-level TPU timing for the BENCHMARK1 workload.

Times the full step plus ablations (physics stages disabled one at a
time) to locate the hot spots; prints a wall-clock table.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu import stepping, vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import eos, vmix
from roms_tpu.ops.omega import set_massflux, omega
from roms_tpu.ops.step2d import Fast2DState, fast_loop


def timeit(fn, *args, reps=5, inner=1):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (reps * inner) * 1e3  # ms


def main():
    Lm, Mm, N = 512, 64, 30
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)

    nsteps = 10
    runN = jax.jit(lambda s: stepping.run(cfg, grid, s, nsteps, ffn))
    t_full = timeit(runN, state, inner=nsteps)
    print(f"full step            : {t_full:8.3f} ms")

    # ablation: no KPP (bvf mixing instead)
    import dataclasses
    cfg_nokpp = dataclasses.replace(cfg, vmix="bvf")
    runNK = jax.jit(lambda s: stepping.run(cfg_nokpp, grid, s, nsteps, ffn))
    t_nokpp = timeit(runNK, state, inner=nsteps)
    print(f"step w/o KPP         : {t_nokpp:8.3f} ms  (KPP ~= {t_full-t_nokpp:.3f})")

    # ablation: no bulk flux
    cfg_nobf = dataclasses.replace(cfg, bulk_fluxes=False)
    runNB = jax.jit(lambda s: stepping.run(cfg_nobf, grid, s, nsteps, ffn))
    t_nobf = timeit(runNB, state, inner=nsteps)
    print(f"step w/o bulk_flux   : {t_nobf:8.3f} ms  (COARE ~= {t_full-t_nobf:.3f})")

    # ablation: linear EOS
    cfg_lin = dataclasses.replace(cfg, eos="linear")
    runNL = jax.jit(lambda s: stepping.run(cfg_lin, grid, s, nsteps, ffn))
    t_lin = timeit(runNL, state, inner=nsteps)
    print(f"step w/ linear EOS   : {t_lin:8.3f} ms  (JM95 ~= {t_full-t_lin:.3f})")

    # isolated fast loop
    zero2 = jnp.zeros_like(state.zeta)
    fs = Fast2DState(
        zeta_n=state.zeta, zeta_nm1=state.zeta,
        ubar_n=state.ubar, ubar_nm1=state.ubar,
        vbar_n=state.vbar, vbar_nm1=state.vbar,
        rzeta_n=state.rzeta, rzeta_nm1=zero2,
        rubar_n=state.rubar, rubar_nm1=zero2,
        rvbar_n=state.rvbar, rvbar_nm1=zero2,
        Zt_avg1=zero2, DU_avg1=zero2, DV_avg1=zero2,
        DU_avg2=zero2, DV_avg2=zero2)
    ruf = jnp.zeros_like(state.ubar)
    rvf = jnp.zeros_like(state.vbar)
    fl = jax.jit(lambda f: fast_loop(cfg, grid, f, rufrc=ruf, rvfrc=rvf,
                                     ru0_nm1=ruf, ru0_nm2=ruf,
                                     rv0_nm1=rvf, rv0_nm2=rvf,
                                     iic=jnp.array(5)))
    t_fl = timeit(fl, fs)
    print(f"fast_loop ({cfg.nfast:2d} sub)  : {t_fl:8.3f} ms")

    # isolated pieces on time-n state
    z_r, z_w, Hz = vgrid.set_depth(grid.h, state.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.sc_w,
                                   cfg.vtransform)

    def kpp_only(s):
        z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                       grid.Cs_r, grid.sc_w, grid.Cs_w,
                                       cfg.vtransform)
        rho, pden = eos.rho_eos_pden(cfg, s.t, z_r)
        bvf = eos.brunt_vaisala(cfg, s.t, z_r, z_w)
        frc = ffn(cfg, grid, s.time)
        sustr = frc.get("sustr", zero2)
        svstr = frc.get("svstr", zero2)
        nt = cfg.ntracers
        stflx = jnp.zeros((nt,) + zero2.shape, zero2.dtype)
        return vmix.lmd_vmix(cfg, grid, s.u, s.v, s.t, rho, pden, bvf,
                             Hz, z_r, z_w, sustr, svstr,
                             zero2, zero2, stflx, zero2, s.hsbl,
                             btflx=stflx, hbbl_prev=s.hbbl)
    kj = jax.jit(kpp_only)
    t_kpp = timeit(kj, state)
    print(f"lmd_vmix isolated    : {t_kpp:8.3f} ms")

    print(f"\npoints/s full: {Lm*Mm*N/t_full*1e3:.3e}")


if __name__ == "__main__":
    main()
