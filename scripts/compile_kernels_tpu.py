"""Compile + time each fused Pallas kernel on the real TPU at
BENCHMARK1 size, one pallas_call at a time, so VMEM overflows are
attributed to a specific kernel (the full-step bench is all-or-nothing:
one failing kernel falls back to pure XLA).

Timing caveat: isolated scans are cache-hot and under-represent the
full-step win (see CLAUDE.md); use bench.py for the decision number.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu import vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import (eos, mix3d_pallas, prsgrd_pallas, rhs3d_pallas,
                          step3d_pallas)
from roms_tpu.ops.omega import set_massflux, omega


def timeit(name, fn, *args, reps=30):
    try:
        t0 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(fn)(*args))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:24s} OK   {dt:8.3f} ms/call  (compile {tc:.0f}s)",
              flush=True)
    except Exception as e:
        msg = str(e)
        for key in ("Exceeded vmem capacity by", "Unimplemented",
                    "exceeded scoped vmem limit by"):
            i = msg.find(key)
            if i >= 0:
                msg = msg[i:i + 80]
                break
        else:
            msg = msg[:120]
        print(f"{name:24s} FAIL {msg}", flush=True)


def main():
    cfg = benchmark.make_config(Lm=512, Mm=64, N=30, dt=150.0,
                                ndtfast=20, dtype="float32")
    cfg, grid, s, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    rho, _ = eos.rho_eos_pden(cfg, s.t, z_r)
    Huon, Hvom = set_massflux(cfg, grid, s.u, s.v, Hz)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    z2 = jnp.zeros_like(s.zeta)
    nt = cfg.ntracers
    stflx = jnp.zeros((nt,) + z2.shape, z2.dtype)
    Akt = jnp.stack([jnp.full_like(z_w, 1e-5)] * 2)
    ghats = jnp.zeros((nt,) + z_w.shape, z2.dtype)
    swdk = jnp.exp(z_w / 10.0)
    iic = jnp.asarray(5)

    timeit("prsgrd32_fused",
           lambda r: prsgrd_pallas.prsgrd32_fused(
               cfg, grid, r, z_r, z_w, Hz, interpret=False), rho)
    timeit("rhs3d_fused",
           lambda u, v: rhs3d_pallas.rhs3d_fused(
               cfg, grid, u, v, Huon, Hvom, W, Hz, u * 0, v * 0,
               z2, z2, z2, z2, interpret=False)[0], s.u, s.v)
    timeit("uv3dmix2_fused",
           lambda u, v: mix3d_pallas.uv3dmix2_fused(
               cfg, grid, u, v, Hz, u * Hz, v * Hz, z2, z2, cfg.dt,
               interpret=False)[0], s.u, s.v)
    timeit("t3dmix2_geo_fused",
           lambda t: mix3d_pallas.t3dmix2_geo_fused(
               cfg, grid, t, Hz, z_r, t * Hz[None], cfg.dt,
               interpret=False), s.t)
    timeit("tracer_predictor_fused",
           lambda t: step3d_pallas.tracer_predictor_fused(
               cfg, grid, iic, t, t, Hz, Huon, Hvom, W, Akt,
               ghats=ghats, srflx=z2, swdk_w=swdk, stflx=stflx,
               btflx=stflx, interpret=False)[0], s.t)
    timeit("uv_corrector_fused",
           lambda un, vn: step3d_pallas.uv_corrector_fused(
               cfg, grid, iic, un, vn, un * 0, vn * 0, Hz,
               Akt[0], z2 + 1.0, z2 + 1.0, z2 + 1.0, z2 + 1.0,
               Huon, Hvom, interpret=False)[0],
           s.u * Hz, s.v * Hz)
    timeit("tracer_corrector_fused",
           lambda t: step3d_pallas.tracer_corrector_fused(
               cfg, grid, t * Hz[None], t, Huon, Hvom, W, Hz, z_r,
               Akt, interpret=False), s.t)


main()
