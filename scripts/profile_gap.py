"""Find the gap between the stage-sum and the full-step time: time the
full step, the untimed mixing stages (t3dmix2_geo, uv3dmix2), and a
step with them disabled."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu import stepping, vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import eos
from roms_tpu.ops.mix3d import t3dmix2_geo, uv3dmix2


def timeit(name, fn, arg, reps=20):
    out = fn(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms")


def main():
    cfg = benchmark.make_config(Lm=512, Mm=64, N=30, dt=150.0,
                                ndtfast=20, dtype="float32")
    cfg, grid, s, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    rho, pden = eos.rho_eos_pden(cfg, s.t, z_r)

    full = jax.jit(lambda st: stepping.step(cfg, grid, st, ffn))
    timeit("full step", full, s)

    cfg_nomix = cfg.replace(tnu2=(0.0, 0.0), ts_dif2=False,
                            uv_vis2=False, visc2=0.0)
    nomix = jax.jit(lambda st: stepping.step(cfg_nomix, grid, st, ffn))
    timeit("step w/o t3dmix+uv3dmix", nomix, s)

    cfg_novmix = cfg.replace(vmix="none")
    novm = jax.jit(lambda st: stepping.step(cfg_novmix, grid, st, ffn))
    timeit("step w/o KPP", novm, s)

    cfg_nobulk = cfg.replace(bulk_fluxes=False)
    nob = jax.jit(lambda st: stepping.step(cfg_nobulk, grid, st, ffn))
    timeit("step w/o bulk_flux", nob, s)

    tg = jax.jit(lambda t: t3dmix2_geo(cfg, grid, t, Hz, z_r,
                                       t * Hz[None], cfg.dt))
    timeit("t3dmix2_geo", tg, s.t)

    uv = jax.jit(lambda u: uv3dmix2(
        cfg, grid, u, s.v, Hz, u * Hz, s.v * Hz,
        jnp.zeros_like(s.zeta), jnp.zeros_like(s.zeta), cfg.dt))
    timeit("uv3dmix2", uv, s.u)


main()
