"""TPU smoke test + timing for the fused Pallas fast loop.

Compares a 50-step scan of the jnp fast_loop vs fast_loop_fused at
BENCHMARK1 2-D size (the fast loop only, no slow physics).
Run on the real chip: python scripts/pallas_smoke.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu.ops import step2d, step2d_pallas
from roms_tpu.ops.step2d import Fast2DState


def main():
    cfg = benchmark.make_config(Lm=512, Mm=64, N=30, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)
    print("backend:", jax.default_backend(), "nfast:", cfg.nfast, flush=True)
    assert step2d_pallas.supported(cfg), "config not supported by kernel"

    zero = jnp.zeros_like(state.zeta)
    fs = Fast2DState(
        zeta_n=state.zeta, zeta_nm1=state.zeta, ubar_n=state.ubar,
        ubar_nm1=state.ubar, vbar_n=state.vbar, vbar_nm1=state.vbar,
        rzeta_n=zero, rzeta_nm1=zero, rubar_n=zero, rubar_nm1=zero,
        rvbar_n=zero, rvbar_nm1=zero, Zt_avg1=zero, DU_avg1=zero,
        DV_avg1=zero, DU_avg2=zero, DV_avg2=zero)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    rufrc = 1e-4 * jax.random.normal(k1, zero.shape, zero.dtype)
    rvfrc = 1e-4 * jax.random.normal(k2, zero.shape, zero.dtype)

    def scan_of(fn, n=50):
        def body(fs, _):
            out = fn(cfg, grid, fs, rufrc, rvfrc, zero, zero, zero, zero, 5)
            return out[0], out[1][0, 0]
        return jax.jit(lambda f: jax.lax.scan(body, f, None, length=n))

    def jnp_fl(cfg, grid, fs, rufrc, rvfrc, a, b, c, d, iic):
        return step2d.fast_loop(cfg, grid, fs, rufrc=rufrc, rvfrc=rvfrc,
                                ru0_nm1=a, ru0_nm2=b, rv0_nm1=c, rv0_nm2=d,
                                iic=iic)

    import os
    pairs = [("pallas", step2d_pallas.fast_loop_fused), ("jnp", jnp_fl)]
    if os.environ.get("SMOKE_ONLY") == "pallas":
        pairs = pairs[:1]
    elif os.environ.get("SMOKE_ONLY") == "jnp":
        pairs = pairs[1:]
    for name, fn in pairs:
        f = scan_of(fn)
        t0 = time.perf_counter()
        out, _ = f(fs)
        jax.block_until_ready(out)
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out, _ = f(out)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (reps * 50)
        z = jax.device_get(out.zeta_n)
        import numpy as np
        print(f"{name}: compile+1st {t_compile:.1f}s, "
              f"{dt*1e3:.3f} ms/slow-step-fastloop, "
              f"finite={np.isfinite(z).all()}, max|z|={np.abs(z).max():.3e}")


if __name__ == "__main__":
    main()
