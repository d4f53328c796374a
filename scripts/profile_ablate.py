"""Scan-based (production-mode) ablation timing of the BENCHMARK1 step."""
import sys, time
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from roms_tpu.models import benchmark
from roms_tpu import stepping


def rate(cfg, grid, s, ffn, nsteps=50, reps=2):
    runN = jax.jit(lambda st: stepping.run(cfg, grid, st, nsteps, ffn))
    s = runN(s); jax.block_until_ready(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        s = runN(s)
    jax.block_until_ready(s)
    return (time.perf_counter() - t0) / (reps * nsteps) * 1e3


def main():
    cfg0 = benchmark.make_config(Lm=512, Mm=64, N=30, dt=150.0,
                                 ndtfast=20, dtype="float32")
    cfg, grid, s, ffn = benchmark.build(cfg0)
    print(f"full            {rate(cfg, grid, s, ffn):8.3f} ms/step")
    c2 = cfg.replace(tnu2=(0.0, 0.0), ts_dif2=False, uv_vis2=False,
                     visc2=0.0)
    print(f"no h-mix        {rate(c2, grid, s, ffn):8.3f} ms/step")
    c3 = cfg.replace(vmix="none")
    print(f"no KPP          {rate(c3, grid, s, ffn):8.3f} ms/step")
    cfg4, grid4, s4, ffn4 = benchmark.build(cfg0.replace(ndtfast=3))
    print(f"ndtfast=3       {rate(cfg4, grid4, s4, ffn4):8.3f} ms/step")
main()
