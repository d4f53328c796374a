"""Measure per-step time vs scan length to separate dispatch (axon RPC)
overhead from on-device compute; also ablate the fast loop length."""
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu import stepping


def timeit(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms per call


def main():
    Lm, Mm, N = 512, 64, 30
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)

    for nsteps in (10, 50):
        runN = jax.jit(lambda s, n=nsteps: stepping.run(cfg, grid, s, n, ffn))
        t = timeit(runN, state)
        print(f"scan {nsteps:3d} steps: {t:9.3f} ms  -> {t/nsteps:7.3f} ms/step"
              f"  ({Lm*Mm*N/(t/nsteps)*1e3:.3e} pts/s)")

    # fast-loop cost inside the scan: ndtfast=3 (nfast~5) vs 20 (nfast~29)
    cfg3 = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dt=150.0, ndtfast=3,
                                 dtype="float32")
    cfg3, grid3, state3, ffn3 = benchmark.build(cfg3)
    runN3 = jax.jit(lambda s: stepping.run(cfg3, grid3, s, 50, ffn3))
    t3 = timeit(runN3, state3)
    print(f"scan 50 steps ndtfast=3: {t3/50:7.3f} ms/step "
          f"(fast-loop 24 substeps ~= {{:.3f}} ms)".format(0.0))


if __name__ == "__main__":
    main()
