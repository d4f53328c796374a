"""Capture a jax.profiler device trace of the BENCHMARK1 step."""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from roms_tpu.models import benchmark
from roms_tpu import stepping


def main():
    Lm, Mm, N = 512, 64, 30
    cfg = benchmark.make_config(Lm=Lm, Mm=Mm, N=N, dt=150.0, ndtfast=20,
                                dtype="float32")
    cfg, grid, state, ffn = benchmark.build(cfg)

    runN = jax.jit(lambda s: stepping.run(cfg, grid, s, 10, ffn))
    state = runN(state)
    jax.block_until_ready(state)

    with jax.profiler.trace("/tmp/jax_trace"):
        state = runN(state)
        jax.block_until_ready(state)
    print("trace done")


if __name__ == "__main__":
    main()
