"""XLA cost analysis of the compiled BENCHMARK1 step: bytes accessed,
flops, and implied HBM-roofline time vs measured."""
import sys

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

    one = jax.jit(lambda s: stepping.step(cfg, grid, s, ffn))
    c = one.lower(state).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    by = ca.get("bytes accessed", 0.0)
    fl = ca.get("flops", 0.0)
    tr = ca.get("transcendentals", 0.0)
    print(f"bytes accessed / step: {by/1e6:10.1f} MB")
    print(f"flops / step         : {fl/1e9:10.2f} GF")
    print(f"transcendentals      : {tr/1e6:10.1f} M")
    print(f"roofline (820 GB/s)  : {by/8.2e11*1e3:10.3f} ms")
    print(f"roofline (197 TF/s bf16 ~ 49 TF f32): {fl/4.9e13*1e3:10.3f} ms")
    for k, v in sorted(ca.items()):
        if "utilization" not in k and not k.startswith("bytes accessed"):
            continue
    mem = c.memory_analysis()
    if mem is not None:
        print("temp size   :", getattr(mem, "temp_size_in_bytes", None))
        print("output size :", getattr(mem, "output_size_in_bytes", None))


if __name__ == "__main__":
    main()
