"""Static lint for the fused Pallas kernels: trace each kernel's math
(on values, with bc masked-writes mode pushed, exactly as the kernel
traces it) and flag primitives the Mosaic TPU backend cannot lower
(scatter, traced-index dynamic_slice/update, sort, while/scan, cumsum).

Catches 'Unimplemented primitive in Pallas TPU lowering' failures
locally instead of after a multi-minute remote-compile round trip.
"""
import re
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from roms_tpu.models import benchmark
from roms_tpu import vgrid
from roms_tpu.grid import hc_of
from roms_tpu.ops import bc, eos, mix3d, prsgrd, rhs3d_pallas
from roms_tpu.ops.omega import set_massflux, omega
from roms_tpu.ops.pre_step3d import momentum_init
from roms_tpu.ops.rhs3d import rhs3d_momentum

BAD = re.compile(
    r"\b(scatter[\w-]*|sort|while|cumsum|cummax|cummin|cumprod|"
    r"gather|dynamic_slice|dynamic_update_slice)\b")

# dynamic_slice/update with *constant* starts is fine; the lowering only
# rejects traced starts.  The jaxpr prints constant starts as literals
# (e.g. `0:i32[]`), traced ones as variables.
DS_TRACED = re.compile(
    r"dynamic_(?:update_)?slice\[[^\]]*\][^\n]*? [a-z]+:i32\[\]")


def report(name, fn, *args):
    bc.push_masked()
    try:
        s = str(jax.make_jaxpr(fn)(*args))
    finally:
        bc.pop_masked()
    hits = sorted(set(BAD.findall(s)) - {"dynamic_slice",
                                         "dynamic_update_slice"})
    ds = DS_TRACED.findall(s)
    ok = not hits and not ds
    print(f"{name:28s} {'OK' if ok else 'FAIL'}"
          + (f"  prims={hits}" if hits else "")
          + (f"  traced-index-ds={len(ds)}" if ds else ""))
    return ok


def main():
    cfg = benchmark.make_config(Lm=24, Mm=16, N=8, ndtfast=6,
                                dtype="float32")
    cfg, grid, s, ffn = benchmark.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    rho, _ = eos.rho_eos_pden(cfg, s.t, z_r)
    Huon, Hvom = set_massflux(cfg, grid, s.u, s.v, Hz)
    W = omega(cfg, grid, Huon, Hvom, z_w)
    z2 = jnp.zeros_like(s.zeta)
    g = rhs3d_pallas._metrics(grid.pm, grid.pn, grid.pmask, grid.fomn,
                              grid.dndx, grid.dmde)

    def fake_scr(inc, top):
        n = inc.shape[0]
        outs = [None] * (n + 1)
        outs[n] = top
        acc = top
        for kk in range(n - 1, -1, -1):
            acc = acc + inc[kk]
            outs[kk] = acc
        return jnp.stack(outs, 0)

    ok = True
    ok &= report("momentum_init",
                 lambda u, v: momentum_init(
                     cfg, g.pm, g.pn, 0.5, 0.5, u, v, Hz,
                     u, u, v, v, z2, z2, z2, z2), s.u, s.v)
    ok &= report("prsgrd32(scratch)",
                 lambda r: prsgrd.prsgrd32(cfg, g, r, z_r, z_w, Hz,
                                           rcumsum=fake_scr), rho)
    ok &= report("rhs3d_momentum",
                 lambda u, v, r: rhs3d_momentum(
                     cfg, g, u, v, Huon, Hvom, W, Hz, r, r * 0,
                     z2, z2, z2, z2), s.u, s.v, rho)
    ok &= report("uv3dmix2",
                 lambda u, v: mix3d.uv3dmix2(
                     cfg, g, u, v, Hz, u * Hz, v * Hz, z2, z2, cfg.dt),
                 s.u, s.v)
    ok &= report("t3dmix2_geo",
                 lambda t: mix3d._triad_fluxes_geo(
                     cfg, g, t, Hz, z_r, 100.0)[0], s.t[0])

    # --- round-5 corrector/predictor kernels (ops/step3d_pallas.py) ---
    from types import SimpleNamespace
    from roms_tpu.ops.pre_step3d import tracer_predictor
    from roms_tpu.ops.step3d_t import tracer_corrector
    from roms_tpu.ops.step3d_uv import step3d_uv
    from roms_tpu.ops.step3d_pallas import _vadv_unrolled
    from roms_tpu.ops.tridiag import (spline_vdiff_flux_unrolled,
                                      thomas_implicit_unrolled)
    pmn = grid.pm * grid.pn
    Akt_l = jnp.full_like(z_w, 1e-5)
    ok &= report(
        "tracer_predictor",
        lambda q: tracer_predictor(
            cfg, pmn, 0, (0.1, 0.5, 0.4, 0.1), q, q, Hz, None,
            Huon, Hvom, W, Akt_l, Akt_l, z2, z_w - z_w + 0.5,
            z2, z2, vadv_fn=_vadv_unrolled)[0], s.t[0])
    ok &= report(
        "tracer_corrector",
        lambda q: tracer_corrector(
            cfg, None, pmn, 0, q * Hz, q, Huon, Hvom, W, Hz, z_r,
            1.0 / Hz, Akt_l, spline_fn=spline_vdiff_flux_unrolled,
            thomas_fn=thomas_implicit_unrolled,
            vadv_fn=_vadv_unrolled), s.t[0])
    guv = SimpleNamespace(
        pm=grid.pm, pn=grid.pn, umask=grid.umask, vmask=grid.vmask,
        on_u=g.on_u, om_v=g.om_v)
    ok &= report(
        "step3d_uv",
        lambda un, vn: step3d_uv(
            cfg, guv, 5, un, vn, un, vn, Hz, Akt_l, z2, z2, z2, z2,
            Huon, Hvom, spline_fn=spline_vdiff_flux_unrolled)[0],
        s.u * Hz, s.v * Hz)
    sys.exit(0 if ok else 1)


main()
