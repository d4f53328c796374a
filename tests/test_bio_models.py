"""Franks/iron NPZD and Fennel BGC: stage conservation laws, carbonate
chemistry check value, gas exchange direction, end-to-end dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from roms_tpu.ops.bio_models import (FranksParams, IronParams,
                                     FennelParams, npzd_franks,
                                     npzd_iron, fennel, pco2_water,
                                     o2_saturation)
from roms_tpu.models import bio_toy
from roms_tpu import stepping


def _column(N=12, Ny=3, Nx=4, depth=50.0):
    z_w = jnp.linspace(-depth, 0.0, N + 1)[:, None, None] * \
        jnp.ones((1, Ny, Nx))
    Hz = z_w[1:] - z_w[:-1]
    z_r = 0.5 * (z_w[1:] + z_w[:-1])
    return Hz, z_w, z_r


class _G:
    rmask = None
    h = None


def _mkcfg(nbio, dt=3600.0):
    cfg = bio_toy.make_config(Lm=4, Mm=3, N=12)
    return cfg.replace(ntracers=2 + nbio,
                       ibio=tuple(range(2, 2 + nbio)),
                       t_hadv=(2 + nbio) * ("U3",),
                       t_vadv=(2 + nbio) * ("C4",),
                       tnu2=(2 + nbio) * (0.0,), dt=dt)


def _stack(vals, N=12, Ny=3, Nx=4):
    return jnp.stack([jnp.full((N, Ny, Nx), v) for v in vals])


def test_pco2_check_value():
    # fennel.h:1953-1956 check value for pCO2_water (DoNewton=0)
    pco2, ph = pco2_water(jnp.array([24.0]), jnp.array([36.6]),
                          jnp.array([2040.0]), jnp.array([2390.0]))
    # the quoted value is itself a 30-iteration bisection result, so
    # agreement is limited by its own resolution (~1e-5 relative)
    np.testing.assert_allclose(float(pco2[0]), 350.74945, rtol=1e-4)
    assert 7.5 < float(ph[0]) < 8.5


def test_o2_saturation_range():
    # Garcia & Gordon: ~225 mmol/m3 at T=20,S=35; more soluble when cold
    o20 = float(o2_saturation(jnp.array(20.0), jnp.array(35.0)))
    o25 = float(o2_saturation(jnp.array(5.0), jnp.array(35.0)))
    assert 200.0 < o20 < 250.0
    assert o25 > o20


def test_franks_conservation_and_bloom():
    cfg = _mkcfg(4)
    p = FranksParams(wDet=0.0)
    Hz, z_w, z_r = _column()
    t = jnp.concatenate([_stack([20.0, 35.0]),
                         _stack([1.67, 0.08, 0.06, 0.04])])
    t_new = jax.jit(lambda t: npzd_franks(cfg, p, t, t, Hz, z_w, z_r))(t)
    tot0 = sum(float((t[i] * Hz).sum()) for i in cfg.ibio)
    tot1 = sum(float((t_new[i] * Hz).sum()) for i in cfg.ibio)
    np.testing.assert_allclose(tot1, 2 * tot0 - tot0, rtol=1e-12)
    # uptake strongest at the surface: P grows, NO3 shrinks
    assert float(t_new[3][-1, 0, 0]) > 2 * 0.08 - 0.08
    assert float(t_new[2][-1, 0, 0]) < 2 * 1.67 - 1.67


def test_iron_conservation():
    cfg = _mkcfg(6)
    # FeRR=1: every Fe release is complete -> total Fe conserved too
    p = IronParams(wPhy=0.0, wDet=0.0, FeRR=1.0, const_par=158.075)
    Hz, z_w, _ = _column()
    g = _G()
    t = jnp.concatenate([_stack([20.0, 35.0]),
                         _stack([17.0, 1.0, 1.0, 1.0, 0.06, 0.01])])
    t_new = jax.jit(lambda t: npzd_iron(cfg, p, g, t, t, Hz, z_w,
                                        None))(t)
    incr = {i: t_new[i] - t[i] for i in cfg.ibio}
    totN = float(sum((incr[i] * Hz).sum() for i in cfg.ibio[:4]))
    totFe = float(sum((incr[i] * Hz).sum() for i in cfg.ibio[4:]))
    np.testing.assert_allclose(totN, 0.0, atol=1e-10)
    np.testing.assert_allclose(totFe, 0.0, atol=1e-12)
    # iron limitation throttles uptake: with more phytoplankton iron
    # (higher Fe:C ratio) the bloom is stronger
    t_rich = t.at[7].set(0.5)        # Fphy
    t_new_rich = npzd_iron(cfg, p, g, t_rich, t_rich, Hz, z_w, None)
    growth_poor = float((t_new[3] - t[3])[-1, 0, 0])
    growth_rich = float((t_new_rich[3] - t_rich[3])[-1, 0, 0])
    assert growth_rich > growth_poor


@pytest.mark.parametrize("denit", [False, True])
def test_fennel_nitrogen_budget(denit):
    # 7-compartment core; BIO_SEDIMENT returns seabed flux to NH4, so
    # N is conserved exactly without DENITRIFICATION and lost with it
    cfg = _mkcfg(7)
    p = FennelParams(denitrification=denit, bio_sediment=True,
                     const_par=158.075, wPhy=5.0, wSDet=5.0, wLDet=20.0)
    Hz, z_w, _ = _column()
    g = _G()
    t = jnp.concatenate([_stack([20.0, 35.0]),
                         _stack([10.0, 1.0, 0.5, 1.0, 0.5, 0.5, 0.5])])
    t_new = jax.jit(lambda t: fennel(cfg, p, g, t, t, Hz, z_w, None))(t)
    # nitrogen compartments: NO3,NH4,Phy,Zoo,LDeN,SDeN (Chl is pigment)
    iN = [cfg.ibio[i] for i in (0, 1, 3, 4, 5, 6)]
    dN = float(sum(((t_new[i] - t[i]) * Hz).sum() for i in iN))
    if denit:
        assert dN < -1e-8            # denitrification removes N
    else:
        np.testing.assert_allclose(dN, 0.0, atol=1e-9)
    assert np.isfinite(np.asarray(t_new)).all()


def test_fennel_oxygen_carbon():
    cfg = _mkcfg(12)
    p = FennelParams(oxygen=True, carbon=True, const_par=158.075)
    Hz, z_w, _ = _column()
    g = _G()
    # start undersaturated in O2 and supersaturated in CO2
    t = jnp.concatenate([
        _stack([20.0, 35.0]),
        _stack([10.0, 1.0, 0.5, 1.0, 0.5, 0.5, 0.5,   # N core
                0.5, 0.5, 2300.0, 2300.0,             # LDeC,SDeC,TIC,TAlk
                100.0])])                             # Oxy (undersat)
    zero2 = jnp.zeros_like(t[0, 0])
    t_new = jax.jit(lambda t: fennel(
        cfg, p, g, t, t, Hz, z_w, None,
        uwind=zero2 + 5.0, vwind=zero2))(t)
    iOxy, iTIC = cfg.ibio[11], cfg.ibio[9]
    # O2 influx at the surface (undersaturated)
    assert float((t_new[iOxy] - t[iOxy])[-1, 0, 0]) > 0.0
    # high-TIC water outgasses CO2 (pCO2 > pCO2air=370)
    pco2, _ = pco2_water(t[0, -1], t[1, -1], t[iTIC, -1],
                         t[cfg.ibio[10], -1])
    assert float(pco2[0, 0]) > 370.0
    assert float((t_new[iTIC] - t[iTIC])[-1, 0, 0]) < \
        float((t_new[iTIC] - t[iTIC])[-2, 0, 0]) + 1e-12
    assert np.isfinite(np.asarray(t_new)).all()


def test_fennel_end_to_end_step():
    # dispatch through stepping.step: fennel core on the bio_toy grid
    cfg = bio_toy.make_config(Lm=6, Mm=8, N=10)
    p = FennelParams(const_par=158.075)
    cfg = cfg.replace(biology="fennel", bio_params=p, ntracers=9,
                      ibio=tuple(range(2, 9)),
                      t_hadv=9 * ("U3",), t_vadv=9 * ("C4",),
                      tnu2=9 * (0.0,))
    cfg, grid, s_uw, ffn = bio_toy.build(cfg.replace(
        biology=None, bio_params=None, ntracers=6, ibio=(2, 3, 4, 5),
        t_hadv=6 * ("U3",), t_vadv=6 * ("C4",), tnu2=6 * (0.0,)))
    # swap the Powell setup for fennel: 7 bio tracers
    cfg = cfg.replace(biology="fennel", bio_params=p, ntracers=9,
                      ibio=tuple(range(2, 9)),
                      t_hadv=9 * ("U3",), t_vadv=9 * ("C4",),
                      tnu2=9 * (0.0,))
    ini = (10.0, 0.5, 0.1, 0.5, 0.3, 0.1, 0.1)
    bio = jnp.stack([jnp.full_like(s_uw.t[0], v) for v in ini])
    t = jnp.concatenate([s_uw.t[:2], bio], axis=0)
    from roms_tpu.state import initial_state
    s0 = initial_state(cfg, zeta=s_uw.zeta, t=t)
    step = stepping.make_stepper(cfg, grid, ffn, donate=False)
    s = s0
    for _ in range(5):
        s = step(s)
    assert np.isfinite(np.asarray(s.t)).all()
    H = cfg.halo
    # bloom: phytoplankton grows under constant PAR
    assert float(s.t[5][-1, H + 4, H + 3]) > ini[3]


# =====================================================================
# hypoxia_srm / nemuro / red_tide
# =====================================================================

from roms_tpu.ops.bio_models import (HypoxiaParams, NemuroParams,
                                     RedTideParams, hypoxia_srm,
                                     nemuro, red_tide, ppm_swim)


def test_hypoxia_respiration_and_reaeration():
    cfg = _mkcfg(1)
    p = HypoxiaParams(ResRate=10.0)          # mmol/m3/day sink
    Hz, z_w, _ = _column()
    t = jnp.concatenate([_stack([20.0, 35.0]), _stack([100.0])])
    zero2 = jnp.zeros((3, 4))
    t_new = jax.jit(lambda t: hypoxia_srm(
        cfg, p, _G(), t, t, Hz, z_w, None,
        uwind=zero2 + 10.0, vwind=zero2))(t)
    oxy = t_new[2] - t[2] + t[2]              # incr added to t_new=t
    incr = t_new[2] - t[2]
    # interior: pure respiration sink of ResRate*dt
    np.testing.assert_allclose(np.asarray(incr[0]),
                               -10.0 * cfg.dt / 86400.0, rtol=1e-5)
    # surface: undersaturated (100 << ~225 sat) -> reaeration inflow
    assert float(incr[-1, 0, 0]) > float(incr[0, 0, 0])
    del oxy


def test_hypoxia_saturation_clamp():
    cfg = _mkcfg(1)
    p = HypoxiaParams(ResRate=0.0, surface_do_saturation=True)
    Hz, z_w, _ = _column()
    t = jnp.concatenate([_stack([20.0, 35.0]), _stack([100.0])])
    t_new = hypoxia_srm(cfg, p, _G(), t, t, Hz, z_w, None)
    sat = float(o2_saturation(jnp.array(20.0), jnp.array(35.0)))
    np.testing.assert_allclose(np.asarray(t_new[2][-1]), sat, rtol=1e-6)


def test_nemuro_nitrogen_and_silicon_conservation():
    cfg = _mkcfg(11)
    # no sinking: total N (all 9 N compartments) and total Si
    # (SiOH4 + opal + nothing else: PL holds N, Si only via RSiN
    # bookkeeping in SiOH/opal) must both be conserved by the
    # source/sink stages
    p = NemuroParams(setVPON=0.0, setVOpal=0.0, const_par=200.0)
    Hz, z_w, _ = _column()
    t = jnp.concatenate([
        _stack([15.0, 33.0]),
        _stack([0.2, 0.2, 0.05, 0.05, 0.02,    # PS PL ZS ZL ZP
                5.0, 0.5, 0.1, 0.2,            # NO3 NH4 PON DON
                10.0, 0.1])])                  # SiOH4 opal
    t_new = jax.jit(lambda t: nemuro(cfg, p, t, t, Hz, z_w, None))(t)
    incr = t_new - t
    # nitrogen: PS+PL+ZS+ZL+ZP+NO3+NH4+PON+DON
    dN = sum(float((incr[i] * Hz).sum()) for i in cfg.ibio[:9])
    scaleN = sum(float((t[i] * Hz).sum()) for i in cfg.ibio[:9])
    assert abs(dN) < 1e-9 * scaleN
    # silicon: the reference exchanges Si only between SiOH4, opal and
    # the PL uptake/release terms, which cancel except for net PL
    # growth; with GppPL Si drawdown matched by RSiN bookkeeping the
    # budget closes as SiOH4+opal+RSiN*(PL growth terms). Verify the
    # direct pair plus RSiN * PL change:
    dSi = (float((incr[cfg.ibio[9]] * Hz).sum()) +
           float((incr[cfg.ibio[10]] * Hz).sum()) +
           2.0 * float((incr[cfg.ibio[1]] * Hz).sum()))
    # PL: mortality moves N to PON (no Si), grazing moves N to ZL/ZP
    # with Si to opal - those legs carry RSiN Si with them, so the
    # simple closure above holds only for uptake/resp/exc legs; allow
    # a loose bound instead of exactness
    scaleSi = float((t[cfg.ibio[9]] * Hz).sum())
    assert abs(dSi) < 0.05 * scaleSi


def test_nemuro_daytime_bloom_no_grazing():
    cfg = _mkcfg(11)
    # grazing off isolates the production terms: PS must grow in light
    p = NemuroParams(setVPON=0.0, setVOpal=0.0, const_par=200.0,
                     GRmaxSps=0.0, GRmaxLps=0.0, GRmaxLpl=0.0,
                     GRmaxLzs=0.0, GRmaxPpl=0.0, GRmaxPzs=0.0,
                     GRmaxPzl=0.0)
    Hz, z_w, _ = _column()
    t = jnp.concatenate([
        _stack([15.0, 33.0]),
        _stack([0.2, 0.2, 0.05, 0.05, 0.02, 5.0, 0.5, 0.1, 0.2,
                10.0, 0.1])])
    t_new = nemuro(cfg, p, t, t, Hz, z_w, None)
    incr = t_new - t
    assert float(incr[cfg.ibio[0]][-1, 0, 0]) > 0.0   # PS bloom
    assert float(incr[cfg.ibio[5]][-1, 0, 0]) < 0.0   # NO3 drawdown


def test_nemuro_night_no_growth():
    cfg = _mkcfg(11)
    p = NemuroParams(setVPON=0.0, setVOpal=0.0)
    Hz, z_w, _ = _column()
    t = jnp.concatenate([
        _stack([15.0, 33.0]),
        _stack([0.2, 0.2, 0.05, 0.05, 0.02, 5.0, 0.5, 0.1, 0.2,
                10.0, 0.1])])
    srflx = jnp.zeros((3, 4))
    t_new = nemuro(cfg, p, t, t, Hz, z_w, srflx)
    # NO3 can only increase at night (nitrification), never be consumed
    assert float((t_new[cfg.ibio[5]] - t[cfg.ibio[5]]).min()) >= 0.0


def test_ppm_swim_upward_conserves_and_moves():
    N, Ny, Nx = 12, 3, 4
    Hz = jnp.full((N, Ny, Nx), 4.0)
    qc = jnp.zeros((N, Ny, Nx)).at[5].set(10.0)
    out = ppm_swim(qc, Hz, -2.0)       # swim up 2 m (CFL=0.5)
    # conservation: no flux through surface/bottom
    np.testing.assert_allclose(float((out * Hz).sum()),
                               float((qc * Hz).sum()), rtol=1e-12)
    # center of mass moved up
    z_c = jnp.arange(N)[:, None, None] * 4.0 + 2.0
    com0 = float((qc * Hz * z_c).sum() / (qc * Hz).sum())
    com1 = float((out * Hz * z_c).sum() / (out * Hz).sum())
    assert com1 > com0 + 1.0
    # downward motion mirrors
    out_dn = ppm_swim(qc, Hz, 2.0)
    com2 = float((out_dn * Hz * z_c).sum() / (out_dn * Hz).sum())
    assert com2 < com0 - 1.0


def test_red_tide_germination_growth_swim():
    cfg = _mkcfg(1, dt=3600.0)
    p = RedTideParams()
    Hz, z_w, z_r = _column(depth=30.0)
    t = jnp.concatenate([_stack([15.0, 31.0]), _stack([100.0])])
    srflx = jnp.full((3, 4), 300.0 / (1025.0 * 3985.0))  # ~300 W/m2
    cyst = jnp.full((3, 4), 1000.0)
    t_new = jax.jit(lambda t: red_tide(
        cfg, p, t, t, Hz, z_w, z_r, srflx, jnp.asarray(150.0),
        cyst_ini=cyst))(t)
    incr = t_new[2] - t[2]
    assert np.isfinite(np.asarray(incr)).all()
    # germination + surface growth make the column total grow
    assert float((incr * Hz).sum()) > 0.0
    # upward swimming + surface growth: surface cell gains most
    assert float(incr[-1, 0, 0]) > float(incr[5, 0, 0])


def test_red_tide_endo_scale_wraps():
    from roms_tpu.ops.bio_models import _endo_scale
    for yd in (0.0, 15.5, 100.0, 349.5, 360.0, 365.0):
        v = float(_endo_scale(jnp.asarray(yd)))
        assert 0.0 < v <= 1.0
    # May (mid-month 135.5) is the germination-potential peak
    assert float(_endo_scale(jnp.asarray(135.5))) == pytest.approx(1.0)


# =====================================================================
# EcoSim (reduced)
# =====================================================================

def _ecosim_setup(Lm=6, Mm=6, N=12, par=200.0):
    import jax.numpy as jnp
    from roms_tpu.models import upwelling
    from roms_tpu.ops.bio_models import EcosimParams
    from roms_tpu import vgrid
    from roms_tpu.grid import hc_of
    from roms_tpu.constants import rho0_default, Cp

    nbio = 20
    nt = 2 + nbio
    cfg = upwelling.make_config(Lm=Lm, Mm=Mm, N=N, dtype="float64")
    cfg = cfg.replace(ntracers=nt, biology="ecosim",
                      bio_params=EcosimParams(),
                      ibio=tuple(range(2, 2 + nbio)),
                      t_hadv=nt * ("U3",), t_vadv=nt * ("C4",),
                      tnu2=nt * (0.0,))
    cfg, grid, s, _ = upwelling.build(cfg)
    hc = hc_of(cfg)
    z_r, z_w, Hz = vgrid.set_depth(grid.h, s.zeta, hc, grid.sc_r,
                                   grid.Cs_r, grid.sc_w, grid.Cs_w,
                                   cfg.vtransform)
    t = jnp.zeros((nt,) + z_r.shape)
    t = t.at[0].set(15.0).at[1].set(35.0)
    vals = {0: 8.0, 1: 0.5, 2: 0.6, 3: 6.0, 4: 2100.0,   # nutrients+DIC
            5: 1.0, 6: 0.12, 7: 0.008, 8: 0.3,           # phy1 C,N,P,chl
            9: 1.0, 10: 0.15, 11: 0.01, 12: 0.16, 13: 0.5,
            14: 0.5, 15: 10.0, 16: 1.0, 17: 2.0,         # bac, DOM
            18: 0.5, 19: 0.06}                           # fecal
    for k, v in vals.items():
        t = t.at[2 + k].set(v)
    srflx = jnp.full_like(grid.h, par / (rho0_default * Cp))
    return cfg, grid, t, Hz, z_w, srflx


def test_ecosim_growth_and_budgets():
    """Lit, nutrient-replete water column: phytoplankton C grows, DIC
    drops, nutrients are consumed, and total N (NO3+NH4+PhyN+DON+BacN+
    FecN) is conserved up to the bacteria stoichiometric closure."""
    import numpy as np
    from roms_tpu.ops.bio_models import ecosim
    cfg, grid, t, Hz, z_w, srflx = _ecosim_setup()
    p = cfg.bio_params
    # isolate the autotrophic pathway: empty the heterotroph pools so
    # bacterial remineralization cannot mask uptake signals
    for k in (14, 15, 16, 18, 19):
        t = t.at[2 + k].set(1e-12)
    t1 = ecosim(cfg, p, t, t, Hz, z_w, srflx)
    H = cfg.halo
    sl = (slice(None), slice(H, H + cfg.Mm), slice(H, H + cfg.Lm))
    top = -1
    d = {k: np.asarray(t1[2 + k] - t[2 + k])[sl] for k in range(20)}
    Hzi = np.asarray(Hz)[sl]
    # growth: small group gains C at the surface; the diatom group
    # gains COLUMN-integrated C (its surface cells also lose mass to
    # sinking, which conserves the integral)
    assert d[5][top].mean() > 0.0
    assert (d[9] * Hzi).sum(axis=0).mean() > 0.0
    # photosynthetic DIC drawdown and nutrient consumption
    assert d[4][top].mean() < 0.0
    assert (d[0] + d[1])[top].mean() < 0.0
    # diatoms consumed silica
    assert d[3][top].mean() < 0.0
    # exudation fed the (colored) DOM pools
    assert (d[15] + d[17])[top].mean() > 0.0
    assert np.isfinite(np.asarray(t1)).all()


def test_ecosim_spectral_light_cdoc_shading():
    """The distinctive EcoSim mechanism: colored DOC absorbs blue light
    and reduces deep phytoplankton growth relative to clear water."""
    import numpy as np
    from roms_tpu.ops.bio_models import ecosim
    cfg, grid, t, Hz, z_w, srflx = _ecosim_setup(N=16)
    p = cfg.bio_params
    t_clear = t.at[2 + 17].set(0.0)          # no CDOC
    t_dark = t.at[2 + 17].set(60.0)          # strongly colored
    g_clear = ecosim(cfg, p, t_clear, t_clear, Hz, z_w, srflx)
    g_dark = ecosim(cfg, p, t_dark, t_dark, Hz, z_w, srflx)
    H = cfg.halo
    kmid = cfg.N // 2                        # mid-depth cell
    dC_clear = np.asarray(g_clear[2 + 5] - t_clear[2 + 5])[kmid, H + 2,
                                                           H + 2]
    dC_dark = np.asarray(g_dark[2 + 5] - t_dark[2 + 5])[kmid, H + 2,
                                                        H + 2]
    assert dC_clear > 2.0 * max(dC_dark, 0.0) or dC_dark <= 0.0


def test_ecosim_dark_bacteria_remineralize():
    """In the dark: no growth, bacteria consume DOM and produce NH4 and
    DIC; nitrification converts NH4 to NO3 (uninhibited without
    light)."""
    import numpy as np
    from roms_tpu.ops.bio_models import ecosim
    import jax.numpy as jnp
    cfg, grid, t, Hz, z_w, srflx = _ecosim_setup(par=0.0)
    p = cfg.bio_params
    # remove phytoplankton so dark Droop uptake does not mask the
    # bacterial/nitrification signals
    for k in (5, 6, 7, 8, 9, 10, 11, 12, 13):
        t = t.at[2 + k].set(1e-12)
    t1 = ecosim(cfg, p, t, t, Hz, z_w, srflx)
    H = cfg.halo
    sl = (slice(None), slice(H, H + cfg.Mm), slice(H, H + cfg.Lm))
    d = {k: np.asarray(t1[2 + k] - t[2 + k])[sl] for k in
         (0, 4, 5, 9, 15)}
    assert np.abs(d[5]).max() <= 1e-10                   # no growth
    assert d[15].mean() < 0.0                            # DOC consumed
    assert d[4].mean() > 0.0                             # respiration
    assert d[0].mean() > 0.0                             # nitrification


def test_ecosim_runs_in_full_step():
    """EcoSim inside the full stepping loop stays finite and positive."""
    import numpy as np
    import jax.numpy as jnp
    from roms_tpu.models import upwelling
    from roms_tpu.ops.bio_models import EcosimParams
    from roms_tpu import stepping
    nbio = 20
    nt = 2 + nbio
    cfg = upwelling.make_config(Lm=8, Mm=8, N=8, dtype="float64")
    cfg = cfg.replace(ntracers=nt, biology="ecosim",
                      bio_params=EcosimParams(),
                      ibio=tuple(range(2, 2 + nbio)),
                      t_hadv=nt * ("U3",), t_vadv=nt * ("C4",),
                      tnu2=nt * (0.0,), akt_bak=(1e-6, 1e-6))
    cfg, grid, s, ffn0 = upwelling.build(cfg)
    t = s.t
    t = t.at[2].set(8.0).at[3].set(0.5).at[4].set(0.6).at[5].set(6.0)
    t = t.at[6].set(2100.0).at[7].set(1.0).at[8].set(0.12)
    t = t.at[9].set(0.008).at[10].set(0.3).at[11].set(1.0)
    t = t.at[12].set(0.12).at[13].set(0.008).at[14].set(0.15)
    t = t.at[15].set(0.3).at[16].set(0.5).at[17].set(10.0)
    t = t.at[18].set(1.0).at[19].set(2.0).at[20].set(0.5)
    t = t.at[21].set(0.06)
    s = s.replace(t=t)
    from roms_tpu.constants import rho0_default, Cp
    one = jnp.ones_like(grid.h)
    def ffn(cfg_, grid_, time):
        base = dict(ffn0(cfg_, grid_, time) or {}) if ffn0 else {}
        base["srflx"] = 150.0 / (rho0_default * Cp) * one
        return base
    for _ in range(5):
        s = stepping.step(cfg, grid, s, ffn)
    assert np.isfinite(np.asarray(s.t)).all()
    H = cfg.halo
    assert np.asarray(s.t[7])[:, H:-H, H:-H].min() > 0.0   # PhyC1 alive
