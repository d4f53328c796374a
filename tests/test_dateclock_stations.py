"""dateclock calendar utilities, grid stiffness numbers, and station
time-series output."""

import numpy as np
import jax.numpy as jnp

from roms_tpu.utils import dateclock as dc


def test_datenum_roundtrip_standard():
    for (y, m, d, h) in [(2001, 1, 1, 0), (1968, 5, 23, 12),
                         (2020, 2, 29, 6), (1900, 3, 1, 23)]:
        dn = dc.datenum(y, m, d, hour=h)
        cd = dc.caldate(dn)
        assert (cd.year, cd.month, cd.day, cd.hour) == (y, m, d, h)


def test_datenum_known_values():
    # dateclock.F documents datenum(-4713,11,24)=0 (Gregorian origin)
    assert dc.datenum(-4713, 11, 24) == 0.0
    # one Julian period later: 2000-01-01 is JDN 2451545 at noon ->
    # day number 2451545 - 0.5 at midnight... our datenum counts whole
    # days from the origin: 2000-01-01 00:00 = 2451545 - 0 (midnight
    # JDN convention of Fliegel-Van Flandern integer algebra)
    assert dc.datenum(2000, 1, 1) == 2451545.0
    assert dc.is_leap(2000) and not dc.is_leap(1900)
    assert dc.is_leap(2024) and not dc.is_leap(2023)


def test_caldate_360day_and_yearday():
    dn = dc.datenum(3, 2, 16, calendar="360_day")
    assert dn == 3 * 360 + 30 + 15
    cd = dc.caldate(dn, calendar="360_day")
    assert (cd.year, cd.month, cd.day) == (3, 2, 16)
    assert cd.yday == 46
    # standard-year day: Feb 1 -> 32
    cd2 = dc.caldate(dc.datenum(2001, 2, 1))
    assert cd2.yday == 32
    assert 32.0 <= dc.yearday(dc.datenum(2001, 2, 1, hour=12)) < 33.0


def test_time_string_format():
    s = dc.time_string(dc.datenum(2001, 12, 31, 23, 59, 30.0))
    assert s == "2001-12-31 23:59:30.00"
    assert dc.time_units(dc.datenum(2001, 1, 1)).startswith(
        "seconds since 2001-01-01")


def test_dstart_convention():
    dn = dc.dstart_to_datenum(20010115.5)
    cd = dc.caldate(dn)
    assert (cd.year, cd.month, cd.day, cd.hour) == (2001, 1, 15, 12)


def test_stiffness_flat_and_sloped():
    from roms_tpu.utils.diag import stiffness
    from roms_tpu.config import Config, LBC
    from roms_tpu.grid import build_grid
    cfg = Config(name="stiff", Lm=12, Mm=10, N=6, ntracers=2,
                 dt=60.0, ndtfast=10, vtransform=2, vstretching=4,
                 theta_s=3.0, theta_b=0.0, tcline=50.0,
                 dtype="float64")
    gflat, cflat = build_grid(cfg, 12e3, 10e3, 0.0, 0.0,
                              lambda x, y, i, j, c: 100.0 + 0 * x)
    rx0, rx1 = stiffness(cflat, gflat)
    assert float(rx0) == 0.0 and float(rx1) < 1e-12
    gs, cs = build_grid(cfg, 12e3, 10e3, 0.0, 0.0,
                        lambda x, y, i, j, c: 50.0 + 100.0 * x / 12e3)
    rx0s, rx1s = stiffness(cs, gs)
    assert float(rx0s) > 0.01
    assert float(rx1s) > float(rx0s)   # Haney number >= slope number


def test_station_writer_roundtrip(tmp_path):
    from roms_tpu.io.stations import StationWriter, read_stations
    from roms_tpu.models import upwelling
    cfg, grid, st, ffn = upwelling.build()
    path = str(tmp_path / "sta.nc")
    w = StationWriter(path, cfg, stations=[(5, 7), (20, 40), (41, 80)])
    w.write(st)
    st2 = st.replace(time=st.time + cfg.dt,
                     zeta=st.zeta + 0.01)
    w.write(st2)
    w.close()
    out = read_stations(path)
    assert out["zeta"].shape == (2, 3)
    assert out["temp"].shape == (2, cfg.N, 3)
    np.testing.assert_allclose(out["zeta"][1] - out["zeta"][0], 0.01,
                               rtol=1e-10)
    # gather hits the right interior point
    H = cfg.halo
    np.testing.assert_allclose(
        out["temp"][0, :, 0], np.asarray(st.t[0][:, H + 6, H + 4]),
        rtol=1e-12)
