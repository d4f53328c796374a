"""Vertical s-coordinate tables and depths (vs set_scoord.F / set_depth.F)."""

import numpy as np
import jax.numpy as jnp

from roms_tpu import vgrid
import pytest

pytestmark = pytest.mark.smoke


def test_scoord_vstretching4_endpoints():
    for vs in (1, 2, 3, 4, 5):
        sc_r, Cs_r, sc_w, Cs_w = vgrid.scoord(vs, 3.0, 0.5, 16)
        assert sc_w[0] == -1.0 and Cs_w[0] == -1.0
        # Vstretching=1 computes the surface value by formula (ROMS does
        # the same), so allow round-off there
        assert sc_w[-1] == 0.0 and abs(Cs_w[-1]) < 1e-15
        assert np.all(np.diff(Cs_w) > 0), f"Cs_w not monotone for Vs={vs}"
        assert np.all((Cs_r > -1) & (Cs_r < 0))


def test_scoord_surface_refinement():
    # theta_s>0 must refine the surface: top Hz < uniform spacing
    sc_r, Cs_r, sc_w, Cs_w = vgrid.scoord(4, 5.0, 0.0, 20)
    dCs = np.diff(Cs_w)
    assert dCs[-1] < 1.0 / 20 < dCs[0]


def test_set_depth_vtransform2():
    N = 16
    sc_r, Cs_r, sc_w, Cs_w = vgrid.scoord(4, 3.0, 0.0, N)
    h = jnp.full((4, 5), 150.0)
    zeta = jnp.zeros((4, 5))
    hc = 25.0
    z_r, z_w, Hz = vgrid.set_depth(h, zeta, hc, sc_r, Cs_r, sc_w, Cs_w, 2)
    assert z_w.shape == (N + 1, 4, 5)
    np.testing.assert_allclose(z_w[0], -150.0)
    np.testing.assert_allclose(z_w[-1], 0.0, atol=1e-12)
    np.testing.assert_allclose(Hz.sum(0), 150.0, rtol=1e-12)
    # rho depths interleave w depths
    assert np.all(np.asarray(z_r) > np.asarray(z_w[:-1]))
    assert np.all(np.asarray(z_r) < np.asarray(z_w[1:]))


def test_set_depth_free_surface_consistency():
    # total thickness must equal h + zeta for both transforms
    N = 10
    for vt in (1, 2):
        sc_r, Cs_r, sc_w, Cs_w = vgrid.scoord(1, 3.0, 0.0, N)
        h = jnp.full((3, 3), 100.0)
        zeta = jnp.full((3, 3), 0.7)
        hc = vgrid.compute_hc(vt, 25.0, 100.0)
        z_r, z_w, Hz = vgrid.set_depth(h, zeta, hc, sc_r, Cs_r, sc_w, Cs_w,
                                       vt)
        np.testing.assert_allclose(Hz.sum(0), 100.7, rtol=1e-12)
        np.testing.assert_allclose(z_w[-1], 0.7, rtol=1e-12)
