"""Power-law fast-time filter weights (vs set_weights.F invariants).

The reference prints "Centers of gravity and integrals (values must be
1, 1, approx 1/2, 1, 1)" at startup (set_weights.F:236-241): primary
centroid 1, primary second moment 1, secondary centroid ~1/2, both sums 1.
"""

import numpy as np

from roms_tpu.grid import build_weights
import pytest

pytestmark = pytest.mark.smoke


def moments(ndtfast):
    w1, w2, nfast = build_weights(ndtfast)
    i = np.arange(1, len(w1) + 1)
    return dict(
        nfast=nfast,
        sum1=w1.sum(), sum2=w2.sum(),
        c1=(w1 * i).sum() / ndtfast,
        m2=(w1 * i * i).sum() / ndtfast ** 2,
        c2=(w2 * (i - 0.5)).sum() / ndtfast,
    )


def test_weights_ndtfast30():
    m = moments(30)
    assert abs(m["sum1"] - 1.0) < 1e-14
    assert abs(m["sum2"] - 1.0) < 1e-14
    assert abs(m["c1"] - 1.0) < 1e-13
    # second-order accuracy requires m2 >= 1 (warning threshold 1.0001)
    assert m["m2"] > 1.0001
    assert abs(m["c2"] - 0.5) < 0.05
    # power-law span: nfast ~ 1.41 * ndtfast, always < 2*ndtfast
    assert 30 < m["nfast"] < 60


def test_weights_various_ndtfast():
    for nd in (10, 20, 45, 60):
        m = moments(nd)
        assert abs(m["sum1"] - 1.0) < 1e-13
        assert abs(m["c1"] - 1.0) < 1e-12
        assert nd < m["nfast"] <= 2 * nd
