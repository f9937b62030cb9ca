"""Pin the measured bounds of the two documented numeric deviations
(docs/PARITY.md "Measured deviation bounds"; full sweep in
scripts/measure_deviations.py).  If a refactor widens either deviation past
the documented envelope, these fail."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from measure_deviations import measure_grouped_interp, measure_loess  # noqa: E402


class TestGroupedInterpVsGriddata:
    def test_monthly_smooth_tables(self):
        r = measure_grouped_interp(12, 20, seeds=[0], n_pts=6000, roughness=0.0)
        assert r["max"] < 0.25          # documented: 1.0e-1 (+margin)
        assert r["median"] < 5e-3       # documented: 5.1e-4
        assert r["edge_max"] < 1.0      # documented: 5.1e-1

    def test_monthly_rough_tables(self):
        r = measure_grouped_interp(12, 20, seeds=[0], n_pts=6000, roughness=1.0)
        assert r["max"] < 0.4           # documented: 1.5e-1 (+margin)
        assert r["median"] < 2e-2


class TestLoessNanDeviation:
    def test_nan_free_is_reference_exact(self):
        r = measure_loess(n=600, f=0.3)
        assert r["nan_free"]["max"] < 1e-10

    def test_scattered_nan_bound(self):
        r = measure_loess(n=600, f=0.3)
        assert r["scattered_10pct"]["max_over_sigma"] < 0.25   # documented: 0.12
        assert r["scattered_30pct"]["max_over_sigma"] < 0.5    # documented: 0.26


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
