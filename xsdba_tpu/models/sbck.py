"""SBCK wrapper gateway (reference ``adjustment.py:1976-2076``).

The reference auto-generates one ``Adjust`` class per SBCK (Eigen/C++)
bias-correction class with a fit/predict interface.  SBCK is an optional
PyPI dependency there and is not available here; the same auto-generation
machinery is provided, activating when an SBCK-compatible module is
importable and raising a clear error otherwise.  The core SBCK algorithms
(OTC, dOTC, QM...) have native equivalents in this package.
"""

from __future__ import annotations

import numpy as np

from ..utils.container import DataArray
from .base import Adjust

__all__ = ["generate_sbck_classes"]


def _wrap_sbck_class(sbck_cls) -> type:
    """Build an Adjust subclass around an SBCK fit/predict class
    (reference adjustment.py:1984-2052)."""

    class _SBCKAdjust(Adjust):
        sbck = sbck_cls

        @classmethod
        def _adjust(cls, ref: DataArray, hist: DataArray, sim: DataArray, *, multi_dim=None, **kwargs):
            def _apply(r, h, s):
                obj = cls.sbck(**kwargs)
                obj.fit(Y0=r, X0=h, X1=s)
                return np.asarray(obj.predict(X1=s))

            simc = sim.move_dim_last("time")
            if multi_dim is not None:
                # SBCK expects [time, variables]: ONE joint fit over multi_dim
                def _tv(da):
                    dac = da.move_dim_last("time")
                    ax = dac.dims.index(multi_dim)
                    return np.moveaxis(np.asarray(dac.data), ax, -1)

                out = _apply(_tv(ref), _tv(hist), _tv(sim))          # [time, vars]
                out = np.moveaxis(out, -1, simc.dims.index(multi_dim))
                return DataArray(out, simc.dims, dict(simc.coords), dict(sim.attrs), "scen")

            # without multi_dim, every extra dim is a separate univariate fit
            # (the reference's apply_ufunc(vectorize=True) over non-core dims)
            r = np.asarray(ref.move_dim_last("time").data)
            h = np.asarray(hist.move_dim_last("time").data)
            s = np.asarray(simc.data)
            lead = s.shape[:-1]
            rf, hf, sf = (a.reshape(-1, a.shape[-1]) for a in (r, h, s))
            rows = [
                _apply(rf[i][:, None], hf[i][:, None], sf[i][:, None]).reshape(-1)
                for i in range(sf.shape[0])
            ]
            out = np.stack(rows).reshape(lead + (s.shape[-1],))
            return DataArray(out, simc.dims, dict(simc.coords), dict(sim.attrs), "scen")

    return _SBCKAdjust


def generate_sbck_classes() -> list[tuple[str, type]]:
    """Discover SBCK classes with a fit/predict interface and wrap them
    (reference ``__init__.py:45-47`` activation)."""
    try:
        import SBCK  # noqa: N811
    except ImportError as err:
        raise ImportError(
            "The optional dependency SBCK is not installed in this environment. "
            "Native equivalents of its main methods are available: OTC, dOTC, "
            "EmpiricalQuantileMapping, QuantileDeltaMapping..."
        ) from err
    out = []
    for name in dir(SBCK):
        obj = getattr(SBCK, name)
        if isinstance(obj, type) and hasattr(obj, "fit") and hasattr(obj, "predict"):
            cls = _wrap_sbck_class(obj)
            cls.__name__ = f"SBCK_{name}"
            out.append((cls.__name__, cls))
    return out
