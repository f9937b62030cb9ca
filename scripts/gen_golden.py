"""Generate the frozen golden-vector pack (tests/golden/golden.npz).

Each case pins a semantic corner the SURVEY flags as hard, with expected
outputs derived *independently* of the library: numpy/scipy where a public
oracle exists (np.nanquantile for type-7, scipy.interp1d / scipy.griddata
mirroring reference utils.py:317-513), and a from-the-equations numpy
re-derivation for adapt_freq (reference _processing.py:74-135).

Run once and commit the npz; tests/test_golden.py compares the library
against the frozen file forever after.
"""

from __future__ import annotations

import os
import warnings

import numpy as np
from scipy.interpolate import griddata, interp1d

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "golden.npz")

rng = np.random.default_rng(20260816)
pack: dict[str, np.ndarray] = {}

# ---------------------------------------------------------------------------
# A. type-7 nan-quantile edges (oracle: np.nanquantile, method='linear')
# ---------------------------------------------------------------------------
x = np.full((6, 20), np.nan)
x[0] = rng.normal(0, 1, 20)
x[0, [3, 7, 11]] = np.nan            # interior NaNs
# x[1] stays all-NaN
x[2, 0] = 1.25                        # single valid value
x[3, [4, 9]] = [2.0, -1.0]            # two valid values
x[4] = 3.5                            # all ties
x[5] = np.sort(rng.normal(0, 2, 20))  # clean sorted row
q = np.array([0.0, 0.1, 0.25, 0.5, 0.739, 0.9, 1.0])
with warnings.catch_warnings():
    warnings.simplefilter("ignore", RuntimeWarning)
    want = np.stack([np.nanquantile(row, q) for row in x])
pack["q7_x"] = x
pack["q7_q"] = q
pack["q7_want"] = want

# ---------------------------------------------------------------------------
# B. 1-D table interp with NaN compaction + constant/nan extrapolation
#    (oracle: scipy.interp1d with the reference's exact fill rules,
#    utils.py:350-377)
# ---------------------------------------------------------------------------
xq = np.array([np.nan, -2.0, -0.5, 0.1, 1.3, 2.2, np.nan, np.nan])
yq = np.array([np.nan, 10.0, 11.0, 11.5, 13.0, 20.0, np.nan, np.nan])
newx = np.array([-3.0, -2.0, -1.1, 0.0, 0.1, 1.0, 2.2, 5.0, np.nan])


def _ref_1d(newx, oldx, oldy, method, extrap):
    mask_new = np.isnan(newx)
    mask_old = np.isnan(oldy) | np.isnan(oldx)
    out = np.full_like(newx, np.nan, dtype=np.float64)
    if extrap == "constant":
        fill = (oldy[~np.isnan(oldy)][0], oldy[~np.isnan(oldy)][-1])
    else:
        fill = np.nan
    out[~mask_new] = interp1d(
        oldx[~mask_old], oldy[~mask_old], kind=method, bounds_error=False, fill_value=fill
    )(newx[~mask_new])
    return out


pack["i1_xq"] = xq
pack["i1_yq"] = yq
pack["i1_newx"] = newx
for method in ("linear", "nearest"):
    for extrap in ("constant", "nan"):
        pack[f"i1_want_{method}_{extrap}"] = _ref_1d(newx, xq, yq, method, extrap)

# ---------------------------------------------------------------------------
# C. grouped (2-D) interp vs scipy.griddata on iso-lines
#    (oracle: the reference's _interp_on_quantiles_2d, utils.py:380-400,
#    including add_cyclic_bounds group padding, utils.py:284-314)
#
# Points are chosen on segments connecting vertically-adjacent table nodes
# ((xq[g0,k],pos0)->(xq[g1,k],pos1)), where triangulated linear interpolation
# and the library's separable blend provably coincide; the generator
# *verifies* the coincidence before freezing.
# ---------------------------------------------------------------------------
G, NQ = 12, 7
pos = np.arange(1, G + 1, dtype=np.float64)                     # month coord
base = np.sort(rng.normal(0, 1, NQ)) * 2.0
xq2 = base[None, :] + 0.3 * np.sin(2 * np.pi * pos / 12)[:, None]
yq2 = xq2 * 1.5 + 2.0 + 0.5 * np.cos(2 * np.pi * pos / 12)[:, None]

# month fractional indexes for a standard-calendar daily year
# (reference base.py:293-310: month - 0.5 + day/days_in_month), derived
# here straight from datetime
import datetime as dt

t0 = dt.date(2001, 1, 1)
days = [t0 + dt.timedelta(days=i) for i in range(365)]
dim = np.array([(dt.date(d.year + (d.month == 12), d.month % 12 + 1, 1) - dt.date(d.year, d.month, 1)).days for d in days])
frac = np.array([d.month - 0.5 + d.day / m for d, m in zip(days, dim)])
pack["g2_frac"] = frac
pack["g2_xq"] = xq2
pack["g2_yq"] = yq2
pack["g2_pos"] = pos

# cyclic padding as the reference's add_cyclic_bounds
pos_p = np.concatenate([[pos[0] - 1], pos, [pos[-1] + 1]])
xq_p = np.concatenate([xq2[-1:], xq2, xq2[:1]], axis=0)
yq_p = np.concatenate([yq2[-1:], yq2, yq2[:1]], axis=0)

g1 = np.clip(np.searchsorted(pos_p, frac, side="right"), 1, len(pos_p) - 1)
g0 = g1 - 1
w = (frac - pos_p[g0]) / (pos_p[g1] - pos_p[g0])

# iso-line values for three quantile levels
ks = np.array([1, 3, 5])
newx2 = np.stack([(1 - w) * xq_p[g0, k] + w * xq_p[g1, k] for k in ks])  # [3, T]
newg2 = np.broadcast_to(frac, newx2.shape)

oldx_f = np.repeat(xq_p, 1, axis=0).ravel()
oldg_f = np.repeat(pos_p, NQ)
oldy_f = yq_p.ravel()
got2 = griddata((oldx_f, oldg_f), oldy_f, (newx2.ravel(), newg2.ravel()), method="linear").reshape(newx2.shape)

sep2 = np.stack([(1 - w) * yq_p[g0, k] + w * yq_p[g1, k] for k in ks])
bad = ~np.isclose(got2, sep2, rtol=1e-10, atol=1e-12)
if bad.any():
    raise SystemExit(
        f"griddata and separable blend differ on {bad.sum()} iso-line points — "
        "adjust the table so the segments are triangulation edges"
    )
pack["g2_newx"] = newx2
pack["g2_want"] = got2

# ---------------------------------------------------------------------------
# D. adapt_freq with ties (oracle: numpy re-derivation of reference
#    _processing.py:74-135; deterministic invariants only — the tie-broken
#    rank assignment is random, the *set* of outcomes is not)
# ---------------------------------------------------------------------------
n = 40
ref_af = np.concatenate([np.zeros(4), rng.gamma(2.0, 2.0, n - 4)])
sim_af = np.concatenate([np.zeros(16), rng.gamma(2.0, 1.5, n - 16)])  # 16 tied dry days
rng.shuffle(ref_af)
rng.shuffle(sim_af)
thresh = 0.1

P0_ref = np.mean(ref_af <= thresh)   # prob of dry in ref
P0_sim = np.mean(sim_af <= thresh)
P0_hist = P0_sim
dP0 = (P0_hist - P0_ref) / P0_hist
pth = np.nanquantile(ref_af, P0_hist)  # type-7, as nbu.vecquantiles

# count of adapted values: the reference min-max-rescales pct ranks
# (utils.py:631-634: mx*(rnk-mn)/(mx-mn)), so after random tiebreak the rank
# values are (k-1)/(n-1), k=1..n; adapted iff (ratio*P0_sim) <= rnk <= P0_sim
rnk_all = np.arange(n) / (n - 1)
ratio = P0_ref / P0_hist
n_adapted = int(np.sum((rnk_all >= ratio * P0_sim) & (rnk_all <= P0_sim)))

pack["af_ref"] = ref_af
pack["af_sim"] = sim_af
pack["af_thresh"] = np.array(thresh)
pack["af_P0_ref"] = np.array(P0_ref)
pack["af_P0_hist"] = np.array(P0_hist)
pack["af_dP0"] = np.array(dP0)
pack["af_pth"] = np.array(pth)
pack["af_n_adapted"] = np.array(n_adapted)

# ---------------------------------------------------------------------------
# E. doy-calendar interpolation 365 -> 360 and 360 -> 366
#    (oracle: np.interp on normalized doy positions, the reference's
#    interpolate_doy_calendar / _interpolate_doy_calendar semantics)
# ---------------------------------------------------------------------------
src365 = rng.normal(0, 1, 365).cumsum() / 10
for tgt in (360, 366):
    old = np.linspace(1, tgt, 365)
    new = np.arange(1, tgt + 1, dtype=np.float64)
    pack[f"doy_want_{tgt}"] = np.interp(new, old, src365)
pack["doy_src365"] = src365

os.makedirs(os.path.dirname(OUT), exist_ok=True)
np.savez_compressed(OUT, **pack)
print(f"wrote {OUT} with {len(pack)} arrays")
