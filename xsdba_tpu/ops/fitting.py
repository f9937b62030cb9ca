"""Distribution fitting.

Two tiers (mirroring the reference's split between hot-path and diagnostics):

- :func:`gpd_fit_ml` — batched, jittable Generalized Pareto ML fit via the
  1-D profile likelihood (Grimshaw reduction): the 2-D (shape, scale) MLE
  collapses to maximizing ``l(θ) = −n[log(ξ(θ)/θ) + ξ(θ) + 1]`` with
  ``ξ(θ) = mean(log(1+θx))`` — a grid + golden-section scan, NaN-aware,
  vectorized over batch.  This replaces scipy ``genpareto.fit`` in
  ExtremeValues' hot path (reference ``_adjustment.py:1060-1110``).
- :func:`fit_scipy` — host-side scipy dispatch (ML/MM/PWM/APP) with the
  reference's smart initial guesses (``utils.py:1164-1296``) for the
  diagnostics layer, where exotic distributions are fit once per series.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fit_scipy",
    "gev_fit_ml",
    "gev_fit_mm",
    "gev_fit_pwm",
    "gev_ppf",
    "gpd_cdf",
    "gpd_fit_ml",
    "gpd_ppf",
    "linregress_field",
]


def gpd_cdf(x, c, loc, scale):
    """Generalized Pareto CDF (scipy parametrization: shape c)."""
    z = (x - loc) / scale
    z = jnp.clip(z, 0, None)
    safe_c = jnp.where(c == 0, 1.0, c)
    body = 1 - (1 + safe_c * z) ** (-1 / safe_c)
    expo = 1 - jnp.exp(-z)
    out = jnp.where(c == 0, expo, body)
    # c < 0 support bound: z <= -1/c
    out = jnp.where((c < 0) & (z >= -1 / safe_c), 1.0, out)
    return out


def gpd_ppf(q, c, loc, scale):
    safe_c = jnp.where(c == 0, 1.0, c)
    body = ((1 - q) ** (-safe_c) - 1) / safe_c
    expo = -jnp.log1p(-q)
    z = jnp.where(c == 0, expo, body)
    return loc + scale * z


@partial(jax.jit, static_argnames=("n_grid", "n_iter"))
def gpd_fit_ml(x, *, n_grid: int = 120, n_iter: int = 40):
    """Batched GPD ML fit of x [..., N] (NaN padded, values > 0, loc = 0).

    Returns (c, scale).  Profile reduction: θ = c/σ; ξ(θ) = nanmean(log1p(θx));
    maximize l(θ) = −n[log(ξ/θ) + ξ + 1] over θ in (−1/max(x), inf), θ != 0, by grid
    search + golden-section refinement (all static shapes).
    """
    x = jnp.asarray(x)
    valid = ~jnp.isnan(x) & (x > 0)
    n = jnp.sum(valid, axis=-1)
    xmax = jnp.nanmax(jnp.where(valid, x, -jnp.inf), axis=-1)
    xmean = jnp.nanmean(jnp.where(valid, x, jnp.nan), axis=-1)

    def neg_prof(theta):
        # theta: [...]; returns profile negative log-likelihood per batch elem
        lx = jnp.log1p(theta[..., None] * jnp.where(valid, x, 0.0))
        xi = jnp.sum(jnp.where(valid, lx, 0.0), axis=-1) / jnp.maximum(n, 1)
        # need sigma = xi/theta > 0 (xi and theta share sign)
        sigma = xi / theta
        bad = (sigma <= 0) | ~jnp.isfinite(xi)
        sigma_s = jnp.where(bad, 1.0, sigma)
        ll = -(jnp.log(sigma_s) + xi + 1)
        return jnp.where(bad, jnp.inf, jnp.where(jnp.isfinite(ll), -ll, jnp.inf))

    # grid over theta: negative side (-0.999/xmax, 0) and positive side
    eps = 1e-8
    tneg = -jnp.linspace(0.999, eps, n_grid // 2) / jnp.maximum(xmax, eps)[..., None]   # [..., g1]
    tpos = jnp.logspace(-6, 3, n_grid - n_grid // 2) / jnp.maximum(xmean, eps)[..., None]
    grid = jnp.concatenate([tneg, tpos], axis=-1)  # [..., G]

    nll = jax.vmap(neg_prof, in_axes=-1, out_axes=-1)(grid)  # [..., G]
    best = jnp.argmin(nll, axis=-1)
    G = grid.shape[-1]
    lo_i = jnp.clip(best - 1, 0, G - 1)
    hi_i = jnp.clip(best + 1, 0, G - 1)
    a = jnp.take_along_axis(grid, lo_i[..., None], axis=-1)[..., 0]
    b = jnp.take_along_axis(grid, hi_i[..., None], axis=-1)[..., 0]

    gr = (np.sqrt(5) - 1) / 2

    def body(i, ab):
        a, b = ab
        c1 = b - gr * (b - a)
        c2 = a + gr * (b - a)
        f1 = neg_prof(c1)
        f2 = neg_prof(c2)
        a = jnp.where(f1 < f2, a, c1)
        b = jnp.where(f1 < f2, c2, b)
        return (a, b)

    a, b = jax.lax.fori_loop(0, n_iter, body, (a, b))
    theta = (a + b) / 2

    lx = jnp.log1p(theta[..., None] * jnp.where(valid, x, 0.0))
    xi = jnp.sum(jnp.where(valid, lx, 0.0), axis=-1) / jnp.maximum(n, 1)
    scale = xi / theta
    # degenerate cases: no valid data
    empty = n == 0
    c = jnp.where(empty, jnp.nan, xi)
    scale = jnp.where(empty, jnp.nan, scale)
    return c, scale


# ---------------------------------------------------------------------------
# batched GEV (diagnostics hot path: return_value over many sites)
# ---------------------------------------------------------------------------

_EULER = 0.5772156649015329


def gev_ppf(q, c, loc, scale):
    """GEV quantile function (scipy ``genextreme`` parametrization)."""
    y = -jnp.log(jnp.asarray(q, dtype=jnp.result_type(float)))
    small = jnp.abs(c) < 1e-12
    safe_c = jnp.where(small, 1.0, c)
    z = jnp.where(small, -jnp.log(y), (1.0 - y**safe_c) / safe_c)
    return loc + scale * z


@jax.jit
def gev_fit_pwm(x):
    """Batched probability-weighted-moment GEV fit of x [..., N] (NaN-aware).

    Hosking et al. (1985) L-moment estimators — the closed-form analogue of
    the reference's ``lmoments3`` PWM path (``utils.py:1164-1193``).  Returns
    (c, loc, scale) in scipy's ``genextreme`` convention.
    """
    x = jnp.asarray(x)
    xs = jnp.sort(x, axis=-1)  # NaNs sort to the end
    N = x.shape[-1]
    valid = ~jnp.isnan(xs)
    nf = jnp.sum(valid, axis=-1).astype(xs.dtype)
    j = jnp.arange(1, N + 1, dtype=xs.dtype)
    v = jnp.where(valid, xs, 0.0)
    d1 = jnp.maximum(nf - 1, 1.0)[..., None]
    d2 = jnp.maximum((nf - 1) * (nf - 2), 1.0)[..., None]
    nfs = jnp.maximum(nf, 1.0)
    b0 = jnp.sum(v, -1) / nfs
    b1 = jnp.sum(v * (j - 1) / d1, -1) / nfs
    b2 = jnp.sum(v * (j - 1) * (j - 2) / d2, -1) / nfs
    l1, l2, l3 = b0, 2 * b1 - b0, 6 * b2 - 6 * b1 + b0
    t3 = l3 / jnp.where(l2 == 0, 1.0, l2)
    z = 2.0 / (3.0 + t3) - jnp.log(2.0) / jnp.log(3.0)
    k = 7.8590 * z + 2.9554 * z * z
    small = jnp.abs(k) < 1e-8
    ks = jnp.where(small, 1.0, k)
    gam = jnp.exp(jax.scipy.special.gammaln(1.0 + ks))
    scale = jnp.where(small, l2 / jnp.log(2.0), l2 * ks / ((1.0 - 2.0 ** (-ks)) * gam))
    loc = jnp.where(small, l1 - _EULER * scale, l1 - scale * (1.0 - gam) / ks)
    # a GEV has 3 parameters: with < 3 valid samples the L-moment ratios are
    # degenerate and the formulas fabricate parameters — return NaN instead
    bad = nf < 3
    return (
        jnp.where(bad, jnp.nan, k),
        jnp.where(bad, jnp.nan, loc),
        jnp.where(bad, jnp.nan, scale),
    )


def _gev_nll(params, x, valid):
    """Masked GEV negative log-likelihood at params (c, loc, log scale),
    with a smooth quadratic barrier outside the support."""
    c, mu, logs = params[0], params[1], params[2]
    # zero out invalid entries BEFORE any math: NaNs reached through the
    # masked branch of a `where` still poison reverse-mode gradients
    x = jnp.where(valid, x, mu)
    s = (x - mu) * jnp.exp(-logs)
    w = 1.0 - c * s
    wmin = 1e-8
    logw = jnp.log(jnp.maximum(w, wmin))
    smallc = jnp.abs(c) < 1e-9
    invc = 1.0 / jnp.where(smallc, 1.0, c)
    general = logs - (invc - 1.0) * logw + jnp.exp(invc * logw)
    gumbel = logs + s + jnp.exp(-s)
    pt = jnp.where(smallc, gumbel, general) + 1e6 * jnp.maximum(wmin - w, 0.0) ** 2
    total = jnp.sum(jnp.where(valid, pt, 0.0))
    return jnp.where(jnp.isfinite(total), total, jnp.inf)


@partial(jax.jit, static_argnames=("n_iter",))
def gev_fit_ml(x, *, n_iter: int = 40):
    """Batched maximum-likelihood GEV fit of x [..., N] (NaN padded).

    Damped-Newton on (c, loc, log scale) from the PWM start, with a fixed
    backtracking set per step — the vectorized counterpart of scipy
    ``genextreme.fit`` used by the reference's ``return_value``
    (``properties.py:1258-1307``).  Returns (c, loc, scale).
    """
    x = jnp.asarray(x)
    batch = x.shape[:-1]
    N = x.shape[-1]
    xf = x.reshape((-1, N))
    validf = ~jnp.isnan(xf)
    c0, loc0, scale0 = gev_fit_pwm(xf)
    c0 = jnp.clip(jnp.nan_to_num(c0, nan=0.1), -0.9, 0.9)
    loc0 = jnp.nan_to_num(loc0, nan=0.0)
    scale0 = jnp.nan_to_num(scale0, nan=1.0)
    p0 = jnp.stack([c0, loc0, jnp.log(jnp.maximum(scale0, 1e-12))], axis=-1)

    alphas = jnp.concatenate([2.0 ** -jnp.arange(8.0), jnp.zeros((1,))])

    def fit_one(p, xr, vr):
        def nll(q):
            return _gev_nll(q, xr, vr)

        def step(_, p):
            g = jax.grad(nll)(p)
            H = jax.hessian(nll)(p)
            lam = 1e-6 * jnp.maximum(1.0, jnp.max(jnp.abs(jnp.diagonal(H))))
            d = jnp.linalg.solve(H + lam * jnp.eye(3, dtype=p.dtype), g)
            gnorm = jnp.maximum(jnp.linalg.norm(g), 1e-30)
            d = jnp.where(jnp.all(jnp.isfinite(d)), d, g / gnorm)
            cand = p[None, :] - alphas[:, None] * d[None, :]
            vals = jax.vmap(nll)(cand)
            return cand[jnp.argmin(vals)]

        return jax.lax.fori_loop(0, n_iter, step, p)

    pf = jax.vmap(fit_one)(p0, xf, validf)
    n = jnp.sum(validf, axis=-1)
    bad = n < 3  # 3-parameter fit: fewer valid samples than parameters
    c = jnp.where(bad, jnp.nan, pf[:, 0]).reshape(batch)
    loc = jnp.where(bad, jnp.nan, pf[:, 1]).reshape(batch)
    scale = jnp.where(bad, jnp.nan, jnp.exp(pf[:, 2])).reshape(batch)
    return c, loc, scale


def _gev_skew(c):
    """Skewness of a GEV with scipy shape ``c`` (vectorized, c > -1/3);
    evaluated away from the 0/0 point at c = 0 by a tiny nudge."""
    c = jnp.where(jnp.abs(c) < 1e-6, 1e-6, c)
    lg = jax.scipy.special.gammaln
    g1 = jnp.exp(lg(1.0 + c))
    g2 = jnp.exp(lg(1.0 + 2.0 * c))
    g3 = jnp.exp(lg(1.0 + 3.0 * c))
    a = (1.0 - g1) / c
    var = (g2 - g1 * g1) / (c * c)
    ez3 = (1.0 - 3.0 * g1 + 3.0 * g2 - g3) / (c**3)
    central3 = ez3 - 3.0 * a * var - a**3
    return central3 / jnp.maximum(var, 1e-300) ** 1.5


@partial(jax.jit, static_argnames=("n_iter",))
def gev_fit_mm(x, *, n_iter: int = 80):
    """Batched method-of-moments GEV fit of x [..., N] (NaN padded).

    Solves the exact moment system: the skewness pins the shape (bisection
    on the monotone-decreasing ``_gev_skew``), then scale and location
    follow in closed form — the vectorized counterpart of scipy
    ``genextreme.fit(method="mm")``.  Returns (c, loc, scale).
    """
    x = jnp.asarray(x)
    valid = ~jnp.isnan(x)
    n = jnp.sum(valid, axis=-1)
    nf = jnp.maximum(n, 1).astype(jnp.result_type(x.dtype, float))
    xv = jnp.where(valid, x, 0.0)
    m = jnp.sum(xv, -1) / nf
    d = jnp.where(valid, x - m[..., None], 0.0)
    v = jnp.sum(d * d, -1) / nf  # biased, as scipy's raw-moment matching
    m3 = jnp.sum(d**3, -1) / nf
    g = m3 / jnp.maximum(v, 1e-300) ** 1.5

    lo = jnp.full(g.shape, -1.0 / 3.0 + 1e-4)
    hi = jnp.full(g.shape, 10.0)

    def body(_, ab):
        lo, hi = ab
        mid = 0.5 * (lo + hi)
        too_low = _gev_skew(mid) > g  # skew decreasing: need larger c
        return (jnp.where(too_low, mid, lo), jnp.where(too_low, hi, mid))

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    c = 0.5 * (lo + hi)
    cs = jnp.where(jnp.abs(c) < 1e-6, 1e-6, c)
    lg = jax.scipy.special.gammaln
    g1 = jnp.exp(lg(1.0 + cs))
    g2 = jnp.exp(lg(1.0 + 2.0 * cs))
    var1 = (g2 - g1 * g1) / (cs * cs)
    scale = jnp.sqrt(v / jnp.maximum(var1, 1e-300))
    loc = m - scale * (1.0 - g1) / cs
    bad = n < 3
    return (
        jnp.where(bad, jnp.nan, c),
        jnp.where(bad, jnp.nan, loc),
        jnp.where(bad, jnp.nan, scale),
    )


# ---------------------------------------------------------------------------
# batched linear regression (diagnostics: trend over many sites)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("field",))
def linregress_field(y, x, field: str = "slope"):
    """Vectorized ``scipy.stats.linregress`` over the last axis of y [..., P]
    against x (broadcastable to y); NaNs in either are excluded pairwise.

    ``field`` in {slope, intercept, rvalue, pvalue, stderr, intercept_stderr};
    rows with fewer than 3 valid points return NaN (matching the host loop
    this replaces; reference ``properties.py:1189-1255``).
    """
    y = jnp.asarray(y)
    x = jnp.broadcast_to(jnp.asarray(x, dtype=y.dtype), y.shape)
    m = ~jnp.isnan(y) & ~jnp.isnan(x)
    n = jnp.sum(m, axis=-1)
    nf = jnp.maximum(n, 1).astype(y.dtype)
    xv = jnp.where(m, x, 0.0)
    yv = jnp.where(m, y, 0.0)
    xbar = jnp.sum(xv, -1) / nf
    ybar = jnp.sum(yv, -1) / nf
    dx = jnp.where(m, x - xbar[..., None], 0.0)
    dy = jnp.where(m, y - ybar[..., None], 0.0)
    ssxm = jnp.sum(dx * dx, -1) / nf
    ssym = jnp.sum(dy * dy, -1) / nf
    ssxym = jnp.sum(dx * dy, -1) / nf
    ssxm_s = jnp.where(ssxm == 0, 1.0, ssxm)
    slope = ssxym / ssxm_s
    intercept = ybar - slope * xbar
    denom = ssxm * ssym
    r = jnp.where(denom > 0, ssxym / jnp.sqrt(jnp.where(denom > 0, denom, 1.0)), 0.0)
    r = jnp.clip(r, -1.0, 1.0)
    df = (n - 2).astype(y.dtype)
    if field == "slope":
        out = slope
    elif field == "intercept":
        out = intercept
    elif field == "rvalue":
        out = r
    elif field == "pvalue":
        # 2*sf(|t|, df) for t = r*sqrt(df/(1-r^2)) equals I_{df/(df+t^2)}(df/2, 1/2)
        tiny = 1e-20
        t2 = r * r * df / ((1.0 - r + tiny) * (1.0 + r + tiny))
        out = jax.scipy.special.betainc(df / 2.0, 0.5, df / (df + t2))
    elif field == "stderr":
        out = jnp.sqrt((1.0 - r * r) * ssym / ssxm_s / jnp.maximum(df, 1.0))
    elif field == "intercept_stderr":
        se = jnp.sqrt((1.0 - r * r) * ssym / ssxm_s / jnp.maximum(df, 1.0))
        out = se * jnp.sqrt(ssxm + xbar * xbar)
    else:
        raise ValueError(f"Unknown linregress field {field!r}")
    out = jnp.where(ssxm == 0, jnp.nan, out)
    return jnp.where(n < 3, jnp.nan, out)


# ---------------------------------------------------------------------------
# host-side generic fitting (diagnostics layer)
# ---------------------------------------------------------------------------


def _threshold_loc_estimate(x_sorted):
    """Cooke (1979) lower-bound estimator from the smallest two and largest
    order statistics; used by the reference's gamma and fisk APP starts
    (``utils.py:1245-1285``).  Falls back to just below the minimum when the
    geometric condition degenerates."""
    x1, x2, xn = x_sorted[0], x_sorted[1], x_sorted[-1]
    denom = x1 + xn - 2 * x2
    loc0 = (x1 * xn - x2**2) / denom if denom != 0 else np.inf
    if not loc0 < x1:
        loc0 = 0.9999 * x1 if x1 > 0 else 1.0001 * x1
    return loc0


def _fit_start(x, dist_name: str, **fitkwargs):
    """Reference ``utils.py:1197-1296`` smart starting values.

    These double as the APP ("approximate") fit itself, so the estimators
    follow the reference's cited sources exactly: Gumbel-moment start for
    GEV, Extremes.jl moment start for GPD with known location, Cooke-1979
    threshold + Thom-1958 shape for gamma, moment-matched log-logistic for
    fisk, and the moment/plotting start for weibull_min.
    """
    x = np.asarray(x)
    x = x[~np.isnan(x)]
    m, v = x.mean(), x.var()
    if dist_name == "genextreme":
        s = np.sqrt(6 * v) / np.pi
        return (0.1,), {"loc": m - 0.57722 * s, "scale": s}
    if dist_name == "genpareto" and "floc" in fitkwargs:
        xs = x - fitkwargs["floc"]
        mxs, vxs = xs.mean(), xs.var()
        c0 = 0.5 * (1 - mxs**2 / vxs)
        return (c0,), {"scale": (1 - c0) * mxs}
    if dist_name == "gamma":
        loc0 = fitkwargs["floc"] if "floc" in fitkwargs else _threshold_loc_estimate(np.sort(x))
        xp = x - loc0
        xp = xp[xp > 0]
        mp = xp.mean()
        # Thom (1958) closed-form ML approximation for the shape
        A = np.log(mp) - np.log(xp).mean()
        a0 = (1 + np.sqrt(1 + 4 * A / 3)) / (4 * A)
        return (a0,), {"loc": loc0, "scale": mp / a0}
    if dist_name == "weibull_min":
        s = x.std()
        loc0 = x.min() - 0.01 * s
        # Gumbel-moment shape of log(x - loc), then moment scale
        c0 = np.pi / np.sqrt(6) / np.log(x - loc0).std()
        scale0 = ((x - loc0) ** c0).mean() ** (1 / c0)
        return (c0,), {"loc": loc0, "scale": scale0}
    if dist_name == "fisk":
        loc0 = fitkwargs["floc"] if "floc" in fitkwargs else _threshold_loc_estimate(np.sort(x))
        xp = x - loc0
        xp = xp[xp > 0]
        # moment matching of the two-parameter log-logistic:
        # E[X] = s·πb/sin(πb), E[X²]/E[X]² = tan(πb)·... solved for (c, s)
        m1, m2 = xp.mean(), (xp**2).mean()
        scale0 = 2 * m1**3 / (m2 + m1**2)
        c0 = np.pi * m1 / np.sqrt(3) / np.sqrt(m2 - m1**2)
        return (c0,), {"loc": loc0, "scale": scale0}
    return (), {}


# --- L-moment (PWM) estimators ---------------------------------------------
#
# Closed-form inversions of the first three L-moments, after Hosking &
# Wallis, "Regional Frequency Analysis" (1997), App. A — the same formulas
# the reference reaches through ``lmoments3`` (``utils.py:1178-1179``).
# Parameters are returned in scipy conventions.

#: scipy distribution names with an L-moment estimator (the lmoments3 set).
PWM_SUPPORTED = (
    "expon",
    "gamma",
    "genextreme",
    "genpareto",
    "gumbel_r",
    "pearson3",
    "weibull_min",
)


def sample_lmoments(x):
    """First three unbiased sample L-moments ``(l1, l2, l3)`` of 1-D data
    via probability-weighted moments (Hosking 1990, unbiased estimators)."""
    x = np.sort(np.asarray(x, dtype=np.float64))
    n = x.size
    if n < 3:
        return np.nan, np.nan, np.nan
    j = np.arange(n, dtype=np.float64)  # rank - 1
    b0 = x.mean()
    b1 = np.sum(x * j) / (n * (n - 1.0))
    b2 = np.sum(x * j * (j - 1.0)) / (n * (n - 1.0) * (n - 2.0))
    return b0, 2 * b1 - b0, 6 * b2 - 6 * b1 + b0


def _gev_from_lmoments(l1, l2, t3):
    """GEV (k, loc, scale), scipy ``genextreme`` convention, from L-moments
    (Hosking's rational approximation for the shape)."""
    from scipy.special import gamma as _gamma

    z = 2.0 / (3.0 + t3) - np.log(2.0) / np.log(3.0)
    k = 7.8590 * z + 2.9554 * z * z
    if abs(k) < 1e-8:
        scale = l2 / np.log(2.0)
        return 0.0, l1 - _EULER * scale, scale
    g1 = _gamma(1.0 + k)
    scale = l2 * k / ((1.0 - 2.0 ** (-k)) * g1)
    return k, l1 - scale * (1.0 - g1) / k, scale


def _lmom_fit(x, name: str):
    """Parameter tuple for ``name`` from the sample L-moments of ``x``;
    NaNs when the L-moment ratios leave the distribution's feasible set
    (where lmoments3 raises)."""
    from scipy.special import gamma as _gamma

    if name not in PWM_SUPPORTED:
        raise NotImplementedError(
            f"PWM (L-moment) fitting is not implemented for {name!r}; "
            f"supported distributions: {', '.join(PWM_SUPPORTED)}."
        )
    l1, l2, l3 = sample_lmoments(x)
    nan2, nan3 = (np.nan, np.nan), (np.nan, np.nan, np.nan)
    if not np.isfinite(l2) or l2 <= 0:
        return nan2 if name in ("expon", "gumbel_r") else nan3
    t3 = l3 / l2

    if name == "expon":
        scale = 2.0 * l2
        return (l1 - scale, scale)
    if name == "gumbel_r":
        scale = l2 / np.log(2.0)
        return (l1 - _EULER * scale, scale)
    if name == "genextreme":
        if abs(t3) >= 1:
            return nan3
        return _gev_from_lmoments(l1, l2, t3)
    if name == "genpareto":
        if abs(t3) >= 1:
            return nan3
        k = (1.0 - 3.0 * t3) / (1.0 + t3)
        scale = (1.0 + k) * (2.0 + k) * l2
        loc = l1 - (2.0 + k) * l2
        return (-k, loc, scale)  # scipy c = -k (Hosking)
    if name == "gamma":
        if l1 <= l2:  # requires positive data with L-CV < 1
            return nan3
        t = l2 / l1
        if t < 0.5:
            z = np.pi * t * t
            a = (1.0 - 0.3080 * z) / (z - 0.05812 * z * z + 0.01765 * z**3)
        else:
            z = 1.0 - t
            a = (0.7213 * z - 0.5947 * z * z) / (1.0 - 2.1817 * z + 1.2113 * z * z)
        return (a, 0.0, l1 / a)
    if name == "pearson3":
        at3 = abs(t3)
        if at3 >= 1:
            return nan3
        if at3 < 1e-8:  # normal limit
            return (0.0, l1, l2 * np.sqrt(np.pi))
        if at3 < 1.0 / 3.0:
            z = 3.0 * np.pi * t3 * t3
            a = (1.0 + 0.2906 * z) / (z + 0.1882 * z * z + 0.0442 * z**3)
        else:
            z = 1.0 - at3
            a = (0.36067 * z - 0.59567 * z * z + 0.25361 * z**3) / (
                1.0 - 2.78861 * z + 2.56096 * z * z - 0.77045 * z**3
            )
        skew = 2.0 / np.sqrt(a) * np.sign(t3)
        sigma = l2 * np.sqrt(np.pi * a) * _gamma(a) / _gamma(a + 0.5)
        return (skew, l1, sigma)
    if name == "weibull_min":
        # Weibull(delta, zeta, beta) <=> -X ~ GEV(k=1/delta, xi=-zeta-beta,
        # alpha=beta/delta): fit GEV to the reflected L-moments (-l1, l2, -t3)
        if t3 >= 1 or -t3 >= 1:
            return nan3
        k, xi, alpha = _gev_from_lmoments(-l1, l2, -t3)
        if not (k > 0):
            return nan3
        delta = 1.0 / k
        beta = alpha / k
        return (delta, -xi - beta, beta)
    raise AssertionError(f"unhandled PWM distribution {name!r}")  # pragma: no cover


def fit_scipy(x, dist, method: str = "ML", **fitkwargs):
    """Fit a scipy distribution to 1-D data (reference ``utils.py:1164-1193``).

    method in {"ML", "MM", "PWM", "APP"}.  Returns the parameter tuple in
    scipy order (shapes..., loc, scale).  PWM inverts the sample L-moments
    for the distributions lmoments3 supports (:data:`PWM_SUPPORTED`) and
    raises ``NotImplementedError`` otherwise; APP returns the reference's
    closed-form starting estimates as the fit.
    """
    from scipy import stats

    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if isinstance(dist, str):
        dist = getattr(stats, dist)
    name = dist.name
    if method == "PWM" and name not in PWM_SUPPORTED:
        _lmom_fit(x, name)  # raises NotImplementedError
    if len(x) <= 1:  # reference utils.py:1169-1171
        nparams = len(dist.shapes.split(",")) if dist.shapes else 0
        return tuple([np.nan] * (nparams + 2))
    if method == "ML":
        args, guess = _fit_start(x, name, **fitkwargs)
        try:
            params = dist.fit(x, *args, **guess, **fitkwargs)
        except Exception:
            params = dist.fit(x, **fitkwargs)
    elif method == "PWM":
        params = _lmom_fit(x, name)
    elif method == "MM":
        params = dist.fit(x, method="MM", **fitkwargs)
    elif method == "APP":
        args, guess = _fit_start(x, name, **fitkwargs)
        if "scale" not in guess:
            raise ValueError(
                f"The APP (approximate) fit has no starting estimator for {name!r}; "
                "supported: genextreme, genpareto (with floc), gamma, weibull_min, fisk."
            )
        params = (*args, guess.get("loc", 0.0), guess["scale"])
    else:
        raise ValueError(f"Unknown fitting method {method!r}")
    params = np.asarray(params, dtype=np.float64)
    # reference _fitfunc_1d: any NaN parameter poisons the whole vector
    if np.isnan(params).any():
        params[:] = np.nan
    return tuple(params)
