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


def _fit_start(x, dist_name: str, **fitkwargs):
    """Reference ``utils.py:1197-1296`` smart starting values (subset)."""
    x = np.asarray(x)
    x = x[~np.isnan(x)]
    m, v = x.mean(), x.var()
    if dist_name in ("genextreme",):
        s = np.sqrt(6 * v) / np.pi
        return (0.1,), {"loc": m - 0.57722 * s, "scale": s}
    if dist_name in ("genpareto",) and "floc" in fitkwargs:
        loc = fitkwargs["floc"]
        xs = x - loc
        mxs, vxs = xs.mean(), xs.var()
        xi0 = -0.5 * (mxs**2 / vxs - 1)
        s0 = 0.5 * mxs * (mxs**2 / vxs + 1)
        return (xi0,), {"scale": s0}
    if dist_name == "gamma":
        if "floc" in fitkwargs:
            xs = x - fitkwargs["floc"]
            m, v = xs.mean(), xs.var()
        return (m**2 / v,), {"scale": v / m}
    if dist_name in ("weibull_min",):
        ls = np.log(x[x > 0])
        return (1.0,), {"loc": 0.0, "scale": np.exp(ls.mean())}
    if dist_name == "fisk":
        # start from lognormal-ish moments
        return (1.0,), {"loc": 0.0, "scale": m}
    return (), {}


def fit_scipy(x, dist, method: str = "ML", **fitkwargs):
    """Fit a scipy distribution to 1-D data (reference ``utils.py:1164-1193``).

    method in {"ML", "MM", "PWM"(genextreme/genpareto only → falls back to
    lmoment-free ML here), "APP"}.  Returns the parameter tuple.
    """
    from scipy import stats

    x = np.asarray(x, dtype=np.float64)
    x = x[~np.isnan(x)]
    if isinstance(dist, str):
        dist = getattr(stats, dist)
    name = dist.name
    if len(x) == 0:
        nparams = len(dist.shapes.split(",")) if dist.shapes else 0
        return tuple([np.nan] * (nparams + 2))
    if method in ("ML", "PWM"):
        args, guess = _fit_start(x, name, **fitkwargs)
        try:
            params = dist.fit(x, *args, **guess, **fitkwargs)
        except Exception:
            params = dist.fit(x, **fitkwargs)
    elif method == "MM":
        params = dist.fit(x, method="MM", **fitkwargs)
    elif method == "APP":
        args, guess = _fit_start(x, name, **fitkwargs)
        loc = guess.get("loc", fitkwargs.get("floc", 0.0))
        scale = guess.get("scale", x.std())
        params = (*args, loc, scale)
    else:
        raise ValueError(f"Unknown fitting method {method!r}")
    return tuple(params)
