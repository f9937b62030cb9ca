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

__all__ = ["fit_scipy", "gpd_cdf", "gpd_fit_ml", "gpd_ppf"]


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
