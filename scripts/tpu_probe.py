"""Parameterized TPU micro-probe runner (consolidates the one-shot probe
scripts of rounds 2-3; see docs/PERFORMANCE.md for recorded results).

Usage: python scripts/tpu_probe.py NAME [NAME...]
Each NAME is a registered probe; results print as one JSON line per probe:
{"probe": ..., "ms": ..., "extra": {...}}.

Timing protocol: in-scan chained steps (one dispatch, one scalar fetch)
minus the trivial dispatch+fetch roundtrip, min over reps — the same
protocol as bench.py (relay dispatch latency varies ~3x run to run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def _timed_fetch(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def inscan_ms(step, inputs, n_steps=8, reps=3):
    """Per-step milliseconds of ``step(carry)->scalar`` chained in one scan."""
    inputs = tuple(jnp.asarray(x) for x in inputs)

    @jax.jit
    def scan_steps(x0):
        def body(carry, _):
            acc = step(carry)
            eps = (0 * acc).astype(carry[0].dtype)
            return tuple(x + eps for x in carry), acc

        _, accs = jax.lax.scan(body, x0, None, length=n_steps)
        return jnp.nansum(accs)

    @jax.jit
    def triv(xs):
        return jnp.nansum(xs[0]) * 1.0000001

    s = float(scan_steps(inputs))
    assert np.isfinite(s), s
    float(triv(inputs))
    t_triv = min(_timed_fetch(lambda: triv(inputs)) for _ in range(reps))
    t_scan = min(_timed_fetch(lambda: scan_steps(inputs)) for _ in range(reps))
    return max((t_scan - t_triv) / n_steps, 1e-9) * 1e3


def _heavy_problem(n_sites=None, n_years=150):
    if n_sites is None:  # batch-size experiments: HEAVY_SITES=512 ...
        n_sites = int(os.environ.get("HEAVY_SITES", "256"))
    from xsdba_tpu.models._wrap import device_brackets
    from xsdba_tpu.ops.correction import equally_spaced_nodes
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=31).indexes(t)
    rng = np.random.default_rng(1)
    T = len(t)
    ref = rng.normal(10, 2, (n_sites, T)).astype(np.float32)
    hist = rng.normal(12, 3, (n_sites, T)).astype(np.float32)
    sim = rng.normal(13, 3, (n_sites, T)).astype(np.float32)
    q = equally_spaced_nodes(50).astype(np.float32)
    return gi, ref, hist, sim, q, device_brackets(gi, "linear")


@probe
def heavy_step():
    """Current heavy path: fused windowed EQM train+adjust, 256 sites."""
    from xsdba_tpu.models._algos import eqm_train_adjust_windowed

    gi, ref, hist, sim, q, brackets = _heavy_problem()
    qd = jnp.asarray(q)

    def step(carry):
        r, h, s = carry
        scen, _, _ = eqm_train_adjust_windowed(
            r, h, s, gi.merge_plan, qd, brackets,
            kind="+", interp="linear", extrapolation="constant", assume_finite=True,
        )
        return jnp.nansum(scen)

    ms = inscan_ms(step, (jnp.asarray(ref), jnp.asarray(hist), jnp.asarray(sim)))
    n_sites = ref.shape[0]
    return ms, {
        "n_sites": n_sites,
        "gpyrs_per_s": round(n_sites * 150 / (ms / 1e3), 1),
    }


@probe
def heavy_train():
    """Train-only half of the heavy path (fused windowed EQM train)."""
    from xsdba_tpu.models._algos import eqm_train_windowed

    gi, ref, hist, sim, q, brackets = _heavy_problem()
    qd = jnp.asarray(q)

    def step(carry):
        r, h, s = carry
        af, hist_q = eqm_train_windowed(r, h, gi.merge_plan, qd, kind="+")
        return jnp.nansum(af) + jnp.nansum(hist_q)

    return inscan_ms(step, (jnp.asarray(ref), jnp.asarray(hist), jnp.asarray(sim))), {}


@probe
def heavy_adjust():
    """Adjust-only half: grouped table interp + correction on sim."""
    from xsdba_tpu.models._algos import qm_adjust_core
    from xsdba_tpu.models._algos import eqm_train_windowed

    gi, ref, hist, sim, q, brackets = _heavy_problem()
    qd = jnp.asarray(q)
    af, hist_q = eqm_train_windowed(jnp.asarray(ref), jnp.asarray(hist), gi.merge_plan, qd, kind="+")
    af.block_until_ready()

    def step(carry):
        (s,) = carry
        scen = qm_adjust_core(s, hist_q, af, brackets, kind="+", interp="linear", extrapolation="constant")
        return jnp.nansum(scen)

    return inscan_ms(step, (jnp.asarray(sim),)), {}


@probe
def fold_anchor():
    """Shared-dyadic fold ALONE at the heavy shape (stacked ref+hist slab
    prebuilt and pre-sorted outside the timed step) — the roofline anchor."""
    from xsdba_tpu.ops.layout import aligned_swap_last2
    from xsdba_tpu.ops.pallas.merge_kernel import (
        merged_window_rows_shared,
        sort_rows_alternating,
    )

    gi, ref, hist, _, _, _ = _heavy_problem()
    plan = gi.merge_plan
    x = jnp.concatenate([jnp.asarray(ref), jnp.asarray(hist)], axis=0)
    Gx, Ymax = plan.w1_gather.shape
    G = Gx - 2 * plan.half
    P = plan.regular_period
    assert P is not None, "heavy problem should be regular noleap"
    Y = x.shape[-1] // P
    core = aligned_swap_last2(x.reshape(x.shape[:-1] + (Y, P)), 8, 128)
    half = plan.half
    napad = jnp.full(x.shape[:-1] + (half, 1), jnp.nan, x.dtype)
    head = jnp.concatenate([core[..., P - half : P, : Y - 1], napad], axis=-1)
    tail = jnp.concatenate([core[..., 0:half, 1:], napad], axis=-1)
    vals = jnp.concatenate([head, core, tail], axis=-2)
    raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
    if plan.ypad > Ymax:
        raw = jnp.pad(
            raw, [(0, 0)] * (raw.ndim - 1) + [(0, plan.ypad - Ymax)],
            constant_values=jnp.inf,
        )
    Sp = jnp.full(x.shape[:-1] + (plan.dp, plan.ypad), jnp.inf, raw.dtype)
    Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=raw.ndim - 2)
    Sb = sort_rows_alternating(Sp)
    Sb.block_until_ready()
    out_width = min(
        plan.wpad * plan.ypad, -(-(plan.window * Ymax) // plan.ypad) * plan.ypad
    )

    tile_b = os.environ.get("FOLD_TILE")
    tile_b = int(tile_b) if tile_b else None

    def step(carry):
        (s,) = carry
        m = merged_window_rows_shared(
            s, plan.window, G, out_width=out_width, ymax=Ymax, tile_b=tile_b
        )
        return jnp.nansum(m[:, ::31, :64])

    ms = inscan_ms(step, (Sb,))
    return ms, {"B": int(Sb.shape[0]), "out_width": out_width, "tile_b": tile_b}


@probe
def composed_stages():
    """Staged timings of the heavy fused step to localize composition
    overhead: (1) slab build + row sort, (2) + shared fold, (3) full static
    fused train, (4) full static fused train+adjust (== heavy_step)."""
    from xsdba_tpu.models import _algos
    from xsdba_tpu.ops.layout import aligned_swap_last2
    from xsdba_tpu.ops.pallas.merge_kernel import (
        merged_window_rows_shared,
        sort_rows_alternating,
    )
    from xsdba_tpu.ops.quantile import _plan_device_arrays

    gi, ref, hist, sim, q, brackets = _heavy_problem()
    plan = gi.merge_plan
    refd, histd, simd = jnp.asarray(ref), jnp.asarray(hist), jnp.asarray(sim)
    qd = jnp.asarray(q)
    Gx, Ymax = plan.w1_gather.shape
    G = Gx - 2 * plan.half
    out_width = min(
        plan.wpad * plan.ypad, -(-(plan.window * Ymax) // plan.ypad) * plan.ypad
    )

    def build_slab(r, h):
        x = jnp.stack([r, h], axis=0)
        P = plan.regular_period
        Y = x.shape[-1] // P
        core = aligned_swap_last2(x.reshape(x.shape[:-1] + (Y, P)), 8, 128)
        half = plan.half
        napad = jnp.full(x.shape[:-1] + (half, 1), jnp.nan, x.dtype)
        head = jnp.concatenate([core[..., P - half : P, : Y - 1], napad], axis=-1)
        tail = jnp.concatenate([core[..., 0:half, 1:], napad], axis=-1)
        vals = jnp.concatenate([head, core, tail], axis=-2)
        raw = jnp.where(jnp.isnan(vals), jnp.inf, vals)
        if plan.ypad > Ymax:
            raw = jnp.pad(
                raw, [(0, 0)] * (raw.ndim - 1) + [(0, plan.ypad - Ymax)],
                constant_values=jnp.inf,
            )
        Sp = jnp.full(x.shape[:-1] + (plan.dp, plan.ypad), jnp.inf, raw.dtype)
        Sp = jax.lax.dynamic_update_slice_in_dim(Sp, raw, 0, axis=raw.ndim - 2)
        B = 2 * r.shape[0]
        return sort_rows_alternating(Sp.reshape(B, plan.dp, plan.ypad))

    def _finsum(v):  # slab/merged carry +inf pads: mask before reducing
        return jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0))

    def s1(carry):
        r, h, s = carry
        return _finsum(build_slab(r, h)[:, ::31, :16])

    def s2(carry):
        r, h, s = carry
        Sb = build_slab(r, h)
        m = merged_window_rows_shared(Sb, plan.window, G, out_width=out_width, ymax=Ymax)
        return _finsum(m[:, ::31, :64])

    counts = tuple(int(c) for c in plan.nv_host)
    qs = tuple(float(v) for v in np.asarray(q, np.float64))
    edge_tuple = tuple(int(e) for e in plan.edge_ids)
    w1, eid, eg = _plan_device_arrays(plan)

    def train(r, h):
        return _algos._eqm_train_windowed_fused(
            r, h, w1, eid, eg, qd,
            half=plan.half, window=plan.window, ypad=plan.ypad, wpad=plan.wpad,
            dp=plan.dp, use_kernel=True, kind="+", counts=counts, q_static=qs,
            edge_tuple=edge_tuple, regular=plan.regular_period,
        )

    def s3(carry):
        r, h, s = carry
        af, hist_q = train(r, h)
        return jnp.nansum(af) + jnp.nansum(hist_q)

    def s4(carry):
        r, h, s = carry
        scen, _, _ = _algos.eqm_train_adjust_windowed(
            r, h, s, plan, qd, brackets,
            kind="+", interp="linear", extrapolation="constant", assume_finite=True,
        )
        return jnp.nansum(scen)

    inputs = (refd, histd, simd)
    res = {}
    for name, fn in [("slab_sort", s1), ("plus_fold", s2), ("train_static", s3), ("full_step", s4)]:
        res[name] = round(inscan_ms(fn, inputs), 2)
    return res["full_step"], res


@probe
def extract_anchor():
    """Static flat extraction alone: constant-index gather of the 2*nq+1
    needed columns per group from a prebuilt merged [B, G, n] array."""
    from xsdba_tpu.ops.quantile import _static_flat_extract

    gi, ref, hist, _, q, _ = _heavy_problem()
    plan = gi.merge_plan
    counts = tuple(int(c) for c in plan.nv_host)
    G = len(counts)
    n = 4864  # the heavy fold's stored width (rows_store * ypad)
    B = 2 * ref.shape[0]
    rng = np.random.default_rng(5)
    merged = np.sort(rng.normal(10, 3, (B, G, n)).astype(np.float32), axis=-1)
    merged_d = jnp.asarray(merged)
    qs = tuple(float(v) for v in np.asarray(q, np.float64))

    def step(carry):
        (m,) = carry
        out = _static_flat_extract(m, counts, qs, plan.edge_ids, 1.0, 1.0)
        return jnp.nansum(out)

    ms = inscan_ms(step, (merged_d,))
    return ms, {"B": B, "G": G, "n": n, "nq": len(qs)}


@probe
def matmul_anchor():
    """Static MATMUL extraction alone (one-hot MXU contraction) at the same
    prebuilt-merged shape as extract_anchor."""
    from xsdba_tpu.ops.quantile import _static_matmul_extract

    gi, ref, hist, _, q, _ = _heavy_problem()
    plan = gi.merge_plan
    counts = tuple(int(c) for c in plan.nv_host)
    G = len(counts)
    n = 4864
    B = 2 * ref.shape[0]
    rng = np.random.default_rng(5)
    merged = np.sort(rng.normal(10, 3, (B, G, n)).astype(np.float32), axis=-1)
    merged_d = jnp.asarray(merged)
    qs = tuple(float(v) for v in np.asarray(q, np.float64))

    def step(carry):
        (m,) = carry
        out = _static_matmul_extract(m, counts, qs, plan.edge_ids, 1.0, 1.0)
        return jnp.nansum(out)

    ms = inscan_ms(step, (merged_d,))
    return ms, {"B": B, "G": G, "n": n, "nq": len(qs)}


@probe
def strip_anchor():
    """Static STRIP extraction alone (the current in-bench default) at the
    same prebuilt-merged shape as extract_anchor — today's strip-vs-flat
    comparison without cross-day weather."""
    from xsdba_tpu.ops.quantile import _static_strip_extract

    gi, ref, hist, _, q, _ = _heavy_problem()
    plan = gi.merge_plan
    counts = tuple(int(c) for c in plan.nv_host)
    G = len(counts)
    n = 4864
    B = 2 * ref.shape[0]
    rng = np.random.default_rng(5)
    merged = np.sort(rng.normal(10, 3, (B, G, n)).astype(np.float32), axis=-1)
    merged_d = jnp.asarray(merged)
    qs = tuple(float(v) for v in np.asarray(q, np.float64))

    def step(carry):
        (m,) = carry
        out = _static_strip_extract(m, counts, qs, plan.edge_ids, 1.0, 1.0)
        return jnp.nansum(out)

    ms = inscan_ms(step, (merged_d,))
    return ms, {"B": B, "G": G, "n": n, "nq": len(qs)}


@probe
def adjust_dissect():
    """Localize the fused step's adjust-side composition overhead
    (composed_stages: full_step - train_static ~= 104 ms vs ~7 ms isolated).

    - const_tables: the SAME program runs train AND adjust, but the adjust
      consumes carry-chained CONSTANT tables instead of the train outputs —
      if this matches train_static + isolated adjust, the data dependence /
      barrier path is the problem; if it matches full_step, it is resource
      contention between the stages.
    - nearest_full: the full dependent step with interp="nearest" (no Pallas
      interp kernel, collapsed brackets) — isolates the linear lookup.
    """
    from xsdba_tpu.models import _algos
    from xsdba_tpu.ops.quantile import _plan_device_arrays

    gi, ref, hist, sim, q, brackets = _heavy_problem()
    plan = gi.merge_plan
    refd, histd, simd = jnp.asarray(ref), jnp.asarray(hist), jnp.asarray(sim)
    qd = jnp.asarray(q)
    counts = tuple(int(c) for c in plan.nv_host)
    qs = tuple(float(v) for v in np.asarray(q, np.float64))
    edge_tuple = tuple(int(e) for e in plan.edge_ids)
    w1, eid, eg = _plan_device_arrays(plan)

    def train(r, h):
        return _algos._eqm_train_windowed_fused(
            r, h, w1, eid, eg, qd,
            half=plan.half, window=plan.window, ypad=plan.ypad, wpad=plan.wpad,
            dp=plan.dp, use_kernel=True, kind="+", counts=counts, q_static=qs,
            edge_tuple=edge_tuple, regular=plan.regular_period,
        )

    af0, hq0 = train(refd, histd)
    af0.block_until_ready()

    def const_tables(carry):
        r, h, s, a0, q0 = carry
        af, hist_q = train(r, h)
        scen = _algos.qm_adjust_core.__wrapped__(
            s, q0, a0, brackets, kind="+", interp="linear", extrapolation="constant"
        )
        return jnp.nansum(af) + jnp.nansum(hist_q) + jnp.nansum(scen)

    def nearest_full(carry):
        r, h, s, a0, q0 = carry
        from xsdba_tpu.models._wrap import device_brackets

        scen, _, _ = _algos.eqm_train_adjust_windowed(
            r, h, s, plan, qd, device_brackets(gi, "nearest"),
            kind="+", interp="nearest", extrapolation="constant", assume_finite=True,
        )
        return jnp.nansum(scen)

    inputs = (refd, histd, simd, af0, hq0)
    res = {}
    for name, fn in [("const_tables", const_tables), ("nearest_full", nearest_full)]:
        res[name] = round(inscan_ms(fn, inputs), 2)
    return res["const_tables"], res


@probe
def rowsort_anchor():
    """Pallas alternating row sort alone on the heavy slab [512, dp, ypad]."""
    from xsdba_tpu.ops.pallas.merge_kernel import sort_rows_alternating

    gi, ref, hist, _, _, _ = _heavy_problem()
    plan = gi.merge_plan
    x = jnp.concatenate([jnp.asarray(ref), jnp.asarray(hist)], axis=0)
    B = x.shape[0]
    rng = np.random.default_rng(3)
    Sp = jnp.asarray(
        rng.normal(10, 3, (B, plan.dp, plan.ypad)).astype(np.float32)
    )

    def step(carry):
        (s,) = carry
        return jnp.nansum(sort_rows_alternating(s)[:, ::31, :64])

    return inscan_ms(step, (Sp,)), {"shape": list(Sp.shape)}


@probe
def argsort_bt():
    """jnp.argsort (sort with i32 payload) on [512, 54750] f32."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(512, 54750)).astype(np.float32)

    def step(carry):
        (xc,) = carry
        idx = jnp.argsort(xc, axis=-1)
        return jnp.sum(idx[:, ::997].astype(jnp.float32))

    return inscan_ms(step, (x,)), {}


@probe
def sort_bt():
    """Plain value sort on [512, 54750] f32 (no payload)."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(512, 54750)).astype(np.float32)

    def step(carry):
        (xc,) = carry
        s = jnp.sort(xc, axis=-1)
        return jnp.sum(s[:, ::997])

    return inscan_ms(step, (x,)), {}


@probe
def onehot_hist():
    """Blocked doy histogram: [512, 54750] i16 doys -> [512, 1712, 366] i32
    counts via one-hot compare + block sum (L2=32)."""
    rng = np.random.default_rng(0)
    d = rng.integers(0, 365, size=(512, 54784)).astype(np.int16)  # padded to 1712*32

    def step(carry):
        (dc,) = carry
        blk = dc.reshape(512, 1712, 32, 1)
        eq = (blk == jnp.arange(366, dtype=jnp.int16)).astype(jnp.int8)
        cnt = jnp.sum(eq, axis=2, dtype=jnp.int32)  # [512, 1712, 366]
        return jnp.sum(cnt[:, ::31, ::31].astype(jnp.float32))

    return inscan_ms(step, (d,)), {}


@probe
def dyngather_blocks():
    """Dynamic block gather: per (site,[365,102]) target, a 32-wide block from
    [512, 54784] i16 + membership cumsum — the selection inner stage shape."""
    rng = np.random.default_rng(0)
    d = rng.integers(0, 365, size=(512, 54784)).astype(np.int16)
    bstar = rng.integers(0, 1712, size=(512, 365, 102)).astype(np.int32)

    def step(carry):
        dc, bc = carry
        # gather [512, 365, 102, 32]
        idx = bc[..., None] * 32 + jnp.arange(32, dtype=jnp.int32)
        blk = jnp.take_along_axis(dc[:, None, None, :], idx.reshape(512, 1, 1, -1), axis=-1)
        blk = blk.reshape(512, 365, 102, 32)
        g = jnp.arange(365, dtype=jnp.int16)[None, :, None, None]
        dist = jnp.abs(blk - g)
        member = (jnp.minimum(dist, 365 - dist) <= 15).astype(jnp.int32)
        cs = jnp.cumsum(member, axis=-1)
        pos = jnp.sum((cs < 7).astype(jnp.int32), axis=-1)
        return jnp.sum(pos.astype(jnp.float32))

    return inscan_ms(step, (d, bstar.astype(np.int32))), {}


@probe
def cw_search():
    """Target-rank search: 102 static ranks vs CW rows [512, 365, 1712] i32
    (two-level: stride-32 coarse compare + 32-wide refine gather)."""
    rng = np.random.default_rng(0)
    cw = np.sort(rng.integers(0, 4650, size=(512, 365, 1712)).astype(np.int32), axis=-1)
    ks = np.sort(rng.integers(0, 4650, size=102)).astype(np.int32)

    def step(carry):
        (c,) = carry
        coarse = c[..., ::32]  # [512, 365, 54]
        k = jnp.asarray(ks)[None, None, :, None]
        b1 = jnp.sum((coarse[..., None, :] <= k[..., 0, :][..., None]).astype(jnp.int32), axis=-1)
        # refine: gather 32 consecutive CW entries starting at (b1-1)*32
        start = jnp.clip((b1 - 1) * 32, 0, 1712 - 32)
        idx = start[..., None] + jnp.arange(32, dtype=jnp.int32)
        seg = jnp.take_along_axis(c[:, :, None, :], idx.reshape(512, 365, 1, -1), axis=-1)
        seg = seg.reshape(512, 365, 102, 32)
        off = jnp.sum((seg <= k[..., 0, :][..., None]).astype(jnp.int32), axis=-1)
        return jnp.sum((start + off).astype(jnp.float32))

    return inscan_ms(step, (cw,)), {}


@probe
def cumsum_big():
    """Prefix sums [512, 366, 1712] i32 over the block axis."""
    rng = np.random.default_rng(0)
    w = rng.integers(0, 32, size=(512, 366, 1712)).astype(np.int32)

    def step(carry):
        (x,) = carry
        cs = jnp.cumsum(x, axis=-1)
        return jnp.sum(cs[:, ::31, ::97].astype(jnp.float32))

    return inscan_ms(step, (w,)), {}


def main(names):
    for name in names:
        fn = PROBES[name]
        out = fn()
        ms, extra = out if isinstance(out, tuple) else (out, {})
        print(json.dumps({"probe": name, "ms": round(ms, 2), "extra": extra}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or list(PROBES))
