"""Benchmark: QDM train+adjust throughput (gridpoint-years / second).

North star (BASELINE.md): QDM train+adjust on a 0.25-degree global daily
150-year dataset in < 60 s on a TPU v5e-8 pod — i.e. ~1.04M gridpoints x
150 yr / 60 s / 8 chips ~= 325k gridpoint-years/s/chip.  ``vs_baseline`` is
measured single-chip throughput over that per-chip target (>1 beats it).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

# per-chip target implied by the north star: 0.25deg grid = 1440x720 points
_BASELINE_GPYRS_PER_S = 1_036_800 * 150 / 60 / 8  # = 324_000


def _inscan_rate(jax, jnp, step, inputs, gpy_per_step, n_steps=12, reps=5):
    """Chip-throughput timing: ``n_steps`` dependent full steps inside ONE
    jitted ``lax.scan`` — one dispatch, one scalar fetch — minus the measured
    trivial dispatch+fetch roundtrip.  Through the remote-TPU relay,
    per-dispatch latency varies run to run by up to ~3x on identical
    programs; chaining dispatches (the old scheme) lets that latency
    masquerade as compute.  In-graph chaining measures what the chip
    actually sustains, which is also the production regime (few large
    dispatches).

    Relay robustness: ``reps`` independent in-scan estimates are collected
    and the MEDIAN rate is reported (a single latency spike or lucky window
    cannot set the metric), with the relative spread ``(max-min)/median``
    returned alongside for the JSON ``extra``.

    ``step`` takes the full ``inputs`` tuple, and EVERY input is data-chained
    through the scan carry — otherwise XLA hoists the loop-invariant work
    (e.g. the hist-side sort) out of the loop and the rate overstates what a
    stream of fresh blocks would sustain."""
    inputs = tuple(inputs)

    @jax.jit
    def scan_steps(x0):
        def body(carry, _):
            acc = step(carry)
            # data-chain the NEXT step's inputs through this step's output
            # (eps is exactly zero, so every step sees identical values).
            # Chain from ``carry``, not the closed-over ``inputs``: closure
            # constants are inlined into the serialized HLO, and at the
            # headline shape that is ~340 MB — the relay's remote-compile
            # endpoint rejects it (HTTP 413).
            eps = (0 * acc).astype(carry[0].dtype)
            return tuple(x + eps for x in carry), acc

        _, accs = jax.lax.scan(body, x0, None, length=n_steps)
        return jnp.nansum(accs)

    @jax.jit
    def triv(xs):
        return jnp.nansum(xs[0]) * 1.0000001

    s = float(scan_steps(inputs))  # compile + first run
    assert np.isfinite(s)
    float(triv(inputs))
    # The trivial roundtrip is pure relay latency; its floor (min) is the
    # right subtraction — anything above the floor is a spike, and spikes
    # also hit the scan runs, where the median absorbs them.
    t_triv = min(_timed_fetch(lambda: triv(inputs)) for _ in range(reps))
    rates = []
    for _ in range(reps):
        t_scan = _timed_fetch(lambda: scan_steps(inputs))
        rates.append(gpy_per_step / max((t_scan - t_triv) / n_steps, 1e-9))
    value = float(np.median(rates))
    spread = float((max(rates) - min(rates)) / value)
    return value, spread


def _timed_fetch(f):
    t0 = time.perf_counter()
    float(f())
    return time.perf_counter() - t0


def main():
    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs (and the measurement
    # roundup) reuse programs instead of re-paying relay compile latency
    try:
        import os

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _example_problem
    from xsdba_tpu.models._algos import qdm_train_adjust_core

    n_years = 150
    # pick the site batch so the dominant intermediate (gather matrix
    # [sites, 12, 31*years]) stays within HBM
    n_sites = 512
    args = _example_problem(n_sites=n_sites, n_years=n_years)

    data, plan = args[:3], args[3:]  # (ref, hist, sim) chained; plan arrays reused

    def step(carry):
        # scalar summary fused into the step: forcing its transfer to host is
        # the only reliable sync point through the remote-TPU relay
        # (block_until_ready returns early there).
        r, h, s = carry
        out = qdm_train_adjust_core.__wrapped__(
            r, h, s, *plan, kind="+", interp="linear", extrapolation="constant"
        )
        return jnp.nansum(out)

    gp_years = n_sites * n_years
    value, headline_spread = _inscan_rate(jax, jnp, step, data, gp_years)

    def emit(extra):
        print(
            json.dumps(
                {
                    "metric": "QDM train+adjust throughput (single chip)",
                    "value": round(value, 1),
                    "unit": "gridpoint-years/s",
                    "vs_baseline": round(value / _BASELINE_GPYRS_PER_S, 3),
                    "extra": extra,
                }
            ),
            flush=True,
        )

    # preliminary line first: the heavy/MBCn rows compile many kernels, and
    # if an external timeout kills the run mid-way the LAST printed line
    # still records the headline
    extra = {"spread": {"headline": round(headline_spread, 3)}}
    emit(extra)
    try:
        heavy, heavy_spread = _bench_heavy_doy31(jax, jnp)
        extra["heavy_config1_eqm_doy31w_gpyrs_per_s"] = heavy
        extra["heavy_vs_baseline"] = round(heavy / _BASELINE_GPYRS_PER_S, 3)
        extra["spread"]["heavy"] = round(heavy_spread, 3)
        emit(extra)
    except Exception as err:  # pragma: no cover - defensive
        extra["heavy_error"] = str(err)[:200]
    try:
        mbcn, mbcn_spread = _bench_mbcn(jnp)
        extra["mbcn_train_iterations_per_s"] = mbcn
        extra["spread"]["mbcn"] = round(mbcn_spread, 3)
    except Exception as err:  # pragma: no cover - defensive
        extra["mbcn_error"] = str(err)[:200]
    emit(extra)


def _bench_heavy_doy31(jax, jnp):
    """BASELINE config 1: EQM train+adjust, dayofyear grouping, 31-day
    window, linear interp — the production-norm heavy path (shared-sort
    merge kernel; see ops/pallas/merge_kernel.py)."""
    import jax.numpy as jnp

    from xsdba_tpu.models._algos import eqm_train_adjust_windowed
    from xsdba_tpu.models._wrap import device_brackets
    from xsdba_tpu.ops.correction import equally_spaced_nodes
    from xsdba_tpu.utils.calendar import date_range
    from xsdba_tpu.utils.grouper import Grouper

    n_sites, n_years, nq = 256, 150, 50  # 256 sites amortize per-step fixed costs
    t = date_range("1950-01-01", periods=365 * n_years, freq="D", calendar="noleap")
    gi = Grouper("time.dayofyear", window=31).indexes(t)
    rng = np.random.default_rng(1)
    T = len(t)
    ref = jnp.asarray(rng.normal(10, 2, (n_sites, T)).astype(np.float32))
    hist = jnp.asarray(rng.normal(12, 3, (n_sites, T)).astype(np.float32))
    sim = jnp.asarray(rng.normal(13, 3, (n_sites, T)).astype(np.float32))
    q = jnp.asarray(equally_spaced_nodes(nq).astype(np.float32))
    brackets = device_brackets(gi, "linear")

    def step(carry):
        # one-dispatch fused train+adjust (numerically identical to the
        # two-call train -> adjust sequence; parity-tested on CPU and TPU)
        r, h, s = carry
        scen, _, _ = eqm_train_adjust_windowed(
            r, h, s, gi.merge_plan, q, brackets,
            kind="+", interp="linear", extrapolation="constant",
            assume_finite=True,  # bench data is constructed finite
        )
        return jnp.nansum(scen)

    import jax as _jax

    value, spread = _inscan_rate(_jax, jnp, step, (ref, hist, sim), n_sites * n_years)
    return round(value, 1), spread


def _bench_mbcn(jnp):
    """Secondary BASELINE metric: MBCn/NpdfTransform training iterations/s
    (64 sites x 3 variables x 30-yr daily, 20 rotations).

    The public-API path is run once for warmth/validation; the RATE is then
    taken on the same jitted train core the public call dispatches
    (``_mbcn_train_block`` — at group="time" each MBCn.train is exactly one
    such dispatch), chained through ``_inscan_rate`` so relay dispatch+fetch
    latency amortizes over the in-scan steps instead of polluting a
    single-call timing — the round-4 metric's spread under device contention
    (0.275 measured) came entirely from that un-amortized latency."""
    import jax

    from xsdba_tpu import DataArray, MBCn, date_range
    from xsdba_tpu.models.mbcn import _mbcn_train_block
    from xsdba_tpu.ops.correction import equally_spaced_nodes
    from xsdba_tpu.ops.rotation import rand_rot_matrix
    from xsdba_tpu.utils.grouper import Grouper

    rng = np.random.default_rng(3)
    S, V, T = 64, 3, 365 * 30
    t = date_range("1981-01-01", periods=T, freq="D", calendar="noleap")
    mv = np.array(["tasmax", "pr", "huss"])

    def mk(seed):
        r = np.random.default_rng(seed)
        return DataArray(
            r.normal(10, 3, (S, V, T)).astype(np.float32),
            ("site", "multivar", "time"),
            {"time": t, "multivar": mv, "site": np.arange(S)},
            {"units": ""},
            "data",
        )

    n_iter = 20
    ref, hist = mk(1), mk(2)
    kw = dict(base_kws={"nquantiles": 50, "group": "time"}, n_iter=n_iter, n_escore=-1)
    obj = MBCn.train(ref, hist, **kw)  # public API: compile + warm + validate
    assert np.isfinite(np.asarray(obj.ds["af_q"].data).ravel()[0])

    # core inputs exactly as MBCn._train builds them ([V, S, T] layout,
    # identity group gather for group="time")
    refa = jnp.asarray(np.moveaxis(np.asarray(ref.data), 1, 0))
    hista = jnp.asarray(np.moveaxis(np.asarray(hist.data), 1, 0))
    gidx = jnp.asarray(Grouper("time").indexes(t).gather_idx)
    rotj = jnp.asarray(rand_rot_matrix(V, num=n_iter), dtype=refa.dtype)
    qj = jnp.asarray(equally_spaced_nodes(50).astype(np.float32))

    def step(carry):
        r, h = carry
        af_q, _ = _mbcn_train_block.__wrapped__(
            r, h, gidx, rotj, qj, interp="nearest", extrap="constant", n_escore=-1
        )
        return jnp.nansum(af_q)

    rate, spread = _inscan_rate(
        jax, jnp, step, (refa, hista), gpy_per_step=n_iter, n_steps=6
    )
    return round(rate, 1), spread


if __name__ == "__main__":
    main()
