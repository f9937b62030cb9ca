"""Windowed-group merge kernel: k-way merge of pre-sorted lists in VMEM.

The TPU answer to the reference's rolling-window grouped quantile
(``base.py:261-265`` + ``nbutils.quantile``): a 31-day window amplifies the
sort workload 31x because every value participates in 31 groups.  Instead of
re-sorting the amplified gather matrix (XLA sort ~ 100 effective HBM passes),
sort each day-of-year's per-year list ONCE (1x data, tiny rows), then merge
the ``window`` pre-sorted lists of each group entirely in VMEM with a
bitonic merge cascade — one HBM read of the (1x) sorted lists, one write of
the merged rows, all compare-exchange work on the VPU.

Mosaic-friendly formulation: Pallas TPU lowers neither `rev` (flip) nor
strided slices nor dynamic_slice, so the cascade uses ONLY roll + iota-mask
+ min/max along the LANE axis.  The reverse that a bitonic merge classically
needs is moved to data prep: input rows alternate sort direction by row
parity (odd rows pre-sorted DESCENDING — a free ``jnp.flip`` in XLA), making
every concatenated pair bitonic; each cascade level then emits runs with
alternating directions via a direction mask, so no in-kernel reverse is ever
needed.  The same code lowers in Pallas and plain XLA (the fallback path)
with bit-identical results.

Padding is +inf (not NaN): min/max networks are NaN-unsafe, and +inf-last
ordering equals XLA's NaN-last sort order for finite data.  Valid counts are
tracked separately (see ``ops.quantile.windowed_group_quantile``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "alternate_row_directions",
    "merged_window_rows",
    "merged_window_rows_shared",
    "merged_window_rows_xla",
]


def _roll_xla(z, shift, axis):
    return jnp.roll(z, shift, axis=axis)


def _roll_pallas(z, shift, axis):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.roll(z, shift=shift % z.shape[axis], axis=axis)


def _merge_cascade(x, roll):
    """[..., W, m] runs with row-parity-alternating directions -> [..., W*m]
    ascending.  ``W``, ``m`` powers of two; either phase (even rows ascending
    or even rows descending) is accepted — a pair of opposite-direction runs
    is bitonic either way.

    Sign-space formulation: a descending run of ``x`` equals the negation of
    an ascending run of ``-x``, so instead of the direction-masked double
    min/max network, whole pairs that must emit descending are *negated* and
    every level runs the cheap ascending-only merge (5 vec-ops/stage vs 9).
    Odd runs then sit in storage negated; the next level's entry negation
    folds the store-sign and the new pair-sign into ONE select-negate per
    level: level 0 negates whole odd pairs ([+,+,-,-] by row), later levels
    negate (pair parity) XOR (upper half) ([+,-,-,+]).  Signs cancel exactly
    at the final (ascending, pair-parity 0) level, so the output values are
    identical to the masked form (up to ±0.0 tie placement, which quantile
    extraction cannot observe).

    Grid layout: the runs stay [W, m] throughout (a run of flat length
    ``R*m`` occupies ``R`` consecutive rows, row-major), so every
    compare-exchange roll moves data along EITHER the short sublane axis
    (row strides, stage stride >= m) OR a single m-wide lane axis (stage
    stride < m) — never a W*m-wide lane axis.  On the measured v5e the wide
    lane rolls were the cascade's dominant cost (PERFORMANCE.md).  The flat
    ascending result IS the row-major [W, m] block, so no relayout is ever
    needed.  Returns [..., W*m] (a free row-major reshape in XLA; the Pallas
    kernel keeps it 3-D).
    """
    return _merge_cascade_grid(x, roll).reshape(x.shape[:-2] + (x.shape[-2] * x.shape[-1],))


def _cascade_level(x, roll, j: int):
    """One level of the grid cascade on [..., R, m]: entry sign negation for
    level ``j`` (runs of ``2**j`` rows pair into ``2**(j+1)``-row runs), then
    the ascending-only row- and lane-stride compare-exchange stages.  Works
    on any row count (runs merge independently by the iota masks)."""
    m = x.shape[-1]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 2)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if j == 0:
        neg = ((row >> 1) & 1) == 1
    else:
        neg = (((row >> (j + 1)) ^ (row >> j)) & 1) == 1
    x = jnp.where(neg, -x, x)
    sr = 1 << j
    while sr >= 1:
        fwd = roll(x, -sr, x.ndim - 2)
        bwd = roll(x, sr, x.ndim - 2)
        is_low = (row & sr) == 0
        x = jnp.where(is_low, jnp.minimum(x, fwd), jnp.maximum(x, bwd))
        sr //= 2
    s = m // 2
    while s >= 1:
        fwd = roll(x, -s, x.ndim - 1)
        bwd = roll(x, s, x.ndim - 1)
        is_low = (lane & s) == 0
        x = jnp.where(is_low, jnp.minimum(x, fwd), jnp.maximum(x, bwd))
        s //= 2
    return x


def _merge_cascade_grid(x, roll):
    """Core of :func:`_merge_cascade`: [..., W, m] alternating-direction
    sorted rows -> [..., W, m] whose row-major flattening is ascending."""
    W = x.shape[-2]
    levels = W.bit_length() - 1  # log2(W) merge levels
    for j in range(levels):
        x = _cascade_level(x, roll, j)
    return x


def _bitonic_sort_lastaxis(x, roll, desc=None):
    """Full bitonic sort of the last axis (len m, power of two).

    Ascending by default; rows where ``desc`` (mask constant along the last
    axis) is True sort descending.  Same roll+iota formulation as the merge.

    Sign-space network: each phase's descending blocks are handled by
    negating those blocks and running the ascending-only compare-exchange
    stages (5 vec-ops/stage instead of 9); consecutive phases fold the
    negate-back/negate-in into one select-negate (XOR of the block masks).
    """
    m = x.shape[-1]
    pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    cur = None  # mask of currently-negated elements
    k = 2
    while k <= m:
        # phase k merges bitonic runs of length k; direction alternates by
        # the k-block of the position (standard bitonic sort network)
        blk_desc = (pos & k) != 0 if k < m else None
        if desc is not None:
            blk_desc = desc if blk_desc is None else (blk_desc ^ desc)
        flip = blk_desc if cur is None else (cur if blk_desc is None else (cur ^ blk_desc))
        if flip is not None:
            x = jnp.where(flip, -x, x)
        cur = blk_desc
        s = k // 2
        while s >= 1:
            fwd = roll(x, -s, x.ndim - 1)
            bwd = roll(x, s, x.ndim - 1)
            is_low = (pos & s) == 0
            x = jnp.where(is_low, jnp.minimum(x, fwd), jnp.maximum(x, bwd))
            s //= 2
        k *= 2
    if cur is not None:
        x = jnp.where(cur, -x, x)
    return x


def _sort_rows_kernel(x_ref, out_ref):
    """Sort each row of the slab: even (padded-index) rows ascending, odd
    rows descending — producing the direction-alternating layout the merge
    cascade consumes, without any XLA sort or flip."""
    x = x_ref[...]  # [TB, Dp, m]
    rid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    out_ref[...] = _bitonic_sort_lastaxis(x, _roll_pallas, desc=(rid % 2) == 1)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_b"))
def sort_rows_alternating(x, interpret: bool = False, tile_b: int = 16):
    """Pallas row sort with alternating directions: [B, Dp, m] (+inf for
    NaN/pads) -> rows sorted asc (even row index) / desc (odd).

    Replaces ``jnp.sort`` + ``alternate_row_directions`` on the merge-plan
    slab — XLA's sort on this chip runs ~140M elem/s while the in-VMEM
    bitonic network is compute-bound at >5G elem/s.
    """
    pl = _ensure_pl()
    B, Dp, m = x.shape
    Bp = -(-B // tile_b) * tile_b
    if Bp != B:
        x = jnp.pad(x, ((0, Bp - B), (0, 0), (0, 0)), constant_values=jnp.inf)
    # rows are independent: block the row axis too so kernel temporaries
    # (several row-block-sized buffers) stay well inside VMEM.  Even block
    # sizes keep the global row parity equal to the in-block parity.
    rows_blk = 32 if Dp % 32 == 0 else Dp
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        _sort_rows_kernel,
        grid=(Bp // tile_b, Dp // rows_blk),
        in_specs=[pl.BlockSpec((tile_b, rows_blk, m), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((tile_b, rows_blk, m), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, Dp, m), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)
    return out[:B]


def alternate_row_directions(s, axis_rows: int = -2):
    """Flip odd rows of ascending-sorted lists to descending (XLA-side prep
    for the merge cascade's alternating-direction layout; Pallas cannot
    lower `rev`)."""
    ridx = jnp.arange(s.shape[axis_rows]) % 2 == 1
    shape = [1] * s.ndim
    shape[axis_rows] = s.shape[axis_rows]
    return jnp.where(ridx.reshape(shape), jnp.flip(s, axis=-1), s)


def _merge_kernel(slab_ref, out_ref, *, window: int, wpad: int, out_rows: int, pad_rows: int):
    """One (site-tile, group) program: slice the window rows off the resident
    slab, mask the pad rows, merge, emit.

    ``slab_ref`` holds the batch tile's FULL padded doy axis in VMEM (its
    block index ignores ``g``, so Pallas DMAs it once per batch tile and all
    group programs reuse it); group ``g``'s window is the dynamic-start ref
    load ``rows [g, g+wpad)`` — a ref ``pl.ds`` load, which Mosaic supports
    where a value-level dynamic_slice / element-offset block is not.  The
    phase of the direction alternation depends on ``g``'s parity, which the
    cascade accepts.
    """
    g = pl.program_id(1)
    # Mosaic requires sublane-dim dynamic starts to be provably 8-aligned:
    # load an aligned (wpad+8)-row superset, then select the 0..7 offset with
    # scalar-predicated selects over static slices (no gather, no dyn-slice).
    base = pl.multiple_of((g // 8) * 8, 8)
    sup = slab_ref[:, pl.ds(base, wpad + 8), :]  # [TB, wpad+8, m]
    off = g - base
    win = sup[:, 0:wpad, :]
    for k in range(1, 8):
        win = jnp.where(off == k, sup[:, k : k + wpad, :], win)
    if wpad > window:
        ridx = jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
        win = jnp.where(ridx >= window, jnp.inf, win)
    merged = _merge_cascade_grid(win, _roll_pallas)  # [TB, wpad, m] row-major asc
    merged = merged[:, :out_rows, :]
    if pad_rows:  # wpad < 8: Mosaic needs 8-row out blocks — append +inf rows
        merged = jnp.concatenate(
            [merged, jnp.full(merged.shape[:1] + (pad_rows, merged.shape[-1]), jnp.inf, merged.dtype)],
            axis=1,
        )
    out_ref[...] = merged


# populated lazily so the module imports without pallas
pl = None


def _ensure_pl():
    global pl
    if pl is None:
        from jax.experimental import pallas as _pl

        pl = _pl
    return pl


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(
    jax.jit,
    static_argnames=("window", "n_groups", "interpret", "tile_b", "out_width"),
)
def merged_window_rows(
    s_pad,
    window: int,
    n_groups: int,
    interpret: bool = False,
    tile_b: int | None = None,
    out_width: int | None = None,
):
    """Merge each group's ``window`` consecutive pre-sorted rows in VMEM.

    s_pad: [B, Dp, m] float32 — per-(site, day) runs sorted ascending on even
    rows and DESCENDING on odd rows (see :func:`alternate_row_directions`),
    +inf padded, laid out so group ``g``'s window is rows ``[g, g+window)``;
    ``Dp`` must leave ``wpad`` spare rows past the last window start (the
    caller pads).  Returns [B, n_groups, out_width] merged ascending rows
    (+inf tails); ``out_width`` (a multiple of 128, default ``wpad*m``)
    truncates the stored tail — positions past the maximum possible valid
    count are always +inf padding, so skipping them saves HBM traffic.
    """
    pl = _ensure_pl()
    B, Dp, m = s_pad.shape
    if tile_b is None:
        # bigger batch tiles measured ~2x per doubling on v5e (fewer
        # programs, deeper pipelining); fall back for small batches
        tile_b = 32 if B >= 32 else (16 if B >= 16 else 8)
    wpad = _next_pow2(window)
    if out_width is None:
        out_width = wpad * m
    # the out block is [rows, m]-shaped, so the stored width is a multiple of
    # the list length m (rows past the max valid count are pure +inf); the
    # row count is rounded to Mosaic's 8-sublane granularity, padding with
    # +inf rows when the merge itself yields fewer
    out_rows = min(-(-out_width // m), wpad)
    rows_store = -(-out_rows // 8) * 8
    out_rows = min(rows_store, wpad)
    pad_rows = rows_store - out_rows
    out_width = rows_store * m
    # last aligned superset load must fit: base(G-1) + wpad + 8 <= Dp
    assert ((n_groups - 1) // 8) * 8 + wpad + 8 <= Dp, "need spare rows past the last window"
    Bp = -(-B // tile_b) * tile_b
    if Bp != B:
        s_pad = jnp.pad(s_pad, ((0, Bp - B), (0, 0), (0, 0)), constant_values=jnp.inf)

    # The slab block's index ignores g, so Pallas DMAs it once per batch tile
    # and every group program reuses it from VMEM.  Output kept [rows, m]
    # 3-D (the row-major block IS the flat ascending run — no sublane->lane
    # relayout in the kernel).  The scoped-VMEM cap is raised past the 16 MB
    # default so larger batch tiles can cut the program count.
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        functools.partial(
            _merge_kernel, window=window, wpad=wpad, out_rows=out_rows, pad_rows=pad_rows
        ),
        grid=(Bp // tile_b, n_groups),
        in_specs=[
            pl.BlockSpec((tile_b, Dp, m), lambda i, g: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_b, rows_store, m), lambda i, g: (i, g, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, n_groups * rows_store, m), s_pad.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(s_pad)
    return out[:B].reshape(B, n_groups, out_width)


@functools.partial(jax.jit, static_argnames=("window", "n_groups", "out_width"))
def merged_window_rows_xla(s_pad, window: int, n_groups: int, out_width: int | None = None):
    """Pure-XLA fallback with identical outputs (used off-TPU / for parity).

    Gathers the window rows per group then runs the same merge cascade; the
    compare-exchange stages round-trip HBM here, so this is only competitive
    with re-sorting — the Pallas path is the fast one.
    """
    B, Dp, m = s_pad.shape
    wpad = _next_pow2(window)
    base = jnp.arange(n_groups)[:, None] + jnp.arange(wpad)[None, :]  # [G, wpad]
    win = s_pad[:, base, :]  # [B, G, wpad, m]
    if wpad > window:
        win = jnp.where(jnp.arange(wpad)[None, None, :, None] >= window, jnp.inf, win)
    merged = _merge_cascade(win, _roll_xla)
    return merged if out_width is None else merged[..., :out_width]


# ---------------------------------------------------------------------------
# Shared-dyadic merge: amortize the cascade's lower levels across the
# overlapping windows.  Adjacent groups share window-1 rows, so the aligned
# dyadic runs (2, 4, .., 2^L rows) are built ONCE over the whole slab — they
# are exactly the grid cascade's levels — and each group then pays only a
# smallest-first fold of its ~5-6 dyadic window segments instead of the full
# cascade: per-group stage-visits drop from sum over all levels to roughly
# the top two levels (~2x at window 31).
#
# Direction algebra: a 2^k-row build run at absolute row offset o is stored
# ascending with sign (-1)^(o >> k); its VALUES therefore read ascending or
# descending by that parity.  Two runs merge directly iff their value
# directions differ (the pair is bitonic in any common sign space), and the
# OUTPUT direction is free (feed-negation trick) — so the fold plans each
# intermediate output direction to oppose the next operand's fixed
# direction.  With ``classes = 2^L`` groups per kernel the parities are
# static except for the single largest run, whose parity alternates with the
# per-class group index — handled by one scalar-masked negate.
# ---------------------------------------------------------------------------


def _dyadic_segments(c: int, window: int, max_rows: int):
    """Aligned dyadic segments of [c, c+window): (delta, rows) pairs."""
    segs = []
    p, end = c, c + window
    while p < end:
        size = 1
        while size * 2 <= max_rows and p % (size * 2) == 0 and p + size * 2 <= end:
            size *= 2
        segs.append((p - c, size))
        p += size
    return segs


class _Dir:
    """Value read-direction: ``asc ^ (flip and (group_index & 1))``."""

    def __init__(self, asc: bool, flip: bool = False):
        self.asc = asc
        self.flip = flip

    def opposite(self) -> "_Dir":
        return _Dir(not self.asc, self.flip)

    def same_as(self, other):
        """True / False when statically known, None when parity-dependent."""
        if self.flip == other.flip:
            return self.asc == other.asc
        return None


def _run_dir(offset_static: int, k: int, classes: int) -> _Dir:
    """Direction of the 2^k-row run at row offset ``classes*g' + offset``."""
    if k == 0:
        return _Dir(offset_static % 2 == 0)  # base rows alternate asc/desc
    par = (offset_static >> k) & 1
    if (1 << k) < classes:
        return _Dir(par == 0)
    if (1 << k) == classes:
        return _Dir(par == 0, flip=True)
    raise ValueError("run larger than the class modulus")


def _fold_plan(c: int, window: int, classes: int):
    """(delta, rows, level) fold order: smallest first; equal sizes keep
    offset order (adjacent same-size top-level runs alternate parity, so
    they merge with each other directly).  Returns None when the plan would
    need a parity-dependent direction before the final steps (caller then
    uses the plain per-group cascade)."""
    segs = _dyadic_segments(c, window, classes)
    runs = [(d, r, r.bit_length() - 1) for d, r in sorted(segs, key=lambda s: (s[1], s[0]))]
    if len(runs) < 2:
        return None
    return runs


def _bitonic_asc_grid(feed, m: int, dr: int | None = None, data_at: str | None = None):
    """Ascending merge of ONE bitonic flat run [..., R, m] in grid layout.

    ``dr`` (static) is the data-row bound: at most ``dr`` rows hold non-pad
    values in the SORTED result; pads are +inf (``data_at="front"``: data
    ends up in the first ``dr`` rows) or -inf (``data_at="back"``: last
    ``dr``).  After the stride-``s`` row stage every aligned ``s``-row block
    holds its final elements, so rows provably outside the data extent are
    cropped progressively DURING the row cascade, and the per-row lane
    stages then run on the ``dr`` surviving rows only — at the heavy shape
    (window 31, 151 valid of 256 lanes) this removes ~1/3 of the fold's
    compare-exchange slots.  Returns [..., dr, m] when ``dr`` is given (the
    cropped rows are pure pads — the output multiset is unchanged, so
    results stay bit-identical to the uncropped network)."""
    R = feed.shape[-2]
    if dr is None or dr >= R:
        dr, data_at = R, None
    sr = R // 2
    while sr >= 1:
        row = jax.lax.broadcasted_iota(jnp.int32, feed.shape, feed.ndim - 2)
        fwd = _roll_pallas(feed, -sr, feed.ndim - 2)
        bwd = _roll_pallas(feed, sr, feed.ndim - 2)
        is_low = (row & sr) == 0
        feed = jnp.where(is_low, jnp.minimum(feed, fwd), jnp.maximum(feed, bwd))
        if data_at is not None and sr > 1:
            keep = -(-dr // sr) * sr
            if keep < feed.shape[-2]:
                feed = (
                    feed[..., :keep, :]
                    if data_at == "front"
                    else feed[..., feed.shape[-2] - keep :, :]
                )
        sr //= 2
    if dr < feed.shape[-2]:
        feed = feed[..., :dr, :] if data_at == "front" else feed[..., feed.shape[-2] - dr :, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, feed.shape, feed.ndim - 1)
    s = m // 2
    while s >= 1:
        fwd = _roll_pallas(feed, -s, feed.ndim - 1)
        bwd = _roll_pallas(feed, s, feed.ndim - 1)
        is_low = (lane & s) == 0
        feed = jnp.where(is_low, jnp.minimum(feed, fwd), jnp.maximum(feed, bwd))
        s //= 2
    return feed


def _build_levels_kernel(slab_ref, lv_ref, *, n_levels: int):
    """Grid-cascade levels 0..n_levels-1 over the whole slab; level k's
    snapshot (aligned 2^(k+1)-row runs, sign-stored) lands in lv_ref[:, k]."""
    x = slab_ref[...]
    for j in range(n_levels):
        x = _cascade_level(x, _roll_pallas, j)
        lv_ref[:, j, :, :] = x


def _fold_class_body(
    slab_ref, lv_ref, gq, gpar, *, c, classes, window, m, ymax, out_rows, plan
):
    """One class's window fold for per-class group index ``gq`` (a traced
    scalar); returns the merged rows [TB, out_rows, m].  Shared by the
    per-class and the fused all-classes kernels.

    Operands and accumulators are kept COMPACT: each block holds exactly
    ``ceil(valid/m)`` data rows (``valid`` the worst-case member count so
    far, ``ymax`` per base row) — the pure-pad rows a pow2 layout would
    carry are materialized only as the merge feed's pad block and cropped
    again inside the merge network (``_bitonic_asc_grid``'s progressive
    row-stage crops + data-rows-only lane stages).  Multiset-preserving
    throughout, so the emitted rows are bit-identical to the uncropped
    cascade (pinned vs the re-sort oracle in tests/test_merge_quantile.py).
    """
    TB = slab_ref.shape[0]

    def _crop(w, dr: int, d: _Dir):
        """Crop a sorted VALUES block to its ``dr`` data rows (pads are at
        the tail when ascending, at the head when descending; parity-select
        for flip runs)."""
        rows = w.shape[1]
        if dr >= rows:
            return w
        if d.flip:
            asc_now = jnp.logical_xor(jnp.asarray(d.asc), gpar)
            return jnp.where(asc_now, w[:, :dr, :], w[:, rows - dr :, :])
        return w[:, :dr, :] if d.asc else w[:, rows - dr :, :]

    def values(delta: int, rows: int, k: int):
        """Materialize a run's VALUES (compacted) and its direction."""
        off = (c + delta) % 8
        base = pl.multiple_of(classes * gq + (c + delta) - off, 8)
        d = _run_dir(c + delta, k, classes)
        if k == 0:
            sup = slab_ref[:, pl.ds(base, rows + 8), :]
            w = sup[:, off : off + rows, :]
        else:
            sup = lv_ref[:, k - 1, pl.ds(base, rows + 8), :]
            w = sup[:, off : off + rows, :]
            # v = sigma * stored; sigma's sign bit IS the direction bit
            if d.flip:
                neg = jnp.logical_xor(jnp.asarray(not d.asc), gpar)
                w = jnp.where(neg, -w, w)
            elif not d.asc:
                w = -w
        return _crop(w, -(-(rows * ymax) // m), d), d

    def sort_bitonic_to(w, out: _Dir, valid: int):
        """Sort a bitonic VALUES block to direction ``out``, compacted to
        its ``ceil(valid/m)`` data rows."""
        dr = min(-(-valid // m), w.shape[1])
        R0 = w.shape[1]
        Rp = _next_pow2(R0)
        if Rp != R0:
            # The merge network is only valid for pow2 row counts (its row
            # stages roll cyclically), but the bootstrap can hand us an
            # exact-cropped single run with any row count.  That operand is
            # MONOTONE, and a monotone block stays bitonic in every sign
            # space with constant +inf rows appended at the tail (they group
            # with the existing value-space pads, so the dr-side crops below
            # are unchanged).
            w = jnp.concatenate(
                [w, jnp.full((TB, Rp - R0, m), jnp.inf, w.dtype)], axis=1
            )
        if out.flip:
            tau_neg = jnp.logical_xor(jnp.asarray(not out.asc), gpar)
            w = jnp.where(tau_neg, -w, w)
            # pad sign (and so the data side) is parity-dependent: skip the
            # in-network row crops, crop both candidate sides after
            w = _bitonic_asc_grid(w, m)
            rows = w.shape[1]
            if dr < rows:
                w = jnp.where(tau_neg, w[:, rows - dr :, :], w[:, :dr, :])
            return jnp.where(tau_neg, -w, w)
        if not out.asc:
            # negated: pads are -inf, data lands in the LAST dr rows
            return -_bitonic_asc_grid(-w, m, dr=dr, data_at="back")
        return _bitonic_asc_grid(w, m, dr=dr, data_at="front")

    def merge(acc, acc_dir: _Dir, op, op_dir: _Dir, out: _Dir, valid: int):
        """Merge two opposite-direction VALUES runs to direction ``out``.

        +inf pads must extend a monotone flank, not break the single
        rise-fall: with acc ascending they go BETWEEN acc and op (peak),
        with acc descending they go in FRONT (valley).  acc's direction can
        be parity-dependent (flip), so both layouts are built and selected
        by the scalar — the layouts differ only in the pad block position.
        (Compact blocks still carry up to m-1 pads inside their boundary
        row; those sit on the same monotone flank, so bitonicity holds.)
        """
        del op_dir
        ra, ro = acc.shape[1], op.shape[1]
        R = _next_pow2(ra + ro)
        npad = R - ra - ro
        if npad:
            pad = jnp.full((TB, npad, m), jnp.inf, acc.dtype)
            mid = jnp.concatenate([acc, pad, op], axis=1)
            if acc_dir.flip:
                front = jnp.concatenate([pad, acc, op], axis=1)
                acc_asc = jnp.logical_xor(jnp.asarray(acc_dir.asc), gpar)
                w = jnp.where(acc_asc, mid, front)
            elif acc_dir.asc:
                w = mid
            else:
                w = jnp.concatenate([pad, acc, op], axis=1)
        else:
            w = jnp.concatenate([acc, op], axis=1)
        return sort_bitonic_to(w, out, valid)

    d0, r0, k0 = plan[0]
    acc, acc_dir = values(d0, r0, k0)
    valid = r0 * ymax
    want0 = _run_dir(c + plan[1][0], plan[1][2], classes).opposite()
    if acc_dir.same_as(want0) is not True:
        # bootstrap: re-sort the (monotone == bitonic) first run; covers
        # both the static-flip and parity-dependent cases (identity when
        # the direction already matches)
        acc = sort_bitonic_to(acc, want0, valid)
        acc_dir = want0

    for i in range(1, len(plan)):
        dd, rr, kk = plan[i]
        op, op_dir = values(dd, rr, kk)
        if i + 1 < len(plan):
            want = _run_dir(c + plan[i + 1][0], plan[i + 1][2], classes).opposite()
        else:
            want = _Dir(True)
        valid += rr * ymax
        acc = merge(acc, acc_dir, op, op_dir, want, valid)
        acc_dir = want

    R = acc.shape[1]
    if R < out_rows:
        acc = jnp.concatenate([acc, jnp.full((TB, out_rows - R, m), jnp.inf, acc.dtype)], axis=1)
    return acc[:, :out_rows, :]


def _shared_fold_kernel(
    slab_ref, lv_ref, out_ref, *, c, classes, window, m, ymax, out_rows, plan
):
    gq = pl.program_id(1)
    gpar = (gq & 1) == 1  # scalar bool: parity of the group within the class
    out_ref[...] = _fold_class_body(
        slab_ref, lv_ref, gq, gpar,
        c=c, classes=classes, window=window, m=m, ymax=ymax, out_rows=out_rows, plan=plan,
    )


def _shared_fold_fused_kernel(
    slab_ref, lv_ref, out_ref, *, classes, window, m, ymax, out_rows, plans, g_counts
):
    """All classes' folds in ONE program: the slab and level blocks are
    fetched into VMEM once per batch tile instead of once per class — the
    per-class launches re-read them ``classes`` times (the dominant HBM
    traffic of the fold stage).  Classes with fewer groups clamp their
    per-class index (the extra output rows are +inf-cropped by the caller)."""
    gq = pl.program_id(1)
    for c in range(classes):
        sl = slice(c * out_rows, (c + 1) * out_rows)
        if plans[c] is None:
            out_ref[:, sl, :] = jnp.full(
                (slab_ref.shape[0], out_rows, m), jnp.inf, slab_ref.dtype
            )
            continue
        gq_eff = jnp.minimum(gq, g_counts[c] - 1)
        gpar = (gq_eff & 1) == 1
        out_ref[:, sl, :] = _fold_class_body(
            slab_ref, lv_ref, gq_eff, gpar,
            c=c, classes=classes, window=window, m=m, ymax=ymax,
            out_rows=out_rows, plan=plans[c],
        )


def merged_window_rows_shared(
    s_pad,
    window: int,
    n_groups: int,
    interpret: bool = False,
    tile_b: int | None = None,
    out_width: int | None = None,
    ymax: int | None = None,
    fuse_classes: bool | None = None,
):
    """Shared-dyadic version of :func:`merged_window_rows` (same contract).

    See :func:`_merged_window_rows_shared_impl`; this wrapper resolves the
    ``fuse_classes`` default from the ``fuse_fold_classes`` runtime option
    (one fused all-classes fold program vs per-class launches; measured on
    v5e at B=512/G=365/window=31/150yr: fused 201 ms vs per-class 228 ms per
    fold, heavy bench 131.7k vs 120.2k gp-yr/s — fused wins, bit-exact)
    OUTSIDE the jit so the resolved value is part of the compile-cache key.
    NOTE: callers jitting over this function must thread ``fuse_classes`` as
    their own static arg (as ``_windowed_group_quantile_core`` does) —
    an option flip cannot invalidate an outer trace that baked the value."""
    if fuse_classes is None:
        from ...utils.options import get_option

        fuse_classes = get_option("fuse_fold_classes")
    return _merged_window_rows_shared_impl(
        s_pad, window, n_groups, interpret, tile_b, out_width, ymax, bool(fuse_classes)
    )


@functools.partial(
    jax.jit,
    static_argnames=("window", "n_groups", "interpret", "tile_b", "out_width", "ymax", "fuse_classes"),
)
def _merged_window_rows_shared_impl(
    s_pad,
    window: int,
    n_groups: int,
    interpret: bool = False,
    tile_b: int | None = None,
    out_width: int | None = None,
    ymax: int | None = None,
    fuse_classes: bool = False,
):
    """Shared-dyadic version of :func:`merged_window_rows` (same contract).

    Builds the aligned dyadic levels once per slab, then folds each group's
    ~5-6 window segments per class kernel.  Requires ``window >= 8`` (class
    modulus >= 8 keeps the superset row loads provably aligned).  ``ymax``
    (valid entries per base row, <= m) tightens the fold's pad compaction.
    ``fuse_classes`` runs every class's fold in ONE program (slab+levels
    VMEM-resident once per batch tile instead of once per class); bit-exact
    with the per-class launches.
    """
    pl_mod = _ensure_pl()
    from jax.experimental.pallas import tpu as pltpu

    B, Dp, m = s_pad.shape
    wpad = _next_pow2(window)
    classes = min(max(wpad // 2, 8), 16)
    L = classes.bit_length() - 1
    assert classes >= 8 and (1 << L) == classes
    if tile_b is None:
        tile_b = 16 if B >= 16 else 8  # 16-row tiles measured fastest on v5e
    if out_width is None:
        out_width = wpad * m
    out_rows = min(-(-out_width // m), wpad)
    rows_store = -(-out_rows // 8) * 8
    Bp = -(-B // tile_b) * tile_b
    if Bp != B:
        s_pad = jnp.pad(s_pad, ((0, Bp - B), (0, 0), (0, 0)), constant_values=jnp.inf)
    if ymax is None:
        ymax = m  # worst-case valid per row (loose; disables compaction)

    cp = None if interpret else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    # ---- build the aligned levels once ------------------------------------
    levels = pl_mod.pallas_call(
        functools.partial(_build_levels_kernel, n_levels=L),
        grid=(Bp // tile_b,),
        in_specs=[pl_mod.BlockSpec((tile_b, Dp, m), lambda i: (i, 0, 0))],
        out_specs=pl_mod.BlockSpec((tile_b, L, Dp, m), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, L, Dp, m), s_pad.dtype),
        interpret=interpret,
        compiler_params=cp,
    )(s_pad)

    if fuse_classes:
        g_max = -(-n_groups // classes)
        plans, g_counts = [], []
        for c in range(classes):
            g_c = -(-(n_groups - c) // classes) if c < n_groups else 0
            g_counts.append(max(g_c, 1))
            if g_c == 0:
                plans.append(None)
                continue
            plan = _fold_plan(c, window, classes)
            if plan is None:
                raise NotImplementedError("fold plan needs runtime bootstrap; use merged_window_rows")
            assert classes * (g_c - 1) + c + window + 8 <= Dp, "slab too short for superset loads"
            plans.append(tuple(plan))
        out = pl_mod.pallas_call(
            functools.partial(
                _shared_fold_fused_kernel,
                classes=classes, window=window, m=m, ymax=ymax,
                out_rows=rows_store, plans=tuple(plans), g_counts=tuple(g_counts),
            ),
            grid=(Bp // tile_b, g_max),
            in_specs=[
                pl_mod.BlockSpec((tile_b, Dp, m), lambda i, g: (i, 0, 0)),
                pl_mod.BlockSpec((tile_b, L, Dp, m), lambda i, g: (i, 0, 0, 0)),
            ],
            out_specs=pl_mod.BlockSpec(
                (tile_b, classes * rows_store, m), lambda i, g: (i, g, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((Bp, g_max * classes * rows_store, m), s_pad.dtype),
            interpret=interpret,
            compiler_params=cp,
        )(s_pad, levels)
        full = out.reshape(Bp, g_max * classes, rows_store, m)[:, :n_groups]
        return full[:B].reshape(B, n_groups, rows_store * m)

    # ---- per-class folds ---------------------------------------------------
    n_classes_used = classes
    outs = []
    for c in range(n_classes_used):
        g_c = -(-(n_groups - c) // classes) if c < n_groups else 0
        if g_c == 0:
            outs.append(None)
            continue
        plan = _fold_plan(c, window, classes)
        if plan is None:
            raise NotImplementedError("fold plan needs runtime bootstrap; use merged_window_rows")
        # superset loads must stay in range for the last group of the class
        assert classes * (g_c - 1) + c + window + 8 <= Dp, "slab too short for superset loads"
        out_c = pl_mod.pallas_call(
            functools.partial(
                _shared_fold_kernel,
                c=c,
                classes=classes,
                window=window,
                m=m,
                ymax=ymax,
                out_rows=rows_store,
                plan=plan,
            ),
            grid=(Bp // tile_b, g_c),
            in_specs=[
                pl_mod.BlockSpec((tile_b, Dp, m), lambda i, g: (i, 0, 0)),
                pl_mod.BlockSpec((tile_b, L, Dp, m), lambda i, g: (i, 0, 0, 0)),
            ],
            out_specs=pl_mod.BlockSpec((tile_b, rows_store, m), lambda i, g: (i, g, 0)),
            out_shape=jax.ShapeDtypeStruct((Bp, g_c * rows_store, m), s_pad.dtype),
            interpret=interpret,
            compiler_params=cp,
        )(s_pad, levels)
        outs.append(out_c.reshape(Bp, g_c, rows_store, m))

    # ---- interleave class outputs back to group order ----------------------
    Gc_max = max(o.shape[1] for o in outs if o is not None)
    stackable = []
    for c, o in enumerate(outs):
        if o is None:
            o = jnp.full((Bp, Gc_max, rows_store, m), jnp.inf, s_pad.dtype)
        elif o.shape[1] < Gc_max:
            o = jnp.concatenate(
                [o, jnp.full((Bp, Gc_max - o.shape[1], rows_store, m), jnp.inf, s_pad.dtype)],
                axis=1,
            )
        stackable.append(o)
    # [classes, B, Gc, rows, m] -> [B, Gc, classes, rows, m] -> [B, Gc*classes, ...]
    full = jnp.stack(stackable, axis=0).transpose(1, 2, 0, 3, 4)
    full = full.reshape(Bp, Gc_max * classes, rows_store, m)[:, :n_groups]
    return full[:B].reshape(B, n_groups, rows_store * m)
