"""Isolate the Mosaic failure: Element-indexed load alone, then merge body."""

import functools
import sys
import traceback

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def report(name, fn):
    try:
        out = fn()
        print(f"[OK] {name}: {out}", flush=True)
        return True
    except Exception:
        print(f"[FAIL] {name}:", flush=True)
        traceback.print_exc()
        print("-" * 60, flush=True)
        return False


def main():
    from jax.experimental import pallas as pl

    B, Dp, m, wpad, tile_b, G = 16, 64, 256, 32, 8, 20
    rng = np.random.default_rng(0)
    S = jnp.asarray(np.sort(rng.normal(size=(B, Dp, m)).astype(np.float32), axis=-1))

    espec = pl.BlockSpec(
        (pl.Element(tile_b), pl.Element(wpad), pl.Element(m)),
        lambda i, g: (i * tile_b, g, 0),
    )

    # A) Element-indexed load + plain reduction
    def k_sum(win_ref, out_ref):
        out_ref[...] = jnp.sum(win_ref[...], axis=1)

    def run_sum():
        out = pl.pallas_call(
            k_sum,
            grid=(B // tile_b, G),
            in_specs=[espec],
            out_specs=pl.BlockSpec((tile_b, m), lambda i, g: (i, g)),
            out_shape=jax.ShapeDtypeStruct((B, G * m), jnp.float32),
        )(S)
        return float(jnp.nansum(out))

    ok_a = report("element_load_sum", run_sum)

    # B) roll + iota + min/max on a plain (non-element) block
    def k_roll(x_ref, o_ref):
        from jax.experimental.pallas import tpu as pltpu

        x = x_ref[...]
        pos = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
        r = pltpu.roll(x, shift=m - 8, axis=x.ndim - 1)
        o_ref[...] = jnp.where((pos & 8) == 0, jnp.minimum(x, r), jnp.maximum(x, r))

    def run_roll():
        out = pl.pallas_call(
            k_roll,
            grid=(B // tile_b,),
            in_specs=[pl.BlockSpec((tile_b, Dp, m), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tile_b, Dp, m), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Dp, m), jnp.float32),
        )(S)
        return float(jnp.nansum(out))

    ok_b = report("roll_minmax_3d", run_roll)

    # C) the merge cascade on a plain block (no Element indexing)
    from xsdba_tpu.ops.pallas.merge_kernel import _merge_cascade, _roll_pallas

    def k_merge(x_ref, o_ref):
        o_ref[...] = _merge_cascade(x_ref[...], _roll_pallas)

    def run_merge():
        S32 = S[:, :wpad, :]
        out = pl.pallas_call(
            k_merge,
            grid=(B // tile_b,),
            in_specs=[pl.BlockSpec((tile_b, wpad, m), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((tile_b, wpad * m), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, wpad * m), jnp.float32),
        )(S32)
        return float(jnp.nansum(out))

    ok_c = report("merge_cascade_plain_block", run_merge)

    # D) full kernel via the library entry
    def run_full():
        from xsdba_tpu.ops.pallas.merge_kernel import merged_window_rows

        out = merged_window_rows(S, 31, G)
        return float(jnp.nansum(out))

    report("merged_window_rows", run_full)


if __name__ == "__main__":
    main()
