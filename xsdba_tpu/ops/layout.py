"""Device-layout helpers shared by the regular-period fast paths."""

from __future__ import annotations

import jax.numpy as jnp


def aligned_swap_last2(x, pad_a: int, pad_b: int):
    """Swap the last two axes ``[..., A, B] -> [..., B, A]`` with both dims
    padded to (``pad_a``, ``pad_b``) multiples first.

    XLA lowers an unaligned ``swapaxes`` over a long trailing axis as an
    element gather (~150 ms at the production [150-year, 365-day] shape,
    B=512, on v5e); padding the operand so it tiles onto (8, 128) vregs
    turns the same transpose into a layout change (~7 ms), bit-exact after
    the crop.  Callers pass (8, 128) on the forward trip and (128, 8) on
    the inverse (docs/PERFORMANCE.md, "Heavy-config state").
    """
    A, B = x.shape[-2:]
    a_pad = -(-A // pad_a) * pad_a
    b_pad = -(-B // pad_b) * pad_b
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(0, a_pad - A), (0, b_pad - B)])
    return jnp.swapaxes(xp, -1, -2)[..., :B, :A]
