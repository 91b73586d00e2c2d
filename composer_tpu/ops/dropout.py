"""Attention-dropout keep masks from 16-bit random words.

``jax.random.bernoulli`` draws a full 32-bit word per element to build an f32
uniform (23 usable mantissa bits). At score-sized shapes this is real money:
the 2048-ctx batch-8 band-attention probs draw ~2.3G samples per train step,
and mask generation measured 84 ms/step even on the TPU hardware rng
(TODO.md). Comparing raw 16-bit words against an integer threshold needs half
the random words and no int->float conversion; the keep probability is
quantised to 1/65536 (<= 2e-5 off the requested rate — the f32 path itself
quantises at 2^-23, and the 1/(1-rate) inverted-dropout scale stays exact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout_keep_mask(rng, rate: float, shape):
    """Bernoulli(1 - rate) boolean keep mask.

    Drop-in for ``jax.random.bernoulli(rng, 1 - rate, shape)`` at half the
    random-bit traffic. ``rate`` must be in [0, 1).
    """
    threshold = min(int(round(rate * 65536.0)), 65535)
    bits = jax.random.bits(rng, shape, dtype=jnp.uint16)
    # P(bits >= t) = (65536 - t) / 65536 ~= 1 - rate  (unsigned compare).
    return bits >= jnp.uint16(threshold)
