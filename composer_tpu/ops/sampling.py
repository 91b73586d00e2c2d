"""On-device sampling for autoregressive decoding.

Replaces the reference's host-side ``tf.random.categorical`` per-step call
(cli.py:670-673) with a pure-JAX sampler usable inside ``jax.lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_logits(rng, logits, temperature: float = 1.0):
    """Temperature-scaled categorical sampling.

    logits: [..., vocab]. temperature <= 0 means greedy argmax.
    Returns int32 samples of shape logits.shape[:-1].
    """
    if isinstance(temperature, (int, float)) and temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temperature
    return jax.random.categorical(rng, scaled, axis=-1).astype(jnp.int32)


def sample_top_k(rng, logits, temperature: float = 1.0, k: int = 0):
    """Top-k filtered temperature sampling (k <= 0 disables filtering)."""
    if k and k > 0:
        top_values, _ = jax.lax.top_k(logits, k)
        threshold = top_values[..., -1:]
        logits = jnp.where(logits < threshold, -jnp.inf, logits)
    return sample_logits(rng, logits, temperature)
