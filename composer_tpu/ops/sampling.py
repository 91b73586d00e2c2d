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


def filter_top_k(logits, k: int):
    """Keeps the k largest logits; the rest go to -inf."""
    top_values, _ = jax.lax.top_k(logits, k)
    return jnp.where(logits < top_values[..., -1:], -jnp.inf, logits)


def sample_top_k(rng, logits, temperature: float = 1.0, k: int = 0):
    """Top-k filtered temperature sampling (k <= 0 disables filtering)."""
    if k and k > 0:
        logits = filter_top_k(logits, k)
    return sample_logits(rng, logits, temperature)


def filter_top_p(logits, p: float):
    """Nucleus filtering: keeps the smallest probability-sorted prefix whose
    cumulative mass reaches ``p`` (the token crossing the threshold is kept,
    matching the usual nucleus-sampling definition); the rest go to -inf.

    Static-shape friendly (one full sort + cumsum, no data-dependent
    shapes), so it runs inside ``lax.scan`` decode loops.
    """
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cumulative = jnp.cumsum(probs, axis=-1)
    # Keep entries whose cumulative mass up to and including them has not yet
    # exceeded p before them: mass_before = cumulative - probs.
    keep_sorted = (cumulative - probs) < p
    # Threshold = smallest kept logit in sorted order.
    kept_logits = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
    return jnp.where(logits < threshold, -jnp.inf, logits)


def sample_filtered(rng, logits, temperature: float = 1.0, top_k: int = 0,
                    top_p: float = 0.0):
    """Temperature sampling with optional top-k and/or nucleus filtering.

    Warpers apply in the canonical order: temperature first, then top-k,
    then top-p over the survivors — so the nucleus is the p-mass prefix of
    the distribution actually sampled (top-k is order-invariant under the
    monotonic temperature scaling; top-p is not). ``top_k <= 0`` /
    ``top_p <= 0 or >= 1`` disable each filter; with both disabled this is
    exactly :func:`sample_logits`.
    """
    greedy = isinstance(temperature, (int, float)) and temperature <= 0
    if not greedy:
        logits = logits.astype(jnp.float32) / temperature
    if top_k and top_k > 0:
        logits = filter_top_k(logits, top_k)
    if top_p and 0.0 < top_p < 1.0:
        logits = filter_top_p(logits, top_p)
    return sample_logits(rng, logits, 0.0 if greedy else 1.0)


# ----------------------------------------------------------- per-row variants
# Serving batches coalesce requests with DIFFERENT sampling settings into one
# device call (composer_tpu/serving.py), so each parameter is a traced [B]
# vector rather than a static Python number — one compiled program covers
# every temperature/top-k/top-p mix (and changing a knob between requests no
# longer recompiles). Where a row's setting matches the scalar functions
# above, the filtered values — and therefore the sampled ids, given the same
# rng — are bit-identical: the op sequence (scale, then top-k threshold,
# then nucleus threshold on the survivors, then ONE categorical) is the same.


def filter_top_k_rows(logits, k):
    """Per-row top-k: ``k`` is an int32 [B] vector; ``k[i] <= 0`` disables
    filtering for row i. Keeps ties at the k-th value (x survives iff
    x >= k-th largest), matching :func:`filter_top_k`."""
    vocab = logits.shape[-1]
    k = jnp.asarray(k, jnp.int32)
    sorted_desc = jnp.sort(logits, axis=-1)[..., ::-1]
    index = jnp.clip(k - 1, 0, vocab - 1)
    threshold = jnp.take_along_axis(sorted_desc, index[..., None], axis=-1)
    enabled = (k > 0)[..., None]
    return jnp.where(enabled & (logits < threshold), -jnp.inf, logits)


def filter_top_p_rows(logits, p):
    """Per-row nucleus filtering: ``p`` is an f32 [B] vector; values outside
    (0, 1) disable filtering for that row. Same crossing-token-kept
    semantics as :func:`filter_top_p`."""
    p = jnp.asarray(p, jnp.float32)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits.astype(jnp.float32), axis=-1)
    cumulative = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cumulative - probs) < p[..., None]
    kept_logits = jnp.where(keep_sorted, sorted_logits, jnp.inf)
    threshold = jnp.min(kept_logits, axis=-1, keepdims=True)
    enabled = ((p > 0.0) & (p < 1.0))[..., None]
    return jnp.where(enabled & (logits < threshold), -jnp.inf, logits)


def sample_filtered_rows(rng, logits, temperature, top_k, top_p):
    """Per-row :func:`sample_filtered`: every parameter is a traced [B]
    vector over the batch rows of ``logits`` [B, vocab].

    ``temperature[i] <= 0`` makes row i greedy (argmax; filters cannot
    change an argmax, so they are irrelevant for that row). One
    ``jax.random.categorical`` call consumes the rng exactly like the
    scalar path, so a batch whose rows all share the scalar settings
    samples the same ids as :func:`sample_filtered`.
    """
    temperature = jnp.asarray(temperature, jnp.float32)
    greedy = temperature <= 0.0
    safe = jnp.where(greedy, 1.0, temperature)
    scaled = logits.astype(jnp.float32) / safe[..., None]
    filtered = filter_top_p_rows(filter_top_k_rows(scaled, top_k), top_p)
    sampled = jax.random.categorical(rng, filtered, axis=-1).astype(jnp.int32)
    return jnp.where(greedy, jnp.argmax(logits, axis=-1).astype(jnp.int32), sampled)
