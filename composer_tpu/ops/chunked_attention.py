"""Memory-efficient differentiable attention: lax.scan over query chunks.

For long-context *training* the full [S, S] score matrix per head is the
memory bottleneck (at 2048 ctx, batch 8, 16 heads it is 2 GB in f32 per
layer). The Pallas flash kernel (ops/pallas_attention.py) fixes the forward
but has no backward; this module is the differentiable middle ground: a
``lax.scan`` over query chunks computes at most [chunk, S] scores at a time,
JAX autodiff flows through the scan, and with ``jax.remat`` around the block
the peak activation memory is O(S * chunk) per head.

Relative attention uses a rectangular Transformer-XL-style shift (a
pad+reshape, free in XLA): for a query chunk starting at q0, the band

    P[i, m] = q_i . E[skew layout, width S + chunk - 1]

aligns to ``rel[i, j] = q_i . E(distance q0 + i - j)`` after the shift.

Numerics match ops/attention.py exactly (same masking formula); pinned by
tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from composer_tpu.ops.dropout import dropout_keep_mask


def _rectangular_rel_shift(band: jnp.ndarray, out_cols: int) -> jnp.ndarray:
    """band: [..., B, M] with M = out_cols + B - 1, column m holding distance
    (base + B - 1 - m); returns [..., B, out_cols] where column j holds
    distance (base + i - j)."""
    *batch, rows, width = band.shape
    padded = jnp.pad(band, [(0, 0)] * len(batch) + [(0, 0), (1, 0)])  # (B, M+1)
    reshaped = padded.reshape(*batch, width + 1, rows)
    shifted = reshaped[..., 1:, :].reshape(*batch, rows, width)
    return shifted[..., :out_cols]


def chunked_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_embedding=None,
    *,
    scale: bool = True,
    chunk_size: int = 128,
    dropout_rng=None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Causal attention over [B, H, S, D] computing scores one q-chunk at a
    time. Differentiable; O(S * chunk) live scores.

    Attention dropout folds the chunk index into ``dropout_rng`` so each
    chunk's probabilities get an independent mask (same keep probability as
    the unchunked path; the mask pattern itself necessarily differs)."""
    batch, heads, seq, depth = q.shape
    if seq % chunk_size != 0:
        raise ValueError(f"sequence {seq} not a multiple of chunk {chunk_size}")
    num_chunks = seq // chunk_size
    compute_dtype = q.dtype

    scale_factor = (
        jax.lax.rsqrt(jnp.asarray(depth, jnp.float32)).astype(compute_dtype)
        if scale
        else jnp.asarray(1.0, compute_dtype)
    )

    if rel_embedding is not None:
        window = rel_embedding.shape[1]
        if seq > window:
            raise ValueError(f"sequence {seq} exceeds relative window {window}")
        # Band width M = S + chunk - 1 covering distances
        # [q0 - (S-1), q0 + chunk - 1]; band column m needs E row
        # (window - 1 - distance) = window - q0 - chunk + m. Over all chunks
        # the rows span [window - S, window + S - 2] (seq <= window keeps the
        # start non-negative); trailing zero rows cover negative distances,
        # which are causally masked anyway.
        e_padded = jnp.pad(rel_embedding, ((0, 0), (0, seq), (0, 0)))

    q_chunks = q.reshape(batch, heads, num_chunks, chunk_size, depth).transpose(
        2, 0, 1, 3, 4
    )
    positions = jnp.arange(seq)

    def chunk_attention(chunk_index, q_chunk):
        q0 = chunk_index * chunk_size
        scores = jnp.einsum("bhqd,bhkd->bhqk", q_chunk, k)

        if rel_embedding is not None:
            width = seq + chunk_size - 1
            start = window - q0 - chunk_size
            e_slice = jax.lax.dynamic_slice_in_dim(e_padded, start, width, axis=1)
            band = jnp.einsum("bhqd,hmd->bhqm", q_chunk, e_slice)
            scores = scores + _rectangular_rel_shift(band, seq)

        scores = scores * scale_factor
        row_positions = q0 + jnp.arange(chunk_size)
        mask = (row_positions[:, None] >= positions[None, :]).astype(compute_dtype)
        scores = scores * mask - jnp.asarray(1e4, compute_dtype) * (1 - mask)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            compute_dtype
        )
        if dropout_rng is not None and dropout_rate > 0.0:
            keep = dropout_keep_mask(
                jax.random.fold_in(dropout_rng, chunk_index),
                dropout_rate,
                weights.shape,
            )
            weights = weights * keep.astype(compute_dtype) / (1.0 - dropout_rate)
        return jnp.einsum("bhqk,bhkd->bhqd", weights, v)

    # Remat the chunk body: without it, autodiff through the scan stacks every
    # chunk's f32 scores as saved residuals — the full [S, S] matrix again
    # (num_chunks x [B, H, chunk, S] exceeded HBM at 2048 ctx, batch 8).
    # Checkpointed, the only per-chunk residual is q_chunk; scores are
    # recomputed during the backward sweep.
    chunk_attention = jax.checkpoint(chunk_attention)

    def scan_body(carry, inputs):
        chunk_index, q_chunk = inputs
        return carry, chunk_attention(chunk_index, q_chunk)

    _, out_chunks = jax.lax.scan(
        scan_body, None, (jnp.arange(num_chunks), q_chunks)
    )
    out = out_chunks.transpose(1, 2, 0, 3, 4).reshape(batch, heads, seq, depth)
    return out
