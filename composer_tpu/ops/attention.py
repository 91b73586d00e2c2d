"""Multi-head causal attention with Music-Transformer relative position bias.

Replaces the reference's eager TF attention (transformer.py:211-448) with
functional JAX designed for XLA/TPU:

* static shapes everywhere; the causal mask is built with ``broadcasted_iota``
  (no band_part),
* the relative bias uses the memory-efficient "skew" trick
  (transformer.py:303-329) for full-sequence attention, and a
  ``dynamic_slice`` gather for single-token KV-cached decode — the reference
  never wired relative attention into cached decode at all,
* the relative embedding ``E`` is shaped (heads, window, head_depth) —
  per *relative distance*, decoupled from batch size (the reference coupled it
  to batch*sequence, a quirk documented in SURVEY.md §2.3).

Layout convention: ``E[h, window-1-d]`` holds the embedding for relative
distance ``d`` (0 = the query position itself, increasing into the past).

Masking parity: scores are combined as ``w * b - 1e4 * (1 - b)`` after
scaling, matching the reference numerics (transformer.py:354) for NLL parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def causal_mask(q_len: int, k_len: int, q_offset=0, dtype=jnp.float32) -> jnp.ndarray:
    """[q_len, k_len] mask: 1 where key j may attend from query i, else 0.

    Query i sits at absolute position ``q_offset + i``; key j at position j.
    With ``q_offset = k_len - q_len`` this reproduces the reference's
    lower-triangle-from-bottom-right mask (transformer.py:290-301).
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    if isinstance(q_offset, int):
        offset = jnp.int32(q_offset)
    else:
        offset = q_offset.astype(jnp.int32)
    return (rows + offset >= cols).astype(dtype)


def skew_relative_logits(rel: jnp.ndarray) -> jnp.ndarray:
    """The Music-Transformer pad-reshape-slice skew.

    ``rel[..., i, m]`` holds ``q_i . E_slice[m]`` where ``E_slice[m]`` is the
    embedding for relative distance ``S - 1 - m``; the output aligns it so
    ``out[..., i, j] = q_i . E(distance i - j)`` (entries with j > i are
    garbage and must be masked). Reference: transformer.py:303-329.
    """
    *batch, s_q, s_k = rel.shape
    padded = jnp.pad(rel, [(0, 0)] * len(batch) + [(0, 0), (1, 0)])
    reshaped = padded.reshape(*batch, s_k + 1, s_q)
    return reshaped[..., 1:, :]


def relative_logits_full(q: jnp.ndarray, rel_embedding: jnp.ndarray) -> jnp.ndarray:
    """Relative-position logits for square self-attention.

    q: [batch, heads, seq, depth]; rel_embedding: [heads, window, depth] in
    skew layout. Returns [batch, heads, seq, seq].
    """
    seq = q.shape[2]
    window = rel_embedding.shape[1]
    # The trailing `seq` slots cover distances seq-1 .. 0.
    e_slice = jax.lax.dynamic_slice_in_dim(rel_embedding, window - seq, seq, axis=1)
    rel = jnp.einsum("bhsd,hmd->bhsm", q, e_slice)
    return skew_relative_logits(rel)


def relative_logits_decode(
    q: jnp.ndarray, rel_embedding: jnp.ndarray, position, cache_len: int
) -> jnp.ndarray:
    """Relative logits for one query token against a KV cache.

    q: [batch, heads, 1, depth]; ``position`` is the query's absolute position
    (traced scalar). Returns [batch, heads, 1, cache_len] where slot j holds
    ``q . E(distance position - j)``; slots j > position are garbage and must
    be masked by the caller.

    In skew layout the embeddings for distances ``position .. position -
    (cache_len-1)`` are *contiguous* starting at ``window - 1 - position``, so
    a single ``dynamic_slice`` of a zero-padded E suffices — no gather. E is
    padded on BOTH sides: once ``position >= window`` the slice start
    ``window - 1 - position`` goes negative, and the leading zero rows make
    out-of-table distances (> window-1) contribute zero bias instead of a
    clamped-slice misalignment.
    """
    heads, window, depth = rel_embedding.shape
    padded = jnp.pad(rel_embedding, ((0, 0), (cache_len, cache_len), (0, 0)))
    start = cache_len + window - 1 - position
    e_slice = jax.lax.dynamic_slice(
        padded, (0, start, 0), (heads, cache_len, depth)
    )
    return jnp.einsum("bhqd,hmd->bhqm", q, e_slice)


def multihead_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    rel_embedding=None,
    q_position=None,
    scale: bool = True,
    mask=None,
    dropout_rng=None,
    dropout_rate: float = 0.0,
    use_pallas: bool = False,
    band_block_size: int = 0,
    flash_mesh=None,
) -> jnp.ndarray:
    """Causal multi-head attention core.

    q: [B, H, S_q, D]; k, v: [B, H, S_k, D]. ``mask`` is [S_q, S_k] (or
    broadcastable) with 1 = attend. When ``rel_embedding`` is given, the
    relative bias is added to the raw scores before scaling (reference order:
    transformer.py:341-348). ``q_position`` (traced scalar) selects the
    decode path for S_q == 1 against a longer cache.

    ``band_block_size`` > 0 routes eligible square causal self-attention
    through ops/band_attention.py — same numerics, no skew relayout (the
    2048-ctx train bottleneck; see that module's docstring).

    ``flash_mesh``: a multi-device ``jax.sharding.Mesh`` to run the Pallas
    path under (shard_map over batch x heads; see
    pallas_attention.sharded_relative_flash_attention). Ignored unless
    ``use_pallas`` selects the flash path. If the batch/heads don't divide
    the mesh axes, attention falls through to the (GSPMD-partitionable)
    band/XLA paths instead.
    """
    s_q, s_k = q.shape[2], k.shape[2]
    compute_dtype = q.dtype

    square_causal = s_q == s_k and q_position is None and mask is None

    if use_pallas and square_causal:
        from composer_tpu.ops.pallas_attention import (
            MIN_BLOCK,
            relative_flash_attention,
            sharded_relative_flash_attention,
        )

        dropout_active = dropout_rng is not None and dropout_rate > 0.0
        # Flash dropout uses the in-kernel TPU PRNG, which the interpreter
        # stubs to zeros — on CPU backends a dropout-on request falls
        # through to the band/XLA paths instead.
        flash_ok = s_q % MIN_BLOCK == 0 and (
            not dropout_active or jax.default_backend() == "tpu"
        )
        mesh = flash_mesh if getattr(flash_mesh, "size", 1) > 1 else None
        if flash_ok and mesh is not None:
            from composer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
            if (
                q.shape[0] % mesh_shape.get(DATA_AXIS, 1)
                or q.shape[1] % mesh_shape.get(MODEL_AXIS, 1)
            ):
                flash_ok = False  # indivisible shard — band handles it
        if flash_ok:
            seed = None
            if dropout_active:
                # One int32 seed per call; in-kernel masks are then keyed
                # per (batch*head, q-block, k-block) tile.
                seed = jax.random.randint(
                    dropout_rng, (1,), 0, 2**31 - 1, dtype=jnp.int32
                )
            if mesh is not None:
                return sharded_relative_flash_attention(
                    q, k, v, rel_embedding, mesh=mesh, scale=scale,
                    dropout_rate=dropout_rate if dropout_active else 0.0,
                    dropout_seed=seed,
                )
            if dropout_active:
                return relative_flash_attention(
                    q, k, v, rel_embedding, scale=scale,
                    dropout_rate=dropout_rate, dropout_seed=seed,
                )
            return relative_flash_attention(q, k, v, rel_embedding, scale=scale)

    if (
        band_block_size
        and s_q == s_k
        and s_q % band_block_size == 0
        and q_position is None
        and mask is None
    ):
        from composer_tpu.ops.band_attention import band_causal_attention

        return band_causal_attention(
            q,
            k,
            v,
            rel_embedding,
            scale=scale,
            block_size=band_block_size,
            dropout_rng=dropout_rng,
            dropout_rate=dropout_rate,
        )

    w = jnp.einsum("bhqd,bhkd->bhqk", q, k)

    if rel_embedding is not None:
        if s_q == s_k and q_position is None:
            w = w + relative_logits_full(q, rel_embedding)
        else:
            if q_position is None:
                raise ValueError(
                    "q_position is required for relative attention with a KV cache."
                )
            w = w + relative_logits_decode(q, rel_embedding, q_position, s_k)

    if scale:
        w = w * jax.lax.rsqrt(jnp.asarray(q.shape[-1], dtype=compute_dtype))

    if mask is None:
        offset = q_position if q_position is not None else s_k - s_q
        mask = causal_mask(s_q, s_k, q_offset=offset, dtype=compute_dtype)
    mask = mask.astype(compute_dtype)
    w = w * mask - jnp.asarray(1e4, compute_dtype) * (1 - mask)

    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(compute_dtype)

    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, w.shape)
        w = w * keep.astype(compute_dtype) / (1.0 - dropout_rate)

    return jnp.einsum("bhqk,bhkd->bhqd", w, v)
