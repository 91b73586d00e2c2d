"""Pallas fused causal flash attention with in-kernel relative-position bias.

The memory-efficiency upgrade over the reference's attention
(transformer.py:331-371): scores are computed blockwise with an online
softmax, so the [S, S] score matrix (and the skewed relative-logit matrix)
is never materialized in HBM — the reference held both per layer.

In-kernel relative bias. The Music-Transformer skew is a per-row shift,
which Mosaic cannot express as a reshape (unsupported shape cast). Instead
this kernel computes, per (q-block, k-block) tile:

    P = Q_tile @ E_chunk^T            # (B, 2B) band of relative logits

where ``E_chunk`` is a contiguous slice of the (host-padded) relative
embedding covering every distance the tile can need, and then extracts the
aligned band with a **log-shift shear**: log2(B) rounds of
``pltpu.roll`` + row-masked select implement "roll row i right by i", after
which the needed tile is the static column slice [B-1, 2B-1). All ops are
Mosaic-native (roll, iota, where, static slices).

Index algebra (B = block, W = window, base = (ib - jb) * B):
  wanted distance for tile element (i, j):  d = base + i - j
  chunk start (in E padded with B trailing zero rows): W - B - base
  chunk column m holds distance base + B - 1 - m, so (i, j) -> m = B-1-i+j
  after shearing row i right by i:          column B-1+j  -> static slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 128
NEG_INF = -1e30


def _shear_rows_right(matrix, block: int):
    """Rolls row i of ``matrix`` right by i, via log2(block) roll+select rounds."""
    rows = matrix.shape[0]
    row_index = jax.lax.broadcasted_iota(jnp.int32, matrix.shape, 0)
    shift = 1
    while shift < rows:
        rolled = pltpu.roll(matrix, shift, axis=1)
        take_rolled = (row_index & shift) != 0
        matrix = jnp.where(take_rolled, rolled, matrix)
        shift *= 2
    return matrix


def _flash_kernel(
    q_ref, k_ref, v_ref, e_ref, o_ref,
    acc_ref, m_ref, l_ref,
    *, block: int, seq_len: int, window: int, scale: float, use_rel: bool,
):
    ib = pl.program_id(1)
    num_k_blocks = ib + 1  # causal: only blocks at or before the diagonal

    q = q_ref[:]  # (B, D)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def body(jb, _):
        k_tile = k_ref[pl.ds(jb * block, block), :]  # (B, D)
        v_tile = v_ref[pl.ds(jb * block, block), :]

        scores = jax.lax.dot_general(
            q, k_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, B)

        if use_rel:
            # base = (ib - jb) * B; chunk start = W - B - base.
            start = window - block - (ib - jb) * block
            e_chunk = e_ref[pl.ds(start, 2 * block), :]  # (2B, D)
            band = jax.lax.dot_general(
                q, e_chunk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, 2B)
            band = _shear_rows_right(band, block)
            scores = scores + band[:, block - 1 : 2 * block - 1]

        scores = scores * scale

        # Causal mask inside the diagonal block (off-diagonal blocks in the
        # loop are fully valid).
        rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
        is_diagonal = jb == ib
        masked = jnp.where(rows >= cols, scores, NEG_INF)
        scores = jnp.where(is_diagonal, masked, scores)

        # Online softmax update.
        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p.astype(v_tile.dtype), v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new
        return 0

    jax.lax.fori_loop(0, num_k_blocks, body, 0)
    o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


def relative_flash_attention(
    q, k, v, rel_embedding=None, *, scale: bool = True, block: int = DEFAULT_BLOCK,
):
    """Causal flash attention. q, k, v: [batch, heads, S, D].

    ``rel_embedding``: [heads, window, D] in skew layout (E[h, window-1-d]
    holds distance d), or None for plain causal attention. Requires S to be a
    multiple of ``block`` and, with relative bias, S <= window.
    """
    batch, heads, seq_len, depth = q.shape
    if seq_len % block != 0:
        raise ValueError(f"sequence length {seq_len} not a multiple of {block}")

    # Mosaic requires the minor (lane) dimension to be 128-aligned; zero-pad
    # the head depth — q.k contributions from the padding are zero and the
    # padded v columns are sliced off at the end.
    true_depth = depth
    if depth % 128 != 0:
        pad = 128 - depth % 128
        q = jnp.pad(q, ((0, 0), (0, 0), (0, 0), (0, pad)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, pad)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)))
        if rel_embedding is not None:
            rel_embedding = jnp.pad(rel_embedding, ((0, 0), (0, 0), (0, pad)))
        depth += pad

    use_rel = rel_embedding is not None
    if use_rel:
        window = rel_embedding.shape[1]
        if seq_len > window:
            raise ValueError(f"sequence {seq_len} exceeds relative window {window}")
        # Pad with `block` trailing zero rows so every chunk slice is in-bounds.
        e_padded = jnp.pad(rel_embedding, ((0, 0), (0, block), (0, 0))).astype(
            jnp.float32
        )
    else:
        window = block
        e_padded = jnp.zeros((heads, 2 * block, depth), dtype=jnp.float32)

    softmax_scale = float(true_depth) ** -0.5 if scale else 1.0

    bh = batch * heads
    q_flat = q.reshape(bh, seq_len, depth)
    k_flat = k.reshape(bh, seq_len, depth)
    v_flat = v.reshape(bh, seq_len, depth)

    num_q_blocks = seq_len // block
    kernel = functools.partial(
        _flash_kernel,
        block=block,
        seq_len=seq_len,
        window=e_padded.shape[1] - block,
        scale=softmax_scale,
        use_rel=use_rel,
    )

    grid = (bh, num_q_blocks)
    in_specs = [
            pl.BlockSpec((1, block, depth), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, depth), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, depth), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, e_padded.shape[1], depth),
                lambda b, i, heads_=heads: (b % heads_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
    ]
    out_specs = pl.BlockSpec(
        (1, block, depth), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )

    def squeeze_kernel(q_ref, k_ref, v_ref, e_ref, o_ref, acc, m, l):
        kernel(
            q_ref.at[0], k_ref.at[0], v_ref.at[0], e_ref.at[0], o_ref.at[0],
            acc, m, l,
        )

    out = pl.pallas_call(
        squeeze_kernel,
        out_shape=jax.ShapeDtypeStruct((bh, seq_len, depth), q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block, depth), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
    )(q_flat, k_flat, v_flat, e_padded)

    return out.reshape(batch, heads, seq_len, depth)[..., :true_depth]
