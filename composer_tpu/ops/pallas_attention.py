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

Training support (custom_vjp). The forward additionally emits the per-row
log-sum-exp; the backward is the FlashAttention-2 two-kernel split:

* kernel 1, grid (heads, batch, q-block): recomputes each (i, j) tile's
  probabilities from the stored lse, forms ``ds = p * (dp - delta)`` and
  accumulates dQ — plus the relative-embedding gradient, which is the
  *inverse* shear (roll row i LEFT by i) of ``ds`` placed back in band
  layout, contracted against Q.  dE revisits one (window+B, D) VMEM block
  per head across the whole (batch, q-block) subgrid — TPU grids execute
  sequentially, so in-place accumulation is race-free.
* kernel 2, grid (batch*heads, k-block): the same recompute accumulating
  dK (``dsᵀ @ Q``) and dV (``pᵀ @ dO``) per key block.

Per-row scalars (lse, delta = rowsum(dO * O)) are stored as (B*H, 8, S)
f32 arrays (row 0 live, 8-sublane padded to a legal block tile).  Mosaic has no native lane<->sublane
relayout for these, so the kernels convert with a diagonal-select trick:
``col = rowsum(where(iota_r == iota_c, broadcast(row), 0))`` (and its
transpose for the forward's lse write) — a (B, B) select + reduction, all
Mosaic-native, negligible next to the tile matmuls.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile edge for the flash grid (q rows and k cols per tile). Auto policy
# (re-swept round 5, v5e-1, 2048 ctx): the largest edge that compiles wins
# — 512 over 256 measures 268->212 ms/step at head_dim 64 (28->36 % of
# bf16 peak), 246->203 ms at head_dim 128 (54->62 %), and 233->150 ms at
# the D=16 reference arch — fewer grid steps and half the per-element
# softmax/lse bookkeeping again. 1024 fails to compile (VMEM), and 512
# only fits inside the backward's 16M scoped-VMEM budget with bf16 tiles
# AND seq_len <= 2048 (f32 tiles overflow it by 3.8M at 2048 ctx; bf16
# overflows by 3.6M at 4096 — the revisited full-sequence dq block scales
# with S); outside that envelope the policy falls back to 256.
# COMPOSER_FLASH_BLOCK forces a specific size.
MIN_BLOCK = 128
PREFERRED_BLOCKS = (512, 256)
_BLOCK_ENV = os.environ.get("COMPOSER_FLASH_BLOCK")


def _pick_block(seq_len: int, dtype=None) -> int:
    if _BLOCK_ENV:
        return int(_BLOCK_ENV)
    for candidate in PREFERRED_BLOCKS:
        if candidate == 512 and (
            dtype in (jnp.float32, np.float32) or seq_len > 2048
        ):
            continue
        if seq_len % candidate == 0:
            return candidate
    return MIN_BLOCK
NEG_INF = -1e30
# Per-row scalar arrays (lse, delta) are stored as (bh, _SUBLANES, S): row 0
# holds the data; the sublane padding satisfies Mosaic's (8, 128) block-tile
# minimum for f32 blocks.
_SUBLANES = 8


def _shear_rows(matrix, direction: int):
    """Rolls row i of ``matrix`` by i lanes (direction +1 = right, -1 = left),
    via log2(rows) roll+select rounds — all Mosaic-native ops."""
    rows, width = matrix.shape
    row_index = jax.lax.broadcasted_iota(jnp.int32, matrix.shape, 0)
    shift = 1
    while shift < rows:
        # pltpu.roll rotates right; right by (width - s) == left by s.
        amount = shift if direction > 0 else width - shift
        rolled = pltpu.roll(matrix, amount, axis=1)
        take_rolled = (row_index & shift) != 0
        matrix = jnp.where(take_rolled, rolled, matrix)
        shift *= 2
    return matrix


def _fold_band(band, row_index, col_index):
    """Folds a (B, 2B) band into circular (B, B) coordinates.

    Row i of the band needs columns m = B-1-i+j for j in [0, B) — B
    *consecutive* positions, hence distinct mod B — so the two B-wide halves
    can be merged losslessly with one select keyed on c >= B-1-i.
    """
    block = band.shape[0]
    return jnp.where(
        col_index >= block - 1 - row_index, band[:, :block], band[:, block:]
    )


def _band_to_scores(band, row_index, col_index):
    """Extracts rel[i, j] = band[i, B-1-i+j] from a (B, 2B) band tile.

    Circular-fold formulation: fold to (B, B), circular-shear right by i,
    then one static roll — half the sheared elements of the direct
    (B, 2B) shear-and-slice (measured 1.64 us per (256, 512) f32 shear on
    v5e; the shears were the dominant rel cost at head_dim 16).

      fold:   U_f[i, c]  = band[i, c + B * (c < B-1-i)]
      shear:  cs[i, c]   = U_f[i, (c - i) mod B]
      roll:   rel[i, j]  = cs[i, (j - 1) mod B]  (= U_f[i, (B-1-i+j) mod B])
    """
    folded = _fold_band(band, row_index, col_index)
    return pltpu.roll(_shear_rows(folded, 1), 1, axis=1)


def _scores_grad_to_band(ds, row_index, col_index):
    """Inverse of :func:`_band_to_scores`: scatters ds (B, B) back into the
    (B, 2B) band layout (dband[i, B-1-i+j] = ds[i, j], zero elsewhere) via
    the same circular-fold algebra run backwards."""
    block = ds.shape[0]
    d_cs = pltpu.roll(ds, block - 1, axis=1)  # undo the static roll
    d_folded = _shear_rows(d_cs, -1)  # undo the circular shear
    keep_lo = col_index >= block - 1 - row_index
    zero = jnp.zeros_like(d_folded)
    return jnp.concatenate(
        [jnp.where(keep_lo, d_folded, zero), jnp.where(keep_lo, zero, d_folded)],
        axis=1,
    )


def _diag_transpose(vec, axis: int):
    """Lane<->sublane transpose of a length-B vector via diag select+reduce.

    ``axis=1`` maps a (1, B) lanes row to a (B, 1) sublanes column;
    ``axis=0`` is the inverse. Mosaic has no native relayout for this; the
    (B, B) select + reduction is negligible next to the tile matmuls.
    """
    size = max(vec.shape)
    idx_r = jax.lax.broadcasted_iota(jnp.int32, (size, size), 0)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (size, size), 1)
    spread = jnp.broadcast_to(vec, (size, size))
    return jnp.sum(
        jnp.where(idx_r == idx_c, spread, 0.0), axis=axis, keepdims=True
    )


def _row_to_col(row):
    return _diag_transpose(row, axis=1)


def _col_to_row(col):
    return _diag_transpose(col, axis=0)


def _dropout_scaler(seed, bh, ib, jb, *, block: int, num_blocks: int, rate: float):
    """Per-tile dropout multiplier D (block, block) f32: keep/(1-rate) or 0.

    Seeded by (user seed, flat tile id) so the backward regenerates the
    forward's exact mask — tiles are identified by (bh, ib, jb) in both
    directions. Uses the TPU hardware PRNG; the interpreter stubs it to
    zeros, so callers must not route dropout here off-TPU.
    """
    tile_id = (bh * num_blocks + ib) * num_blocks + jb
    pltpu.prng_seed(seed, tile_id)
    bits = pltpu.prng_random_bits((block, block))
    bits_u = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    threshold = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    return jnp.where(bits_u >= threshold, 1.0 / (1.0 - rate), 0.0)


def _tile_scores(q, k_tile, e_ref, ib, jb, *, block, window, scale, use_rel):
    """Scaled, causally-masked score tile (block, block) in f32.

    Shared by the forward and both backward kernels so the backward's
    recomputed probabilities match the forward bit-for-bit.  Returns
    ``(scores, e_chunk, start)`` — the chunk/start are reused by the
    backward's band gradient (None/0 when ``use_rel`` is off).
    """
    scores = jax.lax.dot_general(
        q, k_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, B)

    rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)

    e_chunk = None
    start = 0
    if use_rel:
        # base = (ib - jb) * B; chunk start = W - B - base. Mosaic cannot
        # statically prove the offset's tile alignment for packed (bf16)
        # sublane tiles, so assert it: every term is a multiple of block.
        start = pl.multiple_of(window - block - (ib - jb) * block, block)
        e_chunk = e_ref[pl.ds(start, 2 * block), :]  # (2B, D)
        band = jax.lax.dot_general(
            q, e_chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, 2B)
        scores = scores + _band_to_scores(band, rows, cols)

    scores = scores * scale

    # Causal mask inside the diagonal block (off-diagonal blocks are fully
    # valid by construction of the loop bounds).
    masked = jnp.where(rows >= cols, scores, NEG_INF)
    scores = jnp.where(jb == ib, masked, scores)
    return scores, e_chunk, start


def _flash_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, e_ref, o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, block: int, seq_len: int, window: int, scale: float, use_rel: bool,
    dropout_rate: float,
):
    bh = pl.program_id(0)
    ib = pl.program_id(1)
    num_k_blocks = ib + 1  # causal: only blocks at or before the diagonal
    num_blocks = seq_len // block

    q = q_ref[:]  # (B, D)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def body(jb, _):
        k_tile = k_ref[pl.ds(jb * block, block), :]  # (B, D)
        v_tile = v_ref[pl.ds(jb * block, block), :]

        scores, _, _ = _tile_scores(
            q, k_tile, e_ref, ib, jb,
            block=block, window=window, scale=scale, use_rel=use_rel,
        )

        # Online softmax update.
        m_prev = m_ref[:]
        l_prev = l_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
        correction = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)
        l_new = l_prev * correction + jnp.sum(p, axis=1, keepdims=True)
        p_av = p
        if dropout_rate > 0.0:
            # Dropout applies to the normalized weights; scaling the
            # unnormalized p commutes with the final /l (computed from the
            # undropped sum), so masking here is exact.
            p_av = p * _dropout_scaler(
                seed_ref[0], bh, ib, jb,
                block=block, num_blocks=num_blocks, rate=dropout_rate,
            )
        acc_ref[:] = acc_ref[:] * correction + jax.lax.dot_general(
            p_av.astype(v_tile.dtype), v_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new
        return 0

    jax.lax.fori_loop(0, num_k_blocks, body, 0)
    o_ref[:] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)
    lse_ref[:] = jnp.broadcast_to(
        _col_to_row(m_ref[:] + jnp.log(l_ref[:])), lse_ref.shape
    )


def _flash_bwd_kernel(
    seed_ref,
    q_ref, k_ref, v_ref, e_ref, do_ref, lse_ref, delta_ref,
    dq_ref, de_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, block: int, num_blocks: int, window: int, scale: float, use_rel: bool,
    dropout_rate: float, heads: int,
):
    """Single-pass backward: one score/probability recompute per (i, j) tile
    feeds dQ, dK, dV and dE together (the split dQ / dKdV variant recomputed
    every tile twice — merged is ~1.2x faster at head_dim 128).

    Grid (heads, batch, k-block).  dK/dV accumulate in scratch for the owned
    key block; dQ accumulates into a revisited full-sequence f32 block (index
    map constant along the k-block axis — TPU grids run sequentially, so the
    read-modify-write rows are race-free), and dE into a revisited per-head
    block exactly as before.
    """
    h = pl.program_id(0)
    b = pl.program_id(1)
    jb = pl.program_id(2)
    bh = b * heads + h

    @pl.when(jb == 0)
    def _zero_dq():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    @pl.when((b == 0) & (jb == 0))
    def _zero_de():
        de_ref[:] = jnp.zeros_like(de_ref)

    k_tile = k_ref[:]  # (B, D)
    v_tile = v_ref[:]

    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)

    def body(ib, _):
        q_tile = q_ref[pl.ds(ib * block, block), :]
        do_tile = do_ref[pl.ds(ib * block, block), :]
        lse = _row_to_col(lse_ref[0:1, pl.ds(ib * block, block)])     # (B, 1)
        delta = _row_to_col(delta_ref[0:1, pl.ds(ib * block, block)])

        scores, e_chunk, start = _tile_scores(
            q_tile, k_tile, e_ref, ib, jb,
            block=block, window=window, scale=scale, use_rel=use_rel,
        )
        p = jnp.exp(scores - lse)  # normalized probabilities (Bi, Bj) f32

        dp = jax.lax.dot_general(
            do_tile, v_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bi, Bj)
        p_dv = p
        if dropout_rate > 0.0:
            # Regenerate the forward's exact mask for this tile. With
            # P' = D*p the chain rule gives ds = p*(D*dp - delta) and
            # dV = P'^T dO; delta = rowsum(dO*O) is unchanged.
            scaler = _dropout_scaler(
                seed_ref[0], bh, ib, jb,
                block=block, num_blocks=num_blocks, rate=dropout_rate,
            )
            dp = dp * scaler
            p_dv = p * scaler
        ds = p * (dp - delta)  # grad wrt scaled scores, f32
        ds_c = ds.astype(k_tile.dtype)

        dq_update = scale * jax.lax.dot_general(
            ds_c, k_tile,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bi, D) f32

        if use_rel:
            # Put ds back in band layout (dband[i, B-1-i+j] = ds[i, j]) via
            # the circular fold: half the sheared elements of the padded
            # (B, 2B) left-shear. (Mosaic's dynamic_rotate is 32-bit only:
            # shear in f32, then cast.)
            rows = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
            dband = _scores_grad_to_band(ds, rows, cols).astype(k_tile.dtype)
            dq_update = dq_update + scale * jax.lax.dot_general(
                dband, e_chunk.astype(dband.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            de_ref[pl.ds(start, 2 * block), :] = (
                de_ref[pl.ds(start, 2 * block), :]
                + scale * jax.lax.dot_general(
                    dband, q_tile,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )

        dq_ref[pl.ds(ib * block, block), :] = (
            dq_ref[pl.ds(ib * block, block), :] + dq_update
        )

        # dV_j += p^T @ dO_i ; dK_j += scale * ds^T @ q_i  (contract over i).
        dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
            p_dv.astype(do_tile.dtype), do_tile,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_acc[:] = dk_acc[:] + scale * jax.lax.dot_general(
            ds_c, q_tile,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(jb, num_blocks, body, 0)
    dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


class _Statics(NamedTuple):
    block: int
    window: int  # e_padded rows minus block (true window incl. host padding)
    scale: float
    use_rel: bool
    heads: int
    interpret: bool  # run the Pallas TPU interpreter (CPU backends/tests)
    dropout_rate: float  # in-kernel attention dropout (0.0 = off)


def _forward_call(statics: _Statics, seed, q, k, v, e_padded):
    block, window, scale, use_rel, heads, interpret, dropout_rate = statics
    bh, seq_len, depth = q.shape
    num_q_blocks = seq_len // block

    kernel = functools.partial(
        _flash_kernel,
        block=block, seq_len=seq_len, window=window, scale=scale,
        use_rel=use_rel, dropout_rate=dropout_rate,
    )

    def squeeze_kernel(seed_ref, q_ref, k_ref, v_ref, e_ref, o_ref, lse_ref,
                       acc, m, l):
        kernel(
            seed_ref,
            q_ref.at[0], k_ref.at[0], v_ref.at[0], e_ref.at[0],
            o_ref.at[0], lse_ref.at[0], acc, m, l,
        )

    out, lse = pl.pallas_call(
        squeeze_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq_len, depth), q.dtype),
            jax.ShapeDtypeStruct((bh, _SUBLANES, seq_len), jnp.float32),
        ],
        grid=(bh, num_q_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block, depth), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, depth), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, depth), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, window + block, depth),
                lambda b, i, heads_=heads: (b % heads_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, block, depth), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, block), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, depth), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
            pltpu.VMEM((block, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, e_padded)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash(statics: _Statics, seed, q, k, v, e_padded):
    out, _ = _forward_call(statics, seed, q, k, v, e_padded)
    return out


def _flash_fwd_rule(statics, seed, q, k, v, e_padded):
    out, lse = _forward_call(statics, seed, q, k, v, e_padded)
    return out, (seed, q, k, v, e_padded, out, lse)


def _flash_bwd_rule(statics: _Statics, residuals, dout):
    block, window, scale, use_rel, heads, interpret, dropout_rate = statics
    seed, q, k, v, e_padded, out, lse = residuals
    bh, seq_len, depth = q.shape
    batch = bh // heads
    num_blocks = seq_len // block
    e_rows = window + block

    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (bh, S)
    # Sublane-pad per-row scalars to legal (>=8, 128)-tile blocks.
    delta = jnp.broadcast_to(delta[:, None, :], (bh, _SUBLANES, seq_len))

    # Single merged kernel. Grid (heads, batch, k-block): the dE block's
    # index map depends only on the outermost axis (one per-head accumulator
    # resident across the whole (batch, k-block) subgrid); the dQ block's
    # index map is constant along the k-block axis (one per-(head, batch)
    # f32 accumulator revisited across its key blocks).
    kernel = functools.partial(
        _flash_bwd_kernel,
        block=block, num_blocks=num_blocks, window=window, scale=scale,
        use_rel=use_rel, dropout_rate=dropout_rate, heads=heads,
    )

    def squeeze(seed_ref, q_ref, k_ref, v_ref, e_ref, do_ref, lse_ref,
                delta_ref, dq_ref, de_ref, dk_ref, dv_ref, dk_acc, dv_acc):
        kernel(
            seed_ref,
            q_ref.at[0], k_ref.at[0], v_ref.at[0], e_ref.at[0], do_ref.at[0],
            lse_ref.at[0], delta_ref.at[0],
            dq_ref.at[0], de_ref.at[0], dk_ref.at[0], dv_ref.at[0],
            dk_acc, dv_acc,
        )

    def _bh(h, b, j):
        del j
        return b * heads + h

    dq, de, dk, dv = pl.pallas_call(
        squeeze,
        out_shape=[
            jax.ShapeDtypeStruct((bh, seq_len, depth), jnp.float32),
            jax.ShapeDtypeStruct((heads, e_rows, depth), jnp.float32),
            jax.ShapeDtypeStruct((bh, seq_len, depth), k.dtype),
            jax.ShapeDtypeStruct((bh, seq_len, depth), v.dtype),
        ],
        grid=(heads, batch, num_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, seq_len, depth), lambda h, b, j: (_bh(h, b, j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, depth), lambda h, b, j: (_bh(h, b, j), j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, depth), lambda h, b, j: (_bh(h, b, j), j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_rows, depth), lambda h, b, j: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq_len, depth), lambda h, b, j: (_bh(h, b, j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, seq_len), lambda h, b, j: (_bh(h, b, j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _SUBLANES, seq_len), lambda h, b, j: (_bh(h, b, j), 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, seq_len, depth), lambda h, b, j: (_bh(h, b, j), 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e_rows, depth), lambda h, b, j: (h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, depth), lambda h, b, j: (_bh(h, b, j), j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, depth), lambda h, b, j: (_bh(h, b, j), j, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((block, depth), jnp.float32),
            pltpu.VMEM((block, depth), jnp.float32),
        ],
        interpret=interpret,
    )(seed, q, k, v, e_padded, dout, lse, delta)

    dq = dq.astype(q.dtype)
    de = de.astype(e_padded.dtype)
    # seed is integer-typed: its cotangent is the symbolic-zero float0.
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return dseed, dq, dk, dv, de


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def relative_flash_attention(
    q, k, v, rel_embedding=None, *, scale: bool = True, block: int | None = None,
    interpret: bool | None = None,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    """Causal flash attention. q, k, v: [batch, heads, S, D].

    ``rel_embedding``: [heads, window, D] in skew layout (E[h, window-1-d]
    holds distance d), or None for plain causal attention. Requires S to be a
    multiple of ``block`` and, with relative bias, S <= window.

    Differentiable: gradients flow to q/k/v and the relative embedding via a
    fused Pallas backward (see module docstring).

    ``interpret`` runs the Pallas interpreter instead of Mosaic; the default
    (None) auto-enables it on CPU backends so host-only runs and tests just
    work (any non-cpu backend gets the compiled kernel).

    ``dropout_rate``/``dropout_seed``: in-kernel attention dropout via the
    TPU hardware PRNG (per-tile masks, regenerated exactly in the backward).
    Compiled-only — the interpreter stubs the PRNG to zeros, so callers must
    keep dropout off the flash path on CPU backends.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batch, heads, seq_len, depth = q.shape
    if block is None:
        block = _pick_block(seq_len, q.dtype)
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
        # Match q's dtype: a bf16 q against an f32 table forces every band
        # matmul (forward + the backward's recompute) onto the slow mixed-f32
        # MXU path; in bf16 they run at full rate. The in-kernel dE
        # accumulator stays f32 regardless (see _flash_bwd_rule's out_shape).
        e_padded = jnp.pad(rel_embedding, ((0, 0), (0, block), (0, 0))).astype(
            q.dtype
        )
    else:
        window = block
        e_padded = jnp.zeros((heads, 2 * block, depth), dtype=q.dtype)

    softmax_scale = float(true_depth) ** -0.5 if scale else 1.0

    bh = batch * heads
    q_flat = q.reshape(bh, seq_len, depth)
    k_flat = k.reshape(bh, seq_len, depth)
    v_flat = v.reshape(bh, seq_len, depth)

    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if dropout_seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(dropout_seed, jnp.int32).reshape((1,))

    statics = _Statics(
        block=block,
        window=e_padded.shape[1] - block,
        scale=softmax_scale,
        use_rel=use_rel,
        heads=heads,
        interpret=interpret,
        dropout_rate=float(dropout_rate),
    )
    out = _flash(statics, seed, q_flat, k_flat, v_flat, e_padded)
    return out.reshape(batch, heads, seq_len, depth)[..., :true_depth]


def sharded_relative_flash_attention(
    q, k, v, rel_embedding=None, *, mesh, batch_axis="data", head_axis="model",
    scale: bool = True, block: int | None = None, interpret: bool | None = None,
    dropout_rate: float = 0.0, dropout_seed=None,
):
    """Flash attention under a multi-device ``jax.sharding.Mesh``.

    ``pallas_call`` is opaque to GSPMD, so the kernel cannot be auto-
    partitioned the way the XLA/band paths are. Attention is embarrassingly
    parallel over (batch, heads), though: this wraps the kernel in
    ``jax.shard_map``, sharding batch over ``batch_axis`` and heads (plus the
    per-head relative table) over ``head_axis`` — each device runs the
    single-device Mosaic program on its local slab and no collectives are
    needed in the forward. The backward works through shard_map's transpose:
    dq/dk/dv stay shard-local and the relative-table gradient is all-reduced
    over the batch axis automatically (the table is replicated along it).
    Gradients are pinned against the single-device kernel in
    tests/test_mesh_flash.py.

    Requirements: batch divisible by the ``batch_axis`` size and heads by the
    ``head_axis`` size (axes absent from ``mesh`` or of size 1 are ignored).
    With in-kernel dropout, each shard folds its mesh coordinates into the
    seed so masks decorrelate across devices.
    """
    from jax.sharding import PartitionSpec as P

    mesh_shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    b_size = mesh_shape.get(batch_axis, 1)
    h_size = mesh_shape.get(head_axis, 1)
    b_ax = batch_axis if b_size > 1 else None
    h_ax = head_axis if h_size > 1 else None
    batch, heads = q.shape[0], q.shape[1]
    if b_ax and batch % b_size:
        raise ValueError(f"batch {batch} not divisible by {batch_axis}={b_size}")
    if h_ax and heads % h_size:
        raise ValueError(f"heads {heads} not divisible by {head_axis}={h_size}")

    dropout_active = dropout_rate > 0.0
    if dropout_active and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    seed = (
        jnp.asarray(dropout_seed, jnp.int32).reshape((1,))
        if dropout_active
        else jnp.zeros((1,), jnp.int32)
    )

    use_rel = rel_embedding is not None
    spec_qkv = P(b_ax, h_ax, None, None)

    def body(seed, q, k, v, e):
        if dropout_active:
            shard = jnp.int32(0)
            if b_ax is not None:
                shard = shard + jax.lax.axis_index(b_ax)
            if h_ax is not None:
                shard = shard * h_size + jax.lax.axis_index(h_ax)
            # int32 wrap-around is fine — any shard-distinct value works.
            seed = seed + shard * jnp.int32(1000003)
        return relative_flash_attention(
            q, k, v, e, scale=scale, block=block, interpret=interpret,
            dropout_rate=dropout_rate,
            dropout_seed=seed if dropout_active else None,
        )

    # check_vma=False disables shard_map's replication tracking (pallas_call
    # is opaque to it). The rel-table gradient then relies on shard_map's
    # transpose inserting the data-axis psum for the replicated e operand —
    # behavior pinned by the grad-parity test in tests/test_mesh_flash.py
    # (the guard for this flag): if a JAX upgrade changes the transpose
    # semantics, that pin fails loudly instead of corrupting grads silently.
    if use_rel:
        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(None), spec_qkv, spec_qkv, spec_qkv, P(h_ax, None, None)),
            out_specs=spec_qkv,
            check_vma=False,
        )
        return fn(seed, q, k, v, rel_embedding)
    fn = jax.shard_map(
        lambda s, q, k, v: body(s, q, k, v, None),
        mesh=mesh,
        in_specs=(P(None), spec_qkv, spec_qkv, spec_qkv),
        out_specs=spec_qkv,
        check_vma=False,
    )
    return fn(seed, q, k, v)
