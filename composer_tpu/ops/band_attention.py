"""Band-coordinate causal attention: the relative-attention train path
without the skew relayout.

Motivation (measured, see TODO.md): the Music-Transformer pad-reshape-slice
skew (reference transformer.py:303-329; ours in ops/attention.py) forces XLA
to relayout the [B, H, S, S+1] score tensor across the tiled minor dims —
at 2048 ctx, batch 8 that chain (reshape+copy+pad+slice) moved ~1 GB per
layer at only ~144 GB/s effective and dominated the train step (220 ms of
443 ms). Pallas per-tile roll/shear variants measured worse (bandwidth-bound
rolls). This module is the "band-coordinate" formulation that never leaves
(query-block, diagonal-offset) space, so no O(S^2) tensor is ever sheared:

* Split the sequence into A blocks of C. Index score blocks by
  (a = query block, g = a - key block). The full [.., a, r, g, j] score
  tensor is written once by a batched matmul and consumed in place by a
  fused mask+softmax over the contiguous minor (g, j) pair — layout-stable
  throughout.
* K/V are expanded to band layout with a one-hot *block-selection* matmul
  (contraction over A); its transpose (the gradient) is another dense
  matmul — no gather/scatter anywhere.
* The relative bias rel[i, j] = q_i . E(i - j) only ever shears E-sized
  data: within a block pair, the distance i-j = g*C + (r - j) spans two
  C-aligned blocks of the E table, so

      rel[b,h,a,r,g,j] = sum_p U0[b,h,a,r,g,p] * Sel0[r,j,p]
                       + sum_p U1[b,h,a,r,g,p] * Sel1[r,j,p]

  where U0/U1 = q . (block-reversed E) are plain matmuls and Sel0/Sel1 are
  constant 0/1 shift-selection matrices (p = C-1-r+j for j <= r in the low
  block, p = j-r-1 for j > r in the high block). 0/1 constants are exact in
  bf16 and the MXU accumulates in f32, so numerics match the dense skew path
  to rounding.

Masking parity with the reference (transformer.py:354): scores are combined
as ``w * b - 1e4 * (1 - b)`` after scaling, with the causal mask expressed in
band coordinates: valid iff g <= a (real block) and (g >= 1 or r >= j).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax import lax


def _block_select(num_blocks: int, dtype) -> jnp.ndarray:
    """sel[a, g, c] = 1 iff c == a - g  (band gather as a matmul)."""
    a = jnp.arange(num_blocks)[:, None, None]
    g = jnp.arange(num_blocks)[None, :, None]
    c = jnp.arange(num_blocks)[None, None, :]
    return (a - g == c).astype(dtype)


def _shift_selects(block: int, dtype):
    """The two constant shift-selection matrices for the relative bias.

    Within a block pair at diagonal offset g, distance i-j = g*C + (r-j)
    lands in E-table block (A-1-g) at row C-1-r+j when j <= r, else in block
    (A-g) at row j-r-1. Contracting U = q.E_blocks against these one-hots
    performs that shear as a dense matmul.
    """
    r = jnp.arange(block)[:, None, None]
    j = jnp.arange(block)[None, :, None]
    p = jnp.arange(block)[None, None, :]
    sel0 = ((j <= r) & (p == block - 1 - r + j)).astype(dtype)
    sel1 = ((j > r) & (p == j - r - 1)).astype(dtype)
    return sel0, sel1


def band_causal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_embedding=None,
    *,
    scale: bool = True,
    block_size: int = 128,
    dropout_rng=None,
    dropout_rate: float = 0.0,
) -> jnp.ndarray:
    """Causal self-attention over [B, H, S, D] in band coordinates.

    Numerically equivalent (to rounding) to
    ``attention_ops.multihead_attention(q, k, v, rel_embedding=...)`` for
    square causal self-attention; requires S % block_size == 0.
    ``rel_embedding`` is [H, window, D] in skew layout (window >= S).

    The body is under selective rematerialization: the bf16 masked score
    tensor ("band_scores") plus the f32 softmax row max/sum
    ("band_softmax_stats", O(S) per layer) are saved for the backward pass;
    the f32 softmax output (4x larger) and the band K/V expansions are
    recomputed — with the stats saved, that replay is a single fused pass.
    Saving more (probs and/or band K/V) exceeded HBM at 2048 ctx batch 8;
    full recompute wasted a forward.
    """
    batch, heads, seq, depth = q.shape
    if seq % block_size != 0:
        raise ValueError(f"sequence {seq} not a multiple of block {block_size}")
    if rel_embedding is not None and seq > rel_embedding.shape[1]:
        raise ValueError(
            f"sequence {seq} exceeds relative window {rel_embedding.shape[1]}"
        )
    num_blocks = q.shape[2] // block_size
    if num_blocks >= 4 and num_blocks % 2 == 0:
        # Two-piece block-triangular split: skips 25% of the band work (the
        # causally-dead g > a half is halved) — see _band_causal_attention_split2.
        return _band_causal_attention_split2(
            q, k, v, rel_embedding, scale, block_size, dropout_rng, dropout_rate
        )
    return _band_causal_attention(
        q, k, v, rel_embedding, scale, block_size, dropout_rng, dropout_rate
    )


def _rel_ehat(e_rev, e_rev1, sel0, sel1):
    """ehat[h,r,g,j,d] = E(distance g*C + r - j) for the given g-range."""
    return jnp.einsum("rjp,hgpd->hrgjd", sel0, e_rev) + jnp.einsum(
        "rjp,hgpd->hrgjd", sel1, e_rev1
    )


def _masked_softmax(w):
    """f32 max-subtracted softmax over the last axis with remat-named stats."""
    w = jax.ad_checkpoint.checkpoint_name(w, "band_scores")
    w32 = w.astype(jnp.float32)
    row_max = jax.ad_checkpoint.checkpoint_name(
        jax.lax.stop_gradient(jnp.max(w32, axis=-1, keepdims=True)),
        "band_softmax_stats",
    )
    unnormalized = jnp.exp(w32 - row_max)
    row_sum = jax.ad_checkpoint.checkpoint_name(
        jnp.sum(unnormalized, axis=-1, keepdims=True), "band_softmax_stats"
    )
    return (unnormalized / row_sum).astype(w.dtype)


@partial(
    jax.checkpoint,
    static_argnums=(4, 5, 7),
    policy=jax.checkpoint_policies.save_only_these_names(
        "band_scores", "band_softmax_stats"
    ),
)
def _band_causal_attention_split2(
    q, k, v, rel_embedding, scale, block_size, dropout_rng, dropout_rate
):
    """Band attention with the diagonal-offset axis split in two.

    The rectangular (a, g) band computes A*G block pairs but only the causal
    half g <= a is real. Splitting at A2 = A/2 keeps every piece rectangular
    while halving the dead region:

      piece "near": offsets g in [0, A2) for ALL query blocks  (A x A2)
      piece "far":  offsets g in [A2, A) for query blocks a >= A2 (A2 x A2)

    -> 3/4 of the full rectangle's QK/rel/softmax/PV work, fwd and bwd. Rows
    a < A2 softmax over the near piece alone; rows a >= A2 softmax over the
    concatenation [near | far] (one fused row softmax of full width — no
    online merge needed). The E table slices stay g-contiguous, so the
    pre-sheared ehat splits for free.
    """
    batch, heads, seq, depth = q.shape
    a_blocks, c = seq // block_size, block_size
    half = a_blocks // 2
    dt = q.dtype

    qb = q.reshape(batch, heads, a_blocks, c, depth)
    kb = k.reshape(batch, heads, a_blocks, c, depth)
    vb = v.reshape(batch, heads, a_blocks, c, depth)

    # Near piece: kg1[b,h,a,g,j,d] = k[(a-g)*C+j] for g < A2 (zero when g > a).
    a_i = jnp.arange(a_blocks)[:, None, None]
    g_i = jnp.arange(half)[None, :, None]
    c_i = jnp.arange(a_blocks)[None, None, :]
    sel_near = (a_i - g_i == c_i).astype(dt)  # (A, A2, A)
    kg1 = jnp.einsum("agc,bhcjd->bhagjd", sel_near, kb)
    vg1 = jnp.einsum("agc,bhcjd->bhagjd", sel_near, vb)

    # Far piece: query block a = A2+a2, offset g = A2+g2 -> key block a2-g2.
    sel_far = _block_select(half, dt)  # (A2, A2, A2)
    qb_far = qb[:, :, half:]
    kg2 = jnp.einsum("agc,bhcjd->bhagjd", sel_far, kb[:, :, :half])
    vg2 = jnp.einsum("agc,bhcjd->bhagjd", sel_far, vb[:, :, :half])

    w1a = jnp.einsum("bhard,bhagjd->bhargj", qb[:, :, :half], kg1[:, :, :half])
    w1b = jnp.einsum("bhard,bhagjd->bhargj", qb_far, kg1[:, :, half:])
    w2 = jnp.einsum("bhard,bhagjd->bhargj", qb_far, kg2)

    if rel_embedding is not None:
        window = rel_embedding.shape[1]
        e_slice = rel_embedding[:, window - seq :, :].astype(dt)
        e_blk = e_slice.reshape(heads, a_blocks, c, depth)
        e_rev = e_blk[:, ::-1]
        e_rev1 = jnp.concatenate(
            [jnp.zeros_like(e_rev[:, :1]), e_rev[:, :-1]], axis=1
        )
        sel0, sel1 = _shift_selects(c, dt)
        ehat_near = _rel_ehat(e_rev[:, :half], e_rev1[:, :half], sel0, sel1)
        ehat_far = _rel_ehat(e_rev[:, half:], e_rev1[:, half:], sel0, sel1)
        w1a = w1a + jnp.einsum("bhard,hrgjd->bhargj", qb[:, :, :half], ehat_near)
        w1b = w1b + jnp.einsum("bhard,hrgjd->bhargj", qb_far, ehat_near)
        w2 = w2 + jnp.einsum("bhard,hrgjd->bhargj", qb_far, ehat_far)

    if scale:
        inv = lax.rsqrt(jnp.asarray(depth, dt))
        w1a, w1b, w2 = w1a * inv, w1b * inv, w2 * inv

    neg = jnp.asarray(1e4, dt)
    # diag rule: offset-0 blocks are the diagonal -> r >= j; others in the
    # near piece are fully valid for their rows.
    diag_ok = (jnp.arange(half)[:, None, None] >= 1) | (
        jnp.arange(c)[None, :, None] >= jnp.arange(c)[None, None, :]
    )  # (g, r, j)
    diag_rgj = diag_ok.transpose(1, 0, 2)[None]  # (1, r, g, j)
    # Rows a < A2: additionally ragged in g (g <= a).
    a_ok = (
        jnp.arange(half)[:, None] >= jnp.arange(half)[None, :]
    )  # (a, g)
    b1a = (a_ok[:, None, :, None] & diag_rgj).astype(dt)
    w1a = w1a * b1a - neg * (1 - b1a)
    # Rows a >= A2, near offsets: g < A2 <= a always valid except diag rule.
    b1b = diag_rgj.astype(dt)
    w1b = w1b * b1b - neg * (1 - b1b)
    # Far offsets: g2 <= a2 raggedness only (never the diagonal: g >= A2 > 0).
    b2 = a_ok[:, None, :, None].astype(dt)
    w2 = w2 * b2 - neg * (1 - b2)

    w_near_rows = w1a.reshape(batch, heads, half, c, half * c)
    w_far_rows = jnp.concatenate(
        [
            w1b.reshape(batch, heads, half, c, half * c),
            w2.reshape(batch, heads, half, c, half * c),
        ],
        axis=-1,
    )  # (B, H, A2, C, A*C); columns = [near slots | far slots]

    probs_near = _masked_softmax(w_near_rows)
    probs_far = _masked_softmax(w_far_rows)

    if dropout_rng is not None and dropout_rate > 0.0:
        k_near, k_far = jax.random.split(dropout_rng)
        keep = jax.random.bernoulli(k_near, 1.0 - dropout_rate, probs_near.shape)
        probs_near = probs_near * keep.astype(dt) / (1.0 - dropout_rate)
        keep = jax.random.bernoulli(k_far, 1.0 - dropout_rate, probs_far.shape)
        probs_far = probs_far * keep.astype(dt) / (1.0 - dropout_rate)

    vg_near_rows = vg1[:, :, :half].reshape(batch, heads, half, half * c, depth)
    vg_far_rows = jnp.concatenate(
        [
            vg1[:, :, half:].reshape(batch, heads, half, half * c, depth),
            vg2.reshape(batch, heads, half, half * c, depth),
        ],
        axis=3,
    )  # (B, H, A2, A*C, D); same column order as w_far_rows
    out_near = jnp.einsum("bharK,bhaKd->bhard", probs_near, vg_near_rows)
    out_far = jnp.einsum("bharK,bhaKd->bhard", probs_far, vg_far_rows)
    out = jnp.concatenate([out_near, out_far], axis=2)
    return out.reshape(batch, heads, seq, depth)


@partial(
    jax.checkpoint,
    static_argnums=(4, 5, 7),
    policy=jax.checkpoint_policies.save_only_these_names(
        "band_scores", "band_softmax_stats"
    ),
)
def _band_causal_attention(
    q, k, v, rel_embedding, scale, block_size, dropout_rng, dropout_rate
):
    batch, heads, seq, depth = q.shape
    num_blocks = seq // block_size
    a_blocks, c = num_blocks, block_size
    dt = q.dtype

    qb = q.reshape(batch, heads, a_blocks, c, depth)
    kb = k.reshape(batch, heads, a_blocks, c, depth)
    vb = v.reshape(batch, heads, a_blocks, c, depth)

    sel_blk = _block_select(a_blocks, dt)
    # Band-layout K/V: kg[b,h,a,g,j,d] = k[b,h,(a-g)*C+j,d] (zero when g > a).
    kg = jnp.einsum("agc,bhcjd->bhagjd", sel_blk, kb)
    vg = jnp.einsum("agc,bhcjd->bhagjd", sel_blk, vb)

    # Raw scores, band layout; (g, j) is the contiguous minor pair.
    w = jnp.einsum("bhard,bhagjd->bhargj", qb, kg)

    if rel_embedding is not None:
        window = rel_embedding.shape[1]
        if seq > window:
            raise ValueError(f"sequence {seq} exceeds relative window {window}")
        # Skew layout: e_slice[m] holds the embedding for distance S-1-m.
        e_slice = rel_embedding[:, window - seq :, :].astype(dt)
        e_blk = e_slice.reshape(heads, a_blocks, c, depth)
        e_rev = e_blk[:, ::-1]  # e_rev[g] = e_blk[A-1-g]
        # e_rev1[g] = e_blk[A-g]; g=0 needs block A (distances < 0) => zeros,
        # and those entries are causally masked anyway.
        e_rev1 = jnp.concatenate(
            [jnp.zeros_like(e_rev[:, :1]), e_rev[:, :-1]], axis=1
        )
        # Pre-shear E (E-sized data, not score-sized):
        # ehat[h,r,g,j,d] = E(distance g*C + r - j), assembled from the low
        # and high C-aligned blocks via the constant one-hot contractions.
        # Then the bias is one q.ehat matmul straight into band layout —
        # measured ~4x faster than the skew chain at 2048 ctx (TODO.md).
        sel0, sel1 = _shift_selects(c, dt)
        ehat = jnp.einsum("rjp,hgpd->hrgjd", sel0, e_rev) + jnp.einsum(
            "rjp,hgpd->hrgjd", sel1, e_rev1
        )
        w = w + jnp.einsum("bhard,hrgjd->bhargj", qb, ehat)

    if scale:
        w = w * lax.rsqrt(jnp.asarray(depth, dt))

    # Causal mask in band coordinates (reference formula w*b - 1e4*(1-b)).
    a_ok = (
        jnp.arange(a_blocks)[:, None] >= jnp.arange(a_blocks)[None, :]
    )  # (a, g)
    diag_ok = (jnp.arange(a_blocks)[:, None, None] >= 1) | (
        jnp.arange(c)[None, :, None] >= jnp.arange(c)[None, None, :]
    )  # (g, r, j)
    b = (a_ok[:, None, :, None] & diag_ok.transpose(1, 0, 2)[None]).astype(dt)
    w = w * b - jnp.asarray(1e4, dt) * (1 - b)

    # Fused softmax over the contiguous (g, j) minor pair, written out so the
    # row max/sum can be named for the remat policy: saving these O(S) stats
    # (f32, ~4 MB/layer at bench shapes) turns the backward's softmax replay
    # into a single fused pass over the saved scores instead of three
    # (max-reduce, exp+sum-reduce, normalize) — measured 398 -> 376 ms/step at
    # 2048 ctx batch 8. Numerics identical to jax.nn.softmax (max-subtracted,
    # f32).
    w = w.reshape(batch, heads, a_blocks, c, a_blocks * c)
    w = jax.ad_checkpoint.checkpoint_name(w, "band_scores")
    w32 = w.astype(jnp.float32)
    row_max = jax.ad_checkpoint.checkpoint_name(
        jax.lax.stop_gradient(jnp.max(w32, axis=-1, keepdims=True)),
        "band_softmax_stats",
    )
    unnormalized = jnp.exp(w32 - row_max)
    row_sum = jax.ad_checkpoint.checkpoint_name(
        jnp.sum(unnormalized, axis=-1, keepdims=True), "band_softmax_stats"
    )
    probs = (unnormalized / row_sum).astype(dt)

    if dropout_rng is not None and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(dt) / (1.0 - dropout_rate)

    out = jnp.einsum(
        "bharK,bhaKd->bhard",
        probs,
        vg.reshape(batch, heads, a_blocks, a_blocks * c, depth),
    )
    return out.reshape(batch, heads, seq, depth)
