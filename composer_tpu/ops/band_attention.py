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

import os
from functools import partial

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax import lax

from composer_tpu.ops.dropout import dropout_keep_mask


# Experiment knobs (A/B benchmarking; defaults = production behavior).
# COMPOSER_BAND_NS overrides the split depth; COMPOSER_BAND_SAVE_KV=1 adds the
# band K/V tables to the remat save policy (skips rebuilding them in the
# backward replay at the cost of ~2.1 GB HBM at 2048 ctx batch 8).
_NS_OVERRIDE = int(os.environ.get("COMPOSER_BAND_NS", "0"))
_SAVE_KV = os.environ.get("COMPOSER_BAND_SAVE_KV", "") == "1"
_SAVED_NAMES = ("band_scores", "band_softmax_stats") + (
    ("band_kv",) if _SAVE_KV else ()
)


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
    # Block-triangular split: skip the causally-dead part of the band
    # rectangle ((ns+1)/2ns of the full work remains). Measured at 2048 ctx
    # batch 8 (16 blocks): ns=2 303 ms/step, ns=4 244, ns=8 205 — deeper
    # splits win more than their FLOP coverage predicts (smaller rectangular
    # pieces fuse better), so prefer the deepest split with >= 2 block rows
    # per group. A delta-batched variant (all (t, i) pairs with equal t - i
    # in ONE einsum stacked over t, online softmax merge across deltas, no
    # score-sized concats) measured 288 ms vs 200 here — the larger stacked
    # einsums relayout worse than many small rectangles; do not revisit
    # without new layout evidence.
    split_choices = (_NS_OVERRIDE,) if _NS_OVERRIDE else (8, 4, 2)
    min_rows = 1 if _NS_OVERRIDE else 2
    for num_splits in split_choices:
        if num_blocks % num_splits == 0 and num_blocks // num_splits >= min_rows:
            return _band_causal_attention_split(
                q, k, v, rel_embedding, scale, block_size, num_splits,
                dropout_rng, dropout_rate,
            )
    return _band_causal_attention(
        q, k, v, rel_embedding, scale, block_size, dropout_rng, dropout_rate
    )


def _rel_ehat(e_rev, e_rev1, sel0, sel1):
    """ehat[h,r,g,j,d] = E(distance g*C + r - j) for the given g-range.

    The low/high-block selections are fused into ONE contraction over a
    doubled p axis (the one-hot blocks are disjoint, so concatenation is
    exact): half the MXU dispatches of the two-einsum form.
    """
    sel = jnp.concatenate([sel0, sel1], axis=2)  # (r, j, 2C)
    e_cat = jnp.concatenate([e_rev, e_rev1], axis=2)  # (h, g, 2C, d)
    return jnp.einsum("rjp,hgpd->hrgjd", sel, e_cat)


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
    static_argnums=(4, 5, 6, 8),
    policy=jax.checkpoint_policies.save_only_these_names(*_SAVED_NAMES),
)
def _band_causal_attention_split(
    q, k, v, rel_embedding, scale, block_size, num_splits, dropout_rng, dropout_rate
):
    """Band attention with the diagonal-offset axis split into ``num_splits``.

    The rectangular (a, g) band computes A*G block pairs but only the causal
    half g <= a is real. Cutting the offset axis into ns chunks of As = A/ns
    and computing chunk i only for query blocks a >= i*As covers the causal
    region with (ns+1)/(2*ns) of the rectangle's QK/rel/softmax/PV work
    (3/4 at ns=2, 5/8 at ns=4), forward and backward.

    Key sharing: the scores of query-row group t against offset chunk i need
    key blocks (t-i)*As + a' - g', which depend only on delta = t - i — so
    only ns band-layout K/V tables are built, one per delta. Row group t
    softmaxes over the concatenation of its chunks [0..t] (a single fused
    row softmax per group; no online merge). E-table slices stay
    g-contiguous, so the pre-sheared rel tables split for free.
    """
    batch, heads, seq, depth = q.shape
    a_blocks, c = seq // block_size, block_size
    ns = num_splits
    asz = a_blocks // ns
    dt = q.dtype

    qb = q.reshape(batch, heads, a_blocks, c, depth)
    kb = k.reshape(batch, heads, a_blocks, c, depth)
    vb = v.reshape(batch, heads, a_blocks, c, depth)

    # Per-delta band K/V: kg[d][a', g', j, :] = k_block(delta*As + a' - g').
    ap = jnp.arange(asz)[:, None, None]
    gp = jnp.arange(asz)[None, :, None]
    cb = jnp.arange(a_blocks)[None, None, :]
    kg, vg = [], []
    for delta in range(ns):
        sel = (delta * asz + ap - gp == cb).astype(dt)  # (As, As, A)
        kg.append(jax.ad_checkpoint.checkpoint_name(
            jnp.einsum("agc,bhcjd->bhagjd", sel, kb), "band_kv"))
        vg.append(jax.ad_checkpoint.checkpoint_name(
            jnp.einsum("agc,bhcjd->bhagjd", sel, vb), "band_kv"))

    # Per-chunk pre-sheared rel tables (g-contiguous slices of E).
    ehat = None
    if rel_embedding is not None:
        window = rel_embedding.shape[1]
        e_slice = rel_embedding[:, window - seq :, :].astype(dt)
        e_blk = e_slice.reshape(heads, a_blocks, c, depth)
        e_rev = e_blk[:, ::-1]
        e_rev1 = jnp.concatenate(
            [jnp.zeros_like(e_rev[:, :1]), e_rev[:, :-1]], axis=1
        )
        sel0, sel1 = _shift_selects(c, dt)
        ehat = [
            _rel_ehat(
                e_rev[:, i * asz : (i + 1) * asz],
                e_rev1[:, i * asz : (i + 1) * asz],
                sel0,
                sel1,
            )
            for i in range(ns)
        ]

    inv = lax.rsqrt(jnp.asarray(depth, dt)) if scale else jnp.asarray(1.0, dt)
    neg = jnp.asarray(1e4, dt)
    # Masks: the row group's own chunk (i == t) is ragged in g (g' <= a');
    # chunk 0 additionally carries the diagonal rule (g == 0 -> r >= j).
    a_ok = (jnp.arange(asz)[:, None] >= jnp.arange(asz)[None, :])  # (a', g')
    diag_ok = (jnp.arange(asz)[:, None, None] >= 1) | (
        jnp.arange(c)[None, :, None] >= jnp.arange(c)[None, None, :]
    )  # (g', r, j)
    diag_rgj = diag_ok.transpose(1, 0, 2)[None]  # (1, r, g', j)

    outputs = []
    for t in range(ns):
        qt = qb[:, :, t * asz : (t + 1) * asz]
        chunks = []
        for i in range(t + 1):
            w = jnp.einsum("bhard,bhagjd->bhargj", qt, kg[t - i])
            if ehat is not None:
                w = w + jnp.einsum("bhard,hrgjd->bhargj", qt, ehat[i])
            w = w * inv
            mask = None
            if i == 0:
                mask = diag_rgj
            if i == t:
                own = a_ok[:, None, :, None]
                mask = own if mask is None else (own & mask)
            if mask is not None:
                m = jnp.broadcast_to(mask, w.shape).astype(dt)
                w = w * m - neg * (1 - m)
            chunks.append(w.reshape(batch, heads, asz, c, asz * c))
        w_rows = chunks[0] if t == 0 else jnp.concatenate(chunks, axis=-1)
        probs = _masked_softmax(w_rows)
        if dropout_rng is not None and dropout_rate > 0.0:
            keep = dropout_keep_mask(
                jax.random.fold_in(dropout_rng, t), dropout_rate, probs.shape
            )
            probs = probs * keep.astype(dt) / (1.0 - dropout_rate)
        v_chunks = [
            vg[t - i].reshape(batch, heads, asz, asz * c, depth)
            for i in range(t + 1)
        ]
        v_rows = v_chunks[0] if t == 0 else jnp.concatenate(v_chunks, axis=3)
        outputs.append(jnp.einsum("bharK,bhaKd->bhard", probs, v_rows))

    out = jnp.concatenate(outputs, axis=2)
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
        ehat = _rel_ehat(e_rev, e_rev1, sel0, sel1)
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
        keep = dropout_keep_mask(dropout_rng, dropout_rate, probs.shape)
        probs = probs * keep.astype(dt) / (1.0 - dropout_rate)

    out = jnp.einsum(
        "bharK,bhaKd->bhard",
        probs,
        vg.reshape(batch, heads, a_blocks, a_blocks * c, depth),
    )
    return out.reshape(batch, heads, seq, depth)
