"""Segmented streaming decode for weights-over-VMEM models: continuous
batching for the wide-model class.

Marries the two round-4 kernels (VERDICT r4 item 1):

* from ops/decode_kernel_wide.py — weights stay in HBM and stream through
  double-buffered VMEM blocks per layer; the KV cache stays in HBM in the
  lane-stacked ``(L, rows, 2*B*E)`` layout and its live prefix streams back
  through chunked online-softmax attention; recent rows live in a VMEM tail
  window flushed to HBM at window crossings;
* from ops/decode_kernel_segmented.py — per-row position clocks
  (``start[s]``), fixed-step segments with carried state, per-step PRNG
  reseeding from (seed, global step), and raw ``(B, steps)`` sample output
  (-1 while parked) — so the continuous-batching scheduler
  (serving.ContinuousGenerationService) can admit/evict at every segment
  boundary.

What changes when the two meet:

* the tail window becomes PER-ROW: row ``s``'s tail rows map to cache slots
  ``[frontier_s, frontier_s + TAIL)`` where ``frontier_s`` is its own
  position's window base — rows cross window boundaries at different global
  steps, so flushes are per-row lane-sliced DMAs (row ``s`` owns lanes
  ``[s*E, (s+1)*E)`` k / ``[B*E + s*E, ...)`` v of the lane-stacked cache);
* the tail must SURVIVE segment boundaries (rows above the flush frontier
  exist nowhere else): each segment flushes every row's current window out
  at the end and reloads it at the start — 2*L*B small DMAs per boundary,
  amortized over ``steps`` decode steps;
* the relative-bias fetch can no longer slice per-position (rows sit at
  different positions), but positions are bounded by the static ``live``,
  so ONE ``(2*live + 256)``-row slice of the skew table per layer covers
  every row's band alignment; each row rolls its own band out of the shared
  block (the per-row analogue of decode_kernel.py:330-345);
* chunked KV reads stay ONE DMA per (layer, chunk) — the lane-stacked
  layout still serves all rows from the same row-block — with per-row
  causal/frontier masks.

Greedy output is bit-identical to ops/decode_kernel_wide.py for any
segmentation and admission timing (pinned in
tests/test_decode_wide_segmented.py); sampled rows draw from
(seed, global step) with the segmented kernel's invariance semantics.

DEPLOYMENT NOTE (measured on the axon TPU backend): the FIRST execution of
a freshly compiled variant of this kernel can read garbage (NaN logits ->
out-of-vocab tokens) with bit-identical inputs succeeding on every later
execution — a nondeterministic first-run platform quirk, not a data
dependence (state snapshots replayed through the same executable fail
only on the first run; the per-row contiguous-DMA layout was adopted
while chasing it and retained for its simpler transfer pattern). Run each
newly compiled (steps, live, sampling-flags) signature once on a
THROWAWAY all-parked state before real state touches it —
serving.ContinuousGenerationService._warm_wide_variant does exactly this.

Reference surface: replaces the decode loop at reference cli.py:662-676 for
the model class the reference could never run at all (weights beyond fast
memory), under continuous serving load.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composer_tpu.ops.decode_kernel import (
    KV_SLAB,
    NEG_INF,
    _filtered_scaled_logits,
    _gelu_tanh,
    _layernorm,
    _round_up,
    _standardize,
)
from composer_tpu.ops.decode_kernel_segmented import _STEP_SEED_MIX, PARKED
from composer_tpu.ops.decode_kernel_wide import (
    TAIL,
    _wide_matmul,
    pack_weights_wide,
)

# Rows per streamed KV chunk. Smaller than the whole-generation wide
# kernel's 512: the chunk buffer is (2, KV_CHUNK, 2*B*E) and the segmented
# engine wants slots more than chunk size (DMA count per step only grows
# ~linearly in nchunks while VMEM scales with the chunk).
KV_CHUNK_SEG = 256

__all__ = [
    "KV_CHUNK_SEG", "decode_segment_wide", "init_wide_segment_state",
    "wide_segment_vmem_bytes", "pack_weights_wide", "PARKED",
]


def _seg_cache_rows(cache_len: int, tail: int = TAIL,
                    kv_chunk: int = KV_CHUNK_SEG) -> int:
    # Chunk- and tail-aligned HBM rows: chunk DMAs read full kv_chunk
    # blocks and tail flushes write full tail blocks; both must stay in
    # bounds (over-read rows are masked, over-written rows never read).
    return _round_up(cache_len + tail, max(kv_chunk, tail))


def init_wide_segment_state(packed, config, batch: int, cache_len: int,
                            tail: int = TAIL,
                            kv_chunk: int = KV_CHUNK_SEG):
    """Carried state: zeroed per-row HBM KV + the carry one-hot.

    The KV layout is PER ROW — ``(L, B * rows, 2*E)``: slot ``s``'s cache
    occupies row block ``[s*rows, (s+1)*rows)``, each row holding that
    cache slot's k (lanes [0, E)) then v (lanes [E, 2E)). Unlike the
    whole-generation wide kernel's lane-stacked layout, every tail
    flush/reload and chunk DMA is then a CONTIGUOUS full-lane block —
    lane-sliced (strided) DMAs raced on hardware (first-execution NaNs
    after a different program had run; see the r5 commit history). Zeros
    matter only before a slot's first occupant; later occupants overwrite
    every row they read.
    """
    vocab_pad = packed["wte"].shape[0]
    kv = jnp.zeros(
        (config.num_layers,
         batch * _seg_cache_rows(cache_len, tail, kv_chunk),
         2 * config.embed_dim),
        packed["wte"].dtype,
    )
    carry = jnp.zeros(
        (batch * config.num_heads, vocab_pad), packed["wte"].dtype
    )
    return kv, carry


def wide_segment_vmem_bytes(config, batch: int, live: int,
                            dtype_bytes: int = 2) -> int:
    """Estimated VMEM residency of one segment call — the slot budget.

    Mirrors the kernel's scratch shapes: weight double buffers, per-row
    tail windows, the chunk double buffer, the shared rel-band block, the
    resident embedding tables, plus ~12 MB activation/compiler slack.
    """
    e = config.embed_dim
    total = 2 * 12 * e * e * dtype_bytes                      # weight bufs
    total += config.num_layers * TAIL * 2 * batch * e * dtype_bytes  # tails
    total += 2 * KV_CHUNK_SEG * 2 * e * dtype_bytes           # chunk buf
    if config.use_relative_attention:
        total += 2 * (2 * live + 256) * e * dtype_bytes       # rel block
    vocab_pad = -(-config.vocab_size // 256) * 256
    total += (2 * vocab_pad + config.window_size) * e * dtype_bytes
    return total + 12 * 1024 * 1024


def _wide_segment_kernel(
    # scalar prefetch (SMEM)
    prompt_ref, plen_ref, start_ref, step0_ref, seed_ref,
    temp_ref, topk_ref, topp_ref,
    # tensor inputs: small VMEM-resident operands
    wte_ref, wte_t_ref, wpe_ref, ln1_ref,
    qkv_b_ref, proj_b_ref, fc_b_ref, fp_b_ref, logits_b_ref,
    wscale_ref, fpscale_ref,
    # tensor inputs: HBM-resident (streamed)
    big_w_hbm, fp_w_hbm, rel_hbm, kv_hbm_in, carry_in,
    # outputs (kv/carry aliased to the inputs)
    tokens_ref, kv_hbm_out, carry_ref,
    # scratch
    big_buf, fp_buf, kv_buf, rel_buf, tail_buf,
    sem_w, sem_kv, sem_rel, sem_tail,
    *, batch: int, num_layers: int, num_heads: int, head_dim: int,
    embed_dim: int, cache_len: int, window: int, vocab_pad: int,
    vocab_size: int, steps: int, live: int, ln_eps: float,
    scale_attention: bool, greedy: bool, use_rel: bool, quantized: bool,
    tail: int, kv_chunk: int,
    use_k: bool = False, use_p: bool = False,
):
    TAIL, KV_CHUNK_SEG = tail, kv_chunk  # shadow the defaults (testable sizes)
    del kv_hbm_in, carry_in  # aliased: all traffic through the outputs
    kv = kv_hbm_out
    B, R, E, C = batch, num_heads, embed_dim, cache_len
    CROWS = kv.shape[1] // B  # HBM cache rows per slot (per-row layout)
    step0 = step0_ref[0]
    nchunks = -(-live // KV_CHUNK_SEG)
    lead = _round_up(C, 128)  # rel table's leading zero rows
    # Static rel fetch window: positions are bounded by ``live``, so rows
    # [rel_base, rel_base + REL_SPAN) of the padded skew table cover every
    # row's (live + 128)-wide band run (see module docstring).
    REL_SPAN = _round_up(2 * live + 256, 128)
    rel_base = ((lead + window - live) // 128) * 128

    def col(ref, dtype):
        return jnp.concatenate(
            [jnp.full((1, 1), ref[s], dtype) for s in range(B)], axis=0
        )

    plen_col = col(plen_ref, jnp.int32)
    start_col = col(start_ref, jnp.int32)
    if not greedy:
        inv_temp_col = jnp.concatenate(
            [
                1.0 / jnp.full(
                    (1, 1),
                    jnp.where(temp_ref[s] > 0.0, temp_ref[s], 1.0),
                    jnp.float32,
                )
                for s in range(B)
            ],
            axis=0,
        )
        noise_col = jnp.concatenate(
            [
                jnp.full(
                    (1, 1), jnp.where(temp_ref[s] > 0.0, 1.0, 0.0), jnp.float32
                )
                for s in range(B)
            ],
            axis=0,
        )

    rowmask_one = (
        jax.lax.broadcasted_iota(jnp.int32, (R, E), 1) // head_dim
        == jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    ).astype(jnp.float32)
    rowmask = jnp.tile(rowmask_one, (B, 1))  # (B*R, E)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, steps), 1)
    vocab_cols_b = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_pad), 1)
    vocab_cols_r = jax.lax.broadcasted_iota(jnp.int32, (R, vocab_pad), 1)
    wpe_cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    chunk_cols = jax.lax.broadcasted_iota(jnp.int32, (R, KV_CHUNK_SEG), 1)
    tail_cols = jax.lax.broadcasted_iota(jnp.int32, (R, TAIL), 1)
    slab_rows = jax.lax.broadcasted_iota(jnp.int32, (KV_SLAB, E), 0)

    softmax_scale = float(head_dim) ** -0.5 if scale_attention else 1.0

    def expand(x_small):  # (B, n) -> (B*R, n)
        return jnp.broadcast_to(
            x_small[:, None, :], (B, R, x_small.shape[1])
        ).reshape(B * R, x_small.shape[1])

    def collapse(x_wide):  # (B*R, E) -> (B, E) masked head-sum
        return jnp.sum((x_wide * rowmask).reshape(B, R, E), axis=1)

    def posc(i, s):
        """Row s's position clamped into the live prefix (parked rows clamp
        to 0 — their reads are discarded, the clamp keeps them in-slot; a
        lingering completed row past ``live`` clamps likewise and its
        writes repeat harmlessly on row live-1, never out of range)."""
        return jnp.clip(i - start_ref[s], 0, live - 1)

    def prompt_onehots(i):
        rows = []
        for s in range(B):
            index = jnp.clip(i - start_ref[s], 0, plen_ref[s] - 1)
            rows.append(
                (vocab_cols_r == prompt_ref[s, index]).astype(wte_ref.dtype)
            )
        return jnp.concatenate(rows, axis=0)  # (B*R, Vpad)

    # ------------------------------------------------------------ DMA plumbing
    def weight_copies(layer):
        return [
            pltpu.make_async_copy(big_w_hbm.at[layer], big_buf.at[layer % 2], sem_w),
            pltpu.make_async_copy(fp_w_hbm.at[layer], fp_buf.at[layer % 2], sem_w),
        ]

    def rel_copy(layer):
        # Static slice: one block per layer serves every row's alignment.
        return pltpu.make_async_copy(
            rel_hbm.at[layer, pl.ds(rel_base, REL_SPAN)],
            rel_buf.at[layer % 2],
            sem_rel,
        )

    # Chunk DMAs run per (layer, chunk, s) — the per-row cache layout makes
    # each one a CONTIGUOUS full-lane row block. The sequence index g walks
    # them in execution order and picks the double-buffer slot (g % 2).
    total_chunk_dmas = num_layers * nchunks * B

    def kv_chunk_copy(g):
        layer = g // (nchunks * B)
        chunk = (g // B) % nchunks
        s = g % B
        return pltpu.make_async_copy(
            kv.at[layer, pl.ds(
                s * CROWS + chunk * KV_CHUNK_SEG, KV_CHUNK_SEG
            )],
            kv_buf.at[g % 2],
            sem_kv,
        )

    def tail_row_copies(s, frontier, to_hbm: bool):
        """Window transfer for row s: its tail rows <-> its HBM cache rows
        [frontier, frontier + TAIL) — one contiguous full-lane block per
        layer. (An earlier lane-sliced variant over the lane-stacked layout
        raced on hardware: first execution after a different program read
        garbage tail rows.)"""
        copies = []
        for layer in range(num_layers):
            hbm_ref = kv.at[
                layer,
                pl.ds(pl.multiple_of(s * CROWS + frontier, TAIL), TAIL),
            ]
            vmem_ref = tail_buf.at[layer, pl.ds(s * TAIL, TAIL)]
            src, dst = (
                (vmem_ref, hbm_ref) if to_hbm else (hbm_ref, vmem_ref)
            )
            copies.append(pltpu.make_async_copy(src, dst, sem_tail))
        return copies

    def run_copies(copies):
        for copy in copies:
            copy.start()
        for copy in copies:
            copy.wait()

    # Segment prologue: reload every slot's current tail window from the
    # HBM cache (flushed there by the previous segment's epilogue). Rows
    # above each slot's own valid position are stale and masked on read —
    # reloading unconditionally (parked slots included) keeps every tail
    # row a DEFINED value, which the 0-weight softmax contraction needs.
    for s in range(B):
        frontier0 = (posc(step0, s) // TAIL) * TAIL
        run_copies(tail_row_copies(s, frontier0, to_hbm=False))

    def step_fn(i, onehot):
        pos_col = i - start_col  # (B, 1); < 0 = parked
        active_col = pos_col >= 0

        # Per-row window crossings strictly inside the segment: the row's
        # previous TAIL rows are complete — flush them to HBM BEFORE this
        # step's chunk prefetches may read them. (The i == step0 boundary
        # is handled by the previous segment's epilogue + the prologue
        # reload; flushing here again would push the freshly reloaded NEW
        # window over the completed old one.)
        for s in range(B):
            pos_s = i - start_ref[s]
            crossing = jnp.logical_and(
                jnp.logical_and(pos_s > 0, pos_s < live),
                jnp.logical_and(pos_s % TAIL == 0, i > step0),
            )

            @pl.when(crossing)
            def _flush(s=s, pos_s=pos_s):
                run_copies(
                    tail_row_copies(s, (pos_s // TAIL) * TAIL - TAIL,
                                    to_hbm=True)
                )

        # Stream-in prologue for this step.
        for copy in weight_copies(0):
            copy.start()
        if use_rel:
            rel_copy(0).start()
        if total_chunk_dmas:
            kv_chunk_copy(0).start()

        tok_embed = jax.lax.dot_general(
            onehot, wte_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B*R, E)
        pos_onehot = jnp.concatenate(
            [
                (wpe_cols == jnp.clip(i - start_ref[s], 0, window - 1)).astype(
                    wpe_ref.dtype
                )
                for s in range(B)
            ],
            axis=0,
        )  # (B, window)
        pos_embed = jax.lax.dot_general(
            pos_onehot, wpe_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = tok_embed + expand(pos_embed)  # (B*R, E)

        for layer in range(num_layers):
            slot = layer % 2
            for copy in weight_copies(layer):
                copy.wait()
            if use_rel:
                rel_copy(layer).wait()
            if layer + 1 < num_layers:
                for copy in weight_copies(layer + 1):
                    copy.start()
                if use_rel:
                    rel_copy(layer + 1).start()

            x1 = _layernorm(
                h, ln1_ref[layer, 0:1, :], ln1_ref[layer, 1:2, :], ln_eps
            )
            qkv = _wide_matmul(
                x1, big_buf.at[slot, :, 0 : 3 * E],
                wscale_ref[layer, 0:1, 0 : 3 * E] if quantized else None,
            ) + qkv_b_ref[layer].astype(jnp.float32)
            q = qkv[:, :E]
            k_small = collapse(qkv[:, E : 2 * E])  # (B, E)
            v_small = collapse(qkv[:, 2 * E :])

            qb_f32 = q * rowmask
            qb = qb_f32.astype(tail_buf.dtype)

            # Per-row tail append at each row's OWN in-window offset
            # (masked slab write into the row's block; parked rows write
            # nothing via the active guard in row_hit).
            for s in range(B):
                p_s = posc(i, s)
                row_in_tail = p_s % TAIL
                slab = pl.multiple_of(
                    s * TAIL + (row_in_tail // KV_SLAB) * KV_SLAB, KV_SLAB
                )
                row_hit = (
                    slab_rows
                    == row_in_tail - (row_in_tail // KV_SLAB) * KV_SLAB
                ) & (i >= start_ref[s])
                for lane0, small in ((0, k_small), (E, v_small)):
                    old = tail_buf[
                        layer, pl.ds(slab, KV_SLAB), lane0 : lane0 + E
                    ]
                    tail_buf[
                        layer, pl.ds(slab, KV_SLAB), lane0 : lane0 + E
                    ] = jnp.where(
                        row_hit,
                        jnp.broadcast_to(small[s : s + 1], (KV_SLAB, E)),
                        old,
                    ).astype(tail_buf.dtype)

            if use_rel:
                # Shared band matmul per row over the static rel block; the
                # per-row roll aligns lane j to cache slot j (positions
                # differ per row, unlike the whole-generation wide kernel).
                bands = []
                for s in range(B):
                    band = jax.lax.dot_general(
                        qb[s * R : (s + 1) * R], rel_buf[slot],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (R, REL_SPAN)
                    offset = (lead + window - 1 - posc(i, s)) - rel_base
                    bands.append(pltpu.roll(band, REL_SPAN - offset, axis=1))

            # Chunked online-softmax attention over the HBM prefix; one
            # contiguous chunk DMA per (layer, chunk, row), double-buffered
            # along the (chunk, row) execution order; masks are per-row
            # (different flush frontiers).
            m_s = [jnp.full((R, 1), NEG_INF, jnp.float32) for _ in range(B)]
            l_s = [jnp.zeros((R, 1), jnp.float32) for _ in range(B)]
            a_s = [jnp.zeros((R, E), jnp.float32) for _ in range(B)]
            for chunk in range(nchunks):
                base = chunk * KV_CHUNK_SEG
                for s in range(B):
                    g = (layer * nchunks + chunk) * B + s
                    kv_chunk_copy(g).wait()
                    if g + 1 < total_chunk_dmas:
                        kv_chunk_copy(g + 1).start()
                    cslot = g % 2
                    p_s = posc(i, s)
                    frontier = (p_s // TAIL) * TAIL
                    k_c = kv_buf[cslot, :, 0:E]  # (Ck, E)
                    scores = jax.lax.dot_general(
                        qb[s * R : (s + 1) * R], k_c,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (R, Ck)
                    if use_rel:
                        scores = scores + bands[s][:, base : base + KV_CHUNK_SEG]
                    scores = scores * softmax_scale
                    # Strictly below the row's OWN flush frontier; rows at
                    # or past it live in the tail, merged below.
                    keep = base + chunk_cols < frontier
                    scores = jnp.where(keep, scores, NEG_INF)
                    m_new = jnp.maximum(
                        m_s[s], jnp.max(scores, axis=1, keepdims=True)
                    )
                    p = jnp.where(keep, jnp.exp(scores - m_new), 0.0)
                    alpha = jnp.exp(m_s[s] - m_new)
                    v_c = kv_buf[cslot, :, E : 2 * E]
                    a_s[s] = a_s[s] * alpha + jax.lax.dot_general(
                        p.astype(v_c.dtype), v_c,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    l_s[s] = l_s[s] * alpha + jnp.sum(p, axis=1, keepdims=True)
                    m_s[s] = m_new

            # Tail block: the row's cache rows [frontier, position]
            # (current row included — written above). The clamp-to-0 for
            # parked rows leaves tail row 0 unmasked, so the norm never
            # hits 0/0 (matches the segmented kernel's discard semantics).
            attn_rows = []
            for s in range(B):
                p_s = posc(i, s)
                frontier = (p_s // TAIL) * TAIL
                k_t = tail_buf[
                    layer, pl.ds(s * TAIL, TAIL), 0:E
                ]  # (TAIL, E)
                scores = jax.lax.dot_general(
                    qb[s * R : (s + 1) * R], k_t,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (R, TAIL)
                if use_rel:
                    tail_band = pltpu.roll(
                        bands[s], REL_SPAN - frontier, axis=1
                    )[:, :TAIL]
                    scores = scores + tail_band
                scores = scores * softmax_scale
                keep = frontier + tail_cols <= p_s
                scores = jnp.where(keep, scores, NEG_INF)
                m_new = jnp.maximum(
                    m_s[s], jnp.max(scores, axis=1, keepdims=True)
                )
                p = jnp.where(keep, jnp.exp(scores - m_new), 0.0)
                alpha = jnp.exp(m_s[s] - m_new)
                v_t = tail_buf[layer, pl.ds(s * TAIL, TAIL), E : 2 * E]
                acc = a_s[s] * alpha + jax.lax.dot_general(
                    p.astype(v_t.dtype), v_t,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                norm = l_s[s] * alpha + jnp.sum(p, axis=1, keepdims=True)
                mixed = acc / norm  # (R, E)
                attn_rows.append(
                    jnp.sum(mixed * rowmask_one, axis=0, keepdims=True)
                )
            attn = expand(jnp.concatenate(attn_rows, axis=0))  # (B*R, E)
            attn = _wide_matmul(
                attn, big_buf.at[slot, :, 3 * E : 4 * E],
                wscale_ref[layer, 0:1, 3 * E : 4 * E] if quantized else None,
            ) + proj_b_ref[layer].astype(jnp.float32)
            x2 = x1 + attn

            mm = _standardize(x2, ln_eps)
            hidden = _gelu_tanh(
                _wide_matmul(
                    mm, big_buf.at[slot, :, 4 * E : 8 * E],
                    wscale_ref[layer, 0:1, 4 * E : 8 * E] if quantized else None,
                ) + fc_b_ref[layer].astype(jnp.float32)
            )
            h = x2 + _wide_matmul(
                hidden, fp_buf.at[slot],
                fpscale_ref[layer] if quantized else None,
            ) + fp_b_ref[layer].astype(jnp.float32)

        hf = _standardize(h, ln_eps)
        logits_wide = jax.lax.dot_general(
            hf.astype(wte_t_ref.dtype), wte_t_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B*R, Vpad)
        logits = (
            logits_wide.reshape(B, R, vocab_pad)[:, 0, :] + logits_b_ref[...]
        )

        kthr = [topk_ref[s] for s in range(B)] if use_k else None
        pthr = [topp_ref[s] for s in range(B)] if use_p else None
        if greedy:
            scored = logits
            if use_k or use_p:
                scored = _filtered_scaled_logits(scored, kthr, pthr, wte_ref.dtype)
        else:
            # Reseed from (seed, global step): a row's sample stream depends
            # only on the steps it lives through, never on segmentation or
            # other rows' admission timing (decode_kernel_segmented.py).
            pltpu.prng_seed(seed_ref[0] + i * _STEP_SEED_MIX)
            scaled = logits * inv_temp_col
            if use_k or use_p:
                scaled = _filtered_scaled_logits(scaled, kthr, pthr, wte_ref.dtype)
            bits = pltpu.prng_random_bits((B, vocab_pad))
            mantissa = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32)
            uniform = mantissa.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-12
            scored = scaled + (-jnp.log(-jnp.log(uniform))) * noise_col

        peak = jnp.max(scored, axis=1, keepdims=True)
        next_index = jnp.min(
            jnp.where(scored == peak, vocab_cols_b, vocab_pad),
            axis=1, keepdims=True,
        )  # (B, 1)

        emit = jnp.where(active_col, next_index, -1)
        tokens_ref[:] = jnp.where(out_cols == i - step0, emit, tokens_ref[:])

        sampled_onehot = (
            expand(jnp.broadcast_to(next_index, (B, vocab_pad)))
            == jax.lax.broadcasted_iota(jnp.int32, (B * R, vocab_pad), 1)
        ).astype(onehot.dtype)
        next_forced = expand(((i + 1 - start_col) < plen_col).astype(jnp.int32)) != 0
        return jnp.where(next_forced, prompt_onehots(i + 1), sampled_onehot)

    # Carry select at segment start: rows admitted at this boundary carry
    # the previous occupant's stale one-hot; force their own prompt.
    forced0 = expand(((step0 - start_col) < plen_col).astype(jnp.int32)) != 0
    carry = jnp.where(forced0, prompt_onehots(step0), carry_ref[...])
    carry = jax.lax.fori_loop(step0, step0 + steps, step_fn, carry, unroll=False)
    carry_ref[...] = carry

    # Segment epilogue: flush every slot's current (partial) window so the
    # next segment's prologue can reload it. Stale upper rows ride along
    # (masked on every read); parked slots flush their lane's window 0,
    # which the next occupant overwrites before any read.
    for s in range(B):
        frontier_end = (posc(step0 + steps - 1, s) // TAIL) * TAIL
        run_copies(tail_row_copies(s, frontier_end, to_hbm=True))


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "steps", "cache_len", "live", "interpret",
        "greedy", "use_k", "use_p", "tail", "kv_chunk",
    ),
    donate_argnums=(1, 2),
)
def decode_segment_wide(
    packed, kv_state, carry, prompts, plens, starts, step0, seed,
    temperature, top_k, top_p,
    *, config, steps: int, cache_len: int, live: int, interpret: bool = False,
    greedy: bool = True, use_k: bool = False, use_p: bool = False,
    tail: int = TAIL, kv_chunk: int = KV_CHUNK_SEG,
):
    """Runs ``steps`` decode steps [step0, step0+steps) over the slot batch
    with HBM-streamed weights. Same contract as
    :func:`ops.decode_kernel_segmented.decode_segment` — returns
    ``(tokens, kv_state, carry)`` with tokens (B, steps) raw samples (-1
    while parked) and the state donated/aliased through the kernel — but for
    models whose packed weights exceed VMEM (``packed`` from
    :func:`ops.decode_kernel_wide.pack_weights_wide`, bf16 or int8).

    ``live`` (static) bounds the cache rows attention contracts and sizes
    the shared rel-band block; every row's position through the segment must
    stay below it (the scheduler guarantees this via its capacity check).
    """
    E = config.embed_dim
    batch = prompts.shape[0]
    vocab_pad = packed["wte"].shape[0]
    use_rel = config.use_relative_attention
    quantized = packed["big_w"].dtype == jnp.int8
    live = min(live, cache_len)
    live = _round_up(live, tail)

    if use_rel:
        # Same padding recipe as the whole-generation wide kernel: lead
        # zeros keep band starts positive, the trailing pad absorbs the
        # static REL_SPAN fetch past the table end.
        rel_pad = jnp.pad(
            packed["rel_rows"],
            ((0, 0),
             (_round_up(cache_len, 128), cache_len + 256 + kv_chunk),
             (0, 0)),
        )
    else:
        rel_pad = jnp.zeros((config.num_layers, 256, E), packed["wte"].dtype)

    mask = jnp.where(
        jnp.arange(vocab_pad)[None, :] < config.vocab_size, 0.0, NEG_INF
    )
    logits_b = packed["logits_b"].astype(jnp.float32) + mask

    temps = jnp.broadcast_to(
        jnp.reshape(jnp.asarray(temperature, jnp.float32), (-1,)), (batch,)
    )
    topk_f = jnp.broadcast_to(
        jnp.reshape(jnp.asarray(top_k, jnp.float32), (-1,)), (batch,)
    )
    topk_f = jnp.where(topk_f > 0, topk_f, float(vocab_pad + 1))
    topp_f = jnp.broadcast_to(
        jnp.reshape(jnp.asarray(top_p, jnp.float32), (-1,)), (batch,)
    )
    topp_f = jnp.where((topp_f > 0) & (topp_f < 1), topp_f, 2.0)

    kernel = functools.partial(
        _wide_segment_kernel,
        batch=batch,
        num_layers=config.num_layers,
        num_heads=config.num_heads,
        head_dim=config.head_dim,
        embed_dim=E,
        cache_len=cache_len,
        window=config.window_size,
        vocab_pad=vocab_pad,
        vocab_size=config.vocab_size,
        steps=steps,
        live=live,
        ln_eps=config.layer_norm_epsilon,
        scale_attention=config.scale_attention,
        greedy=greedy,
        use_rel=use_rel,
        quantized=quantized,
        tail=tail,
        kv_chunk=kv_chunk,
        use_k=use_k,
        use_p=use_p,
    )

    scalars = (
        jnp.asarray(prompts, jnp.int32),
        jnp.asarray(plens, jnp.int32),
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(jnp.reshape(step0, (-1,)), jnp.int32),
        jnp.asarray([seed], jnp.int32),
        temps,
        topk_f,
        topp_f,
    )
    vmem_inputs = (
        packed["wte"], packed["wte_t"], packed["wpe"], packed["ln1"],
        packed["qkv_b"], packed["proj_b"], packed["fc_b"], packed["fp_b"],
        logits_b, packed["wscale"], packed["fpscale"],
    )
    hbm_inputs = (packed["big_w"], packed["fp_w"], rel_pad, kv_state)

    wdtype = packed["big_w"].dtype
    kv_dtype = kv_state.dtype
    REL_SPAN = _round_up(2 * live + 256, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(vmem_inputs)
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(hbm_inputs)
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]  # carry
        ),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tokens
            pl.BlockSpec(memory_space=pl.ANY),      # kv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # carry
        ],
        scratch_shapes=[
            pltpu.VMEM((2, E, 8 * E), wdtype),
            pltpu.VMEM((2, 4 * E, E), wdtype),
            pltpu.VMEM((2, kv_chunk, 2 * E), kv_dtype),
            pltpu.VMEM(
                (2, REL_SPAN if use_rel else 256, E),
                packed["rel_rows"].dtype,
            ),
            pltpu.VMEM((config.num_layers, batch * tail, 2 * E), kv_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    kv_index = len(scalars) + len(vmem_inputs) + len(hbm_inputs) - 1
    carry_index = kv_index + 1
    tokens, kv_state, carry = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, steps), jnp.int32),
            jax.ShapeDtypeStruct(kv_state.shape, kv_state.dtype),
            jax.ShapeDtypeStruct(carry.shape, carry.dtype),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
        input_output_aliases={kv_index: 1, carry_index: 2},
    )(*scalars, *vmem_inputs, *hbm_inputs, carry)
    return tokens, kv_state, carry
