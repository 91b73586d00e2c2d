"""Fused decoding for models whose weights do NOT fit VMEM: wide megakernel.

The resident megakernels (ops/decode_kernel.py, decode_kernel_batched.py)
hold every layer's packed weights in VMEM for the whole generation — at the
reference architecture (embed 256) that is ~14 MB, but the flagship scaled
architecture (embed 1024, head_dim 64 — the best-NLL model of the round-3
validation runs, docs/validation.md) packs ~200 MB of bf16 weights against
the chip's ~128 MB VMEM, so the engine router used to fall back to the XLA
scan (train/generate.py::_packed_weight_bytes). This kernel serves those
models fused anyway:

* **weights stay in HBM** and stream through double-buffered VMEM scratch —
  one (E, 8E) block (qkv | attn-proj | mlp-fc packed along columns) plus one
  (4E, E) mlp-proj block per layer, fetched per token step with layer l+1's
  DMA issued before layer l computes;
* **KV caches stay in HBM** (input/output-aliased, carried by the engine
  between calls) in a lane-stacked (L, C, 2*B*E) layout: one row holds every
  sequence's k (lanes [0, B*E)) and v (lanes [B*E, 2*B*E)) for that cache
  slot, so appending a step's K/V for the whole batch is ONE small DMA, and
  the attention prefix streams back in (Ck, 2*B*E) chunks consumed
  flash-style (online softmax) — the full prefix never needs VMEM residency,
  which is what caps the resident kernels' reach;
* recent rows (current position included) live in a 128-row VMEM **tail
  window** per layer, appended with the resident kernels' tile-aligned
  masked-slab writes and flushed to HBM only at window crossings — HBM DMA
  destinations cannot address single rows, and the tail keeps the hot end
  of the cache off the per-step stream entirely; attention merges HBM
  chunks (rows below the flush frontier) and the tail block through one
  online softmax;
* the **relative bias** streams too: per (layer, step) one DMA fetches the
  (live+128)-row band of the skew-layout table that covers the reachable
  cache slots (same contiguous-run + lane-roll algebra as
  ops/decode_kernel.py:330-345; a second dynamic roll aligns the tail
  block's lanes);
* everything else — teacher-forced (optionally ragged) prompts, per-row
  temperature/top-k/top-p, greedy rows inside sampled batches, the staged
  `live` growth — matches ops/decode_kernel_batched.py, and under float32
  params the two kernels (and the XLA scan) produce identical greedy tokens
  (pinned in tests/test_decode_wide.py).

Per-step HBM traffic is the floor a weights-over-VMEM model must pay from
ANY engine: all weights once (~192 MB bf16 at embed 1024) + the live KV
prefix per layer (~2*live*B*E bytes) — the XLA scan pays the same bytes
plus ~a hundred kernel launches per step and intermediate materialization.
Optional int8 weight packing (``pack_weights_wide(dtype=jnp.int8)``)
halves the weight stream with per-output-channel scales folded into the
matmul epilogue; see quantization notes on that function. Optional int8
KV (``init_kv_state(quantize_kv=True)``; ``COMPOSER_WIDE_INT8_KV=1`` in
the serving engine) halves the KV prefix stream the same way: rows are
quantized per-(row, sequence, k|v) at the tail flush (the hot tail stays
float), and the scales dequantize EXACTLY in the attention epilogues —
scores take the k scale as a per-column multiply after the QK matmul, and
the v scale rides the probability row into the AV matmul. Tokens before
the first flush (position < TAIL) are bit-identical to the float-KV path
by construction; after it, divergence is bounded by the half-step
quantization error (pinned in tests/test_decode_wide.py).

Reference surface: the decode loop this engine replaces ran one eager model
call per token (reference cli.py:662-676).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
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
    pack_weights,
)
from composer_tpu.ops.decode_kernel_batched import _decode_stages

# Rows per streamed KV chunk. One chunk DMA moves (KV_CHUNK, 2*B*E) — every
# sequence's k and v for those cache slots; the chunk loop consumes it with
# an online-softmax merge, so VMEM holds at most two chunks regardless of
# the live prefix length.
KV_CHUNK = 512

# Rows in the VMEM tail window. New K/V rows accumulate here (tile-aligned
# masked writes, like the resident kernels' KV_SLAB appends) and flush to
# the HBM cache only when the position crosses a window boundary — HBM DMA
# destinations must be tile-aligned, so single rows cannot write through
# directly. Attention reads HBM chunks for rows below the last flush and
# the tail block for everything since (current row included).
TAIL = 128

# int8-KV scale blocks are stored per TAIL-row window ((L, windows, S2,
# TAIL) in HBM, cache-row-major along lanes); one KV chunk spans this many
# of them, fetched alongside the chunk.
WINDOWS_PER_CHUNK = KV_CHUNK // TAIL


def quantize_kv_segments(block, num_segments, seg_width):
    """Per-(row, segment) symmetric int8 quantization of a KV block.

    ``block`` is ``(rows, num_segments * seg_width)`` float — one lane
    segment per (sequence, k-or-v), the wide kernels' lane-stacked row
    layout. Returns ``(q, scales)``: ``q`` int8 of the same shape and
    ``scales`` ``(rows, num_segments)`` f32 with
    ``scales[r, j] = max|block[r, j*W:(j+1)*W]| / 127`` (guarded below by
    ``1e-12``), so dequantization ``q * scale`` sits within half a
    quantization step of the original elementwise. Shared by the kernel's
    flush path and the tests pinning that contract.
    """
    cols_q, cols_s = [], []
    for j in range(num_segments):
        seg = block[:, j * seg_width : (j + 1) * seg_width].astype(
            jnp.float32
        )
        m = jnp.maximum(
            jnp.max(jnp.abs(seg), axis=1, keepdims=True), 1e-12
        )
        cols_q.append(jnp.clip(jnp.round(seg * (127.0 / m)), -127.0, 127.0))
        cols_s.append(m * (1.0 / 127.0))
    return (
        jnp.concatenate(cols_q, axis=1).astype(jnp.int8),
        jnp.concatenate(cols_s, axis=1),
    )


def _wide_matmul(x, w_ref_slice, scale=None):
    """x (rows, K) f32 @ streamed weight block (K, N) -> (rows, N) f32.

    ``scale`` (1, N) multiplies the OUTPUT — the int8 per-output-channel
    dequantization epilogue (y = (x @ Wq) * s); None for bf16/f32 weights.
    """
    w = w_ref_slice[...]
    if w.dtype == jnp.int8:
        # int8 operands don't feed the MXU through this lowering; one VPU
        # cast to bf16 per use (the DMA already paid half the HBM bytes).
        w = w.astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        x.astype(w.dtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale is not None:
        out = out * scale
    return out


def _wide_kernel(
    # scalar prefetch (SMEM)
    prompt_ref, plen_ref, seed_ref, temp_ref, topk_ref, topp_ref,
    # tensor inputs: small VMEM-resident operands
    wte_ref, wte_t_ref, wpe_ref, ln1_ref,
    qkv_b_ref, proj_b_ref, fc_b_ref, fp_b_ref, logits_b_ref,
    wscale_ref, fpscale_ref,
    # tensor inputs: HBM-resident (streamed)
    big_w_hbm, fp_w_hbm, rel_hbm, kv_hbm_in,
    # outputs + scratch are positional and differ between the float-KV and
    # int8-KV variants — unpacked from *rest below
    *rest,
    batch: int, num_layers: int, num_heads: int, head_dim: int,
    embed_dim: int, cache_len: int, window: int, vocab_pad: int,
    vocab_size: int, num_steps: int, ln_eps: float, scale_attention: bool,
    greedy: bool, use_rel: bool, quantized: bool,
    use_k: bool = False, use_p: bool = False,
    kv_quantized: bool = False, s2: int = 8,
):
    if kv_quantized:
        (ks_hbm_in, tokens_ref, kv_hbm_out, ks_hbm_out,
         big_buf, fp_buf, kv_buf, rel_buf, tail_buf,
         scale_buf, q_stage, scale_stage,
         sem_w, sem_kv, sem_rel, sem_flush, sem_scale) = rest
        del ks_hbm_in  # aliased: all traffic goes through ks_hbm_out
        ks = ks_hbm_out
    else:
        (tokens_ref, kv_hbm_out,
         big_buf, fp_buf, kv_buf, rel_buf, tail_buf,
         sem_w, sem_kv, sem_rel, sem_flush) = rest
        ks = scale_buf = q_stage = scale_stage = sem_scale = None
    del kv_hbm_in  # aliased: all traffic goes through kv_hbm_out
    kv = kv_hbm_out
    B, R, E, C = batch, num_heads, embed_dim, cache_len
    BE = B * E
    out_len = tokens_ref.shape[1]
    lead = _round_up(C, 128)  # rel table's leading zero rows

    plen_col = jnp.concatenate(
        [jnp.full((1, 1), plen_ref[s], jnp.int32) for s in range(batch)],
        axis=0,
    )  # (B, 1)

    if not greedy:
        pltpu.prng_seed(seed_ref[0])
        inv_temp_col = jnp.concatenate(
            [
                1.0
                / jnp.full(
                    (1, 1),
                    jnp.where(temp_ref[s] > 0.0, temp_ref[s], 1.0),
                    jnp.float32,
                )
                for s in range(batch)
            ],
            axis=0,
        )
        noise_col = jnp.concatenate(
            [
                jnp.full(
                    (1, 1), jnp.where(temp_ref[s] > 0.0, 1.0, 0.0), jnp.float32
                )
                for s in range(batch)
            ],
            axis=0,
        )

    rowmask_one = (
        jax.lax.broadcasted_iota(jnp.int32, (R, E), 1) // head_dim
        == jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    ).astype(jnp.float32)
    rowmask = jnp.tile(rowmask_one, (B, 1))  # (B*R, E)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, out_len), 1)
    vocab_cols_b = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_pad), 1)
    vocab_cols_r = jax.lax.broadcasted_iota(jnp.int32, (R, vocab_pad), 1)
    wpe_cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    chunk_cols = jax.lax.broadcasted_iota(jnp.int32, (R, KV_CHUNK), 1)
    tail_cols = jax.lax.broadcasted_iota(jnp.int32, (R, TAIL), 1)
    slab_rows = jax.lax.broadcasted_iota(jnp.int32, (KV_SLAB, 2 * BE), 0)
    if kv_quantized:
        # (TAIL, TAIL) identity: contracting its sublane dim against the
        # flush scales' sublane dim transposes them on the MXU (dynamic
        # lane<->sublane relayout is not a Mosaic primitive; a dot is).
        tail_ident = (
            jax.lax.broadcasted_iota(jnp.int32, (TAIL, TAIL), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (TAIL, TAIL), 1)
        ).astype(jnp.float32)

    softmax_scale = float(head_dim) ** -0.5 if scale_attention else 1.0

    def expand(x_small):  # (B, n) -> (B*R, n)
        return jnp.broadcast_to(
            x_small[:, None, :], (B, R, x_small.shape[1])
        ).reshape(B * R, x_small.shape[1])

    def collapse(x_wide):  # (B*R, E) -> (B, E) masked head-sum
        return jnp.sum((x_wide * rowmask).reshape(B, R, E), axis=1)

    def prompt_onehots(i):
        return jnp.concatenate(
            [
                (
                    vocab_cols_r
                    == prompt_ref[s, jnp.minimum(i, plen_ref[s] - 1)]
                ).astype(wte_ref.dtype)
                for s in range(B)
            ],
            axis=0,
        )  # (B*R, Vpad)

    # ------------------------------------------------------------ DMA plumbing
    def weight_copies(layer):
        return [
            pltpu.make_async_copy(big_w_hbm.at[layer], big_buf.at[layer % 2], sem_w),
            pltpu.make_async_copy(fp_w_hbm.at[layer], fp_buf.at[layer % 2], sem_w),
        ]

    def rel_copy(layer, position, live):
        # The (live+128)-row 128-aligned superset of the band run covering
        # cache slots [0, live) at this position (decode_kernel.py:330-345).
        start = lead + window - 1 - position
        aligned = pl.multiple_of((start // 128) * 128, 128)
        return pltpu.make_async_copy(
            rel_hbm.at[layer, pl.ds(aligned, live + 128)],
            rel_buf.at[layer % 2, pl.ds(0, live + 128)],
            sem_rel,
        )

    def kv_chunk_copy(layer, chunk, slot):
        return pltpu.make_async_copy(
            kv.at[layer, pl.ds(chunk * KV_CHUNK, KV_CHUNK)],
            kv_buf.at[slot],
            sem_kv,
        )

    def scale_chunk_copy(layer, chunk, slot):
        # The (WINDOWS_PER_CHUNK, S2, TAIL) scale blocks covering the KV
        # chunk's rows; started/waited in lockstep with kv_chunk_copy.
        return pltpu.make_async_copy(
            ks.at[layer, pl.ds(
                chunk * WINDOWS_PER_CHUNK, WINDOWS_PER_CHUNK
            )],
            scale_buf.at[slot],
            sem_scale,
        )

    def make_step(live):
        nchunks = -(-live // KV_CHUNK)

        def step(i, onehot):
            position = i
            # Rows below this are in the HBM cache; rows [flushed_end,
            # position] live in the VMEM tail window (128-aligned).
            flushed_end = (position // TAIL) * TAIL

            # Window crossing: the previous TAIL rows are complete — flush
            # them to the HBM cache BEFORE any chunk prefetch might read
            # them this step. (The final partial window never flushes: no
            # later step of this call reads it from HBM, and the next call
            # rewrites the tail from scratch.)
            @pl.when(jnp.logical_and(position % TAIL == 0, position > 0))
            def _flush():
                window_index = position // TAIL - 1
                for lf in range(num_layers):
                    if kv_quantized:
                        # Quantize the completed window at flush time: the
                        # tail stays float (recent rows keep full
                        # precision), only the cold HBM prefix pays the
                        # int8 squeeze. Scales are per (cache row,
                        # sequence, k|v) — segment j < batch is sequence
                        # j's k, segment batch + j its v.
                        q_block, scales = quantize_kv_segments(
                            tail_buf[lf], 2 * batch, E
                        )
                        q_stage[...] = q_block
                        scales_t = jax.lax.dot_general(
                            scales, tail_ident,
                            dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (2B, TAIL): lane = cache row within the window
                        scale_stage[...] = jnp.pad(
                            scales_t, ((0, s2 - 2 * batch), (0, 0))
                        )[None]
                    flush = pltpu.make_async_copy(
                        q_stage if kv_quantized else tail_buf.at[lf],
                        kv.at[lf, pl.ds(
                            pl.multiple_of(position - TAIL, TAIL), TAIL
                        )],
                        sem_flush,
                    )
                    flush.start()
                    flush.wait()
                    if kv_quantized:
                        sflush = pltpu.make_async_copy(
                            scale_stage,
                            ks.at[lf, pl.ds(window_index, 1)],
                            sem_scale,
                        )
                        sflush.start()
                        sflush.wait()

            # Stream-in prologue: layer 0's weights (+ rel band) and the
            # first KV chunk; each layer then prefetches its successor's.
            for copy in weight_copies(0):
                copy.start()
            if use_rel:
                rel_copy(0, position, live).start()
            kv_chunk_copy(0, 0, 0).start()
            if kv_quantized:
                scale_chunk_copy(0, 0, 0).start()

            tok_embed = jax.lax.dot_general(
                onehot, wte_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B*R, E)
            pos_onehot = (wpe_cols == jnp.minimum(position, window - 1)).astype(
                wpe_ref.dtype
            )
            pos_embed = jax.lax.dot_general(
                pos_onehot, wpe_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            h = tok_embed + pos_embed  # (B*R, E)

            for layer in range(num_layers):
                slot = layer % 2
                for copy in weight_copies(layer):
                    copy.wait()
                if use_rel:
                    rel_copy(layer, position, live).wait()
                if layer + 1 < num_layers:
                    for copy in weight_copies(layer + 1):
                        copy.start()
                    if use_rel:
                        rel_copy(layer + 1, position, live).start()

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

                # Append the step's K/V for the whole batch into the VMEM
                # tail window (tile-aligned masked slab write — HBM DMA
                # destinations can't address single rows).
                row_in_tail = position % TAIL
                slab = pl.multiple_of(
                    (row_in_tail // KV_SLAB) * KV_SLAB, KV_SLAB
                )
                row_hit = slab_rows == row_in_tail - slab
                new_row = jnp.concatenate(
                    [k_small.reshape(1, BE), v_small.reshape(1, BE)], axis=1
                ).astype(tail_buf.dtype)  # (1, 2BE)
                old_slab = tail_buf[layer, pl.ds(slab, KV_SLAB), :]
                tail_buf[layer, pl.ds(slab, KV_SLAB), :] = jnp.where(
                    row_hit,
                    jnp.broadcast_to(new_row, (KV_SLAB, 2 * BE)),
                    old_slab,
                )

                qb_f32 = q * rowmask  # (B*R, E)
                qb = qb_f32.astype(tail_buf.dtype)

                if use_rel:
                    # One shared band matmul + roll for all sequences
                    # (identical positions), sliced per chunk below.
                    start_row = lead + window - 1 - position
                    delta = start_row - (start_row // 128) * 128
                    band = jax.lax.dot_general(
                        qb, rel_buf[slot, 0 : live + 128, :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (B*R, live+128); lane m = cache slot (m - delta)
                    rolled = pltpu.roll(band, live + 128 - delta, axis=1)

                # Flash-style chunked attention over the HBM prefix with an
                # online-softmax merge; the current row joins in-register.
                m_s = [jnp.full((R, 1), NEG_INF, jnp.float32) for _ in range(B)]
                l_s = [jnp.zeros((R, 1), jnp.float32) for _ in range(B)]
                a_s = [jnp.zeros((R, E), jnp.float32) for _ in range(B)]
                for chunk in range(nchunks):
                    cslot = (layer * nchunks + chunk) % 2
                    kv_chunk_copy(layer, chunk, cslot).wait()
                    if kv_quantized:
                        scale_chunk_copy(layer, chunk, cslot).wait()
                    if chunk + 1 < nchunks:
                        kv_chunk_copy(layer, chunk + 1, (cslot + 1) % 2).start()
                        if kv_quantized:
                            scale_chunk_copy(
                                layer, chunk + 1, (cslot + 1) % 2
                            ).start()
                    elif layer + 1 < num_layers:
                        kv_chunk_copy(layer + 1, 0, (cslot + 1) % 2).start()
                        if kv_quantized:
                            scale_chunk_copy(
                                layer + 1, 0, (cslot + 1) % 2
                            ).start()
                    base = chunk * KV_CHUNK
                    for s in range(B):
                        k_c = kv_buf[cslot, :, s * E : (s + 1) * E]  # (Ck, E)
                        if kv_quantized:
                            k_c = k_c.astype(qb.dtype)
                        scores = jax.lax.dot_general(
                            qb[s * R : (s + 1) * R], k_c,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )  # (R, Ck)
                        if kv_quantized:
                            # Exact dequantization as an epilogue: column c
                            # is cache row base + c, whose k rows were all
                            # scaled by one scalar — one per-column
                            # broadcast multiply restores q . k_true.
                            k_sc = jnp.concatenate(
                                [
                                    scale_buf[cslot, w, s : s + 1, :]
                                    for w in range(WINDOWS_PER_CHUNK)
                                ],
                                axis=1,
                            )  # (1, KV_CHUNK)
                            scores = scores * k_sc
                        if use_rel:
                            # The rolled band covers lanes [0, live+128);
                            # the chunk may overhang (over-read rows are
                            # masked below) — zero-pad the band slice.
                            width = min(KV_CHUNK, live + 128 - base)
                            band_slice = rolled[s * R : (s + 1) * R,
                                                base : base + width]
                            if width < KV_CHUNK:
                                band_slice = jnp.pad(
                                    band_slice,
                                    ((0, 0), (0, KV_CHUNK - width)),
                                )
                            scores = scores + band_slice
                        scores = scores * softmax_scale
                        # Strictly below the flush frontier: rows at or
                        # past it (current row included) live in the VMEM
                        # tail, merged after the chunk loop — the HBM rows
                        # there are stale.
                        keep = base + chunk_cols < flushed_end
                        scores = jnp.where(keep, scores, NEG_INF)
                        m_new = jnp.maximum(
                            m_s[s], jnp.max(scores, axis=1, keepdims=True)
                        )
                        # Re-mask after the exp: when the whole chunk is
                        # masked m_new stays NEG_INF and exp(0) would leak
                        # weight 1 into every dead column.
                        p = jnp.where(keep, jnp.exp(scores - m_new), 0.0)
                        alpha = jnp.exp(m_s[s] - m_new)
                        v_c = kv_buf[cslot, :, BE + s * E : BE + (s + 1) * E]
                        if kv_quantized:
                            # v's dequant scale rides the probability row
                            # (per-column broadcast) so the AV matmul
                            # contracts true values; l_s keeps the
                            # UNSCALED p — softmax mass is scale-free.
                            v_c = v_c.astype(qb.dtype)
                            v_sc = jnp.concatenate(
                                [
                                    scale_buf[cslot, w, B + s : B + s + 1, :]
                                    for w in range(WINDOWS_PER_CHUNK)
                                ],
                                axis=1,
                            )  # (1, KV_CHUNK)
                            p_av = p * v_sc
                        else:
                            p_av = p
                        a_s[s] = a_s[s] * alpha + jax.lax.dot_general(
                            p_av.astype(v_c.dtype), v_c,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        l_s[s] = l_s[s] * alpha + jnp.sum(
                            p, axis=1, keepdims=True
                        )
                        m_s[s] = m_new

                # Tail block: cache rows [flushed_end, position] (current
                # row included — it was just written above). The band lanes
                # for these rows come off the shared rolled band via one
                # more dynamic roll (dynamic lane slicing is not a Mosaic
                # primitive; rolls are).
                if use_rel:
                    tail_band = pltpu.roll(
                        rolled, live + 128 - flushed_end, axis=1
                    )[:, :TAIL]  # lane t = cache slot flushed_end + t
                attn_rows = []
                for s in range(B):
                    k_t = tail_buf[layer, :, s * E : (s + 1) * E]  # (TAIL, E)
                    scores = jax.lax.dot_general(
                        qb[s * R : (s + 1) * R], k_t,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (R, TAIL)
                    if use_rel:
                        scores = scores + tail_band[s * R : (s + 1) * R]
                    scores = scores * softmax_scale
                    keep = flushed_end + tail_cols <= position
                    scores = jnp.where(keep, scores, NEG_INF)
                    m_new = jnp.maximum(
                        m_s[s], jnp.max(scores, axis=1, keepdims=True)
                    )
                    p = jnp.where(keep, jnp.exp(scores - m_new), 0.0)
                    alpha = jnp.exp(m_s[s] - m_new)
                    v_t = tail_buf[layer, :, BE + s * E : BE + (s + 1) * E]
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
                        wscale_ref[layer, 0:1, 4 * E : 8 * E]
                        if quantized else None,
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
                    scored = _filtered_scaled_logits(
                        scored, kthr, pthr, wte_ref.dtype
                    )
            else:
                scaled = logits * inv_temp_col
                if use_k or use_p:
                    scaled = _filtered_scaled_logits(
                        scaled, kthr, pthr, wte_ref.dtype
                    )
                bits = pltpu.prng_random_bits((B, vocab_pad))
                mantissa = pltpu.bitcast(
                    pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32
                )
                uniform = mantissa.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-12
                scored = scaled + (-jnp.log(-jnp.log(uniform))) * noise_col

            peak = jnp.max(scored, axis=1, keepdims=True)
            next_index = jnp.min(
                jnp.where(scored == peak, vocab_cols_b, vocab_pad),
                axis=1, keepdims=True,
            )  # (B, 1)

            tokens_ref[:] = jnp.where(
                out_cols == i - (plen_col - 1), next_index, tokens_ref[:]
            )
            sampled_onehot = (
                expand(jnp.broadcast_to(next_index, (B, vocab_pad)))
                == jax.lax.broadcasted_iota(jnp.int32, (B * R, vocab_pad), 1)
            ).astype(onehot.dtype)
            in_prefill = expand((i + 1 < plen_col).astype(jnp.int32)) != 0
            return jnp.where(in_prefill, prompt_onehots(i + 1), sampled_onehot)

        return step

    # Zero the tail window once: masked softmax weights are exactly 0 for
    # not-yet-written rows, but 0 * NaN (uninitialized scratch) would still
    # poison the value contraction (same reason the resident kernels zero
    # their caches).
    for layer in range(num_layers):
        tail_buf[layer] = jnp.zeros_like(tail_buf[layer])

    carry = prompt_onehots(0)
    for seg_start, seg_end, live in _decode_stages(cache_len, num_steps):
        carry = jax.lax.fori_loop(
            seg_start, seg_end, make_step(live), carry, unroll=False
        )


def pack_weights_wide(params, config, dtype=jnp.bfloat16):
    """Packs a param tree for the streaming wide kernel.

    Builds on :func:`ops.decode_kernel.pack_weights` (ln_2/ln_f folding,
    skew-layout rel table) and reshapes for streaming: per layer, qkv,
    attention-proj and mlp-fc concatenate along columns into one (E, 8E)
    block (one DMA), mlp-proj stays (4E, E).

    ``dtype=jnp.int8`` quantizes the four streamed matmul blocks
    per-OUTPUT-CHANNEL symmetric (scale = max|w_col| / 127, folded into the
    matmul epilogue as a (1, N) multiply), halving the dominant per-step HBM
    stream. Embeddings/rel table/biases stay bf16 — they are a small share
    of the traffic, and the logits readout keeps full precision. int8 is
    NOT bit-identical to the bf16 path (expect token divergence after the
    first near-tie); validated statistically in tests and by sample quality.
    """
    quantized = dtype == jnp.int8
    base_dtype = jnp.bfloat16 if quantized else dtype
    base = pack_weights(params, config, dtype=jnp.float32)
    E = config.embed_dim

    big = jnp.concatenate(
        [base["qkv_w"], base["proj_w"], base["fc_w"]], axis=2
    )  # (L, E, 8E) f32
    fp = base["fp_w"]  # (L, 4E, E) f32

    if quantized:
        def quantize(w):  # (L, K, N): per-output-channel symmetric int8
            scale = jnp.max(jnp.abs(w), axis=1, keepdims=True) / 127.0
            scale = jnp.maximum(scale, 1e-12)
            q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            return q, scale.astype(jnp.float32)  # (L, 1, N)

        big_q, big_scale = quantize(big)
        fp_q, fp_scale = quantize(fp)
    else:
        big_q, big_scale = big.astype(base_dtype), None
        fp_q, fp_scale = fp.astype(base_dtype), None

    return {
        "big_w": big_q,
        "fp_w": fp_q,
        "wscale": (
            big_scale if quantized
            else jnp.zeros((config.num_layers, 1, 8), jnp.float32)
        ),
        "fpscale": (
            fp_scale if quantized
            else jnp.zeros((config.num_layers, 1, 8), jnp.float32)
        ),
        "wte": base["wte"].astype(base_dtype),
        "wte_t": base["wte_t"].astype(base_dtype),
        "wpe": base["wpe"].astype(base_dtype),
        "ln1": base["ln1"],
        "qkv_b": base["qkv_b"],
        "proj_b": base["proj_b"],
        "fc_b": base["fc_b"],
        "fp_b": base["fp_b"],
        "logits_b": base["logits_b"],
        "rel_rows": base["rel_rows"].astype(base_dtype),
    }


def _cache_rows(cache_len: int) -> int:
    # KV_CHUNK-aligned HBM rows: the last chunk DMA reads a full chunk and
    # must stay in bounds (the overhang is softmax-masked, never garbage-fed).
    return _round_up(cache_len, KV_CHUNK)


def init_kv_state(config, batch: int, cache_len: int, dtype=jnp.bfloat16,
                  quantize_kv: bool = False):
    """Zeroed lane-stacked HBM KV cache (L, rows, 2*B*E), carried by the
    engine across calls (donated through every kernel invocation). Zeros
    matter only for the very first call — later calls overwrite every row
    they read (stale finite values are softmax-masked; NaNs from
    uninitialized memory would not be).

    ``quantize_kv=True`` returns the int8-KV state pair instead: an int8
    cache of the same shape plus its per-(row, sequence, k|v) dequant
    scales ``(L, rows // TAIL, S2, TAIL)`` f32 (S2 = 2*batch padded to the
    f32 sublane tile; lane = cache row within the window). The pair halves
    the per-step KV prefix stream — the wide kernels' second-largest HBM
    term after the weights (COMPOSER_WIDE_INT8_KV in the serving engine).
    """
    rows = _cache_rows(cache_len)
    if quantize_kv:
        s2 = _round_up(2 * batch, 8)
        return (
            jnp.zeros(
                (config.num_layers, rows, 2 * batch * config.embed_dim),
                jnp.int8,
            ),
            jnp.zeros(
                (config.num_layers, rows // TAIL, s2, TAIL), jnp.float32
            ),
        )
    return jnp.zeros(
        (config.num_layers, rows, 2 * batch * config.embed_dim),
        dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "length", "cache_len", "interpret", "greedy", "use_k",
        "use_p", "ragged",
    ),
    donate_argnums=(1, 2),
)
def _wide_impl(
    packed, kv_state, kv_scale, prompts, plens, seed, temperature, top_k,
    top_p,
    *, config, length: int, cache_len: int, interpret: bool, greedy: bool,
    use_k: bool = False, use_p: bool = False, ragged: bool = False,
):
    E = config.embed_dim
    batch, prompt_len = prompts.shape
    vocab_pad = packed["wte"].shape[0]
    use_rel = config.use_relative_attention
    # Static under jit: dtype is a tracer attribute, not a traced value
    # (and `kv_scale is None` resolves at trace time the same way).
    quantized = packed["big_w"].dtype == jnp.int8
    kv_quant = kv_scale is not None
    s2 = kv_scale.shape[2] if kv_quant else 8
    num_steps = prompt_len + length - 1
    out_len = num_steps if ragged else length
    live_max = cache_len  # _decode_stages caps live at cache_len

    if use_rel:
        # Lead zeros keep band slice starts positive past the window; the
        # tail covers the largest (live+128) slice at the smallest start
        # (see ops/decode_kernel.py); one extra KV_CHUNK of zeros absorbs
        # chunk-granularity over-read.
        rel_pad = jnp.pad(
            packed["rel_rows"],
            ((0, 0), (_round_up(cache_len, 128), cache_len + 128 + KV_CHUNK),
             (0, 0)),
        )
    else:
        rel_pad = jnp.zeros((config.num_layers, 256, E), packed["wte"].dtype)

    mask = jnp.where(
        jnp.arange(vocab_pad)[None, :] < config.vocab_size, 0.0, NEG_INF
    )
    logits_b = packed["logits_b"].astype(jnp.float32) + mask

    kernel = functools.partial(
        _wide_kernel,
        batch=batch,
        num_layers=config.num_layers,
        num_heads=config.num_heads,
        head_dim=config.head_dim,
        embed_dim=E,
        cache_len=cache_len,
        window=config.window_size,
        vocab_pad=vocab_pad,
        vocab_size=config.vocab_size,
        num_steps=num_steps,
        ln_eps=config.layer_norm_epsilon,
        scale_attention=config.scale_attention,
        greedy=greedy,
        use_rel=use_rel,
        quantized=quantized,
        use_k=use_k,
        use_p=use_p,
        kv_quantized=kv_quant,
        s2=s2,
    )

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

    scalars = (
        jnp.asarray(prompts, jnp.int32),
        jnp.asarray(plens, jnp.int32),
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
    hbm_inputs = (packed["big_w"], packed["fp_w"], rel_pad, kv_state) + (
        (kv_scale,) if kv_quant else ()
    )

    wdtype = packed["big_w"].dtype
    kv_dtype = kv_state.dtype
    # The tail window stays FLOAT under int8 KV: recent rows keep full
    # precision and quantization happens once, at the flush.
    tail_dtype = packed["wte"].dtype if kv_quant else kv_dtype
    scratch = [
        pltpu.VMEM((2, E, 8 * E), wdtype),
        pltpu.VMEM((2, 4 * E, E), wdtype),
        pltpu.VMEM((2, KV_CHUNK, 2 * batch * E), kv_dtype),
        pltpu.VMEM(
            (2, (live_max if use_rel else 128) + 128, E),
            packed["rel_rows"].dtype,
        ),
        pltpu.VMEM((config.num_layers, TAIL, 2 * batch * E), tail_dtype),
    ]
    if kv_quant:
        scratch += [
            pltpu.VMEM((2, WINDOWS_PER_CHUNK, s2, TAIL), jnp.float32),
            pltpu.VMEM((TAIL, 2 * batch * E), jnp.int8),
            pltpu.VMEM((1, s2, TAIL), jnp.float32),
        ]
    scratch += [pltpu.SemaphoreType.DMA] * (5 if kv_quant else 4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(vmem_inputs)
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(hbm_inputs)
        ),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * (2 if kv_quant else 1),
        scratch_shapes=scratch,
    )

    base = len(scalars) + len(vmem_inputs)
    aliases = {base + 3: 1}  # kv_state
    out_shape = (
        jax.ShapeDtypeStruct((batch, out_len), jnp.int32),
        jax.ShapeDtypeStruct(kv_state.shape, kv_state.dtype),
    )
    if kv_quant:
        aliases[base + 4] = 2  # kv_scale
        out_shape += (jax.ShapeDtypeStruct(kv_scale.shape, kv_scale.dtype),)
    result = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
        input_output_aliases=aliases,
    )(*scalars, *vmem_inputs, *hbm_inputs)
    if kv_quant:
        tokens, kv_state, kv_scale = result
        return tokens[:, :length], (kv_state, kv_scale)
    tokens, kv_state = result
    return tokens[:, :length], kv_state


def megakernel_generate_wide(
    packed, kv_state, prompts, seed, temperature,
    *, config, length: int, cache_len: int, interpret: bool = False,
    top_k=0, top_p=0.0, greedy=None, use_k=None, use_p=None,
    prompt_lengths=None,
):
    """Generates ``length`` tokens per prompt row through the streaming wide
    kernel; returns ``(tokens, kv_state)`` — thread the returned (donated)
    KV state into the next call. ``kv_state`` may be the int8-KV
    ``(cache, scales)`` pair from ``init_kv_state(quantize_kv=True)``;
    the returned state then keeps that pair form.

    Same prompt/sampling semantics as
    :func:`ops.decode_kernel_batched.megakernel_generate_batched` (ragged
    ``prompt_lengths``, per-row sampling params, greedy rows inside sampled
    batches); under identical seeds the two kernels draw identical sample
    streams (one (B, vocab) Gumbel draw per step).
    """
    from composer_tpu.ops.decode_kernel import sampling_flags

    prompts = jnp.asarray(prompts, jnp.int32)
    if prompts.shape[1] + length > cache_len:
        raise ValueError("prompt + length exceeds cache")
    if isinstance(kv_state, tuple):  # int8-KV state pair
        kv_state, kv_scale = kv_state
        if kv_state.dtype != jnp.int8:
            raise ValueError(
                "a (cache, scales) kv_state pair requires an int8 cache; "
                f"got {kv_state.dtype} (init_kv_state(quantize_kv=True))"
            )
        expected_scale = (
            config.num_layers, _cache_rows(cache_len) // TAIL,
            _round_up(2 * prompts.shape[0], 8), TAIL,
        )
        if kv_scale.shape != expected_scale:
            raise ValueError(
                f"kv_scale shape {kv_scale.shape} does not match "
                f"{expected_scale} (init_kv_state with the same "
                "batch/cache_len)"
            )
    else:
        kv_scale = None
    expected = (
        config.num_layers, _cache_rows(cache_len),
        2 * prompts.shape[0] * config.embed_dim,
    )
    if kv_state.shape != expected:
        raise ValueError(
            f"kv_state shape {kv_state.shape} does not match {expected} "
            "(init_kv_state with the same batch/cache_len)"
        )
    ragged = prompt_lengths is not None
    if not ragged:
        plens = np.full(prompts.shape[0], prompts.shape[1], np.int32)
    else:
        plens = (
            prompt_lengths
            if isinstance(prompt_lengths, jax.core.Tracer)
            else np.asarray(prompt_lengths, np.int32).reshape(-1)
        )
        if plens.shape[0] != prompts.shape[0]:
            raise ValueError(
                f"prompt_lengths has {plens.shape[0]} rows for a batch of "
                f"{prompts.shape[0]}"
            )
        if isinstance(plens, np.ndarray) and (
            plens.min() < 1 or plens.max() > prompts.shape[1]
        ):
            raise ValueError(
                f"prompt_lengths must lie in [1, {prompts.shape[1]}], got "
                f"[{plens.min()}, {plens.max()}]"
            )
    greedy, use_k, use_p = sampling_flags(
        temperature, top_k, top_p, greedy, use_k, use_p
    )
    return _wide_impl(
        packed, kv_state, kv_scale, prompts, plens, seed, temperature,
        top_k, top_p,
        config=config, length=length, cache_len=cache_len,
        interpret=interpret, greedy=greedy, use_k=use_k, use_p=use_p,
        ragged=ragged,
    )
