"""Batched single-kernel decoding: B sequences in one fused generation loop.

Extends ops/decode_kernel.py to small batches. The win: all dense matmuls are
shared across sequences (B*16 activation rows cost the MXU the same as 16),
so per-chip serving throughput scales nearly linearly in B until attention
dominates.

Layout:
  activations   (B*R, E)   R = num_heads replicated rows; group s = seq s
  KV caches     (L, B*C, E) sublane-stacked per sequence, appended as
                16-row tile-aligned masked writes (KV_SLAB)
  scores        per-sequence (R, live) matmuls — a single (B*R, B*C) matmul
                computes BxB cross-sequence blocks and masks 7/8 away
                (measured slower); `live` grows through staged loop
                segments (_decode_stages) so dead cache columns are never
                contracted
  rel bias      per-layer band matmul + one dynamic lane roll, shared across
                sequences (all sit at the same absolute position) — see
                ops/decode_kernel.py for the lane algebra
  token feedback a loop-carried replicated one-hot (B*R, Vpad); ln_2/ln_f
                are folded into the adjacent weights at pack time

The prompt is consumed teacher-forced like the single-sequence kernel.
Prompt lengths may be RAGGED (per-row ``prompt_lengths``): each row switches
from teacher-forcing to self-feeding at its own boundary, and its generated
tokens land at output columns [0, length) regardless of prompt length — so
the serving coalescer batches requests with different prompt lengths into
one kernel call (all rows share absolute positions: every row starts at
position 0 and rows only differ in when they stop being forced).
"""

from __future__ import annotations

import functools
import os

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
    _matmul,
    _round_up,
    _standardize,
)

# KV cache layout: lane-stacked (L, C, B*E) appends one slab per buffer per
# layer (vs B slabs with the sublane-stacked (L, B*C, E) layout); attention
# reads per-sequence lane slices. Measured on v5e-1 at batch 8 x 1014:
# 84.3k events/s vs 97.7k sublane-stacked (the lane-sliced matmul operands
# and the (B, E) -> (1, B*E) relayouts cost more than the append fan-out
# saves) — kept as an A/B knob, default off.
_LANESTACK = os.environ.get("COMPOSER_DECODE_LANESTACK", "0") == "1"

# Token-loop staging depth. Segment k of the generation loop contracts
# attention over only the first `live` cache rows (bit-identical: trimmed
# rows are zero-initialised and causally masked). Measured on v5e-1 at
# batch 8 x 1014 with 16-row KV slabs: unstaged 97.7k events/s, staged(4)
# 102-107k, staged(8) **118.6k** — with the append traffic fixed, the B
# per-sequence score/AV matmuls and their softmaxes are the next cost and
# trimming dead columns shows super-linearly (VPU softmax width and
# per-matmul fixed costs shrink with `live` too). Each segment re-traces
# the unrolled layer loop, so Mosaic compile time scales with the depth;
# 128-row granularity caps the useful depth at C/128. The single-sequence
# kernel is NOT staged: there the attention share is small and staging
# measured ~2x slower tail steps (41k vs 77k marginal).
_MAX_STAGES = int(os.environ.get("COMPOSER_DECODE_STAGES", "8"))
# Segment-size alignment. 128 = one lane tile of the scores matmul; finer
# alignments (min 16 = one bf16 sublane tile of the AV contraction) allow
# deeper staging but only shrink the AV matmul's contraction rows — the
# scores/softmax lanes pad back to 128 regardless.
_STAGE_ALIGN = max(16, int(os.environ.get("COMPOSER_DECODE_STAGE_ALIGN", "128")))


def _decode_stages(cache_len: int, num_steps: int):
    """Static (start_step, end_step, live_rows) segments for a growing cache.

    _STAGE_ALIGN-aligned, at most _MAX_STAGES segments (each segment
    re-traces the unrolled layer loop, so Mosaic compile time scales with
    the count).
    """
    step_rows = _round_up(-(-cache_len // _MAX_STAGES), _STAGE_ALIGN)
    stages = []
    start, live = 0, step_rows
    while start < num_steps:
        live = min(live, cache_len)
        end = num_steps if live >= cache_len else min(live, num_steps)
        stages.append((start, end, live))
        start, live = end, live + step_rows
    return stages


def _batched_kernel(
    prompt_ref, plen_ref, seed_ref, temp_ref, topk_ref, topp_ref,
    wte_ref, wte_t_ref, wpe_ref,
    ln1_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref,
    fc_w_ref, fc_b_ref, fp_w_ref, fp_b_ref,
    logits_b_ref, rel_pad_ref, kcache_ref, vcache_ref,
    tokens_ref,
    kbuf, vbuf, prefill_sem,
    *, batch: int, num_layers: int, num_heads: int, head_dim: int,
    embed_dim: int, cache_len: int, window: int, vocab_pad: int,
    vocab_size: int, num_steps: int, ln_eps: float, scale_attention: bool,
    greedy: bool, use_rel: bool, lanestack: bool,
    use_k: bool = False, use_p: bool = False,
    start_step: int = 0, has_prefill: bool = False,
):
    B, R, E, C = batch, num_heads, embed_dim, cache_len
    out_len = tokens_ref.shape[1]

    # Per-row prompt lengths (ragged prompts): row s consumes prompt tokens
    # teacher-forced while i < plen[s] and self-feeds after, so the serving
    # coalescer can batch requests with different prompt lengths. Row s's
    # generated tokens land at output columns 0, 1, ... regardless of its
    # prompt length (the per-row output column is i - plen[s] + 1).
    plen_col = jnp.concatenate(
        [jnp.full((1, 1), plen_ref[s], jnp.int32) for s in range(batch)],
        axis=0,
    )  # (B, 1)

    if not greedy:
        pltpu.prng_seed(seed_ref[0])
        # Loop-invariant per-row sampling columns, built ONCE from the SMEM
        # scalars (per-step slice/concat work measured -22% at batch 8).
        # A row with temperature <= 0 scales by 1 and gets no Gumbel noise
        # — exact greedy argmax inside a sampled batch.
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
        )  # (B, 1)
        noise_col = jnp.concatenate(
            [
                jnp.full(
                    (1, 1), jnp.where(temp_ref[s] > 0.0, 1.0, 0.0), jnp.float32
                )
                for s in range(batch)
            ],
            axis=0,
        )  # (B, 1)

    if has_prefill:
        # Parallel prefill (train/generate.py): cache rows [0, start) were
        # filled by ONE batched XLA forward over the common prompt prefix
        # instead of `start` teacher-forced kernel steps; rows beyond
        # arrive zeroed. The rows stage in from HBM (a VMEM operand would
        # double the cache footprint) — one DMA per layer, once.
        copies = [
            pltpu.make_async_copy(src.at[layer], dst.at[layer], prefill_sem)
            for layer in range(num_layers)
            for src, dst in ((kcache_ref, kbuf), (vcache_ref, vbuf))
        ]
        for copy in copies:
            copy.start()
        for copy in copies:
            copy.wait()
    else:
        for layer in range(num_layers):
            kbuf[layer] = jnp.zeros_like(kbuf[layer])
            vbuf[layer] = jnp.zeros_like(vbuf[layer])

    # Masks. Group of activation row r: r // R (sequence s = rows s*R..s*R+R-1).
    rowmask_one = (
        jax.lax.broadcasted_iota(jnp.int32, (R, E), 1) // head_dim
        == jax.lax.broadcasted_iota(jnp.int32, (R, E), 0)
    ).astype(jnp.float32)
    rowmask = jnp.tile(rowmask_one, (B, 1))  # (B*R, E)

    slab_rows = jax.lax.broadcasted_iota(
        jnp.int32, (KV_SLAB, B * E if lanestack else E), 0
    )
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, out_len), 1)
    vocab_cols_b = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_pad), 1)
    vocab_cols_r = jax.lax.broadcasted_iota(jnp.int32, (R, vocab_pad), 1)
    wpe_cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)

    softmax_scale = float(head_dim) ** -0.5 if scale_attention else 1.0

    def expand(x_small):  # (B, n) -> (B*R, n) replicated within groups
        return jnp.broadcast_to(
            x_small[:, None, :], (B, R, x_small.shape[1])
        ).reshape(B * R, x_small.shape[1])

    def collapse(x_wide):  # (B*R, n) masked-sum within groups -> (B, n)
        return jnp.sum((x_wide * rowmask).reshape(B, R, E), axis=1)

    def prompt_onehots(i):
        # Per-sequence one-hots from SMEM scalars (row-group by row-group:
        # packing SMEM reads into a vector is not reliably lowerable). Each
        # row clamps to ITS final prompt token; rows already generating
        # ignore the result (the carry select below keys on plen per row).
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

    def make_step(live):
        # ``live`` = cache rows this segment's attention contracts per
        # sequence (static, 128-aligned, >= position + 1 in the segment).
        cache_cols = jax.lax.broadcasted_iota(jnp.int32, (R, live), 1)

        def step(i, onehot):
            position = i

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
            )  # (1, E)
            h = tok_embed + pos_embed  # (B*R, E)

            for layer in range(num_layers):
                x1 = _layernorm(h, ln1_ref[layer, 0:1, :], ln1_ref[layer, 1:2, :], ln_eps)
                qkv = _matmul(x1, qkv_w_ref[layer]) + qkv_b_ref[layer].astype(jnp.float32)
                q = qkv[:, :E]
                k_small = collapse(qkv[:, E : 2 * E])  # (B, E) one row per seq
                v_small = collapse(qkv[:, 2 * E :])

                # Append each sequence's k/v (tile-aligned KV_SLAB-row masked
                # writes). Lane-stacked: ONE slab RMW per buffer (row
                # `position`, sequence s at lanes s*E..); sublane-stacked: one
                # per sequence at row s*C + position.
                slab = pl.multiple_of((position // KV_SLAB) * KV_SLAB, KV_SLAB)
                row_hit = slab_rows == (position - slab)
                if lanestack:
                    k_wide = k_small.reshape(1, B * E)
                    v_wide = v_small.reshape(1, B * E)
                    k_slab = kbuf[layer, pl.ds(slab, KV_SLAB), :]
                    kbuf[layer, pl.ds(slab, KV_SLAB), :] = jnp.where(
                        row_hit,
                        jnp.broadcast_to(k_wide, (KV_SLAB, B * E)),
                        k_slab,
                    ).astype(kbuf.dtype)
                    v_slab = vbuf[layer, pl.ds(slab, KV_SLAB), :]
                    vbuf[layer, pl.ds(slab, KV_SLAB), :] = jnp.where(
                        row_hit,
                        jnp.broadcast_to(v_wide, (KV_SLAB, B * E)),
                        v_slab,
                    ).astype(vbuf.dtype)
                else:
                    for s in range(B):
                        base = s * C
                        k_slab = kbuf[layer, pl.ds(base + slab, KV_SLAB), :]
                        kbuf[layer, pl.ds(base + slab, KV_SLAB), :] = jnp.where(
                            row_hit,
                            jnp.broadcast_to(k_small[s : s + 1], (KV_SLAB, E)),
                            k_slab,
                        ).astype(kbuf.dtype)
                        v_slab = vbuf[layer, pl.ds(base + slab, KV_SLAB), :]
                        vbuf[layer, pl.ds(base + slab, KV_SLAB), :] = jnp.where(
                            row_hit,
                            jnp.broadcast_to(v_small[s : s + 1], (KV_SLAB, E)),
                            v_slab,
                        ).astype(vbuf.dtype)

                qb_f32 = q * rowmask  # (B*R, E)
                qb = qb_f32.astype(kbuf.dtype)

                if use_rel:
                    # Shear-free relative bias (ops/decode_kernel.py): cache slot
                    # j needs E row (window-1-position+j) — contract against only
                    # the 128-aligned (C+128)-row superset of that run, then one
                    # dynamic roll fixes the sub-tile offset; zero padding absorbs
                    # out-of-table distances. All sequences share the table, so
                    # this stays one (B*R)-row matmul (no cross-sequence waste).
                    rel_start = _round_up(C, 128) + window - 1 - position
                    rel_aligned = pl.multiple_of((rel_start // 128) * 128, 128)
                    band = jax.lax.dot_general(
                        qb, rel_pad_ref[layer, pl.ds(rel_aligned, live + 128), :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (B*R, live + 128); lane m holds E row (rel_aligned + m)
                    rolled = pltpu.roll(
                        band, live + 128 - (rel_start - rel_aligned), axis=1
                    )

                # Attention per sequence (static unrolled loop): a single
                # (B*R, B*C) scores matmul would compute all BxB cross-sequence
                # blocks and mask 7/8 of them away — 8x wasted MXU at B=8, and
                # the scores/AV matmuls dominate the step there.
                attn_rows = []
                for s in range(B):
                    qb_s = qb[s * R : (s + 1) * R]  # (R, E)
                    k_live = (
                        kbuf[layer, pl.ds(0, live), pl.ds(s * E, E)]
                        if lanestack
                        else kbuf[layer, pl.ds(s * C, live), :]
                    )
                    scores = jax.lax.dot_general(
                        qb_s, k_live,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (R, live)
                    if use_rel:
                        scores = scores + rolled[s * R : (s + 1) * R, :live]
                    scores = scores * softmax_scale
                    scores = jnp.where(cache_cols <= position, scores, NEG_INF)

                    m = jnp.max(scores, axis=1, keepdims=True)
                    p = jnp.exp(scores - m)
                    w = p / jnp.sum(p, axis=1, keepdims=True)

                    v_live = (
                        vbuf[layer, pl.ds(0, live), pl.ds(s * E, E)]
                        if lanestack
                        else vbuf[layer, pl.ds(s * C, live), :]
                    )
                    mixed = jax.lax.dot_general(
                        w.astype(vbuf.dtype), v_live,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (R, E)
                    attn_rows.append(
                        jnp.sum(mixed * rowmask_one, axis=0, keepdims=True)
                    )  # (1, E)
                attn = expand(jnp.concatenate(attn_rows, axis=0))  # (B*R, E)
                attn = _matmul(attn, proj_w_ref[layer]) + proj_b_ref[layer].astype(
                    jnp.float32
                )
                x2 = x1 + attn

                # ln_2's scale/bias live inside fc_w/fc_b (pack-time fold).
                mm = _standardize(x2, ln_eps)
                hidden = _gelu_tanh(
                    _matmul(mm, fc_w_ref[layer]) + fc_b_ref[layer].astype(jnp.float32)
                )
                h = x2 + _matmul(hidden, fp_w_ref[layer]) + fp_b_ref[layer].astype(
                    jnp.float32
                )

            # ln_f's scale lives inside wte_t; its bias + vocab-pad mask arrive
            # pre-combined as logits_b.
            hf = _standardize(h, ln_eps)
            logits_wide = _matmul(hf, wte_t_ref[...])  # (B*R, Vpad)
            logits = logits_wide.reshape(B, R, vocab_pad)[:, 0, :] + logits_b_ref[...]

            # Per-row sampling params (SMEM vectors) let the serving
            # coalescer batch requests with mixed settings: each row scales
            # by its own temperature and filters by its own thresholds
            # (disabled rows carry always-true sentinels). A row with
            # temperature <= 0 scales by 1 and gets no Gumbel noise —
            # exact greedy argmax for that row inside a sampled batch.
            kthr = [topk_ref[s] for s in range(B)] if use_k else None
            pthr = [topp_ref[s] for s in range(B)] if use_p else None
            if greedy:
                # Argmax-invariant; see ops/decode_kernel.py (interpret-mode
                # coverage of the filter wiring).
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
                mantissa = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32)
                uniform = mantissa.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-12
                scored = scaled + (-jnp.log(-jnp.log(uniform))) * noise_col

            # First-max index per sequence as a (B, 1) vector (== jnp.argmax).
            peak = jnp.max(scored, axis=1, keepdims=True)
            next_index = jnp.min(
                jnp.where(scored == peak, vocab_cols_b, vocab_pad), axis=1, keepdims=True
            )  # (B, 1) int32

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

    carry = prompt_onehots(start_step)
    for seg_start, seg_end, live in _decode_stages(cache_len, num_steps):
        if seg_end <= start_step:  # fully prefilled segment: skip
            continue
        carry = jax.lax.fori_loop(
            max(seg_start, start_step), seg_end, make_step(live), carry,
            unroll=False,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "length", "cache_len", "interpret", "greedy", "use_k", "use_p",
        "ragged", "start_step",
    ),
)
def _batched_impl(
    packed, prompts, plens, seed, temperature, top_k, top_p, k_rows, v_rows,
    *, config, length: int, cache_len: int, interpret: bool, greedy: bool,
    use_k: bool = False, use_p: bool = False, ragged: bool = False,
    start_step: int = 0,
):
    E = config.embed_dim
    has_prefill = start_step > 0
    # Lane-stacked KV needs 128-aligned per-sequence lane slices (and has
    # no prefill import path).
    lanestack = _LANESTACK and E % 128 == 0 and not has_prefill
    batch, prompt_len = prompts.shape
    vocab_pad = packed["wte"].shape[0]
    use_rel = config.use_relative_attention
    num_steps = prompt_len + length - 1
    # Ragged prompts: a row with prompt length p starts generating at step
    # p-1, so the output buffer must span the worst case (p = 1). Sized
    # statically — NOT from min(plens) — so one compiled program covers
    # every prompt-length mix at a given (batch, width, length) shape.
    out_len = num_steps if ragged else length

    if use_rel:
        # Leading zeros cover positions past the window; trailing zeros
        # absorb out-of-table distances and keep the 128-aligned (C+128)-row
        # band slice in bounds (see ops/decode_kernel.py).
        rel_pad = jnp.pad(
            packed["rel_rows"],
            ((0, 0), (_round_up(cache_len, 128), cache_len + 128), (0, 0)),
        )
    else:
        rel_pad = packed["rel_rows"]  # small dummy

    mask = jnp.where(
        jnp.arange(vocab_pad)[None, :] < config.vocab_size, 0.0, NEG_INF
    )
    logits_b = packed["logits_b"].astype(jnp.float32) + mask

    kernel = functools.partial(
        _batched_kernel,
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
        lanestack=lanestack,
        use_k=use_k,
        use_p=use_p,
        start_step=start_step,
        has_prefill=has_prefill,
    )

    # Scalar-or-per-row params -> (B,) SMEM vectors; disabled rows carry
    # always-true sentinels (rank < Vpad+1, strict mass-before < 2).
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
    if not has_prefill:
        # Small dummies: the kernel zero-initializes its cache scratch.
        k_rows = jnp.zeros((config.num_layers, 8, E), packed["wte"].dtype)
        v_rows = k_rows
    tensor_inputs = (
        packed["wte"], packed["wte_t"], packed["wpe"],
        packed["ln1"], packed["qkv_w"], packed["qkv_b"],
        packed["proj_w"], packed["proj_b"],
        packed["fc_w"], packed["fc_b"],
        packed["fp_w"], packed["fp_b"],
        logits_b, rel_pad, k_rows, v_rows,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(tensor_inputs) - 2)
            # The prefill cache rows stay in HBM and DMA into the scratch.
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2
        ),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (config.num_layers, cache_len, batch * E)
                if lanestack
                else (config.num_layers, batch * cache_len, E),
                packed["wte"].dtype,
            ),
        ]
        * 2
        + [pltpu.SemaphoreType.DMA],
    )

    tokens = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((batch, out_len), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(*scalars, *tensor_inputs)

    # Every row's generation starts at column 0; ragged batches over-run
    # shorter-prompt rows past `length`, which this trims.
    return tokens[:, :length]  # (batch, length)


def megakernel_generate_batched(
    packed, prompts, seed, temperature,
    *, config, length: int, cache_len: int, interpret: bool = False,
    top_k=0, top_p=0.0, greedy=None, use_k=None, use_p=None,
    prompt_lengths=None, prefill_rows=None, start_step: int = 0,
):
    """Generates ``length`` tokens for each of B prompts in one kernel.

    prompts: (B, P) int array. Prompt lengths may be RAGGED: pass
    ``prompt_lengths`` (a concrete (B,) int vector, each in [1, P]) and rows
    are teacher-forced only through their own prefix — the serving coalescer
    batches requests with different prompt lengths into one kernel call.
    Row s's ``length`` generated tokens always occupy output columns
    [0, length) (the kernel's per-row output column is i - plen[s] + 1);
    padding columns beyond plen[s] are never read.

    ``temperature``/``top_k``/``top_p`` are scalars or per-row (B,) vectors
    (the serving coalescer batches mixed-setting requests); rows with
    temperature <= 0 decode greedily inside a sampled batch. Pass the
    structure flags explicitly when calling with traced values.

    **Parallel prefill**: ``prefill_rows`` = (k_rows, v_rows), each
    (L, B*cache_len, E), holding the cache for positions [0, start_step)
    built by ONE batched XLA forward (train/generate.py exports it via
    ``cache_to_rows_batched``); the kernel then starts its token loop at
    ``start_step`` (a STATIC int — one compiled program per prompt-length
    bucket) instead of teacher-forcing the common prefix one position per
    step. Greedy outputs are identical with or without prefill; sampled
    streams differ (the per-step Gumbel draws start at ``start_step``).
    """
    from composer_tpu.ops.decode_kernel import sampling_flags

    prompts = jnp.asarray(prompts, jnp.int32)
    if prompts.shape[1] + length > cache_len:
        raise ValueError("prompt + length exceeds cache")
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
    if start_step:
        if prefill_rows is None:
            raise ValueError("start_step > 0 requires prefill_rows")
        if isinstance(plens, np.ndarray) and start_step >= plens.min():
            # The input at step `start` must still be a forced prompt token
            # for EVERY row (the prefill never samples — PRNG stays in-kernel).
            raise ValueError(
                f"start_step ({start_step}) must be < min prompt length "
                f"({plens.min()})"
            )
        k_rows, v_rows = prefill_rows
        expected = (
            config.num_layers, prompts.shape[0] * cache_len, config.embed_dim
        )
        if k_rows.shape != expected:
            raise ValueError(
                f"prefill k_rows shape {k_rows.shape} != {expected}"
            )
    else:
        k_rows = v_rows = None
    return _batched_impl(
        packed, prompts, plens, seed, temperature, top_k, top_p,
        k_rows, v_rows,
        config=config, length=length, cache_len=cache_len,
        interpret=interpret, greedy=greedy, use_k=use_k, use_p=use_p,
        ragged=ragged, start_step=start_step,
    )
