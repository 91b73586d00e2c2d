"""Segmented batched decoding with per-row positions: continuous batching.

The whole-generation kernels (ops/decode_kernel.py, decode_kernel_batched.py)
run a request batch to completion — a request arriving one step after
dispatch waits a full generation. This variant runs the token loop in
SEGMENTS of a fixed step count with the KV caches carried between calls
(aliased in/out VMEM refs), so the serving scheduler can ADMIT a new request
into a running batch and EVICT finished rows at every segment boundary.

What makes admission possible is per-row positions: row s was admitted at
global step ``start[s]`` and sits at position ``i - start[s]``; a row whose
position is still inside its own prompt is teacher-forced, afterwards it
feeds back its sample. Rows with negative positions ("parked": admitted at
a future step, or an empty slot) contribute no cache writes and no output.
A newly admitted row simply overwrites its slot's stale cache rows as its
position advances — every row reads only cache rows it wrote itself, so no
zeroing is needed between occupants.

Per-row positions cost three per-row (per-``s``) operations the
whole-generation kernel shares across rows: the position embedding one-hot,
the relative-bias band matmul + roll (each row needs a different table
alignment — mirrors the single-sequence kernel's shear-free algebra,
decode_kernel.py:330-345), and the causal mask bound. The score/AV matmuls
were already per-row.

The PRNG is reseeded per step from (seed, global step), so a generation
split across segments samples the same tokens as any other segmentation of
the same steps — admission timing of OTHER rows never perturbs a row's
stream (pinned in tests/test_decode_segmented.py).

Reference surface: the decode loop at composer/cli.py:662-676 regenerated
one file per eager call; continuous batching is the beyond-parity serving
axis (SURVEY.md §6).
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
    _matmul,
    _round_up,
    _standardize,
)

# Multiplier folding the global step into the per-step PRNG seed (odd, so
# step streams stay distinct mod 2^31).
_STEP_SEED_MIX = 1000003


def _segment_kernel(
    # scalar prefetch (SMEM)
    prompt_ref, plen_ref, start_ref, step0_ref, seed_ref,
    temp_ref, topk_ref, topp_ref,
    # tensor inputs (VMEM except the HBM-resident kbuf/vbuf)
    wte_ref, wte_t_ref, wpe_ref,
    ln1_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref,
    fc_w_ref, fc_b_ref, fp_w_ref, fp_b_ref,
    logits_b_ref, rel_pad_ref, kbuf_in, vbuf_in, carry_in,
    # outputs (kbuf_out/vbuf_out/carry_ref aliased to the inputs)
    tokens_ref, kbuf_out, vbuf_out, carry_ref,
    # VMEM scratch: each slot's live cache prefix for this segment
    kbuf, vbuf, copy_sem,
    *, batch: int, num_layers: int, num_heads: int, head_dim: int,
    embed_dim: int, cache_len: int, window: int, vocab_pad: int,
    vocab_size: int, steps: int, live: int, live_pad: int, ln_eps: float,
    scale_attention: bool, greedy: bool, use_rel: bool,
    use_k: bool = False, use_p: bool = False,
):
    del carry_in  # aliased: read/write through the output ref
    B, R, E, C = batch, num_heads, embed_dim, cache_len
    width = prompt_ref.shape[1]
    step0 = step0_ref[0]

    # Stage each slot's live cache prefix HBM -> VMEM. The full (B, C) cache
    # cannot be a VMEM operand: aliased in/out VMEM windows are allocated
    # SEPARATELY by Mosaic (measured: 2x the cache footprint, OOM at
    # 8 slots x 1024), and ``live`` is usually far below C anyway. One DMA
    # per (layer, slot) — or per layer when the prefix spans the whole slot.
    def prefix_copies(src_k, dst_k, src_v, dst_v, src_stride, dst_stride):
        copies = []
        for layer in range(num_layers):
            if live == src_stride == dst_stride:
                pairs = [((layer,), (layer,))]
            else:
                pairs = [
                    (
                        (layer, pl.ds(s * src_stride, live)),
                        (layer, pl.ds(s * dst_stride, live)),
                    )
                    for s in range(B)
                ]
            for src_idx, dst_idx in pairs:
                copies.append(
                    pltpu.make_async_copy(
                        src_k.at[src_idx], dst_k.at[dst_idx], copy_sem
                    )
                )
                copies.append(
                    pltpu.make_async_copy(
                        src_v.at[src_idx], dst_v.at[dst_idx], copy_sem
                    )
                )
        return copies

    copies_in = prefix_copies(kbuf_in, kbuf, vbuf_in, vbuf, C, live_pad)
    for copy in copies_in:
        copy.start()
    for copy in copies_in:
        copy.wait()

    # Per-row SMEM scalars -> (B, 1) columns (see decode_kernel_batched.py).
    def col(ref, dtype):
        return jnp.concatenate(
            [jnp.full((1, 1), ref[s], dtype) for s in range(B)], axis=0
        )

    plen_col = col(plen_ref, jnp.int32)
    start_col = col(start_ref, jnp.int32)
    if not greedy:
        inv_temp_col = jnp.concatenate(
            [
                1.0
                / jnp.full(
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
    slab_rows = jax.lax.broadcasted_iota(jnp.int32, (KV_SLAB, E), 0)
    out_cols = jax.lax.broadcasted_iota(jnp.int32, (B, steps), 1)
    vocab_cols_b = jax.lax.broadcasted_iota(jnp.int32, (B, vocab_pad), 1)
    vocab_cols_r = jax.lax.broadcasted_iota(jnp.int32, (R, vocab_pad), 1)
    wpe_cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)
    cache_cols = jax.lax.broadcasted_iota(jnp.int32, (R, live), 1)

    softmax_scale = float(head_dim) ** -0.5 if scale_attention else 1.0

    def expand(x_small):  # (B, n) -> (B*R, n) replicated within groups
        return jnp.broadcast_to(
            x_small[:, None, :], (B, R, x_small.shape[1])
        ).reshape(B * R, x_small.shape[1])

    def collapse(x_wide):  # (B*R, n) masked-sum within groups -> (B, n)
        return jnp.sum((x_wide * rowmask).reshape(B, R, E), axis=1)

    def prompt_onehots(i):
        """(B*R, Vpad) one-hots of each row's prompt token at position
        i - start[s], clamped into the prompt (parked rows read token 0 —
        exactly the input they will be forced with when they activate)."""
        rows = []
        for s in range(B):
            index = jnp.clip(i - start_ref[s], 0, plen_ref[s] - 1)
            rows.append(
                (vocab_cols_r == prompt_ref[s, index]).astype(wte_ref.dtype)
            )
        return jnp.concatenate(rows, axis=0)

    def step_fn(i, onehot):
        pos_col = i - start_col  # (B, 1) per-row positions (< 0 = parked)
        active_col = pos_col >= 0
        tok_embed = jax.lax.dot_general(
            onehot, wte_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B*R, E)
        # Per-row position embedding (rows sit at different positions).
        pos_onehot = jnp.concatenate(
            [
                (
                    wpe_cols
                    == jnp.clip(i - start_ref[s], 0, window - 1)
                ).astype(wpe_ref.dtype)
                for s in range(B)
            ],
            axis=0,
        )  # (B, window)
        pos_embed = jax.lax.dot_general(
            pos_onehot, wpe_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, E)
        h = tok_embed + expand(pos_embed)  # (B*R, E)

        for layer in range(num_layers):
            x1 = _layernorm(h, ln1_ref[layer, 0:1, :], ln1_ref[layer, 1:2, :], ln_eps)
            qkv = _matmul(x1, qkv_w_ref[layer]) + qkv_b_ref[layer].astype(jnp.float32)
            q = qkv[:, :E]
            k_small = collapse(qkv[:, E : 2 * E])  # (B, E)
            v_small = collapse(qkv[:, 2 * E :])

            qb = (q * rowmask).astype(kbuf.dtype)

            attn_rows = []
            for s in range(B):
                # Clamp into the live prefix: a completed row lingering one
                # extra segment (admission lag) can run past ``live`` — the
                # clamp keeps its (discarded) reads in-slot and the row_hit
                # equality below then fails, so it writes nothing and can
                # never corrupt a neighbouring slot.
                position = jnp.clip(i - start_ref[s], 0, live - 1)
                base = s * live_pad

                # Append this row's k/v at ITS position (masked slab write;
                # parked rows write nothing).
                slab = pl.multiple_of((position // KV_SLAB) * KV_SLAB, KV_SLAB)
                row_hit = (
                    (slab_rows == (i - start_ref[s]) - slab)
                    & (i >= start_ref[s])
                )
                k_slab = kbuf[layer, pl.ds(base + slab, KV_SLAB), 0:E]
                kbuf[layer, pl.ds(base + slab, KV_SLAB), 0:E] = jnp.where(
                    row_hit,
                    jnp.broadcast_to(k_small[s : s + 1], (KV_SLAB, E)),
                    k_slab,
                ).astype(kbuf.dtype)
                v_slab = vbuf[layer, pl.ds(base + slab, KV_SLAB), 0:E]
                vbuf[layer, pl.ds(base + slab, KV_SLAB), 0:E] = jnp.where(
                    row_hit,
                    jnp.broadcast_to(v_small[s : s + 1], (KV_SLAB, E)),
                    v_slab,
                ).astype(vbuf.dtype)

                qb_s = qb[s * R : (s + 1) * R]  # (R, E)
                scores = jax.lax.dot_general(
                    qb_s, kbuf[layer, pl.ds(base, live), 0:E],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (R, live)

                if use_rel:
                    # Shear-free relative bias PER ROW — each row's position
                    # picks a different table alignment (the whole-generation
                    # batch kernel shares one; see decode_kernel.py:330-345
                    # for the lane algebra and zero-padding semantics).
                    lead = _round_up(C, 128)
                    rstart = lead + window - 1 - position
                    aligned = pl.multiple_of((rstart // 128) * 128, 128)
                    band = jax.lax.dot_general(
                        qb_s, rel_pad_ref[layer, pl.ds(aligned, live + 128), :],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (R, live + 128)
                    rolled = pltpu.roll(
                        band, live + 128 - (rstart - aligned), axis=1
                    )
                    scores = scores + rolled[:, :live]

                scores = scores * softmax_scale
                scores = jnp.where(cache_cols <= position, scores, NEG_INF)

                m = jnp.max(scores, axis=1, keepdims=True)
                p = jnp.exp(scores - m)
                w = p / jnp.sum(p, axis=1, keepdims=True)

                mixed = jax.lax.dot_general(
                    w.astype(vbuf.dtype), vbuf[layer, pl.ds(base, live), 0:E],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (R, E)
                attn_rows.append(
                    jnp.sum(mixed * rowmask_one, axis=0, keepdims=True)
                )
            attn = expand(jnp.concatenate(attn_rows, axis=0))  # (B*R, E)
            attn = _matmul(attn, proj_w_ref[layer]) + proj_b_ref[layer].astype(
                jnp.float32
            )
            x2 = x1 + attn

            mm = _standardize(x2, ln_eps)
            hidden = _gelu_tanh(
                _matmul(mm, fc_w_ref[layer]) + fc_b_ref[layer].astype(jnp.float32)
            )
            h = x2 + _matmul(hidden, fp_w_ref[layer]) + fp_b_ref[layer].astype(
                jnp.float32
            )

        hf = _standardize(h, ln_eps)
        logits_wide = _matmul(hf, wte_t_ref[...])  # (B*R, Vpad)
        logits = logits_wide.reshape(B, R, vocab_pad)[:, 0, :] + logits_b_ref[...]

        kthr = [topk_ref[s] for s in range(B)] if use_k else None
        pthr = [topp_ref[s] for s in range(B)] if use_p else None
        if greedy:
            scored = logits
            if use_k or use_p:
                scored = _filtered_scaled_logits(scored, kthr, pthr, wte_ref.dtype)
        else:
            # Reseed from (seed, global step) so a row's sample stream
            # depends only on the steps it lives through — never on how the
            # generation is cut into segments.
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

        # Raw per-step samples; the host gathers each row's generation from
        # its own offsets (parked/forced steps emit -1).
        emit = jnp.where(active_col, next_index, -1)
        tokens_ref[:] = jnp.where(out_cols == i - step0, emit, tokens_ref[:])

        sampled_onehot = (
            expand(jnp.broadcast_to(next_index, (B, vocab_pad)))
            == jax.lax.broadcasted_iota(jnp.int32, (B * R, vocab_pad), 1)
        ).astype(onehot.dtype)
        next_forced = expand(((i + 1 - start_col) < plen_col).astype(jnp.int32)) != 0
        return jnp.where(next_forced, prompt_onehots(i + 1), sampled_onehot)

    # The carried value is the one-hot of each row's NEXT input token; it
    # enters and leaves through the aliased carry ref so a generation can be
    # cut at any segment boundary. Re-derive the forced/self-fed select at
    # segment start: rows ADMITTED at this boundary carry the previous
    # occupant's stale one-hot, and their first input must come from their
    # own prompt.
    forced0 = expand(((step0 - start_col) < plen_col).astype(jnp.int32)) != 0
    carry = jnp.where(forced0, prompt_onehots(step0), carry_ref[...])
    carry = jax.lax.fori_loop(step0, step0 + steps, step_fn, carry, unroll=False)
    carry_ref[...] = carry

    # Stage the (updated) live prefixes back out VMEM -> HBM. Rows beyond
    # ``live`` were never touched and keep their contents through the
    # in/out aliasing — no copy for them.
    copies_out = prefix_copies(kbuf, kbuf_out, vbuf, vbuf_out, live_pad, C)
    for copy in copies_out:
        copy.start()
    for copy in copies_out:
        copy.wait()


def init_segment_state(packed, config, batch: int, cache_len: int):
    """Fresh carried state for a decode-slot batch: zeroed KV caches and a
    zero carry one-hot (the kernel re-derives every admitted row's first
    input from its prompt at segment start)."""
    vocab_pad = packed["wte"].shape[0]
    dtype = packed["wte"].dtype
    # Lane dim padded to the 128-lane tile: the segment DMAs slice the
    # cache memrefs, and Mosaic requires those slices lane-aligned (only
    # costs anything at embed_dim < 128, i.e. toy models).
    kbuf = jnp.zeros(
        (config.num_layers, batch * cache_len, _round_up(config.embed_dim, 128)),
        dtype,
    )
    vbuf = jnp.zeros_like(kbuf)
    carry = jnp.zeros((batch * config.num_heads, vocab_pad), dtype)
    return kbuf, vbuf, carry


PARKED = 2**30  # start value for empty slots: never reached


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "steps", "cache_len", "live", "interpret",
        "greedy", "use_k", "use_p",
    ),
    donate_argnums=(1, 2, 3),
)
def decode_segment(
    packed, kbuf, vbuf, carry, prompts, plens, starts, step0, seed,
    temperature, top_k, top_p,
    *, config, steps: int, cache_len: int, live: int, interpret: bool = False,
    greedy: bool = True, use_k: bool = False, use_p: bool = False,
):
    """Runs ``steps`` decode steps [step0, step0+steps) over the slot batch.

    Returns ``(tokens, kbuf, vbuf, carry)``: tokens is (B, steps) — row s's
    RAW sample after each step (-1 while parked); the scheduler gathers its
    generation from columns where its position has passed its prompt. The
    state arrays are donated and aliased through the kernel, so carrying
    them between calls moves no HBM bytes beyond the VMEM load/store.

    ``live`` (static) bounds the cache rows attention contracts; every
    row's position through the segment must stay below it.
    """
    E = config.embed_dim
    batch = prompts.shape[0]
    vocab_pad = packed["wte"].shape[0]
    use_rel = config.use_relative_attention
    live = min(live, cache_len)
    live_pad = _round_up(live, 128 if live >= 128 else KV_SLAB)

    if use_rel:
        rel_pad = jnp.pad(
            packed["rel_rows"],
            ((0, 0), (_round_up(cache_len, 128), cache_len + 128), (0, 0)),
        )
    else:
        rel_pad = packed["rel_rows"]

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
        _segment_kernel,
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
        live_pad=live_pad,
        ln_eps=config.layer_norm_epsilon,
        scale_attention=config.scale_attention,
        greedy=greedy,
        use_rel=use_rel,
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
    tensor_inputs = (
        packed["wte"], packed["wte_t"], packed["wpe"],
        packed["ln1"], packed["qkv_w"], packed["qkv_b"],
        packed["proj_w"], packed["proj_b"],
        packed["fc_w"], packed["fc_b"],
        packed["fp_w"], packed["fp_b"],
        logits_b, rel_pad,
        kbuf, vbuf, carry,
    )

    # The KV caches stay in HBM (ANY) and round-trip through live-sized VMEM
    # scratch inside the kernel: an aliased VMEM operand would get separate
    # input AND output windows from Mosaic, doubling the footprint.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(tensor_inputs) - 3)
            + [pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec(memory_space=pltpu.VMEM)]
        ),
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (config.num_layers, batch * live_pad, kbuf.shape[2]), kbuf.dtype
            ),
            pltpu.VMEM(
                (config.num_layers, batch * live_pad, vbuf.shape[2]), vbuf.dtype
            ),
            pltpu.SemaphoreType.DMA,
        ],
    )

    state_base = len(scalars) + len(tensor_inputs) - 3  # kbuf's input index
    tokens, kbuf, vbuf, carry = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((batch, steps), jnp.int32),
            jax.ShapeDtypeStruct(kbuf.shape, kbuf.dtype),
            jax.ShapeDtypeStruct(vbuf.shape, vbuf.dtype),
            jax.ShapeDtypeStruct(carry.shape, carry.dtype),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
        input_output_aliases={
            state_base: 1, state_base + 1: 2, state_base + 2: 3
        },
    )(*scalars, *tensor_inputs)
    return tokens, kbuf, vbuf, carry
