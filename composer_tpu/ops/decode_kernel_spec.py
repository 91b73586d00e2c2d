"""Speculative block decoding: n-gram-drafted tokens verified in parallel,
inside the single-sequence megakernel.

The batch-1 megakernel (ops/decode_kernel.py) is latency-bound: every
position costs one sequential step whose matmuls use at most 16 sublane
rows of the MXU. This kernel advances up to ``T`` (default 8) positions
per step by exploiting two facts:

* the per-step qkv/MLP/logits matmuls already pad their activations to 16
  sublane rows, so teacher-forcing a block of 8 tokens through them costs
  the SAME MXU time as one token — verification of 8 positions is nearly
  free; only the attention score/mix contractions grow (T*H rows);
* a trained music model's output is highly repetitive (the event stream
  re-walks note/time-shift patterns), so a draft that simply replays the
  continuation of the most recent earlier occurrence of the current
  context n-gram is right often enough to matter — and it needs no second
  model, no extra weights, and ~one VPU sweep over the id buffer.

Each block step:

1. drafts T-1 tokens by suffix lookup: find the most recent position j
   whose (2-gram, falling back to 1-gram) context matches the current
   tail, and propose ids[j+1..j+T-1] (prompt positions are teacher-forced
   with the real prompt instead — which makes the prompt phase a free
   8-tokens-per-step parallel prefill);
2. runs ONE forward pass over the T-token block (KV append for all T
   positions, causally masked attention, logits for all T rows);
3. samples s_t from the target distribution at every block row; the draft
   is a POINT MASS, for which exact rejection sampling degenerates to:
   emit s_0, then keep emitting s_t while s_{t-1} equals the drafted
   token at position t. The first mismatching s is still a valid sample
   from the true conditional (the standard residual-resample IS the
   target distribution when the proposal has mass on one token), so every
   block emits between 1 and T tokens, each distributed exactly as the
   sequential sampler's. Greedy decoding is bit-identical to the
   non-speculative kernel by construction (pinned exact under f32; under
   bf16 compute, near-tie argmax flips from different accumulation
   shapes can diverge the streams — the same benign class by which the
   sequential megakernel and the XLA engine already differ under bf16).

The loop is a ``lax.while_loop`` over blocks — the number of blocks is
data-dependent (it shrinks as acceptance grows). Tokens are scattered to
their output slots by position, so no order bookkeeping survives the loop.

Replaces the reference's one-eager-call-per-token decode loop
(reference cli.py:662-676) in the batch-1/low-latency regime; see
docs/serving.md for when to prefer it over the sequential megakernel.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composer_tpu.ops.decode_kernel import (
    NEG_INF,
    _filtered_scaled_logits,
    _gelu_tanh,
    _layernorm,
    _matmul,
    _round_up,
    _standardize,
    sampling_flags,
)

# Tokens advanced per verified block (1 real + T-1 drafted). Block cost
# grows ~linearly in T (the T*H attention score rows), so the best T tracks
# the realized acceptance. Re-swept after the strict-triangle acceptance
# fix on the round-4 validation model (v5e-1, rel-attention ON, NLL 0.685;
# profiler-differenced device marginals, scripts/sweep_spec_block.py;
# sequential kernel = 80.4k ev/s): greedy acceptance 2.0-2.6 tokens/block
# peaks at T=5 (148.7k = 1.85x; T=4 137.0k, T=6 139.5k, T=8 132.8k);
# sampled acceptance is draft-bound at ~1.4, where the smallest verify
# overhead wins (T=3: 91.1k = 1.13x; T=5 break-even, T=8 below
# sequential). COMPOSER_SPEC_BLOCK forces one size for both regimes.
SPEC_BLOCK_GREEDY = 5
SPEC_BLOCK_SAMPLED = 3


def _parse_block_env():
    """Validate COMPOSER_SPEC_BLOCK once: an integer in [2, 16] or unset."""
    raw = os.environ.get("COMPOSER_SPEC_BLOCK")
    if raw is None or raw == "":
        return None
    try:
        value = int(raw)
    except ValueError:
        raise ValueError(
            f"COMPOSER_SPEC_BLOCK must be an integer in [2, 16], got {raw!r}"
        ) from None
    if value < 2 or value > 16:
        raise ValueError(
            f"COMPOSER_SPEC_BLOCK must be in [2, 16], got {value}"
        )
    return value


_SPEC_BLOCK_FORCED = _parse_block_env()
# Back-compat module constant: the forced size when set, else the greedy
# default (bench/telemetry reporting reads this).
SPEC_BLOCK = _SPEC_BLOCK_FORCED if _SPEC_BLOCK_FORCED else SPEC_BLOCK_GREEDY


def default_block(greedy: bool) -> int:
    """The measured-best block size for a sampling regime (env-overridable)."""
    if _SPEC_BLOCK_FORCED:
        return _SPEC_BLOCK_FORCED
    return SPEC_BLOCK_GREEDY if greedy else SPEC_BLOCK_SAMPLED

# KV slab window the block append addresses: T consecutive positions span at
# most two 16-row tiles.
_KV_WINDOW = 32


def _spec_decode_kernel(
    # scalar prefetch (SMEM)
    plen_ref, seed_ref, temp_ref, topk_ref, topp_ref,
    # tensor inputs (VMEM)
    prompt_row_ref,
    wte_ref, wte_t_ref, wpe_ref,
    ln1_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref,
    fc_w_ref, fc_b_ref, fp_w_ref, fp_b_ref,
    logits_b_ref, rel_pad_ref,
    # outputs
    tokens_ref, stats_ref,
    # scratch
    kbuf, vbuf, ids_buf, scalar_scratch,
    *, num_layers: int, num_heads: int, head_dim: int, embed_dim: int,
    cache_len: int, window: int, vocab_pad: int, vocab_size: int,
    length: int, block: int, ln_eps: float, scale_attention: bool,
    greedy: bool, use_rel: bool, use_k: bool, use_p: bool,
):
    T = block
    H = num_heads
    R = max(16, T)          # sublane rows for the dense matmuls (bf16 tile)
    TH = T * H              # score rows: (t, h) pairs
    C = cache_len
    W = ids_buf.shape[1]    # padded ids width (>= C)

    plen = plen_ref[0]
    temperature = temp_ref[0]
    if not greedy:
        pltpu.prng_seed(seed_ref[0])

    # The id stream (prompt + emitted tokens, by position) lives in one VMEM
    # lane row: the draft lookup is a VPU sweep over it, and token blocks are
    # read out of it with a roll — the kernel never routes tokens through
    # SMEM scalars.
    ids_buf[:] = prompt_row_ref[:]

    for layer in range(num_layers):
        # Zero: future-slot softmax weights are exactly 0, but 0 * NaN from
        # stale scratch would still poison the value contraction.
        kbuf[layer] = jnp.zeros_like(kbuf[layer])
        vbuf[layer] = jnp.zeros_like(vbuf[layer])

    # Constant index planes.
    head_of_row = jax.lax.broadcasted_iota(jnp.int32, (TH, embed_dim), 0) % H
    headmask = (
        jax.lax.broadcasted_iota(jnp.int32, (TH, embed_dim), 1) // head_dim
        == head_of_row
    ).astype(jnp.float32)  # (TH, E): row t*H+h keeps head h's lanes
    # rep[r, t] = 1 iff score row r belongs to block token t (r // H == t):
    # expands (T, E) queries to (TH, E) score rows by one small matmul.
    rep = (
        jax.lax.broadcasted_iota(jnp.int32, (TH, T), 0) // H
        == jax.lax.broadcasted_iota(jnp.int32, (TH, T), 1)
    ).astype(jnp.float32)
    vocab_cols = jax.lax.broadcasted_iota(jnp.int32, (R, vocab_pad), 1)
    wpe_cols = jax.lax.broadcasted_iota(jnp.int32, (R, window), 1)
    wpe_rows = jax.lax.broadcasted_iota(jnp.int32, (R, window), 0)
    cache_cols = jax.lax.broadcasted_iota(jnp.int32, (TH, C), 1)
    trow_of = jax.lax.broadcasted_iota(jnp.int32, (TH, C), 0) // H
    ids_cols = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    kv_rows = jax.lax.broadcasted_iota(jnp.int32, (_KV_WINDOW, embed_dim), 0)
    out_rows8 = jax.lax.broadcasted_iota(jnp.int32, (length, T), 0)
    out_cols8 = jax.lax.broadcasted_iota(jnp.int32, (length, T), 1)
    # STRICTLY lower-triangular ones: cumulative violation counts for the
    # acceptance prefix (one tiny MXU op instead of a sublane scan). The
    # strict inequality matters: row t must count only violations BEFORE
    # lane t, so a fully matched block emits all T samples (an inclusive
    # triangle would make ok[t] require lane t's own match and cap every
    # block at T-1 emissions).
    tri_rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    tri_cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    tri = (tri_cols < tri_rows).astype(jnp.float32)  # (T, T)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)

    softmax_scale = float(head_dim) ** -0.5 if scale_attention else 1.0

    def roll_left(row, k):
        # Rotate lane t to hold row[t + k]. Shifts are normalized to [1, W]
        # (compiled Mosaic's dynamic roll is exercised in that range by the
        # production kernels; negative shifts are not).
        return pltpu.roll(row, W - k, axis=1)

    def block_step(carry):
        p0, blocks, gen_blocks = carry
        ids_row = ids_buf[0:1, :]  # (1, W) i32

        # --- Draft lookup -------------------------------------------------
        # Current context tail: ids[p0-1], ids[p0]. At p0 == 0 the shift
        # normalization reads garbage lanes, but the c < p0 candidate mask is
        # then empty so the lookup result is inert.
        tail = pltpu.roll(
            ids_row, jnp.where(p0 >= 1, W + 1 - p0, 1), axis=1
        )  # lane 0 = ids[p0-1], lane 1 = ids[p0]
        last1 = tail[0:1, 1:2]  # (1, 1) ids[p0]
        last2 = tail[0:1, 0:1]  # (1, 1) ids[p0-1]
        eq_cur = ids_row == last1
        # Lane c of the rolled id row holds ids[c-1]: the previous-token
        # context match (roll the i32 row, not the bool mask — Mosaic's
        # rotate only handles 32-bit lanes).
        eq_prev_sh = pltpu.roll(ids_row, 1, axis=1) == last2
        # The draft window ids[c+1 .. c+T-1] must lie entirely inside the
        # validated stream (<= p0): a match near the frontier would draft
        # unwritten garbage. For periodic content a deeper occurrence of the
        # same context exists one period earlier, so nothing is lost.
        valid = (ids_cols >= 1) & (ids_cols <= p0 - (T - 1))
        cand2 = eq_cur & eq_prev_sh & valid
        cand1 = eq_cur & valid
        j2 = jnp.max(jnp.where(cand2, ids_cols, -1))
        j1 = jnp.max(jnp.where(cand1, ids_cols, -1))
        j_vec = jnp.where(j2 >= 0, j2, jnp.where(j1 >= 0, j1, 0))
        # Vector-derived scalars must hop through SMEM before they can steer
        # a roll/slice (they poison matmul layouts as vregs).
        scalar_scratch[0] = j_vec
        j = scalar_scratch[0]

        # Block inputs: lane t of in_tok is position p0+t's token — the real
        # id inside the prompt, the drafted continuation ids[j+t] after it.
        win = roll_left(ids_row, p0)[0:1, 0:T]  # lane t = ids[p0 + t]
        drafted = roll_left(ids_row, j)[0:1, 0:T]  # lane t = ids[j + t]
        in_prompt = (p0 + lane_t) < plen
        in_tok = jnp.where(in_prompt | (lane_t == 0), win, drafted)  # (1, T)

        # Record the block's inputs at their positions: accepted ones are the
        # true stream (drafts only survive when they matched the sample);
        # rejected tails are overwritten before any later read.
        in_tok_full = pltpu.roll(
            jnp.pad(in_tok, ((0, 0), (0, W - T))), p0, axis=1
        )
        write_mask = (ids_cols >= p0) & (ids_cols < p0 + T)
        ids_buf[0:1, :] = jnp.where(write_mask, in_tok_full, ids_row)

        # --- One forward pass over the T-token block ----------------------
        in_tok_col = jnp.transpose(in_tok)  # (T, 1)
        tok_pad = jnp.pad(in_tok_col, ((0, R - T), (0, 0)))  # (R, 1)
        tok_onehot = (vocab_cols == tok_pad).astype(wte_ref.dtype)
        tok_embed = jax.lax.dot_general(
            tok_onehot, wte_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, E)
        pos_index = jnp.minimum(p0 + jnp.minimum(wpe_rows, T - 1), window - 1)
        pos_onehot = (wpe_cols == pos_index).astype(wpe_ref.dtype)
        pos_embed = jax.lax.dot_general(
            pos_onehot, wpe_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, E)
        h = tok_embed + pos_embed

        # KV slab window: T consecutive positions span at most two 16-row
        # tiles; the window is clamped so the masked RMW stays in bounds.
        # p0 is a loop-carry scalar, so this needs no SMEM hop.
        slab0 = pl.multiple_of(
            jnp.minimum((p0 // 16) * 16, C - _KV_WINDOW), 16
        )
        hit = (kv_rows + slab0 >= p0) & (kv_rows + slab0 < p0 + T)
        # oh[r, t] = 1 iff window row r holds position p0 + t.
        oh = (
            kv_rows[:, 0:1] + slab0
            == p0 + jax.lax.broadcasted_iota(jnp.int32, (_KV_WINDOW, T), 1)
        ).astype(jnp.float32)  # (_KV_WINDOW, T)

        for layer in range(num_layers):
            x1 = _layernorm(
                h, ln1_ref[layer, 0:1, :], ln1_ref[layer, 1:2, :], ln_eps
            )
            qkv = _matmul(x1, qkv_w_ref[layer]) + qkv_b_ref[layer].astype(
                jnp.float32
            )
            q = qkv[0:T, :embed_dim]  # (T, E)
            k_blk = qkv[0:T, embed_dim : 2 * embed_dim]
            v_blk = qkv[0:T, 2 * embed_dim :]

            k_scat = jax.lax.dot_general(
                oh, k_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (_KV_WINDOW, E)
            v_scat = jax.lax.dot_general(
                oh, v_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            k_win = kbuf[layer, pl.ds(slab0, _KV_WINDOW), :]
            kbuf[layer, pl.ds(slab0, _KV_WINDOW), :] = jnp.where(
                hit, k_scat, k_win
            ).astype(kbuf.dtype)
            v_win = vbuf[layer, pl.ds(slab0, _KV_WINDOW), :]
            vbuf[layer, pl.ds(slab0, _KV_WINDOW), :] = jnp.where(
                hit, v_scat, v_win
            ).astype(vbuf.dtype)

            # Scores for all (t, h) pairs in one contraction: row t*H+h is
            # q_t masked to head h's lanes (q expanded by the rep matmul —
            # unambiguous row mapping, unlike a sublane repeat).
            q_rep = jax.lax.dot_general(
                rep, q,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TH, E), row t*H+h = q_t
            qb = (q_rep * headmask).astype(kbuf.dtype)
            scores = jax.lax.dot_general(
                qb, kbuf[layer],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TH, C)

            if use_rel:
                # Relative bias band (see decode_kernel.py): per block row t
                # the needed E rows start at lead + window - 1 - (p0 + t); one
                # 128-aligned (C + 256)-wide matmul covers all T starts, then
                # a per-t roll aligns each row group.
                lead = _round_up(C + T, 128)
                start_last = lead + window - 1 - (p0 + T - 1)
                aligned = pl.multiple_of((start_last // 128) * 128, 128)
                band = jax.lax.dot_general(
                    qb, rel_pad_ref[layer, pl.ds(aligned, C + 256), :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (TH, C + 256)
                delta0 = (lead + window - 1 - p0) - aligned  # t = 0 offset
                rel_rows = []
                for t in range(T):
                    rolled = pltpu.roll(
                        band[t * H : (t + 1) * H],
                        C + 256 - (delta0 - t), axis=1,
                    )
                    rel_rows.append(rolled[:, :C])
                scores = scores + jnp.concatenate(rel_rows, axis=0)

            scores = scores * softmax_scale
            scores = jnp.where(cache_cols <= p0 + trow_of, scores, NEG_INF)

            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            wgt = p / jnp.sum(p, axis=1, keepdims=True)  # (TH, C)

            mixed = jax.lax.dot_general(
                wgt.astype(vbuf.dtype), vbuf[layer],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (TH, E)
            # Row group t collapses back to one row: select the head-diagonal
            # lanes, then gather groups with a (R, TH) selection matmul.
            sel = (
                jax.lax.broadcasted_iota(jnp.int32, (R, TH), 1) // H
                == jax.lax.broadcasted_iota(jnp.int32, (R, TH), 0)
            ).astype(jnp.float32)
            attn = jax.lax.dot_general(
                sel, mixed * headmask,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, E); rows >= T are zero
            attn = _matmul(attn.astype(jnp.float32), proj_w_ref[layer]) + (
                proj_b_ref[layer].astype(jnp.float32)
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
        logits = _matmul(hf, wte_t_ref[...])[0:T] + logits_b_ref[...]  # (T, Vpad)

        # --- Sample every block row, count the accepted prefix ------------
        if greedy:
            scored = logits
            if use_k or use_p:
                scored = _filtered_scaled_logits(
                    scored,
                    topk_ref[0] if use_k else None,
                    topp_ref[0] if use_p else None,
                )
        else:
            scaled = logits / temperature
            if use_k or use_p:
                scaled = _filtered_scaled_logits(
                    scaled,
                    topk_ref[0] if use_k else None,
                    topp_ref[0] if use_p else None,
                )
            bits = pltpu.prng_random_bits((T, vocab_pad))
            mantissa = pltpu.bitcast(
                pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32
            )
            uniform = mantissa.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-12
            gumbel = -jnp.log(-jnp.log(uniform))
            scored = scaled + gumbel

        s_col = jnp.argmax(scored, axis=1)[:, None].astype(jnp.int32)  # (T, 1)
        s_row = jnp.transpose(s_col)  # (1, T)

        # s_t stays valid while every earlier sample matched its drafted
        # successor (prompt successors are ground truth: forced match).
        # The block inputs are already in ids_buf, so the successor lanes
        # come from a full-width roll (sub-tile rolls of the (1, T) row are
        # not exercised anywhere else).
        succ = roll_left(ids_buf[0:1, :], p0 + 1)[0:1, 0:T]  # lane t: in_tok[t+1]
        forced = (p0 + lane_t + 1) < plen
        # (1, T); lane T-1 has no successor in the block. Plain boolean
        # algebra — a where(c, x, False) lowers through an i8->i1 truncation
        # Mosaic rejects.
        match = (lane_t < T - 1) & (forced | (s_row == succ))
        viol_col = 1.0 - jnp.transpose(match.astype(jnp.float32))  # (T, 1)
        cum_viol = jax.lax.dot_general(
            tri, viol_col,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, 1): violations among lanes strictly before t
        ok_col = (cum_viol < 0.5).astype(jnp.float32)
        # n_emit = 1 + leading matches (row t's sample is emitted iff all
        # matches before it held; row 0 always is, so n_emit spans [1, T]).
        n_emit_vec = jnp.sum(ok_col).astype(jnp.int32)
        n_emit_vec = jnp.minimum(jnp.maximum(n_emit_vec, 1), T)

        # --- Emit: scatter samples to their output slots ------------------
        # Sample t follows position p0 + t -> output slot p0 + t - (plen-1).
        emit_sel = (
            (out_rows8 == p0 + out_cols8 - (plen - 1))
            & (out_cols8 < n_emit_vec)
        ).astype(jnp.float32)  # (length, T)
        contrib = jax.lax.dot_general(
            emit_sel, s_col.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (length, 1)
        hit_out = jnp.sum(emit_sel, axis=1, keepdims=True) > 0.5
        tokens_ref[:] = jnp.where(
            hit_out, contrib.astype(jnp.int32), tokens_ref[:]
        )

        # The next block's input token is the LAST emitted sample; its
        # position p0 + n_emit holds a rejected draft (or nothing) — write
        # the truth there. Prompt positions already hold the truth.
        last_emit = jnp.sum(
            jnp.where(lane_t == n_emit_vec - 1, s_row, 0)
        ).astype(jnp.int32)
        ids_now = ids_buf[0:1, :]
        next_pos_mask = (ids_cols == p0 + n_emit_vec) & (
            p0 + n_emit_vec >= plen
        )
        ids_buf[0:1, :] = jnp.where(next_pos_mask, last_emit, ids_now)

        scalar_scratch[3] = n_emit_vec
        n_emit = scalar_scratch[3]
        return (
            p0 + n_emit,
            blocks + 1,
            gen_blocks + jnp.where(p0 >= plen - 1, 1, 0),
        )

    def cond(carry):
        p0, _, _ = carry
        return p0 < plen - 1 + length

    p0, blocks, gen_blocks = jax.lax.while_loop(
        cond, block_step, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    )
    stats_ref[0] = blocks
    stats_ref[1] = gen_blocks
    stats_ref[2] = p0


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "length", "cache_len", "block", "interpret", "greedy",
        "use_k", "use_p",
    ),
)
def _spec_decode_impl(
    packed, prompt_row, plen, seed, temperature, top_k, top_p,
    *, config, length: int, cache_len: int, block: int, interpret: bool,
    greedy: bool, use_k: bool, use_p: bool,
):
    E = config.embed_dim
    vocab_pad = packed["wte"].shape[0]
    use_rel = config.use_relative_attention
    T = block
    # Internal cache headroom: the last block may probe up to T - 1
    # positions past the final emitted one.
    C = _round_up(cache_len + T, 128)
    W = prompt_row.shape[1]

    if use_rel:
        lead = _round_up(C + T, 128)
        rel_pad = jnp.pad(packed["rel_rows"], ((0, 0), (lead, C + 256), (0, 0)))
    else:
        rel_pad = packed["rel_rows"]

    mask = jnp.where(
        jnp.arange(vocab_pad)[None, :] < config.vocab_size, 0.0, NEG_INF
    )
    logits_b = packed["logits_b"].astype(jnp.float32) + mask

    kernel = functools.partial(
        _spec_decode_kernel,
        num_layers=config.num_layers,
        num_heads=config.num_heads,
        head_dim=config.head_dim,
        embed_dim=E,
        cache_len=C,
        window=config.window_size,
        vocab_pad=vocab_pad,
        vocab_size=config.vocab_size,
        length=length,
        block=T,
        ln_eps=config.layer_norm_epsilon,
        scale_attention=config.scale_attention,
        greedy=greedy,
        use_rel=use_rel,
        use_k=use_k,
        use_p=use_p,
    )

    topk_f = jnp.reshape(jnp.asarray(top_k, jnp.float32), (-1,))
    topk_f = jnp.where(topk_f > 0, topk_f, float(vocab_pad + 1))
    topp_f = jnp.reshape(jnp.asarray(top_p, jnp.float32), (-1,))
    topp_f = jnp.where((topp_f > 0) & (topp_f < 1), topp_f, 2.0)

    scalars = (
        jnp.asarray([plen], jnp.int32),
        jnp.asarray([seed], jnp.int32),
        jnp.reshape(jnp.asarray(temperature, jnp.float32), (-1,)),
        topk_f,
        topp_f,
    )
    tensor_inputs = (
        prompt_row,
        packed["wte"], packed["wte_t"], packed["wpe"],
        packed["ln1"], packed["qkv_w"], packed["qkv_b"],
        packed["proj_w"], packed["proj_b"],
        packed["fc_w"], packed["fc_b"],
        packed["fp_w"], packed["fp_b"],
        logits_b, rel_pad,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tensor_inputs),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((config.num_layers, C, E), packed["qkv_w"].dtype),
            pltpu.VMEM((config.num_layers, C, E), packed["qkv_w"].dtype),
            pltpu.VMEM((1, W), jnp.int32),
            pltpu.SMEM((8,), jnp.int32),
        ],
    )

    tokens, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((length, 1), jnp.int32),
            jax.ShapeDtypeStruct((8,), jnp.int32),
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalars, *tensor_inputs)

    # ONE output array: fetching tokens and stats separately costs two
    # host round-trips (~25 ms each on the remote tunnel) per generate
    # call; the caller splits the concatenated vector after one fetch.
    return jnp.concatenate([tokens[:, 0], stats])


def speculative_generate(
    packed, prompt, seed, temperature,
    *, config, length: int, cache_len: int, block: int = None,
    interpret: bool = False, top_k=0, top_p=0.0, greedy=None, use_k=None,
    use_p=None,
):
    """Single-sequence speculative generation: one device program end to end.

    prompt: int array (P,). Returns ``(tokens, stats)`` where tokens is the
    (length,) sampled continuation and stats is an (8,) int32 vector:
    ``[total_blocks, generation_blocks, final_position, 0...]`` — mean
    accepted tokens per generation block = length / generation_blocks.

    Greedy output (``temperature <= 0``) is bit-identical to
    :func:`~composer_tpu.ops.decode_kernel.megakernel_generate`; sampled
    output is distributed identically but draws a different stream (the
    block sampler consumes T gumbel rows per verified block).
    """
    import numpy as np

    prompt = np.asarray(prompt, np.int32).reshape(-1)
    plen = prompt.shape[0]
    if plen + length > cache_len:
        raise ValueError(
            f"prompt ({plen}) + length ({length}) exceeds cache ({cache_len})"
        )
    greedy, use_k, use_p = sampling_flags(
        temperature, top_k, top_p, greedy, use_k, use_p
    )
    if block is None:
        block = default_block(greedy)
    if block < 2 or block > 16:
        raise ValueError(f"speculative block must be in [2, 16], got {block}")
    C = _round_up(cache_len + block, 128)
    row = np.zeros((1, C), np.int32)
    row[0, :plen] = prompt
    packed_out = _spec_decode_impl(
        packed, jnp.asarray(row), plen, seed, temperature, top_k, top_p,
        config=config, length=length, cache_len=cache_len, block=block,
        interpret=interpret, greedy=greedy, use_k=use_k, use_p=use_p,
    )
    # One device array, one host fetch: tokens then the 8-int stats vector.
    host = np.asarray(packed_out)
    return host[:length], host[length:]
