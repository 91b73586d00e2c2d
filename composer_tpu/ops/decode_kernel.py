"""Single-kernel autoregressive decoding: the whole token loop in one Pallas call.

Why: the XLA scan decode dispatches ~100 small kernels per token and re-reads
every weight from HBM every step (~165us/token for the default model). On
this TPU the *entire* default Transformer (13 MB bf16) and its KV cache fit
in VMEM at once, so this kernel loads weights exactly once and then runs the
complete generation loop — embedding, 8 decoder layers, logits, Gumbel
sampling, token feedback — with zero HBM traffic per step.

Layout choices (all static shapes):

* weights are stacked per-layer: e.g. qkv kernels as one (L, E, 3E) ref,
  indexed with static python layer indices (the layer loop is unrolled);
* the KV cache is (L, C, E) with lane = head * head_dim + depth; appending a
  token's k/v is a masked write into the 128-aligned slab holding the
  position (arbitrary dynamic sublane stores are not lowerable);
* per-head attention avoids any transpose/gather:
    qb   = broadcast(q) * rowmask          (H, E)   rowmask[h, c] = c//D == h
    S    = qb . K^T                        (H, C)   one MXU op, lane softmax
    M    = softmax(S) . V                  (H, E)   one MXU op
    out  = sum(M * rowmask, axis=0)        (1, E)
* the token feeds back through one SMEM scalar slot (vector-derived scalars
  poison matmul layouts unless routed through SMEM; a loop-carried one-hot
  vector was measured ~9 us/step slower than this hop);
* the relative bias never materializes a per-distance cache table: each
  layer computes the band ``qb @ E_pad^T`` (one MXU op against the weight
  table padded with C zero rows) and aligns it to cache slots with ONE
  dynamic lane roll — slot j needs distance (position - j) = E row
  (window-1-position+j), a contiguous cache_len-wide run; the matmul reads
  only the 128-aligned (cache_len+128)-row superset of that run and a roll
  fixes the sub-tile offset; out-of-table distances land in the zero
  padding. (Earlier designs: a (L*C, E) f32 rolling table rotated 9.4 MB
  every step, then a full-table-width band matmul — both measured slower.)
* LayerNorm scale/bias for ln_2 and ln_f are folded into the adjacent
  matmul weights at pack time (gamma scales the kernel rows, beta becomes
  part of the bias), so the kernel only standardizes. ln_1 is NOT foldable:
  the reference's residual quirk adds attention onto the ln_1 *output*
  (transformer.py:574-597), so x1 is needed as a value.
* sampling uses the on-core PRNG (pltpu.prng_random_bits) with the Gumbel
  trick; temperature <= 0 falls back to plain argmax.

This module is the batch=1 (latency-critical) path; small batches use the
sibling ops/decode_kernel_batched.py, large batches the XLA scan where
weight reads amortize.

Numerics note: matmuls run on the MXU in bf16 with f32 accumulation, layer
norms / softmax in f32 — matching the XLA bf16 decode path closely but not
bit-exactly; under float32 params both paths produce identical greedy tokens
(pinned by tests).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# KV-append slab granularity (rows). The append is a masked read-modify-write
# of the aligned slab holding `position`; Mosaic can address dynamic sublane
# offsets at tile granularity, so smaller slabs cut the per-step VMEM traffic
# proportionally (a 16-row bf16 slab is one tile). Measured on v5e-1 at
# batch 8 x 1014: 16-row slabs 107.0k events/s vs 94.9k with 128-row slabs
# (+13% — the eight per-sequence 128-row RMWs per layer were ~10 us/step of
# pure VMEM traffic). Overridable for A/B runs.
KV_SLAB = int(os.environ.get("COMPOSER_DECODE_SLAB", "16"))


def _round_up(value: int, multiple: int) -> int:
    return (value + multiple - 1) // multiple * multiple



def _layernorm(x, scale, bias, eps):
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return centered * jax.lax.rsqrt(var + eps) * scale + bias


def _standardize(x, eps):
    # LayerNorm with scale/bias folded into the following matmul (pack time).
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    centered = x - mean
    var = jnp.mean(centered * centered, axis=-1, keepdims=True)
    return centered * jax.lax.rsqrt(var + eps)


def _gelu_tanh(x):
    # tanh-approximate GELU (reference transformer.py:35-40).
    return 0.5 * x * (1.0 + jnp.tanh(0.7978845608028654 * (x + 0.044715 * x * x * x)))


def _matmul(x, w):
    # Operands in the weight dtype (bf16 serving / f32 parity testing), f32
    # accumulation. Mixed-dtype operands are not lowerable.
    return jax.lax.dot_general(
        x.astype(w.dtype), w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _threshold_rows(value, n: int):
    """Normalizes a filter threshold to (enabled, per-row list of scalars).

    ``value`` may be: None / a non-positive Python number (disabled), a
    positive Python number (same threshold every row), a traced scalar
    (same traced threshold every row), or a sequence of n per-row scalars
    (mixed batches; disabled rows carry an always-true sentinel — see
    the megakernel entry points). Enabled/disabled is STATIC: it decides
    whether the comparison column exists in the kernel at all.
    """
    if value is None:
        return False, None
    if isinstance(value, (int, float)):
        if value <= 0:
            return False, None
        return True, [float(value)] * n
    if isinstance(value, (list, tuple)):
        if len(value) != n:
            raise ValueError(f"expected {n} per-row thresholds, got {len(value)}")
        return True, list(value)
    return True, [value] * n  # a single traced scalar


def _filtered_scaled_logits(scaled, top_k, top_p, weight_dtype=None):
    """Top-k / nucleus filtering on temperature-scaled logits, in-kernel.

    scaled: (N, Vpad) f32 rows; padding lanes already at ~NEG_INF.
    ``top_k`` / ``top_p`` accept anything :func:`_threshold_rows` does —
    static numbers, traced scalars, or per-row sequences (0/None = off).
    Threshold semantics match ops/sampling.py::sample_filtered — ties at
    the k-th value / nucleus boundary are kept:

        survives top-k  iff  #{j: x_j > x_i} < k
        survives top-p  iff  sum_{j: x_j > x_i} softmax(x)_j < p

    Both counts come from ONE (Vpad, Vpad) strict-comparison matrix per row,
    contracted against [ones | probs] columns in a single standard-form f32
    MXU dot — ranks and nucleus masses are exact vs the XLA filter.
    Row<->column moves are jnp.transpose (lowers exactly in compiled
    Mosaic); dots stay in the ((1,), (0,)) orientation only — the
    transposed-contraction forms miscompile (an identity-matmul transpose
    via dims ((1,), (1,)) produced silently off-by-one ranks compiled, and
    bf16 operands in those forms fail Mosaic verification).

    Cost: N (Vpad, Vpad) compares + N (Vpad, Vpad)x(Vpad, 2) dots per
    decode step — the XLA-scan fallback this replaces costs ~10x the whole
    fused step at batch 8.
    """
    del weight_dtype  # f32 throughout; see docstring
    n, vpad = scaled.shape
    use_k, k_rows = _threshold_rows(top_k, n)
    use_p, p_rows = _threshold_rows(top_p, n)
    x_cols = jnp.transpose(scaled)  # (Vpad, N)

    ncols = (1 if use_k else 0) + (1 if use_p else 0)
    ones_col = jnp.ones((vpad, 1), jnp.float32)
    if use_p:
        m = jnp.max(scaled, axis=1, keepdims=True)
        e = jnp.exp(scaled - m)
        probs = e / jnp.sum(e, axis=1, keepdims=True)  # (N, Vpad) f32
        probs_cols = jnp.transpose(probs)  # (Vpad, N)

    keep_cols = []
    for s in range(n):
        # cmp[i, j] = [x_j > x_i]  (candidate i on sublanes, others on lanes).
        cmp = (scaled[s : s + 1] > x_cols[:, s : s + 1]).astype(jnp.float32)
        cols = (
            [ones_col] if use_k else []
        ) + ([probs_cols[:, s : s + 1]] if use_p else [])
        counts = jax.lax.dot_general(
            cmp, cols[0] if ncols == 1 else jnp.concatenate(cols, axis=1),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Vpad, ncols): strict rank and/or strict mass-before
        keep = jnp.ones((vpad, 1), jnp.float32)
        col = 0
        if use_k:
            keep = keep * (counts[:, col : col + 1] < k_rows[s]).astype(
                jnp.float32
            )
            col += 1
        if use_p:
            keep = keep * (counts[:, col : col + 1] < p_rows[s]).astype(
                jnp.float32
            )
        keep_cols.append(keep)

    keep_mat = keep_cols[0] if n == 1 else jnp.concatenate(keep_cols, axis=1)
    keep_rows = jnp.transpose(keep_mat)  # (N, Vpad)
    return jnp.where(keep_rows > 0.5, scaled, NEG_INF)


def _decode_kernel(
    # scalar prefetch (SMEM)
    start_pos_ref, prompt_ref, seed_ref, temp_ref, topk_ref, topp_ref,
    # tensor inputs (VMEM)
    wte_ref, wte_t_ref, wpe_ref,
    ln1_ref, qkv_w_ref, qkv_b_ref, proj_w_ref, proj_b_ref,
    fc_w_ref, fc_b_ref, fp_w_ref, fp_b_ref,
    logits_b_ref, rel_pad_ref, kcache_ref, vcache_ref,
    # outputs
    tokens_ref,
    # scratch
    kbuf, vbuf, token_scratch,
    *, num_layers: int, num_heads: int, head_dim: int, embed_dim: int,
    cache_len: int, window: int, vocab_pad: int, vocab_size: int,
    num_steps: int, ln_eps: float, scale_attention: bool, greedy: bool,
    use_rel: bool, has_prefill: bool, use_k: bool = False, use_p: bool = False,
):
    prompt_len = prompt_ref.shape[0]
    out_len = num_steps - prompt_len + 1

    if not greedy:
        pltpu.prng_seed(seed_ref[0])

    for layer in range(num_layers):
        if has_prefill:
            # One-time VMEM copy of the externally prefilled cache.
            kbuf[layer] = kcache_ref[layer]
            vbuf[layer] = vcache_ref[layer]
        else:
            # Must zero: masked softmax weights are exactly 0 for future
            # slots, but 0 * NaN (stale scratch) would still poison the
            # value contraction.
            kbuf[layer] = jnp.zeros_like(kbuf[layer])
            vbuf[layer] = jnp.zeros_like(vbuf[layer])

    # Constant masks.
    lane_group = jax.lax.broadcasted_iota(jnp.int32, (num_heads, embed_dim), 1) // head_dim
    head_index = jax.lax.broadcasted_iota(jnp.int32, (num_heads, embed_dim), 0)
    rowmask = (lane_group == head_index).astype(jnp.float32)  # (H, E)
    slab_rows = jax.lax.broadcasted_iota(jnp.int32, (KV_SLAB, embed_dim), 0)
    step_rows = jax.lax.broadcasted_iota(jnp.int32, (out_len, 1), 0)

    # Activations stay replicated over R = num_heads sublane rows: Mosaic
    # rejects 1-sublane bf16 matmul operands, a 16-row operand is exactly one
    # bf16 tile (and costs the MXU nothing extra), and the replicated rows
    # double as the per-head query rows for the block-diagonal scores matmul.
    R = num_heads

    softmax_scale = float(head_dim) ** -0.5 if scale_attention else 1.0
    temperature = temp_ref[0]
    start_pos = start_pos_ref[0]

    vocab_cols_r = jax.lax.broadcasted_iota(jnp.int32, (R, vocab_pad), 1)
    wpe_cols = jax.lax.broadcasted_iota(jnp.int32, (1, window), 1)

    cache_cols = jax.lax.broadcasted_iota(jnp.int32, (num_heads, cache_len), 1)

    def step(i, _):
        # The token travels through SMEM scratch: an argmax-derived value
        # lives in vector registers and poisons downstream matmul layouts.
        # (A loop-carried replicated one-hot was measured ~9 us/step SLOWER
        # than this SMEM round trip on v5e — the scalar hop is cheap.)
        token = token_scratch[0]
        position = start_pos + i

        # Embedding rows via one-hot matmuls: a dynamically-gathered row has a
        # layout Mosaic's matmul cannot consume, a one-hot contraction is one
        # clean MXU op.
        tok_onehot = (vocab_cols_r == token).astype(wte_ref.dtype)
        tok_embed = jax.lax.dot_general(
            tok_onehot, wte_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (R, E)
        pos_index = jnp.minimum(position, window - 1)
        pos_onehot = (wpe_cols == pos_index).astype(wpe_ref.dtype)
        pos_embed = jax.lax.dot_general(
            pos_onehot, wpe_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, E)
        h = tok_embed + pos_embed  # (R, E) f32

        for layer in range(num_layers):
            x1 = _layernorm(
                h, ln1_ref[layer, 0:1, :], ln1_ref[layer, 1:2, :], ln_eps
            )

            qkv = _matmul(x1, qkv_w_ref[layer]) + qkv_b_ref[layer].astype(jnp.float32)
            q = qkv[:, :embed_dim]  # (R, E) replicated rows
            k = qkv[0:1, embed_dim : 2 * embed_dim]  # (1, E)
            v = qkv[0:1, 2 * embed_dim :]

            # Append this position's k/v. Mosaic cannot store a single row
            # at an arbitrary dynamic sublane offset, but it CAN address a
            # tile-aligned slab — mask-write only the slab holding
            # `position` (KV_SLAB rows).
            slab = pl.multiple_of((position // KV_SLAB) * KV_SLAB, KV_SLAB)
            row_hit = slab_rows == (position - slab)
            k_slab = kbuf[layer, pl.ds(slab, KV_SLAB), :]
            kbuf[layer, pl.ds(slab, KV_SLAB), :] = jnp.where(
                row_hit, jnp.broadcast_to(k, (KV_SLAB, embed_dim)), k_slab
            ).astype(kbuf.dtype)
            v_slab = vbuf[layer, pl.ds(slab, KV_SLAB), :]
            vbuf[layer, pl.ds(slab, KV_SLAB), :] = jnp.where(
                row_hit, jnp.broadcast_to(v, (KV_SLAB, embed_dim)), v_slab
            ).astype(vbuf.dtype)

            # Scores: S[h, j] = q_h . k_j via one block-diagonal matmul — the
            # replicated q rows masked per head (contraction over lanes).
            qb_f32 = q * rowmask  # (H, E) f32
            qb = qb_f32.astype(kbuf.dtype)
            scores = jax.lax.dot_general(
                qb, kbuf[layer],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H, C)

            if use_rel:
                # Music-Transformer relative bias, shear-free: cache slot j
                # needs E row (window-1-position+j) of the skew-layout table —
                # a contiguous cache_len-wide run. Contract against only the
                # 128-aligned superset of that run ((C+128) rows instead of
                # all W+C — the band matmul is the dominant rel cost), then
                # ONE dynamic roll fixes the sub-tile offset. The C zero-pad
                # rows absorb distances beyond the table (reference order:
                # bias added before scaling, transformer.py:341-348).
                # Leading zero rows keep the slice start positive when the
                # query position exceeds the window (cache_len > window):
                # distances beyond the table then read zeros, matching the
                # old full-table roll's wraparound semantics.
                lead = _round_up(cache_len, 128)
                start = lead + window - 1 - position
                aligned = pl.multiple_of((start // 128) * 128, 128)
                band = jax.lax.dot_general(
                    qb, rel_pad_ref[layer, pl.ds(aligned, cache_len + 128), :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (H, C + 128); lane m holds padded-E row (aligned + m)
                delta = start - aligned  # in [0, 128)
                rolled = pltpu.roll(band, cache_len + 128 - delta, axis=1)
                scores = scores + rolled[:, :cache_len]

            scores = scores * softmax_scale
            scores = jnp.where(cache_cols <= position, scores, NEG_INF)

            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            w = p / jnp.sum(p, axis=1, keepdims=True)  # (H, C)

            mixed = jax.lax.dot_general(
                w.astype(vbuf.dtype), vbuf[layer],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (H, E)
            attn = jnp.sum(mixed * rowmask, axis=0, keepdims=True)  # (1, E)

            attn = _matmul(
                jnp.broadcast_to(attn, (R, embed_dim)), proj_w_ref[layer]
            ) + proj_b_ref[layer].astype(jnp.float32)
            x2 = x1 + attn

            # ln_2's scale/bias live inside fc_w/fc_b (pack-time fold).
            mm = _standardize(x2, ln_eps)
            hidden = _gelu_tanh(
                _matmul(mm, fc_w_ref[layer]) + fc_b_ref[layer].astype(jnp.float32)
            )
            h = x2 + _matmul(hidden, fp_w_ref[layer]) + fp_b_ref[layer].astype(jnp.float32)

        # ln_f's scale lives inside wte_t; its bias (and the vocab-pad mask)
        # arrive pre-combined as logits_b.
        hf = _standardize(h, ln_eps)
        logits = _matmul(hf, wte_t_ref[...])[0:1] + logits_b_ref[...]  # (1, Vpad)

        if greedy:
            # Filters leave the argmax in place (the top-1 token always
            # survives top-k and top-p), so applying them here is a no-op
            # semantically — but it lets interpret-mode tests cover the
            # in-kernel filter wiring (the PRNG ops of the sampled branch
            # don't exist in interpret mode).
            scored = logits
            if use_k or use_p:
                scored = _filtered_scaled_logits(
                    scored,
                    topk_ref[0] if use_k else None,
                    topp_ref[0] if use_p else None,
                    wte_ref.dtype,
                )
        else:
            scaled = logits / temperature
            if use_k or use_p:
                scaled = _filtered_scaled_logits(
                    scaled,
                    topk_ref[0] if use_k else None,
                    topp_ref[0] if use_p else None,
                    wte_ref.dtype,
                )
            # Gumbel-max sampling.
            bits = pltpu.prng_random_bits((1, vocab_pad))
            # uint32 -> f32 isn't lowerable; shift to 23 bits (sign-safe) and
            # go through int32.
            mantissa = pltpu.bitcast(pltpu.bitcast(bits, jnp.uint32) >> 9, jnp.int32)
            uniform = mantissa.astype(jnp.float32) * (1.0 / (1 << 23)) + 1e-12
            gumbel = -jnp.log(-jnp.log(uniform))
            scored = scaled + gumbel

        next_token = jnp.argmax(scored, axis=1)[0].astype(jnp.int32)
        # Iterations 0..prompt_len-2 are teacher-forced prompt consumption;
        # the sample at iteration prompt_len-1+k lands in output slot k.
        tokens_ref[:] = jnp.where(
            step_rows == i - (prompt_len - 1), next_token, tokens_ref[:]
        )
        token_scratch[0] = jnp.where(
            i + 1 < prompt_len,
            prompt_ref[jnp.minimum(i + 1, prompt_len - 1)],
            next_token,
        )
        return 0

    token_scratch[0] = prompt_ref[0]
    jax.lax.fori_loop(0, num_steps, step, 0, unroll=False)


def _stack(arrs, dtype):
    return jnp.stack([jnp.asarray(a, dtype) for a in arrs])


def pack_weights(params, config, dtype=jnp.bfloat16):
    """Flax param tree -> the stacked tensors the kernel consumes.

    ln_2 and ln_f are folded away here: for y = LN(x) @ W + b with
    LN(x) = std(x) * gamma + beta, the kernel computes std(x) @ W' + b' with
    W' = diag(gamma) @ W and b' = beta @ W + b.
    """
    E = config.embed_dim
    vocab_pad = _round_up(config.vocab_size, 256)

    wte = jnp.asarray(params["wte"], dtype)
    wte_pad = jnp.pad(wte, ((0, vocab_pad - wte.shape[0]), (0, 0)))
    wpe = jnp.asarray(params["wpe"], dtype)

    layers = [params[f"h_{i + 1}"] for i in range(config.num_layers)]

    def ln_pair(block, name):
        return jnp.stack(
            [jnp.asarray(block[name]["scale"], jnp.float32),
             jnp.asarray(block[name]["bias"], jnp.float32)]
        )

    def folded_fc(block):
        gamma = jnp.asarray(block["ln_2"]["scale"], jnp.float32)
        beta = jnp.asarray(block["ln_2"]["bias"], jnp.float32)
        kernel = jnp.asarray(block["mlp"]["c_fc"]["kernel"], jnp.float32)
        bias = jnp.asarray(block["mlp"]["c_fc"]["bias"], jnp.float32)
        return (gamma[:, None] * kernel).astype(dtype), beta @ kernel + bias

    fc_folded = [folded_fc(b) for b in layers]

    gamma_f = jnp.asarray(params["ln_f"]["scale"], jnp.float32)
    beta_f = jnp.asarray(params["ln_f"]["bias"], jnp.float32)
    wte_t_f32 = jnp.pad(
        jnp.asarray(params["wte"], jnp.float32),
        ((0, vocab_pad - wte.shape[0]), (0, 0)),
    ).T
    wte_t_folded = (gamma_f[:, None] * wte_t_f32).astype(dtype)
    logits_bias = (beta_f @ wte_t_f32)[None, :]  # (1, Vpad) f32

    packed = {
        "wte": wte_pad,
        "wte_t": wte_t_folded,  # (E, Vpad), ln_f scale folded in
        "wpe": wpe,
        "ln1": jnp.stack([ln_pair(b, "ln_1") for b in layers]),  # (L, 2, E)
        "qkv_w": _stack([b["attn"]["c_attn"]["kernel"] for b in layers], dtype),
        "qkv_b": _stack([b["attn"]["c_attn"]["bias"] for b in layers], jnp.float32)[:, None, :],
        "proj_w": _stack([b["attn"]["c_proj"]["kernel"] for b in layers], dtype),
        "proj_b": _stack([b["attn"]["c_proj"]["bias"] for b in layers], jnp.float32)[:, None, :],
        "fc_w": jnp.stack([k for k, _ in fc_folded]),
        "fc_b": jnp.stack([b for _, b in fc_folded])[:, None, :],
        "fp_w": _stack([b["mlp"]["c_proj"]["kernel"] for b in layers], dtype),
        "fp_b": _stack([b["mlp"]["c_proj"]["bias"] for b in layers], jnp.float32)[:, None, :],
        "logits_b": logits_bias,
    }

    if config.use_relative_attention:
        # Relative embeddings in cache-row layout: rel_rows[l, r, h*D+d] =
        # E[h, r, d], so the per-head relative logits use the SAME
        # block-diagonal contraction as the k-cache scores.
        rel = _stack(
            [b["attn"]["rel_embedding"] for b in layers], dtype
        )  # (L, H, W, D)
        packed["rel_rows"] = rel.transpose(0, 2, 1, 3).reshape(
            config.num_layers, config.window_size, E
        )
    else:
        packed["rel_rows"] = jnp.zeros((config.num_layers, 8, E), dtype)
    return packed


def cache_to_rows_batched(cache, config, cache_len: int, dtype=jnp.bfloat16):
    """(B, H, S, D) layer caches -> (L, B*cache_len, H*D) sublane-stacked
    rows — the batched kernel's slab layout (sequence s's cache slot c at
    row s*cache_len + c). Rows beyond the prefilled range are zeros.

    Jitted by the caller (one fused transpose/pad program per shape): this
    is the XLA-prefill -> fused-kernel handoff for long prompts.
    """
    k_layers, v_layers = [], []
    for layer in cache["layers"]:
        rows = []
        for name in ("k", "v"):
            buf = jnp.asarray(layer[name], dtype)  # (B, H, S, D)
            buf = buf.transpose(0, 2, 1, 3)  # (B, S, H, D)
            batch, s_len = buf.shape[0], buf.shape[1]
            buf = buf.reshape(batch, s_len, -1)  # (B, S, E)
            if s_len < cache_len:
                buf = jnp.pad(buf, ((0, 0), (0, cache_len - s_len), (0, 0)))
            rows.append(buf[:, :cache_len].reshape(batch * cache_len, -1))
        k_layers.append(rows[0])
        v_layers.append(rows[1])
    return jnp.stack(k_layers), jnp.stack(v_layers)


def cache_to_rows(cache, config, cache_len: int, dtype=jnp.bfloat16):
    """(B=1, H, C, D) layer caches -> (L, Cpad, H*D) row-major layout."""
    rows = []
    for layer in cache["layers"]:
        for name in ("k", "v"):
            buf = jnp.asarray(layer[name], dtype)[0]  # (H, C, D)
            buf = buf.transpose(1, 0, 2).reshape(buf.shape[1], -1)  # (C, E)
            if buf.shape[0] < cache_len:
                buf = jnp.pad(buf, ((0, cache_len - buf.shape[0]), (0, 0)))
            rows.append(buf[:cache_len])
    k_rows = jnp.stack(rows[0::2])
    v_rows = jnp.stack(rows[1::2])
    return k_rows, v_rows


@functools.partial(
    jax.jit,
    static_argnames=(
        "config", "num_steps", "cache_len", "interpret", "greedy", "has_prefill",
        "use_k", "use_p",
    ),
)
def _megakernel_decode_impl(
    packed, k_rows, v_rows, start_pos, prompt, seed, temperature, top_k, top_p,
    *, config, num_steps: int, cache_len: int, interpret: bool, greedy: bool,
    has_prefill: bool, use_k: bool = False, use_p: bool = False,
):
    E = config.embed_dim
    vocab_pad = packed["wte"].shape[0]
    use_rel = config.use_relative_attention
    out_len = num_steps - prompt.shape[0] + 1

    if use_rel:
        # Leading zero rows cover positions past the window (negative slice
        # starts wrap into zeros = no bias, the old roll semantics); trailing
        # zero rows absorb future-slot distances and keep the 128-aligned
        # (cache_len+128) band slice in bounds.
        lead = _round_up(cache_len, 128)
        rel_pad = jnp.pad(
            packed["rel_rows"], ((0, 0), (lead, cache_len + 128), (0, 0))
        )
    else:
        rel_pad = packed["rel_rows"]  # small dummy

    # Fold the vocab-padding mask into the (ln_f-derived) logits bias.
    mask = jnp.where(
        jnp.arange(vocab_pad)[None, :] < config.vocab_size, 0.0, NEG_INF
    )
    logits_b = packed["logits_b"].astype(jnp.float32) + mask

    kernel = functools.partial(
        _decode_kernel,
        greedy=greedy,
        use_rel=use_rel,
        has_prefill=has_prefill,
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
        use_k=use_k,
        use_p=use_p,
    )

    # Disabled rows ride always-true sentinels (rank < Vpad+1, strict
    # mass-before < 2), so enabling a filter column for the batch never
    # changes a row that asked for no filtering.
    topk_f = jnp.reshape(jnp.asarray(top_k, jnp.float32), (-1,))
    topk_f = jnp.where(topk_f > 0, topk_f, float(vocab_pad + 1))
    topp_f = jnp.reshape(jnp.asarray(top_p, jnp.float32), (-1,))
    topp_f = jnp.where((topp_f > 0) & (topp_f < 1), topp_f, 2.0)

    scalars = (
        jnp.asarray([start_pos], jnp.int32),
        jnp.asarray(prompt, jnp.int32),
        jnp.asarray([seed], jnp.int32),
        jnp.reshape(jnp.asarray(temperature, jnp.float32), (-1,)),
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
        k_rows, v_rows,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(tensor_inputs),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((config.num_layers, cache_len, E), k_rows.dtype),
            pltpu.VMEM((config.num_layers, cache_len, E), v_rows.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )

    tokens = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_len, 1), jnp.int32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*scalars, *tensor_inputs)

    return tokens[:, 0]


def sampling_flags(temperature, top_k, top_p, greedy=None, use_k=None,
                   use_p=None):
    """Static kernel-structure flags from concrete sampling values.

    ``greedy`` removes the PRNG ops (the CPU interpreter cannot execute
    them); ``use_k``/``use_p`` decide whether the filter comparison columns
    exist at all. Callers holding only TRACED values (e.g. inside an outer
    jit) must pass all three explicitly — deriving them needs concrete
    numbers.
    """
    import numpy as np

    if greedy is None:
        greedy = bool(np.all(np.asarray(temperature) <= 0))
    if use_k is None:
        use_k = bool(np.any(np.asarray(top_k) > 0))
    if use_p is None:
        p = np.asarray(top_p, np.float64)
        use_p = bool(np.any((p > 0) & (p < 1)))
    return greedy, use_k, use_p


def megakernel_decode(
    packed, k_rows, v_rows, start_pos, token0, seed, temperature,
    *, config, num_steps: int, cache_len: int, interpret: bool = False,
    top_k=0, top_p=0.0, greedy=None, use_k=None, use_p=None,
):
    """Runs ``num_steps`` of single-token decoding entirely in one kernel.

    Returns the sampled tokens, shape (num_steps,) int32. ``temperature <= 0``
    selects greedy argmax decoding (and statically removes the PRNG ops,
    which the CPU interpreter cannot execute). Sampling params are dynamic
    operands — changing a value between calls does not recompile; pass the
    structure flags explicitly when calling with traced values.
    """
    greedy, use_k, use_p = sampling_flags(
        temperature, top_k, top_p, greedy, use_k, use_p
    )
    return _megakernel_decode_impl(
        packed, k_rows, v_rows, start_pos,
        jnp.reshape(jnp.asarray(token0, jnp.int32), (1,)), seed, temperature,
        top_k, top_p,
        config=config, num_steps=num_steps, cache_len=cache_len,
        interpret=interpret, greedy=greedy, has_prefill=True,
        use_k=use_k, use_p=use_p,
    )


def megakernel_generate(
    packed, prompt, seed, temperature,
    *, config, length: int, cache_len: int, interpret: bool = False,
    top_k=0, top_p=0.0, greedy=None, use_k=None, use_p=None,
):
    """Full single-kernel generation: the prompt is consumed token-by-token
    (teacher-forced) inside the kernel, so there is no external prefill, no
    cache transform — one device program end to end.

    prompt: int array (P,). Returns (length,) sampled tokens.
    """
    prompt = jnp.asarray(prompt, jnp.int32).reshape(-1)
    if prompt.shape[0] + length > cache_len:
        raise ValueError(
            f"prompt ({prompt.shape[0]}) + length ({length}) exceeds cache "
            f"({cache_len})"
        )
    E = config.embed_dim
    dummy = jnp.zeros((config.num_layers, 128, E), packed["wte"].dtype)
    greedy, use_k, use_p = sampling_flags(
        temperature, top_k, top_p, greedy, use_k, use_p
    )
    return _megakernel_decode_impl(
        packed, dummy, dummy, 0, prompt, seed, temperature, top_k, top_p,
        config=config, num_steps=prompt.shape[0] + length - 1,
        cache_len=cache_len, interpret=interpret, greedy=greedy,
        has_prefill=False, use_k=use_k, use_p=use_p,
    )
