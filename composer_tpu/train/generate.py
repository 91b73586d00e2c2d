"""Autoregressive generation as a single on-device ``lax.scan``.

The reference's decode loop ran one eager model call per token from Python,
discarded the KV cache, and fed back a single-token context
(cli.py:663-676 — SURVEY.md §3.2 flags this as the primary benchmark
surface). Here the whole generation — prefill, per-token forward through a
preallocated HBM KV cache, temperature sampling — is one jitted function;
host<->device traffic is prompt-in / tokens-out.

Positions past ``window_size`` clamp to the last learned position embedding
(the reference would have indexed out of range; it never reached this because
it never threaded the cache).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.models import ModelType
from composer_tpu.models.music_rnn import init_state as rnn_init_state
from composer_tpu.models.transformer import init_cache
from composer_tpu.ops.sampling import sample_filtered_rows


@partial(jax.jit, static_argnames=("model", "steps"))
def _decode_segment(model, params, cache, token, rng, steps: int, temperature,
                    top_k, top_p):
    """Runs ``steps`` scan iterations against a fixed-size cache.

    Sampling params are traced per-row [B] vectors (serving coalesces
    mixed-setting requests into one batch), so changing a temperature or
    filter between calls does not recompile."""

    def step(carry, _):
        cache, token, rng = carry
        logits, cache = model.apply({"params": params}, token[:, None], cache)
        rng, sample_rng = jax.random.split(rng)
        next_token = sample_filtered_rows(
            sample_rng, logits[:, 0], temperature, top_k, top_p
        )
        return (cache, next_token, rng), token

    (cache, token, rng), tokens = jax.lax.scan(
        step, (cache, token, rng), None, length=steps
    )
    return cache, token, rng, tokens.transpose(1, 0)


@partial(jax.jit, static_argnames=("new_len",))
def _grow_cache(cache, new_len: int):
    """Zero-pads the cache's sequence axis (the fill index is unchanged)."""

    def pad(buf):
        extra = new_len - buf.shape[2]
        return jnp.pad(buf, ((0, 0), (0, 0), (0, extra), (0, 0)))

    return {
        "index": cache["index"],
        "layers": [
            {"k": pad(layer["k"]), "v": pad(layer["v"])} for layer in cache["layers"]
        ],
    }


@partial(jax.jit, static_argnames=("model", "cache_len"))
def _prefill(model, params, prompt, rng, cache_len: int, temperature,
             top_k, top_p):
    cache = init_cache(model.config, prompt.shape[0], cache_len)
    logits, cache = model.apply({"params": params}, prompt, cache)
    token = sample_filtered_rows(rng, logits[:, -1], temperature, top_k, top_p)
    return cache, token


def _ragged_transformer_generate(
    model, params, prompt, plens, rng, length: int, cache_len: int,
    temperature, top_k, top_p,
):
    """Ragged-prompt decode on the XLA scan path (CPU/fallback twin of the
    batched kernel's per-row teacher-forcing).

    Prefills through the shortest prompt, then scans one token at a time:
    each row's next input is its own prompt token while the step is inside
    its prefix and its previous sample after. Row s's ``length`` generated
    ids are gathered from the per-step sample stack at offset
    plens[s] - min(plens).
    """
    batch, width = prompt.shape
    plens = np.asarray(plens, np.int32).reshape(-1)
    min_plen = int(plens.min())
    if min_plen < 1 or plens.max() > width:
        raise ValueError(
            f"prompt_lengths must lie in [1, {width}], got "
            f"[{plens.min()}, {plens.max()}]"
        )
    num_steps = width + length - 1

    rng, prefill_rng = jax.random.split(rng)
    cache, token = _prefill(
        model, params, prompt[:, :min_plen], prefill_rng, cache_len,
        temperature, top_k, top_p,
    )
    plens_col = jnp.asarray(plens)

    @partial(jax.jit, static_argnames=("steps", "start"))
    def ragged_scan(cache, token, rng, prompt, steps: int, start: int):
        def step(carry, offset):
            cache, token, rng = carry
            position = start + offset  # next input's position
            forced = prompt[jnp.arange(batch), jnp.minimum(position, width - 1)]
            token = jnp.where(position < plens_col, forced, token)
            logits, cache = model.apply({"params": params}, token[:, None], cache)
            rng, sample_rng = jax.random.split(rng)
            sampled = sample_filtered_rows(
                sample_rng, logits[:, 0], temperature, top_k, top_p
            )
            return (cache, sampled, rng), sampled

        (cache, token, rng), samples = jax.lax.scan(
            step, (cache, token, rng), jnp.arange(steps)
        )
        return cache, token, rng, samples.transpose(1, 0)

    steps = num_steps - min_plen
    _, _, _, samples = ragged_scan(cache, token, rng, prompt, steps, min_plen)
    # Sample t (prefill sample = t 0) follows position min_plen - 1 + t;
    # row s's generation starts at t = plens[s] - min_plen.
    stack = jnp.concatenate([token[:, None], samples], axis=1)
    gather = (plens_col - min_plen)[:, None] + jnp.arange(length)[None, :]
    return jnp.take_along_axis(stack, gather, axis=1)


def _transformer_generate(
    model, params, prompt, rng, length: int, cache_len: int, temperature,
    top_k, top_p,
):
    """KV-cached scan decode with staged cache growth.

    Decoding reads the whole (static-size) cache every step, so it is
    HBM-bound at large contexts; growing the cache through power-of-two
    stages (256, 512, ...) cuts the average read volume ~1.5x at 2048.
    """
    batch, prompt_len = prompt.shape
    if prompt_len + length > cache_len:
        # Without this the staged-growth loop below can never gain capacity
        # and spins forever (the fused-kernel path raises the same way).
        raise ValueError(
            f"prompt ({prompt_len}) + length ({length}) exceeds cache "
            f"({cache_len})"
        )

    stage = 256
    while stage < prompt_len + 1:
        stage *= 2
    stage = min(stage, cache_len)

    rng, sample_rng = jax.random.split(rng)
    cache, token = _prefill(
        model, params, prompt, sample_rng, stage, temperature, top_k, top_p
    )

    chunks = []
    position = prompt_len  # cache slot the next decode step writes
    remaining = length - 1
    while remaining > 0:
        capacity = stage - position
        if capacity <= 0:
            stage = min(max(stage * 2, 256), cache_len)
            cache = _grow_cache(cache, stage)
            continue
        steps = min(remaining, capacity)
        cache, token, rng, tokens = _decode_segment(
            model, params, cache, token, rng, steps, temperature, top_k, top_p
        )
        chunks.append(tokens)
        position += steps
        remaining -= steps

    chunks.append(token[:, None])
    return jnp.concatenate(chunks, axis=1)


@partial(jax.jit, static_argnames=("model", "length"))
def _rnn_generate(model, variables, prompt, rng, length: int, temperature,
                  top_k, top_p):
    batch = prompt.shape[0]
    state = rnn_init_state(model.config, batch)

    logits, state = model.apply(variables, prompt, state)
    rng, sample_rng = jax.random.split(rng)
    token = sample_filtered_rows(sample_rng, logits[:, -1], temperature, top_k, top_p)

    def step(carry, _):
        state, token, rng = carry
        logits, state = model.apply(variables, token[:, None], state)
        rng, sample_rng = jax.random.split(rng)
        next_token = sample_filtered_rows(
            sample_rng, logits[:, 0], temperature, top_k, top_p
        )
        return (state, next_token, rng), token

    (_, last, _), tokens = jax.lax.scan(
        step, (state, token, rng), None, length=length - 1
    )
    return jnp.concatenate([tokens.transpose(1, 0), last[:, None]], axis=1)


def _packed_weight_bytes(config) -> int:
    """VMEM footprint of the fused kernels' resident packed weights.

    The megakernels hold EVERY layer's weights in VMEM for the whole
    generation (that is where their throughput comes from), so the model
    size bounds which architectures they serve at all: per layer the bf16
    matmul weights are c_attn E x 3E + c_proj E x E + mlp E x 4E + 4E x E
    = 12 E^2 elements, plus the embedding tables. At the reference arch
    (E=256, L=8) this is ~14 MB; at E=1024 it is ~200 MB and the kernel
    cannot fit v5e's 128 MB VMEM — those models must take the XLA scan
    path (the 2026-08-19 embed-1024 flash validation run hit exactly this
    as a compile-time VMEM OOM before this gate accounted for weights).
    """
    e = config.embed_dim
    per_layer = 12 * e * e * 2  # bf16 matmuls
    per_layer += (3 * e + e + 4 * e + e) * 4  # f32 biases
    per_layer += 4 * e * 4  # ln_1/ln_2 scale+bias, f32
    vocab_pad = -(-getattr(config, "vocab_size", 512) // 256) * 256
    tables = 2 * vocab_pad * e * 2  # wte packed both directions, bf16
    tables += config.window_size * e * 2  # wpe, bf16
    tables += 2 * e * 4  # ln_f, f32
    return config.num_layers * per_layer + tables


def _kernel_vmem_fits(config, batch: int, cache_len: int) -> bool:
    # Resident VMEM = packed weights + KV scratch (L, B*C, E) bf16 x2
    # (+ a few MB of activation scratch); keep the sum within ~100MB of
    # the chip's ~128MB VMEM.
    kv_bytes = 2 * config.num_layers * batch * cache_len * config.embed_dim * 2
    return _packed_weight_bytes(config) + kv_bytes < 100 * 1024 * 1024


def _megakernel_chunk(config, batch: int, cache_len: int) -> int:
    """Largest per-dispatch sub-batch whose KV scratch fits VMEM (0 = none).

    Large batches are served as sequential fused-kernel dispatches of this
    size: each chunk's whole cache lives in VMEM (zero HBM traffic per step),
    which beats the XLA scan re-reading an HBM cache every step, and
    dispatches pipeline, so the link round-trip is paid ~once.
    """
    for candidate in (8, 4, 2, 1):
        if candidate <= batch and _kernel_vmem_fits(config, candidate, cache_len):
            return candidate
    return 0


def _padded_cache_len(cache_len: int) -> int:
    # Cache slabs are tile-aligned inside the fused kernels; the VMEM-fit
    # decision must use the same rounded size the engine will allocate.
    return max(-(-cache_len // 128) * 128, 128)


def _use_megakernel(model, model_type, batch: int, cache_len: int, engine: str) -> bool:
    if engine in ("xla", "wide", "spec"):
        return False
    if model_type != ModelType.TRANSFORMER:
        return False
    if not getattr(model.config, "use_layer_norm", True):
        # The fused kernels hard-code the pre-LN block (and pack_weights
        # reads ln_1/ln_2/ln_f); norm-free models stay on the XLA path.
        return False
    if _megakernel_chunk(model.config, batch, _padded_cache_len(cache_len)) == 0:
        return False
    if engine == "megakernel":
        return True
    # auto: the fused kernel needs a real TPU (interpret mode is far slower
    # than the XLA scan on CPU).
    return jax.default_backend() == "tpu"


def _wide_batch_cap(config, cache_len: int) -> int:
    """Largest per-dispatch sub-batch the streaming wide kernel's VMEM
    holds (0 = the model doesn't suit the wide kernel at all).

    Wide-kernel VMEM residents: double-buffered per-layer weight blocks
    (2 x 12E^2), the (2, KV_CHUNK, 2*B*E) streamed-KV chunk buffers (the
    only batch-dependent term), the relative band buffer, and the
    embedding/positional tables; ~20 MB is left for activations and
    compiler slack against the ~128 MB chip VMEM.
    """
    from composer_tpu.ops.decode_kernel_wide import KV_CHUNK

    e = config.embed_dim
    bytes_per = 2  # bf16 streaming (int8 halves the weight term)
    fixed = 2 * 12 * e * e * bytes_per  # weight double buffers
    if config.use_relative_attention:
        fixed += 2 * (cache_len + 256) * e * bytes_per  # band double buffer
    vocab_pad = -(-getattr(config, "vocab_size", 512) // 256) * 256
    # Resident tables: wte + wte_t + wpe.
    fixed += 2 * vocab_pad * e * bytes_per + config.window_size * e * bytes_per
    budget = 100 * 1024 * 1024 - fixed
    per_batch = 2 * KV_CHUNK * 2 * e * bytes_per  # kv chunk double buffer
    if budget <= 0:
        return 0
    return max(min(budget // per_batch, 8), 0)


def _use_wide_kernel(model, model_type, cache_len: int, engine: str) -> bool:
    """Routes weights-over-VMEM transformers to the streaming wide kernel.

    auto: only when the resident megakernel CANNOT serve the model (its
    VMEM gate failed) — for models that fit, residency wins. 'wide' forces
    it (tests/benchmarks A/B)."""
    if engine not in ("auto", "wide"):
        return False
    if model_type != ModelType.TRANSFORMER:
        return False
    if not getattr(model.config, "use_layer_norm", True):
        return False
    if _wide_batch_cap(model.config, _padded_cache_len(cache_len)) == 0:
        return False
    if engine == "wide":
        return True
    return (
        jax.default_backend() == "tpu"
        and _megakernel_chunk(model.config, 1, _padded_cache_len(cache_len)) == 0
    )


def _normalize_sampling(batch: int, temperature, top_k, top_p):
    """Scalar-or-per-row sampling params -> per-row (batch,) numpy vectors.

    Serving coalesces requests with different settings into one batch, so
    every param may be a scalar (applied to all rows) or a length-``batch``
    vector. Returned as CONCRETE numpy arrays: the callers derive static
    kernel-structure flags (greedy / filter columns) from the values.
    """

    def vec(value, dtype, name):
        arr = np.asarray(value, dtype).reshape(-1)
        if arr.shape[0] == 1 and batch != 1:
            arr = np.broadcast_to(arr, (batch,))
        if arr.shape[0] != batch:
            raise ValueError(
                f"{name} must be a scalar or a length-{batch} vector, "
                f"got shape {np.asarray(value).shape}"
            )
        return np.ascontiguousarray(arr)

    return (
        vec(temperature, np.float32, "temperature"),
        vec(top_k, np.int32, "top_k"),
        vec(top_p, np.float32, "top_p"),
    )


def _prefill_min_tokens() -> int:
    """Shortest common prompt prefix worth a separate XLA prefill dispatch
    (below it, the kernel's in-loop teacher forcing is cheaper than an
    extra program + link round-trip). Env knob ``COMPOSER_PREFILL_MIN``;
    <= 0 disables parallel prefill."""
    import os

    try:
        return int(os.environ.get("COMPOSER_PREFILL_MIN", "64"))
    except ValueError:
        return 64


def _pow2_floor(n: int) -> int:
    size = 1
    while size * 2 <= n:
        size *= 2
    return size


class TransformerDecoder:
    """A serving engine: packs weights once; each ``generate`` call is ONE
    fused device program (prompt consumption + sampling inside the kernel).

    Long prompts (common prefix >= ``COMPOSER_PREFILL_MIN`` tokens,
    default 64) take a PARALLEL PREFILL first: one batched XLA forward
    builds the KV cache for the shared prefix in a single pass, exports it
    into the kernel's slab layout, and the kernel starts its token loop at
    that position — instead of teacher-forcing the prefix one sequential
    in-kernel step per token (the round-3 gap: a 512-event prompt cost
    ~512 sequential steps before the first new token). Greedy outputs are
    identical either way; sampled streams shift (draws start later).
    """

    def __init__(self, model, params, dtype=jnp.bfloat16):
        from composer_tpu.ops import decode_kernel

        self.model = model
        self.config = model.config
        self.params = params
        self.packed = decode_kernel.pack_weights(params, model.config, dtype=dtype)

        def pipeline(packed, prompt, plens, seed, temps, topks, topps,
                     krows, vrows, cache_len, length, greedy, use_k, use_p,
                     ragged, start):
            # ONE device program per generate call: the kernel consumes the
            # prompt teacher-forced and samples every new token itself — no
            # external prefill or cache transform (per-dispatch latency over
            # the device link is ~24 ms here, so dispatch count dominates
            # wall time for short generations). The kernel seeds its own
            # PRNG from the scalar ``seed``; no host-side PRNGKey program.
            from composer_tpu.ops.decode_kernel_batched import (
                megakernel_generate_batched,
            )
            if prompt.shape[0] == 1 and start == 0:
                # Batch 1 is never ragged: generate() trims the concrete
                # prompt row to its real length before dispatch.
                tokens = decode_kernel.megakernel_generate(
                    packed, prompt[0], seed, temps,
                    config=model.config, length=length, cache_len=cache_len,
                    top_k=topks, top_p=topps,
                    greedy=greedy, use_k=use_k, use_p=use_p,
                )
                return tokens[None, :]
            return megakernel_generate_batched(
                packed, prompt, seed, temps,
                config=model.config, length=length, cache_len=cache_len,
                top_k=topks, top_p=topps,
                greedy=greedy, use_k=use_k, use_p=use_p,
                prompt_lengths=plens if ragged else None,
                prefill_rows=(krows, vrows) if start else None,
                start_step=start,
            )

        # Sampling params are traced (B,) vectors — one compiled program
        # covers every temperature/top-k/top-p mix per (batch, lengths,
        # structure-flags) shape, so changing a sampling knob between
        # requests does not recompile.
        self._pipeline = jax.jit(
            pipeline,
            static_argnames=(
                "cache_len", "length", "greedy", "use_k", "use_p", "ragged",
                "start",
            ),
        )

        def prefill_rows(params_arg, prefix, cache_len):
            # One batched forward over the shared prompt prefix; the cache
            # transposes/pads into the kernel's (L, B*C, E) slab layout
            # inside the same program.
            from composer_tpu.ops.decode_kernel import cache_to_rows_batched

            cache = init_cache(model.config, prefix.shape[0], prefix.shape[1])
            _, cache = model.apply({"params": params_arg}, prefix, cache)
            return cache_to_rows_batched(
                cache, model.config, cache_len, self.packed["wte"].dtype
            )

        self._prefill_rows = jax.jit(
            prefill_rows, static_argnames=("cache_len",)
        )

    def generate(self, prompt, length, temperature=1.0, seed=0, cache_len=None,
                 top_k=0, top_p=0.0, prompt_lengths=None):
        from composer_tpu.ops.decode_kernel import sampling_flags

        # Host array end to end: the per-chunk slices below stay free host
        # views instead of dispatched device slice programs, and the jitted
        # pipeline uploads its chunk as a call argument.
        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim == 1:
            prompt = prompt[None]
        if cache_len is None:
            cache_len = prompt.shape[1] + length
        cache_len = _padded_cache_len(cache_len)
        temps, topks, topps = _normalize_sampling(
            prompt.shape[0], temperature, top_k, top_p
        )
        # Ragged prompts: concrete per-row lengths select each row's
        # teacher-forcing boundary inside the batched kernel.
        if prompt_lengths is None:
            plens = np.full(prompt.shape[0], prompt.shape[1], np.int32)
        else:
            plens = np.asarray(prompt_lengths, np.int32).reshape(-1)
            if prompt.shape[0] == 1:
                # Batch 1 runs the single-sequence kernel: trim the padding
                # off the one row instead of threading raggedness through.
                prompt = prompt[:, : int(plens[0])]
                plens = np.full(1, prompt.shape[1], np.int32)

        # Batches beyond what one kernel's VMEM holds run as sequential
        # fused dispatches (async dispatch pipelines the link round-trips).
        chunk = _megakernel_chunk(self.config, prompt.shape[0], cache_len)
        if chunk == 0:
            raise ValueError(
                f"model (embed {self.config.embed_dim}, {self.config.num_layers}"
                f" layers) + cache_len {cache_len} exceeds the fused kernel's"
                " VMEM budget; use the XLA engine for this architecture"
            )
        # Parallel prefill for long prompts: one XLA forward covers the
        # common prefix (min prompt length - 1 — the last prompt token
        # stays with the kernel, whose step both consumes it and samples),
        # bucketed to powers of two so the compile cache stays small.
        prefill_min = _prefill_min_tokens()
        prefill_start = int(plens.min()) - 1
        if prefill_min <= 0 or prefill_start < prefill_min:
            prefill_start = 0
        else:
            # 64-multiples: deep enough prefill (a 511-token prefix buckets
            # to 448, not pow2's 256) with a bounded compile cache (serving
            # prompts bucket to powers of two already). Below 64 (reachable
            # only with a lowered threshold) the exact length is used.
            if prefill_start >= 64:
                prefill_start = (prefill_start // 64) * 64

        outputs = []
        dummy_rows = None
        for index, start in enumerate(range(0, prompt.shape[0], chunk)):
            # Distinct per-chunk PRNG streams. Chunk 0 keeps the user seed
            # (single-dispatch behaviour unchanged); later chunks map into a
            # band disjoint from small user seeds (values >= 2**16 + 65537),
            # so sweeping user seeds 0..65535 can never collide with any
            # call's later-chunk stream (a plain seed+index or seed*K+index
            # scheme collides at e.g. seed=0 chunk 1 vs seed=1 chunk 0).
            chunk_seed = (
                seed if index == 0
                else (seed * 65537 + 2**16 + index) % (2**31)
            )
            tc = temps[start : start + chunk]
            kc = topks[start : start + chunk]
            pc = topps[start : start + chunk]
            lc = plens[start : start + chunk]
            greedy, use_k, use_p = sampling_flags(tc, kc, pc)
            if prefill_start:
                krows, vrows = self._prefill_rows(
                    self.params, prompt[start : start + chunk, :prefill_start],
                    cache_len,
                )
            else:
                if dummy_rows is None:
                    dummy_rows = jnp.zeros(
                        (self.config.num_layers, 8, self.config.embed_dim),
                        self.packed["wte"].dtype,
                    )
                krows = vrows = dummy_rows
            outputs.append(
                self._pipeline(
                    self.packed, prompt[start : start + chunk], lc,
                    chunk_seed, tc, kc, pc, krows, vrows, cache_len, length,
                    greedy, use_k, use_p, bool((lc != prompt.shape[1]).any()),
                    prefill_start,
                )
            )
        return outputs[0] if len(outputs) == 1 else jnp.concatenate(outputs, axis=0)


class WideTransformerDecoder:
    """Serving engine for weights-over-VMEM transformers: one fused program
    per generate call that STREAMS the packed weights and the KV prefix
    from HBM (ops/decode_kernel_wide.py) instead of holding them resident —
    the engine the embed-1024 flagship gets instead of the XLA scan.

    Set ``COMPOSER_WIDE_INT8=1`` to pack the streamed weight blocks int8
    with per-output-channel scales: halves the dominant per-step HBM
    stream at a documented (non-bit-exact) numeric cost. Set
    ``COMPOSER_WIDE_INT8_KV=1`` to also stream the KV prefix int8 (the
    second-largest per-step HBM term): rows quantize at the tail flush
    with exact per-column dequant epilogues — bit-identical to float KV
    until the first flush, half-quantization-step-bounded after
    (ops/decode_kernel_wide.py). The two flags compose.
    """

    def __init__(self, model, params, dtype=None):
        import os

        from composer_tpu.ops import decode_kernel_wide as dkw

        self.model = model
        self.config = model.config
        if dtype is None:
            if os.environ.get("COMPOSER_WIDE_INT8", "0") == "1":
                dtype = jnp.int8
            elif jax.default_backend() == "tpu":
                dtype = jnp.bfloat16
            else:
                dtype = jnp.float32
        self.packed = dkw.pack_weights_wide(params, model.config, dtype=dtype)
        self.kv_dtype = (
            jnp.bfloat16 if dtype == jnp.int8 else dtype
        )
        self.kv_quant = os.environ.get("COMPOSER_WIDE_INT8_KV", "0") == "1"
        self._kv = {}  # (batch, cache_len) -> carried HBM cache
        self._interpret = jax.default_backend() != "tpu"

    def _kv_state(self, batch: int, cache_len: int):
        from composer_tpu.ops import decode_kernel_wide as dkw

        key = (batch, cache_len)
        if key not in self._kv:
            # One cache per dispatch shape, recycled across calls (donated
            # in, aliased out): stale rows are overwritten before any read.
            self._kv.clear()  # at most one live shape — they are ~100s of MB
            self._kv[key] = dkw.init_kv_state(
                self.config, batch, cache_len, dtype=self.kv_dtype,
                quantize_kv=self.kv_quant,
            )
        return key, self._kv[key]

    def generate(self, prompt, length, temperature=1.0, seed=0, cache_len=None,
                 top_k=0, top_p=0.0, prompt_lengths=None):
        from composer_tpu.ops.decode_kernel import sampling_flags
        from composer_tpu.ops.decode_kernel_wide import megakernel_generate_wide

        prompt = np.asarray(prompt, np.int32)
        if prompt.ndim == 1:
            prompt = prompt[None]
        if cache_len is None:
            cache_len = prompt.shape[1] + length
        cache_len = _padded_cache_len(cache_len)
        temps, topks, topps = _normalize_sampling(
            prompt.shape[0], temperature, top_k, top_p
        )
        if prompt_lengths is None:
            plens = np.full(prompt.shape[0], prompt.shape[1], np.int32)
        else:
            plens = np.asarray(prompt_lengths, np.int32).reshape(-1)

        chunk = _wide_batch_cap(self.config, cache_len)
        if chunk == 0:
            raise ValueError(
                f"model (embed {self.config.embed_dim}) + cache_len "
                f"{cache_len} exceeds even the streaming wide kernel's VMEM "
                "budget; use the XLA engine"
            )
        chunk = min(chunk, prompt.shape[0])
        outputs = []
        for index, start in enumerate(range(0, prompt.shape[0], chunk)):
            rows = prompt[start : start + chunk]
            if rows.shape[0] < chunk:  # pad the tail dispatch to the shape
                pad = chunk - rows.shape[0]
                rows = np.concatenate([rows, np.tile(rows[-1:], (pad, 1))])
            tc = np.resize(temps[start : start + chunk], chunk)
            kc = np.resize(topks[start : start + chunk], chunk)
            pc = np.resize(topps[start : start + chunk], chunk)
            lc = np.resize(plens[start : start + chunk], chunk)
            chunk_seed = (
                seed if index == 0
                else (seed * 65537 + 2**16 + index) % (2**31)
            )
            greedy, use_k, use_p = sampling_flags(tc, kc, pc)
            key, kv = self._kv_state(chunk, cache_len)
            tokens, kv = megakernel_generate_wide(
                self.packed, kv, rows, chunk_seed, tc,
                config=self.config, length=length, cache_len=cache_len,
                interpret=self._interpret, top_k=kc, top_p=pc,
                greedy=greedy, use_k=use_k, use_p=use_p,
                prompt_lengths=(
                    lc if bool((lc != rows.shape[1]).any()) else None
                ),
            )
            self._kv[key] = kv  # donated: rebind the new buffer
            real = min(chunk, prompt.shape[0] - start)
            outputs.append(np.asarray(tokens)[:real])
        out = outputs[0] if len(outputs) == 1 else np.concatenate(outputs, axis=0)
        return out


_ENGINE_CACHE = {}
_WIDE_ENGINE_CACHE = {}

# Stats vector of the most recent speculative generate: [total_blocks,
# generation_blocks, final_position, 0...] — benches and tests read the
# realized acceptance (length / generation_blocks) from here.
LAST_SPEC_STATS = None
# Monotonic count of speculative dispatches: serving telemetry compares it
# around a generate_ids call to learn whether the spec engine served the
# request (and then reads LAST_SPEC_STATS for the realized acceptance).
SPEC_DISPATCHES = 0


def _packed_engine(model, params):
    key = (id(model), id(params))
    engine = _ENGINE_CACHE.get(key)
    if engine is None:
        engine = TransformerDecoder(model, params)
        _ENGINE_CACHE.clear()  # keep at most one packed engine alive
        _ENGINE_CACHE[key] = engine
    return engine


def _spec_generate(model, params, prompt, length, temps, seed, cache_len,
                   top_k=0, top_p=0.0):
    """Speculative block decode (opt-in ``engine='spec'``): the n-gram-drafted
    verify kernel, sharing the resident megakernel's packed weights."""
    from composer_tpu.ops.decode_kernel import sampling_flags
    from composer_tpu.ops.decode_kernel_spec import speculative_generate

    global LAST_SPEC_STATS, SPEC_DISPATCHES
    engine = _packed_engine(model, params)
    row = np.asarray(prompt, np.int32).reshape(-1)
    greedy, use_kk, use_pp = sampling_flags(temps, top_k, top_p)
    if not greedy and jax.default_backend() != "tpu":
        # Mirrors the continuous-serving gate: the block sampler draws from
        # the TPU hardware PRNG, which the CPU interpreter does not
        # implement — without this check a sampled engine='spec' request
        # off-TPU dies in an obscure Mosaic lowering error.
        from composer_tpu.exceptions import InvalidParameterError

        raise InvalidParameterError(
            "Sampled decoding (temperature > 0) with engine='spec' requires "
            "TPU hardware; the CPU interpret fallback is greedy-only (set "
            "temperature to 0 or use engine='xla')."
        )
    tokens, stats = speculative_generate(
        engine.packed, row, seed, temps,
        config=model.config, length=length,
        cache_len=max(_padded_cache_len(cache_len), row.shape[0] + length),
        interpret=jax.default_backend() != "tpu",
        top_k=top_k, top_p=top_p,
        greedy=greedy, use_k=use_kk, use_p=use_pp,
    )
    LAST_SPEC_STATS = np.asarray(stats)
    SPEC_DISPATCHES += 1
    return np.asarray(tokens)[None, :]


def _use_spec_kernel(model, model_type, batch: int, cache_len: int,
                     engine: str, temps=None) -> bool:
    """Routing for the speculative engine: batch 1 only (the block verify
    trades MXU rows for positions — at batch > 1 the batched kernel already
    fills them with sequences), resident-weight models only.

    ``engine='spec'`` opts in unconditionally. Under ``'auto'`` the engine
    takes over exactly the case where it is BOTH distribution-exact vs the
    sequential megakernel (bit-identical under f32; under bf16, near-tie
    argmax flips — the class by which all engines already differ) and a
    measured win: single-sequence GREEDY decoding on TPU — 1.85x and
    2.32x the sequential marginal on the two round-5 trained models at
    block 5 (148.7k and 186.7k vs 80.4k events/sec; docs/serving.md
    block table). Sampled auto stays sequential even though BOTH trained
    models measure the sampled engine above it post-fix (1.13x and
    1.09-1.17x): the no-acceptance floor (random-weight content) measures
    0.76x, and auto's contract is never-below-sequential for any content.
    engine='spec' opts sampled requests in, with realized acceptance
    exposed through serving /v1/health when it runs."""
    if engine == "auto":
        if jax.default_backend() != "tpu":
            return False
        if temps is None or not bool(np.all(np.asarray(temps) <= 0)):
            return False
    elif engine != "spec":
        return False
    if model_type != ModelType.TRANSFORMER or batch != 1:
        return False
    if not getattr(model.config, "use_layer_norm", True):
        return False
    return _megakernel_chunk(model.config, 1, _padded_cache_len(cache_len)) > 0


def _wide_generate(model, params, prompt, length, temperature, seed,
                   cache_len, top_k=0, top_p=0.0, prompt_lengths=None):
    import os

    # The quantization env flags are read at engine construction; keying
    # on them keeps a toggled flag from reusing a stale packed engine.
    key = (
        id(model), id(params),
        os.environ.get("COMPOSER_WIDE_INT8", "0"),
        os.environ.get("COMPOSER_WIDE_INT8_KV", "0"),
    )
    engine = _WIDE_ENGINE_CACHE.get(key)
    if engine is None:
        engine = WideTransformerDecoder(model, params)
        _WIDE_ENGINE_CACHE.clear()  # at most one packed wide engine alive
        _WIDE_ENGINE_CACHE[key] = engine
    return engine.generate(
        prompt, length, temperature=temperature, seed=seed,
        cache_len=max(cache_len, 128), top_k=top_k, top_p=top_p,
        prompt_lengths=prompt_lengths,
    )


def _megakernel_generate(model, params, prompt, length, temperature, seed,
                         cache_len, top_k=0, top_p=0.0, prompt_lengths=None):
    engine = _packed_engine(model, params)
    return engine.generate(
        prompt, length, temperature=temperature, seed=seed,
        cache_len=max(cache_len, 128), top_k=top_k, top_p=top_p,
        prompt_lengths=prompt_lengths,
    )


def _warper_arrays(temps, topks, topps):
    """Per-row numpy params -> traced-friendly jnp arrays for the XLA path."""
    return (
        jnp.asarray(temps, jnp.float32),
        jnp.asarray(topks, jnp.int32),
        jnp.asarray(topps, jnp.float32),
    )


def generate_ids(
    model,
    model_type: ModelType,
    params_or_variables,
    prompt_ids,
    length: int = 1024,
    temperature: float = 1.0,
    seed: int = 0,
    cache_len: Optional[int] = None,
    engine: str = "auto",
    top_k: int = 0,
    top_p: float = 0.0,
    prompt_lengths=None,
) -> np.ndarray:
    """Generates ``length`` new event ids after ``prompt_ids``.

    prompt_ids: int array [batch, prompt_len] (or [prompt_len]).
    Returns [batch, prompt_len + length] including the prompt.

    ``prompt_lengths`` (transformers only): a per-row (batch,) int vector of
    REAL prompt lengths when rows are padded to a common width — row s is
    teacher-forced only through its own prefix, so the serving coalescer can
    batch requests with different prompt lengths. The returned array still
    leads with the full padded prompt block: row s's generated ids are
    columns [prompt_len, prompt_len + length) regardless of its real length
    (slice its real prompt from [0, prompt_lengths[s]) when reassembling).

    ``engine``: 'auto' (fused kernels on TPU — the resident megakernels
    when the packed weights fit VMEM, the streaming wide kernel when they
    don't, speculative block decode for single-sequence GREEDY requests
    where it is bit-identical and measured ~1.9x the sequential kernel —
    XLA scan otherwise), 'megakernel', 'wide', 'xla', or 'spec'
    (batch-1 speculative block decode: n-gram-drafted tokens verified in
    parallel — greedy output bit-identical to the megakernel, sampled
    output distributed identically; falls back to the other engines for
    batches > 1 or weights-over-VMEM models).
    ``top_k``/``top_p`` filter the sampling distribution (0 disables each;
    beyond the reference, whose sampler was temperature-only). The fused
    kernels implement both filters in-kernel (rank/nucleus thresholds via
    MXU comparison contractions; ops/decode_kernel.py), so filtered
    requests stay on the fused path.

    ``temperature``/``top_k``/``top_p`` may each be a scalar or a per-row
    [batch] vector — the serving coalescer batches requests with different
    sampling settings into one call. A row with temperature <= 0 decodes
    greedily.
    """
    prompt_host = np.asarray(prompt_ids, dtype=np.int32)
    squeeze = prompt_host.ndim == 1
    if squeeze:
        prompt_host = prompt_host[None]
    # The prompt stays a HOST array until a jitted call uploads it as an
    # argument, and the PRNG key is built only on the paths that consume
    # it: the fused kernels take the integer seed, and on the remote
    # tunnel an eager PRNGKey / device slice is a whole extra dispatch
    # (~25 ms RTT) per generate call.
    prompt = prompt_host
    # EXCEPT when the caller hands a committed device array (mesh-sharded
    # serving): converting it to host numpy would silently drop its batch
    # sharding, turning a data-parallel decode into a replicated one. The
    # XLA-engine paths take the device array as-is; the fused kernels (which
    # need host-side prompt handling and are single-device anyway) keep the
    # host copy.
    prompt_device = (
        prompt_ids
        if isinstance(prompt_ids, jax.Array)
        and prompt_ids.ndim == 2
        and prompt_ids.dtype == jnp.int32
        else None
    )
    temps, topks, topps = _normalize_sampling(
        prompt.shape[0], temperature, top_k, top_p
    )
    # Off values normalize to the canonical "disabled" encoding so engine
    # selection and compile caching never distinguish e.g. top_p=0 from 1.5.
    topks = np.where(topks > 0, topks, 0)
    topps = np.where((topps > 0.0) & (topps < 1.0), topps, 0.0).astype(np.float32)

    if prompt_lengths is not None:
        if model_type != ModelType.TRANSFORMER:
            raise ValueError("prompt_lengths is only supported for transformers")
        plens = np.asarray(prompt_lengths, np.int32).reshape(-1)
        if np.all(plens == prompt.shape[1]):
            prompt_lengths = None  # uniform: the fast fixed-length paths

    if model_type == ModelType.TRANSFORMER:
        if cache_len is None:
            cache_len = prompt.shape[1] + length
        if _use_spec_kernel(
            model, model_type, prompt.shape[0], cache_len, engine, temps
        ):
            if prompt_lengths is not None:
                prompt = prompt[:, : int(plens[0])]
            generated = _spec_generate(
                model, params_or_variables, prompt, length, temps, seed,
                cache_len, top_k=topks, top_p=topps,
            )
        elif _use_megakernel(
            model, model_type, prompt.shape[0], cache_len, engine
        ):
            generated = _megakernel_generate(
                model, params_or_variables, prompt, length,
                temps, seed, cache_len, top_k=topks, top_p=topps,
                prompt_lengths=prompt_lengths,
            )
        elif _use_wide_kernel(model, model_type, cache_len, engine):
            # Weights-over-VMEM models: the streaming wide kernel instead
            # of the XLA scan fallback (VERDICT r3 item 1).
            generated = _wide_generate(
                model, params_or_variables, prompt, length,
                temps, seed, cache_len, top_k=topks, top_p=topps,
                prompt_lengths=prompt_lengths,
            )
        elif prompt_lengths is not None:
            generated = _ragged_transformer_generate(
                model, params_or_variables,
                prompt_device if prompt_device is not None
                else jnp.asarray(prompt),
                plens,
                jax.random.PRNGKey(seed), length, cache_len,
                *_warper_arrays(temps, topks, topps),
            )
        else:
            generated = _transformer_generate(
                model, params_or_variables,
                prompt_device if prompt_device is not None
                else jnp.asarray(prompt),
                jax.random.PRNGKey(seed), length, cache_len,
                *_warper_arrays(temps, topks, topps),
            )
    else:
        generated = _rnn_generate(
            model, params_or_variables,
            prompt_device if prompt_device is not None
            else jnp.asarray(prompt),
            jax.random.PRNGKey(seed), length,
            *_warper_arrays(temps, topks, topps),
        )

    # Prompt+generated are joined on the HOST: a device-side concatenate
    # would be one more program dispatch (and a re-download of the prompt),
    # and in this environment every dispatch rides a ~24 ms tunnel RTT.
    result = np.concatenate([prompt_host, np.asarray(generated)], axis=1)
    return result[0] if squeeze else result
