#!/usr/bin/env python
"""TPU bring-up + measurement for the streaming wide decode kernel.

Stages (each prints a JSON line):
1. compiled small-model greedy parity: wide kernel vs XLA engine (f32)
2. compiled small-model SAMPLED stream parity: wide vs resident batched
   kernel (same seed -> identical Gumbel streams; CPU interpret cannot run
   the PRNG ops, so this pin lives here rather than in the test suite)
3. flagship-shape throughput: embed 1024 x 8 layers, batch 8, bf16 — the
   engine the VMEM gate routes to the XLA scan today (VERDICT r3 item 1)
4. (optional, COMPOSER_WIDE_INT8=1 rerun) int8-weights throughput

Run on the TPU: python scripts/bringup_wide_decode.py [stage...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig


def _small_model(dtype):
    config = TransformerConfig(
        vocab_size=390, embed_dim=256, window_size=256, num_layers=2,
        num_heads=16, use_relative_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=dtype, param_dtype=dtype,
    )
    model = Transformer(config)
    return model, model.init_params(jax.random.PRNGKey(3), 1, 8)


def stage_parity():
    from composer_tpu.ops.decode_kernel_wide import (
        init_kv_state, megakernel_generate_wide, pack_weights_wide,
    )
    from composer_tpu.train.generate import generate_ids

    model, params = _small_model(jnp.float32)
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, 390, (4, 8)).astype(np.int32)
    packed = pack_weights_wide(params, model.config, dtype=jnp.float32)
    kv = init_kv_state(model.config, 4, 128, dtype=jnp.float32)
    tokens, _ = megakernel_generate_wide(
        packed, kv, prompts, 0, 0.0, config=model.config, length=24,
        cache_len=128, interpret=False,
    )
    xla = generate_ids(
        model, ModelType.TRANSFORMER, params, prompts, length=24,
        temperature=0.0, seed=0, cache_len=128, engine="xla",
    )
    got, want = np.asarray(tokens), np.asarray(xla)[:, 8:]
    agree = float((got == want).mean())
    print(json.dumps({"stage": "compiled_greedy_parity_f32",
                      "agreement": agree, "exact": bool(agree == 1.0)}))
    assert agree == 1.0, (got, want)


def stage_sampled():
    from composer_tpu.ops.decode_kernel import pack_weights
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched
    from composer_tpu.ops.decode_kernel_wide import (
        init_kv_state, megakernel_generate_wide, pack_weights_wide,
    )

    model, params = _small_model(jnp.float32)
    rng = np.random.default_rng(1)
    prompts = rng.integers(0, 390, (4, 6)).astype(np.int32)
    temps = np.asarray([0.8, 0.0, 1.2, 0.7], np.float32)
    topk = np.asarray([0, 0, 7, 0], np.int32)
    topp = np.asarray([0.9, 0.0, 0.0, 0.0], np.float32)

    packed_w = pack_weights_wide(params, model.config, dtype=jnp.float32)
    kv = init_kv_state(model.config, 4, 128, dtype=jnp.float32)
    wide, _ = megakernel_generate_wide(
        packed_w, kv, prompts, 11, temps, config=model.config, length=20,
        cache_len=128, interpret=False, top_k=topk, top_p=topp,
    )
    packed_b = pack_weights(params, model.config, dtype=jnp.float32)
    batched = megakernel_generate_batched(
        packed_b, prompts, 11, temps, config=model.config, length=20,
        cache_len=128, interpret=False, top_k=topk, top_p=topp,
    )
    same = bool((np.asarray(wide) == np.asarray(batched)).all())
    print(json.dumps({"stage": "compiled_sampled_stream_parity",
                      "identical": same}))
    assert same


def _flagship(dtype):
    config = TransformerConfig(
        vocab_size=390, embed_dim=1024, window_size=2048, num_layers=8,
        num_heads=16, use_relative_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=dtype, param_dtype=dtype,
    )
    model = Transformer(config)
    return model, model.init_params(jax.random.PRNGKey(0), 1, 8)


def stage_flagship(length=1014, batch=8, weight_dtype=jnp.bfloat16):
    from composer_tpu.train.generate import WideTransformerDecoder

    model, params = _flagship(jnp.bfloat16)
    engine = WideTransformerDecoder(model, params, dtype=weight_dtype)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 390, (batch, 10)).astype(np.int32)

    def call():
        return np.asarray(
            engine.generate(prompt, length, temperature=1.0, seed=0)
        )

    t0 = time.perf_counter()
    out = call()
    compile_s = time.perf_counter() - t0
    assert out.shape == (batch, length), out.shape
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        call()
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "stage": "flagship_wide_throughput",
        "weight_dtype": str(jnp.dtype(weight_dtype)),
        "batch": batch, "length": length,
        "compile_s": round(compile_s, 1),
        "seconds": round(best, 4),
        "events_per_sec": round(batch * length / best, 1),
    }))


def stage_prefill(prompt_len=512, length=256, batch=8):
    """Long-prompt parallel prefill through the REAL engine: greedy parity
    vs full in-kernel teacher forcing, plus the wall-time delta (the
    VERDICT r3 item 2 long-prompt shape: prompt 512, length 256)."""
    from composer_tpu.train import generate as gen

    model, params = _small_model(jnp.float32)
    # window 256 < 512: use a longer-window config for this stage.
    config = TransformerConfig(
        vocab_size=390, embed_dim=256, window_size=1024, num_layers=8,
        num_heads=16, use_relative_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, 390, (batch, prompt_len)).astype(np.int32)

    def run(prefill_min):
        os.environ["COMPOSER_PREFILL_MIN"] = str(prefill_min)
        engine = gen.TransformerDecoder(model, params)
        out = np.asarray(
            engine.generate(prompts, length, temperature=0.0, seed=0)
        )  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(engine.generate(prompts, length, temperature=0.0, seed=0))
            times.append(time.perf_counter() - t0)
        return out, min(times)

    forced, forced_s = run(0)
    prefilled, prefill_s = run(64)
    # bf16: the XLA prefill's cache values match the kernel's teacher-forced
    # ones closely but not bit-exactly (different op fusion), so greedy
    # tokens may diverge at near-ties — the f32 EXACT pin lives in
    # tests/test_prefill.py; here we check bf16 agreement + the wall win.
    agreement = float((forced == prefilled).mean())
    print(json.dumps({
        "stage": "prefill_long_prompt",
        "batch": batch, "prompt_len": prompt_len, "length": length,
        "greedy_agreement": agreement,
        "teacher_forced_s": round(forced_s, 4),
        "prefilled_s": round(prefill_s, 4),
        "speedup": round(forced_s / prefill_s, 3),
    }))
    assert agreement > 0.9, agreement


STAGES = {
    "parity": stage_parity,
    "sampled": stage_sampled,
    "flagship": stage_flagship,
    "flagship_int8": lambda: stage_flagship(weight_dtype=jnp.int8),
    "prefill": stage_prefill,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["parity", "sampled", "flagship"]
    print("backend:", jax.default_backend(), jax.devices())
    for name in names:
        STAGES[name]()
