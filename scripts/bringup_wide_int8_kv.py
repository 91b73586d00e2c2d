#!/usr/bin/env python
"""TPU bring-up for int8 KV streaming in the wide decode kernel.

Stages (each prints a JSON line):
1. parity: compiled small-model greedy, float KV vs int8 KV, crossing the
   first tail flush (position 128) — tokens before the flush must be
   bit-identical (the tail stays float), agreement after it stays high
   (mirrors tests/test_decode_wide.py's interpret pins, compiled).
2. flagship: embed-1024 x 8-layer batch-8 bf16 throughput, bf16 KV vs
   int8 KV (COMPOSER_WIDE_INT8_KV), plus the analytic per-step KV stream
   sizes at the mean live prefix.

Run on the TPU: python scripts/bringup_wide_int8_kv.py [parity|flagship]...

Platform note: the first execution of a freshly compiled Pallas program on
this backend can read garbage — every variant warms on a throwaway state
before the measured/verified run.
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

from composer_tpu.models.transformer import Transformer, TransformerConfig


def _model(embed, layers, window, dtype, heads=16, rel=True):
    config = TransformerConfig(
        vocab_size=390, embed_dim=embed, window_size=window,
        num_layers=layers, num_heads=heads, use_relative_attention=rel,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=dtype, param_dtype=dtype,
    )
    model = Transformer(config)
    return model, model.init_params(jax.random.PRNGKey(3), 1, 8)


def _run(packed, state, prompts, length, cache_len, config, warm=True):
    from composer_tpu.ops.decode_kernel_wide import megakernel_generate_wide

    if warm:  # throwaway state: first-execution garbage-read quirk
        megakernel_generate_wide(
            jax.tree.map(lambda x: x, packed),
            jax.tree.map(jnp.copy, state), prompts, 0, 0.0,
            config=config, length=length, cache_len=cache_len,
        )
    return megakernel_generate_wide(
        packed, state, prompts, 0, 0.0,
        config=config, length=length, cache_len=cache_len,
    )


def stage_parity():
    from composer_tpu.ops.decode_kernel_wide import (
        init_kv_state, pack_weights_wide,
    )

    model, params = _model(256, 2, 256, jnp.float32)
    rng = np.random.default_rng(21)
    prompts = rng.integers(0, 390, (2, 6)).astype(np.int32)
    packed = pack_weights_wide(params, model.config, dtype=jnp.float32)

    kv_f = init_kv_state(model.config, 2, 256, dtype=jnp.float32)
    exact, _ = _run(packed, kv_f, prompts, 150, 256, model.config)
    kv_q = init_kv_state(model.config, 2, 256, quantize_kv=True)
    quant, state = _run(packed, kv_q, prompts, 150, 256, model.config)
    exact, quant = np.asarray(exact), np.asarray(quant)

    prefix_exact = bool((quant[:, :115] == exact[:, :115]).all())
    agreement = float((quant == exact).mean())
    print(json.dumps({
        "stage": "compiled_int8_kv_parity_f32",
        "prefix_exact_115": prefix_exact,
        "agreement": round(agreement, 4),
        "state_is_pair": isinstance(state, tuple),
    }))
    assert prefix_exact, "pre-flush tokens must be bit-identical"
    assert agreement >= 0.85, agreement


def _throughput(quant_kv: bool, batch=8, length=1014, embed=1024):
    from composer_tpu.ops.decode_kernel_wide import (
        init_kv_state, pack_weights_wide,
    )

    # rel OFF: matches the bench table's wide-decode row (the rel-on
    # flagship at this cache length exceeds the whole-generation kernel's
    # scoped-VMEM budget — pre-existing; the segmented serving engine is
    # the rel-on path).
    model, params = _model(embed, 8, 2048, jnp.bfloat16, rel=False)
    rng = np.random.default_rng(7)
    prompts = rng.integers(0, 390, (batch, 10)).astype(np.int32)
    cache_len = 1152
    packed = pack_weights_wide(params, model.config, dtype=jnp.bfloat16)
    state = init_kv_state(
        model.config, batch, cache_len, dtype=jnp.bfloat16,
        quantize_kv=quant_kv,
    )
    tokens, state = _run(
        packed, state, prompts, length, cache_len, model.config
    )
    np.asarray(tokens)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        tokens, state = _run(
            packed, state, prompts, length, cache_len, model.config,
            warm=False,
        )
        np.asarray(tokens)
        best = min(best, time.perf_counter() - t0)
    return batch * length / best, best


def stage_flagship():
    bf16_rate, bf16_s = _throughput(False)
    int8_rate, int8_s = _throughput(True)
    # Analytic per-step KV prefix stream at mean live prefix ~512 rows:
    # L * live * 2*B*E bytes (bf16: 2 B/elt; int8: 1 B/elt + scales).
    live, B, E, L = 512, 8, 1024, 8
    bf16_mb = L * live * 2 * B * E * 2 / 1e6
    int8_mb = L * live * 2 * B * E * 1 / 1e6 + L * (live / 128) * 16 * 128 * 4 / 1e6
    print(json.dumps({
        "stage": "flagship_wide_int8_kv",
        "bf16_kv_events_per_sec": round(bf16_rate, 1),
        "int8_kv_events_per_sec": round(int8_rate, 1),
        "speedup": round(int8_rate / bf16_rate, 3),
        "bf16_seconds": round(bf16_s, 4),
        "int8_seconds": round(int8_s, 4),
        "kv_stream_mb_per_step_live512": {
            "bf16": round(bf16_mb, 1), "int8": round(int8_mb, 1),
        },
    }))


if __name__ == "__main__":
    stages = sys.argv[1:] or ["parity", "flagship"]
    for name in stages:
        {"parity": stage_parity, "flagship": stage_flagship}[name]()
