"""Benchmark harness.

The headline metric (BASELINE.md): events/sec/chip for a 1024-event KV-cached
decode of the default-config Transformer (vocab 390, 8 layers, 256 embed, 16
heads, window 1024). The north-star target is >= 50,000 events/sec/chip on
TPU v5e-1; ``vs_baseline`` reports value / 50,000.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

DECODE_TARGET_EVENTS_PER_SEC = 50_000.0


def _default_transformer(use_relative_attention: bool, dtype):
    from composer_tpu.models.transformer import Transformer, TransformerConfig

    config = TransformerConfig(
        vocab_size=390,
        embed_dim=256,
        window_size=1024,
        num_layers=8,
        num_heads=16,
        use_relative_attention=use_relative_attention,
        attention_dropout_rate=0.0,
        residual_dropout_rate=0.0,
        dtype=dtype,
        # Serving path: weights in bf16 too — decode is HBM-bandwidth bound
        # and fp32 params double the per-step weight traffic.
        param_dtype=dtype,
    )
    return Transformer(config)


def run_decode_benchmark(
    length: int = 1024,
    batch_size: int = 1,
    prompt_length: int = 10,
    use_relative_attention: bool = False,
    dtype=None,
    repeats: int = 3,
    seed: int = 0,
):
    """Times the jitted KV-cached scan decode; returns the bench JSON dict."""
    from composer_tpu.models import ModelType
    from composer_tpu.train.generate import generate_ids

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(use_relative_attention, dtype)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)

    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 390, (batch_size, prompt_length)).astype(np.int32)

    def run():
        out = generate_ids(
            model, ModelType.TRANSFORMER, params, prompt,
            length=length, temperature=1.0, seed=seed,
        )
        jax.block_until_ready(out)
        return out

    run()  # compile + warm up
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        run()
        times.append(time.perf_counter() - start)
    best = min(times)
    events_per_sec = batch_size * length / best

    return {
        "metric": "decode_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/sec/chip",
        "vs_baseline": round(events_per_sec / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "length": length,
            "batch_size": batch_size,
            "relative_attention": use_relative_attention,
            "backend": jax.default_backend(),
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "seconds": round(best, 4),
        },
    }


def run_train_benchmark(
    batch_size: int = 8,
    window_size: int = 2048,
    use_relative_attention: bool = True,
    steps: int = 5,
    dtype=None,
    seed: int = 0,
):
    """Training step time for the relative-attention config (BASELINE.md row 5)."""
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    config = TransformerConfig(
        vocab_size=390, embed_dim=256, window_size=window_size,
        num_layers=8, num_heads=16, use_relative_attention=use_relative_attention,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0, dtype=dtype,
        remat=True,
    )
    trainer = Trainer(Transformer(config), ModelType.TRANSFORMER, 1e-3, seed=seed)
    state = trainer.init_state(batch_size, window_size)

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, 390, (batch_size, window_size)), dtype=jnp.int32)
    y = jnp.asarray(rng.integers(0, 390, (batch_size, window_size)), dtype=jnp.int32)
    step_rng = jax.random.PRNGKey(seed)

    state, metrics, _ = trainer.train_step(state, x, y, step_rng, None)  # compile
    jax.block_until_ready(metrics["loss"])

    start = time.perf_counter()
    for _ in range(steps):
        state, metrics, _ = trainer.train_step(state, x, y, step_rng, None)
    jax.block_until_ready(metrics["loss"])
    elapsed = (time.perf_counter() - start) / steps

    tokens_per_sec = batch_size * window_size / elapsed
    return {
        "metric": "train_step_seconds",
        "value": round(elapsed, 4),
        "unit": "s/step",
        "vs_baseline": round(tokens_per_sec, 1),
        "detail": {
            "batch_size": batch_size,
            "window_size": window_size,
            "tokens_per_sec": round(tokens_per_sec, 1),
            "backend": jax.default_backend(),
        },
    }
