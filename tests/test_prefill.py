"""Parallel prefill for the fused decode engines (VERDICT r3 item 2).

One batched XLA forward fills the KV cache for the shared prompt prefix;
the batched kernel then starts its token loop at that position. Greedy
outputs must be IDENTICAL to full in-kernel teacher forcing — uniform and
ragged batches — because prefill only changes where the cache rows come
from, not their values (f32: bit-equal).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig, init_cache
from composer_tpu.ops.decode_kernel import cache_to_rows_batched, pack_weights
from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

VOCAB = 61


@pytest.fixture(scope="module", params=[False, True], ids=["norel", "rel"])
def setup(request):
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=32, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=request.param,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(3), 1, 8)
    return model, params


def _prefill_rows(model, params, prefix, cache_len):
    cache = init_cache(model.config, prefix.shape[0], prefix.shape[1])
    _, cache = model.apply({"params": params}, jnp.asarray(prefix), cache)
    return cache_to_rows_batched(cache, model.config, cache_len, jnp.float32)


def _generate(model, params, prompts, length, cache_len, start=0, plens=None):
    packed = pack_weights(params, model.config, dtype=jnp.float32)
    prefill = (
        _prefill_rows(model, params, prompts[:, :start], cache_len)
        if start else None
    )
    return np.asarray(
        megakernel_generate_batched(
            packed, prompts, 0, 0.0, config=model.config, length=length,
            cache_len=cache_len, interpret=True, prompt_lengths=plens,
            prefill_rows=prefill, start_step=start,
        )
    )


def test_prefill_matches_teacher_forcing_uniform(setup):
    model, params = setup
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, VOCAB, (3, 12)).astype(np.int32)
    forced = _generate(model, params, prompts, length=8, cache_len=128)
    prefilled = _generate(
        model, params, prompts, length=8, cache_len=128, start=11
    )
    np.testing.assert_array_equal(prefilled, forced)


def test_prefill_matches_teacher_forcing_ragged(setup):
    """Ragged batch: prefill covers the common prefix; each row's remaining
    prompt tokens stay teacher-forced in-kernel."""
    model, params = setup
    rng = np.random.default_rng(1)
    width = 16
    plens = np.asarray([9, 16, 12], np.int32)
    prompts = np.zeros((3, width), np.int32)
    for i, p in enumerate(plens):
        prompts[i, :p] = rng.integers(0, VOCAB, p)
    forced = _generate(
        model, params, prompts, length=6, cache_len=128, plens=plens
    )
    prefilled = _generate(
        model, params, prompts, length=6, cache_len=128, start=8, plens=plens
    )
    np.testing.assert_array_equal(prefilled, forced)


def test_prefill_partial_prefix(setup):
    """A prefill shorter than min(plens)-1 (the bucketed case) still agrees."""
    model, params = setup
    rng = np.random.default_rng(2)
    prompts = rng.integers(0, VOCAB, (2, 20)).astype(np.int32)
    forced = _generate(model, params, prompts, length=5, cache_len=128)
    prefilled = _generate(
        model, params, prompts, length=5, cache_len=128, start=16
    )
    np.testing.assert_array_equal(prefilled, forced)


def test_prefill_requires_rows_and_valid_start(setup):
    model, params = setup
    prompts = np.zeros((2, 8), np.int32)
    packed = pack_weights(params, model.config, dtype=jnp.float32)
    with pytest.raises(ValueError, match="requires prefill_rows"):
        megakernel_generate_batched(
            packed, prompts, 0, 0.0, config=model.config, length=4,
            cache_len=128, interpret=True, start_step=4,
        )
    rows = _prefill_rows(model, params, prompts[:, :7], 128)
    with pytest.raises(ValueError, match="min prompt length"):
        megakernel_generate_batched(
            packed, prompts, 0, 0.0, config=model.config, length=4,
            cache_len=128, interpret=True, start_step=8, prefill_rows=rows,
        )


def test_engine_buckets_prefill_start(setup, monkeypatch):
    """TransformerDecoder engages prefill above the threshold, buckets the
    start (64-multiples; exact below 64), and passes the exported rows
    through."""
    from composer_tpu.train import generate as gen

    model, params = setup
    monkeypatch.setenv("COMPOSER_PREFILL_MIN", "4")
    engine = gen.TransformerDecoder(model, params, dtype=jnp.float32)
    seen = {}

    def fake_pipeline(packed, prompt, plens, seed, temps, topks, topps,
                      krows, vrows, cache_len, length, greedy, use_k, use_p,
                      ragged, start):
        seen["start"] = start
        seen["krows_shape"] = tuple(krows.shape)
        return jnp.zeros((prompt.shape[0], length), jnp.int32)

    engine._pipeline = fake_pipeline
    prompts = np.zeros((2, 14), np.int32)
    engine.generate(prompts, length=4, temperature=0.0)
    assert seen["start"] == 13  # below 64: exact prefix (64-multiples above)
    assert seen["krows_shape"] == (
        model.config.num_layers, 2 * 128, model.config.embed_dim
    )

    # Below the threshold: no prefill dispatch.
    monkeypatch.setenv("COMPOSER_PREFILL_MIN", "64")
    engine.generate(prompts, length=4, temperature=0.0)
    assert seen["start"] == 0
