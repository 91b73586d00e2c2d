"""Megakernel decode vs the XLA scan path (greedy tokens must match exactly).

Runs in Pallas interpret mode on CPU; the compiled kernel is validated on
real TPU hardware (100% greedy agreement at 48 steps, and it is the engine
behind bench.py's headline number).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig, init_cache
from composer_tpu.ops import decode_kernel as dk
from composer_tpu.train.generate import generate_ids


def _setup(use_relative=False):
    config = TransformerConfig(
        vocab_size=390, embed_dim=64, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3,  # varied logits so greedy decoding is non-trivial
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    return config, model, params


@pytest.fixture(scope="module")
def setup():
    return _setup()


@pytest.mark.parametrize("use_relative", [False, True])
def test_megakernel_matches_xla_greedy(use_relative):
    config, model, params = _setup(use_relative)
    prompt = np.array([[5, 100, 300, 17]], np.int32)
    steps = 12

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt,
        length=steps + 1, temperature=0.0, seed=0, engine="xla",
    )
    t1 = int(xla_out[0, prompt.shape[1]])
    expected = np.asarray(xla_out[0, prompt.shape[1] + 1 :])

    cache_len = 128
    cache = init_cache(config, 1, cache_len, dtype=jnp.float32)
    _, cache = model.apply({"params": params}, jnp.asarray(prompt), cache)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    k_rows, v_rows = dk.cache_to_rows(cache, config, cache_len, dtype=jnp.float32)

    tokens = dk.megakernel_decode(
        packed, k_rows, v_rows,
        start_pos=prompt.shape[1], token0=t1, seed=0, temperature=0.0,
        config=config, num_steps=steps, cache_len=cache_len, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    # Varied-token sanity: the sequence must not be a single repeated token.
    assert len(set(expected.tolist())) > 1


def test_pack_weights_shapes(setup):
    config, model, params = setup
    packed = dk.pack_weights(params, config)
    assert packed["wte"].shape[0] % 256 == 0
    assert packed["wte_t"].shape == (config.embed_dim, packed["wte"].shape[0])
    assert packed["qkv_w"].shape == (
        config.num_layers, config.embed_dim, 3 * config.embed_dim,
    )


def test_cache_to_rows_layout(setup):
    config, model, params = setup
    cache = init_cache(config, 1, 16, dtype=jnp.float32)
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    _, cache = model.apply({"params": params}, prompt, cache)
    k_rows, v_rows = dk.cache_to_rows(cache, config, 32, dtype=jnp.float32)
    assert k_rows.shape == (config.num_layers, 32, config.embed_dim)
    # Row p lane h*D+d must equal cache[l]['k'][0, h, p, d].
    k_cache = np.asarray(cache["layers"][0]["k"])[0]  # (H, C, D)
    for p in range(3):
        for h in range(config.num_heads):
            np.testing.assert_allclose(
                np.asarray(k_rows[0, p, h * config.head_dim : (h + 1) * config.head_dim]),
                k_cache[h, p],
                rtol=1e-6,
            )


@pytest.mark.parametrize("use_relative", [False, True])
def test_full_kernel_generation_matches_xla_greedy(use_relative):
    """The prefill-free kernel (teacher-forced prompt) equals the XLA path."""
    config, model, params = _setup(use_relative)
    prompt = np.array([5, 100, 300, 17], np.int32)
    length = 12

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
    )
    expected = np.asarray(xla_out[0, len(prompt):])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens = dk.megakernel_generate(
        packed, prompt, seed=0, temperature=0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)


@pytest.mark.parametrize("use_relative", [False, True])
def test_batched_kernel_matches_xla_greedy(use_relative):
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup(use_relative)
    prompts = np.array([[5, 100, 300, 17], [9, 42, 7, 250], [1, 2, 3, 4]], np.int32)
    length = 10

    expected = np.asarray(
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompts,
            length=length, temperature=0.0, seed=0, engine="xla",
        )
    )[:, prompts.shape[1]:]

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    out = megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expected)


@pytest.mark.parametrize("use_relative", [False, True])
def test_batched_kernel_lanestacked_matches_xla_greedy(use_relative, monkeypatch):
    """The lane-stacked KV layout (COMPOSER_DECODE_LANESTACK=1, one append
    slab per buffer) must stay greedy-identical — it is off by default
    (measured slower on v5e-1) but remains a supported A/B knob."""
    from composer_tpu.ops import decode_kernel_batched as dkb

    monkeypatch.setattr(dkb, "_LANESTACK", True)
    config = TransformerConfig(
        vocab_size=390, embed_dim=128, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    assert config.embed_dim % 128 == 0
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    prompts = np.array([[5, 100, 300, 17], [9, 42, 7, 250], [1, 2, 3, 4]], np.int32)
    length = 10

    expected = np.asarray(
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompts,
            length=length, temperature=0.0, seed=0, engine="xla",
        )
    )[:, prompts.shape[1]:]

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    out = dkb.megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expected)
    assert len(set(np.asarray(out).ravel().tolist())) > 1


def test_long_generation_matches_xla_greedy():
    """A multi-hundred-step generation across several KV slab boundaries
    (and past the learned window) stays greedy-identical to the XLA path —
    both kernels. (A staged-cache-growth variant that contracted only the
    grown cache prefix was measured on v5e-1 and REMOVED: no batch-8 change,
    and ~2x slower tail steps at batch 1 — see TODO.md.)"""
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup()
    prompt = np.array([5, 100, 300, 17], np.int32)
    length = 140  # prompt 4 + 140 -> 143 steps across several 16-row slabs
    cache_len = 384

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
        cache_len=cache_len,
    )
    expected = np.asarray(xla_out[0, len(prompt):])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens = dk.megakernel_generate(
        packed, prompt, seed=0, temperature=0.0,
        config=config, length=length, cache_len=cache_len, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    assert len(set(expected.tolist())) > 1

    prompts = np.stack([prompt, prompt[::-1].copy()])
    expected_b = np.asarray(
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompts,
            length=length, temperature=0.0, seed=0, engine="xla",
            cache_len=cache_len,
        )
    )[:, prompts.shape[1]:]
    out = megakernel_generate_batched(
        packed, prompts, 0, 0.0,
        config=config, length=length, cache_len=cache_len, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out), expected_b)


def test_chunked_engine_splits_large_batches(setup):
    """Batches beyond one kernel's VMEM run as sequential fused dispatches:
    the engine slices the prompt batch, seeds each chunk differently, and
    reassembles outputs in order."""
    from composer_tpu.train import generate as gen

    config, model, params = setup
    engine = gen.TransformerDecoder(model, params, dtype=jnp.float32)

    calls = []

    def fake_pipeline(params, packed, prompt, rng, seed, temperature, cache_len, length):
        calls.append((prompt.shape[0], int(seed)))
        # Tag outputs with the seed so ordering is checkable.
        return jnp.full((prompt.shape[0], length), seed, jnp.int32)

    engine._pipeline = fake_pipeline
    prompts = jnp.tile(jnp.arange(4, dtype=jnp.int32)[None], (19, 1))
    out = engine.generate(prompts, length=6, temperature=0.0, seed=100)

    assert out.shape == (19, 6)
    chunk = gen._megakernel_chunk(config, 19, 128)
    assert [c[0] for c in calls] == [chunk] * (19 // chunk) + (
        [19 % chunk] if 19 % chunk else []
    )
    # Chunk 0 keeps the user seed (single-dispatch behaviour unchanged);
    # later chunks land in a band disjoint from small user seeds so seed
    # sweeps can never collide with another call's chunk streams.
    expected_seeds = [100] + [
        (100 * 65537 + 2**16 + index) % (2**31) for index in range(1, len(calls))
    ]
    assert all(s >= 2**16 for s in expected_seeds[1:])
    assert [c[1] for c in calls] == expected_seeds
    assert len(set(expected_seeds)) == len(expected_seeds)
    np.testing.assert_array_equal(
        np.asarray(out[:, 0]),
        np.repeat(expected_seeds, [c[0] for c in calls]),
    )


def test_use_megakernel_allows_large_batches():
    from composer_tpu.train import generate as gen

    config, model, params = _setup()
    # 64 sequences at a small cache: chunkable, so the fused engine applies.
    assert gen._megakernel_chunk(config, 64, 256) == 8
    assert gen._use_megakernel(model, ModelType.TRANSFORMER, 64, 256, "megakernel")
    # An enormous cache that cannot even fit one sequence falls back.
    assert gen._megakernel_chunk(config, 4, 40_000_000) == 0
    assert not gen._use_megakernel(model, ModelType.TRANSFORMER, 4, 40_000_000, "megakernel")


def test_vmem_gate_matches_engine_padding(setup):
    """The engine pads cache_len to 128; the routing gate must apply the
    same padding, or requests in the 127-wide band just below a chunk-size
    boundary get routed to the fused engine only to be rejected by it."""
    from composer_tpu.train import generate as gen

    config, model, params = setup
    for raw_len in range(100, 50_000, 997):
        if gen._use_megakernel(model, ModelType.TRANSFORMER, 4, raw_len, "megakernel"):
            padded = gen._padded_cache_len(raw_len)
            assert gen._megakernel_chunk(config, 4, padded) > 0, raw_len


@pytest.mark.parametrize("use_relative", [False, True])
def test_generation_past_window_matches_xla_greedy(use_relative):
    """Decoding past window_size: positions clamp to the last learned
    embedding and relative distances beyond the table contribute zero bias.
    The XLA path used to misalign the rel bias here (clamped slice start),
    so this pins kernel/XLA agreement in exactly that regime."""
    config = TransformerConfig(
        vocab_size=390, embed_dim=64, window_size=16, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3, dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    prompt = np.array([5, 100, 300, 17], np.int32)
    length = 28  # prompt 4 + 28 = 32 positions, twice the window

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
    )
    expected = np.asarray(xla_out[0, len(prompt):])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens = dk.megakernel_generate(
        packed, prompt, seed=0, temperature=0.0,
        config=config, length=length, cache_len=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(tokens), expected)
    assert len(set(expected.tolist())) > 1
