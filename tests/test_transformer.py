"""Transformer model tests: shapes, causality, KV-cache parity, relative bias."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.models.transformer import Transformer, TransformerConfig, init_cache
from composer_tpu.ops import attention as attention_ops

VOCAB = 90


def small_config(**overrides):
    defaults = dict(
        vocab_size=VOCAB,
        embed_dim=32,
        window_size=24,
        num_layers=2,
        num_heads=4,
        attention_dropout_rate=0.0,
        residual_dropout_rate=0.0,
    )
    defaults.update(overrides)
    return TransformerConfig(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    config = small_config()
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), batch_size=2, seq_len=8)
    return model, params, config


def test_forward_shapes(model_and_params):
    model, params, config = model_and_params
    tokens = jnp.zeros((2, 8), dtype=jnp.int32)
    logits, cache = model.apply({"params": params}, tokens)
    assert logits.shape == (2, 8, VOCAB)
    assert cache is None


def test_causality(model_and_params):
    """Changing a future token must not change earlier logits."""
    model, params, _ = model_and_params
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (1, 8)), dtype=jnp.int32)
    logits_a, _ = model.apply({"params": params}, tokens)
    perturbed = tokens.at[0, 6].set((tokens[0, 6] + 1) % VOCAB)
    logits_b, _ = model.apply({"params": params}, perturbed)
    np.testing.assert_allclose(logits_a[0, :6], logits_b[0, :6], rtol=1e-5, atol=1e-5)
    assert not np.allclose(logits_a[0, 6], logits_b[0, 6])


@pytest.mark.parametrize("use_relative", [False, True])
def test_kv_cache_matches_full_forward(use_relative):
    """Prefill + step-by-step cached decode == one full forward pass."""
    config = small_config(use_relative_attention=use_relative)
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(1), batch_size=1, seq_len=8)

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (2, 12)), dtype=jnp.int32)

    full_logits, _ = model.apply({"params": params}, tokens)

    apply = jax.jit(model.apply)
    cache = init_cache(config, batch_size=2, max_length=16)
    prefix = 5
    prefill_logits, cache = apply({"params": params}, tokens[:, :prefix], cache)
    np.testing.assert_allclose(
        np.asarray(prefill_logits), np.asarray(full_logits[:, :prefix]),
        rtol=2e-4, atol=2e-4,
    )

    for step in range(prefix, 12):
        step_logits, cache = apply(
            {"params": params}, tokens[:, step : step + 1], cache
        )
        np.testing.assert_allclose(
            np.asarray(step_logits[:, 0]), np.asarray(full_logits[:, step]),
            rtol=2e-4, atol=2e-4,
            err_msg=f"step {step} (relative={use_relative})",
        )


def test_relative_logits_match_bruteforce():
    """The skew trick and the decode slice both equal direct E-lookup."""
    heads, window, depth, seq = 3, 16, 8, 10
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (2, heads, seq, depth))
    E = jax.random.normal(k2, (heads, window, depth))

    # Brute force: out[b,h,i,j] = q[b,h,i] . E[h, window-1-(i-j)] for j <= i.
    expected = np.zeros((2, heads, seq, seq))
    for i in range(seq):
        for j in range(i + 1):
            distance = i - j
            expected[:, :, i, j] = np.einsum(
                "bhd,hd->bh", np.asarray(q[:, :, i]), np.asarray(E[:, window - 1 - distance])
            )

    skewed = np.asarray(attention_ops.relative_logits_full(q, E))
    mask = np.tril(np.ones((seq, seq)))
    np.testing.assert_allclose(skewed * mask, expected, rtol=1e-5, atol=1e-5)

    # Decode path: one query at each absolute position against a cache.
    cache_len = 12
    for position in [0, 3, 9]:
        out = attention_ops.relative_logits_decode(
            q[:, :, position : position + 1], E, jnp.int32(position), cache_len
        )
        for j in range(position + 1):
            np.testing.assert_allclose(
                np.asarray(out[:, :, 0, j]), expected[:, :, position, j],
                rtol=1e-5, atol=1e-5,
            )


def test_window_position_embedding_bounds():
    """Sequences up to window_size work; position indexing stays in range."""
    config = small_config()
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, config.window_size)
    tokens = jnp.zeros((1, config.window_size), dtype=jnp.int32)
    logits, _ = model.apply({"params": params}, tokens)
    assert logits.shape == (1, config.window_size, VOCAB)


def test_dropout_rngs_change_training_output():
    config = small_config(attention_dropout_rate=0.2, residual_dropout_rate=0.2)
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    tokens = jnp.zeros((1, 8), dtype=jnp.int32)
    out_a, _ = model.apply(
        {"params": params}, tokens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    out_b, _ = model.apply(
        {"params": params}, tokens, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(out_a, out_b)
    # Deterministic mode ignores dropout entirely.
    out_c, _ = model.apply({"params": params}, tokens)
    out_d, _ = model.apply({"params": params}, tokens)
    np.testing.assert_array_equal(np.asarray(out_c), np.asarray(out_d))


def test_band_path_matches_skew_path_through_model():
    """band_block_size routes full-sequence attention through
    ops/band_attention.py; logits must match the skew path to rounding."""
    config_band = small_config(
        window_size=64, use_relative_attention=True, band_block_size=32
    )
    config_skew = small_config(
        window_size=64, use_relative_attention=True, band_block_size=0
    )
    model_band = Transformer(config_band)
    model_skew = Transformer(config_skew)
    params = model_band.init_params(jax.random.PRNGKey(3), batch_size=2, seq_len=64)

    tokens = jax.random.randint(jax.random.PRNGKey(4), (2, 64), 0, VOCAB)
    logits_band, _ = model_band.apply({"params": params}, tokens)
    logits_skew, _ = model_skew.apply({"params": params}, tokens)
    np.testing.assert_allclose(
        np.asarray(logits_band), np.asarray(logits_skew), rtol=2e-5, atol=2e-5
    )


def test_band_path_gradients_match_skew_path():
    config_band = small_config(
        window_size=32, use_relative_attention=True, band_block_size=16
    )
    config_skew = small_config(
        window_size=32, use_relative_attention=True, band_block_size=0
    )
    model_band = Transformer(config_band)
    model_skew = Transformer(config_skew)
    params = model_band.init_params(jax.random.PRNGKey(5), batch_size=1, seq_len=32)
    tokens = jax.random.randint(jax.random.PRNGKey(6), (1, 32), 0, VOCAB)

    def loss(model):
        def inner(p):
            logits, _ = model.apply({"params": p}, tokens)
            return jnp.mean(logits.astype(jnp.float32) ** 2)
        return inner

    g_band = jax.grad(loss(model_band))(params)
    g_skew = jax.grad(loss(model_skew))(params)
    flat_band, _ = jax.tree_util.tree_flatten(g_band)
    flat_skew, _ = jax.tree_util.tree_flatten(g_skew)
    for gb, gs in zip(flat_band, flat_skew):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gs), rtol=5e-5, atol=5e-5)


def test_long_context_chunked_remat_train_step_matches_exact():
    """The batch-32-x-2048 training recipe (attention_chunk_size + remat +
    rel attention), scaled down for CPU: the chunked+remat train step must
    reproduce the exact path's loss and gradients (dropout off)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from composer_tpu.models import ModelType
    from composer_tpu.train.trainer import Trainer

    window, batch = 256, 4
    base = dict(
        vocab_size=90, embed_dim=32, window_size=window, num_layers=2,
        num_heads=4, use_relative_attention=True, attention_dropout_rate=0.0,
        residual_dropout_rate=0.0,
    )
    exact = TransformerConfig(**base, band_block_size=0)
    chunked = TransformerConfig(
        **base, band_block_size=0, attention_chunk_size=64, remat=True
    )

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.integers(0, 90, (batch, window)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 90, (batch, window)), jnp.int32)
    key = jax.random.PRNGKey(0)

    losses = {}
    params = {}
    for name, config in (("exact", exact), ("chunked", chunked)):
        trainer = Trainer(Transformer(config), ModelType.TRANSFORMER, 1e-2, seed=0)
        state = trainer.init_state(batch, window)
        seq = []
        for _ in range(2):
            state, metrics, _ = trainer.train_step(state, x, y, key, None)
            seq.append(float(metrics["loss"]))
        losses[name] = seq
        params[name] = state.params

    np.testing.assert_allclose(losses["chunked"], losses["exact"], rtol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(params["exact"]),
        jax.tree_util.tree_leaves(params["chunked"]),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5)


def test_factory_reads_long_context_keys():
    """band_block_size / attention_chunk_size / remat flow from the YAML
    config into TransformerConfig."""
    import composer_tpu.config as config_lib
    from composer_tpu.models import ModelType, create_model

    config = config_lib.get_default()
    section = config.transformer.model
    section["attention_chunk_size"] = 128
    section["remat"] = True
    section["band_block_size"] = 64
    model, _ = create_model(ModelType.TRANSFORMER, config)
    assert model.config.attention_chunk_size == 128
    assert model.config.remat is True
    assert model.config.band_block_size == 64
