"""Generation tests: scan decode correctness, determinism, batching."""

import jax
import numpy as np
import pytest

from composer_tpu.models import ModelType
from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.train.generate import generate_ids

VOCAB = 48


def _transformer():
    model = Transformer(
        TransformerConfig(
            vocab_size=VOCAB,
            embed_dim=16,
            window_size=64,
            num_layers=1,
            num_heads=2,
            attention_dropout_rate=0.0,
            residual_dropout_rate=0.0,
        )
    )
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    return model, params


def test_generate_shapes_and_range():
    model, params = _transformer()
    prompt = np.array([1, 2, 3, 4], dtype=np.int32)
    out = generate_ids(model, ModelType.TRANSFORMER, params, prompt, length=20, seed=1)
    assert out.shape == (24,)
    np.testing.assert_array_equal(out[:4], prompt)
    assert out.min() >= 0 and out.max() < VOCAB


def test_generate_deterministic_under_seed():
    model, params = _transformer()
    prompt = np.array([[5, 6, 7]], dtype=np.int32)
    a = generate_ids(model, ModelType.TRANSFORMER, params, prompt, length=16, seed=3)
    b = generate_ids(model, ModelType.TRANSFORMER, params, prompt, length=16, seed=3)
    np.testing.assert_array_equal(a, b)
    c = generate_ids(model, ModelType.TRANSFORMER, params, prompt, length=16, seed=4)
    assert not np.array_equal(a, c)


def test_generate_batched():
    model, params = _transformer()
    prompts = np.array([[1, 2], [3, 4], [5, 6]], dtype=np.int32)
    out = generate_ids(model, ModelType.TRANSFORMER, params, prompts, length=10, seed=0)
    assert out.shape == (3, 12)
    # Different prompts diverge.
    assert not np.array_equal(out[0], out[1])


def test_generate_greedy_matches_uncached_forward():
    """Greedy scan decode must agree with greedy decode via full forwards."""
    model, params = _transformer()
    prompt = np.array([[2, 9, 4]], dtype=np.int32)
    length = 8
    out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt, length=length,
        temperature=0.0, seed=0,
    )

    tokens = prompt.copy()
    for _ in range(length):
        logits, _ = model.apply({"params": params}, jax.numpy.asarray(tokens))
        next_token = np.argmax(np.asarray(logits[:, -1]), axis=-1).astype(np.int32)
        tokens = np.concatenate([tokens, next_token[:, None]], axis=1)
    np.testing.assert_array_equal(out, tokens)


def test_generate_rnn():
    config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=16, layer_sizes=(16,),
        dropout_rates=(0.0,), use_batch_normalization=False,
    )
    model = MusicRNN(config)
    variables = model.init_variables(jax.random.PRNGKey(0), 1, 8)
    prompt = np.array([[1, 2, 3]], dtype=np.int32)
    out = generate_ids(model, ModelType.MUSIC_RNN, variables, prompt, length=12, seed=0)
    assert out.shape == (1, 15)
    assert out.max() < VOCAB


def test_relative_logits_decode_past_window():
    """Slot j must read E(distance position-j) even once position >= window,
    with zero bias for out-of-table distances (a clamped slice used to
    misalign every slot silently)."""
    import jax
    import jax.numpy as jnp

    from composer_tpu.ops.attention import relative_logits_decode

    H, W, D, C = 2, 8, 4, 16
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    E = jax.random.normal(keys[0], (H, W, D))
    q = jax.random.normal(keys[1], (1, H, 1, D))

    for position in [0, 3, 7, 8, 11, 15]:
        out = np.asarray(relative_logits_decode(q, E, jnp.int32(position), C))
        for j in range(C):
            distance = position - j
            if 0 <= distance < W:
                expected = np.einsum("hd,hd->h", np.asarray(q)[0, :, 0], np.asarray(E)[:, W - 1 - distance])
            else:
                expected = np.zeros(H)
            np.testing.assert_allclose(out[0, :, 0, j], expected, rtol=1e-5, atol=1e-6, err_msg=f"pos={position} j={j}")


def test_generate_rejects_undersized_cache():
    """cache_len smaller than prompt+length raises instead of spinning
    forever in the staged-growth loop."""
    import pytest

    model, params = _transformer()
    prompt = np.array([1, 2, 3, 4], dtype=np.int32)
    with pytest.raises(ValueError, match="exceeds cache"):
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompt,
            length=100, cache_len=64, engine="xla", seed=0,
        )


def test_megakernel_gate_rejects_norm_free_models():
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.generate import _use_megakernel

    config = TransformerConfig(
        vocab_size=64, embed_dim=16, window_size=16, num_layers=1,
        num_heads=2, use_layer_norm=False,
    )
    model = Transformer(config)
    assert not _use_megakernel(model, ModelType.TRANSFORMER, 1, 128, "megakernel")


def test_ragged_generate_ids_matches_singles_xla():
    """generate_ids with prompt_lengths (XLA path): each row's greedy
    generation equals an independent run on its trimmed prompt."""
    model, params = _transformer()
    rng = np.random.default_rng(11)
    plens = np.array([3, 6, 1], np.int32)
    width = int(plens.max())
    prompts = rng.integers(0, VOCAB, (3, width)).astype(np.int32)
    length = 7

    out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompts,
        length=length, temperature=0.0, seed=0, engine="xla",
        prompt_lengths=plens,
    )
    assert out.shape == (3, width + length)
    for row, plen in enumerate(plens):
        single = generate_ids(
            model, ModelType.TRANSFORMER, params, prompts[row : row + 1, :plen],
            length=length, temperature=0.0, seed=0, engine="xla",
        )
        np.testing.assert_array_equal(
            out[row, width:], np.asarray(single)[0, plen:], err_msg=f"row {row}"
        )


def test_ragged_uniform_lengths_take_fast_path():
    """All-equal prompt_lengths must reduce to the fixed-length program."""
    model, params = _transformer()
    prompts = np.array([[5, 100, 300], [9, 42, 7]], np.int32)
    ragged = generate_ids(
        model, ModelType.TRANSFORMER, params, prompts,
        length=5, temperature=0.0, seed=0, engine="xla",
        prompt_lengths=np.array([3, 3], np.int32),
    )
    plain = generate_ids(
        model, ModelType.TRANSFORMER, params, prompts,
        length=5, temperature=0.0, seed=0, engine="xla",
    )
    np.testing.assert_array_equal(ragged, plain)


def test_ragged_rejected_for_rnn():
    config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=16, layer_sizes=(16,),
        dropout_rates=(0.0,), use_batch_normalization=False,
    )
    model = MusicRNN(config)
    variables = model.init_variables(jax.random.PRNGKey(0), 1, 8)
    with pytest.raises(ValueError, match="transformers"):
        generate_ids(
            model, ModelType.MUSIC_RNN, variables,
            np.array([[1, 2], [3, 4]], np.int32), length=4,
            prompt_lengths=np.array([1, 2], np.int32),
        )
