"""MusicRNN tests: shapes, state carry semantics, batch-norm collections."""

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig, init_state

VOCAB = 50


def small_config(**overrides):
    defaults = dict(
        vocab_size=VOCAB,
        embed_dim=16,
        layer_sizes=(24, 24),
        dropout_rates=(0.0, 0.0),
        use_batch_normalization=True,
    )
    defaults.update(overrides)
    return MusicRNNConfig(**defaults)


def test_forward_shapes_and_state():
    config = small_config()
    model = MusicRNN(config)
    variables = model.init_variables(jax.random.PRNGKey(0), batch_size=3, seq_len=7)
    tokens = jnp.zeros((3, 7), dtype=jnp.int32)
    (logits, state), _ = model.apply(
        tokens=tokens, variables=variables, mutable=["batch_stats"]
    )
    assert logits.shape == (3, 7, VOCAB)
    assert len(state) == 2
    c0, h0 = state[0]
    assert c0.shape == (3, 24) and h0.shape == (3, 24)


def test_state_carries_context():
    """Feeding a sequence in two chunks with carried state == one pass."""
    config = small_config(use_batch_normalization=False)
    model = MusicRNN(config)
    variables = model.init_variables(jax.random.PRNGKey(0), batch_size=1, seq_len=8)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (1, 8)), dtype=jnp.int32)

    full_logits, _ = model.apply(variables, tokens)

    state = init_state(config, batch_size=1)
    first, state = model.apply(variables, tokens[:, :4], state)
    second, state = model.apply(variables, tokens[:, 4:], state)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(first), np.asarray(second)], axis=1),
        np.asarray(full_logits),
        rtol=1e-5,
        atol=1e-5,
    )

    # Resetting the state (fresh zeros) changes the continuation.
    reset_second, _ = model.apply(variables, tokens[:, 4:], init_state(config, 1))
    assert not np.allclose(reset_second, second)


def test_batch_norm_updates_running_stats():
    config = small_config()
    model = MusicRNN(config)
    variables = model.init_variables(jax.random.PRNGKey(0), batch_size=2, seq_len=5)
    tokens = jnp.ones((2, 5), dtype=jnp.int32)

    (_, _), updates = model.apply(
        variables, tokens, deterministic=False,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)},
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
