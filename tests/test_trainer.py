"""Trainer tests: loss goes down, checkpoints round-trip, DP mesh works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu import ModelSaveFrequencyMode
from composer_tpu.data.loader import WindowDataset
from composer_tpu.models import ModelType
from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.parallel import create_mesh
from composer_tpu.train.trainer import Trainer

VOCAB = 64


def _toy_stream(length=4000):
    # A highly learnable periodic stream.
    return (np.arange(length) % 7 + 10).astype(np.int32)


def _tiny_transformer():
    return Transformer(
        TransformerConfig(
            vocab_size=VOCAB,
            embed_dim=16,
            window_size=16,
            num_layers=1,
            num_heads=2,
            attention_dropout_rate=0.0,
            residual_dropout_rate=0.0,
        )
    )


def _tiny_rnn():
    return MusicRNN(
        MusicRNNConfig(
            vocab_size=VOCAB,
            embed_dim=16,
            layer_sizes=(16,),
            dropout_rates=(0.0,),
            use_batch_normalization=True,
        )
    )


@pytest.mark.parametrize(
    "model_factory,model_type",
    [(_tiny_transformer, ModelType.TRANSFORMER), (_tiny_rnn, ModelType.MUSIC_RNN)],
)
def test_training_reduces_loss(tmp_path, model_factory, model_type):
    dataset = WindowDataset(_toy_stream(), batch_size=4, window_size=16, shuffle=True)
    trainer = Trainer(model_factory(), model_type, learning_rate=1e-2)
    state = trainer.init_state(4, 16)

    first_metrics = None
    rng = jax.random.PRNGKey(0)
    carry = trainer.init_rnn_carry(4)
    losses = []
    for epoch in range(2):
        for x, y in dataset:
            rng, step_rng = jax.random.split(rng)
            state, metrics, carry = trainer.train_step(
                state, jnp.asarray(x), jnp.asarray(y), step_rng, carry
            )
            losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_train_loop_and_checkpoint_roundtrip(tmp_path):
    dataset = WindowDataset(_toy_stream(2000), batch_size=4, window_size=16, shuffle=False)
    trainer = Trainer(_tiny_transformer(), ModelType.TRANSFORMER, learning_rate=1e-2)
    state = trainer.init_state(4, 16)

    logdir = tmp_path / "run"
    state = trainer.train(
        dataset,
        state,
        logdir,
        epochs=3,
        save_frequency_mode=ModelSaveFrequencyMode.EPOCH,
        save_frequency=1,
        max_checkpoints=2,
        show_progress_bar=False,
    )
    assert (logdir / "checkpoints").exists()
    assert (logdir / "train" / "metrics.jsonl").exists()

    restored = trainer.restore(logdir, 4, 16)
    assert int(restored.step) == int(state.step)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    # Evaluation runs and returns finite metrics.
    metrics = trainer.evaluate(dataset, restored)
    assert np.isfinite(metrics["loss"]) and 0 <= metrics["accuracy"] <= 1


def test_data_parallel_training_matches_single_device(tmp_path):
    """The same seed/state on an 8-device DP mesh gives the same loss."""
    assert jax.device_count() >= 8
    dataset = WindowDataset(_toy_stream(3000), batch_size=8, window_size=16, shuffle=False)

    single = Trainer(_tiny_transformer(), ModelType.TRANSFORMER, learning_rate=1e-2)
    state_s = single.init_state(8, 16)

    mesh = create_mesh(data=8, model=1)
    parallel = Trainer(
        _tiny_transformer(), ModelType.TRANSFORMER, learning_rate=1e-2, mesh=mesh
    )
    state_p = parallel.init_state(8, 16)

    rng = jax.random.PRNGKey(0)
    x, y = next(iter(dataset))
    for _ in range(3):
        rng, step_rng = jax.random.split(rng)
        state_s, metrics_s, _ = single.train_step(
            state_s, jnp.asarray(x), jnp.asarray(y), step_rng, None
        )
        xp, yp = parallel._place_batch(x, y)
        state_p, metrics_p, _ = parallel.train_step(state_p, xp, yp, step_rng, None)
        np.testing.assert_allclose(
            float(metrics_s["loss"]), float(metrics_p["loss"]), rtol=1e-4
        )


def test_data_parallel_production_shape_matches_single_device():
    """DP equivalence at the reference workload shape (scaled in batch):
    window 256, relative attention ON, band-coordinate attention active
    (band_block_size 128 — the production training path), 8-device mesh."""
    assert jax.device_count() >= 8
    window = 256
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=32, window_size=window, num_layers=2,
        num_heads=4, use_relative_attention=True, band_block_size=128,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    dataset = WindowDataset(
        _toy_stream(3 * 8 * (window + 1)), batch_size=8, window_size=window,
        shuffle=False,
    )

    single = Trainer(Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-2)
    state_s = single.init_state(8, window)

    mesh = create_mesh(data=8, model=1)
    parallel = Trainer(
        Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-2, mesh=mesh
    )
    state_p = parallel.init_state(8, window)

    rng = jax.random.PRNGKey(0)
    for x, y in dataset:
        rng, step_rng = jax.random.split(rng)
        state_s, metrics_s, _ = single.train_step(
            state_s, jnp.asarray(x), jnp.asarray(y), step_rng, None
        )
        xp, yp = parallel._place_batch(x, y)
        state_p, metrics_p, _ = parallel.train_step(state_p, xp, yp, step_rng, None)
        np.testing.assert_allclose(
            float(metrics_s["loss"]), float(metrics_p["loss"]), rtol=1e-5
        )
    # After 3 steps the parameter trees must still agree (gradient parity,
    # not just the scalar loss).
    for a, b in zip(
        jax.tree_util.tree_leaves(state_s.params),
        jax.tree_util.tree_leaves(state_p.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_tensor_parallel_training_matches_single_device(tmp_path):
    """TP on a (data=4, model=2) mesh: weights follow their logical
    annotations (heads/mlp -> model axis), optimizer mirrors shard with
    their weights, and losses/parameters match the single-device run.
    Also round-trips a TP-sharded checkpoint (abstract_like preserves
    shardings so orbax restores straight onto the mesh)."""
    from jax.sharding import NamedSharding

    assert jax.device_count() >= 8
    window = 128
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=32, window_size=window, num_layers=2,
        num_heads=4, use_relative_attention=True, band_block_size=128,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    dataset = WindowDataset(
        _toy_stream(3 * 8 * (window + 1)), batch_size=8, window_size=window,
        shuffle=False,
    )

    single = Trainer(Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-2)
    state_s = single.init_state(8, window)

    mesh = create_mesh(data=4, model=2)
    parallel = Trainer(
        Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-2, mesh=mesh
    )
    state_p = parallel.init_state(8, window)

    # The QKV projection must actually be sharded over the model axis.
    qkv = state_p.params["h_1"]["attn"]["c_attn"]["kernel"]
    assert isinstance(qkv.sharding, NamedSharding)
    assert "model" in tuple(qkv.sharding.spec)
    rel = state_p.params["h_1"]["attn"]["rel_embedding"]
    assert "model" in tuple(rel.sharding.spec)

    rng = jax.random.PRNGKey(0)
    for x, y in dataset:
        rng, step_rng = jax.random.split(rng)
        state_s, metrics_s, _ = single.train_step(
            state_s, jnp.asarray(x), jnp.asarray(y), step_rng, None
        )
        xp, yp = parallel._place_batch(x, y)
        state_p, metrics_p, _ = parallel.train_step(state_p, xp, yp, step_rng, None)
        np.testing.assert_allclose(
            float(metrics_s["loss"]), float(metrics_p["loss"]), rtol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_s.params),
        jax.tree_util.tree_leaves(state_p.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)

    # Checkpoint round-trip keeps the TP placement (abstract_like carries
    # shardings, so orbax restores each weight straight onto its shards).
    import flax

    from composer_tpu.train.checkpoint import CheckpointManager

    CheckpointManager(tmp_path).save(1, flax.serialization.to_state_dict(state_p))
    restored = parallel.restore(tmp_path, 8, window)
    r_qkv = restored.params["h_1"]["attn"]["c_attn"]["kernel"]
    assert "model" in tuple(r_qkv.sharding.spec)
    np.testing.assert_array_equal(
        np.asarray(r_qkv),
        np.asarray(state_p.params["h_1"]["attn"]["c_attn"]["kernel"]),
    )


def test_flash_attention_trains_through_shard_map_on_a_mesh():
    """use_pallas_attention under a multi-device mesh: pallas_call is opaque
    to GSPMD, so the Trainer puts the mesh on the model config and the
    attention gate runs the kernel per-shard via shard_map over
    (batch, heads). Same kernel as single-device -> losses match tightly."""
    assert jax.device_count() >= 8
    window = 128
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=32, window_size=window, num_layers=1,
        num_heads=2, use_relative_attention=True, use_pallas_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    dataset = WindowDataset(
        _toy_stream(2 * 8 * (window + 1)), batch_size=8, window_size=window,
        shuffle=False,
    )

    single = Trainer(Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-2)
    state_s = single.init_state(8, window)
    mesh = create_mesh(data=4, model=2)
    parallel = Trainer(
        Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-2, mesh=mesh
    )
    assert parallel.model.config.use_pallas_attention is True  # no fallback
    assert parallel.model.config.flash_mesh is mesh
    state_p = parallel.init_state(8, window)

    rng = jax.random.PRNGKey(0)
    for x, y in dataset:
        rng, step_rng = jax.random.split(rng)
        state_s, metrics_s, _ = single.train_step(
            state_s, jnp.asarray(x), jnp.asarray(y), step_rng, None
        )
        xp, yp = parallel._place_batch(x, y)
        state_p, metrics_p, _ = parallel.train_step(state_p, xp, yp, step_rng, None)
        np.testing.assert_allclose(
            float(metrics_s["loss"]), float(metrics_p["loss"]), rtol=1e-5
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(state_s.params),
        jax.tree_util.tree_leaves(state_p.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_fused_evaluate_matches_per_batch_loop():
    """evaluate() scans batches in chunks (one dispatch per chunk instead of
    one per batch); the metrics and the threaded RNN carry must match the
    per-batch loop exactly, including across a partial trailing chunk."""
    from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig

    stream = np.random.default_rng(0).integers(0, 64, 4000).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=4, window_size=16, shuffle=False)

    trainers = [
        Trainer(_tiny_transformer(), ModelType.TRANSFORMER, 1e-3),
        Trainer(
            MusicRNN(MusicRNNConfig(vocab_size=VOCAB, embed_dim=8,
                                    layer_sizes=(16,), dropout_rates=(0.0,))),
            ModelType.MUSIC_RNN, 1e-3,
        ),
    ]
    for trainer in trainers:
        state = trainer.init_state(4, 16)
        fused = trainer.evaluate(dataset, state, scan_chunk=7)  # forces a remainder
        carry = trainer.init_rnn_carry(4)
        total_loss = total_accuracy = count = 0.0
        for x, y in dataset:
            metrics, carry = trainer.eval_step(
                state, jnp.asarray(x), jnp.asarray(y), carry
            )
            total_loss += float(metrics["loss"])
            total_accuracy += float(metrics["accuracy"])
            count += 1
        assert abs(fused["loss"] - total_loss / count) < 1e-5
        assert abs(fused["accuracy"] - total_accuracy / count) < 1e-5


def test_mesh_evaluate_matches_single_device():
    """The mesh evaluate path (deferred one-shot metric fetch) must produce
    the single-device evaluate's metrics exactly."""
    assert jax.device_count() >= 8
    stream = np.random.default_rng(2).integers(0, VOCAB, 3000).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=8, window_size=16, shuffle=False)

    single = Trainer(_tiny_transformer(), ModelType.TRANSFORMER, 1e-3)
    state_s = single.init_state(8, 16)
    expected = single.evaluate(dataset, state_s)

    mesh = create_mesh(data=8, model=1)
    parallel = Trainer(_tiny_transformer(), ModelType.TRANSFORMER, 1e-3, mesh=mesh)
    state_p = parallel.init_state(8, 16)
    got = parallel.evaluate(dataset, state_p)

    assert abs(got["loss"] - expected["loss"]) < 1e-5
    assert abs(got["accuracy"] - expected["accuracy"]) < 1e-5


def test_deferred_metrics_cover_every_step(tmp_path):
    """The chunked metric fetch (trainer.py) must still record one loss and
    one accuracy scalar per global step, in order, with no gaps — including
    the sub-chunk tail at epoch end."""
    import json

    dataset = WindowDataset(_toy_stream(3000), batch_size=4, window_size=16, shuffle=False)
    trainer = Trainer(_tiny_transformer(), ModelType.TRANSFORMER, learning_rate=1e-2)
    state = trainer.init_state(4, 16)
    logdir = tmp_path / "run"
    trainer.train(dataset, state, logdir, epochs=2, show_progress_bar=False)

    rows = [json.loads(l) for l in (logdir / "train" / "metrics.jsonl").open()]
    loss_steps = [r["step"] for r in rows if r["name"] == "loss"]
    expected = 2 * len(dataset)
    assert loss_steps == list(range(1, expected + 1)), loss_steps
    acc_steps = [r["step"] for r in rows if r["name"] == "accuracy"]
    assert acc_steps == loss_steps


def test_warmup_and_clipping_optimizer():
    """warmup_steps ramps the LR from zero; gradient_clip_norm bounds the
    update; defaults reproduce bare Adam."""
    from composer_tpu.train.trainer import make_optimizer

    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 100.0)}

    # Warmup: the very first update must be (near) zero.
    opt = make_optimizer(1e-1, warmup_steps=10)
    opt_state = opt.init(params)
    updates, _ = opt.update(grads, opt_state, params)
    assert float(jnp.abs(updates["w"]).max()) < 1e-6

    # Clipping: global grad norm capped before Adam normalizes.
    opt = make_optimizer(1e-1, gradient_clip_norm=1.0)
    opt_state = opt.init(params)
    updates, _ = opt.update(grads, opt_state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))

    # Defaults: plain Adam first step is -lr * sign-ish update.
    opt = make_optimizer(1e-1)
    opt_state = opt.init(params)
    updates, _ = opt.update(grads, opt_state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-3)


def test_dropout_rng_impl_policy():
    """On non-TPU backends the dropout key stays on the default threefry
    impl; an explicit 'rbg' request produces a typed rbg key that drives a
    dropout-on train step (the TPU fast path, exercised here on CPU)."""
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=16, num_layers=1,
        num_heads=2, attention_dropout_rate=0.2, residual_dropout_rate=0.2,
    )

    auto = Trainer(Transformer(config), ModelType.TRANSFORMER, 1e-2)
    key = auto.make_dropout_rng()
    assert jax.default_backend() == "cpu"
    np.testing.assert_array_equal(
        np.asarray(key), np.asarray(jax.random.PRNGKey(auto.seed + 1))
    )

    explicit = Trainer(
        Transformer(config), ModelType.TRANSFORMER, 1e-2,
        dropout_rng_impl="rbg",
    )
    rbg_key = explicit.make_dropout_rng()
    assert str(jax.random.key_impl(rbg_key)) == "rbg"

    # The typed key flows through the jitted dropout-on step.
    state = explicit.init_state(2, 16)
    x = jnp.zeros((2, 16), jnp.int32)
    y = jnp.zeros((2, 16), jnp.int32)
    state, metrics, _ = explicit.train_step(state, x, y, rbg_key, None)
    assert np.isfinite(float(metrics["loss"]))

    # Masks are deterministic per key: same key, same loss.
    state2 = explicit.init_state(2, 16)
    _, metrics2, _ = explicit.train_step(state2, x, y, rbg_key, None)
    assert float(metrics["loss"]) == float(metrics2["loss"])
