"""Numerics parity against the ACTUAL reference implementation.

These tests import the upstream TF reference (via tests/_reference.py) and
pin, with copied weights:

* Transformer logits, both attention variants, both copy directions
  (reference transformer.py:599-833),
* KV-cached incremental decode against the reference's ``past`` threading
  (reference transformer.py:735-742, 423-437),
* 6-step Adam train-loss trajectories with identical data (reference
  transformer.py:846-960),
* MusicRNN logits (with and without batch norm) and its train trajectory
  (reference music_rnn.py:50-276),
* a shared-dataset evaluate NLL (reference cli.py:600-615).

This replaces hand-built torch/NumPy replicas as the parity authority: any
misreading of the reference architecture fails here directly.

Shapes are tiny because the reference runs eagerly on CPU.
"""

import numpy as np
import pytest

import tests._reference as ref  # noqa: F401  (performs the import shimming)

import tensorflow as tf

from composer.models import transformer as ref_transformer
from composer.models import music_rnn as ref_music_rnn

import jax
import jax.numpy as jnp

from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
from composer_tpu.models.music_rnn import init_state as rnn_init_state
from composer_tpu.models.transformer import Transformer, TransformerConfig, init_cache

VOCAB = 61
EMBED = 32
WINDOW = 16
LAYERS = 2
HEADS = 4


# --------------------------------------------------------------------------- helpers
def tiny_config(use_relative, **overrides):
    kwargs = dict(
        vocab_size=VOCAB, embed_dim=EMBED, window_size=WINDOW,
        num_layers=LAYERS, num_heads=HEADS, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        band_block_size=0,
    )
    kwargs.update(overrides)
    return TransformerConfig(**kwargs)


def build_reference_transformer(use_relative, batch, seq):
    """Builds (and traces once, to create weights) a reference Transformer."""
    model = ref_transformer.Transformer(
        vocab_size=VOCAB, embedding_size=EMBED, window_size=WINDOW,
        decoder_layers_count=LAYERS, attention_head_count=HEADS,
        use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    tokens = tf.zeros((batch, seq), dtype=tf.int32)
    model(tokens, training=False)
    return model


def ref_transformer_params(model, use_relative):
    """Copies reference variables into the flax param-tree layout.

    Reference Conv1D computes ``y = x @ W + b`` with W of shape (in, out)
    (reference transformer.py:203-209) — identical to a flax Dense kernel, so
    every copy below is transpose-free. The relative-attention E is
    (heads, batch*seq, depth) (reference transformer.py:285); with batch=1
    and seq=window it matches our per-position (heads, window, depth) table
    row-for-row.
    """
    params = {
        "wte": model.wte.weight.numpy(),
        "wpe": model.wpe.embeddings.numpy(),
        "ln_f": {
            "scale": model.ln_f.gamma.numpy(),
            "bias": model.ln_f.beta.numpy(),
        },
    }
    for index, block in enumerate(model.decoder_blocks):
        attn = {
            "c_attn": {
                "kernel": block.attn.c_attn.weight.numpy(),
                "bias": block.attn.c_attn.bias.numpy().reshape(-1),
            },
            "c_proj": {
                "kernel": block.attn.c_proj.weight.numpy(),
                "bias": block.attn.c_proj.bias.numpy().reshape(-1),
            },
        }
        if use_relative:
            attn["rel_embedding"] = block.attn.E.numpy()
        params[f"h_{index + 1}"] = {
            "ln_1": {
                "scale": block.ln_1.gamma.numpy(),
                "bias": block.ln_1.beta.numpy(),
            },
            "ln_2": {
                "scale": block.ln_2.gamma.numpy(),
                "bias": block.ln_2.beta.numpy(),
            },
            "attn": attn,
            "mlp": {
                "c_fc": {
                    "kernel": block.mlp.c_fc.weight.numpy(),
                    "bias": block.mlp.c_fc.bias.numpy().reshape(-1),
                },
                "c_proj": {
                    "kernel": block.mlp.c_proj.weight.numpy(),
                    "bias": block.mlp.c_proj.bias.numpy().reshape(-1),
                },
            },
        }
    return jax.tree.map(jnp.asarray, params)


def assign_flax_to_reference(params, model, use_relative):
    """The reverse copy: flax params -> reference variables."""
    params = jax.device_get(params)
    model.wte.weight.assign(params["wte"])
    model.wpe.embeddings.assign(params["wpe"])
    model.ln_f.gamma.assign(params["ln_f"]["scale"])
    model.ln_f.beta.assign(params["ln_f"]["bias"])
    for index, block in enumerate(model.decoder_blocks):
        p = params[f"h_{index + 1}"]
        block.ln_1.gamma.assign(p["ln_1"]["scale"])
        block.ln_1.beta.assign(p["ln_1"]["bias"])
        block.ln_2.gamma.assign(p["ln_2"]["scale"])
        block.ln_2.beta.assign(p["ln_2"]["bias"])
        block.attn.c_attn.weight.assign(p["attn"]["c_attn"]["kernel"])
        block.attn.c_attn.bias.assign(p["attn"]["c_attn"]["bias"][None, :])
        block.attn.c_proj.weight.assign(p["attn"]["c_proj"]["kernel"])
        block.attn.c_proj.bias.assign(p["attn"]["c_proj"]["bias"][None, :])
        if use_relative:
            block.attn.E.assign(p["attn"]["rel_embedding"])
        block.mlp.c_fc.weight.assign(p["mlp"]["c_fc"]["kernel"])
        block.mlp.c_fc.bias.assign(p["mlp"]["c_fc"]["bias"][None, :])
        block.mlp.c_proj.weight.assign(p["mlp"]["c_proj"]["kernel"])
        block.mlp.c_proj.bias.assign(p["mlp"]["c_proj"]["bias"][None, :])


# --------------------------------------------------------------------------- logits
@pytest.mark.parametrize("use_relative", [False, True])
def test_transformer_logits_vs_reference(use_relative):
    # The reference's E couples (batch*seq) into one axis (transformer.py:285),
    # so its relative attention only runs at batch=1 with seq=window.
    batch, seq = (1, WINDOW) if use_relative else (2, 12)
    ref_model = build_reference_transformer(use_relative, batch, seq)

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, VOCAB, (batch, seq)).astype(np.int32)

    ref_logits = ref_model(tf.constant(tokens), training=False)[0].numpy()

    config = tiny_config(use_relative)
    model = Transformer(config)
    params = ref_transformer_params(ref_model, use_relative)
    flax_logits, _ = model.apply({"params": params}, jnp.asarray(tokens))

    np.testing.assert_allclose(
        np.asarray(flax_logits), ref_logits, rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("use_relative", [False, True])
def test_transformer_logits_reverse_direction(use_relative):
    """JAX-initialized weights pushed INTO the reference; same logits."""
    batch, seq = (1, WINDOW) if use_relative else (2, 10)
    ref_model = build_reference_transformer(use_relative, batch, seq)

    config = tiny_config(use_relative)
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(5), batch, seq)
    assign_flax_to_reference(params, ref_model, use_relative)

    rng = np.random.default_rng(13)
    tokens = rng.integers(0, VOCAB, (batch, seq)).astype(np.int32)

    ref_logits = ref_model(tf.constant(tokens), training=False)[0].numpy()
    flax_logits, _ = model.apply({"params": params}, jnp.asarray(tokens))

    np.testing.assert_allclose(
        np.asarray(flax_logits), ref_logits, rtol=2e-4, atol=2e-4
    )


# --------------------------------------------------------------------------- KV cache
def test_transformer_kv_cache_vs_reference():
    """Incremental decode with our preallocated cache matches the reference's
    ``past``-threaded decode step-for-step (which the reference model supports
    even though its CLI never used it — reference cli.py:663-676)."""
    batch, prompt_len, steps = 2, 6, 5
    ref_model = build_reference_transformer(False, batch, prompt_len)

    rng = np.random.default_rng(17)
    prompt = rng.integers(0, VOCAB, (batch, prompt_len)).astype(np.int32)
    next_tokens = rng.integers(0, VOCAB, (steps, batch)).astype(np.int32)

    # Reference: prefill, then one token at a time threading `past`.
    ref_logits_seq = []
    logits, presents = ref_model(tf.constant(prompt), training=False)[:2]
    ref_logits_seq.append(logits.numpy()[:, -1])
    for step in range(steps):
        token = tf.constant(next_tokens[step][:, None])
        logits, presents = ref_model(token, past=presents, training=False)[:2]
        ref_logits_seq.append(logits.numpy()[:, -1])

    # Ours: prefill into the preallocated cache, then 1-token steps.
    config = tiny_config(False)
    model = Transformer(config)
    params = ref_transformer_params(ref_model, False)
    cache = init_cache(config, batch, WINDOW)

    flax_logits_seq = []
    logits, cache = model.apply({"params": params}, jnp.asarray(prompt), cache)
    flax_logits_seq.append(np.asarray(logits)[:, -1])
    for step in range(steps):
        token = jnp.asarray(next_tokens[step][:, None])
        logits, cache = model.apply({"params": params}, token, cache)
        flax_logits_seq.append(np.asarray(logits)[:, -1])

    for ours, theirs in zip(flax_logits_seq, ref_logits_seq):
        np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


# --------------------------------------------------------------------------- training
def test_transformer_train_trajectory_vs_reference():
    """6 Adam steps on identical batches: loss trajectories must agree.

    Reproduces the reference loop body exactly (transformer.py:916-921):
    Adam(1e-3) with Keras defaults, mean sparse softmax CE on logits.
    """
    from composer_tpu.models import ModelType
    from composer_tpu.train.trainer import Trainer

    batch, seq, steps, lr = 4, WINDOW, 6, 1e-3
    ref_model = build_reference_transformer(False, batch, seq)

    config = tiny_config(False)
    model = Transformer(config)
    params = ref_transformer_params(ref_model, False)

    rng = np.random.default_rng(23)
    xs = rng.integers(0, VOCAB, (steps, batch, seq)).astype(np.int32)
    ys = rng.integers(0, VOCAB, (steps, batch, seq)).astype(np.int32)

    optimizer = tf.keras.optimizers.Adam(learning_rate=lr)
    loss_object = tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True)
    ref_losses = []
    for step in range(steps):
        with tf.GradientTape() as tape:
            predictions, _ = ref_model(tf.constant(xs[step]), training=True)
            loss = loss_object(y_true=ys[step], y_pred=predictions)
        grads = tape.gradient(loss, ref_model.trainable_variables)
        optimizer.apply_gradients(zip(grads, ref_model.trainable_variables))
        ref_losses.append(float(loss))

    trainer = Trainer(model, ModelType.TRANSFORMER, learning_rate=lr)
    state = trainer.init_state(batch, seq)
    state = state.replace(
        params=params, opt_state=trainer.optimizer.init(params)
    )
    our_losses = []
    step_rng = jax.random.PRNGKey(0)  # dropout rates are all 0.0
    for step in range(steps):
        state, metrics, _ = trainer.train_step(
            state, jnp.asarray(xs[step]), jnp.asarray(ys[step]), step_rng, None
        )
        our_losses.append(float(metrics["loss"]))

    # Keras folds its epsilon into the pre-bias-correction denominator
    # (effective eps differs by 1/sqrt(1-beta2^t)); tolerance covers that.
    np.testing.assert_allclose(our_losses, ref_losses, rtol=1e-3, atol=1e-3)


def test_transformer_rel_train_trajectory_vs_reference():
    """Relative-attention training parity: 5 Adam steps at batch 1 (the
    reference's E couples batch*seq, so batch 1 x seq=window is its only
    runnable rel shape). Pins the E gradient path (skew backward) against
    the reference's autodiff."""
    from composer_tpu.models import ModelType
    from composer_tpu.train.trainer import Trainer

    batch, seq, steps, lr = 1, WINDOW, 5, 1e-3
    ref_model = build_reference_transformer(True, batch, seq)

    config = tiny_config(True)
    model = Transformer(config)
    params = ref_transformer_params(ref_model, True)

    rng = np.random.default_rng(43)
    xs = rng.integers(0, VOCAB, (steps, batch, seq)).astype(np.int32)
    ys = rng.integers(0, VOCAB, (steps, batch, seq)).astype(np.int32)

    optimizer = tf.keras.optimizers.Adam(learning_rate=lr)
    loss_object = tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True)
    ref_losses = []
    for step in range(steps):
        with tf.GradientTape() as tape:
            predictions, _ = ref_model(tf.constant(xs[step]), training=True)
            loss = loss_object(y_true=ys[step], y_pred=predictions)
        grads = tape.gradient(loss, ref_model.trainable_variables)
        optimizer.apply_gradients(zip(grads, ref_model.trainable_variables))
        ref_losses.append(float(loss))

    trainer = Trainer(model, ModelType.TRANSFORMER, learning_rate=lr)
    state = trainer.init_state(batch, seq)
    state = state.replace(params=params, opt_state=trainer.optimizer.init(params))
    our_losses = []
    step_rng = jax.random.PRNGKey(0)
    for step in range(steps):
        state, metrics, _ = trainer.train_step(
            state, jnp.asarray(xs[step]), jnp.asarray(ys[step]), step_rng, None
        )
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------- MusicRNN
RNN_EMBED = 16
RNN_SIZES = (24, 24)


def build_reference_rnn(batch, use_bn):
    model = ref_music_rnn.MusicRNN(
        vocab_size=VOCAB, batch_size=batch, embedding_size=RNN_EMBED,
        lstm_layers_count=len(RNN_SIZES), lstm_layer_sizes=np.array(RNN_SIZES),
        lstm_dropout_probability=np.zeros(len(RNN_SIZES)),
        use_batch_normalization=use_bn,
    )
    model(tf.zeros((batch, 4), dtype=tf.int32))
    model.reset_states()
    return model


def ref_rnn_variables(model, use_bn):
    """Copies reference Keras variables into the flax variable collections.

    Keras LSTM packs gates [i, f, g(c), o] along the last axis of `kernel`
    (in, 4H) / `recurrent_kernel` (H, 4H) / `bias` (4H); flax's
    OptimizedLSTMCell keeps per-gate dense layers (input kernels bias-free,
    hidden kernels carrying the bias).
    """
    params = {
        "embedding": {"embedding": model.embedding_layer.embeddings.numpy()},
        "output": {
            "kernel": model.output_layer.kernel.numpy(),
            "bias": model.output_layer.bias.numpy(),
        },
    }
    batch_stats = {}
    for index, lstm in enumerate(model.lstm_layers):
        hidden = RNN_SIZES[index]
        kernel = lstm.cell.kernel.numpy()
        recurrent = lstm.cell.recurrent_kernel.numpy()
        bias = lstm.cell.bias.numpy()
        cell = {}
        for g, name in enumerate(["i", "f", "g", "o"]):
            sl = slice(g * hidden, (g + 1) * hidden)
            cell[f"i{name}"] = {"kernel": kernel[:, sl]}
            cell[f"h{name}"] = {"kernel": recurrent[:, sl], "bias": bias[sl]}
        params[f"OptimizedLSTMCell_{index}"] = cell
        if use_bn:
            bn = model.normalization_layers[index]
            params[f"batch_norm_{index}"] = {
                "scale": bn.gamma.numpy(),
                "bias": bn.beta.numpy(),
            }
            batch_stats[f"batch_norm_{index}"] = {
                "mean": bn.moving_mean.numpy(),
                "var": bn.moving_variance.numpy(),
            }
    variables = {"params": params}
    if use_bn:
        variables["batch_stats"] = batch_stats
    return jax.tree.map(jnp.asarray, variables)


@pytest.mark.parametrize("use_bn", [False, True])
def test_music_rnn_logits_vs_reference(use_bn):
    batch, seq = 3, 9
    ref_model = build_reference_rnn(batch, use_bn)

    rng = np.random.default_rng(29)
    tokens = rng.integers(0, VOCAB, (batch, seq)).astype(np.int32)

    ref_model.reset_states()
    ref_logits = ref_model(tf.constant(tokens), training=False).numpy()

    config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=RNN_EMBED, layer_sizes=RNN_SIZES,
        dropout_rates=(0.0,) * len(RNN_SIZES), use_batch_normalization=use_bn,
    )
    model = MusicRNN(config)
    variables = ref_rnn_variables(ref_model, use_bn)
    flax_logits, _ = model.apply(variables, jnp.asarray(tokens))

    np.testing.assert_allclose(
        np.asarray(flax_logits), ref_logits, rtol=2e-4, atol=2e-4
    )


def test_music_rnn_stateful_carry_vs_reference():
    """Keras stateful=True carries LSTM state across calls; our explicit
    carry must reproduce call 2 given call 1 (reference music_rnn.py:108)."""
    batch, seq = 2, 7
    ref_model = build_reference_rnn(batch, use_bn=False)

    rng = np.random.default_rng(31)
    first = rng.integers(0, VOCAB, (batch, seq)).astype(np.int32)
    second = rng.integers(0, VOCAB, (batch, seq)).astype(np.int32)

    ref_model.reset_states()
    ref_model(tf.constant(first), training=False)
    ref_logits2 = ref_model(tf.constant(second), training=False).numpy()

    config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=RNN_EMBED, layer_sizes=RNN_SIZES,
        dropout_rates=(0.0,) * len(RNN_SIZES), use_batch_normalization=False,
    )
    model = MusicRNN(config)
    variables = ref_rnn_variables(ref_model, use_bn=False)
    carry = rnn_init_state(config, batch)
    _, carry = model.apply(variables, jnp.asarray(first), carry)
    flax_logits2, _ = model.apply(variables, jnp.asarray(second), carry)

    np.testing.assert_allclose(
        np.asarray(flax_logits2), ref_logits2, rtol=3e-4, atol=3e-4
    )


def test_music_rnn_train_trajectory_vs_reference():
    """5 Adam steps (reference music_rnn.py:220-276 loop body) with the
    stateful carry threaded across steps, batch norm in training mode."""
    from composer_tpu.models import ModelType
    from composer_tpu.train.trainer import Trainer

    batch, seq, steps, lr = 3, 8, 5, 1e-3
    ref_model = build_reference_rnn(batch, use_bn=True)

    rng = np.random.default_rng(37)
    xs = rng.integers(0, VOCAB, (steps, batch, seq)).astype(np.int32)
    ys = rng.integers(0, VOCAB, (steps, batch, seq)).astype(np.int32)

    # Copy the weights BEFORE the reference loop mutates them.
    config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=RNN_EMBED, layer_sizes=RNN_SIZES,
        dropout_rates=(0.0,) * len(RNN_SIZES), use_batch_normalization=True,
    )
    model = MusicRNN(config)
    variables = ref_rnn_variables(ref_model, use_bn=True)

    optimizer = tf.keras.optimizers.Adam(learning_rate=lr)
    loss_object = tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True)
    ref_model.reset_states()
    ref_losses = []
    for step in range(steps):
        with tf.GradientTape() as tape:
            predictions = ref_model(tf.constant(xs[step]), training=True)
            loss = loss_object(y_true=ys[step], y_pred=predictions)
        grads = tape.gradient(loss, ref_model.trainable_variables)
        optimizer.apply_gradients(zip(grads, ref_model.trainable_variables))
        ref_losses.append(float(loss))

    trainer = Trainer(model, ModelType.MUSIC_RNN, learning_rate=lr)
    state = trainer.init_state(batch, seq)
    state = state.replace(
        params=variables["params"],
        opt_state=trainer.optimizer.init(variables["params"]),
        extra_vars={"batch_stats": variables["batch_stats"]},
    )
    carry = rnn_init_state(config, batch)
    our_losses = []
    step_rng = jax.random.PRNGKey(0)
    for step in range(steps):
        state, metrics, carry = trainer.train_step(
            state, jnp.asarray(xs[step]), jnp.asarray(ys[step]), step_rng, carry
        )
        our_losses.append(float(metrics["loss"]))

    np.testing.assert_allclose(our_losses, ref_losses, rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------- evaluate
def test_evaluate_nll_vs_reference():
    """Mean NLL over a shared synthetic evaluation set (the `composer
    evaluate` parity surface, reference cli.py:600-615)."""
    batch, seq, batches = 4, WINDOW, 6
    ref_model = build_reference_transformer(False, batch, seq)

    config = tiny_config(False)
    model = Transformer(config)
    params = ref_transformer_params(ref_model, False)

    rng = np.random.default_rng(41)
    xs = rng.integers(0, VOCAB, (batches, batch, seq)).astype(np.int32)
    ys = rng.integers(0, VOCAB, (batches, batch, seq)).astype(np.int32)

    loss_object = tf.keras.losses.SparseCategoricalCrossentropy(from_logits=True)
    ref_nll = float(np.mean([
        float(loss_object(ys[i], ref_model(tf.constant(xs[i]), training=False)[0]))
        for i in range(batches)
    ]))

    import optax

    our_nll = float(np.mean([
        float(
            optax.softmax_cross_entropy_with_integer_labels(
                model.apply({"params": params}, jnp.asarray(xs[i]))[0],
                jnp.asarray(ys[i]),
            ).mean()
        )
        for i in range(batches)
    ]))

    assert abs(our_nll - ref_nll) < 1e-4, (our_nll, ref_nll)


# --------------------------------------------------------------------------- import
def test_import_reference_transformer_checkpoint(tmp_path):
    """A real tf.train.Checkpoint saved the reference way imports into our
    format; restoring it through the Trainer reproduces the reference's
    logits, and the step/epoch counters carry over."""
    import composer_tpu.config as config_lib
    from composer_tpu.models import ModelType, create_model
    from composer_tpu.train.import_reference import import_reference_checkpoint
    from composer_tpu.train.trainer import Trainer

    # A config matching the tiny reference model.
    config = config_lib.get_default()
    section = config.transformer.model
    section["window_size"] = WINDOW
    section["embedding_size"] = EMBED
    section["decoder_layers_count"] = LAYERS
    section["attention_head_count"] = HEADS
    section["use_relative_attention"] = True
    config.transformer.train["batch_size"] = 1

    # The vocab comes from the codec config; force it to the test VOCAB by
    # building the trainer manually around a matching model.
    from composer_tpu.models.transformer import Transformer

    model_config = tiny_config(True)
    trainer = Trainer(Transformer(model_config), ModelType.TRANSFORMER, 1e-3)

    ref_model = build_reference_transformer(True, 1, WINDOW)
    ckpt = tf.train.Checkpoint(
        step=tf.Variable(41), epoch=tf.Variable(7),
        optimizer=tf.keras.optimizers.Adam(1e-3), model=ref_model,
    )
    ckpt_dir = tmp_path / "ref_ckpt"
    tf.train.CheckpointManager(ckpt, str(ckpt_dir), max_to_keep=1).save()

    logdir = tmp_path / "imported"
    state = import_reference_checkpoint(
        ModelType.TRANSFORMER, ckpt_dir, logdir, config, trainer=trainer
    )
    assert int(state.step) == 41 and int(state.epoch) == 7

    # Round-trip through OUR checkpoint files too.
    restored = trainer.restore(logdir, 1, WINDOW)

    rng = np.random.default_rng(51)
    tokens = rng.integers(0, VOCAB, (1, WINDOW)).astype(np.int32)
    ref_logits = ref_model(tf.constant(tokens), training=False)[0].numpy()
    our_logits, _ = trainer.model.apply(
        {"params": restored.params}, jnp.asarray(tokens)
    )
    np.testing.assert_allclose(
        np.asarray(our_logits), ref_logits, rtol=2e-4, atol=2e-4
    )


def test_import_reference_rnn_checkpoint(tmp_path):
    """MusicRNN import: weights + batch-norm moving statistics transfer."""
    import composer_tpu.config as config_lib
    from composer_tpu.models import ModelType
    from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
    from composer_tpu.train.import_reference import import_reference_checkpoint
    from composer_tpu.train.trainer import Trainer

    config = config_lib.get_default()

    model_config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=RNN_EMBED, layer_sizes=RNN_SIZES,
        dropout_rates=(0.0,) * len(RNN_SIZES), use_batch_normalization=True,
    )
    trainer = Trainer(MusicRNN(model_config), ModelType.MUSIC_RNN, 1e-3)

    ref_model = build_reference_rnn(3, use_bn=True)
    # Give the moving statistics non-initial values via a training call.
    ref_model(tf.constant(np.arange(12, dtype=np.int32).reshape(3, 4) % VOCAB),
              training=True)
    ref_model.reset_states()

    ckpt = tf.train.Checkpoint(
        step=tf.Variable(5), epoch=tf.Variable(2),
        optimizer=tf.keras.optimizers.Adam(1e-3), model=ref_model,
    )
    ckpt_dir = tmp_path / "ref_rnn_ckpt"
    tf.train.CheckpointManager(ckpt, str(ckpt_dir), max_to_keep=1).save()

    logdir = tmp_path / "imported_rnn"
    import composer_tpu.models as models_pkg

    state = import_reference_checkpoint(
        ModelType.MUSIC_RNN, ckpt_dir, logdir, config, trainer=trainer
    )
    restored = trainer.restore(logdir, 3, 9)

    rng = np.random.default_rng(53)
    tokens = rng.integers(0, VOCAB, (3, 9)).astype(np.int32)
    ref_model.reset_states()
    ref_logits = ref_model(tf.constant(tokens), training=False).numpy()
    our_logits, _ = trainer.model.apply(
        {"params": restored.params, **restored.extra_vars}, jnp.asarray(tokens)
    )
    np.testing.assert_allclose(
        np.asarray(our_logits), ref_logits, rtol=3e-4, atol=3e-4
    )


def test_import_rejects_wrong_shapes(tmp_path):
    from composer_tpu.exceptions import CheckpointError
    from composer_tpu.models import ModelType
    from composer_tpu.train.import_reference import import_reference_checkpoint
    from composer_tpu.models.transformer import Transformer
    from composer_tpu.train.trainer import Trainer
    import composer_tpu.config as config_lib

    ref_model = build_reference_transformer(False, 1, 8)
    ckpt = tf.train.Checkpoint(
        step=tf.Variable(1), epoch=tf.Variable(1),
        optimizer=tf.keras.optimizers.Adam(1e-3), model=ref_model,
    )
    ckpt_dir = tmp_path / "ckpt"
    tf.train.CheckpointManager(ckpt, str(ckpt_dir), max_to_keep=1).save()

    # Mismatched config: different embed dim.
    wrong = tiny_config(False, embed_dim=EMBED * 2)
    trainer = Trainer(Transformer(wrong), ModelType.TRANSFORMER, 1e-3)
    config = config_lib.get_default()
    with pytest.raises(CheckpointError):
        import_reference_checkpoint(
            ModelType.TRANSFORMER, ckpt_dir, tmp_path / "out", config,
            trainer=trainer,
        )
