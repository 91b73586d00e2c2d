"""MusicRNN numerics pinned against an independent NumPy LSTM replica.

Validates the LSTM cell semantics (gate math, carry threading), batch-norm
inference, and the output head from first principles — the recurrence in the
model runs through flax's scan/OptimizedLSTMCell, the replica is a hand-rolled
loop.
"""

import jax
import numpy as np
import pytest

from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig

VOCAB = 30


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def numpy_forward(variables, config, tokens):
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"]) if "batch_stats" in variables else {}

    x = params["embedding"]["embedding"][tokens]  # (B, T, E)
    batch, time, _ = x.shape

    for index, hidden in enumerate(config.layer_sizes):
        cell = params[f"OptimizedLSTMCell_{index}"]
        c = np.zeros((batch, hidden))
        h = np.zeros((batch, hidden))
        outputs = []
        for t in range(time):
            step = x[:, t]
            # flax LSTM gates: i/f/g/o; input kernels are bias-free, hidden
            # kernels carry the bias.
            gate_i = _sigmoid(step @ cell["ii"]["kernel"] + h @ cell["hi"]["kernel"] + cell["hi"]["bias"])
            gate_f = _sigmoid(step @ cell["if"]["kernel"] + h @ cell["hf"]["kernel"] + cell["hf"]["bias"])
            gate_g = np.tanh(step @ cell["ig"]["kernel"] + h @ cell["hg"]["kernel"] + cell["hg"]["bias"])
            gate_o = _sigmoid(step @ cell["io"]["kernel"] + h @ cell["ho"]["kernel"] + cell["ho"]["bias"])
            c = gate_f * c + gate_i * gate_g
            h = gate_o * np.tanh(c)
            outputs.append(h)
        x = np.stack(outputs, axis=1)

        if config.use_batch_normalization:
            bn = params[f"batch_norm_{index}"]
            running = stats[f"batch_norm_{index}"]
            x = (x - running["mean"]) / np.sqrt(running["var"] + 1e-3)
            x = x * bn["scale"] + bn["bias"]

    return x @ params["output"]["kernel"] + params["output"]["bias"]


@pytest.mark.parametrize("use_bn", [False, True])
def test_music_rnn_matches_numpy(use_bn):
    config = MusicRNNConfig(
        vocab_size=VOCAB, embed_dim=16, layer_sizes=(24, 24),
        dropout_rates=(0.0, 0.0), use_batch_normalization=use_bn,
    )
    model = MusicRNN(config)
    variables = model.init_variables(jax.random.PRNGKey(7), batch_size=3, seq_len=9)

    rng = np.random.default_rng(1)
    tokens = rng.integers(0, VOCAB, (3, 9))

    flax_logits, _ = model.apply(variables, tokens.astype(np.int32))
    numpy_logits = numpy_forward(variables, config, tokens)

    np.testing.assert_allclose(
        np.asarray(flax_logits), numpy_logits, rtol=2e-5, atol=2e-5
    )
