"""MusicRNN: the stateful-LSTM baseline.

Architecture parity with the reference (composer/models/music_rnn.py:16-142):
Embedding -> N x [LSTM -> Dropout -> BatchNorm] -> Dense(vocab) logits.
Defaults (3 x 512, dropout 0.3, batch-norm on) come from default_config.yml.

TPU-first design: the recurrence is a single ``flax.linen.RNN`` scan
(compiled once, no per-step Python), and the LSTM hidden state is an explicit
carry returned to the caller — the functional equivalent of Keras
``stateful=True`` + ``reset_states()`` (music_rnn.py:228), so the train loop
decides when state persists across batches.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MusicRNNConfig:
    vocab_size: int
    embed_dim: int = 256
    layer_sizes: Tuple[int, ...] = (512, 512, 512)
    dropout_rates: Tuple[float, ...] = (0.3, 0.3, 0.3)
    use_batch_normalization: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def init_state(config: MusicRNNConfig, batch_size: int):
    """Zeroed LSTM carries: one (c, h) pair per layer."""
    return tuple(
        (
            jnp.zeros((batch_size, size), dtype=config.dtype),
            jnp.zeros((batch_size, size), dtype=config.dtype),
        )
        for size in config.layer_sizes
    )


class MusicRNN(nn.Module):
    """Returns ``(logits, new_state)``; ``state`` is the per-layer LSTM carry."""

    config: MusicRNNConfig

    @nn.compact
    def __call__(self, tokens, state=None, deterministic: bool = True):
        config = self.config
        batch = tokens.shape[0]
        if state is None:
            state = init_state(config, batch)

        x = nn.Embed(
            config.vocab_size,
            config.embed_dim,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            name="embedding",
        )(tokens)

        new_state = []
        for index, size in enumerate(config.layer_sizes):
            cell = nn.OptimizedLSTMCell(
                size,
                # The reference overrides the recurrent initializer to
                # glorot_uniform (music_rnn.py:107); Keras' input-kernel
                # default is also glorot_uniform.
                kernel_init=nn.initializers.glorot_uniform(),
                recurrent_kernel_init=nn.initializers.glorot_uniform(),
                dtype=config.dtype,
                param_dtype=config.param_dtype,
            )
            carry, x = nn.RNN(
                cell,
                return_carry=True,
                name=f"lstm_{index}",
            )(x, initial_carry=state[index])
            new_state.append(carry)

            if config.dropout_rates[index] > 0:
                x = nn.Dropout(config.dropout_rates[index])(
                    x, deterministic=deterministic
                )
            if config.use_batch_normalization:
                # Normalizes over (batch, time), features last — Keras parity
                # (epsilon 1e-3, momentum 0.99).
                x = nn.BatchNorm(
                    use_running_average=deterministic,
                    momentum=0.99,
                    epsilon=1e-3,
                    dtype=config.dtype,
                    param_dtype=config.param_dtype,
                    name=f"batch_norm_{index}",
                )(x)

        logits = nn.Dense(
            config.vocab_size,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            name="output",
        )(x)
        return logits, tuple(new_state)

    def init_variables(self, rng, batch_size: int = 1, seq_len: int = 16):
        tokens = jnp.zeros((batch_size, seq_len), dtype=jnp.int32)
        return self.init({"params": rng}, tokens)
