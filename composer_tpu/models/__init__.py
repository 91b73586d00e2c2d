"""Model registry and factory.

Parity surface: composer/cli.py:80-183 (ModelType + create_model) and
composer/models/__init__.py (BaseModel). The TPU rebuild replaces the Keras
class hierarchy with Flax modules plus a shared functional trainer; this
module keeps the factory/registry shape so the CLI surface is unchanged.
"""

from __future__ import annotations

import logging
from enum import Enum, unique

from composer_tpu.exceptions import InvalidParameterError
from composer_tpu.midi.vocab import vocabulary_from_config


@unique
class ModelType(Enum):
    MUSIC_RNN = "music_rnn"
    TRANSFORMER = "transformer"


@unique
class EventEncodingType(Enum):
    """How events are fed to the network (models/__init__.py:95-107)."""

    INTEGER = 0
    ONE_HOT = 1


def get_event_vocab_size(config) -> int:
    return vocabulary_from_config(config).size


def _compute_dtype(model_section):
    """Compute dtype for a model section: bf16 on TPU, f32 elsewhere.

    ``mixed_precision: true`` (set in the shipped default_config.yml) runs
    activations/matmuls in bfloat16 on TPU accelerators while parameters and
    the optimizer stay float32 — the idiomatic TPU training setup (the MXU's
    native input precision, f32 accumulation). CPU runs stay float32 so
    golden tests and cross-platform comparisons are deterministic.

    Configs that predate the key (no ``mixed_precision`` entry) stay at the
    reference's full-f32 numerics rather than being silently upgraded; the
    choice is logged once either way when running on TPU.
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return jnp.float32
    if "mixed_precision" not in model_section:
        logging.getLogger(__name__).info(
            "mixed_precision not set in config; keeping float32 numerics "
            "(add 'mixed_precision: true' for bfloat16 TPU training)"
        )
        return jnp.float32
    if bool(model_section["mixed_precision"]):
        logging.getLogger(__name__).info("mixed_precision: bfloat16 compute enabled")
        return jnp.bfloat16
    return jnp.float32


def create_model(model_type: ModelType, config, **overrides):
    """Builds the Flax module for ``model_type`` from the config.

    Returns ``(module, vocab_size)`` like the reference factory
    (cli.py:95-141).
    """
    from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
    from composer_tpu.models.transformer import Transformer, TransformerConfig

    vocab_size = get_event_vocab_size(config)

    if model_type == ModelType.TRANSFORMER:
        section = config.transformer.model
        overrides.setdefault("dtype", _compute_dtype(section))
        model_config = TransformerConfig(
            vocab_size=vocab_size,
            embed_dim=int(section.embedding_size),
            window_size=int(section.window_size),
            num_layers=int(section.decoder_layers_count),
            num_heads=int(section.attention_head_count),
            use_relative_attention=bool(section.use_relative_attention),
            attention_dropout_rate=float(section.attention_dropout_rate),
            residual_dropout_rate=float(section.residual_dropout_rate),
            layer_norm_epsilon=float(section.layer_normalization_epsilon),
            scale_attention=bool(section.scale_attention),
            initializer_mean=float(section.initializer_mean),
            initializer_stddev=float(section.initializer_stddev),
            use_layer_norm=bool(section.use_layer_normalization),
            # Long-context / attention-path knobs (absent keys keep the
            # TransformerConfig defaults: band path on, chunking off).
            band_block_size=int(section.get("band_block_size", 128)),
            attention_chunk_size=int(section.get("attention_chunk_size", 0)),
            remat=bool(section.get("remat", False)),
            # Flash path: O(S) attention memory, fully differentiable
            # (fused Pallas backward incl. in-kernel TPU-PRNG dropout);
            # ops/attention.py falls back to band off-TPU when dropout
            # is active; under a multi-device mesh the Trainer routes the
            # kernel through shard_map (config.flash_mesh).
            use_pallas_attention=bool(section.get("use_pallas_attention", False)),
            **overrides,
        )
        return Transformer(model_config), vocab_size

    if model_type == ModelType.MUSIC_RNN:
        section = config.music_rnn.model
        layer_sizes = section.lstm_layer_sizes
        if not isinstance(layer_sizes, (list, tuple)):
            layer_sizes = [int(layer_sizes)] * int(section.lstm_layers_count)
        dropout = section.lstm_dropout_probability
        if not isinstance(dropout, (list, tuple)):
            dropout = [float(dropout)] * int(section.lstm_layers_count)
        overrides.setdefault("dtype", _compute_dtype(section))
        model_config = MusicRNNConfig(
            vocab_size=vocab_size,
            embed_dim=int(section.embedding_size),
            layer_sizes=tuple(int(s) for s in layer_sizes),
            dropout_rates=tuple(float(d) for d in dropout),
            use_batch_normalization=bool(section.use_batch_normalization),
            **overrides,
        )
        return MusicRNN(model_config), vocab_size

    raise InvalidParameterError(f"Unrecognized model type: '{model_type}'.")


def get_batch_size(model_type: ModelType, config) -> int:
    section = config.music_rnn if model_type == ModelType.MUSIC_RNN else config.transformer
    return int(section.train.batch_size)


def get_learning_rate(model_type: ModelType, config) -> float:
    section = config.music_rnn if model_type == ModelType.MUSIC_RNN else config.transformer
    return float(section.train.learning_rate)


def get_window_size(model_type: ModelType, config) -> int:
    section = config.music_rnn if model_type == ModelType.MUSIC_RNN else config.transformer
    return int(section.model.window_size)
