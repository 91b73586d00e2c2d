"""Import trained checkpoints from the upstream TF reference.

Migration path for reference users: a ``tf.train.Checkpoint(step, epoch,
optimizer, model)`` saved by the reference's train loops (reference
transformer.py:890-900, music_rnn.py:199-209) is read variable-by-variable
(via TensorFlow's checkpoint reader — TF is needed only for this command),
mapped onto our flax parameter trees, and re-saved as an Orbax checkpoint in
our logdir layout — after which ``composer generate/evaluate/train
--restoredir`` work as if the model had been trained here.

What transfers: model weights (exactly — reference Conv1D already stores
``(in, out)`` kernels, see tests/test_reference_parity.py for the pinned
mapping), BatchNorm moving statistics, and the step/epoch counters. The Adam
slot variables do NOT transfer (the optimizer restarts; resumed training
re-warms its moments — noted in the CLI output).

Relative attention: the reference couples its E table to ``batch*seq``
(reference transformer.py:285), so only checkpoints trained at batch 1 (or
with rel attention off — the reference default) have a well-defined
per-position table; anything else is rejected with an explanation.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict

import numpy as np

from composer_tpu.exceptions import CheckpointError
from composer_tpu.models import ModelType

_SUFFIX = "/.ATTRIBUTES/VARIABLE_VALUE"


def read_reference_checkpoint(checkpoint_dir) -> Dict[str, np.ndarray]:
    """Reads every variable of the latest reference checkpoint into a dict
    keyed by object path (``model/wte/weight`` style, suffix stripped)."""
    try:
        import tensorflow as tf  # local import: only this command needs TF
    except Exception as error:  # pragma: no cover - TF present in CI
        raise CheckpointError(
            "Importing a reference checkpoint requires TensorFlow (used "
            f"only to read the checkpoint): {error}"
        ) from None

    checkpoint_dir = str(checkpoint_dir)
    latest = tf.train.latest_checkpoint(checkpoint_dir)
    if latest is None:
        # Accept a direct checkpoint prefix as well as a directory.
        latest = checkpoint_dir
    try:
        reader = tf.train.load_checkpoint(latest)
        shape_map = reader.get_variable_to_shape_map()
    except Exception as error:
        raise CheckpointError(
            f"'{checkpoint_dir}' does not contain a readable TensorFlow "
            f"checkpoint: {error}"
        ) from None

    variables = {}
    for name in shape_map:
        if name.endswith(_SUFFIX):
            variables[name[: -len(_SUFFIX)]] = reader.get_tensor(name)
    if not any(key.startswith("model/") for key in variables):
        raise CheckpointError(
            f"Checkpoint at '{checkpoint_dir}' has no 'model/' variables — "
            "not a reference composer checkpoint."
        )
    return variables


def _get(variables, name):
    try:
        return np.asarray(variables[name])
    except KeyError:
        raise CheckpointError(
            f"Reference checkpoint is missing variable '{name}' — was it "
            "saved by a different model type or architecture?"
        ) from None


def reference_to_transformer_params(variables, config):
    """Maps reference Transformer checkpoint variables onto our param tree.

    The layout mirrors tests/test_reference_parity.py's live-model copy
    (reference Conv1D kernels are (in, out): transpose-free).
    """
    params = {
        "wte": _get(variables, "model/wte/weight"),
        "wpe": _get(variables, "model/wpe/embeddings"),
        "ln_f": {
            "scale": _get(variables, "model/ln_f/gamma"),
            "bias": _get(variables, "model/ln_f/beta"),
        },
    }
    vocab, embed = params["wte"].shape
    if vocab != config.vocab_size or embed != config.embed_dim:
        raise CheckpointError(
            f"Checkpoint model shape (vocab {vocab}, embed {embed}) does not "
            f"match the config (vocab {config.vocab_size}, embed "
            f"{config.embed_dim}); import with the config the reference "
            "model was trained with."
        )
    window = params["wpe"].shape[0]
    if window != config.window_size:
        raise CheckpointError(
            f"Checkpoint window size {window} does not match the config's "
            f"{config.window_size}."
        )

    for layer in range(config.num_layers):
        prefix = f"model/decoder_blocks/{layer}"
        if f"{prefix}/ln_1/gamma" not in variables:
            raise CheckpointError(
                f"Checkpoint has fewer decoder blocks than the config's "
                f"{config.num_layers}."
            )
        attn = {
            "c_attn": {
                "kernel": _get(variables, f"{prefix}/attn/c_attn/weight"),
                "bias": _get(variables, f"{prefix}/attn/c_attn/bias").reshape(-1),
            },
            "c_proj": {
                "kernel": _get(variables, f"{prefix}/attn/c_proj/weight"),
                "bias": _get(variables, f"{prefix}/attn/c_proj/bias").reshape(-1),
            },
        }
        if config.use_relative_attention:
            rel = _get(variables, f"{prefix}/attn/E")
            if rel.shape[1] != config.window_size:
                raise CheckpointError(
                    "The reference couples relative-attention E to "
                    "batch*sequence (its transformer.py:285); this "
                    f"checkpoint's E has {rel.shape[1]} rows but the window "
                    f"is {config.window_size}, so it was trained at batch > 1 "
                    "and has no well-defined per-position table to import."
                )
            attn["rel_embedding"] = rel
        params[f"h_{layer + 1}"] = {
            "ln_1": {
                "scale": _get(variables, f"{prefix}/ln_1/gamma"),
                "bias": _get(variables, f"{prefix}/ln_1/beta"),
            },
            "ln_2": {
                "scale": _get(variables, f"{prefix}/ln_2/gamma"),
                "bias": _get(variables, f"{prefix}/ln_2/beta"),
            },
            "attn": attn,
            "mlp": {
                "c_fc": {
                    "kernel": _get(variables, f"{prefix}/mlp/c_fc/weight"),
                    "bias": _get(variables, f"{prefix}/mlp/c_fc/bias").reshape(-1),
                },
                "c_proj": {
                    "kernel": _get(variables, f"{prefix}/mlp/c_proj/weight"),
                    "bias": _get(variables, f"{prefix}/mlp/c_proj/bias").reshape(-1),
                },
            },
        }
    if f"model/decoder_blocks/{config.num_layers}/ln_1/gamma" in variables:
        raise CheckpointError(
            f"Checkpoint has more decoder blocks than the config's "
            f"{config.num_layers}."
        )
    return params


def reference_to_rnn_variables(variables, config):
    """Maps reference MusicRNN checkpoint variables onto our collections.

    Keras LSTM packs gates [i, f, g, o] along the last axis; flax's
    OptimizedLSTMCell keeps per-gate dense layers (input kernels bias-free,
    hidden kernels carrying the bias) — see tests/test_reference_parity.py.
    """
    params = {
        "embedding": {
            "embedding": _get(variables, "model/embedding_layer/embeddings")
        },
        "output": {
            "kernel": _get(variables, "model/output_layer/kernel"),
            "bias": _get(variables, "model/output_layer/bias"),
        },
    }
    batch_stats = {}
    for index, hidden in enumerate(config.layer_sizes):
        prefix = f"model/lstm_layers/{index}/cell"
        kernel = _get(variables, f"{prefix}/kernel")
        recurrent = _get(variables, f"{prefix}/recurrent_kernel")
        bias = _get(variables, f"{prefix}/bias")
        if kernel.shape[1] != 4 * hidden:
            raise CheckpointError(
                f"LSTM layer {index} has {kernel.shape[1] // 4} units in the "
                f"checkpoint but {hidden} in the config."
            )
        cell = {}
        for gate_index, gate in enumerate(["i", "f", "g", "o"]):
            sl = slice(gate_index * hidden, (gate_index + 1) * hidden)
            cell[f"i{gate}"] = {"kernel": kernel[:, sl]}
            cell[f"h{gate}"] = {"kernel": recurrent[:, sl], "bias": bias[sl]}
        params[f"OptimizedLSTMCell_{index}"] = cell

        bn_prefix = f"model/normalization_layers/{index}"
        if config.use_batch_normalization:
            params[f"batch_norm_{index}"] = {
                "scale": _get(variables, f"{bn_prefix}/gamma"),
                "bias": _get(variables, f"{bn_prefix}/beta"),
            }
            batch_stats[f"batch_norm_{index}"] = {
                "mean": _get(variables, f"{bn_prefix}/moving_mean"),
                "var": _get(variables, f"{bn_prefix}/moving_variance"),
            }
    return params, batch_stats


def import_reference_checkpoint(
    model_type: ModelType, checkpoint_dir, logdir, config, trainer=None
):
    """Converts a reference checkpoint into an Orbax checkpoint at ``logdir``.

    Returns the imported :class:`TrainState`. ``trainer`` may be supplied
    (tests); otherwise one is built from the config.
    """
    import flax
    import jax.numpy as jnp

    from composer_tpu.cli import _make_trainer  # late: avoids a cycle
    from composer_tpu.models import get_batch_size, get_window_size
    from composer_tpu.train.checkpoint import CheckpointManager

    variables = read_reference_checkpoint(checkpoint_dir)
    if trainer is None:
        trainer = _make_trainer(model_type, config)

    state = trainer.init_state(
        get_batch_size(model_type, config), get_window_size(model_type, config)
    )
    model_config = trainer.model.config
    if model_type == ModelType.TRANSFORMER:
        params = reference_to_transformer_params(variables, model_config)
        extra_vars = state.extra_vars
    else:
        params, batch_stats = reference_to_rnn_variables(variables, model_config)
        extra_vars = dict(state.extra_vars)
        if batch_stats:
            extra_vars["batch_stats"] = batch_stats

    # Cast onto the model's parameter dtype/structure (validates the tree).
    template = flax.serialization.to_state_dict(state.params)
    imported = flax.serialization.from_state_dict(
        state.params, _cast_like(template, params)
    )

    step = int(np.asarray(variables.get("step", 1)))
    epoch = int(np.asarray(variables.get("epoch", 1)))
    state = state.replace(
        step=jnp.asarray(step, jnp.int32),
        epoch=jnp.asarray(epoch, jnp.int32),
        params=imported,
        opt_state=trainer.optimizer.init(imported),
        extra_vars=extra_vars,
    )

    logdir = Path(logdir)
    checkpoints = CheckpointManager(logdir)
    checkpoints.save(max(step - 1, 1), flax.serialization.to_state_dict(state))
    checkpoints.wait()
    logging.info(
        "Imported reference checkpoint (step=%d, epoch=%d) into '%s'. "
        "Optimizer state does not transfer: resumed training restarts Adam "
        "moments.", step, epoch, logdir,
    )
    return state


def _cast_like(template, values):
    """Recursively casts imported arrays to the template's dtypes."""
    if isinstance(template, dict):
        missing = set(template) - set(values)
        extra = set(values) - set(template)
        if missing or extra:
            raise CheckpointError(
                f"Imported parameter tree mismatch: missing {sorted(missing)}, "
                f"unexpected {sorted(extra)}."
            )
        return {key: _cast_like(template[key], values[key]) for key in template}
    return np.asarray(values, dtype=np.asarray(template).dtype)
