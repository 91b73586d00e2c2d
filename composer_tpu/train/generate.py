"""Autoregressive generation as a single on-device ``lax.scan``.

The reference's decode loop ran one eager model call per token from Python,
discarded the KV cache, and fed back a single-token context
(cli.py:663-676 — SURVEY.md §3.2 flags this as the primary benchmark
surface). Here the whole generation — prefill, per-token forward through a
preallocated HBM KV cache, temperature sampling — is one jitted function;
host<->device traffic is prompt-in / tokens-out.

Positions past ``window_size`` clamp to the last learned position embedding
(the reference would have indexed out of range; it never reached this because
it never threaded the cache).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.models import ModelType
from composer_tpu.models.music_rnn import init_state as rnn_init_state
from composer_tpu.models.transformer import init_cache
from composer_tpu.ops.sampling import sample_logits


@partial(jax.jit, static_argnames=("model", "length", "cache_len", "temperature"))
def _transformer_generate(
    model, params, prompt, rng, length: int, cache_len: int, temperature: float
):
    batch = prompt.shape[0]
    cache = init_cache(model.config, batch, cache_len)

    logits, cache = model.apply({"params": params}, prompt, cache)
    rng, sample_rng = jax.random.split(rng)
    token = sample_logits(sample_rng, logits[:, -1] , temperature)

    def step(carry, _):
        cache, token, rng = carry
        logits, cache = model.apply({"params": params}, token[:, None], cache)
        rng, sample_rng = jax.random.split(rng)
        next_token = sample_logits(sample_rng, logits[:, 0], temperature)
        return (cache, next_token, rng), token

    (_, last, _), tokens = jax.lax.scan(
        step, (cache, token, rng), None, length=length - 1
    )
    # tokens: [length-1, batch] of the carried tokens; append the final one.
    generated = jnp.concatenate(
        [tokens.transpose(1, 0), last[:, None]], axis=1
    )
    return generated


@partial(jax.jit, static_argnames=("model", "length", "temperature"))
def _rnn_generate(model, variables, prompt, rng, length: int, temperature: float):
    batch = prompt.shape[0]
    state = rnn_init_state(model.config, batch)

    logits, state = model.apply(variables, prompt, state)
    rng, sample_rng = jax.random.split(rng)
    token = sample_logits(sample_rng, logits[:, -1], temperature)

    def step(carry, _):
        state, token, rng = carry
        logits, state = model.apply(variables, token[:, None], state)
        rng, sample_rng = jax.random.split(rng)
        next_token = sample_logits(sample_rng, logits[:, 0], temperature)
        return (state, next_token, rng), token

    (_, last, _), tokens = jax.lax.scan(
        step, (state, token, rng), None, length=length - 1
    )
    return jnp.concatenate([tokens.transpose(1, 0), last[:, None]], axis=1)


def generate_ids(
    model,
    model_type: ModelType,
    params_or_variables,
    prompt_ids,
    length: int = 1024,
    temperature: float = 1.0,
    seed: int = 0,
    cache_len: Optional[int] = None,
) -> np.ndarray:
    """Generates ``length`` new event ids after ``prompt_ids``.

    prompt_ids: int array [batch, prompt_len] (or [prompt_len]).
    Returns [batch, prompt_len + length] including the prompt.
    """
    prompt = jnp.asarray(prompt_ids, dtype=jnp.int32)
    squeeze = prompt.ndim == 1
    if squeeze:
        prompt = prompt[None]
    rng = jax.random.PRNGKey(seed)

    if model_type == ModelType.TRANSFORMER:
        if cache_len is None:
            cache_len = prompt.shape[1] + length
        generated = _transformer_generate(
            model, params_or_variables, prompt, rng, length, cache_len,
            float(temperature),
        )
    else:
        generated = _rnn_generate(
            model, params_or_variables, prompt, rng, length, float(temperature)
        )

    result = np.asarray(jnp.concatenate([prompt, generated], axis=1))
    return result[0] if squeeze else result
