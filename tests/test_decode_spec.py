"""Speculative block-decode kernel (ops/decode_kernel_spec.py).

Greedy speculative output must be BIT-IDENTICAL to the XLA scan path for
any prompt and acceptance pattern — rejection sampling with a point-mass
draft never changes the emitted distribution, and greedy is its
deterministic special case. Runs in Pallas interpret mode on CPU; the
compiled kernel and the sampled-path distribution are validated on real
TPU hardware (scripts/probe_spec_tpu.py; BENCHMARKS.md rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.ops import decode_kernel as dk
from composer_tpu.ops import decode_kernel_spec as dks
from composer_tpu.train.generate import generate_ids


def _setup(use_relative=False, stddev=0.3, seed=0):
    config = TransformerConfig(
        vocab_size=96, embed_dim=32, window_size=48, num_layers=1,
        num_heads=2, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=stddev,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    return config, model, params


def _spec_greedy(config, model, params, prompt, length, **kw):
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    tokens, stats = dks.speculative_generate(
        packed, prompt, 0, 0.0, config=config, length=length,
        cache_len=prompt.shape[0] + length, interpret=True, **kw,
    )
    return np.asarray(tokens), np.asarray(stats)


def _xla_greedy(config, model, params, prompt, length, **kw):
    out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla", **kw,
    )
    return np.asarray(out[0, prompt.shape[0]:])


@pytest.mark.parametrize("use_relative", [False, True])
def test_spec_greedy_matches_xla(use_relative):
    config, model, params = _setup(use_relative)
    prompt = np.array([5, 60, 30, 17, 88, 3, 44], np.int32)
    expected = _xla_greedy(config, model, params, prompt, 24)
    tokens, stats = _spec_greedy(config, model, params, prompt, 24)
    np.testing.assert_array_equal(tokens, expected)
    assert stats[0] >= 1
    # Random weights: variety in the output (greedy non-trivial).
    assert len(set(expected.tolist())) > 1


def test_spec_accepts_on_repetitive_stream():
    # Near-zero init -> near-constant logits -> a constant greedy stream the
    # n-gram draft predicts perfectly once the lookup window exists.
    config, model, params = _setup(stddev=1e-3, seed=1)
    prompt = np.array([3, 3, 3], np.int32)
    length = 32
    expected = _xla_greedy(config, model, params, prompt, length)
    tokens, stats = _spec_greedy(config, model, params, prompt, length)
    np.testing.assert_array_equal(tokens, expected)
    # Multi-token acceptance must actually happen: far fewer verify blocks
    # than emitted tokens.
    assert stats[1] < length / 2, stats


def test_spec_full_acceptance_emits_whole_blocks():
    # On a perfectly predictable (constant) stream the steady-state marginal
    # must be exactly T tokens per generation block: differencing two
    # lengths cancels the warm-up blocks (short history, prompt boundary).
    # Regression for the inclusive-triangle off-by-one that capped every
    # block at T-1 emissions (ADVICE r4).
    config, model, params = _setup(stddev=1e-3, seed=1)
    prompt = np.array([3, 3, 3], np.int32)
    T = 6
    stats_by_length = {}
    for length in (12, 36):
        _, stats = _spec_greedy(
            config, model, params, prompt, length, block=T
        )
        stats_by_length[length] = stats
    gen_blocks_delta = int(
        stats_by_length[36][1] - stats_by_length[12][1]
    )
    assert gen_blocks_delta == (36 - 12) // T, stats_by_length


def test_spec_prompt_edge_cases():
    config, model, params = _setup()
    for prompt, length in (
        (np.array([42], np.int32), 17),            # plen 1
        (np.arange(30, dtype=np.int32) % 96, 6),   # prompt >> length
    ):
        expected = _xla_greedy(config, model, params, prompt, length)
        tokens, _ = _spec_greedy(config, model, params, prompt, length)
        np.testing.assert_array_equal(tokens, expected)


def test_spec_prefill_blocks_scale_with_prompt():
    # The block loop consumes ~T prompt positions per step: a 33-token
    # prompt + 7 tokens must take far fewer blocks than 40 sequential steps.
    config, model, params = _setup()
    prompt = (np.arange(33, dtype=np.int32) * 7) % 96
    length = 7
    tokens, stats = _spec_greedy(config, model, params, prompt, length)
    # Prompt positions are forced matches, so the prompt phase takes
    # ~ceil((plen-1)/T) blocks (+1 for the block straddling the prompt
    # boundary, whose drafted tail may reject); generation is >= 1
    # token/block.
    T = dks.default_block(greedy=True)
    bound = -(-(prompt.shape[0] - 1) // T) + length + 1
    assert stats[0] <= bound, (stats, T)  # not ~39 sequential steps


def test_spec_filters_greedy_noop():
    # Top-k / top-p never filter the argmax: greedy output is unchanged but
    # the in-kernel filter columns are exercised.
    config, model, params = _setup()
    prompt = np.array([5, 60, 30], np.int32)
    expected = _xla_greedy(config, model, params, prompt, 12)
    tokens, _ = _spec_greedy(
        config, model, params, prompt, 12, top_k=8, top_p=0.9,
    )
    np.testing.assert_array_equal(tokens, expected)


def test_generate_ids_spec_engine_routes_and_matches():
    config, model, params = _setup()
    prompt = np.array([5, 60, 30, 17], np.int32)
    xla = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=16, temperature=0.0, seed=0, engine="xla",
    )
    spec = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=16, temperature=0.0, seed=0, engine="spec",
    )
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(xla))
    from composer_tpu.train import generate as gen
    assert gen.LAST_SPEC_STATS is not None and gen.LAST_SPEC_STATS[0] >= 1


def test_generate_ids_spec_engine_falls_back_above_batch_1():
    # Batch 2 cannot take the speculative path; the request must still be
    # served (XLA twin on CPU) with identical results to engine='xla'.
    config, model, params = _setup()
    prompt = np.tile(np.array([5, 60, 30, 17], np.int32), (2, 1))
    xla = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt,
        length=8, temperature=0.0, seed=0, engine="xla",
    )
    spec = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt,
        length=8, temperature=0.0, seed=0, engine="spec",
    )
    np.testing.assert_array_equal(np.asarray(spec), np.asarray(xla))


def test_spec_rejects_overflowing_prompt():
    config, model, params = _setup()
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    with pytest.raises(ValueError, match="exceeds cache"):
        dks.speculative_generate(
            packed, np.zeros(20, np.int32), 0, 0.0,
            config=config, length=20, cache_len=30, interpret=True,
        )
    with pytest.raises(ValueError, match="block"):
        dks.speculative_generate(
            packed, np.zeros(4, np.int32), 0, 0.0,
            config=config, length=8, cache_len=64, block=1, interpret=True,
        )


def test_spec_block_env_validated(monkeypatch):
    # COMPOSER_SPEC_BLOCK is validated once, with the variable named in the
    # error: non-integers and out-of-range values fail clearly instead of
    # crashing at import or silently bypassing the [2, 16] check.
    for bad in ("banana", "0", "32", "-3"):
        monkeypatch.setenv("COMPOSER_SPEC_BLOCK", bad)
        with pytest.raises(ValueError, match="COMPOSER_SPEC_BLOCK"):
            dks._parse_block_env()
    monkeypatch.setenv("COMPOSER_SPEC_BLOCK", "8")
    assert dks._parse_block_env() == 8
    monkeypatch.delenv("COMPOSER_SPEC_BLOCK")
    assert dks._parse_block_env() is None


def test_sampled_spec_engine_off_tpu_raises_cleanly():
    # engine='spec' with temperature > 0 off-TPU would hit the interpreter's
    # missing hardware PRNG with an obscure lowering error; the router must
    # raise a clean InvalidParameterError instead (mirrors the serving gate).
    from composer_tpu.exceptions import InvalidParameterError

    config, model, params = _setup()
    prompt = np.array([5, 60, 30, 17], np.int32)
    if jax.default_backend() == "tpu":
        pytest.skip("gate only applies off-TPU")
    with pytest.raises(InvalidParameterError, match="TPU hardware"):
        generate_ids(
            model, ModelType.TRANSFORMER, params, prompt[None],
            length=8, temperature=0.9, seed=0, engine="spec",
        )


def test_auto_routes_only_batch1_greedy_on_tpu(monkeypatch):
    """'auto' takes the speculative engine exactly for single-sequence
    greedy decoding on TPU (bit-identical + measured win); sampled and
    batched requests stay on the other engines."""
    from composer_tpu.train import generate as gen

    config, model, params = _setup()
    greedy = np.asarray([0.0])
    sampled = np.asarray([0.9])

    monkeypatch.setattr(gen.jax, "default_backend", lambda: "tpu")
    assert gen._use_spec_kernel(
        model, ModelType.TRANSFORMER, 1, 48, "auto", greedy)
    assert not gen._use_spec_kernel(
        model, ModelType.TRANSFORMER, 1, 48, "auto", sampled)
    assert not gen._use_spec_kernel(
        model, ModelType.TRANSFORMER, 2, 48, "auto", np.asarray([0.0, 0.0]))
    # Explicit opt-in still covers sampled runs.
    assert gen._use_spec_kernel(
        model, ModelType.TRANSFORMER, 1, 48, "spec", sampled)
    assert not gen._use_spec_kernel(
        model, ModelType.TRANSFORMER, 1, 48, "megakernel", greedy)

    monkeypatch.setattr(gen.jax, "default_backend", lambda: "cpu")
    assert not gen._use_spec_kernel(
        model, ModelType.TRANSFORMER, 1, 48, "auto", greedy)
    assert gen._use_spec_kernel(  # explicit opt-in runs interpret off-TPU
        model, ModelType.TRANSFORMER, 1, 48, "spec", greedy)
