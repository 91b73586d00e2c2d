"""Sampling filters: top-k, nucleus (top-p), and their composition.

The reference's sampler was temperature-only host-side tf.random.categorical
(reference cli.py:670-673); these are serving-path additions, so their
semantics are pinned from first principles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.ops.sampling import (
    filter_top_p,
    sample_filtered,
    sample_logits,
    sample_top_k,
)


def test_top_k_restricts_support():
    logits = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0]] * 64)
    rngs = jax.random.split(jax.random.PRNGKey(0), 64)
    samples = jax.vmap(lambda r, l: sample_filtered(r, l, 1.0, top_k=2))(
        rngs, logits
    )
    assert set(np.asarray(samples).tolist()) <= {3, 4}


def test_top_k_one_is_greedy():
    logits = jax.random.normal(jax.random.PRNGKey(1), (8, 33))
    samples = sample_filtered(jax.random.PRNGKey(2), logits, 5.0, top_k=1)
    np.testing.assert_array_equal(
        np.asarray(samples), np.argmax(np.asarray(logits), axis=-1)
    )


def test_top_p_keeps_nucleus_and_crossing_token():
    # probs 0.5, 0.3, 0.1, 0.1 ; p=0.6 keeps {0.5, 0.3} (0.3 crosses 0.6).
    probs = np.array([0.5, 0.3, 0.1, 0.1])
    logits = jnp.asarray(np.log(probs))
    filtered = np.asarray(filter_top_p(logits, 0.6))
    assert np.isfinite(filtered[:2]).all()
    assert np.isneginf(filtered[2:]).all()


def test_top_p_one_token_nucleus():
    probs = np.array([0.9, 0.05, 0.05])
    filtered = np.asarray(filter_top_p(jnp.asarray(np.log(probs)), 0.5))
    assert np.isfinite(filtered[0])
    assert np.isneginf(filtered[1:]).all()


def test_disabled_filters_equal_plain_sampling():
    logits = jax.random.normal(jax.random.PRNGKey(3), (4, 50))
    rng = jax.random.PRNGKey(4)
    np.testing.assert_array_equal(
        np.asarray(sample_filtered(rng, logits, 0.8, top_k=0, top_p=0.0)),
        np.asarray(sample_logits(rng, logits, 0.8)),
    )
    np.testing.assert_array_equal(
        np.asarray(sample_top_k(rng, logits, 0.8, k=0)),
        np.asarray(sample_logits(rng, logits, 0.8)),
    )


def test_filters_compose_top_k_then_top_p():
    # top_k=3 keeps {4,3,2}; over the survivors (renormalized ~.58/.24/.13
    # of the ORIGINAL softmax — filter_top_p normalizes over survivors),
    # p=0.5 keeps only the argmax.
    logits = jnp.asarray([0.0, 1.0, 2.0, 3.0, 4.0])
    rngs = jax.random.split(jax.random.PRNGKey(5), 64)
    samples = jax.vmap(
        lambda r: sample_filtered(r, logits, 1.0, top_k=3, top_p=0.5)
    )(rngs)
    assert set(np.asarray(samples).tolist()) == {4}


def test_generate_ids_with_filters_runs_and_restricts():
    """End-to-end: filtered generation through the scan decode (both model
    families) yields ids inside the vocabulary and differs from unfiltered
    sampling at the same seed."""
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.generate import generate_ids

    config = TransformerConfig(
        vocab_size=60, embed_dim=16, window_size=32, num_layers=1, num_heads=2,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0, band_block_size=0,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    prompt = np.asarray([[1, 2, 3]], dtype=np.int32)

    plain = generate_ids(model, ModelType.TRANSFORMER, params, prompt,
                         length=12, temperature=1.0, seed=0, engine="xla")
    filtered = generate_ids(model, ModelType.TRANSFORMER, params, prompt,
                            length=12, temperature=1.0, seed=0, engine="xla",
                            top_k=4)
    nucleus = generate_ids(model, ModelType.TRANSFORMER, params, prompt,
                           length=12, temperature=1.0, seed=0, engine="xla",
                           top_p=0.9)
    for out in (plain, filtered, nucleus):
        assert ((np.asarray(out) >= 0) & (np.asarray(out) < 60)).all()
    assert not np.array_equal(np.asarray(plain), np.asarray(filtered)) or \
           not np.array_equal(np.asarray(plain), np.asarray(nucleus))

    # Greedy filter (top_k=1) equals temperature-0 greedy exactly.
    greedy_a = generate_ids(model, ModelType.TRANSFORMER, params, prompt,
                            length=12, temperature=0.0, seed=0, engine="xla")
    greedy_b = generate_ids(model, ModelType.TRANSFORMER, params, prompt,
                            length=12, temperature=1.0, seed=0, engine="xla",
                            top_k=1)
    np.testing.assert_array_equal(np.asarray(greedy_a), np.asarray(greedy_b))


class TestPerRowSampling:
    """Per-row sampling params (serving coalesces mixed-setting requests).

    The [B]-vector variants must be bit-identical to the scalar path when a
    row's setting matches — same filtered values, same single categorical
    rng consumption — so coalescing requests never changes what any one
    request would have sampled at its own settings and seed.
    """

    def _logits(self, rows=6, vocab=50, seed=11):
        return jax.random.normal(jax.random.PRNGKey(seed), (rows, vocab)) * 3.0

    def test_uniform_rows_match_scalar_path_bitwise(self):
        from composer_tpu.ops.sampling import sample_filtered_rows

        logits = self._logits()
        b = logits.shape[0]
        rng = jax.random.PRNGKey(3)
        for t, k, p in [(0.8, 0, 0.0), (1.3, 5, 0.0), (0.7, 0, 0.9),
                        (2.0, 3, 0.5), (1.0, 0, 0.0)]:
            scalar = sample_filtered(rng, logits, t, top_k=k, top_p=p)
            rows = sample_filtered_rows(
                rng, logits,
                jnp.full((b,), t, jnp.float32),
                jnp.full((b,), k, jnp.int32),
                jnp.full((b,), p, jnp.float32),
            )
            np.testing.assert_array_equal(
                np.asarray(scalar), np.asarray(rows), err_msg=f"{(t, k, p)}"
            )

    def test_row_filters_match_per_row_scalar_filters(self):
        from composer_tpu.ops.sampling import (
            filter_top_k,
            filter_top_k_rows,
            filter_top_p,
            filter_top_p_rows,
        )

        logits = self._logits(rows=5)
        ks = [1, 3, 0, 50, 7]  # 0 disables
        rowwise = np.stack([
            np.asarray(filter_top_k(logits[i], k) if k > 0 else logits[i])
            for i, k in enumerate(ks)
        ])
        np.testing.assert_array_equal(
            np.asarray(filter_top_k_rows(logits, jnp.asarray(ks))), rowwise
        )

        ps = [0.2, 0.0, 0.95, 1.0, 0.5]  # 0 and 1 disable
        rowwise = np.stack([
            np.asarray(filter_top_p(logits[i], p) if 0 < p < 1 else logits[i])
            for i, p in enumerate(ps)
        ])
        np.testing.assert_array_equal(
            np.asarray(filter_top_p_rows(logits, jnp.asarray(ps))), rowwise
        )

    def test_greedy_rows_inside_sampled_batch(self):
        from composer_tpu.ops.sampling import sample_filtered_rows

        logits = self._logits(rows=4)
        out = sample_filtered_rows(
            jax.random.PRNGKey(9), logits,
            jnp.asarray([0.0, 1.5, -1.0, 0.9], jnp.float32),
            jnp.zeros((4,), jnp.int32),
            jnp.zeros((4,), jnp.float32),
        )
        argmax = np.argmax(np.asarray(logits), axis=-1)
        assert np.asarray(out)[0] == argmax[0]
        assert np.asarray(out)[2] == argmax[2]

    def test_heterogeneous_generate_ids_greedy_row_parity(self):
        """A greedy row inside a mixed-temperature XLA-scan batch produces
        exactly the tokens a standalone greedy call produces (rows are
        independent; per-row params don't leak across rows)."""
        from composer_tpu.models import ModelType
        from composer_tpu.models.transformer import Transformer, TransformerConfig
        from composer_tpu.train.generate import generate_ids

        config = TransformerConfig(
            vocab_size=60, embed_dim=16, window_size=32, num_layers=1,
            num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
            band_block_size=0,
        )
        model = Transformer(config)
        params = model.init_params(jax.random.PRNGKey(0), 1, 8)
        prompts = np.asarray([[1, 2, 3], [4, 5, 6]], dtype=np.int32)

        mixed = generate_ids(
            model, ModelType.TRANSFORMER, params, prompts, length=10,
            temperature=np.asarray([0.0, 1.2], np.float32), seed=0,
            top_k=np.asarray([0, 4], np.int32),
            top_p=np.asarray([0.0, 0.9], np.float32), engine="xla",
        )
        solo = generate_ids(
            model, ModelType.TRANSFORMER, params, prompts[:1], length=10,
            temperature=0.0, seed=0, engine="xla",
        )
        np.testing.assert_array_equal(np.asarray(mixed[0]), np.asarray(solo[0]))
        assert ((np.asarray(mixed[1]) >= 0) & (np.asarray(mixed[1]) < 60)).all()


def test_top_p_nucleus_taken_over_tempered_distribution():
    """Temperature applies before top-p: the nucleus is the p-mass prefix of
    the distribution actually sampled. At T=2 the flattened distribution's
    0.8-nucleus of [.6,.3,.07,.03] grows from {0,1} to {0,1,2}."""
    logits = jnp.log(jnp.asarray([0.6, 0.3, 0.07, 0.03]))
    keys = jax.random.split(jax.random.PRNGKey(0), 3000)
    samples = np.asarray(
        jax.vmap(lambda r: sample_filtered(r, logits, 2.0, top_p=0.8))(keys)
    )
    support = set(samples.tolist())
    assert 2 in support  # in the T=2 nucleus, outside the T=1 nucleus
    assert 3 not in support  # outside both
    assert support <= {0, 1, 2}


class TestDropoutKeepMask:
    """16-bit attention-dropout masks (ops/dropout.py)."""

    def test_keep_probability_and_determinism(self):
        from composer_tpu.ops.dropout import dropout_keep_mask

        rng = jax.random.PRNGKey(7)
        mask = dropout_keep_mask(rng, 0.1, (512, 512))
        again = dropout_keep_mask(rng, 0.1, (512, 512))
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(again))
        # Mean keep rate within 4 sigma of 0.9 (sigma ~ sqrt(p q / n)).
        mean = float(jnp.mean(mask.astype(jnp.float32)))
        assert abs(mean - 0.9) < 4 * (0.09 / 512**2) ** 0.5 + 2e-5

        other = dropout_keep_mask(jax.random.PRNGKey(8), 0.1, (512, 512))
        assert np.asarray(mask != other).mean() > 0.05

    def test_rate_quantization_bounds(self):
        from composer_tpu.ops.dropout import dropout_keep_mask

        # Threshold rounding keeps the realized rate within 2^-16 of request.
        for rate in (0.1, 0.3, 0.5, 1 / 3):
            threshold = min(int(round(rate * 65536.0)), 65535)
            realized = threshold / 65536.0
            assert abs(realized - rate) <= 2**-16
        # Degenerate rates stay valid masks.
        all_keep = dropout_keep_mask(jax.random.PRNGKey(0), 0.0, (8, 128))
        assert bool(jnp.all(all_keep))
