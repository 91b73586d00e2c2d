"""Chunked attention equals full attention, forward AND backward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.ops import attention as full_attention
from composer_tpu.ops.chunked_attention import chunked_causal_attention


@pytest.mark.parametrize("use_rel", [False, True])
def test_chunked_matches_full_forward(use_rel):
    B, H, S, D, W = 2, 3, 256, 8, 384
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, W, D)) if use_rel else None

    full = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
    chunked = chunked_causal_attention(q, k, v, E, scale=True, chunk_size=64)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_rel", [False, True])
def test_chunked_matches_full_gradient(use_rel):
    B, H, S, D, W = 1, 2, 128, 8, 256
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, W, D)) if use_rel else None

    def loss_full(q, k, v, E):
        out = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
        return jnp.sum(out ** 2)

    def loss_chunked(q, k, v, E):
        out = chunked_causal_attention(q, k, v, E, scale=True, chunk_size=32)
        return jnp.sum(out ** 2)

    args = (q, k, v, E) if use_rel else (q, k, v, None)
    argnums = (0, 1, 2, 3) if use_rel else (0, 1, 2)
    grads_full = jax.grad(loss_full, argnums=argnums)(*args)
    grads_chunked = jax.grad(loss_chunked, argnums=argnums)(*args)
    for gf, gc in zip(grads_full, grads_chunked):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gf), rtol=5e-5, atol=5e-5)


def test_chunked_rejects_bad_sizes():
    q = jnp.zeros((1, 1, 100, 8))
    with pytest.raises(ValueError):
        chunked_causal_attention(q, q, q, chunk_size=64)

def test_chunked_gradient_is_rematerialized():
    """The chunk body must stay under jax.checkpoint: without it, autodiff
    through the scan stacks every chunk's f32 scores as saved residuals —
    the full [S, S] matrix again — which exceeded HBM at 2048 ctx, batch 8
    on v5e (num_chunks x [B, H, chunk, S] ~ 2 GB of 'HLO temp')."""
    B, H, S, D = 1, 2, 128, 8
    q = jnp.zeros((B, H, S, D))

    def loss(q):
        return jnp.sum(chunked_causal_attention(q, q, q, chunk_size=32) ** 2)

    jaxpr = str(jax.make_jaxpr(jax.grad(loss))(q))
    assert "remat" in jaxpr or "checkpoint" in jaxpr


def test_chunked_dropout_statistics_and_determinism():
    """Attention dropout in the chunked path: deterministic under the same
    rng, ~keep-rate fraction of zeros, unbiased scaling, independent masks
    per chunk."""
    B, H, S, D, rate = 2, 2, 128, 8, 0.5
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    rng = jax.random.PRNGKey(7)

    kwargs = dict(scale=True, chunk_size=32, dropout_rate=rate)
    a = chunked_causal_attention(q, k, v, dropout_rng=rng, **kwargs)
    b = chunked_causal_attention(q, k, v, dropout_rng=rng, **kwargs)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    c = chunked_causal_attention(
        q, k, v, dropout_rng=jax.random.PRNGKey(8), **kwargs
    )
    assert not np.allclose(np.asarray(a), np.asarray(c))

    no_drop = chunked_causal_attention(q, k, v, scale=True, chunk_size=32)
    assert not np.allclose(np.asarray(a), np.asarray(no_drop))
    # Unbiasedness: averaging many dropout draws approaches the clean output.
    draws = [
        chunked_causal_attention(
            q, k, v, dropout_rng=jax.random.PRNGKey(100 + i), **kwargs
        )
        for i in range(24)
    ]
    mean = np.mean([np.asarray(d) for d in draws], axis=0)
    err = np.abs(mean - np.asarray(no_drop)).mean()
    scale_ref = np.abs(np.asarray(no_drop)).mean()
    assert err < 0.25 * scale_ref, (err, scale_ref)


def test_chunked_dropout_gradient_flows():
    B, H, S, D = 1, 2, 64, 8
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D))

    def loss(q):
        out = chunked_causal_attention(
            q, q, q, chunk_size=32, dropout_rng=jax.random.PRNGKey(1),
            dropout_rate=0.3,
        )
        return jnp.sum(out ** 2)

    grad = jax.grad(loss)(q)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0
