"""Band-coordinate attention equals the dense skew path, forward AND backward.

ops/band_attention.py replaces the Music-Transformer skew relayout (the 2048-ctx
train-step bottleneck, see TODO.md) with shift-selection matmuls; these tests
pin it to ops/attention.py numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.ops import attention as full_attention
from composer_tpu.ops.band_attention import band_causal_attention


@pytest.mark.parametrize("use_rel", [False, True])
@pytest.mark.parametrize("window_extra", [0, 64])
def test_band_matches_full_forward(use_rel, window_extra):
    B, H, S, D = 2, 3, 256, 8
    W = S + window_extra
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, W, D)) if use_rel else None

    full = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
    band = band_causal_attention(q, k, v, E, scale=True, block_size=64)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full), rtol=2e-5, atol=2e-5)


def test_band_single_block():
    """A = 1 exercises the zero high-block (e_rev1[0]) edge."""
    B, H, S, D = 1, 2, 64, 8
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, S, D))
    full = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
    band = band_causal_attention(q, k, v, E, scale=True, block_size=64)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("use_rel", [False, True])
def test_band_matches_full_gradient(use_rel):
    B, H, S, D, W = 1, 2, 128, 8, 256
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, W, D)) if use_rel else None

    def loss_full(q, k, v, E):
        out = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
        return jnp.sum(out ** 2)

    def loss_band(q, k, v, E):
        out = band_causal_attention(q, k, v, E, scale=True, block_size=32)
        return jnp.sum(out ** 2)

    args = (q, k, v, E) if use_rel else (q, k, v, None)
    argnums = (0, 1, 2, 3) if use_rel else (0, 1, 2)
    grads_full = jax.grad(loss_full, argnums=argnums)(*args)
    grads_band = jax.grad(loss_band, argnums=argnums)(*args)
    for gf, gb in zip(grads_full, grads_band):
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gf), rtol=5e-5, atol=5e-5)


def test_band_gradient_has_no_scatter():
    """The whole point: every op in the backward pass is dense (matmuls,
    reductions, slices) — no gather/scatter, no minor-dim relayout shear."""
    B, H, S, D = 1, 2, 128, 8
    q = jnp.zeros((B, H, S, D))
    E = jnp.zeros((H, S, D))

    def loss(q, E):
        return jnp.sum(band_causal_attention(q, q, q, E, block_size=32) ** 2)

    jaxpr = str(jax.make_jaxpr(jax.grad(loss, argnums=(0, 1)))(q, E))
    assert "scatter" not in jaxpr
    assert "gather[" not in jaxpr


def test_band_rejects_bad_sizes():
    q = jnp.zeros((1, 1, 100, 8))
    with pytest.raises(ValueError):
        band_causal_attention(q, q, q, block_size=64)
    q = jnp.zeros((1, 1, 128, 8))
    with pytest.raises(ValueError):
        band_causal_attention(q, q, q, jnp.zeros((1, 64, 8)), block_size=64)


def test_band_deep_split_matches_full():
    """16 blocks routes through the ns=8 block-triangular split."""
    B, H, S, D = 1, 2, 512, 8
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, S, D))
    full = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
    band = band_causal_attention(q, k, v, E, scale=True, block_size=32)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full), rtol=2e-5, atol=2e-5)

    def loss_full(q):
        return jnp.sum(full_attention.multihead_attention(q, k, v, rel_embedding=E) ** 2)

    def loss_band(q):
        return jnp.sum(band_causal_attention(q, k, v, E, block_size=32) ** 2)

    gf = jax.grad(loss_full)(q)
    gb = jax.grad(loss_band)(q)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gf), rtol=5e-5, atol=5e-5)


def test_band_odd_block_rows_split():
    """A=6 routes through ns=2 with an odd 3-block row group."""
    B, H, S, D = 1, 2, 192, 8
    keys = jax.random.split(jax.random.PRNGKey(8), 4)
    q = jax.random.normal(keys[0], (B, H, S, D))
    k = jax.random.normal(keys[1], (B, H, S, D))
    v = jax.random.normal(keys[2], (B, H, S, D))
    E = jax.random.normal(keys[3], (H, S, D))
    full = full_attention.multihead_attention(q, k, v, rel_embedding=E, scale=True)
    band = band_causal_attention(q, k, v, E, scale=True, block_size=32)
    np.testing.assert_allclose(np.asarray(band), np.asarray(full), rtol=2e-5, atol=2e-5)
