"""Pallas flash-attention kernel vs the XLA reference path.

Runs in interpreter mode on the CPU test mesh; the same kernel is validated
compiled on real TPU hardware (see bench/verification logs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from composer_tpu.ops import attention as attention_ops
from composer_tpu.ops.pallas_attention import relative_flash_attention


@pytest.mark.parametrize("use_rel", [False, True])
def test_flash_attention_matches_xla(use_rel):
    B, H, S, D, W = 1, 2, 256, 16, 512
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(keys[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(keys[1], (B, H, S, D), jnp.float32)
    v = jax.random.normal(keys[2], (B, H, S, D), jnp.float32)
    E = jax.random.normal(keys[3], (H, W, D), jnp.float32) if use_rel else None

    reference = attention_ops.multihead_attention(
        q, k, v, rel_embedding=E, scale=True
    )
    with pltpu.force_tpu_interpret_mode():
        out = relative_flash_attention(q, k, v, E, scale=True)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(reference), rtol=2e-4, atol=2e-4
    )


def test_flash_attention_rejects_unaligned_seq():
    q = jnp.zeros((1, 1, 100, 16))
    with pytest.raises(ValueError):
        relative_flash_attention(q, q, q, None)


def test_explicit_pallas_request_wins_over_band_default(monkeypatch):
    """A user setting use_pallas_attention must not be silently routed to the
    band path just because band_block_size has a nonzero default (advisor
    finding, round 1)."""
    import composer_tpu.ops.attention as attention_mod
    import composer_tpu.ops.band_attention as band_mod
    import composer_tpu.ops.pallas_attention as pallas_mod

    calls = {"band": 0, "pallas": 0}

    def fake_band(*args, **kwargs):
        calls["band"] += 1
        raise AssertionError("band path taken despite use_pallas=True")

    def fake_pallas(q, k, v, rel, scale=True):
        calls["pallas"] += 1
        return jnp.zeros_like(q)

    monkeypatch.setattr(band_mod, "band_causal_attention", fake_band)
    monkeypatch.setattr(pallas_mod, "relative_flash_attention", fake_pallas)

    q = jnp.zeros((1, 2, 128, 8))
    attention_mod.multihead_attention(
        q, q, q, use_pallas=True, band_block_size=128
    )
    assert calls == {"band": 0, "pallas": 1}

    # Without the explicit request the band default applies as before.
    calls["pallas"] = 0
    with pytest.raises(AssertionError):
        attention_mod.multihead_attention(
            q, q, q, use_pallas=False, band_block_size=128
        )
    assert calls["band"] == 1
