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
