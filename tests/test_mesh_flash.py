"""Flash attention under a multi-device mesh (shard_map wrapper).

pallas_call is opaque to GSPMD; ops/pallas_attention.py wraps the kernel in
``jax.shard_map`` over (batch -> data, heads -> model). These tests pin the
sharded wrapper's forward AND gradients — including the relative-table
gradient, whose all-reduce over the data axis comes from shard_map's
transpose of the replicated input — against the single-device kernel, on the
virtual 8-device CPU mesh (Pallas interpreter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.ops import attention as attention_ops
from composer_tpu.ops.pallas_attention import (
    relative_flash_attention,
    sharded_relative_flash_attention,
)
from composer_tpu.parallel import create_mesh


def _inputs(batch, heads, seq, depth, window, with_rel=True):
    kq, kk, kv, ke = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(kq, (batch, heads, seq, depth), jnp.float32)
    k = jax.random.normal(kk, (batch, heads, seq, depth), jnp.float32)
    v = jax.random.normal(kv, (batch, heads, seq, depth), jnp.float32)
    e = (
        jax.random.normal(ke, (heads, window, depth), jnp.float32) * 0.02
        if with_rel
        else None
    )
    return q, k, v, e


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (1, 8)])
@pytest.mark.parametrize("with_rel", [True, False])
def test_sharded_flash_matches_single_device(mesh_shape, with_rel):
    assert jax.device_count() >= 8
    data, model = mesh_shape
    mesh = create_mesh(data=data, model=model)
    q, k, v, e = _inputs(8, 8, 256, 16, window=512, with_rel=with_rel)

    def loss_single(q, k, v, e):
        out = relative_flash_attention(q, k, v, e)
        return jnp.sum(out * out)

    def loss_sharded(q, k, v, e):
        out = sharded_relative_flash_attention(q, k, v, e, mesh=mesh)
        return jnp.sum(out * out)

    argnums = (0, 1, 2, 3) if with_rel else (0, 1, 2)
    ref_val, ref_grads = jax.value_and_grad(loss_single, argnums=argnums)(q, k, v, e)
    val, grads = jax.jit(jax.value_and_grad(loss_sharded, argnums=argnums))(q, k, v, e)

    np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-5)
    for g, rg in zip(grads, ref_grads):
        np.testing.assert_allclose(np.asarray(g), np.asarray(rg), rtol=1e-5, atol=1e-6)


def test_sharded_flash_rejects_indivisible_shapes():
    mesh = create_mesh(data=4, model=2)
    q, k, v, e = _inputs(3, 8, 128, 16, window=256)  # batch 3 % data 4 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sharded_relative_flash_attention(q, k, v, e, mesh=mesh)
    q, k, v, e = _inputs(4, 3, 128, 16, window=256)  # heads 3 % model 2 != 0
    with pytest.raises(ValueError, match="not divisible"):
        sharded_relative_flash_attention(q, k, v, e, mesh=mesh)


def test_attention_gate_falls_back_to_band_when_indivisible():
    """multihead_attention with flash_mesh but an indivisible head count must
    fall through to the (GSPMD-partitionable) band path, not raise."""
    mesh = create_mesh(data=4, model=2)
    q, k, v, e = _inputs(4, 3, 128, 16, window=256)  # heads 3 % model 2 != 0
    out = attention_ops.multihead_attention(
        q, k, v, rel_embedding=e, use_pallas=True, band_block_size=128,
        flash_mesh=mesh,
    )
    ref = attention_ops.multihead_attention(
        q, k, v, rel_embedding=e, use_pallas=False, band_block_size=128,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_attention_gate_routes_flash_through_mesh():
    mesh = create_mesh(data=4, model=2)
    q, k, v, e = _inputs(8, 8, 256, 16, window=512)
    out = attention_ops.multihead_attention(
        q, k, v, rel_embedding=e, use_pallas=True, flash_mesh=mesh,
    )
    ref = relative_flash_attention(q, k, v, e)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_sharded_flash_dropout_branch_traces_on_cpu_mesh():
    """ADVICE r2: the in-kernel dropout branch (per-shard seed folding via
    jax.lax.axis_index inside the shard_map body) is TPU-only at runtime —
    abstract evaluation still exercises the axis_index/seed plumbing and the
    custom_vjp wiring, so regressions are caught off-TPU."""
    mesh = create_mesh(data=4, model=2)
    q, k, v, e = _inputs(8, 8, 256, 16, window=512)

    def fwd(q, k, v, e):
        return sharded_relative_flash_attention(
            q, k, v, e, mesh=mesh, dropout_rate=0.1, dropout_seed=123,
        )

    out = jax.eval_shape(fwd, q, k, v, e)
    assert out.shape == q.shape and out.dtype == q.dtype

    def loss(q, k, v, e):
        return jnp.sum(fwd(q, k, v, e) ** 2)

    grads = jax.eval_shape(jax.grad(loss, argnums=(0, 1, 2, 3)), q, k, v, e)
    assert [g.shape for g in grads] == [q.shape, k.shape, v.shape, e.shape]
