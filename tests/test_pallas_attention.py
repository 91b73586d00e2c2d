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
@pytest.mark.parametrize("block", [128, 256])
def test_flash_attention_matches_xla(use_rel, block):
    """block=128 at S=256 exercises the multi-tile grid (off-diagonal tiles,
    online-softmax accumulation); block=256 the single-tile fast path that
    _pick_block selects by default at this length."""
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
        out = relative_flash_attention(q, k, v, E, scale=True, block=block)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(reference), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("use_rel", [False, True])
@pytest.mark.parametrize("depth,block", [(16, 128), (16, 256), (64, 128)])
def test_flash_attention_grads_match_xla(use_rel, depth, block):
    """The custom_vjp backward (fused Pallas dQ/dK/dV/dE kernels) must match
    XLA autodiff through the reference attention path. block=128 at S=256
    pins the multi-tile backward: off-diagonal tiles, the revisited dQ/dE
    read-modify-write accumulation across grid steps, and the off-diagonal
    shear paths."""
    B, H, S, W = 1, 2, 256, 512
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    q = jax.random.normal(keys[0], (B, H, S, depth), jnp.float32)
    k = jax.random.normal(keys[1], (B, H, S, depth), jnp.float32)
    v = jax.random.normal(keys[2], (B, H, S, depth), jnp.float32)
    E = jax.random.normal(keys[3], (H, W, depth), jnp.float32) if use_rel else None
    cot = jax.random.normal(keys[4], (B, H, S, depth), jnp.float32)

    def loss_ref(q, k, v, E):
        out = attention_ops.multihead_attention(q, k, v, rel_embedding=E, scale=True)
        return jnp.sum(out * cot)

    def loss_flash(q, k, v, E):
        out = relative_flash_attention(q, k, v, E, scale=True, block=block)
        return jnp.sum(out * cot)

    argnums = (0, 1, 2, 3) if use_rel else (0, 1, 2)
    grads_ref = jax.grad(loss_ref, argnums)(q, k, v, E)
    with pltpu.force_tpu_interpret_mode():
        grads_flash = jax.grad(loss_flash, argnums)(q, k, v, E)

    names = ["dq", "dk", "dv", "dE"]
    for name, g_ref, g_flash in zip(names, grads_ref, grads_flash):
        np.testing.assert_allclose(
            np.asarray(g_flash), np.asarray(g_ref), rtol=5e-4, atol=5e-4,
            err_msg=name,
        )


def test_transformer_trains_through_flash_attention():
    """use_pallas_attention must be differentiable end-to-end (the gate in
    transformer.py routes training through flash when dropout is inactive)."""
    from composer_tpu.models.transformer import Transformer, TransformerConfig

    config = TransformerConfig(
        vocab_size=64, embed_dim=32, window_size=128, num_layers=1,
        num_heads=2, use_relative_attention=True, use_pallas_attention=True,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    model = Transformer(config)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 128), 0, 64)
    labels = jax.random.randint(jax.random.PRNGKey(1), (2, 128), 0, 64)

    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(2), tokens, deterministic=True)

        def loss_fn(params):
            logits, _ = model.apply(params, tokens, deterministic=False)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            return -jnp.mean(
                jnp.take_along_axis(logp, labels[..., None], axis=-1)
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)

    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # The relative embedding must receive gradient through the fused backward.
    rel_grads = [
        np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(grads)
        if "rel_embedding" in jax.tree_util.keystr(path)
    ]
    assert rel_grads and any(np.abs(g).max() > 0 for g in rel_grads)


def test_flash_train_trajectory_matches_band():
    """Multi-step Adam training through flash must track the band path: this
    exercises dE accumulation across batches/blocks and the optimizer
    coupling, which a single-point grad check can miss."""
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    def run(use_pallas):
        config = TransformerConfig(
            vocab_size=64, embed_dim=32, window_size=128, num_layers=2,
            num_heads=2, use_relative_attention=True,
            use_pallas_attention=use_pallas,
            attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        )
        trainer = Trainer(Transformer(config), ModelType.TRANSFORMER, 1e-3, seed=7)
        state = trainer.init_state(2, 128)
        step_rng = trainer.make_dropout_rng()
        rng = np.random.default_rng(7)
        losses = []
        for _ in range(5):
            x = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)
            y = jnp.asarray(rng.integers(0, 64, (2, 128)), jnp.int32)
            state, metrics, _ = trainer.train_step(state, x, y, step_rng, None)
            losses.append(float(metrics["loss"]))
        return losses

    band = run(False)
    with pltpu.force_tpu_interpret_mode():
        flash = run(True)
    np.testing.assert_allclose(flash, band, rtol=2e-4, atol=2e-4)


def test_flash_attention_rejects_unaligned_seq():
    q = jnp.zeros((1, 1, 100, 16))
    with pytest.raises(ValueError):
        relative_flash_attention(q, q, q, None)


def test_dropout_request_falls_back_to_band_on_cpu(monkeypatch):
    """Flash dropout needs the TPU hardware PRNG (the interpreter stubs it
    to zeros): on CPU backends an active-dropout call must route to band,
    while the deterministic call still takes flash."""
    import composer_tpu.ops.attention as attention_mod
    import composer_tpu.ops.band_attention as band_mod
    import composer_tpu.ops.pallas_attention as pallas_mod

    calls = {"band": 0, "pallas": 0}

    def fake_band(q, *args, **kwargs):
        calls["band"] += 1
        return jnp.zeros_like(q)

    def fake_pallas(q, *args, **kwargs):
        calls["pallas"] += 1
        return jnp.zeros_like(q)

    monkeypatch.setattr(band_mod, "band_causal_attention", fake_band)
    monkeypatch.setattr(pallas_mod, "relative_flash_attention", fake_pallas)

    q = jnp.zeros((1, 2, 128, 8))
    attention_mod.multihead_attention(
        q, q, q, use_pallas=True, band_block_size=128,
        dropout_rng=jax.random.PRNGKey(0), dropout_rate=0.1,
    )
    assert calls == {"band": 1, "pallas": 0}

    attention_mod.multihead_attention(
        q, q, q, use_pallas=True, band_block_size=128,
    )
    assert calls == {"band": 1, "pallas": 1}


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


def test_pick_block_policy():
    """The round-5 tile policy: 512 for bf16 sequences that divide and fit
    the backward's scoped-VMEM envelope (seq_len <= 2048); f32 callers and
    longer sequences cap at 256; non-multiples fall back to 128."""
    import jax.numpy as jnp

    from composer_tpu.ops.pallas_attention import _pick_block

    assert _pick_block(2048, jnp.bfloat16) == 512
    assert _pick_block(1024, jnp.bfloat16) == 512
    assert _pick_block(2048, jnp.float32) == 256   # f32 bwd blows scoped VMEM
    assert _pick_block(4096, jnp.bfloat16) == 256  # S-dependent dq block
    assert _pick_block(2048) == 512
    assert _pick_block(384, jnp.bfloat16) == 128   # divides neither 512/256
    assert _pick_block(256, jnp.bfloat16) == 256
