"""Multi-chip serving: batched scan decode with the batch sharded over a mesh.

The decode path is pure jit, so placing the prompt with a batch sharding
makes XLA partition the whole generation (cache included) across devices —
tokens must be identical to the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.parallel import batch_sharding, create_mesh, replicated_sharding
from composer_tpu.train.generate import generate_ids


def test_sharded_batched_generation_matches_single_device():
    assert jax.device_count() >= 8
    config = TransformerConfig(
        vocab_size=120, embed_dim=32, window_size=64, num_layers=2,
        num_heads=4, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.2,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 120, (8, 4)).astype(np.int32)

    single = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt,
        length=16, temperature=0.0, seed=0, engine="xla",
    )

    mesh = create_mesh(data=8, model=1)
    sharded_prompt = jax.device_put(jnp.asarray(prompt), batch_sharding(mesh))
    sharded_params = jax.device_put(params, replicated_sharding(mesh))
    sharded = generate_ids(
        model, ModelType.TRANSFORMER, sharded_params, sharded_prompt,
        length=16, temperature=0.0, seed=0, engine="xla",
    )

    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))


def test_band_attention_training_step_on_tp_mesh_matches_single_device():
    """Band-coordinate attention (the training default) under a
    (data=4, model=2) mesh: the tensor-parallel sharding of heads must not
    change the loss/gradients vs a single device."""
    import jax.numpy as jnp
    from composer_tpu.train.trainer import Trainer

    assert jax.device_count() >= 8
    config = TransformerConfig(
        vocab_size=120, embed_dim=32, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=True, band_block_size=32,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 120, (8, 64)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 120, (8, 64)), jnp.int32)
    key = jax.random.PRNGKey(0)

    losses = {}
    for name, mesh in (
        ("single", None),
        ("tp", create_mesh(data=4, model=2)),
    ):
        trainer = Trainer(Transformer(config), ModelType.TRANSFORMER, 1e-2, mesh=mesh, seed=0)
        state = trainer.init_state(8, 64)
        seq = []
        for _ in range(3):
            state, metrics, _ = trainer.train_step(state, x, y, key, None)
            seq.append(float(metrics["loss"]))
        losses[name] = seq

    np.testing.assert_allclose(losses["tp"], losses["single"], rtol=2e-5, atol=2e-5)
