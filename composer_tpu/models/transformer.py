"""Music Transformer: a decoder-only LM with optional relative attention.

Architecture parity with the reference (composer/models/transformer.py:599-833):
GPT-2 style — shared (tied) token embedding, learned positional embedding,
embedding dropout, N pre-LN decoder blocks (attention + 4x GELU MLP, residual),
final LayerNorm, tied linear head. GELU uses the tanh approximation
(transformer.py:35-40) for numerics parity.

TPU-first differences from the reference:

* one Flax module, fully functional: ``apply`` is jitted once; no eager ops,
* the KV cache is an explicit pytree carried through ``__call__`` (sized
  statically), so autoregressive decode runs as a ``jax.lax.scan`` entirely
  on device — the reference rebuilt `past` tensors host-side each step and
  its generate loop never actually threaded them (cli.py:663-676),
* relative attention works under the KV cache (see ops/attention.py) and has
  a Pallas fused-kernel path for full-sequence training,
* logical sharding axes are annotated on every weight so the same module
  runs data-parallel, tensor-parallel, or both under a mesh (see
  composer_tpu/parallel/mesh.py for the axis rules).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from composer_tpu.ops import attention as attention_ops

# Logical axis names used by nn.with_logical_partitioning; resolved to mesh
# axes by composer_tpu.parallel.mesh.LOGICAL_AXIS_RULES.
VOCAB_AXIS = "vocab"
EMBED_AXIS = "embed"
MLP_AXIS = "mlp"
HEADS_AXIS = "heads"


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int
    embed_dim: int = 256
    window_size: int = 1024
    num_layers: int = 8
    num_heads: int = 16
    use_relative_attention: bool = False
    attention_dropout_rate: float = 0.1
    residual_dropout_rate: float = 0.1
    layer_norm_epsilon: float = 1e-5
    scale_attention: bool = True
    initializer_mean: float = 0.0
    initializer_stddev: float = 0.02
    use_layer_norm: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    use_pallas_attention: bool = False
    # Memory-efficient differentiable attention for long-context training:
    # scores are computed one q-chunk at a time (O(S*chunk) live memory).
    # Attention dropout folds the chunk index into the rng per chunk.
    attention_chunk_size: int = 0
    # Band-coordinate attention (ops/band_attention.py) for full-sequence
    # passes whose length is a multiple of this block: same numerics as the
    # skew path, no O(S^2) relayout. 0 disables.
    band_block_size: int = 128
    remat: bool = False
    # Multi-device jax.sharding.Mesh for the Pallas flash path (pallas_call
    # is GSPMD-opaque; the kernel runs under shard_map over batch x heads —
    # see ops/pallas_attention.sharded_relative_flash_attention). Set at
    # runtime by the Trainer; never serialized into YAML configs.
    flash_mesh: Any = None

    @property
    def head_dim(self) -> int:
        assert self.embed_dim % self.num_heads == 0
        return self.embed_dim // self.num_heads


def _normal_init(config):
    return nn.initializers.truncated_normal(
        stddev=config.initializer_stddev, lower=-2.0, upper=2.0
    )


def init_cache(config: TransformerConfig, batch_size: int, max_length: int, dtype=None):
    """Preallocated HBM KV cache: a per-layer pytree of [B, H, L, D] buffers."""
    dtype = dtype or config.dtype
    shape = (batch_size, config.num_heads, max_length, config.head_dim)
    return {
        "index": jnp.zeros((), dtype=jnp.int32),
        "layers": [
            {"k": jnp.zeros(shape, dtype=dtype), "v": jnp.zeros(shape, dtype=dtype)}
            for _ in range(config.num_layers)
        ],
    }


class SelfAttention(nn.Module):
    """Fused-QKV causal self-attention with optional relative bias."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, layer_cache=None, cache_index=None, deterministic=True):
        config = self.config
        batch, seq, _ = x.shape

        qkv = nn.Dense(
            3 * config.embed_dim,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                _normal_init(config), (EMBED_AXIS, HEADS_AXIS)
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (HEADS_AXIS,)
            ),
            name="c_attn",
        )(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(batch, seq, config.num_heads, config.head_dim).transpose(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)

        rel_embedding = None
        if config.use_relative_attention:
            rel_embedding = self.param(
                "rel_embedding",
                nn.with_logical_partitioning(
                    nn.initializers.glorot_uniform(), (HEADS_AXIS, None, None)
                ),
                (config.num_heads, config.window_size, config.head_dim),
                config.param_dtype,
            ).astype(config.dtype)

        q_position = None
        new_cache = None
        if layer_cache is not None:
            # Write this step's keys/values at [cache_index, cache_index+seq).
            k_cache = jax.lax.dynamic_update_slice(
                layer_cache["k"], k, (0, 0, cache_index, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                layer_cache["v"], v, (0, 0, cache_index, 0)
            )
            new_cache = {"k": k_cache, "v": v_cache}
            if seq == 1:
                # Incremental decode: attend over the whole cache; the causal
                # mask is derived from the absolute query position.
                k, v = k_cache, v_cache
                q_position = cache_index + seq - 1
                mask = None
            else:
                # Prefill (always from index 0): the square self-attention
                # over just the written prefix — identical math to the
                # uncached path, so relative attention uses the skew trick.
                mask = None
        else:
            mask = None

        dropout_rng = None
        if not deterministic and config.attention_dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        if (
            config.attention_chunk_size
            and layer_cache is None
            and seq % config.attention_chunk_size == 0
            and seq > config.attention_chunk_size
        ):
            from composer_tpu.ops.chunked_attention import chunked_causal_attention

            out = chunked_causal_attention(
                q, k, v, rel_embedding,
                scale=config.scale_attention,
                chunk_size=config.attention_chunk_size,
                dropout_rng=dropout_rng,
                dropout_rate=config.attention_dropout_rate if not deterministic else 0.0,
            )
        else:
            out = attention_ops.multihead_attention(
                q,
                k,
                v,
                rel_embedding=rel_embedding,
                q_position=q_position,
                scale=config.scale_attention,
                mask=mask,
                dropout_rng=dropout_rng,
                dropout_rate=config.attention_dropout_rate if not deterministic else 0.0,
                # Flash is fully trainable (fused Pallas backward incl.
                # in-kernel TPU-PRNG attention dropout); the attention-ops
                # gate falls back to band/XLA off-TPU when dropout is on.
                use_pallas=config.use_pallas_attention,
                band_block_size=config.band_block_size,
                flash_mesh=config.flash_mesh,
            )

        out = out.transpose(0, 2, 1, 3).reshape(batch, seq, config.embed_dim)
        out = nn.Dense(
            config.embed_dim,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                _normal_init(config), (HEADS_AXIS, EMBED_AXIS)
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (EMBED_AXIS,)
            ),
            name="c_proj",
        )(out)
        out = nn.Dropout(config.residual_dropout_rate)(out, deterministic=deterministic)
        return out, new_cache


class Mlp(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        config = self.config
        x = nn.Dense(
            4 * config.embed_dim,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                _normal_init(config), (EMBED_AXIS, MLP_AXIS)
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (MLP_AXIS,)
            ),
            name="c_fc",
        )(x)
        # tanh-approximate GELU for reference numerics parity.
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(
            config.embed_dim,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            kernel_init=nn.with_logical_partitioning(
                _normal_init(config), (MLP_AXIS, EMBED_AXIS)
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), (EMBED_AXIS,)
            ),
            name="c_proj",
        )(x)
        return nn.Dropout(config.residual_dropout_rate)(x, deterministic=deterministic)


class DecoderBlock(nn.Module):
    """Pre-LN decoder block (transformer.py:509-597)."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, x, layer_cache=None, cache_index=None, deterministic=True):
        config = self.config
        h = x
        if config.use_layer_norm:
            h = nn.LayerNorm(
                epsilon=config.layer_norm_epsilon,
                dtype=config.dtype,
                param_dtype=config.param_dtype,
                name="ln_1",
            )(h)
        attn_out, new_cache = SelfAttention(config, name="attn")(
            h, layer_cache, cache_index, deterministic
        )
        # Residual parity quirk: the reference adds the attention output to the
        # *normalized* input, not the raw block input (transformer.py:583-587).
        x = h + attn_out

        m = x
        if config.use_layer_norm:
            m = nn.LayerNorm(
                epsilon=config.layer_norm_epsilon,
                dtype=config.dtype,
                param_dtype=config.param_dtype,
                name="ln_2",
            )(m)
        x = x + Mlp(config, name="mlp")(m, deterministic)
        return x, new_cache


class Transformer(nn.Module):
    """The decoder-only LM. Returns ``(logits, new_cache)``."""

    config: TransformerConfig

    @nn.compact
    def __call__(self, tokens, cache=None, deterministic: bool = True):
        config = self.config
        batch, seq = tokens.shape

        wte = self.param(
            "wte",
            nn.with_logical_partitioning(_normal_init(config), (VOCAB_AXIS, EMBED_AXIS)),
            (config.vocab_size, config.embed_dim),
            config.param_dtype,
        )
        wpe = self.param(
            "wpe",
            nn.with_logical_partitioning(_normal_init(config), (None, EMBED_AXIS)),
            (config.window_size, config.embed_dim),
            config.param_dtype,
        )

        if cache is not None:
            cache_index = cache["index"]
            positions = cache_index + jnp.arange(seq, dtype=jnp.int32)
        else:
            cache_index = None
            positions = jnp.arange(seq, dtype=jnp.int32)

        h = wte.astype(config.dtype)[tokens] + wpe.astype(config.dtype)[positions][None]
        h = nn.Dropout(config.residual_dropout_rate)(h, deterministic=deterministic)

        new_layer_caches = []
        block = DecoderBlock
        if config.remat:
            block = nn.remat(DecoderBlock, static_argnums=(4,))
        for layer in range(config.num_layers):
            layer_cache = cache["layers"][layer] if cache is not None else None
            h, new_layer_cache = block(config, name=f"h_{layer + 1}")(
                h, layer_cache, cache_index, deterministic
            )
            new_layer_caches.append(new_layer_cache)

        h = nn.LayerNorm(
            epsilon=config.layer_norm_epsilon,
            dtype=config.dtype,
            param_dtype=config.param_dtype,
            name="ln_f",
        )(h)

        # Tied output head (transformer.py:120-146 'linear' mode).
        logits = jnp.einsum("bse,ve->bsv", h, wte.astype(config.dtype))

        new_cache = None
        if cache is not None:
            new_cache = {
                "index": cache["index"] + seq,
                "layers": new_layer_caches,
            }
        return logits, new_cache

    def init_params(self, rng, batch_size: int = 1, seq_len: Optional[int] = None):
        seq_len = seq_len or self.config.window_size
        tokens = jnp.zeros((batch_size, seq_len), dtype=jnp.int32)
        params = self.init({"params": rng}, tokens)["params"]
        return nn.unbox(params)  # strip partitioning metadata boxes
