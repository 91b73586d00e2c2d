"""Cross-implementation numerics parity: Flax Transformer vs an independent
PyTorch replica built from the same weights.

The reference's NLL parity surface (SURVEY.md §6) cannot be exercised
directly (the TF reference does not run in this environment), so this test
pins the architecture semantics — GPT-2 blocks with the reference's
pre-LN-residual quirk, tanh GELU, tied embeddings, `w*b - 1e4*(1-b)` causal
masking, relative-attention skew — against a from-scratch torch
implementation. Agreement to ~1e-4 means the math, not the framework, defines
the model.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from composer_tpu.models.transformer import Transformer, TransformerConfig

VOCAB = 97


def torch_forward(params, config, tokens):
    """An independent (torch) evaluation of the same architecture."""
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x, dtype=np.float32))

    tokens = torch.from_numpy(tokens).long()
    batch, seq = tokens.shape
    h = t(params["wte"])[tokens] + t(params["wpe"])[:seq][None]

    def layernorm(x, block):
        mean = x.mean(-1, keepdim=True)
        var = x.var(-1, unbiased=False, keepdim=True)
        return (x - mean) / torch.sqrt(var + config.layer_norm_epsilon) * t(
            block["scale"]
        ) + t(block["bias"])

    for index in range(config.num_layers):
        block = params[f"h_{index + 1}"]
        x1 = layernorm(h, block["ln_1"])

        qkv = x1 @ t(block["attn"]["c_attn"]["kernel"]) + t(block["attn"]["c_attn"]["bias"])
        q, k, v = qkv.chunk(3, dim=-1)

        def heads(x):
            return x.view(batch, seq, config.num_heads, config.head_dim).permute(
                0, 2, 1, 3
            )

        q, k, v = heads(q), heads(k), heads(v)
        scores = q @ k.transpose(-1, -2)

        if config.use_relative_attention:
            # Direct (unskewed) relative logits from the decoupled E.
            E = t(block["attn"]["rel_embedding"])  # (H, W, D)
            rel = torch.zeros_like(scores)
            for i in range(seq):
                for j in range(i + 1):
                    distance = i - j
                    e = E[:, config.window_size - 1 - distance]  # (H, D)
                    rel[:, :, i, j] = (q[:, :, i] * e[None]).sum(-1)
            scores = scores + rel

        if config.scale_attention:
            scores = scores / (config.head_dim ** 0.5)

        mask = torch.tril(torch.ones(seq, seq))
        scores = scores * mask - 1e4 * (1 - mask)
        weights = torch.softmax(scores, dim=-1)
        attended = (weights @ v).permute(0, 2, 1, 3).reshape(batch, seq, -1)
        attended = attended @ t(block["attn"]["c_proj"]["kernel"]) + t(
            block["attn"]["c_proj"]["bias"]
        )
        x2 = x1 + attended  # reference residual quirk: adds to ln_1 output

        m = layernorm(x2, block["ln_2"])
        hidden = m @ t(block["mlp"]["c_fc"]["kernel"]) + t(block["mlp"]["c_fc"]["bias"])
        hidden = (
            0.5 * hidden * (1 + torch.tanh(0.7978845608028654 * (hidden + 0.044715 * hidden**3)))
        )
        h = x2 + hidden @ t(block["mlp"]["c_proj"]["kernel"]) + t(
            block["mlp"]["c_proj"]["bias"]
        )

    h = layernorm(h, params["ln_f"])
    return (h @ t(params["wte"]).T).numpy()


@pytest.mark.parametrize("use_relative", [False, True])
def test_flax_matches_torch(use_relative):
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=32, window_size=16, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.1,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(3), 1, 8)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, VOCAB, (2, 12)).astype(np.int64)

    flax_logits, _ = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    torch_logits = torch_forward(jax.device_get(params), config, tokens)

    np.testing.assert_allclose(
        np.asarray(flax_logits), torch_logits, rtol=2e-4, atol=2e-4
    )
