"""Bringup: speculative block-decode kernel vs the XLA scan path (greedy).

Run on CPU (interpret mode):
    JAX_PLATFORMS=cpu python scripts/bringup_spec_decode.py
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")

from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.ops import decode_kernel as dk
from composer_tpu.ops import decode_kernel_spec as dks
from composer_tpu.train.generate import generate_ids


def check(use_relative, prompt, length, label):
    config = TransformerConfig(
        vocab_size=390, embed_dim=64, window_size=64, num_layers=2,
        num_heads=4, use_relative_attention=use_relative,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.3,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)

    xla_out = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt[None],
        length=length, temperature=0.0, seed=0, engine="xla",
    )
    expected = np.asarray(xla_out[0, prompt.shape[0]:])

    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    cache_len = prompt.shape[0] + length
    tokens, stats = dks.speculative_generate(
        packed, prompt, 0, 0.0,
        config=config, length=length, cache_len=cache_len, interpret=True,
    )
    tokens = np.asarray(tokens)
    stats = np.asarray(stats)
    ok = np.array_equal(tokens, expected)
    print(f"{label}: match={ok} blocks={stats[0]} gen_blocks={stats[1]} "
          f"final_pos={stats[2]} tokens/gen_block="
          f"{length / max(stats[1], 1):.2f}")
    if not ok:
        mism = np.nonzero(tokens != expected)[0]
        print(f"  first mismatch at {mism[0] if len(mism) else '?'}:")
        print(f"  got      {tokens[:24]}")
        print(f"  expected {expected[:24]}")
    return ok


def main():
    rng = np.random.default_rng(0)
    all_ok = True
    # Random prompt.
    all_ok &= check(False, rng.integers(0, 390, 7).astype(np.int32), 48,
                    "plain random-prompt")
    # Highly repetitive prompt: the n-gram draft should accept a lot.
    pat = np.array([5, 100, 300, 17, 5, 100, 300, 17, 5, 100, 300, 17],
                   np.int32)
    all_ok &= check(False, pat, 48, "plain repetitive-prompt")
    all_ok &= check(True, rng.integers(0, 390, 10).astype(np.int32), 40,
                    "rel random-prompt")
    all_ok &= check(True, pat, 40, "rel repetitive-prompt")
    # Length-1 prompt edge.
    all_ok &= check(False, np.array([42], np.int32), 33, "plen-1")
    # Long prompt (prefill-dominated).
    all_ok &= check(False, rng.integers(0, 390, 50).astype(np.int32), 10,
                    "long-prompt")
    print("ALL OK" if all_ok else "FAILURES")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
