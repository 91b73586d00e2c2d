"""TPU probe: compiled speculative kernel — parity + block-rate measurement.

    python scripts/probe_spec_tpu.py

Measures, on the default serving config (vocab 390, embed 256, 16 heads,
8 layers):
  1. compiled greedy parity vs the sequential megakernel (random weights);
  2. worst-case throughput (random weights, acceptance ~1 token/block);
  3. ceiling throughput (near-zero init -> constant stream, ~T tokens/block);
both via two-length differencing so the tunnel RTT cancels.
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.ops import decode_kernel as dk
from composer_tpu.ops import decode_kernel_spec as dks


def build(stddev, rel=False, seed=0):
    config = TransformerConfig(
        vocab_size=390, embed_dim=256, window_size=1024, num_layers=8,
        num_heads=16, use_relative_attention=rel,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=stddev,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    packed = dk.pack_weights(params, config, dtype=jnp.bfloat16)
    return config, packed


def run_spec(config, packed, prompt, length, temperature=0.0, seed=0):
    tokens, stats = dks.speculative_generate(
        packed, prompt, seed, temperature,
        config=config, length=length, cache_len=1024,
    )
    return np.asarray(tokens), np.asarray(stats)


def run_seq(config, packed, prompt, length, temperature=0.0, seed=0):
    tokens = dk.megakernel_generate(
        packed, prompt, seed, temperature,
        config=config, length=length, cache_len=1024,
    )
    return np.asarray(tokens)


def timed(fn, *args, repeats=3, **kw):
    fn(*args, **kw)  # compile + warm
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    print("backend:", jax.default_backend())
    prompt = np.array([5, 100, 300, 17, 42, 8, 250, 31, 77, 122], np.int32)

    # --- 1. compiled greedy parity (plain + rel) ---
    for rel in (False, True):
        config, packed = build(0.3, rel=rel)
        seq = run_seq(config, packed, prompt, 256)
        spec, stats = run_spec(config, packed, prompt, 256)
        ok = np.array_equal(seq, spec)
        print(f"parity rel={rel}: {ok} blocks={stats[0]} gen_blocks={stats[1]}"
              f" tok/blk={256 / max(stats[1], 1):.2f}")
        if not ok:
            mism = np.nonzero(seq != spec)[0]
            print("  first mismatch:", mism[:5], seq[:16], spec[:16])

    # --- 2. worst-case rate (random weights) ---
    config, packed = build(0.3)
    for name, cp in (("worst(random)", (config, packed)),
                     ("ceiling(const)", build(1e-3))):
        config, packed = cp
        (_, s_short), t_short = timed(run_spec, config, packed, prompt, 134)
        (_, s_long), t_long = timed(run_spec, config, packed, prompt, 1014)
        marg = (1014 - 134) / (t_long - t_short)
        blocks = s_long[0] - s_short[0]
        print(f"spec {name}: wall {1014 / t_long:,.0f} ev/s, marginal "
              f"{marg:,.0f} ev/s, blocks(l-s)={blocks}, "
              f"block rate={(1014 - 134) / max(blocks, 1):.2f} tok/blk, "
              f"us/block={1e6 * (t_long - t_short) / max(blocks, 1):.1f}")

    # sequential kernel baseline on the same machine state
    config, packed = build(0.3)
    _, t_short = timed(run_seq, config, packed, prompt, 134)
    _, t_long = timed(run_seq, config, packed, prompt, 1014)
    print(f"seq baseline: wall {1014 / t_long:,.0f} ev/s, marginal "
          f"{(1014 - 134) / (t_long - t_short):,.0f} ev/s, "
          f"us/step={1e6 * (t_long - t_short) / 880:.1f}")

    # --- 3. sampled-path distribution: spec vs sequential kernel ---
    # Both paths must draw from the same per-position conditionals. On a
    # SMALL model the unigram histogram over many seeds pins this: compare
    # spec-vs-seq against seq-vs-seq (different seed halves) as the noise
    # floor.
    config_s = TransformerConfig(
        vocab_size=96, embed_dim=64, window_size=128, num_layers=2,
        num_heads=4, use_relative_attention=False,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.12,
    )
    model_s = Transformer(config_s)
    params_s = model_s.init_params(jax.random.PRNGKey(3), 1, 8)
    packed_s = dk.pack_weights(params_s, config_s, dtype=jnp.bfloat16)
    pr = np.array([5, 60, 30], np.int32)
    L = 96

    def hist(fn, seeds):
        h = np.zeros(96, np.int64)
        for s in seeds:
            toks = fn(s)
            h += np.bincount(np.asarray(toks), minlength=96)
        return h / h.sum()

    def spec_draw(s):
        t, _ = dks.speculative_generate(
            packed_s, pr, s, 1.0, config=config_s, length=L, cache_len=128)
        return t

    def seq_draw(s):
        return dk.megakernel_generate(
            packed_s, pr, s, 1.0, config=config_s, length=L, cache_len=128)

    seeds = list(range(200))
    h_spec = hist(spec_draw, seeds)
    h_seq_a = hist(seq_draw, seeds[:100])
    h_seq_b = hist(seq_draw, seeds[100:])
    tv_cross = 0.5 * np.abs(h_spec - (h_seq_a + h_seq_b) / 2).sum()
    tv_noise = 0.5 * np.abs(h_seq_a - h_seq_b).sum()
    print(f"sampled dist: TV(spec, seq)={tv_cross:.4f} vs seq split noise "
          f"TV={tv_noise:.4f} -> {'OK' if tv_cross < 3 * tv_noise else 'SUSPECT'}")


if __name__ == "__main__":
    main()
