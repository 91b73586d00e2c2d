"""TPU probe: compiled segmented streaming wide kernel.

    python scripts/probe_wide_segmented_tpu.py [--flagship-only]

1. compiled greedy parity vs the whole-generation wide kernel (f32 packed
   weights, embed-256 config, rel ON and OFF) across a segmented run with
   mid-window boundaries;
2. sampled split-invariance: the same seed under two different
   segmentations draws identical streams (per-step reseeding);
3. the flagship weights-over-VMEM config (embed 1024, 8 layers, rel ON,
   bf16): compile + segment throughput at 4 slots.
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
from composer_tpu.ops import decode_kernel_wide_segmented as dws
from composer_tpu.ops.decode_kernel_wide import (
    init_kv_state,
    megakernel_generate_wide,
    pack_weights_wide,
)


def build(embed, rel, layers=8, window=1024, dtype=jnp.float32, seed=0):
    config = TransformerConfig(
        vocab_size=390, embed_dim=embed, window_size=window,
        num_layers=layers, num_heads=16, use_relative_attention=rel,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    packed = pack_weights_wide(params, config, dtype=dtype)
    return config, packed


def run_segments(config, packed, prompts, plens, starts, boundaries,
                 cache, live, temp=0.0, seed=0):
    batch = prompts.shape[0]
    kv, carry = dws.init_wide_segment_state(packed, config, batch, cache)
    chunks = []
    for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
        tokens, kv, carry = dws.decode_segment_wide(
            packed, kv, carry, prompts, plens, starts, b0, seed,
            temp, 0, 0.0,
            config=config, steps=b1 - b0, cache_len=cache, live=live,
            greedy=temp <= 0,
        )
        chunks.append(np.asarray(tokens))
    return np.concatenate(chunks, axis=1)


def parity():
    for rel in (False, True):
        config, packed = build(256, rel, layers=4, window=512)
        rng = np.random.default_rng(0)
        plens = np.array([6, 3, 9, 4], np.int32)
        prompts = rng.integers(0, 390, (4, 9)).astype(np.int32)
        starts = np.zeros(4, np.int32)
        length = 200
        cache = 512
        total = int(plens.max()) + length - 1

        kvw = init_kv_state(config, 4, cache, dtype=jnp.float32)
        whole, _ = megakernel_generate_wide(
            packed, kvw, prompts, 0, 0.0, config=config, length=length,
            cache_len=cache, prompt_lengths=plens,
        )
        whole = np.asarray(whole)

        stream = run_segments(
            config, packed, prompts, plens, starts,
            [0, 37, 100, 150, total], cache, live=512,
        )
        ok = True
        for row in range(4):
            first = int(plens[row]) - 1
            got = stream[row, first : first + length]
            if not np.array_equal(got, whole[row]):
                ok = False
                mism = np.nonzero(got != whole[row])[0]
                print(f"  rel={rel} row {row} first mismatch {mism[:3]}")
        print(f"compiled parity rel={rel}: {ok}")


def sampled_invariance():
    config, packed = build(256, False, layers=2, window=512)
    rng = np.random.default_rng(1)
    plens = np.array([4, 4], np.int32)
    prompts = rng.integers(0, 390, (2, 4)).astype(np.int32)
    starts = np.zeros(2, np.int32)
    total = 120
    a = run_segments(config, packed, prompts, plens, starts,
                     [0, total], 512, 512, temp=0.9, seed=11)
    b = run_segments(config, packed, prompts, plens, starts,
                     [0, 17, 64, 90, total], 512, 512, temp=0.9, seed=11)
    print("sampled split-invariance:", np.array_equal(a, b))


def flagship():
    config, packed = build(1024, True, layers=8, window=1024,
                           dtype=jnp.bfloat16, seed=2)
    slots = 4
    cache = 1024
    rng = np.random.default_rng(3)
    plens = np.full(slots, 8, np.int32)
    prompts = rng.integers(0, 390, (slots, 8)).astype(np.int32)
    starts = np.zeros(slots, np.int32)

    # Warm every compiled variant on a THROWAWAY parked state first: the
    # axon backend's first execution of a fresh program can read garbage
    # (see the kernel module docstring / serving._warm_wide_variant).
    parked = np.full(slots, dws.PARKED, np.int32)
    for live in (256, 512):
        kvw, cw = dws.init_wide_segment_state(packed, config, slots, cache)
        t, kvw, cw = dws.decode_segment_wide(
            packed, kvw, cw, prompts, plens, parked, 0, 0, 0.0, 0, 0.0,
            config=config, steps=64, cache_len=cache, live=live, greedy=True,
        )
        np.asarray(t)
    kv, carry = dws.init_wide_segment_state(packed, config, slots, cache)

    seg = 64
    # Compile + first segment.
    t0 = time.perf_counter()
    tokens, kv, carry = dws.decode_segment_wide(
        packed, kv, carry, prompts, plens, starts, 0, 0, 0.0, 0, 0.0,
        config=config, steps=seg, cache_len=cache, live=256, greedy=True,
    )
    np.asarray(tokens)
    print(f"flagship compile+seg0: {time.perf_counter() - t0:.1f}s")

    # Steady-state segment rate at live 512.
    step0 = seg
    tokens, kv, carry = dws.decode_segment_wide(
        packed, kv, carry, prompts, plens, starts, step0, 0, 0.0, 0, 0.0,
        config=config, steps=seg, cache_len=cache, live=512, greedy=True,
    )
    np.asarray(tokens)
    times = []
    for _ in range(4):
        step0 += seg
        t0 = time.perf_counter()
        tokens, kv, carry = dws.decode_segment_wide(
            packed, kv, carry, prompts, plens, starts, step0, 0, 0.0, 0, 0.0,
            config=config, steps=seg, cache_len=cache, live=512, greedy=True,
        )
        np.asarray(tokens)
        times.append(time.perf_counter() - t0)
        if step0 + 2 * seg > 512:
            break
    best = min(times)
    print(f"flagship seg ({slots} slots x {seg} steps, live 512): "
          f"{best * 1e3:.1f} ms -> {slots * seg / best:,.0f} ev/s aggregate, "
          f"{1e6 * best / seg:.0f} us/step")
    sane = (np.asarray(tokens) >= 0).all() and (np.asarray(tokens) < 390).all()
    print("flagship tokens sane:", bool(sane))


def main():
    print("backend:", jax.default_backend())
    if "--flagship-only" not in sys.argv:
        parity()
        sampled_invariance()
    flagship()


if __name__ == "__main__":
    main()
