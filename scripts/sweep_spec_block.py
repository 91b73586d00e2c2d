"""Block-size sweep for the speculative decode kernel on a TRAINED model.

    python scripts/sweep_spec_block.py [RESTOREDIR]

Re-run after any change to the kernel's acceptance accounting (the
regime defaults SPEC_BLOCK_GREEDY / SPEC_BLOCK_SAMPLED in
ops/decode_kernel_spec.py were tuned from this table). Measures, per
block size T and per regime (greedy / temperature 0.9):

* realized acceptance (tokens per generation block), and
* the marginal events/sec via two-length wall differencing (the tunnel
  RTT cancels in the difference),

against the sequential megakernel baseline on the same session.
"""

import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).parent.parent))

import glob

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.cli import (
    _make_trainer, get_batch_size, get_config_from_restoredir,
    get_window_size, vocabulary_from_config,
)
from composer_tpu.models import ModelType
from composer_tpu.ops import decode_kernel as dk
from composer_tpu.ops import decode_kernel_spec as dks

SHORT, LONG = 134, 1014


def timed(fn, repeats=3):
    fn()  # compile + warm
    best = 1e9
    out = None
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    if len(sys.argv) > 1:
        restoredir = sys.argv[1]
    else:
        candidates = sorted(glob.glob("/tmp/speccorpus/logs/transformer-*"))
        if not candidates:
            sys.exit("no trained logdir found; pass RESTOREDIR")
        restoredir = candidates[-1]
    print("backend:", jax.default_backend(), "model:", restoredir)

    config = get_config_from_restoredir(restoredir)
    trainer = _make_trainer(ModelType.TRANSFORMER, config)
    state = trainer.restore(
        restoredir,
        get_batch_size(ModelType.TRANSFORMER, config),
        get_window_size(ModelType.TRANSFORMER, config),
    )
    model = trainer.model
    packed = dk.pack_weights(state.params, model.config, dtype=jnp.bfloat16)
    vocab = vocabulary_from_config(config)
    prompt = np.array(
        [vocab.velocity_offset + vocab.velocity_bins // 2, 60], np.int32
    )
    cache_len = prompt.shape[0] + LONG

    # Sequential baseline.
    def seq(length, temperature):
        def call():
            return np.asarray(dk.megakernel_generate(
                packed, prompt, 7, temperature,
                config=model.config, length=length, cache_len=cache_len,
            ))
        return call

    for temperature, label in ((0.0, "greedy"), (0.9, "temp0.9")):
        _, t_short = timed(seq(SHORT, temperature))
        _, t_long = timed(seq(LONG, temperature))
        marginal = (LONG - SHORT) / (t_long - t_short)
        print(f"seq {label}: marginal {marginal:,.0f} ev/s "
              f"(wall {LONG / t_long:,.0f})")

    # Speculative sweep.
    for temperature, label in ((0.0, "greedy"), (0.9, "temp0.9")):
        for T in (4, 6, 8, 10):
            def spec(length):
                def call():
                    tokens, stats = dks.speculative_generate(
                        packed, prompt, 7, temperature,
                        config=model.config, length=length,
                        cache_len=cache_len, block=T,
                    )
                    return np.asarray(tokens), np.asarray(stats)
                return call

            (_, s_short), t_short = timed(spec(SHORT))
            (_, s_long), t_long = timed(spec(LONG))
            marginal = (LONG - SHORT) / (t_long - t_short)
            gen_blocks = s_long[1] - s_short[1]
            acceptance = (LONG - SHORT) / max(gen_blocks, 1)
            print(f"spec {label} T={T}: marginal {marginal:,.0f} ev/s, "
                  f"acceptance {acceptance:.2f} tok/blk, "
                  f"us/block {1e6 * (t_long - t_short) / max(gen_blocks, 1):.1f}")


if __name__ == "__main__":
    main()
