"""Isolated attention-op benchmark: band vs flash at a given arch.

Measures on-device seconds (profiler module row) for forward-only and
forward+backward of the attention op alone, outside the full train step —
the tool for attributing the flagship-arch (head_dim 16) gap between the
Pallas flash kernel and the band path (TODO.md round-3 item 1).

Usage: python scripts/bench_attention_op.py [--depth 16] [--impl band,flash]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def _device_seconds(call, calls=5):
    from composer_tpu.bench import _device_seconds_per_call

    return _device_seconds_per_call(call, calls=calls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--window", type=int, default=2048)
    ap.add_argument("--impl", default="band,flash")
    ap.add_argument("--calls", type=int, default=5)
    ap.add_argument("--rel", default="1")
    args = ap.parse_args()

    from composer_tpu.ops.band_attention import band_causal_attention
    from composer_tpu.ops.pallas_attention import relative_flash_attention

    b, h, s, d, w = args.batch, args.heads, args.seq, args.depth, args.window
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dt)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dt)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dt)
    e = (
        jnp.asarray(rng.standard_normal((h, w, d)) * 0.02, dt)
        if args.rel == "1"
        else None
    )

    impls = {}
    if "band" in args.impl:
        impls["band"] = lambda q, k, v, e: band_causal_attention(q, k, v, e)
    if "flash" in args.impl:
        impls["flash"] = lambda q, k, v, e: relative_flash_attention(q, k, v, e)

    for name, fn in impls.items():
        fwd = jax.jit(lambda q, k, v, e, fn=fn: fn(q, k, v, e))

        def loss(q, k, v, e, fn=fn):
            return jnp.sum(fn(q, k, v, e).astype(jnp.float32))

        if e is not None:
            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        else:
            grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        def call_fwd():
            np.asarray(fwd(q, k, v, e)[0, 0, 0])

        def call_grad():
            g = grad(q, k, v, e)
            np.asarray(g[0][0, 0, 0])

        t0 = time.perf_counter()
        call_fwd()
        print(f"{name} fwd compile: {time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        call_grad()
        print(f"{name} grad compile: {time.perf_counter() - t0:.1f}s", flush=True)

        sec_f = _device_seconds(call_fwd, calls=args.calls)
        sec_g = _device_seconds(call_grad, calls=args.calls)
        print(
            f"{name}: D={d} S={s} bh={b*h} fwd={sec_f*1e3:.2f} ms "
            f"fwd+bwd={sec_g*1e3:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
