"""Compiled numeric check for the flash kernel across tile edges.

    python scripts/check_flash_block512.py

Pins the compiled flash forward + gradients (dq/dk/dv/dE) against XLA
autodiff of the reference skew formulation, at the tile edges the round-5
policy picks: f32 @ block 256 (tight bar — the f32 path caps at 256, the
512 backward blows scoped VMEM with f32 tiles) and bf16 @ block 512 for
head_dim 64 and 128 (bf16 bar: input rounding dominates).

NOTE do not set jax_default_matmul_precision=highest globally here: the
config leaks into the Pallas kernel's bf16 dots, which Mosaic rejects
("Bad lhs type") — scope HIGHEST to the reference einsums instead.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from composer_tpu.ops.attention import causal_mask, relative_logits_full
from composer_tpu.ops.pallas_attention import relative_flash_attention

HIGHEST = jax.lax.Precision.HIGHEST


def reference(q, k, v, e):
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum(
        "bhsd,bhtd->bhst", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=HIGHEST,
    )
    rel = relative_logits_full(q.astype(jnp.float32), e.astype(jnp.float32))
    scores = (scores + rel) * scale
    mask = causal_mask(q.shape[2], q.shape[2])
    scores = jnp.where(mask > 0, scores, -1e30)
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhst,bhtd->bhsd", w, v.astype(jnp.float32), precision=HIGHEST
    )


def check(label, S, D, H, B, dtype, block, bar):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = (jax.random.normal(ks[0], (B, H, S, D), jnp.float32) * 0.5).astype(dtype)
    k = (jax.random.normal(ks[1], (B, H, S, D), jnp.float32) * 0.5).astype(dtype)
    v = (jax.random.normal(ks[2], (B, H, S, D), jnp.float32) * 0.5).astype(dtype)
    e = (jax.random.normal(ks[3], (H, S, D), jnp.float32) * 0.1).astype(dtype)
    do = jax.random.normal(ks[4], (B, H, S, D), jnp.float32)

    def loss_f(q, k, v, e):
        out = relative_flash_attention(q, k, v, e, block=block, interpret=False)
        return jnp.sum(out.astype(jnp.float32) * do)

    def loss_r(q, k, v, e):
        return jnp.sum(reference(q, k, v, e) * do)

    out_f = relative_flash_attention(
        q, k, v, e, block=block, interpret=False
    ).astype(jnp.float32)
    out_r = reference(q, k, v, e)
    errs = [float(jnp.max(jnp.abs(out_f - out_r)) / (jnp.max(jnp.abs(out_r)) + 1e-12))]
    g_f = jax.grad(loss_f, argnums=(0, 1, 2, 3))(q, k, v, e)
    g_r = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, e)
    for a, b in zip(g_f, g_r):
        errs.append(float(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            / (jnp.max(jnp.abs(b).astype(jnp.float32)) + 1e-12)
        ))
    names = ["fwd", "dq", "dk", "dv", "dE"]
    status = "OK" if all(err < bar for err in errs) else "FAIL"
    print(f"RESULT {label}: "
          + " ".join(f"{n}={err:.2e}" for n, err in zip(names, errs))
          + f" [{status}, bar {bar}]", flush=True)


def main():
    print("backend:", jax.default_backend())
    check("f32 block256 S1024 D64", 1024, 64, 4, 2, jnp.float32, 256, 5e-4)
    check("bf16 block512 S2048 D64", 2048, 64, 4, 2, jnp.bfloat16, 512, 3e-2)
    check("bf16 block256 S2048 D64", 2048, 64, 4, 2, jnp.bfloat16, 256, 3e-2)
    check("bf16 block512 S2048 D128", 2048, 128, 2, 2, jnp.bfloat16, 512, 3e-2)


if __name__ == "__main__":
    main()
