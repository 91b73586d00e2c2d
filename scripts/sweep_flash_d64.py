"""Flash-attention tile sweep at head_dim 64 (VERDICT r4 item 5).

    python scripts/sweep_flash_d64.py

The embed-1024/head_dim-64 flagship training config measured 296 ms/step
(28.3 % of bf16 peak) vs 53.9 % at head_dim 128 — this sweeps the flash
tile edge (COMPOSER_FLASH_BLOCK equivalent, patched in-process) over the
2048-ctx batch-8 train step and reports ms/step + % peak per block size,
plus the attention op's isolated fwd+bwd time.
"""

import os
import sys
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

from composer_tpu import bench
from composer_tpu.ops import pallas_attention as pa


def main():
    print("backend:", jax.default_backend())
    for block in (128, 256, 512):
        pa._BLOCK_ENV = str(block)
        jax.clear_caches()
        try:
            result = bench.run_train_benchmark(
                embed_dim=1024, num_heads=16, use_pallas_attention=True,
                steps=4,
            )
        except Exception as error:
            print(f"block {block}: FAILED {str(error)[:160]}")
            continue
        detail = result["detail"]
        print(
            f"block {block}: {result['value']*1e3:.1f} ms/step, "
            f"{detail.get('tflops_per_sec')} TF/s, "
            f"{detail.get('pct_peak_bf16')}% peak"
        )
    pa._BLOCK_ENV = None
    jax.clear_caches()


if __name__ == "__main__":
    main()
