#!/usr/bin/env python
"""Headline benchmark: 1024-event KV-cached decode on the default Transformer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The baseline is the north-star target of 50k events/sec/chip (the reference
publishes no numbers; BASELINE.md).
"""

import json
import os
import sys
from pathlib import Path

# Persistent XLA compile cache: the fused decode kernel takes minutes to
# compile through this environment's remote compile service, seconds to load
# from cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, str(Path(__file__).parent))

from composer_tpu.bench import run_decode_benchmark


def main():
    result = run_decode_benchmark(length=1024, batch_size=1)
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
                # Wall time here includes a constant ~24 ms per-dispatch
                # latency from this environment's remote-device tunnel; the
                # marginal rate is the chip's actual decode speed (see
                # BENCHMARKS.md for the full table incl. 79k ev/s batched).
                "on_device_events_per_sec_marginal": result["detail"][
                    "on_device_events_per_sec_marginal"
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
