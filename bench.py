#!/usr/bin/env python
"""Headline benchmark: KV-cached decode throughput of the default Transformer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Workload (BASELINE.md row 1): `composer generate` on the default-config
Transformer (vocab 390, 8 layers, 256 embed, 16 heads, window 1024),
temperature 1.0, KV-cached decode, measured end-to-end wall clock on one
chip. The headline number is per-chip serving throughput: 8 concurrent
sequences through the batched fused decode kernel, 1014 events each
(10-token prompt + 1014 generated = the full 1024-position window).

The single-sequence latency path (the batch-1 megakernel) is reported in
``detail.batch1``: wall events/sec plus the marginal on-device rate. Wall
numbers in this environment include a constant ~24 ms per-dispatch latency
from the remote-device tunnel (measured as the cost of a trivial 1-op
program), which bounds batch-1 wall throughput at ~42k events/sec no matter
how fast the chip is; the marginal rate (length-differenced, so the constant
cancels) is the chip's actual decode speed. See BENCHMARKS.md for the full
table across all BASELINE.md workloads.

The baseline is the north-star target of 50k events/sec/chip (the reference
publishes no numbers; BASELINE.md).
"""

import json
import os
import sys
from pathlib import Path

# Persistent XLA compile cache: the fused decode kernels take minutes to
# compile through this environment's remote compile service, seconds to load
# from cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

sys.path.insert(0, str(Path(__file__).parent))

from composer_tpu.bench import run_decode_benchmark


def main():
    result = run_decode_benchmark(length=1014, batch_size=8)
    line = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "vs_baseline": result["vs_baseline"],
        "detail": result["detail"],
    }
    try:
        batch1 = run_decode_benchmark(length=1024, batch_size=1)
        # The chip-side marginal leads: the wall number in this environment
        # is tunnel-RTT-bound (~25 ms/dispatch) and, even with the bench's
        # cold-tunnel retry, session-dependent in a way the on-device rate
        # is not (VERDICT r4 item 3).
        line["detail"]["batch1"] = {
            "events_per_sec_chip": batch1["detail"][
                "on_device_events_per_sec_marginal"
            ],
            "events_per_sec_wall": batch1["value"],
            "seconds": batch1["detail"]["seconds"],
            "on_device_seconds": batch1["detail"].get("on_device_seconds"),
        }
    except Exception as error:  # headline must still print
        line["detail"]["batch1"] = {"error": str(error)[:200]}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
