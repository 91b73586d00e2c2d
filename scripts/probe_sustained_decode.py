#!/usr/bin/env python
"""Probe: single-dispatch vs pipelined (sustained) batch-8 decode throughput.

The headline bench times ONE generate_ids dispatch, whose wall time includes
this environment's ~24 ms remote-tunnel dispatch latency on ~50 ms of device
work. A serving deployment keeps the device queue full, so steady-state
throughput amortizes the dispatch latency across in-flight generations. This
probe measures both: K back-to-back dispatches fetched at the end vs K
dispatches each fetched before the next starts.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from composer_tpu.bench import _default_transformer
from composer_tpu.models import ModelType
from composer_tpu.train.generate import generate_ids


def main():
    length, batch, plen = 1014, 8, 10
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model = _default_transformer(False, dtype, 256)
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 390, (batch, plen)).astype(np.int32)

    def dispatch(seed):
        return generate_ids(
            model, ModelType.TRANSFORMER, params, prompt,
            length=length, temperature=1.0, seed=seed,
        )

    np.asarray(dispatch(0))  # compile + warm

    # Serial: fetch each before dispatching the next (the current headline).
    times = []
    for rep in range(3):
        start = time.perf_counter()
        for k in range(4):
            np.asarray(dispatch(100 + k))
        times.append(time.perf_counter() - start)
    serial = min(times) / 4

    # Pipelined: K dispatches in flight, fetch at the end.
    results = {}
    for inflight in (2, 4, 8):
        times = []
        for rep in range(3):
            start = time.perf_counter()
            outs = [dispatch(200 + rep * 16 + k) for k in range(inflight)]
            for out in outs:
                np.asarray(out)
            times.append(time.perf_counter() - start)
        results[inflight] = min(times) / inflight

    line = {
        "serial_s_per_gen": round(serial, 4),
        "serial_ev_s": round(batch * length / serial, 1),
    }
    for inflight, sec in results.items():
        line[f"pipelined{inflight}_s_per_gen"] = round(sec, 4)
        line[f"pipelined{inflight}_ev_s"] = round(batch * length / sec, 1)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
