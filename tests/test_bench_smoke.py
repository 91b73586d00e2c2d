"""Benchmark harness smoke tests: every bench function runs (tiny shapes,
CPU) and returns the schema bench.py/the driver expect.

These exist because the harness once silently measured dispatch-only time
(block_until_ready is a no-op on the axon backend); keeping each entry
callable and schema-correct is cheap insurance for the recorded tables.
"""

import jax
import pytest

from composer_tpu import bench


def _check_schema(result):
    assert set(result) >= {"metric", "value", "unit", "vs_baseline", "detail"}
    assert result["value"] > 0


def test_decode_benchmark_smoke():
    _check_schema(bench.run_decode_benchmark(length=12, prompt_length=4, repeats=1))


def test_batched_decode_benchmark_smoke():
    _check_schema(
        bench.run_batched_decode_benchmark(
            batch_size=2, length=12, prompt_length=4, repeats=1
        )
    )


def test_rnn_decode_benchmark_smoke():
    _check_schema(bench.run_rnn_decode_benchmark(length=12, batch_size=2, repeats=1))


def test_preprocess_benchmark_smoke():
    result = bench.run_preprocess_benchmark(num_files=2)
    _check_schema(result)
    assert result["detail"]["export_files_per_sec"] > 0


def test_train_benchmark_smoke():
    _check_schema(bench.run_train_benchmark(batch_size=2, window_size=64, steps=1))


def test_rnn_train_benchmark_smoke():
    _check_schema(bench.run_rnn_train_benchmark(batch_size=2, window_size=16, steps=1))


def test_serving_benchmark_smoke():
    result = bench.run_serving_benchmark(
        concurrency=3, length=8, prompt_length=4, max_batch_size=2
    )
    _check_schema(result)
    assert sum(result["detail"]["coalesced_batches"]) == 3


def test_poisson_benchmark_smoke():
    result = bench.run_poisson_serving_benchmark(
        continuous=True, requests=4, mean_interarrival_ms=5.0,
        lengths=(4, 6), slots=2, seg_steps=4,
        embed_dim=32, num_layers=1, cache_len=128, temperature=0.0,
    )
    _check_schema(result)
    assert result["detail"]["occupancy_mean"] > 0
    assert result["detail"]["offered_events_per_sec"] > 0


def test_overload_soak_benchmark_smoke():
    result = bench.run_overload_soak_benchmark(
        duration_s=2.0, mean_interarrival_ms=50.0, lengths=(4, 6),
        slots=2, seg_steps=4, max_queue_depth=2, deadline_ms=60_000.0,
        embed_dim=32, num_layers=1, cache_len=128, temperature=0.0,
    )
    _check_schema(result)
    detail = result["detail"]
    assert detail["completed"] >= 1
    assert detail["final_queue_depth"] == 0
    assert detail["completed"] + detail["rejected"] + detail["expired"] + \
        detail["other_errors"] == detail["requests"]


def test_long_prompt_benchmark_smoke():
    result = bench.run_long_prompt_serving_benchmark(
        prompt_len=12, length=4, requests=2, slots=2, seg_steps=4,
        embed_dim=32, num_layers=1, cache_len=128, temperature=0.0,
        prefill=True, prefill_min=4,
    )
    _check_schema(result)
    assert result["detail"]["ttft_p95_s"] > 0
    assert result["detail"]["total_p95_s"] >= result["detail"]["ttft_p95_s"]
