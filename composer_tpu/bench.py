"""Benchmark harness. ``python -m composer_tpu.bench`` runs the full table
(BASELINE.md workloads) and writes BENCHMARKS.md.

The headline metric (BASELINE.md): events/sec/chip for a 1024-event KV-cached
decode of the default-config Transformer (vocab 390, 8 layers, 256 embed, 16
heads, window 1024). The north-star target is >= 50,000 events/sec/chip on
TPU v5e-1; ``vs_baseline`` reports value / 50,000.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

DECODE_TARGET_EVENTS_PER_SEC = 50_000.0


def _timed_once(call):
    start = time.perf_counter()
    call()
    return time.perf_counter() - start


def _device_seconds_per_call(call, calls: int = 3):
    """True on-device seconds per call, via a jax.profiler trace.

    Sums the device-plane durations of the decode program's events across
    ``calls`` invocations. Robust where wall-minus-dispatch-floor is not: the
    remote-device tunnel's per-RPC latency jitters by ~10 ms between runs,
    which swamps a ~14-40 ms on-device program. Returns None if no device
    events are found (e.g. CPU backend).
    """
    import glob
    import gzip
    import json
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        with jax.profiler.trace(tmp):
            for _ in range(calls):
                call()
        traces = sorted(glob.glob(f"{tmp}/plugins/profile/*/*.trace.json.gz"))
        if not traces:
            return None
        with gzip.open(traces[-1]) as fh:
            events = json.load(fh)["traceEvents"]
        device_pids = {
            e["pid"]
            for e in events
            if e.get("ph") == "M"
            and e.get("name") == "process_name"
            and "TPU" in str(e.get("args", {}).get("name", ""))
        }
        # Top-level program durations live on the device plane's
        # "XLA Modules" thread row (events named 'jit_<fn>(<fingerprint>)');
        # summing that row counts each executed program exactly once —
        # nested op rows ("XLA Ops") would double-count the same time.
        module_tids = {
            (e["pid"], e.get("tid"))
            for e in events
            if e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") in device_pids
            and "XLA Modules" in str(e.get("args", {}).get("name", ""))
        }
        total = sum(
            e["dur"]
            for e in events
            if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in module_tids
            and "dur" in e
        )
        if total == 0 and jax.default_backend() != "cpu":
            print(
                "bench: no XLA Modules row in the device trace; cannot "
                "measure on-device time",
                file=sys.stderr,
            )
    if total == 0:
        return None
    return total / 1e6 / calls


# Chip peaks for the roofline column (achieved TFLOP/s and % of peak per
# train row — VERDICT r2 item 6). Keyed on jax device_kind. bf16 MXU peak
# per chip; HBM bandwidth for judging memory-bound rows.
_CHIP_PEAKS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},   # v5e
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v5": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},       # v5p
    "TPU v6 lite": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},  # v6e
}


def _chip_peaks():
    if jax.default_backend() != "tpu":
        return None
    return _CHIP_PEAKS.get(jax.devices()[0].device_kind)


def _transformer_train_tflops(batch_size, window_size, embed_dim, num_heads,
                              num_layers, vocab_size=390, relative=True,
                              ffw_mult=4):
    """Matmul TFLOPs one training step actually issues to the MXU.

    Counts what the dense band/flash paths execute — full S x S attention
    matmuls (causal masking discards half the products but the MXU still
    computes them; flash skips fully-masked j>i tiles but revisits tiles in
    its merged backward, so full-S^2 stays the honest common count) — with
    the standard backward = 2 x forward convention. Relative attention adds
    the Q @ E^T band term, a third S^2-by-depth matmul per head.
    """
    tokens = batch_size * window_size
    # Per-token fwd: QKV+output projections (4 x 2E^2) + MLP (2 x 2E*4E).
    proj = num_layers * (8 + 4 * ffw_mult) * embed_dim ** 2
    # Attention scores + AV (+ rel bias): 2/3 matmuls of 2*S*E per token.
    attn = num_layers * (6 if relative else 4) * window_size * embed_dim
    logits = 2 * embed_dim * vocab_size  # tied-wte readout
    fwd = tokens * (proj + attn + logits)
    return 3 * fwd / 1e12  # fwd + 2x bwd


def _rnn_train_tflops(batch_size, window_size, embed_dim=256,
                      layer_sizes=(512, 512, 512), vocab_size=390):
    """Matmul TFLOPs per MusicRNN training step (4 gates per LSTM layer)."""
    tokens = batch_size * window_size
    flops, fan_in = 0, embed_dim
    for size in layer_sizes:
        flops += 8 * size * (fan_in + size)  # 2 * 4H * (I + H)
        fan_in = size
    flops += 2 * fan_in * vocab_size
    return 3 * tokens * flops / 1e12


def _roofline(tflops_per_step, elapsed_seconds):
    """Achieved TFLOP/s (+ % of chip bf16 peak when known)."""
    achieved = tflops_per_step / elapsed_seconds
    out = {"tflops_per_sec": round(achieved, 2)}
    peaks = _chip_peaks()
    if peaks:
        out["pct_peak_bf16"] = round(100 * achieved / peaks["bf16_tflops"], 1)
    return out


def _default_transformer(use_relative_attention: bool, dtype, embed_dim=256,
                         window_size=1024, num_layers=8):
    from composer_tpu.models.transformer import Transformer, TransformerConfig

    config = TransformerConfig(
        vocab_size=390,
        embed_dim=embed_dim,
        window_size=window_size,
        num_layers=num_layers,
        num_heads=16,
        use_relative_attention=use_relative_attention,
        attention_dropout_rate=0.0,
        residual_dropout_rate=0.0,
        dtype=dtype,
        # Serving path: weights in bf16 too — decode is HBM-bandwidth bound
        # and fp32 params double the per-step weight traffic.
        param_dtype=dtype,
    )
    return Transformer(config)


def run_decode_benchmark(
    length: int = 1024,
    batch_size: int = 1,
    prompt_length: int = 10,
    use_relative_attention: bool = False,
    dtype=None,
    repeats: int = 3,
    seed: int = 0,
    embed_dim: int = 256,
    engine: str = "auto",
):
    """Times the jitted KV-cached scan decode; returns the bench JSON dict.

    ``embed_dim``/``engine`` cover the wide-model serving path: models whose
    packed weights overflow VMEM (e.g. embed 1024, ~200 MB — see
    train/generate.py::_packed_weight_bytes) cannot use the fused megakernel
    and decode through the XLA scan engine instead.
    """
    from composer_tpu.models import ModelType
    from composer_tpu.train.generate import generate_ids

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(use_relative_attention, dtype, embed_dim)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)

    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 390, (batch_size, prompt_length)).astype(np.int32)

    def make_call(gen_length, cache_len=None):
        def call():
            out = generate_ids(
                model, ModelType.TRANSFORMER, params, prompt,
                length=gen_length, temperature=1.0, seed=seed,
                cache_len=cache_len, engine=engine,
            )
            return np.asarray(out)  # force host transfer: the only real sync

        return call

    def timed(gen_length):
        call = make_call(gen_length)
        call()  # compile + warm up
        times = []
        for _ in range(repeats):
            start = time.perf_counter()
            call()
            times.append(time.perf_counter() - start)
        return min(times)

    best = timed(length)

    # On-device marginal rate via the device profiler: device-plane module
    # time is measured at two lengths and differenced, so fixed per-call
    # programs (prefill, the final gather/concatenate) cancel and only the
    # decode scan's per-event cost remains. Wall-clock in this environment
    # includes a ~24 ms per-dispatch remote-tunnel latency that jitters by
    # ~10 ms between runs, so wall-derived estimates proved unstable; the
    # profiler number is the chip's actual throughput. The full-call device
    # time is measured for every batch size (it also anchors the wall
    # outlier check below); the differenced marginal is reported for the
    # batch-1 latency workload.
    marginal = None
    cache = prompt_length + length
    device_seconds = _device_seconds_per_call(make_call(length, cache))
    if batch_size == 1 and device_seconds:
        # Both lengths run against the SAME cache size so per-step cost is
        # identical and the difference isolates the extra decode steps.
        short = max(length // 2, 1)
        short_seconds = _device_seconds_per_call(make_call(short, cache))
        if short_seconds and device_seconds > short_seconds:
            marginal = round(
                batch_size * (length - short)
                / (device_seconds - short_seconds),
                1,
            )

    # Cold-tunnel outlier rejection (VERDICT r4 item 3): a session whose
    # first dispatches ride an unwarmed tunnel can record a wall min 2-3x
    # the true value even under min-of-repeats (BENCH_r04 captured 120 ms
    # for a call that re-measures at 38 ms). The device trace gives the
    # honest lower bound: when the wall min exceeds device time + a
    # generous nominal dispatch latency by 1.75x, the whole first timing
    # loop was an outlier — re-run it once (the tunnel is warm by now,
    # after the profiler passes) and keep the faster measurement.
    nominal_dispatch_s = 0.040
    if device_seconds and best > 1.75 * (device_seconds + nominal_dispatch_s):
        best = min(best, timed(length))

    events_per_sec = batch_size * length / best

    return {
        "metric": "decode_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/sec/chip",
        "vs_baseline": round(events_per_sec / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "length": length,
            "batch_size": batch_size,
            "relative_attention": use_relative_attention,
            **({"embed_dim": embed_dim} if embed_dim != 256 else {}),
            **({"engine": engine} if engine != "auto" else {}),
            "backend": jax.default_backend(),
            "dtype": str(dtype.__name__ if hasattr(dtype, "__name__") else dtype),
            "seconds": round(best, 4),
            "on_device_seconds": (
                round(device_seconds, 4) if device_seconds else None
            ),
            "on_device_events_per_sec_marginal": marginal,
        },
    }


def run_wide_int8_decode_benchmark(batch_size: int = 8, length: int = 1014,
                                   embed_dim: int = 1024):
    """int8 streaming wide decode (COMPOSER_WIDE_INT8 packing).

    Same workload as the bf16 wide row; the detail carries the analytic
    per-step HBM weight-stream sizes so the table shows what the int8
    packing buys (the stream is the wide kernel's dominant cost).
    """
    import os

    os.environ["COMPOSER_WIDE_INT8"] = "1"
    try:
        result = run_decode_benchmark(
            batch_size=batch_size, length=length, embed_dim=embed_dim,
            engine="wide", repeats=2,
        )
    finally:
        os.environ.pop("COMPOSER_WIDE_INT8", None)
    weight_elems = 12 * embed_dim * embed_dim * 8  # matmul blocks, 8 layers
    result["detail"]["int8"] = True
    result["detail"]["weight_stream_mb_per_step"] = round(
        weight_elems / 1e6, 1
    )
    result["detail"]["weight_stream_mb_per_step_bf16"] = round(
        2 * weight_elems / 1e6, 1
    )
    return result


def run_wide_int8_kv_decode_benchmark(batch_size: int = 8,
                                      length: int = 1014,
                                      embed_dim: int = 1024):
    """int8 KV streaming wide decode (COMPOSER_WIDE_INT8_KV).

    Same workload as the bf16 wide row with the KV prefix streamed int8
    (rows quantized at the tail flush, exact per-column dequant epilogues
    — ops/decode_kernel_wide.py). The detail carries the analytic KV
    prefix stream at the mean live prefix (~length/2 rows): the second-
    largest HBM term after the weights, halved by the packing.
    """
    import os

    os.environ["COMPOSER_WIDE_INT8_KV"] = "1"
    try:
        result = run_decode_benchmark(
            batch_size=batch_size, length=length, embed_dim=embed_dim,
            engine="wide", repeats=2,
        )
    finally:
        os.environ.pop("COMPOSER_WIDE_INT8_KV", None)
    layers, live = 8, length // 2
    kv_elems = layers * live * 2 * batch_size * embed_dim
    result["detail"]["int8_kv"] = True
    result["detail"]["kv_stream_mb_per_step"] = round(kv_elems / 1e6, 1)
    result["detail"]["kv_stream_mb_per_step_bf16"] = round(
        2 * kv_elems / 1e6, 1
    )
    return result


def run_batched_decode_benchmark(
    batch_size: int = 64,
    length: int = 2048,
    prompt_length: int = 10,
    dtype=None,
    repeats: int = 2,
    seed: int = 0,
    engine: str = "auto",
    use_relative_attention: bool = False,
):
    """Batched prompted continuation (BASELINE.md row 2). On TPU the auto
    engine serves the batch as sequential VMEM-resident fused-kernel chunks
    (87k ev/s at 64x2048 vs 28k for the staged-cache XLA scan, which re-reads
    the HBM cache every step; pass engine='xla' to measure the scan)."""
    from composer_tpu.models import ModelType
    from composer_tpu.train.generate import generate_ids

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(use_relative_attention, dtype)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 390, (batch_size, prompt_length)).astype(np.int32)

    def run():
        out = generate_ids(
            model, ModelType.TRANSFORMER, params, prompt,
            length=length, temperature=1.0, seed=seed, engine=engine,
        )
        return np.asarray(out)  # force host transfer: the only real sync

    run()
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        run()
        times.append(time.perf_counter() - start)
    best = min(times)
    events_per_sec = batch_size * length / best
    return {
        "metric": "batched_decode_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/sec/chip",
        "vs_baseline": round(events_per_sec / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "batch_size": batch_size, "length": length, "engine": engine,
            "relative_attention": use_relative_attention,
            "seconds": round(best, 3), "backend": jax.default_backend(),
        },
    }


def run_rnn_decode_benchmark(length: int = 1024, batch_size: int = 8, repeats: int = 3, seed: int = 0):
    """MusicRNN stateful decode throughput (XLA scan path; measured 89k
    events/sec marginal at batch 1 on v5e-1, so no fused kernel is needed —
    the LSTM's 3x512 matmuls amortize well under lax.scan)."""
    from composer_tpu.models import ModelType
    from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
    from composer_tpu.train.generate import generate_ids

    model = MusicRNN(MusicRNNConfig(vocab_size=390))
    variables = model.init_variables(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 390, (batch_size, 10)).astype(np.int32)

    def call():
        out = generate_ids(
            model, ModelType.MUSIC_RNN, variables, prompt,
            length=length, temperature=1.0, seed=seed,
        )
        return np.asarray(out)  # force host transfer: the only real sync

    call()
    times = []
    for _ in range(repeats):
        start = time.perf_counter()
        call()
        times.append(time.perf_counter() - start)
    best = min(times)
    events_per_sec = batch_size * length / best

    # Length-differenced on-device marginal (profiler): the stable chip-side
    # rate, immune to the remote tunnel's per-dispatch RTT drift.
    marginal = None
    if jax.default_backend() != "cpu":
        short = length // 2

        def short_call():
            out = generate_ids(
                model, ModelType.MUSIC_RNN, variables, prompt,
                length=short, temperature=1.0, seed=seed,
            )
            return np.asarray(out)

        short_call()
        long_seconds = _device_seconds_per_call(call)
        short_seconds = _device_seconds_per_call(short_call)
        if long_seconds and short_seconds and long_seconds > short_seconds:
            marginal = round(
                batch_size * (length - short) / (long_seconds - short_seconds),
                1,
            )

    return {
        "metric": "rnn_decode_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/sec/chip",
        "vs_baseline": round(events_per_sec / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "length": length, "batch_size": batch_size,
            "seconds": round(best, 4), "backend": jax.default_backend(),
            "on_device_events_per_sec_marginal": marginal,
        },
    }


def run_speculative_benchmark(
    length: int = 1014,
    prompt_length: int = 10,
    repeats: int = 3,
    seed: int = 0,
    restoredir: str = None,
):
    """Batch-1 speculative block decode vs the sequential megakernel.

    Speculative throughput is acceptance-dependent, so three regimes are
    measured (all on-device marginal via profiler differencing):

    * ``floor``: temperature-1.0 sampling on random weights — the stream is
      near-uniform, the n-gram draft almost never hits, and every block
      pays the verify cost for ~1 token. The engine's worst case.
    * ``cycle``: greedy on random weights — random transformers fall into
      short cycles the lookup predicts perfectly; an upper bound.
    * ``trained_greedy`` / ``trained_sampled`` (when ``restoredir`` or
      ``$COMPOSER_SPEC_RESTOREDIR`` points at a trained logdir): the
      realized rates on a real model — greedy (the configuration the
      'auto' engine routes here; 1.85x / 2.32x the sequential kernel on
      the two round-5 trained models) and temperature-0.9 sampling
      (1.09-1.17x on both trained models post-fix, but 0.76x on the
      no-acceptance floor — why sampled auto stays sequential).
      docs/validation.md records the measurement campaigns.

    The headline ``value`` is the trained greedy marginal when available —
    the rate the deployed auto configuration actually serves — else the
    floor (never the cycle — it flatters).
    """
    import os as _os

    from composer_tpu.ops import decode_kernel as dk
    from composer_tpu.ops import decode_kernel_spec as dks

    if jax.default_backend() != "tpu":
        return {"error": "speculative bench requires TPU (compiled kernel)"}

    restoredir = restoredir or _os.environ.get("COMPOSER_SPEC_RESTOREDIR")
    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, 390, prompt_length).astype(np.int32)

    def measure(config, packed, temperature, pr):
        cache = int(pr.shape[0]) + length

        def call(gen_len):
            def run():
                tokens, stats = dks.speculative_generate(
                    packed, pr, seed, temperature,
                    config=config, length=gen_len, cache_len=cache,
                )
                return np.asarray(tokens), np.asarray(stats)
            return run

        short = length // 2
        long_run, short_run = call(length), call(short)
        _, stats = long_run()
        short_run()
        long_s = _device_seconds_per_call(lambda: long_run()[0])
        short_s = _device_seconds_per_call(lambda: short_run()[0])
        marginal = None
        if long_s and short_s and long_s > short_s:
            marginal = round((length - short) / (long_s - short_s), 1)
        gen_blocks = max(int(stats[1]), 1)
        return marginal, round(length / gen_blocks, 2)

    def seq_marginal(config, packed, temperature, pr):
        cache = int(pr.shape[0]) + length

        def call(gen_len):
            def run():
                return np.asarray(dk.megakernel_generate(
                    packed, pr, seed, temperature,
                    config=config, length=gen_len, cache_len=cache,
                ))
            return run

        short = length // 2
        long_run, short_run = call(length), call(short)
        long_run(); short_run()
        long_s = _device_seconds_per_call(long_run)
        short_s = _device_seconds_per_call(short_run)
        if long_s and short_s and long_s > short_s:
            return round((length - short) / (long_s - short_s), 1)
        return None

    model = _default_transformer(False, jnp.bfloat16)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    packed = dk.pack_weights(params, model.config, dtype=jnp.bfloat16)

    detail = {
        "length": length, "prompt_length": prompt_length,
        "backend": jax.default_backend(),
        "block_greedy": dks.default_block(True),
        "block_sampled": dks.default_block(False),
    }
    floor_m, floor_acc = measure(model.config, packed, 1.0, prompt)
    cycle_m, cycle_acc = measure(model.config, packed, 0.0, prompt)
    detail["floor"] = {
        "on_device_marginal": floor_m, "tokens_per_block": floor_acc,
        "temperature": 1.0,
    }
    detail["cycle"] = {
        "on_device_marginal": cycle_m, "tokens_per_block": cycle_acc,
        "temperature": 0.0,
    }
    detail["sequential_on_device_marginal"] = seq_marginal(
        model.config, packed, 1.0, prompt
    )

    value = floor_m
    if restoredir:
        from composer_tpu.cli import _make_trainer, get_config_from_restoredir
        from composer_tpu.models import (
            ModelType, get_batch_size, get_window_size,
        )

        config = get_config_from_restoredir(restoredir)
        trainer = _make_trainer(ModelType.TRANSFORMER, config)
        state = trainer.restore(
            restoredir,
            get_batch_size(ModelType.TRANSFORMER, config),
            get_window_size(ModelType.TRANSFORMER, config),
        )
        tpacked = dk.pack_weights(
            state.params, trainer.model.config, dtype=jnp.bfloat16
        )
        greedy_m, greedy_acc = measure(
            trainer.model.config, tpacked, 0.0, prompt
        )
        trained_m, trained_acc = measure(
            trainer.model.config, tpacked, 0.9, prompt
        )
        detail["trained_greedy"] = {
            "on_device_marginal": greedy_m, "tokens_per_block": greedy_acc,
            "temperature": 0.0, "restoredir": str(restoredir),
        }
        detail["trained_sampled"] = {
            "on_device_marginal": trained_m, "tokens_per_block": trained_acc,
            "temperature": 0.9,
        }
        detail["sequential_trained_greedy_marginal"] = seq_marginal(
            trainer.model.config, tpacked, 0.0, prompt
        )
        value = greedy_m

    return {
        "metric": "speculative_decode_events_per_sec",
        "value": value,
        "unit": "events/sec/chip (on-device marginal)",
        "vs_baseline": round((value or 0) / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": detail,
    }


def run_serving_benchmark(
    concurrency: int = 32,
    length: int = 1014,
    prompt_length: int = 10,
    max_batch_size: int = 8,
    dtype=None,
    seed: int = 0,
    mixed_sampling: bool = False,
    use_relative_attention: bool = False,
):
    """Coalesced serving throughput (the `composer serve` data plane).

    ``concurrency`` client threads block on GenerationService.submit; the
    service's single device worker coalesces same-signature requests into
    power-of-two batches and dispatches the fused batched decode kernel.
    Measures aggregate generated events/sec across the burst — the number a
    serving deployment actually sees, including queueing, padding waste,
    and sequential dispatch of the coalesced batches.

    ``mixed_sampling`` gives every client its own temperature/top-k/top-p
    (including one greedy client per 8): realistic heterogeneous traffic
    that only coalesces because sampling params are per-row kernel
    operands — with per-setting compiled programs it would decay to
    singleton batches and a recompile per distinct setting.
    """
    import threading

    from composer_tpu.models import ModelType
    from composer_tpu.serving import GenerationService

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(use_relative_attention, dtype)
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, vocab_size=390,
        max_batch_size=max_batch_size, seed=seed,
    )
    rng = np.random.default_rng(seed)
    prompts = rng.integers(0, 390, (concurrency, prompt_length)).astype(np.int32)
    if mixed_sampling:
        sampling = [
            {
                "temperature": 0.0 if index % 8 == 7
                else round(0.7 + 0.05 * (index % 8), 2),
                "top_k": int(5 + index % 13) if index % 3 == 0 else 0,
                "top_p": round(0.85 + 0.01 * (index % 10), 2)
                if index % 3 == 1 else 0.0,
            }
            for index in range(concurrency)
        ]
    else:
        sampling = [{} for _ in range(concurrency)]

    def burst():
        threads = []
        for index in range(concurrency):
            thread = threading.Thread(
                target=service.submit, args=(prompts[index], length),
                kwargs=sampling[index],
            )
            thread.start()
            threads.append(thread)
        for thread in threads:
            thread.join()

    try:
        # Warmup burst compiles the full-bucket kernel; the timed burst then
        # runs pure cached dispatches.
        burst()
        warmup_batches = len(service.batch_sizes)
        start = time.perf_counter()
        burst()
        elapsed = time.perf_counter() - start
    finally:
        batch_sizes = list(service.batch_sizes)
        service.close()
    timed_batches = batch_sizes[warmup_batches:]

    events_per_sec = concurrency * length / elapsed
    return {
        "metric": "serving_events_per_sec",
        "value": round(events_per_sec, 1),
        "unit": "events/sec/chip",
        "vs_baseline": round(events_per_sec / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "concurrency": concurrency, "length": length,
            "max_batch_size": max_batch_size, "seconds": round(elapsed, 3),
            "coalesced_batches": timed_batches,
            "mixed_sampling": mixed_sampling,
            "relative_attention": use_relative_attention,
            "backend": jax.default_backend(),
        },
    }


def run_poisson_serving_benchmark(
    continuous: bool = True,
    requests: int = 40,
    mean_interarrival_ms: float = 40.0,
    length: int = 256,
    lengths=None,
    slots: int = 8,
    seg_steps: int = 64,
    dtype=None,
    seed: int = 0,
    embed_dim: int = 256,
    num_layers: int = 8,
    cache_len: int = 1024,
    temperature: float = 0.8,
):
    """Request latency under Poisson arrivals: run-to-completion batching vs
    continuous batching (VERDICT r2 item 2's 'done' bench; r3 item 7 widened
    it to an arrival-rate grid with mixed generation lengths).

    Clients arrive with exponential inter-arrival gaps, ragged prompt
    lengths and (with ``lengths``) heterogeneous generation lengths; each
    request's latency is completion - arrival. The run-to-completion
    coalescer makes a late arrival wait out the in-flight batch's whole
    generation; the continuous scheduler admits it at the next segment
    boundary. Identical arrival schedule and request mix for both modes
    (same seed). The continuous detail reports slot occupancy (mean/max
    active rows per dispatched segment) — the two-in-flight pipeline's
    utilization under that load.
    """
    import threading

    from composer_tpu.models import ModelType
    from composer_tpu.serving import ContinuousGenerationService, GenerationService

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(
        False, dtype, embed_dim=embed_dim, num_layers=num_layers
    )
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    if continuous:
        service = ContinuousGenerationService(
            model, ModelType.TRANSFORMER, params, vocab_size=390,
            slots=slots, seg_steps=seg_steps, cache_len=cache_len, seed=seed,
        )
    else:
        service = GenerationService(
            model, ModelType.TRANSFORMER, params, vocab_size=390,
            max_batch_size=slots, seed=seed,
        )

    rng = np.random.default_rng(seed)
    gaps = rng.exponential(mean_interarrival_ms / 1000.0, requests)
    plens = rng.integers(8, 65, requests)
    prompts = [rng.integers(0, 390, p).astype(np.int32) for p in plens]
    if lengths is None:
        lengths = (length,)
    req_lengths = [int(lengths[i % len(lengths)]) for i in range(requests)]

    latencies = [0.0] * requests
    errors = []

    def client(index):
        start = time.perf_counter()
        try:
            service.submit(
                prompts[index], req_lengths[index], temperature=temperature
            )
        except Exception as error:  # pragma: no cover - surfaced below
            errors.append((index, error))
            raise
        latencies[index] = time.perf_counter() - start

    def warm_client(index):
        service.submit(prompts[index], req_lengths[index], temperature=temperature)

    def run_schedule(timed: bool):
        target = client if timed else warm_client
        threads = []
        begin = time.perf_counter()
        for index in range(requests):
            time.sleep(gaps[index])
            thread = threading.Thread(target=target, args=(index,))
            thread.start()
            threads.append(thread)
        for thread in threads:
            thread.join()
        return time.perf_counter() - begin

    try:
        # Full untimed pass of the identical schedule first: the batch
        # coalescer compiles one program per (prompt bucket x batch bucket x
        # sampling structure) it encounters, and a compile measured inside
        # the timed run would swamp the queueing behaviour under test.
        run_schedule(timed=False)
        warm_segments = len(service.batch_sizes)
        elapsed = run_schedule(timed=True)
    finally:
        occupancy = list(service.batch_sizes)
        service.close()
    occupancy = [o for o in occupancy[warm_segments:] if o > 0]

    lat = np.sort(np.asarray(latencies))
    p50 = float(lat[int(0.50 * (requests - 1))])
    p95 = float(lat[int(0.95 * (requests - 1))])
    total_events = sum(req_lengths)
    events_per_sec = total_events / elapsed
    # Offered load vs service capacity: mean events requested per second of
    # arrivals over the events/sec the same engine sustains when saturated.
    offered = float(np.mean(req_lengths)) / (mean_interarrival_ms / 1000.0)
    return {
        "metric": "poisson_serving_p95_seconds",
        "value": round(p95, 4),
        "unit": "s",
        "vs_baseline": round(events_per_sec / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "mode": "continuous" if continuous else "run-to-completion",
            "requests": requests,
            "lengths": list(lengths) if len(lengths) > 1 else lengths[0],
            "mean_interarrival_ms": mean_interarrival_ms,
            "offered_events_per_sec": round(offered, 1),
            "p50_s": round(p50, 4), "p95_s": round(p95, 4),
            "mean_s": round(float(lat.mean()), 4),
            "events_per_sec": round(events_per_sec, 1),
            **(
                {
                    "occupancy_mean": round(float(np.mean(occupancy)), 2),
                    "occupancy_max": int(max(occupancy)),
                }
                if continuous and occupancy
                else {}
            ),
            "slots": slots, "seg_steps": seg_steps,
            "backend": jax.default_backend(),
        },
    }


def run_overload_soak_benchmark(
    duration_s: float = 60.0,
    mean_interarrival_ms: float = 8.0,
    lengths=(128, 256, 384),
    slots: int = 8,
    seg_steps: int = 64,
    max_queue_depth: int = 16,
    deadline_ms: float = 8000.0,
    dtype=None,
    seed: int = 0,
    embed_dim: int = 256,
    num_layers: int = 8,
    cache_len: int = 1024,
    temperature: float = 0.8,
):
    """Sustained overload: Poisson arrivals OFFERING more events/sec than the
    continuous engine can serve, for minutes, with the round-4 overload
    controls on (bounded queue -> rejects, per-request deadline -> expiries).

    Proves the service degrades predictably instead of queueing unboundedly:
    completed requests keep a bounded p95, the excess is rejected at the
    door (429-equivalent) or expired at its deadline, and the queue gauge
    returns to zero afterwards (VERDICT r3 item 4's 'done' bench).
    """
    import threading

    from composer_tpu.exceptions import (
        DeadlineExceededError,
        ServiceOverloadedError,
    )
    from composer_tpu.models import ModelType
    from composer_tpu.serving import ContinuousGenerationService

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(
        False, dtype, embed_dim=embed_dim, num_layers=num_layers
    )
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, vocab_size=390,
        slots=slots, seg_steps=seg_steps, cache_len=cache_len, seed=seed,
        max_queue_depth=max_queue_depth, default_deadline_ms=deadline_ms,
    )

    rng = np.random.default_rng(seed)
    lock = threading.Lock()
    completed_latencies = []
    counts = {"completed": 0, "rejected": 0, "expired": 0, "other": 0}

    def client(prompt, length):
        start = time.perf_counter()
        try:
            service.submit(prompt, length, temperature=temperature)
        except ServiceOverloadedError:
            with lock:
                counts["rejected"] += 1
            return
        except DeadlineExceededError:
            with lock:
                counts["expired"] += 1
            return
        except Exception:  # pragma: no cover
            with lock:
                counts["other"] += 1
            return
        with lock:
            counts["completed"] += 1
            completed_latencies.append(time.perf_counter() - start)

    try:
        # Warm the compile caches at each live bucket before the soak
        # (segmented-kernel compiles can take minutes on the remote TPU
        # service — give the warm requests an effectively-infinite deadline).
        for length in sorted(set(lengths)):
            service.submit(
                rng.integers(0, 390, 16).astype(np.int32), length,
                temperature=temperature, deadline_ms=3_600_000,
            )
        threads = []
        begin = time.perf_counter()
        index = 0
        while time.perf_counter() - begin < duration_s:
            time.sleep(float(rng.exponential(mean_interarrival_ms / 1000.0)))
            prompt = rng.integers(0, 390, int(rng.integers(8, 65))).astype(np.int32)
            length = int(lengths[index % len(lengths)])
            thread = threading.Thread(target=client, args=(prompt, length))
            thread.start()
            threads.append(thread)
            index += 1
        offered = index / (time.perf_counter() - begin)
        for thread in threads:
            thread.join()
        elapsed = time.perf_counter() - begin
        stats = service.overload_stats()
    finally:
        service.close()

    lat = np.sort(np.asarray(completed_latencies)) if completed_latencies else np.zeros(1)
    total = max(index, 1)
    goodput = counts["completed"] * float(np.mean(lengths)) / elapsed
    return {
        "metric": "overload_soak_p95_seconds",
        "value": round(float(lat[int(0.95 * (len(lat) - 1))]), 4),
        "unit": "s",
        "vs_baseline": round(goodput / DECODE_TARGET_EVENTS_PER_SEC, 3),
        "detail": {
            "duration_s": round(elapsed, 1),
            "offered_requests_per_sec": round(offered, 1),
            "mean_interarrival_ms": mean_interarrival_ms,
            "lengths": list(lengths),
            "requests": total,
            "completed": counts["completed"],
            "rejected": counts["rejected"],
            "expired": counts["expired"],
            "other_errors": counts["other"],
            "reject_rate": round(counts["rejected"] / total, 3),
            "expire_rate": round(counts["expired"] / total, 3),
            "p50_s": round(float(lat[int(0.50 * (len(lat) - 1))]), 4),
            "p95_s": round(float(lat[int(0.95 * (len(lat) - 1))]), 4),
            "goodput_events_per_sec": round(goodput, 1),
            "max_queue_depth": max_queue_depth,
            "deadline_ms": deadline_ms,
            "final_queue_depth": stats["queue_depth"],
            "slots": slots, "seg_steps": seg_steps,
            "backend": jax.default_backend(),
        },
    }


def run_long_prompt_serving_benchmark(
    prompt_len: int = 512,
    length: int = 256,
    requests: int = 8,
    slots: int = 8,
    seg_steps: int = 64,
    prefill: bool = True,
    dtype=None,
    seed: int = 0,
    embed_dim: int = 256,
    num_layers: int = 8,
    cache_len: int = 1024,
    temperature: float = 0.8,
    prefill_min: int = 128,
):
    """Long-prompt latency through the continuous engine: time-to-first-
    token (submit -> first streamed non-echo chunk) and completion p95,
    with admission prefill ON vs OFF (VERDICT r3 item 2's 'done' bench).

    Without prefill, a 512-event prompt teacher-forces ~512 sequential
    kernel steps across ~8 segments before its first generated token; with
    it, one XLA forward + a slot scatter replace all but the last prompt
    position.
    """
    import threading

    from composer_tpu.models import ModelType
    from composer_tpu.serving import ContinuousGenerationService

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model = _default_transformer(
        False, dtype, embed_dim=embed_dim, num_layers=num_layers
    )
    params = model.init_params(jax.random.PRNGKey(seed), 1, 8)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, vocab_size=390,
        slots=slots, seg_steps=seg_steps, cache_len=cache_len, seed=seed,
        prefill_min=(prefill_min if prefill else 0),
    )
    rng = np.random.default_rng(seed)
    prompts = [
        rng.integers(0, 390, prompt_len).astype(np.int32)
        for _ in range(requests)
    ]

    ttfts = [0.0] * requests
    totals = [0.0] * requests

    def client(index):
        begin = time.perf_counter()
        chunks = service.submit_stream(
            prompts[index], length, temperature=temperature
        )
        next(chunks)  # prompt echo — immediate
        next(chunks)  # first generated chunk
        ttfts[index] = time.perf_counter() - begin
        for _ in chunks:
            pass
        totals[index] = time.perf_counter() - begin

    def burst():
        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(requests)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    try:
        burst()  # compile warm-up (segment programs + the prefill program)
        start = time.perf_counter()
        burst()
        elapsed = time.perf_counter() - start
    finally:
        service.close()

    ttft = np.sort(np.asarray(ttfts))
    total = np.sort(np.asarray(totals))
    return {
        "metric": "long_prompt_ttft_p95_seconds",
        "value": round(float(ttft[int(0.95 * (requests - 1))]), 4),
        "unit": "s",
        "vs_baseline": round(
            requests * length / elapsed / DECODE_TARGET_EVENTS_PER_SEC, 3
        ),
        "detail": {
            "prefill": prefill,
            "prompt_len": prompt_len, "length": length,
            "requests": requests,
            "ttft_p50_s": round(float(ttft[int(0.50 * (requests - 1))]), 4),
            "ttft_p95_s": round(float(ttft[int(0.95 * (requests - 1))]), 4),
            "total_p95_s": round(float(total[int(0.95 * (requests - 1))]), 4),
            "events_per_sec": round(requests * length / elapsed, 1),
            "slots": slots, "seg_steps": seg_steps,
            "backend": jax.default_backend(),
        },
    }


def run_preprocess_benchmark(num_files: int = 240, num_workers: int = 16,
                             seed: int = 0, scaling_workers=(1, 4, 16)):
    """MIDI -> .data preprocessing throughput (BASELINE.md row 3).

    Defaults match the BASELINE.md workload spec: a few-hundred-file corpus
    processed with 16 workers (the reference's ``parallel_process`` default,
    utils.py:11-91 — whose ``--num-workers`` flag the reference accepted but
    never forwarded; this pipeline honors it). ``scaling_workers`` adds a
    worker-scaling curve over the SAME corpus; on single-core hosts (this
    build environment has host_cpus=1) the curve is honestly flat — the
    fan-out machinery is exercised, the parallel speedup needs cores.
    """
    import os
    import tempfile
    from pathlib import Path

    from composer_tpu import config as config_module
    from composer_tpu.data import preprocess
    from composer_tpu.midi import Note, NoteSequence, SustainPeriod

    rng = np.random.default_rng(seed)
    with tempfile.TemporaryDirectory() as tmp:
        raw = Path(tmp) / "raw"
        raw.mkdir()
        for index in range(num_files):
            t, notes = 0.0, []
            for _ in range(1500):  # a few minutes of music per file
                duration = float(rng.integers(80, 800))
                notes.append(
                    Note(t, t + duration, int(rng.integers(21, 109)), int(rng.integers(10, 127)))
                )
                t += float(rng.integers(20, 300))
            NoteSequence(notes, [SustainPeriod(0, t / 2)]).to_midi(
                str(raw / f"bench{index}.mid")
            )

        config = config_module.get_default()

        def convert(workers: int, out: Path) -> float:
            start = time.perf_counter()
            preprocess.convert_all(
                config, raw, out, "extend", transform=True,
                transform_percent=1.0, num_workers=workers, seed=seed,
                show_progress_bar=False,
            )
            return time.perf_counter() - start

        scaling = {}
        for workers in scaling_workers:
            if workers == num_workers:
                continue  # the headline run below covers this point
            scaling[f"files_per_sec_w{workers}"] = round(
                num_files / convert(workers, Path(tmp) / f"scale{workers}"), 2
            )

        out = Path(tmp) / "processed"
        elapsed = convert(num_workers, out)
        produced = len(preprocess.get_processed_files(out))

        # The BASELINE.md row is "preprocess + export-dataset": also time the
        # .data -> TFRecord export over the produced files.
        from composer_tpu.data.loader import load_dataset
        from composer_tpu.data.tfrecord import export_dataset

        dataset = load_dataset(
            preprocess.get_processed_files(out),
            batch_size=2,
            window_size=1024,
            shuffle=False,
        )
        export_start = time.perf_counter()
        export_dataset(dataset, "transformer", Path(tmp) / "bench.tfrecord")
        export_elapsed = time.perf_counter() - export_start

    files_per_sec = num_files / elapsed
    return {
        "metric": "preprocess_files_per_sec",
        "value": round(files_per_sec, 2),
        "unit": "files/sec",
        "vs_baseline": round(files_per_sec, 2),
        "detail": {
            "input_files": num_files, "output_files": produced,
            "workers": num_workers, "seconds": round(elapsed, 2),
            "host_cpus": os.cpu_count(),
            **scaling,
            "export_seconds": round(export_elapsed, 2),
            "export_files_per_sec": round(produced / export_elapsed, 1),
        },
    }


def run_train_benchmark(
    batch_size: int = 8,
    window_size: int = 2048,
    use_relative_attention: bool = True,
    steps: int = 5,
    dtype=None,
    seed: int = 0,
    attention_chunk_size: int = 0,
    remat: bool = False,
    dropout_rate: float = 0.0,
    embed_dim: int = 256,
    num_heads: int = 16,
    num_layers: int = 8,
    use_pallas_attention: bool = False,
):
    """Training step time for the relative-attention config (BASELINE.md row 5).

    ``attention_chunk_size``/``remat`` select the long-context recipe: q-chunked
    attention (O(S*chunk) live scores) + rematerialized blocks, which fits
    batch 32 x 2048 ctx in the 15.75 GB HBM where the exact band path OOMs.

    ``embed_dim``/``num_heads``/``num_layers``/``use_pallas_attention`` scale
    past the reference architecture (head_dim 16): at head_dim >= 64 the
    Pallas flash path's in-kernel relative bias becomes MXU-efficient.
    """
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    if dtype is None:
        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    # Measured on v5e-1: batch 8 w/o remat is ~1.7x faster than remat configs
    # and fits HBM; remat=True extends to batch 16+.
    config = TransformerConfig(
        vocab_size=390, embed_dim=embed_dim, window_size=window_size,
        num_layers=num_layers, num_heads=num_heads,
        use_relative_attention=use_relative_attention,
        attention_dropout_rate=dropout_rate, residual_dropout_rate=dropout_rate,
        dtype=dtype, attention_chunk_size=attention_chunk_size, remat=remat,
        use_pallas_attention=use_pallas_attention,
    )
    trainer = Trainer(Transformer(config), ModelType.TRANSFORMER, 1e-3, seed=seed)
    state = trainer.init_state(batch_size, window_size)

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, 390, (batch_size, window_size)), dtype=jnp.int32)
    y = jnp.asarray(rng.integers(0, 390, (batch_size, window_size)), dtype=jnp.int32)
    # The trainer's dropout-key policy (rbg on TPU) is part of what this
    # benchmark measures when dropout is on.
    step_rng = trainer.make_dropout_rng()

    state, metrics, _ = trainer.train_step(state, x, y, step_rng, None)  # compile
    np.asarray(metrics["loss"])  # force host transfer (block_until_ready is a no-op on axon)

    start = time.perf_counter()
    for _ in range(steps):
        state, metrics, _ = trainer.train_step(state, x, y, step_rng, None)
    np.asarray(metrics["loss"])  # force host transfer
    elapsed = (time.perf_counter() - start) / steps

    tokens_per_sec = batch_size * window_size / elapsed
    step_tflops = _transformer_train_tflops(
        batch_size, window_size, embed_dim, num_heads, num_layers,
        relative=use_relative_attention,
    )
    return {
        "metric": "train_step_seconds",
        "value": round(elapsed, 4),
        "unit": "s/step",
        "vs_baseline": round(tokens_per_sec, 1),
        "detail": {
            "batch_size": batch_size,
            "window_size": window_size,
            "dropout_rate": dropout_rate,
            "embed_dim": embed_dim,
            "num_heads": num_heads,
            "attention": "pallas-flash" if use_pallas_attention else (
                "chunked" if attention_chunk_size else "band"
            ),
            "tokens_per_sec": round(tokens_per_sec, 1),
            **_roofline(step_tflops, elapsed),
            "backend": jax.default_backend(),
        },
    }


def run_rnn_train_benchmark(batch_size: int = 64, window_size: int = 200, steps: int = 5, seed: int = 0):
    """MusicRNN training step time at the default config (BASELINE.md row 3)."""
    from composer_tpu.models import ModelType
    from composer_tpu.models.music_rnn import MusicRNN, MusicRNNConfig
    from composer_tpu.train.trainer import Trainer

    config = MusicRNNConfig(vocab_size=390)
    trainer = Trainer(MusicRNN(config), ModelType.MUSIC_RNN, 1e-3, seed=seed)
    state = trainer.init_state(batch_size, window_size)
    carry = trainer.init_rnn_carry(batch_size)

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, 390, (batch_size, window_size)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 390, (batch_size, window_size)), jnp.int32)
    key = jax.random.PRNGKey(seed)

    state, metrics, carry = trainer.train_step(state, x, y, key, carry)
    np.asarray(metrics["loss"])
    start = time.perf_counter()
    for _ in range(steps):
        state, metrics, carry = trainer.train_step(state, x, y, key, carry)
    np.asarray(metrics["loss"])
    elapsed = (time.perf_counter() - start) / steps

    tokens_per_sec = batch_size * window_size / elapsed
    return {
        "metric": "rnn_train_step_seconds",
        "value": round(elapsed, 4),
        "unit": "s/step",
        "vs_baseline": round(tokens_per_sec, 1),
        "detail": {
            "batch_size": batch_size, "window_size": window_size,
            "tokens_per_sec": round(tokens_per_sec, 1),
            **_roofline(_rnn_train_tflops(batch_size, window_size), elapsed),
            "backend": jax.default_backend(),
        },
    }


def run_all(write_markdown=True):
    """Runs every BASELINE.md workload; optionally writes BENCHMARKS.md."""
    import datetime
    import json
    from pathlib import Path

    # The flash train rows execute Pallas kernels: off-TPU they would run
    # the (orders-of-magnitude slower) interpreter — skip them there.
    on_tpu = jax.default_backend() == "tpu"

    results = []
    for name, fn in [
        ("decode (batch 1, 1024 events, KV-cached megakernel)", run_decode_benchmark),
        (
            "decode w/ relative attention",
            lambda: run_decode_benchmark(use_relative_attention=True, length=1014),
        ),
        (
            "batched decode (batch 8 x 1014, fused kernel)",
            lambda: run_decode_benchmark(batch_size=8, length=1014),
        ),
        (
            # The validated training recipe uses relative attention; these
            # rel=true rows (VERDICT r2 item 8) price its in-kernel band
            # matmul at batch scale next to the rel=false rows above/below.
            "batched decode (batch 8 x 1014, relative attention)",
            lambda: run_decode_benchmark(
                batch_size=8, length=1014, use_relative_attention=True,
            ),
        ),
        (
            "batched decode (batch 64 x 2048, chunked fused kernel)",
            lambda: run_batched_decode_benchmark(),
        ),
        (
            "batched decode (batch 64 x 2048, relative attention)",
            lambda: run_batched_decode_benchmark(use_relative_attention=True),
        ),
        (
            # Wide models (embed 1024: ~200 MB of packed weights) overflow
            # the megakernel's VMEM weight residency; this row is the XLA
            # scan fallback they were routed to before round 4 — the
            # baseline the streaming wide kernel row below must beat >= 2x.
            "wide-model decode (embed 1024, batch 8, XLA scan engine)",
            lambda: run_decode_benchmark(
                batch_size=8, length=1014, embed_dim=1024, engine="xla",
                repeats=2,
            ),
        ),
        (
            # The round-4 streaming wide kernel: weights + KV prefix stream
            # from HBM through one fused program (ops/decode_kernel_wide.py)
            # — the engine 'auto' now routes weights-over-VMEM models to.
            "wide-model decode (embed 1024, batch 8, streaming wide kernel)",
            lambda: run_decode_benchmark(
                batch_size=8, length=1014, embed_dim=1024, engine="wide",
                repeats=2,
            ) if on_tpu else {"error": "wide kernel bench skipped off-TPU"},
        ),
        (
            # int8 wide decode (VERDICT r4 item 6): per-output-channel
            # symmetric weights halve the dominant per-step HBM stream
            # (bf16 ~201 MB of matmul weights per step at embed 1024 vs
            # ~101 MB int8); the row publishes the realized throughput
            # next to the bf16 row above. Numerics are pinned separately
            # (tests/test_decode_wide.py: quantizer round-trip bound +
            # matmul-epilogue error bound).
            "wide-model decode (embed 1024, batch 8, streaming kernel, int8)",
            lambda: run_wide_int8_decode_benchmark()
            if on_tpu else {"error": "int8 wide bench skipped off-TPU"},
        ),
        (
            # int8 KV streaming (r5): the KV prefix — the second-largest
            # per-step HBM term (~66 MB bf16 at mean live 507) — streams
            # int8 with flush-time quantization and exact per-column
            # dequant epilogues. Numerics pinned in
            # tests/test_decode_wide.py (bit-exact pre-flush, half-step
            # bound after) + compiled TPU parity in
            # scripts/bringup_wide_int8_kv.py.
            "wide-model decode (embed 1024, batch 8, streaming, int8 KV)",
            lambda: run_wide_int8_kv_decode_benchmark()
            if on_tpu else {"error": "int8-KV wide bench skipped off-TPU"},
        ),
        (
            # Continuous batching for the weights-over-VMEM class (r5): the
            # embed-1024 flagship under Poisson arrivals through the
            # segmented streaming kernel — the serving mode it could not
            # use at all before (vs run-to-completion wide coalescing).
            "serving under Poisson arrivals (embed 1024, wide continuous)",
            lambda: run_poisson_serving_benchmark(
                continuous=True, requests=16, mean_interarrival_ms=150.0,
                length=192, slots=4, cache_len=1024, embed_dim=1024,
                temperature=0.0,
            ) if on_tpu else {"error": "wide continuous bench skipped off-TPU"},
        ),
        (
            "serving under Poisson arrivals (embed 1024, run-to-completion)",
            lambda: run_poisson_serving_benchmark(
                continuous=False, requests=16, mean_interarrival_ms=150.0,
                length=192, slots=4, cache_len=1024, embed_dim=1024,
                temperature=0.0,
            ) if on_tpu else {"error": "wide rtc bench skipped off-TPU"},
        ),
        (
            "long-prompt serving TTFT (prompt 512, continuous, NO prefill)",
            lambda: run_long_prompt_serving_benchmark(prefill=False)
            if on_tpu else {"error": "long-prompt bench skipped off-TPU"},
        ),
        (
            "long-prompt serving TTFT (prompt 512, continuous, XLA prefill)",
            lambda: run_long_prompt_serving_benchmark(prefill=True)
            if on_tpu else {"error": "long-prompt bench skipped off-TPU"},
        ),
        (
            # Round-4 speculative engine: acceptance-dependent, so the row
            # reports floor (sampled random weights) / cycle (greedy) and,
            # with $COMPOSER_SPEC_RESTOREDIR set, the realized trained-model
            # rate (docs/validation.md records the round-4 measurement).
            "speculative decode (batch 1, n-gram drafts, block verify)",
            lambda: run_speculative_benchmark()
            if on_tpu else {"error": "speculative bench skipped off-TPU"},
        ),
        ("LSTM decode (batch 8 x 1024, stateful scan)", run_rnn_decode_benchmark),
        (
            "serving (32 concurrent clients, coalesced batches of 8)",
            run_serving_benchmark,
        ),
        (
            "serving (32 clients, relative attention)",
            lambda: run_serving_benchmark(use_relative_attention=True),
        ),
        (
            # Latency under Poisson arrivals: run-to-completion coalescing
            # vs continuous batching over the segmented kernel (identical
            # arrival schedule + request mix). The continuous scheduler
            # admits a late arrival at the next segment boundary instead of
            # making it wait out the in-flight batch's whole generation.
            "serving latency, Poisson arrivals (run-to-completion)",
            lambda: run_poisson_serving_benchmark(continuous=False)
            if on_tpu else {"error": "poisson bench skipped off-TPU"},
        ),
        # Arrival-rate grid with mixed generation lengths (VERDICT r3 item
        # 7): light / moderate / heavy load against the same continuous
        # engine. offered_events_per_sec in the detail positions each rate
        # against the engine's ~5k events/sec saturated service rate at
        # these shapes; occupancy_mean shows how full the 8 slots run.
        (
            "serving latency, Poisson light load (continuous, mixed lengths)",
            lambda: run_poisson_serving_benchmark(
                continuous=True, mean_interarrival_ms=80.0,
                lengths=(128, 256, 384),
            ) if on_tpu else {"error": "poisson bench skipped off-TPU"},
        ),
        (
            "serving latency, Poisson moderate load (continuous, mixed lengths)",
            lambda: run_poisson_serving_benchmark(
                continuous=True, mean_interarrival_ms=40.0,
                lengths=(128, 256, 384),
            ) if on_tpu else {"error": "poisson bench skipped off-TPU"},
        ),
        (
            "serving latency, Poisson heavy load (continuous, mixed lengths)",
            lambda: run_poisson_serving_benchmark(
                continuous=True, mean_interarrival_ms=15.0, requests=80,
                lengths=(128, 256, 384),
            ) if on_tpu else {"error": "poisson bench skipped off-TPU"},
        ),
        (
            # Sustained overload (arrival rate > capacity) with the bounded
            # queue + deadlines on: completed-request p95 stays bounded and
            # the excess is rejected/expired instead of queueing forever.
            "serving overload soak (continuous, bounded queue + deadlines)",
            lambda: run_overload_soak_benchmark()
            if on_tpu else {"error": "soak bench skipped off-TPU"},
        ),
        (
            # Every client brings its own temperature/top-k/top-p (greedy
            # included): coalescing survives because sampling params are
            # per-row kernel operands; with per-setting programs this
            # workload decays to singleton batches + a recompile per
            # distinct setting.
            "serving, heterogeneous sampling (32 clients, mixed temp/top-k/top-p)",
            lambda: run_serving_benchmark(mixed_sampling=True),
        ),
        ("preprocess (MIDI -> .data, full augmentation)", run_preprocess_benchmark),
        (
            "train step (relative attention, 2048 ctx)",
            lambda: run_train_benchmark(batch_size=8, window_size=2048),
        ),
        (
            # The reference trains with dropout 0.1 by default; mask
            # generation is a real cost at this scale (~2.3G bernoulli draws
            # per step), kept affordable by the trainer's rbg dropout keys +
            # 16-bit integer-compare masks (measured v5e-1: 222 ms/step vs
            # 284 rbg/f32-uniform vs 356 threefry).
            "train step (2048 ctx, reference-default dropout 0.1)",
            lambda: run_train_benchmark(
                batch_size=8, window_size=2048, dropout_rate=0.1,
            ),
        ),
        (
            # Measured on v5e-1: band+remat 1.31 s/step (50k tok/s) vs
            # chunked(256)+remat 3.89 s/step — block remat alone fits batch 32
            # in HBM and keeps the fast band attention; chunking is the
            # fallback for shapes where even remat OOMs.
            "train step (batch 32 x 2048, band attention + remat)",
            lambda: run_train_benchmark(
                batch_size=32, window_size=2048, remat=True, steps=3,
            ),
        ),
        (
            # The best batch-32 recipe: flash needs NO remat (O(seq)
            # attention memory), so it skips the re-forward — 0.93 s/step
            # vs 1.31 band+remat (v5e-1).
            "train step (batch 32 x 2048, flash attention, no remat)",
            lambda: run_train_benchmark(
                batch_size=32, window_size=2048, steps=3,
                use_pallas_attention=True,
            ) if on_tpu else {"error": "flash bench skipped off-TPU (interpreter)"},
        ),
        (
            # 2x the reference's longest window; flash 0.83 s vs
            # band+remat 1.28 s measured v5e-1.
            "train step (4096 ctx, flash attention)",
            lambda: run_train_benchmark(
                batch_size=8, window_size=4096, steps=3,
                use_pallas_attention=True,
            ) if on_tpu else {"error": "flash bench skipped off-TPU (interpreter)"},
        ),
        (
            # Beyond the reference architecture: head_dim 64 keeps the
            # in-kernel rel-bias matmuls MXU-shaped. Band (shear-free XLA)
            # vs Pallas flash measured head-to-head; with the merged
            # one-pass backward + 256-edge tiles, flash WINS at every
            # head_dim >= 64 shape (1.5-2.1x) and needs no remat at
            # batch 32 (see docs/band-attention.md).
            "train step (scaled arch: embed 1024, head_dim 64, 2048 ctx)",
            lambda: run_train_benchmark(
                batch_size=8, window_size=2048, embed_dim=1024,
            ),
        ),
        (
            "train step (scaled arch, Pallas flash fwd+bwd)",
            lambda: run_train_benchmark(
                batch_size=8, window_size=2048, embed_dim=1024,
                use_pallas_attention=True,
            ) if on_tpu else {"error": "flash bench skipped off-TPU (interpreter)"},
        ),
        (
            # head_dim 128: flash's matmuls run unpadded — measured v5e-1
            # 246 ms vs band's 510 ms (merged backward + 256-edge tiles).
            "train step (embed 2048, head_dim 128, band)",
            lambda: run_train_benchmark(
                batch_size=4, window_size=2048, embed_dim=2048, steps=3,
            ),
        ),
        (
            "train step (embed 2048, head_dim 128, Pallas flash)",
            lambda: run_train_benchmark(
                batch_size=4, window_size=2048, embed_dim=2048, steps=3,
                use_pallas_attention=True,
            ) if on_tpu else {"error": "flash bench skipped off-TPU (interpreter)"},
        ),
        (
            "LSTM baseline train step (batch 64 x 200)",
            run_rnn_train_benchmark,
        ),
    ]:
        try:
            result = fn()
        except Exception as error:  # record, keep going
            result = {"metric": name, "error": str(error)[:200]}
        result["workload"] = name
        results.append(result)
        print(json.dumps(result))

    if write_markdown:
        lines = [
            "# Benchmarks",
            "",
            f"Measured {datetime.datetime.now():%Y-%m-%d %H:%M} on "
            f"`{jax.default_backend()}` ({jax.devices()[0].device_kind}). "
            "The reference publishes no numbers (BASELINE.md); the north-star "
            "target is 50k decode events/sec/chip. Wall-clock decode rows "
            "include this environment's remote-tunnel dispatch RTT, which "
            "drifts ±20 ms between sessions; the length-differenced "
            "`on_device_events_per_sec_marginal` details are the stable "
            "chip-side rates. Batch-1 wall is fully attributed: one fused "
            "dispatch per generate, and the residual over on-device time "
            "equals the measured trivial-dispatch RTT floor "
            "(scripts/probe_decode_wall.py) — nothing host-side left to "
            "cut. Train rows carry a roofline column: "
            "`tflops_per_sec` counts the matmul FLOPs the dense paths "
            "actually issue (full S² attention, bwd = 2× fwd) over the "
            "step time, and `pct_peak_bf16` is that against the chip's "
            "MXU peak — rows well under ~15% are memory/layout-bound, "
            "not compute-bound (the reference arch's profile: 71.8 ms "
            "matmul, 57.4 fused elementwise, 46.4 data formatting).",
            "",
            "| Workload | Metric | Value | vs 50k north star | Detail |",
            "|---|---|---|---|---|",
        ]
        for result in results:
            if "error" in result:
                lines.append(
                    f"| {result['workload']} | — | error | — | {result['error']} |"
                )
                continue
            detail = ", ".join(
                f"{k}={v}" for k, v in result.get("detail", {}).items()
            )
            vs = result.get("vs_baseline")
            vs_text = f"{vs}" if vs is not None else "—"
            lines.append(
                f"| {result['workload']} | {result['metric']} | "
                f"**{result['value']} {result['unit']}** | {vs_text} | {detail} |"
            )
        Path(__file__).resolve().parent.parent.joinpath("BENCHMARKS.md").write_text(
            "\n".join(lines) + "\n"
        )
    return results


if __name__ == "__main__":
    run_all()
