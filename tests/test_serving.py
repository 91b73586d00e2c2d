"""HTTP serving tests: request batching, both prompt codecs, error paths."""

import base64
import json
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

import composer_tpu.config as config_lib
from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.serving import GenerationService, build_server

VOCAB = 390  # default codec vocab so MIDI prompts encode in-range
WINDOW = 64


@pytest.fixture(scope="module")
def server():
    import jax

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=4, max_wait_ms=300.0,
    )
    config = config_lib.get_default()
    http_server = build_server(service, config, port=0, default_length=12)
    thread = threading.Thread(target=http_server.serve_forever, daemon=True)
    thread.start()
    yield http_server, service
    http_server.shutdown()
    http_server.server_close()
    service.close()


def _post(server, payload, path="/v1/generate"):
    port = server.server_port
    request = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(request, timeout=60) as response:
        return response.status, json.loads(response.read())


def test_health(server):
    http_server, _ = server
    with urllib.request.urlopen(
        f"http://127.0.0.1:{http_server.server_port}/v1/health", timeout=30
    ) as response:
        body = json.loads(response.read())
    assert body["status"] == "ok"
    assert body["model_type"] == "transformer"
    assert body["vocab_size"] == VOCAB


def test_generate_from_event_ids(server):
    http_server, _ = server
    status, body = _post(
        http_server,
        {"events": [1, 2, 3], "length": 5, "temperature": 0.8},
    )
    assert status == 200
    events = body["events"]
    assert events[:3] == [1, 2, 3] and len(events) == 8
    assert all(0 <= e < VOCAB for e in events)
    assert "midi_base64" not in body


def test_generate_from_midi_prompt_returns_midi(server):
    from composer_tpu.midi.events import Note, NoteSequence
    from composer_tpu.midi import midi_io

    http_server, _ = server
    notes = [Note(i * 200.0, i * 200.0 + 150.0, 60 + i, 80) for i in range(4)]
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".mid")
    os.close(fd)
    try:
        NoteSequence(notes).to_midi(path)
        midi_b64 = base64.b64encode(open(path, "rb").read()).decode()
    finally:
        os.unlink(path)

    status, body = _post(
        http_server,
        {"midi_base64": midi_b64, "length": 4, "prompt_length": 6},
    )
    assert status == 200
    assert len(body["events"]) == 10  # 6 prompt + 4 generated
    generated = base64.b64decode(body["midi_base64"])
    parsed = midi_io.parse_midi(generated)  # round-trips as a valid SMF
    assert sum(len(i.notes) for i in parsed.instruments) >= 1


def test_concurrent_requests_are_batched(server):
    http_server, service = server
    # Warm the compile for this signature so batching isn't skewed by the
    # first request compiling while others queue.
    _post(http_server, {"events": [5, 6], "length": 3})

    before = len(service.batch_sizes)
    results = [None] * 3

    def call(i):
        results[i] = _post(http_server, {"events": [5, 6], "length": 3})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(status == 200 for status, _ in results)
    new_batches = service.batch_sizes[before:]
    assert sum(new_batches) == 3
    assert max(new_batches) >= 2  # coalesced, not 3 singleton decodes


def test_bad_requests_are_400(server):
    http_server, _ = server
    for payload in [
        {},  # no prompt
        {"events": [1], "midi_base64": "AAAA"},  # both prompts
        {"events": ["x"]},  # non-integer ids
        {"events": [VOCAB + 5]},  # out of vocab
        {"events": [1], "length": 0},  # bad length
        {"midi_base64": "!!!not-base64!!!"},
        {"midi_base64": base64.b64encode(b"junkjunkjunk").decode()},
    ]:
        with pytest.raises(urllib.error.HTTPError) as info:
            _post(http_server, payload)
        assert info.value.code == 400, payload
        detail = json.loads(info.value.read())
        assert "error" in detail

    with pytest.raises(urllib.error.HTTPError) as info:
        _post(http_server, {"events": [1]}, path="/v1/nope")
    assert info.value.code == 404


def test_incompatible_signatures_both_complete(server):
    http_server, _ = server
    results = [None] * 2

    def call(i, length):
        results[i] = _post(http_server, {"events": [7, 8, 9], "length": length})

    threads = [
        threading.Thread(target=call, args=(0, 2)),
        threading.Thread(target=call, args=(1, 4)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results[0][0] == 200 and len(results[0][1]["events"]) == 5
    assert results[1][0] == 200 and len(results[1][1]["events"]) == 7


def test_mixed_sampling_settings_coalesce(server):
    """Requests differing ONLY in sampling params (and in length within one
    power-of-two bucket) share a batch: the params ride the kernels as
    per-row vectors. A greedy request inside the mixed batch returns exactly
    what a standalone greedy call returns."""
    http_server, service = server
    # Warm the (prompt_len=2, bucket=4) program.
    _post(http_server, {"events": [5, 6], "length": 4})
    baseline = _post(
        http_server, {"events": [5, 6], "length": 4, "temperature": 0.0}
    )[1]["events"]

    before = len(service.batch_sizes)
    payloads = [
        {"events": [5, 6], "length": 4, "temperature": 0.0},
        {"events": [5, 6], "length": 4, "temperature": 1.3, "top_k": 7},
        {"events": [5, 6], "length": 3, "temperature": 0.8, "top_p": 0.9},
    ]
    results = [None] * len(payloads)

    def call(i):
        results[i] = _post(http_server, payloads[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(status == 200 for status, _ in results)
    new_batches = service.batch_sizes[before:]
    assert sum(new_batches) == 3
    assert max(new_batches) >= 2  # mixed settings coalesced
    # The greedy row is unchanged by riding in a mixed batch.
    assert results[0][1]["events"] == baseline
    # The length-3 request got its own length back (bucket decoded 4).
    assert len(results[2][1]["events"]) == 5  # 2 prompt + 3 generated


def test_mixed_prompt_lengths_coalesce(server):
    """Requests with DIFFERENT prompt lengths share a batch (ragged prompts:
    per-row teacher-forcing boundaries in the decode kernels), and a greedy
    request inside the mixed batch returns exactly its standalone result."""
    http_server, service = server
    # Warm the (prompt bucket 4, length bucket 4) program and take baselines.
    base_a = _post(
        http_server, {"events": [5, 6, 7], "length": 4, "temperature": 0.0}
    )[1]["events"]
    base_b = _post(
        http_server, {"events": [9], "length": 4, "temperature": 0.0}
    )[1]["events"]

    before = len(service.batch_sizes)
    payloads = [
        {"events": [5, 6, 7], "length": 4, "temperature": 0.0},
        {"events": [9], "length": 4, "temperature": 0.0},
        {"events": [1, 2, 3, 4], "length": 4, "temperature": 0.0},
    ]
    results = [None] * len(payloads)

    def call(i):
        results[i] = _post(http_server, payloads[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert all(status == 200 for status, _ in results)
    new_batches = service.batch_sizes[before:]
    assert max(new_batches) >= 2, new_batches  # 3- and 1-event prompts shared
    # Ragged batching is exact: greedy rows match their standalone runs.
    assert results[0][1]["events"] == base_a
    assert results[1][1]["events"] == base_b
    # Responses lead with each request's own prompt.
    assert results[2][1]["events"][:4] == [1, 2, 3, 4]
    assert len(results[2][1]["events"]) == 8


@pytest.fixture(scope="module")
def continuous_service():
    import jax

    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=3, seg_steps=4, cache_len=128,
    )
    yield model, params, service
    service.close()


def test_continuous_single_request_matches_batch_engine(continuous_service):
    """A lone greedy request through the continuous scheduler returns exactly
    the whole-generation engine's tokens."""
    from composer_tpu.train.generate import generate_ids

    model, params, service = continuous_service
    prompt = [5, 100, 300, 17]
    out = service.submit(prompt, length=6, temperature=0.0)
    expected = generate_ids(
        model, ModelType.TRANSFORMER, params, np.asarray(prompt, np.int32),
        length=6, temperature=0.0, seed=0, engine="xla",
    )
    np.testing.assert_array_equal(out, np.asarray(expected))


def test_continuous_concurrent_mixed_lengths(continuous_service):
    """Concurrent requests with different prompt lengths and lengths all
    complete correctly through shared slots."""
    model, params, service = continuous_service
    payloads = [
        ([5, 100, 300, 17], 6),
        ([9], 9),
        ([1, 2, 3], 4),
        ([7, 8], 5),  # 4 requests > 3 slots: one must wait for an eviction
    ]
    results = [None] * len(payloads)

    def call(i):
        prompt, length = payloads[i]
        results[i] = service.submit(prompt, length, temperature=0.0)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(len(payloads))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    from composer_tpu.train.generate import generate_ids

    for (prompt, length), result in zip(payloads, results):
        expected = generate_ids(
            model, ModelType.TRANSFORMER, params,
            np.asarray(prompt, np.int32), length=length, temperature=0.0,
            seed=0, engine="xla",
        )
        np.testing.assert_array_equal(result, np.asarray(expected))


def test_continuous_behind_http(continuous_service):
    """build_server takes the continuous service: health + generate both work
    (health once read service.max_batch_size, which only the run-to-completion
    engine defined — empty replies from a live server)."""
    model, params, service = continuous_service
    config = config_lib.get_default()
    http_server = build_server(service, config, port=0, default_length=4)
    thread = threading.Thread(target=http_server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{http_server.server_port}/v1/health", timeout=30
        ) as response:
            body = json.loads(response.read())
        assert body["status"] == "ok"
        assert body["max_batch_size"] == service.slots

        status, body = _post(http_server, {"events": [5, 6], "length": 3,
                                           "temperature": 0.0})
        assert status == 200
        assert body["events"][:2] == [5, 6]
        assert len(body["events"]) == 5
    finally:
        http_server.shutdown()
        http_server.server_close()


def test_streaming_matches_blocking_submit(continuous_service):
    """submit_stream yields the prompt echo then per-segment chunks whose
    concatenation equals the blocking submit's result."""
    model, params, service = continuous_service
    prompt = [5, 100, 300, 17]
    blocking = service.submit(prompt, length=9, temperature=0.0)
    chunks = list(service.submit_stream(prompt, length=9, temperature=0.0))
    assert chunks[0] == prompt
    assert len(chunks) > 2  # 9 tokens over 4-step segments: >1 data chunk
    streamed = [t for chunk in chunks for t in chunk]
    np.testing.assert_array_equal(np.asarray(streamed), blocking)


def test_streaming_over_http(continuous_service):
    """POST {"stream": true} returns ndjson lines that arrive per segment
    and concatenate to the non-streaming response."""
    model, params, service = continuous_service
    config = config_lib.get_default()
    http_server = build_server(service, config, port=0, default_length=4)
    thread = threading.Thread(target=http_server.serve_forever, daemon=True)
    thread.start()
    try:
        port = http_server.server_port
        request = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/generate",
            data=json.dumps(
                {"events": [5, 6, 7], "length": 9, "temperature": 0.0,
                 "stream": True}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        lines = []
        with urllib.request.urlopen(request, timeout=120) as response:
            assert response.status == 200
            assert response.headers["Content-Type"] == "application/x-ndjson"
            for raw in response:
                lines.append(json.loads(raw))
        assert lines[-1] == {"done": True}
        streamed = [t for line in lines[:-1] for t in line["events"]]
        assert len(lines) > 3

        status, body = _post(
            http_server,
            {"events": [5, 6, 7], "length": 9, "temperature": 0.0},
        )
        assert status == 200 and body["events"] == streamed

        # Parameter errors still get a clean 400 (validation is eager).
        with pytest.raises(urllib.error.HTTPError) as err:
            _post(http_server, {"events": [], "stream": True})
        assert err.value.code == 400
    finally:
        http_server.shutdown()
        http_server.server_close()


def test_streaming_on_run_to_completion_engine(server):
    """The run-to-completion engine serves {"stream": true} too — a single
    chunk after the generation finishes (same wire protocol)."""
    http_server, _ = server
    port = http_server.server_port
    request = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/generate",
        data=json.dumps({"events": [5, 6], "length": 3, "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(request, timeout=60) as response:
        lines = [json.loads(raw) for raw in response]
    assert lines[-1] == {"done": True}
    events = [t for line in lines[:-1] for t in line["events"]]
    assert events[:2] == [5, 6] and len(events) == 5


def test_continuous_rejects_oversize_and_bad_requests(continuous_service):
    from composer_tpu.exceptions import InvalidParameterError

    _, _, service = continuous_service
    with pytest.raises(InvalidParameterError):
        service.submit([], 4)
    with pytest.raises(InvalidParameterError):
        service.submit([1, 2], 0)
    with pytest.raises(InvalidParameterError):
        service.submit([1] * (WINDOW + 1), 4)
    with pytest.raises(InvalidParameterError):
        service.submit([1, 2], 100_000)
    with pytest.raises(InvalidParameterError):
        service.submit([VOCAB + 1], 4)


def test_close_never_strands_waiters():
    """Shutdown semantics: submits racing a close() either complete or raise
    the shutdown error — no waiter hangs — and submits AFTER close are
    rejected immediately (both engines)."""
    import jax

    from composer_tpu.exceptions import InvalidParameterError

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    # A long coalescing window keeps the worker holding the first request
    # while the rest (incompatible signatures -> separate batches) queue
    # behind the close sentinel.
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=4, max_wait_ms=200.0,
    )
    outcomes = [None] * 4

    def call(i):
        try:
            # Lengths 2/3/5/9 bucket to distinct powers of two (2/4/8/16),
            # so none of the four requests can coalesce into one batch.
            outcomes[i] = ("ok", service.submit([3 + i], length=[2, 3, 5, 9][i]))
        except InvalidParameterError as error:
            outcomes[i] = ("closed", str(error))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    service.close()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "a submit() hung across close()"
    for status, value in outcomes:
        assert status in ("ok", "closed")
        if status == "closed":
            assert "closed" in value
    with pytest.raises(InvalidParameterError, match="closed"):
        service.submit([1, 2], length=2)


def test_continuous_close_rejects_new_submits():
    import jax

    from composer_tpu.exceptions import InvalidParameterError
    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128,
    )
    service.close()
    with pytest.raises(InvalidParameterError, match="closed"):
        service.submit([1, 2], 4, temperature=0.0)
    with pytest.raises(InvalidParameterError, match="closed"):
        service.submit_stream([1, 2], 4, temperature=0.0)


# --------------------------------------------------------------- overload
def _tiny_model():
    import jax

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    ))
    return model, model.init_params(jax.random.PRNGKey(0), 1, 8)


def test_bounded_queue_rejects_when_full():
    """Submits beyond max_queue_depth raise ServiceOverloadedError instead
    of queueing unboundedly; the reject is counted in the gauges."""
    from composer_tpu.exceptions import ServiceOverloadedError

    model, params = _tiny_model()
    # A long coalescing window keeps the worker holding the first request
    # while the flood lands in the queue.
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=1, max_wait_ms=500.0, max_queue_depth=2,
    )
    try:
        outcomes = []
        lock = threading.Lock()

        def call(i):
            try:
                service.submit([3 + i], length=2)
                with lock:
                    outcomes.append("ok")
            except ServiceOverloadedError:
                with lock:
                    outcomes.append("rejected")

        threads = [threading.Thread(target=call, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
            assert not t.is_alive()
        assert "rejected" in outcomes  # 8 racing submits into depth 2
        assert outcomes.count("ok") >= 2
        stats = service.overload_stats()
        assert stats["requests_rejected"] == outcomes.count("rejected")
        assert stats["max_queue_depth"] == 2
    finally:
        service.close()
    # Every admitted request completed; the queue gauge returns to zero.
    assert service.overload_stats()["queue_depth"] == 0


def test_deadline_expires_in_queue():
    """A request whose deadline passes while queued fails with
    DeadlineExceededError — promptly (waiter-side timeout), not only when
    the worker eventually looks at it."""
    import time as time_module

    from composer_tpu.exceptions import DeadlineExceededError

    model, params = _tiny_model()
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=2, max_wait_ms=2000.0,
    )
    try:
        # Occupy the worker's 2s coalescing window with a no-deadline
        # request; the victim's INCOMPATIBLE signature (different length
        # bucket) keeps it queued behind the window.
        blocker = threading.Thread(
            target=lambda: service.submit([1], length=2)
        )
        blocker.start()
        time_module.sleep(0.1)
        started = time_module.monotonic()
        with pytest.raises(DeadlineExceededError):
            service.submit([2], length=60, deadline_ms=200)
        assert time_module.monotonic() - started < 1.9  # before the window
        blocker.join(timeout=120)
        assert service.overload_stats()["requests_expired"] == 1
    finally:
        service.close()


def test_cancel_drops_request_before_dispatch():
    from composer_tpu.exceptions import RequestCancelledError

    model, params = _tiny_model()
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=1, max_wait_ms=500.0,
    )
    try:
        cancel = threading.Event()
        cancel.set()  # cancelled before the worker ever sees it
        with pytest.raises(RequestCancelledError):
            service.submit([1], length=2, cancel=cancel)
        assert service.overload_stats()["requests_cancelled"] == 1
    finally:
        service.close()


def test_continuous_deadline_evicts_mid_generation():
    """Continuous engine: a deadline expiring mid-generation evicts the row
    at a segment boundary and frees the slot for later requests."""
    import jax

    from composer_tpu.exceptions import DeadlineExceededError
    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128,
    )
    try:
        # Slow every segment deterministically so the deadline reliably
        # expires MID-GENERATION (after admission, before completion) —
        # wall-clock alone is not reliable: warm interpret segments run in
        # tens of ms, and the original default-temperature request raced
        # the deadline against the sampled branch's lowering error.
        import composer_tpu.ops.decode_kernel_segmented as seg_mod

        real_decode = seg_mod.decode_segment

        def slow_decode(*args, **kwargs):
            time.sleep(0.25)
            return real_decode(*args, **kwargs)

        seg_mod.decode_segment = slow_decode
        try:
            with pytest.raises(DeadlineExceededError):
                service.submit([5, 6], length=50, temperature=0.0,
                               deadline_ms=500)
        finally:
            seg_mod.decode_segment = real_decode
        assert service.overload_stats()["requests_expired"] >= 1
        # The slot is free again: a short request completes normally.
        out = service.submit([5, 6], length=3, temperature=0.0)
        assert len(out) == 5
    finally:
        service.close()


def test_http_overload_status_codes(server):
    """HTTP mapping: queue-full -> 429, deadline -> 503, and the health
    endpoint carries the overload gauges."""
    http_server, service = server
    # Deadline: expires while the worker's coalescing window holds it.
    hold = threading.Thread(
        target=lambda: _post(http_server, {"events": [9], "length": 2})
    )
    hold.start()
    with pytest.raises(urllib.error.HTTPError) as err:
        _post(http_server, {"events": [8], "length": 2, "deadline_ms": 1})
    assert err.value.code == 503
    hold.join(timeout=120)

    with urllib.request.urlopen(
        f"http://127.0.0.1:{http_server.server_port}/v1/health", timeout=30
    ) as response:
        body = json.loads(response.read())
    assert body["requests_expired"] >= 1
    assert "queue_depth" in body and "latency_p95_s" in body
    assert body["latency_p95_s"] > 0


def test_continuous_admission_prefill_matches_unprefilled():
    """Long-prompt admission prefill (one XLA forward + slot scatter, row
    clock started mid-prompt) returns exactly the tokens of token-by-token
    teacher forcing — greedy, f32 (VERDICT r3 item 2, continuous engine)."""
    import jax

    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    prompt = list(np.random.default_rng(8).integers(0, VOCAB, 17))

    outputs = {}
    for prefill_min, label in ((0, "forced"), (4, "prefilled")):
        service = ContinuousGenerationService(
            model, ModelType.TRANSFORMER, params, VOCAB,
            slots=2, seg_steps=4, cache_len=128, prefill_min=prefill_min,
        )
        try:
            outputs[label] = service.submit(prompt, 6, temperature=0.0)
            # A second request through the same (now dirtied) state still
            # matches — prefill scatters must not corrupt other slots.
            outputs[label + "2"] = service.submit(
                prompt[:9], 5, temperature=0.0
            )
        finally:
            service.close()
    np.testing.assert_array_equal(outputs["forced"], outputs["prefilled"])
    np.testing.assert_array_equal(outputs["forced2"], outputs["prefilled2"])


def test_prefix_cache_hit_matches_cold_admission():
    """A repeated prompt's second admission comes from the cross-request
    prefix cache (KV rows are a pure function of the prefix, so a cached
    scatter is bit-identical to recomputing the prefix forward)."""
    import jax

    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    rng = np.random.default_rng(11)
    long_prompt = list(rng.integers(0, VOCAB, 17))
    other_prompt = list(rng.integers(0, VOCAB, 17))

    outputs = {}
    stats = {}
    for cache_mb, label in ((0.0, "cold"), (8.0, "cached")):
        service = ContinuousGenerationService(
            model, ModelType.TRANSFORMER, params, VOCAB,
            slots=2, seg_steps=4, cache_len=128, prefill_min=4,
            prefix_cache_mb=cache_mb,
        )
        try:
            outputs[label] = service.submit(long_prompt, 6, temperature=0.0)
            outputs[label + "_repeat"] = service.submit(
                long_prompt, 6, temperature=0.0
            )
            outputs[label + "_other"] = service.submit(
                other_prompt, 5, temperature=0.0
            )
            stats[label] = service.overload_stats()
        finally:
            service.close()

    np.testing.assert_array_equal(outputs["cold"], outputs["cached"])
    np.testing.assert_array_equal(
        outputs["cold_repeat"], outputs["cached_repeat"]
    )
    np.testing.assert_array_equal(
        outputs["cold_other"], outputs["cached_other"]
    )
    assert stats["cold"]["prefix_cache_hits"] == 0
    assert stats["cold"]["prefix_cache_entries"] == 0
    assert stats["cached"]["prefix_cache_hits"] == 1  # the repeat
    assert stats["cached"]["prefix_cache_misses"] == 2  # two distinct prefixes
    assert stats["cached"]["prefix_cache_entries"] == 2
    assert stats["cached"]["prefix_cache_bytes"] > 0


def test_prefix_cache_lru_eviction_respects_budget():
    """Entries LRU-evict against the byte budget; an over-budget single
    entry is not cached at all."""
    import jax

    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    rng = np.random.default_rng(12)
    prompts = [list(rng.integers(0, VOCAB, 17)) for _ in range(3)]

    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128, prefill_min=4,
        prefix_cache_mb=8.0,
    )
    try:
        service.submit(prompts[0], 4, temperature=0.0)
        one_entry_bytes = service.overload_stats()["prefix_cache_bytes"]
        assert one_entry_bytes > 0
    finally:
        service.close()

    # Budget sized for exactly one entry: the third distinct prefix evicts
    # the least-recently-used first one.
    budget_mb = (one_entry_bytes + 1) / (1024 * 1024)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128, prefill_min=4,
        prefix_cache_mb=budget_mb,
    )
    try:
        for prompt in prompts:
            service.submit(prompt, 4, temperature=0.0)
        stats = service.overload_stats()
        assert stats["prefix_cache_entries"] == 1
        assert stats["prefix_cache_bytes"] <= one_entry_bytes + 1
        assert stats["prefix_cache_misses"] == 3
        # Re-submitting the (still cached) newest prompt hits.
        service.submit(prompts[-1], 4, temperature=0.0)
        assert service.overload_stats()["prefix_cache_hits"] == 1
    finally:
        service.close()


def test_continuous_interpret_rejects_sampled_requests():
    """Off-TPU the segmented kernel cannot sample (no hardware PRNG in the
    interpreter): a temperature > 0 submit gets a clean parameter error
    instead of crashing the worker with a lowering error."""
    import jax

    from composer_tpu.exceptions import InvalidParameterError
    from composer_tpu.serving import ContinuousGenerationService

    model = Transformer(TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        dtype=jax.numpy.float32, param_dtype=jax.numpy.float32,
    ))
    params = model.init_params(jax.random.PRNGKey(0), 1, 8)
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128,
    )
    try:
        with pytest.raises(InvalidParameterError, match="greedy-only"):
            service.submit([5, 6], length=4)  # default temperature 1.0
        # Greedy still serves.
        out = service.submit([5, 6], length=3, temperature=0.0)
        assert len(out) == 5
    finally:
        service.close()


def test_health_reports_spec_acceptance(monkeypatch):
    """When generate_ids serves a request through the speculative engine,
    /v1/health must expose the realized acceptance (VERDICT r4 item 8): the
    greedy-only auto routing's "never below sequential" claim is monitored
    in production, not assumed. Off-TPU the auto router skips the engine, so
    the routing predicate is forced here and the REAL interpret-mode kernel
    runs under the service."""
    from composer_tpu.train import generate as gen

    model, params = _tiny_model()
    monkeypatch.setattr(
        gen, "_use_spec_kernel",
        lambda m, mt, batch, cache_len, engine, temps=None: (
            batch == 1 and temps is not None
            and bool(np.all(np.asarray(temps) <= 0))
        ),
    )
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=4, max_wait_ms=5.0,
    )
    try:
        baseline = service.overload_stats()
        assert baseline["spec_requests"] == 0
        assert baseline["spec_acceptance_last"] is None

        out = service.submit([5, 8, 11], length=4, temperature=0.0)
        assert len(out) == 7

        stats = service.overload_stats()
        assert stats["spec_requests"] == 1
        assert stats["spec_acceptance_last"] >= 1.0
        assert stats["spec_acceptance_mean"] >= 1.0

        # A sampled request stays off the spec engine and must not move
        # the gauges.
        service.submit([5, 8, 11], length=4, temperature=0.9)
        assert service.overload_stats()["spec_requests"] == 1
    finally:
        service.close()


def test_continuous_wide_engine_serves_and_matches_resident():
    """engine='wide' routes the continuous scheduler onto the streaming
    weights-over-VMEM kernel (VERDICT r4 item 1). Greedy outputs are
    bit-identical to the resident segmented engine, and the scheduler
    surface (submit, streaming, health) is unchanged."""
    from composer_tpu.serving import ContinuousGenerationService

    model, params = _tiny_model()
    prompts = [[5, 8, 11], [250, 3], [7, 7, 7, 7]]
    results = {}
    for engine in ("resident", "wide"):
        service = ContinuousGenerationService(
            model, ModelType.TRANSFORMER, params, VOCAB,
            slots=2, seg_steps=4, cache_len=128, engine=engine,
        )
        try:
            assert service.wide == (engine == "wide")
            outs = [None] * len(prompts)
            threads = [
                threading.Thread(
                    target=lambda i=i, p=p: outs.__setitem__(
                        i, service.submit(p, length=6, temperature=0.0)
                    )
                )
                for i, p in enumerate(prompts)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=600)
                assert not t.is_alive()
            results[engine] = outs
        finally:
            service.close()
    for got, want in zip(results["wide"], results["resident"]):
        np.testing.assert_array_equal(got, want)


def test_continuous_wide_engine_streams_and_reports_health():
    from composer_tpu.serving import ContinuousGenerationService

    model, params = _tiny_model()
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128, engine="wide",
    )
    try:
        chunks = list(service.submit_stream([5, 8], length=5, temperature=0.0))
        flat = [t for chunk in chunks for t in chunk]
        assert flat[:2] == [5, 8] and len(flat) == 7
        # Prefill/prefix-cache are resident-layout features: disabled in
        # wide mode, and the health gauges say so.
        stats = service.overload_stats()
        assert stats["prefix_cache_entries"] == 0
        assert service.prefill_min == 0
    finally:
        service.close()


def test_continuous_auto_picks_resident_for_small_models():
    from composer_tpu.serving import ContinuousGenerationService
    from composer_tpu.train.generate import _packed_weight_bytes

    model, params = _tiny_model()
    service = ContinuousGenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        slots=2, seg_steps=4, cache_len=128, engine="auto",
    )
    try:
        assert not service.wide
    finally:
        service.close()
    # The flagship scaled arch (embed 1024) crosses the resident gate and
    # auto-routes to the streaming kernel (checked at the config level —
    # materializing the ~200 MB model here would be all cost, no signal).
    big = TransformerConfig(
        vocab_size=VOCAB, embed_dim=1024, window_size=2048, num_layers=8,
        num_heads=16,
    )
    assert _packed_weight_bytes(big) >= 60 * 1024 * 1024


def test_wide_model_batches_pad_to_fixed_size(monkeypatch):
    """Wide (weights-over-VMEM) models dispatch at ONE fixed batch size:
    every distinct batch size is a separate multi-minute streaming-kernel
    compile, while the per-step cost is weight-stream-bound and nearly
    batch-independent — so occupancy must not pick the compiled program
    (measured p50 162 s under Poisson arrivals before this fix)."""
    from composer_tpu.train import generate as gen

    model, params = _tiny_model()
    shapes = []
    real = gen.generate_ids

    def spy(model_, model_type_, variables_, prompts_, **kwargs):
        shapes.append(np.asarray(prompts_).shape[0])
        return real(model_, model_type_, variables_, prompts_, **kwargs)

    monkeypatch.setattr(gen, "generate_ids", spy)
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=4, max_wait_ms=5.0, wide_batch_pad=True,
    )
    try:
        out = service.submit([5, 8, 11], length=4, temperature=0.0)
        assert len(out) == 7
    finally:
        service.close()
    assert shapes == [4], shapes  # one request still dispatches at size 4

    # The default (resident-size models) keeps power-of-two bucketing.
    shapes.clear()
    service = GenerationService(
        model, ModelType.TRANSFORMER, params, VOCAB,
        max_batch_size=4, max_wait_ms=5.0,
    )
    try:
        assert not service.wide_batch_pad
        service.submit([5, 8, 11], length=4, temperature=0.0)
    finally:
        service.close()
    assert shapes == [1], shapes
