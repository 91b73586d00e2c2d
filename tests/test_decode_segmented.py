"""Segmented continuous-batching decode kernel (interpret mode, greedy).

Pins the three properties the serving scheduler relies on:
* a run cut into segments (state carried through aliased refs) emits
  exactly what one uncut run emits;
* a row ADMITTED at a segment boundary generates exactly what a fresh
  single-sequence run on its prompt generates, and does not perturb the
  rows already in flight;
* parked slots emit -1 and write nothing.

The sampled branch needs the on-core TPU PRNG (absent in interpret mode);
its split-invariance (per-step reseeding) is validated on hardware.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.ops import decode_kernel as dk
from composer_tpu.ops.decode_kernel_segmented import (
    PARKED,
    decode_segment,
    init_segment_state,
)
from tests.test_decode_kernel import _setup

CACHE = 128


def _run_segments(packed, config, prompts, plens, starts, boundaries, seed=0):
    """Drives decode_segment over consecutive [b0, b1) ranges; returns the
    concatenated (B, total_steps) token stream."""
    batch = prompts.shape[0]
    kbuf, vbuf, carry = init_segment_state(packed, config, batch, CACHE)
    chunks = []
    for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
        tokens, kbuf, vbuf, carry = decode_segment(
            packed, kbuf, vbuf, carry,
            prompts, plens, starts, b0, seed, 0.0, 0, 0.0,
            config=config, steps=b1 - b0, cache_len=CACHE, live=CACHE,
            interpret=True, greedy=True,
        )
        chunks.append(np.asarray(tokens))
    return np.concatenate(chunks, axis=1)


def _gather(stream, start, plen, length):
    """Row generation = samples at steps start+plen-1 .. start+plen-2+length."""
    first = start + plen - 1
    return stream[first : first + length]


@pytest.mark.parametrize("use_relative", [False, True])
def test_segmented_matches_whole_generation(use_relative):
    from composer_tpu.ops.decode_kernel_batched import megakernel_generate_batched

    config, model, params = _setup(use_relative)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    plens = np.array([4, 2, 6], np.int32)
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, 390, (3, 6)).astype(np.int32)
    starts = np.zeros(3, np.int32)
    length = 8
    total = int(plens.max()) + length - 1

    whole = np.asarray(
        megakernel_generate_batched(
            packed, prompts, 0, 0.0,
            config=config, length=length, cache_len=CACHE, interpret=True,
            prompt_lengths=plens,
        )
    )

    for boundaries in ([0, total], [0, 3, 7, total], list(range(total + 1))):
        stream = _run_segments(packed, config, prompts, plens, starts, boundaries)
        for row in range(3):
            np.testing.assert_array_equal(
                _gather(stream[row], 0, int(plens[row]), length),
                whole[row],
                err_msg=f"row {row} boundaries {boundaries}",
            )


def test_admission_mid_flight_matches_fresh_run():
    """A request admitted into a running batch at a segment boundary decodes
    exactly as a fresh standalone run, and the in-flight rows are unchanged."""
    config, model, params = _setup(True)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    length = 8

    prompts = np.zeros((3, 6), np.int32)
    prompts[0, :4] = rng.integers(0, 390, 4)
    prompts[1, :3] = rng.integers(0, 390, 3)
    late = rng.integers(0, 390, 5).astype(np.int32)
    plens = np.array([4, 3, 1], np.int32)
    starts = np.array([0, 0, PARKED], np.int32)

    batch = 3
    kbuf, vbuf, carry = init_segment_state(packed, config, batch, CACHE)
    seg = 5
    tokens0, kbuf, vbuf, carry = decode_segment(
        packed, kbuf, vbuf, carry, prompts, plens, starts, 0, 0, 0.0, 0, 0.0,
        config=config, steps=seg, cache_len=CACHE, live=CACHE,
        interpret=True, greedy=True,
    )
    tokens0 = np.asarray(tokens0)
    assert (tokens0[2] == -1).all()  # parked slot emits nothing

    # Admit the late request into slot 2 at step `seg`.
    prompts[2, :5] = late
    plens[2] = 5
    starts[2] = seg
    steps_more = 5 + length  # covers the late row's prompt + generation
    tokens1, kbuf, vbuf, carry = decode_segment(
        packed, kbuf, vbuf, carry, prompts, plens, starts, seg, 0, 0.0, 0, 0.0,
        config=config, steps=steps_more, cache_len=CACHE, live=CACHE,
        interpret=True, greedy=True,
    )
    stream = np.concatenate([tokens0, np.asarray(tokens1)], axis=1)

    # Rows 0/1 (already in flight) are exactly their no-admission runs.
    whole = _run_segments(
        packed, config,
        prompts[:2], plens[:2], starts[:2], [0, seg + steps_more],
    )
    for row in range(2):
        np.testing.assert_array_equal(
            _gather(stream[row], 0, int(plens[row]), length),
            _gather(whole[row], 0, int(plens[row]), length),
            err_msg=f"in-flight row {row}",
        )

    # The admitted row matches a fresh standalone run on its prompt.
    fresh = dk.megakernel_generate(
        packed, late, seed=0, temperature=0.0,
        config=config, length=length, cache_len=CACHE, interpret=True,
    )
    np.testing.assert_array_equal(
        _gather(stream[2], seg, 5, length), np.asarray(fresh)
    )


def test_staged_live_matches_full_cache():
    """Contracting only a staged `live` prefix (the scheduler grows it in
    buckets; the kernel stages exactly that many VMEM rows per slot) emits
    the same tokens as contracting the whole cache."""
    config, model, params = _setup(True)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    prompts = rng.integers(0, 390, (2, 5)).astype(np.int32)
    plens = np.array([5, 3], np.int32)
    starts = np.zeros(2, np.int32)

    full = _run_segments(packed, config, prompts, plens, starts, [0, 24])

    batch = 2
    kbuf, vbuf, carry = init_segment_state(packed, config, batch, CACHE)
    chunks = []
    for b0, b1 in [(0, 8), (8, 16), (16, 24)]:
        live = ((b1 + 15) // 16) * 16  # grows with the oldest row
        tokens, kbuf, vbuf, carry = decode_segment(
            packed, kbuf, vbuf, carry, prompts, plens, starts,
            b0, 0, 0.0, 0, 0.0,
            config=config, steps=b1 - b0, cache_len=CACHE, live=live,
            interpret=True, greedy=True,
        )
        chunks.append(np.asarray(tokens))
    np.testing.assert_array_equal(np.concatenate(chunks, axis=1), full)


def test_lingering_row_past_live_cannot_corrupt_neighbours():
    """A completed row the scheduler has not evicted yet can advance past
    `live` (capacity clamp). Its cache writes must clamp in-slot — a row
    admitted into the NEXT slot decodes exactly its fresh standalone run."""
    config, model, params = _setup(True)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    early = rng.integers(0, 390, 4).astype(np.int32)
    late = rng.integers(0, 390, 6).astype(np.int32)

    prompts = np.zeros((2, 6), np.int32)
    prompts[0, :4] = early
    plens = np.array([4, 1], np.int32)
    starts = np.array([0, PARKED], np.int32)

    kbuf, vbuf, carry = init_segment_state(packed, config, 2, CACHE)
    _, kbuf, vbuf, carry = decode_segment(
        packed, kbuf, vbuf, carry, prompts, plens, starts, 0, 0, 0.0, 0, 0.0,
        config=config, steps=32, cache_len=CACHE, live=32,
        interpret=True, greedy=True,
    )
    # Admit the late row; keep row 0 active with live pinned BELOW its
    # positions (32..47 vs live 32) — the lingering-clamp scenario.
    prompts[1, :6] = late
    plens[1] = 6
    starts[1] = 32
    tokens, kbuf, vbuf, carry = decode_segment(
        packed, kbuf, vbuf, carry, prompts, plens, starts, 32, 0, 0.0, 0, 0.0,
        config=config, steps=16, cache_len=CACHE, live=32,
        interpret=True, greedy=True,
    )
    fresh = dk.megakernel_generate(
        packed, late, seed=0, temperature=0.0,
        config=config, length=11, cache_len=CACHE, interpret=True,
    )
    np.testing.assert_array_equal(
        _gather(np.asarray(tokens)[1], 0, 6, 11), np.asarray(fresh)
    )


def test_state_roundtrips_through_aliased_refs():
    """The returned state arrays are usable (donation/aliasing did not
    corrupt them): running two more segments after a reuse is identical to
    the uncut stream."""
    config, model, params = _setup(False)
    packed = dk.pack_weights(params, config, dtype=jnp.float32)
    prompts = np.array([[7, 30, 200, 45]], np.int32)
    plens = np.array([4], np.int32)
    starts = np.zeros(1, np.int32)

    uncut = _run_segments(packed, config, prompts, plens, starts, [0, 12])
    cut = _run_segments(packed, config, prompts, plens, starts, [0, 4, 8, 12])
    np.testing.assert_array_equal(uncut, cut)
