"""Segmented streaming wide-model decode kernel (interpret mode, greedy).

The continuous-batching engine's invariance contract, for the
weights-over-VMEM kernel (ops/decode_kernel_wide_segmented.py):

* a run cut into segments (HBM KV + carry threaded through aliased refs,
  tail windows flushed/reloaded at every boundary) emits exactly what ONE
  whole-generation run of ops/decode_kernel_wide.py emits;
* a row admitted at a segment boundary decodes exactly as a fresh
  standalone run and does not perturb rows already in flight;
* parked slots emit -1;
* the per-row tail window and the chunked HBM prefix agree across flush
  boundaries (exercised with test-sized ``tail``/``kv_chunk`` so window
  crossings and multi-chunk streaming happen at interpret-speed lengths).

The sampled branch needs the on-core TPU PRNG (absent in interpret mode);
its split-invariance is the same per-step reseeding as
ops/decode_kernel_segmented.py and is validated on hardware
(scripts/probe_wide_segmented_tpu.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from composer_tpu.ops import decode_kernel_wide_segmented as dws
from composer_tpu.ops.decode_kernel_segmented import PARKED
from composer_tpu.ops.decode_kernel_wide import (
    init_kv_state,
    megakernel_generate_wide,
    pack_weights_wide,
)
from tests.test_decode_kernel import _setup

CACHE = 128
TAIL = 16       # test-sized: crossings happen within interpret-able lengths
KV_CHUNK = 32   # test-sized: multi-chunk streaming at live=128


def _whole(packed, config, prompts, plens, length):
    kv = init_kv_state(config, prompts.shape[0], CACHE, dtype=jnp.float32)
    tokens, _ = megakernel_generate_wide(
        packed, kv, prompts, 0, 0.0, config=config, length=length,
        cache_len=CACHE, interpret=True, prompt_lengths=plens,
    )
    return np.asarray(tokens)


def _run_segments(packed, config, prompts, plens, starts, boundaries, seed=0):
    batch = prompts.shape[0]
    kv, carry = dws.init_wide_segment_state(
        packed, config, batch, CACHE, tail=TAIL, kv_chunk=KV_CHUNK
    )
    chunks = []
    for b0, b1 in zip(boundaries[:-1], boundaries[1:]):
        tokens, kv, carry = dws.decode_segment_wide(
            packed, kv, carry, prompts, plens, starts, b0, seed,
            0.0, 0, 0.0,
            config=config, steps=b1 - b0, cache_len=CACHE, live=CACHE,
            interpret=True, greedy=True, tail=TAIL, kv_chunk=KV_CHUNK,
        )
        chunks.append(np.asarray(tokens))
    return np.concatenate(chunks, axis=1)


def _gather(stream, start, plen, length):
    first = start + plen - 1
    return stream[first : first + length]


@pytest.mark.parametrize("use_relative", [False, True])
def test_wide_segmented_matches_whole_generation(use_relative):
    config, model, params = _setup(use_relative)
    packed = pack_weights_wide(params, config, dtype=jnp.float32)
    plens = np.array([4, 2, 6], np.int32)
    rng = np.random.default_rng(0)
    prompts = rng.integers(0, 390, (3, 6)).astype(np.int32)
    starts = np.zeros(3, np.int32)
    length = 8
    total = int(plens.max()) + length - 1

    whole = _whole(packed, config, prompts, plens, length)
    for boundaries in ([0, total], [0, 3, 7, total]):
        stream = _run_segments(packed, config, prompts, plens, starts, boundaries)
        for row in range(3):
            np.testing.assert_array_equal(
                _gather(stream[row], 0, int(plens[row]), length),
                whole[row],
                err_msg=f"row {row} boundaries {boundaries}",
            )


def test_wide_segmented_across_tail_flushes():
    """Positions cross multiple tail windows AND the segment boundary falls
    mid-window: rows above the flush frontier must survive the boundary
    flush/reload, and flushed rows must be read back through the chunked
    HBM stream bit-identically."""
    config, model, params = _setup(False)
    packed = pack_weights_wide(params, config, dtype=jnp.float32)
    plens = np.array([3, 5], np.int32)
    rng = np.random.default_rng(2)
    prompts = rng.integers(0, 390, (2, 5)).astype(np.int32)
    starts = np.zeros(2, np.int32)
    length = 3 * TAIL  # 48 generated: crosses two window boundaries
    total = int(plens.max()) + length - 1

    whole = _whole(packed, config, prompts, plens, length)
    # Boundaries at 10/21/40 cut mid-window (TAIL=16) twice.
    stream = _run_segments(
        packed, config, prompts, plens, starts, [0, 10, 21, 40, total]
    )
    for row in range(2):
        np.testing.assert_array_equal(
            _gather(stream[row], 0, int(plens[row]), length), whole[row]
        )


def test_wide_admission_mid_flight_matches_fresh_run():
    config, model, params = _setup(True)
    packed = pack_weights_wide(params, config, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    length = 8

    prompts = np.zeros((3, 6), np.int32)
    prompts[0, :4] = rng.integers(0, 390, 4)
    prompts[1, :3] = rng.integers(0, 390, 3)
    late = rng.integers(0, 390, 5).astype(np.int32)
    plens = np.array([4, 3, 1], np.int32)
    starts = np.array([0, 0, PARKED], np.int32)

    kv, carry = dws.init_wide_segment_state(
        packed, config, 3, CACHE, tail=TAIL, kv_chunk=KV_CHUNK
    )
    seg = 5
    tokens0, kv, carry = dws.decode_segment_wide(
        packed, kv, carry, prompts, plens, starts, 0, 0, 0.0, 0, 0.0,
        config=config, steps=seg, cache_len=CACHE, live=CACHE,
        interpret=True, greedy=True, tail=TAIL, kv_chunk=KV_CHUNK,
    )
    tokens0 = np.asarray(tokens0)
    assert (tokens0[2] == -1).all()  # parked slot emits nothing

    prompts[2, :5] = late
    plens[2] = 5
    starts[2] = seg
    steps_more = 5 + length
    tokens1, kv, carry = dws.decode_segment_wide(
        packed, kv, carry, prompts, plens, starts, seg, 0, 0.0, 0, 0.0,
        config=config, steps=steps_more, cache_len=CACHE, live=CACHE,
        interpret=True, greedy=True, tail=TAIL, kv_chunk=KV_CHUNK,
    )
    stream = np.concatenate([tokens0, np.asarray(tokens1)], axis=1)

    # The in-flight rows are byte-identical to an undisturbed run...
    plens_solo = np.array([4, 3, 1], np.int32)
    whole = _whole(packed, config, prompts[:2], plens_solo[:2], length)
    for row in range(2):
        np.testing.assert_array_equal(
            _gather(stream[row], 0, int(plens[row]), length), whole[row]
        )
    # ...and the admitted row matches a fresh standalone generation.
    fresh = _whole(packed, config, late[None], np.array([5], np.int32), length)
    np.testing.assert_array_equal(
        _gather(stream[2], seg, 5, length), fresh[0]
    )


def test_wide_segmented_slot_reuse_after_eviction():
    """An evicted slot's next occupant must not see the previous occupant's
    cache: the new row reads only rows it wrote itself."""
    config, model, params = _setup(False)
    packed = pack_weights_wide(params, config, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    length = 6

    first = rng.integers(0, 390, 4).astype(np.int32)
    second = rng.integers(0, 390, 3).astype(np.int32)

    prompts = np.zeros((2, 4), np.int32)
    prompts[0, :4] = first
    plens = np.array([4, 1], np.int32)
    starts = np.array([0, PARKED], np.int32)
    kv, carry = dws.init_wide_segment_state(
        packed, config, 2, CACHE, tail=TAIL, kv_chunk=KV_CHUNK
    )
    seg0 = 4 + length - 1  # the first occupant finishes inside this segment
    tokens0, kv, carry = dws.decode_segment_wide(
        packed, kv, carry, prompts, plens, starts, 0, 0, 0.0, 0, 0.0,
        config=config, steps=seg0, cache_len=CACHE, live=CACHE,
        interpret=True, greedy=True, tail=TAIL, kv_chunk=KV_CHUNK,
    )
    # Evict slot 0, admit the second request into the SAME slot.
    prompts[0, :] = 0
    prompts[0, :3] = second
    plens[0] = 3
    starts[0] = seg0
    tokens1, kv, carry = dws.decode_segment_wide(
        packed, kv, carry, prompts, plens, starts, seg0, 0, 0.0, 0, 0.0,
        config=config, steps=3 + length, cache_len=CACHE, live=CACHE,
        interpret=True, greedy=True, tail=TAIL, kv_chunk=KV_CHUNK,
    )
    fresh = _whole(packed, config, second[None], np.array([3], np.int32), length)
    np.testing.assert_array_equal(
        _gather(np.asarray(tokens1)[0], 0, 3, length), fresh[0]
    )
