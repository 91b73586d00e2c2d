"""The vectorized encoder must match the object encoder exactly."""

import numpy as np
import pytest

from composer_tpu.midi import Note, NoteSequence, SustainPeriod, SustainPeriodEncodeMode
from composer_tpu.midi.fast_encode import encode_note_sequence


def _random_sequence(rng, num_notes, num_sustains, max_time=60_000):
    notes = []
    for _ in range(num_notes):
        start = float(rng.uniform(0, max_time))
        duration = float(rng.uniform(1, 5000))
        notes.append(
            Note(start, start + duration, int(rng.integers(0, 128)), int(rng.integers(0, 128)))
        )
    sustains = []
    t = 0.0
    for _ in range(num_sustains):
        t += float(rng.uniform(0, max_time / max(num_sustains, 1)))
        end = t + float(rng.uniform(1, 4000))
        sustains.append(SustainPeriod(t, end))
        t = end
    return NoteSequence(notes, sustains)


@pytest.mark.parametrize("mode", list(SustainPeriodEncodeMode))
@pytest.mark.parametrize("clean", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fast_encoder_matches_object_encoder(mode, clean, seed):
    rng = np.random.default_rng(seed)
    sequence = _random_sequence(rng, num_notes=120, num_sustains=6)

    slow = sequence.to_event_sequence(
        10, 100, 32, sustain_period_encode_mode=mode, clean=clean
    )
    slow_types, slow_values = slow.to_arrays()

    fast_types, fast_values = encode_note_sequence(
        sequence,
        time_step_increment=10,
        max_time_steps=100,
        velocity_bins=32,
        sustain_period_encode_mode=mode,
        clean=clean,
    )
    np.testing.assert_array_equal(fast_types, slow_types)
    np.testing.assert_array_equal(fast_values, slow_values)


def test_fast_encoder_edge_cases():
    # Same-pitch retrigger (clean removes the pair), simultaneous notes,
    # zero-duration note, sustain covering everything.
    sequence = NoteSequence(
        [
            Note(0, 1000, 60, 64),
            Note(1000, 2000, 60, 64),
            Note(0, 500, 64, 64),
            Note(700, 700, 72, 100),
        ],
        [SustainPeriod(0, 2500)],
    )
    for mode in SustainPeriodEncodeMode:
        slow = sequence.to_event_sequence(10, 100, 4, sustain_period_encode_mode=mode)
        fast_types, fast_values = encode_note_sequence(
            sequence, time_step_increment=10, max_time_steps=100, velocity_bins=4,
            sustain_period_encode_mode=mode,
        )
        slow_types, slow_values = slow.to_arrays()
        np.testing.assert_array_equal(fast_types, slow_types, err_msg=str(mode))
        np.testing.assert_array_equal(fast_values, slow_values, err_msg=str(mode))


def test_fast_encoder_empty():
    types, values = encode_note_sequence(NoteSequence())
    assert types.size == 0 and values.size == 0


def test_fast_encoder_no_max_time_steps():
    sequence = NoteSequence([Note(0, 250_000, 60, 64)])
    slow = sequence.to_event_sequence(10, None, 32)
    fast_types, fast_values = encode_note_sequence(
        sequence, time_step_increment=10, max_time_steps=None, velocity_bins=32
    )
    slow_types, slow_values = slow.to_arrays()
    np.testing.assert_array_equal(fast_types, slow_types)
    np.testing.assert_array_equal(fast_values, slow_values)
