"""Golden tests for the event codec.

These pin the cross-implementation compatibility contract with the reference
(tests/test_sequences.py in /root/reference): the event streams, the integer
id layout, and the augmentation semantics must match bit-for-bit.
"""

import numpy as np
import pytest

from composer_tpu.midi import (
    Event,
    EventSequence,
    EventType,
    Note,
    NoteSequence,
    SustainPeriod,
    SustainPeriodEncodeMode,
)
from composer_tpu.midi.serialization import IntegerEncodedEventSequence
from composer_tpu.midi.vocab import get_vocabulary

# Codec constants used by the golden streams (4 velocity bins: [0,31], [32,63],
# [64,95], [96,127]).
TSI = 10
MAX_STEPS = 100
VBINS = 4


def assert_note_sequences_equal(a: NoteSequence, b: NoteSequence):
    assert len(a.notes) == len(b.notes)
    for note_a, note_b in zip(a.notes, b.notes):
        assert note_a.start == note_b.start
        assert note_a.end == note_b.end
        assert note_a.pitch == note_b.pitch
        assert note_a.velocity == note_b.velocity
    assert len(a.sustain_periods) == len(b.sustain_periods)
    for period_a, period_b in zip(a.sustain_periods, b.sustain_periods):
        assert period_a.start == period_b.start
        assert period_a.end == period_b.end


def assert_event_sequences_equal(a: EventSequence, b: EventSequence):
    assert a.time_step_increment == b.time_step_increment
    assert a.max_time_steps == b.max_time_steps
    assert a.velocity_bins == b.velocity_bins
    assert len(a.events) == len(b.events)
    for event_a, event_b in zip(a.events, b.events):
        assert event_a.type == event_b.type, (event_a, event_b)
        assert event_a.value == event_b.value, (event_a, event_b)


def test_time_stretch():
    for factor in [0.50, 1.0, 1.5]:
        sequence = NoteSequence([Note(0, 2000, 2, 0), Note(3000, 4000, 1, 0)])
        target = NoteSequence(
            [Note(0, 2000 * factor, 2, 0), Note(3000 * factor, 4000 * factor, 1, 0)]
        )
        assert_note_sequences_equal(sequence.time_stretch(factor, inplace=False), target)
        sequence.time_stretch(factor, inplace=True)
        assert_note_sequences_equal(sequence, target)


def test_pitch_shift():
    for offset in [0, 3, 1000, -2]:
        sequence = NoteSequence([Note(0, 2000, 2, 0), Note(3000, 4000, 1, 0)])
        target = NoteSequence(
            [
                Note(0, 2000, int(np.clip(2 + offset, 0, 127)), 0),
                Note(3000, 4000, int(np.clip(1 + offset, 0, 127)), 0),
            ]
        )
        assert_note_sequences_equal(sequence.pitch_shift(offset, inplace=False), target)
        sequence.pitch_shift(offset, inplace=True)
        assert_note_sequences_equal(sequence, target)


# The three golden encode cases (notes only / notes+sustain EVENTS / sustain only).

def _notes_only_pair():
    notes = NoteSequence([Note(0, 2000, 2, 64), Note(3000, 4000, 1, 9)])
    events = EventSequence(
        [
            Event(EventType.VELOCITY, 2),
            Event(EventType.NOTE_ON, 2),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.NOTE_OFF, 2),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.VELOCITY, 0),
            Event(EventType.NOTE_ON, 1),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.NOTE_OFF, 1),
        ],
        TSI,
        MAX_STEPS,
        VBINS,
    )
    return notes, events


def _notes_and_sustain_pair():
    notes = NoteSequence(
        [Note(0, 4000, 1, 37), Note(0, 4000, 4, 37), Note(5000, 11000, 3, 96)],
        [SustainPeriod(4000, 5000)],
    )
    events = EventSequence(
        [
            Event(EventType.VELOCITY, 1),
            Event(EventType.NOTE_ON, 1),
            Event(EventType.NOTE_ON, 4),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.SUSTAIN_ON, None),
            Event(EventType.NOTE_OFF, 1),
            Event(EventType.NOTE_OFF, 4),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.SUSTAIN_OFF, None),
            Event(EventType.VELOCITY, 3),
            Event(EventType.NOTE_ON, 3),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.NOTE_OFF, 3),
        ],
        TSI,
        MAX_STEPS,
        VBINS,
    )
    return notes, events


def _sustain_only_pair():
    notes = NoteSequence(
        None,
        [SustainPeriod(0, 1000), SustainPeriod(2500, 5670), SustainPeriod(8000, 10000)],
    )
    events = EventSequence(
        [
            Event(EventType.SUSTAIN_ON, None),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.SUSTAIN_OFF, None),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 50),
            Event(EventType.SUSTAIN_ON, None),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 17),
            Event(EventType.SUSTAIN_OFF, None),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 33),
            Event(EventType.SUSTAIN_ON, None),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.SUSTAIN_OFF, None),
        ],
        TSI,
        MAX_STEPS,
        VBINS,
    )
    return notes, events


@pytest.mark.parametrize(
    "pair", [_notes_only_pair, _notes_and_sustain_pair, _sustain_only_pair]
)
def test_note_sequence_to_event_sequence(pair):
    notes, target = pair()
    encoded = notes.to_event_sequence(TSI, MAX_STEPS, VBINS)
    assert_event_sequences_equal(encoded, target)


def test_event_sequence_to_note_sequence():
    _, events_a = _notes_only_pair()
    target_a = NoteSequence([Note(0, 2000, 2, 64), Note(3000, 4000, 1, 0)])
    assert_note_sequences_equal(events_a.to_note_sequence(), target_a)

    _, events_b = _notes_and_sustain_pair()
    # Velocity round-trips lossily through the bins: 37 -> bin 1 -> 32.
    target_b = NoteSequence(
        [Note(0, 4000, 1, 32), Note(0, 4000, 4, 32), Note(5000, 11000, 3, 96)],
        [SustainPeriod(4000, 5000)],
    )
    assert_note_sequences_equal(events_b.to_note_sequence(), target_b)

    _, events_c = _sustain_only_pair()
    target_c = NoteSequence(
        None,
        [SustainPeriod(0, 1000), SustainPeriod(2500, 5670), SustainPeriod(8000, 10000)],
    )
    assert_note_sequences_equal(events_c.to_note_sequence(), target_c)


# Golden integer ids: the vocabulary ABI with 4 velocity bins (vocab size 362).
GOLDEN_IDS = [
    257, 1, 4, 359, 359, 359, 359, 360, 129, 132, 359,
    361, 259, 3, 359, 359, 359, 359, 359, 359, 131,
]


def test_event_to_id():
    _, events = _notes_and_sustain_pair()
    ids = [
        IntegerEncodedEventSequence.event_to_id(
            event.type, event.value, events.event_ranges, events.event_value_ranges
        )
        for event in events.events
    ]
    assert ids == GOLDEN_IDS


def test_id_to_event():
    _, target = _notes_and_sustain_pair()
    events = [
        IntegerEncodedEventSequence.id_to_event(
            event_id, target.event_ranges, target.event_value_ranges
        )
        for event_id in GOLDEN_IDS
    ]
    assert_event_sequences_equal(
        EventSequence(events, TSI, MAX_STEPS, VBINS), target
    )


def test_vectorized_id_codec_matches_golden():
    _, events = _notes_and_sustain_pair()
    ids = events.to_ids()
    assert ids.tolist() == GOLDEN_IDS

    decoded = EventSequence.from_ids(ids, TSI, MAX_STEPS, VBINS)
    assert_event_sequences_equal(decoded, events)


def test_vocab_sizes():
    assert get_vocabulary(10, 100, 32).size == 390  # default config
    assert get_vocabulary(10, 100, 4).size == 362  # the golden-test config


def test_sustain_period_extension():
    notes = NoteSequence(
        [
            Note(0, 4000, 4, 64),
            Note(0, 4000, 1, 64),
            Note(0, 4000, 3, 64),
            Note(5000, 11000, 3, 64),
        ],
        [SustainPeriod(0, 6000)],
    )
    target = EventSequence(
        [
            Event(EventType.VELOCITY, 2),
            Event(EventType.NOTE_ON, 4),
            Event(EventType.NOTE_ON, 1),
            Event(EventType.NOTE_ON, 3),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.NOTE_OFF, 4),
            Event(EventType.NOTE_OFF, 1),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.NOTE_OFF, 3),
        ],
        TSI,
        MAX_STEPS,
        VBINS,
    )
    encoded = notes.to_event_sequence(
        TSI, MAX_STEPS, VBINS, sustain_period_encode_mode=SustainPeriodEncodeMode.EXTEND
    )
    assert_event_sequences_equal(encoded, target)


def test_extend_does_not_mutate_caller():
    # Documented fix over the reference: EXTEND leaves the caller untouched.
    notes = NoteSequence([Note(0, 4000, 4, 64)], [SustainPeriod(0, 6000)])
    notes.to_event_sequence(
        TSI, MAX_STEPS, VBINS, sustain_period_encode_mode=SustainPeriodEncodeMode.EXTEND
    )
    assert notes.notes[0].end == 4000


def test_trim_start():
    sequence = NoteSequence(
        [Note(500, 2000, 2, 64)], [SustainPeriod(400, 900)]
    )
    trimmed = sequence.trim_start(inplace=False)
    assert trimmed.notes[0].start == 100
    assert trimmed.sustain_periods[0].start == 0


def test_clean_removes_zero_shifts_and_onoff_pairs():
    # Two same-pitch notes: the first ends exactly when the second starts.
    notes = NoteSequence([Note(0, 1000, 60, 64), Note(1000, 2000, 60, 64)])
    encoded = notes.to_event_sequence(TSI, MAX_STEPS, VBINS)
    kinds = [(e.type, e.value) for e in encoded.events]
    # The OFF(60)/ON(60) pair at t=1000 is removed; the time shifts merge the
    # note into one long [0, 2000] span.
    assert kinds == [
        (EventType.VELOCITY, 2),
        (EventType.NOTE_ON, 60),
        (EventType.TIME_SHIFT, 100),
        (EventType.TIME_SHIFT, 100),
        (EventType.NOTE_OFF, 60),
    ]


def test_open_sustain_period_raises_cleanly():
    """An end-less sustain period (end defaults to None) surfaces as a clean
    InvalidParameterError, not a TypeError from the marker sort."""
    import pytest

    from composer_tpu.exceptions import InvalidParameterError
    from composer_tpu.midi.events import Note, NoteSequence, SustainPeriod

    sequence = NoteSequence([Note(0, 100, 60, 64)], [SustainPeriod(50.0)])
    with pytest.raises(InvalidParameterError, match="no end"):
        sequence.to_event_sequence()
