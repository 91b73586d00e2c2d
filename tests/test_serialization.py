"""Tests for the .data binary formats (ABI parity with the reference)."""

import struct

import numpy as np
import pytest

from composer_tpu.exceptions import EncodingError
from composer_tpu.midi import Event, EventSequence, EventType
from composer_tpu.midi.serialization import (
    INTEGER_ENCODING_TYPE_ID,
    ONE_HOT_ENCODING_TYPE_ID,
    IntegerEncodedEventSequence,
    OneHotEncodedEventSequence,
    load,
)


def _sample_events():
    return EventSequence(
        [
            Event(EventType.VELOCITY, 1),
            Event(EventType.NOTE_ON, 60),
            Event(EventType.TIME_SHIFT, 100),
            Event(EventType.SUSTAIN_ON, None),
            Event(EventType.NOTE_OFF, 60),
            Event(EventType.SUSTAIN_OFF, None),
        ],
        10,
        100,
        4,
    )


def test_integer_file_layout(tmp_path):
    events = _sample_events()
    path = tmp_path / "sample.data"
    events.to_integer_encoding().to_file(path)

    raw = path.read_bytes()
    # u64 type id + 3x i16 header + 6 events x 2x i16.
    assert len(raw) == 8 + 6 + 6 * 4
    type_id, tsi, mts, vbins = struct.unpack_from("<Qhhh", raw, 0)
    assert type_id == INTEGER_ENCODING_TYPE_ID
    assert (tsi, mts, vbins) == (10, 100, 4)
    first_type, first_value = struct.unpack_from("<hh", raw, 14)
    assert first_type == int(EventType.VELOCITY) and first_value == 1
    # None values use the -1 sentinel.
    sustain_type, sustain_value = struct.unpack_from("<hh", raw, 14 + 3 * 4)
    assert sustain_type == int(EventType.SUSTAIN_ON) and sustain_value == -1


def test_integer_roundtrip(tmp_path):
    events = _sample_events()
    path = tmp_path / "sample.data"
    events.to_integer_encoding().to_file(path)

    decoded = IntegerEncodedEventSequence.from_file(path, decode=True)
    assert [(e.type, e.value) for e in decoded.events] == [
        (e.type, e.value) for e in events.events
    ]
    assert decoded.time_step_increment == 10
    assert decoded.max_time_steps == 100
    assert decoded.velocity_bins == 4


def test_event_ids_from_file_vectorized(tmp_path):
    events = _sample_events()
    path = tmp_path / "sample.data"
    events.to_integer_encoding().to_file(path)

    ids, value_ranges, ranges, settings = IntegerEncodedEventSequence.event_ids_from_file(
        path, as_numpy_array=True
    )
    assert settings == (10, 100, 4)
    assert ids.tolist() == events.to_ids().tolist()
    # Compat OrderedDict views behave like the reference's.
    assert ranges[EventType.NOTE_ON] == range(0, 128)
    assert value_ranges[EventType.SUSTAIN_ON] is None


def test_one_hot_roundtrip(tmp_path):
    events = _sample_events()
    path = tmp_path / "sample.onehot"
    events.to_one_hot_encoding().to_file(path)

    raw = path.read_bytes()
    type_id = struct.unpack_from("<Q", raw, 0)[0]
    assert type_id == ONE_HOT_ENCODING_TYPE_ID

    decoded = OneHotEncodedEventSequence.from_file(path, decode=True)
    assert [(e.type, e.value) for e in decoded.events] == [
        (e.type, e.value) for e in events.events
    ]


def test_load_dispatches_on_type_header(tmp_path):
    events = _sample_events()
    int_path = tmp_path / "a.data"
    one_hot_path = tmp_path / "b.data"
    events.to_integer_encoding().to_file(int_path)
    events.to_one_hot_encoding().to_file(one_hot_path)

    for path in (int_path, one_hot_path):
        decoded = load(path, decode=True)
        assert len(decoded.events) == len(events.events)

    bad = tmp_path / "bad.data"
    bad.write_bytes(struct.pack("<Q", 12345) + b"xx")
    with pytest.raises(EncodingError):
        load(bad)


def test_one_hot_from_file(tmp_path):
    events = _sample_events()
    path = tmp_path / "sample.data"
    events.to_integer_encoding().to_file(path)

    vectors, _, _, settings = IntegerEncodedEventSequence.one_hot_from_file(
        path, as_numpy_array=True
    )
    assert vectors.shape == (6, 362)
    assert np.array_equal(np.argmax(vectors, axis=1), events.to_ids())
