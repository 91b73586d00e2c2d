"""Native (C++) accelerator tests — skipped when g++ is unavailable."""

import numpy as np
import pytest

native = pytest.importorskip("composer_tpu.native.loader")

from composer_tpu.data.tfrecord import _CRC_TABLE_LIST  # noqa: E402
from composer_tpu.midi.vocab import get_vocabulary  # noqa: E402


def _python_crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ _CRC_TABLE_LIST[(crc ^ byte) & 0xFF]
    return crc ^ 0xFFFFFFFF


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA.
    assert native.crc32c(b"\x00" * 32) == 0x8A9136AA
    # "123456789" -> 0xE3069283.
    assert native.crc32c(b"123456789") == 0xE3069283


def test_crc32c_matches_python(rng):
    for size in [0, 1, 7, 8, 9, 63, 1024, 4097]:
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert native.crc32c(data) == _python_crc32c(data)


def test_id_codec_matches_vocabulary(rng):
    vocab = get_vocabulary(10, 100, 32)
    ids = rng.integers(0, vocab.size, 1000).astype(np.int32)

    pairs = native.encode_event_pairs(ids, 32, 100)
    types, values = vocab.decode_ids(ids)
    np.testing.assert_array_equal(pairs[:, 0], types)
    # None values are -1 in both representations.
    np.testing.assert_array_equal(pairs[:, 1], values)

    back = native.decode_event_ids(pairs, 32, 100)
    np.testing.assert_array_equal(back, ids)


def test_decode_rejects_bad_type():
    bad = np.array([[99, 0]], dtype=np.int16)
    with pytest.raises(ValueError):
        native.decode_event_ids(bad, 32, 100)


# --------------------------------------------------------------- SMF parser

def _varlen(value):
    chunks = [value & 0x7F]
    value >>= 7
    while value:
        chunks.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(chunks))


def _track(events):
    """events: list of (delta, message bytes). Appends end-of-track."""
    body = b"".join(_varlen(d) + m for d, m in events)
    body += _varlen(0) + bytes([0xFF, 0x2F, 0x00])
    return b"MTrk" + len(body).to_bytes(4, "big") + body


def _smf(tracks, division=480, fmt=1):
    header = b"MThd" + (6).to_bytes(4, "big") + fmt.to_bytes(2, "big")
    header += len(tracks).to_bytes(2, "big") + division.to_bytes(2, "big")
    return header + b"".join(tracks)


def _gnarly_smf():
    """Tempo changes mid-stream, running status, vel-0 note-offs, program
    changes mid-track, a zero-length note, multiple channels/tracks."""
    tempo = lambda us: bytes([0xFF, 0x51, 0x03]) + us.to_bytes(3, "big")
    t0 = _track([
        (0, tempo(500000)),
        (0, bytes([0x90, 60, 100])),          # ch0 note on
        (240, bytes([62, 90])),               # running status: another on
        (240, bytes([60, 0])),                # running status: vel-0 off
        (0, tempo(250000)),                   # tempo doubles mid-note
        (480, bytes([0x80, 62, 64])),         # explicit off
        (0, bytes([0xB0, 64, 100])),          # sustain down
        (480, bytes([0xB0, 64, 20])),         # sustain up
    ])
    t1 = _track([
        (0, bytes([0xC1, 42])),               # ch1 program 42
        (10, bytes([0x91, 70, 80])),
        (0, bytes([0x91, 70, 70])),           # stacked same-pitch on
        (0, bytes([0x81, 70, 0])),            # off at SAME tick: stays open
        (100, bytes([0x81, 70, 0])),          # closes both stacked notes
        (0, bytes([0xC1, 7])),                # program change -> new instrument
        (50, bytes([0x91, 71, 60])),
        (50, bytes([0x81, 71, 0])),
        (0, bytes([0x99, 36, 90])),           # drum channel note
        (60, bytes([0x89, 36, 0])),
    ])
    return _smf([t0, t1])


def test_native_midi_parse_matches_python(tmp_path):
    """The C++ SMF parser is array-for-array identical to the Python one on a
    file exercising tempo maps, running status, stacked/zero-length notes,
    program changes, and drums."""
    from composer_tpu.midi import midi_io
    from composer_tpu.native import parse_midi_arrays

    assert parse_midi_arrays is not None
    data = _gnarly_smf()
    parsed_py = midi_io._parsed_arrays_from_midifile(midi_io.parse_midi(data))
    parsed_c = parse_midi_arrays(data)
    assert parsed_c is not None
    assert set(parsed_py) == set(parsed_c)
    for key in parsed_py:
        np.testing.assert_array_equal(parsed_py[key], parsed_c[key], err_msg=key)
    # Sanity on the semantics themselves, not just agreement: the stacked
    # same-pitch notes both closed at the later off, the tempo map compressed
    # the second half of the first note pair, and the drum flag is set.
    assert parsed_c["note_counts"].tolist() == [2, 2, 1, 1]
    assert parsed_c["is_drum"].tolist() == [0, 0, 0, 1]
    assert parsed_c["program"].tolist() == [0, 42, 7, 0]


def test_native_midi_parse_randomized_roundtrip(rng, tmp_path):
    """Differential fuzz: random NoteSequences written by our own writer parse
    identically through both parsers."""
    from composer_tpu.midi import midi_io
    from composer_tpu.midi.events import Note, NoteSequence, SustainPeriod
    from composer_tpu.native import parse_midi_arrays

    for _ in range(5):
        count = int(rng.integers(1, 120))
        t, notes = 0.0, []
        for _ in range(count):
            duration = float(rng.integers(10, 900))
            notes.append(
                Note(t, t + duration, int(rng.integers(0, 128)), int(rng.integers(1, 128)))
            )
            t += float(rng.integers(0, 400))
        periods = [SustainPeriod(0.0, max(t / 2, 1.0)), SustainPeriod(t / 2 + 10, t + 20)]
        sequence = NoteSequence(notes, periods)
        data_path = tmp_path / "native_fuzz.mid"
        sequence.to_midi(str(data_path))
        raw = data_path.read_bytes()
        parsed_py = midi_io._parsed_arrays_from_midifile(midi_io.parse_midi(raw))
        parsed_c = parse_midi_arrays(raw)
        for key in parsed_py:
            np.testing.assert_array_equal(parsed_py[key], parsed_c[key], err_msg=key)


def test_native_midi_parse_rejects_garbage():
    from composer_tpu.native import parse_midi_arrays

    assert parse_midi_arrays(b"not a midi file") is None
    assert parse_midi_arrays(b"") is None


def test_read_note_arrays_matches_note_sequence(tmp_path):
    """read_note_arrays (the hot path) and read_note_sequence agree."""
    from composer_tpu.midi import midi_io

    path = tmp_path / "g.mid"
    path.write_bytes(_gnarly_smf())
    starts, ends, pitches, velocities, sus_s, sus_e = midi_io.read_note_arrays(path)
    sequence = midi_io.read_note_sequence(path)
    assert len(starts) == len(sequence.notes)
    np.testing.assert_allclose(sorted(starts), [n.start for n in sequence.notes])
    assert len(sus_s) == len(sequence.sustain_periods)
    # Drums were excluded in both.
    assert 36 not in pitches.tolist()
