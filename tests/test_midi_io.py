"""Round-trip tests for the dependency-free Standard MIDI File codec."""

import numpy as np

from composer_tpu.midi import Note, NoteSequence, SustainPeriod
from composer_tpu.midi import midi_io


def test_note_sequence_midi_roundtrip(tmp_path):
    sequence = NoteSequence(
        [
            Note(0, 2000, 60, 64),
            Note(500, 1500, 64, 100),
            Note(3000, 4000, 67, 9),
        ],
        [SustainPeriod(1000, 2500)],
    )
    path = tmp_path / "roundtrip.mid"
    sequence.to_midi(str(path))
    loaded = NoteSequence.from_midi(path)

    assert len(loaded.notes) == 3
    for original, parsed in zip(sequence.notes, loaded.notes):
        # MIDI tick resolution at 960 tpq / 120 bpm is ~0.52 ms.
        assert abs(original.start - parsed.start) < 1.0
        assert abs(original.end - parsed.end) < 1.0
        assert original.pitch == parsed.pitch
        assert original.velocity == parsed.velocity

    assert len(loaded.sustain_periods) == 1
    assert abs(loaded.sustain_periods[0].start - 1000) < 1.0
    assert abs(loaded.sustain_periods[0].end - 2500) < 1.0


def test_zero_velocity_note_on_is_note_off(tmp_path):
    # Hand-build a track using note_on(vel=0) as note-off with running status.
    tpq = 480
    body = bytearray()
    body += midi_io._varlen(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
    body += midi_io._varlen(0) + bytes([0x90, 60, 80])
    body += midi_io._varlen(480) + bytes([60, 0])  # running status note-off
    body += midi_io._varlen(0) + bytes([0xFF, 0x2F, 0x00])
    data = (
        b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big")
        + (1).to_bytes(2, "big") + tpq.to_bytes(2, "big")
        + b"MTrk" + len(body).to_bytes(4, "big") + bytes(body)
    )
    path = tmp_path / "vel0.mid"
    path.write_bytes(data)

    sequence = NoteSequence.from_midi(path)
    assert len(sequence.notes) == 1
    note = sequence.notes[0]
    assert note.pitch == 60 and note.velocity == 80
    assert abs(note.start - 0) < 1e-6
    assert abs(note.end - 500.0) < 1e-6  # 480 ticks at 120bpm = 0.5 s


def test_tempo_changes_affect_timing(tmp_path):
    # 480 ticks at 120 bpm then 480 ticks at 60 bpm -> note spans 0.5s + 1.0s.
    tpq = 480
    body = bytearray()
    body += midi_io._varlen(0) + bytes([0xFF, 0x51, 0x03]) + (500000).to_bytes(3, "big")
    body += midi_io._varlen(0) + bytes([0x90, 60, 80])
    body += midi_io._varlen(480) + bytes([0xFF, 0x51, 0x03]) + (1000000).to_bytes(3, "big")
    body += midi_io._varlen(480) + bytes([0x80, 60, 64])
    body += midi_io._varlen(0) + bytes([0xFF, 0x2F, 0x00])
    data = (
        b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big")
        + (1).to_bytes(2, "big") + tpq.to_bytes(2, "big")
        + b"MTrk" + len(body).to_bytes(4, "big") + bytes(body)
    )
    path = tmp_path / "tempo.mid"
    path.write_bytes(data)

    sequence = NoteSequence.from_midi(path)
    assert len(sequence.notes) == 1
    assert abs(sequence.notes[0].end - 1500.0) < 1e-6


def test_drums_ignored(tmp_path):
    drum = midi_io.MidiInstrument(program=0, is_drum=True)
    drum.notes.append(midi_io.MidiNote(0.0, 1.0, 36, 100))
    piano = midi_io.MidiInstrument(program=0, is_drum=False)
    piano.notes.append(midi_io.MidiNote(0.0, 1.0, 60, 100))
    path = tmp_path / "drums.mid"
    midi_io.write_midi(midi_io.MidiFile(instruments=[drum, piano]), path)

    sequence = NoteSequence.from_midi(path)
    assert [n.pitch for n in sequence.notes] == [60]

    with_drums = NoteSequence.from_midi(path, ignore_drums=False)
    assert sorted(n.pitch for n in with_drums.notes) == [36, 60]


def test_codec_end_to_end_through_midi(tmp_path):
    """MIDI -> NoteSequence -> events -> NoteSequence -> MIDI fixpoint."""
    sequence = NoteSequence(
        [Note(0, 2000, 2, 64), Note(3000, 4000, 1, 9)]
    )
    first = tmp_path / "first.mid"
    sequence.to_midi(str(first))

    loaded = NoteSequence.from_midi(first).trim_start()
    events = loaded.to_event_sequence(10, 100, 4)
    decoded = events.to_note_sequence()

    second = tmp_path / "second.mid"
    decoded.to_midi(str(second))
    reloaded = NoteSequence.from_midi(second)

    # After one pass through the (lossy) codec the representation is a
    # fixpoint: re-encoding must be exact.
    reevents = reloaded.to_event_sequence(10, 100, 4)
    assert [(e.type, e.value) for e in reevents.events] == [
        (e.type, e.value) for e in events.events
    ]
