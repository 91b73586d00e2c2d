#!/usr/bin/env python
"""Hand-authored third-party SMF byte fixtures (VERDICT r4 item 4).

pretty_midi is not installable in the build environment, so the
pretty_midi-generated fixture half of tests/test_pretty_midi_compat.py
never activates there. These fixtures close the gap from the other side:
each .mid below is constructed BYTE BY BYTE from the Standard MIDI File
specification (no MIDI library — ours or anyone's — touches the bytes),
and each .json expectation is HAND-COMPUTED from the spec's timing rules
in the comments. They exercise exactly the wire-format surface a
pretty_midi-written file would: running status, format 0 and format 1,
mid-track tempo changes, SMPTE division, velocity-0 note-offs, the CC64
64/63 boundary with a dangling release, overlapping same-pitch notes, and
the drum channel (parity surface: reference sequence.py:594-680).

Deterministic: re-running reproduces the committed bytes exactly.

    python scripts/make_handauthored_smf_fixtures.py [OUTPUT_DIR]
"""

import json
import struct
import sys
from pathlib import Path


def vlq(value: int) -> bytes:
    """SMF variable-length quantity."""
    out = [value & 0x7F]
    value >>= 7
    while value:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    return bytes(reversed(out))


def header(fmt: int, ntrks: int, division: int) -> bytes:
    return b"MThd" + struct.pack(">IHHH", 6, fmt, ntrks, division)


def track(*events) -> bytes:
    """events: (delta_ticks, message bytes); end-of-track is appended."""
    body = b"".join(vlq(delta) + bytes(msg) for delta, msg in events)
    body += vlq(0) + bytes([0xFF, 0x2F, 0x00])
    return b"MTrk" + struct.pack(">I", len(body)) + body


TEMPO_120 = (0xFF, 0x51, 0x03, 0x07, 0xA1, 0x20)  # 500000 us/qn = 120 bpm
TEMPO_240 = (0xFF, 0x51, 0x03, 0x03, 0xD0, 0x90)  # 250000 us/qn = 240 bpm


def note(start_ms, end_ms, pitch, velocity):
    return {"start_ms": float(start_ms), "end_ms": float(end_ms),
            "pitch": pitch, "velocity": velocity}


def sustain(start_ms, end_ms):
    return {"start_ms": float(start_ms), "end_ms": float(end_ms)}


def fixtures():
    # All tick arithmetic below: tpq=480 at 500000 us/qn -> one tick is
    # 500000/480 us, so 480 ticks = 500 ms exactly.
    out = {}

    # 1. Format 0, running status, velocity-0 note-offs. After the 0x90
    #    status byte every later message reuses it (bare data bytes), and
    #    "note-on velocity 0" must read as note-off.
    out["hand_type0_running_status"] = (
        header(0, 1, 480) + track(
            (0, TEMPO_120),
            (0, (0xC0, 0x00)),             # program 0, channel 0
            (0, (0x90, 60, 100)),          # C4 on, vel 100, tick 0
            (480, (62, 64)),               # running status: D4 on vel 64, tick 480
            (0, (60, 0)),                  # running status: C4 vel 0 = OFF, tick 480
            (480, (62, 0)),                # running status: D4 OFF, tick 960
        ),
        {
            # ticks 0/480/960 -> 0/500/1000 ms.
            "notes": [note(0, 500, 60, 100), note(500, 1000, 62, 64)],
            "sustains": [],
        },
    )

    # 2. Format 1: tempo in track 0, notes in tracks 1 and 2 on different
    #    channels/programs; content merges across tracks.
    out["hand_type1_two_tracks"] = (
        header(1, 3, 480)
        + track((0, TEMPO_120))
        + track(
            (0, (0xC0, 5)),                # channel 0, program 5
            (0, (0x90, 64, 80)),           # E4 on, tick 0
            (480, (0x80, 64, 64)),         # E4 off, tick 480
        )
        + track(
            (0, (0xC1, 24)),               # channel 1, program 24
            (240, (0x91, 48, 60)),         # C2 on, tick 240
            (480, (0x81, 48, 64)),         # C2 off, tick 720
        ),
        {
            # ticks 0/240/480/720 -> 0/250/500/750 ms.
            "notes": [note(0, 500, 64, 80), note(250, 750, 48, 60)],
            "sustains": [],
        },
    )

    # 3. Mid-track tempo change: 120 bpm for ticks [0, 480), then 240 bpm.
    #    tick 480 = 500 ms; ticks beyond advance at 250000/480 us/tick, so
    #    480 further ticks = 250 ms: tick 960 = 750 ms, tick 1440 = 1000 ms.
    out["hand_mid_track_tempo_change"] = (
        header(0, 1, 480) + track(
            (0, TEMPO_120),
            (0, (0x90, 69, 112)),          # A4 on, tick 0
            (480, TEMPO_240),              # tempo change at tick 480
            (480, (0x80, 69, 64)),         # A4 off, tick 960 = 750 ms
            (0, (0x90, 71, 50)),           # B4 on, tick 960
            (480, (0x80, 71, 64)),         # B4 off, tick 1440 = 1000 ms
        ),
        {
            "notes": [note(0, 750, 69, 112), note(750, 1000, 71, 50)],
            "sustains": [],
        },
    )

    # 4. SMPTE division: high byte 0xE7 = -25 (25 fps), low byte 40 ticks
    #    per frame -> 1000 ticks/second, so tick == millisecond. Tempo
    #    meta events are irrelevant under SMPTE timing.
    out["hand_smpte_division"] = (
        header(0, 1, 0xE728) + track(
            (0, (0xC0, 0x00)),
            (0, (0x90, 60, 127)),          # tick 0 = 0 ms
            (500, (0x80, 60, 64)),         # tick 500 = 500 ms
            (100, (0x90, 72, 33)),         # tick 600 = 600 ms
            (650, (0x80, 72, 64)),         # tick 1250 = 1250 ms
        ),
        {
            "notes": [note(0, 500, 60, 127), note(600, 1250, 72, 33)],
            "sustains": [],
        },
    )

    # 5. CC64 at the 64/63 boundary + dangling release. Pedal-down is
    #    value >= 64, so 64 opens and 63 closes; a release with no open
    #    press extends the PREVIOUS period (reference sequence.py:675-678).
    out["hand_cc64_boundary"] = (
        header(0, 1, 480) + track(
            (0, TEMPO_120),
            (0, (0xB0, 64, 64)),           # CC64=64: ON at tick 0 (boundary)
            (0, (0x90, 60, 80)),           # C4 on, tick 0
            (480, (0xB0, 64, 63)),         # CC64=63: OFF at tick 480 (boundary)
            (480, (0xB0, 64, 100)),        # ON at tick 960
            (480, (0xB0, 64, 0)),          # OFF at tick 1440
            (480, (0x80, 60, 64)),         # C4 off, tick 1920
            (0, (0xB0, 64, 20)),           # dangling release at tick 1920:
                                           # extends the 1000-1500 period
        ),
        {
            "notes": [note(0, 2000, 60, 80)],
            # ticks 0/480 -> period [0, 500); ticks 960/1440 -> [1000,
            # 1500), then the dangling release moves its end to 2000.
            "sustains": [sustain(0, 500), sustain(1000, 2000)],
        },
    )

    # 6. Overlapping same-pitch notes: per pretty_midi semantics one
    #    note-off ends EVERY open note of that pitch (both C4s end at tick
    #    480), and an off at the exact on-tick leaves the note open
    #    (zero-length guard) for a later off to close.
    out["hand_overlapping_same_pitch"] = (
        header(0, 1, 480) + track(
            (0, TEMPO_120),
            (0, (0x90, 60, 96)),           # C4 #1 on, tick 0
            (240, (0x90, 60, 64)),         # C4 #2 on, tick 240
            (240, (0x80, 60, 64)),         # off at tick 480: ends BOTH
            (240, (0x80, 60, 64)),         # off at tick 720: nothing open
            (240, (0x90, 64, 80)),         # E4 on, tick 960
            (0, (0x80, 64, 64)),           # off at the same tick: stays open
            (240, (0x80, 64, 64)),         # off at tick 1200 closes it
        ),
        {
            "notes": [
                note(0, 500, 60, 96),
                note(250, 500, 60, 64),
                note(1000, 1250, 64, 80),
            ],
            "sustains": [],
        },
    )

    # 7. Channel 10 (index 9) is drums: its notes are excluded from the
    #    NoteSequence (reference sequence.py:640-643).
    out["hand_drum_channel_skipped"] = (
        header(0, 1, 480) + track(
            (0, TEMPO_120),
            (0, (0x99, 36, 100)),          # kick on the drum channel
            (0, (0x90, 60, 80)),           # C4 on channel 0
            (480, (0x89, 36, 64)),
            (0, (0x80, 60, 64)),
        ),
        {
            "notes": [note(0, 500, 60, 80)],
            "sustains": [],
        },
    )

    return out


def main():
    outdir = Path(
        sys.argv[1] if len(sys.argv) > 1
        else Path(__file__).parent.parent / "tests" / "fixtures" / "pretty_midi"
    )
    outdir.mkdir(parents=True, exist_ok=True)
    for name, (data, expectation) in fixtures().items():
        (outdir / f"{name}.mid").write_bytes(data)
        (outdir / f"{name}.json").write_text(json.dumps(expectation, indent=1))
        print(f"wrote {name}.mid ({len(data)} bytes): "
              f"{len(expectation['notes'])} notes, "
              f"{len(expectation['sustains'])} sustains")


if __name__ == "__main__":
    main()
