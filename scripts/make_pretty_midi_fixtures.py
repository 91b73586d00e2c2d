#!/usr/bin/env python
"""Generates cross-library MIDI fixtures with pretty_midi — run OUT OF BAND.

pretty_midi (the reference's MIDI backend, reference sequence.py:594-680) is
not installable in the build environment, so cross-library byte evidence for
composer_tpu/midi/midi_io.py must come from outside: run this script anywhere
`pip install pretty_midi` works, then commit the output directory
(tests/fixtures/pretty_midi/) into the repo. tests/test_pretty_midi_compat.py
auto-activates on those fixtures (and directly, without fixtures, wherever
pretty_midi itself imports).

Each fixture is a .mid written by pretty_midi plus a .json expectation
(the note/sustain content in milliseconds) that our parser must reproduce.

Usage:  python scripts/make_pretty_midi_fixtures.py [OUTPUT_DIR]
"""

import json
import random
import sys
from pathlib import Path

import pretty_midi


def _case_reference():
    """The deterministic content MIRRORED in tests/test_pretty_midi_compat.py
    (keep in sync with _reference_sequence there)."""
    notes = [
        (0.0, 480.0, 60, 80),
        (120.0, 360.0, 64, 96),
        (500.0, 2000.0, 72, 127),
        (500.0, 750.0, 36, 20),
        (2000.0, 2001.0, 127, 1),
    ]
    sustains = [(100.0, 600.0), (1500.0, 2200.0)]
    return notes, sustains


def _case_random(seed, count=80):
    rng = random.Random(seed)
    notes, t = [], 0.0
    for _ in range(count):
        duration = rng.uniform(20.0, 1500.0)
        notes.append((t, t + duration, rng.randrange(128), rng.randrange(1, 128)))
        t += rng.uniform(0.0, 400.0)
    sustains, s = [], rng.uniform(0.0, 200.0)
    while s < t:
        end = s + rng.uniform(100.0, 1200.0)
        sustains.append((s, end))
        s = end + rng.uniform(50.0, 800.0)
    return notes, sustains


def write_fixture(name, notes, sustains, outdir: Path):
    midi = pretty_midi.PrettyMIDI()
    instrument = pretty_midi.Instrument(program=0)
    for start, end, pitch, velocity in notes:
        instrument.notes.append(
            pretty_midi.Note(
                velocity=velocity, pitch=pitch,
                start=start / 1000.0, end=end / 1000.0,
            )
        )
    for start, end in sustains:
        instrument.control_changes.append(
            pretty_midi.ControlChange(number=64, value=100, time=start / 1000.0)
        )
        instrument.control_changes.append(
            pretty_midi.ControlChange(number=64, value=0, time=end / 1000.0)
        )
    midi.instruments.append(instrument)
    midi.write(str(outdir / f"{name}.mid"))

    # Expectation = what pretty_midi itself reads back (quantization to the
    # MIDI tick grid happens at write time, so round-trip through the file).
    parsed = pretty_midi.PrettyMIDI(str(outdir / f"{name}.mid"))
    expectation = {"notes": [], "sustains": []}
    for inst in parsed.instruments:
        if inst.is_drum:
            continue
        for n in sorted(inst.notes, key=lambda n: (n.start, n.pitch, n.end)):
            expectation["notes"].append({
                "start_ms": n.start * 1000.0, "end_ms": n.end * 1000.0,
                "pitch": n.pitch, "velocity": n.velocity,
            })
        open_start = None
        for cc in sorted(inst.control_changes, key=lambda c: c.time):
            if cc.number != 64:
                continue
            if cc.value >= 64 and open_start is None:
                open_start = cc.time * 1000.0
            elif cc.value < 64 and open_start is not None:
                expectation["sustains"].append(
                    {"start_ms": open_start, "end_ms": cc.time * 1000.0}
                )
                open_start = None
    (outdir / f"{name}.json").write_text(json.dumps(expectation, indent=1))
    print(f"wrote {outdir / name}.mid (+.json): "
          f"{len(expectation['notes'])} notes, "
          f"{len(expectation['sustains'])} sustains")


def main():
    outdir = Path(
        sys.argv[1] if len(sys.argv) > 1
        else Path(__file__).parent.parent / "tests" / "fixtures" / "pretty_midi"
    )
    outdir.mkdir(parents=True, exist_ok=True)
    notes, sustains = _case_reference()
    write_fixture("reference_content", notes, sustains, outdir)
    for seed in (1, 2, 3):
        notes, sustains = _case_random(seed)
        write_fixture(f"random_{seed}", notes, sustains, outdir)
    print(f"Done. Commit {outdir} to activate tests/test_pretty_midi_compat.py"
          " fixture coverage.")


if __name__ == "__main__":
    main()
