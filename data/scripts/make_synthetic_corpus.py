"""Generate a synthetic tonal MIDI corpus for end-to-end training validation.

The MAESTRO / piano-e-competition corpus needs network access
(data/scripts/download_piano_ecomp.py); this script provides an offline
stand-in with real statistical structure for the model to learn: diatonic
melodies (random walk over scale degrees with cadence bias), block chords on
a bar grid, phrase-level velocity dynamics, and occasional sustain pedal.

Usage: python data/scripts/make_synthetic_corpus.py OUT_DIR [--files N]
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from composer_tpu.midi.events import Note, NoteSequence, SustainPeriod

MAJOR = [0, 2, 4, 5, 7, 9, 11]
MINOR = [0, 2, 3, 5, 7, 8, 10]


def make_piece(rng: random.Random) -> NoteSequence:
    scale = rng.choice([MAJOR, MINOR])
    tonic = rng.randint(48, 60)
    beat_ms = rng.choice([300, 375, 450])
    bars = rng.randint(16, 32)
    beats_per_bar = 4

    notes = []
    sustains = []
    degree = rng.randint(0, 6)

    # Chords: tonic / subdominant / dominant walk, one per bar.
    progression = [0, 3, 4, 0]
    for bar in range(bars):
        bar_start = bar * beats_per_bar * beat_ms
        root = progression[bar % len(progression)]
        chord_vel = rng.randint(35, 55)
        for interval in (0, 2, 4):  # triad in scale degrees
            deg = root + interval
            pitch = tonic - 12 + scale[deg % 7] + 12 * (deg // 7)
            notes.append(
                Note(bar_start, bar_start + beats_per_bar * beat_ms - 30,
                     pitch, chord_vel)
            )
        # Sustain pedal on some bars.
        if rng.random() < 0.3:
            sustains.append(
                SustainPeriod(bar_start, bar_start + beats_per_bar * beat_ms)
            )

    # Melody: random walk, cadence pull to the tonic at phrase ends.
    t = 0.0
    total_ms = bars * beats_per_bar * beat_ms
    phrase_len = 4 * beats_per_bar * beat_ms
    base_vel = rng.randint(60, 80)
    while t < total_ms:
        in_phrase = (t % phrase_len) / phrase_len
        if in_phrase > 0.85:
            degree += (0 - degree % 7) // 2  # pull toward tonic
        else:
            degree += rng.choice([-2, -1, -1, 1, 1, 2])
        degree = max(-3, min(13, degree))
        pitch = tonic + 12 + scale[degree % 7] + 12 * (degree // 7)
        pitch = max(21, min(108, pitch))
        dur = rng.choice([beat_ms // 2, beat_ms // 2, beat_ms, beat_ms * 2])
        # Phrase-shaped dynamics with jitter.
        vel = int(base_vel + 20 * (0.5 - abs(in_phrase - 0.5)) + rng.randint(-5, 5))
        notes.append(Note(t, t + dur - 20, pitch, max(20, min(110, vel))))
        t += dur

    return NoteSequence(notes=notes, sustain_periods=sustains)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir", type=Path)
    parser.add_argument("--files", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    args.out_dir.mkdir(parents=True, exist_ok=True)
    rng = random.Random(args.seed)
    for i in range(args.files):
        make_piece(rng).to_midi(args.out_dir / f"piece_{i:04d}.mid")
    print(f"Wrote {args.files} MIDI files to {args.out_dir}")


if __name__ == "__main__":
    main()
