"""Differential fuzz: our codec vs the ACTUAL reference encoder.

Runs randomized NoteSequences — equal-timestamp collisions, sub-millisecond
rounding edges, gaps longer than max_time_steps, same-pitch retriggers,
zero-duration notes, overlapping sustain periods, all three sustain modes —
through the reference's ``NoteSequence.to_event_sequence`` /
``to_integer_encoding`` / ``event_to_id`` (reference sequence.py:383-592,
1465-1589) and through both of our encoders (the object encoder and the
vectorized fast_encode twin), asserting identical event streams, identical
integer ids, and byte-identical ``.data`` files.

Known, documented divergence (composer_tpu/midi/events.py:10-16): the
reference's clean pass can pop the same removal index twice and crash on
same-pitch ON/OFF/ON runs at equal timestamps; cases where the reference
itself raises are counted and skipped (bounded below), since our fixed
behaviour has nothing to diff against.
"""

import numpy as np
import pytest

import tests._reference as _ref  # noqa: F401  (import shims)

from composer.dataset import sequence as ref_sequence

from composer_tpu.midi import (
    Note,
    NoteSequence,
    SustainPeriod,
    SustainPeriodEncodeMode,
)
from composer_tpu.midi.fast_encode import encode_note_sequence
from composer_tpu.midi.serialization import IntegerEncodedEventSequence

REF_MODES = {
    SustainPeriodEncodeMode.NONE: ref_sequence.NoteSequence.SustainPeriodEncodeMode.NONE,
    SustainPeriodEncodeMode.EXTEND: ref_sequence.NoteSequence.SustainPeriodEncodeMode.EXTEND,
    SustainPeriodEncodeMode.EVENTS: ref_sequence.NoteSequence.SustainPeriodEncodeMode.EVENTS,
}


def _random_case(rng):
    """One randomized (notes, sustains, codec params) case, biased toward the
    adversarial regions: grid-aligned collisions, .5ms rounding edges, long
    gaps, same-pitch retriggers, narrow velocity ranges."""
    increment = int(rng.choice([10, 25]))
    max_steps = int(rng.choice([100, 7]))
    bins = int(rng.choice([32, 4]))

    num_notes = int(rng.integers(0, 12))
    num_sustains = int(rng.integers(0, 4))

    # Time generator: mostly grid-aligned (collisions), some arbitrary floats,
    # some exact .5ms (round() tie-breaking), occasionally huge (chunking).
    def some_time():
        style = rng.random()
        if style < 0.45:
            return float(rng.integers(0, 40) * increment)
        if style < 0.65:
            return float(rng.uniform(0, 3000))
        if style < 0.8:
            return float(rng.integers(0, 300)) + 0.5
        return float(rng.integers(0, 4) * (max_steps * increment + rng.integers(0, 500)))

    pitch_pool = [60, 61, 62] if rng.random() < 0.5 else list(range(128))
    velocity_pool = [63, 64, 65] if rng.random() < 0.3 else list(range(128))

    notes = []
    for _ in range(num_notes):
        start = some_time()
        duration = 0.0 if rng.random() < 0.1 else float(rng.uniform(0, 2500))
        notes.append(
            (
                start,
                start + duration,
                int(rng.choice(pitch_pool)),
                int(rng.choice(velocity_pool)),
            )
        )

    sustains = []
    for _ in range(num_sustains):
        start = some_time()
        sustains.append((start, start + float(rng.uniform(1, 3000))))

    mode = [
        SustainPeriodEncodeMode.NONE,
        SustainPeriodEncodeMode.EXTEND,
        SustainPeriodEncodeMode.EVENTS,
    ][int(rng.integers(0, 3))]
    clean = bool(rng.random() < 0.7)
    return notes, sustains, increment, max_steps, bins, mode, clean


def _reference_clean_queue_has_duplicates(stream):
    """Replays the reference's clean-pass index collection (reference
    sequence.py:566-590) on a pre-clean (type, value) stream and reports
    whether its remove queue contains duplicate indices — the condition under
    which the reference pops shifted indices and corrupts (or crashes), and
    our documented fix (composer_tpu/midi/events.py:14-16) legitimately
    diverges."""
    queue = []
    for i in range(len(stream) - 1, -1, -1):
        event_type, value = stream[i]
        if event_type == 3 and value == 0:
            queue.append(i)
        if i - 1 >= 0 and (
            (event_type == 2 and stream[i - 1][0] == 1)
            or (event_type == 1 and stream[i - 1][0] == 2)
        ):
            if value == stream[i - 1][1]:
                queue.append(i)
                queue.append(i - 1)
    return len(queue) != len(set(queue))


def _encode_both(notes, sustains, increment, max_steps, bins, mode, clean, tmp_path):
    """Returns (ref_stream, our_stream, ref_ids, our_ids, ref_bytes, our_bytes)
    or None if the reference encoder crashed (its documented clean-pass bug)."""
    # Fresh reference objects every call: its EXTEND mode mutates notes
    # in place (reference sequence.py:491-514).
    ref_ns = ref_sequence.NoteSequence(
        notes=[ref_sequence.Note(s, e, p, v) for s, e, p, v in notes],
        sustain_periods=[ref_sequence.SustainPeriod(s, e) for s, e in sustains],
    )
    try:
        ref_es = ref_ns.to_event_sequence(
            time_step_increment=increment,
            max_time_steps=max_steps,
            velocity_bins=bins,
            sustain_period_encode_mode=REF_MODES[mode],
            clean=clean,
        )
    except Exception:
        return None

    our_ns = NoteSequence(
        [Note(s, e, p, v) for s, e, p, v in notes],
        [SustainPeriod(s, e) for s, e in sustains],
    )
    our_es = our_ns.to_event_sequence(
        time_step_increment=increment,
        max_time_steps=max_steps,
        velocity_bins=bins,
        sustain_period_encode_mode=mode,
        clean=clean,
    )

    ref_stream = [
        (int(event.type), event.value) for event in ref_es.events
    ]
    our_stream = [(int(event.type), event.value) for event in our_es.events]

    ref_ids = [
        ref_sequence.IntegerEncodedEventSequence.event_to_id(
            event.type, event.value, ref_es.event_ranges, ref_es.event_value_ranges
        )
        for event in ref_es.events
    ]
    our_ids = [
        IntegerEncodedEventSequence.event_to_id(
            event.type, event.value, our_es.event_ranges, our_es.event_value_ranges
        )
        for event in our_es.events
    ]

    ref_file = tmp_path / "ref.data"
    ref_es.to_integer_encoding().to_file(str(ref_file))
    ref_bytes = ref_file.read_bytes()
    our_bytes = IntegerEncodedEventSequence.encode(our_es).to_bytes()

    return ref_stream, our_stream, ref_ids, our_ids, ref_bytes, our_bytes, our_ns


@pytest.mark.parametrize("seed", range(8))
def test_codec_differential_fuzz(seed, tmp_path):
    rng = np.random.default_rng(seed + 1000)
    cases = 150
    ref_crashes = 0
    clean_divergences = 0
    for case in range(cases):
        notes, sustains, increment, max_steps, bins, mode, clean = _random_case(rng)

        # Pre-clean comparison always holds (no reference bug in that path).
        raw = _encode_both(
            notes, sustains, increment, max_steps, bins, mode, False, tmp_path
        )
        if raw is None:
            ref_crashes += 1
            continue
        context = (
            f"seed={seed} case={case} inc={increment} mts={max_steps} "
            f"bins={bins} mode={mode} clean={clean} notes={notes} sus={sustains}"
        )
        compare_clean = clean
        if clean and _reference_clean_queue_has_duplicates(raw[0]):
            # Documented divergence class: the reference's clean would pop
            # shifted indices here. Diff only the pre-clean streams.
            clean_divergences += 1
            compare_clean = False

        if compare_clean:
            result = _encode_both(
                notes, sustains, increment, max_steps, bins, mode, True, tmp_path
            )
            if result is None:
                ref_crashes += 1
                continue
        else:
            result = raw
        ref_stream, our_stream, ref_ids, our_ids, ref_bytes, our_bytes, our_ns = result

        assert our_stream == ref_stream, context
        assert our_ids == ref_ids, context
        assert our_bytes == ref_bytes, context

        # The vectorized encoder must agree with both (same stream).
        fast_types, fast_values = encode_note_sequence(
            our_ns,
            time_step_increment=increment,
            max_time_steps=max_steps,
            velocity_bins=bins,
            sustain_period_encode_mode=mode,
            clean=compare_clean,
        )
        fast_stream = [
            (int(t), None if v == -1 else int(v))
            for t, v in zip(fast_types, fast_values)
        ]
        assert fast_stream == ref_stream, context

    # The reference's clean-pass bug classes should stay corners, not the norm.
    assert ref_crashes < cases * 0.2, f"{ref_crashes}/{cases} reference crashes"
    assert clean_divergences < cases * 0.3, (
        f"{clean_divergences}/{cases} clean-pass divergence-class cases"
    )


def test_codec_golden_edge_cases(tmp_path):
    """Deterministic, hand-picked adversarial cases (each one a regression
    class the random fuzz may or may not hit in a given run)."""
    cases = [
        # Equal-timestamp interleaving of sustain + notes at t=0.
        ([(0, 500, 60, 64), (0, 700, 64, 80)], [(0, 600)], 10, 100, 32,
         SustainPeriodEncodeMode.EVENTS, True),
        # Gap far beyond max_time_steps: chunked TIME_SHIFT emission.
        ([(0, 10, 60, 64), (5000, 5010, 61, 64)], [], 10, 7, 32,
         SustainPeriodEncodeMode.NONE, True),
        # EXTEND with a note ending inside the pedal window and a same-pitch
        # successor (stretch-to-next-note rule, reference sequence.py:491-514).
        ([(0, 100, 60, 64), (400, 900, 60, 70)], [(50, 800)], 10, 100, 32,
         SustainPeriodEncodeMode.EXTEND, True),
        # .5ms rounding ties on the quantisation grid.
        ([(4.5, 125.5, 72, 100)], [], 10, 100, 32,
         SustainPeriodEncodeMode.NONE, True),
        # Zero-duration note, clean=False keeps the degenerate pair.
        ([(100, 100, 60, 64)], [], 10, 100, 32,
         SustainPeriodEncodeMode.NONE, False),
        # Sustain-only sequence.
        ([], [(0, 1000), (1500, 2000)], 10, 100, 4,
         SustainPeriodEncodeMode.EVENTS, True),
        # Velocity bin collisions: same bin => only one VELOCITY event.
        ([(0, 100, 60, 64), (200, 300, 61, 65), (400, 500, 62, 100)], [], 10,
         100, 4, SustainPeriodEncodeMode.NONE, True),
    ]
    for case_index, (notes, sustains, inc, mts, bins, mode, clean) in enumerate(cases):
        result = _encode_both(notes, sustains, inc, mts, bins, mode, clean, tmp_path)
        assert result is not None, f"reference crashed on golden case {case_index}"
        ref_stream, our_stream, ref_ids, our_ids, ref_bytes, our_bytes, _ = result
        assert our_stream == ref_stream, f"case {case_index}"
        assert our_ids == ref_ids, f"case {case_index}"
        assert our_bytes == ref_bytes, f"case {case_index}"
