"""Fixed-seed bit-equivalence (BASELINE.md determinism row).

The full pipeline — prompt encoding, prefill, sampling, decoding, MIDI
writing — must be byte-identical across runs under a fixed seed. The pinned
checksums guard against silent cross-version drift (jax RNG, codec, or MIDI
writer changes will trip this intentionally).
"""

import hashlib

import jax
import numpy as np
import pytest

from composer_tpu.midi import EventSequence, Note, NoteSequence
from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.train.generate import generate_ids


@pytest.fixture(scope="module")
def pipeline_output(tmp_path_factory):
    config = TransformerConfig(
        vocab_size=390, embed_dim=32, window_size=64, num_layers=2,
        num_heads=4, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.2,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(42), 1, 8)

    prompt_notes = NoteSequence(
        [Note(i * 250.0, i * 250.0 + 200.0, 60 + i, 64) for i in range(4)]
    )
    prompt_ids = prompt_notes.to_event_sequence(10, 100, 32).to_ids()[:8]

    ids = generate_ids(
        model, ModelType.TRANSFORMER, params, prompt_ids.astype(np.int32),
        length=64, temperature=1.0, seed=123, engine="xla",
    )

    midi_path = tmp_path_factory.mktemp("determinism") / "out.mid"
    EventSequence.from_ids(ids, 10, 100, 32).to_note_sequence().to_midi(str(midi_path))
    return np.asarray(ids), midi_path.read_bytes()


def test_generation_reproducible_within_session(pipeline_output):
    ids, midi_bytes = pipeline_output
    config = TransformerConfig(
        vocab_size=390, embed_dim=32, window_size=64, num_layers=2,
        num_heads=4, attention_dropout_rate=0.0, residual_dropout_rate=0.0,
        initializer_stddev=0.2,
    )
    model = Transformer(config)
    params = model.init_params(jax.random.PRNGKey(42), 1, 8)
    again = generate_ids(
        model, ModelType.TRANSFORMER, params, ids[:8].astype(np.int32),
        length=64, temperature=1.0, seed=123, engine="xla",
    )
    np.testing.assert_array_equal(np.asarray(again), ids)


def test_pinned_checksums(pipeline_output):
    """Cross-version golden: ids and MIDI bytes under seed (42 init, 123 gen).

    If this trips after an intentional change (new jax RNG semantics, codec
    change), re-pin the values and document why in the commit message.
    """
    ids, midi_bytes = pipeline_output
    id_digest = hashlib.sha256(ids.tobytes()).hexdigest()[:16]
    midi_digest = hashlib.sha256(midi_bytes).hexdigest()[:16]
    assert id_digest == EXPECTED_ID_DIGEST, id_digest
    assert midi_digest == EXPECTED_MIDI_DIGEST, midi_digest


# Pinned on CPU (x86-64, jax 0.9.0, float32 highest-precision matmuls).
EXPECTED_ID_DIGEST = "fc2d87b4d909d457"
EXPECTED_MIDI_DIGEST = "0aaff99a8ff31582"
