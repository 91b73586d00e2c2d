"""MIDI-like sequence representations and the event-token codec.

This subpackage is the single source of truth for the event vocabulary shared
by the data pipeline and the models (reference: composer/dataset/sequence.py).
"""

from composer_tpu.midi.events import (
    Event,
    EventSequence,
    EventType,
    Note,
    NoteSequence,
    SustainPeriod,
    SustainPeriodEncodeMode,
)
from composer_tpu.midi.vocab import Vocabulary

__all__ = [
    "Event",
    "EventSequence",
    "EventType",
    "Note",
    "NoteSequence",
    "SustainPeriod",
    "SustainPeriodEncodeMode",
    "Vocabulary",
]
