"""The event-id vocabulary layout.

This is the ABI shared between preprocessed datasets and the models. The layout
(derived at runtime from the codec parameters) is identical to the reference's
(composer/dataset/sequence.py:739-865, 1589-1640) and is pinned by golden tests:

    NOTE_ON    [0, 128)            id = pitch
    NOTE_OFF   [128, 256)          id = 128 + pitch
    VELOCITY   [256, 256+B)        id = 256 + bin
    TIME_SHIFT [256+B, 256+B+M)    id = 256 + B + (steps - 1)   (steps in [1, M])
    SUSTAIN_ON  {256+B+M}
    SUSTAIN_OFF {256+B+M+1}

where B = velocity_bins and M = max_time_steps. Default config (B=32, M=100)
gives vocab_size = 390.

Unlike the reference — which recomputes OrderedDicts of ``range`` objects per
event — this module precomputes flat integer offsets and exposes *vectorized*
NumPy converters, which is what makes the tokenizer throughput target
attainable without per-event Python dispatch.
"""

from __future__ import annotations

from dataclasses import dataclass
from collections import OrderedDict
from functools import lru_cache

import numpy as np

from composer_tpu.midi.events import Event, EventType
from composer_tpu.exceptions import EncodingError

_NUM_PITCHES = 128


@dataclass(frozen=True)
class Vocabulary:
    """Precomputed vocabulary layout for a codec parameterisation."""

    time_step_increment: int
    max_time_steps: int
    velocity_bins: int

    # Derived offsets (computed in __post_init__).
    note_on_offset: int = 0
    note_off_offset: int = 0
    velocity_offset: int = 0
    time_shift_offset: int = 0
    sustain_on_id: int = 0
    sustain_off_id: int = 0
    size: int = 0

    def __post_init__(self):
        object.__setattr__(self, "note_on_offset", 0)
        object.__setattr__(self, "note_off_offset", _NUM_PITCHES)
        object.__setattr__(self, "velocity_offset", 2 * _NUM_PITCHES)
        object.__setattr__(self, "time_shift_offset", 2 * _NUM_PITCHES + self.velocity_bins)
        object.__setattr__(
            self, "sustain_on_id", self.time_shift_offset + self.max_time_steps
        )
        object.__setattr__(self, "sustain_off_id", self.sustain_on_id + 1)
        object.__setattr__(self, "size", self.sustain_off_id + 1)

    # ------------------------------------------------------------------ scalar
    def event_to_id(self, event_type: EventType, value) -> int:
        """Single-event encoder (see module docstring for the layout)."""
        if event_type == EventType.NOTE_ON:
            return self.note_on_offset + value
        if event_type == EventType.NOTE_OFF:
            return self.note_off_offset + value
        if event_type == EventType.VELOCITY:
            return self.velocity_offset + value
        if event_type == EventType.TIME_SHIFT:
            return self.time_shift_offset + (value - 1)
        if event_type == EventType.SUSTAIN_ON:
            return self.sustain_on_id
        if event_type == EventType.SUSTAIN_OFF:
            return self.sustain_off_id
        raise EncodingError(f"Unknown event type: {event_type!r}")

    def id_to_event(self, event_id: int) -> Event:
        if 0 <= event_id < self.note_off_offset:
            return Event(EventType.NOTE_ON, event_id)
        if event_id < self.velocity_offset:
            return Event(EventType.NOTE_OFF, event_id - self.note_off_offset)
        if event_id < self.time_shift_offset:
            return Event(EventType.VELOCITY, event_id - self.velocity_offset)
        if event_id < self.sustain_on_id:
            return Event(EventType.TIME_SHIFT, event_id - self.time_shift_offset + 1)
        if event_id == self.sustain_on_id:
            return Event(EventType.SUSTAIN_ON, None)
        if event_id == self.sustain_off_id:
            return Event(EventType.SUSTAIN_OFF, None)
        raise EncodingError(f"Event id {event_id} outside vocabulary of size {self.size}")

    # -------------------------------------------------------------- vectorized
    def encode_pairs(self, types: np.ndarray, values: np.ndarray) -> np.ndarray:
        """Vectorized (type, value) int arrays -> id array.

        ``values`` uses -1 for None (the on-disk NONE_VALUE sentinel,
        reference sequence.py:125).
        """
        types = np.asarray(types, dtype=np.int64)
        values = np.asarray(values, dtype=np.int64)
        ids = np.empty_like(types)

        is_on = types == int(EventType.NOTE_ON)
        is_off = types == int(EventType.NOTE_OFF)
        is_vel = types == int(EventType.VELOCITY)
        is_ts = types == int(EventType.TIME_SHIFT)
        is_son = types == int(EventType.SUSTAIN_ON)
        is_soff = types == int(EventType.SUSTAIN_OFF)

        ids[is_on] = values[is_on]
        ids[is_off] = self.note_off_offset + values[is_off]
        ids[is_vel] = self.velocity_offset + values[is_vel]
        ids[is_ts] = self.time_shift_offset + values[is_ts] - 1
        ids[is_son] = self.sustain_on_id
        ids[is_soff] = self.sustain_off_id

        recognised = is_on | is_off | is_vel | is_ts | is_son | is_soff
        if not recognised.all():
            bad = types[~recognised][:5]
            raise EncodingError(f"Unknown event types in stream: {bad.tolist()}")
        return ids

    def decode_ids(self, ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized id array -> (type, value) int arrays (value -1 == None)."""
        ids = np.asarray(ids, dtype=np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= self.size):
            raise EncodingError(
                f"Event ids outside vocabulary [0, {self.size}): "
                f"min={ids.min()}, max={ids.max()}"
            )
        types = np.empty_like(ids)
        values = np.full_like(ids, -1)

        region_on = ids < self.note_off_offset
        region_off = (~region_on) & (ids < self.velocity_offset)
        region_vel = (ids >= self.velocity_offset) & (ids < self.time_shift_offset)
        region_ts = (ids >= self.time_shift_offset) & (ids < self.sustain_on_id)
        region_son = ids == self.sustain_on_id
        region_soff = ids == self.sustain_off_id

        types[region_on] = int(EventType.NOTE_ON)
        values[region_on] = ids[region_on]
        types[region_off] = int(EventType.NOTE_OFF)
        values[region_off] = ids[region_off] - self.note_off_offset
        types[region_vel] = int(EventType.VELOCITY)
        values[region_vel] = ids[region_vel] - self.velocity_offset
        types[region_ts] = int(EventType.TIME_SHIFT)
        values[region_ts] = ids[region_ts] - self.time_shift_offset + 1
        types[region_son] = int(EventType.SUSTAIN_ON)
        types[region_soff] = int(EventType.SUSTAIN_OFF)
        return types, values

    # ------------------------------------------------- reference-compat views
    @property
    def event_value_ranges(self) -> "OrderedDict[EventType, range | None]":
        """OrderedDict view matching the reference API (sequence.py:739-766)."""
        return OrderedDict(
            [
                (EventType.NOTE_ON, range(0, _NUM_PITCHES)),
                (EventType.NOTE_OFF, range(0, _NUM_PITCHES)),
                (EventType.VELOCITY, range(0, self.velocity_bins)),
                (EventType.TIME_SHIFT, range(1, self.max_time_steps + 1)),
                (EventType.SUSTAIN_ON, None),
                (EventType.SUSTAIN_OFF, None),
            ]
        )

    @property
    def event_dimensions(self) -> "OrderedDict[EventType, int]":
        dims = OrderedDict()
        for event_type, value_range in self.event_value_ranges.items():
            dims[event_type] = 0 if value_range is None else len(value_range)
        return dims

    @property
    def event_ranges(self) -> "OrderedDict[EventType, range]":
        """Packed id ranges per event type (zero-dim events get one slot)."""
        ranges = OrderedDict()
        offset = 0
        for event_type, dim in self.event_dimensions.items():
            width = max(dim, 1)
            ranges[event_type] = range(offset, offset + width)
            offset += width
        return ranges


@lru_cache(maxsize=32)
def get_vocabulary(
    time_step_increment: int = 10, max_time_steps: int = 100, velocity_bins: int = 32
) -> Vocabulary:
    return Vocabulary(time_step_increment, max_time_steps, velocity_bins)


def vocabulary_from_config(config) -> Vocabulary:
    return get_vocabulary(
        int(config.dataset.time_step_increment),
        int(config.dataset.max_time_steps),
        int(config.dataset.velocity_bins),
    )
