"""Lazy build + ctypes bindings for the native host-path accelerators.

The shared library is compiled once with g++ on first use and cached next to
the source; every entry point has a pure-Python/NumPy fallback so the
framework works without a compiler (callers import through
``composer_tpu.native`` which degrades gracefully).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SOURCE = Path(__file__).parent / "fastcodec.cpp"
_LIBRARY = Path(__file__).parent / "libfastcodec.so"


def _build_library() -> Path:
    if _LIBRARY.exists() and _LIBRARY.stat().st_mtime >= _SOURCE.stat().st_mtime:
        return _LIBRARY
    # Build into a temp file then rename: atomic under concurrent imports.
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=str(_LIBRARY.parent), delete=False
    ) as handle:
        temp_path = Path(handle.name)
    command = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SOURCE), "-o", str(temp_path),
    ]
    try:
        subprocess.run(command, check=True, capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as error:
        temp_path.unlink(missing_ok=True)
        raise RuntimeError(f"native build failed: {error}") from error
    os.replace(temp_path, _LIBRARY)
    return _LIBRARY


_lib = ctypes.CDLL(str(_build_library()))

_lib.composer_crc32c.restype = ctypes.c_uint32
_lib.composer_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]

_lib.composer_decode_event_ids.restype = ctypes.c_int
_lib.composer_decode_event_ids.argtypes = [
    ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
]

_lib.composer_encode_event_pairs.restype = ctypes.c_int
_lib.composer_encode_event_pairs.argtypes = [
    ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
]


def crc32c(data: bytes) -> int:
    return _lib.composer_crc32c(bytes(data), len(data))


def decode_event_ids(pairs: np.ndarray, velocity_bins: int, max_time_steps: int) -> np.ndarray:
    """(N, 2) int16 (type, value) pairs -> (N,) int32 vocab ids."""
    pairs = np.ascontiguousarray(pairs, dtype=np.int16)
    count = pairs.shape[0]
    out = np.empty(count, dtype=np.int32)
    status = _lib.composer_decode_event_ids(
        pairs.ctypes.data, count, velocity_bins, max_time_steps, out.ctypes.data
    )
    if status != 0:
        raise ValueError("unknown event type in .data stream")
    return out


def encode_event_pairs(ids: np.ndarray, velocity_bins: int, max_time_steps: int) -> np.ndarray:
    """(N,) int32 vocab ids -> (N, 2) int16 (type, value) pairs."""
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    count = ids.shape[0]
    out = np.empty((count, 2), dtype=np.int16)
    status = _lib.composer_encode_event_pairs(
        ids.ctypes.data, count, velocity_bins, max_time_steps, out.ctypes.data
    )
    if status != 0:
        raise ValueError("event id outside vocabulary")
    return out


_lib.composer_midi_parse.restype = ctypes.c_void_p
_lib.composer_midi_parse.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ctypes.POINTER(ctypes.c_int64),
]
_lib.composer_midi_fill.restype = ctypes.c_int
_lib.composer_midi_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 11
_lib.composer_midi_release.restype = None
_lib.composer_midi_release.argtypes = [ctypes.c_void_p]


def parse_midi_arrays(data: bytes):
    """SMF bytes -> flattened instrument/note/control arrays (seconds).

    Returns a dict of NumPy arrays grouped by instrument, or ``None`` when the
    native parser rejects the input (malformed files fall back to the Python
    parser so the caller raises the usual exceptions). Semantics mirror
    ``composer_tpu.midi.midi_io.parse_midi`` exactly (differential-tested).
    """
    n_inst = ctypes.c_int64()
    n_notes = ctypes.c_int64()
    n_controls = ctypes.c_int64()
    handle = _lib.composer_midi_parse(
        bytes(data), len(data),
        ctypes.byref(n_inst), ctypes.byref(n_notes), ctypes.byref(n_controls),
    )
    if not handle:
        return None
    try:
        inst = int(n_inst.value)
        notes = int(n_notes.value)
        controls = int(n_controls.value)
        out = {
            "program": np.empty(inst, np.int32),
            "is_drum": np.empty(inst, np.int32),
            "note_counts": np.empty(inst, np.int64),
            "control_counts": np.empty(inst, np.int64),
            "note_start": np.empty(notes, np.float64),
            "note_end": np.empty(notes, np.float64),
            "note_pitch": np.empty(notes, np.int32),
            "note_velocity": np.empty(notes, np.int32),
            "control_time": np.empty(controls, np.float64),
            "control_number": np.empty(controls, np.int32),
            "control_value": np.empty(controls, np.int32),
        }
        status = _lib.composer_midi_fill(
            handle,
            out["program"].ctypes.data, out["is_drum"].ctypes.data,
            out["note_counts"].ctypes.data, out["control_counts"].ctypes.data,
            out["note_start"].ctypes.data, out["note_end"].ctypes.data,
            out["note_pitch"].ctypes.data, out["note_velocity"].ctypes.data,
            out["control_time"].ctypes.data, out["control_number"].ctypes.data,
            out["control_value"].ctypes.data,
        )
        if status != 0:
            return None
        return out
    finally:
        _lib.composer_midi_release(handle)
