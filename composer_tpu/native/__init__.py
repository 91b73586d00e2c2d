"""Native (C++) accelerators, loaded lazily with pure-Python fallbacks.

Exports (populated by composer_tpu.native.loader when the shared library has
been built): ``crc32c``, ``parse_midi_arrays``.
"""

try:
    from composer_tpu.native.loader import crc32c, parse_midi_arrays  # noqa: F401
except Exception:  # pragma: no cover - the extension is optional
    crc32c = None
    parse_midi_arrays = None
