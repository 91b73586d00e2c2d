"""Native (C++) accelerator tests — skipped when g++ is unavailable."""

import numpy as np
import pytest

native = pytest.importorskip("composer_tpu.native.loader")

from composer_tpu.data.tfrecord import _CRC_TABLE_LIST  # noqa: E402
from composer_tpu.midi.vocab import get_vocabulary  # noqa: E402


def _python_crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ _CRC_TABLE_LIST[(crc ^ byte) & 0xFF]
    return crc ^ 0xFFFFFFFF


def test_crc32c_known_vector():
    # RFC 3720 test vector: 32 bytes of zeros -> 0x8A9136AA.
    assert native.crc32c(b"\x00" * 32) == 0x8A9136AA
    # "123456789" -> 0xE3069283.
    assert native.crc32c(b"123456789") == 0xE3069283


def test_crc32c_matches_python(rng):
    for size in [0, 1, 7, 8, 9, 63, 1024, 4097]:
        data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        assert native.crc32c(data) == _python_crc32c(data)


def test_id_codec_matches_vocabulary(rng):
    vocab = get_vocabulary(10, 100, 32)
    ids = rng.integers(0, vocab.size, 1000).astype(np.int32)

    pairs = native.encode_event_pairs(ids, 32, 100)
    types, values = vocab.decode_ids(ids)
    np.testing.assert_array_equal(pairs[:, 0], types)
    # None values are -1 in both representations.
    np.testing.assert_array_equal(pairs[:, 1], values)

    back = native.decode_event_ids(pairs, 32, 100)
    np.testing.assert_array_equal(back, ids)


def test_decode_rejects_bad_type():
    bad = np.array([[99, 0]], dtype=np.int16)
    with pytest.raises(ValueError):
        native.decode_event_ids(bad, 32, 100)
