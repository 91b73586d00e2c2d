"""Packed-window dataset loading.

Parity surface: composer/models/__init__.py:160-313. The reference streamed
per-event Python generators into tf.data; here the whole token stream is
packed into one contiguous int32 array and windowing/batching are pure NumPy
reshapes — the TPU-friendly shape (static shapes, zero per-element Python).

Window semantics are identical to the reference pipeline
(models/__init__.py:304-312): the flat event stream is cut into
*non-overlapping* windows of ``window_size + 1`` (remainder dropped, windows
may span file boundaries), inputs are ``window[:-1]`` and labels are
``window[1:]``, windows are shuffled, then grouped into batches of
``batch_size`` (remainder dropped).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Iterator, Tuple

import numpy as np

from composer_tpu.exceptions import DatasetError
from composer_tpu.midi.serialization import IntegerEncodedEventSequence
from composer_tpu.utils import parallel_map


def load_event_ids(filepaths, num_workers: int = 8, show_progress_bar: bool = False) -> np.ndarray:
    """Loads and concatenates the event-id streams of many ``.data`` files."""
    filepaths = [Path(p) for p in filepaths]
    if not filepaths:
        return np.zeros(0, dtype=np.int32)

    def _load(path):
        ids, _, _, _ = IntegerEncodedEventSequence.event_ids_from_file(
            path, as_numpy_array=True, numpy_dtype=np.int32
        )
        return ids

    if len(filepaths) == 1 or num_workers <= 1:
        chunks = [_load(p) for p in filepaths]
    else:
        chunks = parallel_map(
            filepaths,
            _load,
            num_workers=num_workers,
            multithread=True,
            show_progress_bar=show_progress_bar,
        )
    return np.concatenate(chunks) if chunks else np.zeros(0, dtype=np.int32)


class WindowDataset:
    """(input, label) batches over non-overlapping windows of a token stream.

    Iterating yields ``(x, y)`` int32 arrays of shape
    ``[batch_size, window_size]``; each epoch reshuffles with a fresh
    deterministic stream when ``shuffle`` is enabled.
    """

    def __init__(
        self,
        token_stream: np.ndarray,
        batch_size: int,
        window_size: int,
        shuffle: bool = True,
        seed: int = 0,
        shard_count: int = 1,
        shard_index: int = 0,
        clamp_batch: bool = False,
    ):
        stream = np.ascontiguousarray(token_stream, dtype=np.int32)
        stride = window_size + 1
        num_windows = stream.shape[0] // stride
        if num_windows == 0:
            raise DatasetError(
                f"Token stream of {stream.shape[0]} events is shorter than one "
                f"window ({stride} events)."
            )
        self.windows = stream[: num_windows * stride].reshape(num_windows, stride)
        if shard_count > 1:
            # Per-host sharding for the data-parallel mesh axis.
            self.windows = self.windows[shard_index::shard_count]
        if clamp_batch and self.windows.shape[0] < batch_size:
            # Small evaluation sets: shrink the batch rather than fail.
            batch_size = self.windows.shape[0]
        self.batch_size = batch_size
        self.window_size = window_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    @property
    def num_batches(self) -> int:
        return self.windows.shape[0] // self.batch_size

    def __len__(self) -> int:
        return self.num_batches

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        order = np.arange(self.windows.shape[0])
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1

        usable = self.num_batches * self.batch_size
        if usable == 0:
            raise DatasetError(
                f"{self.windows.shape[0]} windows cannot fill one batch of "
                f"{self.batch_size}."
            )
        batches = order[:usable].reshape(self.num_batches, self.batch_size)
        for batch_indices in batches:
            window = self.windows[batch_indices]
            yield window[:, :-1], window[:, 1:]

    def batched_array(self) -> Tuple[np.ndarray, np.ndarray]:
        """All batches stacked: ``(steps, batch, window)`` x/y arrays (no shuffle)."""
        usable = self.num_batches * self.batch_size
        window = self.windows[:usable].reshape(
            self.num_batches, self.batch_size, self.window_size + 1
        )
        return window[:, :, :-1], window[:, :, 1:]


def load_events(filepaths, num_workers: int = 8, show_progress_bar: bool = False) -> np.ndarray:
    """Reference-API alias of :func:`load_event_ids` (models/__init__.py:160)."""
    return load_event_ids(
        filepaths, num_workers=num_workers, show_progress_bar=show_progress_bar
    )


def load_dataset(
    filepaths,
    batch_size: int,
    window_size: int,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 8,
    show_progress_bar: bool = False,
    shard_count: int = 1,
    shard_index: int = 0,
    clamp_batch: bool = False,
) -> WindowDataset:
    """Loads ``.data`` files into a :class:`WindowDataset`."""
    # Materialize first: callers pass generators (e.g. Path.glob), and the
    # len() in the log line must not exhaust the iterator before loading.
    filepaths = list(filepaths)
    logging.info("Loading %d .data files into memory.", len(filepaths))
    stream = load_event_ids(filepaths, num_workers=num_workers, show_progress_bar=show_progress_bar)
    return WindowDataset(
        stream,
        batch_size=batch_size,
        window_size=window_size,
        shuffle=shuffle,
        seed=seed,
        shard_count=shard_count,
        shard_index=shard_index,
        clamp_batch=clamp_batch,
    )
