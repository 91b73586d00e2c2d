"""Streaming (>RAM) data path: StreamingWindowDataset vs WindowDataset.

The reference's ``--use-generator`` mode streamed token ids file-by-file
(models/__init__.py:147-158) so corpora larger than RAM could train. The
TPU-friendly rebuild packs ids once into a disk cache and preads batches:
these tests pin (a) batch-for-batch equality with the in-memory path,
(b) bounded resident memory during iteration, (c) cache reuse/invalidation,
and (d) identical training losses through the Trainer.
"""

import os
import tracemalloc

import numpy as np
import pytest

from composer_tpu.data import loader
from composer_tpu.exceptions import DatasetError
from composer_tpu.midi.serialization import write_event_pairs


@pytest.fixture
def data_files(tmp_path):
    """Eight .data files with distinct, varied id streams."""
    rng = np.random.default_rng(7)
    paths = []
    for index in range(8):
        n = int(rng.integers(50, 120))
        types = rng.integers(1, 3, n).astype(np.int16)  # NOTE_ON / NOTE_OFF
        values = rng.integers(0, 128, n).astype(np.int16)
        path = tmp_path / f"f{index}.data"
        write_event_pairs(path, types, values, 10, 100, 32)
        paths.append(path)
    return paths


def _pairs(dataset):
    return [(x.copy(), y.copy()) for x, y in dataset]


@pytest.mark.parametrize("shard", [(1, 0), (2, 1)])
@pytest.mark.parametrize("shuffle", [False, True])
def test_streaming_matches_in_memory(data_files, tmp_path, shuffle, shard):
    shard_count, shard_index = shard
    kwargs = dict(
        batch_size=3, window_size=8, shuffle=shuffle, seed=11,
        shard_count=shard_count, shard_index=shard_index,
    )
    memory = loader.load_dataset(data_files, **kwargs)
    streaming = loader.load_dataset(
        data_files, streaming=True, cache_dir=tmp_path / "cache", **kwargs
    )
    assert isinstance(streaming, loader.StreamingWindowDataset)
    assert len(streaming) == len(memory)
    # Two epochs: the reshuffle streams must also stay in lockstep.
    for _ in range(2):
        mem_pairs, stream_pairs = _pairs(memory), _pairs(streaming)
        assert len(mem_pairs) == len(stream_pairs) > 0
        for (mx, my), (sx, sy) in zip(mem_pairs, stream_pairs):
            np.testing.assert_array_equal(mx, sx)
            np.testing.assert_array_equal(my, sy)


def test_streaming_clamp_batch(data_files, tmp_path):
    memory = loader.load_dataset(
        data_files, batch_size=10_000, window_size=8, shuffle=False,
        clamp_batch=True,
    )
    streaming = loader.load_dataset(
        data_files, batch_size=10_000, window_size=8, shuffle=False,
        clamp_batch=True, streaming=True, cache_dir=tmp_path / "cache",
    )
    assert streaming.batch_size == memory.batch_size < 10_000
    for (mx, my), (sx, sy) in zip(_pairs(memory), _pairs(streaming)):
        np.testing.assert_array_equal(mx, sx)
        np.testing.assert_array_equal(my, sy)


def test_cache_reused_and_invalidated(data_files, tmp_path):
    cache_dir = tmp_path / "cache"
    first = loader.build_packed_cache(data_files, cache_dir, num_workers=2)
    again = loader.build_packed_cache(data_files, cache_dir, num_workers=2)
    assert first == again
    assert len(list(cache_dir.glob("packed-*.i32"))) == 1
    # Touching a file's mtime (content change proxy) must key a fresh cache.
    os.utime(data_files[0], ns=(1, 1))
    changed = loader.build_packed_cache(data_files, cache_dir, num_workers=2)
    assert changed != first
    # A different file ORDER is a different token stream (windows span file
    # boundaries) and must not reuse the original cache.
    reordered = loader.build_packed_cache(
        list(reversed(data_files)), cache_dir, num_workers=2
    )
    assert reordered not in (first, changed)


def test_packed_cache_bytes_match_load_event_ids(data_files, tmp_path):
    cache = loader.build_packed_cache(data_files, tmp_path / "cache")
    packed = np.fromfile(cache, dtype="<i4")
    np.testing.assert_array_equal(packed, loader.load_event_ids(data_files))


def test_streaming_memory_bounded(tmp_path):
    """Iterating a full epoch must not materialize the corpus: peak traced
    allocations stay far below the packed-cache size (the in-memory path
    allocates the whole stream up front)."""
    rng = np.random.default_rng(3)
    paths = []
    for index in range(4):
        n = 40_000
        types = rng.integers(1, 3, n).astype(np.int16)
        values = rng.integers(0, 128, n).astype(np.int16)
        path = tmp_path / f"big{index}.data"
        write_event_pairs(path, types, values, 10, 100, 32)
        paths.append(path)
    cache = loader.build_packed_cache(paths, tmp_path / "cache")
    corpus_bytes = cache.stat().st_size
    assert corpus_bytes > 500_000

    dataset = loader.StreamingWindowDataset(
        cache, batch_size=4, window_size=64, shuffle=True, seed=0
    )
    tracemalloc.start()
    batches = 0
    for x, y in dataset:
        assert x.shape == (4, 64)
        batches += 1
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert batches == len(dataset) > 100
    # O(batch) + the shuffled index table; an in-memory load would be >= the
    # full corpus. Enforce a hard cap at a quarter of the corpus.
    assert peak < corpus_bytes / 4, (peak, corpus_bytes)


def test_streaming_short_corpus_raises(tmp_path):
    types = np.full(5, 1, np.int16)
    values = np.full(5, 1, np.int16)
    path = tmp_path / "tiny.data"
    write_event_pairs(path, types, values, 10, 100, 32)
    with pytest.raises(DatasetError):
        loader.load_dataset(
            [path], batch_size=1, window_size=4096, streaming=True,
            cache_dir=tmp_path / "cache",
        )


def test_trainer_losses_match_streaming(data_files, tmp_path):
    """Same batches => bit-identical training losses through the Trainer."""
    import jax
    import jax.numpy as jnp

    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    def run(streaming):
        dataset = loader.load_dataset(
            data_files, batch_size=2, window_size=8, shuffle=True, seed=5,
            streaming=streaming, cache_dir=tmp_path / f"cache{streaming}",
        )
        model = Transformer(
            TransformerConfig(
                vocab_size=390, embed_dim=16, num_layers=1, num_heads=2,
                attention_dropout_rate=0.0, residual_dropout_rate=0.0,
            )
        )
        trainer = Trainer(model, ModelType.TRANSFORMER, learning_rate=1e-2)
        state = trainer.init_state(2, 8)
        rng = jax.random.PRNGKey(0)
        carry = trainer.init_rnn_carry(2)
        losses = []
        for step, (x, y) in enumerate(dataset):
            if step >= 4:
                break
            rng, step_rng = jax.random.split(rng)
            state, metrics, carry = trainer.train_step(
                state, jnp.asarray(x), jnp.asarray(y), step_rng, carry
            )
            losses.append(float(metrics["loss"]))
        return losses

    assert run(False) == run(True)


def test_cli_train_use_generator(tmp_path):
    """`composer train --use-generator` streams: trains, checkpoints, and
    leaves a packed cache beside the train split instead of loading to RAM."""
    from click.testing import CliRunner

    from composer_tpu.cli import cli
    from composer_tpu.midi import Note, NoteSequence, SustainPeriod
    from tests.test_cli import TINY_CONFIG

    config_path = tmp_path / "config.yml"
    config_path.write_text(TINY_CONFIG)
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(5)
    for index in range(3):
        t, notes = 0.0, []
        for _ in range(60):
            duration = float(rng.integers(80, 500))
            notes.append(
                Note(t, t + duration, int(rng.integers(40, 90)), int(rng.integers(20, 120)))
            )
            t += float(rng.integers(40, 250))
        NoteSequence(notes, [SustainPeriod(0, t / 4)]).to_midi(str(raw / f"p{index}.mid"))

    runner = CliRunner()
    processed = tmp_path / "processed"
    result = runner.invoke(cli, [
        "--seed", "9", "preprocess", "transformer", str(raw), str(processed),
        "-c", str(config_path), "-w", "1", "--no-transform",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output

    logs = tmp_path / "logs"
    result = runner.invoke(cli, [
        "--seed", "9", "train", "transformer", str(processed),
        "-c", str(config_path), "--logdir", str(logs), "-e", "1",
        "--save-freq-mode", "epoch", "--no-show-progress-bar",
        "--no-data-parallel", "--use-generator",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    logdir = next(logs.glob("transformer-*"))
    assert (logdir / "checkpoints").exists()
    assert list((processed / "train" / "_packed_cache").glob("packed-*.i32"))

    result = runner.invoke(cli, [
        "--seed", "9", "evaluate", "transformer", str(processed), str(logdir),
        "--use-generator",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
