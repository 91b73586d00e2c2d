"""Tests for preprocessing, the window loader, and TFRecord export/import."""

import numpy as np
import pytest

from composer_tpu import config as config_module
from composer_tpu.data import loader, preprocess, tfrecord
from composer_tpu.exceptions import DatasetError
from composer_tpu.midi import Note, NoteSequence, SustainPeriod


@pytest.fixture
def midi_dataset(tmp_path):
    """A tiny raw MIDI dataset (4 files)."""
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(42)
    for index in range(4):
        notes = []
        time = 0.0
        for _ in range(20):
            duration = float(rng.integers(100, 800))
            pitch = int(rng.integers(40, 90))
            velocity = int(rng.integers(20, 120))
            notes.append(Note(time, time + duration, pitch, velocity))
            time += float(rng.integers(50, 400))
        NoteSequence(notes, [SustainPeriod(0, time / 2)]).to_midi(
            str(raw / f"piece{index}.mid")
        )
    return raw


@pytest.fixture
def default_config():
    return config_module.get_default()


def test_convert_file_with_transform(midi_dataset, tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    files = preprocess.convert_file(
        next(midi_dataset.glob("*.mid")), out, transform=True, seed=7
    )
    # 1 base + 8 pitch shifts + 1 time stretch.
    assert len(files) == 10
    assert all(f.exists() for f in files)
    # Deterministic under the same seed.
    sizes_a = [f.stat().st_size for f in files]
    files_b = preprocess.convert_file(
        next(midi_dataset.glob("*.mid")), out, transform=True, seed=7
    )
    assert [f.stat().st_size for f in files_b] == sizes_a


def test_split_dataset(midi_dataset, tmp_path, default_config):
    out = tmp_path / "processed"
    preprocess.split_dataset(
        default_config, midi_dataset, out, "extend", test_percent=0.25,
        transform=False, transform_percent=1.0, num_workers=1,
        show_progress_bar=False,
    )
    train_files = preprocess.get_processed_files(out / "train")
    test_files = preprocess.get_processed_files(out / "test")
    assert len(train_files) == 3
    assert len(test_files) == 1


def test_window_dataset_semantics():
    stream = np.arange(100, dtype=np.int32)
    dataset = loader.WindowDataset(stream, batch_size=2, window_size=9, shuffle=False)
    # 100 // 10 = 10 windows -> 5 batches of 2.
    assert len(dataset) == 5
    x, y = next(iter(dataset))
    assert x.shape == (2, 9) and y.shape == (2, 9)
    # Labels are inputs shifted by one within the same window.
    np.testing.assert_array_equal(y[:, :-1], x[:, 1:])
    np.testing.assert_array_equal(x[0], np.arange(9))
    np.testing.assert_array_equal(y[0], np.arange(1, 10))


def test_window_dataset_shuffle_reproducible():
    stream = np.arange(1000, dtype=np.int32)
    a = loader.WindowDataset(stream, 4, 9, shuffle=True, seed=3)
    b = loader.WindowDataset(stream, 4, 9, shuffle=True, seed=3)
    xa, _ = next(iter(a))
    xb, _ = next(iter(b))
    np.testing.assert_array_equal(xa, xb)
    # Reshuffles on the next epoch.
    xa2, _ = next(iter(a))
    assert not np.array_equal(xa, xa2)


def test_window_dataset_sharding():
    stream = np.arange(400, dtype=np.int32)
    full = loader.WindowDataset(stream, 1, 9, shuffle=False)
    shard0 = loader.WindowDataset(stream, 1, 9, shuffle=False, shard_count=2, shard_index=0)
    shard1 = loader.WindowDataset(stream, 1, 9, shuffle=False, shard_count=2, shard_index=1)
    assert shard0.windows.shape[0] + shard1.windows.shape[0] == full.windows.shape[0]
    merged = np.sort(
        np.concatenate([shard0.windows[:, 0], shard1.windows[:, 0]])
    )
    np.testing.assert_array_equal(merged, np.sort(full.windows[:, 0]))


def test_dataset_too_small_raises():
    with pytest.raises(DatasetError):
        loader.WindowDataset(np.arange(5, dtype=np.int32), 1, 9)


def test_end_to_end_preprocess_and_load(midi_dataset, tmp_path, default_config):
    out = tmp_path / "processed"
    preprocess.convert_all(
        default_config, midi_dataset, out, "extend", transform=False,
        transform_percent=1.0, num_workers=1, show_progress_bar=False,
    )
    files = preprocess.get_processed_files(out)
    dataset = loader.load_dataset(files, batch_size=2, window_size=16, shuffle=False)
    x, y = next(iter(dataset))
    assert x.dtype == np.int32
    assert x.max() < 390  # default vocab


def test_tfrecord_roundtrip(tmp_path):
    stream = np.arange(0, 330, dtype=np.int32) % 300
    dataset = loader.WindowDataset(stream, batch_size=2, window_size=10, shuffle=False)
    path = tmp_path / "dataset.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", path)

    header, batches = tfrecord.load_tfrecord_dataset(path)
    assert header == {"model_type": "transformer", "batch_size": 2, "window_size": 10}
    original = list(dataset)
    assert len(batches) == len(original)
    for (x, y), (ox, oy) in zip(batches, original):
        np.testing.assert_array_equal(x, ox)
        np.testing.assert_array_equal(y, oy)


def test_tfrecord_crc_detects_corruption(tmp_path):
    path = tmp_path / "x.tfrecord"
    tfrecord.write_records(path, [b"hello world"])
    raw = bytearray(path.read_bytes())
    raw[14] ^= 0xFF  # flip a payload byte
    path.write_bytes(bytes(raw))
    with pytest.raises(DatasetError):
        list(tfrecord.read_records(path))


def test_tfrecord_compatible_with_tensorflow(tmp_path):
    """Byte-level compatibility with TF's own reader/writer (both directions)."""
    tf = pytest.importorskip("tensorflow")

    # Ours -> TF
    stream = np.arange(0, 132, dtype=np.int32)
    dataset = loader.WindowDataset(stream, batch_size=1, window_size=10, shuffle=False)
    ours = tmp_path / "ours.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", ours)

    tf_dataset = tf.data.TFRecordDataset([str(ours)])
    records = list(tf_dataset.as_numpy_iterator())
    header = tf.io.parse_single_example(
        records[0],
        {
            "model_type": tf.io.FixedLenFeature([], tf.string),
            "batch_size": tf.io.FixedLenFeature([], tf.int64),
            "window_size": tf.io.FixedLenFeature([], tf.int64),
        },
    )
    assert header["model_type"].numpy() == b"transformer"
    assert int(header["batch_size"].numpy()) == 1
    body = tf.io.parse_single_example(
        records[1],
        {"x": tf.io.FixedLenFeature([], tf.string), "y": tf.io.FixedLenFeature([], tf.string)},
    )
    x = tf.io.parse_tensor(body["x"].numpy(), tf.int32).numpy()
    np.testing.assert_array_equal(x, np.arange(10)[None, :])

    # TF -> ours
    theirs = tmp_path / "theirs.tfrecord"
    with tf.io.TFRecordWriter(str(theirs)) as writer:
        writer.write(
            tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "model_type": tf.train.Feature(
                            bytes_list=tf.train.BytesList(value=[b"transformer"])
                        ),
                        "batch_size": tf.train.Feature(
                            int64_list=tf.train.Int64List(value=[1])
                        ),
                        "window_size": tf.train.Feature(
                            int64_list=tf.train.Int64List(value=[10])
                        ),
                    }
                )
            ).SerializeToString()
        )
        x = np.arange(10, dtype=np.int32)[None, :]
        writer.write(
            tf.train.Example(
                features=tf.train.Features(
                    feature={
                        "x": tf.train.Feature(
                            bytes_list=tf.train.BytesList(
                                value=[tf.io.serialize_tensor(x).numpy()]
                            )
                        ),
                        "y": tf.train.Feature(
                            bytes_list=tf.train.BytesList(
                                value=[tf.io.serialize_tensor(x + 1).numpy()]
                            )
                        ),
                    }
                )
            ).SerializeToString()
        )

    header, batches = tfrecord.load_tfrecord_dataset(theirs)
    assert header["model_type"] == "transformer"
    np.testing.assert_array_equal(batches[0][0], np.arange(10)[None, :])
    np.testing.assert_array_equal(batches[0][1], np.arange(1, 11)[None, :])


def test_sharded_loading_partitions_windows():
    """Multi-host contract: host shards partition the window set disjointly
    and completely (each host constructs WindowDataset with its
    process_index/process_count; SURVEY §2.6 host-parallelism row)."""
    from composer_tpu.data.loader import WindowDataset

    stream = np.arange(9 * 17, dtype=np.int32)  # 9 windows of 16+1
    full = WindowDataset(stream, batch_size=1, window_size=16, shuffle=False)
    shards = [
        WindowDataset(stream, batch_size=1, window_size=16, shuffle=False,
                      shard_count=3, shard_index=index)
        for index in range(3)
    ]
    seen = np.concatenate([s.windows for s in shards])
    # Same multiset of windows, no duplicates, nothing dropped.
    assert seen.shape == full.windows.shape
    assert {tuple(w) for w in seen} == {tuple(w) for w in full.windows}
    sizes = [s.windows.shape[0] for s in shards]
    assert max(sizes) - min(sizes) <= 1  # balanced


def test_sharded_global_batch_consistency():
    """Two simulated hosts each feed half the global batch: stacking their
    per-shard batches reproduces every window exactly once per epoch."""
    from composer_tpu.data.loader import WindowDataset

    stream = np.arange(8 * 9, dtype=np.int32)  # 9 windows of 8+1
    hosts = [
        WindowDataset(stream, batch_size=2, window_size=8, shuffle=False,
                      shard_count=2, shard_index=index)
        for index in range(2)
    ]
    global_rows = []
    for (x0, y0), (x1, y1) in zip(*hosts):
        global_batch = np.concatenate([x0, x1])  # [4, 8] global batch
        assert global_batch.shape == (4, 8)
        global_rows.extend(tuple(r) for r in global_batch)
        np.testing.assert_array_equal(y0, x0 + 1)  # shifted labels intact
    assert len(set(global_rows)) == len(global_rows)


def test_load_dataset_accepts_generators(tmp_path):
    """A generator of file paths (e.g. Path.glob) must survive the count in
    the log line (it used to be exhausted by len(list(...)))."""
    from composer_tpu.midi.serialization import write_event_pairs

    for index in range(3):
        types = np.full(40, 3, np.int16)
        values = np.full(40, 1, np.int16)
        write_event_pairs(tmp_path / f"f{index}.data", types, values, 10, 100, 32)
    dataset = loader.load_dataset(
        tmp_path.glob("*.data"), batch_size=2, window_size=4, shuffle=False
    )
    assert len(dataset) > 0


def test_truncated_payload_crc_raises_dataset_error(tmp_path):
    from composer_tpu.exceptions import DatasetError

    path = tmp_path / "t.tfrecord"
    tfrecord.write_records(path, [b"payload-bytes"])
    data = path.read_bytes()
    path.write_bytes(data[:-2])  # cut inside the trailing payload CRC
    with pytest.raises(DatasetError):
        list(tfrecord.read_records(path))


def test_convert_all_skips_bad_files(midi_dataset, tmp_path, default_config, caplog):
    """One unparseable MIDI must not abort the corpus (the reference stored
    exceptions in results and kept going); it is logged and skipped."""
    import logging

    (midi_dataset / "broken.mid").write_bytes(b"this is not a midi file")
    out = tmp_path / "processed"
    with caplog.at_level(logging.ERROR):
        preprocess.convert_all(
            default_config, midi_dataset, out, "extend",
            transform=False, transform_percent=1.0,
            num_workers=1, seed=0, show_progress_bar=False,
        )
    produced = preprocess.get_processed_files(out)
    assert len(produced) == 4  # all good files converted
    assert any("broken.mid" in rec.message for rec in caplog.records)


def test_split_dataset_skips_bad_files(midi_dataset, tmp_path, default_config):
    (midi_dataset / "broken.mid").write_bytes(b"junk")
    out = tmp_path / "split"
    preprocess.split_dataset(
        default_config, midi_dataset, out, "extend", 0.5,
        transform=False, transform_percent=1.0,
        num_workers=1, seed=0, show_progress_bar=False,
    )
    # 5 glob entries split 2/3 (test_percent 0.5); the bad file lands in one
    # subset and is skipped there, all real files convert.
    produced = len(preprocess.get_processed_files(out / "train")) + len(
        preprocess.get_processed_files(out / "test")
    )
    assert produced == 4


def test_tfrecord_streaming_matches_in_memory(tmp_path):
    """TFRecordWindowDataset.from_file (mmap + lazy decode) yields exactly
    the in-memory loader's batches, shuffling included (same seed), and
    never holds more than the record index resident."""
    from composer_tpu.data import tfrecord
    from composer_tpu.data.loader import WindowDataset

    stream = (np.arange(4000) % 50).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=4, window_size=16, shuffle=False)
    path = tmp_path / "stream.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", path)

    header_m, batches = tfrecord.load_tfrecord_dataset(path)
    header_s, streaming = tfrecord.TFRecordWindowDataset.from_file(
        path, shuffle=True, seed=7
    )
    assert header_s == header_m
    in_memory = tfrecord.TFRecordWindowDataset(
        header_m, batches, shuffle=True, seed=7
    )
    assert len(streaming) == len(in_memory) == len(batches)
    for (sx, sy), (mx, my) in zip(streaming, in_memory):
        np.testing.assert_array_equal(sx, mx)
        np.testing.assert_array_equal(sy, my)
    # Second epoch reshuffles identically across modes too.
    for (sx, sy), (mx, my) in zip(streaming, in_memory):
        np.testing.assert_array_equal(sx, mx)
        np.testing.assert_array_equal(sy, my)


def test_tfrecord_streaming_detects_payload_corruption(tmp_path):
    from composer_tpu.data import tfrecord
    from composer_tpu.data.loader import WindowDataset
    from composer_tpu.exceptions import DatasetError

    stream = (np.arange(500) % 50).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=2, window_size=8, shuffle=False)
    path = tmp_path / "corrupt.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", path)

    raw = bytearray(path.read_bytes())
    raw[len(raw) // 2] ^= 0xFF  # flip a payload byte in some record
    path.write_bytes(bytes(raw))

    try:
        _, streaming = tfrecord.TFRecordWindowDataset.from_file(path, shuffle=False)
        for _ in streaming:
            pass
    except DatasetError:
        return  # lazy CRC caught it at index or read time
    raise AssertionError("corruption not detected")


def test_tfrecord_streaming_crc_verified_once(tmp_path, monkeypatch):
    """Payload CRCs are checked on first read of each record only; later
    epochs skip the (potentially pure-Python) CRC pass entirely."""
    from composer_tpu.data import tfrecord
    from composer_tpu.data.loader import WindowDataset

    stream = (np.arange(600) % 50).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=2, window_size=8, shuffle=False)
    path = tmp_path / "crc_once.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", path)

    _, streaming = tfrecord.TFRecordWindowDataset.from_file(path, shuffle=False)

    calls = []
    real = tfrecord._masked_crc
    monkeypatch.setattr(tfrecord, "_masked_crc", lambda b: calls.append(1) or real(b))

    first = list(streaming)
    first_epoch_calls = len(calls)
    assert first_epoch_calls == len(streaming)  # one payload CRC per record
    second = list(streaming)
    assert len(calls) == first_epoch_calls  # none on the second epoch
    for (ax, ay), (bx, by) in zip(first, second):
        np.testing.assert_array_equal(ax, bx)
        np.testing.assert_array_equal(ay, by)


def test_tfrecord_row_sharding_reassembles_global_batch(tmp_path):
    """Each shard takes a disjoint row slice of every exported batch; stacking
    the shards row-wise reconstructs the exported global batch exactly."""
    from composer_tpu.data import tfrecord
    from composer_tpu.data.loader import WindowDataset
    from composer_tpu.exceptions import DatasetError

    stream = (np.arange(800) % 50).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=4, window_size=8, shuffle=False)
    path = tmp_path / "sharded.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", path)

    header, full = tfrecord.TFRecordWindowDataset.from_file(path, shuffle=False)
    shards = [
        tfrecord.TFRecordWindowDataset.from_file(
            path, shuffle=False, shard_count=2, shard_index=i
        )[1]
        for i in range(2)
    ]
    assert all(s.batch_size == 2 for s in shards)
    for (fx, fy), (ax, ay), (bx, by) in zip(full, *shards):
        np.testing.assert_array_equal(fx, np.concatenate([ax, bx]))
        np.testing.assert_array_equal(fy, np.concatenate([ay, by]))

    with pytest.raises(DatasetError):
        tfrecord.TFRecordWindowDataset.from_file(path, shuffle=False, shard_count=3)


def test_evaluate_runs_on_streaming_tfrecord(tmp_path):
    """trainer.evaluate accepts a streaming TFRecord dataset (no
    batched_array materialization) and matches evaluate on the equivalent
    in-memory WindowDataset."""
    import jax
    from composer_tpu.data import tfrecord
    from composer_tpu.data.loader import WindowDataset
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    stream = (np.arange(1200) % 50).astype(np.int32)
    dataset = WindowDataset(stream, batch_size=2, window_size=8, shuffle=False)
    path = tmp_path / "eval.tfrecord"
    tfrecord.export_dataset(dataset, "transformer", path)
    _, streaming = tfrecord.TFRecordWindowDataset.from_file(path, shuffle=False)

    model = Transformer(TransformerConfig(
        vocab_size=50, embed_dim=16, window_size=8, num_layers=1, num_heads=2,
        attention_dropout_rate=0.0, residual_dropout_rate=0.0,
    ))
    trainer = Trainer(model, ModelType.TRANSFORMER, 1e-3)
    state = trainer.init_state(2, 8)

    streamed = trainer.evaluate(streaming, state, scan_chunk=4)
    in_memory = trainer.evaluate(dataset, state, scan_chunk=4)
    assert streamed["loss"] == pytest.approx(in_memory["loss"], rel=1e-6)
    assert streamed["accuracy"] == pytest.approx(in_memory["accuracy"], rel=1e-6)
