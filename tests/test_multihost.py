"""Multi-host data-parallel training, actually executed.

Launches TWO separate JAX processes (``jax.distributed.initialize`` over a
localhost coordinator, 2 virtual CPU devices each => a 4-device global mesh),
each loading only its per-host shard of the windows
(data/loader.py ``shard_count``/``shard_index``), assembling global batches
via ``mesh.make_global_batch``, and running real jitted train steps whose
gradient all-reduce crosses the process boundary (Gloo collectives).

Asserts: both processes observe identical losses, and the 3-step loss
trajectory matches a single-process run on the same windows (DP equivalence —
batch-row placement differs between the sharded and unsharded layouts, but
mean loss and summed gradients are permutation-invariant).

This executes the code path of ``initialize_multihost`` (parallel/mesh.py)
end to end; the reference had no distributed runtime at all (SURVEY.md §2.6).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import json, sys

process_id = int(sys.argv[1])
port = sys.argv[2]

import jax

# The TPU-tunnel sitecustomize imports jax at interpreter startup, so env
# vars are too late here exactly as in tests/conftest.py — use jax.config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_default_matmul_precision", "highest")

from composer_tpu.parallel.mesh import initialize_multihost, create_mesh

index, count = initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=process_id
)
assert (index, count) == (process_id, 2), (index, count)
assert len(jax.devices()) == 4, jax.devices()

import jax.numpy as jnp
import numpy as np

from composer_tpu.data.loader import WindowDataset
from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.train.trainer import Trainer

VOCAB, WINDOW, GLOBAL_BATCH, STEPS = 37, 32, 4, 3

stream = (np.arange(GLOBAL_BATCH * (WINDOW + 1) * STEPS) * 7 + 3) % VOCAB

dataset = WindowDataset(
    stream.astype(np.int32),
    batch_size=GLOBAL_BATCH // count,
    window_size=WINDOW,
    shuffle=False,
    shard_count=count,
    shard_index=index,
)

config = TransformerConfig(
    vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
    num_heads=2, use_relative_attention=True, attention_dropout_rate=0.0,
    residual_dropout_rate=0.0, band_block_size=0,
)
mesh = create_mesh()
trainer = Trainer(Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-3, mesh=mesh, seed=0)
state = trainer.init_state(GLOBAL_BATCH, WINDOW)

losses = []
rng = jax.random.PRNGKey(0)
for x, y in dataset:
    x, y = trainer._place_batch(x, y)
    state, metrics, _ = trainer.train_step(state, x, y, rng, None)
    losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))

print("RESULT " + json.dumps({"process": process_id, "losses": losses}))
"""


def _free_port():
    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return sock.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()

    env = dict(os.environ)
    # Append (never replace: the TPU plugin's sitecustomize rides PYTHONPATH).
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [str(REPO_ROOT), env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(process_id), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            cwd=REPO_ROOT,
            env=env,
        )
        for process_id in range(2)
    ]
    outputs = []
    for proc in procs:
        out, err = proc.communicate(timeout=300)
        assert proc.returncode == 0, f"worker failed:\n{out}\n{err}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out}\n{err}"
        outputs.append(json.loads(lines[-1][len("RESULT "):]))

    losses = {o["process"]: o["losses"] for o in outputs}
    assert len(losses[0]) == 3
    np.testing.assert_allclose(losses[0], losses[1], rtol=0, atol=0)

    # Single-process equivalent on the SAME windows, full global batch.
    import jax
    from composer_tpu.data.loader import WindowDataset
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    VOCAB, WINDOW, GLOBAL_BATCH, STEPS = 37, 32, 4, 3
    stream = (np.arange(GLOBAL_BATCH * (WINDOW + 1) * STEPS) * 7 + 3) % VOCAB
    dataset = WindowDataset(
        stream.astype(np.int32), batch_size=GLOBAL_BATCH, window_size=WINDOW,
        shuffle=False,
    )
    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, use_relative_attention=True, attention_dropout_rate=0.0,
        residual_dropout_rate=0.0, band_block_size=0,
    )
    trainer = Trainer(
        Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-3, seed=0
    )
    state = trainer.init_state(GLOBAL_BATCH, WINDOW)
    rng = jax.random.PRNGKey(0)
    single = []
    for x, y in dataset:
        state, metrics, _ = trainer.train_step(state, x, y, rng, None)
        single.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses[0], single, rtol=0, atol=1e-5)


WORKER_HARDENED = r"""
import json, sys

process_id = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_default_matmul_precision", "highest")

from composer_tpu.parallel.mesh import initialize_multihost, create_mesh

index, count = initialize_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=process_id
)

import flax
import jax.numpy as jnp
import numpy as np

from composer_tpu.data.loader import WindowDataset
from composer_tpu.data.tfrecord import TFRecordWindowDataset
from composer_tpu.models import ModelType
from composer_tpu.models.transformer import Transformer, TransformerConfig
from composer_tpu.train.checkpoint import CheckpointManager, abstract_like
from composer_tpu.train.trainer import Trainer

VOCAB, WINDOW, GLOBAL_BATCH, STEPS = 37, 256, 4, 2

out = {"process": process_id}

# --- band-path training at window 256 (band_block_size default => active) --
stream = (np.arange(GLOBAL_BATCH * (WINDOW + 1) * (STEPS + 1)) * 7 + 3) % VOCAB
dataset = WindowDataset(
    stream.astype(np.int32), batch_size=GLOBAL_BATCH // count,
    window_size=WINDOW, shuffle=False, shard_count=count, shard_index=index,
)
config = TransformerConfig(
    vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
    num_heads=2, use_relative_attention=True, attention_dropout_rate=0.0,
    residual_dropout_rate=0.0,
)
mesh = create_mesh()
trainer = Trainer(Transformer(config), ModelType.TRANSFORMER,
                  learning_rate=1e-3, mesh=mesh, seed=0)
state = trainer.init_state(GLOBAL_BATCH, WINDOW)

rng = jax.random.PRNGKey(0)
losses = []
batches = list(dataset)
for x, y in batches[:STEPS]:
    x, y = trainer._place_batch(x, y)
    state, metrics, _ = trainer.train_step(state, x, y, rng, None)
    losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))
out["band_losses"] = losses

# --- checkpoint: save collectively, restore in both, resume one step -------
ckpt = CheckpointManager(workdir + "/logdir")
ckpt.save(STEPS, flax.serialization.to_state_dict(state), wait=True)

template = flax.serialization.to_state_dict(trainer.init_state(GLOBAL_BATCH, WINDOW))
restored = CheckpointManager(workdir + "/logdir").restore(abstract_like(template))
state2 = flax.serialization.from_state_dict(
    trainer.init_state(GLOBAL_BATCH, WINDOW), restored
)
x, y = trainer._place_batch(*batches[STEPS])
state2, metrics, _ = trainer.train_step(state2, x, y, rng, None)
out["resumed_loss"] = float(np.asarray(metrics["loss"].addressable_data(0)))

# --- multi-host evaluate ----------------------------------------------------
eval_dataset = WindowDataset(
    stream.astype(np.int32), batch_size=GLOBAL_BATCH // count,
    window_size=WINDOW, shuffle=False, shard_count=count, shard_index=index,
)
out["eval"] = trainer.evaluate(eval_dataset, state)["loss"]

# --- TFRecord 2-process row-sharded loading --------------------------------
header, record_dataset = TFRecordWindowDataset.from_file(
    workdir + "/data.tfrecord", shuffle=False, seed=0,
    shard_count=count, shard_index=index,
)
tf_losses = []
state3 = trainer.init_state(GLOBAL_BATCH, WINDOW)
for step, (x, y) in enumerate(record_dataset):
    if step >= STEPS:
        break
    x, y = trainer._place_batch(x, y)
    state3, metrics, _ = trainer.train_step(state3, x, y, rng, None)
    tf_losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))
out["tfrecord_losses"] = tf_losses

print("RESULT " + json.dumps(out))
"""


@pytest.mark.slow
def test_two_process_band_checkpoint_evaluate_tfrecord(tmp_path):
    """Multi-host hardening (VERDICT r2 item 3): band attention at window
    256, a collective Orbax save/restore + resumed step, multi-host
    evaluate, and 2-process TFRecord row-sharded loading — all in one
    2-process run, each pinned exactly against a single-process run."""
    # Export the TFRecord the workers will shard-load.
    from composer_tpu.data import tfrecord
    from composer_tpu.data.loader import WindowDataset

    VOCAB, WINDOW, GLOBAL_BATCH, STEPS = 37, 256, 4, 2
    stream = (np.arange(GLOBAL_BATCH * (WINDOW + 1) * (STEPS + 1)) * 7 + 3) % VOCAB
    export_source = WindowDataset(
        stream.astype(np.int32), batch_size=GLOBAL_BATCH, window_size=WINDOW,
        shuffle=False,
    )
    tfrecord.export_dataset(export_source, "transformer", tmp_path / "data.tfrecord")

    worker = tmp_path / "worker.py"
    worker.write_text(WORKER_HARDENED)
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in [str(REPO_ROOT), env.get("PYTHONPATH", "")] if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(process_id), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=REPO_ROOT, env=env,
        )
        for process_id in range(2)
    ]
    outputs = []
    for proc in procs:
        out, err = proc.communicate(timeout=600)
        assert proc.returncode == 0, f"worker failed:\n{out[-3000:]}\n{err[-5000:]}"
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out}\n{err}"
        outputs.append(json.loads(lines[-1][len("RESULT "):]))
    results = {o["process"]: o for o in outputs}

    # Both processes observe identical numbers on every surface.
    for key in ("band_losses", "resumed_loss", "eval", "tfrecord_losses"):
        np.testing.assert_allclose(
            results[0][key], results[1][key], rtol=0, atol=0, err_msg=key
        )

    # Single-process twin: same windows, full global batches.
    import flax
    import jax

    from composer_tpu.data.tfrecord import TFRecordWindowDataset
    from composer_tpu.models import ModelType
    from composer_tpu.models.transformer import Transformer, TransformerConfig
    from composer_tpu.train.trainer import Trainer

    config = TransformerConfig(
        vocab_size=VOCAB, embed_dim=16, window_size=WINDOW, num_layers=1,
        num_heads=2, use_relative_attention=True, attention_dropout_rate=0.0,
        residual_dropout_rate=0.0,
    )
    dataset = WindowDataset(
        stream.astype(np.int32), batch_size=GLOBAL_BATCH, window_size=WINDOW,
        shuffle=False,
    )
    trainer = Trainer(
        Transformer(config), ModelType.TRANSFORMER, learning_rate=1e-3, seed=0
    )
    state = trainer.init_state(GLOBAL_BATCH, WINDOW)
    rng = jax.random.PRNGKey(0)
    single, batches = [], list(dataset)
    for x, y in batches[:STEPS]:
        state, metrics, _ = trainer.train_step(state, x, y, rng, None)
        single.append(float(metrics["loss"]))
    np.testing.assert_allclose(results[0]["band_losses"], single, rtol=0, atol=1e-5)

    # Multi-host evaluate == single-process evaluate (before the extra step:
    # train_step donates its input state).
    eval_single = trainer.evaluate(
        WindowDataset(
            stream.astype(np.int32), batch_size=GLOBAL_BATCH,
            window_size=WINDOW, shuffle=False,
        ),
        state,
    )["loss"]
    np.testing.assert_allclose(results[0]["eval"], eval_single, rtol=0, atol=1e-5)

    # Resumed step vs the single-process continuation (no checkpoint needed
    # here: restore-exactness is itself asserted by the cross-process match).
    x, y = batches[STEPS]
    _, metrics, _ = trainer.train_step(state, x, y, rng, None)
    np.testing.assert_allclose(
        results[0]["resumed_loss"], float(metrics["loss"]), rtol=0, atol=1e-5
    )

    # TFRecord shard-loading == single-process TFRecord training.
    _, record_dataset = TFRecordWindowDataset.from_file(
        tmp_path / "data.tfrecord", shuffle=False, seed=0
    )
    state3 = trainer.init_state(GLOBAL_BATCH, WINDOW)
    tf_single = []
    for step, (x, y) in enumerate(record_dataset):
        if step >= STEPS:
            break
        state3, metrics, _ = trainer.train_step(state3, x, y, rng, None)
        tf_single.append(float(metrics["loss"]))
    np.testing.assert_allclose(
        results[0]["tfrecord_losses"], tf_single, rtol=0, atol=1e-5
    )
