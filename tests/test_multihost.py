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
