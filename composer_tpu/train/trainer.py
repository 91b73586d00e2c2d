"""The jitted training loop.

Replaces the reference's eager per-op GradientTape loops (transformer.py:
846-960, music_rnn.py:155-276 — which never used tf.function at all, SURVEY.md
§3.1) with ONE compiled train step: forward + loss + backward + Adam update
fused by XLA, executed on device with only scalar metrics returning to host.

Data parallelism: given a mesh, batches are placed with the batch dimension
sharded over the 'data' axis and parameters replicated (or sharded per their
logical axes for TP); XLA's SPMD partitioner inserts the gradient all-reduce
on ICI. The same trainer runs single-chip when ``mesh`` is None.

Optimizer parity: Adam with eps=1e-7 (Keras' default, which the reference
relied on) and sparse softmax cross-entropy; accuracy is argmax equality
(transformer.py:887-926).
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
from tqdm import tqdm

from composer_tpu import ModelSaveFrequencyMode
from composer_tpu.models import ModelType
from composer_tpu.models.music_rnn import init_state as rnn_init_state
from composer_tpu.parallel import mesh as mesh_lib
from composer_tpu.train.checkpoint import CheckpointManager, abstract_like
from composer_tpu.train.metrics import MetricsWriter


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    epoch: jnp.ndarray
    params: Any
    opt_state: Any
    extra_vars: Any  # e.g. {'batch_stats': ...} for MusicRNN


def cross_entropy_and_accuracy(logits, labels):
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()
    accuracy = jnp.mean(
        (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    )
    return loss, accuracy


def make_optimizer(
    learning_rate: float,
    eps: float = 1e-7,
    warmup_steps: int = 0,
    gradient_clip_norm: float = 0.0,
):
    """Adam, optionally with linear LR warmup and global-norm clipping.

    The defaults (no warmup, no clipping) reproduce the reference's bare
    ``tf.keras.optimizers.Adam`` (transformer.py:884). Warmup/clipping are
    additive config knobs: the reference's default lr of 1e-3 measurably
    diverges-to-unigram on the Transformer at batch 8 x 1024 ctx (loss stuck
    at the corpus' unigram entropy) while a short warmup or a lower lr trains
    fine — see docs/validation.md.
    """
    if warmup_steps > 0:
        learning_rate = optax.linear_schedule(
            0.0, learning_rate, transition_steps=warmup_steps
        )
    optimizer = optax.adam(learning_rate, eps=eps)
    if gradient_clip_norm and gradient_clip_norm > 0.0:
        optimizer = optax.chain(
            optax.clip_by_global_norm(gradient_clip_norm), optimizer
        )
    return optimizer


class Trainer:
    """Shared train/evaluate driver for both model families."""

    def __init__(
        self,
        model,
        model_type: ModelType,
        learning_rate: float,
        mesh=None,
        seed: int = 0,
        warmup_steps: int = 0,
        gradient_clip_norm: float = 0.0,
        dropout_rng_impl: Optional[str] = None,
    ):
        if (
            mesh is not None
            and getattr(mesh, "size", 1) > 1
            and getattr(getattr(model, "config", None), "use_pallas_attention", False)
        ):
            # pallas_call is opaque to GSPMD: under a multi-device mesh the
            # flash kernel runs per-shard via shard_map over (batch, heads)
            # — the attention gate handles it once the mesh is on the config
            # (ops/pallas_attention.sharded_relative_flash_attention; falls
            # back to the band path only for indivisible batch/head counts).
            import dataclasses

            model = type(model)(
                dataclasses.replace(model.config, flash_mesh=mesh)
            )
        self.model = model
        self.model_type = model_type
        self.optimizer = make_optimizer(
            learning_rate,
            warmup_steps=warmup_steps,
            gradient_clip_norm=gradient_clip_norm,
        )
        self.mesh = mesh
        self.seed = seed
        self.dropout_rng_impl = dropout_rng_impl
        self._compiled_train_step = None
        self._compiled_eval_step = None
        self._compiled_eval_scan = None

    # ------------------------------------------------------------------ state
    def init_state(self, batch_size: int, window_size: int) -> TrainState:
        rng = jax.random.PRNGKey(self.seed)
        tokens = jnp.zeros((batch_size, window_size), dtype=jnp.int32)
        variables = self.model.init({"params": rng}, tokens)
        logical_specs = None
        if (
            self.mesh is not None
            and dict(
                zip(self.mesh.axis_names, self.mesh.devices.shape)
            ).get(mesh_lib.MODEL_AXIS, 1) > 1
        ):
            # Tensor parallelism: weights follow their logical annotations
            # (heads/mlp -> the model axis; see mesh.LOGICAL_AXIS_RULES).
            # Leaves without annotations resolve to replicated, so a model
            # family with no TP hooks (MusicRNN) degrades to pure DP.
            logical_specs = nn.get_partition_spec(variables)
        variables = nn.unbox(variables)  # strip Partitioned metadata boxes
        params = variables["params"]
        extra_vars = {k: v for k, v in variables.items() if k != "params"}
        if logical_specs is not None:
            params = mesh_lib.shard_params(
                params, self.mesh, logical_specs["params"]
            )
            # jit propagates the parameter shardings into the optimizer
            # mirrors (Adam mu/nu shard like their weights; counts replicate).
            opt_state = jax.jit(self.optimizer.init)(params)
            replicated = mesh_lib.replicated_sharding(self.mesh)
            return TrainState(
                step=jax.device_put(jnp.ones((), jnp.int32), replicated),
                epoch=jax.device_put(jnp.ones((), jnp.int32), replicated),
                params=params,
                opt_state=opt_state,
                extra_vars=jax.device_put(extra_vars, replicated),
            )
        state = TrainState(
            step=jnp.ones((), jnp.int32),
            epoch=jnp.ones((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            extra_vars=extra_vars,
        )
        if self.mesh is not None:
            state = jax.device_put(
                state, mesh_lib.replicated_sharding(self.mesh)
            )
        return state

    def make_dropout_rng(self):
        """Root key for the per-step dropout rngs.

        Dropout mask generation is a real cost at long context: at 2048 ctx
        batch 8 the band-attention probs alone draw ~2.3G bernoulli samples
        per step, and the default threefry generator spent 155 ms/step on
        them (measured v5e-1: 201 ms/step at dropout 0 vs 356 ms at the
        reference-default 0.1). The TPU-native ``rbg`` generator (hardware
        RNG primitive) cut that to 83 ms, and the 16-bit integer-compare
        masks (ops/dropout.py) to ~22 ms (222 ms/step total). On TPU
        backends we therefore default the *dropout* key — and only it;
        param init stays on the default impl for cross-backend
        reproducibility — to ``rbg``.
        Masks remain deterministic per seed, but differ from the threefry
        masks; set ``dropout_rng_impl: threefry2x32`` (config) to opt out.
        """
        impl = self.dropout_rng_impl
        if impl in (None, "auto"):
            if jax.default_backend() == "tpu":
                impl = "rbg"
                logging.info(
                    "Dropout rng: TPU-native 'rbg' generator "
                    "(set train.dropout_rng_impl to override)."
                )
            else:
                impl = None
        if impl is None or impl == "default":
            return jax.random.PRNGKey(self.seed + 1)
        return jax.random.key(self.seed + 1, impl=impl)

    def init_rnn_carry(self, batch_size: int):
        if self.model_type != ModelType.MUSIC_RNN:
            return None
        return rnn_init_state(self.model.config, batch_size)

    # ------------------------------------------------------------------ steps
    def _loss_fn(self, params, extra_vars, x, y, rng, carry):
        if self.model_type == ModelType.TRANSFORMER:
            logits, _ = self.model.apply(
                {"params": params, **extra_vars},
                x,
                deterministic=False,
                rngs={"dropout": rng},
            )
            new_extra, new_carry = extra_vars, carry
        else:
            (logits, new_carry), updates = self.model.apply(
                {"params": params, **extra_vars},
                x,
                carry,
                deterministic=False,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            new_extra = {**extra_vars, **updates}
        loss, accuracy = cross_entropy_and_accuracy(logits, y)
        return loss, (accuracy, new_extra, new_carry)

    def _train_step(self, state: TrainState, x, y, rng, carry):
        grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
        (loss, (accuracy, new_extra, new_carry)), grads = grad_fn(
            state.params, state.extra_vars, x, y, rng, carry
        )
        updates, new_opt_state = self.optimizer.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            extra_vars=new_extra,
        )
        return new_state, {"loss": loss, "accuracy": accuracy}, new_carry

    def _eval_step(self, state: TrainState, x, y, carry):
        if self.model_type == ModelType.TRANSFORMER:
            logits, _ = self.model.apply(
                {"params": state.params, **state.extra_vars}, x
            )
            new_carry = carry
        else:
            logits, new_carry = self.model.apply(
                {"params": state.params, **state.extra_vars}, x, carry
            )
        loss, accuracy = cross_entropy_and_accuracy(logits, y)
        return {"loss": loss, "accuracy": accuracy}, new_carry

    @property
    def train_step(self):
        if self._compiled_train_step is None:
            self._compiled_train_step = jax.jit(self._train_step, donate_argnums=(0,))
        return self._compiled_train_step

    @property
    def eval_step(self):
        if self._compiled_eval_step is None:
            self._compiled_eval_step = jax.jit(self._eval_step)
        return self._compiled_eval_step

    def _eval_scan(self, state: TrainState, xs, ys, carry):
        """Sums loss/accuracy over a (steps, B, W) stack in one program."""

        def body(carry, batch):
            x, y = batch
            metrics, carry = self._eval_step(state, x, y, carry)
            return carry, (metrics["loss"], metrics["accuracy"])

        carry, (losses, accuracies) = jax.lax.scan(body, carry, (xs, ys))
        return jnp.sum(losses), jnp.sum(accuracies), carry

    @property
    def eval_scan(self):
        if self._compiled_eval_scan is None:
            self._compiled_eval_scan = jax.jit(self._eval_scan)
        return self._compiled_eval_scan

    def _place_batch(self, x, y):
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(y)
        if jax.process_count() > 1:
            # Multi-host: each process holds only its rows of the global
            # batch (the loader's per-host sharding); assemble them.
            return (
                mesh_lib.make_global_batch(self.mesh, x),
                mesh_lib.make_global_batch(self.mesh, y),
            )
        sharding = mesh_lib.batch_sharding(self.mesh)
        return jax.device_put(x, sharding), jax.device_put(y, sharding)

    # ------------------------------------------------------------------- loop
    def train(
        self,
        dataset,
        state: TrainState,
        logdir,
        epochs: Optional[int] = 10,
        save_frequency_mode=ModelSaveFrequencyMode.EPOCH,
        save_frequency: int = 1,
        max_checkpoints: int = 1,
        show_progress_bar: bool = True,
        reset_rnn_state_each_epoch: bool = True,
        profile_dir=None,
        profile_steps: int = 5,
    ) -> TrainState:
        """Runs the epoch/batch loop with checkpointing and TB scalars.

        ``profile_dir`` captures a ``jax.profiler`` trace of steps
        [2, 2 + profile_steps) — step 1 is excluded so compilation does not
        dominate the trace. (The reference had no profiling at all,
        SURVEY.md §5.)
        """
        logdir = Path(logdir)
        save_frequency_mode = ModelSaveFrequencyMode(save_frequency_mode)
        checkpoints = CheckpointManager(logdir, max_to_keep=max_checkpoints)
        writer = MetricsWriter(logdir / "train")
        rng = self.make_dropout_rng()

        batch_size = dataset.batch_size
        carry = self.init_rnn_carry(batch_size)
        steps_per_epoch = len(dataset)
        events_per_batch = batch_size * dataset.window_size

        # Per-step metrics are fetched from the device in deferred chunks:
        # blocking on float(loss) every step serializes host and device (and
        # on a remote-device tunnel costs a full round trip per step, measured
        # ~3x the device step time at 1024 ctx). The device arrays are queued
        # and materialized every ``metrics_flush_steps`` steps — by then they
        # are long complete, so the fetch is pure transfer — while TB still
        # receives every step's scalars and the step counter is tracked
        # host-side (the jitted step increments it by exactly 1).
        metrics_flush_steps = 16
        global_step = int(state.step) - 1  # one sync, before the loop

        try:
            while epochs is None or int(state.epoch) <= epochs:
                current_epoch = int(state.epoch)
                logging.info(
                    "Epoch %s",
                    current_epoch if epochs is None else f"{current_epoch}/{epochs}",
                )
                if reset_rnn_state_each_epoch:
                    carry = self.init_rnn_carry(batch_size)

                epoch_loss, epoch_accuracy, batch_count = 0.0, 0.0, 0
                pending = []  # (global_step, device metrics) not yet fetched
                progress = tqdm(total=steps_per_epoch, disable=not show_progress_bar)
                epoch_start = time.perf_counter()

                def drain(force=False):
                    nonlocal epoch_loss, epoch_accuracy, batch_count
                    if not pending or (not force and len(pending) < metrics_flush_steps):
                        return
                    values = jax.device_get(
                        [(m["loss"], m["accuracy"]) for _, m in pending]
                    )
                    for (step_index, _), (loss, accuracy) in zip(pending, values):
                        loss, accuracy = float(loss), float(accuracy)
                        epoch_loss += loss
                        epoch_accuracy += accuracy
                        batch_count += 1
                        writer.scalar("loss", loss, step_index)
                        writer.scalar("accuracy", accuracy, step_index)
                    progress.set_description(
                        f"- loss: {loss:.4f} - accuracy: {accuracy:.4f}"
                    )
                    pending.clear()

                try:
                    for x, y in dataset:
                        x, y = self._place_batch(x, y)
                        rng, step_rng = jax.random.split(rng)

                        if profile_dir is not None and global_step + 1 == 2:
                            jax.profiler.start_trace(str(profile_dir))
                        state, metrics, carry = self.train_step(
                            state, x, y, step_rng, carry
                        )
                        global_step += 1
                        if profile_dir is not None and global_step == 2 + profile_steps:
                            np.asarray(metrics["loss"])  # force completion
                            jax.profiler.stop_trace()
                            profile_dir = None

                        pending.append((global_step, metrics))
                        drain()
                        progress.update(1)

                        if (
                            save_frequency_mode == ModelSaveFrequencyMode.GLOBAL_STEP
                            and global_step % save_frequency == 0
                        ):
                            checkpoints.save(global_step, flax.serialization.to_state_dict(state))
                finally:
                    # Flush already-computed step metrics even when an
                    # exception (checkpoint failure, KeyboardInterrupt)
                    # escapes mid-epoch; a clean exit drains here too (the
                    # second call below is then a no-op).
                    drain(force=True)
                elapsed = time.perf_counter() - epoch_start
                if batch_count:
                    writer.scalar("epoch_loss", epoch_loss / batch_count, current_epoch)
                    writer.scalar(
                        "epoch_accuracy", epoch_accuracy / batch_count, current_epoch
                    )
                    writer.scalar(
                        "events_per_second",
                        batch_count * events_per_batch / max(elapsed, 1e-9),
                        current_epoch,
                    )
                progress.close()

                state = state.replace(epoch=state.epoch + 1)
                if (
                    save_frequency_mode == ModelSaveFrequencyMode.EPOCH
                    and current_epoch % save_frequency == 0
                ):
                    checkpoints.save(
                        int(state.step) - 1, flax.serialization.to_state_dict(state)
                    )
                writer.flush()

            # Always leave a final checkpoint (the reference could end a run
            # with nothing saved when the save frequency never divided the
            # step/epoch counter — e.g. epoch mode with the default
            # save_frequency of 500).
            final_step = int(state.step) - 1
            if final_step > 0 and checkpoints.latest_step() != final_step:
                checkpoints.save(final_step, flax.serialization.to_state_dict(state))
        finally:
            checkpoints.wait()
            writer.close()

        return state

    def evaluate(self, dataset, state: TrainState, scan_chunk: int = 64):
        """Mean loss/accuracy over a dataset (the NLL parity surface).

        Batches are evaluated in ``lax.scan`` chunks of ``scan_chunk`` so a
        whole evaluation is a handful of device dispatches instead of one per
        batch (per-dispatch latency dominates small evals on remote-attached
        devices). The RNN carry threads through the scan in dataset order,
        matching the per-batch loop's stateful semantics. Mesh-sharded
        evaluation keeps the per-batch loop (batches are placed per step).
        """
        carry = self.init_rnn_carry(dataset.batch_size)
        total_loss, total_accuracy, batches = 0.0, 0.0, 0

        if self.mesh is not None:
            # Queue device metrics and fetch in chunks: a blocking float()
            # per batch would serialize host and device (one full dispatch
            # round trip per batch on remote-attached devices), while never
            # fetching would let the host dispatch the whole dataset ahead
            # of the device — each queued step pins its input buffers in
            # HBM until it runs. Draining every scan_chunk steps bounds the
            # in-flight window (the drain blocks on computed results, i.e.
            # acts as backpressure) without per-batch round trips.
            pending = []

            def drain():
                nonlocal total_loss, total_accuracy
                for loss, acc in jax.device_get(pending):
                    total_loss += float(loss)
                    total_accuracy += float(acc)
                pending.clear()

            for x, y in dataset:
                x, y = self._place_batch(x, y)
                metrics, carry = self.eval_step(state, x, y, carry)
                pending.append((metrics["loss"], metrics["accuracy"]))
                batches += 1
                if len(pending) >= scan_chunk:
                    drain()
            drain()
        else:
            # Buffer scan_chunk batches from the iterator and evaluate each
            # stack in one fused lax.scan dispatch. Iterating (instead of
            # materializing the whole dataset) keeps streaming TFRecord
            # datasets at O(chunk) resident memory.
            pending_x, pending_y = [], []

            def flush(carry):
                nonlocal total_loss, total_accuracy, batches
                loss_sum, accuracy_sum, carry = self.eval_scan(
                    state,
                    jnp.asarray(np.stack(pending_x)),
                    jnp.asarray(np.stack(pending_y)),
                    carry,
                )
                total_loss += float(loss_sum)
                total_accuracy += float(accuracy_sum)
                batches += len(pending_x)
                pending_x.clear()
                pending_y.clear()
                return carry

            for x, y in dataset:
                pending_x.append(np.asarray(x))
                pending_y.append(np.asarray(y))
                if len(pending_x) == scan_chunk:
                    carry = flush(carry)
            if pending_x:
                carry = flush(carry)

        if batches == 0:
            return {"loss": float("nan"), "accuracy": float("nan"), "perplexity": float("nan")}
        mean_loss = total_loss / batches
        return {
            "loss": mean_loss,
            "accuracy": total_accuracy / batches,
            "perplexity": float(np.exp(mean_loss)),
        }

    # ------------------------------------------------------------- restoring
    def restore(self, logdir, batch_size: int, window_size: int) -> TrainState:
        """Restores the latest checkpoint under ``logdir``."""
        from composer_tpu.exceptions import CheckpointError

        template = self.init_state(batch_size, window_size)
        template_dict = flax.serialization.to_state_dict(template)
        checkpoints = CheckpointManager(Path(logdir))
        try:
            restored = checkpoints.restore(abstract_like(template_dict))
        except CheckpointError:
            raise
        except Exception as error:
            raise CheckpointError(
                f"Checkpoint under '{logdir}' does not match the "
                f"{type(self.model).__name__} being restored (wrong "
                f"--model-type for this run, or an incompatible config?): "
                f"{error}"
            ) from error
        return flax.serialization.from_state_dict(template, restored)
