"""Training pipeline: jitted optax train step, metrics, checkpoints.

Training contract mirrors reference machine_learning/train.py:29-309:
BCE-with-logits loss, AdamW(lr=1e-3), cosine-annealing LR with period 25
epochs stepped per epoch, per-run ``session-YYYYmmdd_HHMM`` directory,
TensorBoard scalars ``{train,val}_{loss,precision,recall,f1}``, epoch F1
= harmonic mean of nan-mean precision/recall (not mean of per-example
F1), best-F1 checkpointing named ``UNet3d-{date}-{epoch}-{f1:.4f}.pth``.

TPU-native internals:
* one jitted, donated train step: forward (optionally bfloat16 --
  the TPU-idiomatic counterpart of the reference's fp16 GradScaler
  autocast, train.py:79-86), loss, grads, AdamW update, batch-stat
  update, all on device;
* metrics (precision/recall per example on channel 0, logits > 0 vs
  labels > 0, nan on empty denominators -- sklearn zero_division=nan
  parity, train.py:242-255) computed on device inside the same jit;
* checkpoints: reference-compatible ``.pth`` state_dicts (consumable by
  ``load_model`` on either framework) plus full Orbax train-state
  (params, batch stats, optimizer state, epoch, best F1) enabling true
  resume -- a capability the reference lacks (SURVEY.md section 5).

Deliberate deviations (documented): the reference never calls
``optimizer.zero_grad()`` so torch accumulates gradients across all
steps (train.py:141-148); functional JAX has no hidden accumulation, so
the default here is the fixed behavior, with
``accumulate_grads_quirk=True`` available to emulate the reference
bit-for-bit (a running gradient sum fed to the optimizer).
"""

import math
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aind_exaspim_neuron_segmentation_tpu.machine_learning.data_handling import (
    iterate_batches,
)
from aind_exaspim_neuron_segmentation_tpu.models.convert import (
    save_pth_checkpoint,
)
from aind_exaspim_neuron_segmentation_tpu.models.unet3d import UNet3D
from aind_exaspim_neuron_segmentation_tpu.utils import util


def cosine_annealing_lr(base_lr, t_max=25, eta_min=0.0):
    """torch.optim.lr_scheduler.CosineAnnealingLR closed form."""

    def schedule(epoch):
        return eta_min + (base_lr - eta_min) * (
            1 + math.cos(math.pi * epoch / t_max)
        ) / 2

    return schedule


def batch_precision_recall(logits_c0, labels_c0):
    """Per-example precision/recall with nan on empty denominators.

    Thresholds follow the reference (train.py:242-255): prediction =
    logits > 0 (i.e. sigmoid > 0.5), truth = label > 0, channel 0 only.
    """
    pred = logits_c0 > 0
    true = labels_c0 > 0
    axes = tuple(range(1, pred.ndim))
    tp = jnp.sum(pred & true, axis=axes).astype(jnp.float32)
    pp = jnp.sum(pred, axis=axes).astype(jnp.float32)
    ap = jnp.sum(true, axis=axes).astype(jnp.float32)
    precision = jnp.where(pp > 0, tp / jnp.maximum(pp, 1), jnp.nan)
    recall = jnp.where(ap > 0, tp / jnp.maximum(ap, 1), jnp.nan)
    return precision, recall


class Trainer:
    """Training loop owner (reference train.py:29 surface).

    Parameters mirror the reference; extras: ``width_multiplier``,
    ``accumulate_grads_quirk``, ``seed``.
    """

    def __init__(
        self,
        output_dir,
        affinity_mode=True,
        batch_size=16,
        lr=1e-3,
        max_epochs=1000,
        use_amp=True,
        width_multiplier=1,
        accumulate_grads_quirk=False,
        seed=0,
        mesh=None,
        device_augment=None,
        prefetch=True,
        num_workers=0,
        wire_labels=True,
    ):
        exp_name = "session-" + datetime.today().strftime("%Y%m%d_%H%M")
        self.log_dir = os.path.join(output_dir, exp_name)
        util.mkdir(self.log_dir)

        self.affinity_mode = affinity_mode
        self.batch_size = batch_size
        self.base_lr = lr
        self.max_epochs = max_epochs
        self.best_f1 = 0.0
        self.epoch = 0
        self.accumulate_grads_quirk = accumulate_grads_quirk
        # Device-side augmentation: train batches arrive as raw label
        # patches (TrainDataset(return_label_patches=True)); the jitted
        # step flips image+label jointly, jitters intensity, and
        # computes affinity targets on device -- zero host transform
        # work (TPU-idiomatic counterpart of ImageTransforms). Default
        # None = AUTO: enabled on the first train_step whenever the
        # dataset ships raw label patches, so the fast path (with the
        # raw-u16 wire when the volumes qualify, _apply_wire_mode) is
        # what users get rather than what they discover; False opts
        # out, True forces (and fails fast on an ineligible dataset).
        self.device_augment = device_augment
        # Input-pipeline prefetch: a background thread produces the next
        # batches while the (async-dispatched) device step runs, so host
        # sampling/augmentation overlaps device compute (the torch
        # DataLoader-workers role, reference train.py:103-106). Batches
        # and RNG streams are identical either way.
        self.prefetch = prefetch
        # Multi-process sampler fan-out: num_workers > 0 forks that many
        # GIL-free producer processes (batch b <- worker b % N, strict
        # order, bounded memory). ValidateDataset batches stay
        # bit-identical (index-deterministic); TrainDataset draws follow
        # per-worker seeded streams -- deterministic given (seed,
        # num_workers, epoch) but distinct from the num_workers=0 stream
        # (see data_handling.prefetch_batches). Default 0 keeps the
        # single-producer thread: this host has one core, so fan-out
        # only pays on multi-core production hosts.
        if num_workers and not prefetch:
            raise ValueError(
                "num_workers>0 forks background producers, which "
                "prefetch=False explicitly disables -- pick one"
            )
        self.num_workers = num_workers
        # Label-wire batches: BaseDataset targets leave the host as
        # compact uint16 labels and the jitted steps derive the
        # affinity / foreground channels on device (bit-identical --
        # see _targets_from_labels). Cuts the per-step host upload from
        # 16 B/voxel to 6 (decisive over thin host links, BASELINE.md
        # round-3 train-step accounting). False restores the host-side
        # f32 target channels.
        self.wire_labels = wire_labels
        self.input_wait_s = 0.0  # host time blocked waiting on batches
        self._augment_key = jax.random.PRNGKey(seed + 1)
        # Optional data parallelism: batches shard over the mesh's first
        # axis, parameters replicate, XLA inserts the gradient psum.
        # New capability relative to the single-device reference.
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = mesh.axis_names[0]
            if batch_size % mesh.devices.size != 0:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over "
                    f"{mesh.devices.size} devices"
                )
            self._batch_sharding = NamedSharding(
                mesh, P(axis, None, None, None, None)
            )
            self._replicated = NamedSharding(mesh, P())
        else:
            self._batch_sharding = None
            self._replicated = None

        on_tpu = jax.default_backend() not in ("cpu",)
        dtype = jnp.bfloat16 if (use_amp and on_tpu) else jnp.float32
        out_channels = 3 if affinity_mode else 1
        self.module = UNet3D(
            output_channels=out_channels,
            width_multiplier=width_multiplier,
            dtype=dtype,
        )
        dummy = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
        variables = self.module.init(
            jax.random.PRNGKey(seed), dummy, train=True
        )
        self.params = variables["params"]
        self.batch_stats = variables["batch_stats"]

        self.schedule = cosine_annealing_lr(lr, t_max=25)
        # weight_decay matches torch.optim.AdamW's default 0.01
        # (optax's default is 1e-4).
        self.tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=0.01
        )
        self.opt_state = self.tx.init(self.params)
        self.grad_accum = (
            jax.tree.map(jnp.zeros_like, self.params)
            if accumulate_grads_quirk
            else None
        )

        if mesh is not None:
            self.params = jax.device_put(self.params, self._replicated)
            self.batch_stats = jax.device_put(
                self.batch_stats, self._replicated
            )
            self.opt_state = jax.device_put(self.opt_state, self._replicated)
            if self.grad_accum is not None:
                self.grad_accum = jax.device_put(
                    self.grad_accum, self._replicated
                )

        self.writer = self._make_writer()
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()

    # --- jitted steps ---

    @staticmethod
    def _targets_from_labels(y, affinity):
        """NDHWC integer label patches -> on-device training targets.

        Affinity channels are label-equality tests and the foreground
        channel is a zero test, so the result is bit-identical to the
        host ``BaseDataset._target`` conversion for any
        equality-preserving relabel (``data_handling.compact_labels``
        ships uint16 over the wire on that basis).
        """
        from aind_exaspim_neuron_segmentation_tpu.core.affinities import (
            affinity_channels_jax,
        )

        if affinity:
            y = jax.vmap(
                lambda l: affinity_channels_jax(l[..., 0])
            )(y.astype(jnp.int32))
            return jnp.moveaxis(y, 1, -1)
        return (y > 0).astype(jnp.float32)

    def _build_train_step(self):
        module = self.module
        tx = self.tx
        quirk = self.accumulate_grads_quirk
        augment = self.device_augment
        affinity = self.affinity_mode
        targets_from_labels = self._targets_from_labels

        def step(params, batch_stats, opt_state, grad_accum, x, y, w, key):
            if augment:
                from aind_exaspim_neuron_segmentation_tpu.ops.augment_device import (  # noqa: E501
                    augment_batch,
                )

                if isinstance(x, tuple):
                    # Raw-image wire: u16 patches + per-example f32
                    # (mn, inv) scalars; reconstruct the normalized f32
                    # input with the exact host formula
                    # (data_handling.reconstruct_normalized) -- convert,
                    # subtract, multiply, clip, all correctly rounded,
                    # so the wire changes no value.
                    x, xscale = x
                    mn = xscale[:, 0].reshape((-1,) + (1,) * (x.ndim - 1))
                    inv = xscale[:, 1].reshape((-1,) + (1,) * (x.ndim - 1))
                    x = jnp.clip(
                        (x.astype(jnp.float32) - mn) * inv, 0.0, 1.0
                    )
                x, label = augment_batch(key, x, y)
                y = targets_from_labels(label, affinity)
            elif jnp.issubdtype(y.dtype, jnp.integer):
                # Label-wire batches (uint16/uint32 compact labels):
                # derive the targets here instead of shipping 12
                # B/voxel of f32 channels from the host.
                y = targets_from_labels(y, affinity)

            def loss_fn(p):
                logits, updates = module.apply(
                    {"params": p, "batch_stats": batch_stats},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                per_ex = optax.sigmoid_binary_cross_entropy(
                    logits.astype(jnp.float32), y
                ).mean(axis=tuple(range(1, logits.ndim)))
                # padded (mask-0) examples contribute nothing to the
                # loss or gradients
                loss = (per_ex * w).sum() / jnp.maximum(w.sum(), 1.0)
                return loss, (logits, updates["batch_stats"])

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            if quirk:
                grad_accum = jax.tree.map(
                    lambda a, g: a + g, grad_accum, grads
                )
                grads = grad_accum
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            precision, recall = batch_precision_recall(
                logits[..., 0].astype(jnp.float32), y[..., 0]
            )
            return (
                params, new_stats, opt_state, grad_accum, loss, precision,
                recall,
            )

        donate = (0, 1, 2, 3)
        return jax.jit(step, donate_argnums=donate)

    def _build_eval_step(self):
        module = self.module
        affinity = self.affinity_mode
        targets_from_labels = self._targets_from_labels

        def step(params, batch_stats, x, y, w):
            if jnp.issubdtype(y.dtype, jnp.integer):
                y = targets_from_labels(y, affinity)
            logits = module.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=False,
            )
            per_ex = optax.sigmoid_binary_cross_entropy(
                logits.astype(jnp.float32), y
            ).mean(axis=tuple(range(1, logits.ndim)))
            loss = (per_ex * w).sum() / jnp.maximum(w.sum(), 1.0)
            precision, recall = batch_precision_recall(
                logits[..., 0].astype(jnp.float32), y[..., 0]
            )
            return loss, precision, recall

        return jax.jit(step)

    # --- loop ---

    def run(self, train_dataset, val_dataset):
        """Train/validate for max_epochs (reference train.py:89-121)."""
        exp_name = os.path.basename(os.path.normpath(self.log_dir))
        print("\nExperiment:", exp_name)
        start = self.epoch
        for epoch in range(start, self.max_epochs):
            self.epoch = epoch
            self._set_lr(self.schedule(epoch))
            train_stats = self.train_step(train_dataset, epoch)
            val_stats, new_best = self.validate_step(val_dataset, epoch)
            print(f"\nEpoch {epoch}: " + ("New Best!" if new_best else " "))
            self.report_stats(train_stats, is_train=True)
            self.report_stats(val_stats, is_train=False)
        return self.best_f1

    def _set_lr(self, lr):
        # inject_hyperparams exposes learning_rate inside opt_state
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr, dtype=jnp.float32
        )

    def _to_device_batch(self, xs, ys):
        """Returns (x, y, example-mask); integer label targets stay
        integral (float32 would corrupt segment ids >= 2^24 before the
        on-device affinity computation). Raw-wire batches arrive with x
        as a (u16 patches, f32 scalars) tuple and ship as a pytree the
        jitted step reconstructs from."""
        raw_wire = isinstance(xs, tuple)
        if raw_wire:
            xs, xscale = xs
            xs = np.moveaxis(xs, 1, -1)  # NDHWC, uint16
        else:
            xs = np.moveaxis(xs, 1, -1).astype(np.float32)
        if (
            not raw_wire
            and self.wire_labels
            and not self.device_augment
            and self.module.dtype == jnp.bfloat16
        ):
            # bf16 image wire: the forward's first op casts x to the
            # module dtype, so pre-rounding on the host (numpy
            # ml_dtypes astype and XLA convert both round to nearest
            # even) ships half the bytes and changes no value --
            # logits, loss, and metrics all come out of f32 upcasts of
            # the same bf16 stream (tests/test_training.py pins the
            # rounding equality). device_augment jitters intensity in
            # f32 BEFORE the model cast, so it keeps the f32 wire.
            import ml_dtypes

            xs = xs.astype(ml_dtypes.bfloat16)  # NDHWC
        ys = np.moveaxis(ys, 1, -1)
        if not np.issubdtype(ys.dtype, np.integer):
            ys = ys.astype(np.float32)
        n_real = xs.shape[0]
        if self.mesh is None:
            mask = jnp.ones(n_real, jnp.float32)
            x = jnp.asarray(xs)
            if raw_wire:
                x = (x, jnp.asarray(xscale))
            return x, jnp.asarray(ys), mask
        n_dev = self.mesh.devices.size
        pad = (-n_real) % n_dev
        if pad:  # ragged final batch: repeat the tail to fill shards,
            # masked out of loss/gradients/metrics by the example mask
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, 0)])
            ys = np.concatenate([ys, np.repeat(ys[-1:], pad, 0)])
            if raw_wire:
                xscale = np.concatenate(
                    [xscale, np.repeat(xscale[-1:], pad, 0)]
                )
        mask = np.concatenate(
            [np.ones(n_real, np.float32), np.zeros(pad, np.float32)]
        )
        mask_sharding = jax.sharding.NamedSharding(
            self.mesh,
            jax.sharding.PartitionSpec(self.mesh.axis_names[0]),
        )

        # make_array_from_callback works on multi-process meshes (each
        # process materializes only its addressable batch shards of the
        # identical host batch); single-process it equals device_put.
        def put(arr, sharding):
            return jax.make_array_from_callback(
                arr.shape, sharding, lambda idx: arr[idx]
            )

        x = put(xs, self._batch_sharding)
        if raw_wire:  # (B, 2) scalars shard on the batch axis too
            x = (x, put(xscale, mask_sharding))
        return (
            x,
            put(ys, self._batch_sharding),
            put(mask, mask_sharding),
        )

    def _resolve_device_augment(self, dataset):
        """Resolve ``device_augment=None`` (auto) against the dataset.

        Auto enables the on-device augmentation path exactly when the
        dataset ships raw label patches; the jitted step is rebuilt
        once on the flip. ``True`` against a host-transformed dataset
        is a contract error (its float targets cannot be re-augmented).
        """
        eligible = bool(getattr(dataset, "return_label_patches", False))
        if self.device_augment is None and eligible:
            self.device_augment = True
            self._train_step = self._build_train_step()
        elif self.device_augment and not eligible:
            raise ValueError(
                "device_augment needs TrainDataset("
                "return_label_patches=True): this dataset ships "
                "host-transformed targets that cannot be re-augmented "
                "on device"
            )

    def _apply_wire_mode(self, dataset):
        """Switch a BaseDataset to the compact-label wire when enabled.

        Device-augment datasets (return_label_patches) additionally get
        the raw-image wire when every input volume is u8/u16 with an
        integral brightness clip: batches then ship compact u16 labels
        plus clipped u16 patches + per-patch f32 (mn, inv) scalars --
        3.5 B/voxel instead of 8 -- and the jitted step reconstructs the
        bit-identical f32 input (data_handling.reconstruct_normalized).
        """
        if not (self.wire_labels and hasattr(dataset, "wire_labels")):
            return
        dataset.wire_labels = True
        if getattr(dataset, "return_label_patches", False):
            clip = dataset.brightness_clip
            dataset.wire_raw_images = float(clip) == int(clip) and all(
                np.dtype(getattr(img, "dtype", np.float32)).kind == "u"
                and np.dtype(img.dtype).itemsize <= 2
                for img in dataset.input_imgs
            )

    def _fetch_metric(self, arr):
        """Per-example metric vector as numpy; on multi-process meshes
        the batch axis spans processes, so an allgather materializes the
        global vector on every host first."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return np.asarray(
                multihost_utils.process_allgather(arr, tiled=True)
            )
        return np.asarray(arr)

    def train_step(self, train_dataset, epoch):
        """Run one training epoch; returns the epoch's metric stats."""
        import time as _time

        from aind_exaspim_neuron_segmentation_tpu.machine_learning.data_handling import (  # noqa: E501
            prefetch_batches,
        )

        stats = {"f1": None, "precision": [], "recall": [], "loss": []}
        self._resolve_device_augment(train_dataset)
        self._apply_wire_mode(train_dataset)
        batches = (
            prefetch_batches(train_dataset, self.batch_size,
                             num_workers=self.num_workers)
            if self.prefetch
            else iterate_batches(train_dataset, self.batch_size)
        )
        # Device metrics stay device-resident until the epoch ends: a
        # per-step float() would synchronize and serialize host batch
        # production with the device step.
        pending = []
        self.input_wait_s = 0.0
        t_wait = _time.perf_counter()
        for step_idx, (xs, ys) in enumerate(batches):
            self.input_wait_s += _time.perf_counter() - t_wait
            n_real = (xs[0] if isinstance(xs, tuple) else xs).shape[0]
            x, y, w = self._to_device_batch(xs, ys)
            key = jax.random.fold_in(
                self._augment_key, epoch * 100003 + step_idx
            )
            (
                self.params, self.batch_stats, self.opt_state,
                self.grad_accum, loss, precision, recall,
            ) = self._train_step(
                self.params, self.batch_stats, self.opt_state,
                self.grad_accum, x, y, w, key,
            )
            pending.append((n_real, loss, precision, recall))
            t_wait = _time.perf_counter()
        for n_real, loss, precision, recall in pending:
            stats["loss"].append(float(loss))
            stats["precision"].extend(
                self._fetch_metric(precision)[:n_real].tolist()
            )
            stats["recall"].extend(
                self._fetch_metric(recall)[:n_real].tolist()
            )
        self.update_tensorboard(stats, epoch, "train_")
        return stats

    def validate_step(self, val_dataset, epoch):
        """Run one validation epoch; returns the epoch's metric stats."""
        from aind_exaspim_neuron_segmentation_tpu.machine_learning.data_handling import (  # noqa: E501
            prefetch_batches,
        )

        stats = {"f1": None, "precision": [], "recall": [], "loss": []}
        self._apply_wire_mode(val_dataset)
        batches = (
            prefetch_batches(val_dataset, self.batch_size,
                             num_workers=self.num_workers)
            if self.prefetch
            else iterate_batches(val_dataset, self.batch_size)
        )
        pending = []
        for xs, ys in batches:
            n_real = xs.shape[0]
            x, y, w = self._to_device_batch(xs, ys)
            pending.append(
                (n_real,)
                + self._eval_step(self.params, self.batch_stats, x, y, w)
            )
        for n_real, loss, precision, recall in pending:
            stats["loss"].append(float(loss))
            stats["precision"].extend(
                self._fetch_metric(precision)[:n_real].tolist()
            )
            stats["recall"].extend(
                self._fetch_metric(recall)[:n_real].tolist()
            )
        self.update_tensorboard(stats, epoch, "val_")
        if stats["f1"] > self.best_f1:
            self.best_f1 = stats["f1"]
            self.save_model(epoch)
            return stats, True
        return stats, False

    # --- reporting / checkpoints ---

    def report_stats(self, stats, is_train=True):
        """Print one-line epoch metrics (reference train.py formatting)."""
        summary = "   Train: " if is_train else "   Val: "
        summary += ", ".join(f"{k}={v:.4f}" for k, v in stats.items())
        print(summary)

    def update_tensorboard(self, stats, epoch, prefix):
        """Epoch F1 from nan-mean precision/recall (train.py:288-309)."""
        with np.errstate(invalid="ignore"):
            avg_p = np.nanmean(stats["precision"]) if stats["precision"] else np.nan
            avg_r = np.nanmean(stats["recall"]) if stats["recall"] else np.nan
        denom = avg_p + avg_r
        stats["f1"] = [2 * avg_p * avg_r / denom if denom > 0 else 0.0]
        for key, value in stats.items():
            with np.errstate(invalid="ignore"):
                stats[key] = float(np.nanmean(value)) if len(value) else 0.0
            if self.writer is not None:
                self.writer.add_scalar(prefix + key, stats[key], epoch)

    def _variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}

    def save_model(self, epoch):
        """Best-F1 ``.pth`` export (reference train.py:274-286 contract)."""
        date = datetime.today().strftime("%Y%m%d")
        filename = f"UNet3d-{date}-{epoch}-{self.best_f1:.4f}.pth"
        save_pth_checkpoint(
            os.path.join(self.log_dir, filename), self._variables()
        )

    def save_train_state(self, path=None):
        """Full resumable train state via Orbax (new vs reference)."""
        import orbax.checkpoint as ocp

        path = path or os.path.join(self.log_dir, "train_state")
        ckpt = ocp.StandardCheckpointer()
        state = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "meta": {
                "epoch": np.asarray(self.epoch, np.int64),
                "best_f1": np.asarray(self.best_f1, np.float64),
            },
        }
        if self.grad_accum is not None:
            state["grad_accum"] = self.grad_accum
        ckpt.save(os.path.abspath(path), state, force=True)
        ckpt.wait_until_finished()
        return path

    def restore_train_state(self, path):
        """Resume from an Orbax train-state directory."""
        import orbax.checkpoint as ocp

        ckpt = ocp.StandardCheckpointer()
        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "meta": {
                "epoch": np.asarray(self.epoch, np.int64),
                "best_f1": np.asarray(float(self.best_f1), np.float64),
            },
        }
        if self.grad_accum is not None:
            target["grad_accum"] = self.grad_accum
        state = ckpt.restore(os.path.abspath(path), target)
        if self.grad_accum is not None:
            self.grad_accum = state["grad_accum"]
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        self.opt_state = state["opt_state"]
        self.epoch = int(state["meta"]["epoch"]) + 1
        self.best_f1 = float(state["meta"]["best_f1"])
        return self

    def _make_writer(self):
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(log_dir=self.log_dir)
        except Exception:
            return None


def toCPU(tensor, to_numpy=False):
    """Surface parity helper (reference train.py:313-333).

    JAX arrays fetched to host are already NumPy-convertible, so both
    modes return an ndarray; ``to_numpy`` is accepted for call-site
    compatibility only.
    """
    del to_numpy
    return np.asarray(tensor)
