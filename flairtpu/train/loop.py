"""Jitted SPMD training/eval loop — the pytorch-lightning Trainer replacement.

Semantics map (reference -> here):

- Trainer.fit + DDP (tasks.py:83-104)      -> jit-compiled train step over a
  device mesh; batch sharded on the 'data' axis, params replicated, gradient
  all-reduce inserted by XLA over ICI.
- training_step/step (task_module.py:65-86) -> weighted CE on integer targets
  (the reference argmaxes its own one-hot masks back, task_module.py:71);
  out-of-range mask values map to class 0 exactly like an all-zero one-hot row.
- torchmetrics epoch metrics (task_module.py:31-59) -> one confusion matrix
  accumulated on device per epoch; weighted/per-class Jaccard derive from it.
- augmentations in DataLoader workers (tasks_utils.py:37-41) -> fused D4 ops
  on device inside the train step.
- ReduceLROnPlateau + SGD (tasks_utils.py:95-104) -> optax SGD with injected
  LR driven by a host-side plateau controller (no retrace on LR change).
- batchnorm/batch-size guard (tasks.py:14-30) -> fit() raises on batch_size=1.

The step computes in bf16 on TPU (fp32 elsewhere and for all BN statistics,
loss and metrics).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import partial
from pathlib import Path
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from flairtpu import config as cfgmod
from flairtpu.data.augment import augment_batch
from flairtpu.data.normalize import normalize_device
from flairtpu.data.patches import PatchDataset, PatchLoader
from flairtpu.models.factory import create_model, init_model
from flairtpu.ops.confmat import confusion_matrix, per_class_jaccard, weighted_jaccard
from flairtpu.parallel.mesh import (
    is_main_process, make_mesh, replicate, shard_batch)
from flairtpu.parallel.sharding import shard_tree, tree_shardings
from flairtpu.train import checkpoints as ckpt_lib
from flairtpu.train.logging import MetricsLogger
from flairtpu.train.optim import EarlyStopping, ReduceLROnPlateau, make_optimizer, set_learning_rate
from flairtpu.utils.logger import seed_everything


def default_compute_dtype():
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _largest_divisor(n: int, limit: int) -> int:
    """Largest d in [1, limit] dividing n (1 when none) — sizes the 'data'
    mesh axis so the global batch splits evenly."""
    return max((d for d in range(1, max(limit, 1) + 1) if n % d == 0),
               default=1)


# metric names the epoch loop always logs; per-class `val_iou_<name>` scalars
# (for weight!=0 classes) are also logged each epoch and are equally valid
# monitors — the reference's Lightning ModelCheckpoint can monitor any logged
# metric (ref tasks.py:47-56). We fail fast at fit() entry instead of raising
# mid-training like Lightning's MisconfigurationException.
_MONITORABLE_METRICS = frozenset(
    {"val_loss", "val_miou", "train_loss", "train_miou"})


def _validate_monitor(monitor: str, config: dict) -> None:
    if monitor in _MONITORABLE_METRICS:
        return
    if monitor.startswith("val_iou_"):
        name = monitor[len("val_iou_"):]
        logged = [n for n, w in zip(cfgmod.class_names(config),
                                    cfgmod.class_weights(config)) if w != 0]
        if name in logged:
            return
        raise ValueError(
            f"ckpt_monitor {monitor!r}: {name!r} is not a weight!=0 class "
            f"(per-class IoU is only logged for {sorted(logged)})")
    raise ValueError(
        f"ckpt_monitor {monitor!r} is not a logged metric; valid monitors: "
        f"{sorted(_MONITORABLE_METRICS)} or val_iou_<class-name> for any "
        "weight!=0 class")


@dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: int = 0

    def as_dict(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats,
                "opt_state": self.opt_state}


class SegmentationTrainer:
    """Builds the model + jitted steps from a validated train config."""

    def __init__(self, config: dict, mesh=None, dtype=None):
        self.config = config
        if config.get("bn_dtype"):  # fp32 default; bfloat16 opt-in (config.py)
            from flairtpu.models.resnet import set_bn_dtype

            set_bn_dtype(config["bn_dtype"])
        # parameter placement: 'replicated' (the reference's DDP layout),
        # 'fsdp' (large params shard over the data axis, ZeRO-3 analog) or
        # 'tensor' (2-D data x model mesh, Megatron analog) — see
        # flairtpu/parallel/sharding.py
        self.param_sharding = str(config.get("param_sharding", "replicated"))
        if self.param_sharding not in ("replicated", "fsdp", "tensor"):
            raise ValueError(
                f"param_sharding {self.param_sharding!r} is not one of "
                "replicated/fsdp/tensor")
        tp = int(config.get("tensor_parallel", 1))
        # spatial partitioning (the vision analog of sequence parallelism):
        # shard the image HEIGHT over a 'space' mesh axis so activations of
        # large patches (1024^2/2048^2) split across chips; XLA's SPMD
        # partitioner inserts conv halo exchanges over ICI. Params stay
        # replicated (or fsdp-sharded over 'data') — composing with the
        # Megatron 'tensor' layout would triple the collective families on a
        # 24M-param model for no memory win, so it is rejected.
        self.spatial_parallel = int(config.get("spatial_parallel", 1))
        if self.spatial_parallel > 1 and self.param_sharding == "tensor":
            raise ValueError(
                "spatial_parallel > 1 cannot combine with param_sharding: "
                "tensor (use replicated or fsdp)")
        if mesh is None:
            ndev = len(jax.devices())
            if self.spatial_parallel > 1:
                sp = self.spatial_parallel
                if ndev % sp:
                    raise ValueError(
                        f"spatial_parallel {sp} must divide the device "
                        f"count {ndev}")
                navail = ndev // sp
                n_data = _largest_divisor(
                    int(config.get("batch_size", navail)), navail)
                mesh = make_mesh(("data", "space"), shape=(n_data, sp),
                                 devices=jax.devices()[: n_data * sp])
            elif self.param_sharding == "tensor":
                if tp < 2 or ndev % tp:
                    raise ValueError(
                        f"tensor_parallel {tp} must be >= 2 and divide the "
                        f"device count {ndev}")
                navail = ndev // tp
                n_data = _largest_divisor(
                    int(config.get("batch_size", navail)), navail)
                mesh = make_mesh(("data", "model"), shape=(n_data, tp),
                                 devices=jax.devices()[: n_data * tp])
            else:
                # the data axis must divide the global batch; use the largest
                # divisor of batch_size that fits the device count
                n_data = _largest_divisor(
                    int(config.get("batch_size", ndev)), ndev)
                mesh = make_mesh(devices=jax.devices()[:n_data])
        if self.param_sharding == "tensor":
            if "model" not in mesh.axis_names:
                raise ValueError(
                    "param_sharding: tensor needs a mesh with a 'model' axis "
                    f"(got axes {mesh.axis_names})")
            if tp > 1 and int(mesh.shape["model"]) != tp:
                # a silently-ignored degree would diverge config from layout
                raise ValueError(
                    f"tensor_parallel {tp} does not match the mesh's "
                    f"'model' axis size {int(mesh.shape['model'])}")
        if self.spatial_parallel > 1:
            if "space" not in mesh.axis_names:
                raise ValueError(
                    "spatial_parallel > 1 needs a mesh with a 'space' axis "
                    f"(got axes {mesh.axis_names})")
            if int(mesh.shape["space"]) != self.spatial_parallel:
                raise ValueError(
                    f"spatial_parallel {self.spatial_parallel} does not "
                    "match the mesh's 'space' axis size "
                    f"{int(mesh.shape['space'])}")
        self.mesh = mesh
        self.dtype = dtype or default_compute_dtype()
        self.num_classes = cfgmod.num_classes(config)
        self.use_metadata = bool(config.get("use_metadata", False))
        self.use_augmentation = bool(config.get("use_augmentation", False))
        weights = cfgmod.class_weights(config) if config.get("use_weights", True) \
            else [1.0] * self.num_classes
        self.class_weights = jnp.asarray(weights, jnp.float32)
        self.norm = dict(
            norm_type=config.get("norm_type", "scaling"),
            means=tuple(config.get("norm_means") or ()),
            stds=tuple(config.get("norm_stds") or ()),
        )
        self.model = create_model(config, dtype=self.dtype)
        # gradient accumulation (Lightning accumulate_grad_batches analog,
        # reference tasks.py:83-93's Trainer knobs): the jitted step scans
        # `accumulate_steps` microbatches, averaging grads before ONE
        # optimizer update — effective batch = batch_size at the activation
        # memory of batch_size / accumulate_steps
        self.accumulate_steps = int(config.get("accumulate_steps", 1))
        bs = int(config.get("batch_size", 0) or 0)
        if self.accumulate_steps > 1 and bs % self.accumulate_steps:
            raise ValueError(
                f"batch_size {bs} is not divisible by accumulate_steps "
                f"{self.accumulate_steps}")
        # optional auxiliary segmentation loss (UperNet family; HF trains with
        # weight 0.4 — the reference's Lightning path never does, so default 0)
        self.aux_weight = float(config.get("auxiliary_loss_weight", 0.0))
        if self.aux_weight and not getattr(self.model, "with_aux_head", False):
            raise ValueError(
                "auxiliary_loss_weight set but the model has no auxiliary head")
        init_hw = 512 if self.use_metadata else 64
        n_ch = len(config["channels"])
        self.params, self.batch_stats = init_model(
            self.model, (1, init_hw, init_hw, n_ch), seed=config.get("seed", 2022))
        self.tx = make_optimizer(float(config.get("learning_rate", 0.02)))
        self.opt_state = self.tx.init(self.params)
        self._train_step = None
        self._eval_step = None
        self._predict_step = None

    # -- state plumbing --

    def state(self) -> TrainState:
        return TrainState(self.params, self.batch_stats, self.opt_state)

    def load_state(self, state_dict: dict):
        self.params = state_dict["params"]
        self.batch_stats = state_dict["batch_stats"]
        if "opt_state" in state_dict and state_dict["opt_state"] is not None:
            self.opt_state = state_dict["opt_state"]

    def _shard_axis(self) -> str | None:
        return {"replicated": None, "fsdp": "data",
                "tensor": "model"}[self.param_sharding]

    def shard_to_mesh(self):
        """Place the train state on the mesh per ``param_sharding``."""
        axis = self._shard_axis()
        if axis is None:
            rep = replicate(self.mesh)
            self.params = jax.device_put(self.params, rep)
            self.batch_stats = jax.device_put(self.batch_stats, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
        else:
            self.params = shard_tree(self.params, self.mesh, axis)
            self.batch_stats = shard_tree(self.batch_stats, self.mesh, axis)
            self.opt_state = shard_tree(self.opt_state, self.mesh, axis)

    # historical name (the DDP layout was the only one): kept for callers
    replicate_to_mesh = shard_to_mesh

    # -- loss --

    def _loss(self, logits: jax.Array, targets: jax.Array):
        """torch CrossEntropyLoss(weight=w) parity: weighted mean NLL.

        Written as a one-hot masked reduce rather than ``take_along_axis``:
        8.4M-element gathers execute on the TPU scalar unit (profiled at
        ~200 ms/step at batch 32, half the step), while the one-hot form
        fuses into the log-softmax as a vectorized select+reduce. The sums
        are term-for-term identical, so values and gradients are unchanged.
        """
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        onehot_w = jax.nn.one_hot(targets, logits.shape[-1],
                                  dtype=jnp.float32) * self.class_weights
        loss_sum = -jnp.sum(logp * onehot_w)
        w_sum = jnp.sum(onehot_w)
        return loss_sum / jnp.maximum(w_sum, 1e-8)

    def _clean_targets(self, msk: jax.Array) -> jax.Array:
        # out-of-range classes -> 0, matching argmax of an all-zero one-hot row
        # (reference data_loader.py:65-69 + task_module.py:71)
        return jnp.where((msk >= 0) & (msk < self.num_classes), msk, 0)

    def _apply(self, variables, x, mtd, train, rngs=None, mutable=False,
               return_aux=False):
        args = (x, mtd) if self.use_metadata else (x,)
        kwargs = {"return_aux": True} if return_aux else {}
        return self.model.apply(variables, *args, train=train, rngs=rngs,
                                mutable=["batch_stats"] if mutable else False,
                                **kwargs)

    # -- steps --

    def _micro_step(self, params, batch_stats, x, tgt, mtd, dropout_key):
        """One fwd+bwd on a (micro)batch; returns (grads, stats, loss, cm).

        Shared by the plain train step and the accumulate_steps scan; exposed
        as a method so tests can replay the accumulation explicitly
        (tests/test_remat_accum.py).
        """

        def loss_fn(p):
            use_aux = self.aux_weight > 0
            out, mut = self._apply(
                {"params": p, "batch_stats": batch_stats}, x, mtd,
                train=True, rngs={"dropout": dropout_key}, mutable=True,
                return_aux=use_aux)
            if use_aux:
                logits, aux = out
                loss = self._loss(logits, tgt) + \
                    self.aux_weight * self._loss(aux, tgt)
                return loss, (mut["batch_stats"], logits)
            return self._loss(out, tgt), (mut["batch_stats"], out)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        cm = confusion_matrix(jnp.argmax(logits, axis=-1), tgt,
                              self.num_classes)
        return grads, new_stats, loss, cm

    def train_step(self):
        if self._train_step is not None:
            return self._train_step

        micro = self._micro_step

        # fsdp/tensor: pin the updated state's layout to the input layout so
        # XLA keeps the sharded buffers resident (and donation stays clean);
        # the rule is shape-based, so computing it from the current state is
        # exact whether or not shard_to_mesh already ran
        constrain = None
        axis = self._shard_axis()
        if axis is not None:
            constrain = (
                tree_shardings(self.params, self.mesh, axis),
                tree_shardings(self.batch_stats, self.mesh, axis),
                tree_shardings(self.opt_state, self.mesh, axis),
            )

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def step(params, batch_stats, opt_state, img, msk, mtd, rng):
            # the rng advances ON DEVICE and is returned for the next call:
            # an eager fold_in per step costs a full dispatch round trip on
            # remote/tunneled backends (measured seconds-level under bad
            # tunnel weather), so callers chain next_rng instead
            next_rng, aug_key, dropout_key = jax.random.split(rng, 3)
            tgt = self._clean_targets(msk)
            if self.use_augmentation:
                img, tgt = augment_batch(img, tgt, aug_key)
            x = normalize_device(img, src_dtype=np.uint8, **self.norm)

            A = self.accumulate_steps
            if A == 1:
                grads, new_stats, loss, cm = micro(
                    params, batch_stats, x, tgt, mtd, dropout_key)
            else:
                # lax.scan over microbatches: activations live only for one
                # microbatch; the carry holds the (param-sized) grad sum and
                # the chained BN stats. Loss = mean over microbatches and
                # grads averaged — Lightning accumulate_grad_batches
                # semantics (each microbatch's weighted-CE normalizes by its
                # own weight sum)
                B = x.shape[0]
                xm = x.reshape(A, B // A, *x.shape[1:])
                tm = tgt.reshape(A, B // A, *tgt.shape[1:])
                mm = mtd.reshape(A, B // A, *mtd.shape[1:])
                keys = jax.random.split(dropout_key, A)

                def scan_fn(carry, mb):
                    gacc, stats = carry
                    xs, ts, ms, key = mb
                    grads, stats, loss, cm = micro(params, stats, xs, ts, ms, key)
                    gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
                    return (gacc, stats), (loss, cm)

                init = (jax.tree_util.tree_map(jnp.zeros_like, params),
                        batch_stats)
                (gacc, new_stats), (losses, cms) = jax.lax.scan(
                    scan_fn, init, (xm, tm, mm, keys))
                grads = jax.tree_util.tree_map(lambda g: g / A, gacc)
                loss = jnp.mean(losses)
                cm = jnp.sum(cms, axis=0)

            updates, new_opt = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if constrain is not None:
                params = jax.lax.with_sharding_constraint(params, constrain[0])
                new_stats = jax.lax.with_sharding_constraint(
                    new_stats, constrain[1])
                new_opt = jax.lax.with_sharding_constraint(new_opt, constrain[2])
            return params, new_stats, new_opt, loss, cm, next_rng

        self._train_step = step
        return step

    def eval_step(self):
        if self._eval_step is not None:
            return self._eval_step

        @jax.jit
        def step(params, batch_stats, img, msk, mtd):
            tgt = self._clean_targets(msk)
            x = normalize_device(img, src_dtype=np.uint8, **self.norm)
            logits = self._apply({"params": params, "batch_stats": batch_stats},
                                 x, mtd, train=False)
            loss = self._loss(logits, tgt)
            preds = jnp.argmax(logits, axis=-1)
            return loss, confusion_matrix(preds, tgt, self.num_classes)

        self._eval_step = step
        return step

    def predict_step(self):
        if self._predict_step is not None:
            return self._predict_step

        @jax.jit
        def step(params, batch_stats, img, mtd):
            x = normalize_device(img, src_dtype=np.uint8, **self.norm)
            logits = self._apply({"params": params, "batch_stats": batch_stats},
                                 x, mtd, train=False)
            # softmax then argmax == argmax of logits (task_module.py:206-213)
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

        self._predict_step = step
        return step

    # -- batch plumbing --

    def _put(self, batch: dict) -> tuple:
        spatial = "space" if self.spatial_parallel > 1 else None
        b = shard_batch(batch, self.mesh, spatial_axis=spatial)
        mtd = b.get("mtd")
        if self.use_metadata and mtd is None:
            raise ValueError("use_metadata=True but the batch has no 'mtd'")
        if not self.use_metadata:
            mtd = jnp.zeros((batch["img"].shape[0], 45), jnp.float32)
        return b["img"], b.get("msk"), mtd


def _epoch_metrics(loss_sum: float, n_batches: int, cm: np.ndarray) -> dict:
    miou = float(weighted_jaccard(jnp.asarray(cm)))
    return {"loss": loss_sum / max(n_batches, 1), "miou": miou}


def _drain_epoch(losses: list, cms: list) -> tuple[float, np.ndarray]:
    """ONE host fetch for a whole epoch's device-side loss/confmat outputs.

    Per-batch float(loss)/np.asarray(bcm) fetches block the dispatch
    pipeline every step and each carries the tunnel's seconds-level fixed
    D2H latency; the step outputs are tiny (a scalar and a KxK matrix), so
    holding them and stacking once per epoch is free."""
    if not losses:
        return 0.0, np.zeros((0, 0), np.int64)
    loss_sum = float(np.asarray(jnp.stack(losses)).sum())
    cm = np.asarray(jnp.sum(jnp.stack(cms), axis=0), np.int64)
    return loss_sum, cm


def evaluate(trainer: SegmentationTrainer, loader: PatchLoader) -> dict:
    step = trainer.eval_step()
    losses, cms = [], []
    for batch in loader:
        img, msk, mtd = trainer._put(batch)
        loss, bcm = step(trainer.params, trainer.batch_stats, img, msk, mtd)
        losses.append(loss)
        cms.append(bcm)
    loss_sum, cm = _drain_epoch(losses, cms)
    if cm.size == 0:
        cm = np.zeros((trainer.num_classes, trainer.num_classes), np.int64)
    m = _epoch_metrics(loss_sum, len(losses), cm)
    return {"val_loss": m["loss"], "val_miou": m["miou"], "confmat": cm}


def fit(config: dict, dict_train: dict, dict_val: dict, out_dir: str | Path,
        trainer: SegmentationTrainer | None = None,
        progress: Callable[[str], None] = print) -> tuple[SegmentationTrainer, dict]:
    """Full training stage (reference flair/main.py:150-185 + tasks.py:34-110)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    seed = int(config.get("seed", 2022))
    seed_everything(seed)

    batch_size = int(config["batch_size"])
    if batch_size == 1:
        raise SystemExit(
            "batch_size=1 with BatchNorm models is unsupported (reference "
            "tasks.py:14-30 aborts for the same reason); use batch_size >= 2.")

    monitor = config.get("ckpt_monitor", "val_loss")
    _validate_monitor(monitor, config)

    trainer = trainer or SegmentationTrainer(config)
    channels = config["channels"]
    train_ds = PatchDataset(dict_train, channels, use_metadata=trainer.use_metadata)
    val_ds = PatchDataset(dict_val, channels, use_metadata=trainer.use_metadata)
    nw = int(config.get("num_workers", 4))
    from flairtpu.data.grain_loader import make_loader

    backend = config.get("loader_backend", "threads")
    train_loader = make_loader(backend, train_ds, batch_size=batch_size,
                               shuffle=True, seed=seed, drop_last=True,
                               num_workers=nw)
    val_loader = make_loader(backend, val_ds, batch_size=batch_size,
                             shuffle=False, drop_last=True, num_workers=nw)

    # checkpoint / resume wiring (reference flair/main.py:150-175 semantics)
    tasks = config.get("tasks", {})
    train_tasks = tasks.get("train_tasks", {})
    ckpt_path = config.get("paths", {}).get("ckpt_model_path") or ""
    manager = ckpt_lib.CheckpointManager(
        out_dir, model_name=config.get("paths", {}).get("out_model_name") or "model",
        monitor=config.get("ckpt_monitor", "val_loss"),
        mode=config.get("ckpt_monitor_mode", "min"),
        save_last=bool(config.get("ckpt_save_also_last", True)),
        weights_only=bool(config.get("ckpt_weights_only", False)))

    # pretrained-encoder init (the reference's implicit imagenet init:
    # smp.create_model defaults encoder_weights='imagenet', ref
    # src/flair/model.py:35-41); applied BEFORE any checkpoint init/resume,
    # exactly as smp initializes at model construction and Lightning's
    # ckpt loading then overwrites
    enc_weights = config.get("init_encoder_weights") or ""
    if enc_weights:
        from flairtpu.models.pretrained import init_encoder_from_classifier
        from flairtpu.models.registry import check_smp

        mf = config["model_framework"]
        if mf["model_provider"] != "SegmentationModelsPytorch":
            raise ValueError(
                "init_encoder_weights applies to the SegmentationModelsPytorch "
                "provider only; for HuggingFace models use init_hf_pretrained "
                "with a local transformers checkpoint")
        encoder_name, _ = check_smp(
            mf["SegmentationModelsPytorch"]["encoder_decoder"])
        variables = init_encoder_from_classifier(
            enc_weights, encoder_name, len(config["channels"]),
            {"params": trainer.params, "batch_stats": trainer.batch_stats})
        trainer.load_state(variables)
        progress(f"    [x] encoder initialized from classifier weights "
                 f"{enc_weights}")

    # HF-provider pretrained init (the reference HF path is ALWAYS pretrained:
    # from_pretrained + ignore_mismatched_sizes head re-init, ref
    # src/flair/model.py:43-50); like init_encoder_weights above, applied
    # BEFORE any checkpoint init/resume so a checkpoint still wins
    hf_pretrained = config.get("init_hf_pretrained") or ""
    if hf_pretrained:
        from flairtpu.models.hf_pretrained import init_hf_from_pretrained

        if config["model_framework"]["model_provider"] != "HuggingFace":
            raise ValueError(
                "init_hf_pretrained applies to the HuggingFace provider only")
        variables, rep = init_hf_from_pretrained(
            hf_pretrained,
            {"params": trainer.params, "batch_stats": trainer.batch_stats})
        trainer.load_state(variables)
        progress(f"    [x] HF weights initialized from {hf_pretrained} "
                 f"({len(rep['loaded'])} tensors loaded, "
                 f"{len(rep['reinitialized'])} kept at fresh init)")

    start_epoch = 0
    if train_tasks.get("init_weights_only_from_ckpt") and ckpt_path:
        variables = ckpt_lib.init_weights_with_surgery(
            ckpt_path, {"params": trainer.params, "batch_stats": trainer.batch_stats})
        trainer.load_state(variables)
        progress(f"    [x] initialized weights from {ckpt_path}")
    elif train_tasks.get("resume_training_from_ckpt") and ckpt_path:
        like = dict(trainer.state().as_dict(), epoch=0, val_loss=0.0, val_miou=0.0,
                    train_loss=0.0, train_miou=0.0)
        restored = manager.restore(ckpt_path, like)
        trainer.load_state(restored)
        start_epoch = int(restored.get("epoch", -1)) + 1
        progress(f"    [x] resumed from {ckpt_path} at epoch {start_epoch}")

    # preemption-safe step-level autosave (no reference analog: Lightning
    # resumes at epoch granularity only, ref tasks.py:96-101 — on a
    # preemptible TPU pod that loses up to an epoch). When an autosave
    # snapshot exists, it wins over the epoch-level resume above: it is
    # strictly newer (written during a later in-flight epoch).
    autosaver = ckpt_lib.StepAutosaver(
        out_dir, int(config.get("autosave_every_steps", 0) or 0))
    autosave_host = None
    autosave_rng = None
    acc_loss, acc_n, acc_cm = 0.0, 0, None
    start_batch = 0
    if autosaver.every > 0 and bool(config.get("autosave_resume", True)):
        like = dict(trainer.state().as_dict(),
                    rng=np.zeros(np.shape(jax.random.PRNGKey(0)), np.uint32),
                    cm_sum=np.zeros((trainer.num_classes,) * 2, np.int64))
        snap = autosaver.restore(like)
        if snap is not None:
            arrays, autosave_host = snap
            autosave_rng = np.asarray(arrays.pop("rng"))
            acc_cm = np.asarray(arrays.pop("cm_sum"), np.int64)
            trainer.load_state(arrays)
            start_epoch = int(autosave_host["epoch"])
            start_batch = int(autosave_host["step"])
            acc_loss = float(autosave_host["loss_sum"])
            acc_n = int(autosave_host["n_batches"])
            progress(f"    [x] autosave resume: epoch {start_epoch + 1} "
                     f"step {start_batch}")

    trainer.replicate_to_mesh()
    plateau = ReduceLROnPlateau(lr=float(config.get("learning_rate", 0.02)))
    stopper = EarlyStopping(
        monitor_mode=config.get("ckpt_monitor_mode", "min"),
        patience=int(config.get("ckpt_earlystopping_patience", 30)))
    # shared-file writers are rank-0 only (reference @rank_zero_only +
    # Lightning's rank-gated TensorBoardLogger, tasks.py:73-76): on a
    # multi-host run every process would otherwise append duplicate JSONL
    # records and fight over one TensorBoard event file
    logger = MetricsLogger(out_dir) if is_main_process() else None
    class_names = cfgmod.class_names(config)
    class_w = cfgmod.class_weights(config)

    step = trainer.train_step()
    # one (cheap, one-off) host-side fold keeps resumed runs on the same
    # randomness stream position; inside the epoch loop the rng then chains
    # device-to-device through the jitted step with no per-step dispatch
    rng = jax.random.fold_in(jax.random.PRNGKey(seed), start_epoch)
    history: list[dict] = []
    if autosave_host is not None:  # mid-epoch state: rng + controller states
        rng = jnp.asarray(autosave_rng)
        for k, v in (autosave_host.get("plateau") or {}).items():
            setattr(plateau, k, v)
        trainer.opt_state = set_learning_rate(trainer.opt_state, plateau.lr)
        for k, v in (autosave_host.get("stopper") or {}).items():
            setattr(stopper, k, v)
        mstate = autosave_host.get("manager") or {}
        manager.best_metric = mstate.get("best_metric")
        if mstate.get("best_path"):
            manager.best_path = out_dir / mstate["best_path"]
        history[:] = autosave_host.get("history") or []
    t_start = time.time()

    def _progress_iter(iterable, desc):
        if not config.get("enable_progress_bar", True):
            return iterable
        try:
            from tqdm import tqdm

            return tqdm(iterable, desc=desc, total=len(train_loader), leave=False)
        except ImportError:
            return iterable

    num_epochs = int(config.get("num_epochs", 1))
    for epoch in range(start_epoch, num_epochs):
        losses, cms = [], []
        sb = start_batch if epoch == start_epoch else 0
        epoch_batches = train_loader.epoch_iter(epoch, sb)
        for bi, batch in enumerate(
                _progress_iter(epoch_batches,
                               f"epoch {epoch + 1}/{num_epochs}"), start=sb):
            img, msk, mtd = trainer._put(batch)
            (trainer.params, trainer.batch_stats, trainer.opt_state, loss,
             bcm, rng) = step(
                trainer.params, trainer.batch_stats, trainer.opt_state,
                img, msk, mtd, rng)
            losses.append(loss)
            cms.append(bcm)
            if autosaver.due(bi):
                # drain the held device outputs into the running host
                # accumulators (this D2H is the autosave's cost — amortized
                # over `every` steps), then snapshot everything
                dl, dc = _drain_epoch(losses, cms)
                acc_loss += dl
                acc_n += len(losses)
                acc_cm = dc if acc_cm is None else acc_cm + dc
                losses, cms = [], []
                autosaver.save(
                    arrays=dict(trainer.state().as_dict(), rng=rng,
                                cm_sum=acc_cm),
                    host={
                        "epoch": epoch, "step": bi + 1,
                        "loss_sum": acc_loss, "n_batches": acc_n,
                        "plateau": {
                            "lr": plateau.lr, "best": plateau.best,
                            "num_bad_epochs": plateau.num_bad_epochs,
                            "cooldown_counter": plateau.cooldown_counter},
                        "stopper": {"best": stopper.best, "wait": stopper.wait,
                                    "stopped": stopper.stopped},
                        "manager": {
                            "best_metric": manager.best_metric,
                            "best_path": (manager.best_path.name
                                          if manager.best_path else None)},
                        "history": history,
                    })
        loss_sum, cm = _drain_epoch(losses, cms)
        loss_sum += acc_loss
        n_batches = acc_n + len(losses)
        if cm.size == 0:
            cm = np.zeros((trainer.num_classes, trainer.num_classes), np.int64)
        if acc_cm is not None:
            cm = cm + acc_cm
        acc_loss, acc_n, acc_cm = 0.0, 0, None  # consumed by this epoch
        tm = _epoch_metrics(loss_sum, n_batches, cm)

        if epoch == start_epoch:  # profile the first epoch when enabled
            from flairtpu.utils.profiling import maybe_trace

            with maybe_trace("val-epoch"):
                vm = evaluate(trainer, val_loader)
        else:
            vm = evaluate(trainer, val_loader)
        per_class = np.asarray(per_class_jaccard(jnp.asarray(vm["confmat"])))

        scalars = {"train_loss": tm["loss"], "train_miou": tm["miou"],
                   "val_loss": vm["val_loss"], "val_miou": vm["val_miou"],
                   "lr": plateau.lr}
        for name, w, iou in zip(class_names, class_w, per_class):
            if w != 0:
                scalars[f"val_iou_{name}"] = float(iou)
        if logger is not None:
            logger.log(epoch, scalars)
        progress(
            f"    epoch {epoch + 1}/{num_epochs}  train_loss={tm['loss']:.4f} "
            f"val_loss={vm['val_loss']:.4f} val_miou={vm['val_miou']:.4f} "
            f"lr={plateau.lr:.2e}")

        metrics = {"val_loss": vm["val_loss"], "val_miou": vm["val_miou"],
                   "train_loss": tm["loss"], "train_miou": tm["miou"]}
        if monitor not in metrics:  # per-class val_iou_<name> monitor
            metrics[monitor] = scalars[monitor]
        manager.on_epoch_end(epoch, metrics, trainer.state().as_dict())
        history.append({"epoch": epoch, **metrics})

        # The reference scheduler always monitors val_loss in min mode
        # regardless of ckpt_monitor (task_module.py:156-168 hardcodes
        # monitor='val_loss'; tasks_utils.py:95-104 mode='min'); only
        # checkpointing/early-stopping follow ckpt_monitor (tasks.py:47-63).
        new_lr = plateau.step(vm["val_loss"])
        trainer.opt_state = set_learning_rate(trainer.opt_state, new_lr)
        if stopper.step(metrics[manager.monitor]):
            progress(f"    [x] early stopping at epoch {epoch + 1}")
            break

    autosaver.clear()  # finished normally: later runs must not resume this
    elapsed = time.time() - t_start
    progress(f"    [x] training time: "
             f"{int(elapsed // 3600):02d}:{int(elapsed % 3600 // 60):02d}:{int(elapsed % 60):02d}")
    if is_main_process():
        ckpt_lib.write_history(out_dir, history)
    if logger is not None:
        logger.close()

    # reload best weights (reference flair/main.py:175)
    if manager.best_path is not None:
        like = dict(trainer.state().as_dict(), epoch=0, val_loss=0.0, val_miou=0.0,
                    train_loss=0.0, train_miou=0.0)
        if manager.weights_only:
            like = {k: like[k] for k in ("params", "batch_stats")}
        best = manager.restore_best(like)
        trainer.load_state(best)
        progress(f"    [x] restored best checkpoint: {manager.best_path.name}")
        final = evaluate(trainer, val_loader)  # post-fit validate (tasks.py:107)
        progress(f"    [x] best-checkpoint validation: val_loss={final['val_loss']:.4f} "
                 f"val_miou={final['val_miou']:.4f}")
    return trainer, {"history": history, "best_path": str(manager.best_path),
                     "seconds": elapsed}
