"""Training driver: the functional replacement for the reference's
train.py main loop + Runner_t/Runner_v (src/tools/train.py:13-121,
src/utils/method.py:12-309).

Per epoch: jitted train steps over the sharded loader -> jitted eval steps
-> early-stopping bookkeeping (best val loss, patience counter --count) ->
best-only checkpoint -> cosine LR step. Scalars Loss/train & Loss/valid per
epoch; validation log reports EPE in mm (x0.26, method.py:131) and PCK%
(T=0.2 proportion, method.py:243).
"""

from __future__ import annotations

import dataclasses
import os
import shutil
import time
from typing import Optional

import jax
import numpy as np

from lighthand_tpu.config import Config
from lighthand_tpu.core.dtypes import DTypePolicy
from lighthand_tpu.core.mesh import MeshSpec, create_mesh, replicated_sharding
from lighthand_tpu.data import DevicePreprocessor, Loader, build_dataset
from lighthand_tpu.models import get_model
from lighthand_tpu.ops.metrics import PX_TO_MM_VALID_LOG
from lighthand_tpu.train.checkpoint import (
    checkpoint_exists,
    load_weights_only,
    resume_checkpoint,
    save_checkpoint,
)
from lighthand_tpu.train.state import (
    TrainState,
    cosine_lr,
    create_train_state,
    set_learning_rate,
)
from lighthand_tpu.train.step import (
    make_eval_step,
    make_fused_train_step,
)
from lighthand_tpu.utils.logging import ScalarWriter, colored, setup_logger
from lighthand_tpu.utils.meters import AverageMeter
from lighthand_tpu.utils.progress import Bar


@dataclasses.dataclass
class EpochResult:
    train_loss: float
    val_loss: float
    pck: float
    epe_px: float
    images_per_sec: float


def _policy(cfg: Config) -> DTypePolicy:
    if cfg.model.precision == "f32":
        return DTypePolicy.full_precision()
    if cfg.model.precision == "all_bf16":
        return DTypePolicy.all_bf16()  # bf16 BatchNorm too (+6% on v5e)
    return DTypePolicy()


def _maybe_reset(cfg: Config, logger) -> None:
    """--reset semantics (argparser.py:121-139): confirm (unless --yes) and
    wipe the run + tensorboard dirs."""
    ckpt = os.path.join(cfg.output_dir, "checkpoint-good")
    if not (os.path.isdir(ckpt) and os.listdir(ckpt)):
        return
    if not cfg.train.assume_yes:
        ans = input("There is resume_point but do you want to delete?")
        if ans not in ("o", "y", "yes"):
            return
    for path in (cfg.tensorboard_dir, cfg.output_dir):
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.makedirs(path, exist_ok=True)
    logger.info(colored("Ignore the check-point model", "green"))


class Trainer:
    def __init__(self, cfg: Config):
        from lighthand_tpu.core.cache import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        os.makedirs(cfg.output_dir, exist_ok=True)
        self.logger = setup_logger(cfg.name, cfg.output_dir)
        t0 = time.time()
        self.mesh = create_mesh(MeshSpec(cfg.mesh.data, cfg.mesh.model))
        self.policy = _policy(cfg)

        self.model = get_model(cfg.model.name, cfg.model.num_joints,
                               policy=self.policy)
        rng = jax.random.PRNGKey(cfg.train.seed)
        self.rng, init_rng = jax.random.split(rng)
        size = cfg.data.image_size
        self.state: TrainState = create_train_state(
            self.model, init_rng, input_shape=(1, size, size, 3),
            lr=cfg.train.lr,
        )
        self.logger.debug(f"init params: {time.time() - t0:.1f}s")
        t0 = time.time()
        self.state = jax.device_put(self.state,
                                    replicated_sharding(self.mesh))
        jax.block_until_ready(self.state.params)
        self.logger.debug(f"device_put state: {time.time() - t0:.1f}s")

        self.best_loss = float("inf")
        self.start_epoch = 0
        self.count = 0
        t0 = time.time()
        self._setup_checkpoint_state()
        self.logger.debug(f"checkpoint setup: {time.time() - t0:.1f}s")

        hm = cfg.data.heatmap_size
        stride = size / hm
        self.scan_steps = max(1, cfg.train.steps_per_dispatch)
        self.train_step = make_fused_train_step(
            heatmap_size=hm, stride=stride, jitter=True,
            scan_steps=self.scan_steps,
        )
        self.eval_step = make_eval_step(heatmap_size=hm, stride=stride)
        self.preprocess = DevicePreprocessor(jitter=False)  # eval path
        self.writer = ScalarWriter(cfg.tensorboard_dir,
                                   jsonl_dir=cfg.output_dir)

    # -- checkpoint / reset / transfer wiring (argparser.py:103-191) --------

    def _setup_checkpoint_state(self):
        cfg = self.cfg
        if cfg.train.reset:
            _maybe_reset(cfg, self.logger)
        elif checkpoint_exists(cfg.output_dir):
            self.best_loss, self.start_epoch, self.state, self.count = (
                resume_checkpoint(
                    self.state, cfg.output_dir,
                    restore_optimizer=not cfg.train.reset_optimizer,
                )
            )
            self.logger.info(
                colored(f"Loading ===> {cfg.output_dir}", "green"))
        if cfg.train.transfer:
            src = os.path.join("output", cfg.model.name, "frei", "ori",
                               "checkpoint-good")
            self.state = load_weights_only(self.state, src)
            self.logger.info(colored(f"Transfer_Loading ===> {src}", "green"))

    # -- data ---------------------------------------------------------------

    def make_loaders(self):
        cfg = self.cfg
        train_src, val_src = build_dataset(cfg)
        train_loader = Loader(
            train_src, cfg.data.batch_size, mesh=self.mesh, shuffle=True,
            seed=cfg.data.shuffle_seed, num_workers=cfg.data.num_workers,
            prefetch=cfg.data.prefetch,
        )
        val_loader = Loader(
            val_src, cfg.data.batch_size, mesh=self.mesh, shuffle=False,
            num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch,
        )
        return train_loader, val_loader

    # -- epoch bodies ---------------------------------------------------------

    def run_train_epoch(self, loader: Loader, epoch: int) -> tuple[float, float]:
        cfg = self.cfg
        loader.set_epoch(epoch)
        losses = AverageMeter()
        bar = Bar(colored(f"{epoch}_TRAIN", "blue"), max=len(loader))
        self.rng, epoch_rng = jax.random.split(self.rng)

        import jax.numpy as jnp

        k = self.scan_steps
        n_images = 0
        t0 = time.time()
        pending_loss = None
        microbatches = []
        for it, batch in enumerate(loader):
            microbatches.append(batch)
            if len(microbatches) < k:
                bar.next()
                continue
            if k == 1:
                dispatch = {name: microbatches[0][name]
                            for name in ("image_u8", "joints", "aug_enabled")}
            else:
                dispatch = {
                    name: jnp.stack([b[name] for b in microbatches])
                    for name in ("image_u8", "joints", "aug_enabled")
                }
            microbatches = []
            self.rng, key = jax.random.split(self.rng)
            self.state, metrics = self.train_step(self.state, key, dispatch)
            n_images += k * cfg.data.batch_size
            # read the PREVIOUS dispatch's loss: keeps the pipeline full
            if pending_loss is not None:
                losses.update(float(pending_loss), k * cfg.data.batch_size)
            pending_loss = metrics["loss"]
            if it % cfg.train.logging_steps == 0:
                bar.suffix = (f"loss: {losses.avg:.6f} | count: {self.count}")
            bar.next()
        if pending_loss is not None:
            losses.update(float(pending_loss), k * cfg.data.batch_size)
        bar.finish()
        elapsed = time.time() - t0
        ips = n_images / elapsed if elapsed > 0 else 0.0
        self.writer.add_scalar("Loss/train", losses.avg, epoch)
        self.writer.add_scalar("perf/images_per_sec", ips, epoch)
        return losses.avg, ips

    def run_valid_epoch(self, loader: Loader, epoch: int):
        losses, pcks, epes = AverageMeter(), AverageMeter(), AverageMeter()
        bar = Bar(colored(f"{epoch}_VALID", "blue"), max=len(loader))
        vis_iters = {0, len(loader) // 2, len(loader) - 1}
        for it, batch in enumerate(loader):
            self.rng, key = jax.random.split(self.rng)
            images = self.preprocess(
                key, batch["image_u8"],
                np.zeros(batch["image_u8"].shape[0], np.float32),
            )
            m = self.eval_step(self.state,
                               {"image": images, "joints": batch["joints"]})
            b = batch["image_u8"].shape[0]
            losses.update(float(m["loss"]), b)
            pcks.update(float(m["pck"]), b)
            epes.update_p(float(m["epe_sum"]), float(m["epe_count"]))
            if self.cfg.train.visualize and it in vis_iters:
                self._save_overlay(images, batch["joints"],
                                   m["pred_joints"], "val", epoch, it)
            bar.next()
        bar.finish()
        self.writer.add_scalar("Loss/valid", losses.avg, epoch)
        self.logger.debug(
            f"Test =>> epoch: {epoch} epe: {epes.avg * PX_TO_MM_VALID_LOG:.2f}mm, "
            f"count: {self.count} / {self.cfg.train.early_stop_count}, "
            f"total_pck: {pcks.avg * 100:.2f} %, best_loss: {self.best_loss:.7f}"
        )
        return losses.avg, pcks.avg * 100, epes.avg

    def _save_overlay(self, images, gt_joints, pred_joints, phase, epoch, it):
        from lighthand_tpu.utils.visualize import save_overlay

        try:
            save_overlay(
                np.asarray(images[0]),
                np.asarray(gt_joints[0]),
                np.asarray(pred_joints[0]),
                self.cfg.output_dir, phase, epoch, it,
            )
        except Exception as e:  # overlay failure must never kill training
            self.logger.debug(f"overlay failed: {e}")

    # -- full run -------------------------------------------------------------

    def fit(self) -> EpochResult:
        cfg = self.cfg
        train_loader, val_loader = self.make_loaders()
        self.logger.info(colored(
            f"Path: {cfg.output_dir} | Dataset_len: {len(train_loader.source)}"
            f" | Dataset: {cfg.data.dataset} | Model: {cfg.model.name}"
            f" | Mesh: {dict(self.mesh.shape)}"
            f" | Max_count: {cfg.train.early_stop_count}"
            f" | Max_epoch: {cfg.train.epochs}", "yellow"))

        last = EpochResult(float("nan"), float("nan"), 0.0, 0.0, 0.0)
        for epoch in range(self.start_epoch, cfg.train.epochs):
            lr = cosine_lr(cfg.train.lr, epoch, cfg.train.epochs)
            self.state = set_learning_rate(self.state, lr)

            train_loss, ips = self.run_train_epoch(train_loader, epoch)
            val_loss, pck, epe = self.run_valid_epoch(val_loader, epoch)
            last = EpochResult(train_loss, val_loss, pck, epe, ips)

            is_best = val_loss < self.best_loss
            self.best_loss = min(val_loss, self.best_loss)
            if is_best:
                self.count = 0
                save_checkpoint(self.state, cfg.output_dir, epoch,
                                self.best_loss, self.count)
            else:
                self.count += 1
                if self.count == cfg.train.early_stop_count:
                    self.logger.info(
                        f"early stop at epoch {epoch} (count={self.count})")
                    break
        self.writer.close()
        return last


def train_from_config(cfg: Config) -> EpochResult:
    return Trainer(cfg).fit()
