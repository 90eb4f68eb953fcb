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
from lighthand_tpu.train.profiler import StepTimer
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
        return DTypePolicy.all_bf16()  # bf16 BatchNorm stats (measured: neutral)
    if cfg.model.precision == "int8_fwd":
        return DTypePolicy.int8_fwd()  # int8 forward convs, STE backward
    return DTypePolicy()


def _pick_style(styles: set) -> str:
    """Uniform source tree -> static rasterizer; mixed -> per-sample select."""
    return next(iter(styles)) if len(styles) == 1 else "per_sample"


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
        self.logger.debug(f"create mesh: {time.time() - t0:.1f}s")
        self.policy = _policy(cfg)

        self.model = get_model(cfg.model.name, cfg.model.num_joints,
                               policy=self.policy)
        from lighthand_tpu.core.prng import host_split
        from lighthand_tpu.utils.misc import set_seed

        self._host_split = host_split
        # seeds np.random/random globally AND returns the root JAX key —
        # the reference seeds all host RNGs up front (train.py:15-22)
        rng = set_seed(cfg.train.seed)
        self.rng, init_rng = host_split(rng)
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

        # Build sources now: the heatmap target style (MSRA vs max-combine,
        # SURVEY.md components 18/19) is a static property of the source
        # tree and routes which rasterizer the jitted steps compile in.
        from lighthand_tpu.data.records import source_heatmap_styles

        self.train_src, self.val_src = build_dataset(cfg)
        train_style = _pick_style(source_heatmap_styles(self.train_src))
        val_style = _pick_style(source_heatmap_styles(self.val_src))
        self._dispatch_fields = ["image_u8", "joints", "aug_enabled",
                                 "noise_enabled"]
        if train_style == "per_sample":
            self._dispatch_fields.append("hm_max")

        step_kw = dict(heatmap_size=hm, stride=stride, jitter=True,
                       target_style=train_style, flip=cfg.train.flip,
                       rot_deg=cfg.train.rot_aug,
                       compute_dtype=self.policy.compute_dtype)
        self.train_step = make_fused_train_step(
            scan_steps=self.scan_steps, **step_kw)
        # k=1 step for the ragged tail of a scan dispatch (compiled lazily,
        # only if an epoch actually ends with leftover microbatches)
        self.train_step_k1 = (self.train_step if self.scan_steps == 1
                              else make_fused_train_step(scan_steps=1,
                                                         **step_kw))
        self.eval_step = make_eval_step(heatmap_size=hm, stride=stride,
                                        target_style=val_style)
        self._predict_step = None  # lazy; train-overlay path only
        self.stride = stride
        self.preprocess = DevicePreprocessor(
            jitter=False, out_dtype=self.policy.compute_dtype)  # eval path
        self.writer = ScalarWriter(cfg.tensorboard_dir,
                                   jsonl_dir=cfg.output_dir)
        from lighthand_tpu.train.watchdog import (
            StallWatchdog,
            check_rss_limit,
        )

        self._check_rss_limit = check_rss_limit
        # wedged-tunnel guard: exit(86) if no completed dispatch for
        # stall_timeout_s (arms at the first heartbeat, so the minutes-long
        # first remote compile never counts; 0 disables)
        self.watchdog = StallWatchdog(cfg.train.stall_timeout_s,
                                      logger=self.logger)
        # dispatches that have compiled at least once; a first-use dispatch
        # (eval_step at the first validation boundary, the k=1 tail step,
        # the overlay predict step) triggers a synchronous remote compile
        # that can exceed stall_timeout_s, so the watchdog is disarmed for
        # exactly that call and re-armed by the completion heartbeat
        self._compiled: set = set()

    def _disarm_for_first_compile(self, name: str) -> None:
        if name not in self._compiled:
            self._compiled.add(name)
            self.watchdog.disarm()

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
        train_loader = Loader(
            self.train_src, cfg.data.batch_size, mesh=self.mesh,
            shuffle=True, seed=cfg.data.shuffle_seed,
            num_workers=cfg.data.num_workers, prefetch=cfg.data.prefetch,
        )
        # drop_last=False + the batch["valid"] mask: the early-stop signal
        # sees every validation sample (the reference's DataLoader kept the
        # ragged tail; dropping it would bias per-epoch val loss)
        val_loader = Loader(
            self.val_src, cfg.data.batch_size, mesh=self.mesh,
            shuffle=False, num_workers=cfg.data.num_workers,
            prefetch=cfg.data.prefetch, drop_last=False,
        )
        return train_loader, val_loader

    # -- epoch bodies ---------------------------------------------------------

    def run_train_epoch(self, loader: Loader, epoch: int) -> tuple[float, float]:
        cfg = self.cfg
        loader.set_epoch(epoch)
        losses = AverageMeter()
        timer = StepTimer()
        bar = Bar(colored(f"{epoch}_TRAIN", "blue"), max=len(loader))

        import contextlib

        import jax.numpy as jnp

        k = self.scan_steps
        bsz = cfg.data.batch_size
        n_images = 0
        n_dispatch = 0
        t0 = time.time()
        pending = []  # (loss, n_images) read one dispatch late
        microbatches = []
        vis_iters = ({0, len(loader) // 2, len(loader) - 1}
                     if cfg.train.visualize else set())
        trace_ctx = contextlib.ExitStack()

        def drain(limit: int) -> None:
            while len(pending) > limit:
                loss, n = pending.pop(0)
                losses.update(float(loss), n)

        for it, batch in enumerate(loader):
            if it in vis_iters:
                # prediction overlays at {0, mid, last} like the reference
                # train runner (method.py:185-202)
                self._train_overlay(batch, epoch, it)
            microbatches.append(batch)
            if len(microbatches) < k:
                bar.next()
                continue
            if k == 1:
                dispatch = {name: microbatches[0][name]
                            for name in self._dispatch_fields}
            else:
                dispatch = {
                    name: jnp.stack([b[name] for b in microbatches])
                    for name in self._dispatch_fields
                }
            microbatches = []
            self.rng, key = self._host_split(self.rng)
            self.state, metrics = self.train_step(self.state, key, dispatch)
            n_images += k * bsz
            n_dispatch += 1
            if cfg.train.trace and epoch == self.start_epoch:
                # trace dispatches 2-5 (skip the compile dispatch)
                if n_dispatch == 2:
                    from lighthand_tpu.train.profiler import trace

                    trace_ctx.enter_context(
                        trace(os.path.join(cfg.output_dir, "trace")))
                elif n_dispatch == 6:
                    trace_ctx.close()
            # read losses one dispatch late: keeps the pipeline full
            pending.append((metrics["loss"], k * bsz))
            drain(1)
            self.watchdog.heartbeat()  # a completed loss read = progress
            timer.tick()
            if it % cfg.train.logging_steps == 0:
                bar.suffix = (f"loss: {losses.avg:.6f} | count: {self.count}"
                              f" | {timer.images_per_sec(k * bsz):.0f} img/s")
            bar.next()
        # flush the ragged tail of microbatches (< k of them) through the
        # k=1 step — with steps_per_dispatch>1 the old code silently dropped
        # up to k-1 trailing loader batches per epoch
        for tail in microbatches:
            dispatch = {name: tail[name] for name in self._dispatch_fields}
            self.rng, key = self._host_split(self.rng)
            if self.train_step_k1 is not self.train_step:
                self._disarm_for_first_compile("train_k1")
            self.state, metrics = self.train_step_k1(self.state, key,
                                                     dispatch)
            n_images += bsz
            pending.append((metrics["loss"], bsz))
            drain(1)
            self.watchdog.heartbeat()
        drain(0)
        trace_ctx.close()
        bar.finish()
        elapsed = time.time() - t0
        ips = n_images / elapsed if elapsed > 0 else 0.0
        self._last_epoch_images = n_images
        self.writer.add_scalar("Loss/train", losses.avg, epoch)
        self.writer.add_scalar("perf/images_per_sec", ips, epoch)
        try:  # host-memory watchdog (long runs through the remote tunnel)
            with open("/proc/self/statm") as f:
                rss_gb = int(f.read().split()[1]) * 4096 / 1e9
            self.logger.debug(
                f"epoch {epoch}: {ips:.1f} img/s, host rss {rss_gb:.1f} GB, "
                f"{len(jax.live_arrays())} live arrays")
        except OSError:  # pragma: no cover
            pass
        return losses.avg, ips

    def _train_overlay(self, batch, epoch: int, it: int) -> None:
        """Overlay current predictions on a train sample (reference
        method.py:185-202, {output}/train_image/{epoch}_epoch/iter_N.jpg)."""
        try:
            if self._predict_step is None:
                from lighthand_tpu.train.step import make_predict_step

                self._predict_step = make_predict_step(stride=self.stride)
            self._disarm_for_first_compile("predict")
            self.rng, key = self._host_split(self.rng)
            images = self.preprocess(
                key, batch["image_u8"],
                np.zeros(batch["image_u8"].shape[0], np.float32))
            pred, _ = self._predict_step(self.state, images)
            self._save_overlay(images, batch["joints"], pred,
                               "train", epoch, it)
        except Exception as e:  # overlay failure must never kill training
            self.logger.debug(f"train overlay failed: {e}")

    def run_valid_epoch(self, loader: Loader, epoch: int):
        losses, pcks, epes = AverageMeter(), AverageMeter(), AverageMeter()
        bar = Bar(colored(f"{epoch}_VALID", "blue"), max=len(loader))
        vis_iters = {0, len(loader) // 2, len(loader) - 1}
        for it, batch in enumerate(loader):
            self._disarm_for_first_compile("eval")
            self.rng, key = self._host_split(self.rng)
            images = self.preprocess(
                key, batch["image_u8"],
                np.zeros(batch["image_u8"].shape[0], np.float32),
            )
            m = self.eval_step(self.state,
                               {"image": images, "joints": batch["joints"],
                                "valid": batch["valid"],
                                "hm_max": batch["hm_max"]})
            # exact sums/counts: padding rows of the final ragged batch
            # (drop_last=False) carry valid=0 and contribute nothing
            losses.update_p(float(m["loss_sum"]), float(m["n_valid"]))
            pcks.update_p(float(m["pck_sum"]), float(m["pck_count"]))
            epes.update_p(float(m["epe_sum"]), float(m["epe_count"]))
            self.watchdog.heartbeat()
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
        self.watchdog.start()
        try:
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
                                    self.best_loss, self.count,
                                    model_info={
                                        "name": cfg.model.name,
                                        "precision": cfg.model.precision,
                                    })
                    self.watchdog.heartbeat()  # orbax save blocks too
                else:
                    self.count += 1
                    if self.count == cfg.train.early_stop_count:
                        self.logger.info(
                            f"early stop at epoch {epoch} "
                            f"(count={self.count})")
                        break
                # after the checkpoint decision: a leaked-buffer OOM
                # becomes a clean exit-86 resume instead of SIGKILL.
                # Flush TB first — the exit path is os._exit, which skips
                # the finally/close() and would drop buffered TB events
                # (this boundary can afford a graceful flush; the
                # watchdog-thread exit cannot).
                self.writer.flush()
                self._check_rss_limit(cfg.train.rss_limit_gb, self.logger)
        finally:
            self.watchdog.stop()
        self.writer.close()
        return last


def train_from_config(cfg: Config) -> EpochResult:
    return Trainer(cfg).fit()
