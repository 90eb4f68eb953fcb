"""Unified configuration.

The reference splits configuration across argparse (argparser.py:27-100),
hard-coded post-parse mutation (pre_argparser.py:8-21), an EasyDict tree for
SimpleBaseline (simplebaseline/config.py) and a yaml file for HRNet
(hrnet/config/cfg.yaml). Here there is ONE dataclass tree plus a CLI facade
that accepts the reference's exact flags (--name model/dataset/tag --epoch
--count --reset --batch_size --lr --ratio_of_aug --num_our --transfer
--optim --eval --plt ... per BASELINE.json) so existing recipes run
unchanged.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

VALID_MODELS = ("simplebaseline", "hrnet")
VALID_DATASETS = ("rhd", "stb", "frei", "interhand", "gan", "ours", "mix")


@dataclasses.dataclass
class MeshConfig:
    data: int = -1       # -1 = all devices
    model: int = 1


@dataclasses.dataclass
class DataConfig:
    dataset: str = "ours"
    dataset_root: str = "../../dataset"
    image_size: int = 256
    heatmap_size: int = 64
    num_joints: int = 21
    num_our: int = 300000          # --num_our (argparser.py:58-63)
    ratio_of_aug: float = 0.6      # --ratio_of_aug (argparser.py:66-70)
    ratio_of_other: float = 0.0
    batch_size: int = 32
    num_workers: int = 8           # pre_argparser.py:16
    train_yaml: str = "../../dataset/freihand/train.yaml"
    val_yaml: str = "../../dataset/freihand/test.yaml"
    shuffle_seed: int = 9001       # train.py:15 random_seed
    synthetic: bool = False        # fall back to generated data (testing/bench)
    prefetch: int = 2              # device-side double buffering depth
    cache_crops: bool = True       # memmap decoded post-crop samples beside
    # the dataset tree (data/cache.py) — every source is deterministic per
    # index, so epochs 2+ skip cv2 entirely on this 1-core host


@dataclasses.dataclass
class ModelConfig:
    name: str = "simplebaseline"   # simplebaseline | hrnet | hrnet_w32 | ...
    num_joints: int = 21
    precision: str = "bf16"        # bf16 | f32 | all_bf16 | int8_fwd


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 100              # --epoch
    lr: float = 1e-3               # --lr
    early_stop_count: int = 30     # --count
    milestone: int = 10
    seed: int = 9001
    logging_steps: int = 100       # pre_argparser.py:15
    reset: bool = False
    transfer: bool = False
    reset_optimizer: bool = False  # --optim (train.py:50)
    visualize: bool = True         # save overlay images 3x/epoch
    assume_yes: bool = False       # non-interactive --reset confirmation
    steps_per_dispatch: int = 1    # lax.scan K optimizer steps per dispatch
    flip: bool = False             # random hflip aug (TPU extension; the
    # reference's flip is permanently off, frei_dataloader.py:107)
    rot_aug: float = 0.0           # on-device rotation aug, degrees
    # (TPU extension; 0 = off)
    trace: bool = False            # capture an XLA profiler trace of a few
    # steps of the first epoch into {output_dir}/trace
    stall_timeout_s: float = 900.0  # exit(86) if no train/val progress for
    # this long (single-tenant tunnel wedge guard, train/watchdog.py);
    # 0 disables. Arms only after the first completed dispatch, so the
    # minutes-long first remote compile never counts.
    rss_limit_gb: float = -1.0     # exit(86) at the epoch boundary when
    # host RSS crosses this (tunnel-client buffer leak guard,
    # watchdog.py:check_rss_limit); -1 = auto (80% of MemTotal),
    # 0 disables.


@dataclasses.dataclass
class EvalConfig:
    eval: bool = False
    test: bool = False
    plt: bool = False
    plt_max: int | None = None   # cap on --plt overlays (None = all,
    # the reference behavior; TPU extension for 1-core hosts)
    compat_mean_epe: bool = True   # replicate pred_eval's zeros-padded
    # total_epe init (argparser.py:345) — see eval/harness.py


@dataclasses.dataclass
class Config:
    name: str = "simplebaseline/ours/84k"   # root/name routing key
    root_path: str = "output"
    view: str = "wrist"
    phase: str = "train"
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)

    # Derived (set in finalize)
    output_dir: str = ""
    tensorboard_dir: str = ""

    def finalize(self) -> "Config":
        self.output_dir = os.path.join(self.root_path, self.name)
        self.tensorboard_dir = os.path.join("tensorboard", self.name)
        parts = self.name.split("/")
        if not self.eval.eval and len(parts) >= 2:
            model_key, dataset_key = parts[0], parts[1]
            # build_dataset's assertions (src/tools/dataset.py:40-57)
            if model_key not in VALID_MODELS:
                raise ValueError(
                    f"Please write down the model name in {list(VALID_MODELS)},"
                    f" not {model_key}"
                )
            if dataset_key not in VALID_DATASETS:
                raise ValueError(
                    "Please write down the dataset name in "
                    f"{list(VALID_DATASETS)}, not {dataset_key}"
                )
            self.model.name = model_key
            self.data.dataset = dataset_key
        return self


def parse_args(argv: Optional[list[str]] = None, phase: str = "train") -> Config:
    """CLI facade: the reference's exact flag surface (argparser.py:27-100)
    plus TPU-specific extensions (``--mesh-data``, ``--mesh-model``,
    ``--precision``, ``--synthetic``, ``--yes``)."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="simplebaseline/ours", type=str)
    parser.add_argument("--name", default="84k", type=str)
    parser.add_argument("--root_path", default="output", type=str)
    parser.add_argument("--model", default="ours", type=str)
    parser.add_argument("--dataset", default=None, type=str)
    parser.add_argument("--view", default="wrist", type=str)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--milestone", default=10, type=int)
    parser.add_argument("--count", default=30, type=int)
    parser.add_argument("--num_our", default=300000, type=int)
    parser.add_argument("--ratio_of_other", default=0, type=float)
    parser.add_argument("--ratio_of_aug", default=0.6, type=float)
    parser.add_argument("--epoch", default=100, type=int)
    parser.add_argument("--lr", default=0.001, type=float)
    # Flags below are accepted for recipe compatibility. --scale/--rot/
    # --color/--logger/--test/--D3/--view/--milestone are parsed but have
    # no effect on the training path IN THE REFERENCE EITHER (argparser.py
    # defines them; no consumer changes model/data behavior — --D3 only
    # alters a log string, train.py:43).
    parser.add_argument("--scale", action="store_true")
    parser.add_argument("--plt", action="store_true")
    parser.add_argument("--plt_max", type=int, default=None,
                        help="cap --plt overlays (default: every sample,"
                             " as the reference writes)")
    parser.add_argument("--transfer", action="store_true")
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--logger", action="store_true")
    parser.add_argument("--reset", action="store_true")
    parser.add_argument("--rot", action="store_true")
    parser.add_argument("--optim", action="store_true")
    parser.add_argument("--color", action="store_true")
    parser.add_argument("--D3", action="store_true")
    # TPU-native extensions
    parser.add_argument("--mesh-data", dest="mesh_data", default=-1, type=int)
    parser.add_argument("--mesh-model", dest="mesh_model", default=1, type=int)
    parser.add_argument("--precision", default="bf16",
                        choices=("bf16", "f32", "all_bf16", "int8_fwd"))
    parser.add_argument("--synthetic", action="store_true",
                        help="train on generated data (smoke tests / bench)")
    parser.add_argument("--dataset-root", dest="dataset_root",
                        default="../../dataset", type=str)
    parser.add_argument("--train_yaml", dest="train_yaml", default=None,
                        type=str,
                        help="FreiHAND TSV yaml descriptor (the reference "
                             "pins this in pre_argparser.py:17; a flag "
                             "here so trees can live anywhere)")
    parser.add_argument("--num-workers", dest="num_workers", default=8,
                        type=int)
    parser.add_argument("--no-cache-crops", dest="cache_crops",
                        action="store_false", default=True,
                        help="disable the decoded-crop memmap cache "
                             "(data/cache.py; on by default — sources are "
                             "deterministic per index so it is lossless)")
    parser.add_argument("--yes", action="store_true",
                        help="answer yes to the --reset confirmation")
    parser.add_argument("--steps-per-dispatch", dest="steps_per_dispatch",
                        default=1, type=int,
                        help="scan K optimizer steps per device dispatch")
    parser.add_argument("--flip", action="store_true",
                        help="random horizontal-flip augmentation "
                             "(TPU extension; off in the reference)")
    parser.add_argument("--rot-aug", dest="rot_aug", default=0.0,
                        type=float,
                        help="on-device rotation augmentation in degrees "
                             "(TPU extension; 0 = off)")
    parser.add_argument("--trace", action="store_true",
                        help="profile a few steps of the first epoch into "
                             "{output_dir}/trace (TensorBoard-loadable)")
    parser.add_argument("--stall-timeout", dest="stall_timeout_s",
                        default=900.0, type=float,
                        help="exit(86) if no training progress for this "
                             "many seconds — wedged-tunnel guard "
                             "(0 disables)")
    parser.add_argument("--rss-limit-gb", dest="rss_limit_gb",
                        default=-1.0, type=float,
                        help="exit(86) at the epoch boundary when host "
                             "RSS crosses this many GB — tunnel-client "
                             "buffer-leak guard (-1 = auto: 80%% of "
                             "MemTotal, 0 disables)")
    parser.add_argument("--platform", default=None,
                        choices=("cpu", "tpu", "axon"),
                        help="force the JAX backend (default: the "
                             "environment's platform order). '--platform "
                             "cpu' runs the identical compiled program on "
                             "the host — the operational fallback when the "
                             "device tunnel is down")

    a = parser.parse_args(argv)
    if a.platform:
        # must land before the first jax.devices()/jit of the process; the
        # image's sitecustomize pins jax_platforms via jax.config, which a
        # plain JAX_PLATFORMS env var cannot override
        import jax

        jax.config.update("jax_platforms", a.platform)

    cfg = Config(
        name=os.path.join(a.root, a.name),
        root_path=a.root_path,
        view=a.view,
        phase=phase,
        mesh=MeshConfig(data=a.mesh_data, model=a.mesh_model),
        data=DataConfig(
            dataset=a.dataset or a.root.split("/")[-1],
            dataset_root=a.dataset_root,
            num_our=a.num_our,
            ratio_of_aug=a.ratio_of_aug,
            ratio_of_other=a.ratio_of_other,
            batch_size=a.batch_size,
            num_workers=a.num_workers,
            synthetic=a.synthetic,
            cache_crops=a.cache_crops,
            **({"train_yaml": a.train_yaml} if a.train_yaml else {}),
        ),
        model=ModelConfig(name=a.model, precision=a.precision),
        train=TrainConfig(
            epochs=a.epoch,
            lr=a.lr,
            early_stop_count=a.count,
            milestone=a.milestone,
            reset=a.reset,
            transfer=a.transfer,
            reset_optimizer=a.optim,
            assume_yes=a.yes,
            steps_per_dispatch=a.steps_per_dispatch,
            flip=a.flip,
            rot_aug=a.rot_aug,
            trace=a.trace,
            stall_timeout_s=a.stall_timeout_s,
            rss_limit_gb=a.rss_limit_gb,
        ),
        eval=EvalConfig(eval=a.eval, test=a.test, plt=a.plt,
                        plt_max=a.plt_max),
    )
    return cfg.finalize()
