import pytest

from lighthand_tpu.config import parse_args


def test_reference_recipe_flags():
    cfg = parse_args([
        "--root", "hrnet/frei", "--name", "2d", "--epoch", "100",
        "--count", "30", "--batch_size", "32", "--lr", "0.001", "--reset",
    ])
    assert cfg.name == "hrnet/frei/2d"
    assert cfg.model.name == "hrnet"
    assert cfg.data.dataset == "frei"
    assert cfg.train.epochs == 100
    assert cfg.train.early_stop_count == 30
    assert cfg.data.batch_size == 32
    assert cfg.train.lr == 0.001
    assert cfg.train.reset
    assert cfg.output_dir == "output/hrnet/frei/2d"
    assert cfg.tensorboard_dir == "tensorboard/hrnet/frei/2d"


def test_defaults_match_reference():
    cfg = parse_args([])
    # argparser.py defaults: root simplebaseline/ours, name 84k, batch 32,
    # count 30, num_our 300000, ratio_of_aug 0.6, epoch 100, lr 1e-3
    assert cfg.name == "simplebaseline/ours/84k"
    assert cfg.data.batch_size == 32
    assert cfg.train.early_stop_count == 30
    assert cfg.data.num_our == 300000
    assert cfg.data.ratio_of_aug == 0.6
    assert cfg.train.epochs == 100
    assert cfg.train.lr == 1e-3
    assert cfg.train.logging_steps == 100
    assert cfg.data.num_workers == 8


def test_tpu_extension_flags():
    cfg = parse_args(["--mesh-data", "4", "--mesh-model", "2",
                      "--precision", "f32", "--synthetic"])
    assert cfg.mesh.data == 4 and cfg.mesh.model == 2
    assert cfg.model.precision == "f32"
    assert cfg.data.synthetic


def test_transfer_and_optim_flags():
    cfg = parse_args(["--transfer", "--optim", "--eval", "--plt"])
    assert cfg.train.transfer
    assert cfg.train.reset_optimizer
    assert cfg.eval.eval and cfg.eval.plt


def test_invalid_names_raise():
    with pytest.raises(ValueError):
        parse_args(["--root", "badmodel/ours"])
    with pytest.raises(ValueError):
        parse_args(["--root", "hrnet/baddata"])
