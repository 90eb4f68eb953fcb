import numpy as np

from lighthand_tpu.data.pipeline import IterationLoader, Loader
from lighthand_tpu.data.synthetic import SyntheticHands


def test_iteration_loader_cycles():
    ds = SyntheticHands(length=16, size=32)
    base = Loader(ds, batch_size=8, shuffle=True, num_workers=1)
    itl = IterationLoader(base, num_iterations=7)
    seen = list(itl)
    assert len(seen) == 7
    its = [i for i, _ in seen]
    assert its == list(range(7))
    # 2 batches/epoch -> iterations 0..6 span 4 epochs of reshuffled data
    assert all(b["image_u8"].shape == (8, 32, 32, 3) for _, b in seen)


def test_iteration_loader_resume():
    ds = SyntheticHands(length=16, size=32)
    base = Loader(ds, batch_size=8, shuffle=False, num_workers=1)
    itl = IterationLoader(base, num_iterations=5, start_iteration=3)
    seen = [i for i, _ in itl]
    assert seen == [3, 4]


def test_loader_pads_final_batch():
    ds = SyntheticHands(length=20, size=32)
    loader = Loader(ds, batch_size=8, shuffle=False, num_workers=1,
                    drop_last=False)
    batches = list(loader)
    assert len(batches) == 3
    import numpy as np

    last = batches[-1]
    assert last["image_u8"].shape == (8, 32, 32, 3)  # padded to full
    valid = np.asarray(last["valid"])
    assert valid.sum() == 4  # 20 - 2*8
    assert list(valid[:4]) == [1, 1, 1, 1]
    # padding repeats the last real sample
    np.testing.assert_array_equal(np.asarray(last["image_u8"])[3],
                                  np.asarray(last["image_u8"])[7])


def test_mix_ratio_of_other():
    from lighthand_tpu.config import Config
    from lighthand_tpu.data import build_dataset

    cfg = Config(name="simplebaseline/mix/r")
    cfg.data.synthetic = True
    cfg.data.num_our = 512
    cfg.data.ratio_of_other = 0.25
    cfg.finalize()
    train, _ = build_dataset(cfg)
    # ours: 512, frei/rhd: 512*0.25 each
    assert len(train) == 512 + 2 * 128


def test_geometry_camera_calibration():
    import jax.numpy as jnp

    from lighthand_tpu.ops.geometry import camera_calibration

    pts = np.array([[0.0, 0.0, 100.0], [10.0, -5.0, 100.0]])
    px = np.asarray(camera_calibration(
        jnp.asarray(pts), euler_deg=(0, 0, 0), translation=(0, 0, 0),
        focal=(500.0, 500.0), principal=(112.0, 112.0)))
    np.testing.assert_allclose(px[0], [112.0, 112.0], atol=1e-4)
    np.testing.assert_allclose(px[1], [162.0, 87.0], atol=1e-3)
