"""Generic (Carvana-style) directory dataset."""

import numpy as np
import pytest
from PIL import Image

from vaeunet_tpu.data.generic import BasicDataset
from vaeunet_tpu.data.loader import Loader


def test_basic_dataset(tmp_path):
    (tmp_path / "imgs").mkdir()
    (tmp_path / "masks").mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 256, (64, 96, 3), np.uint8)
        mask = (rng.rand(64, 96) > 0.5).astype(np.uint8) * 255
        Image.fromarray(img).save(tmp_path / "imgs" / f"car_{i}.jpg")
        Image.fromarray(mask).save(tmp_path / "masks" / f"car_{i}_mask.gif")

    ds = BasicDataset(str(tmp_path / "imgs"), str(tmp_path / "masks"),
                      scale=0.5)
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (32, 48, 3)
    assert s["mask"].shape == (32, 48, 1)
    assert s["image"].dtype == np.float32
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}

    # loader interop
    loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False)
    batches = list(loader)
    assert batches[0]["image"].shape == (2, 32, 48, 3)
    assert sum(b["count"] for b in batches) == 3

    # missing mask -> zeros
    Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(
        tmp_path / "imgs" / "car_9.jpg")
    ds2 = BasicDataset(str(tmp_path / "imgs"), str(tmp_path / "masks"), 0.5)
    s9 = ds2[ds2.ids.index("car_9")]
    assert s9["mask"].sum() == 0

    img, mask = ds.get_image_and_mask("car_1")
    assert img.shape[:2] == mask.shape[:2]


@pytest.mark.slow
@pytest.mark.nightly  # rebalanced r5: watched tier held to ~10 min (RESULTS)
def test_train_on_basic_dataset(tmp_path):
    """End-to-end training epoch on a Carvana-style dataset (BASELINE
    config 3 path)."""
    import jax

    from vaeunet_tpu.training.config import TrainConfig
    from vaeunet_tpu.training.loop import train_model
    from vaeunet_tpu.utils.tracking import Tracker

    rng = np.random.RandomState(0)
    for split, n in (("train", 4), ("val", 2)):
        (tmp_path / "imgs" / split).mkdir(parents=True)
        (tmp_path / "masks" / split).mkdir(parents=True)
        for i in range(n):
            img = rng.randint(0, 256, (64, 64, 3), np.uint8)
            mask = np.zeros((64, 64), np.uint8)
            mask[16:48, 16:48] = 255
            img[16:48, 16:48] = 230
            Image.fromarray(img).save(tmp_path / "imgs" / split / f"c{i}.jpg")
            Image.fromarray(mask).save(
                tmp_path / "masks" / split / f"c{i}_mask.gif")

    config = TrainConfig(
        model_type="resnet", latent_dim=8, epochs=1, batch_size=2,
        gradient_accumulation_steps=1, amp=False, dataset_type="basic",
        data_dir=str(tmp_path), img_scale=0.5, lesion_type="EX", seed=0,
        checkpoint_dir=str(tmp_path / "ckpt"), early_stopping_patience=100)
    tracker = Tracker(run_dir=str(tmp_path / "runs"))
    state = train_model(config, tracker=tracker)
    assert int(state.step) > 0
