"""Image-pipeline CLI integration tests (tiny configs, CPU).

Covers the reference's vestigial-but-shipped improved-diffusion image
scripts (``scripts/image_{train,sample,nll}.py``,
``scripts/super_res_{train,sample}.py``, ``image_datasets.py``) end to
end: dataset load semantics, class-cond training, sampling npz contract,
bpd evaluation, and the SR conditioning path.
"""

import os

import numpy as np
import pytest

# diffusion_steps >= 20: the fork's linear schedule scales betas by
# 1000/steps, so fewer steps would push beta_end past 1
TINY = ["--num_channels", "8", "--num_res_blocks", "1",
        "--diffusion_steps", "20", "--dropout", "0.0"]


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("images")
    rng = np.random.RandomState(0)
    # filenames carry the class prefix (ref image_datasets.py:31-36);
    # include a nested dir to exercise recursive listing
    (root / "nested").mkdir()
    for i in range(8):
        cls = "cat" if i % 2 == 0 else "dog"
        arr = rng.randint(0, 255, (48, 40, 3), dtype=np.uint8)
        sub = root / "nested" if i >= 6 else root
        Image.fromarray(arr).save(str(sub / f"{cls}_{i}.png"))
    return root


def test_image_dataset_semantics(image_root):
    from audiopure_tpu.data.images import (ImageFolderDataset,
                                           area_downsample)

    ds = ImageFolderDataset(str(image_root), resolution=32,
                            class_cond=True)
    assert len(ds) == 8
    item = ds[0]
    assert item["image"].shape == (3, 32, 32)
    assert item["image"].min() >= -1.0 and item["image"].max() <= 1.0
    # cat < dog in sorted order -> cat=0, dog=1
    labels = {os.path.basename(f).split("_")[0]: ds[i]["y"]
              for i, f in enumerate(ds.files)}
    assert labels == {"cat": 0, "dog": 1}

    # area downsample == block mean
    x = np.arange(2 * 3 * 8 * 8, dtype=np.float32).reshape(2, 3, 8, 8)
    small = area_downsample(x, 4)
    assert small.shape == (2, 3, 4, 4)
    np.testing.assert_allclose(small[0, 0, 0, 0],
                               x[0, 0, :2, :2].mean())

    # sharding covers the dataset disjointly
    s0 = ImageFolderDataset(str(image_root), 32, shard=0, num_shards=2)
    s1 = ImageFolderDataset(str(image_root), 32, shard=1, num_shards=2)
    assert sorted(s0.files + s1.files) == sorted(ds.files)


def test_image_train_and_sample_and_nll(image_root, tmp_path):
    from cli.image_nll import main as nll_main
    from cli.image_sample import main as sample_main
    from cli.image_train import main as train_main

    os.environ["OPENAI_LOGDIR"] = str(tmp_path / "logs")
    try:
        step = train_main(["--data_dir", str(image_root),
                           "--image_size", "32", "--batch_size", "4",
                           "--microbatch", "2", "--class_cond",
                           "--max_steps", "2", "--save_interval", "2",
                           "--lr", "1e-4"] + TINY)
        assert step == 2
        ckpt = str(tmp_path / "logs")

        out = sample_main(["--model_path", ckpt, "--ema", "0.9999",
                           "--image_size", "32", "--class_cond",
                           "--num_samples", "4", "--batch_size", "2",
                           "--timestep_respacing", "2"] + TINY)
        obj = np.load(out)
        assert obj["arr_0"].shape == (4, 32, 32, 3)
        assert obj["arr_0"].dtype == np.uint8
        assert obj["arr_1"].shape == (4,)

        bpd = nll_main(["--data_dir", str(image_root),
                        "--model_path", ckpt, "--image_size", "32",
                        "--class_cond", "--num_samples", "2",
                        "--batch_size", "2"] + TINY)
        assert np.isfinite(bpd) and bpd > 0
    finally:
        os.environ.pop("OPENAI_LOGDIR", None)


@pytest.mark.heavy
def test_super_res_train_and_sample(image_root, tmp_path):
    from cli.super_res_sample import main as sr_sample_main
    from cli.super_res_train import main as sr_train_main

    os.environ["OPENAI_LOGDIR"] = str(tmp_path / "sr_logs")
    try:
        step = sr_train_main(["--data_dir", str(image_root),
                              "--large_size", "32", "--small_size", "8",
                              "--batch_size", "4", "--max_steps", "1",
                              "--save_interval", "1"] + TINY)
        assert step == 1
        sr_ckpt = str(tmp_path / "sr_logs")
    finally:
        os.environ.pop("OPENAI_LOGDIR", None)

    # base samples at 8px from a fresh tiny model checkpointed by the
    # trainer above would need a second train; reuse the SR checkpoint's
    # npz contract instead: build base samples directly
    base = str(tmp_path / "base.npz")
    rng = np.random.RandomState(1)
    np.savez(base, rng.randint(0, 255, (4, 8, 8, 3), dtype=np.uint8))

    os.environ["OPENAI_LOGDIR"] = str(tmp_path / "sr_out")
    try:
        out = sr_sample_main(["--model_path", sr_ckpt,
                              "--base_samples", base,
                              "--large_size", "32", "--small_size", "8",
                              "--num_samples", "4", "--batch_size", "2",
                              "--timestep_respacing", "2",
                              "--use_ddim"] + TINY)
        obj = np.load(out)
        assert obj["arr_0"].shape == (4, 32, 32, 3)
        assert obj["arr_0"].dtype == np.uint8
    finally:
        os.environ.pop("OPENAI_LOGDIR", None)
