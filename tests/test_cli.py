"""End-to-end CLI integration tests on synthetic datasets (tiny configs).

These mirror the reference's only QA mechanism — running the eval scripts —
but automated (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

from audiopure_tpu.data import write_wav
from audiopure_tpu.data.datasets import SC09_CLASSES


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_data")
    rng = np.random.RandomState(0)
    t = np.arange(16000) / 16000.0
    for split in ("train", "valid"):
        for ci, c in enumerate(SC09_CLASSES):
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(2):
                tone = (0.3 * np.sin(2 * np.pi * (300 + 300 * ci) * t)
                        + 0.01 * rng.randn(16000))
                write_wav(str(d / f"{i}.wav"), tone.astype(np.float32),
                          16000)
    return root


@pytest.fixture(scope="module")
def clf_ckpt(data_root):
    from cli.train_speech_commands import main as train_main

    ckpt = str(data_root / "clf")
    train_main(["--train_dataset", str(data_root / "train"),
                "--valid_dataset", str(data_root / "valid"),
                "--model", "m5", "--sc09", "--max_epochs", "1",
                "--batch_size", "10", "--optim", "adam",
                "--checkpoint_dir", ckpt])
    return os.path.join(ckpt, "best-acc")


def test_train_and_test_cli(data_root, clf_ckpt):
    from cli.test_speech_commands import main as test_main

    acc, confusion = test_main(["--dataset_dir", str(data_root / "valid"),
                                "--sc09", "--classifier_path", clf_ckpt,
                                "--batch_size", "20"])
    assert confusion.shape == (10, 10)
    assert confusion.sum() == 20


def test_adaptive_attack_eval_cli(data_root, clf_ckpt, tmp_path):
    from cli.adaptive_attack_eval import main

    res = main(["--data_path", str(data_root / "valid"),
                "--num_per_class", "1", "--batch_size", "10",
                "--classifier_path", clf_ckpt, "--defense", "AS",
                "--attack", "PGD", "--max_iter_1", "2", "--eps", "0.02",
                "--save_path", str(tmp_path / "dumps")])
    assert res["total"] == 10
    # robust acc may exceed clean-undefended acc (the defense can fix
    # clean mistakes); just check the metrics are valid rates
    for k in ("acc_orig", "acc_denoised", "acc_robust"):
        assert 0.0 <= res[k] <= 1.0
    assert os.path.exists(str(tmp_path / "dumps" / "adv"))


def test_adaptive_attack_eval_cli_dp_mesh(data_root, clf_ckpt):
    """--dp 2 shards each eval batch over a 2-device mesh; accounting must
    match the single-device run exactly (same PRNG keys, same data;
    batch_size 4 over 10 examples also exercises ragged-batch padding)."""
    from cli.adaptive_attack_eval import main

    common = ["--data_path", str(data_root / "valid"),
              "--num_per_class", "1", "--batch_size", "4",
              "--classifier_path", clf_ckpt, "--defense", "AS",
              "--attack", "PGD", "--max_iter_1", "2", "--eps", "0.02"]
    res_dp1 = main(common)
    res_dp2 = main(common + ["--dp", "2"])
    assert res_dp2["total"] == 10
    for k in ("total", "acc_orig", "acc_denoised", "acc_robust"):
        assert res_dp1[k] == res_dp2[k], (k, res_dp1, res_dp2)


def test_pad_batch():
    import jax.numpy as jnp

    from cli.common import pad_batch

    x = jnp.ones((3, 1, 8))
    y = jnp.asarray([1, 2, 3])
    xp, yp, n = pad_batch(x, y, 5)
    assert xp.shape == (5, 1, 8) and yp.shape == (5,) and n == 3
    assert int(yp[3]) == int(yp[4]) == 3
    x2, y2, n2 = pad_batch(x, y, 3)
    assert x2 is x and y2 is y and n2 == 3


def test_diffwave_train_and_inference_cli(data_root, tmp_path):
    from cli.diffwave_inference import main as inf_main
    from cli.diffwave_train import main as dw_main

    cfg = dict(
        diffusion_config=dict(T=20, beta_0=1e-4, beta_T=0.02),
        wavenet_config=dict(
            in_channels=1, res_channels=8, skip_channels=8, out_channels=1,
            num_res_layers=2, dilation_cycle=2,
            diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
            diffusion_step_embed_dim_out=32),
        train_config=dict(iters_per_ckpt=3, iters_per_logging=2, n_iters=3,
                          learning_rate=2e-4, batch_size_per_gpu=2,
                          output_directory=str(tmp_path / "dw")),
        trainset_config=dict(data_path=str(data_root / "train"),
                             segment_length=16000, sampling_rate=16000),
    )
    cfg_path = str(tmp_path / "cfg.json")
    json.dump(cfg, open(cfg_path, "w"))

    loss = dw_main(["-c", cfg_path, "--tp", "2", "--batch_size", "4"])
    assert np.isfinite(loss)

    inf_main(["-c", cfg_path, "--ckpt_path", str(tmp_path / "dw"),
              "-n", "1", "--output_directory", str(tmp_path / "out")])
    assert os.path.exists(str(tmp_path / "out" / "sample_0.wav"))
    # fast K-step variant
    inf_main(["-c", cfg_path, "--ckpt_path", str(tmp_path / "dw"),
              "-n", "1", "--fast", "3",
              "--output_directory", str(tmp_path / "out_fast")])
    assert os.path.exists(str(tmp_path / "out_fast" / "sample_0.wav"))


def test_certified_eval_cli(data_root, clf_ckpt, tmp_path):
    from cli.certified_robustness_eval import main

    out_path = str(tmp_path / "cert.json")
    out = main(["--data_path", str(data_root / "valid"),
                "--num_per_class", "1", "--classifier_path", clf_ckpt,
                "--batch_size", "5", "--n0", "8", "--n", "32",
                "--certify_batch", "16", "--output", out_path])
    assert len(out["records"]) == 10
    loaded = json.load(open(out_path))
    assert loaded["n"] == 32
    # dp-sharded certification over a 2-device mesh (batch 4 over 10
    # examples also exercises the ragged-final-batch padding)
    out2 = main(["--data_path", str(data_root / "valid"),
                 "--num_per_class", "1", "--classifier_path", clf_ckpt,
                 "--batch_size", "4", "--dp", "2", "--n0", "8", "--n", "32",
                 "--certify_batch", "16",
                 "--output", str(tmp_path / "cert_dp.json")])
    assert len(out2["records"]) == 10


@pytest.mark.heavy
def test_test_cli_multicrop_and_csv(data_root, tmp_path):
    """Multi-crop averaging + kaggle-style CSV output on a mel classifier."""
    from cli.test_speech_commands import main as test_main
    from cli.train_speech_commands import main as train_main

    ckpt = str(tmp_path / "wrn")
    train_main(["--train_dataset", str(data_root / "train"),
                "--valid_dataset", str(data_root / "valid"),
                "--model", "resnet18", "--sc09", "--max_epochs", "1",
                "--batch_size", "10", "--optim", "adam",
                "--checkpoint_dir", ckpt])
    csv_path = str(tmp_path / "preds.csv")
    acc, conf = test_main(["--dataset_dir", str(data_root / "valid"),
                           "--sc09", "--classifier_path",
                           os.path.join(ckpt, "best-acc"),
                           "--multi_crop", "--output", csv_path])
    lines = open(csv_path).read().strip().splitlines()
    assert lines[0] == "fname,label"
    assert len(lines) == 21  # header + 20 files


@pytest.mark.heavy
def test_kws_adaptive_attack_eval_cli(tmp_path):
    """KWS harness on a synthetic Qualcomm tree (Kenansville attack)."""
    from audiopure_tpu.data.datasets import QKWS_CLASSES
    from cli.kws_adaptive_attack_eval import main

    root = tmp_path / "qkws"
    rng = np.random.RandomState(0)
    t = np.arange(32000) / 16000.0
    for ci, c in enumerate(QKWS_CLASSES):
        d = root / c
        d.mkdir(parents=True)
        for i in range(130):  # tail-split needs >125 files
            if i < 126:  # keep synthesis cheap: only test-split files real
                wav = np.zeros(1000, dtype=np.float32)
            else:
                wav = (0.3 * np.sin(2 * np.pi * (400 + 200 * ci) * t)
                       ).astype(np.float32)
            write_wav(str(d / f"{i:03d}.wav"), wav, 16000)

    res = main(["--data_path", str(root), "--split", "test",
                "--batch_size", "20", "--defense", "AS",
                "--attack", "KenansvilleFFT"])
    assert res["total"] == 100  # 4 classes x 25 test-split files
    for k in ("acc_orig", "acc_denoised", "acc_robust"):
        assert 0.0 <= res[k] <= 1.0


@pytest.mark.heavy
def test_profile_flag_writes_trace(data_root, clf_ckpt, tmp_path):
    from cli.adaptive_attack_eval import main

    prof = str(tmp_path / "trace")
    main(["--data_path", str(data_root / "valid"), "--num_per_class", "1",
          "--batch_size", "10", "--classifier_path", clf_ckpt,
          "--defense", "None", "--attack", "PGD", "--max_iter_1", "1",
          "--profile_dir", prof])
    import glob
    assert glob.glob(prof + "/**/*.pb", recursive=True) \
        or glob.glob(prof + "/**/*.trace.json*", recursive=True) \
        or os.listdir(prof)


def test_prepare_dataset_split(tmp_path):
    """Official-list split logic (ref ``split_dataset.py`` semantics)."""
    from audiopure_tpu.data import write_wav
    from cli.prepare_dataset import split

    audio = tmp_path / "audio"
    for cls in ("yes", "no", "_background_noise_"):
        (audio / cls).mkdir(parents=True)
        for i in range(4):
            write_wav(str(audio / cls / f"{i}.wav"),
                      np.zeros(100, dtype=np.float32), 16000)
    (audio / "testing_list.txt").write_text("yes/0.wav\nno/1.wav\n")
    (audio / "validation_list.txt").write_text("yes/1.wav\n")

    out = tmp_path / "out"
    split(str(audio), str(out))
    assert sorted(os.listdir(out / "test" / "yes")) == ["0.wav"]
    assert sorted(os.listdir(out / "test" / "no")) == ["1.wav"]
    assert sorted(os.listdir(out / "valid" / "yes")) == ["1.wav"]
    assert sorted(os.listdir(out / "train" / "yes")) == ["2.wav", "3.wav"]
    # background noise always goes to train
    assert len(os.listdir(out / "train" / "_background_noise_")) == 4


def test_transfer_attack_eval_cli(data_root, clf_ckpt):
    from cli.transfer_attack_eval import main

    res = main(["--data_path", str(data_root / "valid"),
                "--num_per_class", "1", "--batch_size", "10",
                "--classifier_path", clf_ckpt, "--defense", "AS",
                "--attack", "PGD", "--max_iter_1", "2", "--eps", "0.02"])
    assert res["total"] == 10
    for k in ("steal", "acc_clean", "acc_robust"):
        assert 0.0 <= res[k] <= 1.0


def test_spectrogram_train_cli(data_root, tmp_path, monkeypatch):
    from cli.spectrogram_train import main

    monkeypatch.setenv("AUDIOPURE_LOGDIR", str(tmp_path))
    monkeypatch.setenv("AUDIOPURE_LOG_FORMAT", "csv")
    step = main(["--data_dir", str(data_root / "valid"),
                 "--batch_size", "4", "--max_steps", "3",
                 "--model_channels", "8", "--num_res_blocks", "1",
                 "--diffusion_steps", "20", "--save_interval", "1000000",
                 "--log_interval", "1", "--async_save"])
    assert step == 3
    from audiopure_tpu.utils import checkpoint as ckpt_lib
    assert ckpt_lib.find_max_step(str(tmp_path)) == 3  # final sync save


def test_train_kws_cli(tmp_path):
    from audiopure_tpu.data.datasets import QKWS_CLASSES
    from cli.train_kws import main

    rng = np.random.RandomState(0)
    root = tmp_path / "qkws"
    for ci, c in enumerate(QKWS_CLASSES):
        d = root / c
        d.mkdir(parents=True)
        t = np.arange(16000) / 16000.0
        for i in range(127):  # tail split -> train 2 / valid 100 / test 25
            tone = (0.3 * np.sin(2 * np.pi * (200 + 200 * ci) * t)
                    + 0.01 * rng.randn(16000)).astype(np.float32)
            write_wav(str(d / f"{i:03d}.wav"), tone, 16000)

    best = main(["--data_path", str(root), "--max_epochs", "1",
                 "--batch_size", "8", "--adv_steps", "2",
                 "--checkpoint_dir", str(tmp_path / "ckpt")])
    assert 0.0 <= best <= 1.0
    assert os.path.isdir(str(tmp_path / "ckpt" / "best"))


def test_adaptive_attack_eval_cli_share_eot(data_root, clf_ckpt):
    """--share_eot with equal EOT sizes runs the shared-stack PGD path
    end-to-end; on the deterministic AS defense the accounting matches
    the two-stack run exactly (same point, same scores)."""
    from cli.adaptive_attack_eval import main

    common = ["--data_path", str(data_root / "valid"),
              "--num_per_class", "1", "--batch_size", "10",
              "--classifier_path", clf_ckpt, "--defense", "AS",
              "--attack", "PGD", "--max_iter_1", "2", "--eps", "0.02",
              "--eot_attack_size", "2", "--eot_defense_size", "2"]
    res_paired = main(common)
    res_shared = main(common + ["--share_eot"])
    for k in ("total", "acc_orig", "acc_robust"):
        assert res_paired[k] == res_shared[k], (k, res_paired, res_shared)


@pytest.mark.heavy
def test_diffwave_train_cli_remat_bf16(data_root, tmp_path):
    """--remat --bf16 training path (the on-chip batch-16 recipe)."""
    from cli.diffwave_train import main as dw_main

    cfg = dict(
        diffusion_config=dict(T=20, beta_0=1e-4, beta_T=0.02),
        wavenet_config=dict(
            in_channels=1, res_channels=8, skip_channels=8, out_channels=1,
            num_res_layers=2, dilation_cycle=2,
            diffusion_step_embed_dim_in=16, diffusion_step_embed_dim_mid=32,
            diffusion_step_embed_dim_out=32),
        train_config=dict(iters_per_ckpt=3, iters_per_logging=2, n_iters=3,
                          learning_rate=2e-4, batch_size_per_gpu=2,
                          output_directory=str(tmp_path / "dw_remat")),
        trainset_config=dict(data_path=str(data_root / "train"),
                             segment_length=16000, sampling_rate=16000),
    )
    cfg_path = str(tmp_path / "cfg_remat.json")
    json.dump(cfg, open(cfg_path, "w"))
    loss = dw_main(["-c", cfg_path, "--batch_size", "4", "--dp", "4", "--tp", "2",
                    "--remat", "--bf16"])
    assert np.isfinite(loss)
    # selective policy: save gate transcendentals, recompute elementwise
    # (fresh output dir — same dir would resume past n_iters and no-op)
    cfg["train_config"]["output_directory"] = str(tmp_path / "dw_gates")
    json.dump(cfg, open(cfg_path, "w"))
    loss_g = dw_main(["-c", cfg_path, "--batch_size", "4", "--dp", "4",
                      "--tp", "2", "--remat", "gates", "--bf16"])
    assert np.isfinite(loss_g)
