"""KV logger (Human/JSON/CSV, mean aggregation, profiling) and artifact
dumps — the reference's observability layer (SURVEY.md §5)."""

import pytest
import csv
import json
import os
import time

import numpy as np

from audiopure_tpu.utils import artifacts
from audiopure_tpu.utils import logging as logger


def test_logkv_mean_and_formats(tmp_path):
    lg = logger.configure(str(tmp_path), ["csv", "json", "log"])
    lg.logkv("step", 1)
    lg.logkv_mean("loss", 1.0)
    lg.logkv_mean("loss", 3.0)
    out = lg.dumpkvs()
    assert out["loss"] == 2.0  # mean aggregation

    lg.logkv("step", 2)
    lg.logkv("extra", 7)
    lg.dumpkvs()

    with open(os.path.join(str(tmp_path), "progress.csv")) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert float(rows[0]["loss"]) == 2.0
    assert rows[1]["extra"] == "7"
    assert rows[0]["extra"] == ""  # backfilled header

    lines = open(os.path.join(str(tmp_path), "progress.json")).readlines()
    assert json.loads(lines[0])["loss"] == 2.0
    assert os.path.exists(os.path.join(str(tmp_path), "log.txt"))


@pytest.mark.heavy
def test_tensorboard_format(tmp_path):
    lg = logger.configure(str(tmp_path), ["tensorboard"])
    lg.logkv("step", 3)
    lg.logkv("loss", 0.5)
    lg.dumpkvs()
    tb_dir = os.path.join(str(tmp_path), "tb")
    events = [f for f in os.listdir(tb_dir) if "tfevents" in f]
    assert events and os.path.getsize(
        os.path.join(tb_dir, events[0])) > 0


def test_profile_kv(tmp_path):
    lg = logger.configure(str(tmp_path), ["csv"])
    with logger.profile_kv("purify"):
        time.sleep(0.01)
    assert lg.name2val["wait_purify"] >= 0.01


def test_log_loss_dict(tmp_path):
    logger.configure(str(tmp_path), ["csv"])

    class D:
        num_timesteps = 100

    ts = np.asarray([5, 30, 60, 99])
    losses = {"loss": np.asarray([1.0, 2.0, 3.0, 4.0])}
    logger.log_loss_dict(D(), ts, losses)
    vals = logger.get_current().name2val
    assert vals["loss"] == 2.5
    assert vals["loss_q0"] == 1.0 and vals["loss_q3"] == 4.0


def test_artifact_dumps(tmp_path):
    w = np.sin(2 * np.pi * 440 * np.arange(4000) / 16000).astype(
        np.float32)
    artifacts.audio_save(w, str(tmp_path), "a.wav")
    artifacts.spec_save(np.random.RandomState(0).randn(1, 32, 32),
                        str(tmp_path), "s.png")
    artifacts.audio_save_as_img(w, str(tmp_path), "w.png")
    for f in ("a.wav", "s.png", "w.png"):
        assert os.path.getsize(os.path.join(str(tmp_path), f)) > 100

    # wav round-trips through our reader
    from audiopure_tpu.data import read_wav

    y, sr = read_wav(os.path.join(str(tmp_path), "a.wav"))
    assert sr == 16000
    np.testing.assert_allclose(y, w, atol=1e-4)
