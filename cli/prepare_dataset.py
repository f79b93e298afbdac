"""Speech Commands dataset download + split.

Rebuild of ``datasets/download_speech_commands_dataset.sh`` +
``datasets/split_dataset.py``: downloads speech_commands_v0.01 (when the
environment has egress) and splits folders into train/valid/test by the
official ``testing_list.txt`` / ``validation_list.txt``.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tarfile
import urllib.request

URL = ("http://download.tensorflow.org/data/"
       "speech_commands_v0.01.tar.gz")


def download(dest: str) -> str:
    os.makedirs(dest, exist_ok=True)
    tar_path = os.path.join(dest, "speech_commands_v0.01.tar.gz")
    if not os.path.exists(tar_path):
        print(f"downloading {URL} ...")
        urllib.request.urlretrieve(URL, tar_path)
    audio_dir = os.path.join(dest, "audio")
    if not os.path.isdir(audio_dir):
        os.makedirs(audio_dir, exist_ok=True)
        with tarfile.open(tar_path) as t:
            t.extractall(audio_dir)
    return audio_dir


def split(audio_dir: str, out_dir: str) -> None:
    """Move files into train/valid/test per the official lists
    (ref ``split_dataset.py``)."""
    with open(os.path.join(audio_dir, "testing_list.txt")) as f:
        test_set = set(line.strip() for line in f if line.strip())
    with open(os.path.join(audio_dir, "validation_list.txt")) as f:
        valid_set = set(line.strip() for line in f if line.strip())

    counts = {"train": 0, "valid": 0, "test": 0}
    for cls in sorted(os.listdir(audio_dir)):
        cls_dir = os.path.join(audio_dir, cls)
        if not os.path.isdir(cls_dir):
            continue
        for fname in sorted(os.listdir(cls_dir)):
            rel = f"{cls}/{fname}"
            if cls.startswith("_"):
                subset = "train"  # background noise stays with train
            elif rel in test_set:
                subset = "test"
            elif rel in valid_set:
                subset = "valid"
            else:
                subset = "train"
            dst = os.path.join(out_dir, subset, cls)
            os.makedirs(dst, exist_ok=True)
            shutil.copy2(os.path.join(cls_dir, fname),
                         os.path.join(dst, fname))
            counts[subset] += 1
    print(f"split complete: {counts}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dest", default="datasets/speech_commands")
    parser.add_argument("--audio_dir", default=None,
                        help="already-extracted archive dir (skips "
                             "download; required in zero-egress envs)")
    args = parser.parse_args(argv)

    audio_dir = args.audio_dir or download(args.dest)
    split(audio_dir, args.dest)


if __name__ == "__main__":
    main()
