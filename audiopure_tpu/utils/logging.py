"""Key-value metrics logger.

Rebuild of the 495-LoC OpenAI ``improved_diffusion/logger.py`` role
(SURVEY.md §5 observability): a KV store with mean aggregation
(``logkv_mean``), Human / JSON-lines / CSV / TensorBoard output formats
selected by env
or argument, ``log_loss_dict`` per-quartile diffusion loss logging, and a
``profile_kv`` timing context. Configured via ``AUDIOPURE_LOGDIR`` (the
reference uses ``OPENAI_LOGDIR``, also honored).
"""

from __future__ import annotations

import csv
import datetime
import json
import os
import sys
import tempfile
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Optional, Sequence

DEBUG, INFO, WARN, ERROR = 10, 20, 30, 40
DISABLED = 50


class HumanOutputFormat:
    def __init__(self, file):
        self.file = file

    def writekvs(self, kvs):
        key2str = {}
        for k, v in sorted(kvs.items()):
            valstr = f"{v:<8.3g}" if hasattr(v, "__float__") else str(v)
            key2str[self._trunc(k)] = self._trunc(valstr)
        if not key2str:
            return
        keywidth = max(map(len, key2str))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for k, v in sorted(key2str.items()):
            lines.append(f"| {k}{' ' * (keywidth - len(k))} | "
                         f"{v}{' ' * (valwidth - len(v))} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _trunc(s, maxlen=30):
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        self.file.write(" ".join(map(str, seq)) + "\n")
        self.file.flush()


class JSONOutputFormat:
    def __init__(self, filename):
        self.file = open(filename, "at")

    def writekvs(self, kvs):
        out = {k: float(v) if hasattr(v, "__float__") else v
               for k, v in kvs.items()}
        self.file.write(json.dumps(out) + "\n")
        self.file.flush()


class CSVOutputFormat:
    def __init__(self, filename):
        self.filename = filename
        self.keys: list = []
        self.sep = ","

    def writekvs(self, kvs):
        extra = sorted(set(kvs.keys()) - set(self.keys))
        if extra:
            self.keys += extra
            # rewrite with the new header
            rows = []
            if os.path.exists(self.filename):
                with open(self.filename) as f:
                    reader = csv.DictReader(f)
                    rows = list(reader)
            with open(self.filename, "w", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=self.keys)
                writer.writeheader()
                for row in rows:
                    writer.writerow(row)
        with open(self.filename, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self.keys)
            writer.writerow({k: kvs.get(k, "") for k in self.keys})


class TensorBoardOutputFormat:
    """Scalar event files (ref ``logger.py`` TensorBoardOutputFormat).

    Uses ``torch.utils.tensorboard`` (present in this image). Step is taken
    from the ``step`` key when logged, else an internal dump counter.
    """

    def __init__(self, ev_dir):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir=ev_dir)
        self._step = 0

    def writekvs(self, kvs):
        step = int(kvs.get("step", self._step))
        for k, v in kvs.items():
            if hasattr(v, "__float__"):
                self.writer.add_scalar(k, float(v), step)
        self.writer.flush()
        self._step += 1


def make_output_format(fmt: str, ev_dir: str, log_suffix: str = ""):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    if fmt == "log":
        return HumanOutputFormat(
            open(os.path.join(ev_dir, f"log{log_suffix}.txt"), "at"))
    if fmt == "json":
        return JSONOutputFormat(
            os.path.join(ev_dir, f"progress{log_suffix}.json"))
    if fmt == "csv":
        return CSVOutputFormat(
            os.path.join(ev_dir, f"progress{log_suffix}.csv"))
    if fmt == "tensorboard":
        return TensorBoardOutputFormat(
            os.path.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format: {fmt}")


class Logger:
    CURRENT: Optional["Logger"] = None

    def __init__(self, log_dir: str, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = log_dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        out = dict(self.name2val)
        for fmt in self.output_formats:
            if hasattr(fmt, "writekvs"):
                fmt.writekvs(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def log(self, *args, level=INFO):
        if self.level <= level:
            for fmt in self.output_formats:
                if isinstance(fmt, HumanOutputFormat):
                    fmt.writeseq(map(str, args))


def configure(log_dir: Optional[str] = None,
              format_strs: Optional[Sequence[str]] = None) -> Logger:
    if log_dir is None:
        log_dir = os.environ.get("AUDIOPURE_LOGDIR") \
            or os.environ.get("OPENAI_LOGDIR")
    if log_dir is None:
        log_dir = os.path.join(
            tempfile.gettempdir(),
            datetime.datetime.now().strftime("audiopure-%Y-%m-%d-%H-%M-%S"))
    if format_strs is None:
        format_strs = os.environ.get(
            "AUDIOPURE_LOG_FORMAT", "stdout,log,csv").split(",")
    formats = [make_output_format(f, log_dir) for f in format_strs if f]
    Logger.CURRENT = Logger(log_dir, formats)
    return Logger.CURRENT


def get_current() -> Logger:
    if Logger.CURRENT is None:
        configure()
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def dumpkvs():
    return get_current().dumpkvs()


def log(*args, **kwargs):
    get_current().log(*args, **kwargs)


def get_dir() -> str:
    return get_current().dir


@contextmanager
def profile_kv(scope_name: str):
    """Accumulate wall-clock into ``wait_<name>`` (ref logger.py profile)."""
    start = time.time()
    try:
        yield
    finally:
        get_current().name2val["wait_" + scope_name] += time.time() - start


def log_loss_dict(diffusion, ts, losses):
    """Per-quartile diffusion loss logging (ref ``train_util.py:360-366``)."""
    import numpy as np

    ts = np.asarray(ts)
    for key, values in losses.items():
        values = np.asarray(values)
        logkv_mean(key, float(values.mean()))
        for t, v in zip(ts, values):
            quartile = int(4 * t / diffusion.num_timesteps)
            logkv_mean(f"{key}_q{quartile}", float(v))
