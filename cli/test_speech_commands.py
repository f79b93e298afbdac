"""Classifier accuracy/confusion evaluation.

Rebuild of ``ConvNets_SpeechCommands/test_speech_commands.py:40-145``
(torchnet meters become numpy counters).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("--dataset_dir", required=True)
    parser.add_argument("--classifier_path", required=True)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--sc09", action="store_true")
    parser.add_argument("--multi_crop", action="store_true",
                        help="3 time-crops + original, averaged "
                             "(ref test_speech_commands.py:62-69)")
    parser.add_argument("--output", default=None,
                        help="write per-file predictions CSV (the "
                             "reference's kaggle submission mode)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiopure_tpu.data import DataLoader, SC09Dataset, \
        SpeechCommandsDataset
    from audiopure_tpu.data.transforms import Compose, FixAudioLength, \
        LoadAudio
    from audiopure_tpu.models import create_classifier
    from audiopure_tpu.ops import MelFrontEnd
    from audiopure_tpu.utils import checkpoint as ckpt_lib

    variables, meta = ckpt_lib.load_model(args.classifier_path)
    model = create_classifier(meta["model_name"],
                              num_classes=meta["num_classes"])
    is_wave = meta["model_name"] == "m5"
    fe = None if is_wave else MelFrontEnd()

    def _multi_crop(spec):
        """(B, 1, M, T) -> (4B, 1, M, T): original + 3 shifted crops with
        edge-replicate padding (ref ``multi_crop``)."""
        b = 1
        size = spec.shape[3] - 2 * b
        patches = [spec[:, :, :, i * b: size + i * b] for i in range(3)]
        crops = jnp.concatenate(patches, axis=0)
        crops = jnp.pad(crops, ((0, 0), (0, 0), (0, 0), (b, b)),
                        mode="edge")
        return jnp.concatenate([spec, crops], axis=0)

    from audiopure_tpu.utils.jit_utils import hoisted_jit

    @hoisted_jit
    def predict(x):
        inp = x if fe is None else fe(x)
        if args.multi_crop and fe is not None:
            n = inp.shape[0]
            out = model.apply(variables, _multi_crop(inp))
            out = out.reshape(4, n, -1).mean(axis=0)
            return jnp.argmax(out, -1)
        return jnp.argmax(model.apply(variables, inp), -1)

    ds_cls = SC09Dataset if args.sc09 else SpeechCommandsDataset
    ds = ds_cls(args.dataset_dir, transform=Compose(
        [LoadAudio(), FixAudioLength()]))
    loader = DataLoader(ds, args.batch_size)

    n_classes = meta["num_classes"]
    confusion = np.zeros((n_classes, n_classes), dtype=np.int64)
    correct = total = 0
    predictions = {}
    for batch in loader:
        x = jnp.asarray(batch["samples"])[:, None, :]
        y = np.asarray(batch["target"])
        pred = np.asarray(predict(x))
        for path, t, p in zip(batch["path"], y, pred):
            confusion[t, p] += 1
            predictions[path] = int(p)
        correct += int((pred == y).sum())
        total += len(y)

    acc = correct / total
    print(f"accuracy: {100 * acc:.6f}%")
    print("confusion matrix:")
    print(confusion)

    if args.output:
        import csv
        import os as _os

        classes = ds.classes
        with open(args.output, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["fname", "label"])
            for path, p in predictions.items():
                w.writerow([_os.path.basename(path), classes[p]])
        print(f"wrote {args.output}")
    return acc, confusion


if __name__ == "__main__":
    main()
