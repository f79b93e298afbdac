"""Model zoo: classifiers and score networks.

Registry mirrors the reference's
``audio_models/ConvNets_SpeechCommands/models/__init__.py:8-46`` plus the
raw-waveform M5, the RCNN keyword spotter, and the diffusion score nets.
"""

from audiopure_tpu.models.wavenet import WaveNet  # noqa: F401
from audiopure_tpu.models.m5 import M5  # noqa: F401


def create_classifier(model_name: str, num_classes: int = 10,
                      in_channels: int = 1, dtype=None):
    """Build a classifier module by name (flax.linen Module).

    Mirrors ``models.create_model`` in the reference
    (``ConvNets_SpeechCommands/models/__init__.py:17-46``);
    ``dtype`` selects the compute dtype (e.g. bfloat16 for the TPU MXU).
    """
    import jax.numpy as jnp

    from audiopure_tpu.models import convnets
    from audiopure_tpu.models.m5 import M5
    from audiopure_tpu.models.rcnn_kws import KWSModel

    dtype = dtype if dtype is not None else jnp.float32
    name = model_name.lower()
    if name == "m5":
        return M5(n_output=num_classes, n_input=in_channels, dtype=dtype)
    if name == "kwsmodel":
        return KWSModel(num_classes=num_classes, dtype=dtype)
    return convnets.create_model(name, num_classes=num_classes,
                                 in_channels=in_channels, dtype=dtype)


available_models = [
    "m5", "kwsmodel",
    "vgg19_bn",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "wideresnet28_10", "wideresnet28_10D", "wideresnet52_10",
    "resnext29_8_64",
    "dpn92",
    "densenet_bc_100_12", "densenet_bc_250_24", "densenet_bc_190_40",
]
