"""AudioPure-TPU: a TPU-native JAX framework for diffusion-based adversarial
purification of audio classifiers.

Re-designed from scratch for TPU (jax/XLA/pallas/pjit) with the same
capabilities as the PyTorch reference (cychomatica/AudioPure, ICLR 2023):

- DiffWave DDPM / reverse VP-SDE waveform purification
- Improved-Diffusion spectrogram purification
- AcousticSystem purify->transform->classify composite
- White-box (EOT-PGD), black-box (NES/FAKEBOB), signal-processing
  (Kenansville) attacks, and randomized-smoothing certification
- Classifier zoo (M5, VGG/ResNet/WideResNet/DenseNet/DPN/ResNeXt, RCNN-KWS)
- Training pipelines for every model, sharded over TPU meshes

Everything that the reference writes as a Python loop (reverse diffusion, PGD,
EOT/NES/smoothing draws) is a `lax.scan`/`vmap` here, so whole attack-on-
purifier pipelines compile to a single XLA program.
"""

__version__ = "0.1.0"

from audiopure_tpu.system import AcousticSystem  # noqa: F401
