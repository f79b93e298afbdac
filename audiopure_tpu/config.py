"""Typed configuration tree for AudioPure-TPU.

One dataclass tree, JSON-(de)serializable, mirroring the reference's
``{diffusion_config, wavenet_config, train_config, trainset_config,
dist_config}`` grouping (reference: ``configs/config.json:1-42``) plus the
attack / defense argument groups that the reference spreads across argparse
namespaces (reference: ``adaptive_attack_eval.py:15-52``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class DiffusionConfig:
    """Linear-beta DDPM schedule (reference: ``configs/config.json:2-6``)."""

    T: int = 200
    beta_0: float = 1e-4
    beta_T: float = 0.02


@dataclass
class WaveNetConfig:
    """DiffWave epsilon-net (reference: ``configs/config.json:7-17``)."""

    in_channels: int = 1
    res_channels: int = 256
    skip_channels: int = 256
    out_channels: int = 1
    num_res_layers: int = 36
    dilation_cycle: int = 12
    diffusion_step_embed_dim_in: int = 128
    diffusion_step_embed_dim_mid: int = 512
    diffusion_step_embed_dim_out: int = 512


@dataclass
class TrainConfig:
    """DiffWave training loop (reference: ``configs/config.json:18-27``)."""

    output_directory: str = "logs/checkpoint"
    tensorboard_directory: str = "logs/tensorboard"
    ckpt_iter: Any = "max"
    iters_per_ckpt: int = 10_000
    iters_per_logging: int = 100
    n_iters: int = 1_000_001
    learning_rate: float = 2e-4
    batch_size_per_gpu: int = 2  # kept name for config-file compat; = per-chip


@dataclass
class TrainsetConfig:
    data_path: str = ""
    segment_length: int = 16000
    sampling_rate: int = 16000


@dataclass
class GenConfig:
    """Sampling outputs (reference ``configs/config.json:33-37``)."""

    tensorboard_directory: str = "logs/tensorboard"
    output_directory: str = "speeches"
    ckpt_path: str = "logs/checkpoint"


@dataclass
class MeshConfig:
    """TPU device-mesh layout (replaces the reference's ``dist_config`` NCCL
    block, ``configs/config.json:38-41``; see SURVEY.md §2.7)."""

    dp: int = -1  # -1: all devices on the data axis
    tp: int = 1
    axis_names: Tuple[str, ...] = ("dp", "tp")


@dataclass
class PurifierConfig:
    """Arguments of the diffusion defenses (reference:
    ``adaptive_attack_eval.py:23-32`` + ``diffwave_sde.py:137-165``)."""

    t: int = 3                      # reverse steps / noise scale
    sample_step: int = 1            # number of purification runs, concatenated
    t_delta: int = 0                # +- randomization of t
    rand_t: bool = False
    diffusion_type: str = "sde"     # {"ddpm", "sde"}
    score_type: str = "guided_diffusion"
    use_bm: bool = False
    audio_length: int = 16000


@dataclass
class AttackConfig:
    """White/black-box attack arguments (reference:
    ``adaptive_attack_eval.py:34-43`` and ``white_box_attack.py:280-302``)."""

    attack: str = "PGD"             # {"PGD", "FAKEBOB", "Kenansville"}
    defense: str = "Diffusion"
    bound_norm: str = "linf"        # {"linf", "l2"}
    eps: float = 0.002
    max_iter_1: int = 70
    max_iter_2: int = 0
    eot_attack_size: int = 1
    eot_defense_size: int = 1
    verbose: int = 0


@dataclass
class MelConfig:
    """Mel front-end (reference: ``adaptive_attack_eval.py:83-85``)."""

    sample_rate: int = 16000
    n_fft: int = 2048
    hop_length: int = 512
    n_mels: int = 32
    norm: str = "slaney"
    mel_scale: str = "slaney"
    power: float = 2.0


@dataclass
class Config:
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    wavenet: WaveNetConfig = field(default_factory=WaveNetConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    trainset: TrainsetConfig = field(default_factory=TrainsetConfig)
    gen: GenConfig = field(default_factory=GenConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    purifier: PurifierConfig = field(default_factory=PurifierConfig)
    attack: AttackConfig = field(default_factory=AttackConfig)
    mel: MelConfig = field(default_factory=MelConfig)


# Mapping between reference-JSON group names and our dataclass fields so that
# the reference's config.json files load unchanged.
_REF_GROUPS = {
    "diffusion_config": ("diffusion", DiffusionConfig),
    "wavenet_config": ("wavenet", WaveNetConfig),
    "train_config": ("train", TrainConfig),
    "trainset_config": ("trainset", TrainsetConfig),
    "gen_config": ("gen", GenConfig),
}


def _filter_kwargs(cls, d: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


def load_config(path: str) -> Config:
    """Load a config JSON. Accepts both our native layout and the reference's
    ``configs/config.json`` group names."""
    with open(path) as f:
        raw = json.load(f)
    cfg = Config()
    for key, val in raw.items():
        if key in _REF_GROUPS:
            attr, cls = _REF_GROUPS[key]
            setattr(cfg, attr, cls(**_filter_kwargs(cls, val)))
        elif hasattr(cfg, key) and isinstance(val, dict):
            cls = type(getattr(cfg, key))
            setattr(cfg, key, cls(**_filter_kwargs(cls, val)))
    return cfg


def to_json(cfg: Config) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
