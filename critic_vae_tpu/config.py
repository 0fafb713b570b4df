"""Typed configuration for the framework.

Replaces the reference's flat star-imported constants module
(reference: vae_parameters.py:1-41) with a frozen dataclass plus CLI
overrides. Defaults are value-identical to the reference so that training
and evaluation reproduce its behavior out of the box.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """VAE + critic architecture hyperparameters.

    Reference values: vae_parameters.py:5-17 (w, ch, k, p, step, bottleneck,
    latent_dim), vae_nets.py:8 (encoder dims), critic_net.py:6-7 (critic dims).
    """

    image_size: int = 64
    channels: int = 3
    kernel_size: int = 5
    padding: int = 2
    stride: int = 1
    encoder_dims: Tuple[int, ...] = (32, 64, 128, 256)
    bottleneck: int = 4096  # 4*4*256 conv bottleneck
    latent_dim: int = 32
    critic_dims: Tuple[int, ...] = (8, 8, 8, 16)
    critic_bottleneck: int = 32
    inject_n: int = 6  # number of injected critic values (vae_parameters.py:22)
    # Compute dtype for conv/matmul activations on TPU. Params stay float32.
    compute_dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization hyperparameters (reference: vae_parameters.py:9-21, vae.py:36)."""

    epochs: int = 7
    batch_size: int = 128
    learning_rate: float = 5e-5
    kld_weight: float = 1e-3
    total_images: int = 50_000
    log_every_batches: int = 30  # log_n = batch_size*30 (vae_parameters.py:21)
    seed: int = 0
    # Drop the trailing incomplete batch each epoch, like the reference's
    # index slicing does (vae.py:44-46).
    drop_remainder: bool = True
    # Checkpoint/resume (greenfield: the reference only saves at the very end,
    # vae.py:162-163, with no optimizer state and no resume).
    checkpoint_every_steps: int = 500
    keep_checkpoints: int = 3


from critic_vae_tpu.crf import REFERENCE_CRF_PARAMS as _CRF


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Mask / video pipeline parameters (reference: vae_utility.py:17, vae.py:121)."""

    threshold: int = 50
    threshold_sweep: Tuple[int, ...] = tuple(range(0, 130, 10))
    # denseCRF params (w1, alpha, beta, w2, gamma, iters) — vae_utility.py:25-30;
    # values derive from the one canonical tuple (crf.REFERENCE_CRF_PARAMS)
    crf_w1: float = _CRF[0]
    crf_alpha: float = _CRF[1]
    crf_beta: float = _CRF[2]
    crf_w2: float = _CRF[3]
    crf_gamma: float = _CRF[4]
    crf_iters: int = _CRF[5]

    @property
    def crf_params(self) -> Tuple[float, float, float, float, float, int]:
        return (self.crf_w1, self.crf_alpha, self.crf_beta,
                self.crf_w2, self.crf_gamma, self.crf_iters)
    # Episode slicing: frames[100:5000:2] (vae_utility.py:75-77)
    episode_slice: Tuple[int, int, int] = (100, 5000, 2)
    # Critic-binned balanced sampling (vae_utility.py:404,431-457)
    bin_collect_per_trajectory: int = 150
    bin_low_max: float = 0.25
    bin_mid_lo: float = 0.4
    bin_mid_hi: float = 0.6
    bin_high_min: float = 0.7


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Filesystem layout (reference: vae_parameters.py:25-41)."""

    root: str = "."
    encoder_path: str = "saved-networks/vae_encoder.ckpt"
    decoder_path: str = "saved-networks/vae_decoder.ckpt"
    second_encoder_path: str = "vae2_encoder.ckpt"
    second_decoder_path: str = "vae2_decoder.ckpt"
    critic_path: str = (
        "saved-networks/critic-rewidx=1-cepochs=15-datamode=trunk-"
        "datasize=99999-shift=12-chfak=1-dropout=0.3.pt"
    )
    source_images_path: str = "source-images"
    save_path: str = "images"
    inject_path: str = "inject"
    video_path: str = "videos"
    save_dataset_path: str = "recon-dataset.npz"
    minerl_episode_path: str = "minerl-episode"
    log_dir: str = "logs"

    def resolve(self, rel: str) -> Path:
        p = Path(rel)
        return p if p.is_absolute() else Path(self.root) / p


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh / parallelism settings.

    The reference has no parallelism of any kind (single process, single
    device — vae_parameters.py:2); data parallelism here is a greenfield
    TPU-native component: a 1-D mesh over all addressable devices, batch
    sharded along it, gradients reduced by XLA-inserted ICI collectives.
    """

    data_axis: str = "data"
    # 0 = use all addressable devices.
    num_devices: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mask: MaskConfig = dataclasses.field(default_factory=MaskConfig)
    paths: PathConfig = dataclasses.field(default_factory=PathConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def replace(self, **sections) -> "Config":
        return dataclasses.replace(self, **sections)


def default_config(root: str = ".") -> Config:
    cfg = Config()
    return cfg.replace(paths=dataclasses.replace(cfg.paths, root=root))
