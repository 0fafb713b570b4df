"""critic_vae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) critic-conditioned VAE framework.

Re-implements the full capability surface of the reference Critic-VAE codebase
(see /root/reference, a single-GPU PyTorch research repo) as a TPU-first
framework: functional models over parameter pytrees, fused jitted train/eval
steps, batched mask pipelines, data-parallel sharding over a `jax.sharding.Mesh`,
a C++ dense-CRF post-processor, and a subcommand CLI covering every mode the
reference exposes (train / eval / inject / video / dataset / second /
evalsecond — reference: vae.py:23-31).

Nothing here is a translation of the reference's torch code: layouts are NHWC,
inference is batched (the reference runs frame loops at batch size 1,
e.g. vae.py:85), and parallelism is expressed through shardings compiled to
ICI collectives by XLA rather than any host-side loop.
"""

__version__ = "0.1.0"

from critic_vae_tpu.config import Config, default_config  # noqa: F401
