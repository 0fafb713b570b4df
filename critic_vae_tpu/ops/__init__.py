from critic_vae_tpu.ops.iou import iou  # noqa: F401
from critic_vae_tpu.ops.losses import kld_loss, vae_loss  # noqa: F401
from critic_vae_tpu.ops.msssim import msssim_loss  # noqa: F401
