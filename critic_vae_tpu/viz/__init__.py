from critic_vae_tpu.viz.gif import write_gif  # noqa: F401
from critic_vae_tpu.viz.panels import final_frame, inject_strip, to_uint8_rgb  # noqa: F401
