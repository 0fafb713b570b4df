from critic_vae_tpu.utils.image import (  # noqa: F401
    adjust_values,
    reverse_preprocess,
    to_np_image,
)
from critic_vae_tpu.utils.profiling import profile_trace, timed  # noqa: F401
