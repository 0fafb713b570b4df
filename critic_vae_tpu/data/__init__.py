from critic_vae_tpu.data.episode import load_episode  # noqa: F401
from critic_vae_tpu.data.sampler import balanced_critic_sampler  # noqa: F401
from critic_vae_tpu.data.synthetic import generate_episode  # noqa: F401
