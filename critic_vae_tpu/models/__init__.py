from critic_vae_tpu.models.critic import (  # noqa: F401
    critic_apply,
    critic_params_from_torch,
    load_critic,
)
from critic_vae_tpu.models.vae import (  # noqa: F401
    decode,
    encode,
    init_vae_params,
    reparametrize,
    vae_apply,
    vae_params_from_torch,
)
