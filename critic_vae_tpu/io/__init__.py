from critic_vae_tpu.io.legacy_pt import load_torch_pt  # noqa: F401
