"""Golden pins for the saliency mask pipeline (no reference dependence).

The saliency mask sources are beyond-reference capability, so there is no
torch to compare against — these goldens freeze the shipped behavior
itself: whole-stack threshold IoUs of both estimators (gradient and
LayerCAM) on a fixed 48-frame synthetic episode, through the REAL
pipeline (`threshold_sweep`: episode_device_stage → two-pass mean-max
normalization → uint8 thresholds → stacked IoU). A regression anywhere in
the critic forward/VJP, the CAM tap hook, the separable blur, the
normalization, or the sweep shows up as a drifted IoU.

Pinned on the virtual CPU mesh (conftest forces jax_platforms=cpu), where
matmuls are exact f32 — so the pins are deterministic across runs. The
real chip rounds MXU operands to bf16 (CLAUDE.md); on-chip numbers live in
docs/artifacts/saliency.json instead.
"""

import os

import pytest

import jax

from critic_vae_tpu.data.synthetic import generate_frames
from critic_vae_tpu.models.critic import load_critic
from critic_vae_tpu.models.vae import init_vae_params
from critic_vae_tpu.pipelines.video import threshold_sweep

# recorded 2026-08-18 (48 frames, seed 9999, critic-synthetic.npz,
# fresh VAE key(0) — the saliency path never consults the VAE);
# layercam values are the lanczos3-upsample default
GOLDEN = {
    "layercam": [(80, 0.498), (100, 0.499), (140, 0.464)],
    "layercam-bilinear": [(80, 0.481), (112, 0.493), (140, 0.479)],
    "gradient": [(60, 0.270), (110, 0.279), (150, 0.233)],
}


@pytest.mark.parametrize("method", sorted(GOLDEN))
def test_saliency_pipeline_iou_matches_recorded_golden(method):
    frames, gt = generate_frames(48, seed=9999)
    critic = load_critic(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "saved-networks", "critic-synthetic.npz"))
    params, bn = init_vae_params(jax.random.key(0))
    thrs = [t for t, _ in GOLDEN[method]]
    opts = {"method": method.split("-")[0]}
    if method.endswith("-bilinear"):
        opts["cam_upsample"] = "bilinear"
    sweep = threshold_sweep(
        params, bn, critic, frames, gt, thresholds=thrs, run_crf=False,
        mask_source="saliency", saliency_opts=opts,
        batch_size=16,
    )
    got = {r["threshold"]: r["thr_iou"] for r in sweep}
    for thr, want in GOLDEN[method]:
        # thr_iou is rounded to 3 decimals by the sweep; exact-match it
        # with a 1-ulp-of-rounding cushion for BLAS variation
        assert abs(got[thr] - want) <= 0.0015, (
            f"{method}@{thr}: got {got[thr]}, recorded {want}"
        )
