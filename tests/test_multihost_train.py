"""Multi-host TRAINING end-to-end (greenfield — SURVEY §2.3/§5).

Round-2 verdict: ``init_distributed``/``is_primary`` existed but nothing
called them, and a real multi-process run would have every host clobbering
the same checkpoint/log files. This test closes that: two real processes
(4 virtual CPU devices each) run the actual ``pipelines.train.train`` over
one global 8-device mesh under ``jax.distributed`` and must produce

* the same loss curve as a single-process 8-device run (same global mesh
  partitioning → same math; tolerance covers cross-process reduction-order
  differences in the gradient all-reduce),
* exactly ONE process's worth of checkpoint/TB/JSONL files on disk
  (``is_primary`` gating in pipelines/train.py).

The reference has nothing to compare against (single-process,
vae_parameters.py:2).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from tests.conftest import CRITIC_PT

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EPOCHS = 2
BATCH = 16
FRAMES = 64  # -> 4 steps/epoch, 8 total
DATA_SEED = 3

_CHILD = """
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from critic_vae_tpu.parallel.distributed import init_distributed, is_primary
ok = init_distributed({addr!r}, num_processes=2, process_id=int(sys.argv[1]))
assert ok and jax.process_count() == 2
outdir = {outdir!r}

# instrument the checkpoint writer: every actual write records its process
# index, so the parent can assert single-writer behavior directly
from critic_vae_tpu.io import checkpoint as ckpt_io
_orig_save = ckpt_io.save_train_state
def _recording_save(path, state):
    with open(os.path.join(outdir, "writers.txt"), "a") as f:
        f.write(f"{{jax.process_index()}}\\n")
    return _orig_save(path, state)
ckpt_io.save_train_state = _recording_save

import numpy as np
from critic_vae_tpu.data.synthetic import generate_frames
from critic_vae_tpu.models.critic import load_critic
from critic_vae_tpu.pipelines.train import train

frames, _ = generate_frames({frames}, seed={data_seed})
critic = load_critic({critic!r})
state = train(
    critic, frames,
    epochs={epochs}, batch_size={batch}, log_every_batches=1,
    log_dir=os.path.join(outdir, "logs"),
    checkpoint_dir=os.path.join(outdir, "ckpt"), checkpoint_every_steps=4,
    resume=False, progress=False, seed=0,
)
final_step = int(np.asarray(state.step))
assert final_step == {epochs} * ({frames} // {batch}), final_step
sys.stdout.write(f"CHILD_OK {{jax.process_index()}}\\n")
sys.stdout.flush()
"""


def _read_losses(log_dir):
    jsonls = [f for f in os.listdir(log_dir) if f.endswith(".jsonl")]
    assert jsonls == ["metrics.jsonl"], jsonls
    rows = []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    rows.sort(key=lambda r: (r["step"],))
    return rows


def test_two_process_train_matches_single_process(tmp_path, critic_params):
    # --- single-process run on the parent's own 8-device CPU mesh ---
    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.pipelines.train import train

    frames, _ = generate_frames(FRAMES, seed=DATA_SEED)
    sp_logs = str(tmp_path / "sp_logs")
    train(
        critic_params, frames,
        epochs=EPOCHS, batch_size=BATCH, log_every_batches=1,
        log_dir=sp_logs, checkpoint_dir=None, resume=False, progress=False,
        seed=0,
    )
    sp_rows = _read_losses(sp_logs)
    assert len(sp_rows) == EPOCHS * (FRAMES // BATCH)

    # --- the same training as 2 processes x 4 devices over one global mesh ---
    outdir = str(tmp_path / "mh")
    os.makedirs(outdir)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    child = _CHILD.format(
        repo=REPO, addr=f"127.0.0.1:{port}", outdir=outdir, critic=CRITIC_PT,
        frames=FRAMES, batch=BATCH, epochs=EPOCHS, data_seed=DATA_SEED,
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"CHILD_OK {i}" in out

    # exactly one process wrote checkpoints...
    with open(os.path.join(outdir, "writers.txt")) as f:
        writers = set(f.read().split())
    assert writers == {"0"}, writers
    ckpts = sorted(f for f in os.listdir(os.path.join(outdir, "ckpt")) if f.endswith(".npz"))
    assert ckpts, "primary wrote no checkpoints"
    # ...and one process's worth of log files (events files are pid-suffixed,
    # so a second writer would show up as a second file)
    mh_logs = os.path.join(outdir, "logs")
    events = [f for f in os.listdir(mh_logs) if f.startswith("events.out")]
    assert len(events) == 1, events

    # loss-curve equivalence with the single-process 8-device run: identical
    # global mesh -> identical partitioning; tolerance covers the different
    # reduction order of the cross-process gradient all-reduce
    mh_rows = _read_losses(mh_logs)
    assert [r["step"] for r in mh_rows] == [r["step"] for r in sp_rows]
    for key in ("total_loss", "recon_loss", "kld"):
        if key not in sp_rows[0]:
            continue
        sp = np.asarray([r[key] for r in sp_rows])
        mh = np.asarray([r[key] for r in mh_rows])
        np.testing.assert_allclose(mh, sp, rtol=1e-4, atol=1e-5, err_msg=key)


_CHILD_SERVE = """
import sys, os
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from critic_vae_tpu.parallel.distributed import init_distributed
ok = init_distributed({addr!r}, num_processes=2, process_id=int(sys.argv[1]))
assert ok and len(jax.devices()) == 8

import numpy as np
from critic_vae_tpu.data.synthetic import generate_frames
from critic_vae_tpu.models.critic import load_critic
from critic_vae_tpu.models.vae import init_vae_params
from critic_vae_tpu.parallel.mesh import make_mesh
from critic_vae_tpu.pipelines.video import eval_episode

frames, gt = generate_frames(24, seed={data_seed})
critic = load_critic({critic!r})
params, bn = init_vae_params(jax.random.key(0))
mesh = make_mesh()
res = eval_episode(
    params, bn, critic, frames, gt, threshold=50, run_crf=False,
    batch_size=8, mesh=mesh,
)
# every process receives the full gathered results (mesh.fetch allgathers
# the sharded chunk outputs)
assert res.preds.shape == (24,) and res.thr_masks.shape == gt.shape
np.save(os.path.join({outdir!r}, f"preds_{{jax.process_index()}}.npy"), res.preds)
np.save(os.path.join({outdir!r}, f"masks_{{jax.process_index()}}.npy"), res.thr_masks)
sys.stdout.write(f"SERVE_OK {{jax.process_index()}} {{res.thr_iou}}\\n")
sys.stdout.flush()
"""


def test_two_process_serving_matches_single_process(tmp_path, critic_params):
    """Multi-host SERVING: eval_episode over a global 2-process x 4-device
    mesh — exercises the process_allgather fetch path for sharded chunk
    outputs — must match the single-process 8-device run."""
    import jax

    from critic_vae_tpu.data.synthetic import generate_frames
    from critic_vae_tpu.models.vae import init_vae_params
    from critic_vae_tpu.parallel.mesh import make_mesh
    from critic_vae_tpu.pipelines.video import eval_episode

    frames, gt = generate_frames(24, seed=5)
    params, bn = init_vae_params(jax.random.key(0))
    ref = eval_episode(
        params, bn, critic_params, frames, gt, threshold=50, run_crf=False,
        batch_size=8, mesh=make_mesh(),
    )

    outdir = str(tmp_path / "serve")
    os.makedirs(outdir)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    child = _CHILD_SERVE.format(
        repo=REPO, addr=f"127.0.0.1:{port}", outdir=outdir, critic=CRITIC_PT,
        data_seed=5,
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", child, str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=540)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
        assert f"SERVE_OK {i}" in out

    for i in range(2):  # both processes hold the full, identical results
        preds = np.load(os.path.join(outdir, f"preds_{i}.npy"))
        masks = np.load(os.path.join(outdir, f"masks_{i}.npy"))
        np.testing.assert_allclose(preds, ref.preds, rtol=1e-4, atol=1e-5)
        agree = (masks == ref.thr_masks).mean()
        assert agree >= 0.999, agree
