"""True multi-PROCESS data-parallel proof (the DCN analog).

The reference has no distributed backend at all (SURVEY §2.5); our multi-host
story is ``jax.distributed.initialize`` + the same ("dp","tp") mesh laid over
every process's devices. ``test_multihost.py`` proves the 1-process bring-up;
this file runs the real thing: TWO OS processes, each owning 4 virtual CPU
devices, joined through a localhost coordinator (cross-process collectives
ride Gloo on CPU — the stand-in for DCN). The SFT train step over the global
dp=4×tp=2 mesh must produce the single-process 8-device run's loss to float
round-off: the cross-process allreduce (Gloo) may reassociate the dp-sum in a
different order than XLA's intra-process reduction, so bit-equality across
process TOPOLOGIES is not promised — but the two participating processes see
the SAME collective and must agree bit-for-bit with each other.

Each child uses the unchanged production code paths — make_mesh over global
devices, shard_params via jax.device_put with cross-process NamedShardings,
batch_sharding over dp — i.e. this also proves those helpers are
multi-process-clean, not just multi-device-clean.
"""

import socket
import subprocess
import sys

CHILD = r"""
import os, sys
sys.path.insert(0, "@REPO_ROOT@")
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
per = 8 // nproc
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + f" --xla_force_host_platform_device_count={per}")
# Fresh processes must not share the suite's AOT compile-cache entries.
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"
import jax
jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    from qwen_tts_tpu.parallel.multihost import init_multihost, process_info
    assert init_multihost(coordinator_address=f"localhost:{port}",
                          num_processes=nproc, process_id=pid) is True
    info = process_info()
    assert info["process_count"] == nproc and info["global_devices"] == 8
import jax.numpy as jnp
import numpy as np
import optax
from qwen_tts_tpu.config import tiny_tts_config
from qwen_tts_tpu.models import subtalker as st_mod
from qwen_tts_tpu.models import talker as talker_mod
from qwen_tts_tpu.parallel.mesh import batch_sharding, make_mesh, shard_params
from qwen_tts_tpu.training.sft import SFTBatch, make_train_step

cfg = tiny_tts_config().talker
mesh = make_mesh(8, tp=2)  # dp=4 spans the process boundary when nproc=2
rng = jax.random.PRNGKey(0)
talker_params = talker_mod.init_talker_params(rng, cfg)
st_params = st_mod.init_subtalker_params(
    jax.random.fold_in(rng, 1), cfg.code_predictor, cfg.hidden_size
)
with mesh:
    talker_params, st_params = shard_params(mesh, talker_params, st_params)
    params = {"talker": talker_params, "subtalker": st_params}
    b, s, g = 4, 8, cfg.num_code_groups
    np_rng = np.random.default_rng(0)
    batch = SFTBatch(
        inputs_embeds=jnp.asarray(
            np_rng.standard_normal((b, s, cfg.hidden_size)).astype(np.float32)),
        pad_mask=jnp.ones((b, s), bool),
        codec0_labels=jnp.asarray(
            np_rng.integers(0, cfg.vocab_size, (b, s)).astype(np.int32)),
        group_labels=jnp.asarray(np_rng.integers(
            0, cfg.code_predictor.vocab_size, (b, s, g)).astype(np.int32)),
        frame_mask=jnp.ones((b, s), bool),
    )
    batch = SFTBatch(*[jax.device_put(np.asarray(x),
                                      batch_sharding(mesh, np.ndim(x)))
                       for x in batch])
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)
    train_step = make_train_step(cfg, tx)
    params, opt_state, loss, aux = train_step(params, opt_state, batch)
    jax.block_until_ready(loss)
    print(f"LOSS={float(jax.device_get(loss)):.10f}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _loss_of(out: subprocess.CompletedProcess) -> str:
    assert out.returncode == 0, (out.stderr or "")[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("LOSS=")]
    assert lines, out.stdout[-2000:]
    return lines[-1]


def test_two_process_dp_tp_train_step_matches_single_process(tmp_path):
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(CHILD.replace("@REPO_ROOT@", repo_root))

    single = subprocess.run(
        [sys.executable, str(script), "0", "1", "0"],
        capture_output=True, text=True, timeout=900,
    )
    ref_loss = _loss_of(single)

    port = str(_free_port())
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=900)
        outs.append(subprocess.CompletedProcess(p.args, p.returncode,
                                                stdout, stderr))
    losses = [_loss_of(out) for out in outs]
    # Both processes participate in the same collective: bit-equal.
    assert losses[0] == losses[1], f"processes disagree: {losses}"
    # vs single-process: identical math, reduction order may differ by the
    # collective backend (Gloo vs intra-process XLA) — float round-off only.
    ref = float(ref_loss.split("=")[1])
    got = float(losses[0].split("=")[1])
    assert abs(got - ref) <= 1e-5 * max(1.0, abs(ref)), (
        f"multi-process dp loss diverged from single-process: "
        f"{got} != {ref}"
    )
