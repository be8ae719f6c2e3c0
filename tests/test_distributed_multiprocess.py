"""Real 2-process `jax.distributed` coverage for the multi-host code path.

Everything else in the suite runs the hybrid mesh on ONE process (where
`make_hybrid_mesh` degrades to a reshape, parallel/shard.py:77-84).  This
test spawns two actual processes with `jax.distributed.initialize` on CPU
(2 local devices each → 4 global devices, gloo collectives), so the
`mesh_utils.create_hybrid_device_mesh` arm (parallel/shard.py:71-76) and
`initialize_distributed` (:47-51) genuinely execute — the GSPMD analogue of
bringing up the reference's multi-GPU accelerate placement
(QQQ/utils/model_utils.py:55-76) on a real 2-host slice.

Each worker builds the same tiny quantized model from a fixed seed, shards
it over the hybrid (data=2-process DCN axis) × (model=2-device ICI axis)
mesh, runs one tp_forward_fn step, and checks its addressable logits shard
against the locally-computed single-device forward.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.environ["QQQ_REPO"])
from qqq_tpu.parallel import initialize_distributed

initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import numpy as np
import jax.numpy as jnp

from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.parallel import make_hybrid_mesh
from qqq_tpu.parallel.shard import param_pspecs, shard_params, tp_forward_fn
from __graft_entry__ import _quantize_params

devs = jax.devices()
assert len(devs) == 4 and {d.process_index for d in devs} == {0, 1}, devs

mesh = make_hybrid_mesh(dcn_data=2, ici_data=1, ici_model=2)
assert mesh.devices.shape == (2, 2), mesh.devices.shape
# the hybrid property create_hybrid_device_mesh guarantees: each DCN (data)
# row lives entirely on one process, so TP collectives stay intra-host
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, mesh.devices

cfg = ModelConfig(
    vocab_size=256,
    hidden_size=256,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=32,
)
params = init_params(cfg, jax.random.PRNGKey(7), dtype=jnp.float32)
qparams = _quantize_params(params, cfg, group_size=128)
rng = np.random.default_rng(11)
tokens = jnp.asarray(rng.integers(0, 256, size=(4, 8)).astype(np.int32))
want, _ = forward(qparams, cfg, tokens)  # single-device reference

specs = param_pspecs(qparams)
sparams = shard_params(qparams, mesh, specs)
f = tp_forward_fn(cfg, mesh, specs)
got = f(sparams, tokens)

# logits are P("data", None, None): this process holds its 2-row data
# shard, replicated across its 2 local model-axis devices
scale = float(np.abs(np.asarray(want)).max())
checked = 0
starts = set()
for shard in got.addressable_shards:
    b0 = shard.index[0].start or 0
    starts.add(b0)
    rows = np.asarray(shard.data)
    ref = np.asarray(want)[b0 : b0 + rows.shape[0]]
    np.testing.assert_allclose(rows, ref, atol=0.05 * scale)
    checked += rows.shape[0]
assert checked == 4, checked  # 2 model-replicas x the process's 2-row shard
assert len(starts) == 1, starts  # …and only ITS data shard is addressable
print(f"proc {pid} OK checked={checked}", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_hybrid_mesh_forward(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["QQQ_REPO"] = REPO
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out, out
