"""Decompose full-model prefill time (B=1, T=1024, Llama-2-7B geometry) into
per-layer components on the real chip — where do the w4a8 layer's non-GEMM
milliseconds go?  Run: python scripts/profile_prefill.py"""
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import build_layer  # noqa: E402
from qqq_tpu.models import ModelConfig  # noqa: E402
from qqq_tpu.models.llama import (  # noqa: E402
    decoder_layer, rms_norm, rope_inv_freq,
)
from qqq_tpu.serve import kv_cache  # noqa: E402
from qqq_tpu.utils.benchmark import measure_op  # noqa: E402
from qqq_tpu.core.quant import quantize_activations_per_token  # noqa: E402
from __graft_entry__ import _quantize_params  # noqa: E402

config = ModelConfig(
    vocab_size=32000, hidden_size=4096, intermediate_size=11008,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=32,
    max_position_embeddings=4096,
)
B, T = 1, 1024
H, I = 4096, 11008
key = jax.random.PRNGKey(0)
inv_freq = rope_inv_freq(config)
positions = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None], (B, T))
clen = jnp.zeros((B,), jnp.int32)
x = jax.random.normal(key, (B, T, H), jnp.bfloat16)

layer_bf = build_layer(key, config)
layer_w4 = _quantize_params(
    {"layers": [layer_bf], "embed": None, "norm": None, "lm_head": None},
    config, group_size=-1)["layers"][0]

cache_q = kv_cache.init(config, B, T, quantized=True)[0]
cache_bf = kv_cache.init(config, B, T, quantized=False)[0]


def t(label, fn, args):
    dt = measure_op(fn, args)
    print(f"{label:42s} {dt*1e6:9.1f} us")
    return dt


# full layers
t("w4a8 layer (int8 cache + flash)", lambda x, l: decoder_layer(
    l, x, positions, inv_freq, config, cache_q, clen)[0], (x, layer_w4))
t("bf16 layer (bf16 cache, XLA attn)", lambda x, l: decoder_layer(
    l, x, positions, inv_freq, config, cache_bf, clen)[0], (x, layer_bf))
t("w4a8 layer NO cache (calib path)", lambda x, l: decoder_layer(
    l, x, positions, inv_freq, config, None, None)[0], (x, layer_w4))
t("bf16 layer NO cache", lambda x, l: decoder_layer(
    l, x, positions, inv_freq, config, None, None)[0], (x, layer_bf))

# GEMM stack alone: the 7 linears at prefill M
from qqq_tpu.models.llama import linear_apply  # noqa: E402
x2 = x.reshape(T, H)
xi = jax.random.normal(key, (T, I), jnp.bfloat16)


def gemms(x2, xi, l):
    o = []
    for n in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj"):
        o.append(linear_apply(l[n], x2))
    o.append(linear_apply(l["down_proj"], xi))
    return sum(jnp.sum(a.astype(jnp.float32)) for a in o)


t("7 GEMMs w4a8 (incl act quant)", gemms, (x2, xi, layer_w4))
t("7 GEMMs bf16", gemms, (x2, xi, layer_bf))

# act quant alone
t("act quant (T,4096)", lambda a: quantize_activations_per_token(a)[0],
  (x2,))
t("act quant (T,11008)", lambda a: quantize_activations_per_token(a)[0],
  (xi,))

# attention path alone (project once outside timing)
q = jax.random.normal(key, (B, T, 32, 128), jnp.bfloat16)
k = jax.random.normal(key, (B, T, 32, 128), jnp.bfloat16)
v = jax.random.normal(key, (B, T, 32, 128), jnp.bfloat16)


def attn_q(q, k, v):
    from qqq_tpu.kernels.attention import flash_attention_int8

    c = kv_cache.write(cache_q, k, v, clen)
    out = flash_attention_int8(
        jnp.swapaxes(q, 1, 2), c["k"], c["k_scale"], c["v"], c["v_scale"],
        clen, causal=True)
    return jnp.sum(out.astype(jnp.float32))


def attn_bf(q, k, v):
    from qqq_tpu.models.llama import _attention_scores

    c = kv_cache.write(cache_bf, k, v, clen)
    kf = jnp.swapaxes(c["k"], 1, 2)
    vf = jnp.swapaxes(c["v"], 1, 2)
    key_idx = jnp.arange(T, dtype=jnp.int32)[None, :]
    mask = (key_idx[:, None, :] <= positions[:, :, None])
    out = _attention_scores(q, kf.astype(q.dtype), vf.astype(q.dtype), mask)
    return jnp.sum(out.astype(jnp.float32))


t("attn path w4a8 (kv-quant+flash)", attn_q, (q, k, v))
t("attn path bf16 (write+XLA)", attn_bf, (q, k, v))

# kv quant write alone
t("kv_cache.write int8", lambda k, v: jax.tree.leaves(
    kv_cache.write(cache_q, k, v, clen))[0], (k, v))
t("kv_cache.write bf16", lambda k, v: jax.tree.leaves(
    kv_cache.write(cache_bf, k, v, clen))[0], (k, v))

# norms + rope
w = jnp.ones((H,), jnp.bfloat16)
t("rms_norm (B,T,H)", lambda a: rms_norm(a, w, 1e-5), (x,))
from qqq_tpu.models.llama import apply_rope  # noqa: E402
t("apply_rope", lambda q, k: apply_rope(q, k, positions, inv_freq)[0], (q, k))
