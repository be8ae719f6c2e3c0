import jax, jax.numpy as jnp, sys
print("backend:", jax.default_backend(), flush=True)
from qqq_tpu.kernels.attention import (
    flash_attention_int8, decode_attention_int8)
from qqq_tpu.utils.benchmark import measure_op
from qqq_tpu.serve import kv_cache as kvc

B, nh, nkv, hd = 1, 32, 32, 128

def mk(S):
    key = jax.random.PRNGKey(0)
    k8 = jax.random.randint(key, (B, nkv, S, hd), -127, 128, jnp.int8)
    v8 = jax.random.randint(key, (B, nkv, S, hd), -127, 128, jnp.int8)
    ks = jnp.full((B, nkv, S), 0.01, jnp.float32)
    vs = jnp.full((B, nkv, S), 0.01, jnp.float32)
    return k8, ks, v8, vs

# decode at long context
for S, sblk in ((4096, 512), (8192, 1024), (16384, 1024), (32768, 2048)):
    k8, ks, v8, vs = mk(S)
    q = jax.random.normal(jax.random.PRNGKey(1), (B, nh, 1, hd), jnp.float32)
    clen = jnp.asarray([S - 1], jnp.int32)
    f = lambda q_, k_, ks_, v_, vs_: flash_attention_int8(
        q_, k_, ks_, v_, vs_, clen, causal=False, sblk=sblk, interpret=False)
    t = measure_op(f, (q, k8, ks, v8, vs))
    gbs = (2 * B * nkv * S * hd + 8 * B * nkv * S) / t / 1e9
    print(f"flash decode S={S} sblk={sblk}: {t*1e6:.1f} us ({gbs:.0f} GB/s)", flush=True)
    if S <= 8192:
        q2 = q[:, :, 0]
        clen2 = jnp.asarray([S], jnp.int32)
        g = lambda q_, k_, ks_, v_, vs_: decode_attention_int8(
            q_, k_, ks_, v_, vs_, clen2, interpret=False)
        t2 = measure_op(g, (q2, k8, ks, v8, vs))
        print(f"  whole-cache kernel:      {t2*1e6:.1f} us", flush=True)

# chunked prefill: T=512 chunk against S=4096 cache
for T in (128, 512):
    S = 4096
    k8, ks, v8, vs = mk(S)
    q = jax.random.normal(jax.random.PRNGKey(2), (B, nh, T, hd), jnp.float32)
    clen = jnp.asarray([2048], jnp.int32)
    f = lambda q_, k_, ks_, v_, vs_: flash_attention_int8(
        q_, k_, ks_, v_, vs_, clen, causal=True, sblk=512, interpret=False)
    t = measure_op(f, (q, k8, ks, v8, vs))
    print(f"flash prefill T={T} over S=4096 cache: {t*1e6:.1f} us", flush=True)
    # XLA dequant path (old): read whole cache, dense attention
    cache = {"k": k8, "k_scale": ks, "v": v8, "v_scale": vs}
    def xla_path(q_, k_, ks_, v_, vs_):
        kf = (k_.astype(jnp.float32) * ks_[..., None]).swapaxes(1, 2)
        vf = (v_.astype(jnp.float32) * vs_[..., None]).swapaxes(1, 2)
        qs = q_.swapaxes(1, 2)  # (B, T, nh, hd)
        scores = jnp.einsum("btnh,bsnh->bnts", qs, kf) / jnp.sqrt(jnp.float32(hd))
        key_idx = jnp.arange(S)[None, :]
        qpos = clen[:, None] + jnp.arange(T)[None, :]
        mask = (key_idx[:, None, :] <= qpos[:, :, None])[:, None]
        scores = jnp.where(mask, scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bnts,bsnh->btnh", p, vf)
    t2 = measure_op(jax.jit(xla_path), (q, k8, ks, v8, vs))
    print(f"  XLA dequant path:          {t2*1e6:.1f} us ({t2/t:.2f}x slower)", flush=True)
