"""Per-component decode-tick profile at a given batch size (VERDICT r3 #1).

The r3 extrapolation artifact (results/ladder_extrapolation.json) records a
bs=16 decode regression: w4a8 1.46 ms/layer vs bf16 0.95 — impossible at
roofline (w4a8 reads 1/4 the weight bytes and 1/2 the KV bytes).  This script
measures every component of one decode layer tick on the real chip so the
cliff can be attributed:

  * decode attention (int8 whole-cache kernel vs bf16 dense fallback)
  * KV write (int8 quantize+scatter vs bf16 scatter)
  * each GEMM at M=B (w4a8 pallas vs bf16 dot)
  * the full decoder_layer (sum check)

Usage:  python scripts/profile_decode_tick.py [--bs 16] [--s 1152]
            [--only attn,write,gemm,layer]
(run with ``python -u`` — each line flushes so a timeout keeps partials)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _tpu_watchdog import progress  # noqa: E402 (starts on import)

import jax
import jax.numpy as jnp

from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as m
from qqq_tpu.serve import kv_cache as kvc
from qqq_tpu.utils.benchmark import measure_op
from qqq_tpu.kernels.attention import decode_attention_int8
from qqq_tpu.kernels.w4a8_gemm import w4a8_linear, w4a8_glu_linear, fuse_glu_layout
from qqq_tpu.core.packing import pack_int4


def llama7b(layers=1):
    return ModelConfig(
        model_type="llama", vocab_size=32000, hidden_size=4096,
        intermediate_size=11008, num_hidden_layers=layers,
        num_attention_heads=32, num_key_value_heads=32,
        rms_norm_eps=1e-5, rope_theta=10000.0, max_position_embeddings=4096,
        tie_word_embeddings=False,
    )


def pack_linear(key, K, N, group_size=-1):
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.02
    scale = jnp.max(jnp.abs(w), axis=0) / 7.0
    q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int32)
    wp = pack_int4(q)
    return {"w_packed": wp, "s_channel": scale.astype(jnp.float32)}, w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--s", type=int, default=1152)
    ap.add_argument("--only", default="attn,write,gemm,layer")
    args = ap.parse_args()
    B, S = args.bs, args.s
    only = set(args.only.split(","))
    cfg = llama7b()
    nkv, hd, H, I = 32, 128, 4096, 11008
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 64))

    def rep(name, us, note=""):
        progress(name)
        print(f"{name:42s} {us:10.1f} us  {note}", flush=True)

    progress("devices: %s" % (jax.devices(),))

    # --- decode attention: int8 whole-cache kernel -------------------------
    q = jax.random.normal(next(ks), (B, 32, hd), jnp.bfloat16)
    kc = jax.random.randint(next(ks), (B, nkv, S, hd), -127, 127, jnp.int8)
    vc = jax.random.randint(next(ks), (B, nkv, S, hd), -127, 127, jnp.int8)
    ksc = jnp.abs(jax.random.normal(next(ks), (B, nkv, S), jnp.float32)) * 0.01
    vsc = jnp.abs(jax.random.normal(next(ks), (B, nkv, S), jnp.float32)) * 0.01
    clen = jnp.full((B,), S - 1, jnp.int32)

    if "attn" in only:
        t = measure_op(
            lambda q, kc, ksc, vc, vsc: decode_attention_int8(
                q, kc, ksc, vc, vsc, clen),
            (q, kc, ksc, vc, vsc),
        )
        bytes_kv = B * nkv * S * hd * 2 + B * nkv * S * 8
        rep("attn int8 whole-cache", t * 1e6,
            f"{bytes_kv / t / 1e9:.0f} GB/s of 819")

    # --- decode attention: bf16 dense fallback (the bf16 engine path) ------
    kcb = jax.random.normal(next(ks), (B, nkv, S, hd), jnp.bfloat16)
    vcb = jax.random.normal(next(ks), (B, nkv, S, hd), jnp.bfloat16)
    cache_b = {"k": kcb, "v": vcb}
    qd = jax.random.normal(next(ks), (B, 1, 32, hd), jnp.bfloat16)
    pos = clen[:, None]

    def bf16_attn(qd, kcb, vcb):
        kf, vf = kvc.read({"k": kcb, "v": vcb}, jnp.bfloat16)
        key_idx = jnp.arange(S, dtype=jnp.int32)[None, :]
        valid = key_idx < (clen + 1)[:, None]
        mask = valid[:, None, :] & (key_idx[:, None, :] <= pos[:, :, None])
        return m._attention_scores(qd, kf, vf, mask)

    if "attn" in only:
        t = measure_op(lambda a, b, c: bf16_attn(a, b, c), (qd, kcb, vcb))
        bytes_bf = B * nkv * S * hd * 2 * 2
        rep("attn bf16 dense fallback", t * 1e6,
            f"{bytes_bf / t / 1e9:.0f} GB/s of 819")

    # --- KV write ----------------------------------------------------------
    k_new = jax.random.normal(next(ks), (B, 1, nkv, hd), jnp.bfloat16)
    v_new = jax.random.normal(next(ks), (B, 1, nkv, hd), jnp.bfloat16)
    cache_q = {"k": kc, "v": vc, "k_scale": ksc, "v_scale": vsc}

    if "write" in only:
        t = measure_op(
            lambda kn, vn, kq, vq, kss, vss: kvc.write(
                {"k": kq, "v": vq, "k_scale": kss, "v_scale": vss},
                kn, vn, clen)["k"].astype(jnp.int32),
            (k_new, v_new, kc, vc, ksc, vsc),
        )
        rep("kv write int8 (quant+scatter)", t * 1e6)

        t = measure_op(
            lambda kn, vn, kb, vb: kvc.write(
                {"k": kb, "v": vb}, kn, vn, clen)["k"],
            (k_new, v_new, kcb, vcb),
        )
        rep("kv write bf16 (scatter)", t * 1e6)

    # --- GEMMs at M=B --------------------------------------------------------
    x = jax.random.normal(next(ks), (B, 1, H), jnp.bfloat16)
    xi = jax.random.normal(next(ks), (B, 1, I), jnp.bfloat16)
    if "gemm" in only:
        # weights ride as measure_op ARGS — closed-over arrays embed as HLO
        # constants and ship tens of MB per compile to the remote compiler
        shapes = [("q/k/v/o 4096x4096", x, H, 4096),
                  ("down 11008x4096", xi, I, 4096)]
        for name, xx, K, N in shapes:
            p, w = pack_linear(next(ks), K, N)
            t = measure_op(
                lambda a, wp, sc: w4a8_linear(
                    a, wp, sc, None, group_size=-1, out_dtype=jnp.bfloat16),
                (xx, p["w_packed"], p["s_channel"]),
            )
            rep(f"gemm w4a8 {name}", t * 1e6,
                f"{(K * N // 2) / t / 1e9:.0f} GB/s")
            wb = w.astype(jnp.bfloat16)
            t = measure_op(lambda a, w: jnp.dot(a, w), (xx, wb))
            rep(f"gemm bf16 {name}", t * 1e6,
                f"{(K * N * 2) / t / 1e9:.0f} GB/s")
            del p, w, wb

        # GLU fused gate+up
        pg, wg = pack_linear(next(ks), H, I)
        pu, wu = pack_linear(next(ks), H, I)
        glu = fuse_glu_layout(pg, pu)
        t = measure_op(
            lambda a, wp, sc: w4a8_glu_linear(
                a, {"w_packed": wp, "s_channel": sc},
                out_dtype=jnp.bfloat16),
            (x, glu["w_packed"], glu["s_channel"]),
        )
        rep("gemm w4a8 glu gate+up 4096x22016", t * 1e6,
            f"{(H * 2 * I // 2) / t / 1e9:.0f} GB/s")
        wgb, wub = wg.astype(jnp.bfloat16), wu.astype(jnp.bfloat16)
        t = measure_op(
            lambda a, wg_, wu_: jax.nn.silu(jnp.dot(a, wg_))
            * jnp.dot(a, wu_),
            (x, wgb, wub),
        )
        rep("gemm bf16 gate+up", t * 1e6,
            f"{(H * 2 * I * 2) / t / 1e9:.0f} GB/s")

    # --- prefill components (bs=16 ladder: 2 batches of 8 x 1024) ----------
    if "prefill" in only:
        PB, T = 8, 1024
        xp = jax.random.normal(next(ks), (PB, T, H), jnp.bfloat16)
        xpi = jax.random.normal(next(ks), (PB, T, I), jnp.bfloat16)
        for name, xx, K, N in [("q/k/v/o 4096x4096", xp, H, 4096),
                               ("down 11008x4096", xpi, I, 4096)]:
            p, w = pack_linear(next(ks), K, N)
            t = measure_op(
                lambda a, wp, sc: w4a8_linear(
                    a, wp, sc, None, group_size=-1, out_dtype=jnp.bfloat16),
                (xx, p["w_packed"], p["s_channel"]),
            )
            tops = 2.0 * PB * T * K * N / t / 1e12
            rep(f"prefill gemm w4a8 {name}", t * 1e6, f"{tops:.0f} TOPS")
            wb = w.astype(jnp.bfloat16)
            t = measure_op(lambda a, w: jnp.dot(a, w), (xx, wb))
            tops = 2.0 * PB * T * K * N / t / 1e12
            rep(f"prefill gemm bf16 {name}", t * 1e6, f"{tops:.0f} TOPS")
            del p, w, wb
        pg, wg = pack_linear(next(ks), H, I)
        pu, wu = pack_linear(next(ks), H, I)
        glu = fuse_glu_layout(pg, pu)
        t = measure_op(
            lambda a, wp, sc: w4a8_glu_linear(
                a, {"w_packed": wp, "s_channel": sc},
                out_dtype=jnp.bfloat16),
            (xp, glu["w_packed"], glu["s_channel"]),
        )
        tops = 2.0 * PB * T * H * 2 * I / t / 1e12
        rep("prefill gemm w4a8 glu", t * 1e6, f"{tops:.0f} TOPS")
        wgb, wub = wg.astype(jnp.bfloat16), wu.astype(jnp.bfloat16)
        t = measure_op(
            lambda a, g_, u_: jax.nn.silu(jnp.dot(a, g_)) * jnp.dot(a, u_),
            (xp, wgb, wub),
        )
        tops = 2.0 * PB * T * H * 2 * I / t / 1e12
        rep("prefill gemm bf16 gate+up", t * 1e6, f"{tops:.0f} TOPS")

        # flash attention at the ladder's prefill shape (B=8, T=1024,
        # S=1280 cache) vs the bf16 engine's dense-score attention
        from qqq_tpu.kernels.attention import flash_attention_int8

        Sp = 1280
        qp = jax.random.normal(next(ks), (PB, 32, 1024, hd), jnp.bfloat16)
        kp8 = jax.random.randint(next(ks), (PB, nkv, Sp, hd), -127, 127,
                                 jnp.int8)
        vp8 = jax.random.randint(next(ks), (PB, nkv, Sp, hd), -127, 127,
                                 jnp.int8)
        kps = jnp.abs(jax.random.normal(next(ks), (PB, nkv, Sp),
                                        jnp.float32)) * 0.01
        vps = jnp.abs(jax.random.normal(next(ks), (PB, nkv, Sp),
                                        jnp.float32)) * 0.01
        clen0 = jnp.zeros((PB,), jnp.int32)
        for qk8 in (False, True):
            t = measure_op(
                lambda q_, k_, ks_, v_, vs_, qk8=qk8: flash_attention_int8(
                    q_, k_, ks_, v_, vs_, clen0, causal=True,
                    qk_int8=qk8),
                (qp, kp8, kps, vp8, vps),
            )
            rep(f"prefill flash B=8 T=1024 qk_int8={qk8}", t * 1e6)

        # full-layer prefill: decoder_layer at (8, 1024) with int8 cache
        # write vs bf16 cache
        for mode in ("w4a8", "bf16"):
            params = m.init_params(llama7b(1), next(ks))
            layer = params["layers"][0]
            if mode == "w4a8":
                newl = {}
                for kname in ("q_proj", "k_proj", "v_proj", "o_proj",
                              "gate_proj", "up_proj", "down_proj"):
                    Kd, Nd = layer[kname]["w"].shape
                    newl[kname], _ = pack_linear(next(ks), Kd, Nd)
                layer = {**layer, **newl}
                layer = m.fuse_inference_params(
                    {"layers": [layer], "embed": params["embed"],
                     "norm": params["norm"], "lm_head": None},
                    cfg)["layers"][0]
                cachep = {"k": kp8, "v": vp8, "k_scale": kps,
                          "v_scale": vps}
            else:
                cachep = {
                    "k": jax.random.normal(next(ks), (PB, nkv, Sp, hd),
                                           jnp.bfloat16),
                    "v": jax.random.normal(next(ks), (PB, nkv, Sp, hd),
                                           jnp.bfloat16),
                }
            inv_freq = m.rope_inv_freq(cfg)
            posp = jnp.broadcast_to(
                jnp.arange(1024, dtype=jnp.int32)[None, :], (PB, 1024))
            clz = jnp.zeros((PB,), jnp.int32)

            def prefill_layer(a, cache, layer):
                out, _ = m.decoder_layer(
                    layer, a, posp, inv_freq, cfg, cache, clz)
                return out

            t = measure_op(
                prefill_layer, (xp, cachep, layer),
                perturb=lambda a, c: (a[0] * (1 + 1e-30 * c)
                                      .astype(a[0].dtype), a[1], a[2]),
            )
            rep(f"prefill decoder_layer (8,1024) {mode}", t * 1e6)
            del params, layer, cachep

    # --- full decoder layer tick --------------------------------------------
    for mode in ("w4a8", "bf16") if "layer" in only else ():
        params = m.init_params(llama7b(1), next(ks))
        layer = params["layers"][0]
        if mode == "w4a8":
            newl = {}
            for kname in ("q_proj", "k_proj", "v_proj", "o_proj",
                          "gate_proj", "up_proj", "down_proj"):
                K, N = layer[kname]["w"].shape
                newl[kname], _ = pack_linear(next(ks), K, N)
            layer = {**layer, **newl}
            layer = m.fuse_inference_params(
                {"layers": [layer], "embed": params["embed"],
                 "norm": params["norm"], "lm_head": None}, cfg)["layers"][0]
            cache = {"k": kc, "v": vc, "k_scale": ksc, "v_scale": vsc}
        else:
            cache = dict(cache_b)
        inv_freq = m.rope_inv_freq(cfg)
        xx = jax.random.normal(next(ks), (B, 1, H), jnp.bfloat16)

        def layer_tick(a, cache, layer):
            out, _ = m.decoder_layer(
                layer, a, pos, inv_freq, cfg, cache, clen)
            return out

        def perturb(a, c):
            return (a[0] * (1 + 1e-30 * c).astype(a[0].dtype), a[1], a[2])

        t = measure_op(layer_tick, (xx, cache, layer), perturb=perturb)
        rep(f"decoder_layer tick {mode}", t * 1e6)


if __name__ == "__main__":
    main()
