"""QuaRot-style network rotation (reference QQQ/rotation/rotation.py).

Makes the network numerically easier to quantize by conjugating every
hidden-state interface with an orthogonal matrix Q (outliers get spread
across channels), after folding RMSNorm weights into adjacent linears so the
conjugation commutes with the norm.

All folds operate on our (in, out) weight layout — the reference's
``W·Q`` / ``Qᵀ·W`` on (out, in) weights become ``Qᵀ·w`` / ``w·Q`` here.
Q is built in float64 on host (like rotation.py:76-102) and the folds run in
float32 on device (the reference folds in f64 on GPU; f32 is ≫ bf16 storage
precision, see test_rotation.py invariance bounds).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from qqq_tpu.core.hadamard import hadamard_matrix, random_hadamard_matrix
from qqq_tpu.models.config import ModelConfig


def _fold_ln(ln_w: jnp.ndarray, linears: list) -> Tuple[jnp.ndarray, list]:
    """Fold RMSNorm weight into following linears (rotation.py:17-38):
    w ← w · diag(ln) on the input side; ln ← 1."""
    out = []
    for lin in linears:
        w = lin["w"].astype(jnp.float32) * ln_w.astype(jnp.float32)[:, None]
        nl = dict(lin)
        nl["w"] = w.astype(lin["w"].dtype)
        out.append(nl)
    return jnp.ones_like(ln_w), out


def fuse_layer_norms(
    params: Dict[str, Any], config: ModelConfig
) -> Dict[str, Any]:
    """rotation.py:46-73: input_ln → q/k/v, post_attn_ln → gate/up,
    final norm → lm_head.  Tied embeddings are untied first (the reference
    models are untied; folding into a tied embed would corrupt the input
    side)."""
    params = dict(params)
    if params.get("lm_head") is None:
        params["lm_head"] = {"w": params["embed"].T}
    new_layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        ln, (q, k, v) = _fold_ln(
            layer["input_layernorm"],
            [layer["q_proj"], layer["k_proj"], layer["v_proj"]],
        )
        layer["input_layernorm"] = ln
        layer["q_proj"], layer["k_proj"], layer["v_proj"] = q, k, v
        ln2, (g, u) = _fold_ln(
            layer["post_attention_layernorm"],
            [layer["gate_proj"], layer["up_proj"]],
        )
        layer["post_attention_layernorm"] = ln2
        layer["gate_proj"], layer["up_proj"] = g, u
        new_layers.append(layer)
    params["layers"] = new_layers
    ln, (head,) = _fold_ln(params["norm"], [params["lm_head"]])
    params["norm"] = ln
    params["lm_head"] = head
    return params


def get_orthogonal_matrix(
    size: int, mode: str = "hadamard", seed: int = 0
) -> np.ndarray:
    """rotation.py:96-102: 'hadamard' (randomized) or 'random' (QR), f64."""
    if mode == "hadamard":
        return random_hadamard_matrix(size, seed=seed)
    if mode == "random":
        rng = np.random.default_rng(seed)
        q, r = np.linalg.qr(rng.standard_normal((size, size)))
        return q * np.sign(np.diag(r))[None, :]
    raise ValueError(f"unknown rotation mode {mode!r}")


def _rot_in(lin: Dict[str, Any], Q: jnp.ndarray) -> Dict[str, Any]:
    """Input-side rotation: reference W·Q on (out,in) = Qᵀ·w on (in,out)."""
    nl = dict(lin)
    nl["w"] = (Q.T @ lin["w"].astype(jnp.float32)).astype(lin["w"].dtype)
    return nl


def _rot_out(lin: Dict[str, Any], Q: jnp.ndarray) -> Dict[str, Any]:
    """Output-side rotation: reference Qᵀ·W on (out,in) = w·Q on (in,out);
    bias rotates too (rotation.py:127-129)."""
    nl = dict(lin)
    nl["w"] = (lin["w"].astype(jnp.float32) @ Q).astype(lin["w"].dtype)
    if "b" in lin:
        nl["b"] = (lin["b"].astype(jnp.float32) @ Q).astype(lin["b"].dtype)
    return nl


def _had_heads_out(lin: Dict[str, Any], head_dim: int) -> Dict[str, Any]:
    """Per-head exact Hadamard on the output side (v_proj): each head_dim
    chunk of the out dim is multiplied by H_hd (rotate_ov_proj →
    apply_exact_had_to_linear(..., output=True), hadamard_utils.py:149-171)."""
    H = jnp.asarray(hadamard_matrix(head_dim), jnp.float32)
    w = lin["w"].astype(jnp.float32)
    K, N = w.shape
    w = (w.reshape(K, N // head_dim, head_dim) @ H).reshape(K, N)
    nl = dict(lin)
    nl["w"] = w.astype(lin["w"].dtype)
    if "b" in lin:
        b = lin["b"].astype(jnp.float32)
        b = (b.reshape(N // head_dim, head_dim) @ H).reshape(N)
        nl["b"] = b.astype(lin["b"].dtype)
    return nl


def _had_heads_in(lin: Dict[str, Any], head_dim: int) -> Dict[str, Any]:
    """Per-head exact Hadamard on the input side (o_proj):
    apply_exact_had_to_linear(..., output=False), hadamard_utils.py:172-176.
    Hadamard is symmetric, so Hᵀ·w-per-block = H·w-per-block."""
    H = jnp.asarray(hadamard_matrix(head_dim), jnp.float32)
    w = lin["w"].astype(jnp.float32)
    K, N = w.shape
    # x' = x·H per head ⇒ w' = H⁻¹·w = H·w per head block (H symmetric orth.)
    wr = w.reshape(K // head_dim, head_dim, N)
    w = jnp.einsum("de,gen->gdn", H, wr).reshape(K, N)
    nl = dict(lin)
    nl["w"] = w.astype(lin["w"].dtype)
    return nl


def rotate_model(
    params: Dict[str, Any],
    config: ModelConfig,
    *,
    mode: str = "hadamard",
    seed: int = 0,
    Q: Optional[np.ndarray] = None,
) -> Tuple[Dict[str, Any], np.ndarray]:
    """rotation.py:169-195.  Accepts a precomputed Q so the same rotation can
    be re-applied after smoothing (quant_model.py:310-313).  Call
    :func:`fuse_layer_norms` first."""
    if Q is None:
        Q = get_orthogonal_matrix(config.hidden_size, mode, seed)
    Qj = jnp.asarray(Q, jnp.float32)
    hd = config.head_dim

    params = dict(params)
    params["embed"] = (
        params["embed"].astype(jnp.float32) @ Qj
    ).astype(params["embed"].dtype)
    if params.get("lm_head") is not None:
        params["lm_head"] = _rot_in(params["lm_head"], Qj)

    new_layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        for name in ("q_proj", "k_proj", "v_proj"):
            layer[name] = _rot_in(layer[name], Qj)
        layer["o_proj"] = _rot_out(layer["o_proj"], Qj)
        for name in ("gate_proj", "up_proj"):
            layer[name] = _rot_in(layer[name], Qj)
        layer["down_proj"] = _rot_out(layer["down_proj"], Qj)
        # per-head exact Hadamard on v/o (rotation.py:161-166)
        layer["v_proj"] = _had_heads_out(layer["v_proj"], hd)
        layer["o_proj"] = _had_heads_in(layer["o_proj"], hd)
        new_layers.append(layer)
    params["layers"] = new_layers
    return params, Q
