"""GSPMD sharding layout for the quantized model (Megatron-style TP × DP).

The reference has no distributed layer of its own (SURVEY.md §2.6: multi-GPU
is accelerate layer *placement*, model_utils.py:55-76); tensor parallelism for
QQQ checkpoints is delegated to vLLM.  Here TP is first-class and packs the
W4A8 layout:

* q/k/v, gate/up (column-parallel): out-dim sharded on the ``model`` axis —
  ``w_packed (K//8, N)`` → P(None, "model"), scales follow the N dim.
* o_proj, down (row-parallel): in-dim sharded — ``w_packed`` → P("model",
  None), per-group scales P("model", None); the partial products are
  ``psum``-ed inside the model (llama.attention / llama.mlp).
* embed replicated; lm_head vocab-sharded, logits all-gathered.
* KV caches: head-dim sharded on "model", batch on "data".

Because the W4A8 GEMMs are Pallas kernels (not GSPMD-partitionable ops), the
model runs under ``shard_map``: every device executes the same program on its
local shard with explicit collectives — the idiomatic pattern for
kernel-containing SPMD programs.

TP divisibility: heads and kv-heads must divide the ``model`` axis; packed
K-shards stay multiples of 128 for every supported model size.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import mesh_utils
from jax import shard_map

from qqq_tpu.models.config import ModelConfig


def make_mesh(
    data: int = 1, model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * model
    assert len(devices) >= n, (len(devices), n)
    arr = mesh_utils.create_device_mesh((data, model), devices=devices[:n])
    return Mesh(arr, axis_names=("data", "model"))


def initialize_distributed(**kw) -> None:
    """Multi-host bring-up: call once per host before building a hybrid mesh
    (the GSPMD replacement for the reference's accelerate layer placement,
    SURVEY.md §2.6)."""
    jax.distributed.initialize(**kw)


def make_hybrid_mesh(
    dcn_data: int = 1, ici_data: int = 1, ici_model: int = 1
) -> Mesh:
    """Multi-host mesh: data-parallel replicas across hosts over DCN,
    TP (and optional extra DP) within each slice over ICI — so the per-token
    all-reduces of the row-parallel linears ride ICI only.

    Example (Llama-2-70B on 2 hosts × 8 chips):
        initialize_distributed(); mesh = make_hybrid_mesh(2, 1, 8)

    On a single-process platform (CPU dryruns, one-host TPU) there is no
    DCN granule to optimize against, so the hybrid construction degrades to
    a plain reshape over the flat device list — same mesh shape and axis
    names, letting multi-host programs be compile-validated on virtual
    devices (`--xla_force_host_platform_device_count`).
    """
    devices = jax.devices()
    if len({d.process_index for d in devices}) > 1:
        # DCN granule: prefer real pod slices (slice_index) when the device
        # set actually spans that many slices; otherwise fall back to
        # process granularity (CPU multi-process runs report slice_index=0
        # everywhere; single-slice multi-host pods likewise).
        n_slices = len({getattr(d, "slice_index", 0) for d in devices})
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(ici_data, ici_model),
            dcn_mesh_shape=(dcn_data, 1),
            process_is_granule=(n_slices != dcn_data),
        )
        arr = arr.reshape(dcn_data * ici_data, ici_model)
    else:
        n = dcn_data * ici_data * ici_model
        assert len(devices) >= n, (len(devices), n)
        import numpy as _np

        arr = _np.asarray(devices[:n]).reshape(
            dcn_data * ici_data, ici_model
        )
    return Mesh(arr, axis_names=("data", "model"))


def _linear_pspec(lin: Dict[str, Any], col_parallel: bool) -> Dict[str, P]:
    """Column-parallel shards N; row-parallel shards K."""
    spec: Dict[str, P] = {}
    for key in lin:
        if key in ("w", "w_packed"):
            spec[key] = P(None, "model") if col_parallel else P("model", None)
        elif key == "s_channel":
            spec[key] = P("model") if col_parallel else P(None)
        elif key == "s_group":
            spec[key] = P(None, "model") if col_parallel else P("model", None)
        elif key == "b":
            spec[key] = P("model") if col_parallel else P(None)
    return spec


_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


def param_pspecs(params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree matching the params pytree."""
    layers = []
    for layer in params["layers"]:
        lp: Dict[str, Any] = {
            "input_layernorm": P(None),
            "post_attention_layernorm": P(None),
        }
        for name in _COL:
            lp[name] = _linear_pspec(layer[name], col_parallel=True)
        for name in _ROW:
            lp[name] = _linear_pspec(layer[name], col_parallel=False)
        layers.append(lp)
    spec: Dict[str, Any] = {
        "embed": P(None, None),
        "layers": layers,
        "norm": P(None),
    }
    if params.get("lm_head") is not None:
        spec["lm_head"] = _linear_pspec(params["lm_head"], col_parallel=True)
    else:
        spec["lm_head"] = None
    return spec


def cache_pspec(caches) -> Any:
    """KV caches (head-major, serve/kv_cache.py): batch on data, heads on
    model; scale tensors are rank-3."""
    def one(c):
        return {
            k: (
                P("data", "model", None, None)
                if caches[0][k].ndim == 4
                else P("data", "model", None)
            )
            for k in c
        }
    return [one(c) for c in caches]


def paged_cache_pspec(caches, *, blocks_axis: Optional[str] = None) -> Any:
    """Paged KV pools (serve/paged_kv.py, (num_blocks, n_kv, bs[, hd])):
    kv heads sharded on "model"; blocks replicated (default) or sharded on
    ``blocks_axis`` — the Engine's data>1 mode gives each data shard an
    independent pool slice indexed by shard-LOCAL block-table ids
    (serve/engine.py paged init)."""
    def one(c):
        return {
            k: (
                P(blocks_axis, "model", None, None)
                if caches[0][k].ndim == 4
                else P(blocks_axis, "model", None)
            )
            for k in c
        }
    return [one(c) for c in caches]


def shard_params(
    params: Dict[str, Any], mesh: Mesh, specs: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    specs = specs or param_pspecs(params)
    return jax.tree.map(
        lambda x, s: (
            None if x is None
            else jax.device_put(x, NamedSharding(mesh, s))
        ),
        params,
        specs,
        is_leaf=lambda x: x is None,
    )


def tp_decode_overlapped_fn(
    config: ModelConfig,
    mesh: Mesh,
    params_spec: Dict[str, Any],
    caches_spec: Any,
    micro: int = 2,
):
    """Micro-batch interleaved TP decode step (collective/compute overlap).

    Classic Megatron TP decode serializes per layer: GEMMs → o_proj psum →
    GEMMs → down psum, with the all-reduce latency on the critical path
    (STATUS open item 7).  Splitting the batch into ``micro`` independent
    chains gives XLA's latency-hiding scheduler legal reorderings: chain A's
    async all-reduce (collective-permute start/done pairs on ICI) flies
    while chain B's GEMMs occupy the MXU — per-layer collective latency is
    hidden up to 1/micro.  On the CPU dryrun this only validates
    compilation + bit-parity (no real ICI); the schedule materializes on
    hardware.

    The batch and its KV caches stay PRE-SPLIT (tuples of length ``micro``)
    so no per-step slice/concat copies appear: the engine owns one cache
    pytree per micro-batch.  Returns
    ``f(params, (tokens…), (caches…), (clen…)) → ((logits…), (caches…))``.
    """
    from qqq_tpu.models import llama as M

    def local(params, tokens_t, caches_t, clen_t):
        outs, newc = [], []
        for t, c, cl in zip(tokens_t, caches_t, clen_t):
            logits, nc = M.forward(
                params, config, t, caches=c, cache_len=cl, tp_axis="model"
            )
            outs.append(logits[:, -1, :])
            newc.append(nc)
        return tuple(outs), tuple(newc)

    fwd = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            params_spec,
            (P("data", None),) * micro,
            (caches_spec,) * micro,
            (P("data"),) * micro,
        ),
        out_specs=(
            (P("data", None),) * micro,
            (caches_spec,) * micro,
        ),
        check_vma=False,
    )
    return jax.jit(fwd)


def tp_forward_fn(
    config: ModelConfig,
    mesh: Mesh,
    params_spec: Dict[str, Any],
    *,
    with_cache: bool = False,
    caches_spec: Any = None,
    sp: bool = False,
    overlap: bool = False,
):
    """Build a jitted shard_map-wrapped forward.

    Returns ``f(params, tokens[, caches, cache_len]) → (logits, caches)``
    with tokens/logits batch-sharded on "data" and params laid out per
    :func:`param_pspecs`.

    ``sp=True`` uses the sequence-parallel forward (models/llama.forward_sp):
    the per-layer all-reduces become psum_scatter/all_gather pairs and the
    residual stream is T-sharded across the "model" axis — prefill and
    full-sequence scoring only (needs T divisible by the tp degree).
    ``overlap=True`` (implies sp) additionally fuses each collective with
    its adjacent GEMM as a ring collective matmul — the ICI transfers hide
    behind the per-chunk Pallas GEMMs (llama._ring_ag_matmul /
    _ring_matmul_rs).
    """
    from functools import partial

    from qqq_tpu.models import llama as M

    if overlap:
        sp = True
        fwd_impl = partial(M.forward_sp, overlap=True)
    else:
        fwd_impl = M.forward_sp if sp else M.forward

    if with_cache:
        def local_fwd(params, tokens, caches, cache_len):
            return fwd_impl(
                params, config, tokens, caches=caches, cache_len=cache_len,
                tp_axis="model",
            )

        fwd = shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(params_spec, P("data", None), caches_spec, P("data")),
            out_specs=(P("data", None, None), caches_spec),
            check_vma=False,
        )
    else:
        def local_fwd(params, tokens):
            logits, _ = fwd_impl(params, config, tokens, tp_axis="model")
            return logits

        fwd = shard_map(
            local_fwd,
            mesh=mesh,
            in_specs=(params_spec, P("data", None)),
            out_specs=P("data", None, None),
            check_vma=False,
        )
    return jax.jit(fwd)
