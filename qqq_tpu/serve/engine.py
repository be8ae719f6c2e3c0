"""Inference engine: slot-based continuous batching with prefill/decode split.

The reference's serving story is delegated to vLLM (README.md:15, 77-79); this
engine is the framework's own TPU-native serving scope (BASELINE.json
configs[3]).  Design, shaped by XLA's static-shape compilation model:

* fixed ``max_batch`` decode slots — the decode step is ONE jitted program of
  constant shape (B, 1), re-run every tick over all slots with an active mask;
* prefill runs at bucketed lengths (powers of two — each (bucket, sub-batch)
  shape compiles once); same-bucket pending requests prefill TOGETHER in
  power-of-two sub-batches (one dispatch + one host sync for up to
  ``prefill_batch`` of them), and each row's quantized KV is installed into
  its slot by a donated ``dynamic_update_slice`` (in-place, no cache-store
  copy);
* continuous batching is a host-side loop (`Engine.run`): admit pending
  requests into free slots as soon as they open, decode the rest — requests
  join and leave the batch independently, no generation-wide barriers;
* the KV cache is INT8 by default (serve/kv_cache.py).

Scheduler features (all exact-greedy, see the constructor docstring):
chunked prefill (`prefill_chunk`), slot-level automatic prefix caching
(`prefix_cache`), prompt-lookup speculative decoding (`spec_ngram`),
per-request sampling params incl. penalties / min-p / logit bias /
reproducible seeds, cancel, stop tokens, per-token logprobs, TTFT/TPOT
tracking.

All device work stays inside a handful of jitted programs (per-bucket
prefill, single/multi-step decode, chunk-prefill, speculative verify, and
tiny cache/count maintenance kernels); the host loop does bookkeeping only.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import threading
import time
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qqq_tpu.models.config import ModelConfig
from qqq_tpu.models import llama as M
from qqq_tpu.serve import kv_cache
from qqq_tpu.serve.sampling import (
    SamplingParams, apply_allowed_mask, apply_logit_bias, apply_penalties,
    bias_arrays,
    chosen_logprob, chosen_logprob_sharded, penalty_arrays, sample_batched,
    sample_batched_sharded, sampling_arrays,
)


@dataclasses.dataclass
class Request:
    prompt_tokens: List[int]
    sampling: SamplingParams = dataclasses.field(default_factory=SamplingParams)
    # filled by the engine:
    output_tokens: List[int] = dataclasses.field(default_factory=list)
    #: raw-model log P(token | prefix) for each entry of ``output_tokens``
    #: (pre-temperature, like vLLM's logprobs report) — same length
    token_logprobs: List[float] = dataclasses.field(default_factory=list)
    #: with ``sampling.top_logprobs`` = N > 0: per generated token, the N
    #: highest raw logprobs as [(token_id, logprob), …] — same length as
    #: ``output_tokens``; empty otherwise
    top_logprobs: List[List[Tuple[int, float]]] = dataclasses.field(
        default_factory=list
    )
    done: bool = False
    #: "stop" (EOS / stop token / cancel) or "length" (max_new_tokens or
    #: out of cache room) once ``done`` — OpenAI finish_reason semantics
    finish_reason: Optional[str] = None
    #: set via Engine.cancel (or an ``on_token`` hook returning from a stop
    #: condition): the request finishes at the last emitted token
    cancelled: bool = False
    #: set when the engine PREEMPTS the request (paged mode, pool
    #: exhausted): the token stream to re-prefill on re-admission
    #: (prompt + generated so far) — generation continues exactly where it
    #: left off
    _resume: Optional[List[int]] = None
    _emitted: int = 0  # tokens already delivered through Engine.on_token
    # latency bookkeeping (monotonic seconds, filled by the engine)
    t_enqueue: Optional[float] = None
    t_first_token: Optional[float] = None
    t_done: Optional[float] = None

    @property
    def ttft(self) -> Optional[float]:
        """Seconds from enqueue to first generated token."""
        if self.t_enqueue is None or self.t_first_token is None:
            return None
        return self.t_first_token - self.t_enqueue

    @property
    def tpot(self) -> Optional[float]:
        """Mean seconds per output token after the first (time-per-output-
        token, the serving decode-latency metric)."""
        if (self.t_first_token is None or self.t_done is None
                or len(self.output_tokens) < 2):
            return None
        return (self.t_done - self.t_first_token) / (len(self.output_tokens) - 1)


#: max requests prefilled in one dispatch (per power-of-two sub-batch, so at
#: most log2 of these shapes ever compile per bucket)
_PREFILL_BATCH = 8


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


class Engine:
    def __init__(
        self,
        params: Dict[str, Any],
        config: ModelConfig,
        *,
        max_batch: int = 8,
        max_len: int = 2048,
        kv_quantized: bool = True,
        prefill_buckets=(128, 512, 2048),
        steps_per_tick: int = 1,
        dtype=jnp.bfloat16,
        mesh=None,
        fuse: bool = True,
        prefill_batch: Optional[int] = None,
        prefill_chunk: int = 0,
        spec_ngram: int = 0,
        spec_k: int = 4,
        prefix_cache: bool = False,
        paged: bool = False,
        block_size: int = 128,
        num_blocks: Optional[int] = None,
    ):
        """``steps_per_tick > 1`` decodes that many tokens per device call
        (fused scan) — higher throughput, at the cost of EOS/admission checks
        only happening at chunk boundaries.

        ``mesh``: a data×model Mesh.  The "model" axis shards the packed
        weights and KV caches Megatron-style (parallel/shard.py); a "data"
        axis > 1 runs ONE scheduler with decode batch-sharded across the
        data axis — slots partition into ``data`` contiguous shards (and in
        paged mode each data shard owns its own pool slice, allocator, and
        prefix map).  Prefill programs are replicated with GSPMD routing
        the slot write-back to the owning shard.

        ``fuse``: apply the single-device GEMM fusions (GLU-fused gate/up
        kernel) to packed params — no-op for dense params or under a TP
        mesh (models/llama.py:fuse_inference_params).

        ``prefill_chunk > 0`` switches admission to CHUNKED prefill (the
        vLLM chunked-prefill scheduler idea): a prompt enters its slot
        immediately and prefills ``prefill_chunk`` tokens per tick,
        interleaved with the other slots' decode steps — a 2048-token
        prompt no longer stalls every batchmate's decode for a full-bucket
        prefill.  One (1, chunk) program compiles total (vs one per
        bucket×sub-batch); whole-bucket mode usually wins single-request
        TTFT, chunked mode wins tail decode latency under load.  Chunked
        admission also stamps ``slot_seq`` (admission order) — the paged
        preemption priority.

        ``prefix_cache=True`` (chunked mode only) keeps a freed slot's KV
        intact and records which tokens it holds; a new prompt sharing a
        prefix with a freed slot is admitted INTO that slot with
        ``slot_len`` pre-advanced, so only the tail prefills — the vLLM
        automatic-prefix-caching idea at slot granularity (multi-turn chat
        and shared-system-prompt traffic skip most of their prefill).  KV
        depends only on (token, position), so reuse is exact.

        ``spec_ngram > 0`` enables prompt-lookup SPECULATIVE decoding (the
        vLLM "[ngram]" drafter): each tick drafts up to ``spec_k`` tokens
        by matching the last ``spec_ngram`` generated tokens against the
        request's own prompt+output history, then verifies the whole draft
        in ONE (B, 1+spec_k) forward — greedy rows emit every draft token
        that matches the model's argmax plus one bonus token, so outputs
        are EXACTLY the plain-greedy stream but cost one weight pass per
        accepted run.  Sampled rows (temperature > 0) ignore drafts and
        behave as plain decode.  Decode-bound W4A8 serving reads ~3.6 GB of
        weights per step at 7B; verification's extra FLOPs are ~free.

        ``paged=True`` replaces the per-slot contiguous KV with a PAGED
        block pool (serve/paged_kv.py, the vLLM PagedAttention design):
        ``num_blocks`` blocks of ``block_size`` tokens shared by all slots,
        with per-slot block tables grown on demand — KV memory scales with
        TOKENS IN FLIGHT, not max_batch × max_len.  Implies chunked prefill
        (admission prefills straight into the pool).  When the pool runs
        dry the engine first evicts unreferenced prefix-cache blocks (LRU),
        then PREEMPTS the latest-admitted active request (vLLM recompute
        policy: its blocks free immediately and it re-enters the queue to
        re-prefill prompt + generated-so-far, continuing exactly where it
        left off — greedy and seeded streams are unchanged; the oldest
        requests are never starved).  Default ``num_blocks``
        covers max_batch × max_len (no preemption possible); size it down
        to oversubscribe.  Composes with TP/data ``mesh``es: pools shard
        on kv heads (and block-slices on "data"), and the vocab-sharded
        sampling fast path works in paged mode too (tables ride the
        sharded decode program)."""
        if fuse and mesh is None:
            from qqq_tpu.models.llama import fuse_inference_params

            params = fuse_inference_params(params, config)
        self.params = params
        self.config = config
        self.max_batch = max_batch
        self.max_len = max_len
        self.dtype = dtype
        self.prefill_buckets = tuple(
            b for b in prefill_buckets if b <= max_len
        ) or (max_len,)
        #: mesh data-axis degree; slots partition into ``dp`` contiguous
        #: shards of ``max_batch // dp`` (GSPMD batch sharding)
        self.dp = 1
        if mesh is not None:
            self.dp = dict(zip(mesh.axis_names, mesh.devices.shape)).get(
                "data", 1
            )
            assert max_batch % self.dp == 0, (
                "Engine max_batch must be divisible by the mesh data axis "
                f"({max_batch} % {self.dp})"
            )
        self.paged = paged
        if paged:
            from qqq_tpu.serve import paged_kv
            from qqq_tpu.serve.paged_kv import BlockAllocator

            assert max_len % block_size == 0, \
                "max_len must be a multiple of block_size"
            if not prefill_chunk:
                # default to the WIDEST chunk ≤ 512 that divides max_len
                # and is a whole number of blocks: chunk width is dispatch
                # width on TPU (a (g, 512) forward amortizes what eight
                # (g, 64) forwards cannot), and decoupling it from
                # block_size lets decode keep small blocks for fill
                # fraction — measured TTFT 4.45 s → <2 s at bs=16/32L
                # going from 128- to 512-token chunks
                c = min(512, max_len)
                while c > block_size and (max_len % c or c % block_size):
                    c -= block_size
                prefill_chunk = max(c, block_size)
            self.block_size = block_size
            #: per-slot virtual-block capacity (max_len tokens)
            self._nbmax = max_len // block_size
            if num_blocks is None:
                num_blocks = 1 + (max_batch // self.dp) * self._nbmax
            #: pool size PER DATA SHARD (dp=1: the whole pool).  Each shard
            #: owns an independent pool slice with its own null block 0 and
            #: allocator; block tables hold SHARD-LOCAL ids (the pool's
            #: leading dim shards on "data" so local ids index the slice
            #: directly inside shard_map)
            self.num_blocks = num_blocks
            self.allocators = [
                BlockAllocator(num_blocks) for _ in range(self.dp)
            ]
            #: (B, nbmax) physical block per (slot, virtual block); 0 = null
            self.tables = np.zeros((max_batch, self._nbmax), np.int32)
            #: device copy of ``tables``, re-uploaded only when dirty —
            #: an unconditional per-tick h2d pays a full tunnel round trip
            #: for a table that changes every block_size/steps ticks
            self._tables_dev = None
            self._tables_dirty = True
            self.slot_blocks: List[List[int]] = [[] for _ in range(max_batch)]
            # block-level prefix cache (paged + prefix_cache): FULL blocks
            # register under the hash of their whole token prefix and are
            # adopted read-only by later requests — cross-request dedup,
            # not just freed-slot reuse.  Tail blocks are never shared, so
            # no copy-on-write is needed.  Per data shard (block ids are
            # shard-local); a prompt only reuses prefixes cached in its own
            # shard's pool.
            if prefix_cache and prefill_chunk \
                    and prefill_chunk % block_size != 0:
                raise ValueError(
                    "paged prefix_cache needs prefill_chunk % block_size "
                    f"== 0, got {prefill_chunk} % {block_size}"
                )
            from collections import OrderedDict

            #: prefix-tuple → physical block holding its last block of KV
            self._bh_key2blk: List[Dict[tuple, int]] = [
                {} for _ in range(self.dp)
            ]
            self._bh_blk2key: List[Dict[int, tuple]] = [
                {} for _ in range(self.dp)
            ]
            #: slot-owner count per registered block; 0 = evictable (LRU)
            self._bh_ref: List[Dict[int, int]] = [
                {} for _ in range(self.dp)
            ]
            self._bh_lru: List["OrderedDict[int, None]"] = [
                OrderedDict() for _ in range(self.dp)
            ]
            #: per slot: leading slot_blocks entries already registered /
            #: adopted (skipped by _register_blocks)
            self.slot_reg = [0] * max_batch
            self.caches = paged_kv.init(
                config, num_blocks * self.dp, block_size,
                quantized=kv_quantized, dtype=dtype,
            )
        else:
            self.caches = kv_cache.init(
                config, max_batch, max_len, quantized=kv_quantized,
                dtype=dtype,
            )
        self.kv_quantized = kv_quantized
        # slot state (host)
        self.slot_req: List[Optional[Request]] = [None] * max_batch
        self.slot_len = np.zeros(max_batch, np.int32)
        self.slot_last_tok = np.zeros(max_batch, np.int32)
        self.steps_per_tick = steps_per_tick
        if prefill_batch is None:
            # auto-size the admission group: each admitted row costs a
            # bucket-sized KV scratch across every layer (kv_cache.init in
            # _admit_batch), which at 7B geometry is ~300 MB per 1024-token
            # row — an 8-row × 4096-token group would be 9+ GB and OOM next
            # to the weights + decode caches.  Cap the group so the scratch
            # stays under QQQ_TPU_PREFILL_SCRATCH_MB (default 1536); an
            # explicit prefill_batch argument bypasses the cap.
            budget = int(os.environ.get(
                "QQQ_TPU_PREFILL_SCRATCH_MB", "1536")) << 20
            bucket = max(prefill_buckets[-1], prefill_chunk or 0)
            scale_bytes = 4 if kv_quantized else 0
            store_bytes = 1 if kv_quantized else jnp.dtype(dtype).itemsize
            per_row = (config.num_hidden_layers * config.num_key_value_heads
                       * bucket * 2
                       * (config.head_dim * store_bytes + scale_bytes))
            prefill_batch = min(_PREFILL_BATCH,
                                max(1, budget // max(per_row, 1)))
        self.prefill_batch = max(1, prefill_batch)
        self.prefill_chunk = prefill_chunk
        if prefill_chunk:
            # keeps every C-wide chunk write inside the store: prompts are
            # ≤ max_len-1, so ceil(n/C)·C ≤ max_len ⇒ no dynamic_update
            # start-index clamping (which would silently overwrite valid KV)
            assert max_len % prefill_chunk == 0, \
                "max_len must be a multiple of prefill_chunk"
        self.spec_ngram = spec_ngram
        self.spec_k = spec_k
        # spec_ngram composes with steps_per_tick > 1: ticks where at least
        # one row drafts run the (B, 1+k) verify; ticks where prompt-lookup
        # misses everywhere fall through to the fused multi-step decode
        self.prefix_cache = prefix_cache
        if prefix_cache:
            assert prefill_chunk > 0, \
                "prefix_cache needs chunked prefill (tail-only prefill)"
        #: tokens whose KV a FREED slot still holds (prefix_cache mode);
        #: freed slots keep slot_len = len(slot_tokens) so the masked
        #: decode rows' garbage KV writes land just PAST the preserved
        #: prefix — _free_margin keeps even multi-position writes in-bounds
        self.slot_tokens: List[List[int]] = [[] for _ in range(max_batch)]
        self._free_margin = max(steps_per_tick, spec_k + 1 if spec_ngram else 1)
        #: slot → prompt tokens not yet prefilled (chunked mode only);
        #: a slot present here is mid-prefill and excluded from decode
        self.slot_prefill: Dict[int, List[int]] = {}
        #: admission order (monotonic) per slot — preemption evicts the
        #: LATEST-admitted request (vLLM recompute priority: oldest first)
        self._admit_seq = 0
        self.slot_seq = [0] * max_batch
        self.key = jax.random.PRNGKey(0)
        #: queue owned by the ENGINE thread (run() mutates it freely).
        #: Cross-thread submissions go through ``_inbox`` (add_request) and
        #: drain at the top of each scheduling iteration — run() rebinding
        #: ``_pending`` can never drop a concurrent submit.
        self._pending: List[Request] = []
        self._inbox: List[Request] = []
        self._inbox_lock = threading.Lock()
        #: (ttft, tpot) of the last ≤1000 completed requests
        self._latency: List[Tuple[float, Optional[float]]] = []
        #: per-slot GENERATED-token counts (B, V) — drives the OpenAI
        #: presence/frequency penalties and (with rep_mask) the repetition
        #: penalty on device.  Each decode step scatters its own sampled
        #: token; the host adds the prefill-sampled first token and resets
        #: the row at admission (both only for penalized rows — penalized
        #: rows never receive speculative drafts, so every generated token
        #: passes through exactly one of those two paths).
        self.counts = jnp.zeros((max_batch, config.vocab_size), jnp.int32)
        #: per-slot PROMPT-token presence (B, V) — the repetition penalty
        #: covers prompt ∪ generated tokens (vLLM semantics); written once
        #: at admission for rows with repetition_penalty != 1, read-only in
        #: the decode paths (stale rows are harmless: rep == 1 is exact
        #: identity in apply_penalties)
        self.rep_mask = jnp.zeros((max_batch, config.vocab_size), jnp.bool_)
        # optional per-token hook: on_token(req, token) fires for every
        # SURVIVING token (EOS is never emitted) as the host loop accepts it
        # — the streaming-generation feed for serve CLI clients
        self.on_token = None
        self.stats = {
            "prefills": 0, "prefill_tokens": 0, "prefill_chunks": 0,
            "prefill_dispatches": 0,
            "generated_tokens": 0, "decode_ticks": 0,
            "spec_drafted": 0, "spec_accepted": 0,
            "prefix_hits": 0, "prefix_tokens_reused": 0,
            "preemptions": 0,
        }

        self.mesh = mesh
        if mesh is not None:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            from qqq_tpu.parallel import (
                cache_pspec, paged_cache_pspec, param_pspecs, shard_params,
            )

            pspec = param_pspecs(params)
            self._pspec = pspec
            self.params = shard_params(params, mesh, pspec)
            self._cspec = (
                paged_cache_pspec(self.caches, blocks_axis="data")
                if paged else cache_pspec(self.caches)
            )
            self.caches = jax.tree.map(
                lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)),
                self.caches, self._cspec,
            )

            if paged:
                # pools block-sharded on "data" (one independent slice per
                # data shard, local-id tables) and kv-head-sharded on
                # "model"; tokens/tables/lens batch-sharded on "data" — the
                # slots of a data shard only ever reference its own pool
                # slice, so decode AND the shard-grouped chunk prefill run
                # fully batch-parallel.
                def local_fwd(p, t, c, cl, pos, tables):
                    return M.forward(
                        p, self.config, t, positions=pos, caches=c,
                        cache_len=cl, tp_axis="model", block_tables=tables,
                    )

                self._fwd = shard_map(
                    local_fwd,
                    mesh=mesh,
                    in_specs=(pspec, P("data", None), self._cspec,
                              P("data"), P("data", None), P("data", None)),
                    out_specs=(P("data", None, None), self._cspec),
                    check_vma=False,
                )

                def local_fwd_last(p, t, c, cl, pos, last, tables):
                    return M.forward(
                        p, self.config, t, positions=pos, caches=c,
                        cache_len=cl, tp_axis="model", block_tables=tables,
                        logits_at=last,
                    )

                self._fwd_last = shard_map(
                    local_fwd_last,
                    mesh=mesh,
                    in_specs=(pspec, P("data", None), self._cspec,
                              P("data"), P("data", None), P("data"),
                              P("data", None)),
                    out_specs=(P("data", None, None), self._cspec),
                    check_vma=False,
                )
            else:
                # batch-REPLICATED cache spec for the prefill programs:
                # the (1, C) chunk / sub-batch prefill forwards run
                # identically on every data shard (same wall-clock as one
                # replica); the write back into the data-sharded global
                # cache happens at jit level where GSPMD routes the update
                # to the owning shard.  Decode — the hot path — runs truly
                # batch-sharded on "data".  (Paged mode needs no replicated
                # spec: its prefill is shard-grouped through the same
                # data-sharded program.)
                self._cspec_rep = jax.tree.map(
                    lambda sp: P(*([None] + list(sp)[1:])),
                    self._cspec,
                    is_leaf=lambda x: isinstance(x, P),
                )

                def local_fwd(p, t, c, cl, pos):
                    return M.forward(
                        p, self.config, t, positions=pos, caches=c,
                        cache_len=cl, tp_axis="model",
                    )

                self._fwd = shard_map(
                    local_fwd,
                    mesh=mesh,
                    in_specs=(pspec, P("data", None), self._cspec,
                              P("data"), P("data", None)),
                    out_specs=(P("data", None, None), self._cspec),
                    check_vma=False,
                )
                def local_fwd_last(p, t, c, cl, pos, last):
                    return M.forward(
                        p, self.config, t, positions=pos, caches=c,
                        cache_len=cl, tp_axis="model", logits_at=last,
                    )

                self._fwd_last = shard_map(
                    local_fwd_last,
                    mesh=mesh,
                    in_specs=(pspec, P(None, None), self._cspec_rep,
                              P(None), P(None, None), P(None)),
                    out_specs=(P(None, None, None), self._cspec_rep),
                    check_vma=False,
                )

            # decode with IN-MAP sampling: the vocab-sharded logits never
            # leave their shard — Gumbel-max + 2-collective distributed
            # argmax (sampling.sample_batched_sharded) replaces the per-step
            # (B, V) f32 logits all_gather.  Usable whenever no active row
            # needs top-k/top-p order statistics (host checks per tick).
            # Batch rides the "data" axis; the Gumbel field is generated at
            # global batch width so streams match the gathered path exactly.
            # Paged mode ships the block tables through the same program.
            def local_decode_sample(p, t, c, cl, pos, key, active, temp,
                                    tables=None):
                local_logits, c = M.forward(
                    p, self.config, t, positions=pos, caches=c,
                    cache_len=cl, tp_axis="model", gather_logits=False,
                    block_tables=tables,
                )
                last = local_logits[:, -1, :]
                nxt = sample_batched_sharded(
                    last, key, temp, "model", self.config.vocab_size,
                    data_axis_name="data",
                )
                lp = chosen_logprob_sharded(
                    last, nxt, "model", self.config.vocab_size
                )
                return jnp.where(active, nxt, 0), lp, c

            base_specs = (pspec, P("data", None), self._cspec, P("data"),
                          P("data", None), P(None), P("data"), P("data"))
            if paged:
                self._fwd_decode_sample = shard_map(
                    lambda p, t, c, cl, pos, key, active, temp, tables:
                        local_decode_sample(p, t, c, cl, pos, key, active,
                                            temp, tables),
                    mesh=mesh,
                    in_specs=base_specs + (P("data", None),),
                    out_specs=(P("data"), P("data"), self._cspec),
                    check_vma=False,
                )
            else:
                self._fwd_decode_sample = shard_map(
                    local_decode_sample,
                    mesh=mesh,
                    in_specs=base_specs,
                    out_specs=(P("data"), P("data"), self._cspec),
                    check_vma=False,
                )
        else:
            self.dp = 1
            self._fwd = lambda p, t, c, cl, pos, tables=None: M.forward(
                p, self.config, t, positions=pos, caches=c, cache_len=cl,
                block_tables=tables,
            )
            self._fwd_last = (
                lambda p, t, c, cl, pos, last, tables=None: M.forward(
                    p, self.config, t, positions=pos, caches=c, cache_len=cl,
                    block_tables=tables, logits_at=last,
                )
            )

        # decode ticks go through the *_packed jits (one packed h2d per
        # tick, caches/counts donated there); only the chunk-prefill and
        # spec programs keep their direct jit wrappers
        self._prefill_chunk_fn = jax.jit(
            self._prefill_chunk_step, donate_argnums=(2,),
            static_argnames=("n_top",),
        )
        self._prefill_chunk_paged_fn = jax.jit(
            self._prefill_chunk_paged, donate_argnums=(2,),
            static_argnames=("n_top",),
        )
        self._set_counts_fn = jax.jit(
            lambda c, slot, row: c.at[slot].set(row), donate_argnums=(0,)
        )
        self._spec_fn = jax.jit(self._spec_verify_step,
                                donate_argnums=(2, 10),
                                static_argnames=("n_top",))
        self._count_fn = jax.jit(
            lambda c, slot, tok: c.at[slot, tok].add(1), donate_argnums=(0,)
        )
        self._reset_count_fn = jax.jit(
            lambda c, slot: c.at[slot].set(0), donate_argnums=(0,)
        )
        self._rep_mask_fn = jax.jit(
            lambda m, slot, toks, n: m.at[slot].set(False).at[
                slot,
                jnp.where(jnp.arange(toks.shape[0]) < n, toks, m.shape[1]),
            ].set(True, mode="drop"),
            donate_argnums=(0,),
        )
        self._prefill_fn = jax.jit(self._prefill, static_argnames=("n_top",))
        self._score_fn = None

    # -- jitted programs ----------------------------------------------------

    def _fetch_tok_lp(self, toks, lps):
        """ONE device→host transfer for the (tokens, logprobs) pair.

        Every fetch through the tunneled runtime pays a full round-trip
        (utils/benchmark.py docstring: d2h ≈ 8 MB/s + per-transfer
        latency), and the decode loop fetched tokens and logprobs
        separately — two RTTs per tick.  Tokens are exact in f32
        (vocab < 2^24), so stack both planes into one f32 array, fetch
        once, split on host."""
        both = np.asarray(jnp.stack([
            jnp.asarray(toks).astype(jnp.float32),
            jnp.asarray(lps).astype(jnp.float32),
        ]))
        return both[0].astype(np.int32), both[1]

    def _fwd_t(self, params, tokens, caches, cache_len, positions, tables):
        """Forward with an optional paged block table.  In paged mode
        (mesh or not) ``tables`` is the 6th positional input — under a
        mesh the paged shard_map ``_fwd`` takes it with spec
        P("data", None), matching the batch-sharded tokens."""
        if tables is None:
            return self._fwd(params, tokens, caches, cache_len, positions)
        return self._fwd(params, tokens, caches, cache_len, positions, tables)

    def _decode_step(self, params, tokens, caches, cache_len, key, active,
                     temp, topk, topp, minp, counts, rep_mask, pres,
                     freq, rep, seeded, seeds, ngen,
                     bias_ids=None, bias_vals=None, tables=None,
                     allow_ids=None, n_top: int = 0):
        positions = cache_len[:, None]  # T == 1
        logits, caches = self._fwd_t(
            params, tokens, caches, cache_len, positions, tables
        )
        last = logits[:, -1, :]
        penal = apply_penalties(last, counts, rep_mask, pres, freq, rep)
        if bias_ids is not None:
            penal = apply_logit_bias(penal, bias_ids, bias_vals)
        if allow_ids is not None:  # guided decoding hard mask (last word)
            penal = apply_allowed_mask(penal, allow_ids)
        next_tok = jnp.where(
            active,
            sample_batched(penal, key, temp, topk, topp, minp,
                           seeded, seeds, ngen),
            0,
        )
        # the sampled token is now generated: count it for later steps
        # (logprobs stay on the RAW distribution)
        counts = counts.at[jnp.arange(counts.shape[0]), next_tok].add(
            active.astype(jnp.int32)
        )
        tops = None
        if n_top:  # OpenAI top-N alternatives, raw distribution
            lsm = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
            tops = jax.lax.top_k(lsm, n_top)
        return next_tok, chosen_logprob(last, next_tok), caches, counts, tops

    def _decode_step_sharded(self, params, tokens, caches, cache_len, key,
                             active, temp, tables=None):
        positions = cache_len[:, None]  # T == 1
        if tables is None:
            return self._fwd_decode_sample(
                params, tokens, caches, cache_len, positions, key, active,
                temp,
            )
        return self._fwd_decode_sample(
            params, tokens, caches, cache_len, positions, key, active,
            temp, tables,
        )

    @functools.partial(
        jax.jit, static_argnames=("self", "n_steps"), donate_argnums=(3,)
    )
    def _decode_multi_sharded(self, params, tokens, caches, cache_len, key,
                              active, temp, tables, n_steps: int):
        def body(carry, _):
            tok, caches, clen, key = carry
            key, sub = jax.random.split(key)
            nxt, lp, caches = self._decode_step_sharded(
                params, tok[:, None], caches, clen, sub, active, temp,
                tables,
            )
            return (nxt, caches, clen + 1, key), (nxt, lp)

        (_, caches, _, _), (toks, lps) = jax.lax.scan(
            body, (tokens[:, 0], caches, cache_len, key), None, length=n_steps
        )
        return toks.T, lps.T, caches  # (B, n_steps) each

    @functools.partial(
        jax.jit, static_argnames=("self", "n_steps", "n_top"),
        donate_argnums=(3, 11)
    )
    def _decode_multi(self, params, tokens, caches, cache_len, key, active,
                      temp, topk, topp, minp, counts, rep_mask, pres,
                      freq, rep, seeded, seeds, ngen, bias_ids, bias_vals,
                      tables, allow_ids, n_steps: int, n_top: int = 0):
        """n decode steps fused in one on-device ``lax.scan`` — amortizes
        dispatch overhead (one launch per chunk instead of per token).
        ``allow_ids`` is always None here: guided rows force chunk=1 (the
        mask changes per emitted token, which only the host trie knows)."""

        def body(carry, _):
            tok, caches, clen, key, counts, ng = carry
            key, sub = jax.random.split(key)
            nxt, lp, caches, counts, tops = self._decode_step(
                params, tok[:, None], caches, clen, sub, active,
                temp, topk, topp, minp, counts, rep_mask, pres, freq, rep,
                seeded, seeds, ng, bias_ids, bias_vals, tables, allow_ids,
                n_top,
            )
            ng_next = None if ng is None else ng + 1  # None = no seeded rows
            return (nxt, caches, clen + 1, key, counts, ng_next), \
                (nxt, lp, tops)

        (_, caches, _, _, counts, _), (toks, lps, tops) = jax.lax.scan(
            body, (tokens[:, 0], caches, cache_len, key, counts, ngen), None,
            length=n_steps,
        )
        if tops is not None:  # (n_steps, B, N) → (B, n_steps, N)
            tops = (jnp.swapaxes(tops[0], 0, 1), jnp.swapaxes(tops[1], 0, 1))
        return toks.T, lps.T, caches, counts, tops  # (B, n_steps) each

    def _spec_verify_step(self, params, tokens, caches, cache_len, key,
                          active, temp, topk, topp, minp, counts,
                          rep_mask, pres, freq, rep, seeded, seeds, ngen,
                          bias_ids=None, bias_vals=None, tables=None,
                          allow_ids=None, n_top: int = 0):
        """Verify a (B, 1+k) [last_token, draft…] batch in one forward.
        Returns the model's SAMPLED continuation at every position (each
        honoring its row's temperature/top-k/top-p/seed; temp<=0 rows
        reduce to greedy) plus its logprobs, for exact-match draft
        acceptance: position j's token is drawn from the true conditional
        distribution after the first j emitted tokens, so accepting draft
        tokens while ``draft[j] == sampled[j]`` keeps every emitted token
        exactly distributed — greedy rows accept the greedy prefix, SEEDED
        rows are byte-identical to the non-speculative stream (their noise
        is keyed on (seed, generation index), schedule-invariant), and
        unseeded temperature rows stay distribution-exact (per-position
        ``fold_in(key, j)`` noise).  Position 0 additionally applies the
        penalty/bias/guided stack — logit-altering rows get NO drafts
        (host side), so positions ≥ 1 are never consumed for them.  KV for
        rejected draft positions is garbage past the accepted point; the
        next tick rewrites those positions before anything attends to them
        (same argument as chunked prefill)."""
        B, T = tokens.shape
        pos = cache_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        logits, caches = self._fwd_t(params, tokens, caches, cache_len, pos,
                                     tables)
        lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        penal0 = apply_penalties(logits[:, 0], counts, rep_mask, pres,
                                 freq, rep)
        if bias_ids is not None:
            penal0 = apply_logit_bias(penal0, bias_ids, bias_vals)
        if allow_ids is not None:  # guided rows never draft (alters_logits)
            penal0 = apply_allowed_mask(penal0, allow_ids)
        samp0 = jnp.where(
            active,
            sample_batched(penal0, key, temp, topk, topp, minp,
                           seeded, seeds, ngen),
            0,
        )
        cols = [samp0]
        for j in range(1, T):  # static: T = 1 + spec_k, small
            cols.append(sample_batched(
                logits[:, j], jax.random.fold_in(key, j), temp, topk,
                topp, minp, seeded, seeds,
                None if ngen is None else ngen + j,
            ))
        samp = jnp.stack(cols, axis=1)  # (B, T)
        slp = jnp.take_along_axis(lsm, samp[..., None], axis=-1)[..., 0]
        counts = counts.at[jnp.arange(counts.shape[0]), samp0].add(
            active.astype(jnp.int32)
        )
        tops = jax.lax.top_k(lsm, n_top) if n_top else None  # (B, T, N)
        return samp, slp, caches, counts, tops

    @staticmethod
    def _prefill_sample_logits(last, pen, bias_ids, bias_vals, allow_ids):
        """The decode step's logit-altering stack (penalties → bias →
        guided mask) applied to a prefill's final-position logits, so the
        FIRST sampled token of a penalized/resumed request matches the
        stream a plain decode would produce (vLLM semantics: the
        repetition penalty covers prompt tokens, and a preemption-resumed
        request's generated counts carry over).  ``pen`` is the
        (counts, prompt_mask, pres, freq, rep) bundle or None (common
        unpenalized path traces no penalty work at all)."""
        samp_in = last
        if pen is not None:
            samp_in = apply_penalties(samp_in, *pen)
        if bias_ids is not None:
            samp_in = apply_logit_bias(samp_in, bias_ids, bias_vals)
        if allow_ids is not None:
            samp_in = apply_allowed_mask(samp_in, allow_ids)
        return samp_in

    def _prefill_chunk_step(self, params, tokens, caches, ks, true_n, slots,
                            key, temp, topk, topp, minp, seeded, seeds,
                            ngen, bias_ids=None, bias_vals=None,
                            allow_ids=None, pen=None, n_top: int = 0):
        """One chunked-prefill step for a GROUP of g slots of the GLOBAL
        cache: gather the slots' rows, run one (g, C) prefill-with-cache
        forward (row i starts at position ``ks[i]``), scatter the rows
        back (the cache is donated, so this aliases in place).  Padded
        tail positions write garbage KV past the prompt — harmless: every
        such position is rewritten by the next chunk or by the decode step
        that later owns it, before anything attends to it.  The scheduler
        pads short groups by REPEATING a real slot; duplicate scatter
        indices write bit-identical rows (same inputs, same forward), so
        the pad is write-order-independent.

        Also samples a token per row at chunk index ``true_n - 1`` — the
        host uses it (and its logprob) only on a FINAL chunk."""

        def sl(b):
            return b[slots]

        c1 = jax.tree.map(sl, caches)
        pos = ks[:, None] + jnp.arange(tokens.shape[1], dtype=jnp.int32)[None]
        logits, c1 = self._fwd_last(
            params, tokens, c1, ks, pos, true_n - 1
        )
        last = logits[:, 0, :]
        samp_in = self._prefill_sample_logits(
            last, pen, bias_ids, bias_vals, allow_ids
        )
        tok = sample_batched(samp_in, key, temp, topk, topp, minp,
                             seeded, seeds, ngen)
        lp = chosen_logprob(last, tok)
        tops = None
        if n_top:
            lsm = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
            tops = jax.lax.top_k(lsm, n_top)

        def ins(b, s):
            return b.at[slots].set(s)

        return tok, lp, jax.tree.map(ins, caches, c1), tops

    def _prefill_chunk_paged(self, params, tokens, caches, k, true_n,
                             tables, key, temp, topk, topp, minp, seeded,
                             seeds, ngen, bias_ids=None, bias_vals=None,
                             allow_ids=None, pen=None, n_top: int = 0):
        """Paged-mode chunked prefill, one (R, C) forward for up to R slots
        (R = data degree × per-shard group size g ≤ prefill_batch): each
        row writes straight into its slot's blocks through its table row
        (donated pool, in-place scatter).  Under data>1 the rows are
        grouped g PER DATA SHARD (the scheduler builds them that way), so
        every shard prefills its own slots into its own pool slice in
        parallel; idle rows get a null-table row whose writes land in
        their null block.  Padded tail positions land in unallocated
        virtual blocks → the null block (paged_kv.py), harmless by
        construction.  ``k``/``true_n`` are per-row (R,) vectors."""
        pos = k[:, None] + jnp.arange(tokens.shape[1], dtype=jnp.int32)[None]
        logits, caches = self._fwd_last(
            params, tokens, caches, k, pos, true_n - 1, tables
        )
        last = logits[:, 0, :]
        samp_in = self._prefill_sample_logits(
            last, pen, bias_ids, bias_vals, allow_ids
        )
        tok = sample_batched(samp_in, key, temp, topk, topp, minp,
                             seeded, seeds, ngen)
        tops = None
        if n_top:
            lsm = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
            tops = jax.lax.top_k(lsm, n_top)
        return tok, chosen_logprob(last, tok), caches, tops

    def _prefill(self, params, tokens, true_len, caches1, key,
                 temp, topk, topp, minp, seeded, seeds, ngen,
                 bias_ids=None, bias_vals=None, allow_ids=None,
                 pen=None, n_top: int = 0):
        """Batch-generic forward over a padded bucket; returns per-row next
        tokens + caches (the engine calls it with B = admitted sub-batch)."""
        B, T = tokens.shape
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))
        logits, caches1 = self._fwd_last(
            params, tokens, caches1, jnp.zeros((B,), jnp.int32), pos,
            true_len - 1,
        )
        last = logits[:, 0, :]
        samp_in = self._prefill_sample_logits(
            last, pen, bias_ids, bias_vals, allow_ids
        )
        tok = sample_batched(samp_in, key, temp, topk, topp, minp,
                             seeded, seeds, ngen)
        tops = None
        if n_top:
            lsm = jax.nn.log_softmax(last.astype(jnp.float32), axis=-1)
            tops = jax.lax.top_k(lsm, n_top)
        return tok, chosen_logprob(last, tok), caches1, tops

    # -- host-side scheduling ----------------------------------------------

    def _get_prefill_fn(self, bucket: int):
        """One jit wrapper serves every bucket — jit's own trace cache is
        keyed by argument shapes, so per-bucket specialization is free."""
        del bucket
        return self._prefill_fn

    @functools.partial(jax.jit, static_argnames=("self",),
                       donate_argnums=(1,))
    def _insert_fn(self, big, small, row, slot):
        """Insert row ``row`` of a prefill cache into slot ``slot`` of the
        donated global cache — in-place aliasing instead of a full-store
        copy per admitted request; row/slot are device scalars so every
        slot shares one executable."""
        def ins(b, s):
            # rank-generic: k/v stores are 4-d (B, nkv, S, hd), the INT8
            # scale planes are 3-d (B, nkv, S) — see kv_cache.init
            s1 = jax.lax.dynamic_slice(
                s, (row,) + (0,) * (s.ndim - 1), (1,) + s.shape[1:]
            )
            return jax.lax.dynamic_update_slice(
                b, s1, (slot,) + (0,) * (b.ndim - 1)
            )

        return jax.tree.map(ins, big, small)

    def _insert_cache(self, caches1, slot: int, row: int = 0):
        self.caches = self._insert_fn(
            self.caches, caches1, jnp.int32(row), jnp.int32(slot)
        )

    def add_request(self, req: Request) -> None:
        """Submit a request; safe from any thread while run() is live (the
        engine drains the inbox at its next scheduling iteration)."""
        if req.t_enqueue is None:
            req.t_enqueue = time.monotonic()
        with self._inbox_lock:
            self._inbox.append(req)

    def score_prompt(self, tokens: List[int]) -> List[Optional[float]]:
        """log P(tokens[i] | tokens[:i]) per prompt token (index 0 → None,
        OpenAI convention) — the ``echo`` scoring path.  A pure params
        forward over the padded prefill bucket: touches no KV/slot state or
        donated buffers, so it is safe to run concurrently with the engine
        loop (device execution serializes; nothing aliases)."""
        n = len(tokens)
        if n < 1:
            return []
        bucket = _bucket(n, self.prefill_buckets)
        if self._score_fn is None:
            def scored(params, toks):
                logits, _ = M.forward(
                    params, self.config, toks,
                    tp_axis="model" if self.mesh is not None else None,
                )
                lsm = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
                tgt = toks[0, 1:]
                return jnp.take_along_axis(
                    lsm[0, :-1], tgt[:, None], axis=-1
                )[:, 0]

            if self.mesh is not None:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                fn = jax.jit(shard_map(
                    scored, mesh=self.mesh,
                    in_specs=(self._pspec, P(None, None)),
                    out_specs=P(None), check_vma=False,
                ))
            else:
                fn = jax.jit(scored)
            self._score_fn = fn
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = tokens
        lp = np.asarray(self._score_fn(self.params, jnp.asarray(toks)))
        return [None] + [float(x) for x in lp[: n - 1]]

    def _admit_batch(self, reqs: List[Request], slots: List[int],
                     bucket: int) -> None:
        """Prefill ``reqs`` together (B = len(reqs)) and install each row's
        KV into its slot."""
        pb = len(reqs)
        toks = np.zeros((pb, bucket), np.int32)
        lens = np.zeros((pb,), np.int32)
        for i, r in enumerate(reqs):
            n = len(r.prompt_tokens)
            toks[i, :n] = r.prompt_tokens
            lens[i] = n
        # bucket-sized scratch: _prefill only writes positions [0, bucket)
        # and _insert_fn's dynamic_update_slice accepts the smaller store —
        # no reason to allocate/zero/copy max_len rows per admission
        caches1 = kv_cache.init(
            self.config, pb, bucket,
            quantized=self.kv_quantized, dtype=self.dtype,
        )
        self.key, k = jax.random.split(self.key)
        tok, lp, caches1, tops = self._get_prefill_fn(bucket)(
            self.params, jnp.asarray(toks), jnp.asarray(lens), caches1, k,
            *sampling_arrays([r.sampling for r in reqs]),
            *self._seed_arrays(reqs, len(reqs)),
            *self._bias_arrays(reqs, len(reqs)),
            self._allowed_arrays(reqs, len(reqs)),
            pen=self._prefill_pen(reqs, len(reqs)),
            n_top=self._ntop(reqs, len(reqs)),
        )
        firsts = np.asarray(tok)  # ONE host sync for the whole group
        lps = np.asarray(lp)
        tops_np = None if tops is None else (np.asarray(tops[0]),
                                             np.asarray(tops[1]))
        for i, (req, slot) in enumerate(zip(reqs, slots)):
            self._insert_cache(caches1, slot, row=i)
            first = int(firsts[i])
            if req.sampling.has_penalties:
                # fresh penalty counts for the slot; the prefill-sampled
                # first token is generated → count it for the next step
                self.counts = self._reset_count_fn(
                    self.counts, jnp.int32(slot)
                )
                self.counts = self._count_fn(
                    self.counts, jnp.int32(slot), jnp.int32(first)
                )
                if req.sampling.repetition_penalty != 1.0:
                    self.rep_mask = self._rep_mask_fn(
                        self.rep_mask, jnp.int32(slot),
                        jnp.asarray(toks[i]), jnp.int32(lens[i]),
                    )
            req.output_tokens.append(first)
            req.token_logprobs.append(float(lps[i]))
            if tops_np is not None and req.sampling.top_logprobs:
                req.top_logprobs.append(
                    self._top_list(req, tops_np[0][i], tops_np[1][i])
                )
            self.slot_req[slot] = req
            self._admit_seq += 1
            self.slot_seq[slot] = self._admit_seq
            self.slot_len[slot] = int(lens[i])
            self.slot_tokens[slot] = []
            self.slot_last_tok[slot] = first
            self.stats["prefills"] += 1
            self.stats["prefill_tokens"] += int(lens[i])
            self._maybe_finish(slot)
            self._emit(req)
            self._release_if_cancelled(slot)

    def _pick_slot(self, prompt: List[int]) -> Tuple[int, int]:
        """Choose a free slot for ``prompt``; with ``prefix_cache``, prefer
        the free slot whose preserved KV shares the longest common prefix
        with it.  The reused length is (a) capped at len(prompt)-1 — at
        least one token must run to produce logits — and (b) rounded DOWN
        to a prefill_chunk multiple so every subsequent chunk write stays
        inside the store (same no-clamp invariant as fresh chunked
        prefill).  Returns (slot, reused_tokens)."""
        free = [i for i, r in enumerate(self.slot_req) if r is None]
        if not self.prefix_cache:
            return free[0], 0
        best, best_m = free[0], 0
        for i in free:
            m = 0
            for a, b in zip(self.slot_tokens[i], prompt):
                if a != b:
                    break
                m += 1
            m = min(m, len(prompt) - 1)
            m = (m // self.prefill_chunk) * self.prefill_chunk
            if m > best_m:
                best, best_m = i, m
        return best, best_m

    #: rows of the packed per-tick transfer: tokens, cache_len, active,
    #: temp, top_k, top_p, min_p, presence, frequency, repetition,
    #: seeded, seeds, ngen (floats ride bitcast as int32)
    _TICK_ROWS = 13

    def _pack_tick_args(self, active):
        """Every small per-tick device input as ONE (13, B) int32 h2d.

        The decode loop previously shipped ~13 separate (B,)-sized arrays
        per tick (tokens, lengths, sampling/penalty/seed planes) — each
        ``jnp.asarray`` pays a full tunnel round trip, and at bs=1 the
        host/RPC share dominated TPOT (~70 ms/tick measured).  Returns
        ``(buf, has_seeded)``; ``has_seeded`` stays a static so the
        unseeded fast path keeps short-circuiting the second Gumbel field
        (see _seed_arrays)."""
        B = self.max_batch
        buf = np.zeros((self._TICK_ROWS, B), np.int32)
        buf[0] = self.slot_last_tok
        buf[1] = self.slot_len
        buf[2] = active
        temp = np.zeros((B,), np.float32)
        topp = np.ones((B,), np.float32)
        minp = np.zeros((B,), np.float32)
        pres = np.zeros((B,), np.float32)
        freq = np.zeros((B,), np.float32)
        rep = np.ones((B,), np.float32)
        for i, r in enumerate(self.slot_req):
            if r is None:
                continue
            sp = r.sampling
            temp[i] = sp.temperature
            buf[4, i] = sp.top_k
            topp[i] = sp.top_p
            minp[i] = sp.min_p
            pres[i] = sp.presence_penalty
            freq[i] = sp.frequency_penalty
            rep[i] = sp.repetition_penalty
            if sp.seed is not None and sp.temperature > 0.0:
                buf[10, i] = 1
                buf[11, i] = np.int32(sp.seed & 0x7FFFFFFF)
                buf[12, i] = len(r.output_tokens)
        buf[3] = temp.view(np.int32)
        buf[5] = topp.view(np.int32)
        buf[6] = minp.view(np.int32)
        buf[7] = pres.view(np.int32)
        buf[8] = freq.view(np.int32)
        buf[9] = rep.view(np.int32)
        return jnp.asarray(buf), bool(buf[10].any())

    @staticmethod
    def _unpack_tick(buf, has_seeded: bool):
        def f(r):
            return jax.lax.bitcast_convert_type(buf[r], jnp.float32)

        tokens = buf[0][:, None]
        cache_len = buf[1]
        active = buf[2].astype(bool)
        if has_seeded:
            seeded, seeds, ngen = buf[10].astype(bool), buf[11], buf[12]
        else:
            seeded = seeds = ngen = None
        return (tokens, cache_len, active, f(3), buf[4], f(5), f(6),
                f(7), f(8), f(9), seeded, seeds, ngen)

    @functools.partial(
        jax.jit,
        static_argnames=("self", "n_top", "has_seeded"),
        donate_argnums=(3, 5),
    )
    def _decode_one_packed(self, params, buf, caches, key, counts,
                           rep_mask, bias_ids, bias_vals, tables,
                           allow_ids, n_top: int = 0,
                           has_seeded: bool = False):
        (tokens, cache_len, active, temp, topk, topp, minp, pres, freq,
         rep, seeded, seeds, ngen) = self._unpack_tick(buf, has_seeded)
        return self._decode_step(
            params, tokens, caches, cache_len, key, active, temp, topk,
            topp, minp, counts, rep_mask, pres, freq, rep, seeded, seeds,
            ngen, bias_ids, bias_vals, tables, allow_ids, n_top,
        )

    @functools.partial(
        jax.jit,
        static_argnames=("self", "n_steps", "n_top", "has_seeded"),
        donate_argnums=(3, 5),
    )
    def _decode_multi_packed(self, params, buf, caches, key, counts,
                             rep_mask, bias_ids, bias_vals, tables,
                             n_steps: int, n_top: int = 0,
                             has_seeded: bool = False):
        (tokens, cache_len, active, temp, topk, topp, minp, pres, freq,
         rep, seeded, seeds, ngen) = self._unpack_tick(buf, has_seeded)
        return self._decode_multi(
            params, tokens, caches, cache_len, key, active, temp, topk,
            topp, minp, counts, rep_mask, pres, freq, rep, seeded, seeds,
            ngen, bias_ids, bias_vals, tables, None,  # guided ⇒ chunk == 1
            n_steps=n_steps, n_top=n_top,
        )

    @functools.partial(
        jax.jit, static_argnames=("self",), donate_argnums=(3,)
    )
    def _decode_sharded_packed(self, params, buf, caches, key,
                               tables=None):
        t = self._unpack_tick(buf, False)
        tokens, cache_len, active, temp = t[0], t[1], t[2], t[3]
        return self._decode_step_sharded(
            params, tokens, caches, cache_len, key, active, temp, tables,
        )

    @functools.partial(
        jax.jit, static_argnames=("self", "n_steps"), donate_argnums=(3,)
    )
    def _decode_multi_sharded_packed(self, params, buf, caches, key,
                                     tables, n_steps: int):
        t = self._unpack_tick(buf, False)
        tokens, cache_len, active, temp = t[0], t[1], t[2], t[3]
        return self._decode_multi_sharded(
            params, tokens, caches, cache_len, key, active, temp, tables,
            n_steps=n_steps,
        )

    def _seed_arrays(self, rows, n: int):
        """(seeded, seeds, ngen) device arrays for :func:`sample_batched`'s
        reproducible rows — ``ngen`` is each row's generation index so the
        i-th token of a seeded request gets the same noise in every batch,
        slot, and scheduler mode."""
        seeded = np.zeros((n,), bool)
        seeds = np.zeros((n,), np.int32)
        ngen = np.zeros((n,), np.int32)
        for i, r in enumerate(rows[:n]):
            if r is None:
                continue
            sp = r.sampling
            if sp.seed is not None and sp.temperature > 0.0:
                seeded[i] = True
                seeds[i] = np.int32(sp.seed & 0x7FFFFFFF)
                ngen[i] = len(r.output_tokens)
        if not seeded.any():
            # common unseeded config: sample_batched skips the second
            # (B, V) Gumbel field entirely (None short-circuits the trace)
            return None, None, None
        return jnp.asarray(seeded), jnp.asarray(seeds), jnp.asarray(ngen)

    def _bias_arrays(self, rows, n: int):
        """(bias_ids, bias_vals) for :func:`apply_logit_bias` over request
        rows (None rows → no bias); (None, None) when no row has one."""
        return bias_arrays(
            [r.sampling if r is not None else None for r in rows], n
        )

    def _prefill_pen(self, rows, n: int):
        """The (counts, prompt_mask, pres, freq, rep) bundle for prefill-
        time sampling of penalized rows, or None when no row has penalties
        (the common path ships nothing and traces no penalty work).
        Counts/mask are built HOST-side from the requests' own token lists
        — prefill rows have no device count state yet (admission resets it
        right after, using the sampled token)."""
        rows = rows[:n]
        if not any(r is not None and r.sampling.has_penalties for r in rows):
            return None
        V = self.config.vocab_size
        counts = np.zeros((n, V), np.int32)
        pmask = np.zeros((n, V), bool)
        for i, r in enumerate(rows):
            if r is None or not r.sampling.has_penalties:
                continue
            if r.output_tokens:  # resumed after preemption
                counts[i] = np.bincount(
                    np.asarray(r.output_tokens), minlength=V
                )[:V]
            if r.sampling.repetition_penalty != 1.0 and r.prompt_tokens:
                pmask[i, np.asarray(r.prompt_tokens, np.int64)] = True
        pens = penalty_arrays(
            [r.sampling if r is not None else None for r in rows], n
        )
        return (jnp.asarray(counts), jnp.asarray(pmask)) + tuple(pens)

    def _ntop(self, rows, n: int) -> int:
        """This tick's top-N logprobs width: the max requested over the
        rows (0 compiles the report-free fast path)."""
        return max(
            (r.sampling.top_logprobs for r in rows[:n] if r is not None),
            default=0,
        )

    @staticmethod
    def _top_list(req, tv_row, ti_row):
        m = req.sampling.top_logprobs
        return [(int(t), float(v))
                for t, v in zip(ti_row[:m], tv_row[:m])]

    def _allowed_arrays(self, rows, n: int):
        """(n, K) allowed-token ids for guided rows (pad = vocab_size,
        dropped by the scatter) or None when no row is guided.  The trie
        walk: candidates still consistent with the row's generated tokens
        contribute their next token; at a completion point EOS joins the
        set (letting the row stop there even when longer candidates
        exist).  Rows with no consistent continuation never reach here —
        _maybe_finish closed them on the previous token."""
        V = self.config.vocab_size
        sets: List[set] = []
        any_guided = False
        for r in rows[:n]:
            s: set = set()
            if r is not None and r.sampling.guided_choice:
                any_guided = True
                out = tuple(r.output_tokens)
                m = len(out)
                complete = False
                for cand in r.sampling.guided_choice:
                    cand = tuple(cand)
                    if len(cand) > m and cand[:m] == out:
                        s.add(int(cand[m]))
                    elif cand == out:
                        complete = True
                if complete and r.sampling.eos_token_id is not None:
                    s.add(int(r.sampling.eos_token_id))
            sets.append(s)
        if not any_guided:
            return None
        kmax = max(1, max(len(s) for s in sets))
        K = 1 << (kmax - 1).bit_length()
        ids = np.full((n, K), V, np.int32)
        for i, s in enumerate(sets):
            for j, t in enumerate(sorted(s)):
                ids[i, j] = t
        return jnp.asarray(ids)

    # -- paged block management (host side) ----------------------------------

    def _tables_arg(self):
        """Current block tables as the device arg of the jitted programs
        (None in slot mode — the programs compile without a paged branch).
        The device array is cached and re-uploaded only after a host-side
        table mutation (every mutation site sets ``_tables_dirty``)."""
        if not self.paged:
            return None
        if self._tables_dirty or self._tables_dev is None:
            self._tables_dev = jnp.asarray(self.tables)
            self._tables_dirty = False
        return self._tables_dev

    def _shard_of(self, slot: int) -> int:
        """Data shard owning ``slot`` — slots partition contiguously over
        the mesh "data" axis (GSPMD batch sharding); each shard has its own
        pool slice, allocator, and prefix-hash map."""
        return slot // (self.max_batch // self.dp)

    def _release_blocks(self, slot: int) -> None:
        """Drop the slot's block ownership.  Registered (prefix-cache)
        blocks survive in the hash map with their refcount decremented —
        rc==0 parks them on the eviction LRU; unregistered blocks return to
        the allocator immediately."""
        d = self._shard_of(slot)
        for blk in self.slot_blocks[slot]:
            if blk in self._bh_blk2key[d]:
                self._bh_ref[d][blk] -= 1
                if self._bh_ref[d][blk] == 0:
                    self._bh_lru[d][blk] = None
            else:
                self.allocators[d].free([blk])
        self.slot_blocks[slot] = []
        self.tables[slot, :] = 0
        self._tables_dirty = True
        self.slot_reg[slot] = 0

    def _evict_cached_blocks(self, d: int, need: int) -> None:
        """Free rc==0 prefix-cache blocks of shard ``d`` (oldest first)
        until ``need`` blocks are available there."""
        while self.allocators[d].available < need and self._bh_lru[d]:
            blk, _ = self._bh_lru[d].popitem(last=False)
            del self._bh_key2blk[d][self._bh_blk2key[d].pop(blk)]
            del self._bh_ref[d][blk]
            self.allocators[d].free([blk])

    def _register_blocks(self, slot: int) -> None:
        """Register the slot's newly COMPLETED blocks in the prefix hash
        map (paged prefix_cache).  A block's key is the tuple of ALL tokens
        up to its end — KV depends on (token, position), so equal prefixes
        have bit-equal KV.  Full blocks are immutable (every write lands at
        clen and beyond, i.e. in the exclusive tail), so sharing is safe
        without copy-on-write."""
        if not self.prefix_cache:
            return
        req = self.slot_req[slot]
        if req is None:
            return
        d = self._shard_of(slot)
        bs = self.block_size
        n_full = int(self.slot_len[slot]) // bs
        if n_full <= self.slot_reg[slot]:
            return
        stream = (req._resume or req.prompt_tokens) + req.output_tokens
        for i in range(self.slot_reg[slot], n_full):
            blk = self.slot_blocks[slot][i]
            if blk not in self._bh_blk2key[d]:
                key = tuple(stream[: (i + 1) * bs])
                if key not in self._bh_key2blk[d]:
                    self._bh_key2blk[d][key] = blk
                    self._bh_blk2key[d][blk] = key
                    self._bh_ref[d][blk] = 1
                # else: an identical block is already registered; this copy
                # stays exclusive and returns to the allocator on release
        self.slot_reg[slot] = n_full

    def _adopt_prefix(self, slot: int, stream: List[int]) -> int:
        """Block-level prefix reuse at admission: walk the stream's full
        blocks through the hash map, adopt every hit read-only (rc++), and
        return the reused token count (block-aligned; capped so at least
        one token still prefills).  Unlike the slot-mode path, reuse does
        NOT need chunk alignment: a resumed chunk's padded tail writes go
        through the block tables, where positions past the allocated
        blocks land in the null block (paged_kv.py) instead of clamping
        into earlier KV."""
        d = self._shard_of(slot)
        bs = self.block_size
        limit = min(len(stream) - 1, self._nbmax * bs)
        matched = 0
        while (matched + 1) * bs <= limit \
                and tuple(stream[: (matched + 1) * bs]) in self._bh_key2blk[d]:
            matched += 1
        reuse = matched * bs
        nblk = reuse // bs
        for i in range(nblk):
            blk = self._bh_key2blk[d][tuple(stream[: (i + 1) * bs])]
            if self._bh_ref[d][blk] == 0:
                self._bh_lru[d].pop(blk, None)
            self._bh_ref[d][blk] += 1
            self.slot_blocks[slot].append(blk)
            self.tables[slot, i] = blk
            self._tables_dirty = True
        self.slot_reg[slot] = nblk
        return reuse

    def _preempt(self, protect: int) -> bool:
        """Free the LATEST-ADMITTED active request other than ``protect``
        and requeue it at the FRONT of the queue with its resume stream
        (prompt + generated) — the vLLM recompute-preemption policy (oldest
        requests keep their blocks; re-preemption cannot starve them).
        Greedy/seeded outputs are unchanged: re-prefill rebuilds the
        identical KV and the seeded noise is keyed on the generation index,
        not the schedule."""
        cands = [i for i, r in enumerate(self.slot_req)
                 if r is not None and i != protect
                 and self._shard_of(i) == self._shard_of(protect)]
        if not cands:
            return False
        victim = max(cands, key=lambda i: self.slot_seq[i])
        req = self.slot_req[victim]
        self.slot_prefill.pop(victim, None)
        req._resume = list(req.prompt_tokens) + list(req.output_tokens)
        self._pending.insert(0, req)
        self._register_blocks(victim)  # resume adoption gets them back free
        self._release_blocks(victim)
        self.slot_req[victim] = None
        self.slot_len[victim] = 0
        self.slot_tokens[victim] = []
        self.stats["preemptions"] += 1
        return True

    def _ensure_blocks(self, slot: int, upto: int) -> bool:
        """Grow ``slot``'s block table to cover positions [0, upto),
        reclaiming cached prefixes and preempting other requests if the
        pool is dry.  Returns False when the slot can't fit even with
        every other request preempted and the prefix-cache LRU drained —
        the caller finishes the request with reason "length" (raising
        here would kill the serving loop for every client)."""
        d = self._shard_of(slot)
        bs = self.block_size
        need = min(-(-upto // bs), self._nbmax) - len(self.slot_blocks[slot])
        if need <= 0:
            return True
        if self.allocators[d].available < need:
            self._evict_cached_blocks(d, need)
        while self.allocators[d].available < need:
            if not self._preempt(protect=slot):
                return False
            # a preempted victim's REGISTERED blocks (prefix_cache) land on
            # the rc==0 LRU, not the allocator — drain it again, or the
            # loop preempts everyone and still comes up dry
            self._evict_cached_blocks(d, need)
        got = self.allocators[d].alloc(need)
        base = len(self.slot_blocks[slot])
        self.slot_blocks[slot].extend(got)
        self.tables[slot, base : base + len(got)] = got
        self._tables_dirty = True
        return True

    def _finish_out_of_room(self, slot: int) -> None:
        """Close ``slot``'s request gracefully when the pool can't grow its
        KV any further (everything preemptable already preempted): finish
        with OpenAI reason "length", keeping the output generated so far."""
        req = self.slot_req[slot]
        self.slot_prefill.pop(slot, None)
        req.done = True
        req.finish_reason = "length"
        self._free_slot(slot)
        self._emit(req)

    def _propose_draft(self, req: Request) -> List[int]:
        """Prompt-lookup drafting (vLLM's "[ngram]" speculative model): find
        the most recent earlier occurrence of the last ``spec_ngram`` tokens
        in the request's own prompt+output stream and draft its
        continuation (up to ``spec_k`` tokens)."""
        n, k = self.spec_ngram, self.spec_k
        ctx = req.prompt_tokens + req.output_tokens
        if len(ctx) <= n:
            return []
        tail = ctx[-n:]
        for i in range(len(ctx) - n - 1, -1, -1):
            if ctx[i : i + n] == tail:
                return ctx[i + n : i + n + k]
        return []

    def _spec_tick(self, active) -> bool:
        """One speculative decode tick: draft per slot (host), verify all
        drafts in one (B, 1+spec_k) forward, accept the longest draft
        prefix matching the model's own sampled stream + one bonus token
        per row (exact-match acceptance — every emitted token is drawn
        from the true conditional distribution, see _spec_verify_step).

        Returns False WITHOUT touching the device when no active row
        produced a draft — the caller falls through to the plain (fused)
        decode tick, so prompt-lookup misses cost nothing (vLLM's ngram
        speculator has the same no-candidate fast path; here the fallback
        additionally fuses ``steps_per_tick`` steps)."""
        k = self.spec_k
        B = self.max_batch
        toks = np.zeros((B, 1 + k), np.int32)
        drafts: List[List[int]] = [[] for _ in range(B)]
        for slot, req in enumerate(self.slot_req):
            if not active[slot]:
                continue
            toks[slot, 0] = self.slot_last_tok[slot]
            # logit-altering rows (penalties/bias/guided) take the plain
            # 1-token path — the altered distribution depends on each
            # emitted token, which only position 0 applies.  Greedy AND
            # sampled rows draft (sampled rows accept via exact match).
            if not req.sampling.alters_logits:
                d = self._propose_draft(req)
                drafts[slot] = d
                toks[slot, 1 : 1 + len(d)] = d
        if not any(drafts):
            return False
        cache_len = jnp.asarray(self.slot_len)
        self.key, kk = jax.random.split(self.key)
        slist = [r.sampling if r is not None else None for r in self.slot_req]
        samp = sampling_arrays(slist, B)
        pens = penalty_arrays(slist, B)
        s_all, slp_all, self.caches, self.counts, tops = \
            self._spec_fn(
                self.params, jnp.asarray(toks), self.caches, cache_len, kk,
                jnp.asarray(active), *samp, self.counts, self.rep_mask,
                *pens, *self._seed_arrays(self.slot_req, B),
                *self._bias_arrays(self.slot_req, B),
                self._tables_arg(),
                self._allowed_arrays(self.slot_req, B),
                n_top=self._ntop(self.slot_req, B),
            )
        s_np, slp_np = self._fetch_tok_lp(s_all, slp_all)
        tops_np = None if tops is None else (np.asarray(tops[0]),
                                             np.asarray(tops[1]))
        self.stats["decode_ticks"] += 1
        for slot, req in enumerate(self.slot_req):
            if req is None or not active[slot]:
                continue
            emitted = [(int(s_np[slot, 0]), float(slp_np[slot, 0]), 0)]
            d = drafts[slot]
            self.stats["spec_drafted"] += len(d)
            j = 0
            while j < len(d) and d[j] == emitted[-1][0]:
                emitted.append(
                    (int(s_np[slot, j + 1]), float(slp_np[slot, j + 1]),
                     j + 1)
                )
                j += 1
            self.stats["spec_accepted"] += j
            for tok, lp, pos in emitted:
                if self.slot_req[slot] is None:
                    break  # finished mid-run (EOS/budget) — drop overshoot
                req.output_tokens.append(tok)
                req.token_logprobs.append(lp)
                if tops_np is not None and req.sampling.top_logprobs:
                    req.top_logprobs.append(self._top_list(
                        req, tops_np[0][slot, pos], tops_np[1][slot, pos]
                    ))
                self.slot_len[slot] += 1
                self.slot_last_tok[slot] = tok
                self._maybe_finish(slot)
            if self.paged:
                self._register_blocks(slot)
            self._emit(req)
            self._release_if_cancelled(slot)
        return True

    def _finish_chunk_prefill(self, slot: int, req, first: int, lp: float,
                              tops_row) -> None:
        """Final-chunk bookkeeping shared by the slot and paged chunked
        prefill paths: install the sampled first token, rebuild penalty
        state, hand the slot to decode."""
        req._resume = None
        if req.sampling.has_penalties:
            if req.output_tokens:
                # resumed after preemption: rebuild the generated-token
                # counts for everything emitted so far
                row = np.bincount(
                    np.asarray(req.output_tokens + [first]),
                    minlength=self.config.vocab_size,
                ).astype(np.int32)
                self.counts = self._set_counts_fn(
                    self.counts, jnp.int32(slot), jnp.asarray(row)
                )
            else:
                self.counts = self._reset_count_fn(
                    self.counts, jnp.int32(slot)
                )
                self.counts = self._count_fn(
                    self.counts, jnp.int32(slot), jnp.int32(first)
                )
            if req.sampling.repetition_penalty != 1.0:
                pt = np.zeros((self.max_len,), np.int32)
                n_p = len(req.prompt_tokens)
                pt[:n_p] = req.prompt_tokens
                self.rep_mask = self._rep_mask_fn(
                    self.rep_mask, jnp.int32(slot),
                    jnp.asarray(pt), jnp.int32(n_p),
                )
        req.output_tokens.append(first)
        req.token_logprobs.append(lp)
        if tops_row is not None and req.sampling.top_logprobs:
            req.top_logprobs.append(
                self._top_list(req, tops_row[0], tops_row[1])
            )
        self.slot_last_tok[slot] = first
        self.stats["prefills"] += 1
        self._maybe_finish(slot)
        self._emit(req)
        self._release_if_cancelled(slot)

    def _progress_chunk_prefills(self) -> None:
        """Advance every mid-prefill slot by one ``prefill_chunk``-token
        chunk per tick; the final chunk samples the request's first token
        and hands the slot to decode.  Slot mode dispatches one (1, C)
        program per slot; paged mode batches up to ``prefill_batch`` slots
        PER DATA SHARD into a single (dp·g, C) dispatch."""
        if self.paged:
            self._progress_chunk_prefills_paged()
            return
        C = self.prefill_chunk
        pending: List[int] = []
        for slot in list(self.slot_prefill):
            req = self.slot_req[slot]
            if req.cancelled:
                del self.slot_prefill[slot]
                self._release_if_cancelled(slot)
                continue
            pending.append(slot)
        while pending:
            group = pending[: self.prefill_batch]
            pending = pending[self.prefill_batch:]
            n = len(group)
            # pad to a power of two by repeating the last slot: bounds the
            # traced (g, C) shape set; the duplicate rows run the identical
            # forward and scatter bit-identical cache rows (see
            # _prefill_chunk_step) and their sampled tokens are ignored
            g = min(1 << (n - 1).bit_length(), self.prefill_batch)
            rows = group + [group[-1]] * (g - n)
            toks = np.zeros((g, C), np.int32)
            ks = np.zeros((g,), np.int32)
            tns = np.ones((g,), np.int32)
            reqs_row: List[Optional[Request]] = []
            parts: List[List[int]] = []
            finals: List[bool] = []
            for i, slot in enumerate(rows):
                req = self.slot_req[slot]
                remaining = self.slot_prefill[slot]
                part = remaining[:C]
                parts.append(part)
                toks[i, : len(part)] = part
                ks[i] = int(self.slot_len[slot])
                tns[i] = len(part)
                reqs_row.append(req)
                finals.append(len(remaining) <= C and i < n)
            # only a FINAL chunk's sampled token survives — build the
            # penalty bundle just for those rows (common all-intermediate
            # dispatch traces no penalty work)
            pen = (
                self._prefill_pen(
                    [r if f else None for r, f in zip(reqs_row, finals)], g
                )
                if any(finals) else None
            )
            self.key, kk = jax.random.split(self.key)
            n_top = self._ntop(
                [r if f else None for r, f in zip(reqs_row, finals)], g
            )
            tok, lp, self.caches, tops = self._prefill_chunk_fn(
                self.params, jnp.asarray(toks), self.caches,
                jnp.asarray(ks), jnp.asarray(tns),
                jnp.asarray(np.asarray(rows, np.int32)), kk,
                *sampling_arrays(
                    [r.sampling for r in reqs_row], g
                ),
                *self._seed_arrays(reqs_row, g),
                *self._bias_arrays(reqs_row, g),
                self._allowed_arrays(reqs_row, g),
                pen=pen,
                n_top=n_top,
            )
            self.stats["prefill_dispatches"] += 1
            toks_np = lps_np = tops_np = None  # fetched lazily on finals
            for i, slot in enumerate(group):
                req = reqs_row[i]
                part = parts[i]
                self.slot_len[slot] = int(ks[i]) + len(part)
                self.slot_prefill[slot] = self.slot_prefill[slot][C:]
                self.stats["prefill_chunks"] += 1
                self.stats["prefill_tokens"] += len(part)
                if not self.slot_prefill[slot]:  # prompt fully cached
                    del self.slot_prefill[slot]
                    if toks_np is None:
                        toks_np, lps_np = np.asarray(tok), np.asarray(lp)
                        tops_np = None if tops is None else (
                            np.asarray(tops[0]), np.asarray(tops[1])
                        )
                    tops_row = None if tops_np is None else (
                        tops_np[0][i], tops_np[1][i]
                    )
                    self._finish_chunk_prefill(
                        slot, req, int(toks_np[i]), float(lps_np[i]),
                        tops_row,
                    )

    def _progress_chunk_prefills_paged(self) -> None:
        """Paged chunked prefill, batched up to ``prefill_batch`` slots PER
        DATA SHARD per dispatch: shard d owns rows [d·g, (d+1)·g) of one
        (dp·g, C) program and prefills a chunk of each of its own slots
        into its own pool slice (idle rows ride along on a null-table
        row; g is the per-round max shard occupancy rounded up to a power
        of two so the traced shape set stays small).  Rounds repeat until
        every mid-prefill slot advanced one chunk this tick.

        Greedy and seeded streams are identical to the single-device
        engine; an UNSEEDED temperature row's final-chunk sample draws its
        Gumbel noise at its shard's row index rather than row 0, so such
        rows are distributionally equivalent but not bit-identical to a
        dp=1 run (same caveat as any batching change)."""
        C = self.prefill_chunk
        spb = self.max_batch // self.dp
        progressed: set = set()
        while True:
            per_shard: List[List[int]] = [[] for _ in range(self.dp)]
            for slot in sorted(self.slot_prefill):
                if slot in progressed:
                    continue
                d = slot // spb
                if len(per_shard[d]) < self.prefill_batch:
                    per_shard[d].append(slot)
            width = max(len(s) for s in per_shard)
            if width == 0:
                break
            # rows per shard rounded up to a power of two (bounds the set
            # of traced (R, C) shapes), capped by prefill_batch
            g = min(1 << max(0, width - 1).bit_length(), self.prefill_batch)
            rows: List[Optional[int]] = []
            for d in range(self.dp):
                sl = per_shard[d][:g]
                rows.extend(sl + [None] * (g - len(sl)))
            R = self.dp * g
            progressed.update(s for s in rows if s is not None)
            # host-side per-row prep: cancellation, block growth (which may
            # preempt — a preempted pick simply drops out of slot_prefill)
            for d, slot in enumerate(rows):
                if slot is None:
                    continue
                req = self.slot_req[slot]
                if req is None:
                    # preempted by an EARLIER row's _ensure_blocks in this
                    # very loop (recompute freed the slot) — drop the row
                    rows[d] = None
                    continue
                if req.cancelled:
                    del self.slot_prefill[slot]
                    self._release_if_cancelled(slot)
                    rows[d] = None
                    continue
                part = self.slot_prefill[slot][:C]
                if not self._ensure_blocks(
                    slot, int(self.slot_len[slot]) + len(part)
                ):
                    self._finish_out_of_room(slot)
                    rows[d] = None
            for d, slot in enumerate(rows):
                if slot is not None and slot not in self.slot_prefill:
                    rows[d] = None  # preempted by a later row's _ensure
            if all(s is None for s in rows):
                continue
            toks = np.zeros((R, C), np.int32)
            ks = np.zeros((R,), np.int32)
            tns = np.ones((R,), np.int32)
            tabs = np.zeros((R, self._nbmax), np.int32)
            reqs_row: List[Optional[Request]] = [None] * R
            finals = [False] * R
            parts: List[List[int]] = [[] for _ in range(R)]
            for d, slot in enumerate(rows):
                if slot is None:
                    continue
                req = self.slot_req[slot]
                remaining = self.slot_prefill[slot]
                part = remaining[:C]
                parts[d] = part
                toks[d, : len(part)] = part
                ks[d] = int(self.slot_len[slot])
                tns[d] = len(part)
                tabs[d] = self.tables[slot]
                reqs_row[d] = req
                finals[d] = len(remaining) <= C
            pen = (
                self._prefill_pen(
                    [r if f else None for r, f in zip(reqs_row, finals)],
                    R,
                )
                if any(finals) else None
            )
            self.key, kk = jax.random.split(self.key)
            # only final-chunk rows' tops are ever read — intermediate
            # chunks trace the n_top=0 fast path (same as slot mode)
            n_top = self._ntop(
                [r if f else None for r, f in zip(reqs_row, finals)], R
            )
            tok, lp, self.caches, tops = self._prefill_chunk_paged_fn(
                self.params, jnp.asarray(toks), self.caches,
                jnp.asarray(ks), jnp.asarray(tns), jnp.asarray(tabs), kk,
                *sampling_arrays(
                    [r.sampling if r is not None else None
                     for r in reqs_row], R,
                ),
                *self._seed_arrays(reqs_row, R),
                *self._bias_arrays(reqs_row, R),
                self._allowed_arrays(reqs_row, R),
                pen=pen,
                n_top=n_top,
            )
            self.stats["prefill_dispatches"] += 1
            toks_np = lps_np = tops_np = None  # fetched lazily on finals
            for d, slot in enumerate(rows):
                if slot is None:
                    continue
                req = reqs_row[d]
                part = parts[d]
                self.slot_len[slot] = int(ks[d]) + len(part)
                self._register_blocks(slot)  # completed blocks adoptable
                self.slot_prefill[slot] = self.slot_prefill[slot][C:]
                self.stats["prefill_chunks"] += 1
                self.stats["prefill_tokens"] += len(part)
                if not self.slot_prefill[slot]:  # prompt fully cached
                    del self.slot_prefill[slot]
                    if toks_np is None:
                        toks_np, lps_np = np.asarray(tok), np.asarray(lp)
                        tops_np = None if tops is None else (
                            np.asarray(tops[0]), np.asarray(tops[1])
                        )
                    tops_row = None if tops_np is None else (
                        tops_np[0][d], tops_np[1][d]
                    )
                    self._finish_chunk_prefill(
                        slot, req, int(toks_np[d]), float(lps_np[d]),
                        tops_row,
                    )

    def latency_summary(self) -> Dict[str, Optional[float]]:
        """p50/p95 TTFT and TPOT (seconds) over the last ≤1000 completed
        requests — the standard serving latency report."""
        def pct(vals, q):
            vals = sorted(v for v in vals if v is not None)
            if not vals:
                return None
            return vals[min(len(vals) - 1, int(q * len(vals)))]

        ttfts = [t for t, _ in self._latency]
        tpots = [p for _, p in self._latency]
        return {
            "requests": len(self._latency),
            "ttft_p50_s": pct(ttfts, 0.50), "ttft_p95_s": pct(ttfts, 0.95),
            "tpot_p50_s": pct(tpots, 0.50), "tpot_p95_s": pct(tpots, 0.95),
        }

    def cancel(self, req: Request) -> None:
        """Finish ``req`` early: no tokens beyond the last emitted one are
        delivered, its slot frees at the next tick boundary (pending
        requests are dropped before prefill).  Safe to call from another
        thread (e.g. a stop-string watcher in an ``on_token`` hook — the
        hook may simply call this)."""
        req.cancelled = True

    def run(self, requests: List[Request]) -> List[Request]:
        """Run until every request completes (continuous batching loop)."""
        now = time.monotonic()
        for r in requests:
            if r.t_enqueue is None:
                r.t_enqueue = now
        self._pending.extend(requests)
        while (self._pending or self._inbox
               or any(r is not None for r in self.slot_req)):
            with self._inbox_lock:
                self._pending.extend(self._inbox)
                self._inbox.clear()
            keep = []
            for r in self._pending:
                if r.cancelled:
                    r.done = True
                    r.finish_reason = "stop"
                elif r.sampling.max_new_tokens <= 0:
                    # zero tokens requested: finish without prefilling —
                    # prefill always samples one token, which would leak out
                    r.done = True
                    r.finish_reason = "length"
                elif len(r._resume or r.prompt_tokens) + 1 > self.max_len or (
                    not self.prefill_chunk
                    and len(r.prompt_tokens) > self.prefill_buckets[-1]
                ) or (
                    # paged: a prompt that cannot fit the pool even with
                    # every other request preempted can never run
                    self.paged
                    and -(-(len(r._resume or r.prompt_tokens) + 1)
                          // self.block_size) > self.num_blocks - 1
                ):
                    # reject oversized prompts here; raising in the shared
                    # loop would kill the serving worker thread for everyone
                    # (a preempted request that grew past pool capacity has
                    # simply run out of room: "length", keeping its output)
                    r.done = True
                    r.finish_reason = "length" if r._resume else "error"
                else:
                    keep.append(r)
            self._pending = keep
            if self.prefill_chunk:
                # chunked mode: a request claims its slot immediately and
                # prefills prefill_chunk tokens per tick (below), so decode
                # never stalls behind a whole-bucket prefill
                while self._pending and None in self.slot_req:
                    req = self._pending.pop(0)
                    stream = req._resume or req.prompt_tokens
                    if self.paged and self.prefix_cache:
                        # block-level adoption: any free slot, reuse from
                        # the content-hash map (cross-request dedup)
                        slot = self.slot_req.index(None)
                        reuse = self._adopt_prefix(slot, stream)
                    else:
                        slot, reuse = self._pick_slot(stream)
                    self.slot_req[slot] = req
                    self._admit_seq += 1
                    self.slot_seq[slot] = self._admit_seq
                    self.slot_len[slot] = reuse
                    self.slot_prefill[slot] = list(stream[reuse:])
                    self.slot_tokens[slot] = []
                    if reuse:
                        self.stats["prefix_hits"] += 1
                        self.stats["prefix_tokens_reused"] += reuse
                self._progress_chunk_prefills()
            # admit pending requests into free slots; same-bucket requests
            # prefill TOGETHER (one dispatch + one host sync for up to
            # _PREFILL_BATCH of them — the prefill program is already
            # batch-generic).  Groups may admit slightly out of FIFO order
            # (a later same-bucket request jumps an earlier different-bucket
            # one within one admission round).
            while not self.prefill_chunk and self._pending \
                    and None in self.slot_req:
                free = [i for i, r in enumerate(self.slot_req) if r is None]
                bucket = _bucket(
                    len(self._pending[0].prompt_tokens), self.prefill_buckets
                )
                group, rest = [], []
                for r in self._pending:
                    if (
                        len(group) < len(free)
                        and _bucket(len(r.prompt_tokens),
                                    self.prefill_buckets) == bucket
                    ):
                        group.append(r)
                    else:
                        rest.append(r)
                self._pending = rest
                while group:
                    pb = min(self.prefill_batch,
                             1 << (len(group).bit_length() - 1))
                    self._admit_batch(group[:pb], free[:pb], bucket)
                    group, free = group[pb:], free[pb:]

            if self.paged:
                # grow block tables for this tick's writes up front; a
                # preemption inside _ensure_blocks frees some other slot,
                # which then simply drops out of `active` below
                # spec ticks write 1+k verify positions; a no-draft tick
                # falls through to the plain path which writes up to
                # steps_per_tick — reserve for whichever runs
                need = max(1 + self.spec_k, self.steps_per_tick) \
                    if self.spec_ngram else self.steps_per_tick
                for slot, r in enumerate(self.slot_req):
                    if r is not None and slot not in self.slot_prefill:
                        if not self._ensure_blocks(
                            slot,
                            min(int(self.slot_len[slot]) + need,
                                self.max_len),
                        ):
                            self._finish_out_of_room(slot)
            active = np.array(
                [r is not None and i not in self.slot_prefill
                 for i, r in enumerate(self.slot_req)], bool
            )
            if not active.any():
                continue
            if self.spec_ngram and all(
                # EVERY row's verify writes clen..clen+k (masked rows write
                # garbage) — any row near max_len would clamp the update
                # start index and corrupt earlier KV, so the whole tick
                # falls back to plain decode
                int(self.slot_len[i]) + self.spec_k < self.max_len
                for i in range(self.max_batch)
            ):
                if self._spec_tick(active):
                    continue
                # no row drafted anything — plain fused tick instead
            # one decode tick across all slots (chunk of ≥1 fused steps)
            chunk = self.steps_per_tick
            if any(active[i] and r is not None and r.sampling.guided_choice
                   for i, r in enumerate(self.slot_req)):
                # guided masks change per emitted token (host trie walk)
                chunk = 1
            for slot, req in enumerate(self.slot_req):
                if not active[slot]:
                    # masked rows still WRITE at clen..clen+chunk-1: keep a
                    # mid-prefill slot's garbage inside the store
                    chunk = max(1, min(
                        chunk, self.max_len - int(self.slot_len[slot])
                    ))
                    continue
                room = self.max_len - int(self.slot_len[slot]) - 1
                budget = req.sampling.max_new_tokens - len(req.output_tokens)
                chunk = max(1, min(chunk, room, budget))
            self.key, k = jax.random.split(self.key)
            # ONE packed h2d for every small per-tick input (tokens, lens,
            # active, sampling/penalty/seed planes) — see _pack_tick_args
            buf, has_seeded = self._pack_tick_args(active)
            # vocab-sharded sampling path: exact for greedy/temperature rows
            # (top-k/top-p order statistics and penalties need the full
            # row → gathered path)
            sharded = self.mesh is not None and all(
                r is None or (r.sampling.top_k == 0
                              and r.sampling.top_p >= 1.0
                              and r.sampling.min_p == 0.0
                              and r.sampling.seed is None
                              and r.sampling.top_logprobs == 0
                              and not r.sampling.alters_logits)
                for r in self.slot_req
            )
            if chunk == 1 and sharded:
                next_tok, lp, self.caches = self._decode_sharded_packed(
                    self.params, buf, self.caches, k, self._tables_arg(),
                )
                chunk_np, lp_np = self._fetch_tok_lp(
                    next_tok[:, None], lp[:, None]
                )
                tops_np = None
            elif chunk == 1:
                next_tok, lp, self.caches, self.counts, tops = \
                    self._decode_one_packed(
                    self.params, buf, self.caches, k, self.counts,
                    self.rep_mask,
                    *self._bias_arrays(self.slot_req, self.max_batch),
                    self._tables_arg(),
                    self._allowed_arrays(self.slot_req, self.max_batch),
                    n_top=self._ntop(self.slot_req, self.max_batch),
                    has_seeded=has_seeded,
                )
                chunk_np, lp_np = self._fetch_tok_lp(
                    next_tok[:, None], lp[:, None]
                )
                tops_np = None if tops is None else (
                    np.asarray(tops[0])[:, None],
                    np.asarray(tops[1])[:, None],
                )
            elif sharded:  # top-N rows are excluded from this path
                toks, lps, self.caches = self._decode_multi_sharded_packed(
                    self.params, buf, self.caches, k, self._tables_arg(),
                    n_steps=chunk,
                )
                chunk_np, lp_np = self._fetch_tok_lp(toks, lps)
                tops_np = None
            else:
                toks, lps, self.caches, self.counts, tops = \
                    self._decode_multi_packed(
                        self.params, buf, self.caches, k, self.counts,
                        self.rep_mask,
                        *self._bias_arrays(self.slot_req, self.max_batch),
                        self._tables_arg(),
                        n_steps=chunk,
                        n_top=self._ntop(self.slot_req, self.max_batch),
                        has_seeded=has_seeded,
                    )
                chunk_np, lp_np = self._fetch_tok_lp(toks, lps)
                tops_np = None if tops is None else (np.asarray(tops[0]),
                                                     np.asarray(tops[1]))
            self.stats["decode_ticks"] += 1
            for slot, req in enumerate(self.slot_req):
                if req is None or not active[slot]:
                    continue
                for t in range(chunk):
                    if self.slot_req[slot] is None:
                        break  # finished mid-chunk (EOS) — drop overshoot
                    tok = int(chunk_np[slot, t])
                    req.output_tokens.append(tok)
                    req.token_logprobs.append(float(lp_np[slot, t]))
                    if tops_np is not None and req.sampling.top_logprobs:
                        req.top_logprobs.append(self._top_list(
                            req, tops_np[0][slot, t], tops_np[1][slot, t]
                        ))
                    self.slot_len[slot] += 1
                    self.slot_last_tok[slot] = tok
                    self._maybe_finish(slot)
                if self.paged:
                    self._register_blocks(slot)
                self._emit(req)
                self._release_if_cancelled(slot)
        return requests

    def _emit(self, req: Request) -> None:
        """Deliver not-yet-emitted surviving tokens (and completion) to the
        ``on_token`` hook; a token popped as EOS is never delivered.  If the
        hook cancels the request mid-emit (e.g. a stop string completed),
        tokens past the cancellation point are dropped — the request's
        output ends at the token the hook last saw."""
        while req._emitted < len(req.output_tokens):
            tok = req.output_tokens[req._emitted]
            req._emitted += 1
            self.stats["generated_tokens"] += 1
            if req.t_first_token is None:
                req.t_first_token = time.monotonic()
            if self.on_token is not None:
                self.on_token(req, tok)
            if req.cancelled:
                del req.output_tokens[req._emitted:]
                del req.token_logprobs[req._emitted:]
                del req.top_logprobs[req._emitted:]
                return

    def _free_slot(self, slot: int) -> None:
        """Release a finished request's slot.  With ``prefix_cache`` the
        slot's KV is preserved and its token content recorded: the cache
        holds exactly ``(prompt + appended)[:slot_len]`` (every appended
        token's KV is written when it becomes the next input; the final
        appended token's never is — hence slot_len lags appends by one),
        clamped below ``max_len - _free_margin`` so masked decode rows'
        garbage writes (at slot_len, +1, … per tick) stay past the
        preserved prefix and in-bounds."""
        req = self.slot_req[slot]
        req.t_done = time.monotonic()
        if req.t_first_token is None and req.output_tokens:
            # finished on its very first token (max_new_tokens=1, instant
            # EOS): the _emit that stamps t_first_token runs after this
            req.t_first_token = req.t_done
        if req.ttft is not None:
            self._latency.append((req.ttft, req.tpot))
            del self._latency[:-1000]  # bounded window
        if self.paged:
            # block-level: registered full blocks survive in the hash map
            # (prefix_cache) or everything returns to the pool; either way
            # the slot's table zeroes, so masked writes land in the null
            # block — no slot-level keep/margin bookkeeping
            self._register_blocks(slot)
            self.slot_len[slot] = 0
            self._release_blocks(slot)
        elif self.prefix_cache:
            seq = req.prompt_tokens + req.output_tokens
            keep = max(0, min(int(self.slot_len[slot]), len(seq),
                              self.max_len - self._free_margin))
            self.slot_tokens[slot] = seq[:keep]
            self.slot_len[slot] = keep
        else:
            self.slot_len[slot] = 0
        self.slot_req[slot] = None

    def _release_if_cancelled(self, slot: int) -> None:
        req = self.slot_req[slot]
        if req is not None and req.cancelled:
            req.done = True
            req.finish_reason = "stop"
            self._free_slot(slot)

    def _maybe_finish(self, slot: int) -> None:
        req = self.slot_req[slot]
        sp = req.sampling
        hit_stop = req.output_tokens and (
            (sp.eos_token_id is not None
             and req.output_tokens[-1] == sp.eos_token_id)
            or req.output_tokens[-1] in sp.stop_token_ids
        )
        # guided decoding: the output completed a candidate and no longer
        # candidate extends it — stop with the final token KEPT (unlike
        # EOS, the candidate's last token is part of the answer)
        guided_done = False
        if sp.guided_choice and req.output_tokens and not hit_stop:
            out = tuple(req.output_tokens)
            m = len(out)
            guided_done = any(tuple(c) == out for c in sp.guided_choice) \
                and not any(
                    len(c) > m and tuple(c[:m]) == out
                    for c in sp.guided_choice
                )
        out_of_room = (
            self.slot_len[slot] + 1 >= self.max_len
        )
        if hit_stop or guided_done or out_of_room \
                or len(req.output_tokens) >= sp.max_new_tokens:
            if hit_stop:
                req.output_tokens.pop()  # don't emit the EOS/stop token
                req.token_logprobs.pop()
                if req.top_logprobs:  # keep the same-length invariant
                    req.top_logprobs.pop()
            req.done = True
            req.finish_reason = (
                "stop" if hit_stop or guided_done else "length"
            )
            self._free_slot(slot)


def generate(
    params: Dict[str, Any],
    config: ModelConfig,
    prompts: List[List[int]],
    sampling: Optional[SamplingParams] = None,
    **engine_kw,
) -> List[List[int]]:
    """One-shot batch generation (the examples/test_model.py analogue)."""
    sampling = sampling or SamplingParams()
    eng = Engine(params, config, **engine_kw)
    reqs = [Request(prompt_tokens=p, sampling=sampling) for p in prompts]
    eng.run(reqs)
    return [r.output_tokens for r in reqs]
