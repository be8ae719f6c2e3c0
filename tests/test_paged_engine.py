"""Paged-KV engine mode: block-pool continuous batching must reproduce the
naive greedy stream through every scheduler combination, including under
pool-exhaustion preemption."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.serve.engine import Engine, Request, generate
from qqq_tpu.serve.sampling import SamplingParams

CFG = ModelConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)


def _naive_greedy(params, prompt, n_new):
    toks = list(prompt)
    for _ in range(n_new):
        logits, _ = forward(params, CFG, jnp.asarray([toks], jnp.int32))
        toks.append(int(jnp.argmax(logits[0, -1])))
    return toks[len(prompt):]


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def prompts(rng_module):
    return [
        [int(t) for t in rng_module.integers(0, 128, size=n)]
        for n in (6, 11, 3)
    ]


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(1234)


@pytest.fixture(scope="module")
def want(params, prompts):
    return [_naive_greedy(params, p, 8) for p in prompts]


@pytest.mark.parametrize("kw", [
    dict(),                                     # plain paged (chunked admit)
    dict(steps_per_tick=3),                     # fused multi-step decode
    dict(spec_ngram=2, spec_k=3),               # speculative decoding
    dict(prefix_cache=True),                    # slot-level prefix reuse
])
def test_paged_matches_naive_greedy(params, prompts, want, kw):
    outs = generate(
        params, CFG, prompts, SamplingParams(max_new_tokens=8),
        max_batch=4, max_len=64, kv_quantized=True, dtype=jnp.float32,
        paged=True, block_size=8, **kw,
    )
    assert outs == want, kw


def test_paged_preemption_exact(params, prompts, want):
    """A pool sized for ~1.5 requests forces recompute-preemption while 3
    requests run; the greedy streams must be IDENTICAL to the roomy pool
    (re-prefill rebuilds the same KV)."""
    eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=7)
    reqs = [Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=8))
            for p in prompts]
    eng.run(reqs)
    assert [r.output_tokens for r in reqs] == want
    assert eng.stats["preemptions"] > 0
    # every slot freed → all non-null blocks back in the pool
    assert eng.allocators[0].available == eng.num_blocks - 1


def test_paged_preemption_seeded_and_penalized(params, prompts):
    """Preemption must not disturb (a) seeded sampling — the noise is keyed
    on the generation index — or (b) penalty state, which is rebuilt from
    the resumed request's generated tokens."""
    sps = [
        SamplingParams(max_new_tokens=8, temperature=0.9, seed=7),
        SamplingParams(max_new_tokens=8, presence_penalty=0.8,
                       frequency_penalty=0.3),
        SamplingParams(max_new_tokens=8),
    ]

    def run(num_blocks):
        eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                     dtype=jnp.float32, paged=True, block_size=8,
                     num_blocks=num_blocks)
        reqs = [Request(prompt_tokens=p, sampling=sp)
                for p, sp in zip(prompts, sps)]
        eng.run(reqs)
        return [r.output_tokens for r in reqs], eng.stats["preemptions"]

    roomy, pre0 = run(num_blocks=1 + 4 * 8)
    tight, pre1 = run(num_blocks=7)
    assert pre0 == 0 and pre1 > 0
    assert tight == roomy


def test_paged_pool_too_small_rejects(params):
    """A request that cannot fit in the pool even alone is REJECTED at
    admission (finish_reason 'error'), not raised out of the shared loop —
    raising would kill the serving worker thread for every client."""
    eng = Engine(params, CFG, max_batch=2, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=3)
    bad = Request(prompt_tokens=list(range(1, 30)),
                  sampling=SamplingParams(max_new_tokens=4))
    ok = Request(prompt_tokens=[3, 5, 7],
                 sampling=SamplingParams(max_new_tokens=4))
    eng.run([bad, ok])  # must not raise; the roomy request still completes
    assert bad.done and bad.finish_reason == "error"
    assert not bad.output_tokens
    assert ok.done and ok.output_tokens == _naive_greedy(params, [3, 5, 7], 4)


def test_paged_preempt_mid_prefill(params, rng_module):
    """Pool pressure that preempts a slot which is itself MID-PREFILL must
    not crash the chunk-prefill loop (the evicted slot simply re-enters the
    queue) and every stream stays exact — the reviewer-reproduced
    AttributeError regression."""
    p1 = [int(t) for t in rng_module.integers(0, 128, size=9)]
    p2 = [int(t) for t in rng_module.integers(0, 128, size=9)]
    eng = Engine(params, CFG, max_batch=2, max_len=16, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=3)
    reqs = [Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=3))
            for p in (p1, p2)]
    eng.run(reqs)
    assert reqs[0].output_tokens == _naive_greedy(params, p1, 3)
    assert reqs[1].output_tokens == _naive_greedy(params, p2, 3)
    assert eng.stats["preemptions"] > 0


def test_paged_prefix_cache_reuses_blocks(params, rng_module):
    """Multi-turn traffic on one paged engine: the second request shares the
    first's prompt+output prefix, adopts its registered blocks, and only
    the tail prefills — outputs stay exact."""
    base = [int(t) for t in rng_module.integers(0, 128, size=16)]
    eng = Engine(params, CFG, max_batch=2, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8,
                 prefill_chunk=8, prefix_cache=True)
    r1 = Request(prompt_tokens=base, sampling=SamplingParams(max_new_tokens=4))
    eng.run([r1])
    follow = base + r1.output_tokens + [5, 9]
    r2 = Request(prompt_tokens=follow,
                 sampling=SamplingParams(max_new_tokens=4))
    eng.run([r2])
    assert eng.stats["prefix_hits"] >= 1
    assert eng.stats["prefix_tokens_reused"] > 0
    assert r2.output_tokens == _naive_greedy(params, follow, 4)


def test_paged_prefix_cross_request_dedup(params, rng_module):
    """Block-level prefix caching is CONTENT-hashed, not slot-bound: two
    different requests sharing a system-prompt prefix dedup their KV blocks
    — the second adopts the first's registered blocks even though it never
    saw that slot, and the shared blocks carry ONE refcount per owner."""
    system = [int(t) for t in rng_module.integers(0, 128, size=24)]
    p1 = system + [3, 7]
    p2 = system + [9, 11, 2]
    eng = Engine(params, CFG, max_batch=1, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8,
                 prefix_cache=True)
    r1 = Request(prompt_tokens=p1, sampling=SamplingParams(max_new_tokens=4))
    r2 = Request(prompt_tokens=p2, sampling=SamplingParams(max_new_tokens=4))
    eng.run([r1, r2])  # max_batch=1: r2 admits after r1 frees
    assert eng.stats["prefix_hits"] >= 1
    # 24 shared tokens = 3 whole blocks adopted by r2
    assert eng.stats["prefix_tokens_reused"] >= 24
    assert r1.output_tokens == _naive_greedy(params, p1, 4)
    assert r2.output_tokens == _naive_greedy(params, p2, 4)


def test_paged_prefix_eviction_under_pressure(params, rng_module):
    """Cached (rc==0) blocks are evicted LRU when the pool runs dry; live
    traffic keeps running exactly."""
    eng = Engine(params, CFG, max_batch=2, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=9,
                 prefix_cache=True)
    for i in range(4):  # each run leaves cached blocks behind
        p = [int(t) for t in rng_module.integers(0, 128, size=14)] + [i]
        r = Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=4))
        eng.run([r])
        assert r.output_tokens == _naive_greedy(params, p, 4)
    # pool of 8 usable blocks served 4 requests of ≥2 blocks each — only
    # eviction makes that possible
    assert len(eng._bh_lru[0]) <= 8


def test_paged_with_tp_mesh(params, prompts, want):
    """Paged pools compose with a TP mesh: kv heads shard across devices,
    block tables replicate, and the greedy stream matches single-device."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from qqq_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=2)
    outs = generate(
        params, CFG, prompts, SamplingParams(max_new_tokens=8),
        max_batch=4, max_len=64, kv_quantized=True, dtype=jnp.float32,
        paged=True, block_size=8, mesh=mesh,
    )
    assert outs == want


def test_paged_scheduler_fuzz(params):
    """Randomized soak on the paged engine with an UNDERSIZED pool: ragged
    prompts, staggered arrivals, mixed greedy/sampled rows, speculative
    decoding, block-level prefix cache — under live preemption and LRU
    eviction.  Every greedy request must still match naive greedy exactly."""
    rng = np.random.default_rng(99)
    eng = Engine(
        params, CFG, max_batch=3, max_len=64, kv_quantized=True,
        dtype=jnp.float32, paged=True, block_size=8, num_blocks=13,
        prefix_cache=True, spec_ngram=2, spec_k=3,
    )
    reqs = []
    for i in range(8):
        n = int(rng.integers(2, 30))
        prompt = [int(t) for t in rng.integers(0, 128, size=n)]
        greedy = bool(rng.integers(0, 2))
        sp = SamplingParams(
            max_new_tokens=int(rng.integers(1, 9)),
            temperature=0.0 if greedy else 0.8,
            top_k=0 if greedy else int(rng.integers(0, 12)),
        )
        reqs.append(Request(prompt_tokens=prompt, sampling=sp))

    feed = list(reqs[3:])

    def hook(req, tok):
        if feed and rng.integers(0, 3) == 0:
            eng.add_request(feed.pop(0))

    eng.on_token = hook
    eng.run(reqs[:3])
    while feed:
        eng.add_request(feed.pop(0))
    eng.run([])

    for r in reqs:
        assert r.done
        assert len(r.output_tokens) <= r.sampling.max_new_tokens
        assert len(r.token_logprobs) == len(r.output_tokens)
        if r.sampling.temperature == 0.0:
            want = _naive_greedy(
                params, r.prompt_tokens, r.sampling.max_new_tokens
            )
            assert r.output_tokens == want, (r.prompt_tokens, r.output_tokens)
        else:
            assert len(r.output_tokens) == r.sampling.max_new_tokens
    # bookkeeping invariants after the storm: every owner released, pool
    # consistent (free + cached-registered = usable)
    assert all(r is None for r in eng.slot_req)
    cached = len(eng._bh_lru[0])
    assert eng.allocators[0].available + cached == eng.num_blocks - 1
    assert all(v == 0 for v in eng._bh_ref[0].values())


def test_paged_pool_memory_is_smaller(params):
    """The point of paging: a 4-slot × 64-token engine with a 17-block pool
    allocates 17·8 = 136 KV token slots instead of 4·64 = 256."""
    eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=17)
    slots = eng.caches[0]["k"].shape[0] * eng.caches[0]["k"].shape[2]
    assert slots == 17 * 8 < 4 * 64


def test_paged_growth_exhaustion_finishes_length(params, rng_module):
    """A request whose generation outgrows the pool with nothing left to
    preempt or evict must finish with OpenAI reason "length", keeping the
    tokens generated so far — never raise out of Engine.run (which would
    kill the serving worker thread for every client)."""
    prompt = [int(t) for t in rng_module.integers(0, 128, size=4)]
    eng = Engine(params, CFG, max_batch=2, max_len=64, kv_quantized=False,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=3)
    req = Request(prompt_tokens=prompt,
                  sampling=SamplingParams(max_new_tokens=30))
    eng.run([req])  # must not raise
    assert req.done and req.finish_reason == "length"
    # it generated as far as the 2-usable-block pool allows (≥ 1 block past
    # the prompt) and the stream up to that point is exactly greedy
    assert 0 < len(req.output_tokens) < 30
    assert req.output_tokens == _naive_greedy(
        params, prompt, len(req.output_tokens)
    )
    # the slot released everything back to the pool
    assert eng.allocators[0].available == eng.num_blocks - 1
    assert all(r is None for r in eng.slot_req)


def test_paged_prefix_cache_eviction_after_preemption(params, rng_module):
    """Pool pressure with prefix_cache=True: a preempted victim's REGISTERED
    full blocks land on the rc==0 LRU, not the allocator — the growing slot
    must drain that LRU after each preemption instead of raising "nothing to
    preempt" while evictable blocks sit in the cache."""
    prompts = [
        [int(t) for t in rng_module.integers(0, 128, size=12)]
        for _ in range(2)
    ]
    eng = Engine(params, CFG, max_batch=2, max_len=64, kv_quantized=False,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=7,
                 prefix_cache=True)
    reqs = [Request(prompt_tokens=p,
                    sampling=SamplingParams(max_new_tokens=20))
            for p in prompts]
    eng.run(reqs)  # must not raise under pressure
    for r, p in zip(reqs, prompts):
        assert r.done
        # preempted-and-resumed or length-capped — either way the stream
        # is exactly the greedy prefix of the unconstrained run
        assert r.output_tokens == _naive_greedy(
            params, p, len(r.output_tokens)
        )
        if r.finish_reason != "length":
            assert len(r.output_tokens) == 20
    # pool bookkeeping consistent: free + rc0-cached = usable
    assert eng.allocators[0].available + len(eng._bh_lru[0]) == eng.num_blocks - 1


def test_paged_preemption_penalized_exact_vs_naive(params, rng_module):
    """Penalized greedy streams must survive preemption EXACTLY: the resume
    prefill's final chunk samples through the same penalty stack (generated
    counts + prompt repetition mask) as plain decode — verified against a
    naive host loop, not just tight-vs-roomy agreement."""
    from qqq_tpu.serve.sampling import apply_penalties

    sp = SamplingParams(max_new_tokens=10, presence_penalty=4.0,
                        frequency_penalty=0.7, repetition_penalty=1.5)

    def naive_penalized(prompt, n_new):
        toks = list(prompt)
        counts = np.zeros((1, CFG.vocab_size), np.int32)
        pmask = np.zeros((1, CFG.vocab_size), bool)
        pmask[0, prompt] = True
        out = []
        for _ in range(n_new):
            logits, _ = forward(params, CFG, jnp.asarray([toks], jnp.int32))
            penal = apply_penalties(
                logits[:, -1].astype(jnp.float32), jnp.asarray(counts),
                jnp.asarray(pmask),
                jnp.full((1,), sp.presence_penalty, jnp.float32),
                jnp.full((1,), sp.frequency_penalty, jnp.float32),
                jnp.full((1,), sp.repetition_penalty, jnp.float32),
            )
            t = int(jnp.argmax(penal[0]))
            counts[0, t] += 1
            out.append(t)
            toks.append(t)
        return out

    prompts = [
        [int(t) for t in rng_module.integers(0, 128, size=n)]
        for n in (9, 13)
    ]
    want = [naive_penalized(p, 10) for p in prompts]
    # 5 usable blocks vs 3+3 needed at full length → guaranteed preemption
    eng = Engine(params, CFG, max_batch=2, max_len=64, kv_quantized=False,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=6)
    reqs = [Request(prompt_tokens=p, sampling=sp) for p in prompts]
    eng.run(reqs)
    assert eng.stats["preemptions"] > 0, "pool not tight enough to preempt"
    for r, w in zip(reqs, want):
        assert r.output_tokens == w[: len(r.output_tokens)], (
            r.output_tokens, w
        )
        if r.finish_reason != "length":
            assert r.output_tokens == w


def test_paged_data_parallel_mesh(params, prompts, want):
    """Paged engine over a data=2 × model=2 mesh: per-data-shard pool
    slices (local-id tables, own null block + allocator), shard-grouped
    chunked prefill, batch-sharded decode — greedy streams must equal the
    naive single-device decode."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from qqq_tpu.parallel import make_mesh

    outs = generate(
        params, CFG, prompts, SamplingParams(max_new_tokens=8),
        max_batch=4, max_len=64, kv_quantized=True, dtype=jnp.float32,
        paged=True, block_size=8, mesh=make_mesh(data=2, model=2),
    )
    assert outs == want


def test_paged_data_parallel_preemption_exact(params, prompts, want):
    """data>1 paged preemption: each shard's pool is tight (per-shard
    num_blocks), victims are chosen within the needy slot's OWN shard, and
    the greedy streams still match the roomy single-device run."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from qqq_tpu.parallel import make_mesh

    eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8, num_blocks=7,
                 mesh=make_mesh(data=2, model=2))
    assert eng.dp == 2 and len(eng.allocators) == 2
    reqs = [Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=8))
            for p in prompts]
    eng.run(reqs)
    assert [r.output_tokens for r in reqs] == want


def test_paged_data_parallel_prefix_cache(params, prompts, want, rng_module):
    """Block-level prefix caching under data>1: shard-local hash maps —
    a repeated prompt admitted into the same shard reuses blocks; streams
    stay exact either way."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from qqq_tpu.parallel import make_mesh

    shared = [int(t) for t in rng_module.integers(0, 128, size=24)]
    tails = [[int(t) for t in rng_module.integers(0, 128, size=4)]
             for _ in range(3)]
    ps = [shared + t for t in tails]
    eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8,
                 prefix_cache=True, mesh=make_mesh(data=2, model=2))
    for p in ps:
        r = Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=6))
        eng.run([r])
        assert r.output_tokens == _naive_greedy(params, p, 6)
    assert eng.stats["prefix_hits"] >= 1


def test_paged_tp_sharded_sampling_fast_path(params, prompts, want):
    """Paged + TP now uses the vocab-sharded sampling fast path (block
    tables ride the sharded decode program; no per-step (B, V) logits
    all-gather).  Greedy streams must stay exact."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from qqq_tpu.parallel import make_mesh

    outs = generate(
        params, CFG, prompts, SamplingParams(max_new_tokens=8),
        max_batch=4, max_len=64, kv_quantized=True, dtype=jnp.float32,
        paged=True, block_size=8, mesh=make_mesh(data=1, model=2),
    )
    assert outs == want


def test_paged_prefill_batched_per_shard(params, prompts, want):
    """Chunked prefill batches up to ``prefill_batch`` mid-prefill slots
    into ONE (g, C) dispatch (previously one slot per data shard → fully
    serialized on dp=1).  Streams stay exact and the dispatch count drops
    to ~ceil(chunks/slot) instead of slots × chunks."""
    eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8,
                 prefill_batch=4)
    reqs = [Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=8))
            for p in prompts]
    eng.run(reqs)
    assert [r.output_tokens for r in reqs] == want
    # 3 prompts (6/11/3 toks, chunk = block_size-grid) advanced together:
    # every dispatch after the first admission round carries >1 slot
    assert eng.stats["prefill_dispatches"] < eng.stats["prefill_chunks"]


def test_paged_prefill_batch_one_still_exact(params, prompts, want):
    """prefill_batch=1 forces the old one-slot-per-dispatch schedule —
    the grouping must be a pure performance knob."""
    eng = Engine(params, CFG, max_batch=4, max_len=64, kv_quantized=True,
                 dtype=jnp.float32, paged=True, block_size=8,
                 prefill_batch=1)
    reqs = [Request(prompt_tokens=p, sampling=SamplingParams(max_new_tokens=8))
            for r, p in zip(range(len(prompts)), prompts)]
    eng.run(reqs)
    assert [r.output_tokens for r in reqs] == want
    assert eng.stats["prefill_dispatches"] == eng.stats["prefill_chunks"]


def test_paged_data_parallel_prefill_batched(params, prompts, want):
    """data=2 mesh + per-shard prefill grouping: rows [d*g, (d+1)*g) of the
    (dp*g, C) dispatch belong to shard d; streams stay exact."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from qqq_tpu.parallel import make_mesh

    outs = generate(
        params, CFG, prompts + [prompts[0]],
        SamplingParams(max_new_tokens=8),
        max_batch=4, max_len=64, kv_quantized=True, dtype=jnp.float32,
        paged=True, block_size=8, prefill_batch=2,
        mesh=make_mesh(data=2, model=1),
    )
    assert outs == want + [want[0]]


def test_paged_prefill_chunk_larger_than_block(params, prompts, want):
    """prefill_chunk is decoupled from block_size: a 16-token chunk spans
    two 8-token blocks per write (the TPU-tuned serving config is
    block 128 + chunk 512 — decode wants small blocks for fill fraction,
    prefill wants wide dispatches).  Streams must stay exact."""
    outs = generate(
        params, CFG, prompts, SamplingParams(max_new_tokens=8),
        max_batch=4, max_len=64, kv_quantized=True, dtype=jnp.float32,
        paged=True, block_size=8, prefill_chunk=16, prefill_batch=4,
    )
    assert outs == want
