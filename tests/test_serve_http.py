"""HTTP serving front end (cli/serve.py): concurrent requests batch through
one shared Engine and greedy outputs match direct generation."""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qqq_tpu.cli.serve import make_server
from qqq_tpu.models import ModelConfig, forward, init_params
from qqq_tpu.serve.engine import Engine, generate
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


@pytest.fixture(autouse=True, scope="module")
def _no_persistent_compile_cache():
    """This module is the only one that jit-compiles on a NON-main thread
    (the EngineWorker loop).  Reading the persistent compilation cache from
    that thread late in a full-suite run segfaults inside
    jax._src.compilation_cache.get_executable_and_time (observed twice,
    deterministically, at test_openai_chat_n_choices; fine standalone).
    The models here are tiny — just compile without the disk cache."""
    old = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_compilation_cache_dir", old)


@pytest.fixture(scope="module")
def served():
    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    engine = Engine(
        params, CFG, max_batch=2, max_len=64, kv_quantized=False,
        dtype=jnp.float32, prefill_buckets=(16,),
    )
    server, worker = make_server(engine, port=0)  # OS-assigned port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, params
    server.shutdown()
    worker.stop()


def _post(base, payload, timeout=120):
    req = urllib.request.Request(
        base + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_health(served):
    base, _ = served
    with urllib.request.urlopen(base + "/health", timeout=30) as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"


def test_concurrent_generate_matches_direct(served, rng):
    base, params = served
    prompts = [
        [int(t) for t in rng.integers(0, 128, size=n)] for n in (7, 12, 3)
    ]
    want = generate(
        params, CFG, prompts, SamplingParams(max_new_tokens=5),
        max_batch=2, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )

    results = [None] * len(prompts)

    def go(i):
        results[i] = _post(
            base, {"prompt_tokens": prompts[i], "max_new_tokens": 5}
        )

    # 3 concurrent requests onto 2 slots: continuous admission over HTTP
    threads = [threading.Thread(target=go, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, res in enumerate(results):
        assert res is not None, f"request {i} never completed"
        assert res["num_generated"] == 5
        assert res["output_tokens"] == want[i], i


def test_sampled_request_shape(served, rng):
    base, _ = served
    res = _post(base, {
        "prompt_tokens": [int(t) for t in rng.integers(0, 128, size=4)],
        "max_new_tokens": 3, "temperature": 0.8, "top_k": 10,
    })
    assert res["num_generated"] == 3
    assert all(0 <= t < CFG.vocab_size for t in res["output_tokens"])


def test_bad_requests(served):
    base, _ = served
    for payload, want_err in [
        ({}, "need prompt"),
        ({"prompt_tokens": []}, "non-empty"),
        ({"prompt_tokens": list(range(999))}, "exceeds"),
        ({"prompt": "hi"}, "no tokenizer"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base, payload)
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert want_err in body["error"], body


def test_streaming_matches_non_streaming(served, rng):
    base, params = served
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    plain = _post(base, {"prompt_tokens": prompt, "max_new_tokens": 6})

    req = urllib.request.Request(
        base + "/generate",
        data=json.dumps({"prompt_tokens": prompt, "max_new_tokens": 6,
                         "stream": True}).encode(),
    )
    lines = []
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        for raw in r:  # urllib de-chunks
            raw = raw.strip()
            if raw:
                lines.append(json.loads(raw))
    assert lines[-1]["done"] is True
    streamed = [ln["token"] for ln in lines[:-1]]
    assert streamed == plain["output_tokens"]
    assert lines[-1]["output_tokens"] == plain["output_tokens"]


def test_stats_endpoint(served):
    base, _ = served
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        out = json.loads(r.read())
    assert out["prefills"] >= 1
    assert out["generated_tokens"] >= 1
    assert out["max_batch"] == 2


class _ToyTokenizer:
    """Token ids ↔ text for stop-string tests: token t decodes to ' t'."""

    eos_token_id = None

    def decode(self, toks):
        return "".join(f" {t}" for t in toks)

    def __call__(self, text):
        class R:
            input_ids = [int(t) for t in text.split()]
        return R()


@pytest.fixture(scope="module")
def served_tok():
    from qqq_tpu.cli.serve import make_server

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    engine = Engine(
        params, CFG, max_batch=2, max_len=64, kv_quantized=False,
        dtype=jnp.float32, prefill_buckets=(16,),
    )
    server, worker = make_server(engine, port=0, tokenizer=_ToyTokenizer())
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, params
    server.shutdown()
    worker.stop()


def test_logprobs_and_stop_token_ids_http(served_tok, rng):
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=8),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    res = _post(base, {
        "prompt_tokens": prompt, "max_new_tokens": 8, "logprobs": True,
        "stop_token_ids": [want[4]],
    })
    assert res["output_tokens"] == want[:4]
    assert len(res["token_logprobs"]) == 4
    assert all(lp <= 0.0 for lp in res["token_logprobs"])


def test_stop_string_truncates_text(served_tok, rng):
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=5)]
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=8),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    stop = f" {want[3]} "  # completes once the 5th token's space arrives
    res = _post(base, {
        "prompt_tokens": prompt, "max_new_tokens": 8, "stop": stop,
    })
    tk = _ToyTokenizer()
    full = tk.decode(want)
    assert res["text"] == full[: full.find(stop)]
    assert res["num_generated"] <= 5


def test_openai_completions_endpoint(served_tok, rng):
    """OpenAI /v1/completions: greedy (temperature=0) output matches direct
    generation; response carries OpenAI framing + usage accounting."""
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=5),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({
            "prompt": prompt, "max_tokens": 5, "temperature": 0.0,
            "logprobs": 1,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        res = json.loads(r.read())
    assert res["object"] == "text_completion"
    choice = res["choices"][0]
    assert choice["logprobs"]["tokens"] == want
    assert len(choice["logprobs"]["token_logprobs"]) == 5
    assert choice["finish_reason"] == "length"
    assert choice["text"] == _ToyTokenizer().decode(want)
    assert res["usage"] == {
        "prompt_tokens": 6, "completion_tokens": 5, "total_tokens": 11,
    }


def test_openai_models_and_sse_stream(served_tok, rng):
    base, params = served_tok
    with urllib.request.urlopen(base + "/v1/models", timeout=30) as r:
        models = json.loads(r.read())
    assert models["data"][0]["id"] == "qqq-tpu"

    prompt = [int(t) for t in rng.integers(0, 128, size=4)]
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=4),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({
            "prompt": prompt, "max_tokens": 4, "temperature": 0.0,
            "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    texts = [c["choices"][0]["text"] for c in chunks[:-1]]
    assert "".join(texts) == _ToyTokenizer().decode(want)
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


def _openai(base, path, body, timeout=120):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_openai_completions_n_and_best_of(served_tok, rng):
    """``n`` fans out into sibling requests (greedy ⇒ identical choices,
    indexes 0..n-1); ``best_of > n`` generates best_of candidates, returns
    the top n by mean logprob, and usage counts EVERY generated token;
    invalid combinations 400 (n > best_of, streaming with n > 1)."""
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=4),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    text = _ToyTokenizer().decode(want)

    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 4, "temperature": 0.0, "n": 2,
    })
    assert [c["index"] for c in res["choices"]] == [0, 1]
    assert all(c["text"] == text for c in res["choices"])
    assert res["usage"]["completion_tokens"] == 8  # both candidates

    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 4, "temperature": 0.0,
        "n": 1, "best_of": 3,
    })
    assert len(res["choices"]) == 1
    assert res["choices"][0]["text"] == text
    assert res["usage"]["completion_tokens"] == 12  # all 3 candidates

    for bad in (
        {"prompt": prompt, "n": 3, "best_of": 2},          # n > best_of
        {"prompt": prompt, "n": 2, "stream": True},        # stream fan-out
        {"prompt": prompt, "n": 0},                        # n < 1
    ):
        req = urllib.request.Request(
            base + "/v1/completions", data=json.dumps(bad).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400, bad


def test_openai_chat_n_choices(served_chat, rng):
    base, params = served_chat
    content = " ".join(str(int(t)) for t in rng.integers(4, 128, size=5))
    prompt = _ChatToyTokenizer().apply_chat_template(
        [{"role": "user", "content": content}]
    )
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=3),
        max_batch=2, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    res = _openai(base, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": content}],
        "max_tokens": 3, "temperature": 0.0, "n": 2,
    })
    assert [c["index"] for c in res["choices"]] == [0, 1]
    assert all(
        c["message"]["content"] == _ToyTokenizer().decode(want)
        for c in res["choices"]
    )


def test_top_logprobs_http(served_tok, rng):
    """OpenAI integer ``logprobs: N`` on completions returns top-N
    alternative dicts per generated token whose best entry matches the
    greedy token's own logprob; out-of-range N 400s."""
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 4, "temperature": 0.0,
        "logprobs": 3,
    })
    lp = res["choices"][0]["logprobs"]
    assert len(lp["top_logprobs"]) == 4
    for pos, chosen_lp, tok in zip(lp["top_logprobs"],
                                   lp["token_logprobs"], lp["tokens"]):
        assert len(pos) == 3
        # greedy: the chosen token IS the top-1 alternative
        best = max(pos.values())
        assert abs(best - chosen_lp) < 1e-5

    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": prompt, "logprobs": 99}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_guided_choice_http(served_tok, rng):
    """vLLM-style ``guided_choice`` over the wire: the output is exactly one
    of the candidate token sequences (finish_reason stop), an unconstrained
    sibling request is untouched, and bad entries 400."""
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    plain = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=5),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    # candidates chosen to NOT start with the free-running greedy token
    choices = [[plain[0] + 1 if plain[0] + 1 < 128 else 1, 7],
               [plain[0] + 2 if plain[0] + 2 < 128 else 2]]
    res = _post(base, {
        "prompt_tokens": prompt, "max_new_tokens": 8, "temperature": 0,
        "guided_choice": choices,
    })
    assert res["output_tokens"] in choices
    res2 = _post(base, {
        "prompt_tokens": prompt, "max_new_tokens": 5, "temperature": 0,
    })
    assert res2["output_tokens"] == plain  # batchmates unconstrained

    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({
            "prompt": prompt, "guided_choice": [[]],
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_openai_echo_and_prompt_scoring(served_tok, rng):
    """OpenAI ``echo``: the choice text starts with the decoded prompt, the
    logprobs block covers prompt ∪ completion with token_logprobs[0] null,
    the prompt scores equal a naive log_softmax forward, and echo +
    max_tokens=0 is the pure scoring call (0 completion tokens); plain
    max_tokens=0 returns an empty completion."""
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    logits, _ = forward(params, CFG, jnp.asarray([prompt], jnp.int32))
    lsm = np.asarray(jax.nn.log_softmax(
        np.asarray(logits[0], np.float32), axis=-1
    ))
    want_plp = [lsm[i - 1, prompt[i]] for i in range(1, len(prompt))]

    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 0, "echo": True, "logprobs": 1,
    })
    lp = res["choices"][0]["logprobs"]
    assert lp["tokens"] == prompt
    assert lp["token_logprobs"][0] is None
    np.testing.assert_allclose(lp["token_logprobs"][1:], want_plp,
                               rtol=1e-4, atol=1e-4)
    assert res["usage"]["completion_tokens"] == 0

    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 3, "temperature": 0.0,
        "echo": True, "logprobs": 1,
    })
    lp = res["choices"][0]["logprobs"]
    assert lp["tokens"][: len(prompt)] == prompt
    assert len(lp["tokens"]) == len(prompt) + 3
    assert len(lp["token_logprobs"]) == len(prompt) + 3
    assert res["choices"][0]["text"].startswith(
        _ToyTokenizer().decode(prompt)
    )

    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 0,
    })
    assert res["choices"][0]["text"] == ""
    assert res["usage"]["completion_tokens"] == 0


def test_logit_bias_http(served_tok, rng):
    """OpenAI ``logit_bias`` over the wire: −100 bans the greedy stream's
    first token on both /generate and /v1/completions; out-of-range values
    400."""
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=6)]
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=5),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    bias = {str(want[0]): -100}

    res = _post(base, {
        "prompt_tokens": prompt, "max_new_tokens": 5, "logit_bias": bias,
    })
    assert want[0] not in res["output_tokens"]
    assert res["output_tokens"] != want

    res = _openai(base, "/v1/completions", {
        "prompt": prompt, "max_tokens": 5, "temperature": 0.0,
        "logit_bias": bias, "logprobs": 1,
    })
    toks = res["choices"][0]["logprobs"]["tokens"]
    assert want[0] not in toks and toks != want

    for bad_bias in (
        {"5": -1000},        # value out of [-100, 100]
        {"99999": -100},     # token id past the vocab
        {"-1": -100},        # negative id would wrap in JAX indexing
    ):
        req = urllib.request.Request(
            base + "/v1/completions",
            data=json.dumps({
                "prompt": prompt, "logit_bias": bad_bias,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e2:
            urllib.request.urlopen(req, timeout=30)
        assert e2.value.code == 400, bad_bias
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({
            "prompt": prompt, "logit_bias": {"5": -1000},
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400


def test_latency_metrics_in_stats(served, rng):
    base, _ = served
    _post(base, {
        "prompt_tokens": [int(t) for t in rng.integers(0, 128, size=5)],
        "max_new_tokens": 4,
    })
    with urllib.request.urlopen(base + "/stats", timeout=30) as r:
        st = json.loads(r.read())
    assert st["requests"] >= 1
    assert st["ttft_p50_s"] is not None and st["ttft_p50_s"] > 0
    assert st["tpot_p50_s"] is not None and st["tpot_p50_s"] > 0


class _ChatToyTokenizer(_ToyTokenizer):
    """Adds a trivial chat template: roles become marker tokens."""

    def apply_chat_template(self, messages, add_generation_prompt=True):
        toks = []
        for m in messages:
            toks.append(1 if m["role"] == "user" else 2)
            toks.extend(int(t) for t in str(m["content"]).split())
        if add_generation_prompt:
            toks.append(3)
        return toks


@pytest.fixture(scope="module")
def served_chat():
    from qqq_tpu.cli.serve import make_server

    params = init_params(CFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    engine = Engine(
        params, CFG, max_batch=2, max_len=64, kv_quantized=False,
        dtype=jnp.float32, prefill_buckets=(16,),
    )
    server, worker = make_server(engine, port=0,
                                 tokenizer=_ChatToyTokenizer())
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, params
    server.shutdown()
    worker.stop()


def test_openai_chat_completions(served_chat, rng):
    base, params = served_chat
    content = " ".join(str(int(t)) for t in rng.integers(4, 128, size=6))
    prompt = _ChatToyTokenizer().apply_chat_template(
        [{"role": "user", "content": content}]
    )
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=5),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    req = urllib.request.Request(
        base + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": content}],
            "max_tokens": 5, "temperature": 0.0,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        res = json.loads(r.read())
    assert res["object"] == "chat.completion"
    msg = res["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert msg["content"] == _ToyTokenizer().decode(want)
    assert res["usage"]["prompt_tokens"] == len(prompt)


def test_openai_chat_stream(served_chat, rng):
    base, params = served_chat
    content = " ".join(str(int(t)) for t in rng.integers(4, 128, size=4))
    prompt = _ChatToyTokenizer().apply_chat_template(
        [{"role": "user", "content": content}]
    )
    want = generate(
        params, CFG, [prompt], SamplingParams(max_new_tokens=4),
        max_batch=1, max_len=64, kv_quantized=False, dtype=jnp.float32,
        prefill_buckets=(16,),
    )[0]
    req = urllib.request.Request(
        base + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": content}],
            "max_tokens": 4, "temperature": 0.0, "stream": True,
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(
        c["choices"][0]["delta"].get("content", "") for c in chunks
    )
    assert text == _ToyTokenizer().decode(want)
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


def test_param_validation_and_passthrough(served_tok, rng):
    base, params = served_tok
    prompt = [int(t) for t in rng.integers(0, 128, size=5)]

    # min_p out of range → 400, not a degenerate stream
    req = urllib.request.Request(
        base + "/v1/completions",
        data=json.dumps({"prompt": prompt, "min_p": 1.5}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400

    # explicit nulls mean defaults (OpenAI clients send them)
    res = _post(base, {
        "prompt_tokens": prompt, "max_new_tokens": 3,
        "temperature": None, "top_p": None, "seed": None,
        "presence_penalty": None,
    })
    assert res["num_generated"] == 3

    # seeded sampled request is reproducible over HTTP
    body = {"prompt_tokens": prompt, "max_new_tokens": 5,
            "temperature": 0.9, "seed": 42}
    assert _post(base, body) == _post(base, body)


def test_chat_accepts_noop_tools(served_chat, rng):
    base, _ = served_chat
    content = " ".join(str(int(t)) for t in rng.integers(4, 128, size=4))
    req = urllib.request.Request(
        base + "/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": content}],
            "max_tokens": 2, "temperature": 0.0,
            "tools": [], "tool_choice": "none",  # benign no-ops
        }).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        res = json.loads(r.read())
    assert res["choices"][0]["finish_reason"] == "length"
