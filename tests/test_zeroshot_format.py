"""Golden prompt-format fixtures for the zero-shot harness (VERDICT r3 #8).

lm_eval==0.4.2 (the library the reference's eval_model.py:100-116 runs) is
not installable here, so these fixtures pin the EXACT (context, continuation,
acc_norm length) rendering transcribed from the public lm_eval 0.4.2 task
definitions:

  piqa:        lm_eval/tasks/piqa/piqa.yaml
               doc_to_text "Question: {{goal}}\nAnswer:", choices [sol1,sol2]
  arc_*:       lm_eval/tasks/arc/arc_easy.yaml
               doc_to_text "Question: {{question}}\nAnswer:",
               choices {{choices.text}}, gold {{choices.label.index(answerKey)}}
  hellaswag:   lm_eval/tasks/hellaswag/{hellaswag.yaml,utils.py}
               query = preprocess(activity_label + ": " + ctx_a + " " +
               ctx_b.capitalize()); choices = map(preprocess, endings)
  winogrande:  lm_eval/tasks/winogrande/preprocess_winogrande.py
               multiple_input: choices ARE contexts (sentence[:idx] + option,
               verbatim splice), shared continuation " " + suffix.strip(),
               acc_norm length = len(context choice)

Every request carries the default target_delimiter " " on the continuation;
acc_norm divides by len(doc_to_choice[i]) WITHOUT the delimiter
(lm_eval/api/task.py ConfigurableTask.process_results).
"""

from qqq_tpu.cli.zeroshot import (
    FewshotSampler,
    doc_requests,
    example_text,
    hellaswag_preprocess,
)

# --- raw records shaped exactly like the HF datasets ------------------------

PIQA_DOC = {
    "goal": "How do I ready a guinea pig cage for it's new occupants?",
    "sol1": "Provide the guinea pig with a cage full of a few inches of "
            "bedding made of ripped paper strips, you will also need to "
            "supply it with a water bottle and a food dish.",
    "sol2": "Provide the guinea pig with a cage full of a few inches of "
            "bedding made of ripped jeans material, you will also need to "
            "supply it with a water bottle and a food dish.",
    "label": 0,
}

ARC_DOC = {
    "question": "Which factor will most likely cause a person to develop "
                "a fever?",
    "choices": {
        "text": [
            "a leg muscle relaxing after exercise",
            "a bacterial population in the bloodstream",
            "several viral particles on the skin",
            "carbohydrates being digested in the stomach",
        ],
        "label": ["A", "B", "C", "D"],
    },
    "answerKey": "B",
}

HELLASWAG_DOC = {
    "activity_label": "Removing ice from car",
    "ctx_a": "Then, the man writes over the snow covering the window of "
             "a car, and a woman wearing winter clothes smiles.",
    "ctx_b": "then",
    "endings": [
        ", the man adds wax to the windshield and cuts it.",
        ", a person board a ski lift, while two men supporting the head "
        "of the person wearing winter clothes snow as the we girls "
        "sled.",
        ", the man puts on a christmas coat, knitted with netting.",
        ", the man continues removing the snow on his car.",
    ],
    "label": "3",
}

WINOGRANDE_DOC = {
    "sentence": "John moved the couch from the garage to the backyard to "
                "create space. The _ is small.",
    "option1": "garage",
    "option2": "backyard",
    "answer": "1",
}


def test_piqa_format():
    ctxs, conts, gold, norms = doc_requests("piqa", PIQA_DOC)
    expected_ctx = (
        "Question: How do I ready a guinea pig cage for it's new "
        "occupants?\nAnswer:"
    )
    assert ctxs == [expected_ctx, expected_ctx]
    assert conts[0] == " " + PIQA_DOC["sol1"]
    assert conts[1] == " " + PIQA_DOC["sol2"]
    assert gold == 0
    # acc_norm length excludes the target delimiter
    assert norms == [len(PIQA_DOC["sol1"]), len(PIQA_DOC["sol2"])]


def test_arc_format():
    ctxs, conts, gold, norms = doc_requests("arc_easy", ARC_DOC)
    expected_ctx = (
        "Question: Which factor will most likely cause a person to "
        "develop a fever?\nAnswer:"
    )
    assert all(c == expected_ctx for c in ctxs)
    assert conts[1] == " a bacterial population in the bloodstream"
    assert gold == 1
    assert norms[0] == len("a leg muscle relaxing after exercise")
    # answerKey missing from labels → doc skipped (0.4.2 would raise)
    bad = {**ARC_DOC, "answerKey": "E"}
    assert doc_requests("arc_easy", bad) is None


def test_hellaswag_format():
    ctxs, conts, gold, norms = doc_requests("hellaswag", HELLASWAG_DOC)
    expected_query = (
        "Removing ice from car: Then, the man writes over the snow "
        "covering the window of a car, and a woman wearing winter "
        "clothes smiles. Then"
    )
    assert ctxs[0] == expected_query
    assert conts[3] == " , the man continues removing the snow on his car."
    assert gold == 3
    assert norms[3] == len(
        ", the man continues removing the snow on his car."
    )


def test_hellaswag_preprocess_rules():
    # bracket artifacts + [title] + double spaces, per the 0.4.2 utils.py
    # " [title]" → ". " leaves "A.  B"; the double-space collapse fixes it
    assert hellaswag_preprocess("A [title] B") == "A. B"
    assert hellaswag_preprocess("A [header] B") == "A B"
    assert hellaswag_preprocess("  x  y  ") == "x y"


def test_winogrande_format():
    ctxs, conts, gold, norms = doc_requests("winogrande", WINOGRANDE_DOC)
    # choices ARE the contexts: option spliced verbatim at "_" — the char
    # before "_" (a space) is preserved, NOT stripped-and-respaced
    assert ctxs[0] == (
        "John moved the couch from the garage to the backyard to create "
        "space. The garage"
    )
    assert ctxs[1] == (
        "John moved the couch from the garage to the backyard to create "
        "space. The backyard"
    )
    # shared continuation: delimiter + stripped suffix
    assert conts == [" is small.", " is small."]
    assert gold == 0
    # acc_norm normalizes by the CONTEXT choice lengths (multiple_input)
    assert norms == [len(ctxs[0]), len(ctxs[1])]


def test_winogrande_no_space_splice():
    """The verbatim splice differs from strip()+' ' when '_' is not
    space-separated — pin the lm_eval behavior, not the old one."""
    doc = {"sentence": "It was the_one.", "option1": "red",
           "option2": "blue", "answer": "2"}
    ctxs, conts, gold, _ = doc_requests("winogrande", doc)
    assert ctxs[0] == "It was thered"   # verbatim: no inserted space
    assert conts[0] == " one."          # suffix stripped behind delimiter
    assert gold == 1


def test_fewshot_example_rendering():
    # shot = doc_to_text + " " + gold target (winogrande: gold context +
    # " " + shared target), per the 0.4.2 sampler's get_context
    t = example_text("piqa", PIQA_DOC)
    assert t == (
        "Question: How do I ready a guinea pig cage for it's new "
        "occupants?\nAnswer: " + PIQA_DOC["sol1"]
    )
    t = example_text("winogrande", WINOGRANDE_DOC)
    assert t == (
        "John moved the couch from the garage to the backyard to create "
        "space. The garage is small."
    )


def test_fewshot_sampler_protocol():
    """One Random(1234), k+1 drawn per doc, eval doc dropped, first k kept,
    joined + terminated by \\n\\n — and the rng state evolves across docs."""
    import random

    train = [
        {"goal": f"q{i}", "sol1": f"a{i}", "sol2": f"b{i}", "label": 0}
        for i in range(10)
    ]
    s = FewshotSampler(train)
    ref = random.Random(1234)
    expected_first = [x for x in ref.sample(train, 3)][:2]
    ctx = s.context("piqa", 2)
    want = (
        "\n\n".join(example_text("piqa", e) for e in expected_first) + "\n\n"
    )
    assert ctx == want
    # second call continues the SAME rng stream (not reseeded)
    expected_second = [x for x in ref.sample(train, 3)][:2]
    assert s.context("piqa", 2) == (
        "\n\n".join(example_text("piqa", e) for e in expected_second) + "\n\n"
    )
    # the doc under evaluation is excluded if drawn
    s2 = FewshotSampler(train)
    ref2 = random.Random(1234)
    draw = ref2.sample(train, 3)
    kept = [x for x in draw if x != train[0]][:2]
    assert s2.context("piqa", 2, doc=train[0]) == (
        "\n\n".join(example_text("piqa", e) for e in kept) + "\n\n"
    )
