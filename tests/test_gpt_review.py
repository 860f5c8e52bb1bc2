"""GPT-review harness with an injected fake judge (no openai needed)."""

import json

from handsonvlm_tpu.eval.gpt_review import (
    build_review_prompt,
    context_from_captions,
    parse_score,
    run_reviews,
    summarize_reviews,
)


def test_parse_score():
    assert parse_score("8, 6\nGood answer.") == [8.0, 6.0]
    assert parse_score("7 9") == [7.0, 9.0]
    assert parse_score("nonsense") == [-1, -1]


def test_context_and_prompt():
    caps = {"timestamps": [[0, 5], [5, 10]], "sentences": ["a.", "b."]}
    ctx = context_from_captions(caps)
    assert ctx == "<0> <5> a.\n<5> <10> b."
    prompt = build_review_prompt(ctx, "q?", "gt ans", "model ans", "rate both")
    assert "[Assistant 1]\ngt ans" in prompt and "[System]\nrate both" in prompt


def test_run_and_summarize_with_fake_judge(tmp_path):
    answers = [
        {"question_id": "abcdefghijk_q0", "prompt": "q?", "text_gnd": "g", "text_out": "o", "answer_id": 1},
        {"question_id": "abcdefghijk_q1", "prompt": "q2?", "text_gnd": "g2", "text_out": "o2", "answer_id": 2},
    ]
    contexts = {"v_abcdefghijk": {"timestamps": [[0, 2]], "sentences": ["x."]}}
    out = tmp_path / "reviews.jsonl"

    calls = []

    def fake_judge(system, user, max_tokens):
        calls.append(user)
        return "8, 6\nreasoning"

    results = run_reviews(answers, contexts, "rule", str(out), judge=fake_judge)
    assert len(results) == 2 and len(calls) == 2
    # resume: second call reviews nothing new
    results2 = run_reviews(answers, contexts, "rule", str(out), judge=fake_judge)
    assert len(results2) == 2 and len(calls) == 2

    summary = summarize_reviews(results)
    assert summary["n"] == 2
    assert summary["relative"] == 75.0  # 100 * 6/8
