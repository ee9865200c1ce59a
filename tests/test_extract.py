"""Unit tests for the extraction cascade — behavior-matched against the
reference semantics (letter_extract.py), including its edge cases.

The tests also run the *reference algorithm re-implemented in pure Python*
side-by-side on a corpus of tricky strings, so any divergence between the
Spark expressions and the Python regex semantics is caught exactly.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from lexam_data_pipeline_spark.functions.extract import (
    extract_letter,
    extract_score,
    format_choices,
    gold_to_letter,
    mcq_correct,
    strip_thinking,
    template_format,
)


# -- reference behavior, independently re-implemented (not imported) --------
def ref_extract_letter(text):
    if not text:
        return None
    m = re.search(r"###\s*([A-Z])\s*###", text)
    if m:
        return m.group(1)
    m = re.search(r"(?:answer|Answer)\s*(?:is|:)\s*\(?([A-Z])\)?", text)
    if m:
        return m.group(1)
    m = re.findall(r"(?:^|\s)\(?([A-Z])\)?[\.\s]*$", text, re.MULTILINE)
    if m:
        return m[-1]
    m = re.search(r"correct\s+(?:answer|option|choice)\s+is\s+\(?([A-Z])\)?", text, re.IGNORECASE)
    if m:
        return m.group(1).upper()
    return None


def ref_extract_score(text):
    if not text:
        return None
    m = re.search(r"\[\[(\d+\.?\d*)\]\]", text)
    if m:
        return max(0.0, min(1.0, float(m.group(1))))
    return None


CORPUS = [
    None,
    "",
    "### A ###",
    "###B###",
    "bla ### C### trailing",
    "The answer is B",
    "Answer: (C)",
    "answer is (D) because",
    "final line ends\nwith D.",
    "multi\nE\nlines\nF",
    "paren (G)",
    "the correct answer is (h)",
    "The CORRECT OPTION IS X obviously",
    "Answer:Z",
    "noise with no letter here",
    "lowercase only answer is x",
    "###A### but also Answer: B",
    "Answer is B\nbut line ends with C",
    "tab\tseparated D  ",
    "A",
    "ends with space A ",
    "Répondez: Ü non",
    "answer is 7",
]

SCORE_CORPUS = [
    None,
    "",
    "[[0.5]]",
    "Score: [[0.85]] good",
    "[[1.5]] clamps",
    "[[0]] zero",
    "[[12.]] trailing dot",
    "[[.5]] leading dot no digits",
    "no score",
    "[0.5] single brackets",
    "<think>[[0.9]]</think>[[0.3]]",
]


def test_extract_letter_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["i", "t"])
    got = {r.i: r.letter for r in df.select("i", extract_letter(F.col("t")).alias("letter")).collect()}
    for i, t in enumerate(CORPUS):
        assert got[i] == ref_extract_letter(t), f"case {i}: {t!r}: spark={got[i]} ref={ref_extract_letter(t)}"


def test_extract_score_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(SCORE_CORPUS)], ["i", "t"])
    got = {r.i: r.score for r in df.select("i", extract_score(F.col("t")).alias("score")).collect()}
    for i, t in enumerate(SCORE_CORPUS):
        assert got[i] == ref_extract_score(t), f"case {i}: {t!r}: spark={got[i]} ref={ref_extract_score(t)}"


def test_strip_thinking(spark):
    cases = [
        ("<think>reasoning</think>answer", "answer"),
        ("<think>multi\nline</think>  answer  ", "answer"),
        ("a<think>x</think>b<think>y</think>c", "abc"),
        ("no think block", "no think block"),
        ("<think>unclosed", "<think>unclosed"),
        (None, None),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)], ["i", "t"])
    got = {r.i: r.s for r in df.select("i", strip_thinking(F.col("t")).alias("s")).collect()}
    for i, (t, want) in enumerate(cases):
        assert got[i] == want, f"{t!r} -> {got[i]!r}, want {want!r}"


def test_gold_letter_and_correctness(spark):
    df = spark.createDataFrame(
        [(0, "A"), (1, "B"), (2, None), (25, "Z"), (3, "A")], ["gold", "letter"]
    )
    rows = df.select(
        gold_to_letter(F.col("gold")).alias("gl"),
        mcq_correct(F.col("letter"), F.col("gold")).alias("ok"),
    ).collect()
    assert [r.gl for r in rows] == ["A", "B", "C", "Z", "D"]
    assert [r.ok for r in rows] == [True, True, False, True, False]


def test_format_choices(spark):
    df = spark.createDataFrame([(["yes", "no", "maybe"],)], ["choices"])
    got = df.select(format_choices(F.col("choices")).alias("f")).first().f
    assert got == "A) yes\nB) no\nC) maybe"
    # 27+ choices capped at 26 like the reference letters string
    many = [[f"c{i}" for i in range(30)]]
    got = (
        spark.createDataFrame(many, "array<string>")
        .toDF("choices")
        .select(format_choices(F.col("choices")).alias("f"))
        .first()
        .f
    )
    assert got.count("\n") == 25 and got.endswith("Z) c25")


def test_template_format(spark):
    df = spark.createDataFrame([("Torts", "What is negligence?")], ["course", "q"])
    tpl = "Course: {course_name}\n\nQ: {question}\nAnswer:"
    out = df.select(
        template_format(tpl, {"course_name": F.col("course"), "question": F.col("q")}).alias("p")
    ).first().p
    assert out == "Course: Torts\n\nQ: What is negligence?\nAnswer:"
    with pytest.raises(KeyError):
        template_format("{missing}", {})
    # literal braces escape
    out2 = df.select(template_format("{{json}} {course_name}", {"course_name": F.col("course")}).alias("p")).first().p
    assert out2 == "{json} Torts"


def _adversarial_corpus(n: int = 300) -> list[str]:
    """Deterministic pseudo-random strings built from the fragments the
    cascade's four patterns react to — joins, prefixes, and suffixes
    chosen to create pattern collisions and near-misses."""
    import random

    rng = random.Random(0xC0FFEE)
    fragments = [
        "### A ###", "###B###", "### c ###", "answer is D", "Answer: E",
        "Answer is (F)", "answer: (g)", "the correct answer is H",
        "The CORRECT CHOICE IS (i)", "correct option is  J", "K",
        "(L)", "M.", "N ", "ends with O", "[[0.5]]", "[[2]]", "[[x]]",
        "<think>Z</think>", "no letters here", "1234", "Ü", "\tP\t",
        "Q.\n", "line\nR", "so the Answer isS", "answeris T",
        "### UV ###", "###W### ###X###", "(Y)Z",
    ]
    joiners = [" ", "\n", "", "\t", ".\n", " - ", "\n\n"]
    corpus = []
    for _ in range(n):
        k = rng.randint(1, 5)
        parts = [rng.choice(fragments) for _ in range(k)]
        corpus.append(rng.choice(joiners).join(parts) + rng.choice(["", " ", "\n", "."]))
    return corpus


def test_extract_cascade_adversarial(spark):
    """300 generated pattern-collision strings: the Spark expression
    cascade must agree with the reference semantics on every one."""
    corpus = _adversarial_corpus()
    df = spark.createDataFrame([(i, t) for i, t in enumerate(corpus)], ["i", "t"])
    got = {
        r.i: (r.letter, r.score)
        for r in df.select(
            "i",
            extract_letter(F.col("t")).alias("letter"),
            extract_score(F.col("t")).alias("score"),
        ).collect()
    }
    mismatches = []
    for i, t in enumerate(corpus):
        want = (ref_extract_letter(t), ref_extract_score(t))
        if got[i] != want:
            mismatches.append((t, got[i], want))
    assert not mismatches, mismatches[:5]


def test_word_count_hypothesis_parity(spark):
    """F2 property test: Spark word_count == Python len(s.split()) over
    hypothesis-generated text (whitespace zoo included)."""
    from hypothesis import given, settings, strategies as st

    from lexam_data_pipeline_spark.functions.text import word_count

    text = st.text(
        alphabet=st.sampled_from(list("ab XY\t\n\r\f\v.?!ü二")), max_size=40
    )

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(st.lists(text, min_size=1, max_size=80))
    def check(strings):
        df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], ["i", "t"])
        got = {r.i: r.wc for r in df.select("i", word_count("t").alias("wc")).collect()}
        for i, s in enumerate(strings):
            assert got[i] == len(s.split()), f"{s!r}: spark={got[i]} py={len(s.split())}"

    check()


def test_template_format_hypothesis_parity(spark):
    """template_format compiles to the same output str.format produces,
    over generated templates with escapes and repeated placeholders."""
    from hypothesis import given, settings, strategies as st

    fragment = st.sampled_from(
        ["txt ", "{a}", "{b}", "{{", "}}", "\n", ":", "{a}{b}", " {{a}} ", "."]
    )

    @settings(max_examples=3, deadline=None, derandomize=True)
    @given(st.lists(fragment, min_size=1, max_size=12), st.text(max_size=8), st.text(max_size=8))
    def check(parts, va, vb):
        template = "".join(parts)
        expected = template.format(a=va, b=vb)
        df = spark.createDataFrame([(va, vb)], ["ca", "cb"])
        got = df.select(
            template_format(template, {"a": F.col("ca"), "b": F.col("cb")}).alias("p")
        ).first().p
        assert got == expected, f"{template!r}: {got!r} != {expected!r}"

    check()


def test_gold_choice_and_score_status(spark):
    from lexam_data_pipeline_spark.functions.extract import gold_choice, score_status

    df = spark.createDataFrame(
        [(["a", "b", "c"], 1, 0.95), (["x"], 0, 0.65), (None, 2, 0.45),
         (["y"], None, 0.1), (["z"], 0, None)],
        "choices array<string>, gold int, score double",
    )
    rows = df.select(
        gold_choice(F.col("choices"), F.col("gold")).alias("gc"),
        score_status(F.col("score")).alias("st"),
    ).collect()
    assert [r["gc"] for r in rows] == ["b", "x", None, None, "z"]
    assert [r["st"] for r in rows] == ["excellent", "good", "partial", "poor", None]


def test_template_format_brace_regressions(spark):
    """Pinned hypothesis counterexample + escape zoo: the compiler must
    tokenize exactly like str.format's own parser."""
    df = spark.createDataFrame([("X", "Y")], ["ca", "cb"])
    cases = ["{a}}}", "{{{a}", "{{{{", "}}{a}{{", "{a}{b}{a}", "{{a}}", ""]
    for tpl in cases:
        expected = tpl.format(a="X", b="Y")
        got = df.select(
            template_format(tpl, {"a": F.col("ca"), "b": F.col("cb")}).alias("p")
        ).first().p
        assert got == expected, f"{tpl!r}: {got!r} != {expected!r}"
