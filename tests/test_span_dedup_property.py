"""Property-based test for the duplicated-span operator
(operators/dedup.py span_dup_fractions) against a pure-Python model:
random word documents over a tiny alphabet (so cross-doc span
collisions actually occur), plus the two boundary shapes — exact
copies (fraction 1.0) and short docs (< span width → zero spans)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_flink_streaming_pipeline_spark.operators.dedup import (
    _SPAN_W,
    span_dup_fractions,
)

_WORDS = ["a", "b", "c"]


def _reference(docs: list[str]) -> dict[int, tuple[int, int, float]]:
    span_sets = []
    for text in docs:
        ws = text.split(" ")
        spans = {
            " ".join(ws[i : i + _SPAN_W])
            for i in range(len(ws) - _SPAN_W + 1)
        }
        span_sets.append(spans)
    out = {}
    for i, spans in enumerate(span_sets):
        dup = sum(
            1
            for s in spans
            if any(s in other for j, other in enumerate(span_sets) if j != i)
        )
        frac = round(dup / len(spans), 6) if spans else 0.0
        out[i] = (len(spans), dup, frac)
    return out


def _run_spark(spark, docs: list[str]) -> dict[int, tuple[int, int, float]]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_spans, r.n_dup_spans, r.dup_span_frac)
        for r in span_dup_fractions(df).collect()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_span_fractions_match_reference(spark, docs):
    # empty text splits to [''] in both engines — a 1-word doc, fine
    assert _run_spark(spark, docs) == _reference(docs)


def test_exact_copy_has_fraction_one(spark):
    text = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    got = _run_spark(spark, [text, text, "x1 x2 x3"])
    assert got[0] == (3, 3, 1.0)  # 10 words -> 3 spans, all duplicated
    assert got[1] == (3, 3, 1.0)
    assert got[2] == (0, 0, 0.0)  # short doc: no spans at all


def test_span_scrub_removes_non_keeper_occurrences(spark):
    """Hand-built corpus: doc 0 and doc 1 share an exact 8-word run,
    doc 2 is unique. The scrub must keep doc 0 (keeper = min doc_id)
    intact, excise exactly the shared 8 words from doc 1, and leave
    doc 2 untouched; counts must reconcile with the clean text."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import span_scrub

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    rows = [
        (0, f"aa bb {shared} cc"),
        (1, f"xx yy {shared} zz qq"),
        (2, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_scrub(docs).collect()}

    assert out[0].n_removed == 0 and out[0].clean_text == rows[0][1]
    assert out[1].n_removed == 8
    assert out[1].clean_text == "xx yy zz qq"
    assert out[2].n_removed == 0 and out[2].clean_text == rows[2][1]
    for r in out.values():
        n_clean = len(r.clean_text.split(" ")) if r.clean_text else 0
        assert n_clean == r.n_words - r.n_removed


def test_span_scrub_overlapping_spans_union_of_positions(spark):
    """A 10-word run shared between two docs produces three
    overlapping duplicated 8-spans in the non-keeper; the scrub must
    remove the UNION of covered positions (all 10 words), not 3x8."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import span_scrub

    run = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(0, f"head {run}"), (1, f"{run} tail")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_scrub(docs).collect()}
    assert out[0].n_removed == 0
    assert out[1].n_removed == 10
    assert out[1].clean_text == "tail"


def _islands_reference(docs: list[str]) -> dict[int, tuple[int, int, int, int]]:
    """Pure-Python model of span_islands: hit windows where the span
    occurs in >= 2 DISTINCT docs, merged as overlapping-or-adjacent
    intervals."""
    span_docs: dict[str, set[int]] = {}
    words = [t.split(" ") for t in docs]
    for i, ws in enumerate(words):
        for j in range(len(ws) - _SPAN_W + 1):
            span_docs.setdefault(" ".join(ws[j : j + _SPAN_W]), set()).add(i)
    out = {}
    for i, ws in enumerate(words):
        hits = [
            (j + 1, j + _SPAN_W)
            for j in range(len(ws) - _SPAN_W + 1)
            if len(span_docs[" ".join(ws[j : j + _SPAN_W])]) >= 2
        ]
        regions: list[list[int]] = []
        for lo, hi in hits:  # hits already sorted by start
            if regions and lo <= regions[-1][1] + 1:
                regions[-1][1] = max(regions[-1][1], hi)
            else:
                regions.append([lo, hi])
        dup = sum(hi - lo + 1 for lo, hi in regions)
        mx = max((hi - lo + 1 for lo, hi in regions), default=0)
        out[i] = (len(ws), len(regions), dup, mx)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_span_islands_matches_model(spark, docs):
    from kafka_flink_streaming_pipeline_spark.operators.dedup import span_islands

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_regions, r.dup_words, r.max_region_words)
        for r in span_islands(df).collect()
    }
    assert got == _islands_reference(docs)


def _exactsubstr_reference(docs: list[str]) -> dict[int, tuple[int, int, str]]:
    """Pure-Python model of exactsubstr_scrub (Lee et al. policy):
    every occurrence of a >= 2-occurrence span except the global first
    (corpus order = (doc_id, start)) masks its positions; within-doc
    repeats count."""
    words = [t.split(" ") for t in docs]
    occs: dict[str, list[tuple[int, int]]] = {}
    for d, ws in enumerate(words):
        for j in range(len(ws) - _SPAN_W + 1):
            occs.setdefault(" ".join(ws[j : j + _SPAN_W]), []).append((d, j + 1))
    masked: dict[int, set[int]] = {d: set() for d in range(len(docs))}
    for span, lst in occs.items():
        if len(lst) >= 2:
            for d, s in sorted(lst)[1:]:
                masked[d].update(range(s, s + _SPAN_W))
    out = {}
    for d, ws in enumerate(words):
        kept = [w for i, w in enumerate(ws, start=1) if i not in masked[d]]
        out[d] = (len(ws), len(ws) - len(kept), " ".join(kept))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=18).map(" ".join),
        min_size=1,
        max_size=5,
    )
)
def test_exactsubstr_scrub_matches_model(spark, docs):
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        exactsubstr_scrub,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_words, r.n_removed, r.clean_text)
        for r in exactsubstr_scrub(df).collect()
    }
    assert got == _exactsubstr_reference(docs)


def test_exactsubstr_within_doc_repetition_is_scrubbed(spark):
    """The semantic daylight vs span_scrub: a document repeating ITSELF
    is deduplicated (the paper counts occurrences, not distinct docs) —
    30x 'lone' collapses to the first 8-window's words; and the keeper
    is the first OCCURRENCE, so a later doc sharing a run with an
    earlier doc keeps nothing, while span_scrub's doc-level keeper
    would exempt all of doc 0's copies."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import (
        exactsubstr_scrub,
        span_scrub,
    )

    boiler = " ".join(["lone"] * 30)
    run = " ".join(f"r{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(0, f"{run} mid {run}"), (1, boiler)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in exactsubstr_scrub(docs).collect()}
    # doc 0: second copy of the run masked; first copy + 'mid' survive
    assert got[0].n_removed == 12 and got[0].clean_text == f"{run} mid"
    # doc 1: all 23 windows are the same span; the masked occurrences
    # at starts 2..23 cover positions 2..30, so ONLY position 1
    # survives (the kept first occurrence loses its tail to the other
    # occurrences' masks — the documented overlap semantics)
    assert got[1].n_removed == 29
    assert got[1].clean_text == "lone"
    # span_scrub (distinct-docs >= 2) leaves both docs untouched
    old = {r.doc_id: r for r in span_scrub(docs).collect()}
    assert old[0].n_removed == 0 and old[1].n_removed == 0


def test_span_islands_planted_run_coalesces(spark):
    """A repeated run of L >= W words must surface as ONE region of
    exactly L words in BOTH docs (the overlapping hit windows merge),
    and two separated runs as two regions."""
    from kafka_flink_streaming_pipeline_spark.operators.dedup import span_islands

    run = " ".join(f"r{i}" for i in range(20))  # L=20 shared run
    run2 = " ".join(f"s{i}" for i in range(9))  # L=9 second shared run
    a = f"{run} ua1 ua2 ua3 ua4 ua5 ua6 ua7 ua8 ua9 {run2}"
    b = f"ub1 ub2 ub3 ub4 ub5 ub6 ub7 ub8 ub9 {run} zb1 zb2 zb3 zb4 zb5 zb6 zb7 zb8 zb9 {run2}"
    c = "lone " * 30  # no shared content
    df = spark.createDataFrame(
        [(0, a), (1, b), (2, c.strip())], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_regions, r.dup_words, r.max_region_words, r.dup_ppm)
        for r in span_islands(df).collect()
    }
    assert got[0] == (2, 29, 20, got[0][3])
    assert got[1] == (2, 29, 20, got[1][3])
    assert got[2] == (0, 0, 0, 0)
    assert got[0][3] == 29 * 1_000_000 // (20 + 9 + 9)
