"""Boundary semantics for q_containment_ppjoin (the prefix-filter
containment variant): the 900-per-mille threshold must be EXACT under
floored integer division, and the rarest-shingle prefix cut
(|A| - ceil(0.9|A|) + 1 probes) must not lose a pair sitting exactly
on the threshold — the worst case for the prefix property, where the
probe budget is smallest relative to the misses allowed."""

from __future__ import annotations

import duckdb

from flink_streaming_example_spark.plans.registry import all_specs
from tests.test_collocations_pctrank import _write_documents

_SPECS = all_specs()

# 14 distinct base words -> doc B has 12 word-trigram shingles.
_B_WORDS = [f"w{i:02d}" for i in range(14)]


def _crafted_texts() -> list[str]:
    return [
        " ".join(_B_WORDS),  # doc 0: the container B
        # doc 1: words b1..b11 + one foreign word -> 10 trigrams,
        # 9 of them in B: containment = 1000*9//10 = 900, EXACTLY at
        # the threshold -> must be emitted.  Prefix budget is the
        # minimum possible (10 - 9 + 1 = 2 probes).
        " ".join(_B_WORDS[:11] + ["zz1"]),
        # doc 2: words b1..b10 + one foreign word -> 9 trigrams, 8 in
        # B: containment = 1000*8//9 = 888 -> must NOT be emitted.
        " ".join(_B_WORDS[:10] + ["zz2"]),
        # doc 3: too short for any trigram (2 words) -> excluded from
        # the shingle universe entirely.
        "aa bb",
        # doc 4: unrelated filler so document frequencies are not all 1.
        " ".join(f"q{i}" for i in range(8)),
    ]


def test_ppjoin_exact_900pm_boundary(spark, tmp_path):
    _write_documents(_crafted_texts(), str(tmp_path))
    got = {
        (r["id_small"], r["id_big"], r["cont_pm"])
        for r in _SPECS["q_containment_ppjoin"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    # doc1 (10 shingles) against doc0 (12 shingles): exactly 900 pm,
    # included; doc2 at 888 pm excluded; nothing else qualifies.
    # Cross-check the full expectation against the registered oracle
    # on the same crafted parquet rather than trusting hand counts.
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(
            _SPECS["q_containment_ppjoin"].oracle
        ).fetchall()
    }
    assert (1, 0, 900) in want, "fixture drifted: boundary pair missing"
    assert got == want
    assert all(p[:2] != (2, 0) and p[:2] != (0, 2) for p in got), (
        "888 pm pair must be excluded by floored integer division"
    )


# ---------------------------------------------------------------------------
# Streaming twin (round 13): the incremental foreachBatch index merge
# must equal the batch key under EVERY batch slicing — in particular
# when a qualifying pair's members arrive in different batches, in
# either order (the two candidate legs of streaming/ppjoin.py).


def _merge_slices(spark, sf_dir, state_dir, slices):
    """Feed doc_id slices through ppjoin_merge_batch sequentially."""
    from flink_streaming_example_spark.sources.tables import load_table
    from flink_streaming_example_spark.streaming.ppjoin import (
        ppjoin_merge_batch,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for ids in slices:
        ppjoin_merge_batch(docs.filter(docs.doc_id.isin(list(ids))), state_dir)


def _batch_answer(spark, sf_dir):
    return {
        (r["id_small"], r["id_big"], r["cont_pm"])
        for r in _SPECS["q_containment_ppjoin"].fn(spark, sf_dir).collect()
    }


def test_streaming_ppjoin_slicings_match_batch(spark, tmp_path):
    """1-, 2- and 3-batch slicings over the crafted boundary corpus,
    including both arrival orders of the (container, contained) pair:
    container first (later small doc probes the index) and contained
    first (the STORED prefix must catch the container's postings)."""
    from flink_streaming_example_spark.streaming.ppjoin import (
        read_ppjoin_pairs,
    )

    fixture = tmp_path / "fx"
    fixture.mkdir()
    _write_documents(_crafted_texts(), str(fixture))
    want = _batch_answer(spark, str(fixture))
    assert (1, 0, 900) in want  # the pair the slicings must preserve
    slicings = [
        [[0, 1, 2, 3, 4]],  # single batch
        [[0, 2], [1, 3, 4]],  # container first, small doc later
        [[1, 3], [4], [0, 2]],  # small doc FIRST -> stored-prefix leg
    ]
    for i, slices in enumerate(slicings):
        state = tmp_path / f"state_{i}"
        _merge_slices(spark, str(fixture), str(state), slices)
        got = {
            (r["id_small"], r["id_big"], r["cont_pm"])
            for r in read_ppjoin_pairs(spark, str(state)).collect()
        }
        assert got == want, f"slicing {slices} diverged from batch key"


def test_streaming_ppjoin_replayed_batch_is_invisible(spark, tmp_path):
    """foreachBatch is at-least-once on crash replay: re-running a
    batch against already-appended state must not change the read
    view (read_ppjoin_pairs dedupes deterministic pair rows)."""
    from flink_streaming_example_spark.sources.tables import load_table
    from flink_streaming_example_spark.streaming.ppjoin import (
        ppjoin_merge_batch,
        read_ppjoin_pairs,
    )

    fixture = tmp_path / "fx"
    fixture.mkdir()
    _write_documents(_crafted_texts(), str(fixture))
    state = tmp_path / "state"
    docs = load_table(spark, str(fixture), "documents").select(
        "doc_id", "text"
    )
    first = docs.filter(docs.doc_id.isin([0, 2]))
    second = docs.filter(docs.doc_id.isin([1, 3, 4]))
    ppjoin_merge_batch(first, str(state))
    ppjoin_merge_batch(second, str(state))
    baseline = sorted(
        map(tuple, read_ppjoin_pairs(spark, str(state)).collect())
    )
    ppjoin_merge_batch(second, str(state))  # crash replay of batch 2
    replayed = sorted(
        map(tuple, read_ppjoin_pairs(spark, str(state)).collect())
    )
    assert replayed == baseline


def test_streaming_ppjoin_reads_each_state_table_once_per_batch(
    spark, tmp_path, monkeypatch
):
    """The merge builds each state table's frame exactly once per
    batch (the scan-discipline gate for the foreachBatch path — the
    run_to_memory streaming ratchet can't see inside foreachBatch):
    a fan-out regression re-reading postings per candidate leg would
    double this count."""
    from flink_streaming_example_spark.sources.tables import load_table
    from flink_streaming_example_spark.streaming import ppjoin as pp

    fixture = tmp_path / "fx"
    fixture.mkdir()
    _write_documents(_crafted_texts(), str(fixture))
    calls: list[str] = []
    real = pp._read_state

    def counting(spark_, state_dir, table, schema):
        calls.append(table)
        return real(spark_, state_dir, table, schema)

    monkeypatch.setattr(pp, "_read_state", counting)
    docs = load_table(spark, str(fixture), "documents").select(
        "doc_id", "text"
    )
    pp.ppjoin_merge_batch(docs.filter(docs.doc_id.isin([0, 2])), str(tmp_path / "s"))
    assert sorted(calls) == ["docs", "postings", "prefixes"], calls


def test_streaming_ppjoin_registered_with_batch_oracle():
    spec = _SPECS["q_streaming_ppjoin"]
    assert spec.oracle == _SPECS["q_containment_ppjoin"].oracle
    assert "streaming" in spec.tags
