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
