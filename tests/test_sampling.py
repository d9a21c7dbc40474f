"""Deterministic content-hash sampling (r7): reproducibility is the
contract — keep/drop is a pure function of (key, seed), pinned against a
hashlib replay of the engine-portable md5 grid."""

from __future__ import annotations

import hashlib

import pytest

from pyramidscheme_jl_spark.operators.sampling import (
    hash_sample,
    hash_split,
    stratified_sample,
)


def _py_hash(key, seed: int) -> int:
    """The exact python twin of _key_hash (the repo's md5-hex-15 grid)."""
    return int(hashlib.md5(f"{key}|{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, source string").cache()


def test_hash_sample_matches_python_twin(spark, docs):
    got = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id", seed=5).collect()}
    thr = int(0.3 * (1 << 60))
    expect = {i for i in range(2000) if _py_hash(i, 5) < thr}
    assert got == expect
    assert 0.2 < len(got) / 2000 < 0.4  # sanity on the rate itself


def test_hash_sample_nested_and_stable_under_repartition(spark, docs):
    s30 = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id").collect()}
    s60 = {r["doc_id"] for r in hash_sample(docs, 0.6, "doc_id").collect()}
    assert s30 < s60  # same seed: smaller fraction is a strict subset
    rep = {
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), 0.3, "doc_id").collect()
    }
    assert rep == s30  # partitioning is not part of the row's fate
    other = {r["doc_id"] for r in hash_sample(docs, 0.3, "doc_id", seed=99).collect()}
    assert other != s30  # seeds give independent samples


def test_hash_sample_edges(spark, docs):
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == 2000
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(docs, 1.5, "doc_id")


def test_stratified_sample(spark, docs):
    out = stratified_sample(
        docs, {"web": 0.2, "books": 1.0}, "source", "doc_id", seed=3
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # books kept wholesale; code absent (default_fraction=0); web ~20%
    assert len(by_src["books"]) == len([i for i in range(2000) if i % 3 == 1])
    assert "code" not in by_src
    thr = int(0.2 * (1 << 60))
    expect_web = {i for i in range(2000) if i % 3 == 0 and _py_hash(i, 3) < thr}
    assert by_src.get("web", set()) == expect_web


def test_hash_split_disjoint_complete_and_growth_stable(spark, docs):
    out = hash_split(docs, {"train": 0.8, "eval": 0.1, "test": 0.1}, "doc_id")
    rows = out.collect()
    assert len(rows) == 2000  # every row labeled exactly once
    counts = {}
    labels = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
        labels[r["doc_id"]] = r["split"]
    assert set(counts) == {"train", "eval", "test"}
    assert counts["train"] > counts["eval"] and counts["train"] > counts["test"]
    # growth stability: splitting HALF the corpus gives the same label to
    # every shared row (a grown corpus never migrates existing rows)
    half = hash_split(
        docs.where("doc_id < 1000"), {"train": 0.8, "eval": 0.1, "test": 0.1},
        "doc_id",
    ).collect()
    for r in half:
        assert labels[r["doc_id"]] == r["split"]
    with pytest.raises(ValueError, match="weights"):
        hash_split(docs, {}, "doc_id")
