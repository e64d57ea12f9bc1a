"""Hybrid driver-path vs distributed-path equivalence (r10 optimization).

Three bounded-small-state iterations gained a driver-side leg in the
optimization round: connected components (union-find below the edge
cap), BPE induction (incremental pair stats below the vocab cap), and
the covariance power iteration (exact integer recurrence below the
d² cap). Each test runs BOTH legs on the same input and pins
bit-identical results, so a future edit to either leg that diverges
fails by name; the cap-routing tests pin that the distributed leg
still engages past the cap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from selfhealingdatapipeline_gcp_spark import catalog
from selfhealingdatapipeline_gcp_spark.operators import (dedup, similarity,
                                                         textanalysis)
from conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _shape(df):
    return [(f.name, f.dataType) for f in df.schema.fields]


EDGES = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21),
         (5, 4), (4, 3), (100, 7), (7, 100)]


def test_component_labels_driver_matches_distributed(spark, monkeypatch):
    edges = spark.createDataFrame(EDGES, "doc_a bigint, doc_b bigint")
    drv = dedup.component_labels(edges)  # default cap: driver leg
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGE_CAP", "0")
    dist = dedup.component_labels(edges)
    assert _shape(drv) == _shape(dist)
    assert _rows(drv) == _rows(dist)
    # min-label semantics spot checks: chain 1-2-3-4-5 merges via (4,3)
    lbl = dict(_rows(drv))
    assert lbl[5] == 1 and lbl[12] == 10 and lbl[21] == 20
    assert lbl[100] == 7 and lbl[7] == 7  # duplicate edge both ways


def test_component_labels_cap_routes_to_distributed(spark, monkeypatch):
    edges = spark.createDataFrame(EDGES, "doc_a bigint, doc_b bigint")
    monkeypatch.setenv("SPARK_GRAFT_CC_DRIVER_EDGE_CAP", "1")
    dist = dedup.component_labels(edges)  # 10 edges > cap=1
    lbl = dict(_rows(dist))
    assert lbl[5] == 1 and lbl[12] == 10


def test_component_labels_empty_edges(spark):
    edges = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert _rows(dedup.component_labels(edges)) == []


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "lowering lowers the lowest low"),
    (4, "newer wider deeper the the the"),
    (5, "abab abab baba ab"),
]


def test_bpe_learn_driver_matches_distributed(spark, monkeypatch):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    st_d, m_d = textanalysis._bpe_learn(docs, 8)  # driver leg
    monkeypatch.setenv("SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP", "0")
    st_s, m_s = textanalysis._bpe_learn(docs, 8)
    assert m_d == m_s  # merge table: rounds, pairs, counts identical
    norm = lambda df: sorted(  # noqa: E731
        (r["w"], r["n"], tuple(r["syms"])) for r in df.collect())
    assert norm(st_d) == norm(st_s)


def test_bpe_vocab_cap_routes_to_distributed(spark, monkeypatch):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out_driver = _rows(textanalysis.bpe_vocab(docs, n_merges=4))
    monkeypatch.setenv("SPARK_GRAFT_BPE_DRIVER_VOCAB_CAP", "3")
    out_dist = _rows(textanalysis.bpe_vocab(docs, n_merges=4))
    assert out_driver == out_dist


def test_embedding_top_component_driver_matches_distributed(
        spark, monkeypatch):
    emb = catalog.load(spark, SF_SMOKE, "embeddings")
    drv = similarity.embedding_top_component(emb)
    monkeypatch.setenv("SPARK_GRAFT_TOPCOMP_DRIVER_CAP", "0")
    dist = similarity.embedding_top_component(emb)
    assert _shape(drv) == _shape(dist)
    # exact equality including every double: the driver leg mirrors
    # the Catalyst expressions op for op
    assert _rows(drv) == _rows(dist)
