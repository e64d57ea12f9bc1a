"""Hot-cell subdivision on the ANN cell path (VERDICT r5 #3): a
clustered corpus whose vectors pile into ONE IVF cell must not build
an O(m²) Gram over the whole pile — the cell subdivides in-task into
~target-row sub-cells (deterministic sub-centroids, hash re-split
for degenerate near-identical blobs) and each sub-cell scores its
own members.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from selfhealingdatapipeline_gcp_spark.operators import dedup, similarity


def _clustered_corpus(spark, n: int, dim: int = 16):
    """n vectors, ~90% in one tight cluster (a hot cell by
    construction), 10% spread — deterministic per vec_id."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.RandomState(7)
            base = rng.randn(dim).astype("float64")
            rows = []
            for i in ids:
                r = np.random.RandomState(int(i))
                if i % 10 != 0:      # tight cluster around base
                    v = base + 0.01 * r.randn(dim)
                else:                # spread
                    v = r.randn(dim)
                rows.append(v.astype("float32"))
            yield pd.DataFrame({
                "vec_id": ids,
                "label": (ids % 3).astype("int32"),
                "embedding": rows})
    return spark.range(n).repartition(8).mapInPandas(
        gen, "vec_id long, label int, embedding array<float>")


def test_subdivide_balances_random_cell():
    rng = np.random.RandomState(3)
    m, target = 3000, 500
    ids = np.arange(m, dtype=np.int64)
    V = rng.randn(m, 16)
    nrm = np.sqrt((V * V).sum(axis=1))
    lab = similarity.subdivide_oversized_cell(ids, V, nrm, target)
    sizes = np.bincount(lab)
    sizes = sizes[sizes > 0]
    assert sizes.max() <= 3 * target
    assert len(sizes) >= m // (2 * target)
    # deterministic: identical labels on a second call
    lab2 = similarity.subdivide_oversized_cell(ids, V, nrm, target)
    assert (lab == lab2).all()


def test_subdivide_degenerate_identical_vectors_hash_splits():
    """Near-identical vectors tie every cosine — the whole cell lands
    on one sub-centroid; the hash re-split must still bound sub-cell
    size."""
    m, target = 4000, 500
    ids = np.arange(m, dtype=np.int64)
    V = np.tile(np.ones(16), (m, 1))
    nrm = np.sqrt((V * V).sum(axis=1))
    lab = similarity.subdivide_oversized_cell(ids, V, nrm, target)
    sizes = np.bincount(lab)
    sizes = sizes[sizes > 0]
    assert sizes.max() <= 3 * target


def test_knn_graph_hot_cell_subdivides_and_stays_exact_in_sub(spark):
    """A 5k corpus with ~4.5k vectors in one tight cluster: the hot
    cell subdivides (no raise, bounded memory) and every clustered
    vector still gets k high-cosine neighbors. Determinism: two runs
    produce identical edges."""
    emb = _clustered_corpus(spark, 5000).localCheckpoint(eager=True)
    out = similarity.knn_graph_cells(emb, k=3, n_centroids=8,
                                     target_cell_rows=500)
    rows = out.collect()
    by_src: dict[int, list] = {}
    for r in rows:
        by_src.setdefault(r.vec_id, []).append(r)
    # clustered vectors (id % 10 != 0) sit among thousands of
    # near-identical peers — their top-3 cosines must be ~1
    checked = 0
    for vid, nbrs in by_src.items():
        if vid % 10 != 0 and len(nbrs) == 3:
            assert min(n.cosine for n in nbrs) > 0.99
            checked += 1
    assert checked > 4000
    rows2 = similarity.knn_graph_cells(emb, k=3, n_centroids=8,
                                       target_cell_rows=500).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_dedup_embedding_hot_cell_subdivides_and_finds_pairs(spark):
    """Same corpus through the dedup cell path: subdivision keeps the
    run bounded and near-dup pairs (cosine ≥ 0.9) are still found
    inside sub-cells in volume."""
    emb = _clustered_corpus(spark, 5000).localCheckpoint(eager=True)
    pairs = dedup.dedup_embedding(emb, threshold=0.9, n_centroids=8,
                                  target_cell_rows=500)
    n_pairs = pairs.count()
    # each ~500-row sub-cell of the tight cluster is all-pairs dense:
    # hundreds of thousands of pairs survive even without cross-sub
    # pairs
    assert n_pairs > 100_000


def test_small_cells_unchanged_by_subdivision_path(spark):
    """Below 2·target nothing subdivides — the operator output on the
    real embeddings table is byte-identical to the pre-subdivision
    expectation pinned by the oracle gate (covered there); here:
    labels all-zero on an in-bounds cell."""
    rng = np.random.RandomState(1)
    ids = np.arange(100, dtype=np.int64)
    V = rng.randn(100, 8)
    nrm = np.sqrt((V * V).sum(axis=1))
    lab = similarity.subdivide_oversized_cell(ids, V, nrm, 500)
    assert (lab == 0).all()
