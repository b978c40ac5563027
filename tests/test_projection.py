"""random_projection (JL) and pca_fit/pca_project
(operators/similarity.py) — numpy differentials."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_core_spark.operators.base import OperatorConfigError, get_operator
from etl_core_spark.operators.similarity import (
    _seeded_planes,
    pca_fit,
    pca_project,
    random_projection,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _np_embeddings(emb):
    rows = emb.where(F.col("embedding").isNotNull()).select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    return ids, x


def test_random_projection_matches_numpy(spark, emb):
    out = random_projection(emb, "embedding", dim=64, out_dim=6, seed=11)
    got = {r.vec_id: list(r.proj) for r in out.select("vec_id", "proj").collect()}
    planes = np.array(_seeded_planes(64, 6, 11))
    ids, x = _np_embeddings(emb)
    want = np.floor((x @ planes.T) / np.sqrt(6.0) * 1e4) / 1e4
    exact = 0
    for i, vid in enumerate(ids):
        # numpy's pairwise/BLAS summation differs from Spark's
        # fold-left at ~1e-10, which can flip the final 4dp floor at
        # a quantization boundary — so the differential bound is one
        # quantization step, with the overwhelming majority required
        # to agree exactly
        assert got[vid] == pytest.approx(list(want[i]), abs=1.01e-4)
        exact += sum(a == b for a, b in zip(got[vid], want[i]))
    assert exact >= 0.99 * len(ids) * 6


def test_random_projection_preserves_norms_in_expectation(spark, emb):
    # JL property at the fleet level: mean squared norm of projections
    # ~ mean squared norm of inputs (loose 25% band; 64->16 dims)
    out = random_projection(emb, "embedding", dim=64, out_dim=16, seed=3)
    ids, x = _np_embeddings(emb)
    projs = np.array(
        [list(r.proj) for r in out.select("proj").collect()], dtype=np.float64
    )
    ratio = (projs ** 2).sum() / (x ** 2).sum()
    assert 0.75 < ratio < 1.25


def test_random_projection_validation():
    with pytest.raises(OperatorConfigError):
        random_projection(None, "v", dim=0, out_dim=4)
    with pytest.raises(OperatorConfigError):
        get_operator("random_projection")()  # missing dim


def test_pca_fit_matches_numpy(spark, emb):
    model = pca_fit(emb, "embedding", dim=64, k=5)
    ids, x = _np_embeddings(emb)
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:5]
    assert model["mean"] == pytest.approx(list(mean), abs=1e-9)
    for rank, idx in enumerate(order):
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        assert model["components"][rank] == pytest.approx(list(v), abs=1e-7)
        assert model["explained_variance"][rank] == pytest.approx(
            evals[idx], rel=1e-9
        )
    # variance sorted descending
    ev = model["explained_variance"]
    assert ev == sorted(ev, reverse=True)


def test_pca_project_matches_numpy(spark, emb):
    model = pca_fit(emb, "embedding", dim=64, k=3)
    out = pca_project(emb, model, "embedding")
    got = {r.vec_id: list(r.pc) for r in out.select("vec_id", "pc").collect()}
    ids, x = _np_embeddings(emb)
    comps = np.array(model["components"])
    mean = np.array(model["mean"])
    want = np.floor((x - mean) @ comps.T * 10000.0) / 10000.0
    exact = 0
    for i, vid in enumerate(ids):
        # same one-quantization-step bound as the JL test (summation-
        # order divergence at the 4dp boundary)
        assert got[vid] == pytest.approx(list(want[i]), abs=1.01e-4)
        exact += sum(a == b for a, b in zip(got[vid], want[i]))
    assert exact >= 0.99 * len(ids) * 3


def test_pca_uncentered_mode(spark, emb):
    model = pca_fit(emb, "embedding", dim=64, k=2, center=False)
    assert model["mean"] == [0.0] * 64
    ids, x = _np_embeddings(emb)
    gram = (x.T @ x) / (len(x) - 1)
    evals, _ = np.linalg.eigh(gram)
    assert model["explained_variance"][0] == pytest.approx(
        evals.max(), rel=1e-9
    )


def test_pca_validation(spark, emb):
    with pytest.raises(OperatorConfigError, match="0 < k <= dim"):
        pca_fit(emb, "embedding", dim=64, k=65)
    two = emb.limit(1)
    with pytest.raises(OperatorConfigError, match="at least 2"):
        pca_fit(two, "embedding", dim=64, k=2)


def test_pca_operator_roundtrip(spark, emb):
    op = get_operator("pca")(dim=64, k=2, vec_col="embedding")
    out = op.apply({"in": emb})["out"]
    assert "pc" in out.columns
    assert out.count() == emb.count()
    assert len(op.model["components"]) == 2
