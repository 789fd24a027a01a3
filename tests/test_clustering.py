"""Laws for the distributed k-means tier (llmops/clustering.py) and the
fourth-wave scalable-enumeration plan contract.

The fit is engineered to be bit-deterministic (decimal-exact centroid
sums, struct-min tie-breaks, RNG-free init) — so the laws are exact:
same output run to run, inertia monotone, and the whole fit equal to an
independent pure-numpy Lloyd replica.
"""

from __future__ import annotations

import math

import numpy as np

from console_etl_spark.llmops import clustering, pipeline
from console_etl_spark.session import load_table
from tests.conftest import SF_TEST


def _numpy_kmeans(ids, vecs, k, iters):
    """Independent Lloyd replica: same init (k smallest ids), same
    tie-break (lowest cluster id), empty clusters keep centroids."""
    order = np.argsort(ids, kind="stable")
    vecs = vecs[order]
    cents = vecs[:k].copy()
    for _ in range(iters):
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # argmin takes first (lowest id) on ties
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return np.array(sorted(ids)), d2.argmin(axis=1), d2.min(axis=1)


class TestKMeansLaws:
    def test_deterministic_across_runs(self, spark):
        a = clustering.cluster_kmeans_embeddings(spark, SF_TEST).toPandas()
        b = clustering.cluster_kmeans_embeddings(spark, SF_TEST).toPandas()
        assert a.equals(b)

    def test_inertia_monotone_nonincreasing(self, spark):
        emb = load_table(spark, SF_TEST, "embeddings")
        _, _, inertia = clustering.kmeans_fit(emb)
        assert len(inertia) == clustering.KM_ITERS
        for prev, cur in zip(inertia, inertia[1:]):
            assert cur <= prev * (1 + 1e-9), inertia

    def test_matches_numpy_replica(self, spark):
        emb = load_table(spark, SF_TEST, "embeddings").toPandas()
        ids = emb["vec_id"].to_numpy()
        vecs = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
        ref_ids, ref_assign, ref_d2 = _numpy_kmeans(
            ids, vecs, clustering.KM_K, clustering.KM_ITERS
        )
        got = (
            clustering.cluster_kmeans_embeddings(spark, SF_TEST)
            .toPandas()
            .sort_values("vec_id", ignore_index=True)
        )
        assert (got["vec_id"].to_numpy() == ref_ids).all()
        assert (got["cluster"].to_numpy() == ref_assign).all()
        for g, r in zip(got["dist"], ref_d2):
            assert math.isclose(g, r, rel_tol=1e-6, abs_tol=1e-6)

    def test_every_cluster_populated(self, spark):
        mix = clustering.cluster_kmeans_topic_mix(spark, SF_TEST).toPandas()
        assert set(mix["cluster"]) == set(range(clustering.KM_K))
        assert int(mix["n"].sum()) == 500


class TestGlobalEnumerate:
    def test_contiguous_and_deterministic(self, spark):
        out = pipeline.enumerate_docs_global(spark, SF_TEST).toPandas()
        n = len(out)
        assert sorted(out["global_idx"]) == list(range(n))
        srt = out.sort_values("global_idx", ignore_index=True)
        # index order IS (shuffle_key, doc_id) order
        keys = list(zip(srt["shuffle_key"], srt["doc_id"]))
        assert keys == sorted(keys)
        again = pipeline.enumerate_docs_global(spark, SF_TEST).toPandas()
        assert srt.equals(again.sort_values("global_idx", ignore_index=True))

    def test_no_single_partition_exchange(self, spark):
        from tests.test_plans import plan_of

        plan = plan_of(pipeline.enumerate_docs_global(spark, SF_TEST))
        assert "Exchange SinglePartition" not in plan, plan
