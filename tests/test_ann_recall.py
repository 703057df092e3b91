"""Recall contracts for the non-deterministic-oracle ANN variants
(VERDICT r2 Missing #4): ``ann_topk_ivf`` (KMeans cells) and
``ann_topk_lsh`` (random-hyperplane, OR-amplified) are engine-specific,
so instead of a DuckDB oracle they carry an explicit recall bound
against the brute-force baseline (p07's ``cosine_topk``) plus exactness
properties: candidates are a *filter* of the exact scoring (scores
match brute-force per id) and results are deterministic per seed.

Measured on sf0.01 embeddings (500 vecs, 64-dim, 20-query average):
IVF n_cells=8/n_probe=4 -> 0.79, n_probe=2 -> 0.51; LSH 3 planes x 6
tables -> 0.795, 4x4 -> 0.41.  Bounds below leave margin for the
query-sample change (10 queries here for CI time)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"
N_QUERIES = 10
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    from spear_spark.sources import load_table

    df = load_table(spark, SF_DIR, "embeddings").cache()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries(emb):
    return [
        (r.vec_id, list(r.embedding))
        for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
    ]


@pytest.fixture(scope="module")
def brute_topk(emb, queries):
    from spear_spark.operators import similarity

    out = {}
    for qid, qv in queries:
        rows = similarity.cosine_topk(
            emb, "embedding", "vec_id", qv, k=K, exclude_id=qid
        ).collect()
        out[qid] = {r.vec_id: r.cos_sim for r in rows}
    return out


def _avg_recall(results: dict, brute: dict) -> float:
    tot = 0.0
    for qid, ids in results.items():
        tot += len(set(ids) & set(brute[qid])) / K
    return tot / len(results)


class TestIvfRecall:
    def test_recall_bound_and_score_exactness(self, emb, queries, brute_topk):
        from spear_spark.operators import similarity

        got = {}
        for qid, qv in queries:
            rows = [
                r
                for r in similarity.ann_topk_ivf(
                    emb, "embedding", "vec_id", qv, k=K + 1, n_cells=8, n_probe=4, seed=11
                ).collect()
                if r.vec_id != qid
            ][:K]
            got[qid] = [r.vec_id for r in rows]
            # exactness: an ANN hit carries the same 6dp cosine as the
            # brute-force ranking — the approximation only FILTERS
            for r in rows:
                if r.vec_id in brute_topk[qid]:
                    assert r.cos_sim == brute_topk[qid][r.vec_id]
        recall = _avg_recall(got, brute_topk)
        assert recall >= 0.6, f"IVF recall {recall} below contract 0.6"

    def test_more_probes_do_not_lose_recall(self, emb, queries, brute_topk):
        """n_probe is the recall/cost knob: probing more cells can only
        widen the candidate set (same seed/cells)."""
        from spear_spark.operators import similarity

        qid, qv = queries[0]
        # k larger than the corpus so neither result is truncated —
        # the assertion is about candidate SETS, not top-k cutoffs
        r2 = {
            r.vec_id
            for r in similarity.ann_topk_ivf(
                emb, "embedding", "vec_id", qv, k=1000, n_cells=8, n_probe=2, seed=11
            ).collect()
        }
        r4 = {
            r.vec_id
            for r in similarity.ann_topk_ivf(
                emb, "embedding", "vec_id", qv, k=1000, n_cells=8, n_probe=4, seed=11
            ).collect()
        }
        assert r2 <= r4 and len(r4) > len(r2)


class TestLshRecall:
    def test_recall_bound_with_or_amplification(self, emb, queries, brute_topk):
        from spear_spark.operators import similarity

        got = {}
        for qid, qv in queries:
            rows = [
                r
                for r in similarity.ann_topk_lsh(
                    emb, "embedding", "vec_id", qv, k=K + 1,
                    n_planes=3, seed=7, n_tables=6,
                ).collect()
                if r.vec_id != qid
            ][:K]
            got[qid] = [r.vec_id for r in rows]
            for r in rows:
                if r.vec_id in brute_topk[qid]:
                    assert r.cos_sim == brute_topk[qid][r.vec_id]
        recall = _avg_recall(got, brute_topk)
        assert recall >= 0.6, f"LSH recall {recall} below contract 0.6"

    def test_deterministic_per_seed(self, emb, queries):
        from spear_spark.operators import similarity

        _, qv = queries[0]

        def run():
            return [
                (r.vec_id, r.cos_sim)
                for r in similarity.ann_topk_lsh(
                    emb, "embedding", "vec_id", qv, k=K, n_planes=4, seed=7, n_tables=4
                ).collect()
            ]

        assert run() == run()

    def test_more_tables_do_not_lose_candidates(self, emb, queries):
        """OR-amplification is monotone: adding tables only adds
        candidate buckets (seeds of the first L tables are a prefix)."""
        from spear_spark.operators import similarity

        _, qv = queries[0]

        def ids(n_tables):
            return {
                r.vec_id
                for r in similarity.ann_topk_lsh(
                    emb, "embedding", "vec_id", qv, k=500,
                    n_planes=4, seed=7, n_tables=n_tables,
                ).collect()
            }

        assert ids(1) <= ids(4)
