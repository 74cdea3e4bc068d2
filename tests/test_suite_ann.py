"""Assembled bucketed ANN: recall vs the brute-force baseline.

The fixture embeddings are near-random — the WORST case for LSH — so
the configured 24 tables x 4 sign-bits is tuned for recall@10 >= 0.9
here; clustered real embeddings concentrate buckets and prune much
harder. The structural point is that candidate generation is a
(table, bucket) equi-join and the exact-cosine verify touches only
candidates — no crossJoin anywhere on the scale path."""


def test_ann_bucketed_recall(spark):
    from mias_spark.pipelines.suite import ann_bucketed_topk, ann_cosine_topk
    sf = "/root/testdata/sf0.001"
    truth = {(int(r["qid"]), int(r["vec_id"]))
             for r in ann_cosine_topk(spark, sf).collect()}
    got = {(int(r["qid"]), int(r["vec_id"]))
           for r in ann_bucketed_topk(spark, sf).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@10 {recall:.3f} < 0.9"


def test_ann_bucketed_no_cartesian(spark):
    """The physical plan must not contain a cartesian/nested-loop
    product — candidates come from the bucket equi-join."""
    from mias_spark.pipelines.suite import ann_bucketed_topk
    plan = ann_bucketed_topk(
        spark, "/root/testdata/sf0.001")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_ivf_lloyd_recall_on_clustered(spark, tmp_path):
    """Lloyd-refined IVF on CLUSTERED vectors (its design point): two
    refinement rounds must reach high recall@10 and not trail the
    sampled-centroid baseline. (The sf fixtures are near-uniform — the
    IVF worst case — so this test synthesizes a 16-cluster fixture.)"""
    import numpy as np
    import pandas as pd

    from mias_spark.pipelines.suite import _NQ, ann_ivf_lloyd, ann_ivf_topk

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(16, 64))
    assign = rng.integers(0, 16, size=500)
    vecs = centers[assign] + 0.15 * rng.normal(size=(500, 64))
    pdf = pd.DataFrame({
        "vec_id": np.arange(500, dtype=np.int64),
        "embedding": [v.astype(np.float32).tolist() for v in vecs],
    })
    spark.createDataFrame(pdf).write.parquet(
        str(tmp_path / "embeddings.parquet"))

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm[:_NQ] @ norm.T
    truth = {}
    for qi in range(_NQ):
        s = sims[qi].copy()
        s[qi] = -np.inf
        truth[qi] = set(np.argsort(-s)[:10])

    def recall(df):
        got = df.toPandas()
        hit = sum(len(set(got[got["qid"] == qi]["vec_id"]) & truth[qi])
                  for qi in range(_NQ))
        return hit / (10 * _NQ)

    r_lloyd = recall(ann_ivf_lloyd(spark, str(tmp_path)))
    r_base = recall(ann_ivf_topk(spark, str(tmp_path)))
    assert r_lloyd >= 0.9
    assert r_lloyd >= r_base
