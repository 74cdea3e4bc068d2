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
