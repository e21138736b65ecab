

def test_connected_components_chain_olog_convergence(spark):
    """Pointer-jumping scale evidence (r3 verdict item 6): a path graph
    of diameter 1000 must converge within 11 iterations (~log2 d), i.e.
    the path-halving step is actually doing its O(log d) job — plain
    min-label propagation alone would need ~1000."""
    from pyspark.sql import functions as F

    from rtsa_spark.operators.dedup import connected_components

    n = 1001  # diameter 1000
    pairs = spark.range(n - 1).select(
        F.format_string("n%06d", "id").alias("doc_a"),
        F.format_string("n%06d", F.col("id") + 1).alias("doc_b"),
    )
    nodes = spark.range(n).select(
        F.format_string("n%06d", "id").alias("doc_id")
    )
    out = connected_components(pairs, nodes, max_iter=11)
    rows = out.collect()
    assert len(rows) == n
    assert {r["cluster_id"] for r in rows} == {"n000000"}  # one component,
    # canonically labeled by its minimum member
