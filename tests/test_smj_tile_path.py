"""with_aez(broadcast_tiles=False): the co-partitioned sort-merge path for
planet-scale tile dims must produce exactly the broadcast path's rows
(VERDICT r1 item 7)."""

from pyspark.sql import functions as F

from aezspark import documents as docs_mod


def _counts(df):
    return {(r.doc_id, r.span_idx, r.feature_id, r.aez_code): r.n
            for r in (df.groupBy("doc_id", "span_idx", "feature_id", "aez_code")
                      .agg(F.count("*").alias("n")).collect())}


def test_smj_path_matches_broadcast_path(spark, world):
    assigned = docs_mod.assign_documents(world.documents(), world.bidx).cache()
    tiles = world.tiles().cache()
    bc = docs_mod.with_aez(assigned, tiles, world.fine, broadcast_tiles=True)
    smj = docs_mod.with_aez(assigned, tiles, world.fine, broadcast_tiles=False)
    assert _counts(bc) == _counts(smj)
    assigned.unpersist()
    tiles.unpersist()


def test_smj_path_plan_has_no_broadcast_of_tiles(spark, world):
    """With auto-broadcast disabled the non-broadcast path must plan a
    shuffle join (SMJ/shuffled-hash), proving it does not depend on the tile
    dim fitting in memory."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assigned = docs_mod.assign_documents(world.documents(), world.bidx)
        smj = docs_mod.with_aez(assigned, world.tiles(), world.fine,
                                broadcast_tiles=False)
        plan = smj._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
