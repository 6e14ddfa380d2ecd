"""The fused assign kernel (PIP + kNN + broadcast tile searchsorted lookup)
must produce exactly the same rows as the two-stage path (assign → with_aez
equi-join)."""

import pandas as pd

from aezspark import documents as docs_mod
from aezspark.joins import assign_points, tile_lookup_broadcast


def test_fused_kernel_matches_join_path(world):
    docs = world.documents()
    tiles = world.tiles()

    join_path = (docs_mod.with_aez(
        docs_mod.assign_documents(docs, world.bidx), tiles, world.fine)
        .select("doc_id", "span_idx", "feature_id", "country", "method", "aez_code")
        .toPandas().sort_values(["doc_id", "span_idx", "feature_id"])
        .reset_index(drop=True))

    tl = tile_lookup_broadcast(world.spark, tiles)
    pts = docs_mod.indexed_points(docs)
    fused = (assign_points(pts, world.bidx, tile_lookup=tl, fine=world.fine)
             .select("doc_id", "span_idx", "feature_id", "country", "method", "aez_code")
             .toPandas().sort_values(["doc_id", "span_idx", "feature_id"])
             .reset_index(drop=True))

    pd.testing.assert_frame_equal(fused, join_path, check_dtype=False)
