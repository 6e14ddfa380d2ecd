"""Document-corpus path: span extraction, PIP+kNN assignment parity vs the
oracle, AEZ enrichment, and the span-sequence invariant (input_hint)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from aezspark import documents as docs_mod


@pytest.fixture(scope="module")
def docs(world):
    return world.documents()


@pytest.fixture(scope="module")
def assigned(world, docs):
    return docs_mod.assign_documents(docs, world.bidx).cache()


def test_geo_points_extraction(world, docs):
    pts = docs_mod.geo_points(docs)
    exp = world.expected("doc_assignment").select("doc_id", "span_idx").distinct()
    got = pts.select("doc_id", "span_idx")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_assignment_parity(world, assigned):
    exp = (world.expected("doc_assignment")
           .select("doc_id", "span_idx", "feature_id", "country", "method")
           .toPandas().sort_values(["doc_id", "span_idx", "feature_id"])
           .reset_index(drop=True))
    got = (assigned.select("doc_id", "span_idx", "feature_id", "country", "method")
           .toPandas().sort_values(["doc_id", "span_idx", "feature_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_aez_enrichment_parity(world, assigned):
    tiles = world.tiles()
    got = (docs_mod.with_aez(assigned, tiles, world.fine)
           .select("doc_id", "span_idx", "feature_id", "aez_code")
           .toPandas().sort_values(["doc_id", "span_idx", "feature_id"])
           .reset_index(drop=True))
    exp = (world.expected("doc_assignment")
           .select("doc_id", "span_idx", "feature_id", "aez_code")
           .toPandas().sort_values(["doc_id", "span_idx", "feature_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_span_invariant_and_enrichment(world, docs, assigned):
    enriched = docs_mod.enrich_documents(docs, assigned)
    assert enriched.count() == docs.count()
    assert docs_mod.span_invariant_violations(docs, enriched) == 0
    # every doc has >= 1 geo span (fixture guarantee) => zones never null
    assert enriched.filter(F.col("zones").isNull()).count() == 0


def test_span_invariant_detects_mutation(world, docs):
    mutated = docs.withColumn(
        "spans", F.expr("transform(spans, s -> named_struct("
                        "'kind', s.kind, 'text', upper(s.text), "
                        "'media_ref', s.media_ref, 'offset', s.offset))"))
    assert docs_mod.span_invariant_violations(docs, mutated) > 0


def test_doc_zone_counts(world, assigned):
    tiles = world.tiles()
    got = docs_mod.doc_zone_counts(docs_mod.with_aez(assigned, tiles, world.fine))
    exp_pd = (world.expected("doc_assignment").toPandas()
              [["country", "aez_code", "doc_id"]].drop_duplicates()
              .groupby(["country", "aez_code"]).size().reset_index(name="n_docs"))
    got_pd = got.toPandas().sort_values(["country", "aez_code"]).reset_index(drop=True)
    exp_pd = exp_pd.sort_values(["country", "aez_code"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_pd, exp_pd, check_dtype=False)
