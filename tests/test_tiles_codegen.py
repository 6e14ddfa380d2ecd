"""Tile AEZ code: the nested-CASE last-writer-wins must (a) equal the
literal greatest(29 flags) form on the full input domain and (b) keep the
tile projection inside whole-stage codegen (VERDICT r1 item 3 — the
greatest() form overflowed Janino's 64 KB method limit and silently fell
back to interpreted eval)."""

import itertools

import pytest
from pyspark.sql import functions as F


def _greatest_form(lui, soili, p):
    """The original (reference-literal) formulation: 29 mutually exclusive
    flags, last-writer-wins = greatest matching index."""
    flags = []
    for use_i in (0, 3, 2, 1):
        u = lui == use_i
        flags.append(u & (soili == 1) & p['minimal'])
        flags.append(u & (soili == 2) & p['minimal'])
        flags.append(u & soili.isin(1, 2) & p['moderate'])
        flags.append(u & soili.isin(1, 2) & p['steep'])
        flags.append(u & (soili == 3) & p['minimal'])
        flags.append(u & (soili == 3) & p['moderate'])
        flags.append(u & (soili == 3) & p['steep'])
    flags.append(lui.isin(4, 7, 5) | (soili == 4))
    return F.greatest(*[F.when(flag, F.lit(n)) for n, flag in enumerate(flags, 1)])


def _nested_form(lui, soili, p):
    """The production formulation in tiles.tile_codes."""
    aez29 = lui.isin(4, 7, 5) | (soili == 4)
    group_base = (F.when(lui == 0, 0).when(lui == 3, 7)
                  .when(lui == 2, 14).when(lui == 1, 21))
    in_group = (
        F.when(soili.isin(1, 2),
               F.when(p['steep'], 4)
                .when(p['moderate'], 3)
                .when(p['minimal'], F.when(soili == 1, 1).otherwise(2)))
         .when(soili == 3,
               F.when(p['steep'], 7).when(p['moderate'], 6)
                .when(p['minimal'], 5)))
    return F.when(aez29, F.lit(29)).otherwise(group_base + in_group)


def test_nested_case_equals_greatest_on_full_domain(spark):
    # every combination of land-use idx, soil idx, and ALL 2^3 plurality
    # boolean combinations — slope_plurality's >=/> flags OVERLAP on ties,
    # so one-hot-only enumeration is not enough. 10 × 7 × 8 = 560 rows.
    rows = []
    for lui, soili, (p_mi, p_mo, p_st) in itertools.product(
            [None] + list(range(9)), [None] + list(range(1, 7)),
            itertools.product([False, True], repeat=3)):
        rows.append((lui, soili, p_mi, p_mo, p_st))
    df = spark.createDataFrame(
        rows, "lui INT, soili INT, p_mi BOOLEAN, p_mo BOOLEAN, p_st BOOLEAN")
    p = {'minimal': F.col("p_mi"), 'moderate': F.col("p_mo"), 'steep': F.col("p_st")}
    out = df.select(
        _greatest_form(F.col("lui"), F.col("soili"), p).alias("ref"),
        _nested_form(F.col("lui"), F.col("soili"), p).alias("got"))
    bad = out.filter(~(F.col("ref").eqNullSafe(F.col("got")))).count()
    assert bad == 0


def test_tile_pipeline_compiles_with_codegen_fallback_disabled(spark, world):
    """With spark.sql.codegen.fallback=false a Janino overflow raises instead
    of silently interpreting — the tile plan must run clean."""
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert world.tiles().count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
