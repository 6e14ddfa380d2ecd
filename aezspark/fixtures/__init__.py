"""Deterministic synthetic fixture world + numpy reference-oracle.

The reference validates itself against small checked-in rasters
(data/*/test_small.tif + 0.5° masks, test_extract_country_data.py:255-301) and
golden results/*.csv. GDAL can't run here, so we (a) synthesize an equivalent
tiny world deterministically (seed=42) and (b) re-implement the reference's
exact pipeline semantics in numpy as the oracle the Spark engine must match
row-for-row (SURVEY.md §5).
"""
