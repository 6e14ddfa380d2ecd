"""Benchmark harness — prints ONE JSON line per the driver contract.

Headline queries: the flagship documents/sec spatial-join+tile pipeline
(BASELINE.json metric) over a deterministically generated interleaved corpus,
the AEZ allocation + tile classification at a 0.5° bench world, and
representative relational + corpus-op queries at $SPARK_GRAFT_SF_DIR.

Env knobs:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32 (→ master local[N], shuffle partitions N)
  BENCH_ONLY           comma-separated query subset (used by BENCH/scaling.py)
  BENCH_DOCS           flagship corpus size (default 200000)
  AEZSPARK_PREV_CONTROL    0 disables the prev-commit control (default on)
  AEZSPARK_CONTROL_QUERIES control subset (default 4 headline queries)
  AEZSPARK_CONTROL_SAMPLES prev/head control pairs (default 2)

Same-window prev-commit control: BENCH_rN.json files are recorded in
different ten-minute windows on a shared host whose throughput drifts ~2×
between windows, so round-over-round comparisons of the raw numbers are
meaningless (the round-3 record looked 1.47× slower than round 2 purely from
drift). This harness therefore interleaves, in THIS run's window, the same
subset of queries against the previous round's commit (checked out into a
git worktree) and reports the head/prev ratio in
extras.prev_commit_control — the number a reviewer should read for
round-over-round deltas. The head-side samples straddle the prev-side run
(in-process run before, subprocess after), balancing linear drift.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def bench_fx_dir(n_docs: int) -> str:
    # size-keyed dir: switching corpus size must not clobber (and force a
    # 30-minute regeneration of) a previously generated corpus
    return f"/root/repo/build/fixtures/bench_{n_docs}"


def _tiles_cache(spark, w):
    """The tiles table is a build-once static index (the reference's
    results/AEZ.tif analog); materialize it next to the bench fixtures and
    reuse across runs/corpora."""
    import os

    path = os.path.join(w.fx_dir, "tiles_cache.parquet")
    if not os.path.isdir(path):
        w.tiles().write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


_WORLD_CACHE: dict = {}


def _flagship(spark, n_docs: int):
    """documents/sec pipeline: interleaved docs → geo spans → cell index →
    broadcast PIP (+kNN) → AEZ tile enrichment → zonal doc counts."""
    from pyspark.sql import functions as F

    from aezspark import documents as docs_mod
    from aezspark.pipelines import World
    from aezspark.fixtures.generate import ensure_fixtures

    fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5, n_docs=n_docs,
                         with_expected=False)
    from aezspark.joins import assign_points, tile_lookup_broadcast

    if id(spark) not in _WORLD_CACHE:
        w = World(spark, fx)
        tl = tile_lookup_broadcast(spark, _tiles_cache(spark, w))
        _WORLD_CACHE[id(spark)] = (w, tl)
    w, tl = _WORLD_CACHE[id(spark)]
    docs = w.documents()
    # fully-fused kernel path: PIP + kNN + tile lookup + partition-local
    # distinct-doc dedup + partial zonal count in ONE Arrow pass — match rows
    # never leave the kernel; the single shuffle carries only the
    # per-partition (country, aez, n) partials (round 2's 20M-row distinct
    # shuffle AND round 3's interim second kernel pass are both gone)
    out = docs_mod.assign_zone_counts(docs, w.bidx, tl, w.fine)
    return out.agg(F.sum("n_docs")).collect()[0][0]


def ensure_bucketed_tiles(spark, n_docs: int) -> str:
    """Build-once static index for the SMJ path: the non-blank tile dim as a
    parquet table bucketed+sorted on the join key (the analog of writing
    results/AEZ.tif once). Untimed setup — the catalog is in-memory, so each
    session re-registers it, but the overwrite is cheap at bench scale."""
    from pyspark.sql import functions as F

    from aezspark.fixtures.generate import ensure_fixtures

    table = f"bench_tiles_bucketed_{n_docs}"
    if not spark.catalog.tableExists(table):
        # the catalog is session-scoped but the warehouse dir persists:
        # clear a stale location left by a previous session
        import shutil
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(os.path.join(warehouse, table), ignore_errors=True)
        fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5,
                             n_docs=n_docs, with_expected=False)
        w = _bench_world(spark, fx)
        (_tiles_cache(spark, w)
         .filter(F.col("aez_code") != 255)
         .select(F.col("cell_id").alias("fine_cell_id"), "aez_code")
         .write.bucketBy(32, "fine_cell_id").sortBy("fine_cell_id")
         .mode("overwrite").format("parquet").saveAsTable(table))
    return table


def ensure_tiles_sink(spark, n_docs: int) -> str:
    """Build-once clustered tile sink (io.write_tiles layout: one cell-sorted
    file per tile_id partition) for the shard-lookup flagship variant —
    untimed static-index setup, same terms as the broadcast/SMJ paths."""
    from aezspark.fixtures.generate import ensure_fixtures
    from aezspark.io import write_tiles

    fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5, n_docs=n_docs,
                         with_expected=False)
    path = os.path.join(fx, "tiles_sink")
    if not os.path.isdir(path):
        w = _bench_world(spark, fx)
        write_tiles(_tiles_cache(spark, w), path)
    return path


def _flagship_shard(spark, n_docs: int):
    """The flagship fused pipeline with the SHARD-MANIFEST tile lookup
    (VERDICT r5 #1): same fused emit='zone_counts' kernel, but the kernel
    loads only the tile shards its points touch via the clustered-sink
    manifest + a worker LRU — no driver-collected tile broadcast, so the
    fast fused path survives the real 300 m grid where the broadcast dim
    is tens of GB. Should sit within the A/A band of flagship_docs."""
    from pyspark.sql import functions as F

    from aezspark import documents as docs_mod
    from aezspark.fixtures.generate import ensure_fixtures
    from aezspark.joins import tile_shard_lookup

    fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5, n_docs=n_docs,
                         with_expected=False)
    w = _bench_world(spark, fx)
    key = ("shard_lookup", id(spark))
    if key not in _WORLD_CACHE:
        _WORLD_CACHE[key] = tile_shard_lookup(
            spark, ensure_tiles_sink(spark, n_docs), w.fine)
    sl = _WORLD_CACHE[key]
    out = docs_mod.assign_zone_counts(w.documents(), w.bidx, sl, w.fine)
    return out.agg(F.sum("n_docs")).collect()[0][0]


def _flagship_smj(spark, n_docs: int):
    """The flagship pipeline via the NON-broadcast tile path: tiles stored as
    a bucketed table on the join key, points shuffled to it (co-partitioned
    sort-merge join, no Exchange on the tile side). This is the plan shape
    for planet-scale tile dims (~2.5e9 land cells at 300 m) that cannot ship
    as a broadcast; the broadcast↔SMJ crossover is documented in
    BENCH/BASELINE.md."""
    from pyspark.sql import functions as F

    from aezspark import documents as docs_mod
    from aezspark.fixtures.generate import ensure_fixtures

    fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5, n_docs=n_docs,
                         with_expected=False)
    # static-index setup (World build + bucketed table) is shared/untimed —
    # the same terms as the broadcast path, whose World rides _WORLD_CACHE
    w = _bench_world(spark, fx)
    table = ensure_bucketed_tiles(spark, n_docs)
    tiles = (spark.table(table)
             .select(F.col("fine_cell_id").alias("cell_id"), "aez_code"))
    assigned = docs_mod.assign_documents(w.documents(), w.bidx)
    enriched = docs_mod.with_aez(assigned, tiles, w.fine, broadcast_tiles=False)
    out = docs_mod.doc_zone_counts(enriched)
    return out.agg(F.sum("n_docs")).collect()[0][0]


def _flagship_stages(spark, n_docs: int) -> dict:
    """Per-stage wall breakdown of the flagship (BENCH_STAGES=1): each prefix
    of the pipeline is executed as its own action, so stage cost = delta.
    Re-executing the prefix means later deltas exclude nothing — deltas are
    upper bounds on the added stage's cost, the honest decomposition without
    caching intermediates (which would change the measured plan). Deltas are
    clamped at 0: with a warm page cache / JIT the re-run prefix is usually
    FASTER than its first measurement, so a raw delta can go negative under
    noise — the clamp plus this note replaces pretending the bound is tight."""
    from pyspark.sql import functions as F

    from aezspark import documents as docs_mod
    from aezspark.joins import assign_points

    w, tl = _WORLD_CACHE[id(spark)]
    docs = w.documents()
    out = {}
    t0 = time.monotonic()
    pts = docs_mod.geo_key_points(docs)
    pts.count()
    t1 = time.monotonic()
    out["scan_parse_index_s"] = round(t1 - t0, 2)
    partials = assign_points(
        pts, w.bidx, tile_lookup=tl, fine=w.fine, project=["doc_key"],
        emit="zone_counts", doc_col="doc_key")
    partials.count()
    t2 = time.monotonic()
    out["pip_knn_tile_kernel_s"] = round(max((t2 - t1) - (t1 - t0), 0.0), 2)
    (docs_mod.assign_zone_counts(docs, w.bidx, tl, w.fine)
     .agg(F.sum("n_docs")).collect())
    t3 = time.monotonic()
    out["distinct_zonal_agg_s"] = round(max((t3 - t2) - (t2 - t1), 0.0), 2)
    out["full_pipeline_s"] = round(t3 - t2, 2)
    return out


def _table_scan_planning(spark, n_docs: int, n_commits: int = 128) -> dict:
    """U21 measured end-to-end (VERDICT r5 #2): manifest min/max
    file-skipping on a streaming-sink-shaped snapshot table — the
    zone-counts output sliced into `n_commits` country-contiguous
    micro-batch appends (exactly what enrich_stream_to_table commits over a
    day), then a single-country read measured three ways:

      wall_pruned_s    read(where=country): manifest prunes to planned_files
      wall_unpruned_s  same filter, no manifest pruning (opens every file —
                       what a directory-listing reader pays; at an object
                       store each file is a GET)
      wall_compacted_s the same pruned read after compact() bin-packed the
                       table (stats recomputed from the rewritten footers)

    Build is untimed (static setup); reads are best-of-3."""
    import shutil

    import numpy as np
    from pyspark.sql import functions as F

    from aezspark import documents as docs_mod
    from aezspark.fixtures.generate import ensure_fixtures
    from aezspark.tables import SnapshotTable

    fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5, n_docs=n_docs,
                         with_expected=False)
    w = _bench_world(spark, fx)
    cached = _WORLD_CACHE.get(id(spark))
    if cached is not None:
        tl = cached[1]
    else:
        from aezspark.joins import tile_lookup_broadcast

        tl = tile_lookup_broadcast(spark, _tiles_cache(spark, w))
    pdf = (docs_mod.assign_zone_counts(w.documents(), w.bidx, tl, w.fine)
           .toPandas().sort_values(["country", "aez_code"])
           .reset_index(drop=True))
    path = os.path.join(fx, "zc_table_bench")
    shutil.rmtree(path, ignore_errors=True)
    tbl = SnapshotTable(spark, path, stat_cols=("country",))
    for i, s in enumerate(np.array_split(pdf, n_commits)):
        # one data file per micro-batch commit, like the streaming sink
        tbl.append(spark.createDataFrame(s.assign(batch_id=i)).coalesce(1),
                   summary={"stream_batch_id": i},
                   properties={"max_stream_batch_id": i})

    country = str(pdf["country"].iloc[len(pdf) // 2])
    where = {"country": (country, country)}

    def best_of(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    total = len(tbl.snapshot()["files"])
    planned = len(tbl.planned_files(where=where))
    wall_pruned = best_of(lambda: tbl.read(where=where).count())
    wall_unpruned = best_of(
        lambda: tbl.read().filter(F.col("country") == country).count())
    tbl.compact(target_file_bytes=128 << 20)
    total_c = len(tbl.snapshot()["files"])
    planned_c = len(tbl.planned_files(where=where))
    wall_compacted = best_of(lambda: tbl.read(where=where).count())
    return {
        "commits": n_commits,
        "files_total": total,
        "planned_files": planned,
        "wall_pruned_s": wall_pruned,
        "wall_unpruned_s": wall_unpruned,
        "files_after_compact": total_c,
        "planned_after_compact": planned_c,
        "wall_compacted_s": wall_compacted,
    }


def _bench_world(spark, fx):
    """One World per (JVM, fixture): the boundary index and cell->country
    assignment are build-once static indexes (the reference's masks/
    directory analog), shared across bench queries exactly as a production
    session would share them."""
    cached = _WORLD_CACHE.get(id(spark))
    if cached is not None and cached[0].fx_dir == fx:
        return cached[0]
    from aezspark.pipelines import World

    key = ("world-only", id(spark), fx)
    if key not in _WORLD_CACHE:
        _WORLD_CACHE[key] = World(spark, fx)
    return _WORLD_CACHE[key]


def _aez(spark, fx):
    return _bench_world(spark, fx).aez().count()


def _tiles(spark, fx):
    from pyspark.sql import functions as F

    return (_bench_world(spark, fx).tiles().filter(F.col("aez_code") != 255)
            .groupBy("aez_code").count().count())


def _relational(spark, sf_dir):
    import __spark_entry__ as E

    E.q_pricing_summary(spark, sf_dir).collect()
    E.q_revenue_by_nation(spark, sf_dir).collect()
    return E.q_latest_event_per_user(spark, sf_dir).count()


def _dedup(spark, sf_dir):
    import __spark_entry__ as E

    return E.q_lsh_candidate_pairs(spark, sf_dir).count()


def _simhash(spark, sf_dir):
    """The 64-bit fingerprint aggregation ALONE — the same workload this
    bench name has measured since round 5, kept stable so the prev-commit
    control stays apples-to-apples (the driver's q_simhash row additionally
    folds the banding join since round 6; that join is benched separately
    as simhash_pairs, outside the control list)."""
    import os as _os

    from aezspark import corpus

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    return corpus.simhash(docs, bits=64).count()


def _simhash_pairs(spark, sf_dir):
    """Fingerprints + pigeonhole block-banding near-dup join at Hamming<=3
    (production guard on) — the full SimHash near-dup pipeline."""
    import os as _os

    from aezspark import corpus

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    sh = corpus.simhash(docs, bits=64)
    return corpus.simhash_pairs(sh, max_hamming=3).count()


def _ann(spark, sf_dir):
    import __spark_entry__ as E

    E.q_ann_buckets(spark, sf_dir).count()
    return E.q_cosine_topk(spark, sf_dir).count()


CONTROL_QUERIES_DEFAULT = "flagship_docs,aez_by_country,dedup_minhash_lsh,simhash"


def _prev_round_commit(repo: str | None = None) -> str | None:
    """The previous round's boundary commit (the driver commits 'round N:
    ...' at each round end) — the baseline the control compares against.

    Resolved as the newest round-boundary commit whose TREE differs from
    HEAD's: when the driver runs the bench right after committing this
    round's snapshot, the latest 'round N:' commit IS HEAD (round 4's
    recorded control compared itself against itself and reported 0.66 on
    identical code) — skipping tree-identical candidates makes a
    post-snapshot run compare rN against r(N-1)."""
    import subprocess

    if repo is None:
        repo = os.path.dirname(os.path.abspath(__file__))

    def _git(*args: str) -> str:
        return subprocess.run(["git", "-C", repo, *args],
                              capture_output=True, text=True,
                              timeout=30).stdout.strip()

    try:
        head_tree = _git("rev-parse", "HEAD^{tree}")
        for sha in _git("log", "--grep", "^round [0-9]*:", "-n", "20",
                        "--format=%H").splitlines():
            sha = sha.strip()
            if sha and _git("rev-parse", f"{sha}^{{tree}}") != head_tree:
                return sha
        return None
    except Exception:
        return None


def _ensure_prev_worktree(sha: str) -> str | None:
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = os.path.join(repo, "build", f"prev_{sha[:12]}")
    try:
        if os.path.isdir(wt):
            head = subprocess.run(["git", "-C", wt, "rev-parse", "HEAD"],
                                  capture_output=True, text=True, timeout=30
                                  ).stdout.strip()
            if head == sha:
                return wt
        subprocess.run(["git", "-C", repo, "worktree", "add", "--detach",
                        wt, sha], capture_output=True, text=True,
                       timeout=120, check=True)
        return wt
    except Exception:
        return None


def _run_bench_subprocess(workdir: str, queries: list[str]) -> dict | None:
    """One bench.py run (of `workdir`'s tree) in a fresh JVM, control
    disabled, restricted to `queries`; returns the parsed JSON line."""
    import subprocess
    import sys as _sys

    env = dict(os.environ, AEZSPARK_PREV_CONTROL="0",
               BENCH_ONLY=",".join(queries),
               BENCH_REPS=os.environ.get("BENCH_REPS", "1"))
    try:
        out = subprocess.run([_sys.executable,
                              os.path.join(workdir, "bench.py")],
                             cwd=workdir, env=env, capture_output=True,
                             text=True, timeout=1800)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except Exception:
        return None


def _prev_commit_control(head_inproc: dict) -> dict | None:
    """Interleave prev-commit and head subprocess runs in THIS window and
    report per-query min-wall both sides plus the head/prev ratio. Any
    failure degrades to a note — the control must never break the bench."""
    sha = _prev_round_commit()
    if sha is None:
        return {"note": "no round-boundary commit found; control skipped"}
    wt = _ensure_prev_worktree(sha)
    if wt is None:
        return {"note": f"worktree for {sha[:12]} unavailable; control skipped"}
    queries = [q for q in os.environ.get(
        "AEZSPARK_CONTROL_QUERIES", CONTROL_QUERIES_DEFAULT).split(",") if q]
    samples = int(os.environ.get("AEZSPARK_CONTROL_SAMPLES", "2"))
    budget_s = float(os.environ.get("AEZSPARK_CONTROL_BUDGET_S", "420"))
    repo = os.path.dirname(os.path.abspath(__file__))
    prev_runs, head_runs = [], []
    truncated = False
    # subprocess-vs-subprocess ONLY (fresh JVM both sides — the in-process
    # numbers ride a warm JVM/world cache and would flatter head), with the
    # order ALTERNATED across samples: the first fresh JVM of a window pays
    # cold page-cache/JIT costs, so a fixed order would bias whichever side
    # runs first. A wall budget bounds the control's cost — complete pairs
    # only, so truncation never leaves a one-sided comparison.
    t0 = time.monotonic()
    # one DISCARDED warm-up subprocess before any measured pair: the first
    # fresh JVM of a window pays cold page cache (parquet, spark jars, bench
    # corpus) — measured 1.7–4.6× on the FIRST sample of both sides even
    # with order alternation (BENCH/BASELINE.md round-5 control), which is
    # exactly the spread the min-of-K estimator then has to absorb. Warming
    # the caches once, outside the measurement, shrinks the disclosed noise
    # band instead of papering over it. Counts against the wall budget.
    _run_bench_subprocess(repo, queries[:1])
    for i in range(samples):
        if i > 0 and time.monotonic() - t0 > budget_s:
            truncated = True
            break
        order = [(wt, prev_runs), (repo, head_runs)]
        if i % 2 == 1:
            order.reverse()
        for workdir, sink in order:
            sink.append(_run_bench_subprocess(workdir, queries))
    prev_runs = [r for r in prev_runs if r]
    head_runs = [r for r in head_runs if r]
    if not prev_runs or not head_runs:
        return {"note": "control subprocess failed; control skipped",
                "prev_commit": sha}
    per_query = {}
    for q in queries:
        pv = [r["queries"][q] for r in prev_runs if q in r.get("queries", {})]
        hv = [r["queries"][q] for r in head_runs if q in r.get("queries", {})]
        if pv and hv:
            per_query[q] = {"prev_s": min(pv), "head_s": min(hv),
                            "ratio": round(min(hv) / min(pv), 3),
                            "prev_samples": pv, "head_samples": hv,
                            "head_inproc_s": head_inproc.get(q)}
            # A/A noise band from the SAME-code samples: the spread between
            # repeated runs of identical code is the smallest delta the A/B
            # ratio can resolve (round 4's accidental self-comparison
            # measured 0.66 on identical code — the band must be disclosed)
            same_code = [s / min(vals) for vals in (pv, hv) if len(vals) > 1
                         for s in vals]
            if same_code:
                per_query[q]["aa_spread"] = round(max(same_code), 3)
    tot_p = sum(v["prev_s"] for v in per_query.values())
    tot_h = sum(v["head_s"] for v in per_query.values())
    # explicit A/A pair ratio: 2nd head subprocess vs 1st (identical code,
    # same window, same estimator inputs) — deviation from 1.0 is pure noise
    aa_pairs = []
    if len(head_runs) >= 2:  # guard BEFORE unpacking: a budget-truncated
        r0, r1 = head_runs[0], head_runs[1]  # single-pair run has no A/A
        aa_pairs = [(r0["queries"][q], r1["queries"][q]) for q in queries
                    if q in r0.get("queries", {})
                    and q in r1.get("queries", {})]
    aa_ratio = (round(sum(b for _, b in aa_pairs)
                      / sum(a for a, _ in aa_pairs), 3)
                if aa_pairs and sum(a for a, _ in aa_pairs) else None)
    spreads = [v["aa_spread"] for v in per_query.values() if "aa_spread" in v]
    noise_band = round(max(spreads), 3) if spreads else None
    return {
        "prev_commit": sha,
        "queries": per_query,
        "total_prev_s": round(tot_p, 3),
        "total_head_s": round(tot_h, 3),
        "head_over_prev_ratio": round(tot_h / tot_p, 3) if tot_p else None,
        "aa_pair_ratio": aa_ratio,
        "aa_noise_band": noise_band,
        "note": ("same-window interleaved A/B vs the previous round's commit,"
                 " fresh JVM per sample, order alternated; ratio < 1 means"
                 " this round is faster — compare THIS, not BENCH_rN.json"
                 " numbers across rounds (host drifts ~2x between windows)."
                 " aa_pair_ratio is head-vs-head on identical code;"
                 " aa_noise_band is the max same-code sample spread — A/B"
                 " ratios inside [1/band, band] are indistinguishable from"
                 " noise"
                 + ("; TRUNCATED by AEZSPARK_CONTROL_BUDGET_S after "
                    f"{len(prev_runs)} pair(s) — the first pair ran"
                    " prev-first (cold side bias against prev)"
                    if truncated else "")),
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("BENCH_DOCS", "200000"))
    only = [s for s in os.environ.get("BENCH_ONLY", "").split(",") if s]

    # generate the bench world before timing (cached across runs)
    from aezspark.fixtures.generate import ensure_fixtures
    fx = ensure_fixtures(bench_fx_dir(n_docs), coarse_px=0.5, n_docs=n_docs,
                         with_expected=False)

    from aezspark.session import get_spark
    spark = get_spark("aezspark-bench", master=f"local[{cpus}]")
    spark.range(10_000_000).selectExpr("sum(id)").collect()  # JVM warmup
    # Python-worker warmup: fork the worker pool + import numpy/pandas once
    # so steady-state throughput is measured, not process spawn
    import pandas as _pd  # noqa
    (spark.range(0, cpus * 4, 1, cpus * 4)
     .mapInPandas(lambda it: ( _pd.DataFrame({"id": b["id"]}) for b in it),
                  "id long").count())

    benches = {
        "flagship_docs": lambda: _flagship(spark, n_docs),
        "flagship_docs_shard": lambda: _flagship_shard(spark, n_docs),
        "flagship_docs_smj": lambda: _flagship_smj(spark, n_docs),
        "aez_by_country": lambda: _aez(spark, fx),
        "tile_classify": lambda: _tiles(spark, fx),
        "relational_core": lambda: _relational(spark, sf_dir),
        "dedup_minhash_lsh": lambda: _dedup(spark, sf_dir),
        "simhash": lambda: _simhash(spark, sf_dir),
        "simhash_pairs": lambda: _simhash_pairs(spark, sf_dir),
        "ann_cosine": lambda: _ann(spark, sf_dir),
    }
    if only:
        benches = {k: v for k, v in benches.items() if k in only}
    if "flagship_docs_smj" in benches:
        ensure_bucketed_tiles(spark, n_docs)  # untimed static-index setup
    if "flagship_docs_shard" in benches:
        ensure_tiles_sink(spark, n_docs)  # untimed static-index setup

    reps = int(os.environ.get("BENCH_REPS", "1"))
    queries = {}
    total = 0.0
    for name, fn in benches.items():
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)
        total += best

    result = {
        "metric": "spatial-join+tile pipeline wall time (flagship docs/sec in extras)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "extras": {
            "cpus": cpus,
            "flagship_docs": n_docs,
            "docs_per_sec": round(n_docs / queries["flagship_docs"], 1)
            if "flagship_docs" in queries else None,
        },
    }
    if os.environ.get("BENCH_STAGES") and "flagship_docs" in queries:
        result["extras"]["stages"] = _flagship_stages(spark, n_docs)
    # table-layer scan-planning datum (U21 measured): on full runs only,
    # and never fatal to the measured numbers above
    if not only and os.environ.get("BENCH_TABLE_PLANNING", "1") != "0":
        try:
            result["extras"]["table_scan_planning"] = \
                _table_scan_planning(spark, n_docs)
        except Exception as e:
            result["extras"]["table_scan_planning"] = {"error": str(e)[:200]}
    # same-window prev-commit control: only on full (non-subset) runs — the
    # scaling harness and the control's own subprocesses set BENCH_ONLY
    if not only and os.environ.get("AEZSPARK_PREV_CONTROL", "1") != "0":
        try:
            result["extras"]["prev_commit_control"] = \
                _prev_commit_control(queries)
        except Exception as e:  # the control must NEVER break the bench —
            # the measured numbers above are already in hand
            result["extras"]["prev_commit_control"] = {
                "note": f"control crashed ({type(e).__name__}: {e}); "
                        f"bench numbers unaffected"}
    print(json.dumps(result))


if __name__ == "__main__":
    main()
