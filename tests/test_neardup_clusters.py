"""Connected-components dedup clustering: planted components must resolve to
min-doc_id labels regardless of edge orientation or chain length."""

from aezspark import corpus


def test_clusters_resolve_chains_and_stars(spark):
    # component 1: chain a-b-c-d (diameter 3 — needs >1 propagation round)
    # component 2: star f<-{g,h}
    # component 3: single edge x-y
    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("c", "d"),
         ("g", "f"), ("h", "f"),
         ("x", "y")],
        "doc_a STRING, doc_b STRING")
    got = {r.doc_id: r.cluster_id
           for r in corpus.neardup_clusters(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                   "f": "f", "g": "f", "h": "f",
                   "x": "x", "y": "x"}


def test_clusters_raise_on_non_convergence(spark):
    import pytest

    nodes = [f"n{i:02d}" for i in range(8)]
    pairs = spark.createDataFrame(
        [(nodes[i + 1], nodes[i]) for i in range(7)],
        "doc_a STRING, doc_b STRING")
    with pytest.raises(RuntimeError, match="did not converge"):
        corpus.neardup_clusters(pairs, max_iters=2).collect()


def test_clusters_long_chain_converges(spark):
    # 12-node chain: worst-case diameter for label propagation
    nodes = [f"n{i:02d}" for i in range(12)]
    pairs = spark.createDataFrame(
        [(nodes[i + 1], nodes[i]) for i in range(11)],
        "doc_a STRING, doc_b STRING")
    got = {r.doc_id: r.cluster_id
           for r in corpus.neardup_clusters(pairs).collect()}
    assert set(got.values()) == {"n00"}
    assert len(got) == 12


def test_one_action_per_round_no_separate_count(spark, monkeypatch):
    """VERDICT r2 item #6: the convergence signal must ride the
    localCheckpoint materialization (observe metric), not a separate
    old-vs-new join+count job. Pinned by forbidding DataFrame.count during
    the loop and counting localCheckpoint calls (= rounds)."""
    # patch the CONCRETE class (pyspark 4: pyspark.sql.DataFrame is the
    # abstract base; instances are classic.dataframe.DataFrame)
    from pyspark.sql.classic.dataframe import DataFrame

    def no_count(self):
        raise AssertionError(
            "neardup_clusters ran a separate count() action per round")

    rounds = []
    orig_ckpt = DataFrame.localCheckpoint
    monkeypatch.setattr(DataFrame, "count", no_count)
    monkeypatch.setattr(
        DataFrame, "localCheckpoint",
        lambda self, eager=True: (rounds.append(1), orig_ckpt(self, eager))[1])
    pairs = spark.createDataFrame([("g", "f"), ("h", "f")],
                                  "doc_a STRING, doc_b STRING")
    got = corpus.neardup_clusters(pairs)
    monkeypatch.undo()
    # star graph: round 1 relabels g,h → f; round 2 observes changed=0
    assert len(rounds) == 2
    labels = {r.doc_id: r.cluster_id for r in got.collect()}
    assert labels == {"f": "f", "g": "f", "h": "f"}


def test_neardup_canonical_keeps_best_per_cluster(spark):
    """Retention: exactly one keep per cluster; winner = most tokens, then
    most chars, then min doc_id — integer-only deterministic ordering."""
    from aezspark import corpus

    docs = spark.createDataFrame(
        [("a", "the cat sat on the mat"),        # 6 tokens — cluster 'a' winner
         ("b", "the cat sat on mat"),            # 5 tokens
         ("c", "the cat sat"),                   # 3 tokens
         ("x", "one two three"),                 # tie with y on tokens/chars
         ("y", "one two threa")],                # -> min doc_id 'x' wins
        "doc_id STRING, text STRING")
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")],
        "doc_id STRING, cluster_id STRING")
    got = {r.doc_id: (r.cluster_id, r.keep)
           for r in corpus.neardup_canonical(clusters, docs).collect()}
    assert got == {"a": ("a", True), "b": ("a", False), "c": ("a", False),
                   "x": ("x", True), "y": ("x", False)}
    # exactly one keep per cluster, drop list is everything else
    kept = [d for d, (_, k) in got.items() if k]
    assert sorted(kept) == ["a", "x"]


def test_neardup_canonical_unknown_docs_survive(spark):
    """A clustered doc_id absent from `docs` must still appear in the output
    (ADVICE r5): unknown docs coalesce quality to -1, so they lose to any
    known doc and tie-break among themselves by min doc_id."""
    from aezspark import corpus

    docs = spark.createDataFrame(
        [("a", "the cat sat on the mat")],
        "doc_id STRING, text STRING")
    clusters = spark.createDataFrame(
        # 'ghost1'/'ghost2' are clustered but missing from docs;
        # cluster 'z' is ALL ghosts — one of them must still be kept
        [("a", "a"), ("ghost1", "a"), ("ghost2", "z"), ("ghost3", "z")],
        "doc_id STRING, cluster_id STRING")
    got = {r.doc_id: (r.cluster_id, r.keep)
           for r in corpus.neardup_canonical(clusters, docs).collect()}
    assert got == {"a": ("a", True), "ghost1": ("a", False),
                   "ghost2": ("z", True), "ghost3": ("z", False)}
