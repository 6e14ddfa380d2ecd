"""Pins for the bench.py same-window prev-commit control harness.

Round-4 verdict item #1: the control resolved "previous round" as the
latest `round N:` commit, which is HEAD itself when the driver runs the
bench right after the round snapshot — an accidental self-comparison that
reported 0.66 on identical code. These tests pin (a) the tree-differing
resolution rule in a scratch git repo, and (b) the A/A calibration fields
of the control report.
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _git(repo, *args):
    return subprocess.run(["git", "-C", repo, *args], capture_output=True,
                          text=True, check=True).stdout.strip()


def _scratch_repo(tmp_path):
    repo = str(tmp_path / "scratch")
    os.makedirs(repo)
    _git(repo, "init", "-q")
    _git(repo, "config", "user.email", "t@t")
    _git(repo, "config", "user.name", "t")
    return repo


def _commit(repo, msg, content=None):
    if content is not None:
        with open(os.path.join(repo, "f.txt"), "w") as f:
            f.write(content)
    _git(repo, "add", "-A")
    _git(repo, "commit", "-q", "--allow-empty", "-m", msg)
    return _git(repo, "rev-parse", "HEAD")


def _resolve_with_repo(monkeypatch, repo):
    import bench

    return bench._prev_round_commit(repo)


def test_prev_commit_skips_tree_identical_head(tmp_path, monkeypatch):
    """A post-snapshot run (HEAD == latest `round N:` commit) must resolve
    the PREVIOUS round's commit, not HEAD itself."""
    repo = _scratch_repo(tmp_path)
    _commit(repo, "initial", "v0")
    r4 = _commit(repo, "round 4: snapshot", "v4")
    _commit(repo, "round 5: snapshot", "v5")  # HEAD — must be skipped
    assert _resolve_with_repo(monkeypatch, repo) == r4


def test_prev_commit_skips_tree_identical_chain(tmp_path, monkeypatch):
    """Consecutive round-boundary commits with identical trees (e.g. the
    driver's `round N: verdict` bookkeeping commit re-committed) are all
    skipped until a genuinely different tree appears."""
    repo = _scratch_repo(tmp_path)
    _commit(repo, "initial", "v0")
    r4 = _commit(repo, "round 4: snapshot", "v4")
    _commit(repo, "round 5: snapshot", "v5")
    _commit(repo, "round 5: verdict bookkeeping")  # empty: same tree as HEAD~
    assert _resolve_with_repo(monkeypatch, repo) == r4


def test_prev_commit_mid_round_resolves_latest_round(tmp_path, monkeypatch):
    """Mid-round (HEAD is a working commit after the snapshot), the newest
    round-boundary commit has a differing tree and is the baseline."""
    repo = _scratch_repo(tmp_path)
    _commit(repo, "initial", "v0")
    r5 = _commit(repo, "round 5: snapshot", "v5")
    _commit(repo, "wip: engine change", "v5-wip")
    assert _resolve_with_repo(monkeypatch, repo) == r5


def test_prev_commit_none_when_all_trees_match(tmp_path, monkeypatch):
    repo = _scratch_repo(tmp_path)
    _commit(repo, "round 1: snapshot", "v1")
    assert _resolve_with_repo(monkeypatch, repo) is None


def test_control_report_has_aa_calibration(monkeypatch):
    """The control report must carry the A/A pair ratio and noise band so
    A/B ratios inside the band are read as noise."""
    import bench

    fake_runs = {
        "prev": [{"queries": {"q1": 10.0, "q2": 4.0}},
                 {"queries": {"q1": 12.0, "q2": 5.0}}],
        "head": [{"queries": {"q1": 9.0, "q2": 4.4}},
                 {"queries": {"q1": 13.5, "q2": 4.0}}],
    }
    calls = {"i": {"prev": 0, "head": 0}, "warmups": 0}

    def fake_run(workdir, queries):
        side = "prev" if workdir == "/fake/prev" else "head"
        if len(queries) == 1:  # the discarded cache warm-up run
            calls["warmups"] += 1
            return {"queries": {}}
        r = fake_runs[side][calls["i"][side]]
        calls["i"][side] += 1
        return r

    monkeypatch.setattr(bench, "_prev_round_commit", lambda: "a" * 40)
    monkeypatch.setattr(bench, "_ensure_prev_worktree", lambda sha: "/fake/prev")
    monkeypatch.setattr(bench, "_run_bench_subprocess", fake_run)
    monkeypatch.setenv("AEZSPARK_CONTROL_QUERIES", "q1,q2")
    monkeypatch.setenv("AEZSPARK_CONTROL_SAMPLES", "2")

    rep = bench._prev_commit_control({"q1": 8.0, "q2": 4.1})
    assert rep["prev_commit"] == "a" * 40
    # min-of-K estimator: prev q1=10, head q1=9 → ratio 0.9
    assert rep["queries"]["q1"]["ratio"] == 0.9
    # A/A pair = head run 2 vs head run 1 = (13.5+4.0)/(9.0+4.4)
    assert rep["aa_pair_ratio"] == round(17.5 / 13.4, 3)
    # noise band = max same-code spread = head q1 13.5/9.0 = 1.5
    assert rep["aa_noise_band"] == 1.5
    assert "noise" in rep["note"]
    # exactly one discarded warm-up ran before the measured pairs
    assert calls["warmups"] == 1


def test_control_single_pair_has_no_aa_but_does_not_crash(monkeypatch):
    """Budget truncation (or AEZSPARK_CONTROL_SAMPLES=1) leaves one pair:
    the A/A calibration is then undefined — the control must report the
    pair with aa fields None, not crash the whole bench (regression: the
    old comprehension unpacked head_runs[:2] before its length guard)."""
    import bench

    calls = {"n": 0}

    def fake_run(workdir, queries):
        calls["n"] += 1
        if calls["n"] == 1:
            return {"queries": {}}  # the discarded warm-up (first call)
        return {"queries": {"q1": 10.0 if workdir == "/fake/prev" else 9.0}}

    monkeypatch.setattr(bench, "_prev_round_commit", lambda: "b" * 40)
    monkeypatch.setattr(bench, "_ensure_prev_worktree", lambda sha: "/fake/prev")
    monkeypatch.setattr(bench, "_run_bench_subprocess", fake_run)
    monkeypatch.setenv("AEZSPARK_CONTROL_QUERIES", "q1")
    monkeypatch.setenv("AEZSPARK_CONTROL_SAMPLES", "1")

    rep = bench._prev_commit_control({"q1": 8.0})
    assert rep["queries"]["q1"]["ratio"] == 0.9
    assert rep["aa_pair_ratio"] is None
    assert rep["aa_noise_band"] is None
