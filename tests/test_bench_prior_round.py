"""Pin bench.py's prior-round artifact selection against driver
write-order (r10 VERDICT next-round #2).

The round driver's sequence is: (1) write CORRECTNESS_r{N}.json into the
WORKING TREE (untracked — it is committed only at round end), (2) run
bench.py, which stamps `shared_vs` with the newest PRIOR round's
artifact.  Rounds 9 and 10 both shipped a same-round `shared_vs`
because the current round was inferred from a directory glob, which the
untracked in-flight file shifted to N+1.  These tests simulate that
exact sequence against a scratch git repo and pin the `git ls-files`
derivation, the $BENCH_CURRENT_ROUND override, and the no-git glob
fallback.
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _current_round, _latest_prior_bench  # noqa: E402


def _payload(tag: str) -> dict:
    return {"metric": "suite_seconds", "value": 1.0, "queries": {"q": 0.5}, "tag": tag}


def _git(repo: str, *args: str) -> None:
    subprocess.run(
        ["git", "-C", repo, *args],
        check=True,
        capture_output=True,
        env={
            **os.environ,
            "GIT_AUTHOR_NAME": "t",
            "GIT_AUTHOR_EMAIL": "t@t",
            "GIT_COMMITTER_NAME": "t",
            "GIT_COMMITTER_EMAIL": "t@t",
        },
    )


def _scratch_round_repo(tmp_path) -> str:
    """A repo mid-round-2: round-1 artifacts committed, round-2 driver
    artifacts freshly written but NOT committed."""
    repo = str(tmp_path / "repo")
    os.makedirs(repo)
    _git(repo, "init", "-q")
    for name in ("CORRECTNESS_r1.json", "BENCH_r1.json", "BENCH_DETAIL_r1.json"):
        with open(os.path.join(repo, name), "w") as f:
            json.dump(_payload(name), f)
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "round 1 artifacts")
    # the driver sequence: correctness lands in the working tree first,
    # and this script's own sidecar may also exist before bench runs
    for name in ("CORRECTNESS_r2.json", "BENCH_DETAIL_r2.json"):
        with open(os.path.join(repo, name), "w") as f:
            json.dump(_payload(name), f)
    return repo


def test_driver_sequence_picks_prior_round(tmp_path, monkeypatch):
    monkeypatch.delenv("BENCH_CURRENT_ROUND", raising=False)
    repo = _scratch_round_repo(tmp_path)
    assert _current_round(repo) == 2  # committed max is r1, not the glob's r2
    picked = _latest_prior_bench(repo)
    assert picked is not None
    name, data = picked
    # the untracked same-round sidecar BENCH_DETAIL_r2.json must be
    # excluded; the newest PRIOR artifact is the r1 detail sidecar
    assert name == "BENCH_DETAIL_r1.json"
    assert data["tag"] == "BENCH_DETAIL_r1.json"


def test_env_override_wins(tmp_path, monkeypatch):
    repo = _scratch_round_repo(tmp_path)
    # a harness that knows it is round 99 sees every artifact as prior
    monkeypatch.setenv("BENCH_CURRENT_ROUND", "99")
    name, _ = _latest_prior_bench(repo)
    assert name == "BENCH_DETAIL_r2.json"
    monkeypatch.setenv("BENCH_CURRENT_ROUND", "1")
    assert _latest_prior_bench(repo) is None  # nothing precedes round 1


def test_glob_fallback_without_git(tmp_path, monkeypatch):
    monkeypatch.delenv("BENCH_CURRENT_ROUND", raising=False)
    plain = str(tmp_path / "plain")
    os.makedirs(plain)
    for name in ("CORRECTNESS_r1.json", "BENCH_r1.json"):
        with open(os.path.join(plain, name), "w") as f:
            json.dump(_payload(name), f)
    # no .git: ls-files fails, the glob fallback infers current=2, r1 is prior
    assert _current_round(plain) == 2
    name, _ = _latest_prior_bench(plain)
    assert name == "BENCH_r1.json"


def test_repo_state_right_now_is_cross_round():
    """In THIS repo, with CORRECTNESS_r10 the newest committed round,
    the selection must name an r10-or-older artifact even if untracked
    r11 files appear during the round."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cur = _current_round(here)
    assert cur is not None and cur >= 11
    picked = _latest_prior_bench(here)
    assert picked is not None
    name, _ = picked
    import re

    m = re.search(r"_r(\d+)\.json$", name)
    assert m and int(m.group(1)) < cur


def _bench_round(**env_vars) -> str:
    """Run tools/bench_round.sh with a controlled env, return stdout."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("BENCH_CURRENT_ROUND", "ROUNDCHECK_SWEEP_JSON")
    }
    env.update(env_vars)
    proc = subprocess.run(
        ["bash", os.path.join(here, "tools", "bench_round.sh")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    return proc.stdout.strip()


def test_bench_round_derivation():
    """tools/bench_round.sh (r11 VERDICT next-round #2): explicit override
    wins; else the round is read off the sweep artifact the certification
    chain is stamping; else empty (bench's git derivation takes over)."""
    assert _bench_round(BENCH_CURRENT_ROUND="7") == "7"
    assert _bench_round(ROUNDCHECK_SWEEP_JSON="SWEEP_r12_sf0.01.json") == "12"
    assert _bench_round(ROUNDCHECK_SWEEP_JSON="SWEEP_r09_sf0.1.json") == "9"
    assert (
        _bench_round(
            BENCH_CURRENT_ROUND="7", ROUNDCHECK_SWEEP_JSON="SWEEP_r12_sf0.01.json"
        )
        == "7"
    )
    assert _bench_round() == ""


def test_roundcheck_bench_invocation_carries_the_round():
    """The roundcheck harness actually sets the variable around its bench
    smoke (the r11 verdict's 'nothing sets it' gap): the derivation call
    and the env assignment on the bench invocation are both present."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "tools", "roundcheck.sh")) as f:
        src = f.read()
    assert 'BENCH_CURRENT_ROUND="$(bash tools/bench_round.sh)"' in src
    bench_stanza = src[src.index("== bench smoke ==") :]
    assert 'BENCH_CURRENT_ROUND="$BENCH_CURRENT_ROUND"' in bench_stanza
    assert "python bench.py" in bench_stanza
    # and bench.py honors an EMPTY value by falling through to git
    assert _current_round.__doc__ and "BENCH_CURRENT_ROUND" in _current_round.__doc__
