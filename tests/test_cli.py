"""CLI entry point (reference: presto-cli --execute / piped-stdin modes)."""

from __future__ import annotations

import json
import subprocess
import sys

CLI = [sys.executable, "-m", "sensql_presto_spark.cli", "--sf-dir", "/root/testdata/sf0.001"]


def _run(args, stdin=None):
    return subprocess.run(
        CLI + args, input=stdin, capture_output=True, text=True, timeout=240, cwd="/root/repo"
    )


def test_execute_aligned():
    r = _run(["--execute", "SELECT n_name FROM nation ORDER BY n_nationkey LIMIT 2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "NATION_0" in r.stdout and "NATION_1" in r.stdout
    assert "(2 rows)" in r.stdout


def test_execute_json_with_compat_functions():
    r = _run(
        [
            "--format",
            "json",
            "--execute",
            "SELECT strpos('hello', 'll') AS p, st_point(1.0, 2.0) AS pt,"
            " value_at_quantile(array(0D, 10D, 20D), 0.5) AS q",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    row = json.loads(r.stdout.strip().splitlines()[-1])
    assert row == {"p": 3, "pt": "POINT (1.0 2.0)", "q": 10.0}


def test_piped_multi_statement_csv():
    r = _run(
        ["--format", "csv"],
        stdin="SELECT count(*) AS n FROM region; SELECT 1 AS one;\n",
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l.strip() for l in r.stdout.splitlines() if l.strip()]
    assert lines == ["n", "5", "one", "1"]


def test_piped_error_exits_nonzero():
    r = _run([], stdin="SELECT * FROM does_not_exist;\n")
    assert r.returncode == 1
    assert "Query failed" in r.stderr
