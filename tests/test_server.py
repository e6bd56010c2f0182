"""HTTP SQL server protocol tests (SURVEY.md §3.1; reference
QueuedStatementResource.java / ExecutingStatementResource.java semantics).

A real client loop: POST the statement, follow every ``nextUri`` until the
document has none, accumulate ``data`` pages — exactly what
presto-client's StatementClient does.
"""

from __future__ import annotations

import json
import time
import urllib.request

import pytest

from sensql_presto_spark import server as srv


@pytest.fixture(scope="module")
def sql_server(spark, oracle_dir):
    s = srv.SqlServer(spark, oracle_dir).start()
    yield s
    s.stop()


def _http(method: str, url: str, body: bytes | None = None) -> tuple[int, dict | None]:
    req = urllib.request.Request(url, data=body, method=method)
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            payload = resp.read()
            return resp.status, (json.loads(payload) if payload else None)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


def run_query(s: srv.SqlServer, sql: str, deadline: float = 120.0):
    """StatementClient loop: submit, then chase nextUri to completion."""
    base = f"http://127.0.0.1:{s.port}"
    status, doc = _http("POST", f"{base}/v1/statement", sql.encode())
    assert status == 200
    columns, rows = None, []
    t0 = time.time()
    while True:
        if doc.get("columns"):
            columns = doc["columns"]
        rows.extend(doc.get("data", []))
        if "error" in doc:
            return doc["error"], columns, rows
        nxt = doc.get("nextUri")
        if nxt is None:
            return None, columns, rows
        assert time.time() - t0 < deadline, "query did not finish in time"
        if doc["stats"]["state"] in ("QUEUED", "RUNNING"):
            time.sleep(0.05)
        status, doc = _http("GET", nxt)
        assert status == 200


def test_select_roundtrip(sql_server):
    err, cols, rows = run_query(sql_server, "SELECT 1 AS x, 'a' AS s, 2.5 AS d")
    assert err is None
    assert [c["name"] for c in cols] == ["x", "s", "d"]
    assert [c["type"] for c in cols] == ["integer", "varchar", "decimal(2,1)"]
    assert rows == [[1, "a", "2.5"]]


def test_catalog_query_and_types(sql_server):
    err, cols, rows = run_query(
        sql_server,
        """SELECT n_nationkey, n_name, n_nationkey * 1.0e0 AS keyd
           FROM nation ORDER BY n_nationkey LIMIT 5""",
    )
    assert err is None
    assert [c["type"] for c in cols] == ["integer", "varchar", "double"]
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]


def test_paging_multiple_documents(sql_server, monkeypatch):
    monkeypatch.setattr(srv, "PAGE_ROWS", 100)
    err, _, rows = run_query(
        sql_server, "SELECT c_custkey FROM customer ORDER BY c_custkey LIMIT 350"
    )
    assert err is None
    assert len(rows) == 350
    keys = [r[0] for r in rows]
    assert keys == sorted(keys)  # pages arrive in order, no row lost or repeated


def test_error_surfaces_as_query_error(sql_server):
    err, _, _ = run_query(sql_server, "SELECT * FROM no_such_table_xyz")
    assert err is not None
    assert "no_such_table_xyz" in err["message"].lower() or err["errorName"]


def test_empty_statement_rejected(sql_server):
    status, doc = _http(
        "POST", f"http://127.0.0.1:{sql_server.port}/v1/statement", b"   "
    )
    assert status == 400
    assert "empty" in doc["error"]["message"]


def test_cancel(sql_server):
    base = f"http://127.0.0.1:{sql_server.port}"
    status, doc = _http(
        "POST",
        f"{base}/v1/statement",
        b"SELECT count(*) FROM lineitem l1 CROSS JOIN lineitem l2 CROSS JOIN lineitem l3",
    )
    assert status == 200
    qid = doc["id"]
    status, _ = _http("DELETE", f"{base}/v1/statement/executing/{qid}/0")
    assert status == 204
    status, doc = _http("GET", f"{base}/v1/statement/executing/{qid}/0")
    assert doc["stats"]["state"] in ("CANCELED", "FINISHED")


def test_info_endpoint(sql_server):
    status, doc = _http("GET", f"http://127.0.0.1:{sql_server.port}/v1/info")
    assert status == 200
    assert doc["coordinator"] is True


def test_complex_types_serialize(sql_server):
    err, cols, rows = run_query(
        sql_server,
        "SELECT array(1, 2) AS arr, map('k', 1) AS m, named_struct('a', 1) AS st, "
        "to_timestamp('2021-01-02 03:04:05') AS ts",
    )
    assert err is None
    types = {c["name"]: c["type"] for c in cols}
    assert types["arr"] == "array(integer)"
    assert types["m"] == "map(varchar, integer)"
    assert types["st"] == "row(a integer)"
    assert types["ts"] == "timestamp"
    assert rows[0][0] == [1, 2]
    assert rows[0][3] == "2021-01-02 03:04:05"


def test_presto_compat_functions_available(sql_server):
    # prepare_session installs the compat layer: Presto spellings work over HTTP
    err, _, rows = run_query(
        sql_server, "SELECT strpos('hello', 'll') AS p, to_hex(unhex('0F')) AS h"
    )
    assert err is None
    assert rows[0][0] == 3


def _run_query_as(s: srv.SqlServer, sql: str, user: str):
    """Like run_query but with an X-Presto-User identity header."""
    base = f"http://127.0.0.1:{s.port}"
    req = urllib.request.Request(
        f"{base}/v1/statement",
        data=sql.encode(),
        method="POST",
        headers={"X-Presto-User": user},
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        doc = json.loads(resp.read())
    rows = []
    t0 = time.time()
    while True:
        rows.extend(doc.get("data", []))
        if "error" in doc:
            return doc["error"], rows
        nxt = doc.get("nextUri")
        if nxt is None:
            return None, rows
        assert time.time() - t0 < 120
        if doc["stats"]["state"] in ("QUEUED", "RUNNING"):
            time.sleep(0.05)
        status, doc = _http("GET", nxt)
        assert status == 200


def test_prepare_namespace_scoped_per_client(sql_server):
    """Two clients' PREPARE names don't collide (reference scopes prepared
    statements to Session state in QueryPreparer)."""
    err, _ = _run_query_as(sql_server, "PREPARE p1 FROM SELECT 1 AS one", "alice")
    assert err is None
    # alice can execute her statement
    err, rows = _run_query_as(sql_server, "EXECUTE p1", "alice")
    assert err is None and rows == [[1]]
    # bob does not see alice's prepared statement
    err, _ = _run_query_as(sql_server, "EXECUTE p1", "bob")
    assert err is not None and "not found" in err["message"]
    # bob can claim the same name independently
    err, _ = _run_query_as(sql_server, "PREPARE p1 FROM SELECT 2 AS two", "bob")
    assert err is None
    err, rows = _run_query_as(sql_server, "EXECUTE p1", "bob")
    assert err is None and rows == [[2]]
    # alice's binding is unchanged
    err, rows = _run_query_as(sql_server, "EXECUTE p1", "alice")
    assert err is None and rows == [[1]]


def test_set_session_scoped_per_client(sql_server):
    """SET SESSION is Session state (SystemSessionProperties), not server
    state: each client runs on a forked SparkSession with its own SQLConf,
    so alice's override is invisible to bob and RESET restores only hers."""
    err, rows = _run_query_as(sql_server, "SHOW SESSION", "bob")
    assert err is None
    bob_before = {r[0]: r[1] for r in rows}["hash_partition_count"]

    err, _ = _run_query_as(sql_server, "SET SESSION hash_partition_count = 7", "alice")
    assert err is None
    err, rows = _run_query_as(sql_server, "SHOW SESSION", "alice")
    assert err is None
    assert {r[0]: r[1] for r in rows}["hash_partition_count"] == "7"
    # bob's view is unchanged — no process-global leak
    err, rows = _run_query_as(sql_server, "SHOW SESSION", "bob")
    assert err is None
    assert {r[0]: r[1] for r in rows}["hash_partition_count"] == bob_before
    # and alice's RESET restores her default without touching bob
    err, _ = _run_query_as(sql_server, "RESET SESSION hash_partition_count", "alice")
    assert err is None
    err, rows = _run_query_as(sql_server, "SHOW SESSION", "alice")
    assert err is None
    assert {r[0]: r[1] for r in rows}["hash_partition_count"] == bob_before


def test_temp_views_scoped_per_client(sql_server):
    """Forked sessions isolate the temp-object namespace too: a view one
    client creates is not visible to another (reference: temp objects live
    in Session, not the shared catalog)."""
    err, _ = _run_query_as(
        sql_server, "CREATE OR REPLACE TEMPORARY VIEW my_v AS SELECT 41 AS x", "alice"
    )
    assert err is None
    err, rows = _run_query_as(sql_server, "SELECT x + 1 FROM my_v", "alice")
    assert err is None and rows == [[42]]
    err, _ = _run_query_as(sql_server, "SELECT * FROM my_v", "bob")
    assert err is not None


def test_query_info_endpoint(sql_server):
    """GET /v1/query/{id} — the infoUri target (QueryResource.getQueryInfo)."""
    base = f"http://127.0.0.1:{sql_server.port}"
    status, doc = _http("POST", f"{base}/v1/statement", b"SELECT 1 AS one")
    assert status == 200
    qid = doc["id"]
    # poll info until terminal
    t0 = time.time()
    while True:
        status, info = _http("GET", f"{base}/v1/query/{qid}")
        assert status == 200
        if info["state"] in ("FINISHED", "FAILED"):
            break
        assert time.time() - t0 < 120
        time.sleep(0.05)
    assert info["queryId"] == qid and info["query"] == "SELECT 1 AS one"
    assert info["state"] == "FINISHED" and info["errorMessage"] is None
    status, _ = _http("GET", f"{base}/v1/query/q_nope")
    assert status == 404


def test_admission_control_queues_beyond_limit(spark, oracle_dir):
    """max_concurrent=1: the second query holds in QUEUED until the first
    slot frees (InternalResourceGroup.hardConcurrencyLimit analog)."""
    s = srv.SqlServer(spark, oracle_dir, max_concurrent=1).start()
    try:
        # a deliberately slow first query (cartesian-ish aggregation)
        q1 = s.submit(
            "SELECT count(*) AS n FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey"
        )
        time.sleep(0.3)  # let q1 claim the slot
        q2 = s.submit("SELECT 1 AS one")
        time.sleep(0.4)
        with q2.lock:
            state_while_held = q2.state
        # q2 must not have run while q1 held the only slot (it may have
        # QUEUED->RUNNING only if q1 already finished — check q1 then)
        with q1.lock:
            q1_state = q1.state
        if q1_state == "RUNNING":
            assert state_while_held == "QUEUED"
        # both eventually finish
        t0 = time.time()
        while True:
            with q2.lock:
                if q2.state == "FINISHED":
                    break
            assert time.time() - t0 < 120
            time.sleep(0.1)
    finally:
        s.stop()


def test_enforced_access_control_over_http(spark, oracle_dir):
    """enforce_access=True server: an ungranted client is denied, an admin
    GRANT over HTTP opens access, REVOKE closes it again — the protocol
    surface of AccessControlManager enforcement."""
    s = srv.SqlServer(spark, oracle_dir, enforce_access=True).start()
    try:
        err, _ = _run_query_as(s, "SELECT count(*) FROM nation", "eve")
        assert err is not None and "Access Denied" in err["message"]
        err, _ = _run_query_as(s, "GRANT SELECT ON nation TO USER eve", "admin")
        assert err is None
        err, rows = _run_query_as(s, "SELECT count(*) AS n FROM nation", "eve")
        assert err is None and rows == [[25]]
        err, _ = _run_query_as(s, "REVOKE SELECT ON nation FROM USER eve", "admin")
        assert err is None
        err, _ = _run_query_as(s, "SELECT count(*) FROM nation", "eve")
        assert err is not None and "Access Denied" in err["message"]
    finally:
        s.stop()


def test_call_kill_query_over_http(spark, oracle_dir):
    """CALL system.runtime.kill_query cancels a running query — the
    coordinator-bound procedure (KillQueryProcedure.java)."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        q = s.submit(
            "SELECT count(*) FROM lineitem l1 CROSS JOIN lineitem l2 CROSS JOIN lineitem l3"
        )
        time.sleep(0.2)
        err, _ = _run_query_as(
            s, f"CALL system.runtime.kill_query('{q.query_id}')", "admin"
        )
        assert err is None
        with q.lock:
            assert q.state in ("CANCELED", "FINISHED")
        err, _ = _run_query_as(s, "CALL system.runtime.kill_query('nope')", "admin")
        assert err is not None and "not found" in err["message"].lower()
    finally:
        s.stop()


def test_idle_sessions_evict_lru(spark, oracle_dir):
    """The per-client session map is bounded: beyond MAX_CLIENT_SESSIONS
    the least-recently-used client's session drops (idle-session expiry
    analog) — its session state resets, while durable state survives."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        s.MAX_CLIENT_SESSIONS = 3
        err, _ = _run_query_as(s, "PREPARE pe FROM SELECT 1 AS one", "u0")
        assert err is None
        for i in range(1, 4):  # three newer clients push u0 out
            err, _ = _run_query_as(s, "SELECT 1", f"u{i}")
            assert err is None
        assert len(s._sessions) == 3 and "u0" not in s._sessions
        # u0's session state reset: referencing the dropped PREPARE raises
        # the loud session-expired contract, not a plain not-found
        err, _ = _run_query_as(s, "EXECUTE pe", "u0")
        assert err is not None and "Session expired" in err["message"]
        # a name that never existed in the fresh session is a plain
        # not-found again once the expiry was surfaced... (the expired flag
        # is per-session-instance, set only on the post-eviction rebuild)
        err, _ = _run_query_as(s, "PREPARE pe2 FROM SELECT 3 AS x", "u0")
        assert err is None
        # frequent use keeps a client resident (LRU, not FIFO)
        err, _ = _run_query_as(s, "PREPARE pk FROM SELECT 2 AS two", "hot")
        assert err is None
        for i in range(4, 6):
            _run_query_as(s, "SELECT 1", f"u{i}")
            err, rows = _run_query_as(s, "EXECUTE pk", "hot")  # touch
            assert err is None and rows == [[2]]
    finally:
        s.stop()


def test_eviction_skips_in_transaction_sessions(spark, oracle_dir):
    """A session with an open transaction is never LRU-evicted (evicting it
    would silently discard the txn and orphan its backup tables); it expires
    only after COMMIT/ROLLBACK."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        s.MAX_CLIENT_SESSIONS = 2
        err, _ = _run_query_as(s, "START TRANSACTION", "txer")
        assert err is None
        for i in range(4):  # would evict txer under plain LRU
            err, _ = _run_query_as(s, "SELECT 1", f"w{i}")
            assert err is None
        assert "txer" in s._sessions, "in-txn session must survive eviction pressure"
        err, _ = _run_query_as(s, "COMMIT", "txer")
        assert err is None
        for i in range(4, 8):
            _run_query_as(s, "SELECT 1", f"w{i}")
        assert "txer" not in s._sessions, "post-commit the session expires normally"
    finally:
        s.stop()


def test_cross_client_transaction_isolation_over_http(spark, oracle_dir):
    """READ COMMITTED between HTTP clients (r6 staging-based txns): an
    open transaction's DELETE is visible to the writer (read-your-writes
    via its session's staging shadow) but INVISIBLE to a concurrent
    client until COMMIT publishes; a brand-new client after COMMIT also
    sees the published data (generation-counter cache refresh)."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        err, _ = _run_query_as(
            s, "CREATE TABLE t_http_iso AS SELECT n_nationkey FROM nation", "w"
        )
        assert err is None
        err, _ = _run_query_as(s, "START TRANSACTION", "w")
        assert err is None
        err, _ = _run_query_as(s, "DELETE FROM t_http_iso WHERE n_nationkey >= 5", "w")
        assert err is None
        err, rows = _run_query_as(s, "SELECT count(*) AS n FROM t_http_iso", "w")
        assert err is None and rows == [[5]]
        err, rows = _run_query_as(s, "SELECT count(*) AS n FROM t_http_iso", "r")
        assert err is None and rows == [[25]], "dirty read leaked to another client"
        err, _ = _run_query_as(s, "COMMIT", "w")
        assert err is None
        err, rows = _run_query_as(s, "SELECT count(*) AS n FROM t_http_iso", "r")
        assert err is None and rows == [[5]]
        err, rows = _run_query_as(s, "SELECT count(*) AS n FROM t_http_iso", "fresh")
        assert err is None and rows == [[5]]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_http_iso")
        s.stop()


def test_txn_saturation_rejects_new_clients_loudly(spark, oracle_dir):
    """70-open-transaction churn: in-txn sessions are exempt from LRU
    eviction, so without a hard cap the session map would grow without
    bound.  Once open-txn holders alone reach HARD_MAX_SESSIONS, a NEW
    client is rejected with the loud TOO_MANY_SESSIONS error (never
    admitted silently, never force-evicting a transaction); one COMMIT
    frees a slot and admission resumes."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        # shrink the caps so the 70-client churn stays fast; the policy
        # under test is identical at the production 64/64 values
        s.MAX_CLIENT_SESSIONS = 8
        s.HARD_MAX_SESSIONS = 16
        admitted, rejected = [], []
        for i in range(70):
            err, _ = _run_query_as(s, "START TRANSACTION", f"t{i}")
            if err is None:
                admitted.append(f"t{i}")
            else:
                assert "TOO_MANY_SESSIONS" in err["message"], err
                assert err["errorName"] == "TooManySessionsError"
                rejected.append(f"t{i}")
        # exactly the hard cap was admitted; everyone else got the loud
        # error and the map stayed bounded
        assert len(admitted) == 16 and len(rejected) == 54
        assert len(s._sessions) <= s.HARD_MAX_SESSIONS
        # every admitted transaction is still alive (none force-evicted)
        assert all(c in s._sessions for c in admitted)
        # an in-txn holder keeps working while the server is saturated
        err, rows = _run_query_as(s, "SELECT 7 AS x", admitted[0])
        assert err is None and rows == [[7]]
        # COMMIT one -> a previously-rejected client is admitted again
        err, _ = _run_query_as(s, "COMMIT", admitted[0])
        assert err is None
        err, _ = _run_query_as(s, "START TRANSACTION", "late")
        assert err is None
        err, _ = _run_query_as(s, "ROLLBACK", "late")
        assert err is None
    finally:
        s.stop()


def test_kill_query_cancels_spark_jobs(spark, oracle_dir):
    """KILL actually cancels the Spark jobs (job-group cancel), so a
    long-running collect stops well before it would finish on its own —
    KillQueryProcedure cancels execution, not just protocol state."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        q = s.submit(
            "SELECT count(*) FROM lineitem l1 CROSS JOIN lineitem l2 CROSS JOIN lineitem l3"
        )
        # wait for it to be RUNNING (job group set in its thread)
        t0 = time.time()
        while True:
            with q.lock:
                if q.state == "RUNNING":
                    break
            assert time.time() - t0 < 30
            time.sleep(0.05)
        time.sleep(0.3)
        s._kill_query(q.query_id)
        with q.lock:
            assert q.state == "CANCELED"
        # the canceled query must never flip to FAILED/FINISHED afterwards
        time.sleep(1.0)
        with q.lock:
            assert q.state == "CANCELED"
    finally:
        s.stop()


def test_write_write_conflict_over_http(spark, oracle_dir):
    """Protocol-level pin for first-committer-wins (late r6): two HTTP
    clients transact over the same table; the first COMMIT publishes,
    the second COMMIT surfaces TRANSACTION_CONFLICT through the Presto
    error envelope, and both clients then read the winner's state."""
    s = srv.SqlServer(spark, oracle_dir).start()
    try:
        err, _ = _run_query_as(
            s, "CREATE TABLE t_http_ww AS SELECT n_nationkey FROM nation", "w1"
        )
        assert err is None
        for who in ("w1", "w2"):
            err, _ = _run_query_as(s, "START TRANSACTION", who)
            assert err is None
        err, _ = _run_query_as(s, "DELETE FROM t_http_ww WHERE n_nationkey >= 20", "w1")
        assert err is None
        err, _ = _run_query_as(s, "DELETE FROM t_http_ww WHERE n_nationkey >= 10", "w2")
        assert err is None
        err, _ = _run_query_as(s, "COMMIT", "w1")
        assert err is None
        err, _ = _run_query_as(s, "COMMIT", "w2")
        assert err is not None and "TRANSACTION_CONFLICT" in str(err)
        for who in ("w1", "w2"):
            err, rows = _run_query_as(s, "SELECT count(*) AS n FROM t_http_ww", who)
            assert err is None and rows == [[20]], who
    finally:
        spark.sql("DROP TABLE IF EXISTS t_http_ww")
        s.stop()
