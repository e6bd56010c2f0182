"""HTTP SQL entry point — the reference's primary query path (SURVEY.md §3.1).

Implements the Presto client REST protocol shape over the Spark engine:

- ``POST /v1/statement`` with the SQL text as the request body submits a
  query and returns the first response document with a ``nextUri``
  (reference: ``presto-main/.../server/protocol/QueuedStatementResource.java:103``).
- ``GET /v1/statement/executing/{id}/{token}`` pages through results —
  each document carries ``columns``, a ``data`` page, query ``stats`` and,
  until the result set is drained, the next ``nextUri``
  (reference: ``server/protocol/ExecutingStatementResource.java``; the
  client loop is ``presto-client/.../StatementClient``).
- ``DELETE /v1/statement/executing/{id}/{token}`` cancels
  (``QueuedStatementResource.java`` cancelQuery).
- ``GET /v1/info`` reports server info like ``server/ServerInfoResource``.

State machine per query: QUEUED → RUNNING → FINISHED | FAILED | CANCELED —
the same client-visible states the reference's ``QueryState`` exposes.

Execution is Spark-native: statements run through the same
``cli.prepare_session`` surface (catalog views + Presto-name compat
functions + geospatial + SenSQL federation availability), on a worker
thread per query so the HTTP loop never blocks on a Spark job.  Result
paging slices the *collected* driver-side rows — the reference's protocol
also pages from coordinator memory after the root fragment drains
(``TaskOutputOperator`` → coordinator buffer), so this matches the
protocol's memory model; queries whose full result would not fit a driver
belong behind INSERT/CTAS, exactly as in the reference.
"""

from __future__ import annotations

import json
import threading
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import types as T

PAGE_ROWS = 1000


def _presto_type(dt: T.DataType) -> str:
    """Spark type → Presto type-signature string (presto-client ClientTypeSignature)."""
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "integer"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.FloatType):
        return "real"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "varchar"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.BinaryType):
        return "varbinary"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # Presto's plain timestamp is wall-clock; the engine pins session
        # TZ to UTC, so LTZ values also serialize as wall-clock strings
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return f"array({_presto_type(dt.elementType)})"
    if isinstance(dt, T.MapType):
        return f"map({_presto_type(dt.keyType)}, {_presto_type(dt.valueType)})"
    if isinstance(dt, T.StructType):
        inner = ", ".join(f"{f.name} {_presto_type(f.dataType)}" for f in dt.fields)
        return f"row({inner})"
    return dt.simpleString()


def _json_cell(v):
    import base64
    import datetime
    import decimal

    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode()
    if isinstance(v, dict):
        return {k: _json_cell(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_cell(x) for x in v]
    return v


class TooManySessionsError(RuntimeError):
    """Every reclaimable session slot is held by an open transaction.

    The LRU bound (``MAX_CLIENT_SESSIONS``) never evicts an in-transaction
    session, so open-txn holders are the one source of unbounded map
    growth; past ``HARD_MAX_SESSIONS`` new clients are rejected with this
    loud error (surfaced to the HTTP client as a failed query with
    errorName ``TooManySessionsError``) rather than admitted silently —
    the coordinator-resource-exhausted posture of the reference's
    queue-full errors (``presto-main/.../execution/QueryQueueManager``).
    """


@dataclass
class QueryExecution:
    query_id: str
    sql: str
    client: str = "anonymous"
    state: str = "QUEUED"
    columns: list | None = None
    rows: list | None = None
    error: dict | None = None
    cursor: int = 0
    token: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock)

    def snapshot_stats(self) -> dict:
        return {
            "state": self.state,
            "queued": self.state == "QUEUED",
            "scheduled": self.state in ("RUNNING", "FINISHED"),
            "completedSplits": self.cursor,
            "totalSplits": len(self.rows) if self.rows is not None else 0,
        }


class SqlServer:
    """Protocol server over one SparkSession (coordinator analog).

    ``max_concurrent`` is the resource-group admission control analog
    (reference: presto-main/.../execution/resourceGroups/
    InternalResourceGroup.java hardConcurrencyLimit): at most that many
    queries run simultaneously; excess submissions hold in the QUEUED
    state (visible to the polling client exactly like a queued Presto
    query) until a slot frees. 0 = unlimited.
    """

    def __init__(
        self,
        spark,
        sf_dir: str,
        host: str = "127.0.0.1",
        port: int = 0,
        max_concurrent: int = 0,
        enforce_access: bool = False,
    ):
        from sensql_presto_spark.access import AccessControl
        from sensql_presto_spark.cli import prepare_session

        from sensql_presto_spark.statements import StatementSession

        self.spark = spark
        self.sf_dir = sf_dir
        prepare_session(spark, sf_dir)
        # Statement state (PREPARE names, SET SESSION properties, temp
        # objects) is keyed per client identity (X-Presto-User /
        # X-Presto-Session header), matching the reference's per-Session
        # scoping in QueryPreparer / SystemSessionProperties.  Each client
        # gets a FORKED SparkSession (``spark.newSession()``): same
        # SparkContext/executors, but its own SQLConf and temp-view
        # catalog — so one client's SET SESSION (a SQLConf write) and
        # CREATE TEMP objects are invisible to every other client, exactly
        # the coordinator's Session isolation model.
        self._stmts_cls = StatementSession
        self._prepare = prepare_session
        # one AccessControl store for the whole server (coordinator scope):
        # an admin client's GRANT is visible to the granted user's next
        # query; enforcement mirrors the reference's configured-system-
        # access-control switch (off = AllowAllAccessControl)
        self._access = AccessControl()
        self._enforce_access = enforce_access
        self._sessions: dict[str, StatementSession] = {}
        # clients whose session state was LRU-evicted; their next session
        # raises the session-expired contract on dropped PREPARE references
        self._evicted: set[str] = set()
        self._sessions_lock = threading.Lock()
        self._slots = threading.Semaphore(max_concurrent) if max_concurrent > 0 else None
        self.queries: dict[str, QueryExecution] = {}
        self._httpd = ThreadingHTTPServer((host, port), self._handler_class())
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    # -- lifecycle ---------------------------------------------------------
    def start(self) -> "SqlServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    # -- query execution ---------------------------------------------------
    # Sessions beyond this count evict least-recently-used — the
    # reference's idle-session expiry (Session timeout in QueryManager
    # config) bounded by count instead of wall-clock, so a long-lived
    # server with many one-shot clients cannot accumulate forked
    # SparkSessions without bound. Durable state (grants, warehouse
    # tables) lives outside the session and survives eviction; only
    # session-scoped state (PREPARE names, SET SESSION, temp views) drops,
    # exactly what expiring an idle reference session drops.
    MAX_CLIENT_SESSIONS = 64
    # LRU eviction skips sessions holding an open transaction (evicting
    # one would orphan its backup tables), so in-txn holders are the only
    # way the map can grow past MAX_CLIENT_SESSIONS.  Beyond this hard
    # cap a NEW client is rejected with the loud TOO_MANY_SESSIONS error
    # instead of letting driver state grow without bound — the
    # query-queue-full / TOO_MANY_REQUESTS_FAILED posture of the
    # reference's coordinator resource limits.
    HARD_MAX_SESSIONS = 64

    def _reject_if_txn_saturated(self, client: str) -> None:
        """Admission check for a NEW client (callers hold _sessions_lock).

        Non-transactional sessions are always reclaimable by LRU, so the
        only unreclaimable pressure is open-transaction holders: when
        those alone reach HARD_MAX_SESSIONS, admitting another client
        would grow the map without bound.  Reject loudly; existing
        clients (including every in-txn holder) keep working, and one
        COMMIT/ROLLBACK frees a slot.
        """
        n_txn = sum(
            1
            for c, s in self._sessions.items()
            if c != client and getattr(s, "_in_txn", False)
        )
        if n_txn >= self.HARD_MAX_SESSIONS:
            raise TooManySessionsError(
                f"TOO_MANY_SESSIONS: {n_txn} sessions hold open transactions "
                f"(hard cap {self.HARD_MAX_SESSIONS}); COMMIT or ROLLBACK an "
                "existing transaction before opening new client sessions"
            )

    def _session_for(self, client: str) -> "object":
        with self._sessions_lock:
            sess = self._sessions.get(client)
            if sess is None:
                # reject BEFORE the (expensive) fork+prepare below
                self._reject_if_txn_saturated(client)
        if sess is None:
            # Build + prepare the forked session OUTSIDE the lock: parquet
            # footer reads and function registration take hundreds of ms and
            # must not stall every concurrent query on another client's
            # first request.  Double-checked insert below resolves races
            # (the first insert wins; a losing fork is just garbage).
            forked = self.spark.newSession()
            self._prepare(forked, self.sf_dir)
            sess = self._stmts_cls(
                forked,
                self.sf_dir,
                user=client,
                access=self._access,
                enforce_access=self._enforce_access,
            )
            # coordinator-bound procedure (KillQueryProcedure.java)
            sess.procedures["system.runtime.kill_query"] = self._kill_query
        with self._sessions_lock:
            if client not in self._sessions:
                # re-check admission: other clients may have opened
                # transactions while the fork+prepare ran unlocked
                self._reject_if_txn_saturated(client)
                # re-insert: either the fresh session built above, or a
                # previously-fetched one that a concurrent request evicted
                # between the two lock sections (still fully usable).  A
                # returning client whose state was LRU-evicted gets the
                # loud session-expired contract on any reference to dropped
                # PREPARE state, instead of a silently-fresh session.
                sess.session_expired = client in self._evicted
                self._evicted.discard(client)
                self._sessions[client] = sess
            # LRU order: move-to-end on every touch, evict from the front —
            # but never a session with an open transaction (evicting one
            # would silently discard the txn and orphan its backup tables);
            # in-txn sessions are skipped until they COMMIT/ROLLBACK.
            sess = self._sessions.pop(client)
            self._sessions[client] = sess
            over = len(self._sessions) - self.MAX_CLIENT_SESSIONS
            if over > 0:
                for victim in [
                    c
                    for c in self._sessions
                    if c != client and not getattr(self._sessions[c], "_in_txn", False)
                ][:over]:
                    self._sessions.pop(victim)
                    self._evicted.add(victim)
            return sess

    def _kill_query(self, query_id: str) -> None:
        q = self.queries.get(query_id)
        if q is None:
            raise ValueError(f"Query not found: {query_id}")
        with q.lock:
            if q.state in ("QUEUED", "RUNNING"):
                q.state = "CANCELED"
        # actually cancel the Spark jobs driving the query (KillQueryProcedure
        # cancels execution, not just protocol state): _run_admitted tags its
        # thread's jobs with the query_id job group on the shared SparkContext.
        try:
            self.spark.sparkContext.cancelJobGroup(query_id)
        except Exception:  # noqa: BLE001 — cancellation is best-effort
            pass

    def submit(self, sql: str, client: str = "anonymous") -> QueryExecution:
        q = QueryExecution(query_id=f"q_{uuid.uuid4().hex[:12]}", sql=sql, client=client)
        self.queries[q.query_id] = q
        threading.Thread(target=self._run, args=(q,), daemon=True).start()
        return q

    def _run(self, q: QueryExecution) -> None:
        if self._slots is not None:
            # admission control: stay QUEUED until a concurrency slot frees
            # (InternalResourceGroup.hardConcurrencyLimit behavior)
            while not self._slots.acquire(timeout=0.05):
                with q.lock:
                    if q.state == "CANCELED":
                        return
        try:
            self._run_admitted(q)
        finally:
            if self._slots is not None:
                self._slots.release()

    def _run_admitted(self, q: QueryExecution) -> None:
        with q.lock:
            if q.state == "CANCELED":
                return
            q.state = "RUNNING"
        try:
            sess = self._session_for(q.client)
            # tag this thread's Spark jobs with the query id so KILL / the
            # protocol DELETE can cancel the running jobs, not just flip the
            # protocol state (setJobGroup is thread-local on the shared
            # SparkContext; interruptOnCancel interrupts executor threads)
            sess.spark.sparkContext.setJobGroup(q.query_id, q.sql[:100], interruptOnCancel=True)
            try:
                df = sess.execute(q.sql)
                rows = [[_json_cell(v) for v in row] for row in df.collect()]
            finally:
                sess.spark.sparkContext.setJobGroup("", "")
            cols = [
                {"name": f.name, "type": _presto_type(f.dataType)} for f in df.schema.fields
            ]
            with q.lock:
                if q.state != "CANCELED":
                    q.columns, q.rows, q.state = cols, rows, "FINISHED"
        except Exception as exc:  # noqa: BLE001 — surfaced to the client as QueryError
            with q.lock:
                if q.state == "CANCELED":
                    # cancelJobGroup interrupted the collect — that is the
                    # expected kill path, not a query failure
                    return
                q.error = {
                    "message": str(exc).split("\n")[0][:500],
                    "errorCode": 1,
                    "errorName": type(exc).__name__,
                    "failureInfo": {"type": type(exc).__name__},
                }
                q.state = "FAILED"

    # -- protocol documents ------------------------------------------------
    def _document(self, q: QueryExecution, base: str) -> dict:
        with q.lock:
            doc: dict = {
                "id": q.query_id,
                "infoUri": f"{base}/v1/query/{q.query_id}",
                "stats": q.snapshot_stats(),
            }
            if q.state in ("QUEUED", "RUNNING"):
                doc["nextUri"] = f"{base}/v1/statement/executing/{q.query_id}/{q.token}"
            elif q.state == "FAILED":
                doc["error"] = q.error
            elif q.state == "CANCELED":
                doc["error"] = {"message": "Query was canceled", "errorName": "USER_CANCELED"}
            elif q.state == "FINISHED":
                doc["columns"] = q.columns
                page = q.rows[q.cursor : q.cursor + PAGE_ROWS]
                if page:
                    doc["data"] = page
                q.cursor += len(page)
                q.token += 1
                if q.cursor < len(q.rows):
                    doc["nextUri"] = f"{base}/v1/statement/executing/{q.query_id}/{q.token}"
        return doc

    # -- http plumbing -----------------------------------------------------
    def _handler_class(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet test output
                pass

            def _base(self) -> str:
                return f"http://{self.headers.get('Host', 'localhost')}"

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/v1/statement":
                    self._send(404, {"error": {"message": "not found"}})
                    return
                length = int(self.headers.get("Content-Length", 0))
                sql = self.rfile.read(length).decode()
                if not sql.strip():
                    self._send(400, {"error": {"message": "SQL statement is empty"}})
                    return
                client = self.headers.get("X-Presto-Session-Id") or self.headers.get(
                    "X-Presto-User", "anonymous"
                )
                q = server.submit(sql, client=client)
                self._send(200, server._document(q, self._base()))

            def do_GET(self):
                parts = self.path.strip("/").split("/")
                if self.path == "/v1/info":
                    self._send(
                        200,
                        {
                            "nodeVersion": {"version": "sensql-presto-spark"},
                            "coordinator": True,
                            "starting": False,
                        },
                    )
                    return
                if len(parts) == 5 and parts[:3] == ["v1", "statement", "executing"]:
                    q = server.queries.get(parts[3])
                    if q is None:
                        self._send(404, {"error": {"message": "unknown query"}})
                        return
                    self._send(200, server._document(q, self._base()))
                    return
                if len(parts) == 3 and parts[:2] == ["v1", "query"]:
                    # QueryResource.getQueryInfo — the infoUri target
                    q = server.queries.get(parts[2])
                    if q is None:
                        self._send(404, {"error": {"message": "unknown query"}})
                        return
                    with q.lock:
                        self._send(
                            200,
                            {
                                "queryId": q.query_id,
                                "state": q.state,
                                "query": q.sql,
                                "session": {"user": q.client},
                                "queryStats": q.snapshot_stats(),
                                "errorMessage": (q.error or {}).get("message"),
                            },
                        )
                    return
                self._send(404, {"error": {"message": "not found"}})

            def do_DELETE(self):
                parts = self.path.strip("/").split("/")
                if len(parts) == 5 and parts[:3] == ["v1", "statement", "executing"]:
                    q = server.queries.get(parts[3])
                    if q is not None:
                        try:
                            server._kill_query(q.query_id)
                        except ValueError:
                            pass
                        self.send_response(204)
                        self.end_headers()
                        return
                self._send(404, {"error": {"message": "not found"}})

        return Handler


def main() -> None:
    import argparse
    import os

    from sensql_presto_spark.session import get_spark

    ap = argparse.ArgumentParser(description="Presto-protocol HTTP SQL server on Spark")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    )
    args = ap.parse_args()
    server = SqlServer(get_spark(), args.sf_dir, port=args.port).start()
    print(f"listening on http://127.0.0.1:{server.port}/v1/statement")
    threading.Event().wait()


if __name__ == "__main__":
    main()
