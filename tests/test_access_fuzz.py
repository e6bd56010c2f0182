"""Model-differential fuzz for the access-control store (security-shaped
statement layer; reference AccessControlManager.java semantics).

Random GRANT/REVOKE/role-graph operation sequences are applied to BOTH the
real ``AccessControl`` and an independently-written naive model; after every
operation the full observable surface is compared: raised-vs-accepted,
``roles_of`` closures, every user x privilege x table ``check`` outcome,
and the SHOW GRANTS row set.  300 seeded sequences x 12 ops each — no
Spark session needed (pure Python), so the whole fuzz runs in seconds.
"""

from __future__ import annotations

import random

import pytest

from sensql_presto_spark.access import PRIVILEGES, AccessControl, AccessDeniedError

USERS = ["admin", "alice", "bob", "carol"]
ROLES = ["r1", "r2", "r3", "r4"]
TABLES = ["nation", "region"]


class NaiveModel:
    """Independent reimplementation: plain dict/set bookkeeping, closures
    recomputed from scratch on every query (no sharing with access.py)."""

    def __init__(self):
        self.roles: set[str] = set()
        # (kind, name) -> roles granted to it
        self.member: dict[tuple[str, str], set[str]] = {}
        # (kind, name, table, priv) -> grantable flag
        self.grants: dict[tuple[str, str, str, str], bool] = {}

    def create_role(self, role, user, enforce):
        if enforce and user != "admin":
            raise AccessDeniedError("denied")
        if role in self.roles or role == "public":
            raise ValueError("exists")
        self.roles.add(role)

    def drop_role(self, role, user, enforce):
        if enforce and user != "admin":
            raise AccessDeniedError("denied")
        if role not in self.roles:
            raise ValueError("missing")
        self.roles.discard(role)
        for members in self.member.values():
            members.discard(role)
        self.member.pop(("ROLE", role), None)
        for key in [k for k in self.grants if k[0] == "ROLE" and k[1] == role]:
            del self.grants[key]

    def grant_role(self, role, kind, grantee, user, enforce):
        if enforce and user != "admin":
            raise AccessDeniedError("denied")
        if role not in self.roles:
            raise ValueError("missing")
        self.member.setdefault((kind, grantee), set()).add(role)

    def revoke_role(self, role, kind, grantee, user, enforce):
        if enforce and user != "admin":
            raise AccessDeniedError("denied")
        if role not in self.member.get((kind, grantee), set()):
            raise ValueError("not granted")
        self.member[(kind, grantee)].discard(role)

    def roles_of(self, user):
        out = {"public"}
        changed = True
        frontier = set(self.member.get(("USER", user), set()))
        while changed:
            changed = False
            for r in list(frontier):
                if r not in out:
                    out.add(r)
                    frontier |= self.member.get(("ROLE", r), set())
                    changed = True
        return out

    def _can_grant(self, user, priv, table):
        if user == "admin":
            return True
        for kind, name in [("USER", user)] + [("ROLE", r) for r in self.roles_of(user)]:
            if self.grants.get((kind, name, table, priv)):
                return True
        return False

    def grant(self, privs, table, kind, grantee, user, enforce, grant_option=False):
        privs = PRIVILEGES if privs == ["ALL"] else privs
        if enforce:
            for p in privs:
                if not self._can_grant(user, p, table):
                    raise AccessDeniedError("denied")
        for p in privs:
            key = (kind, grantee, table, p)
            self.grants[key] = self.grants.get(key, False) or grant_option

    def revoke(self, privs, table, kind, grantee, user, enforce, grant_option_for=False):
        privs = PRIVILEGES if privs == ["ALL"] else privs
        if enforce:
            for p in privs:
                if not self._can_grant(user, p, table):
                    raise AccessDeniedError("denied")
        for p in privs:
            key = (kind, grantee, table, p)
            if grant_option_for:
                if key in self.grants:
                    self.grants[key] = False
            else:
                self.grants.pop(key, None)

    def check(self, user, roles, priv, table):
        if user == "admin":
            return
        for kind, name in [("USER", user)] + [("ROLE", r) for r in roles]:
            if (kind, name, table, priv) in self.grants:
                return
        raise AccessDeniedError("denied")


def _random_op(rng: random.Random):
    kind = rng.choice(
        ["create_role", "drop_role", "grant_role", "revoke_role", "grant", "revoke"]
    )
    user = rng.choice(USERS)
    enforce = rng.random() < 0.5
    if kind in ("create_role", "drop_role"):
        return (kind, rng.choice(ROLES), user, enforce)
    if kind in ("grant_role", "revoke_role"):
        gk = rng.choice(["USER", "ROLE"])
        grantee = rng.choice(USERS[1:]) if gk == "USER" else rng.choice(ROLES)
        return (kind, rng.choice(ROLES), gk, grantee, user, enforce)
    privs = ["ALL"] if rng.random() < 0.2 else [rng.choice(PRIVILEGES)]
    gk = rng.choice(["USER", "ROLE"])
    grantee = rng.choice(USERS[1:]) if gk == "USER" else rng.choice(ROLES)
    table = rng.choice(TABLES)
    if kind == "grant":
        return (kind, privs, table, gk, grantee, user, enforce, rng.random() < 0.3)
    return (kind, privs, table, gk, grantee, user, enforce, rng.random() < 0.3)


def _apply(target, op):
    """Apply op; return ('ok', None) or ('raise', exception class name)."""
    try:
        getattr(target, op[0])(*op[1:])
        return ("ok", None)
    except AccessDeniedError:
        return ("raise", "denied")
    except ValueError:
        return ("raise", "value")


def _observe(store: AccessControl, model: NaiveModel):
    obs_real, obs_model = [], []
    for u in USERS:
        real_roles = store.roles_of(u)
        model_roles = model.roles_of(u)
        obs_real.append(("roles", u, tuple(sorted(real_roles))))
        obs_model.append(("roles", u, tuple(sorted(model_roles))))
        for p in PRIVILEGES:
            for t in TABLES:
                try:
                    store.check(u, real_roles, p, t)
                    r = "allow"
                except AccessDeniedError:
                    r = "deny"
                try:
                    model.check(u, model_roles, p, t)
                    m = "allow"
                except AccessDeniedError:
                    m = "deny"
                obs_real.append(("check", u, p, t, r))
                obs_model.append(("check", u, p, t, m))
        obs_real.append(("grants", u, tuple(sorted(store.grants_for(u, real_roles)))))
        obs_model.append(
            (
                "grants",
                u,
                tuple(
                    sorted(
                        (name, kind, p, t, bool(g))
                        for (kind, name, t, p), g in model.grants.items()
                        if (kind == "USER" and name == u)
                        or (kind == "ROLE" and name in model.roles_of(u))
                    )
                ),
            )
        )
    return obs_real, obs_model


# --- DEFINER/INVOKER view-chain fuzz -----------------------------------
#
# r5 made view security first-class (statements.py: SECURITY DEFINER
# checks the CREATOR's rights at definition time and never again;
# SECURITY INVOKER defers to query time, where _check_table_access
# expands invoker-view bodies TRANSITIVELY against the READER — a
# definer view inside the chain stops the expansion).  This fuzz drives
# random grant / create-view / drop-view / read sequences through the
# REAL StatementSession statement surface (three sessions sharing one
# AccessControl store and one view catalog, the server's sharing shape)
# and compares every outcome against an independent naive model of the
# expansion semantics.

VIEW_NAMES = ["fv1", "fv2", "fv3", "fv4"]
VIEW_USERS = ["admin", "alice", "bob"]


class _DanglingView(Exception):
    """Model analog of Spark's TABLE_OR_VIEW_NOT_FOUND on view re-resolution."""


class NaiveViewModel:
    """Independent bookkeeping: view -> (mode, direct targets); SELECT
    grants as a flat (user, table) set; reachability recomputed from
    scratch per check, expanding only INVOKER views (seen-set guarded).
    Spark temp views re-resolve their bodies on every access, so a read
    (or a create over) a chain with a dropped inner view fails analysis —
    modeled by _resolve, which recurses through ALL view modes."""

    def __init__(self):
        self.views: dict[str, tuple[str, list[str]]] = {}
        self.sel: set[tuple[str, str]] = set()

    def _reachable_tables(self, targets):
        out, seen, frontier = set(), set(), list(targets)
        while frontier:
            x = frontier.pop()
            if x in TABLES:
                out.add(x)
            elif x in self.views and x not in seen:
                seen.add(x)
                mode, tg = self.views[x]
                if mode == "INVOKER":
                    frontier.extend(tg)
        return out

    def _resolve(self, targets, creating=None):
        # `creating`: Spark additionally rejects RECURSIVE_VIEW at CREATE
        # time (direct or indirect cycles back to the name being defined)
        seen, frontier = set(), list(targets)
        while frontier:
            x = frontier.pop()
            if x == creating:
                raise _DanglingView(f"recursive {x}")
            if x in TABLES or x in seen:
                continue
            if x not in self.views:
                raise _DanglingView(x)
            seen.add(x)
            frontier.extend(self.views[x][1])

    def _check(self, user, table):
        if user != "admin" and (user, table) not in self.sel:
            raise AccessDeniedError("denied")

    def create(self, name, mode, targets, creator, or_replace):
        if not or_replace and name in self.views:
            raise ValueError("exists")
        if mode == "DEFINER":
            for t in sorted(self._reachable_tables(targets)):
                self._check(creator, t)
        self._resolve(targets, creating=name)  # spark.sql CREATE analyzes the body
        self.views[name] = (mode, list(targets))

    def drop(self, name):
        if name not in self.views:
            raise ValueError("missing")
        del self.views[name]

    def read(self, name, reader):
        # enforcement runs BEFORE spark.sql in execute(), so access
        # denial takes precedence over a dangling chain
        for t in sorted(self._reachable_tables([name])):
            self._check(reader, t)
        self._resolve([name])


def _view_outcome(fn, *args):
    from pyspark.errors import AnalysisException

    try:
        fn(*args)
        return "ok"
    except AccessDeniedError:
        return "denied"
    except ValueError:
        return "value"
    except (AnalysisException, _DanglingView):
        return "analysis"


@pytest.fixture(scope="module")
def view_sessions(spark):
    from sensql_presto_spark.statements import StatementSession

    sessions = {
        u: StatementSession(
            spark, "/root/testdata/sf0.001", user=u,
            access=AccessControl(), enforce_access=True,
        )
        for u in VIEW_USERS
    }
    # one shared view catalog across all three (the server's shape: the
    # test_statements definer/invoker test shares the same way)
    shared_views, shared_sec = {}, {}
    for s in sessions.values():
        s.views, s.view_security = shared_views, shared_sec
    return sessions


@pytest.mark.parametrize("seed", range(120))
def test_view_security_fuzz_model_differential(seed, view_sessions):
    rng = random.Random(seed * 6271 + 31)
    model = NaiveViewModel()
    sessions = view_sessions
    store = AccessControl()
    for s in sessions.values():
        s.access = store
        s.views.clear()
        s.view_security.clear()
    for step in range(10):
        kind = rng.choice(["grant", "revoke", "create", "create", "read", "read", "drop"])
        if kind == "grant":
            u, t = rng.choice(VIEW_USERS[1:]), rng.choice(TABLES)
            real = _view_outcome(
                sessions["admin"].execute, f"GRANT SELECT ON {t} TO USER {u}"
            )
            model.sel.add((u, t))
            naive = "ok"
        elif kind == "revoke":
            u, t = rng.choice(VIEW_USERS[1:]), rng.choice(TABLES)
            real = _view_outcome(
                sessions["admin"].execute, f"REVOKE SELECT ON {t} FROM USER {u}"
            )
            model.sel.discard((u, t))
            naive = "ok"
        elif kind == "create":
            name = rng.choice(VIEW_NAMES)
            mode = rng.choice(["DEFINER", "INVOKER"])
            creator = rng.choice(VIEW_USERS)
            orr = rng.random() < 0.5
            pool = TABLES + sorted(model.views)
            targets = rng.sample(pool, k=min(len(pool), rng.choice([1, 1, 2])))
            body = " CROSS JOIN ".join(targets)
            sql = (
                f"CREATE {'OR REPLACE ' if orr else ''}VIEW {name} "
                f"SECURITY {mode} AS SELECT count(*) AS c FROM {body}"
            )
            real = _view_outcome(sessions[creator].execute, sql)
            naive = _view_outcome(model.create, name, mode, targets, creator, orr)
        elif kind == "drop":
            name = rng.choice(VIEW_NAMES)
            real = _view_outcome(sessions["admin"].execute, f"DROP VIEW {name}")
            naive = _view_outcome(model.drop, name)
        else:  # read
            if not model.views:
                continue
            name = rng.choice(sorted(model.views))
            reader = rng.choice(VIEW_USERS)
            real = _view_outcome(
                sessions[reader].execute, f"SELECT * FROM {name}"
            )
            naive = _view_outcome(model.read, name, reader)
        assert real == naive, (
            f"seed {seed} step {step}: {kind} diverged: real={real} naive={naive}"
        )


@pytest.mark.parametrize("seed", range(300))
def test_access_fuzz_model_differential(seed):
    rng = random.Random(seed * 7919 + 17)
    store, model = AccessControl(), NaiveModel()
    for step in range(12):
        op = _random_op(rng)
        r1 = _apply(store, op)
        r2 = _apply(model, op)
        assert r1 == r2, f"seed {seed} step {step}: outcome diverged on {op}: {r1} vs {r2}"
        obs_real, obs_model = _observe(store, model)
        assert obs_real == obs_model, (
            f"seed {seed} step {step}: state diverged after {op}:\n"
            + "\n".join(
                f"  real={a} model={b}" for a, b in zip(obs_real, obs_model) if a != b
            )
        )
