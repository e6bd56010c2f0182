"""Model-differential fuzz for staging-based transaction isolation (r6).

Random sequences of START TRANSACTION / DELETE / UPDATE / INSERT / COMMIT /
ROLLBACK on a WRITER session, interleaved with reads from BOTH the writer
and a FORKED reader session (the HTTP server's per-client shape), are
checked against an independent naive model that tracks two copies of the
table state: ``base`` (what every other session sees) and ``staged`` (the
writer's private in-transaction view).  The model's contract is exactly
the engine's documented one — read-your-writes inside the transaction,
READ COMMITTED for the other session, COMMIT publishes, ROLLBACK discards.

Reads compare the full sorted key set plus an integer value checksum, so a
divergence in either visibility or data content fails the seed.
"""

from __future__ import annotations

import random

import pytest

from sensql_presto_spark.statements import StatementSession

SF = "/root/testdata/sf0.001"
N_SEEDS = 12
OPS_PER_SEED = 9


@pytest.fixture(scope="module")
def txn_pair(spark):
    from sensql_presto_spark.cli import prepare_session

    writer = StatementSession(spark, SF)
    forked = spark.newSession()
    prepare_session(forked, SF)
    reader = StatementSession(forked, SF)
    return writer, reader


def _observe(sess: StatementSession, table: str):
    rows = sess.execute(
        f"SELECT n_nationkey, n_regionkey FROM {table}"
    ).collect()
    return sorted((int(r.n_nationkey), int(r.n_regionkey)) for r in rows)


def _spell(rng: random.Random, table: str) -> str:
    """Random spelling of one physical table — Spark resolution is
    case-insensitive and schema-optional, so every spelling must hit the
    same staging copy (r7: the qualified forms used to bypass the
    bare-name temp-view shadow, and two spellings used to cut two
    independent stages)."""
    return rng.choice(
        [table, table.upper(), f"default.{table}", f"spark_catalog.default.{table}"]
    )


@pytest.mark.parametrize("seed", range(N_SEEDS))
def test_txn_isolation_fuzz_model_differential(spark, txn_pair, seed):
    writer, reader = txn_pair
    rng = random.Random(seed * 4099 + 7)
    import shutil
    from urllib.parse import urlparse

    t = "t_txn_fuzz"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    writer.execute(
        f"CREATE TABLE {t} AS SELECT n_nationkey, n_regionkey FROM nation "
        f"WHERE n_nationkey < 12"
    )
    # model state: {key: regionkey}; staged is None outside a transaction
    base = {k: k % 5 for k in range(12)}
    staged: dict[int, int] | None = None
    next_key = 100

    def current():  # what the WRITER sees
        return staged if staged is not None else base

    for step in range(OPS_PER_SEED):
        op = rng.choice(
            ["begin", "delete", "update", "insert", "commit", "rollback",
             "read_w", "read_r", "read_r"]
        )
        if op == "begin":
            if staged is not None:
                with pytest.raises(ValueError, match="Nested"):
                    writer.execute("START TRANSACTION")
            else:
                writer.execute("START TRANSACTION")
                staged = dict(base)
        elif op == "commit":
            if staged is None:
                with pytest.raises(ValueError, match="No transaction"):
                    writer.execute("COMMIT")
            else:
                writer.execute("COMMIT")
                base = staged
                staged = None
        elif op == "rollback":
            if staged is None:
                with pytest.raises(ValueError, match="No transaction"):
                    writer.execute("ROLLBACK")
            else:
                writer.execute("ROLLBACK")
                staged = None
        elif op == "delete":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            out = writer.execute(
                f"DELETE FROM {_spell(rng, t)} WHERE n_nationkey % {m} = {r}"
            ).collect()[0]
            expected = [k for k in current() if k % m == r]
            assert out.rows == len(expected), f"seed {seed} step {step} delete count"
            for k in expected:
                del current()[k]
        elif op == "update":
            m = rng.randint(2, 5)
            r = rng.randint(0, m - 1)
            delta = rng.randint(1, 9)
            writer.execute(
                f"UPDATE {_spell(rng, t)} SET n_regionkey = n_regionkey + {delta} "
                f"WHERE n_nationkey % {m} = {r}"
            )
            for k in current():
                if k % m == r:
                    current()[k] += delta
        elif op == "insert":
            writer.execute(
                f"INSERT INTO {_spell(rng, t)} VALUES ({next_key}, {next_key % 7})"
            )
            current()[next_key] = next_key % 7
            next_key += 1
        elif op == "read_w":
            got = _observe(writer, _spell(rng, t))
            want = sorted(current().items())
            assert got == want, f"seed {seed} step {step}: writer view diverged"
        else:  # read_r — the OTHER session must see only committed state
            got = _observe(reader, _spell(rng, t))
            want = sorted(base.items())
            assert got == want, f"seed {seed} step {step}: reader saw uncommitted state"
    # close any open transaction and verify final convergence both sides
    if staged is not None:
        if rng.random() < 0.5:
            writer.execute("COMMIT")
            base = staged
        else:
            writer.execute("ROLLBACK")
    assert _observe(writer, t) == sorted(base.items())
    assert _observe(reader, t) == sorted(base.items())
    spark.sql(f"DROP TABLE IF EXISTS {t}")


N_WW_SEEDS = 10
WW_OPS_PER_SEED = 12


@pytest.fixture(scope="module")
def txn_writers(spark):
    from sensql_presto_spark.cli import prepare_session

    a = StatementSession(spark, SF)
    forked = spark.newSession()
    prepare_session(forked, SF)
    b = StatementSession(forked, SF)
    return a, b


@pytest.mark.parametrize("seed", range(N_WW_SEEDS))
def test_txn_two_writer_conflict_fuzz(spark, txn_writers, seed):
    """Model-differential fuzz for first-committer-wins write-write
    conflict detection (late r6): TWO writer sessions interleave random
    transactions over the SAME table.  The model tracks base state, each
    writer's staged copy, and a publish counter; a staged copy records
    the counter value at its FIRST write (the engine cuts the staging
    snapshot lazily at first touch), and COMMIT with writes must either
    publish (counter unmoved) or raise TRANSACTION_CONFLICT (another
    publish moved it), matching the engine exactly — including reads on
    both sides after aborts (the dead-file-listing regression)."""
    a, b = txn_writers
    rng = random.Random(seed * 7919 + 13)
    import shutil
    from urllib.parse import urlparse

    t = "t_txn_ww_fuzz"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    a.execute(
        f"CREATE TABLE {t} AS SELECT n_nationkey, n_regionkey FROM nation "
        f"WHERE n_nationkey < 10"
    )
    base = {k: k % 5 for k in range(10)}
    gen = 0  # publish counter for THIS table
    # per-writer: in_txn flag, staged dict (None until first write), snap gen
    st = {0: [False, None, 0], 1: [False, None, 0]}
    sessions = (a, b)
    next_key = 200

    def view(w):
        return st[w][1] if st[w][1] is not None else base

    for step in range(WW_OPS_PER_SEED):
        w = rng.randint(0, 1)
        sess = sessions[w]
        in_txn, staged, snap = st[w]
        op = rng.choice(["begin", "delete", "update", "insert", "commit",
                         "rollback", "read", "read"])
        if op == "begin":
            if in_txn:
                with pytest.raises(ValueError, match="Nested"):
                    sess.execute("START TRANSACTION")
            else:
                sess.execute("START TRANSACTION")
                st[w] = [True, None, 0]
        elif op == "commit":
            if not in_txn:
                with pytest.raises(ValueError, match="No transaction"):
                    sess.execute("COMMIT")
            elif staged is None:
                sess.execute("COMMIT")  # no writes -> nothing staged
                st[w] = [False, None, 0]
            elif gen > snap:
                with pytest.raises(ValueError, match="TRANSACTION_CONFLICT"):
                    sess.execute("COMMIT")
                st[w] = [False, None, 0]  # aborted; base unchanged
            else:
                sess.execute("COMMIT")
                base = dict(staged)
                gen += 1
                st[w] = [False, None, 0]
        elif op == "rollback":
            if not in_txn:
                with pytest.raises(ValueError, match="No transaction"):
                    sess.execute("ROLLBACK")
            else:
                sess.execute("ROLLBACK")
                st[w] = [False, None, 0]
        elif op == "read":
            got = _observe(sess, t)
            assert got == sorted(view(w).items()), (
                f"seed {seed} step {step}: writer {w} view diverged"
            )
        else:
            # a write: inside a txn it lazily cuts the staging snapshot;
            # outside it autocommits and bumps the publish counter
            if in_txn and staged is None:
                staged = dict(base)
                st[w] = [True, staged, gen]
            target = staged if in_txn else base
            if op == "delete":
                m = rng.randint(2, 5)
                r = rng.randint(0, m - 1)
                sess.execute(f"DELETE FROM {t} WHERE n_nationkey % {m} = {r}")
                for k in [k for k in target if k % m == r]:
                    del target[k]
            elif op == "update":
                m = rng.randint(2, 5)
                r = rng.randint(0, m - 1)
                d = rng.randint(1, 9)
                sess.execute(
                    f"UPDATE {t} SET n_regionkey = n_regionkey + {d} "
                    f"WHERE n_nationkey % {m} = {r}"
                )
                for k in target:
                    if k % m == r:
                        target[k] += d
            else:
                sess.execute(f"INSERT INTO {t} VALUES ({next_key}, {next_key % 7})")
                target[next_key] = next_key % 7
                next_key += 1
            if not in_txn:
                gen += 1
    # close both transactions; conflicts resolve per the model
    for w in (0, 1):
        in_txn, staged, snap = st[w]
        if not in_txn:
            continue
        if staged is None:
            sessions[w].execute("COMMIT")
        elif gen > snap:
            with pytest.raises(ValueError, match="TRANSACTION_CONFLICT"):
                sessions[w].execute("COMMIT")
        else:
            sessions[w].execute("COMMIT")
            base = dict(staged)
            gen += 1
        st[w] = [False, None, 0]
    assert _observe(a, t) == sorted(base.items())
    assert _observe(b, t) == sorted(base.items())
    spark.sql(f"DROP TABLE {t}")
