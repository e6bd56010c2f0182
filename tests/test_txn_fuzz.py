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
                f"DELETE FROM {t} WHERE n_nationkey % {m} = {r}"
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
                f"UPDATE {t} SET n_regionkey = n_regionkey + {delta} "
                f"WHERE n_nationkey % {m} = {r}"
            )
            for k in current():
                if k % m == r:
                    current()[k] += delta
        elif op == "insert":
            writer.execute(
                f"INSERT INTO {t} VALUES ({next_key}, {next_key % 7})"
            )
            current()[next_key] = next_key % 7
            next_key += 1
        elif op == "read_w":
            got = _observe(writer, t)
            want = sorted(current().items())
            assert got == want, f"seed {seed} step {step}: writer view diverged"
        else:  # read_r — the OTHER session must see only committed state
            got = _observe(reader, t)
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
