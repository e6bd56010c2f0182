"""Training-data pipeline operators (beyond-reference; SURVEY.md §7.8).

The reference engine has no dedup/similarity/multimodal surface — these are
the operations a large-scale LLM training-data pipeline runs on top of the
relational core, built here as first-class oracle-checked queries over the
``documents`` and ``embeddings`` tables.

Every operator is a DataFrame→DataFrame transform with no driver-side
state, designed around one shuffle-bounding idea each:

- exact dedup        — hash-groupBy; one shuffle on the content hash.
- n-gram Jaccard     — inverted-index join on shingles (shuffle on
                       shingle, never O(n²) pairs); hot-shingle cap noted.
- MinHash + LSH      — signature → band → bucket-join; candidate pairs
                       only, verified by exact Jaccard.
- SimHash            — 32-bit signature, 4-byte banding; the band join is
                       *complete* for hamming ≤ 3 by pigeonhole.
- embedding cosine   — brute-force pairs as the correctness baseline; the
                       IVF variant is the scale path (bucket-pruned).
- text analysis      — pure column expressions (whole-stage codegen).
- multimodal         — binary payload + typed metadata through
                       ``mapInPandas`` (Arrow batches), deterministic fake
                       decode (real decoders stubbed in
                       ``sensql_presto_spark.multimodal``).

All hash functions that feed an oracle comparison use an explicit
polynomial hash (acc*31 + byte mod 1e9+7) written identically in Spark SQL
and DuckDB SQL, so results match bit-for-bit; xxhash64 (JVM-side, faster)
is used only where the oracle re-verifies through exact Jaccard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sensql_presto_spark import catalog
from sensql_presto_spark.queries.registry import register
from sensql_presto_spark.queries.relational import _sql_query

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

# Exact dedup: hash-groupBy on md5(text). The corpus is the documents table
# with injected copies (doc_id % 50 == 0 re-inserted under new ids) so the
# query provably removes something. One shuffle, partial agg map-side;
# at 100 TB this is the canonical "hash the content, keep min id" pass.
_sql_query(
    "dedup_exact",
    """
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 50 = 0
    )
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    HAVING count(*) > 1
    ORDER BY keep_id
    """,
    tags=("pipeline", "dedup"),
    bench=True,
)

# The REPARTITION hint narrows downstream stages; Spark inlines CTEs, so
# branches referencing sh recompute it — the hint keeps each recomputation
# cheap and the layout aligned for the verify joins.
_SPARK_SHINGLES = """
    tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT /*+ REPARTITION(32, doc_id) */ doc_id,
               array_distinct(transform(sequence(0, size(t) - 3),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
        FROM tok WHERE size(t) >= 3
    )
"""

_DUCK_SHINGLES = """
    sh AS (
        SELECT doc_id,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              for i in range(1, len(t) - 1)]) AS shingles
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        WHERE len(t) >= 3
    )
"""

# Hot-key frequency caps (r8 VERDICT What's-wrong #3).  The prefix filter
# already routes each doc through its RAREST shingles, but on a
# boilerplate-heavy corpus (many documents sharing their full text) even
# the rarest shingle of a doc can carry document frequency ~n, fattening
# one equi-join key into an O(hot²) skew straggler at 100x scale.  The cap
# excludes shingles with df > _HOT_SHINGLE_CAP from CANDIDATE GENERATION
# (verification is untouched), bounding every posting list — candidate
# volume <= cap · prefix_rows instead of n².  CONTRACT (stated
# precisely): a true near-dup pair is missed iff every SHARED prefix
# shingle of the pair is hot — the prefix-filter theorem guarantees at
# least one shared prefix shingle exists, not that any particular COLD
# one is shared, so a pair whose only common prefix key is boilerplate
# is dropped even when other (unshared) prefix shingles are cold.  At
# J >= 0.9 the docs are near-identical, so their prefixes almost
# coincide and a hot shared key means the pair itself is boilerplate —
# exactly the mass-duplicate cluster that dedup_exact's full-text hash
# already removes upstream (measured fixture
# headroom: max prefix df = 11 at sf0.1, cap = 64 — the cap cannot fire
# on the standard fixtures; the boilerplate fixture test pins both the
# bound and the injected-near-dup recall).  Same constant, same semantics
# in the Spark plan and the DuckDB oracle.
_HOT_SHINGLE_CAP = 64

# DuckDB oracle for near-dup pairs at jaccard >= 0.9.  Candidate
# generation uses the same prefix-filter theorem as the Spark plan (any
# pair at J >= 0.9 MUST share one of each doc's floor(0.1*|A|)+1 rarest
# shingles, so the candidate set is provably COMPLETE) and the final
# output is defined purely by the exact-Jaccard verification — the result
# set is identical to the O(n²) all-pairs form, but the oracle runs in
# O(candidate pairs).  The r3 full-registry sf0.1 sweep spent ~45 min in
# the all-pairs DuckDB join (5k docs -> 12.5M list_intersect calls);
# this form keeps routine sf0.1 sweeps cheap.
_DUCK_JACCARD_PAIRS = f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    df AS (SELECT s, count(*) AS df FROM inv GROUP BY s),
    ranked AS (
        SELECT i.doc_id, i.s, z.n, d.df,
               row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.s) AS rk
        FROM inv i JOIN df d ON i.s = d.s JOIN sizes z ON i.doc_id = z.doc_id
    ),
    prefix AS (SELECT doc_id, s FROM ranked
               WHERE rk <= CAST(floor(0.1 * n) AS INT) + 1
                 AND df <= {_HOT_SHINGLE_CAP}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN prefix b ON a.s = b.s AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / (len(sa.shingles) + len(sb.shingles)
                    - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh sa ON c.id_a = sa.doc_id
    JOIN sh sb ON c.id_b = sb.doc_id
    WHERE len(list_intersect(sa.shingles, sb.shingles)) * 1.0
          / (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles))) >= 0.9
    ORDER BY id_a, id_b
"""

# Near-dup via exact prefix filtering (AllPairs): index only each doc's
# floor(0.1*|A|)+1 globally-rarest shingles — any pair with jaccard >= 0.9
# MUST collide inside those prefixes (prefix-filter theorem), so candidate
# generation is complete while hot shingles never enter the join (the
# naive full inverted index joins f^2 rows per shingle of doc-frequency f,
# a measured 4x slowdown on this vocabulary-dense corpus). Candidates are
# then verified with the exact Jaccard.
# r9 perf: the all-SQL form recomputed the shingle CTE across its four
# referencing branches (inv + the two verify joins) — measured 8.0s at
# sf0.1.  The minhash r2 cure applies verbatim: MATERIALIZE the shingle
# set once via localCheckpoint and let every branch read the in-memory
# relation (same-session median 4.4s, 1.8x; the residual is candidate
# generation + the verify joins themselves, not recomputation; results
# re-verified EXACT at both scales).
_NGRAM_JACCARD_SQL = f"""
    WITH sizes AS (SELECT doc_id, size(shingles) AS n FROM __nj_sh),
    inv AS (SELECT doc_id, explode(shingles) AS s FROM __nj_sh),
    df AS (SELECT s, count(*) AS df FROM inv GROUP BY s),
    ranked AS (
        SELECT i.doc_id, i.s, z.n, d.df,
               row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.s) AS rk
        FROM inv i JOIN df d ON i.s = d.s JOIN sizes z ON i.doc_id = z.doc_id
    ),
    prefix AS (SELECT doc_id, s FROM ranked
               WHERE rk <= cast(floor(0.1 * n) AS INT) + 1
                 AND df <= {_HOT_SHINGLE_CAP}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN prefix b ON a.s = b.s AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(size(array_intersect(sa.shingles, sb.shingles))
                 / (sa.n2 + sb.n2 - size(array_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN (SELECT doc_id, shingles, size(shingles) AS n2 FROM __nj_sh) sa ON c.id_a = sa.doc_id
    JOIN (SELECT doc_id, shingles, size(shingles) AS n2 FROM __nj_sh) sb ON c.id_b = sb.doc_id
    WHERE size(array_intersect(sa.shingles, sb.shingles))
          / (sa.n2 + sb.n2 - size(array_intersect(sa.shingles, sb.shingles))) >= 0.9
    """


# --- session-scoped staging memo + unique-view SQL helper ------------------
# r9 VERDICT next-round #3 + r9 ADVICE (low): (a) the verified near-dup
# machinery (shingle sets, prefix-filter Jaccard pairs) is consumed by
# THREE bench entries (dedup_ngram_jaccard itself, dedup_eval_pr,
# dedup_cluster_assignment) yet was rebuilt inside each — a production
# pipeline lands the verified pairs in a staging table once and fans out;
# the memo is that staging table, keyed on the SparkSession OBJECT
# (WeakKeyDictionary, the same hazard-handling as catalog.register_views)
# plus (tag, sf_dir): forked sessions (spark.newSession(), one per
# server.py client) share an applicationId but have PER-SESSION temp-view
# catalogs, so an applicationId key would hand session B a DataFrame
# whose views resolve only in session A (r10 ADVICE, medium).  Keying on
# the session object also gives eviction — when a session is collected,
# its entry goes with it instead of pinning localCheckpoint RDDs forever.
# A restarted session or a different corpus never sees a stale entry,
# and the memo SHRINKS checkpoint accumulation (one pair RDD instead of
# three).
# (b) fixed session-global temp-view names made re-entrant builds clobber
# each other; _sql_with_views registers each relation under a fresh
# uuid-suffixed name, analyzes the SQL (spark.sql resolves eagerly), then
# drops the views — the returned DataFrame keeps the resolved plan.
import weakref as _weakref

_STAGE_MEMO: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def _session_memo(spark: SparkSession, tag: str, sf_dir: str, build):
    per_session = _STAGE_MEMO.get(spark)
    if per_session is None:
        per_session = _STAGE_MEMO.setdefault(spark, {})
    key = (tag, sf_dir)
    df = per_session.get(key)
    if df is None:
        df = build()
        per_session[key] = df
    return df


def _sql_with_views(
    spark: SparkSession, sql: str, sf_dir: "str | None" = None, **views
) -> DataFrame:
    import re as _re
    import uuid

    names = {}
    for placeholder, df in views.items():
        name = f"{placeholder}_{uuid.uuid4().hex}"
        df.createOrReplaceTempView(name)
        names[placeholder] = name
        # whole-token substitution only (r10 ADVICE, low): a plain
        # str.replace would silently corrupt any identifier that merely
        # CONTAINS the placeholder (e.g. __po inside __postings)
        sql, n_subs = _re.subn(rf"\b{_re.escape(placeholder)}\b", name, sql)
        if n_subs == 0:
            raise ValueError(
                f"placeholder '{placeholder}' does not occur as a whole "
                "token in the SQL"
            )
    try:
        if sf_dir is not None:  # the query also reads catalog tables
            return catalog.sql(spark, sf_dir, sql)
        return spark.sql(sql)
    finally:
        for name in names.values():
            spark.catalog.dropTempView(name)


def _shingle_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed distinct-3-gram shingle sets, built once per
    (session, sf_dir) and shared by the ngram/minhash family."""
    return _session_memo(
        spark,
        "shingle_sets",
        sf_dir,
        lambda: catalog.sql(
            spark, sf_dir, f"WITH {_SPARK_SHINGLES} SELECT * FROM sh"
        ).localCheckpoint(eager=True),
    )


def _ngram_jaccard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The un-materialized pair-generation plan (prefix-filter candidates
    + exact Jaccard >= 0.9) — split out so tests/test_plans.py can pin
    the candidate join's shape, which the checkpointed memo would hide."""
    return _sql_with_views(
        spark, _NGRAM_JACCARD_SQL, __nj_sh=_shingle_sets(spark, sf_dir)
    )


def _ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed verified near-dup pair list, built once per
    (session, sf_dir)."""
    return _session_memo(
        spark,
        "ngram_jaccard_pairs",
        sf_dir,
        lambda: _ngram_jaccard_plan(spark, sf_dir).localCheckpoint(eager=True),
    )


@register(
    "dedup_ngram_jaccard",
    oracle=_DUCK_JACCARD_PAIRS,
    tags=("pipeline", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ngram_jaccard_pairs(spark, sf_dir).orderBy("id_a", "id_b")

# MinHash + LSH: 64-hash signature over shingles, 16 bands × 4 rows,
# bucket-join on (band, band-hash), then exact-Jaccard verification of
# candidates. Only candidate pairs are verified — the LSH prunes the O(n²)
# space; at jaccard ≥ 0.9 the per-pair miss probability is (1 - 0.9⁴)¹⁶ ≈
# 4e-8, so the output equals the exact-Jaccard oracle.
#
# Perf shape (measured, sf0.1): higher-order-function lambdas are
# interpreted, not codegen'd — computing the 64-slot signature as nested
# transform()/array_min() costs ~200s for 96M lambda evals. The fast
# Spark-native shape is explode shingles to rows, string-hash once, then
# take the signature as 64 independent codegen'd min(xxhash64(h, i))
# aggregates in ONE hash aggregate (partial map-side), and band with
# direct multi-arg xxhash64 + stack().
#
# Round-2 perf fix: Spark inlines CTEs, so the round-1 all-SQL form
# recomputed the shingle set three times (signatures + both verify joins)
# — 49% of the whole benchmark. The builder now MATERIALIZES the shingle
# set and the band table via localCheckpoint(eager=True): each is computed
# exactly once, and the bucket stats + self-join + both verify joins read
# the materialized RDD. (persist() + temp views measurably did NOT
# substitute the in-memory relation here — .explain showed six parquet
# rescans — so the checkpoint is load-bearing, not cosmetic.) At cluster
# scale the same shape is a checkpoint / staging table — materialize once,
# fan out.
#
# Hot-band guard: a degenerate band value shared by f docs contributes f²
# candidate rows; buckets above _MINHASH_BAND_CAP are skipped (the docs in
# them still pair through their other 15 bands with probability
# 1-(1-0.9⁴)¹⁵ ≈ 1 at the 0.9 threshold). The cap never trips at test
# scale — it bounds worst-case join fanout at corpus scale, mirroring the
# prefix-filter justification above. Buckets of size 1 are pruned too
# (they cannot produce a pair), which shrinks the self-join input.

_MINHASH_BAND_CAP = 10_000

_MINHASH_SIG_SQL = (
    "SELECT doc_id,\n"
    + ",\n".join(f"       min(xxhash64(h, {i})) AS m{i}" for i in range(64))
    + """
    FROM (SELECT doc_id, xxhash64(s) AS h
          FROM (SELECT doc_id, explode(shingles) AS s FROM __mh_sh))
    GROUP BY doc_id
    """
)

_MINHASH_BANDS_SQL = (
    "SELECT doc_id, stack(16,\n"
    + ",\n".join(
        f"       {b}, xxhash64(m{4 * b}, m{4 * b + 1}, m{4 * b + 2}, m{4 * b + 3})"
        for b in range(16)
    )
    + f") AS (b, bh) FROM ({_MINHASH_SIG_SQL})"
)

_MINHASH_VERIFY_SQL = f"""
    WITH ok_buckets AS (
        SELECT b, bh FROM __mh_bands
        GROUP BY b, bh
        HAVING count(*) >= 2 AND count(*) <= {_MINHASH_BAND_CAP}
    ),
    bands_ok AS (
        SELECT t.doc_id, t.b, t.bh
        FROM __mh_bands t JOIN ok_buckets k ON t.b = k.b AND t.bh = k.bh
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands_ok a JOIN bands_ok b
          ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(size(array_intersect(sa.shingles, sb.shingles))
                 / (size(sa.shingles) + size(sb.shingles)
                    - size(array_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
    FROM cand c
    JOIN __mh_sh sa ON c.id_a = sa.doc_id
    JOIN __mh_sh sb ON c.id_b = sb.doc_id
    WHERE size(array_intersect(sa.shingles, sb.shingles))
          / (size(sa.shingles) + size(sb.shingles)
             - size(array_intersect(sa.shingles, sb.shingles))) >= 0.9
    ORDER BY id_a, id_b
    """


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed 16-band minhash band table, built once per
    (session, sf_dir) and shared by the lsh/incremental entries."""
    return _session_memo(
        spark,
        "minhash_bands",
        sf_dir,
        lambda: _sql_with_views(
            spark, _MINHASH_BANDS_SQL, __mh_sh=_shingle_sets(spark, sf_dir)
        ).localCheckpoint(eager=True),
    )


@register(
    "dedup_minhash_lsh",
    oracle=_DUCK_JACCARD_PAIRS,
    tags=("pipeline", "dedup"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_sets(spark, sf_dir)
    bands = _minhash_bands(spark, sf_dir)
    return _sql_with_views(
        spark, _MINHASH_VERIFY_SQL, __mh_sh=sh, __mh_bands=bands
    )

# SimHash over 3-gram shingle sets: 32-bit signature, 4-byte banding. A
# pair at hamming ≤ 3 must agree on ≥ 1 band (pigeonhole: 3 differing bits
# can dirty at most 3 of 4 bands), so the band join is a *complete*
# candidate generator and the output equals the O(n²) oracle's. (Token-SET
# simhash is degenerate on this corpus — most docs contain most of the
# small vocabulary — so the signature is built over shingles.)
#
# Perf shape: the char-level polynomial hash (interpreted HOF) runs only
# over the DISTINCT token vocabulary (~dozens of rows); shingle hashes are
# assembled arithmetically from the three token hashes via window leads
# (codegen), and the 32 bit-sums + signature assembly are plain codegen'd
# aggregates. Both engines compute hash((h1*131+h2)*131+h3 mod p)
# identically, so the oracle matches bit-for-bit.
# r13 scan-audit fix: the band self-join (bands a JOIN bands b) used to
# inline the ENTIRE signature pipeline (tokenize -> vocab hash -> shingle
# window -> 32 bit-sums) once per side, and dedup_eval_pr inlined that
# doubled subtree again — the signature table is therefore staged as a
# localCheckpoint (doc-sized: one row per document) and the band join
# reads it twice for free.  SQL below is the r12 text verbatim, split at
# the sim boundary.
_SIMHASH_SIG_SQL = """
    WITH tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    trows AS (SELECT doc_id, posexplode(t) AS (pos, tk) FROM tok WHERE size(t) >= 3),
    vocab AS (SELECT DISTINCT tk FROM trows),
    vhash AS (
        SELECT tk, aggregate(split(tk, ''), 131L,
                             (acc, c) -> (acc * 31 + ascii(c)) % 1000000007) AS h
        FROM vocab
    ),
    hrows AS (SELECT r.doc_id, r.pos, v.h FROM trows r JOIN vhash v ON r.tk = v.tk),
    shingle_rows AS (
        SELECT doc_id,
               ((h * 131 + lead(h, 1) OVER w) % 1000000007 * 131
                + lead(h, 2) OVER w) % 1000000007 AS sg,
               lead(h, 2) OVER w AS h3
        FROM hrows
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    shset AS (SELECT DISTINCT doc_id, sg FROM shingle_rows WHERE h3 IS NOT NULL),
    bits AS (
        SELECT doc_id,
               sum(CASE WHEN (sg >> 0) & 1 = 1 THEN 1 ELSE -1 END) AS s0,
               sum(CASE WHEN (sg >> 1) & 1 = 1 THEN 1 ELSE -1 END) AS s1,
               sum(CASE WHEN (sg >> 2) & 1 = 1 THEN 1 ELSE -1 END) AS s2,
               sum(CASE WHEN (sg >> 3) & 1 = 1 THEN 1 ELSE -1 END) AS s3,
               sum(CASE WHEN (sg >> 4) & 1 = 1 THEN 1 ELSE -1 END) AS s4,
               sum(CASE WHEN (sg >> 5) & 1 = 1 THEN 1 ELSE -1 END) AS s5,
               sum(CASE WHEN (sg >> 6) & 1 = 1 THEN 1 ELSE -1 END) AS s6,
               sum(CASE WHEN (sg >> 7) & 1 = 1 THEN 1 ELSE -1 END) AS s7,
               sum(CASE WHEN (sg >> 8) & 1 = 1 THEN 1 ELSE -1 END) AS s8,
               sum(CASE WHEN (sg >> 9) & 1 = 1 THEN 1 ELSE -1 END) AS s9,
               sum(CASE WHEN (sg >> 10) & 1 = 1 THEN 1 ELSE -1 END) AS s10,
               sum(CASE WHEN (sg >> 11) & 1 = 1 THEN 1 ELSE -1 END) AS s11,
               sum(CASE WHEN (sg >> 12) & 1 = 1 THEN 1 ELSE -1 END) AS s12,
               sum(CASE WHEN (sg >> 13) & 1 = 1 THEN 1 ELSE -1 END) AS s13,
               sum(CASE WHEN (sg >> 14) & 1 = 1 THEN 1 ELSE -1 END) AS s14,
               sum(CASE WHEN (sg >> 15) & 1 = 1 THEN 1 ELSE -1 END) AS s15,
               sum(CASE WHEN (sg >> 16) & 1 = 1 THEN 1 ELSE -1 END) AS s16,
               sum(CASE WHEN (sg >> 17) & 1 = 1 THEN 1 ELSE -1 END) AS s17,
               sum(CASE WHEN (sg >> 18) & 1 = 1 THEN 1 ELSE -1 END) AS s18,
               sum(CASE WHEN (sg >> 19) & 1 = 1 THEN 1 ELSE -1 END) AS s19,
               sum(CASE WHEN (sg >> 20) & 1 = 1 THEN 1 ELSE -1 END) AS s20,
               sum(CASE WHEN (sg >> 21) & 1 = 1 THEN 1 ELSE -1 END) AS s21,
               sum(CASE WHEN (sg >> 22) & 1 = 1 THEN 1 ELSE -1 END) AS s22,
               sum(CASE WHEN (sg >> 23) & 1 = 1 THEN 1 ELSE -1 END) AS s23,
               sum(CASE WHEN (sg >> 24) & 1 = 1 THEN 1 ELSE -1 END) AS s24,
               sum(CASE WHEN (sg >> 25) & 1 = 1 THEN 1 ELSE -1 END) AS s25,
               sum(CASE WHEN (sg >> 26) & 1 = 1 THEN 1 ELSE -1 END) AS s26,
               sum(CASE WHEN (sg >> 27) & 1 = 1 THEN 1 ELSE -1 END) AS s27,
               sum(CASE WHEN (sg >> 28) & 1 = 1 THEN 1 ELSE -1 END) AS s28,
               sum(CASE WHEN (sg >> 29) & 1 = 1 THEN 1 ELSE -1 END) AS s29,
               sum(CASE WHEN (sg >> 30) & 1 = 1 THEN 1 ELSE -1 END) AS s30,
               sum(CASE WHEN (sg >> 31) & 1 = 1 THEN 1 ELSE -1 END) AS s31
        FROM shset GROUP BY doc_id
    ),
    sim AS (
        SELECT doc_id,
               (CASE WHEN s0 >= 0 THEN 1L ELSE 0L END)
               + (CASE WHEN s1 >= 0 THEN 2L ELSE 0L END)
               + (CASE WHEN s2 >= 0 THEN 4L ELSE 0L END)
               + (CASE WHEN s3 >= 0 THEN 8L ELSE 0L END)
               + (CASE WHEN s4 >= 0 THEN 16L ELSE 0L END)
               + (CASE WHEN s5 >= 0 THEN 32L ELSE 0L END)
               + (CASE WHEN s6 >= 0 THEN 64L ELSE 0L END)
               + (CASE WHEN s7 >= 0 THEN 128L ELSE 0L END)
               + (CASE WHEN s8 >= 0 THEN 256L ELSE 0L END)
               + (CASE WHEN s9 >= 0 THEN 512L ELSE 0L END)
               + (CASE WHEN s10 >= 0 THEN 1024L ELSE 0L END)
               + (CASE WHEN s11 >= 0 THEN 2048L ELSE 0L END)
               + (CASE WHEN s12 >= 0 THEN 4096L ELSE 0L END)
               + (CASE WHEN s13 >= 0 THEN 8192L ELSE 0L END)
               + (CASE WHEN s14 >= 0 THEN 16384L ELSE 0L END)
               + (CASE WHEN s15 >= 0 THEN 32768L ELSE 0L END)
               + (CASE WHEN s16 >= 0 THEN 65536L ELSE 0L END)
               + (CASE WHEN s17 >= 0 THEN 131072L ELSE 0L END)
               + (CASE WHEN s18 >= 0 THEN 262144L ELSE 0L END)
               + (CASE WHEN s19 >= 0 THEN 524288L ELSE 0L END)
               + (CASE WHEN s20 >= 0 THEN 1048576L ELSE 0L END)
               + (CASE WHEN s21 >= 0 THEN 2097152L ELSE 0L END)
               + (CASE WHEN s22 >= 0 THEN 4194304L ELSE 0L END)
               + (CASE WHEN s23 >= 0 THEN 8388608L ELSE 0L END)
               + (CASE WHEN s24 >= 0 THEN 16777216L ELSE 0L END)
               + (CASE WHEN s25 >= 0 THEN 33554432L ELSE 0L END)
               + (CASE WHEN s26 >= 0 THEN 67108864L ELSE 0L END)
               + (CASE WHEN s27 >= 0 THEN 134217728L ELSE 0L END)
               + (CASE WHEN s28 >= 0 THEN 268435456L ELSE 0L END)
               + (CASE WHEN s29 >= 0 THEN 536870912L ELSE 0L END)
               + (CASE WHEN s30 >= 0 THEN 1073741824L ELSE 0L END)
               + (CASE WHEN s31 >= 0 THEN 2147483648L ELSE 0L END) AS simhash
        FROM bits
    )
    SELECT doc_id, simhash FROM sim
    """

_SIMHASH_PAIRS_SQL = """
    WITH bands AS (
        SELECT doc_id, simhash, b, shiftright(simhash, b * 8) & 255 AS bv
        FROM __sh_sim LATERAL VIEW explode(sequence(0, 3)) t AS b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sh_a,
                        b.doc_id AS id_b, b.simhash AS sh_b
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, cast(bit_count(sh_a ^ sh_b) AS INT) AS hamming
    FROM cand
    WHERE bit_count(sh_a ^ sh_b) <= 3
    ORDER BY id_a, id_b
    """

_SIMHASH_ORACLE = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                 WHERE len(string_split(text, ' ')) >= 3),
    th AS (
        SELECT doc_id,
               [list_reduce(list_prepend(131::BIGINT,
                                         [ascii(c)::BIGINT for c in string_split(x, '')]),
                            (a, b) -> (a * 31 + b) % 1000000007) for x in t] AS hs
        FROM tok
    ),
    shs AS (
        SELECT doc_id,
               list_distinct([((hs[i] * 131 + hs[i+1]) % 1000000007 * 131
                               + hs[i+2]) % 1000000007
                              for i in range(1, len(hs) - 1)]) AS shs
        FROM th
    ),
    sim AS (
        SELECT doc_id, CAST(list_sum([CASE WHEN list_sum([CASE WHEN ((x >> 0) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 1::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 1) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 2::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 2) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 4::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 3) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 8::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 4) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 16::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 5) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 32::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 6) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 64::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 7) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 128::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 8) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 256::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 9) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 512::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 10) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 1024::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 11) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 2048::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 12) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 4096::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 13) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 8192::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 14) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 16384::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 15) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 32768::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 16) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 65536::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 17) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 131072::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 18) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 262144::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 19) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 524288::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 20) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 1048576::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 21) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 2097152::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 22) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 4194304::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 23) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 8388608::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 24) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 16777216::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 25) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 33554432::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 26) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 67108864::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 27) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 134217728::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 28) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 268435456::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 29) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 536870912::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 30) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 1073741824::BIGINT ELSE 0 END, CASE WHEN list_sum([CASE WHEN ((x >> 31) & 1) = 1 THEN 1 ELSE -1 END for x in shs]) >= 0 THEN 2147483648::BIGINT ELSE 0 END]) AS BIGINT) AS simhash
        FROM shs
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sim a JOIN sim b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY id_a, id_b
    """


@register(
    "dedup_simhash",
    oracle=_SIMHASH_ORACLE,
    tags=("pipeline", "dedup"),
    doc="SimHash near-dup pairs (hamming <= 3) over 3-gram shingles: "
    "32-bit signature, 4-byte pigeonhole banding as a complete candidate "
    "generator; the doc-sized signature table is checkpointed once (r13) "
    "so the band self-join never re-runs the signature pipeline.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    sim = catalog.sql(spark, sf_dir, _SIMHASH_SIG_SQL).localCheckpoint(eager=True)
    return _sql_with_views(spark, _SIMHASH_PAIRS_SQL, __sh_sim=sim)

# Embedding near-dup: brute-force cosine over all pairs — the correctness
# baseline (top-10 most-similar pairs). The a.vec_id < b.vec_id join is the
# O(n²) path by design; at scale use sim_ivf_topk's bucket pruning or
# sign-LSH banding instead. Cast to double before the dot product so both
# engines accumulate in float64.
_sql_query(
    "dedup_embedding_cosine",
    """
    WITH e AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm FROM e),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cos
        FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos, 4) AS cos_sim
    FROM p ORDER BY cos DESC, id_a, id_b LIMIT 10
    """,
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               list_cosine_similarity(a.v, b.v) AS cos
        FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, round(cos, 4) AS cos_sim
    FROM p ORDER BY cos DESC, id_a, id_b LIMIT 10
    """,
    tags=("pipeline", "dedup", "similarity"),
)

# ---------------------------------------------------------------------------
# Clustering
# ---------------------------------------------------------------------------

# Distributed k-means (Lloyd's algorithm, k=8, two fixed iterations) over
# the embedding corpus — the document-clustering primitive of a training-
# data pipeline (topic balancing, per-cluster sampling).  Scale shape per
# iteration: the k x 64 centroid table is a broadcast join against the
# distributed corpus (no corpus shuffle), assignment is a min_by argmin
# aggregate (partial agg collapses the k candidates per vector map-side,
# so the exchange carries n unsorted rows — not a sort-shuffle of n*k as
# a row_number window would), and the recompute is ONE groupBy(cid, pos)
# shuffle of k*64-bounded partial sums (map-side combine makes the final
# shuffle O(partitions * k * dims), not O(n)).
# In production the loop runs to convergence with a localCheckpoint per
# round (same discipline as dedup_connected_components); two iterations
# are fixed here so the DuckDB oracle is an exact replay.
#
# Determinism discipline: element values are quantized to integer
# milliunits (round(x*1000)) so distances are exact BIGINT sums; centroid
# elements are re-rounded to integers each iteration (round(sum/count) —
# one IEEE-exact double division of two exact ints), so both engines
# agree bit-for-bit and the output hash is stable.  Ties in the argmin
# break on cluster id.
_sql_query(
    "cluster_kmeans",
    """
    WITH q AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    d1 AS (
        SELECT q.vec_id, q.v, c0.cid,
               aggregate(zip_with(q.v, c0.cv, (x, y) -> (x - y) * (x - y)),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dist
        FROM q CROSS JOIN c0
    ),
    -- argmin as min_by (ties: dist then cid), NOT a row_number window:
    -- the partial aggregate collapses the k candidate rows per vector
    -- map-side, so the exchange carries n rows unsorted instead of
    -- sort-shuffling n*k
    m1 AS (
        SELECT vec_id,
               min_by(named_struct('cid', cid, 'v', v),
                      named_struct('d', dist, 'c', cid)).cid AS cid,
               min_by(named_struct('cid', cid, 'v', v),
                      named_struct('d', dist, 'c', cid)).v AS v
        FROM d1 GROUP BY vec_id
    ),
    c1 AS (
        SELECT cid,
               transform(array_sort(collect_list(named_struct('pos', pos, 'cval', cval))),
                         t -> t.cval) AS cv
        FROM (
            SELECT cid, pos, cast(round(cast(sum(val) AS double) / count(1)) AS bigint) AS cval
            FROM m1 LATERAL VIEW posexplode(v) t AS pos, val
            GROUP BY cid, pos
        )
        GROUP BY cid
    ),
    d2 AS (
        SELECT q.vec_id, c1.cid,
               aggregate(zip_with(q.v, c1.cv, (x, y) -> (x - y) * (x - y)),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dist
        FROM q CROSS JOIN c1
    ),
    m2 AS (
        SELECT vec_id,
               min_by(cid, named_struct('d', dist, 'c', cid)) AS cid
        FROM d2 GROUP BY vec_id
    )
    SELECT cid AS cluster_id,
           count(1) AS n_members,
           sum(vec_id) AS id_checksum,
           min(vec_id) AS first_member
    FROM m2 GROUP BY cid ORDER BY cid
    """,
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    d1 AS (
        SELECT q.vec_id, q.v, c0.cid,
               list_sum([(q.v[i] - c0.cv[i]) * (q.v[i] - c0.cv[i])
                         FOR i IN generate_series(1, 64)]) AS dist
        FROM q CROSS JOIN c0
    ),
    m1 AS (
        SELECT vec_id, v, cid FROM (
            SELECT vec_id, v, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
            FROM d1
        ) WHERE rk = 1
    ),
    c1 AS (
        SELECT cid, list(cval ORDER BY pos) AS cv
        FROM (
            SELECT cid, i - 1 AS pos,
                   CAST(round(CAST(sum(v[i]) AS DOUBLE) / count(*)) AS BIGINT) AS cval
            FROM m1, UNNEST(generate_series(1, 64)) AS t(i)
            GROUP BY cid, i
        )
        GROUP BY cid
    ),
    d2 AS (
        SELECT q.vec_id, c1.cid,
               list_sum([(q.v[i] - c1.cv[i]) * (q.v[i] - c1.cv[i])
                         FOR i IN generate_series(1, 64)]) AS dist
        FROM q CROSS JOIN c1
    ),
    m2 AS (
        SELECT vec_id, cid FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
            FROM d2
        ) WHERE rk = 1
    )
    SELECT cid AS cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(vec_id) AS BIGINT) AS id_checksum,
           min(vec_id) AS first_member
    FROM m2 GROUP BY cid ORDER BY cid
    """,
    tags=("pipeline", "clustering", "kmeans"),
    doc="Distributed k-means (Lloyd, k=8, 2 iterations): centroid broadcast "
    "join + min_by argmin + one k*dims-bounded recompute shuffle per round; "
    "integer-milliunits quantization keeps both engines bit-identical.",
    bench=True,
)

# SemDeDup-style semantic dedup (Abbas et al. 2023): bucket the corpus by
# nearest seed centroid, then compare pairs ONLY within a bucket and drop
# the higher id of any pair with cosine > 2/5.  Scale shape: the E-step
# assignment is TWO-LEVEL (the IVF trick, same as sim_ivf_topk) — the k
# seed centroids (k ~ n/64, SemDeDup keeps expected cluster size constant)
# are first coarse-quantized into m = floor(sqrt(k)) cells, each vector
# picks its nearest cell (O(n*sqrt(k)) work against a sqrt(k)-sized
# broadcast side), and then probes ONLY that cell's centroids via an
# equi-join on cell (O(n*k/m) average) — never the O(n*k) = O(n^2/64)
# full cross join.  m is CAPPED at 4096 (least(m, 4096)) so the per-vector
# cell scan stays constant-bounded at any corpus size; since k ∝ n/64 the
# capped coarse pass stays sublinear-per-row up to k ~ 16M centroids
# (~1B vectors), beyond which a third quantization level (cells-of-cells,
# the same trick applied once more) would be the 100 TB-scale move.  Every cell that receives a vector contains at least
# its own seed centroid (a seed's distance to itself is 0, exact-tie
# duplicates collapse to the same lower cell id on both sides), so the
# inner probe join cannot drop vectors.  The all-pairs comparison is
# confined to each cluster (sum of n_c^2, not n^2), clusters can be
# repartitioned independently, and every distance/threshold test is EXACT
# integer arithmetic on milliunit-quantized vectors — cos > t is evaluated
# as dot > 0 AND 25*dot^2 > 4*|a|^2*|b|^2 (t = 2/5), ties broken on id —
# so no float summation order can flip an assignment or a pair and the
# oracle matches bit-for-bit.
# The assignment subtree (quantize -> coarse cells -> probe -> norms) is
# consumed TWICE by the pair self-join; Spark inlines CTEs, so the all-SQL
# form recomputed all three assignment joins per side.  Like
# dedup_minhash_lsh, the builder MATERIALIZES the assigned+normed vectors
# once via localCheckpoint (at cluster scale: a staging table) and the
# self-join reads the materialized relation.
# r13: the quantized corpus q is staged (localCheckpoint) before the
# assign SQL — inlined, the q CTE re-ran the parquet scan + quantize
# transform once per reference (params / c0 / c1 / vcell = 4 corpus
# scans per assign build).
_SEM_Q_SQL = """
    SELECT vec_id,
           transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
    FROM embeddings
    """

_SEM_ASSIGN_SQL = """
    WITH q AS (SELECT vec_id, v FROM __sem_q),
    params AS (
        SELECT k, greatest(cast(4 AS bigint),
                           least(cast(4096 AS bigint),
                                 cast(floor(sqrt(cast(k AS double))) AS bigint))) AS m
        FROM (SELECT greatest(cast(8 AS bigint), count(1) DIV 64) AS k FROM q)
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM q
           WHERE vec_id < (SELECT k FROM params)),
    c1 AS (SELECT vec_id AS cell, v AS cellv FROM q
           WHERE vec_id < (SELECT m FROM params)),
    -- coarse-quantize the k centroids into m cells: O(k*sqrt(k)) work
    cmap AS (
        SELECT cid,
               min_by(named_struct('cell', cell, 'cv', cv),
                      named_struct('d', dist, 'c', cell)).cell AS cell,
               min_by(named_struct('cell', cell, 'cv', cv),
                      named_struct('d', dist, 'c', cell)).cv AS cv
        FROM (
            SELECT c0.cid, c0.cv, c1.cell,
                   aggregate(zip_with(c0.cv, c1.cellv, (x, y) -> (x - y) * (x - y)),
                             cast(0 AS bigint), (acc, x) -> acc + x) AS dist
            FROM c0 CROSS JOIN c1
        )
        GROUP BY cid
    ),
    -- each vector picks its coarse cell: O(n*sqrt(k)), c1 broadcast
    vcell AS (
        SELECT vec_id,
               min_by(named_struct('cell', cell, 'v', v),
                      named_struct('d', dist, 'c', cell)).cell AS cell,
               min_by(named_struct('cell', cell, 'v', v),
                      named_struct('d', dist, 'c', cell)).v AS v
        FROM (
            SELECT q.vec_id, q.v, c1.cell,
                   aggregate(zip_with(q.v, c1.cellv, (x, y) -> (x - y) * (x - y)),
                             cast(0 AS bigint), (acc, x) -> acc + x) AS dist
            FROM q CROSS JOIN c1
        )
        GROUP BY vec_id
    ),
    -- probe ONLY the centroids in the vector's cell (equi-join on cell)
    assign AS (
        SELECT vec_id,
               min_by(named_struct('cid', cid, 'v', v),
                      named_struct('d', dist, 'c', cid)).cid AS cid,
               min_by(named_struct('cid', cid, 'v', v),
                      named_struct('d', dist, 'c', cid)).v AS v
        FROM (
            SELECT vcell.vec_id, vcell.v, cmap.cid,
                   aggregate(zip_with(vcell.v, cmap.cv, (x, y) -> (x - y) * (x - y)),
                             cast(0 AS bigint), (acc, x) -> acc + x) AS dist
            FROM vcell JOIN cmap ON vcell.cell = cmap.cell
        )
        GROUP BY vec_id
    ),
    n AS (
        SELECT vec_id, v, cid,
               aggregate(v, cast(0 AS bigint), (acc, x) -> acc + x * x) AS nrm2
        FROM assign
    )
    SELECT vec_id, v, cid, nrm2 FROM n
    """

_SEM_PAIRS_SQL = """
    WITH pairs AS (
        SELECT a.cid, a.vec_id AS kept_id, b.vec_id AS dropped_id,
               aggregate(zip_with(a.v, b.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               a.nrm2 AS na2, b.nrm2 AS nb2
        -- REPARTITION keeps the interpreted-HOF dot products 32-way
        -- parallel (AQE would coalesce the checkpoint-fed join to one
        -- task); measured 2x on the pair stage at sf0.1
        FROM (SELECT /*+ REPARTITION(32, cid) */ * FROM __sem_n) a
        JOIN __sem_n b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT cid AS cluster_id, kept_id, dropped_id
    FROM pairs
    WHERE dot > 0 AND 25 * dot * dot > 4 * na2 * nb2
    ORDER BY cid, kept_id, dropped_id
    """


@register(
    "dedup_semantic",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    params AS (
        SELECT k, greatest(4, least(4096, CAST(floor(sqrt(CAST(k AS DOUBLE))) AS BIGINT))) AS m
        FROM (SELECT greatest(8, count(*) // 64) AS k FROM q)
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM q
           WHERE vec_id < (SELECT k FROM params)),
    c1 AS (SELECT vec_id AS cell, v AS cellv FROM q
           WHERE vec_id < (SELECT m FROM params)),
    cmap AS (
        SELECT cid, cv, cell FROM (
            SELECT c0.cid, c0.cv, c1.cell,
                   row_number() OVER (
                       PARTITION BY c0.cid
                       ORDER BY list_sum([(c0.cv[i] - c1.cellv[i]) * (c0.cv[i] - c1.cellv[i])
                                          FOR i IN generate_series(1, 64)]), c1.cell
                   ) AS rk
            FROM c0 CROSS JOIN c1
        ) WHERE rk = 1
    ),
    vcell AS (
        SELECT vec_id, v, cell FROM (
            SELECT q.vec_id, q.v, c1.cell,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_sum([(q.v[i] - c1.cellv[i]) * (q.v[i] - c1.cellv[i])
                                          FOR i IN generate_series(1, 64)]), c1.cell
                   ) AS rk
            FROM q CROSS JOIN c1
        ) WHERE rk = 1
    ),
    assign AS (
        SELECT vec_id, v, cid FROM (
            SELECT vcell.vec_id, vcell.v, cmap.cid,
                   row_number() OVER (
                       PARTITION BY vcell.vec_id
                       ORDER BY list_sum([(vcell.v[i] - cmap.cv[i]) * (vcell.v[i] - cmap.cv[i])
                                          FOR i IN generate_series(1, 64)]), cmap.cid
                   ) AS rk
            FROM vcell JOIN cmap ON vcell.cell = cmap.cell
        ) WHERE rk = 1
    ),
    n AS (
        SELECT vec_id, v, cid,
               CAST(list_sum([x * x FOR x IN v]) AS BIGINT) AS nrm2
        FROM assign
    ),
    pairs AS (
        SELECT a.cid, a.vec_id AS kept_id, b.vec_id AS dropped_id,
               CAST(list_sum([a.v[i] * b.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               a.nrm2 AS na2, b.nrm2 AS nb2
        FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
    )
    SELECT cid AS cluster_id, kept_id, dropped_id
    FROM pairs
    WHERE dot > 0 AND 25 * dot * dot > 4 * na2 * nb2
    ORDER BY cid, kept_id, dropped_id
    """,
    tags=("pipeline", "dedup", "clustering", "semantic"),
    doc="SemDeDup: centroid-bucketed within-cluster cosine dedup with an "
    "exact-integer threshold test (no float flakiness), pairwise work "
    "bounded by per-cluster sizes instead of n^2; two-level IVF-style "
    "centroid assignment keeps E-step work at O(n*sqrt(k)), not O(n*k).",
    bench=True,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _sem_assign_plan(spark, sf_dir).localCheckpoint(eager=True)
    n.createOrReplaceTempView("__sem_n")
    return spark.sql(_SEM_PAIRS_SQL)


def _sem_assign_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-level IVF assignment plan over the staged quantized
    corpus (split out so tests/test_plans.py can pin its join shapes)."""
    q = catalog.sql(spark, sf_dir, _SEM_Q_SQL).localCheckpoint(eager=True)
    return _sql_with_views(spark, _SEM_ASSIGN_SQL, __sem_q=q)

# Cluster-balanced sampling: take the SAME number of items from every
# semantic cluster (topic balancing for pretraining mixes — the cluster
# twin of text_stratified_sample's per-language strata). One k-means
# E-step assigns clusters (centroid broadcast, min_by argmin, zero corpus
# shuffle), then a deterministic Knuth-multiplicative hash ranks within
# each cluster and the top-8 survive — reproducible across runs/engines,
# no rand(). Scale: one exchange for the per-cluster rank window; the
# hash ranking avoids any global sort.
_sql_query(
    "cluster_balanced_sample",
    """
    WITH q AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    assign AS (
        SELECT vec_id,
               min_by(cid, named_struct('d', dist, 'c', cid)) AS cid
        FROM (
            SELECT q.vec_id, c0.cid,
                   aggregate(zip_with(q.v, c0.cv, (x, y) -> (x - y) * (x - y)),
                             cast(0 AS bigint), (acc, x) -> acc + x) AS dist
            FROM q CROSS JOIN c0
        )
        GROUP BY vec_id
    ),
    ranked AS (
        SELECT vec_id, cid,
               row_number() OVER (
                   PARTITION BY cid
                   ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
               ) AS rk
        FROM assign
    )
    SELECT cid AS cluster_id, rk AS sample_rank, vec_id
    FROM ranked WHERE rk <= 8
    ORDER BY cid, rk
    """,
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, v AS cv FROM q WHERE vec_id < 8),
    assign AS (
        SELECT vec_id, cid FROM (
            SELECT q.vec_id, c0.cid,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_sum([(q.v[i] - c0.cv[i]) * (q.v[i] - c0.cv[i])
                                          FOR i IN generate_series(1, 64)]), c0.cid
                   ) AS rk
            FROM q CROSS JOIN c0
        ) WHERE rk = 1
    ),
    ranked AS (
        SELECT vec_id, cid,
               row_number() OVER (
                   PARTITION BY cid
                   ORDER BY (vec_id * 2654435761) % 4294967296, vec_id
               ) AS rk
        FROM assign
    )
    SELECT cid AS cluster_id, rk AS sample_rank, vec_id
    FROM ranked WHERE rk <= 8
    ORDER BY cid, rk
    """,
    tags=("pipeline", "clustering", "sampling"),
    doc="Cluster-balanced sampling: k-means E-step assignment + "
    "deterministic Knuth-hash top-8 per cluster — topic-balanced "
    "subcorpus selection with zero randomness.",
)

# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# Brute-force top-k: the query set (vec_id < 5) is tiny so Catalyst
# broadcasts it — the plan is a single scan of the corpus against a
# broadcast probe set + per-query top-k (WindowGroupLimit), which is the
# right distributed shape: no shuffle of the corpus at all.
_sql_query(
    "sim_topk_bruteforce",
    """
    WITH e AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               aggregate(zip_with(q.v, c.v, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cos
        FROM q JOIN n c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, rk, round(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cos
        FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, rk, round(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    tags=("pipeline", "similarity"),
    bench=True,
)

# IVF-style ANN: centroids = element-wise mean per label (deterministic
# training), every vector assigned to its nearest centroid, queries probe
# only their own bucket (nprobe=1). The scan is pruned to ~1/C of the
# corpus per query — the scale path. Oracle replicates the same logic, so
# this checks the *mechanism* exactly (recall vs brute force is asserted in
# tests/test_pipeline.py).
_sql_query(
    "sim_ivf_topk",
    """
    WITH e AS (SELECT vec_id, label, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
    cpos AS (
        SELECT label, pos, avg(val) AS m
        FROM (SELECT label, posexplode(v) AS (pos, val) FROM e)
        GROUP BY label, pos
    ),
    cent AS (
        SELECT label AS c_id,
               transform(array_sort(collect_list(struct(pos, m))), s -> s.m) AS cv
        FROM cpos GROUP BY label
    ),
    cnorm AS (SELECT c_id, cv, sqrt(aggregate(cv, cast(0 AS double), (a, x) -> a + x * x)) AS cnrm FROM cent),
    n AS (SELECT vec_id, v, sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm FROM e),
    assign AS (
        SELECT vec_id, max_by(c_id, cos) AS bucket
        FROM (
            SELECT n.vec_id, c.c_id,
                   aggregate(zip_with(n.v, c.cv, (x, y) -> x * y), cast(0 AS double),
                             (acc, x) -> acc + x) / (n.nrm * c.cnrm) AS cos
            FROM n CROSS JOIN cnorm c
        )
        GROUP BY vec_id
    ),
    corpus AS (SELECT n.vec_id, n.v, n.nrm, a.bucket FROM n JOIN assign a ON n.vec_id = a.vec_id),
    q AS (SELECT * FROM corpus WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               aggregate(zip_with(q.v, c.v, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cos
        FROM q JOIN corpus c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, rk, round(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 3
    ORDER BY query_id, rk
    """,
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cpos AS (
        SELECT label, i AS pos, avg(v[i]) AS m
        FROM e, range(1, 65) t(i)
        GROUP BY label, i
    ),
    cent AS (SELECT label AS c_id, list(m ORDER BY pos) AS cv FROM cpos GROUP BY label),
    assign AS (
        SELECT vec_id, arg_max(c_id, cos) AS bucket
        FROM (
            SELECT e.vec_id, c.c_id, list_cosine_similarity(e.v, c.cv) AS cos
            FROM e CROSS JOIN cent c
        )
        GROUP BY vec_id
    ),
    corpus AS (SELECT e.vec_id, e.v, a.bucket FROM e JOIN assign a ON e.vec_id = a.vec_id),
    q AS (SELECT * FROM corpus WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cos
        FROM q JOIN corpus c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, rk, round(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 3
    ORDER BY query_id, rk
    """,
    tags=("pipeline", "similarity"),
)


# Sign-LSH (random-hyperplane) bucketing: the LSH scale path for embedding
# near-dup / similarity (complements sim_ivf_topk). 16 deterministic
# hyperplanes — component (j, d) is pure arithmetic, identical in both
# engines — give a 16-bit signature, split into two 8-bit tables; docs
# colliding in either table become candidates, candidates are verified
# with exact cosine and the top-10 pairs are emitted. The oracle replicates
# the mechanism exactly (like sim_ivf_topk, this checks the machinery;
# recall properties are inherent to sign-LSH).
#
# Perf shape: signatures are 16 codegen'd sum() aggregates over the
# posexploded (vec_id, dim, x) rows — no interpreted lambdas on the
# per-vector hot path; only candidate verification uses zip_with.
_sql_query(
    "sim_lsh_hyperplane",
    """
    WITH e AS (SELECT vec_id, transform(embedding, v -> cast(v AS double)) AS v FROM embeddings),
    rows_ AS (SELECT vec_id, posexplode(v) AS (d, x) FROM e),
    proj AS (
        SELECT vec_id,
               sum(x * ((cast(((0L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p0,
               sum(x * ((cast(((1L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p1,
               sum(x * ((cast(((2L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p2,
               sum(x * ((cast(((3L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p3,
               sum(x * ((cast(((4L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p4,
               sum(x * ((cast(((5L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p5,
               sum(x * ((cast(((6L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p6,
               sum(x * ((cast(((7L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p7,
               sum(x * ((cast(((8L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p8,
               sum(x * ((cast(((9L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p9,
               sum(x * ((cast(((10L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p10,
               sum(x * ((cast(((11L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p11,
               sum(x * ((cast(((12L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p12,
               sum(x * ((cast(((13L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p13,
               sum(x * ((cast(((14L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p14,
               sum(x * ((cast(((15L * 2654435761 + d * 40503 + 12345) % 1009) AS DOUBLE)) / 1009.0 - 0.5)) AS p15
        FROM rows_ GROUP BY vec_id
    ),
    sig AS (
        SELECT vec_id,
               (CASE WHEN p0 >= 0 THEN 1L ELSE 0L END) + (CASE WHEN p1 >= 0 THEN 2L ELSE 0L END) + (CASE WHEN p2 >= 0 THEN 4L ELSE 0L END) + (CASE WHEN p3 >= 0 THEN 8L ELSE 0L END) + (CASE WHEN p4 >= 0 THEN 16L ELSE 0L END) + (CASE WHEN p5 >= 0 THEN 32L ELSE 0L END) + (CASE WHEN p6 >= 0 THEN 64L ELSE 0L END) + (CASE WHEN p7 >= 0 THEN 128L ELSE 0L END) AS band0,
               (CASE WHEN p8 >= 0 THEN 1L ELSE 0L END) + (CASE WHEN p9 >= 0 THEN 2L ELSE 0L END) + (CASE WHEN p10 >= 0 THEN 4L ELSE 0L END) + (CASE WHEN p11 >= 0 THEN 8L ELSE 0L END) + (CASE WHEN p12 >= 0 THEN 16L ELSE 0L END) + (CASE WHEN p13 >= 0 THEN 32L ELSE 0L END) + (CASE WHEN p14 >= 0 THEN 64L ELSE 0L END) + (CASE WHEN p15 >= 0 THEN 128L ELSE 0L END) AS band1
        FROM proj
    ),
    bands AS (
        SELECT vec_id, b, if(b = 0, band0, band1) AS bv
        FROM sig LATERAL VIEW explode(sequence(0, 1)) t AS b
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.vec_id < b.vec_id
    ),
    n AS (SELECT vec_id, v, sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm FROM e),
    ver AS (
        SELECT c.id_a, c.id_b,
               aggregate(zip_with(na.v, nb.v, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (na.nrm * nb.nrm) AS cos
        FROM cand c JOIN n na ON c.id_a = na.vec_id JOIN n nb ON c.id_b = nb.vec_id
    )
    SELECT id_a, id_b, round(cos, 4) AS cos_sim
    FROM ver ORDER BY cos DESC, id_a, id_b LIMIT 10
    """,
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    proj AS (
        SELECT vec_id,
               list_sum([v[d] * (((0::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p0, list_sum([v[d] * (((1::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p1, list_sum([v[d] * (((2::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p2, list_sum([v[d] * (((3::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p3, list_sum([v[d] * (((4::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p4, list_sum([v[d] * (((5::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p5, list_sum([v[d] * (((6::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p6, list_sum([v[d] * (((7::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p7, list_sum([v[d] * (((8::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p8, list_sum([v[d] * (((9::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p9, list_sum([v[d] * (((10::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p10, list_sum([v[d] * (((11::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p11, list_sum([v[d] * (((12::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p12, list_sum([v[d] * (((13::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p13, list_sum([v[d] * (((14::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p14, list_sum([v[d] * (((15::BIGINT * 2654435761 + (d-1) * 40503 + 12345) % 1009) / 1009.0 - 0.5) for d in range(1, 65)]) AS p15
        FROM e
    ),
    sig AS (
        SELECT vec_id,
               (CASE WHEN p0 >= 0 THEN 1::BIGINT ELSE 0 END) + (CASE WHEN p1 >= 0 THEN 2::BIGINT ELSE 0 END) + (CASE WHEN p2 >= 0 THEN 4::BIGINT ELSE 0 END) + (CASE WHEN p3 >= 0 THEN 8::BIGINT ELSE 0 END) + (CASE WHEN p4 >= 0 THEN 16::BIGINT ELSE 0 END) + (CASE WHEN p5 >= 0 THEN 32::BIGINT ELSE 0 END) + (CASE WHEN p6 >= 0 THEN 64::BIGINT ELSE 0 END) + (CASE WHEN p7 >= 0 THEN 128::BIGINT ELSE 0 END) AS band0,
               (CASE WHEN p8 >= 0 THEN 1::BIGINT ELSE 0 END) + (CASE WHEN p9 >= 0 THEN 2::BIGINT ELSE 0 END) + (CASE WHEN p10 >= 0 THEN 4::BIGINT ELSE 0 END) + (CASE WHEN p11 >= 0 THEN 8::BIGINT ELSE 0 END) + (CASE WHEN p12 >= 0 THEN 16::BIGINT ELSE 0 END) + (CASE WHEN p13 >= 0 THEN 32::BIGINT ELSE 0 END) + (CASE WHEN p14 >= 0 THEN 64::BIGINT ELSE 0 END) + (CASE WHEN p15 >= 0 THEN 128::BIGINT ELSE 0 END) AS band1
        FROM proj
    ),
    bands AS (
        SELECT vec_id, b, CASE WHEN b = 0 THEN band0 ELSE band1 END AS bv
        FROM sig, unnest([0, 1]) t(b)
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.vec_id < b.vec_id
    ),
    ver AS (
        SELECT c.id_a, c.id_b, list_cosine_similarity(ea.v, eb.v) AS cos
        FROM cand c JOIN e ea ON c.id_a = ea.vec_id JOIN e eb ON c.id_b = eb.vec_id
    )
    SELECT id_a, id_b, round(cos, 4) AS cos_sim
    FROM ver ORDER BY cos DESC, id_a, id_b LIMIT 10
    """,
    tags=("pipeline", "similarity", "dedup"),
)

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

# Language ID by stopword-profile hits (n-gram-heuristic family). The
# corpus vocabulary is synthetic so the realistic profiles mostly fire on
# 'a'/'the' — the mechanism (per-profile hit counts + argmax with a
# deterministic tie-break) is what's oracle-checked.
_sql_query(
    "text_lang_id",
    """
    WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
    s AS (
        SELECT doc_id, size(toks) AS n,
               size(filter(toks, x -> array_contains(array('the','a','of','and','to'), x))) AS s_en,
               size(filter(toks, x -> array_contains(array('le','la','de','et','les'), x))) AS s_fr,
               size(filter(toks, x -> array_contains(array('der','die','und','das','ist'), x))) AS s_de,
               size(filter(toks, x -> array_contains(array('el','los','las','y','que'), x))) AS s_es
        FROM t
    )
    SELECT doc_id, s_en, s_fr, s_de, s_es,
           CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
                WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
                WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS predicted,
           round(greatest(s_en, s_fr, s_de, s_es) / n, 6) AS confidence
    FROM s
    ORDER BY doc_id
    """,
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
        SELECT doc_id, len(toks) AS n,
               len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) AS s_en,
               len(list_filter(toks, x -> list_contains(['le','la','de','et','les'], x))) AS s_fr,
               len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS s_de,
               len(list_filter(toks, x -> list_contains(['el','los','las','y','que'], x))) AS s_es
        FROM t
    )
    SELECT doc_id, s_en, s_fr, s_de, s_es,
           CASE WHEN greatest(s_en, s_fr, s_de, s_es) = 0 THEN 'und'
                WHEN s_en >= greatest(s_fr, s_de, s_es) THEN 'en'
                WHEN s_fr >= greatest(s_de, s_es) THEN 'fr'
                WHEN s_de >= s_es THEN 'de'
                ELSE 'es' END AS predicted,
           round(greatest(s_en, s_fr, s_de, s_es) * 1.0 / n, 6) AS confidence
    FROM s
    ORDER BY doc_id
    """,
    tags=("pipeline", "text"),
)

# Quality scoring: type-token ratio, repetition (max token frequency),
# length — the standard cheap heuristics, all whole-stage-codegen column
# expressions plus one explode+groupBy for the mode frequency.
_sql_query(
    "text_quality",
    """
    WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
    base AS (
        SELECT doc_id, size(toks) AS n_tokens,
               size(array_distinct(toks)) AS n_unique,
               round(aggregate(toks, 0, (a, x) -> a + length(x)) / size(toks), 4) AS mean_tok_len,
               round(size(filter(toks, x -> array_contains(array('the','a','of','and','to'), x))) / size(toks), 4) AS stop_ratio
        FROM t
    ),
    freq AS (
        SELECT doc_id, max(cnt) AS max_tok_freq
        FROM (SELECT doc_id, tok, count(*) AS cnt
              FROM (SELECT doc_id, explode(toks) AS tok FROM t)
              GROUP BY doc_id, tok)
        GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, b.n_unique, b.mean_tok_len, b.stop_ratio,
           f.max_tok_freq,
           -- exact rational: (150u + 90(n-f) + n*min(n,60)) / 300n, one
           -- deterministic division (multi-op float accumulation differs
           -- in the last ulp across engines and can flip round(.,4))
           CAST(CAST(floor((150 * b.n_unique + 90 * (b.n_tokens - f.max_tok_freq)
                 + b.n_tokens * least(b.n_tokens, 60)) * 10000.0
                 / (300.0 * b.n_tokens) + 0.5) AS BIGINT) AS DOUBLE) / 10000.0 AS quality,
           CASE WHEN b.n_unique / b.n_tokens >= 0.25 AND b.n_tokens >= 20 THEN 1 ELSE 0 END AS keep
    FROM base b JOIN freq f ON b.doc_id = f.doc_id
    ORDER BY b.doc_id
    """,
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    base AS (
        SELECT doc_id, len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_unique,
               round(list_sum([length(x) for x in toks]) * 1.0 / len(toks), 4) AS mean_tok_len,
               round(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], x))) * 1.0 / len(toks), 4) AS stop_ratio
        FROM t
    ),
    freq AS (
        SELECT doc_id, max(cnt) AS max_tok_freq
        FROM (SELECT doc_id, tok, count(*) AS cnt
              FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
              GROUP BY doc_id, tok)
        GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_tokens, b.n_unique, b.mean_tok_len, b.stop_ratio,
           f.max_tok_freq,
           CAST(CAST(floor((150 * b.n_unique + 90 * (b.n_tokens - f.max_tok_freq)
                 + b.n_tokens * least(b.n_tokens, 60)) * 10000.0
                 / (300.0 * b.n_tokens) + 0.5) AS BIGINT) AS DOUBLE) / 10000.0 AS quality,
           CASE WHEN b.n_unique * 1.0 / b.n_tokens >= 0.25 AND b.n_tokens >= 20 THEN 1 ELSE 0 END AS keep
    FROM base b JOIN freq f ON b.doc_id = f.doc_id
    ORDER BY b.doc_id
    """,
    tags=("pipeline", "text"),
    bench=True,
)

# Token counting: whitespace tokens plus a BPE-ish regex tokenizer
# (letter-runs / digit-runs / single punctuation) — regexp_extract_all is
# JVM-side in Spark; same pattern semantics in DuckDB's RE2.
_sql_query(
    "text_token_stats",
    """
    SELECT doc_id,
           size(split(text, ' ')) AS ws_tokens,
           size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS bpe_ish_tokens,
           length(text) AS n_chars,
           length(replace(text, ' ', '')) AS n_nonspace,
           cast(round(length(text) / size(split(text, ' ')), 2) AS double) AS chars_per_token
    FROM documents
    ORDER BY doc_id
    """,
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
           length(text) AS n_chars,
           length(replace(text, ' ', '')) AS n_nonspace,
           round(length(text) * 1.0 / len(string_split(text, ' ')), 2) AS chars_per_token
    FROM documents
    ORDER BY doc_id
    """,
    tags=("pipeline", "text"),
)

# Document fingerprinting: winnowing-lite — polynomial hash of every 8-char
# gram, fingerprint = the 4 smallest distinct gram hashes. Identical
# arithmetic in both engines; near-identical docs share most gram hashes so
# fingerprints collide, which is the dedup signal.
_sql_query(
    "text_fingerprint",
    """
    WITH g AS (
        SELECT doc_id,
               transform(sequence(1, length(text) - 7),
                   i -> aggregate(split(substring(text, i, 8), ''), 131L,
                                  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)) AS ghs
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           concat_ws('-', transform(slice(array_sort(array_distinct(ghs)), 1, 4),
                                    x -> cast(x AS string))) AS fingerprint
    FROM g
    ORDER BY doc_id
    """,
    oracle="""
    WITH g AS (
        SELECT doc_id,
               [list_reduce(list_prepend(131::BIGINT,
                                         [ascii(c)::BIGINT for c in string_split(substring(text, i, 8), '')]),
                            (a, b) -> (a * 31 + b) % 1000000007)
                for i in range(1, length(text) - 6)] AS ghs
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(ghs))[1:4], '-') AS fingerprint
    FROM g
    ORDER BY doc_id
    """,
    tags=("pipeline", "text"),
)

# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


def _binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents as an opaque-binary modality table.

    payload: the raw bytes (here utf-8 text standing in for image/audio
    bytes); meta: typed metadata travelling with the blob. This is the
    schema shape a 100 TB multimodal corpus uses — binary column + struct
    metadata, partitioned by the long key, decoded only inside Arrow-batch
    UDFs (never on the driver).
    """
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("n_chars").cast("long").alias("declared_len"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


@register(
    "mm_features",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_bytes,
           CAST(list_sum([ascii(c)::BIGINT for c in string_split(text, '')]) AS BIGINT) AS byte_sum,
           CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
           lower(hex(substring(text, 1, 8))) AS head_hex,
           source AS origin
    FROM documents
    ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal"),
    doc="Feature extraction over binary payloads via mapInPandas (Arrow batches).",
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'decode' of a binary modality column.

    The extractor stands in for an image/audio decoder (see
    ``sensql_presto_spark.multimodal`` for the gated real-decoder stubs):
    it computes per-blob statistics inside ``mapInPandas``, so bytes stream
    through Arrow batches executor-side — the driver never sees a payload.
    The oracle recomputes the same statistics from the text column (the
    corpus is pure ASCII, so byte arithmetic == char arithmetic).
    """
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "byte_sum": pdf["payload"].map(lambda b: int(sum(b))),
                    "n_spaces": pdf["payload"].map(lambda b: b.count(b" ")),
                    "head_hex": pdf["payload"].map(lambda b: b[:8].hex()),
                    "origin": pdf["meta"].map(lambda m: m["origin"]),
                }
            )

    out_schema = (
        "doc_id bigint, n_bytes bigint, byte_sum bigint, n_spaces bigint, "
        "head_hex string, origin string"
    )
    return _binary_docs(spark, sf_dir).mapInPandas(extract, out_schema).orderBy("doc_id")


@register(
    "mm_frame_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id, text, unnest(range(0, length(text), 128)) AS off
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(off // 128 AS BIGINT) AS frame_idx,
           CAST(least(64, length(text) - off) AS BIGINT) AS frame_len,
           CAST(list_sum([ascii(c)::BIGINT for c in string_split(substring(text, off + 1, 64), '')]) % 997 AS BIGINT) AS frame_checksum
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    tags=("pipeline", "multimodal"),
    doc="Frame sampling from binary payloads: one row per sampled 64-byte frame.",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame/chunk sampling over a binary modality column.

    Emits every other 64-byte frame (stride 128) of each payload as its own
    row — the video-frame-sampling shape: mapInPandas explodes one blob row
    into n frame rows executor-side, output partitioning inherits the input
    split, no shuffle.
    """
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            ids, idxs, lens, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for frame_idx, off in enumerate(range(0, len(payload), 128)):
                    frame = payload[off : off + 64]
                    ids.append(doc_id)
                    idxs.append(frame_idx)
                    lens.append(len(frame))
                    sums.append(int(sum(frame)) % 997)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_len": lens, "frame_checksum": sums}
            )

    out_schema = "doc_id bigint, frame_idx bigint, frame_len bigint, frame_checksum bigint"
    df = _binary_docs(spark, sf_dir).where(F.col("doc_id") < 100)
    return df.mapInPandas(sample, out_schema).orderBy("doc_id", "frame_idx")


# --- exact-substring duplication ratio (training-data dedup literature:
#     per-document fraction of 13-grams appearing in more than one doc).
#     Scale shape: one explode to (doc, gram) rows, one groupBy on the
#     gram — identical to the exact-dedup shuffle bound; at 100 TB the
#     gram string would be xxhash64'd to 8 bytes before the shuffle (the
#     string key is kept here so the DuckDB oracle shares the exact key).


@register(
    "text_substring_dup",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                           x -> x <> '') AS w
        FROM documents
    ),
    grams AS (
        SELECT doc_id, array_to_string(w[i : i + 12], ' ') AS g
        FROM toks, UNNEST(generate_series(1, len(w) - 12)) AS t(i)
        WHERE len(w) >= 13
    ),
    dup AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
    SELECT grams.doc_id,
           count(*) AS n_grams,CAST(sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
           round(CAST(sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS dup_ratio
    FROM grams JOIN dup ON grams.g = dup.g
    GROUP BY grams.doc_id
    ORDER BY grams.doc_id
    """,
    tags=("pipeline", "text", "dedup"),
    doc="Per-document exact 13-gram cross-document duplication ratio "
    "(the substring-dedup metric): explode to (doc, gram), one gram-keyed "
    "aggregation, join back — never O(n^2) pairs.",
)
def text_substring_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH toks AS (
            SELECT doc_id,
                   filter(split(lower(text), '[^a-z0-9]+'), x -> x != '') AS w
            FROM documents
        ),
        grams AS (
            SELECT doc_id, concat_ws(' ', slice(w, i, 13)) AS g
            FROM toks
            LATERAL VIEW explode(sequence(1, size(w) - 12)) AS i
            WHERE size(w) >= 13
        ),
        dup AS (SELECT g, count(DISTINCT doc_id) AS nd FROM grams GROUP BY g)
        SELECT grams.doc_id,
               count(*) AS n_grams,CAST(sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
               round(CAST(sum(CASE WHEN dup.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*), 6) AS dup_ratio
        FROM grams JOIN dup ON grams.g = dup.g
        GROUP BY grams.doc_id
        ORDER BY grams.doc_id
        """
    )


# --- int8 scalar-quantized similarity: the memory/bandwidth scale path for
#     embedding search (4x smaller vectors, integer dot products). One
#     global symmetric scale (max |x|), q = round(x/scale*127); approximate
#     cosine ranking is recall-gated against the exact float ranking inside
#     the same query, so the oracle is constant-TRUE per query id.


@register(
    "sim_int8_quantized",
    oracle="""
    SELECT vec_id AS query_id, TRUE AS recall_ok, TRUE AS scale_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """,
    tags=("pipeline", "similarity", "quantization"),
    doc="Scalar int8 quantization for embedding search: global symmetric "
    "scale, integer dot products, recall@5 >= 0.6 vs the exact float "
    "top-5 (per query), plus a quantization-range sanity gate. At 100 TB "
    "this is the 4x memory/bandwidth reduction path; the scale constant "
    "is a scalar subquery (one tiny broadcast), never a driver collect.",
)
def sim_int8_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH e AS (
            SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        scale AS (
            SELECT max(aggregate(v, cast(0 AS double), (a, x) -> greatest(a, abs(x)))) AS s
            FROM e
        ),
        quant AS (
            -- scale joins in as a broadcast single-row relation: subquery
            -- expressions are not allowed inside HOF lambdas
            SELECT vec_id, v,
                   transform(v, x -> cast(round(x / s * 127) AS INT)) AS qv, s
            FROM e CROSS JOIN scale
        ),
        nq AS (
            SELECT vec_id, v, qv, s,
                   sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm,
                   sqrt(aggregate(qv, cast(0 AS double), (a, x) -> a + cast(x AS double) * x)) AS qnrm
            FROM quant
        ),
        q AS (SELECT * FROM nq WHERE vec_id < 5),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   aggregate(zip_with(q.v, c.v, (x, y) -> x * y), cast(0 AS double),
                             (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cos_f,
                   aggregate(zip_with(q.qv, c.qv, (x, y) -> cast(x AS double) * y),
                             cast(0 AS double), (acc, x) -> acc + x)
                       / (q.qnrm * c.qnrm) AS cos_q,
                   q.s AS s
            FROM q JOIN nq c ON q.vec_id <> c.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, s,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos_f DESC, neighbor_id)
                       AS rk_f,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos_q DESC, neighbor_id)
                       AS rk_q
            FROM scored
        )
        SELECT query_id,
               size(array_intersect(
                   collect_list(CASE WHEN rk_f <= 5 THEN neighbor_id END),
                   collect_list(CASE WHEN rk_q <= 5 THEN neighbor_id END))) >= 3 AS recall_ok,
               max(s) > 0 AS scale_ok
        FROM ranked
        GROUP BY query_id
        ORDER BY query_id
        """
    )


# ---------------------------------------------------------------------------
# Connected-components dedup clustering (large-star / small-star)
# ---------------------------------------------------------------------------
#
# Near-dup detection emits PAIRS; "keep one document per duplicate group"
# needs the transitive closure of those pairs.  At 100 TB that is the
# alternating large-star/small-star algorithm (Kiveris et al., "Connected
# Components in MapReduce and Beyond"): O(log n) rounds, each one
# shuffle-by-node — never materializing a component in one task, so a
# 100M-member duplicate cluster costs the same per round as a pair.  The
# reference has no CC operator (its dedup surface stops at pairwise
# queries); this is a beyond-reference pipeline operator like the others
# in this module.
#
# The edge set is synthesized deterministically from doc_ids (a sparse
# functional graph: every third doc links to (31*id+7) mod n), so both
# engines build the identical graph and DuckDB can label components with a
# recursive-CTE min-label propagation as the oracle.  Real usage feeds the
# band-join pair output of dedup_minhash_lsh/dedup_ngram_jaccard in as
# `edges` unchanged.


@register(
    "dedup_connected_components",
    oracle="""
    WITH RECURSIVE
    nodes AS (SELECT doc_id AS id FROM documents),
    raw AS (
        SELECT id AS u, (id * 31 + 7) % (SELECT count(*) FROM nodes) AS v
        FROM nodes WHERE id % 3 = 0
    ),
    edges AS (
        SELECT u, v FROM raw WHERE u <> v
        UNION
        SELECT v, u FROM raw WHERE u <> v
    ),
    walk(node, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    )
    SELECT node AS doc_id, min(label) AS cluster_id
    FROM walk GROUP BY node ORDER BY doc_id
    """,
    tags=("pipeline", "dedup"),
    doc="Duplicate-cluster labeling via alternating large-star/small-star "
    "(O(log n) shuffle rounds, lineage cut per round); oracle is DuckDB "
    "recursive-CTE label propagation over the same synthesized graph.",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = catalog.table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    n = docs.count()
    raw = docs.where(F.col("id") % 3 == 0).select(
        F.col("id").alias("u"), ((F.col("id") * 31 + 7) % F.lit(n)).alias("v")
    ).where(F.col("u") != F.col("v"))
    edges = raw.union(raw.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    wu = Window.partitionBy("u")
    for _ in range(20):  # converges in O(log n) rounds; 20 is a safety bound
        # large-star: every neighbor v > u links to the min of u's closed
        # neighborhood — long tails collapse toward small ids.
        m = F.least(F.min("v").over(wu), F.col("u"))
        lstar = (
            edges.withColumn("m", m)
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star: orient to the smaller endpoint, then relink every
        # small neighbor (and the center) to the neighborhood min.
        oriented = lstar.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m2 = F.min("v").over(wu)
        sstar = (
            oriented.withColumn("m", m2)
            .select(
                F.explode(F.array(F.struct(F.col("v").alias("a"), F.col("m")),
                                  F.struct(F.col("u").alias("a"), F.col("m")))).alias("e")
            )
            .select(F.col("e.a").alias("u"), F.col("e.m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        nxt = sstar.union(sstar.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage every round
        if nxt.exceptAll(edges).isEmpty() and edges.exceptAll(nxt).isEmpty():
            edges = nxt
            break
        edges = nxt

    # converged star graph: every member's sole smaller neighbor is the
    # component root; isolated nodes label themselves.
    labels = (
        docs.join(edges, docs.id == edges.u, "left")
        .groupBy("id")
        .agg(F.least(F.col("id"), F.coalesce(F.min("v"), F.col("id"))).alias("cluster_id"))
        .select(F.col("id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )
    return labels


# --- PII detection/redaction (training-data pipeline op). The corpus text
# is synthetic, so deterministic PII (email/phone/IPv4 built from doc_id) is
# spliced in first; detection+redaction is then pure regexp column work —
# whole-stage codegen, no UDFs, embarrassingly parallel at 100 TB. Patterns
# avoid \b and \. so the same regex text is valid in Java regex and RE2.
_sql_query(
    "text_pii_redact",
    """
    WITH aug AS (
        SELECT doc_id,
               concat(text, ' contact user', doc_id, '@mail.example.com or 555-',
                      lpad(cast(doc_id % 100 AS string), 4, '0'),
                      ' from 10.1.', cast(doc_id % 256 AS string), '.7') AS text
        FROM documents
    )
    SELECT doc_id,
           size(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', 0)) AS n_emails,
           size(regexp_extract_all(text, '555-[0-9]{4}', 0)) AS n_phones,
           size(regexp_extract_all(text, '10[.][0-9]+[.][0-9]+[.][0-9]+', 0)) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>'),
               '555-[0-9]{4}', '<PHONE>'),
               '10[.][0-9]+[.][0-9]+[.][0-9]+', '<IP>') AS redacted
    FROM aug
    ORDER BY doc_id
    """,
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@mail.example.com or 555-' ||
               lpad(cast(doc_id % 100 AS varchar), 4, '0') ||
               ' from 10.1.' || (doc_id % 256) || '.7' AS text
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+')) AS n_emails,
           len(regexp_extract_all(text, '555-[0-9]{4}')) AS n_phones,
           len(regexp_extract_all(text, '10[.][0-9]+[.][0-9]+[.][0-9]+')) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>', 'g'),
               '555-[0-9]{4}', '<PHONE>', 'g'),
               '10[.][0-9]+[.][0-9]+[.][0-9]+', '<IP>', 'g') AS redacted
    FROM aug
    ORDER BY doc_id
    """,
    tags=("pipeline", "text", "pii"),
    bench=True,
)

# --- Within-document repetition (Gopher-style quality signal): fraction of
# duplicate word 2-grams and 3-grams per document. Pure array expressions —
# one codegen'd projection, no shuffle at all (per-row metric).
_sql_query(
    "text_repetition",
    """
    WITH t AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, size(toks) AS n_tokens,
               transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1])) AS g2,
               transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])) AS g3
        FROM t WHERE size(toks) >= 3
    )
    SELECT doc_id, n_tokens,
           round(1.0 - size(array_distinct(g2)) / cast(size(g2) AS double), 6) AS dup2_frac,
           round(1.0 - size(array_distinct(g3)) / cast(size(g3) AS double), 6) AS dup3_frac
    FROM g
    ORDER BY doc_id
    """,
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id, len(toks) AS n_tokens,
               list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS g2,
               list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
        FROM t WHERE len(toks) >= 3
    )
    SELECT doc_id, n_tokens,
           round(1.0 - len(list_distinct(g2)) / cast(len(g2) AS double), 6) AS dup2_frac,
           round(1.0 - len(list_distinct(g3)) / cast(len(g3) AS double), 6) AS dup3_frac
    FROM g
    ORDER BY doc_id
    """,
    tags=("pipeline", "text", "quality"),
)

# --- Corpus-level reporting rollup: per-language doc counts, size and
# token totals, exact length quantiles. One partial-agg shuffle on lang —
# the dataset-card summary a curation pipeline emits per snapshot.
_sql_query(
    "text_corpus_stats",
    """
    WITH t AS (
        SELECT lang, n_chars, size(split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT lang, count(*) AS n_docs,CAST(sum(n_chars) AS BIGINT) AS total_chars,CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           cast(floor(percentile(n_chars, 0.5)) AS bigint) AS median_chars,
           cast(floor(percentile(n_chars, 0.9)) AS bigint) AS p90_chars,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
    oracle="""
    WITH t AS (
        SELECT lang, n_chars, len(string_split(text, ' ')) AS n_tokens FROM documents
    )
    SELECT lang, count(*) AS n_docs,CAST(sum(n_chars) AS BIGINT) AS total_chars,CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           cast(floor(quantile_cont(n_chars, 0.5)) AS bigint) AS median_chars,
           cast(floor(quantile_cont(n_chars, 0.9)) AS bigint) AS p90_chars,
           round(avg(n_tokens), 4) AS avg_tokens
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("pipeline", "text", "stats"),
)


# --- End-to-end curation pipeline as ONE declarative plan: quality gate ->
# exact dedup (min doc_id per content hash) -> PII redaction -> dataset-card
# rollup. Composing the stages in a single DAG is the point: Catalyst fuses
# the projections, the only shuffles are the dedup groupBy and the final
# per-language aggregation — at 100 TB this runs as two exchanges, no
# intermediate materialization, no driver round-trips between stages.
_sql_query(
    "pipeline_end_to_end",
    """
    WITH quality AS (
        SELECT doc_id, lang, text, n_chars,
               size(split(text, ' ')) AS n_tokens,
               size(array_distinct(split(text, ' '))) AS n_unique
        FROM documents
        WHERE n_chars >= 150
    ),
    gated AS (
        SELECT * FROM quality WHERE n_unique / cast(n_tokens AS double) > 0.3
    ),
    deduped AS (
        SELECT min(doc_id) AS doc_id, min(lang) AS lang, min(n_tokens) AS n_tokens,
               text
        FROM gated
        GROUP BY text
    ),
    redacted AS (
        SELECT doc_id, lang, n_tokens,
               regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>') AS text
        FROM deduped
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM redacted
    GROUP BY lang
    ORDER BY lang
    """,
    oracle="""
    WITH quality AS (
        SELECT doc_id, lang, text, n_chars,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' '))) AS n_unique
        FROM documents
        WHERE n_chars >= 150
    ),
    gated AS (
        SELECT * FROM quality WHERE n_unique / cast(n_tokens AS double) > 0.3
    ),
    deduped AS (
        SELECT min(doc_id) AS doc_id, min(lang) AS lang, min(n_tokens) AS n_tokens,
               text
        FROM gated
        GROUP BY text
    ),
    redacted AS (
        SELECT doc_id, lang, n_tokens,
               regexp_replace(text, '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]+', '<EMAIL>', 'g') AS text
        FROM deduped
    )
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM redacted
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("pipeline", "end-to-end"),
    bench=True,
)


# --- audio windowed energy over a binary modality column, with a REAL
#     WAV/PCM codec (round 3; replaces the 8-bit fake): each text payload
#     is serialized executor-side into a complete RIFF/WAVE file (16-bit
#     mono PCM at 8 kHz, sample s = (byte-96)*256 — deterministic, since
#     the container ships no audio corpus), then decoded back with the
#     stdlib wave/struct parser in sensql_presto_spark.multimodal and
#     windowed into 100-sample chunks with integer energy sum(s^2) — the
#     RMS shape without float drift. The oracle predicts the decoded
#     samples from the same byte arithmetic (energy scales by 256^2) and
#     asserts the decoded sample rate. mapInPandas explodes blob rows into
#     window rows executor-side; no shuffle, driver never sees payloads.


@register(
    "mm_audio_windows",
    oracle="""
    WITH w AS (
        SELECT doc_id, text, unnest(range(0, length(text), 100)) AS off
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(off // 100 AS BIGINT) AS window_idx,
           CAST(length(substring(text, off + 1, 100)) AS BIGINT) AS n_samples,
           CAST(8000 AS BIGINT) AS sample_rate,
           CAST(65536 * list_sum([(ascii(c) - 96) * (ascii(c) - 96) FOR c IN string_split(substring(text, off + 1, 100), '')]) AS BIGINT) AS energy
    FROM w
    ORDER BY doc_id, window_idx
    """,
    tags=("pipeline", "multimodal", "audio"),
    doc="Windowed audio-feature extraction over real RIFF/WAVE payloads: "
    "stdlib wave/struct decode (multimodal.decode_wav) inside Arrow "
    "mapInPandas, blob rows -> window rows, no shuffle.",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_wav, encode_wav_pcm16

    def windows(batches):
        for pdf in batches:
            ids, idxs, ns, rates, energies = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # ingest twin: text bytes -> 16-bit PCM WAV blob
                wav = encode_wav_pcm16([(b - 96) * 256 for b in payload], sample_rate=8000)
                # REAL decode: parse the RIFF/WAVE container back to samples
                rate, _nch, samples = decode_wav(wav)
                for window_idx, off in enumerate(range(0, len(samples), 100)):
                    chunk = samples[off : off + 100]
                    ids.append(doc_id)
                    idxs.append(window_idx)
                    ns.append(len(chunk))
                    rates.append(rate)
                    energies.append(int(sum(s * s for s in chunk)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_idx": idxs,
                    "n_samples": ns,
                    "sample_rate": rates,
                    "energy": energies,
                }
            )

    out_schema = (
        "doc_id bigint, window_idx bigint, n_samples bigint, sample_rate bigint, energy bigint"
    )
    df = _binary_docs(spark, sf_dir).where(F.col("doc_id") < 100)
    return df.mapInPandas(windows, out_schema).orderBy("doc_id", "window_idx")


# --- image decode over a binary modality column, with a REAL PNG codec
#     (round 3; closes the last multimodal stub): each text payload is
#     rendered executor-side as an 8-bit greyscale PNG (width 32, one
#     pixel per byte, scanline filter type cycling y % 5 so the decoder's
#     Sub/Up/Average/Paeth unfilter paths are all genuinely exercised),
#     then decoded back with the stdlib zlib/struct parser in
#     sensql_presto_spark.multimodal (chunk walk + CRC validation +
#     inflate + unfilter). The oracle predicts dimensions and the pixel
#     checksum from the same byte arithmetic. mapInPandas keeps payloads
#     executor-side; no shuffle.


@register(
    "mm_image_decode",
    oracle="""
    SELECT doc_id,
           CAST(32 AS BIGINT) AS width,
           CAST(length(text) // 32 AS BIGINT) AS height,
           'L' AS mode,
           CAST(list_sum([ascii(c)::BIGINT FOR c IN
                string_split(substring(text, 1, 32 * (length(text) // 32)), '')])
                AS BIGINT) AS pix_sum
    FROM documents
    WHERE doc_id < 100 AND length(text) >= 32
    ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal", "image"),
    doc="Image decode over real PNG payloads: stdlib zlib/struct codec "
    "(multimodal.decode_png, full filter set) inside Arrow mapInPandas.",
)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_png, encode_png

    def decode(batches):
        for pdf in batches:
            ids, widths, heights, modes, sums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                height = len(payload) // 32
                if height == 0:
                    continue
                # ingest twin: payload bytes -> greyscale PNG, mixed filters
                png = encode_png(32, height, payload[: 32 * height], "L",
                                 filter_for_row=lambda y: y % 5)
                # REAL decode: CRC-checked chunk walk + inflate + unfilter
                w, h, mode, pixels = decode_png(png)
                ids.append(doc_id)
                widths.append(w)
                heights.append(h)
                modes.append(mode)
                sums.append(int(sum(pixels)))
            yield pd.DataFrame(
                {"doc_id": ids, "width": widths, "height": heights,
                 "mode": modes, "pix_sum": sums}
            )

    out_schema = "doc_id bigint, width bigint, height bigint, mode string, pix_sum bigint"
    df = _binary_docs(spark, sf_dir).where(F.col("doc_id") < 100)
    return df.mapInPandas(decode, out_schema).orderBy("doc_id")


# --- Product quantization (PQ) ANN: 64-dim vectors split into 8 subspaces
#     of 8 dims; each subvector is coded as its nearest of 32 deterministic
#     centroids (the subvectors of vec_id 0..31 — kmeans-init-style seeds,
#     deterministic so both engines agree); query-time ranking uses ADC
#     (asymmetric distance: full-precision query subvector vs centroid of
#     the candidate's code). 16x vector compression; the scale shape is a
#     16-centroid broadcast join + one argmin window per subspace — codes
#     are computed once at ingest in production. Gate: ADC top-5 overlaps
#     exact top-5 by >= 2 per query (oracle emits TRUE).


@register(
    "sim_pq_topk",
    oracle="""
    SELECT vec_id AS query_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5 ORDER BY vec_id
    """,
    tags=("pipeline", "similarity", "quantization", "pq"),
    doc="Product-quantization ANN with ADC ranking and recall gate.",
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH e AS (
            SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        sub AS (
            SELECT vec_id, s, slice(v, s * 8 + 1, 8) AS u
            FROM e LATERAL VIEW explode(sequence(0, 7)) AS s
        ),
        cent AS (
            SELECT vec_id AS cid, s, u AS cu FROM sub WHERE vec_id < 32
        ),
        coded AS (
            SELECT vec_id, s, cid,
                   row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rk
            FROM (
                SELECT sub.vec_id, sub.s, cent.cid,
                       aggregate(zip_with(sub.u, cent.cu, (a, b) -> (a - b) * (a - b)),
                                 cast(0 AS double), (acc, x) -> acc + x) AS d2
                FROM sub JOIN cent ON sub.s = cent.s
            )
        ),
        codes AS (SELECT vec_id, s, cid FROM coded WHERE rk = 1),
        qsub AS (SELECT vec_id, s, u FROM sub WHERE vec_id < 5),
        adc AS (
            SELECT q.vec_id AS query_id, codes.vec_id AS cand,
                   sum(aggregate(zip_with(q.u, cent.cu, (a, b) -> (a - b) * (a - b)),
                                 cast(0 AS double), (acc, x) -> acc + x)) AS adc_d2
            FROM qsub q
            JOIN codes ON q.s = codes.s AND codes.vec_id <> q.vec_id
            JOIN cent ON cent.s = codes.s AND cent.cid = codes.cid
            GROUP BY q.vec_id, codes.vec_id
        ),
        exact AS (
            SELECT q.vec_id AS query_id, c.vec_id AS cand,
                   aggregate(zip_with(q.v, c.v, (a, b) -> (a - b) * (a - b)),
                             cast(0 AS double), (acc, x) -> acc + x) AS d2
            FROM (SELECT * FROM e WHERE vec_id < 5) q
            JOIN e c ON c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT a.query_id, a.cand, x.d2,
                   row_number() OVER (PARTITION BY a.query_id ORDER BY a.adc_d2, a.cand) AS rk_adc,
                   row_number() OVER (PARTITION BY a.query_id ORDER BY x.d2, x.cand) AS rk_exact
            FROM adc a JOIN exact x ON a.query_id = x.query_id AND a.cand = x.cand
        ),
        -- production PQ: ADC is the candidate generator (top-80), exact
        -- distance re-ranks only those candidates (80 full-precision rows
        -- per query instead of the whole corpus)
        reranked AS (
            SELECT query_id, cand, rk_exact,
                   row_number() OVER (PARTITION BY query_id ORDER BY d2, cand) AS rk_final
            FROM ranked WHERE rk_adc <= 80
        )
        SELECT r.query_id,
               size(array_intersect(
                   collect_list(CASE WHEN r.rk_final <= 5 THEN r.cand END),
                   collect_list(CASE WHEN g.rk_exact <= 5 THEN g.cand END))) >= 3 AS recall_ok
        FROM reranked r
        JOIN ranked g ON g.query_id = r.query_id AND g.cand = r.cand
        GROUP BY r.query_id
        ORDER BY r.query_id
        """
    )


# --- Stratified (per-language) deterministic sampling: cap each language
# at K docs, chosen by a Knuth multiplicative hash of doc_id so the sample
# is stable across runs and engines (no rand()). One window per stratum —
# at 100 TB this is the balanced-subsample op that follows language ID.
_sql_query(
    "text_stratified_sample",
    """
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
        FROM documents
    )
    SELECT lang,
           count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM ranked WHERE rk <= 30
    GROUP BY lang
    ORDER BY lang
    """,
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
        FROM documents
    )
    SELECT lang,
           count(*) AS n_sampled,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(doc_id) AS BIGINT) AS doc_id_sum
    FROM ranked WHERE rk <= 30
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("pipeline", "text", "sampling"),
)

# --- TF-IDF top terms per language: one explode to (lang, doc, term), a
# document-frequency aggregation, and a windowed top-3 — the corpus
# keyword-extraction shape (two shuffles: term stats, then per-lang rank).
# Scores are quantized to integers before ranking so ties and hashes are
# engine-stable.
_sql_query(
    "text_tfidf_top_terms",
    """
    WITH docs AS (SELECT doc_id, lang, array_distinct(split(text, ' ')) AS terms FROM documents),
    n_docs AS (SELECT count(*) AS n FROM docs),
    posting AS (SELECT doc_id, lang, explode(terms) AS term FROM docs),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM posting GROUP BY term),
    lang_tf AS (SELECT lang, term, count(*) AS tf FROM posting GROUP BY lang, term),
    scored AS (
        SELECT l.lang, l.term,
               cast(floor(l.tf * ln(cast(n.n AS double) / d.df) * 10000 + 0.5) AS BIGINT) AS score_e4
        FROM lang_tf l JOIN df d ON l.term = d.term CROSS JOIN n_docs n
    ),
    ranked AS (
        SELECT lang, term, score_e4,
               row_number() OVER (PARTITION BY lang ORDER BY score_e4 DESC, term) AS rk
        FROM scored
    )
    SELECT lang, rk, term, score_e4
    FROM ranked WHERE rk <= 3
    ORDER BY lang, rk
    """,
    oracle="""
    WITH docs AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS terms FROM documents),
    n_docs AS (SELECT count(*) AS n FROM docs),
    posting AS (SELECT doc_id, lang, unnest(terms) AS term FROM docs),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM posting GROUP BY term),
    lang_tf AS (SELECT lang, term, count(*) AS tf FROM posting GROUP BY lang, term),
    scored AS (
        SELECT l.lang, l.term,
               cast(floor(l.tf * ln(cast(n.n AS double) / d.df) * 10000 + 0.5) AS BIGINT) AS score_e4
        FROM lang_tf l JOIN df d ON l.term = d.term CROSS JOIN n_docs n
    ),
    ranked AS (
        SELECT lang, term, score_e4,
               row_number() OVER (PARTITION BY lang ORDER BY score_e4 DESC, term) AS rk
        FROM scored
    )
    SELECT lang, rk, term, score_e4
    FROM ranked WHERE rk <= 3
    ORDER BY lang, rk
    """,
    tags=("pipeline", "text", "tfidf"),
)


# --- character-trigram language-model scoring (the KenLM-perplexity role in
#     pretraining pipelines, e.g. CCNet's quality filter): one global pass
#     builds the trigram unigram-count model, then each document scores as
#     the average log2 probability of its trigrams under that model. Scale
#     shape: ONE shuffle for the model counts (map-side combined), the
#     model itself is a ~10k-row broadcast back onto the trigram stream, and
#     the per-doc re-aggregation rides the same exchange as the explode —
#     no driver materialization anywhere. Each per-trigram log2 quantizes
#     to integer micro-units BEFORE summing (log2 is libm and could differ
#     in the last ulp across engines; exact integer sums cannot).

_TRIGRAM_SPARK = """
    WITH docs AS (
        -- compute-dense explode ahead: file-split sizing is a byte
        -- heuristic and would scan this small zstd corpus in ~1 task, so
        -- fan the rows out explicitly before generating ~20x their bytes
        -- in trigrams (shuffling the raw docs costs ~nothing). At cluster
        -- scale the same hint bounds per-task explode output.
        SELECT /*+ REPARTITION(64) */ doc_id, text FROM documents
    ),
    tri AS (
        SELECT doc_id, explode(transform(sequence(1, length(text) - 2),
                                         i -> substring(text, i, 3))) AS tg
        FROM docs
    ),
    model AS (
        -- the corpus total rides a global window over the ~vocab-sized
        -- aggregate (one partition of ~10k rows), so the full-corpus
        -- trigram explode runs ONCE — a separate `SELECT count(*) FROM
        -- tri` total would re-explode the whole corpus (Spark CTEs are
        -- not materialized)
        SELECT tg, c, sum(c) OVER () AS t
        FROM (SELECT tg, count(*) AS c FROM tri GROUP BY tg)
    ),
    scored AS (
        SELECT tri.doc_id,
               cast(floor(log2(CAST(m.c AS DOUBLE) / m.t) * 1000000 + 0.5) AS BIGINT)
                   AS lp_micro
        FROM tri JOIN model m ON tri.tg = m.tg
        WHERE tri.doc_id < 300
    )
    SELECT doc_id, count(*) AS n_trigrams,
           CAST(CAST(floor(sum(lp_micro) * 1.0 / count(*) / 100.0 + 0.5) AS BIGINT) AS DOUBLE) / 10000.0 AS avg_log2p
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """

_TRIGRAM_DUCK = """
    WITH tri AS (
        SELECT doc_id, unnest([substring(text, i, 3) for i in range(1, length(text) - 1)]) AS tg
        FROM documents
    ),
    model AS (
        SELECT tg, c, sum(c) OVER () AS t
        FROM (SELECT tg, count(*) AS c FROM tri GROUP BY tg)
    ),
    scored AS (
        SELECT tri.doc_id,
               cast(floor(log2(CAST(m.c AS DOUBLE) / m.t) * 1000000 + 0.5) AS BIGINT)
                   AS lp_micro
        FROM tri JOIN model m ON tri.tg = m.tg
        WHERE tri.doc_id < 300
    )
    SELECT doc_id, count(*) AS n_trigrams,
           CAST(CAST(floor(sum(lp_micro) * 1.0 / count(*) / 100.0 + 0.5) AS BIGINT) AS DOUBLE) / 10000.0 AS avg_log2p
    FROM scored
    GROUP BY doc_id
    ORDER BY doc_id
    """

_sql_query(
    "text_trigram_logprob",
    _TRIGRAM_SPARK,
    oracle=_TRIGRAM_DUCK,
    tags=("pipeline", "text", "language-model"),
    doc="Char-trigram LM quality scoring (CCNet/KenLM-style perplexity "
    "filter): global trigram model in one shuffle, broadcast back, per-doc "
    "avg log2 prob from exact micro-unit sums.",
    bench=True,
)


# --- benchmark decontamination (the n-gram-overlap eval-leak check every
#     production pretraining pipeline runs before training; production
#     uses 8-13-word grams — 4-word here keeps the synthetic corpus's
#     result set non-degenerate, the operator shape is identical). Scale
#     shape: the eval set's distinct grams are tiny and BROADCAST onto the
#     corpus gram stream (no shuffle of corpus grams for the join); one
#     shuffle for the per-doc hit rollup. Flagged docs would be dropped by
#     the curation DAG; here they are reported with hit counts.

_DECON_SPARK = """
    WITH eg AS (
        SELECT DISTINCT explode(transform(sequence(1, size(w) - 3),
                                          i -> concat_ws(' ', slice(w, i, 4)))) AS g
        FROM (SELECT split(text, ' ') AS w FROM documents WHERE doc_id < 20)
        WHERE size(w) >= 4
    ),
    cg AS (
        SELECT doc_id, explode(transform(sequence(1, size(w) - 3),
                                         i -> concat_ws(' ', slice(w, i, 4)))) AS g
        FROM (SELECT doc_id, split(text, ' ') AS w FROM documents WHERE doc_id >= 100)
        WHERE size(w) >= 4
    )
    SELECT cg.doc_id, count(DISTINCT cg.g) AS n_hit_grams, count(*) AS n_hits
    FROM cg JOIN eg ON cg.g = eg.g
    GROUP BY cg.doc_id
    ORDER BY cg.doc_id
    """

_DECON_DUCK = """
    WITH eg AS (
        SELECT DISTINCT unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w) - 2)]) AS g
        FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id < 20)
        WHERE len(w) >= 4
    ),
    cg AS (
        SELECT doc_id, unnest([array_to_string(w[i:i+3], ' ') for i in range(1, len(w) - 2)]) AS g
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id >= 100)
        WHERE len(w) >= 4
    )
    SELECT cg.doc_id, count(DISTINCT cg.g) AS n_hit_grams, count(*) AS n_hits
    FROM cg JOIN eg ON cg.g = eg.g
    GROUP BY cg.doc_id
    ORDER BY cg.doc_id
    """

_sql_query(
    "text_decontaminate",
    _DECON_SPARK,
    oracle=_DECON_DUCK,
    tags=("pipeline", "text", "decontamination"),
    doc="Benchmark decontamination: word-n-gram overlap between the corpus "
    "and a held-out eval set (doc_id < 20 stands in); eval grams broadcast "
    "onto the corpus gram stream, per-doc hit counts reported.",
)


# --- SEMANTIC decontamination (the embedding twin of text_decontaminate:
#     modern pipelines also drop training docs whose embeddings sit too
#     close to an eval item, catching paraphrased leaks n-grams miss).
#     Scale shape: the eval set is tiny and BROADCASTS whole onto the
#     distributed corpus — one BroadcastNestedLoopJoin, zero corpus
#     shuffle before the per-doc rollup. Threshold cos > 2/5 is the same
#     exact-integer test as dedup_semantic (25*dot^2 vs 4*|a|^2*|b|^2 on
#     milliunit-quantized vectors), so the oracle matches bit-for-bit.
_sql_query(
    "sim_decontaminate",
    """
    WITH q AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               aggregate(v, cast(0 AS bigint), (acc, x) -> acc + x * x) AS nrm2
        FROM q
    ),
    ev AS (SELECT * FROM n WHERE vec_id < 20),
    corpus AS (SELECT * FROM n WHERE vec_id >= 100),
    hits AS (
        SELECT c.vec_id, ev.vec_id AS eval_id,
               aggregate(zip_with(c.v, ev.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               c.nrm2 AS nc2, ev.nrm2 AS ne2
        FROM corpus c CROSS JOIN ev
    )
    SELECT vec_id AS flagged_id,
           count(1) AS n_eval_hits,
           min(eval_id) AS closest_eval_seen
    FROM hits
    WHERE dot > 0 AND 25 * dot * dot > 4 * nc2 * ne2
    GROUP BY vec_id
    ORDER BY vec_id
    """,
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, CAST(list_sum([x * x FOR x IN v]) AS BIGINT) AS nrm2
        FROM q
    ),
    ev AS (SELECT * FROM n WHERE vec_id < 20),
    corpus AS (SELECT * FROM n WHERE vec_id >= 100),
    hits AS (
        SELECT c.vec_id, ev.vec_id AS eval_id,
               CAST(list_sum([c.v[i] * ev.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               c.nrm2 AS nc2, ev.nrm2 AS ne2
        FROM corpus c CROSS JOIN ev
    )
    SELECT vec_id AS flagged_id,
           CAST(count(*) AS BIGINT) AS n_eval_hits,
           min(eval_id) AS closest_eval_seen
    FROM hits
    WHERE dot > 0 AND 25 * dot * dot > 4 * nc2 * ne2
    GROUP BY vec_id
    ORDER BY vec_id
    """,
    tags=("pipeline", "decontamination", "similarity"),
    doc="Semantic (embedding-space) benchmark decontamination: tiny eval "
    "set broadcast against the distributed corpus, exact-integer cosine "
    "threshold, per-doc hit rollup.",
)


# --- sequence packing (LLM training prep: concatenate documents into
#     fixed-token-budget training sequences). The scalable variant packs
#     contiguously after a size-descending sort WITHIN each source shard —
#     the cumulative-sum window is PARTITIONED (one sort per shard, all
#     shards parallel), never a global sort; budget spill between packs is
#     the documented trade-off vs exact first-fit (which is inherently
#     sequential). Output is per-pack occupancy so fill efficiency is
#     auditable.

_PACK_SPARK = """
    WITH t AS (
        SELECT doc_id, source, size(split(text, ' ')) AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t
    )
    SELECT source, cast(floor((cum - 1) / 2048) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 4) AS fill_ratio
    FROM ordered
    GROUP BY source, cast(floor((cum - 1) / 2048) AS BIGINT)
    ORDER BY source, pack_id
    """

_PACK_DUCK = """
    WITH t AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    ordered AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY n_tokens DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t
    )
    SELECT source, cast(floor((cum - 1) / 2048) AS BIGINT) AS pack_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) / 2048, 4) AS fill_ratio
    FROM ordered
    GROUP BY source, cast(floor((cum - 1) / 2048) AS BIGINT)
    ORDER BY source, pack_id
    """

_sql_query(
    "text_sequence_pack",
    _PACK_SPARK,
    oracle=_PACK_DUCK,
    tags=("pipeline", "text", "packing"),
    doc="Sequence packing for LLM training: contiguous-fill packing into "
    "2048-token budgets, windowed per source shard (parallel, no global "
    "sort); per-pack occupancy and fill ratio reported.",
)


# --- mixture weighting (the sampling-weights step of a pretraining data
#     recipe: rebalance source shares to target weights by deterministic
#     per-doc Bernoulli sampling). The binding source keeps 100% and every
#     other source downsamples to match its relative weight — the standard
#     no-upsampling mixture solve: keep_s = min(1, C*w_s/size_s) with
#     C = min_s(size_s/w_s). The keep decision hashes doc_id with the same
#     Knuth multiplicative hash as text_stratified_sample, so the sample is
#     reproducible, engine-independent, and embarrassingly parallel (the
#     per-source aggregates are a ~20-row broadcast; no row-level shuffle
#     beyond the final rollup). Sizes use n_chars as the token proxy.

_sql_query(
    "text_source_mix",
    """
    WITH agg AS (
        SELECT source, sum(n_chars) AS toks,
               CASE WHEN cast(substr(source, 4) AS INT) % 2 = 0 THEN 3.0 ELSE 1.0 END AS w
        FROM documents GROUP BY source
    ),
    c AS (SELECT min(toks / w) AS cmin FROM agg),
    keep AS (
        SELECT source, w, least(CAST(1.0 AS DOUBLE), c.cmin * w / toks) AS keep_frac
        FROM agg CROSS JOIN c
    ),
    sampled AS (
        SELECT d.doc_id, d.source, d.n_chars, k.keep_frac
        FROM documents d JOIN keep k ON d.source = k.source
        WHERE (d.doc_id * 2654435761) % 4294967296 < k.keep_frac * 4294967296
    )
    SELECT source,
           count(*) AS n_docs_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_tokens,
           CAST(round(min(keep_frac), 4) AS DOUBLE) AS keep_frac
    FROM sampled
    GROUP BY source
    ORDER BY source
    """,
    tags=("pipeline", "text", "sampling", "mixture"),
    doc="Pretraining mixture weighting: per-source deterministic Bernoulli "
    "downsampling to target relative weights (3:1 alternating here), "
    "no-upsampling solve, reproducible Knuth-hash keep decisions.",
)


# --- context-window chunking (LLM training/RAG prep: split each document
#     into fixed-token windows with overlap). One generator expression per
#     row (sequence + slice) — zero shuffles before the output sort, so the
#     operator is embarrassingly parallel at 100 TB: every chunk row is
#     derived from its own document partition-locally. Chunk identity is
#     checked end-to-end via md5 over the joined window (same hex text in
#     Spark and DuckDB).

_sql_query(
    "text_chunk_overlap",
    """
    WITH t AS (
        SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, toks, n, pos
        FROM t LATERAL VIEW explode(sequence(0, n - 1, 48)) s AS pos
        WHERE n > 0
    )
    SELECT doc_id,
           CAST(pos / 48 AS BIGINT) AS chunk_idx,
           CAST(least(64, n - pos) AS BIGINT) AS n_tokens,
           md5(array_join(slice(toks, pos + 1, 64), ' ')) AS chunk_md5
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    starts AS (
        SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS pos
        FROM t WHERE n > 0
    )
    SELECT doc_id,
           CAST(pos / 48 AS BIGINT) AS chunk_idx,
           CAST(least(64, n - pos) AS BIGINT) AS n_tokens,
           md5(array_to_string(toks[pos + 1 : pos + 64], ' ')) AS chunk_md5
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
    tags=("pipeline", "text", "chunking"),
    doc="Context-window chunking: 64-token windows at stride 48 (16-token "
    "overlap) per document; zero-shuffle generator plan, md5-fingerprinted "
    "chunks.",
)


# --- incremental ingest dedup (the daily-batch pattern: an at-least-once
#     delivery re-sends part of the already-ingested corpus; new docs are
#     the anti-join of the incoming batch against the snapshot's content
#     hashes). NOT EXISTS compiles to a hash anti join (asserted in
#     tests/test_optimizer_rewrites.py); at 100 TB the snapshot side is a
#     hash-partitioned build with a bloom pre-filter pushed to the probe
#     scan (spark.sql.optimizer.runtime.bloomFilter.enabled is on in
#     session.py), so re-delivered rows drop before the exchange.
#     Snapshot/batch membership is doc_id arithmetic so the overlap is
#     deterministic and non-empty at every SF: batch doc_id%10 IN (0,1,2),
#     snapshot doc_id%5 IN (0,1) -> re-delivered rows are %10 IN (0,1).

_sql_query(
    "dedup_incremental",
    """
    WITH snapshot AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 < 2
    ),
    incoming AS (
        SELECT doc_id, source, md5(text) AS h, n_chars
        FROM documents WHERE doc_id % 10 < 3
    )
    SELECT source,
           count(*) AS new_docs,
           CAST(sum(n_chars) AS BIGINT) AS new_chars,
           CAST(min(doc_id) AS BIGINT) AS first_new_doc
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM snapshot s WHERE s.h = i.h)
    GROUP BY source
    ORDER BY source
    """,
    tags=("pipeline", "dedup", "incremental"),
    doc="Incremental-batch dedup: anti-join the incoming delivery against "
    "the ingested snapshot's content hashes; only genuinely-new documents "
    "survive (re-delivered rows drop).",
)


# Bloom-prefiltered incremental dedup — the 100 TB shape of the entry
# above. A plain anti-join shuffles BOTH sides on the content hash; when
# the seen-snapshot is billions of keys and the incoming delivery mostly
# new, the right production plan is: (1) aggregate the snapshot into a
# BLOOM FILTER, (2) broadcast it and prefilter the incoming stream
# (definitely-new rows exit with zero shuffle; no false negatives, so
# nothing new is lost), (3) exact anti-join ONLY the might-contain
# candidates — false positives are eliminated, so the OUTPUT is exact.
# Spark's bloom_filter_agg/might_contain pair is internal-only SQL, so the
# bloom is built from public primitives as a BITMAP RELATION: k=5 probe
# positions per key (xxhash64(h, i) mod m), bit_or-aggregated into
# m/64 = 16k 64-bit words — a tiny broadcastable table; membership =
# all k probed bits set. Same structure the runtime bloom-join injects,
# expressed declaratively. The oracle is the plain anti-join —
# bit-identical output by the no-false-negative guarantee.
@register(
    "dedup_bloom_prefilter",
    oracle="""
    WITH snapshot AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 < 2
    ),
    incoming AS (
        SELECT doc_id, source, md5(text) AS h, n_chars
        FROM documents WHERE doc_id % 10 < 3
    )
    SELECT source,
           count(*) AS new_docs,
           CAST(sum(n_chars) AS BIGINT) AS new_chars,
           CAST(min(doc_id) AS BIGINT) AS first_new_doc
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM snapshot s WHERE s.h = i.h)
    GROUP BY source
    ORDER BY source
    """,
    tags=("pipeline", "dedup", "incremental", "scale"),
    doc="Bloom-prefiltered incremental dedup: bloom_filter_agg over the "
    "seen snapshot, broadcast might_contain prefilter (no false "
    "negatives), exact anti-join of only the candidate slice — exact "
    "output with the shuffle bounded by bloom-hit cardinality.",
    bench=True,
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    K, M = 5, 1 << 20  # 5 probes into 2^20 bits = 16,384 bitmap words
    docs = catalog.table(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") % 5 < 2).select(
        F.md5("text").alias("h")
    ).distinct().createOrReplaceTempView("__bloom_snapshot")
    docs.where(F.col("doc_id") % 10 < 3).select(
        "doc_id", "source", F.md5("text").alias("h"), "n_chars"
    ).createOrReplaceTempView("__bloom_incoming")
    # (1) one aggregation pass folds the snapshot into the bitmap relation
    spark.sql(
        f"""
        SELECT pos DIV 64 AS word,
               bit_or(shiftleft(1L, cast(pos % 64 AS INT))) AS mask
        FROM (
            SELECT pmod(xxhash64(h, k.i), {M}) AS pos
            FROM __bloom_snapshot LATERAL VIEW explode(sequence(1, {K})) k AS i
        )
        GROUP BY pos DIV 64
        """
    ).createOrReplaceTempView("__bloom_bitmap")
    # (2) broadcast prefilter: a doc whose K probed bits are not all set is
    #     DEFINITELY new (no false negatives) and never reaches the join
    # (3) exact anti-join of just the candidate slice kills false positives
    return spark.sql(
        f"""
        WITH probes AS (
            SELECT i.doc_id, i.source, i.h, i.n_chars,
                   pmod(xxhash64(i.h, k.i), {M}) AS pos
            FROM __bloom_incoming i LATERAL VIEW explode(sequence(1, {K})) k AS i
        ),
        flagged AS (
            SELECT /*+ BROADCAST(b) */ doc_id, source, h, n_chars,
                   min(CASE WHEN b.word IS NOT NULL
                            AND (shiftright(b.mask, cast(pos % 64 AS INT)) & 1) = 1
                            THEN 1 ELSE 0 END) AS all_bits_set
            FROM probes p LEFT JOIN __bloom_bitmap b ON p.pos DIV 64 = b.word
            GROUP BY doc_id, source, h, n_chars
        ),
        definitely_new AS (
            SELECT doc_id, source, h, n_chars FROM flagged WHERE all_bits_set = 0
        ),
        verified_new AS (
            SELECT f.doc_id, f.source, f.h, f.n_chars
            FROM flagged f
            WHERE f.all_bits_set = 1
              AND NOT EXISTS (SELECT 1 FROM __bloom_snapshot s WHERE s.h = f.h)
        ),
        new_docs AS (
            SELECT * FROM definitely_new UNION ALL SELECT * FROM verified_new
        )
        SELECT source,
               count(*) AS new_docs,
               CAST(sum(n_chars) AS BIGINT) AS new_chars,
               CAST(min(doc_id) AS BIGINT) AS first_new_doc
        FROM new_docs
        GROUP BY source
        ORDER BY source
        """
    )


# --- URL-keyed dedup (the CommonCrawl pattern: many crawled variants of
#     one page differ only in scheme case, www prefix, trailing slash and
#     tracking parameters). Canonicalization is pure column expressions
#     (zero shuffle); the keep-one step is a single groupBy on the
#     canonical key. URLs are synthesized deterministically from doc
#     fields with all four noise modes, and doc_id%1000 aliasing makes
#     genuine variant groups at every SF.

_sql_query(
    "dedup_url",
    """
    WITH crawled AS (
        SELECT doc_id, source, n_chars,
               concat(
                   CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,
                   CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
                   'Site-', source, '.Example.com/docs/', doc_id % 1000,
                   CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
                   CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&id=7&b=2'
                        WHEN doc_id % 5 = 1 THEN '?id=7&b=2&utm_campaign=x'
                        ELSE '?b=2&id=7' END) AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, source, n_chars,
               concat(
                   regexp_replace(lower(split_part(url, '?', 1)),
                                  '^https?://(www\\\\.)?|/$', ''),
                   '?',
                   array_join(array_sort(filter(
                       split(split_part(url, '?', 2), '&'),
                       kv -> NOT startswith(kv, 'utm_'))), '&')) AS canonical_url
        FROM crawled
    )
    SELECT canonical_url,
           count(*) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS kept_doc,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    oracle="""
    WITH crawled AS (
        SELECT doc_id, source, n_chars,
               concat(
                   CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END,
                   CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
                   'Site-', source, '.Example.com/docs/', doc_id % 1000,
                   CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
                   CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&id=7&b=2'
                        WHEN doc_id % 5 = 1 THEN '?id=7&b=2&utm_campaign=x'
                        ELSE '?b=2&id=7' END) AS url
        FROM documents
    ),
    canon AS (
        SELECT doc_id, source, n_chars,
               concat(
                   regexp_replace(lower(split_part(url, '?', 1)),
                                  '^https?://(www\\.)?|/$', '', 'g'),
                   '?',
                   array_to_string(list_sort(list_filter(
                       string_split(split_part(url, '?', 2), '&'),
                       kv -> NOT starts_with(kv, 'utm_'))), '&')) AS canonical_url
        FROM crawled
    )
    SELECT canonical_url,
           count(*) AS n_variants,
           CAST(min(doc_id) AS BIGINT) AS kept_doc,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    tags=("pipeline", "dedup", "url"),
    doc="URL canonicalization dedup: lowercase, strip scheme/www/trailing "
    "slash, drop utm_* params, sort the rest; group by canonical key and "
    "keep the first doc per group.",
)


# --- video frame extraction through a REAL container codec (the AVI/RIFF
#     twin of mm_audio_windows' WAV and mm_image_decode's PNG). Each doc's
#     text bytes deterministically fill 3x4 RGB24 frames; the UDF encodes
#     a spec-complete uncompressed AVI (DIB frames: BGR, bottom-up, padded
#     rows, idx1) and decodes it back executor-side before sampling every
#     2nd frame. The oracle recomputes the POSITION-WEIGHTED checksum of
#     the decoded top-down RGB bytes straight from the text — so any
#     channel-order / row-order / padding bug in either codec direction
#     breaks the roundtrip identity and the hash. Payloads never reach the
#     driver; one mapInPandas, no shuffle before the output sort.

_VID_W, _VID_H = 3, 4  # width 3 -> 9-byte rows padded to 12: pad path exercised


@register(
    "mm_video_frames",
    oracle="""
    WITH f AS (
        SELECT doc_id, text, length(text) AS L,
               unnest(range(0, 1 + length(text) % 5, 2)) AS fi
        FROM documents WHERE doc_id < 120 AND length(text) > 0
    )
    SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx,
           CAST(1 + L % 5 AS BIGINT) AS n_frames,
           CAST(list_sum([(ascii(substring(text, ((fi * 7 + i) % L) + 1, 1)) % 256) * (i + 1)
                          FOR i IN generate_series(0, 35)]) % 9973 AS BIGINT) AS frame_wsum,
           CAST(list_sum([ascii(substring(text, ((fi * 7 + i) % L) + 1, 1)) % 256
                          FOR i IN generate_series(0, 35)]) % 997 AS BIGINT) AS frame_sum
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    tags=("pipeline", "multimodal", "video"),
    doc="Video frame sampling through a real AVI/RIFF codec: encode "
    "uncompressed DIB frames, decode back, sample stride 2; "
    "position-weighted checksum proves byte-exact roundtrip.",
)
def mm_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_avi, encode_avi_rgb24

    frame_len = _VID_W * _VID_H * 3

    def sample(batches):
        for pdf in batches:
            ids, idxs, counts, wsums, sums = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # characters, not UTF-8 bytes: the oracle indexes with
                # length(text)/ascii(substring(...)), which count CHARS and
                # return codepoints — byte indexing silently diverges the
                # moment the corpus gains a non-ASCII character
                codes = [ord(c) % 256 for c in text]
                n = len(codes)
                if n == 0:
                    # loud per-row contract instead of a ZeroDivisionError
                    # failing the whole stage; the builder filters empty
                    # text, so reaching this means the filter was dropped
                    raise ValueError(
                        f"mm_video_frames: empty text for doc_id={doc_id} "
                        "(filter length(text) > 0 upstream)"
                    )
                n_frames = 1 + n % 5
                frames = [
                    bytes(codes[(fi * 7 + i) % n] for i in range(frame_len))
                    for fi in range(n_frames)
                ]
                payload = encode_avi_rgb24(frames, _VID_W, _VID_H)
                w, h, nf, decoded = decode_avi(payload)
                assert (w, h, nf) == (_VID_W, _VID_H, n_frames)
                for fi in range(0, nf, 2):
                    fr = decoded[fi]
                    ids.append(doc_id)
                    idxs.append(fi)
                    counts.append(nf)
                    wsums.append(sum((i + 1) * b for i, b in enumerate(fr)) % 9973)
                    sums.append(sum(fr) % 997)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "n_frames": counts,
                    "frame_wsum": wsums,
                    "frame_sum": sums,
                }
            )

    schema = (
        "doc_id bigint, frame_idx bigint, n_frames bigint, "
        "frame_wsum bigint, frame_sum bigint"
    )
    docs = catalog.table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 120) & (F.length("text") > 0)
    )
    return (
        docs.select("doc_id", "text")
        .mapInPandas(sample, schema)
        .orderBy("doc_id", "frame_idx")
    )


# --- MMR diversity re-ranking (maximal marginal relevance — the retrieval
#     diversification step after top-k: greedily pick results that are
#     relevant to the probe but dissimilar to what's already picked).
#     Greedy selection is inherently sequential, but its depth is the
#     number of picks, not the corpus size — so three picks unroll into
#     three fixed declarative rounds over the per-probe top-8 candidate
#     relation. Scale shape: the corpus is scanned ONCE for the candidate
#     stage (probe set broadcast, WindowGroupLimit top-8); every later
#     round joins k-row-per-probe relations (k=8), constant work per
#     probe. Scores are exact integer dot products on milliunit-quantized
#     vectors (dot-MMR: score = 2*rel - max sim-to-selected), so both
#     engines agree bit-for-bit — no float tie can flip a pick.

_MMR_SPARK_DOT = """aggregate(zip_with({a}, {b}, (x, y) -> x * y),
                             cast(0 AS bigint), (acc, x) -> acc + x)"""


def _mmr_cand_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Un-checkpointed candidate stage (per-probe top-8 over the corpus
    with the probe set broadcast) — kept as a separate builder so
    tests/test_plans.py can still pin the generation plan's broadcast
    shape after the r12 staging rework."""
    dot_pc = _MMR_SPARK_DOT.format(a="p.v", b="c.v")
    return catalog.sql(
        spark,
        sf_dir,
        f"""
        WITH q AS (
            SELECT vec_id,
                   transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
            FROM embeddings
        ),
        probes AS (SELECT * FROM q WHERE vec_id < 4)
        SELECT * FROM (
            SELECT p.vec_id AS pid, c.vec_id AS cid, c.v AS cv,
                   {dot_pc} AS rel,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY {dot_pc} DESC, c.vec_id) AS rk
            FROM probes p JOIN q c ON c.vec_id <> p.vec_id
        ) t WHERE rk <= 8
        """,
    )


@register(
    "sim_mmr_rerank",
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    probes AS (SELECT * FROM q WHERE vec_id < 4),
    cand AS (
        SELECT * FROM (
            SELECT p.vec_id AS pid, c.vec_id AS cid, c.v AS cv,
                   list_sum([p.v[i] * c.v[i] FOR i IN generate_series(1, 64)]) AS rel,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY list_sum([p.v[i] * c.v[i] FOR i IN generate_series(1, 64)]) DESC,
                                c.vec_id) AS rk
            FROM probes p JOIN q c ON c.vec_id <> p.vec_id
        ) WHERE rk <= 8
    ),
    pair AS (
        SELECT a.pid, a.cid AS ca, b.cid AS cb,
               list_sum([a.cv[i] * b.cv[i] FOR i IN generate_series(1, 64)]) AS sim
        FROM cand a JOIN cand b ON a.pid = b.pid AND a.cid <> b.cid
    ),
    s1 AS (
        SELECT pid, cid AS sel, rel FROM (
            SELECT pid, cid, rel,
                   row_number() OVER (PARTITION BY pid ORDER BY rel DESC, cid) AS rk
            FROM cand) t WHERE rk = 1
    ),
    r2 AS (
        SELECT c.pid, c.cid, c.rel, p.sim AS pen
        FROM cand c
        JOIN s1 ON c.pid = s1.pid AND c.cid <> s1.sel
        JOIN pair p ON p.pid = c.pid AND p.ca = c.cid AND p.cb = s1.sel
    ),
    s2 AS (
        SELECT pid, cid AS sel, rel FROM (
            SELECT pid, cid, rel,
                   row_number() OVER (
                       PARTITION BY pid ORDER BY 2 * rel - pen DESC, cid) AS rk
            FROM r2) t WHERE rk = 1
    ),
    r3 AS (
        SELECT c.pid, c.cid, c.rel, greatest(p1.sim, p2.sim) AS pen
        FROM cand c
        JOIN s1 ON c.pid = s1.pid AND c.cid <> s1.sel
        JOIN s2 ON c.pid = s2.pid AND c.cid <> s2.sel
        JOIN pair p1 ON p1.pid = c.pid AND p1.ca = c.cid AND p1.cb = s1.sel
        JOIN pair p2 ON p2.pid = c.pid AND p2.ca = c.cid AND p2.cb = s2.sel
    ),
    s3 AS (
        SELECT pid, cid AS sel, rel FROM (
            SELECT pid, cid, rel,
                   row_number() OVER (
                       PARTITION BY pid ORDER BY 2 * rel - pen DESC, cid) AS rk
            FROM r3) t WHERE rk = 1
    )
    SELECT pid AS query_id, CAST(1 AS BIGINT) AS pick, sel AS selected_id,
           CAST(rel AS BIGINT) AS rel_dot FROM s1
    UNION ALL
    SELECT pid, CAST(2 AS BIGINT), sel, CAST(rel AS BIGINT) FROM s2
    UNION ALL
    SELECT pid, CAST(3 AS BIGINT), sel, CAST(rel AS BIGINT) FROM s3
    ORDER BY query_id, pick
    """,
    tags=("pipeline", "similarity", "mmr"),
    doc="MMR diversity re-ranking: greedy 3-pick maximal marginal relevance "
    "over per-probe top-8 candidates, unrolled as fixed declarative rounds; "
    "exact integer dot-MMR scores.",
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 scan-guard rework: the single-SQL form re-referenced the
    # corpus-scanning cand CTE from every greedy round (Catalyst inlines
    # CTEs — 30 embeddings scans in the optimized plan).  The candidate
    # stage (<= 8 rows/probe) and the pairwise-sim table (<= 56
    # rows/probe) are constant-size-per-probe relations — checkpoint
    # both; the corpus is scanned exactly twice (probe side + candidate
    # side of the top-8 join) and the greedy rounds join only the tiny
    # staged views.  Arithmetic unchanged; oracle keeps the all-SQL text.
    dot_ab = _MMR_SPARK_DOT.format(a="a.cv", b="b.cv")
    cand = _mmr_cand_plan(spark, sf_dir).localCheckpoint(eager=True)
    pair = _sql_with_views(
        spark,
        f"""
        SELECT a.pid, a.cid AS ca, b.cid AS cb, {dot_ab} AS sim
        FROM __cand a JOIN __cand b ON a.pid = b.pid AND a.cid <> b.cid
        """,
        __cand=cand,
    ).localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        """
        WITH cand AS (SELECT * FROM __cand),
        pair AS (SELECT * FROM __pair),
        s1 AS (
            SELECT pid, cid AS sel, rel FROM (
                SELECT pid, cid, rel,
                       row_number() OVER (PARTITION BY pid ORDER BY rel DESC, cid) AS rk
                FROM cand) t WHERE rk = 1
        ),
        r2 AS (
            SELECT c.pid, c.cid, c.rel, p.sim AS pen
            FROM cand c
            JOIN s1 ON c.pid = s1.pid AND c.cid <> s1.sel
            JOIN pair p ON p.pid = c.pid AND p.ca = c.cid AND p.cb = s1.sel
        ),
        s2 AS (
            SELECT pid, cid AS sel, rel FROM (
                SELECT pid, cid, rel,
                       row_number() OVER (
                           PARTITION BY pid ORDER BY 2 * rel - pen DESC, cid) AS rk
                FROM r2) t WHERE rk = 1
        ),
        r3 AS (
            SELECT c.pid, c.cid, c.rel, greatest(p1.sim, p2.sim) AS pen
            FROM cand c
            JOIN s1 ON c.pid = s1.pid AND c.cid <> s1.sel
            JOIN s2 ON c.pid = s2.pid AND c.cid <> s2.sel
            JOIN pair p1 ON p1.pid = c.pid AND p1.ca = c.cid AND p1.cb = s1.sel
            JOIN pair p2 ON p2.pid = c.pid AND p2.ca = c.cid AND p2.cb = s2.sel
        ),
        s3 AS (
            SELECT pid, cid AS sel, rel FROM (
                SELECT pid, cid, rel,
                       row_number() OVER (
                           PARTITION BY pid ORDER BY 2 * rel - pen DESC, cid) AS rk
                FROM r3) t WHERE rk = 1
        )
        SELECT pid AS query_id, cast(1 AS BIGINT) AS pick, sel AS selected_id,
               cast(rel AS BIGINT) AS rel_dot FROM s1
        UNION ALL
        SELECT pid, cast(2 AS BIGINT), sel, cast(rel AS BIGINT) FROM s2
        UNION ALL
        SELECT pid, cast(3 AS BIGINT), sel, cast(rel AS BIGINT) FROM s3
        ORDER BY query_id, pick
        """,
        __cand=cand,
        __pair=pair,
    )


# --- exact-substring REMOVAL (the transform twin of text_substring_dup's
#     metric: Lee et al. 2022 "Deduplicating Training Data Makes Language
#     Models Better" removes every span covered by a corpus-duplicated
#     13-gram, not just the duplicated document). Shape: one explode to
#     (doc, pos, gram), one corpus-wide groupBy on the gram (the exact-
#     dedup shuffle bound), position-coverage via a bounded 13x generator,
#     and an anti-join back onto the token stream — all linear in corpus
#     size; the 13x coverage amplification is a constant factor, never a
#     blow-up. Output is per-doc kept/removed token accounting (the
#     reconstruction is array_join over kept positions — same plan shape).

_SUBSTR_REMOVE_SPARK = """
    WITH t AS (
        SELECT doc_id, split(text, ' ') AS toks, size(split(text, ' ')) AS n
        FROM documents
    ),
    grams AS (
        SELECT doc_id, pos, array_join(slice(toks, pos + 1, 13), ' ') AS gram
        FROM t LATERAL VIEW explode(sequence(0, n - 13)) g AS pos
        WHERE n >= 13
    ),
    dup_grams AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING count(*) > 1
    ),
    covered AS (
        SELECT DISTINCT g.doc_id, cpos
        FROM grams g
        JOIN dup_grams d ON g.gram = d.gram
        LATERAL VIEW explode(sequence(g.pos, g.pos + 12)) c AS cpos
    )
    SELECT t.doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(t.n - coalesce(c.n_covered, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_removed
    FROM t
    LEFT JOIN (SELECT doc_id, count(*) AS n_covered FROM covered GROUP BY doc_id) c
      ON t.doc_id = c.doc_id
    WHERE t.doc_id < 300
    ORDER BY t.doc_id
    """

_SUBSTR_REMOVE_DUCK = """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    grams AS (
        SELECT doc_id, pos, array_to_string(toks[pos + 1 : pos + 13], ' ') AS gram
        FROM t, UNNEST(range(0, n - 12)) AS g(pos)
        WHERE n >= 13
    ),
    dup_grams AS (
        SELECT gram FROM grams GROUP BY gram
        HAVING count(*) > 1
    ),
    covered AS (
        SELECT DISTINCT g.doc_id, cpos
        FROM (SELECT g2.* FROM grams g2 JOIN dup_grams d ON g2.gram = d.gram) g,
             UNNEST(range(g.pos, g.pos + 13)) AS c(cpos)
    )
    SELECT t.doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(t.n - coalesce(c.n_covered, 0) AS BIGINT) AS n_kept,
           CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_removed
    FROM t
    LEFT JOIN (SELECT doc_id, count(*) AS n_covered FROM covered GROUP BY doc_id) c
      ON t.doc_id = c.doc_id
    WHERE t.doc_id < 300
    ORDER BY t.doc_id
    """

_sql_query(
    "text_substring_removal",
    _SUBSTR_REMOVE_SPARK,
    oracle=_SUBSTR_REMOVE_DUCK,
    tags=("pipeline", "text", "dedup"),
    doc="Exact-substring removal (Lee et al. 2022): drop every token span "
    "covered by a corpus-duplicated 13-gram; per-doc kept/removed "
    "accounting, one gram shuffle + bounded coverage generator.",
)


# --- PageRank (the quality-weighting graph primitive — e.g. web-graph
#     rank as a quality prior for crawl corpora; the iterative twin of
#     dedup_connected_components' label propagation). Each iteration is
#     the standard distributed shape: one join of the edge list against
#     the current ranks + one groupBy on the destination — state is one
#     rank per node, never per edge. Three iterations unroll declaratively
#     (a production run loops with localCheckpoint per round, the
#     connected-components discipline); ranks are re-quantized to integer
#     micro-units after every round, so both engines agree bit-for-bit.
#     The graph derives deterministically from orders (custkey%50 ->
#     orderkey%(1+custkey%12), deduped), with the node count scaling
#     with the corpus (60 nodes at sf0.001, 6000 at sf0.1).

_PAGERANK_SQL = """
    WITH params AS (
        -- node count scales with the corpus (same derivation as the
        -- label-propagation fixture: ~375 orders per 15 nodes, floor
        -- before the cast, >= 60 nodes) so sf0.1 ranks a 6000-node web
        SELECT 15 * greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS n
        FROM orders
    ),
    edges AS (
        -- skewed web: hub links (dst skews toward low ids, the power-law
        -- shape) plus a ring so every node has an in-link
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               o_orderkey % (1 + o_custkey % 12) AS dst
        FROM orders
        WHERE o_custkey % (SELECT n FROM params)
              <> o_orderkey % (1 + o_custkey % 12)
        UNION
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params) + 1)
               % (SELECT n FROM params) AS dst
        FROM orders
    ),
    outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    n AS (SELECT count(*) AS cnt FROM nodes),
    -- floor() before the cast: DuckDB ROUNDS on double->BIGINT casts
    -- while Spark truncates, so a bare CAST(x/y AS BIGINT) silently
    -- diverges on any non-integral quotient
    r0 AS (SELECT id, CAST(floor(1000000.0 / (SELECT cnt FROM n)) AS BIGINT) AS r FROM nodes),
    r1 AS (
        SELECT nodes.id,
               CAST(round(150000.0 / (SELECT cnt FROM n)) AS BIGINT)
               + CAST(floor(coalesce(sum(
                     CAST(floor(r0.r * 1000.0 / outdeg.d) AS BIGINT)), 0)
                     * 85 / 100000.0) AS BIGINT) AS r
        FROM nodes
        LEFT JOIN edges ON edges.dst = nodes.id
        LEFT JOIN r0 ON r0.id = edges.src
        LEFT JOIN outdeg ON outdeg.src = edges.src
        GROUP BY nodes.id, (SELECT cnt FROM n)
    ),
    r2 AS (
        SELECT nodes.id,
               CAST(round(150000.0 / (SELECT cnt FROM n)) AS BIGINT)
               + CAST(floor(coalesce(sum(
                     CAST(floor(r1.r * 1000.0 / outdeg.d) AS BIGINT)), 0)
                     * 85 / 100000.0) AS BIGINT) AS r
        FROM nodes
        LEFT JOIN edges ON edges.dst = nodes.id
        LEFT JOIN r1 ON r1.id = edges.src
        LEFT JOIN outdeg ON outdeg.src = edges.src
        GROUP BY nodes.id, (SELECT cnt FROM n)
    ),
    r3 AS (
        SELECT nodes.id,
               CAST(round(150000.0 / (SELECT cnt FROM n)) AS BIGINT)
               + CAST(floor(coalesce(sum(
                     CAST(floor(r2.r * 1000.0 / outdeg.d) AS BIGINT)), 0)
                     * 85 / 100000.0) AS BIGINT) AS r
        FROM nodes
        LEFT JOIN edges ON edges.dst = nodes.id
        LEFT JOIN r2 ON r2.id = edges.src
        LEFT JOIN outdeg ON outdeg.src = edges.src
        GROUP BY nodes.id, (SELECT cnt FROM n)
    )
    SELECT id AS node_id, r AS rank_micro
    FROM r3
    ORDER BY rank_micro DESC, node_id
    """

# r12 scan-guard rework: the pure-SQL form above is kept verbatim as the
# DuckDB ORACLE (DuckDB materializes repeated CTEs cheaply), but on the
# Spark side Catalyst INLINES every CTE reference, and the unrolled
# rounds referenced edges/nodes/outdeg/r{k-1} multiplicatively — the
# optimized logical plan carried 220 scans of orders (measured by the
# registry-wide scan audit; 13.8s at sf0.1).  The builder below is the
# production shape the original comment promised: the skewed web is
# staged ONCE per (session, sf_dir) — shared with personalized pagerank
# and HITS, which synthesize the IDENTICAL fixture — and each round is
# localCheckpoint-materialized (node-sized state), so the main plan
# scans ZERO parquet and each round runs exactly one edge join.
# Arithmetic is byte-identical to the oracle text.

_SKEWED_WEB_SQL = """
    WITH params AS (
        SELECT 15 * greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS n
        FROM orders
    ),
    edges AS (
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               o_orderkey % (1 + o_custkey % 12) AS dst
        FROM orders
        WHERE o_custkey % (SELECT n FROM params)
              <> o_orderkey % (1 + o_custkey % 12)
        UNION
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params) + 1)
               % (SELECT n FROM params) AS dst
        FROM orders
    )
    SELECT src, dst FROM edges
"""


def _skewed_web_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed skewed-web edge relation (the pagerank/HITS fixture;
    same staging discipline as _block_web_edges)."""
    return _session_memo(
        spark,
        "skewed_web_edges",
        sf_dir,
        lambda: catalog.sql(spark, sf_dir, _SKEWED_WEB_SQL).localCheckpoint(
            eager=True
        ),
    )


def _skewed_web_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _session_memo(
        spark,
        "skewed_web_nodes",
        sf_dir,
        lambda: _sql_with_views(
            spark,
            "SELECT src AS id FROM __swe UNION SELECT dst FROM __swe",
            __swe=_skewed_web_edges(spark, sf_dir),
        ).localCheckpoint(eager=True),
    )


def _skewed_web_outdeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _session_memo(
        spark,
        "skewed_web_outdeg",
        sf_dir,
        lambda: _sql_with_views(
            spark,
            "SELECT src, count(*) AS d FROM __swe GROUP BY src",
            __swe=_skewed_web_edges(spark, sf_dir),
        ).localCheckpoint(eager=True),
    )


_PAGERANK_R0_SQL = """
    SELECT id, CAST(floor(1000000.0 / (SELECT count(*) FROM __nodes)) AS BIGINT) AS r
    FROM __nodes
"""

_PAGERANK_ROUND_SQL = """
    SELECT n.id,
           CAST(round(150000.0 / (SELECT count(*) FROM __nodes)) AS BIGINT)
           + CAST(floor(coalesce(sum(
                 CAST(floor(p.r * 1000.0 / od.d) AS BIGINT)), 0)
                 * 85 / 100000.0) AS BIGINT) AS r
    FROM __nodes n
    LEFT JOIN __edges e ON e.dst = n.id
    LEFT JOIN __prev p ON p.id = e.src
    LEFT JOIN __outdeg od ON od.src = e.src
    GROUP BY n.id
"""


@register(
    "graph_pagerank",
    oracle=_PAGERANK_SQL,
    tags=("pipeline", "graph", "pagerank"),
    doc="PageRank (damping 0.85, 3 iterations): edge-join + dst-groupBy "
    "per round, per-edge contributions floor-quantized so every round is "
    "exact integer arithmetic in both engines; the staged skewed web is "
    "localCheckpoint-materialized once and each round checkpoints its "
    "node-sized rank vector (zero parquet rescans in the rounds plan — "
    "the CTE form inlined to 220 orders scans under Catalyst); the "
    "quality-prior graph primitive.",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    E = _skewed_web_edges(spark, sf_dir)
    N = _skewed_web_nodes(spark, sf_dir)
    D = _skewed_web_outdeg(spark, sf_dir)
    r = _sql_with_views(spark, _PAGERANK_R0_SQL, __nodes=N)
    for k in range(3):
        r = _sql_with_views(
            spark, _PAGERANK_ROUND_SQL, __nodes=N, __edges=E, __outdeg=D, __prev=r
        )
        if k < 2:  # the last round stays a plan (its groupBy is the output)
            r = r.localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        "SELECT id AS node_id, r AS rank_micro FROM __r "
        "ORDER BY rank_micro DESC, node_id",
        __r=r,
    )


# Paragraph-level exact dedup (the Dolma/CommonCrawl curation pass that
# complements text_substring_removal's 13-gram spans): documents are
# segmented into fixed 12-word paragraphs, a corpus-wide exact count on
# the paragraph TEXT finds cross-document duplicates, and every
# occurrence except the lowest-doc_id one is dropped before the doc is
# reassembled in order. Scale shape: one shuffle keyed on the paragraph
# text (the exact-dedup bound — never pairwise), one shuffle back on
# doc_id for reassembly; keep-first is min(doc_id) carried on the
# paragraph aggregate, no window over the corpus.
_sql_query(
    "text_dedup_paragraph",
    """
    WITH tok AS (
        SELECT doc_id, split(text, ' ') AS t FROM documents
    ),
    paras AS (
        SELECT doc_id, p,
               array_join(slice(t, p * 12 + 1, 12), ' ') AS para
        FROM tok
        LATERAL VIEW explode(sequence(0, cast(ceil(size(t) / 12.0) AS INT) - 1)) s AS p
    ),
    owners AS (
        SELECT para, count(*) AS n_occ, min(doc_id) AS first_doc
        FROM paras GROUP BY para
    ),
    kept AS (
        SELECT p.doc_id, p.p, p.para,
               (o.n_occ = 1 OR p.doc_id = o.first_doc) AS keep
        FROM paras p JOIN owners o ON p.para = o.para
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(length(concat_ws(' ',
               sort_array(collect_list(CASE WHEN keep
                   THEN concat(lpad(cast(p AS STRING), 6, '0'), ':', para) END)))) AS BIGINT) AS kept_len
    FROM kept
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    paras AS (
        SELECT doc_id, p.i - 1 AS p,
               array_to_string(t[(p.i - 1) * 12 + 1 : (p.i - 1) * 12 + 12], ' ') AS para
        FROM tok, LATERAL (
            SELECT unnest(range(1, CAST(ceil(len(t) / 12.0) AS INT) + 1)) AS i
        ) p
    ),
    owners AS (
        SELECT para, count(*) AS n_occ, min(doc_id) AS first_doc
        FROM paras GROUP BY para
    ),
    kept AS (
        SELECT p.doc_id, p.p, p.para,
               (o.n_occ = 1 OR p.doc_id = o.first_doc) AS keep
        FROM paras p JOIN owners o ON p.para = o.para
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(length(string_agg(CASE WHEN keep
               THEN lpad(CAST(p AS VARCHAR), 6, '0') || ':' || para END, ' '
               ORDER BY lpad(CAST(p AS VARCHAR), 6, '0') || ':' || para)), 0) AS BIGINT) AS kept_len
    FROM kept
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("pipeline", "text", "dedup"),
    doc="Paragraph-level exact dedup (Dolma-style): 12-word paragraph "
    "segmentation, corpus-wide exact count, keep-first policy, in-order "
    "reassembly length — one shuffle on paragraph text, one on doc_id.",
    bench=True,
)


# CDC apply (change-data-capture log -> table state): the warehouse merge
# that applies an ordered I/U/D log with last-writer-wins per key — the
# MergeOperator pattern fed by a log instead of a source table. The log is
# synthesized deterministically from orders. Scale shape: ONE shuffle on
# the key for the per-key max-sequence reduction (WindowGroupLimit prunes
# to the latest row map-side); no self-join of the log.
_sql_query(
    "events_cdc_apply",
    """
    WITH cdc AS (
        SELECT o_custkey % 500 AS k,
               o_orderkey AS seq,
               CASE WHEN o_orderkey % 11 = 0 THEN 'D'
                    WHEN o_orderkey % 3 = 0 THEN 'U'
                    ELSE 'I' END AS op,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS val_cents
        FROM orders
    ),
    latest AS (
        SELECT k, seq, op, val_cents,
               row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        FROM cdc
    )
    SELECT k, seq AS last_seq, op AS last_op, val_cents
    FROM latest
    WHERE rn = 1 AND op <> 'D'
    ORDER BY k
    """,
    tags=("events", "cdc", "mutation"),
    doc="CDC log application: last-writer-wins per key over an ordered "
    "I/U/D change log, deletes tombstone the key — one shuffle on key, "
    "WindowGroupLimit keeps the reduction map-side.",
)


# Image resize through the REAL codec path: per doc, a deterministic 6x6
# grayscale image (first 36 chars as pixels) is PNG-encoded (mixed row
# filters), PNG-decoded (CRC-checked inflate + unfilter), then
# nearest-neighbor downsampled to 3x3 inside the same Arrow batch — the
# decode->resize preprocessing stage of a multimodal ingest pipeline.
# The oracle recomputes the 3x3 checksum directly from the source chars
# (resized(y,x) = src(2y,2x) for the 2:1 factor), so any codec or
# resampling drift is a hash mismatch. Chars, not UTF-8 bytes (the
# mm_video_frames indexing discipline).
@register(
    "mm_image_resize",
    oracle="""
    SELECT doc_id,
           CAST(3 AS BIGINT) AS width,
           CAST(3 AS BIGINT) AS height,
           CAST(list_sum([(j + 1) * (ascii(substring(text,
                    (j // 3) * 12 + (j % 3) * 2 + 1, 1)) % 256)
                 FOR j IN generate_series(0, 8)]) % 9973 AS BIGINT) AS wsum
    FROM documents
    WHERE doc_id < 150 AND length(text) >= 36
    ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal", "image", "resize"),
    doc="PNG decode + nearest-neighbor resize (6x6 -> 3x3) through the "
    "stdlib codec inside Arrow mapInPandas; position-weighted checksum "
    "of the resized pixels vs a direct source-char oracle.",
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_png, encode_png, resize_nearest

    def work(batches):
        for pdf in batches:
            ids, ws, hs, wsums = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = [ord(c) % 256 for c in text[:36]]
                if len(codes) < 36:
                    raise ValueError(
                        f"mm_image_resize: doc {doc_id} shorter than 36 chars "
                        "(filter length(text) >= 36 upstream)"
                    )
                png = encode_png(6, 6, bytes(codes), "L",
                                 filter_for_row=lambda y: y % 5)
                w, h, mode, pixels = decode_png(png)
                assert (w, h, mode) == (6, 6, "L")
                small = resize_nearest(w, h, pixels, 3, 3)
                ids.append(doc_id)
                ws.append(3)
                hs.append(3)
                wsums.append(sum((i + 1) * b for i, b in enumerate(small)) % 9973)
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "wsum": wsums}
            )

    schema = "doc_id bigint, width bigint, height bigint, wsum bigint"
    docs = catalog.table(spark, sf_dir, "documents").where(
        (F.col("doc_id") < 150) & (F.length("text") >= 36)
    )
    return docs.select("doc_id", "text").mapInPandas(work, schema).orderBy("doc_id")


# Deterministic train/validation/test split — the companion to
# text_stratified_sample for building eval sets: every document lands in
# exactly one split via a Knuth-multiplicative hash bucket (stable across
# runs, engines and corpus growth for a fixed doc_id — no rand(), no
# global sort), with the per-(source, split) composition reported so
# stratification drift is visible. Scale shape: pure column expressions
# plus ONE aggregation shuffle; the split is assignable at read time at
# any corpus size.
_sql_query(
    "text_train_val_split",
    """
    WITH assigned AS (
        SELECT doc_id, source, n_chars,
               CASE WHEN (doc_id * 2654435761) % 100 < 90 THEN 'train'
                    WHEN (doc_id * 2654435761) % 100 < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT source, split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM assigned
    GROUP BY source, split
    ORDER BY source, split
    """,
    tags=("pipeline", "text", "sampling", "split"),
    doc="Deterministic stratified train/val/test split: hash-bucket "
    "assignment (90/5/5), zero shuffle before the composition rollup; "
    "stable across engines and corpus growth.",
)


# Cosine-radius similarity search (range query, not top-k): every corpus
# vector within cos >= 4/5 of each probe. The threshold test runs in
# exact integer arithmetic on milliunit-quantized vectors — cos >= 4/5 is
# dot > 0 AND 25*dot^2 >= 16*|a|^2*|b|^2 — the dedup_semantic trick, so
# no float summation order can flip a match and the oracle agrees
# bit-for-bit. Scale shape: the probe set is a broadcast side (bounded,
# user-supplied); the corpus is scanned ONCE with no shuffle at all —
# the radius search a retrieval pipeline runs after IVF routing, and the
# exact-verify stage of any ANN bucket scheme.
_sql_query(
    "sim_range_search",
    """
    WITH q AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v,
               aggregate(v, cast(0 AS bigint), (acc, x) -> acc + x * x) AS nrm2
        FROM q
    ),
    probes AS (SELECT vec_id AS probe_id, v AS pv, nrm2 AS pn2 FROM n WHERE vec_id < 8),
    matches AS (
        SELECT /*+ BROADCAST(p) */ p.probe_id, c.vec_id AS match_id,
               aggregate(zip_with(p.pv, c.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               p.pn2, c.nrm2
        FROM n c CROSS JOIN probes p
        WHERE p.probe_id <> c.vec_id
    )
    SELECT probe_id, match_id, dot AS dot_milli2
    FROM matches
    WHERE dot > 0 AND 25 * dot * dot >= 16 * pn2 * nrm2
    ORDER BY probe_id, match_id
    """,
    oracle="""
    WITH q AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    n AS (
        SELECT vec_id, v, CAST(list_sum([x * x FOR x IN v]) AS BIGINT) AS nrm2
        FROM q
    ),
    probes AS (SELECT vec_id AS probe_id, v AS pv, nrm2 AS pn2 FROM n WHERE vec_id < 8),
    matches AS (
        SELECT p.probe_id, c.vec_id AS match_id,
               CAST(list_sum([p.pv[i] * c.v[i] FOR i IN generate_series(1, len(p.pv))]) AS BIGINT) AS dot,
               p.pn2, c.nrm2
        FROM probes p CROSS JOIN n c
        WHERE p.probe_id <> c.vec_id
    )
    SELECT probe_id, match_id, dot AS dot_milli2
    FROM matches
    WHERE dot > 0 AND 25 * dot * dot >= 16 * pn2 * nrm2
    ORDER BY probe_id, match_id
    """,
    tags=("pipeline", "similarity", "range"),
    doc="Cosine-radius search: all corpus vectors within cos >= 0.8 of "
    "each probe; broadcast probe side, single corpus scan, exact-integer "
    "threshold test (25*dot^2 vs 16*|a|^2*|b|^2 on milliunit vectors).",
    bench=True,
)


# Containment-based near-dup (the asymmetric cousin of Jaccard): flag doc
# A as contained in doc B when |shingles(A) ∩ shingles(B)| >= 0.9*|A| —
# catches quote-expansion and boilerplate-wrapper duplicates that Jaccard
# misses when |B| >> |A|. Candidate generation uses the asymmetric
# prefix-filter theorem: if C(A,B) >= t then A's floor((1-t)*|A|)+1
# globally-rarest shingles MUST hit B's full inverted list — so the join
# is prefix(A) x inv(B) (rare shingles only on the A side), complete by
# construction, and the size guard 9*|A| <= 10*|B| prunes pairs that
# cannot reach the threshold (|A ∩ B| <= |B|). Verification is the exact
# set intersection, which alone defines the output.
# Like dedup_minhash_lsh, the shingle set is MATERIALIZED once
# (localCheckpoint; a staging table at cluster scale) — Spark inlines
# CTEs, so the all-SQL form recomputed tokenization five times (sizes,
# inv, prefix, both verify sides): measured 6.2s -> materialized shape is
# the one the bench records.

_CONTAIN_VERIFY_SQL = """
    WITH sizes AS (SELECT doc_id, size(shingles) AS n FROM __ctn_sh),
    inv AS (SELECT doc_id, explode(shingles) AS s FROM __ctn_sh),
    df AS (SELECT s, count(*) AS df FROM inv GROUP BY s),
    ranked AS (
        SELECT i.doc_id, i.s, z.n,
               row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.s) AS rk
        FROM inv i JOIN df d ON i.s = d.s JOIN sizes z ON i.doc_id = z.doc_id
    ),
    prefix AS (SELECT doc_id, s FROM ranked WHERE rk <= cast(floor(0.1 * n) AS INT) + 1),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN inv b ON a.s = b.s AND a.doc_id <> b.doc_id
    )
    SELECT c.id_a AS contained_id, c.id_b AS container_id,
           round(size(array_intersect(sa.shingles, sb.shingles)) / cast(sa.n2 AS DOUBLE), 6) AS containment
    FROM cand c
    JOIN (SELECT doc_id, shingles, size(shingles) AS n2 FROM __ctn_sh) sa ON c.id_a = sa.doc_id
    JOIN (SELECT doc_id, shingles, size(shingles) AS n2 FROM __ctn_sh) sb ON c.id_b = sb.doc_id
    WHERE 9 * sa.n2 <= 10 * sb.n2
      AND 10 * size(array_intersect(sa.shingles, sb.shingles)) >= 9 * sa.n2
    ORDER BY contained_id, container_id
    """


@register(
    "text_containment_dedup",
    oracle=f"""
    WITH {_DUCK_SHINGLES},
    sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
    inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    df AS (SELECT s, count(*) AS df FROM inv GROUP BY s),
    ranked AS (
        SELECT i.doc_id, i.s, z.n,
               row_number() OVER (PARTITION BY i.doc_id ORDER BY d.df, i.s) AS rk
        FROM inv i JOIN df d ON i.s = d.s JOIN sizes z ON i.doc_id = z.doc_id
    ),
    prefix AS (SELECT doc_id, s FROM ranked
               WHERE rk <= CAST(floor(0.1 * n) AS INT) + 1),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM prefix a JOIN inv b ON a.s = b.s AND a.doc_id <> b.doc_id
    )
    SELECT c.id_a AS contained_id, c.id_b AS container_id,
           round(len(list_intersect(sa.shingles, sb.shingles)) * 1.0
                 / len(sa.shingles), 6) AS containment
    FROM cand c
    JOIN sh sa ON c.id_a = sa.doc_id
    JOIN sh sb ON c.id_b = sb.doc_id
    WHERE 9 * len(sa.shingles) <= 10 * len(sb.shingles)
      AND 10 * len(list_intersect(sa.shingles, sb.shingles)) >= 9 * len(sa.shingles)
    ORDER BY contained_id, container_id
    """,
    tags=("pipeline", "dedup", "containment"),
    doc="Asymmetric containment near-dup (|A∩B| >= 0.9|A|): rare-shingle "
    "prefix on the contained side joined against the full inverted list, "
    "integer threshold verification; catches boilerplate-wrapper dups "
    "Jaccard misses.",
)
def text_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reads the session-memoized shingle staging relation (r10) and
    # uuid-suffixed views (r9 ADVICE) like the jaccard/minhash family
    return _sql_with_views(
        spark, _CONTAIN_VERIFY_SQL, __ctn_sh=_shingle_sets(spark, sf_dir)
    )


# --- Perceptual-hash image dedup (aHash): the multimodal twin of
#     dedup_exact. Each payload is rendered as a real 32xH greyscale PNG
#     (same ingest twin as mm_image_decode), decoded back with the stdlib
#     codec, block-averaged onto an 8x8 grid (floor boundaries
#     floor(r*h/8), integer means), and hashed as the 64 bits
#     "block >= grid mean" — all integer arithmetic, so the DuckDB oracle
#     predicts the hash from the same byte grid and matches bit-for-bit.
#     Dedup is then ONE hash shuffle on the 64-bit signature (groups > 1)
#     — at corpus scale: decode+hash riding the ingest scan (mapInPandas,
#     payloads never driver-side), then an exact groupBy, never a pixel
#     self-join. Near-dup banding (simhash-style pigeonhole on hash
#     segments) composes on top exactly as in dedup_simhash.


@register(
    "mm_image_phash_dedup",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             [ascii(c)::BIGINT FOR c IN string_split(substring(text, 1, 32 * (length(text)//32)), '')] AS p,
             CAST(length(text)//32 AS BIGINT) AS h
      FROM documents WHERE doc_id < 200 AND length(text) >= 256
    ),
    bm AS (
      SELECT doc_id, h,
             [ CAST(list_sum([ list_sum(p[(row*32 + (b%8)*4 + 1):(row*32 + (b%8)*4 + 4)])
                               FOR row IN generate_series(((b//8)*h)//8, (((b//8)+1)*h)//8 - 1) ])
                    // ((((((b//8)+1)*h)//8) - (((b//8)*h)//8)) * 4) AS BIGINT)
               FOR b IN generate_series(0, 63) ] AS bmeans
      FROM px
    ),
    hashed AS (
      SELECT doc_id,
             list_aggregate([CASE WHEN x >= list_sum(bmeans)//64 THEN '1' ELSE '0' END FOR x IN bmeans],
                            'string_agg', '') AS ahash
      FROM bm
    )
    SELECT ahash, CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           min(doc_id) AS first_member
    FROM hashed GROUP BY ahash HAVING count(*) > 1
    ORDER BY first_member
    """,
    tags=("pipeline", "multimodal", "image", "dedup"),
    doc="Perceptual aHash image dedup: real PNG roundtrip -> 8x8 integer "
    "block-average -> 64-bit above-mean signature -> one hash-shuffle "
    "groupBy; the multimodal member of the dedup family.",
)
def mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_png, encode_png

    def ahash(batches):
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                h = len(payload) // 32
                if h < 8:
                    continue
                png = encode_png(32, h, payload[: 32 * h], "L",
                                 filter_for_row=lambda y: y % 5)
                w, hh, _mode, pixels = decode_png(png)
                bmeans = []
                for b in range(64):
                    r, c = b // 8, b % 8
                    r0, r1 = (r * hh) // 8, ((r + 1) * hh) // 8
                    c0 = c * 4
                    s = sum(
                        pixels[row * 32 + c0 + k]
                        for row in range(r0, r1)
                        for k in range(4)
                    )
                    bmeans.append(s // ((r1 - r0) * 4))
                mean = sum(bmeans) // 64
                ids.append(doc_id)
                hashes.append("".join("1" if x >= mean else "0" for x in bmeans))
            yield pd.DataFrame({"doc_id": ids, "ahash": hashes})

    df = _binary_docs(spark, sf_dir).where(F.col("doc_id") < 200)
    hashed = df.mapInPandas(ahash, "doc_id bigint, ahash string")
    return (
        hashed.groupBy("ahash")
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.min("doc_id").alias("first_member"),
        )
        .where(F.col("n_members") > 1)
        .orderBy("first_member")
    )


# --- Label propagation (community detection — the domain/host-clustering
#     graph primitive for crawl corpora; the most-frequent-label sibling
#     of graph_pagerank's weighted walk and of
#     dedup_connected_components' min-label contraction).  Reference
#     scope: the fork exposes graph rollups through its pipeline layer
#     the same way PageRank is exposed; semantics follow
#     Raghavan et al. 2007 (synchronous LPA) with the deterministic
#     tiebreak (highest neighbour-count, then smallest label) so both
#     engines agree exactly.  Each round is the canonical distributed
#     shape: ONE join of the symmetrized edge list against the current
#     label table + ONE (dst, label) count aggregate + a per-node top-1
#     (TopNRowNumber — WindowGroupLimit prunes map-side); state is one
#     label per node, never per edge.  Three rounds unroll declaratively;
#     a production run loops with localCheckpoint per round, the
#     connected-components discipline.  The graph is a deterministic
#     web of 15-node blocks joined by single-edge bridges whose block
#     count scales with the corpus (60 nodes at sf0.001, 600 at sf0.01,
#     6000 at sf0.1) so the shuffle volumes are real at scale.
#
#     Spark inlines CTEs, so the all-SQL form (kept verbatim as the
#     DuckDB oracle) would recompute the corpus-sized DISTINCT edge
#     derivation once per reference (~9 rescans of orders); the builder
#     therefore MATERIALIZES the symmetrized edge list via
#     localCheckpoint(eager=True) — the minhash discipline — and the
#     three rounds read the bounded in-memory edge relation.
_LABELPROP_GRAPH_SQL = """
    WITH params AS (
        -- the graph size TRACKS the corpus: 15-node blocks, one block
        -- per ~375 orders (floor before the BIGINT cast — DuckDB rounds
        -- double->BIGINT while Spark truncates), never fewer than 4.
        -- sf0.001/0.01/0.1 thus exercise 60/600/6000-node graphs with
        -- proportional edge volumes instead of a fixed toy web.
        SELECT greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS nb,
               15 * greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS n
        FROM orders
    ),
    base AS (
        -- nb 15-node blocks with dense random intra-block edges ...
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params))
               - ((o_custkey % (SELECT n FROM params)) % 15)
               + (o_orderkey % 15) AS dst
        FROM orders
        WHERE (o_custkey % (SELECT n FROM params)) % 15 <> o_orderkey % 15
        UNION
        -- ... an intra-block ring so every block is connected ...
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params))
               - ((o_custkey % (SELECT n FROM params)) % 15)
               + ((o_custkey % (SELECT n FROM params)) % 15 + 1) % 15 AS dst
        FROM orders
        UNION
        -- ... and one bridge per consecutive block pair (node 14 of
        -- block b -> node 0 of block b+1, wrapping) the majority vote
        -- resists; derived from orders so the bridge set scales with nb
        SELECT DISTINCT (o_custkey % (SELECT nb FROM params)) * 15 + 14 AS src,
               (((o_custkey % (SELECT nb FROM params)) + 1)
                % (SELECT nb FROM params)) * 15 AS dst
        FROM orders
    ),
    sym AS (
        SELECT src, dst FROM base
        UNION
        SELECT dst AS src, src AS dst FROM base
    )
    SELECT src, dst FROM sym
    """

_LABELPROP_ROUNDS_SQL = """
    WITH nodes AS (SELECT DISTINCT src AS id FROM {E}),
    l0 AS (SELECT id, id AS lbl FROM nodes),
    c1 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
           FROM {E} e JOIN l0 l ON l.id = e.src
           GROUP BY e.dst, l.lbl),
    w1 AS (SELECT id, lbl FROM (
               SELECT id, lbl,
                      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
               FROM c1) t1 WHERE rn = 1),
    l1 AS (SELECT n.id, coalesce(w.lbl, p.lbl) AS lbl
           FROM nodes n LEFT JOIN w1 w ON n.id = w.id
           LEFT JOIN l0 p ON p.id = n.id),
    c2 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
           FROM {E} e JOIN l1 l ON l.id = e.src
           GROUP BY e.dst, l.lbl),
    w2 AS (SELECT id, lbl FROM (
               SELECT id, lbl,
                      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
               FROM c2) t2 WHERE rn = 1),
    l2 AS (SELECT n.id, coalesce(w.lbl, p.lbl) AS lbl
           FROM nodes n LEFT JOIN w2 w ON n.id = w.id
           LEFT JOIN l1 p ON p.id = n.id),
    c3 AS (SELECT e.dst AS id, l.lbl, count(*) AS c
           FROM {E} e JOIN l2 l ON l.id = e.src
           GROUP BY e.dst, l.lbl),
    w3 AS (SELECT id, lbl FROM (
               SELECT id, lbl,
                      row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
               FROM c3) t3 WHERE rn = 1),
    l3 AS (SELECT n.id, coalesce(w.lbl, p.lbl) AS lbl
           FROM nodes n LEFT JOIN w3 w ON n.id = w.id
           LEFT JOIN l2 p ON p.id = n.id)
    SELECT CAST(l3.id AS BIGINT) AS node_id,
           CAST(l3.lbl AS BIGINT) AS community,
           CAST(count(*) OVER (PARTITION BY l3.lbl) AS BIGINT) AS community_size
    FROM l3
    ORDER BY node_id
    """

# The oracle is the verbatim all-SQL composition with the graph fixture
# pinned MATERIALIZED: DuckDB inlines CTEs referenced from inside other
# CTEs, so without the pin each unrolled round re-derives the fixture
# from orders (measured 1.2-2.2s per graph oracle at sf0.01, ~10x that
# at sf0.1).  Semantics are unchanged.
_LABELPROP_ORACLE = (
    _LABELPROP_GRAPH_SQL.rstrip().removesuffix("SELECT src, dst FROM sym")
    + ",\n    "
    + _LABELPROP_ROUNDS_SQL.format(E="sym").lstrip().removeprefix("WITH ")
).replace("sym AS (", "sym AS MATERIALIZED (")
assert _LABELPROP_ORACLE.count("WITH ") == 1


def _block_web_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed symmetrized block-web edge relation, built once per
    (session, sf_dir) — the staging table shared by the graph family
    (label_propagation, triangle_count, khop_distances, link_prediction,
    modularity all read the identical _LABELPROP_GRAPH_SQL relation;
    r10 staging-memo move, same rationale as the near-dup pair list)."""
    return _session_memo(
        spark,
        "block_web_edges",
        sf_dir,
        lambda: catalog.sql(spark, sf_dir, _LABELPROP_GRAPH_SQL).localCheckpoint(
            eager=True
        ),
    )


@register(
    "graph_label_propagation",
    oracle=_LABELPROP_ORACLE,
    tags=("pipeline", "graph", "community"),
    doc="Synchronous label propagation (Raghavan et al. 2007), 3 unrolled "
    "rounds on the corpus-scaled block web (60..6000 nodes by sf): per "
    "round one edge join + "
    "one (dst,label) count + per-node top-1 with (count DESC, label) "
    "tiebreak; per-node state only, map-side-pruned TopNRowNumber; the "
    "symmetrized edge list is materialized once (localCheckpoint).",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    l3 = _labelprop_labels(spark, sf_dir)
    return _sql_with_views(
        spark,
        """
        SELECT CAST(l3.id AS BIGINT) AS node_id,
               CAST(l3.lbl AS BIGINT) AS community,
               CAST(count(*) OVER (PARTITION BY l3.lbl) AS BIGINT) AS community_size
        FROM __lp_l3 l3
        ORDER BY node_id
        """,
        __lp_l3=l3,
    )


_LP_ROUND_SQL = """
    WITH c AS (SELECT e.dst AS id, l.lbl, count(*) AS c
               FROM __lp_sym e JOIN __lp_prev l ON l.id = e.src
               GROUP BY e.dst, l.lbl),
    w AS (SELECT id, lbl FROM (
              SELECT id, lbl,
                     row_number() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
              FROM c) t WHERE rn = 1)
    SELECT n.id, coalesce(w.lbl, p.lbl) AS lbl
    FROM __lp_nodes n LEFT JOIN w ON n.id = w.id
    LEFT JOIN __lp_prev p ON p.id = n.id
"""


def _labelprop_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-round synchronous label-propagation labels (l3), staged per
    round (r13 scan-audit: the unrolled _LABELPROP_ROUNDS_SQL — kept
    verbatim above as the oracle text — re-expanded each l{i} twice per
    level, 22 edge-relation scans; graph_modularity then inlined the
    whole cascade 3x more).  Round math verbatim; node-sized label
    relations checkpointed.  r13 ADVICE: memoized per (session, sf_dir)
    like _block_web_edges — label_propagation and modularity consume the
    identical relation, so the 5 eager checkpoint jobs run once per
    session instead of twice."""
    return _session_memo(
        spark, "labelprop_labels", sf_dir, lambda: _labelprop_labels_build(spark, sf_dir)
    )


def _labelprop_labels_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = _block_web_edges(spark, sf_dir)
    nodes = _sql_with_views(
        spark, "SELECT DISTINCT src AS id FROM __lp_sym", __lp_sym=sym
    ).localCheckpoint(eager=True)
    l = _sql_with_views(
        spark, "SELECT id, id AS lbl FROM __lp_nodes", __lp_nodes=nodes
    ).localCheckpoint(eager=True)
    for _ in range(3):
        l = _sql_with_views(
            spark, _LP_ROUND_SQL, __lp_sym=sym, __lp_prev=l, __lp_nodes=nodes
        ).localCheckpoint(eager=True)
    return l


# Per-source boilerplate-line removal (the CCNet/C4 curation pass that
# complements text_dedup_paragraph): documents are segmented into fixed
# 8-word lines, and any line that appears in >= 2 DISTINCT documents of
# the SAME source is treated as boilerplate (nav menus, headers, legal
# footers repeat across a host's pages) and removed from EVERY document —
# remove-all, unlike paragraph dedup's corpus-global keep-first. Scale
# shape: one shuffle keyed on (source, line) for the doc-frequency
# aggregate (the exact-dedup bound — never pairwise; the probe side of
# the boilerplate join pays a second (source,line) exchange while the
# aggregate side reuses its partitioning), one shuffle back on doc_id for
# reassembly; the boilerplate decision is carried on the aggregate row,
# no window over the corpus.
_sql_query(
    "text_boilerplate_lines",
    """
    WITH tok AS (
        SELECT doc_id, source, split(text, ' ') AS t FROM documents
    ),
    lines AS (
        SELECT doc_id, source, p,
               array_join(slice(t, p * 8 + 1, 8), ' ') AS line
        FROM tok
        LATERAL VIEW explode(sequence(0, cast(ceil(size(t) / 8.0) AS INT) - 1)) s AS p
    ),
    boiler AS (
        SELECT source, line
        FROM lines GROUP BY source, line
        HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN b.line IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(length(concat_ws(' ',
               sort_array(collect_list(CASE WHEN b.line IS NULL
                   THEN concat(lpad(cast(l.p AS STRING), 6, '0'), ':', l.line)
               END)))) AS BIGINT) AS kept_len
    FROM lines l
    LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    lines AS (
        SELECT doc_id, source, p.i - 1 AS p,
               array_to_string(t[(p.i - 1) * 8 + 1 : (p.i - 1) * 8 + 8], ' ') AS line
        FROM tok, LATERAL (
            SELECT unnest(range(1, CAST(ceil(len(t) / 8.0) AS INT) + 1)) AS i
        ) p
    ),
    boiler AS (
        SELECT source, line
        FROM lines GROUP BY source, line
        HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN b.line IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(length(string_agg(CASE WHEN b.line IS NULL
               THEN lpad(CAST(l.p AS VARCHAR), 6, '0') || ':' || l.line END, ' '
               ORDER BY lpad(CAST(l.p AS VARCHAR), 6, '0') || ':' || l.line)), 0)
               AS BIGINT) AS kept_len
    FROM lines l
    LEFT JOIN boiler b ON l.source = b.source AND l.line = b.line
    GROUP BY l.doc_id
    ORDER BY l.doc_id
    """,
    tags=("pipeline", "text", "dedup"),
    doc="Per-source boilerplate-line removal (CCNet-style): 8-word line "
    "segmentation, per-(source,line) doc-frequency >= 2 -> remove ALL "
    "occurrences; (source,line)-keyed exchanges + one doc_id reassembly shuffle.",
)


# Incremental near-dup dedup (the ingestion-time variant of
# dedup_minhash_lsh, and the near-dup sibling of dedup_incremental's
# exact anti-join): documents with doc_id % 5 < 2 are the EXISTING corpus
# whose minhash signatures live in the signature store (recomputed here;
# in production they are read back from the store exactly as
# dedup_bloom_prefilter reads its snapshot), the rest are the incoming
# batch.  Only pairs touching the batch are generated — batch-vs-corpus
# and batch-vs-batch — so the historical corpus is never self-joined
# again: the candidate volume is proportional to the BATCH, not the
# corpus, which is what makes nightly ingestion dedup tractable at 100 TB.
# The banded-LSH candidate generator stays complete for the restricted
# pair set (it is a subset of the full generator, which is complete at
# J >= 0.9 with 16 bands of 4), so the output equals the exact-Jaccard
# oracle restricted to the same pairs.
_INCR_PAIR_PRED = "AND NOT (a.doc_id % 5 < 2 AND b.doc_id % 5 < 2)"

_MINHASH_VERIFY_INCR_SQL = _MINHASH_VERIFY_SQL.replace(
    "ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id",
    "ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id\n          "
    + _INCR_PAIR_PRED,
    1,
)
assert _MINHASH_VERIFY_INCR_SQL != _MINHASH_VERIFY_SQL

_DUCK_JACCARD_PAIRS_INCR = _DUCK_JACCARD_PAIRS.replace(
    "ON a.s = b.s AND a.doc_id < b.doc_id",
    "ON a.s = b.s AND a.doc_id < b.doc_id " + _INCR_PAIR_PRED,
    1,
)
assert _DUCK_JACCARD_PAIRS_INCR != _DUCK_JACCARD_PAIRS


@register(
    "dedup_minhash_incremental",
    oracle=_DUCK_JACCARD_PAIRS_INCR,
    tags=("pipeline", "dedup"),
    bench=True,
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _shingle_sets(spark, sf_dir)
    bands = _minhash_bands(spark, sf_dir)
    return _sql_with_views(
        spark, _MINHASH_VERIFY_INCR_SQL, __mh_sh=sh, __mh_bands=bands
    )


# Triangle counting + local clustering coefficient (the third graph
# primitive after PageRank and label propagation — spam/link-farm
# detection ranks hosts by how clique-like their neighborhoods are).
# Standard distributed shape (the compact-forward algorithm): canonicalize
# to src < dst edges, enumerate wedges with ONE self-equi-join on the
# shared middle vertex, close them with a second equi-join against the
# canonical edge list — never a cross product; per-node counts are a
# UNION ALL rollup, and the coefficient 2T/(d(d-1)) is floor-quantized to
# integer micro-units so both engines agree exactly.  Reads the same
# checkpointed symmetrized edge relation as label propagation.
_TRIANGLE_SQL = """
    WITH canon AS (SELECT src, dst FROM {E} WHERE src < dst),
    tris AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM canon e1
        JOIN canon e2 ON e2.src = e1.dst
        JOIN canon e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    pernode AS (
        SELECT node_id, count(*) AS n_tri FROM (
            SELECT a AS node_id FROM tris
            UNION ALL SELECT b AS node_id FROM tris
            UNION ALL SELECT c AS node_id FROM tris
        ) t GROUP BY node_id
    ),
    deg AS (SELECT src AS node_id, count(*) AS d FROM {E} GROUP BY src)
    SELECT CAST(deg.node_id AS BIGINT) AS node_id,
           CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_triangles,
           CAST(deg.d AS BIGINT) AS degree,
           CAST(CASE WHEN deg.d >= 2 THEN floor(
                2000000.0 * coalesce(p.n_tri, 0) / (deg.d * (deg.d - 1)))
                ELSE 0 END AS BIGINT) AS clustering_micro
    FROM deg LEFT JOIN pernode p ON deg.node_id = p.node_id
    ORDER BY node_id
    """

_TRIANGLE_ORACLE = (
    _LABELPROP_GRAPH_SQL.rstrip().removesuffix("SELECT src, dst FROM sym")
    + ",\n    "
    + _TRIANGLE_SQL.format(E="sym").lstrip().removeprefix("WITH ")
)
assert _TRIANGLE_ORACLE.count("WITH ") == 1


@register(
    "graph_triangle_count",
    oracle=_TRIANGLE_ORACLE,
    tags=("pipeline", "graph", "triangles"),
    doc="Triangle count + local clustering coefficient via compact-forward "
    "wedge enumeration: two equi-joins on the canonicalized (src<dst) edge "
    "list, UNION ALL per-node rollup, floor-quantized 2T/(d(d-1)) in "
    "micro-units; reads the once-checkpointed symmetrized edge relation.",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_with_views(
        spark,
        _TRIANGLE_SQL.format(E="__tc_sym"),
        __tc_sym=_block_web_edges(spark, sf_dir),
    )


# Model-based quality filtering (the fastText-classifier pipeline stage:
# score every document with a linear bag-of-words model, keep the
# positive class — the FineWeb/CCNet quality-filter shape).  The model
# here is a deterministic stand-in — hashed 64-bucket features with
# multiplicative-hash weights in exact milli-units — wired exactly the
# way a trained model is served at scale: the interpreted char-hash runs
# only over the DISTINCT token vocabulary (the simhash discipline), the
# vocabulary->weight map broadcasts back onto the token stream, and the
# per-doc score is ONE map-side-combining sum shuffle on doc_id.  In
# production the weights table is the trained model's serialized
# embedding matrix; everything else is identical.
_sql_query(
    "text_classifier_filter",
    """
    WITH tok AS (
        SELECT doc_id, explode(split(text, ' ')) AS tk FROM documents
    ),
    vocab AS (SELECT DISTINCT tk FROM tok),
    vw AS (
        SELECT tk,
               aggregate(split(tk, ''), 131L,
                         (acc, c) -> (acc * 31 + ascii(c)) % 1000000007) % 64 AS bucket
        FROM vocab
    ),
    weights AS (
        SELECT tk, CAST((bucket * 2654435761) % 2001 - 1000 AS BIGINT) AS w_milli
        FROM vw
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w.w_milli) AS BIGINT) AS score_milli,
           CAST(CASE WHEN sum(w.w_milli) > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM tok t JOIN weights w ON t.tk = w.tk
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents
    ),
    vocab AS (SELECT DISTINCT tk FROM tok),
    vw AS (
        SELECT tk,
               list_reduce(list_prepend(131::BIGINT,
                               [ascii(c)::BIGINT for c in string_split(tk, '')]),
                           (a, b) -> (a * 31 + b) % 1000000007) % 64 AS bucket
        FROM vocab
    ),
    weights AS (
        SELECT tk, CAST((bucket * 2654435761) % 2001 - 1000 AS BIGINT) AS w_milli
        FROM vw
    )
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w.w_milli) AS BIGINT) AS score_milli,
           CAST(CASE WHEN sum(w.w_milli) > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM tok t JOIN weights w ON t.tk = w.tk
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tags=("pipeline", "text", "quality"),
    bench=True,
    doc="Linear bag-of-words quality filter (fastText-stage shape): "
    "char-hash only the DISTINCT vocabulary, broadcast the "
    "vocab->weight map onto the token stream, one map-side-combining "
    "doc_id sum; exact milli-unit integer scores.",
)


# Grid-based DBSCAN (Ester et al. 1996; the density-based member of the
# clustering family next to cluster_kmeans — finds arbitrary-shape
# clusters and labels sparse points noise, the outlier-pruning step of an
# embedding-curation pipeline).  The scalable shape is the eps-GRID
# partitioner: each point lands in one floor(coord/eps) cell, expands to
# its 9-cell neighborhood (bounded 9-row CROSS JOIN), and neighbor pairs
# come from ONE equi-join on the cell key with the exact integer
# distance residual — the all-pairs O(n²) never appears.  Core points
# (>= minPts neighbors incl. self) cluster by connected components over
# the core-core adjacency, contracted with 6 unrolled rounds of
# min-label propagation + POINTER JUMPING (l(v) <- l(l(v)) after each
# propagate, the large-star shortcut), which reaches the true CC
# fixpoint at every tested scale (verified against an iterate-to-
# convergence reference at sf0.001/0.01/0.1; production loops with
# localCheckpoint per round).  Border points take the min adjacent core
# label; everything else is noise (-1).  Points are deterministic
# label-anchored blobs jittered by the first two embedding dims in exact
# integer micro-units (the graph_pagerank synthesis discipline), so both
# engines agree bit-for-bit: eps=16000 micro, minPts=6.
#
# Spark inlines CTEs — pairs feeds the neighbor count, the core
# adjacency, AND the border resolve — so the builder MATERIALIZES the
# pair list and the point table via localCheckpoint (the minhash
# discipline); the oracle keeps the verbatim all-CTE composition.
_DBSCAN_PTS_SPARK = """
    SELECT vec_id,
           (label % 5) * 300000
           + CAST(floor(CAST(embedding[0] AS DOUBLE) * 125000) AS BIGINT) AS x,
           (label DIV 5) * 300000
           + CAST(floor(CAST(embedding[1] AS DOUBLE) * 125000) AS BIGINT) AS y
    FROM embeddings
    """

_DBSCAN_PTS_DUCK = """
    SELECT vec_id,
           (label % 5) * 300000
           + CAST(floor(embedding[1]::DOUBLE * 125000) AS BIGINT) AS x,
           (label // 5) * 300000
           + CAST(floor(embedding[2]::DOUBLE * 125000) AS BIGINT) AS y
    FROM embeddings
    """

_DBSCAN_PAIRS_SQL = """
    WITH pts AS ({PTS}),
    cells AS (
        SELECT vec_id, x, y,
               CAST(floor(x / 16000.0) AS BIGINT) AS cx,
               CAST(floor(y / 16000.0) AS BIGINT) AS cy
        FROM pts
    ),
    off AS (SELECT * FROM (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),
                                  (0,1),(1,-1),(1,0),(1,1)) AS o(dx, dy)),
    expand AS (
        SELECT c.vec_id, c.x, c.y, c.cx + o.dx AS gx, c.cy + o.dy AS gy
        FROM cells c CROSS JOIN off o
    ),
    pairs AS (
        SELECT e.vec_id AS a, c.vec_id AS b
        FROM expand e JOIN cells c ON e.gx = c.cx AND e.gy = c.cy
        WHERE (e.x - c.x) * (e.x - c.x) + (e.y - c.y) * (e.y - c.y) <= 256000000
    )
    SELECT a, b FROM pairs
    """

_DBSCAN_MAIN_SQL = (
    """
    WITH nb AS (SELECT a AS id, count(*) AS n FROM {PAIRS} GROUP BY a),
    core AS (SELECT id FROM nb WHERE n >= 6),
    cedges AS (
        SELECT p.a AS src, p.b AS dst
        FROM {PAIRS} p JOIN core ca ON p.a = ca.id JOIN core cb ON p.b = cb.id
    ),
    l0 AS (SELECT id, id AS lbl FROM core),
"""
    + "".join(
        f"""    p{i} AS (SELECT e.src AS id, min(l.lbl) AS lbl
           FROM cedges e JOIN l{i - 1} l ON l.id = e.dst GROUP BY e.src),
    l{i} AS (SELECT p.id, l2.lbl FROM p{i} p JOIN p{i} l2 ON l2.id = p.lbl),
"""
        for i in range(1, 7)
    )
    + """    bord AS (
        SELECT p.a AS id, min(l.lbl) AS lbl
        FROM {PAIRS} p JOIN core cb ON p.b = cb.id JOIN l6 l ON l.id = p.b
        WHERE p.a NOT IN (SELECT id FROM core)
        GROUP BY p.a
    )
    SELECT pts.vec_id,
           CAST(CASE WHEN lc.lbl IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_core,
           CAST(coalesce(lc.lbl, bord.lbl, -1) AS BIGINT) AS cluster
    FROM {PTS} pts
    LEFT JOIN l6 lc ON pts.vec_id = lc.id
    LEFT JOIN bord ON pts.vec_id = bord.id
    ORDER BY vec_id
    """
)

_DBSCAN_ORACLE = (
    _DBSCAN_PAIRS_SQL.format(PTS=_DBSCAN_PTS_DUCK).rstrip().removesuffix("SELECT a, b FROM pairs")
    + ",\n    "
    + _DBSCAN_MAIN_SQL.format(PAIRS="pairs", PTS="pts").lstrip().removeprefix("WITH ")
)
assert _DBSCAN_ORACLE.count("WITH ") == 1
# DuckDB inlines CTEs referenced from inside other CTEs, so the unrolled
# min-label rounds re-evaluate their whole upstream ~3x per level (3^6
# overall — measured 33s at sf0.01).  MATERIALIZED pins each round to one
# evaluation (Spark doesn't need this: the pair/point inputs are
# localCheckpoint-staged views).  Semantics are unchanged.
for _n in ["pairs", "cedges", "l0"] + [f"p{_i}" for _i in range(1, 7)] + [
    f"l{_i}" for _i in range(1, 7)
]:
    _DBSCAN_ORACLE = _DBSCAN_ORACLE.replace(f" {_n} AS (", f" {_n} AS MATERIALIZED (")


@register(
    "cluster_dbscan_grid",
    oracle=_DBSCAN_ORACLE,
    tags=("pipeline", "cluster", "dbscan"),
    doc="Grid-based DBSCAN (eps=16000 micro, minPts=6): 9-cell eps-grid "
    "equi-join candidate generation (never all-pairs), exact integer "
    "distance residual, core/border/noise classification, core CC via 6 "
    "unrolled min-label + pointer-jumping rounds (fixpoint-verified at "
    "all tested scales); pair list checkpointed once.",
)
def cluster_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 scan-audit fix: the unrolled min-label + pointer-jumping rounds
    # of _DBSCAN_MAIN_SQL re-expand ~3x per level under CTE inlining
    # (p{i} twice per jump + l{i-1} once) — a 2.7 MB physical plan with
    # 888 scans of the checkpointed pair relation and 1647 Exchanges.
    # The rounds are staged per level instead (node-sized label
    # relations, same math verbatim); _DBSCAN_MAIN_SQL remains the
    # oracle-side text.
    pairs = catalog.sql(
        spark, sf_dir, _DBSCAN_PAIRS_SQL.format(PTS=_DBSCAN_PTS_SPARK)
    ).localCheckpoint(eager=True)
    pts = catalog.sql(spark, sf_dir, _DBSCAN_PTS_SPARK).localCheckpoint(eager=True)
    core = _sql_with_views(
        spark,
        """
        SELECT id FROM (SELECT a AS id, count(*) AS n FROM __db_pairs GROUP BY a)
        WHERE n >= 6
        """,
        __db_pairs=pairs,
    ).localCheckpoint(eager=True)
    cedges = _sql_with_views(
        spark,
        """
        SELECT p.a AS src, p.b AS dst
        FROM __db_pairs p JOIN __db_core ca ON p.a = ca.id
                          JOIN __db_core cb ON p.b = cb.id
        """,
        __db_pairs=pairs,
        __db_core=core,
    ).localCheckpoint(eager=True)
    l0 = _sql_with_views(
        spark, "SELECT id, id AS lbl FROM __db_core", __db_core=core
    ).localCheckpoint(eager=True)
    l6 = _minlabel_jump_rounds(spark, cedges, "src", "dst", l0, rounds=6)
    return _sql_with_views(
        spark,
        """
        WITH bord AS (
            SELECT p.a AS id, min(l.lbl) AS lbl
            FROM __db_pairs p JOIN __db_core cb ON p.b = cb.id
                              JOIN __db_l6 l ON l.id = p.b
            WHERE p.a NOT IN (SELECT id FROM __db_core)
            GROUP BY p.a
        )
        SELECT pts.vec_id,
               CAST(CASE WHEN lc.lbl IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_core,
               CAST(coalesce(lc.lbl, bord.lbl, -1) AS BIGINT) AS cluster
        FROM __db_pts pts
        LEFT JOIN __db_l6 lc ON pts.vec_id = lc.id
        LEFT JOIN bord ON pts.vec_id = bord.id
        ORDER BY vec_id
        """,
        __db_pairs=pairs,
        __db_core=core,
        __db_pts=pts,
        __db_l6=l6,
    )


_MINLABEL_JUMP_ROUND_SQL = """
    WITH p AS (SELECT e.{A} AS id, min(l.lbl) AS lbl
               FROM __mlj_edges e JOIN __mlj_prev l ON l.id = e.{B}
               GROUP BY e.{A})
    SELECT p.id, l2.lbl FROM p p JOIN p l2 ON l2.id = p.lbl
"""


def _minlabel_jump_rounds(
    spark: SparkSession, edges: DataFrame, a: str, b: str, l0: DataFrame, rounds: int
) -> DataFrame:
    """Staged min-label + pointer-jumping connected-component rounds over
    a checkpointed edge relation ({A} <- {B}); the per-round label
    relation (node-sized) is checkpointed so the unrolled-CTE ~3x-per-
    level re-expansion (the dbscan/snn r13 audit finding) cannot occur.
    Round math is verbatim _DBSCAN_MAIN_SQL / _SNN_MAIN_SQL: propagate
    min neighbor label, then jump each label to ITS label."""
    l = l0
    for _ in range(rounds):
        l = _sql_with_views(
            spark,
            _MINLABEL_JUMP_ROUND_SQL.format(A=a, B=b),
            __mlj_edges=edges,
            __mlj_prev=l,
        ).localCheckpoint(eager=True)
    return l


# ---------------------------------------------------------------------------
# BM25 ranked retrieval (Okapi BM25, Lucene idf variant)
# ---------------------------------------------------------------------------
# The retrieval companion to text_tfidf_top_terms: rank documents against a
# query workload with BM25 (k1=1.2, b=0.75).  The query set is derived
# deterministically from the corpus itself (the 6 highest-df terms, paired
# into 3 two-term queries) so the operator is data-independent and both
# engines see identical queries.
#
# Numeric contract: with k1=6/5 and b=3/4 the tf-normalization is an exact
# integer rational — tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) scaled by
# 10*S (S = total corpus tokens, avgdl = S/N) becomes
# 22*tf*S / (10*S*tf + 3*S + 9*N*dl), all BIGINT.  Only the idf is
# irrational; it quantizes to integer micro-units BEFORE the rational
# multiply (the trigram-LM pattern), so per-term contributions and their
# sums are exact integers on both engines.  Lucene's idf variant
# ln(1 + (N-df+0.5)/(df+0.5)) = ln((2N+2)/(2df+1)) keeps idf > 0 for
# stop-word-frequency terms.
#
# Scale shape (100 TB posture): the corpus is exploded ONCE — the
# (doc_id, term, tf) posting list is localCheckpoint-materialized (Spark
# inlines CTEs; the naive single-statement form rescans and re-aggregates
# the corpus 4x) and doclen once more on top of it, so df / total-token /
# score stages are aggregations over the materialized postings, never
# fresh parquet scans.  The 6-row query-term set broadcasts back onto the
# posting list (BroadcastHashJoin); the scalar (N, S) row is an
# IdentityBroadcast cross; the per-query top-5 rank()<=5 executes as
# WindowGroupLimit partial/final — map-side top-k, no full sort of the
# scored corpus.
_BM25_POSTING_SQL = """
    SELECT doc_id, term, count(*) AS tf
    FROM (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents)
    GROUP BY doc_id, term
"""

_BM25_MAIN_SQL = """
    WITH tot AS (SELECT count(*) AS n, sum(dl) AS s FROM __bm25_doclen),
    df AS (SELECT term, count(*) AS df FROM __bm25_posting GROUP BY term),
    qterms AS (
        SELECT cast(ceil(rk / 2.0) AS INT) AS query_id, term, df
        FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk FROM df)
        WHERE rk <= 6
    ),
    contrib AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               DIV (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM __bm25_posting p
        JOIN qterms q ON p.term = q.term
        JOIN __bm25_doclen d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    scored AS (
        SELECT query_id, doc_id, sum(c_micro) AS bm25_micro
        FROM contrib GROUP BY query_id, doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, bm25_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM scored
    )
    SELECT query_id, rk, doc_id, bm25_micro
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
"""


def _term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed (doc_id, term, tf) inverted posting list, built once
    per (session, sf_dir) — the staging table shared by text_bm25_topk /
    sim_hybrid_rrf / sim_query_expansion_prf / text_perplexity_bucket
    (r10: the same staging-memo move the r9 verdict prescribed for the
    near-dup pair list; four bench entries paid this tokenize+rollup
    each run)."""
    return _session_memo(
        spark,
        "term_postings",
        sf_dir,
        lambda: catalog.sql(spark, sf_dir, _BM25_POSTING_SQL).localCheckpoint(
            eager=True
        ),
    )


def _doc_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed (doc_id, dl) document lengths over _term_postings."""
    return _session_memo(
        spark,
        "doc_lengths",
        sf_dir,
        lambda: _sql_with_views(
            spark,
            "SELECT doc_id, sum(tf) AS dl FROM __po GROUP BY doc_id",
            __po=_term_postings(spark, sf_dir),
        ).localCheckpoint(eager=True),
    )


@register(
    "text_bm25_topk",
    oracle="""
    WITH posting AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    doclen AS (SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM posting GROUP BY doc_id),
    tot AS (SELECT count(*) AS n, cast(sum(dl) AS BIGINT) AS s FROM doclen),
    df AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
    qterms AS (
        SELECT cast(ceil(rk / 2.0) AS INT) AS query_id, term, df
        FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk FROM df)
        WHERE rk <= 6
    ),
    contrib AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               // (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM posting p
        JOIN qterms q ON p.term = q.term
        JOIN doclen d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    scored AS (
        SELECT query_id, doc_id, cast(sum(c_micro) AS BIGINT) AS bm25_micro
        FROM contrib GROUP BY query_id, doc_id
    ),
    ranked AS (
        SELECT query_id, doc_id, bm25_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM scored
    )
    SELECT query_id, rk, doc_id, bm25_micro
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    tags=("pipeline", "text", "bm25", "retrieval"),
    doc="Okapi BM25 (k1=1.2, b=0.75, Lucene idf) top-5 docs for 3 "
    "corpus-derived two-term queries; posting list materialized once, "
    "exact-integer rational scoring, WindowGroupLimit top-k.",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_with_views(
        spark,
        _BM25_MAIN_SQL,
        __bm25_posting=_term_postings(spark, sf_dir),
        __bm25_doclen=_doc_lengths(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 + dense cosine fused by Reciprocal Rank Fusion
# ---------------------------------------------------------------------------
# The modern RAG-retrieval staple (Cormack et al. 2009 RRF; the
# Elasticsearch/Vespa "hybrid search" default): a lexical ranking (Okapi
# BM25, exactly text_bm25_topk's integer-rational scoring) and a dense
# ranking (cosine over the embeddings table, probe = the embedding whose
# vec_id equals the query_id) are fused per (query, doc) with
# RRF(d) = sum_systems 1/(k + rank_s(d)), k=60 — quantized to integer
# nano-units (1e9 DIV (60+rank)) so the fusion is exact in both engines.
#
# Numeric contract: the dense ranking never compares floats — embeddings
# quantize to integer milli-units, the sort key is the exact integer
# (dot^2 * 1000) DIV |c|^2 signed by the dot (monotone in cosine for the
# per-query-constant |q|; worst case 64 * 600^2 = 2.3e7 dot, 5.3e17 after
# the multiply — inside int64), ties broken by doc_id.  BM25 side is the
# established exact-integer rational.
#
# Scale shape (100 TB posture): postings materialized ONCE
# (localCheckpoint, the BM25 discipline) — df/doclen/score stages reuse
# them with zero parquet rescans; the 3-probe set broadcasts onto ONE
# scan of the embedding corpus (never a corpus self-join); both rankings
# cut to top-20 via WindowGroupLimit (map-side top-k, no full sort of the
# scored corpus); the fusion join then touches <= 40 rows per query.


_RRF_MAIN_SQL = """
    WITH tot AS (SELECT count(*) AS n, sum(dl) AS s FROM __rrf_doclen),
    df AS (SELECT term, count(*) AS df FROM __rrf_posting GROUP BY term),
    qterms AS (
        SELECT CAST(ceil(rk / 2.0) AS BIGINT) AS query_id, term, df
        FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk FROM df)
        WHERE rk <= 6
    ),
    contrib AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               DIV (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM __rrf_posting p
        JOIN qterms q ON p.term = q.term
        JOIN __rrf_doclen d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    lex_scored AS (
        SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id, sum(c_micro) AS bm25_micro
        FROM contrib GROUP BY query_id, doc_id
    ),
    lex AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM lex_scored
    ),
    en AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id, v,
               greatest(aggregate(v, 0L, (a, x) -> a + x * x), 1L) AS nrm2
        FROM (SELECT vec_id,
                     transform(embedding,
                               x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
              FROM embeddings)
    ),
    probes AS (SELECT vec_id AS query_id, v AS qv FROM en WHERE vec_id BETWEEN 1 AND 3),
    dots AS (
        SELECT p.query_id, c.vec_id AS doc_id,
               aggregate(zip_with(p.qv, c.v, (x, y) -> x * y), 0L, (a, x) -> a + x) AS dot,
               c.nrm2
        FROM probes p JOIN en c ON c.vec_id <> p.query_id
    ),
    dense AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY
                   (CASE WHEN dot >= 0 THEN (dot * dot * 1000) DIV nrm2
                         ELSE -((dot * dot * 1000) DIV nrm2) END) DESC,
                   doc_id) AS rk
        FROM dots
    ),
    fused AS (
        SELECT coalesce(l.query_id, d.query_id) AS query_id,
               coalesce(l.doc_id, d.doc_id) AS doc_id,
               coalesce(1000000000 DIV (60 + l.rk), 0)
                 + coalesce(1000000000 DIV (60 + d.rk), 0) AS rrf_nano,
               l.rk AS lex_rk, d.rk AS dense_rk
        FROM (SELECT * FROM lex WHERE rk <= 20) l
        FULL OUTER JOIN (SELECT * FROM dense WHERE rk <= 20) d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id,
           CAST(rrf_nano AS BIGINT) AS rrf_nano,
           CAST(coalesce(lex_rk, -1) AS BIGINT) AS lex_rank,
           CAST(coalesce(dense_rk, -1) AS BIGINT) AS dense_rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_nano DESC, doc_id) AS rk
        FROM fused
    ) WHERE rk <= 10
    ORDER BY query_id, rk
"""


@register(
    "sim_hybrid_rrf",
    oracle="""
    WITH posting AS (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    doclen AS (SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM posting GROUP BY doc_id),
    tot AS (SELECT count(*) AS n, cast(sum(dl) AS BIGINT) AS s FROM doclen),
    df AS (SELECT term, count(*) AS df FROM posting GROUP BY term),
    qterms AS (
        SELECT CAST(ceil(rk / 2.0) AS BIGINT) AS query_id, term, df
        FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk FROM df)
        WHERE rk <= 6
    ),
    contrib AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               // (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM posting p
        JOIN qterms q ON p.term = q.term
        JOIN doclen d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    lex_scored AS (
        SELECT query_id, CAST(doc_id AS BIGINT) AS doc_id,
               cast(sum(c_micro) AS BIGINT) AS bm25_micro
        FROM contrib GROUP BY query_id, doc_id
    ),
    lex AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM lex_scored
    ),
    en AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id, v,
               greatest(cast(list_sum([x * x FOR x IN v]) AS BIGINT), 1) AS nrm2
        FROM (SELECT vec_id,
                     [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
              FROM embeddings)
    ),
    probes AS (SELECT vec_id AS query_id, v AS qv FROM en WHERE vec_id BETWEEN 1 AND 3),
    dots AS (
        SELECT p.query_id, c.vec_id AS doc_id,
               cast(list_sum([p.qv[i] * c.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               c.nrm2
        FROM probes p JOIN en c ON c.vec_id <> p.query_id
    ),
    dense AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id ORDER BY
                   (CASE WHEN dot >= 0 THEN (dot * dot * 1000) // nrm2
                         ELSE -((dot * dot * 1000) // nrm2) END) DESC,
                   doc_id) AS rk
        FROM dots
    ),
    fused AS (
        SELECT coalesce(l.query_id, d.query_id) AS query_id,
               coalesce(l.doc_id, d.doc_id) AS doc_id,
               coalesce(1000000000 // (60 + l.rk), 0)
                 + coalesce(1000000000 // (60 + d.rk), 0) AS rrf_nano,
               l.rk AS lex_rk, d.rk AS dense_rk
        FROM (SELECT * FROM lex WHERE rk <= 20) l
        FULL OUTER JOIN (SELECT * FROM dense WHERE rk <= 20) d
          ON l.query_id = d.query_id AND l.doc_id = d.doc_id
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id,
           CAST(rrf_nano AS BIGINT) AS rrf_nano,
           CAST(coalesce(lex_rk, -1) AS BIGINT) AS lex_rank,
           CAST(coalesce(dense_rk, -1) AS BIGINT) AS dense_rank
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rrf_nano DESC, doc_id) AS rk
        FROM fused
    ) t WHERE rk <= 10
    ORDER BY query_id, rk
    """,
    tags=("pipeline", "retrieval", "hybrid", "rrf"),
    bench=True,
    doc="Hybrid retrieval (Cormack et al. 2009 RRF, k=60): BM25 lexical "
    "top-20 fused with dense cosine top-20 (integer-exact sort keys on "
    "milli-quantized embeddings, probe broadcast onto one corpus scan), "
    "rrf_nano = sum of 1e9 DIV (60+rank); postings materialized once.",
)
def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # reads the shared posting staging table; the query also scans the
    # embeddings catalog table, hence sf_dir
    return _sql_with_views(
        spark,
        _RRF_MAIN_SQL,
        sf_dir=sf_dir,
        __rrf_posting=_term_postings(spark, sf_dir),
        __rrf_doclen=_doc_lengths(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# k-core decomposition (fixed k, unrolled peeling)
# ---------------------------------------------------------------------------
# The fourth graph primitive (after PageRank / label propagation /
# triangles): iteratively peel nodes of degree < k until none remain —
# the standard spam-farm / community-density filter (Seidman 1983;
# distributed peeling per Montresor et al.).  Each round is the canonical
# shape: ONE join of the edge list against the current alive set (both
# endpoints) + ONE degree aggregate + the HAVING filter; per-node state
# only.  Five rounds unroll declaratively; the graph is the symmetrized
# skewed hub web (degrees range ~2..hundreds, so peeling CASCADES —
# verified to reach its fixpoint in <= 4 rounds at sf0.001/0.01/0.1, with
# round 5 as the margin; tests/test_pipeline assert no node peels at
# round 5 and cross-check membership against an independent loop-to-
# fixpoint peeling).  peeled_round records WHEN each node fell (0 =
# in-core), the cheap coreness diagnostic.
_KCORE_GRAPH_SQL = """
    WITH params AS (
        -- same corpus-scaled derivation as the other graph fixtures:
        -- ~375 orders per 15 nodes, floor before the BIGINT cast
        SELECT 15 * greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS n
        FROM orders
    ),
    edges AS (
        -- skewed web: hub links (dst skews toward low ids) + a ring
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               o_orderkey % (1 + o_custkey % 12) AS dst
        FROM orders
        WHERE o_custkey % (SELECT n FROM params)
              <> o_orderkey % (1 + o_custkey % 12)
        UNION
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params) + 1)
               % (SELECT n FROM params) AS dst
        FROM orders
    ),
    sym AS (
        SELECT src, dst FROM edges
        UNION
        SELECT dst AS src, src AS dst FROM edges
    )
    SELECT src, dst FROM sym
    """

_KCORE_ROUNDS_SQL = """
    WITH nodes AS (SELECT DISTINCT src AS id FROM {E}),
    a1 AS (SELECT src AS id, count(*) AS d FROM {E}
           GROUP BY src HAVING count(*) >= 6),
    a2 AS (SELECT e.src AS id, count(*) AS d FROM {E} e
           JOIN a1 x ON e.dst = x.id JOIN a1 y ON e.src = y.id
           GROUP BY e.src HAVING count(*) >= 6),
    a3 AS (SELECT e.src AS id, count(*) AS d FROM {E} e
           JOIN a2 x ON e.dst = x.id JOIN a2 y ON e.src = y.id
           GROUP BY e.src HAVING count(*) >= 6),
    a4 AS (SELECT e.src AS id, count(*) AS d FROM {E} e
           JOIN a3 x ON e.dst = x.id JOIN a3 y ON e.src = y.id
           GROUP BY e.src HAVING count(*) >= 6),
    a5 AS (SELECT e.src AS id, count(*) AS d FROM {E} e
           JOIN a4 x ON e.dst = x.id JOIN a4 y ON e.src = y.id
           GROUP BY e.src HAVING count(*) >= 6)
    SELECT CAST(n.id AS BIGINT) AS node_id,
           CAST(CASE WHEN a5.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
           CAST(coalesce(a5.d, -1) AS BIGINT) AS core_degree,
           CAST(CASE WHEN a1.id IS NULL THEN 1
                     WHEN a2.id IS NULL THEN 2
                     WHEN a3.id IS NULL THEN 3
                     WHEN a4.id IS NULL THEN 4
                     WHEN a5.id IS NULL THEN 5
                     ELSE 0 END AS BIGINT) AS peeled_round
    FROM nodes n
    LEFT JOIN a1 ON n.id = a1.id
    LEFT JOIN a2 ON n.id = a2.id
    LEFT JOIN a3 ON n.id = a3.id
    LEFT JOIN a4 ON n.id = a4.id
    LEFT JOIN a5 ON n.id = a5.id
    ORDER BY node_id
    """

_KCORE_ORACLE = (
    _KCORE_GRAPH_SQL.rstrip().removesuffix("SELECT src, dst FROM sym")
    + ",\n    "
    + _KCORE_ROUNDS_SQL.format(E="sym").lstrip().removeprefix("WITH ")
).replace("sym AS (", "sym AS MATERIALIZED (")
assert _KCORE_ORACLE.count("WITH ") == 1

# r13 scan-audit fix: the declaratively-unrolled _KCORE_ROUNDS_SQL (kept
# above verbatim — it IS the oracle text) re-expands every round twice
# when Spark inlines the CTEs (a5 contains a4 twice -> a3 4x -> ... a1
# 16x; the final LEFT JOINs re-expand the whole cascade once more):
# 600-node physical plan, 116 scans of the checkpointed edge relation,
# 224 Exchanges.  The Spark-side builder stages ALTERNATE rounds (a2 and
# a4) as localCheckpoints: with every second round materialized the
# inline expansion is capped at one doubling (a3 inlines checkpointed a2
# twice, a5 inlines checkpointed a4 twice — 4 edge scans total, ~9 KB
# plan), while paying HALF the per-build checkpoint jobs of full
# per-round staging.  Measured at sf0.1 (same-session, two passes):
# hybrid 1.87/1.34s vs unrolled 1.98/1.69s vs fully-staged 3.16/1.58s.
_KCORE_A2_SQL = """
    WITH a1 AS (SELECT src AS id, count(*) AS d FROM __kc_sym
                GROUP BY src HAVING count(*) >= 6)
    SELECT e.src AS id, count(*) AS d
    FROM __kc_sym e JOIN a1 x ON e.dst = x.id JOIN a1 y ON e.src = y.id
    GROUP BY e.src HAVING count(*) >= 6
"""

_KCORE_A4_SQL = """
    WITH a3 AS (SELECT e.src AS id, count(*) AS d
                FROM __kc_sym e JOIN __kc_a2 x ON e.dst = x.id
                                JOIN __kc_a2 y ON e.src = y.id
                GROUP BY e.src HAVING count(*) >= 6)
    SELECT e.src AS id, count(*) AS d
    FROM __kc_sym e JOIN a3 x ON e.dst = x.id JOIN a3 y ON e.src = y.id
    GROUP BY e.src HAVING count(*) >= 6
"""

_KCORE_FINAL_SQL = """
    WITH nodes AS (SELECT DISTINCT src AS id FROM __kc_sym),
    a1 AS (SELECT src AS id, count(*) AS d FROM __kc_sym
           GROUP BY src HAVING count(*) >= 6),
    a3 AS (SELECT e.src AS id, count(*) AS d
           FROM __kc_sym e JOIN __kc_a2 x ON e.dst = x.id
                           JOIN __kc_a2 y ON e.src = y.id
           GROUP BY e.src HAVING count(*) >= 6),
    a5 AS (SELECT e.src AS id, count(*) AS d
           FROM __kc_sym e JOIN __kc_a4 x ON e.dst = x.id
                           JOIN __kc_a4 y ON e.src = y.id
           GROUP BY e.src HAVING count(*) >= 6)
    SELECT CAST(n.id AS BIGINT) AS node_id,
           CAST(CASE WHEN a5.id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core,
           CAST(coalesce(a5.d, -1) AS BIGINT) AS core_degree,
           CAST(CASE WHEN a1.id IS NULL THEN 1
                     WHEN a2.id IS NULL THEN 2
                     WHEN a3.id IS NULL THEN 3
                     WHEN a4.id IS NULL THEN 4
                     WHEN a5.id IS NULL THEN 5
                     ELSE 0 END AS BIGINT) AS peeled_round
    FROM nodes n
    LEFT JOIN a1 ON n.id = a1.id
    LEFT JOIN __kc_a2 a2 ON n.id = a2.id
    LEFT JOIN a3 ON n.id = a3.id
    LEFT JOIN __kc_a4 a4 ON n.id = a4.id
    LEFT JOIN a5 ON n.id = a5.id
    ORDER BY node_id
"""


@register(
    "graph_kcore",
    oracle=_KCORE_ORACLE,
    tags=("pipeline", "graph", "kcore"),
    bench=True,  # r7: round-over-round perf tracking for the graph family
    doc="6-core decomposition by staged peeling (Seidman 1983): per "
    "round one edge-vs-alive join + degree aggregate + HAVING filter on "
    "the corpus-scaled skewed hub web, each round's node-sized alive set "
    "checkpointed (r13: the inlined 5-round cascade re-expanded every "
    "prior round twice — 600-node plan, 116 edge scans); fixpoint within "
    "4 rounds at all tested scales (round 5 = margin, test-asserted "
    "empty); peeled_round is the coreness diagnostic; symmetrized edges "
    "checkpointed once.",
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = catalog.sql(spark, sf_dir, _KCORE_GRAPH_SQL).localCheckpoint(eager=True)
    a2 = _sql_with_views(spark, _KCORE_A2_SQL, __kc_sym=sym).localCheckpoint(
        eager=True
    )
    a4 = _sql_with_views(
        spark, _KCORE_A4_SQL, __kc_sym=sym, __kc_a2=a2
    ).localCheckpoint(eager=True)
    return _sql_with_views(
        spark, _KCORE_FINAL_SQL, __kc_sym=sym, __kc_a2=a2, __kc_a4=a4
    )


# ---------------------------------------------------------------------------
# Positional phrase search (exact phrase match over a positional index)
# ---------------------------------------------------------------------------
# The third retrieval primitive after BM25 and hybrid-RRF: exact phrase
# queries need POSITIONAL postings — (doc_id, pos, term) — assembled into
# n-gram occurrences, the inverted-index shape every search engine's
# phrase/proximity operator builds on (Lucene's PhraseQuery over term
# positions).  The phrase workload derives deterministically from the
# corpus (the 3 most frequent trigram phrases, count-then-text tiebreak),
# mirroring BM25's query derivation.
#
# Scale shape (100 TB posture): tokenization + position assignment ride
# ONE corpus scan; trigram assembly is a lead() window — ONE sort-shuffle
# on doc_id, never a positional self-join (the naive pos/pos+1/pos+2
# 3-way join shuffles the posting list three times); the assembled
# trigram relation is localCheckpoint-materialized once, so the
# frequency ranking and the match scan read it without recomputing the
# window; the 3-phrase workload broadcasts onto the match scan
# (BroadcastHashJoin), and per-phrase stats are one bounded rollup.
_PHRASE_TRIGRAM_SQL = """
    WITH tok AS (
        SELECT doc_id, pos, term
        FROM documents
        LATERAL VIEW posexplode(split(text, ' ')) x AS pos, term
    )
    SELECT doc_id, pos, t1 || ' ' || t2 || ' ' || t3 AS phrase
    FROM (
        SELECT doc_id, pos, term AS t1,
               lead(term, 1) OVER w AS t2,
               lead(term, 2) OVER w AS t3
        FROM tok
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    )
    WHERE t3 IS NOT NULL
"""

_PHRASE_MAIN_SQL = """
    WITH top_phrases AS (
        SELECT phrase,
               row_number() OVER (ORDER BY count(*) DESC, phrase) AS phrase_rank
        FROM {TRI} GROUP BY phrase
    ),
    matches AS (
        SELECT tp.phrase_rank, tp.phrase, t.doc_id, t.pos
        FROM {TRI} t
        JOIN (SELECT * FROM top_phrases WHERE phrase_rank <= 3) tp
          ON t.phrase = tp.phrase
    )
    SELECT CAST(phrase_rank AS BIGINT) AS phrase_rank, phrase,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(doc_id * 100000 + pos) AS BIGINT) AS pos_checksum
    FROM matches
    GROUP BY phrase_rank, phrase
    ORDER BY phrase_rank
"""


@register(
    "text_phrase_search",
    oracle="""
    WITH tokarr AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    tok AS (
        SELECT doc_id, p.i - 1 AS pos, t[p.i] AS term
        FROM tokarr, LATERAL (
            SELECT unnest(range(1, len(t) + 1)) AS i
        ) p
    ),
    tri AS (
        SELECT doc_id, pos, t1 || ' ' || t2 || ' ' || t3 AS phrase
        FROM (
            SELECT doc_id, pos, term AS t1,
                   lead(term, 1) OVER w AS t2,
                   lead(term, 2) OVER w AS t3
            FROM tok
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        )
        WHERE t3 IS NOT NULL
    ),
    top_phrases AS (
        SELECT phrase,
               row_number() OVER (ORDER BY count(*) DESC, phrase) AS phrase_rank
        FROM tri GROUP BY phrase
    ),
    matches AS (
        SELECT tp.phrase_rank, tp.phrase, t.doc_id, t.pos
        FROM tri t
        JOIN (SELECT * FROM top_phrases WHERE phrase_rank <= 3) tp
          ON t.phrase = tp.phrase
    )
    SELECT CAST(phrase_rank AS BIGINT) AS phrase_rank, phrase,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_hits,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(doc_id * 100000 + pos) AS BIGINT) AS pos_checksum
    FROM matches
    GROUP BY phrase_rank, phrase
    ORDER BY phrase_rank
    """,
    tags=("pipeline", "text", "retrieval", "phrase"),
    doc="Exact phrase search over positional postings (Lucene PhraseQuery "
    "shape): trigram occurrences assembled by ONE lead() window per doc "
    "(never a positional self-join), checkpointed once; the 3-phrase "
    "corpus-derived workload broadcasts onto the match scan; per-phrase "
    "doc/hit counts + integer position checksum.",
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri = catalog.sql(spark, sf_dir, _PHRASE_TRIGRAM_SQL).localCheckpoint(eager=True)
    tri.createOrReplaceTempView("__ph_tri")
    return spark.sql(_PHRASE_MAIN_SQL.format(TRI="__ph_tri"))


# ---------------------------------------------------------------------------
# Audio fingerprint dedup (the audio sibling of mm_image_phash_dedup)
# ---------------------------------------------------------------------------
# Shazam-lite content fingerprinting: each payload is serialized into a
# REAL RIFF/WAVE file and decoded back with the stdlib wave/struct codec
# (the mm_audio_windows machinery riding the ingest scan), then reduced to
# a compact fingerprint — the energy-transition bit string (does window
# w+1 carry more energy than window w, first 32 transitions) plus the
# window count.  Dedup is then ONE (fingerprint, n_windows) groupBy —
# never a sample-level self-join — exactly the phash discipline: at
# 100 TB the decode rides the scan in Arrow batches, the groupBy moves
# ~40 bytes per clip, and injected duplicate payloads prove the operator
# removes something.  The oracle predicts the transition bits from the
# same byte arithmetic (samples are (byte-96)*256, so energy comparisons
# are scale-invariant).


@register(
    "mm_audio_fingerprint_dedup",
    bench=True,  # r7: round-over-round perf tracking for the mm family
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id < 150 AND doc_id % 25 = 0
    ),
    en AS (
        SELECT doc_id,
               [list_sum([(ascii(c) - 96) * (ascii(c) - 96)
                          FOR c IN string_split(substring(text, off + 1, 100), '')])
                FOR off IN range(0, length(text), 100)] AS es
        FROM corpus
    ),
    fp AS (
        SELECT doc_id,
               coalesce(list_aggregate(
                   [CASE WHEN es[i + 1] > es[i] THEN '1' ELSE '0' END
                    FOR i IN generate_series(1, least(32, len(es) - 1))],
                   'string_agg', ''), '') AS fingerprint,
               CAST(len(es) AS BIGINT) AS n_windows
        FROM en
    )
    SELECT fingerprint, n_windows,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM fp
    GROUP BY fingerprint, n_windows
    HAVING count(*) > 1
    ORDER BY keep_id
    """,
    tags=("pipeline", "multimodal", "audio", "dedup"),
    doc="Audio content dedup via energy-transition fingerprints over real "
    "RIFF/WAVE payloads (stdlib codec in mapInPandas): 32-transition bit "
    "string + window count per clip, dedup = ONE fingerprint groupBy — "
    "never a sample self-join; injected duplicates prove removal.",
)
def mm_audio_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_wav, encode_wav_pcm16

    corpus = catalog.sql(
        spark,
        sf_dir,
        """
        SELECT doc_id, text FROM documents WHERE doc_id < 150
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id < 150 AND doc_id % 25 = 0
        """,
    ).select("doc_id", F.encode("text", "UTF-8").alias("payload"))

    def fingerprint(batches):
        for pdf in batches:
            ids, fps, nws = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = encode_wav_pcm16(
                    [(b - 96) * 256 for b in payload], sample_rate=8000
                )
                _rate, _nch, samples = decode_wav(wav)
                es = [
                    sum(s * s for s in samples[off : off + 100])
                    for off in range(0, len(samples), 100)
                ]
                bits = "".join(
                    "1" if es[i + 1] > es[i] else "0"
                    for i in range(min(32, len(es) - 1))
                )
                ids.append(doc_id)
                fps.append(bits)
                nws.append(len(es))
            yield pd.DataFrame(
                {"doc_id": ids, "fingerprint": fps, "n_windows": nws}
            )

    fp = corpus.mapInPandas(
        fingerprint, "doc_id bigint, fingerprint string, n_windows bigint"
    )
    return (
        fp.groupBy("fingerprint", "n_windows")
        .agg(
            F.min("doc_id").cast("bigint").alias("keep_id"),
            F.count("*").cast("bigint").alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("keep_id")
    )


# ---------------------------------------------------------------------------
# k-hop BFS distance labeling (multi-source frontier relaxation)
# ---------------------------------------------------------------------------
# The fifth graph primitive: bounded-hop distance from a seed set — the
# "within k clicks of a trusted page" crawl-frontier / trust-propagation
# primitive (and the building block of multi-source shortest paths).
# Seeds are the block roots (id % 15 = 0), so the seed set SCALES with
# the corpus-scaled graph.  Each of the 4 unrolled rounds is the
# canonical relaxation shape: one edge-vs-distance equi-join + one
# min() aggregate over (previous distances UNION ALL relaxed edges) —
# per-node state only, never per-path.  Nodes beyond 4 hops report
# dist = -1 / reached = 0 (the bounded-k contract, not a fixpoint
# claim); reads the once-checkpointed symmetrized block-web edges.
_KHOP_ROUNDS_SQL = """
    WITH nodes AS (SELECT DISTINCT src AS id FROM {E}),
    d0 AS (SELECT id AS v, 0 AS d FROM nodes WHERE id % 15 = 0),
    d1 AS (SELECT v, min(d) AS d FROM (
               SELECT v, d FROM d0
               UNION ALL
               SELECT e.dst AS v, d0.d + 1 AS d FROM {E} e JOIN d0 ON e.src = d0.v
           ) u GROUP BY v),
    d2 AS (SELECT v, min(d) AS d FROM (
               SELECT v, d FROM d1
               UNION ALL
               SELECT e.dst AS v, d1.d + 1 AS d FROM {E} e JOIN d1 ON e.src = d1.v
           ) u GROUP BY v),
    d3 AS (SELECT v, min(d) AS d FROM (
               SELECT v, d FROM d2
               UNION ALL
               SELECT e.dst AS v, d2.d + 1 AS d FROM {E} e JOIN d2 ON e.src = d2.v
           ) u GROUP BY v),
    d4 AS (SELECT v, min(d) AS d FROM (
               SELECT v, d FROM d3
               UNION ALL
               SELECT e.dst AS v, d3.d + 1 AS d FROM {E} e JOIN d3 ON e.src = d3.v
           ) u GROUP BY v)
    SELECT CAST(n.id AS BIGINT) AS node_id,
           CAST(coalesce(d4.d, -1) AS BIGINT) AS dist,
           CAST(CASE WHEN d4.d IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached
    FROM nodes n LEFT JOIN d4 ON n.id = d4.v
    ORDER BY node_id
    """

_KHOP_ORACLE = (
    _LABELPROP_GRAPH_SQL.rstrip().removesuffix("SELECT src, dst FROM sym")
    + ",\n    "
    + _KHOP_ROUNDS_SQL.format(E="sym").lstrip().removeprefix("WITH ")
).replace("sym AS (", "sym AS MATERIALIZED (")
assert _KHOP_ORACLE.count("WITH ") == 1


@register(
    "graph_khop_distances",
    oracle=_KHOP_ORACLE,
    tags=("pipeline", "graph", "bfs"),
    doc="Multi-source k-hop BFS distances (k=4) from the corpus-scaled "
    "seed set (block roots): per round one edge-vs-distance equi-join + "
    "one min() aggregate — per-node state, never per-path; unreached "
    "nodes report -1; edges checkpointed once.",
)
def graph_khop_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 scan-audit fix: each unrolled relaxation round references the
    # previous distance relation twice (union branch + join branch), so
    # inlining doubled the subtree per level (32 edge-relation scans);
    # the node-sized distance relation is now checkpointed per round.
    # Round math is verbatim _KHOP_ROUNDS_SQL (the oracle text above).
    sym = _block_web_edges(spark, sf_dir)
    nodes = _sql_with_views(
        spark, "SELECT DISTINCT src AS id FROM __kh_sym", __kh_sym=sym
    ).localCheckpoint(eager=True)
    d = _sql_with_views(
        spark, "SELECT id AS v, 0 AS d FROM __kh_nodes WHERE id % 15 = 0", __kh_nodes=nodes
    ).localCheckpoint(eager=True)
    for _ in range(4):
        d = _sql_with_views(
            spark,
            """
            SELECT v, min(d) AS d FROM (
                SELECT v, d FROM __kh_prev
                UNION ALL
                SELECT e.dst AS v, p.d + 1 AS d FROM __kh_sym e JOIN __kh_prev p ON e.src = p.v
            ) u GROUP BY v
            """,
            __kh_sym=sym,
            __kh_prev=d,
        ).localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        """
        SELECT CAST(n.id AS BIGINT) AS node_id,
               CAST(coalesce(d4.d, -1) AS BIGINT) AS dist,
               CAST(CASE WHEN d4.d IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS reached
        FROM __kh_nodes n LEFT JOIN __kh_d4 d4 ON n.id = d4.v
        ORDER BY node_id
        """,
        __kh_nodes=nodes,
        __kh_d4=d,
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection (frame-delta segmentation over the AVI codec)
# ---------------------------------------------------------------------------
# Completes the modality triple's analysis surface (image: phash dedup;
# audio: fingerprint dedup; video: THIS): consecutive decoded frames are
# compared by L1 pixel delta and a cut is declared when the delta exceeds
# the threshold — the shot-boundary primitive every video-curation
# pipeline runs before frame sampling (sample per scene, not per stride).
# The frames travel through the REAL spec-complete AVI/RIFF roundtrip
# (encode DIB -> decode, the mm_video_frames machinery), so a channel/
# row-order/padding bug in either codec direction breaks the exact
# checksum.  Scale shape: ONE Arrow mapInPandas pass over the corpus scan
# with per-doc state only (a frame pair at a time — O(frame) memory
# however long the clip), per-doc aggregates emitted executor-side, no
# shuffle before the presentation sort; payloads never reach the driver.


@register(
    "mm_video_scene_cut",
    oracle="""
    WITH f AS (
        SELECT doc_id, text, length(text) AS L, 1 + length(text) % 5 AS nf
        FROM documents
        WHERE doc_id < 120 AND length(text) > 0 AND length(text) % 5 != 0
    ),
    d AS (
        SELECT doc_id, nf, fi,
               list_sum([abs(ascii(substring(text, ((fi * 7 + i) % L) + 1, 1)) % 256
                             - ascii(substring(text, (((fi + 1) * 7 + i) % L) + 1, 1)) % 256)
                         FOR i IN generate_series(0, 35)]) AS delta
        FROM (SELECT doc_id, text, L, nf, unnest(range(0, nf - 1)) AS fi FROM f)
    )
    SELECT doc_id,
           CAST(max(nf) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN delta > 1050 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           CAST(coalesce(min(CASE WHEN delta > 1050 THEN fi + 1 END), -1) AS BIGINT)
               AS first_cut_frame,
           CAST(sum(delta * (fi + 1)) AS BIGINT) AS delta_checksum
    FROM d GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("pipeline", "multimodal", "video"),
    bench=True,
    doc="Shot-boundary detection through the real AVI/RIFF roundtrip: L1 "
    "pixel delta between consecutive decoded frames, cut when delta > "
    "1050; per-doc cut count / first cut / exact integer delta checksum; "
    "one mapInPandas pass, per-doc state only, no shuffle.",
)
def mm_video_scene_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_avi, encode_avi_rgb24

    frame_len = _VID_W * _VID_H * 3

    def cuts(batches):
        for pdf in batches:
            ids, nfs, ncs, firsts, sums_ = [], [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = [ord(c) % 256 for c in text]
                n = len(codes)
                n_frames = 1 + n % 5
                frames = [
                    bytes(codes[(fi * 7 + i) % n] for i in range(frame_len))
                    for fi in range(n_frames)
                ]
                payload = encode_avi_rgb24(frames, _VID_W, _VID_H)
                w, h, nf, decoded = decode_avi(payload)
                assert (w, h, nf) == (_VID_W, _VID_H, n_frames)
                n_cuts, first_cut, checksum = 0, -1, 0
                for fi in range(nf - 1):
                    delta = sum(
                        abs(a - b) for a, b in zip(decoded[fi], decoded[fi + 1])
                    )
                    checksum += delta * (fi + 1)
                    if delta > 1050:
                        n_cuts += 1
                        if first_cut < 0:
                            first_cut = fi + 1
                ids.append(doc_id)
                nfs.append(nf)
                ncs.append(n_cuts)
                firsts.append(first_cut)
                sums_.append(checksum)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_frames": nfs,
                    "n_cuts": ncs,
                    "first_cut_frame": firsts,
                    "delta_checksum": sums_,
                }
            )

    docs = catalog.table(spark, sf_dir, "documents").where(
        "doc_id < 120 AND length(text) > 0 AND length(text) % 5 != 0"
    )
    out_schema = (
        "doc_id bigint, n_frames bigint, n_cuts bigint, "
        "first_cut_frame bigint, delta_checksum bigint"
    )
    return (
        docs.select("doc_id", "text")
        .mapInPandas(cuts, out_schema)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# k-NN join (corpus-vs-corpus neighbor-graph construction)
# ---------------------------------------------------------------------------
# The probe-based sim_* operators answer "nearest corpus vectors to THIS
# query"; a curation pipeline equally needs the SELF-join form — a k-NN
# edge per corpus vector — as the substrate for SemDeDup clustering,
# embedding-graph community detection, and density-based filtering.  The
# scale shape is bucketed blocking, never the O(n^2) all-pairs join:
# every vector gets a SCALE-ADAPTIVE sign-LSH bucket (deterministic
# INTEGER hyperplanes: weight(j,d) = ((j*2654435761 + d*40503 + 12345)
# % 1009)*2 - 1009, an exact-integer rescaling of sim_lsh_hyperplane's
# float planes), the bucketed corpus is materialized ONCE
# (localCheckpoint; a staging table at cluster scale), and candidates
# come from ONE bucket-equi self-join — per-bucket pair volume, shuffle
# on the bucket key.  The bit count b is DERIVED FROM THE CORPUS SIZE:
# b = max(5, ceil(log2(ceil(n / 32)))) via pure integer arithmetic
# (length(bin(x-1)) = ceil(log2(x)) for x >= 2 — both engines agree
# bit-for-bit, no float log), so expected bucket occupancy is pinned at
# ~32 rows and per-bucket pair volume stays O(n·32) as the corpus grows
# — the same bounded-per-vector-work contract dedup_semantic's
# least(sqrt(k), 4096) coarse-cell cap provides, replacing the fixed
# 5-bit/32-bucket blocking whose pair volume was Theta(n^2/32) (the
# round-6 verdict's one scale flaw).  At the 500-vector fixtures b
# clamps to the historical 5 bits (bit-identical buckets); at sf0.1's
# 2000 vectors b=6 (64 buckets, all occupied).  The projections are
# per-row higher-order-function sums (no posexplode shuffle); params is
# a 1-row scalar broadcast.  Ranking is the exact-integer cosine sort
# key of sim_hybrid_rrf ((dot^2 * 1000) DIV |b|^2 signed by the dot;
# |a|^2 is constant inside a src partition so it drops out of the
# per-src ordering), ties broken by neighbor id, top-3 pruned by
# WindowGroupLimit.  Like every bucketed ANN here, recall-vs-bruteforce
# is a property of the LSH family; the ORACLE checks the mechanism
# bit-for-bit.

_KNN_CORPUS_SQL = """
    WITH e AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    params AS (
        -- r13: the b x 64 integer hyperplane matrix is hoisted into this
        -- 1-row relation (the old form re-evaluated the weight
        -- arithmetic inside the projection lambda for every
        -- (row, bit, dim) triple — same weights, 1.28x on the corpus
        -- stage); values are identical to the oracle's inline formula.
        SELECT b,
               transform(sequence(0, b - 1), j ->
                   transform(sequence(cast(0 AS bigint), cast(63 AS bigint)),
                             d -> ((cast(j AS bigint) * 2654435761 + d * 40503 + 12345) % 1009) * 2 - 1009)) AS w
        FROM (SELECT greatest(5, length(bin(greatest((count(*) + 31) DIV 32 - 1, 1)))) AS b FROM e)
    ),
    c AS (
        SELECT vec_id, v,
               aggregate(v, cast(0 AS bigint), (acc, x) -> acc + x * x) AS nrm2,
               aggregate(sequence(0, b - 1), cast(0 AS bigint), (acc, j) ->
                   acc + IF(aggregate(zip_with(v, element_at(w, cast(j AS int) + 1),
                                (x, wt) -> x * wt),
                            cast(0 AS bigint), (a2, y) -> a2 + y) >= 0,
                        shiftleft(cast(1 AS bigint), j), cast(0 AS bigint))) AS bucket
        FROM e CROSS JOIN params
    )
    SELECT vec_id, v, nrm2, bucket FROM c WHERE nrm2 > 0
    """

# The DuckDB-side rendering of the same adaptive-bit bucketed corpus
# (shared verbatim by the sim_knn_join and cluster_snn_knn oracles).
_KNN_CORPUS_ORACLE = """
    e AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    params AS (
        SELECT greatest(5, length(bin(greatest((count(*) + 31) // 32 - 1, 1)))) AS b FROM e
    ),
    c AS (
        SELECT vec_id, v,
               CAST(list_sum([x * x FOR x IN v]) AS BIGINT) AS nrm2,
               CAST(list_sum([CASE WHEN CAST(list_sum([v[d] * (((j * 2654435761 + (d-1) * 40503 + 12345) % 1009) * 2 - 1009) FOR d IN generate_series(1, 64)]) AS BIGINT) >= 0
                                   THEN (1::BIGINT << j) ELSE 0::BIGINT END
                              FOR j IN generate_series(0, b - 1)]) AS BIGINT) AS bucket
        FROM e CROSS JOIN params
    ),
    corpus AS (
        SELECT vec_id, v, nrm2, bucket FROM c WHERE nrm2 > 0
    )
    """

_KNN_JOIN_SQL = """
    WITH pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               aggregate(zip_with(a.v, b.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               b.nrm2
        FROM {E} a JOIN {E} b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    keyed AS (
        SELECT src, nbr,
               CASE WHEN dot >= 0 THEN (dot * dot * 1000) DIV nrm2
                    ELSE -((dot * dot * 1000) DIV nrm2) END AS sim_key
        FROM pairs
    ),
    ranked AS (
        SELECT src, nbr, sim_key,
               row_number() OVER (PARTITION BY src ORDER BY sim_key DESC, nbr) AS rk
        FROM keyed
    )
    SELECT src AS vec_id, rk, nbr AS neighbor_id, sim_key
    FROM ranked WHERE rk <= 3
    ORDER BY vec_id, rk
    """


@register(
    "sim_knn_join",
    oracle="WITH "
    + _KNN_CORPUS_ORACLE
    + """,
    pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               CAST(list_sum([a.v[i] * b.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               b.nrm2
        FROM corpus a JOIN corpus b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    keyed AS (
        SELECT src, nbr,
               CAST(CASE WHEN dot >= 0 THEN (dot * dot * 1000) // nrm2
                         ELSE -((dot * dot * 1000) // nrm2) END AS BIGINT) AS sim_key
        FROM pairs
    ),
    ranked AS (
        SELECT src, nbr, sim_key,
               row_number() OVER (PARTITION BY src ORDER BY sim_key DESC, nbr) AS rk
        FROM keyed
    )
    SELECT src AS vec_id, rk, nbr AS neighbor_id, sim_key
    FROM ranked WHERE rk <= 3
    ORDER BY vec_id, rk
    """,
    tags=("pipeline", "similarity", "knn"),
    bench=True,
    doc="Bucketed k-NN self-join (neighbor-graph construction): "
    "scale-adaptive integer sign-LSH blocking (b = max(5, "
    "ceil(log2(n/32))) bits, ~32 rows/bucket at any corpus size), "
    "bucketed corpus materialized once, ONE bucket-equi self-join "
    "(never all-pairs), exact-integer cosine sort key, top-3 per "
    "vector via WindowGroupLimit.",
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = catalog.sql(spark, sf_dir, _KNN_CORPUS_SQL).localCheckpoint(eager=True)
    corpus.createOrReplaceTempView("__knn_corpus")
    return spark.sql(_KNN_JOIN_SQL.format(E="__knn_corpus"))


# ---------------------------------------------------------------------------
# LM-score corpus bucketing (CCNet-style head / middle / tail split)
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020) buckets each snapshot into head/middle/tail
# terciles by language-model perplexity and trains preferentially on the
# head.  The LM score here is an exact-integer familiarity proxy — the
# token-occurrence-weighted mean corpus frequency of the document's words,
# in milli-units ((1000 * sum(tf * corpus_freq)) DIV sum(tf)) — monotone
# in the unigram-LM log-likelihood's dominant term but free of the float
# log/quantile drift that would break the driver's exact-hash gate (the
# true trigram-LM score lives in text_trigram_logprob).  The tercile
# thresholds are computed the way exact quantiles are computed at 100 TB:
# aggregate the corpus to a SCORE HISTOGRAM (distinct milli scores —
# bounded by value range, not corpus size), one cumulative window over
# that histogram, pick the two rank cutoffs, broadcast two scalars back
# over the corpus.  No global row sort, no single-partition window over
# data-sized input.  The posting table (doc_id, word, tf) is materialized
# once and feeds both the corpus-frequency aggregate and the per-doc
# score (Spark inlines CTEs — without the checkpoint the tokenizer would
# run twice).


_PPL_BUCKET_SQL = """
    WITH wf AS (SELECT w, cast(sum(c) AS bigint) AS freq FROM {P} GROUP BY w),
    score AS (
        SELECT p.doc_id,
               (1000 * sum(p.c * f.freq)) DIV sum(p.c) AS familiarity_milli
        FROM {P} p JOIN wf f ON p.w = f.w
        GROUP BY p.doc_id
    ),
    hist AS (SELECT familiarity_milli AS s, count(*) AS cnt FROM score GROUP BY familiarity_milli),
    cum AS (SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum FROM hist),
    tot AS (SELECT count(*) AS n FROM score),
    thresholds AS (
        SELECT (SELECT max(s) FROM cum CROSS JOIN tot WHERE cum >= (n + 2) DIV 3) AS t1,
               (SELECT max(s) FROM cum CROSS JOIN tot WHERE cum >= (2 * n + 2) DIV 3) AS t2
    )
    SELECT sc.doc_id, sc.familiarity_milli,
           CASE WHEN sc.familiarity_milli >= th.t1 THEN 'head'
                WHEN sc.familiarity_milli >= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM score sc CROSS JOIN thresholds th
    ORDER BY sc.doc_id
    """

_PPL_ORACLE = """
    WITH posting AS (
        SELECT doc_id, w, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    wf AS (SELECT w, cast(sum(c) AS BIGINT) AS freq FROM posting GROUP BY w),
    score AS (
        SELECT p.doc_id,
               CAST((1000 * sum(p.c * f.freq)) // sum(p.c) AS BIGINT) AS familiarity_milli
        FROM posting p JOIN wf f ON p.w = f.w
        GROUP BY p.doc_id
    ),
    hist AS (SELECT familiarity_milli AS s, count(*) AS cnt FROM score GROUP BY familiarity_milli),
    cum AS (SELECT s, sum(cnt) OVER (ORDER BY s DESC) AS cum FROM hist),
    tot AS (SELECT count(*) AS n FROM score),
    thresholds AS (
        SELECT (SELECT max(s) FROM cum CROSS JOIN tot WHERE cum >= (n + 2) // 3) AS t1,
               (SELECT max(s) FROM cum CROSS JOIN tot WHERE cum >= (2 * n + 2) // 3) AS t2
    )
    SELECT sc.doc_id, sc.familiarity_milli,
           CASE WHEN sc.familiarity_milli >= th.t1 THEN 'head'
                WHEN sc.familiarity_milli >= th.t2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM score sc CROSS JOIN thresholds th
    ORDER BY sc.doc_id
    """


@register(
    "text_perplexity_bucket",
    oracle=_PPL_ORACLE,
    tags=("pipeline", "text", "quality", "ccnet"),
    doc="CCNet-style head/middle/tail tercile bucketing by an "
    "exact-integer LM-familiarity score; thresholds via the "
    "score-histogram cumulative-window exact-quantile shape, two "
    "scalars broadcast back over the corpus.",
)
def text_perplexity_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the same staged posting relation under this entry's (w, c) names
    posting = _sql_with_views(
        spark,
        "SELECT doc_id, term AS w, tf AS c FROM __po",
        __po=_term_postings(spark, sf_dir),
    )
    return _sql_with_views(
        spark, _PPL_BUCKET_SQL.format(P="__ppl_posting"), __ppl_posting=posting
    )


# ---------------------------------------------------------------------------
# Link prediction (common-neighbors / Jaccard over the block web)
# ---------------------------------------------------------------------------
# The sixth graph primitive: score non-adjacent node pairs by
# neighborhood overlap (Liben-Nowell & Kleinberg 2003) — the "related
# documents / related entities" candidate generator.  The scale shape is
# wedge enumeration, exactly like graph_triangle_count: ONE edge-vs-edge
# equi-join on the shared wedge center (shuffle on the center id, never
# an all-pairs node join), aggregated to common-neighbor counts, with
# existing edges removed by NOT EXISTS (an anti-join).  Two scale levers
# the 100 TB posture needs are both exercised at test scale: (a) HUB
# SUPPRESSION — nodes of degree > 13 are excluded as wedge centers (the
# standard skew bound: a degree-d hub alone emits d^2 wedges; the cap
# trades recall on hub-mediated pairs for a hard per-center bound, and
# at 11..15-degree test graphs it genuinely prunes about half the
# centers, so both branches run); (b) the final global top-50 is ORDER
# BY + LIMIT — Spark's TakeOrderedAndProject (distributed per-partition
# top-k + driver merge), NOT a single-partition row_number window.
# jaccard_milli = (1000 * cn) DIV (deg_u + deg_w - cn) is exact-integer.
# Edges are the corpus-scaled symmetric block web, checkpointed once.

_LINKPRED_SQL = """
    WITH deg AS (SELECT src AS id, count(*) AS deg FROM {E} GROUP BY src),
    centers AS (SELECT id FROM deg WHERE deg <= 13),
    cand AS (
        SELECT a.src AS u, b.dst AS w, count(*) AS cn
        FROM {E} a
        JOIN centers c ON a.dst = c.id
        JOIN {E} b ON a.dst = b.src AND a.src < b.dst
        GROUP BY a.src, b.dst
    ),
    fresh AS (
        SELECT c.u, c.w, c.cn FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM {E} e WHERE e.src = c.u AND e.dst = c.w)
    ),
    scored AS (
        SELECT f.u, f.w, f.cn,
               (1000 * f.cn) DIV (du.deg + dw.deg - f.cn) AS jaccard_milli
        FROM fresh f
        JOIN deg du ON f.u = du.id
        JOIN deg dw ON f.w = dw.id
    )
    SELECT cast(u AS bigint) AS node_u, cast(w AS bigint) AS node_w,
           cast(cn AS bigint) AS common_neighbors,
           cast(jaccard_milli AS bigint) AS jaccard_milli
    FROM scored
    ORDER BY jaccard_milli DESC, common_neighbors DESC, node_u, node_w
    LIMIT 50
    """

_LINKPRED_ORACLE = (
    _LABELPROP_GRAPH_SQL.rstrip().removesuffix("SELECT src, dst FROM sym")
    + ",\n    "
    + _LINKPRED_SQL.format(E="sym").replace(" DIV ", " // ").lstrip().removeprefix("WITH ")
).replace("sym AS (", "sym AS MATERIALIZED (")
assert _LINKPRED_ORACLE.count("WITH ") == 1


@register(
    "graph_link_prediction",
    oracle=_LINKPRED_ORACLE,
    tags=("pipeline", "graph", "linkpred"),
    doc="Common-neighbor / Jaccard link prediction (Liben-Nowell & "
    "Kleinberg 2003): wedge equi-join on the shared center with "
    "degree<=13 hub suppression, NOT-EXISTS edge removal, exact-integer "
    "jaccard_milli, global top-50 via TakeOrderedAndProject; edges "
    "checkpointed once.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql_with_views(
        spark,
        _LINKPRED_SQL.format(E="__lprd_sym"),
        __lprd_sym=_block_web_edges(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# NN-Descent refinement round (k-NN graph improvement)
# ---------------------------------------------------------------------------
# The standard second stage after blocked k-NN construction: NN-Descent
# (Dong et al. 2011) exploits "a neighbor of my neighbor is likely my
# neighbor" — candidates for each vector are the current graph's 1-hop
# edges, their REVERSES, and the 2-hop expansion, re-ranked exactly.
# For the expansion to ever ESCAPE the initial blocking, the initial
# graph must not be an equivalence partition (inside one LSH bucket a
# neighbor's neighbors are the same bucket again — a single-bucket init
# makes the round a provable no-op).  So the init here is the union of
# TWO independent sign-LSH blockings (hyperplanes j=0..b-1 and
# j=b..2b-1): u's neighbor v shares u's A-bucket but brings v's OWN
# B-bucket neighbors, which u's blocking never saw — exactly the
# cross-bucket recall the round recovers (test-asserted to actually
# change edges at every scale).  Like _KNN_CORPUS_SQL, the per-blocking
# bit count is SCALE-ADAPTIVE — b = max(4, ceil(log2(ceil(n / 32))))
# in pure integer arithmetic — so each blocking's expected occupancy is
# pinned (~32 rows/bucket) instead of the old fixed 4-bit/16-bucket
# split whose pair volume grew Theta(n^2/16); at the 500-vector
# fixtures b clamps to the historical 4 bits (bit-identical buckets).
# Scale shape: the k-NN edge table is ~2k·n rows, materialized once
# alongside the bucketed vector table; the 2-hop expansion is ONE
# self-join of that edge table on the shared middle vertex (<= (2k)^2
# candidates per vector), then ONE re-rank join back to the vector
# table and a WindowGroupLimit top-3.  No all-pairs anywhere; every
# join is an equi-join on vector ids or bucket keys.

_NND_CORPUS_SQL = """
    WITH e AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    params AS (
        SELECT greatest(4, length(bin(greatest((count(*) + 31) DIV 32 - 1, 1)))) AS b FROM e
    ),
    c AS (
        SELECT vec_id, v,
               aggregate(v, cast(0 AS bigint), (acc, x) -> acc + x * x) AS nrm2,
               aggregate(sequence(0, b - 1), cast(0 AS bigint), (acc, j) ->
                   acc + IF(aggregate(zip_with(v, sequence(cast(0 AS bigint), cast(63 AS bigint)),
                                (x, d) -> x * (((cast(j AS bigint) * 2654435761 + d * 40503 + 12345) % 1009) * 2 - 1009)),
                            cast(0 AS bigint), (a2, y) -> a2 + y) >= 0,
                        shiftleft(cast(1 AS bigint), j), cast(0 AS bigint))) AS bucket_a,
               aggregate(sequence(b, 2 * b - 1), cast(0 AS bigint), (acc, j) ->
                   acc + IF(aggregate(zip_with(v, sequence(cast(0 AS bigint), cast(63 AS bigint)),
                                (x, d) -> x * (((cast(j AS bigint) * 2654435761 + d * 40503 + 12345) % 1009) * 2 - 1009)),
                            cast(0 AS bigint), (a2, y) -> a2 + y) >= 0,
                        shiftleft(cast(1 AS bigint), j - b), cast(0 AS bigint))) AS bucket_b
        FROM e CROSS JOIN params
    )
    SELECT vec_id, v, nrm2, bucket_a, bucket_b FROM c WHERE nrm2 > 0
    """

_NND_EDGES_SQL = """
    WITH bands AS (
        SELECT vec_id, b, if(b = 0, bucket_a, bucket_b) AS bv
        FROM {E} LATERAL VIEW explode(sequence(0, 1)) t AS b
    ),
    cpairs AS (
        SELECT DISTINCT a.vec_id AS src, b.vec_id AS nbr
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.vec_id <> b.vec_id
    ),
    scored AS (
        SELECT c.src, c.nbr,
               aggregate(zip_with(va.v, vb.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               vb.nrm2
        FROM cpairs c
        JOIN {E} va ON c.src = va.vec_id
        JOIN {E} vb ON c.nbr = vb.vec_id
    ),
    ranked AS (
        SELECT src, nbr,
               row_number() OVER (PARTITION BY src ORDER BY
                   (CASE WHEN dot >= 0 THEN (dot * dot * 1000) DIV nrm2
                         ELSE -((dot * dot * 1000) DIV nrm2) END) DESC, nbr) AS rk
        FROM scored
    )
    SELECT src, nbr FROM ranked WHERE rk <= 3
    """

# The three candidate branches reorder the SAME edge attributes (src,nbr
# / nbr,src), which trips Spark's Union constraint rewriting
# (rewriteConstraints AttributeMap lookup) when joins sit above the
# union — so the candidate set is built as its own step (and
# materialized with the other staging tables) instead of a CTE.
_NND_CAND_SQL = """
    SELECT DISTINCT s AS src, n AS nbr FROM (
        SELECT src AS s, nbr AS n FROM {K}
        UNION ALL
        SELECT nbr AS s, src AS n FROM {K}
        UNION ALL
        SELECT e1.src AS s, e2.nbr AS n
        FROM {K} e1 JOIN {K} e2 ON e1.nbr = e2.src AND e1.src <> e2.nbr
    )
    """

_NND_ROUND_SQL = """
    WITH rescored AS (
        SELECT c.src, c.nbr,
               aggregate(zip_with(va.v, vb.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               vb.nrm2
        FROM {C} c
        JOIN {E} va ON c.src = va.vec_id
        JOIN {E} vb ON c.nbr = vb.vec_id
    ),
    keyed AS (
        SELECT src, nbr,
               CASE WHEN dot >= 0 THEN (dot * dot * 1000) DIV nrm2
                    ELSE -((dot * dot * 1000) DIV nrm2) END AS sim_key
        FROM rescored
    ),
    ranked AS (
        SELECT src, nbr, sim_key,
               row_number() OVER (PARTITION BY src ORDER BY sim_key DESC, nbr) AS rk
        FROM keyed
    )
    SELECT src AS vec_id, rk, nbr AS neighbor_id, sim_key
    FROM ranked WHERE rk <= 3
    ORDER BY vec_id, rk
    """

_NND_ORACLE = """
    WITH e AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    params AS (
        SELECT greatest(4, length(bin(greatest((count(*) + 31) // 32 - 1, 1)))) AS b FROM e
    ),
    c AS (
        SELECT vec_id, v,
               CAST(list_sum([x * x FOR x IN v]) AS BIGINT) AS nrm2,
               CAST(list_sum([CASE WHEN CAST(list_sum([v[d] * (((j * 2654435761 + (d-1) * 40503 + 12345) % 1009) * 2 - 1009) FOR d IN generate_series(1, 64)]) AS BIGINT) >= 0
                                   THEN (1::BIGINT << j) ELSE 0::BIGINT END
                              FOR j IN generate_series(0, b - 1)]) AS BIGINT) AS bucket_a,
               CAST(list_sum([CASE WHEN CAST(list_sum([v[d] * (((j * 2654435761 + (d-1) * 40503 + 12345) % 1009) * 2 - 1009) FOR d IN generate_series(1, 64)]) AS BIGINT) >= 0
                                   THEN (1::BIGINT << (j - b)) ELSE 0::BIGINT END
                              FOR j IN generate_series(b, 2 * b - 1)]) AS BIGINT) AS bucket_b
        FROM e CROSS JOIN params
    ),
    corpus AS (
        SELECT vec_id, v, nrm2, bucket_a, bucket_b FROM c WHERE nrm2 > 0
    ),
    bands AS (
        SELECT vec_id, b, CASE WHEN b = 0 THEN bucket_a ELSE bucket_b END AS bv
        FROM corpus, unnest([0, 1]) t(b)
    ),
    cpairs AS (
        SELECT DISTINCT a.vec_id AS src, b.vec_id AS nbr
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.vec_id <> b.vec_id
    ),
    scored0 AS (
        SELECT c.src, c.nbr,
               CAST(list_sum([va.v[i] * vb.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               vb.nrm2
        FROM cpairs c
        JOIN corpus va ON c.src = va.vec_id
        JOIN corpus vb ON c.nbr = vb.vec_id
    ),
    knn0 AS (
        SELECT src, nbr,
               row_number() OVER (PARTITION BY src ORDER BY
                   (CASE WHEN dot >= 0 THEN (dot * dot * 1000) // nrm2
                         ELSE -((dot * dot * 1000) // nrm2) END) DESC, nbr) AS rk
        FROM scored0
    ),
    edges AS (SELECT src, nbr FROM knn0 WHERE rk <= 3),
    cand AS (
        SELECT src, nbr FROM edges
        UNION
        SELECT nbr AS src, src AS nbr FROM edges
        UNION
        SELECT e1.src, e2.nbr
        FROM edges e1 JOIN edges e2 ON e1.nbr = e2.src AND e1.src <> e2.nbr
    ),
    rescored AS (
        SELECT c.src, c.nbr,
               CAST(list_sum([va.v[i] * vb.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               vb.nrm2
        FROM cand c
        JOIN corpus va ON c.src = va.vec_id
        JOIN corpus vb ON c.nbr = vb.vec_id
    ),
    keyed AS (
        SELECT src, nbr,
               CAST(CASE WHEN dot >= 0 THEN (dot * dot * 1000) // nrm2
                         ELSE -((dot * dot * 1000) // nrm2) END AS BIGINT) AS sim_key
        FROM rescored
    ),
    ranked AS (
        SELECT src, nbr, sim_key,
               row_number() OVER (PARTITION BY src ORDER BY sim_key DESC, nbr) AS rk
        FROM keyed
    )
    SELECT src AS vec_id, rk, nbr AS neighbor_id, sim_key
    FROM ranked WHERE rk <= 3
    ORDER BY vec_id, rk
    """


@register(
    "sim_nn_descent_round",
    oracle=_NND_ORACLE,
    tags=("pipeline", "similarity", "knn", "nn-descent"),
    doc="One NN-Descent refinement round (Dong et al. 2011) over a k-NN "
    "graph initialized from TWO independent scale-adaptive sign-LSH "
    "blockings (b = max(4, ceil(log2(n/32))) bits each; a single "
    "blocking makes the round a provable no-op): candidates "
    "= 1-hop edges + reverses + 2-hop expansion (edge-table self-join), "
    "exact-integer re-rank, top-3 via WindowGroupLimit; vector and edge "
    "tables materialized once.",
)
def sim_nn_descent_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = catalog.sql(spark, sf_dir, _NND_CORPUS_SQL).localCheckpoint(eager=True)
    corpus.createOrReplaceTempView("__nnd_corpus")
    edges = spark.sql(_NND_EDGES_SQL.format(E="__nnd_corpus")).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("__nnd_edges")
    cand = spark.sql(_NND_CAND_SQL.format(K="__nnd_edges")).localCheckpoint(eager=True)
    cand.createOrReplaceTempView("__nnd_cand")
    return spark.sql(_NND_ROUND_SQL.format(E="__nnd_corpus", C="__nnd_cand"))


# ---------------------------------------------------------------------------
# Shared-nearest-neighbor clustering (Jarvis-Patrick over the k-NN graph)
# ---------------------------------------------------------------------------
# The clustering counterpart of sim_knn_join: Jarvis-Patrick (1973; the
# SNN density framing is Ertoz/Steinbach/Kumar 2003) links two vectors
# iff they are MUTUAL k-nearest neighbors AND their neighbor lists share
# >= t entries, then clusters = connected components of those strong
# links — robust where plain distance thresholds fail (varying local
# density), and the natural consumer of an already-materialized k-NN
# edge table.  Scale shape: everything derives from the k·n edge table
# (k=5 here), never the corpus: mutuality is ONE self-join on the
# reversed pair, shared-neighbor counts are ONE self-join on the shared
# neighbor id grouped by pair (the standard SNN sparsification; at 100
# TB a reverse-degree cap on the join key bounds hub fan-out exactly as
# in graph_link_prediction), and components run the same 6-round
# min-label + pointer-jumping unroll as cluster_dbscan_grid over the
# strong-edge table (which is symmetric by construction and carries
# self-loops so the min-label walk is reflexive).  Every stage is
# materialized once; every join is an equi-join.

_SNN_EDGES_SQL = """
    WITH pairs AS (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               aggregate(zip_with(a.v, b.v, (x, y) -> x * y),
                         cast(0 AS bigint), (acc, x) -> acc + x) AS dot,
               b.nrm2
        FROM {E} a JOIN {E} b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT src, nbr,
               row_number() OVER (PARTITION BY src ORDER BY
                   (CASE WHEN dot >= 0 THEN (dot * dot * 1000) DIV nrm2
                         ELSE -((dot * dot * 1000) DIV nrm2) END) DESC, nbr) AS rk
        FROM pairs
    )
    SELECT src, nbr FROM ranked WHERE rk <= 5
    """

_SNN_STRONG_SQL = """
    WITH mutual AS (
        SELECT e1.src AS u, e1.nbr AS w
        FROM {K} e1 JOIN {K} e2 ON e1.src = e2.nbr AND e1.nbr = e2.src
    ),
    shared AS (
        SELECT m.u, m.w, count(*) AS sh
        FROM mutual m
        JOIN {K} a ON a.src = m.u
        JOIN {K} b ON b.src = m.w AND b.nbr = a.nbr
        GROUP BY m.u, m.w
    ),
    strong AS (SELECT u, w FROM shared WHERE sh >= 2)
    SELECT u, w FROM strong
    UNION ALL
    SELECT DISTINCT u, u FROM strong
    """

_SNN_MAIN_SQL = (
    """
    WITH l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM {S}),
"""
    + "".join(
        f"""    p{i} AS (SELECT e.u AS id, min(l.lbl) AS lbl
           FROM {{S}} e JOIN l{i - 1} l ON l.id = e.w GROUP BY e.u),
    l{i} AS (SELECT p.id, l2.lbl FROM p{i} p JOIN p{i} l2 ON l2.id = p.lbl),
"""
        for i in range(1, 7)
    )
    + """    sized AS (
        SELECT lbl, count(*) AS sz FROM l6 GROUP BY lbl
    )
    SELECT c.vec_id,
           CAST(coalesce(l.lbl, c.vec_id) AS BIGINT) AS cluster,
           CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size
    FROM {E} c
    LEFT JOIN l6 l ON c.vec_id = l.id
    LEFT JOIN sized s ON l.lbl = s.lbl
    ORDER BY vec_id
    """
)

_SNN_ORACLE = (
    "WITH "
    + _KNN_CORPUS_ORACLE
    + """,
    kpairs AS (
        SELECT a.vec_id AS src, b.vec_id AS nbr,
               CAST(list_sum([a.v[i] * b.v[i] FOR i IN generate_series(1, 64)]) AS BIGINT) AS dot,
               b.nrm2
        FROM corpus a JOIN corpus b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    kranked AS (
        SELECT src, nbr,
               row_number() OVER (PARTITION BY src ORDER BY
                   (CASE WHEN dot >= 0 THEN (dot * dot * 1000) // nrm2
                         ELSE -((dot * dot * 1000) // nrm2) END) DESC, nbr) AS rk
        FROM kpairs
    ),
    edges AS (SELECT src, nbr FROM kranked WHERE rk <= 5),
    mutual AS (
        SELECT e1.src AS u, e1.nbr AS w
        FROM edges e1 JOIN edges e2 ON e1.src = e2.nbr AND e1.nbr = e2.src
    ),
    shared AS (
        SELECT m.u, m.w, count(*) AS sh
        FROM mutual m
        JOIN edges a ON a.src = m.u
        JOIN edges b ON b.src = m.w AND b.nbr = a.nbr
        GROUP BY m.u, m.w
    ),
    strong0 AS (SELECT u, w FROM shared WHERE sh >= 2),
    strong AS MATERIALIZED (
        SELECT u, w FROM strong0
        UNION ALL
        SELECT DISTINCT u, u FROM strong0
    ),
    l0 AS MATERIALIZED (SELECT DISTINCT u AS id, u AS lbl FROM strong),
"""
    + "".join(
        f"""    p{i} AS MATERIALIZED (SELECT e.u AS id, min(l.lbl) AS lbl
           FROM strong e JOIN l{i - 1} l ON l.id = e.w GROUP BY e.u),
    l{i} AS MATERIALIZED (SELECT p.id, l2.lbl FROM p{i} p JOIN p{i} l2 ON l2.id = p.lbl),
"""
        for i in range(1, 7)
    )
    + """    sized AS (
        SELECT lbl, count(*) AS sz FROM l6 GROUP BY lbl
    )
    SELECT c.vec_id,
           CAST(coalesce(l.lbl, c.vec_id) AS BIGINT) AS cluster,
           CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size
    FROM corpus c
    LEFT JOIN l6 l ON c.vec_id = l.id
    LEFT JOIN sized s ON l.lbl = s.lbl
    ORDER BY vec_id
    """
)
assert _SNN_ORACLE.count("WITH ") == 1


@register(
    "cluster_snn_knn",
    oracle=_SNN_ORACLE,
    tags=("pipeline", "cluster", "snn", "knn"),
    doc="Jarvis-Patrick shared-nearest-neighbor clustering over the "
    "adaptively-bucketed k-NN graph (b = max(5, ceil(log2(n/32))) LSH "
    "bits, k=5, shared>=2, mutual-kNN links): mutuality "
    "and shared counts are edge-table self-joins (never the corpus), "
    "components via the 6-round min-label + pointer-jumping unroll; "
    "every stage materialized once.",
)
def cluster_snn_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 scan-audit fix: _SNN_MAIN_SQL's unrolled min-label +
    # pointer-jumping rounds re-expanded ~3x per level (974 KB plan, 381
    # scans of the checkpointed strong-edge relation); the rounds are now
    # staged per level via _minlabel_jump_rounds (identical math).
    corpus = catalog.sql(spark, sf_dir, _KNN_CORPUS_SQL).localCheckpoint(eager=True)
    corpus.createOrReplaceTempView("__snn_corpus")
    edges = spark.sql(_SNN_EDGES_SQL.format(E="__snn_corpus")).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("__snn_edges")
    strong = spark.sql(_SNN_STRONG_SQL.format(K="__snn_edges")).localCheckpoint(eager=True)
    l0 = _sql_with_views(
        spark, "SELECT DISTINCT u AS id, u AS lbl FROM __snn_strong", __snn_strong=strong
    ).localCheckpoint(eager=True)
    l6 = _minlabel_jump_rounds(spark, strong, "u", "w", l0, rounds=6)
    return _sql_with_views(
        spark,
        """
        WITH sized AS (SELECT lbl, count(*) AS sz FROM __snn_l6 GROUP BY lbl)
        SELECT c.vec_id,
               CAST(coalesce(l.lbl, c.vec_id) AS BIGINT) AS cluster,
               CAST(coalesce(s.sz, 1) AS BIGINT) AS cluster_size
        FROM __snn_c c
        LEFT JOIN __snn_l6 l ON c.vec_id = l.id
        LEFT JOIN sized s ON l.lbl = s.lbl
        ORDER BY vec_id
        """,
        __snn_c=corpus,
        __snn_l6=l6,
    )


# ---------------------------------------------------------------------------
# DSIR importance weights (data selection via importance resampling)
# ---------------------------------------------------------------------------
# DSIR (Xie et al. 2023) selects pretraining data by importance weight
# p_target(x)/p_raw(x) under hashed n-gram bag-of-words models — the
# standard "make the crawl look like the curated corpus" selection
# stage.  Features are hashed word unigrams AND bigrams in a FIXED
# 2x256-bucket space, so the model is corpus-size-independent: the
# per-feature log-ratio table is 512 rows, broadcast; scoring is one
# map-side-combining sum per document.  The word-level polynomial hash
# runs only over the DISTINCT vocabulary (the dedup_simhash idiom);
# bigram hashes are assembled arithmetically from the two word hashes
# via one lead() window per document.  Laplace-smoothed log-ratios
# lnλ_f = ln(((tgt_f+1)·(R+512)) / ((raw_f+1)·(T+512))) are quantized
# to integer micro-units with the BM25-proven floor(x·1e6 + 0.5)
# pattern (the argument is a ratio of exact integers, so both engines
# evaluate the same double), making the per-document score an exact
# bigint sum.  Target distribution: the lang='en' slice (the "curated"
# reference); selected = importance weight > 1 (score > 0).  The
# feature posting table (doc_id, f, c) is materialized once and feeds
# the target counts, the raw counts, and the scoring pass.

_DSIR_POSTING_SQL = """
    WITH tok AS (SELECT doc_id, split(text, ' ') AS t FROM documents),
    trows AS (SELECT doc_id, posexplode(t) AS (pos, tk) FROM tok),
    vocab AS (SELECT DISTINCT tk FROM trows),
    vhash AS (
        SELECT tk, aggregate(split(tk, ''), 131L,
                             (acc, c) -> (acc * 31 + ascii(c)) % 1000000007) AS h
        FROM vocab
    ),
    hrows AS (SELECT r.doc_id, r.pos, v.h FROM trows r JOIN vhash v ON r.tk = v.tk),
    -- r14: unigram and bigram features come off ONE pass over hrows (the
    -- old UNION ALL's two branches each re-inlined the tokenize-explode +
    -- vocab-hash join — Spark CTEs are not materialized); the lead()
    -- window row emits its unigram feature and, when a successor exists,
    -- the bigram feature — the identical feature multiset.
    led AS (SELECT doc_id, h, lead(h, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS h2
            FROM hrows),
    feats AS (
        SELECT doc_id,
               explode(CASE WHEN h2 IS NULL THEN array(h % 256)
                            ELSE array(h % 256,
                                       ((h * 131 + h2) % 1000000007) % 256 + 256)
                       END) AS f
        FROM led
    )
    SELECT doc_id, f, count(*) AS c FROM feats GROUP BY doc_id, f
    """

_DSIR_MAIN_SQL = """
    WITH tgt AS (
        SELECT p.f, cast(sum(p.c) AS bigint) AS tc
        FROM {P} p JOIN documents d ON p.doc_id = d.doc_id
        WHERE d.lang = 'en'
        GROUP BY p.f
    ),
    raw AS (SELECT f, cast(sum(c) AS bigint) AS rc FROM {P} GROUP BY f),
    j AS (
        SELECT r.f, r.rc, coalesce(g.tc, cast(0 AS bigint)) AS tc
        FROM raw r LEFT JOIN tgt g ON r.f = g.f
    ),
    lam AS (
        SELECT f,
               cast(floor(ln((cast(tc + 1 AS double) * (sum(rc) OVER () + 512))
                             / (cast(rc + 1 AS double) * (sum(tc) OVER () + 512))) * 1000000 + 0.5)
                    AS bigint) AS lmicro
        FROM j
    ),
    score AS (
        SELECT p.doc_id, cast(sum(p.c * l.lmicro) AS bigint) AS dsir_micro
        FROM {P} p JOIN lam l ON p.f = l.f
        GROUP BY p.doc_id
    )
    SELECT doc_id, dsir_micro,
           CASE WHEN dsir_micro > 0 THEN 1L ELSE 0L END AS selected
    FROM score
    ORDER BY doc_id
    """

_DSIR_ORACLE = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    th AS (
        SELECT doc_id,
               [list_reduce(list_prepend(131::BIGINT,
                                         [ascii(c)::BIGINT for c in string_split(x, '')]),
                            (a, b) -> (a * 31 + b) % 1000000007) for x in t] AS hs
        FROM tok
    ),
    feats AS (
        SELECT doc_id, unnest([h % 256 FOR h IN hs]) AS f FROM th
        UNION ALL
        SELECT doc_id,
               unnest([((hs[i] * 131 + hs[i+1]) % 1000000007) % 256 + 256
                       FOR i IN range(1, len(hs))]) AS f
        FROM th
    ),
    posting AS MATERIALIZED (
        SELECT doc_id, f, count(*) AS c FROM feats GROUP BY doc_id, f
    ),
    tgt AS (
        SELECT p.f, cast(sum(p.c) AS BIGINT) AS tc
        FROM posting p JOIN documents d ON p.doc_id = d.doc_id
        WHERE d.lang = 'en'
        GROUP BY p.f
    ),
    raw AS (SELECT f, cast(sum(c) AS BIGINT) AS rc FROM posting GROUP BY f),
    j AS (
        SELECT r.f, r.rc, coalesce(g.tc, 0::BIGINT) AS tc
        FROM raw r LEFT JOIN tgt g ON r.f = g.f
    ),
    lam AS (
        SELECT f,
               cast(floor(ln((cast(tc + 1 AS DOUBLE) * (sum(rc) OVER () + 512))
                             / (cast(rc + 1 AS DOUBLE) * (sum(tc) OVER () + 512))) * 1000000 + 0.5)
                    AS BIGINT) AS lmicro
        FROM j
    ),
    score AS (
        SELECT p.doc_id, cast(sum(p.c * l.lmicro) AS BIGINT) AS dsir_micro
        FROM posting p JOIN lam l ON p.f = l.f
        GROUP BY p.doc_id
    )
    SELECT doc_id, dsir_micro,
           CAST(CASE WHEN dsir_micro > 0 THEN 1 ELSE 0 END AS BIGINT) AS selected
    FROM score
    ORDER BY doc_id
    """


@register(
    "text_dsir_weights",
    oracle=_DSIR_ORACLE,
    tags=("pipeline", "text", "selection", "dsir"),
    bench=True,
    doc="DSIR importance weights (Xie et al. 2023): hashed unigram+bigram "
    "features in a fixed 512-bucket space, Laplace-smoothed target/raw "
    "log-ratios micro-quantized (integer-ratio ln, BM25's floor pattern; "
    "totals via windows over the 512-row feature table — ONE parquet "
    "scan total), weight table broadcast, one map-side-combining doc sum; "
    "posting table materialized once.",
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    posting = catalog.sql(spark, sf_dir, _DSIR_POSTING_SQL).localCheckpoint(eager=True)
    posting.createOrReplaceTempView("__dsir_posting")
    return catalog.sql(spark, sf_dir, _DSIR_MAIN_SQL.format(P="__dsir_posting"))


# ---------------------------------------------------------------------------
# Per-scene keyframe sampling (the consumer of scene-cut detection)
# ---------------------------------------------------------------------------
# mm_video_scene_cut's purpose in a curation pipeline is to drive
# SAMPLING — one representative frame per shot instead of per fixed
# stride (stride sampling oversamples static scenes and misses short
# ones).  This operator completes that loop: the same frame deltas
# segment each clip into scenes (a cut at delta > 1050 starts a new
# scene at frame fi+1), and each scene emits its MIDDLE frame
# (start + (len-1)/2) with an exact integer pixel checksum computed
# from the REAL decoded AVI frame.  Scale shape identical to scene-cut:
# ONE Arrow mapInPandas pass riding the corpus scan, per-doc state only
# (one frame pair at a time), scene rows emitted executor-side, no
# shuffle before the presentation sort.  The oracle reproduces the
# segmentation declaratively: cut flags -> running-sum scene ids ->
# per-scene min/count -> keyframe arithmetic on the synthesis bytes.


@register(
    "mm_video_keyframe_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id, text, length(text) AS L, 1 + length(text) % 5 AS nf
        FROM documents
        WHERE doc_id < 120 AND length(text) > 0 AND length(text) % 5 != 0
    ),
    d AS (
        SELECT doc_id, text, L, nf, fi,
               list_sum([abs(ascii(substring(text, ((fi * 7 + i) % L) + 1, 1)) % 256
                             - ascii(substring(text, (((fi + 1) * 7 + i) % L) + 1, 1)) % 256)
                         FOR i IN generate_series(0, 35)]) AS delta
        FROM (SELECT doc_id, text, L, nf, unnest(range(0, nf - 1)) AS fi FROM f)
    ),
    frames AS (
        SELECT doc_id, text, L, nf, 0 AS frame, 0 AS cut FROM f
        UNION ALL
        SELECT doc_id, text, L, nf, fi + 1 AS frame,
               CASE WHEN delta > 1050 THEN 1 ELSE 0 END AS cut
        FROM d
    ),
    numbered AS (
        SELECT doc_id, text, L, frame,
               sum(cut) OVER (PARTITION BY doc_id ORDER BY frame) AS scene
        FROM frames
    ),
    scenes AS (
        SELECT doc_id, any_value(text) AS text, any_value(L) AS L,
               scene, min(frame) AS start_frame, count(*) AS n_frames
        FROM numbered GROUP BY doc_id, scene
    )
    SELECT doc_id,
           CAST(scene AS BIGINT) AS scene_idx,
           CAST(start_frame AS BIGINT) AS start_frame,
           CAST(n_frames AS BIGINT) AS scene_frames,
           CAST(start_frame + (n_frames - 1) // 2 AS BIGINT) AS keyframe,
           CAST(list_sum([ascii(substring(text,
                    (((start_frame + (n_frames - 1) // 2) * 7 + i) % L) + 1, 1)) % 256
                FOR i IN generate_series(0, 35)]) AS BIGINT) AS keyframe_checksum
    FROM scenes
    ORDER BY doc_id, scene_idx
    """,
    tags=("pipeline", "multimodal", "video", "sampling"),
    doc="Per-scene keyframe sampling over the real AVI roundtrip: scenes "
    "from the scene-cut deltas (cut at delta > 1050), keyframe = each "
    "scene's middle frame with an exact decoded-pixel checksum; one "
    "mapInPandas pass, per-doc state only, no shuffle.",
)
def mm_video_keyframe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_avi, encode_avi_rgb24

    frame_len = _VID_W * _VID_H * 3

    def keyframes(batches):
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "scene_idx", "start_frame",
                                   "scene_frames", "keyframe", "keyframe_checksum")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                codes = [ord(c) % 256 for c in text]
                n = len(codes)
                n_frames = 1 + n % 5
                frames = [
                    bytes(codes[(fi * 7 + i) % n] for i in range(frame_len))
                    for fi in range(n_frames)
                ]
                payload = encode_avi_rgb24(frames, _VID_W, _VID_H)
                w, h, nf, decoded = decode_avi(payload)
                assert (w, h, nf) == (_VID_W, _VID_H, n_frames)
                starts = [0]
                for fi in range(nf - 1):
                    delta = sum(abs(a - b) for a, b in zip(decoded[fi], decoded[fi + 1]))
                    if delta > 1050:
                        starts.append(fi + 1)
                starts.append(nf)  # sentinel end
                for s_idx in range(len(starts) - 1):
                    begin, end = starts[s_idx], starts[s_idx + 1]
                    kf = begin + (end - begin - 1) // 2
                    out["doc_id"].append(doc_id)
                    out["scene_idx"].append(s_idx)
                    out["start_frame"].append(begin)
                    out["scene_frames"].append(end - begin)
                    out["keyframe"].append(kf)
                    out["keyframe_checksum"].append(int(sum(decoded[kf])))
            yield pd.DataFrame(out)

    docs = catalog.table(spark, sf_dir, "documents").where(
        "doc_id < 120 AND length(text) > 0 AND length(text) % 5 != 0"
    )
    out_schema = (
        "doc_id bigint, scene_idx bigint, start_frame bigint, "
        "scene_frames bigint, keyframe bigint, keyframe_checksum bigint"
    )
    return (
        docs.select("doc_id", "text")
        .mapInPandas(keyframes, out_schema)
        .orderBy("doc_id", "scene_idx")
    )


# ---------------------------------------------------------------------------
# Principal-component projection (distributed uncentered PCA, power method)
# ---------------------------------------------------------------------------
# Embedding diagnostics at corpus scale: anisotropy analysis (embedding
# spaces famously concentrate in a narrow cone), whitening pre-passes for
# SemDeDup-style clustering, and 1-D corpus ordering all need "project
# every vector onto the dominant principal direction" — exactly the kind
# of op a naive port makes driver-bound.  The scale shape here never
# materializes per-vector state beyond one keyed aggregate:
#   1. the 64x64 SECOND-MOMENT matrix is ONE map-side-combining
#      aggregation to 4096 (i,j) cells — the only corpus-sized pass;
#      partial aggregation means each task emits at most 4096 cells no
#      matter how many rows it scans (corpus-size-independent state);
#   2. the power method runs 5 unrolled matrix-vector iterations ON THE
#      4096-CELL TABLE (data volume independent of n), renormalizing to
#      milli-units each step with exact integer arithmetic — both
#      engines truncate integer division toward zero, so the iterate is
#      bit-identical (the trap: that only holds for INTEGER operands;
#      DuckDB floors float //);
#   3. the projection joins the 64-row iterate back onto the exploded
#      vectors and sums per vec_id — one keyed shuffle with partial agg.
# Uncentered on purpose: centering makes the moment matrix rational
# (mean is sum/n) and breaks exact-integer parity; for the anisotropy /
# ordering use cases the dominant direction of E[xx^T] is the object of
# interest.  Like the LSH family, CONVERGENCE is a property of the
# spectrum (5 iterations need an eigengap; the isotropic synthetic
# fixture has almost none) — the oracle pins the MECHANISM bit-for-bit,
# and tests/test_pipeline.py proves >0.999 agreement with numpy's top
# eigenvector on an anisotropic fixture.

_PCA_ITER = 5

_PCA_SQL = (
    """
    WITH e AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    rows_ AS (SELECT vec_id, posexplode(v) AS (d, x) FROM e),
    cov AS (
        SELECT a.d AS i, b.d AS j, cast(sum(a.x * b.x) AS bigint) AS c
        FROM rows_ a JOIN rows_ b ON a.vec_id = b.vec_id
        GROUP BY a.d, b.d
    ),
    v0 AS (SELECT explode(sequence(0, 63)) AS j, cast(1000 AS bigint) AS val),
"""
    + "".join(
        f"""    m{k} AS (SELECT cov.i AS j, sum(cov.c * v{k - 1}.val) AS raw
           FROM cov JOIN v{k - 1} ON cov.j = v{k - 1}.j GROUP BY cov.i),
    v{k} AS (SELECT j, (raw * 1000) DIV (SELECT max(abs(raw)) FROM m{k}) AS val FROM m{k}),
"""
        for k in range(1, _PCA_ITER + 1)
    )
    + f"""    proj AS (
        SELECT r.vec_id, cast(sum(r.x * vv.val) AS bigint) AS pc_milli
        FROM rows_ r JOIN v{_PCA_ITER} vv ON r.d = vv.j
        GROUP BY r.vec_id
    )
    SELECT vec_id, pc_milli FROM proj ORDER BY vec_id
    """
)

_PCA_ORACLE = (
    """
    WITH e AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    rows_ AS (
        SELECT vec_id, d - 1 AS d, v[d] AS x
        FROM e, unnest(generate_series(1, 64)) AS t(d)
    ),
    cov AS MATERIALIZED (
        SELECT a.d AS i, b.d AS j, CAST(sum(a.x * b.x) AS BIGINT) AS c
        FROM rows_ a JOIN rows_ b ON a.vec_id = b.vec_id
        GROUP BY a.d, b.d
    ),
    v0 AS (SELECT unnest(generate_series(0, 63)) AS j, 1000::BIGINT AS val),
"""
    + "".join(
        f"""    m{k} AS MATERIALIZED (SELECT cov.i AS j, sum(cov.c * v{k - 1}.val) AS raw
           FROM cov JOIN v{k - 1} ON cov.j = v{k - 1}.j GROUP BY cov.i),
    v{k} AS MATERIALIZED (SELECT j, (raw * 1000) // (SELECT max(abs(raw)) FROM m{k}) AS val FROM m{k}),
"""
        for k in range(1, _PCA_ITER + 1)
    )
    + f"""    proj AS (
        SELECT r.vec_id, CAST(sum(r.x * vv.val) AS BIGINT) AS pc_milli
        FROM rows_ r JOIN v{_PCA_ITER} vv ON r.d = vv.j
        GROUP BY r.vec_id
    )
    SELECT vec_id, pc_milli FROM proj ORDER BY vec_id
    """
)
assert _PCA_ORACLE.count("WITH ") == 1


@register(
    "sim_pca_project",
    oracle=_PCA_ORACLE,
    tags=("pipeline", "similarity", "pca"),
    doc="Distributed uncentered PCA projection (power method): 64x64 "
    "second-moment matrix via ONE map-side-combining aggregation (4096 "
    "cells, corpus-size-independent task state), 5 exact-integer "
    "power iterations on the cell table, one keyed projection shuffle; "
    "convergence is spectrum-dependent (test-proven >0.999 vs numpy on "
    "an anisotropic fixture), the oracle pins the mechanism.",
)
def sim_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 scan-guard rework: the single-SQL form above (kept as _PCA_SQL
    # for the oracle's structural twin) inlined cov/rows_ into every
    # power iteration — 125 embeddings scans in the optimized plan.
    # Production shape: the 4096-cell moment matrix is checkpointed
    # once (corpus-size-independent), each 64-row iterate is
    # checkpointed, and the projection re-derives the exploded rows in
    # ONE scan — 3 embeddings scans total across all plans.
    rows_sql = """
        SELECT vec_id, posexplode(v) AS (d, x)
        FROM (SELECT vec_id,
                     transform(embedding,
                               x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
              FROM embeddings)
    """
    cov = catalog.sql(
        spark,
        sf_dir,
        f"""
        SELECT a.d AS i, b.d AS j, cast(sum(a.x * b.x) AS bigint) AS c
        FROM ({rows_sql}) a JOIN ({rows_sql}) b ON a.vec_id = b.vec_id
        GROUP BY a.d, b.d
        """,
    ).localCheckpoint(eager=True)
    v = spark.sql("SELECT explode(sequence(0, 63)) AS j, cast(1000 AS bigint) AS val")
    for _ in range(_PCA_ITER):
        raw = _sql_with_views(
            spark,
            "SELECT c.i AS j, sum(c.c * p.val) AS raw "
            "FROM __cov c JOIN __prev p ON c.j = p.j GROUP BY c.i",
            __cov=cov,
            __prev=v,
        ).localCheckpoint(eager=True)
        v = _sql_with_views(
            spark,
            "SELECT j, (raw * 1000) DIV (SELECT max(abs(raw)) FROM __raw) AS val "
            "FROM __raw",
            __raw=raw,
        ).localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        f"""
        SELECT r.vec_id, cast(sum(r.x * vv.val) AS bigint) AS pc_milli
        FROM ({rows_sql}) r JOIN __v vv ON r.d = vv.j
        GROUP BY r.vec_id ORDER BY vec_id
        """,
        sf_dir=sf_dir,
        __v=v,
    )


# ---------------------------------------------------------------------------
# Two-stage prefix rerank (coarse-to-fine retrieval funnel)
# ---------------------------------------------------------------------------
# The adaptive-retrieval pattern behind Matryoshka embeddings (Kusupati et
# al. 2022) and every production two-stage ANN stack: a CHEAP coarse pass
# scores the whole corpus on a low-dimensional PREFIX of the embedding
# (16 of 64 dims here — 1/4 of the bytes, and with columnar storage the
# suffix never leaves the scan), keeps a per-query shortlist, and only the
# shortlist is re-scored exactly on the full vector.  Scale shape
# (100 TB posture): the corpus-wide work is ONE scan scoring 16-dim
# prefixes against a BROADCAST 8-row query set (the same bounded-broadcast
# shape as sim_topk_bruteforce, never corpus x corpus); the full-dim
# vectors are fetched for only <= 20 candidates per query via an equi
# hash-join on cand_id, so the expensive payload is touched for
# O(queries * shortlist) rows no matter how large the corpus grows.
# Reranking a 20-row shortlist is driver-trivial yet stays distributed.
# The oracle replicates both stages exactly; tests additionally assert
# the funnel's recall against single-stage full-dim brute force.
_TWOSTAGE_CORPUS_SQL = """
    WITH e AS (SELECT vec_id, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings)
    SELECT vec_id, v,
           slice(v, 1, 16) AS pv,
           sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm,
           sqrt(aggregate(slice(v, 1, 16), cast(0 AS double), (a, x) -> a + x * x)) AS pnrm
    FROM e
"""

_TWOSTAGE_MAIN_SQL = """
    WITH q AS (SELECT * FROM {N} WHERE vec_id < 8),
    coarse AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               aggregate(zip_with(q.pv, c.pv, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (q.pnrm * c.pnrm) AS pcos
        FROM q JOIN {N} c ON q.vec_id <> c.vec_id
    ),
    short AS (
        SELECT query_id, cand_id, crk FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, cand_id) AS crk
            FROM coarse
        ) WHERE crk <= 20
    ),
    rerank AS (
        SELECT s.query_id, s.cand_id, s.crk,
               aggregate(zip_with(qv.v, cv.v, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (qv.nrm * cv.nrm) AS cos
        FROM short s
        JOIN {N} qv ON qv.vec_id = s.query_id
        JOIN {N} cv ON cv.vec_id = s.cand_id
    )
    SELECT query_id, neighbor_id, rk, coarse_rank, cos_sim FROM (
        SELECT query_id, cand_id AS neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk,
               crk AS coarse_rank,
               round(cos, 4) AS cos_sim
        FROM rerank
    ) WHERE rk <= 5
    ORDER BY query_id, rk
"""


@register(
    "sim_two_stage_prefix_rerank",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    n AS MATERIALIZED (SELECT vec_id, v, v[1:16] AS pv FROM e),
    q AS (SELECT * FROM n WHERE vec_id < 8),
    coarse AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               list_cosine_similarity(q.pv, c.pv) AS pcos
        FROM q JOIN n c ON q.vec_id <> c.vec_id
    ),
    short AS (
        SELECT query_id, cand_id, crk FROM (
            SELECT query_id, cand_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY pcos DESC, cand_id) AS crk
            FROM coarse
        ) WHERE crk <= 20
    ),
    rerank AS (
        SELECT s.query_id, s.cand_id, s.crk,
               list_cosine_similarity(qv.v, cv.v) AS cos
        FROM short s
        JOIN n qv ON qv.vec_id = s.query_id
        JOIN n cv ON cv.vec_id = s.cand_id
    )
    SELECT query_id, neighbor_id, rk, coarse_rank, cos_sim FROM (
        SELECT query_id, cand_id AS neighbor_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk,
               crk AS coarse_rank,
               round(cos, 4) AS cos_sim
        FROM rerank
    ) t WHERE rk <= 5
    ORDER BY query_id, rk
    """,
    tags=("pipeline", "similarity"),
    doc="Two-stage retrieval funnel (Matryoshka-style adaptive retrieval): "
    "coarse corpus pass on a 16-dim embedding PREFIX vs a broadcast query "
    "set, per-query top-20 shortlist, exact full-dim rerank of the "
    "shortlist only; full vectors are fetched via equi hash-join for "
    "O(queries x 20) rows regardless of corpus size; the normalized "
    "corpus is localCheckpoint-staged ONCE (the naive CTE form rescans "
    "the parquet and recomputes both norms 4x — plan-asserted zero "
    "parquet scans in the funnel plan).",
)
def sim_two_stage_prefix_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = catalog.sql(spark, sf_dir, _TWOSTAGE_CORPUS_SQL).localCheckpoint(eager=True)
    n.createOrReplaceTempView("__ts_n")
    return spark.sql(_TWOSTAGE_MAIN_SQL.format(N="__ts_n"))


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken 2003 — the MOSS
# algorithm) + shared-fingerprint near-dup pairing
# ---------------------------------------------------------------------------
# text_fingerprint keeps the bottom-4 gram hashes per doc (a cheap sketch);
# THIS is the real winnowing selection: hash every 8-char gram, slide a
# w=8 window over the hash sequence and select each window's MINIMUM —
# the guarantee that makes MOSS work is positional (any shared substring
# of length >= w+7 forces at least one shared selected fingerprint), so
# unlike bottom-k the fingerprint density is uniform across the document.
# Pairing is the inverted-index shape: group by fingerprint, emit doc
# pairs, score containment.  Scale posture (100 TB): gram hashing +
# window-min are doc-local (ONE scan, one doc-keyed sort-shuffle for the
# window); the pair generator joins POSTING LISTS CAPPED at df <= 12 docs
# (the hot-fingerprint cap every winnowing index applies — with a 31-word
# vocabulary most grams are corpus-wide stopword noise, exactly what the
# cap exists to drop), so candidate volume is bounded by sum(df^2) <=
# 12 * n_fingerprints, never corpus x corpus; containment is computed
# over the rare-fingerprint universe with exact integer basis points.
# doc_id % 7 < 2 keeps a scale-proportional sample (cost control for the
# per-character gram hashing, same concession as text_fingerprint's).
_WINNOW_FP_SQL = """
    WITH g AS (
        SELECT doc_id,
               transform(sequence(1, length(text) - 7),
                   i -> aggregate(split(substring(text, i, 8), ''), 131L,
                                  (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)) AS ghs
        FROM documents WHERE doc_id % 7 < 2 AND length(text) >= 15
    ),
    pos AS (
        SELECT doc_id, p, h FROM g LATERAL VIEW posexplode(ghs) x AS p, h
    ),
    win AS (
        SELECT doc_id, p,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
        FROM pos
    )
    SELECT DISTINCT doc_id, sel AS fph FROM win WHERE p >= 7
"""

_WINNOW_PAIRS_SQL = """
    WITH rare AS (SELECT fph FROM {FP} GROUP BY fph HAVING count(*) <= 12),
    fpr AS (SELECT f.doc_id, f.fph FROM {FP} f JOIN rare r ON f.fph = r.fph),
    sz AS (SELECT doc_id, count(*) AS n FROM fpr GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
        FROM fpr a JOIN fpr b ON a.fph = b.fph AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.a_id, p.b_id,
           CAST(p.n_shared AS BIGINT) AS n_shared,
           CAST((p.n_shared * 10000) DIV least(sa.n, sb.n) AS BIGINT) AS cont_bp
    FROM pairs p
    JOIN sz sa ON sa.doc_id = p.a_id
    JOIN sz sb ON sb.doc_id = p.b_id
    WHERE (p.n_shared * 10000) DIV least(sa.n, sb.n) >= 6000
    ORDER BY p.a_id, p.b_id
"""


@register(
    "text_winnowing_dedup",
    oracle="""
    WITH g AS (
        SELECT doc_id,
               [list_reduce(list_prepend(131::BIGINT,
                   [ascii(c)::BIGINT for c in string_split(substring(text, i, 8), '')]),
                   (a, b) -> (a * 31 + b) % 1000000007)
                for i in range(1, length(text) - 6)] AS ghs
        FROM documents WHERE doc_id % 7 < 2 AND length(text) >= 15
    ),
    pos AS (SELECT doc_id, i - 1 AS p, ghs[i] AS h
            FROM g, LATERAL (SELECT unnest(range(1, len(ghs) + 1)) AS i) t),
    win AS (
        SELECT doc_id, p,
               min(h) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS sel
        FROM pos
    ),
    fp AS MATERIALIZED (SELECT DISTINCT doc_id, sel AS fph FROM win WHERE p >= 7),
    rare AS (SELECT fph FROM fp GROUP BY fph HAVING count(*) <= 12),
    fpr AS MATERIALIZED (SELECT f.doc_id, f.fph FROM fp f JOIN rare r ON f.fph = r.fph),
    sz AS (SELECT doc_id, count(*) AS n FROM fpr GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_shared
        FROM fpr a JOIN fpr b ON a.fph = b.fph AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.a_id, p.b_id,
           CAST(p.n_shared AS BIGINT) AS n_shared,
           CAST((p.n_shared * 10000) // least(sa.n, sb.n) AS BIGINT) AS cont_bp
    FROM pairs p
    JOIN sz sa ON sa.doc_id = p.a_id
    JOIN sz sb ON sb.doc_id = p.b_id
    WHERE (p.n_shared * 10000) // least(sa.n, sb.n) >= 6000
    ORDER BY p.a_id, p.b_id
    """,
    tags=("pipeline", "text", "dedup"),
    doc="Winnowing (MOSS) fingerprint dedup: 8-char gram polynomial hashes, "
    "w=8 window-min selection (positional guarantee: any shared substring "
    ">= 15 chars forces a shared fingerprint), inverted-index pairing with "
    "a df<=12 hot-fingerprint cap bounding posting lists, exact integer "
    "basis-point containment >= 60% over the rare-fingerprint universe; "
    "the fingerprint table is localCheckpoint-materialized ONCE (the "
    "naive CTE form re-derives the per-character gram hashing 8x — "
    "plan-asserted zero parquet scans in the pairing plan).",
)
def text_winnowing_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = catalog.sql(spark, sf_dir, _WINNOW_FP_SQL).localCheckpoint(eager=True)
    fp.createOrReplaceTempView("__wn_fp")
    return spark.sql(_WINNOW_PAIRS_SQL.format(FP="__wn_fp"))


# ---------------------------------------------------------------------------
# Two-pass exact heavy hitters (Misra-Gries candidates -> exact recount)
# ---------------------------------------------------------------------------
# The standard trick for exact top-k over a domain too wide to shuffle in
# full (word/token n-grams over a 100 TB corpus easily exceed 10^10
# distinct keys): pass 1 runs a MISRA-GRIES summary (capacity m) inside
# each Arrow batch — per-task state is <= m counters REGARDLESS of batch
# size, and the union of per-batch candidates provably contains every key
# with global frequency > N/(m+1) (pigeonhole over the weighted batch
# average; Misra & Gries 1982); pass 2 rescans the corpus and computes
# EXACT counts for the candidate set only, broadcast-semi-joined onto the
# token stream, so the full-cardinality (bigram -> count) shuffle never
# happens — the exchange carries at most |candidates| * n_tasks rows.
# The output is therefore EXACT top-k (deterministic, independent of
# partitioning/batching) whenever the k-th count clears N/(m+1); with
# m = 1024 and this fixture's 31-word vocabulary (<= 961 distinct
# bigrams < m) the summaries are lossless at every scale, and the
# threshold is also met with wide margins (tests assert both the MG
# guarantee on an adversarial stream and candidate completeness here).
_HH_K = 20
_HH_CAPACITY = 1024


def _mg_batch_candidates(batches):
    """Per-Arrow-batch Misra-Gries: yields candidate bigrams (capacity-bounded)."""
    import pandas as pd

    for pdf in batches:
        counters: dict[str, int] = {}
        for text in pdf["text"]:
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                key = toks[i] + " " + toks[i + 1]
                if key in counters:
                    counters[key] += 1
                elif len(counters) < _HH_CAPACITY:
                    counters[key] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"bigram": list(counters)})


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH t AS (
        SELECT string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 2
    ),
    b AS (
        SELECT t[i] || ' ' || t[i + 1] AS bigram
        FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) x
    ),
    c AS (SELECT bigram, count(*) AS cnt FROM b GROUP BY bigram)
    SELECT CAST(row_number() OVER (ORDER BY cnt DESC, bigram) AS BIGINT) AS rank,
           bigram, CAST(cnt AS BIGINT) AS cnt
    FROM c
    ORDER BY cnt DESC, bigram
    LIMIT {_HH_K}
    """,
    tags=("pipeline", "text", "sketch"),
    doc="Exact top-20 word bigrams via the two-pass heavy-hitter pattern: "
    "Misra-Gries (capacity 1024) per Arrow batch bounds per-task state and "
    "guarantees candidates cover every key with freq > N/1025; an exact "
    "recount of the broadcast candidate set avoids shuffling the full "
    "n-gram cardinality. Output is exact and partitioning-independent.",
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    candidates = (
        docs.select("text").mapInPandas(_mg_batch_candidates, "bigram string").distinct()
    )
    docs.select("text").createOrReplaceTempView("__hh_docs")
    candidates.createOrReplaceTempView("__hh_cands")
    return spark.sql(f"""
        WITH t AS (
            SELECT split(text, ' ') AS t FROM __hh_docs
            WHERE size(split(text, ' ')) >= 2
        ),
        b AS (
            SELECT explode(transform(sequence(0, size(t) - 2),
                           i -> concat(element_at(t, i + 1), ' ', element_at(t, i + 2)))) AS bigram
            FROM t
        ),
        c AS (
            SELECT b.bigram, count(*) AS cnt
            FROM b JOIN __hh_cands cd ON b.bigram = cd.bigram
            GROUP BY b.bigram
        )
        SELECT CAST(row_number() OVER (ORDER BY cnt DESC, bigram) AS BIGINT) AS rank,
               bigram, CAST(cnt AS BIGINT) AS cnt
        FROM c
        ORDER BY cnt DESC, bigram
        LIMIT {_HH_K}
    """)


# ---------------------------------------------------------------------------
# k-means|| initialization (Bahmani et al., "Scalable k-means++", VLDB 2012)
# ---------------------------------------------------------------------------
# k-means++ is inherently sequential (one center per pass); k-means|| is
# THE distributed replacement: each round oversamples ~l new centers with
# probability proportional to a point's current cost d^2(x, C), so a
# constant number of corpus passes yields an O(log n)-competitive seed
# set.  Scale shape (100 TB posture): every round scores the corpus
# against only the ~l NEW candidates of that round (broadcast join on the
# 64 exploded dims; per-row work O(64 * l)) and folds the result into the
# running cost with least() — the candidate set never exceeds seed +
# rounds * E[l], so per-round state is bounded and there are exactly
# ROUNDS + 1 corpus passes (the last one weights candidates for the final
# recluster, which at k-means|| scale happens on a single machine — here
# the top-k-by-weight rule keeps it deterministic and in-engine).  All
# arithmetic is exact-integer: embeddings are milli-quantized, d^2 and
# costs are BIGINT sums, and the cost-proportional coin flip
#   prand(x, r) * total_cost < l * 100000 * cost(x)
# uses the same arithmetic hash family as the LSH blockings
# ((vec_id * 2654435761 + r * 40503 + 12345) % 100000), so Spark and the
# oracle agree bit-for-bit (total_cost fits int64 up to ~10^13 vectors at
# this quantization; production would rescale the coin to a wider prime).
_KMPP_ROUNDS = 3
_KMPP_L = 4
_KMPP_K = 5


def _kmpp_rounds_sql(dialect: str) -> str:
    """Unrolled k-means|| rounds over a pre-registered ``rows_`` relation
    (vec_id, d, x of the milli-quantized embeddings)."""
    mat = " MATERIALIZED" if dialect == "duckdb" else ""
    sql = f"""
    WITH sel0 AS (SELECT CAST(0 AS BIGINT) AS c_id),
    cand0 AS (SELECT s.c_id, r.d, r.x FROM sel0 s JOIN rows_ r ON r.vec_id = s.c_id),
    dist0 AS (SELECT rw.vec_id, c.c_id, sum((rw.x - c.x) * (rw.x - c.x)) AS d2
              FROM rows_ rw JOIN cand0 c ON rw.d = c.d GROUP BY rw.vec_id, c.c_id),
    cost0 AS{mat} (SELECT vec_id, min(d2) AS cost FROM dist0 GROUP BY vec_id),
"""
    prev = "cost0"
    sels = ["sel0"]
    for r in range(1, _KMPP_ROUNDS + 1):
        sql += f"""    sel{r} AS{mat} (
        SELECT c.vec_id AS c_id FROM {prev} c, (SELECT sum(cost) AS tot FROM {prev}) t
        WHERE ((c.vec_id * 2654435761 + {r} * 40503 + 12345) % 100000) * t.tot
              < {_KMPP_L} * 100000 * c.cost),
    cand{r} AS (SELECT s.c_id, r.d, r.x FROM sel{r} s JOIN rows_ r ON r.vec_id = s.c_id),
    dist{r} AS (SELECT rw.vec_id, c.c_id, sum((rw.x - c.x) * (rw.x - c.x)) AS d2
                FROM rows_ rw JOIN cand{r} c ON rw.d = c.d GROUP BY rw.vec_id, c.c_id),
    cost{r} AS{mat} (
        SELECT p.vec_id, least(p.cost, coalesce(m.mn, p.cost)) AS cost
        FROM {prev} p LEFT JOIN (SELECT vec_id, min(d2) AS mn FROM dist{r} GROUP BY vec_id) m
          ON m.vec_id = p.vec_id),
"""
        prev = f"cost{r}"
        sels.append(f"sel{r}")
    union = " UNION ALL ".join(f"SELECT c_id, {i} AS sel_round FROM {s}" for i, s in enumerate(sels))
    sql += f"""    candidates AS{mat} ({union}),
    candrows AS (SELECT c.c_id, r.d, r.x
                 FROM candidates c JOIN rows_ r ON r.vec_id = c.c_id),
    alldist AS (SELECT rw.vec_id, c.c_id, sum((rw.x - c.x) * (rw.x - c.x)) AS d2
                FROM rows_ rw JOIN candrows c ON rw.d = c.d GROUP BY rw.vec_id, c.c_id),
    assign AS (SELECT vec_id, c_id FROM (
                   SELECT vec_id, c_id,
                          row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
                   FROM alldist) rnk WHERE rn = 1),
    weights AS (SELECT a.c_id, count(*) AS weight FROM assign a GROUP BY a.c_id)
    SELECT CAST(row_number() OVER (ORDER BY w.weight DESC, w.c_id) AS BIGINT) AS rank,
           w.c_id AS centroid_id, CAST(w.weight AS BIGINT) AS weight,
           CAST(c.sel_round AS BIGINT) AS sel_round
    FROM weights w JOIN candidates c ON c.c_id = w.c_id
    ORDER BY w.weight DESC, w.c_id
    LIMIT {_KMPP_K}
    """
    return sql


_KMPP_ORACLE = (
    """
    WITH e AS (
        SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    rows_ AS MATERIALIZED (
        SELECT vec_id, d - 1 AS d, v[d] AS x
        FROM e, unnest(generate_series(1, 64)) AS t(d)
    ),
"""
    + _kmpp_rounds_sql("duckdb").lstrip().removeprefix("WITH ")
)
assert _KMPP_ORACLE.count("WITH ") == 1


@register(
    "cluster_kmeans_parallel_init",
    oracle=_KMPP_ORACLE,
    tags=("pipeline", "clustering"),
    doc="k-means|| oversampling initialization (Bahmani et al. 2012): 3 "
    "unrolled rounds, each scoring the corpus against only that round's "
    "~l=4 new broadcast candidates and folding into the running cost via "
    "least(); cost-proportional selection uses the exact-integer "
    "arithmetic-hash coin, candidate weighting is one final broadcast "
    "pass + top-k by weight. ROUNDS+1 corpus passes total, per-round "
    "state bounded by the candidate set.",
)
def cluster_kmeans_parallel_init(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 scan-audit fix: the unrolled _kmpp_rounds_sql (kept verbatim —
    # it is the oracle text) re-expands under CTE inlining (each round's
    # cost references the previous cost twice, the selection coin twice
    # more, and the candidate union re-inlines every sel) — a 301 KB
    # plan with 146 scans of the checkpointed rows_ relation.  The
    # builder stages each round's cost / sel (vec- and candidate-sized)
    # as localCheckpoints; every expression is copied verbatim.
    catalog.register_views(spark, sf_dir)
    rows_ = spark.sql(
        """
        SELECT vec_id, d, x FROM (
            SELECT vec_id,
                   posexplode(transform(embedding,
                       e -> cast(round(cast(e AS double) * 1000) AS bigint))) AS (d, x)
            FROM embeddings
        )
        """
    ).localCheckpoint(eager=True)
    cost = _sql_with_views(
        spark,
        """
        WITH sel0 AS (SELECT CAST(0 AS BIGINT) AS c_id),
        cand0 AS (SELECT s.c_id, r.d, r.x FROM sel0 s JOIN __km_rows r ON r.vec_id = s.c_id),
        dist0 AS (SELECT rw.vec_id, c.c_id, sum((rw.x - c.x) * (rw.x - c.x)) AS d2
                  FROM __km_rows rw JOIN cand0 c ON rw.d = c.d GROUP BY rw.vec_id, c.c_id)
        SELECT vec_id, min(d2) AS cost FROM dist0 GROUP BY vec_id
        """,
        __km_rows=rows_,
    ).localCheckpoint(eager=True)
    sels = []
    for r in range(1, _KMPP_ROUNDS + 1):
        sel = _sql_with_views(
            spark,
            f"""
            SELECT c.vec_id AS c_id FROM __km_cost c, (SELECT sum(cost) AS tot FROM __km_cost) t
            WHERE ((c.vec_id * 2654435761 + {r} * 40503 + 12345) % 100000) * t.tot
                  < {_KMPP_L} * 100000 * c.cost
            """,
            __km_cost=cost,
        ).localCheckpoint(eager=True)
        sels.append(sel)
        cost = _sql_with_views(
            spark,
            """
            WITH cand AS (SELECT s.c_id, r.d, r.x
                          FROM __km_sel s JOIN __km_rows r ON r.vec_id = s.c_id),
            dist AS (SELECT rw.vec_id, c.c_id, sum((rw.x - c.x) * (rw.x - c.x)) AS d2
                     FROM __km_rows rw JOIN cand c ON rw.d = c.d GROUP BY rw.vec_id, c.c_id)
            SELECT p.vec_id, least(p.cost, coalesce(m.mn, p.cost)) AS cost
            FROM __km_cost p LEFT JOIN (SELECT vec_id, min(d2) AS mn FROM dist GROUP BY vec_id) m
              ON m.vec_id = p.vec_id
            """,
            __km_rows=rows_,
            __km_sel=sel,
            __km_cost=cost,
        ).localCheckpoint(eager=True)
    cand_df = spark.sql("SELECT CAST(0 AS BIGINT) AS c_id, 0 AS sel_round")
    for i, sel in enumerate(sels, start=1):
        cand_df = cand_df.union(sel.select(F.col("c_id"), F.lit(i).alias("sel_round")))
    candidates = cand_df.localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        f"""
        WITH candrows AS (SELECT c.c_id, r.d, r.x
                          FROM __km_cands c JOIN __km_rows r ON r.vec_id = c.c_id),
        alldist AS (SELECT rw.vec_id, c.c_id, sum((rw.x - c.x) * (rw.x - c.x)) AS d2
                    FROM __km_rows rw JOIN candrows c ON rw.d = c.d GROUP BY rw.vec_id, c.c_id),
        assign AS (SELECT vec_id, c_id FROM (
                       SELECT vec_id, c_id,
                              row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_id) AS rn
                       FROM alldist) rnk WHERE rn = 1),
        weights AS (SELECT a.c_id, count(*) AS weight FROM assign a GROUP BY a.c_id)
        SELECT CAST(row_number() OVER (ORDER BY w.weight DESC, w.c_id) AS BIGINT) AS rank,
               w.c_id AS centroid_id, CAST(w.weight AS BIGINT) AS weight,
               CAST(c.sel_round AS BIGINT) AS sel_round
        FROM weights w JOIN __km_cands c ON c.c_id = w.c_id
        ORDER BY w.weight DESC, w.c_id
        LIMIT {_KMPP_K}
        """,
        __km_rows=rows_,
        __km_cands=candidates,
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (CDC — the rsync/LBFS/FastCDC family)
# ---------------------------------------------------------------------------
# Fixed-size chunking breaks on INSERTION (one added word shifts every
# later chunk boundary); content-defined chunking places boundaries where
# a rolling hash of the local content hits a target pattern, so an edit
# only perturbs the chunk it lands in — the property that makes
# storage-level dedup (rsync, LBFS, FastCDC) and incremental training-
# data snapshotting work.  Word-level here: boundary after word i when
# the 4-word rolling polynomial hash % 8 == 0 (expected chunk ~8 words).
# Scale shape (100 TB posture): tokenization, word hashing, the rolling
# hash (3 lag()s), boundary cumsum, and chunk assembly are ALL doc-local
# — one scan + ONE doc-keyed sort-shuffle; chunk-hash frequency is one
# exact-dedup groupBy on (chash, n_words) (the same bound as dedup_exact,
# never pairwise); the per-source rollup is a bounded aggregate.  All
# arithmetic exact-integer (position-weighted chunk hash: order-
# sensitive, both engines agree bit-for-bit).
_sql_query(
    "dedup_cdc_chunks",
    """
    WITH tok AS (
        SELECT doc_id, source, p, w
        FROM documents LATERAL VIEW posexplode(split(text, ' ')) t AS p, w
    ),
    wh AS (
        SELECT doc_id, source, p,
               aggregate(split(w, ''), 7L, (a, c) -> (a * 31 + ascii(c)) % 1000000007) AS h
        FROM tok
    ),
    roll AS (
        SELECT doc_id, source, p, h,
               CASE WHEN p >= 3 THEN
                   (lag(h, 3) OVER w * 29791 + lag(h, 2) OVER w * 961
                    + lag(h, 1) OVER w * 31 + h) % 1000000007
               END AS rh
        FROM wh
        WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    marked AS (
        SELECT doc_id, source, p, h,
               CASE WHEN rh IS NOT NULL AND rh % 8 = 0 THEN 1 ELSE 0 END AS boundary
        FROM roll
    ),
    chunked AS (
        SELECT doc_id, source, p, h,
               coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
        FROM marked
    ),
    anchored AS (
        SELECT doc_id, source, p, h, chunk_idx,
               min(p) OVER (PARTITION BY doc_id, chunk_idx) AS cs
        FROM chunked
    ),
    chunks AS (
        SELECT doc_id, source, chunk_idx,
               count(*) AS n_words,
               sum((p - cs + 1) * h) % 1000000007 AS chash
        FROM anchored
        GROUP BY doc_id, source, chunk_idx
    ),
    freq AS (
        SELECT chash, n_words, count(*) AS inst FROM chunks GROUP BY chash, n_words
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT c.chash) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN f.inst > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_instances,
           CAST(sum(CASE WHEN f.inst > 1 THEN c.n_words ELSE 0 END) AS BIGINT) AS dup_words,
           CAST((sum(c.n_words) * 100) DIV count(*) AS BIGINT) AS avg_words_c
    FROM chunks c JOIN freq f ON f.chash = c.chash AND f.n_words = c.n_words
    GROUP BY c.source
    ORDER BY c.source
    """,
    oracle="""
    WITH tok AS (
        SELECT d.doc_id, d.source, t.p - 1 AS p, t.w
        FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents) d,
             LATERAL (SELECT unnest(ws) AS w, generate_subscripts(ws, 1) AS p) t
    ),
    wh AS (
        SELECT doc_id, source, p,
               list_reduce(list_prepend(7::BIGINT,
                   [ascii(c)::BIGINT for c in string_split(w, '')]),
                   (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM tok
    ),
    roll AS (
        SELECT doc_id, source, p, h,
               CASE WHEN p >= 3 THEN
                   (lag(h, 3) OVER w * 29791 + lag(h, 2) OVER w * 961
                    + lag(h, 1) OVER w * 31 + h) % 1000000007
               END AS rh
        FROM wh
        WINDOW w AS (PARTITION BY doc_id ORDER BY p)
    ),
    marked AS (
        SELECT doc_id, source, p, h,
               CASE WHEN rh IS NOT NULL AND rh % 8 = 0 THEN 1 ELSE 0 END AS boundary
        FROM roll
    ),
    chunked AS (
        SELECT doc_id, source, p, h,
               coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
        FROM marked
    ),
    anchored AS (
        SELECT doc_id, source, p, h, chunk_idx,
               min(p) OVER (PARTITION BY doc_id, chunk_idx) AS cs
        FROM chunked
    ),
    chunks AS MATERIALIZED (
        SELECT doc_id, source, chunk_idx,
               count(*) AS n_words,
               sum((p - cs + 1) * h) % 1000000007 AS chash
        FROM anchored
        GROUP BY doc_id, source, chunk_idx
    ),
    freq AS (
        SELECT chash, n_words, count(*) AS inst FROM chunks GROUP BY chash, n_words
    )
    SELECT c.source,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT c.chash) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN f.inst > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_instances,
           CAST(sum(CASE WHEN f.inst > 1 THEN c.n_words ELSE 0 END) AS BIGINT) AS dup_words,
           CAST((sum(c.n_words) * 100) // count(*) AS BIGINT) AS avg_words_c
    FROM chunks c JOIN freq f ON f.chash = c.chash AND f.n_words = c.n_words
    GROUP BY c.source
    ORDER BY c.source
    """,
    tags=("pipeline", "dedup"),
    doc="Content-defined chunking (rsync/FastCDC family) at word level: "
    "4-word rolling polynomial hash, boundary at rh % 8 == 0 (insertion-"
    "stable, unlike fixed-size chunking), position-weighted exact-integer "
    "chunk hashes, cross-corpus chunk dedup via ONE (chash, n_words) "
    "groupBy, per-source dup-volume rollup. Everything before the dedup "
    "groupBy is doc-local: one scan + one doc-keyed sort-shuffle.",
)


# ---------------------------------------------------------------------------
# Modularity scoring of detected communities (Newman & Girvan 2004)
# ---------------------------------------------------------------------------
# Community detection without a quality score is unfalsifiable at scale —
# modularity Q = sum_c [ m_c/m - (d_c/2m)^2 ] is THE standard check that a
# partition beats the random-graph null model.  Computed per community
# over the label-propagation output, entirely with exact integers to
# dodge the float-division parity trap: with S = |sym| = 2m,
# intra_c = sym rows inside c (= 2 m_c) and d_c = degree mass of c,
#   Q_c = intra_c/S - (d_c/S)^2  ==>  q_num = intra_c * S - d_c^2 over
#   q_den = S^2   (no division performed — Spark DIV truncates while
# DuckDB // floors, and q_num CAN be negative for boundary-heavy
# communities, exactly where trunc != floor).  Scale shape: the label
# table is joined onto the checkpointed edge list twice (src, dst) — one
# keyed shuffle each; degrees and community rollups are map-side-combined
# aggregates; the 1-row total is a broadcast.  Tests assert the planted
# block partition scores high positive Q and beats a degenerate
# one-community partition.
_MODQ_TAIL = """lbl AS (SELECT l3.id AS node_id, l3.lbl AS community FROM l3),
    deg AS (SELECT src AS node_id, count(*) AS d FROM {E} GROUP BY src),
    s AS (SELECT count(*) AS s2 FROM {E}),
    intra AS (SELECT la.community, count(*) AS ic
              FROM {E} e JOIN lbl la ON la.node_id = e.src
                         JOIN lbl lb ON lb.node_id = e.dst
              WHERE la.community = lb.community GROUP BY la.community),
    dsum AS (SELECT l.community, sum(d.d) AS dc, count(*) AS n_nodes
             FROM lbl l JOIN deg d ON d.node_id = l.node_id GROUP BY l.community)
    SELECT CAST(ds.community AS BIGINT) AS community,
           CAST(ds.n_nodes AS BIGINT) AS n_nodes,
           CAST(coalesce(i.ic, 0) AS BIGINT) AS intra_deg,
           CAST(ds.dc AS BIGINT) AS total_deg,
           CAST(coalesce(i.ic, 0) * s.s2 - ds.dc * ds.dc AS BIGINT) AS q_num,
           CAST(s.s2 * s.s2 AS BIGINT) AS q_den
    FROM dsum ds CROSS JOIN s LEFT JOIN intra i ON i.community = ds.community
    ORDER BY community
"""

_MODQ_ORACLE = (
    _LABELPROP_ORACLE.split("SELECT CAST(l3.id AS BIGINT)")[0].rstrip().rstrip(",")
    + ",\n    "
    + _MODQ_TAIL.format(E="sym")
)
assert _MODQ_ORACLE.count("WITH ") == 1


@register(
    "graph_modularity",
    oracle=_MODQ_ORACLE,
    tags=("pipeline", "graph", "community"),
    doc="Per-community Newman modularity of the label-propagation "
    "partition, as exact-integer rationals (q_num = intra_c*S - d_c^2, "
    "q_den = S^2; no division — q_num can be negative, where Spark trunc "
    "!= DuckDB floor): two label-onto-edges keyed joins + map-side-"
    "combined degree/community rollups + one broadcast total.",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 scan-audit fix: the modularity tail references the label table
    # three times (intra twice + dsum), so inlining the whole unrolled
    # label-propagation cascade per reference gave a 139 KB plan with 69
    # edge-relation scans; it now reads the staged l3 labels.
    l3 = _labelprop_labels(spark, sf_dir)
    sql = "WITH " + _MODQ_TAIL.format(E="__mq_sym").replace(
        "lbl AS (SELECT l3.id AS node_id, l3.lbl AS community FROM l3),",
        "lbl AS (SELECT l3.id AS node_id, l3.lbl AS community FROM __mq_l3 l3),",
    )
    return _sql_with_views(
        spark, sql, __mq_sym=_block_web_edges(spark, sf_dir), __mq_l3=l3
    )


# ---------------------------------------------------------------------------
# BPE tokenizer-training merge rounds (Sennrich et al. 2016, the GPT-2
# tokenizer recipe)
# ---------------------------------------------------------------------------
# Tokenizer training IS a corpus-scale aggregation problem: each BPE round
# counts adjacent symbol pairs over the whole corpus, picks the most
# frequent pair, and greedily merges it everywhere.  Per round the scale
# shape is: ONE map-side-combined (pair -> count) groupBy (the domain is
# symbol-pair cardinality, tiny), a top-1 TakeOrdered, and a per-row
# string rewrite with the winning pair BROADCAST onto the corpus (CROSS
# JOIN of a 1-row relation) — no corpus-sized state anywhere, and the
# working column is localCheckpoint-materialized between rounds so round
# r+1 reads round r's output once instead of recursively re-deriving the
# whole merge chain.  Greedy left-to-right merge semantics are encoded in
# the separator scheme: symbols are joined with DOUBLE interpuncts and
# each replace pattern consumes one boundary dot per side, so consecutive
# non-overlapping occurrences all merge in one pass ("a a a" merges the
# first pair only — exactly BPE's scan order) and substring collisions
# are impossible.  Ties break (count DESC, pair text) in both engines.
_BPE_ROUNDS = 3

_BPE_CORP0_SQL = """
    SELECT doc_id, concat('·', concat_ws('··', split(w, '')), '·') AS s
    FROM (
        SELECT doc_id, w
        FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
        WHERE length(w) >= 2
    )
"""

# one merge round over the previous working view {P}: top pair + rewrite.
# The `size(t) >= 2` guard matters once a merge completes a whole word
# (size(t) = 1): without it sequence(0, -1) yields [0, -1] and the
# transform emits NULL pairs (out-of-range t[i] is NULL) that the DuckDB
# oracle's range(1, len(t)) never produces — a NULL-count winner would
# then null the entire working corpus via replace(s, NULL, ...).
_BPE_ROUND_SQL = """
    WITH pairs AS (
        SELECT pair, count(*) AS cnt FROM (
            SELECT explode(transform(sequence(0, size(t) - 2),
                       i -> concat(t[i], ' ', t[i + 1]))) AS pair
            FROM (SELECT split(substring(s, 2, length(s) - 2), '··') AS t FROM {P})
            WHERE size(t) >= 2
        ) GROUP BY pair
    ),
    top AS (SELECT pair, cnt FROM pairs ORDER BY cnt DESC, pair LIMIT 1)
    SELECT c.doc_id,
           replace(c.s,
                   concat('·', split(t.pair, ' ')[0], '··', split(t.pair, ' ')[1], '·'),
                   concat('·', replace(t.pair, ' ', ''), '·')) AS s
    FROM {P} c CROSS JOIN top t
"""

_BPE_SUMMARY_SQL = """
    WITH pairs AS (
        SELECT pair, count(*) AS cnt FROM (
            SELECT explode(transform(sequence(0, size(t) - 2),
                       i -> concat(t[i], ' ', t[i + 1]))) AS pair
            FROM (SELECT split(substring(s, 2, length(s) - 2), '··') AS t FROM {P})
            WHERE size(t) >= 2
        ) GROUP BY pair
    ),
    top AS (SELECT pair, cnt FROM pairs ORDER BY cnt DESC, pair LIMIT 1)
    SELECT CAST({R} AS BIGINT) AS round,
           t.pair AS merged_pair,
           CAST(t.cnt AS BIGINT) AS pair_count,
           (SELECT CAST(sum(size(split(substring(s, 2, length(s) - 2), '··'))) AS BIGINT)
            FROM {N}) AS corpus_tokens_after
    FROM top t
"""


def _bpe_oracle() -> str:
    sql = """
    WITH words AS (
        SELECT doc_id, w FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
             LATERAL (SELECT unnest(ws) AS w) t
        WHERE length(w) >= 2
    ),
    corp0 AS MATERIALIZED (
        SELECT doc_id, '·' || array_to_string([c for c in string_split(w, '')], '··') || '·' AS s
        FROM words
    ),"""
    prev = "corp0"
    for r in range(1, _BPE_ROUNDS + 1):
        sql += f"""
    pairs{r} AS (
        SELECT t[i] || ' ' || t[i + 1] AS pair, count(*) AS cnt
        FROM (SELECT string_split(substring(s, 2, length(s) - 2), '··') AS t FROM {prev}) x,
             LATERAL (SELECT unnest(range(1, len(t))) AS i) ix
        GROUP BY t[i] || ' ' || t[i + 1]
    ),
    top{r} AS MATERIALIZED (
        SELECT pair, cnt FROM pairs{r} ORDER BY cnt DESC, pair LIMIT 1
    ),
    corp{r} AS MATERIALIZED (
        SELECT c.doc_id,
               replace(c.s,
                       '·' || string_split(t.pair, ' ')[1] || '··' || string_split(t.pair, ' ')[2] || '·',
                       '·' || replace(t.pair, ' ', '') || '·') AS s
        FROM {prev} c CROSS JOIN top{r} t
    ),"""
        prev = f"corp{r}"
    unions = "\n        UNION ALL".join(
        f"""
        SELECT {r} AS round, (SELECT pair FROM top{r}) AS merged_pair,
               (SELECT cnt FROM top{r}) AS pair_count,
               (SELECT sum(len(string_split(substring(s, 2, length(s) - 2), '··'))) FROM corp{r})
                   AS corpus_tokens_after"""
        for r in range(1, _BPE_ROUNDS + 1)
    )
    sql += f"""
    summary AS ({unions}
    )
    SELECT CAST(round AS BIGINT) AS round, merged_pair,
           CAST(pair_count AS BIGINT) AS pair_count,
           CAST(corpus_tokens_after AS BIGINT) AS corpus_tokens_after
    FROM summary ORDER BY round
    """
    return sql


_BPE_ORACLE = _bpe_oracle()
assert _BPE_ORACLE.count("WITH ") == 1


@register(
    "text_bpe_train_rounds",
    oracle=_BPE_ORACLE,
    tags=("pipeline", "text", "tokenizer"),
    doc="3 unrolled BPE tokenizer-training rounds (Sennrich et al. 2016): "
    "per round ONE map-side-combined pair-count groupBy + top-1 "
    "TakeOrdered + a broadcast 1-row merge rewrite; the working corpus "
    "column is checkpointed between rounds (linear, never re-derives the "
    "merge chain); double-interpunct separators encode greedy left-to-"
    "right merge order identically in both engines.",
)
def text_bpe_train_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register_views(spark, sf_dir)
    corp = spark.sql(_BPE_CORP0_SQL).localCheckpoint(eager=True)
    corp.createOrReplaceTempView("__bpe_corp0")
    summaries = []
    for r in range(1, _BPE_ROUNDS + 1):
        nxt = spark.sql(_BPE_ROUND_SQL.format(P=f"__bpe_corp{r - 1}")).localCheckpoint(eager=True)
        nxt.createOrReplaceTempView(f"__bpe_corp{r}")
        summaries.append(
            spark.sql(_BPE_SUMMARY_SQL.format(P=f"__bpe_corp{r - 1}", N=f"__bpe_corp{r}", R=r))
        )
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionAll(s)
    return out.orderBy("round")


# ---------------------------------------------------------------------------
# ANN index-quality evaluation (recall@k vs exact ground truth)
# ---------------------------------------------------------------------------
# Production retrieval stacks continuously MONITOR index quality: recall
# of the approximate index against exact brute force on a probe set is
# the metric every ANN paper and every serving dashboard reports.  This
# op computes it entirely in-engine by composing two registered
# operators — sim_ivf_topk (the index under test, nprobe=1) against
# sim_topk_bruteforce (ground truth) — joined on (query_id, neighbor_id)
# and rolled up per query with exact integer basis points.  Scale shape:
# both inputs are the bounded-broadcast probe shapes already plan-
# asserted for the underlying ops; the eval join touches O(queries x k)
# rows.  The measured recall is legitimately low on this near-isotropic
# synthetic fixture (labels are not tight clusters; see
# test_ivf_is_bounded_by_bruteforce) — the op's job is to MEASURE that
# honestly, which is exactly what an index-quality monitor is for.
_ANN_EVAL_K = 3


def _ann_eval_oracle() -> str:
    from sensql_presto_spark.queries.registry import get

    return f"""
    WITH brute AS ({get("sim_topk_bruteforce").oracle}),
    ivf AS ({get("sim_ivf_topk").oracle}),
    hits AS (
        SELECT b.query_id, count(i.neighbor_id) AS n_hits
        FROM (SELECT * FROM brute WHERE rk <= {_ANN_EVAL_K}) b
        LEFT JOIN ivf i ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    )
    SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
           CAST((n_hits * 10000) // {_ANN_EVAL_K} AS BIGINT) AS recall_bp
    FROM hits ORDER BY query_id
    """


@register(
    "sim_ann_recall_eval",
    oracle=_ann_eval_oracle(),
    tags=("pipeline", "similarity", "eval"),
    doc="In-engine ANN index-quality monitor: recall@3 of sim_ivf_topk "
    "(nprobe=1) against sim_topk_bruteforce ground truth per probe query, "
    "exact integer basis points; the eval join touches O(queries x k) "
    "rows on top of the two already-plan-asserted probe shapes.",
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from sensql_presto_spark.queries.registry import get

    brute = (
        get("sim_topk_bruteforce")
        .build(spark, sf_dir)
        .where(F.col("rk") <= _ANN_EVAL_K)
        .select("query_id", "neighbor_id")
    )
    ivf = (
        get("sim_ivf_topk")
        .build(spark, sf_dir)
        .select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    )
    return (
        brute.join(ivf, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "query_id",
            F.col("n_hits").cast("long").alias("n_hits"),
            F.expr(f"(n_hits * 10000) DIV {_ANN_EVAL_K}").cast("long").alias("recall_bp"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostics (the decision input for salting / AQE tuning)
# ---------------------------------------------------------------------------
# Every skew mitigation in the scale_* family (salting, AQE skew-join,
# bucketing) starts from the same question: HOW skewed is this key?  This
# op computes the answer as an ANALYZE-style report: per candidate join
# key, the key cardinality, top-key share, and an exact-integer Gini
# coefficient in basis points (G = (2*sum(rank*cnt) - (n+1)*N) / (n*N)
# over the ascending-sorted key-frequency table — all BIGINT, single //).
# Scale shape: ONE map-side-combined groupBy per key column reduces the
# corpus to its key-frequency table; the ranking window and the rollup
# run over THAT table, whose size is the key cardinality, not the corpus
# — the same reduction ANALYZE ... COMPUTE STATISTICS rides.  Top-key
# tiebreak is deterministic (max count, then smallest key) via a
# rank-1 window pick — NOT a max_by score, which would silently
# misreport once keys exceed the score's count multiplier (custkey
# passes 1e7 at TPC-H SF >= 100).
_sql_query(
    "scale_skew_report",
    """
    WITH ko AS (SELECT o_custkey AS k FROM orders),
    ke AS (SELECT user_id AS k FROM events),
    co AS (SELECT 'orders.o_custkey' AS col, k, count(*) AS cnt FROM ko GROUP BY k),
    ce AS (SELECT 'events.user_id' AS col, k, count(*) AS cnt FROM ke GROUP BY k),
    c AS (SELECT * FROM co UNION ALL SELECT * FROM ce),
    ranked AS (
        SELECT col, k, cnt,
               row_number() OVER (PARTITION BY col ORDER BY cnt, k) AS rk,
               row_number() OVER (PARTITION BY col ORDER BY cnt DESC, k) AS rk_desc
        FROM c
    ),
    agg AS (
        SELECT col,
               count(*) AS n_keys,
               sum(cnt) AS n_rows,
               max(cnt) AS max_cnt,
               min(CASE WHEN rk_desc = 1 THEN k END) AS top_key,
               sum(rk * cnt) AS weighted
        FROM ranked GROUP BY col
    )
    SELECT col,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST((max_cnt * 10000) DIV n_rows AS BIGINT) AS max_share_bp,
           CAST(top_key AS BIGINT) AS top_key,
           CAST((10000 * (2 * weighted - (n_keys + 1) * n_rows)) DIV (n_keys * n_rows) AS BIGINT) AS gini_bp
    FROM agg ORDER BY col
    """,
    oracle="""
    WITH ko AS (SELECT o_custkey AS k FROM orders),
    ke AS (SELECT user_id AS k FROM events),
    co AS (SELECT 'orders.o_custkey' AS col, k, count(*) AS cnt FROM ko GROUP BY k),
    ce AS (SELECT 'events.user_id' AS col, k, count(*) AS cnt FROM ke GROUP BY k),
    c AS (SELECT * FROM co UNION ALL SELECT * FROM ce),
    ranked AS (
        SELECT col, k, cnt,
               row_number() OVER (PARTITION BY col ORDER BY cnt, k) AS rk,
               row_number() OVER (PARTITION BY col ORDER BY cnt DESC, k) AS rk_desc
        FROM c
    ),
    agg AS (
        SELECT col,
               count(*) AS n_keys,
               sum(cnt) AS n_rows,
               max(cnt) AS max_cnt,
               min(CASE WHEN rk_desc = 1 THEN k END) AS top_key,
               sum(rk * cnt) AS weighted
        FROM ranked GROUP BY col
    )
    SELECT col,
           CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST((max_cnt * 10000) // n_rows AS BIGINT) AS max_share_bp,
           CAST(top_key AS BIGINT) AS top_key,
           CAST((10000 * (2 * weighted - (n_keys + 1) * n_rows)) // (n_keys * n_rows) AS BIGINT) AS gini_bp
    FROM agg ORDER BY col
    """,
    tags=("pipeline", "scale"),
    doc="ANALYZE-style join-key skew report: per key column one map-side-"
    "combined groupBy reduces the corpus to its key-frequency table, then "
    "cardinality / top-key share / exact-integer Gini (basis points) are "
    "computed over that cardinality-bounded table — the decision input "
    "for salting, AQE skew-join thresholds, and bucket counts.",
)


# ---------------------------------------------------------------------------
# Embedding-distribution drift monitor (per-cluster centroid drift)
# ---------------------------------------------------------------------------
# Embedding pipelines silently rot: a model update, a tokenizer change,
# or an upstream corpus shift moves the distribution, and every index /
# dedup threshold calibrated on the old geometry degrades.  The standard
# guard is a per-cluster CENTROID DRIFT report between two snapshots —
# here the deterministic vec_id-parity split stands in for
# yesterday/today.  All arithmetic exact-integer: embeddings are milli-
# quantized THEN SHIFTED +2000 so every value, sum, and mean is strictly
# positive — integer mean (1000*sum) DIV n is then identical in Spark
# (truncates toward zero) and DuckDB (floors), the parity trap that
# decides whether negative coordinates hash-match; the shift cancels in
# the |meanA - meanB| drift.  Scale shape: ONE map-side-combined
# (label, half, dim) aggregation reduces the corpus to a
# clusters x 2 x 64 cell table; the pairing join and rollup run on that
# bounded table.
_sql_query(
    "sim_centroid_drift_monitor",
    """
    WITH e AS (
        SELECT vec_id, label, vec_id % 2 AS half,
               transform(embedding,
                   x -> cast(round(cast(x AS double) * 1000) AS bigint) + 2000) AS v
        FROM embeddings
    ),
    rows_ AS (SELECT label, half, posexplode(v) AS (d, x) FROM e),
    means AS (
        SELECT label, half, d, (1000 * sum(x)) DIV count(*) AS m_micro, count(*) AS n
        FROM rows_ GROUP BY label, half, d
    ),
    paired AS (
        SELECT a.label, a.d, a.m_micro AS ma, b.m_micro AS mb, a.n AS na, b.n AS nb
        FROM (SELECT * FROM means WHERE half = 0) a
        JOIN (SELECT * FROM means WHERE half = 1) b ON a.label = b.label AND a.d = b.d
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(min(na) AS BIGINT) AS n_ref, CAST(min(nb) AS BIGINT) AS n_cand,
           CAST(sum(abs(ma - mb)) AS BIGINT) AS l1_drift_micro,
           CAST(max(abs(ma - mb)) AS BIGINT) AS max_dim_drift_micro
    FROM paired GROUP BY label ORDER BY label
    """,
    oracle="""
    WITH e AS (
        SELECT vec_id, label, vec_id % 2 AS half,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) + 2000 FOR x IN embedding] AS v
        FROM embeddings
    ),
    rows_ AS (
        SELECT label, half, d - 1 AS d, v[d] AS x
        FROM e, unnest(generate_series(1, 64)) AS t(d)
    ),
    means AS (
        SELECT label, half, d, (1000 * sum(x)) // count(*) AS m_micro, count(*) AS n
        FROM rows_ GROUP BY label, half, d
    ),
    paired AS (
        SELECT a.label, a.d, a.m_micro AS ma, b.m_micro AS mb, a.n AS na, b.n AS nb
        FROM (SELECT * FROM means WHERE half = 0) a
        JOIN (SELECT * FROM means WHERE half = 1) b ON a.label = b.label AND a.d = b.d
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(min(na) AS BIGINT) AS n_ref, CAST(min(nb) AS BIGINT) AS n_cand,
           CAST(sum(abs(ma - mb)) AS BIGINT) AS l1_drift_micro,
           CAST(max(abs(ma - mb)) AS BIGINT) AS max_dim_drift_micro
    FROM paired GROUP BY label ORDER BY label
    """,
    tags=("pipeline", "similarity", "eval"),
    doc="Per-cluster centroid drift between two corpus snapshots (vec_id-"
    "parity split): ONE map-side-combined (label, half, dim) aggregation "
    "reduces the corpus to a bounded cell table; exact-integer micro-unit "
    "means via the +2000 positivity shift (making Spark's truncating DIV "
    "and DuckDB's flooring // agree), L1 and max-dim drift per cluster.",
)


# ---------------------------------------------------------------------------
# Exact distributed quantiles (the bounded-domain histogram reduction)
# ---------------------------------------------------------------------------
# approx_percentile/qdigest trade accuracy for mergeability; but when the
# value domain is BOUNDED (integer quantities, cent-quantized money,
# milli-unit scores) exact quantiles are cheap at any corpus size: ONE
# map-side-combined (measure, value) groupBy reduces the corpus to its
# value histogram — whose size is the DISTINCT-VALUE cardinality (for
# TPC-H prices at cent granularity that is bounded by the ~5.5e6
# representable cent values, independent of row count) — then a
# cumulative window over the histogram and a 3-row broadcast quantile
# probe pick the type-1 (lower) quantile: smallest v with
# cum(v)*1000 >= q*N, all-integer, no interpolation, deterministic.
# This is the same reduction text_perplexity_bucket uses for its tercile
# cuts, promoted to a first-class aggregate with multiple measures.
_sql_query(
    "agg_exact_quantiles",
    # r13/r14 Spark-side shape (results identical to the oracle text
    # below): (a) each measure aggregates to its value histogram BEFORE
    # the union, so the exchange carries (val, cnt) — never the constant
    # measure string per corpus row; (b) r14: the per-measure total rides
    # a second window over the SAME measure-keyed exchange as the
    # running sum (the r13 groupBy+join form re-inlined the whole hist
    # subtree — Catalyst does not materialize CTEs — costing a duplicate
    # scan+aggregate of BOTH corpus tables and 3 extra exchanges).
    """
    WITH m1h AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS val,
                        count(*) AS cnt
                 FROM orders GROUP BY 1),
    m2h AS (SELECT CAST(l_quantity AS BIGINT) AS val, count(*) AS cnt
            FROM lineitem GROUP BY 1),
    hist AS (SELECT 'orders.o_totalprice_cents' AS measure, val, cnt FROM m1h
             UNION ALL
             SELECT 'lineitem.l_quantity' AS measure, val, cnt FROM m2h),
    cum AS (
        SELECT measure, val, cnt,
               sum(cnt) OVER (PARTITION BY measure ORDER BY val) AS cum_cnt,
               sum(cnt) OVER (PARTITION BY measure) AS n
        FROM hist
    ),
    qs AS (SELECT explode(array(500, 900, 990)) AS q_milli),
    pick AS (
        SELECT c.measure, q.q_milli, c.n,
               min(c.val) AS quantile_value
        FROM cum c JOIN qs q
          ON c.cum_cnt * 1000 >= q.q_milli * c.n
        GROUP BY c.measure, q.q_milli, c.n
    )
    SELECT measure, CAST(q_milli AS BIGINT) AS q_milli, CAST(n AS BIGINT) AS n,
           CAST(quantile_value AS BIGINT) AS quantile_value
    FROM pick ORDER BY measure, q_milli
    """,
    oracle="""
    WITH m1 AS (SELECT 'orders.o_totalprice_cents' AS measure,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS val FROM orders),
    m2 AS (SELECT 'lineitem.l_quantity' AS measure, CAST(l_quantity AS BIGINT) AS val FROM lineitem),
    m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
    hist AS (SELECT measure, val, count(*) AS cnt FROM m GROUP BY measure, val),
    cum AS (
        SELECT measure, val, cnt,
               sum(cnt) OVER (PARTITION BY measure ORDER BY val) AS cum_cnt,
               sum(cnt) OVER (PARTITION BY measure) AS n
        FROM hist
    ),
    qs AS (SELECT unnest([500, 900, 990]) AS q_milli),
    pick AS (
        SELECT c.measure, q.q_milli, c.n,
               min(c.val) AS quantile_value
        FROM cum c JOIN qs q
          ON c.cum_cnt * 1000 >= q.q_milli * c.n
        GROUP BY c.measure, q.q_milli, c.n
    )
    SELECT measure, CAST(q_milli AS BIGINT) AS q_milli, CAST(n AS BIGINT) AS n,
           CAST(quantile_value AS BIGINT) AS quantile_value
    FROM pick ORDER BY measure, q_milli
    """,
    tags=("pipeline", "aggregates", "quantiles"),
    bench=True,  # r7: the exact-quantile histogram reduction profile
    doc="Exact p50/p90/p99 over bounded-domain measures: ONE map-side-"
    "combined (measure, value) groupBy reduces the corpus to its value "
    "histogram (distinct-value-cardinality-sized, corpus-size-"
    "independent for quantized domains), cumulative window + 3-row "
    "broadcast probe picks the type-1 lower quantile all-integer.",
)


# ---------------------------------------------------------------------------
# Binary-signature Hamming retrieval (sign binarization, ITQ/sketch family)
# ---------------------------------------------------------------------------
# The most compact retrieval path there is: binarize each embedding to its
# 64 sign bits and rank by Hamming distance — 8 bytes per vector instead
# of 256, distances via XOR + popcount (whole-stage-codegen integer ops,
# no float math at all), and sign-bit Hamming is a monotone estimator of
# angular distance (Charikar 2002, the same guarantee the sign-LSH
# blockings build on).  At 100 TB this is the difference between shipping
# 100 TB of floats and ~3 TB of signatures through the probe scan: the
# signature column is ONE codegen'd projection riding the corpus scan,
# the 8-row probe set broadcasts, and the top-k is WindowGroupLimit-
# pruned.  Signatures are stored as TWO 32-bit words — bit 63 of a packed
# 64-bit word overflows DuckDB's checked left-shift while Spark wraps
# silently, exactly the cross-engine trap the split avoids.
_sql_query(
    "sim_binary_hamming_topk",
    """
    WITH e AS (
        SELECT vec_id,
               transform(embedding, x -> cast(round(cast(x AS double) * 1000) AS bigint)) AS v
        FROM embeddings
    ),
    sig AS (
        SELECT vec_id,
               aggregate(sequence(1, 32), cast(0 AS bigint),
                   (acc, d) -> acc + IF(element_at(v, d) >= 0, shiftleft(cast(1 AS bigint), d - 1), 0)) AS s_lo,
               aggregate(sequence(33, 64), cast(0 AS bigint),
                   (acc, d) -> acc + IF(element_at(v, d) >= 0, shiftleft(cast(1 AS bigint), d - 33), 0)) AS s_hi
        FROM e
    ),
    q AS (SELECT * FROM sig WHERE vec_id < 8),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               bit_count(q.s_lo ^ c.s_lo) + bit_count(q.s_hi ^ c.s_hi) AS hamming
        FROM q JOIN sig c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, hamming,
               row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, CAST(hamming AS BIGINT) AS hamming
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
    oracle="""
    WITH e AS (
        SELECT vec_id, [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) FOR x IN embedding] AS v
        FROM embeddings
    ),
    sig AS (
        SELECT vec_id,
               CAST(list_sum([CASE WHEN v[d] >= 0 THEN (1::BIGINT << (d - 1)) ELSE 0 END
                              FOR d IN generate_series(1, 32)]) AS BIGINT) AS s_lo,
               CAST(list_sum([CASE WHEN v[d] >= 0 THEN (1::BIGINT << (d - 33)) ELSE 0 END
                              FOR d IN generate_series(33, 64)]) AS BIGINT) AS s_hi
        FROM e
    ),
    q AS (SELECT * FROM sig WHERE vec_id < 8),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               bit_count(xor(q.s_lo, c.s_lo)) + bit_count(xor(q.s_hi, c.s_hi)) AS hamming
        FROM q JOIN sig c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, hamming,
               row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id, CAST(hamming AS BIGINT) AS hamming
    FROM ranked WHERE rk <= 5 ORDER BY query_id, rk
    """,
    tags=("pipeline", "similarity"),
    bench=True,  # r7: 8-byte-signature retrieval, the compact-scan profile
    doc="Sign-binarized Hamming top-k (Charikar 2002 angular-distance "
    "estimator): 64 sign bits per vector packed into two 32-bit words "
    "(bit 63 of one word overflows DuckDB's checked shift — the split "
    "keeps both engines exact), distance = XOR + popcount in pure "
    "codegen'd integer ops, 8-byte signatures instead of 256-byte "
    "floats through the broadcast probe scan, WindowGroupLimit top-5.",
)


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick — Weinberger et al., ICML 2009)
# ---------------------------------------------------------------------------
# The cheapest corpus-scale document featurizer there is, and the front
# end of every "train a linear classifier over 100 TB of text" pipeline
# (including text_classifier_filter's serving side): hash each token
# into a FIXED 64-bucket feature space with a second hash bit choosing
# the sign (the debiasing trick that makes the hashed inner product an
# unbiased estimator of the original).  No vocabulary is ever built —
# the model dimension is corpus-size-independent by construction, the
# property that separates this from TF-IDF's distinct-term space.
# Scale shape: ONE tokenize scan -> one map-side-combined (doc, feature)
# groupBy in a 64-wide domain -> one doc-keyed rollup; everything
# exact-integer (signed counts; the checksum's % keeps the dividend's
# sign in BOTH engines — Java and C semantics agree — so negative
# position-weighted sums hash identically).
_sql_query(
    "text_feature_hashing",
    """
    WITH tok AS (
        SELECT doc_id, w
        FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
    ),
    wh AS (
        SELECT doc_id,
               aggregate(split(w, ''), 7L, (a, c) -> (a * 31 + ascii(c)) % 1000000007) AS h
        FROM tok
    ),
    feat AS (
        SELECT doc_id, h % 64 AS f,
               CASE WHEN (h DIV 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM wh
    ),
    vec AS (
        SELECT doc_id, f, sum(sgn) AS v
        FROM feat GROUP BY doc_id, f
    ),
    docvec AS (
        SELECT doc_id,
               count(CASE WHEN v <> 0 THEN 1 END) AS nnz,
               sum(v * v) AS norm2,
               sum((f + 1) * v) % 1000000007 AS checksum
        FROM vec GROUP BY doc_id
    )
    SELECT doc_id, CAST(nnz AS BIGINT) AS nnz, CAST(norm2 AS BIGINT) AS norm2,
           CAST(checksum AS BIGINT) AS checksum
    FROM docvec ORDER BY doc_id
    """,
    oracle="""
    WITH tok AS (
        SELECT doc_id, w
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
             LATERAL (SELECT unnest(ws) AS w) t
    ),
    wh AS (
        SELECT doc_id,
               list_reduce(list_prepend(7::BIGINT,
                   [ascii(c)::BIGINT for c in string_split(w, '')]),
                   (a, b) -> (a * 31 + b) % 1000000007) AS h
        FROM tok
    ),
    feat AS (
        SELECT doc_id, h % 64 AS f,
               CASE WHEN (h // 64) % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM wh
    ),
    vec AS (
        SELECT doc_id, f, sum(sgn) AS v
        FROM feat GROUP BY doc_id, f
    ),
    docvec AS (
        SELECT doc_id,
               count(CASE WHEN v <> 0 THEN 1 END) AS nnz,
               sum(v * v) AS norm2,
               sum((f + 1) * v) % 1000000007 AS checksum
        FROM vec GROUP BY doc_id
    )
    SELECT doc_id, CAST(nnz AS BIGINT) AS nnz, CAST(norm2 AS BIGINT) AS norm2,
           CAST(checksum AS BIGINT) AS checksum
    FROM docvec ORDER BY doc_id
    """,
    tags=("pipeline", "text", "featurize"),
    doc="Signed feature hashing (Weinberger et al. 2009): tokens hashed "
    "into a fixed 64-bucket space with a second-hash sign bit (unbiased "
    "hashed inner products, no vocabulary ever built — model dimension "
    "corpus-size-independent); one tokenize scan, one map-side-combined "
    "(doc, feature) groupBy, one doc-keyed rollup, all exact-integer.",
)


# ---------------------------------------------------------------------------
# Edit-distance near-dup join (PassJoin-style segment blocking, k = 2)
# ---------------------------------------------------------------------------
# The fourth classic near-dup detector (after MinHash, SimHash, n-gram
# Jaccard): find document pairs within Levenshtein distance 2 — the
# right tool when duplicates are single-character OCR/typo/template
# mutations that token-level shingles wash out.  All-pairs Levenshtein
# is O(n² · len²) and unshippable; the scale shape here is PassJoin's
# (Li, Deng, Feng 2011) segment blocking, which is COMPLETE, not
# heuristic: every indexed doc of length Ls is split into k+1 = 3
# contiguous segments; by pigeonhole, any doc r with ed(r, s) <= 2
# leaves at least one segment untouched, and an untouched segment can
# shift in r by at most the k = 2 net indels before it — so probing
# every substring of r at the segment's home position ±2, for every
# target length Ls in [len(r)-2, len(r)+2], is guaranteed to surface
# the pair.  Per doc that is a CONSTANT <= 5·3·5 = 75 probe substrings
# (independent of corpus size); the candidate join is an equi-join on
# (target_length, segment_index, segment_text); exact levenshtein()
# (JVM codegen in Spark, native in DuckDB) verifies only the surviving
# candidates.  Like the n-gram op's hot-shingle cap: a corpus with a
# shared boilerplate segment fattens one join key, so segments whose
# (length, index, text) key appears in more than _HOT_SEGMENT_CAP
# documents are EXCLUDED from the index (one window count over the join
# key — the same shuffle key, no extra scan), bounding candidates per
# probe to the cap.  CONTRACT: a pair within ed <= 2 is missed only if
# every one of its shared untouched segments is hot, i.e. the pair is
# itself mass-boilerplate (dedup_exact's territory); measured fixture
# headroom: max key frequency = 2 at sf0.1, cap = 64 — it cannot fire
# on the standard fixtures, and the boilerplate fixture test pins both
# the candidate bound and the injected-near-dup recall.
# Near-dup signal is injected the same way dedup_exact injects copies:
# every doc_id % 50 == 0 re-enters under id + 10000000 with one
# substituted character (ed = 1, or 0 on the rare same-char collision).
# test_edit_distance_blocking_is_complete independently re-derives the
# full pair set with banded brute-force DP over the sf0.01 corpus.
_HOT_SEGMENT_CAP = 64

_sql_query(
    "dedup_edit_distance",
    f"""
    WITH corpus AS (
        SELECT doc_id, text, length(text) AS L FROM documents
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id,
               concat(substring(text, 1, 2), 'Z', substring(text, 4)) AS text,
               length(text) AS L
        FROM documents WHERE doc_id % 50 = 0
    ),
    idx0 AS (
        SELECT doc_id, L, i,
               substring(text,
                   CASE i WHEN 0 THEN 1 WHEN 1 THEN L DIV 3 + 1
                          ELSE L DIV 3 + (L - L DIV 3) DIV 2 + 1 END,
                   CASE i WHEN 0 THEN L DIV 3 WHEN 1 THEN (L - L DIV 3) DIV 2
                          ELSE L - L DIV 3 - (L - L DIV 3) DIV 2 END) AS piece
        FROM corpus LATERAL VIEW explode(sequence(0, 2)) t AS i
        WHERE L >= 3
    ),
    idx AS (
        SELECT doc_id, L, i, piece FROM (
            SELECT doc_id, L, i, piece,
                   count(*) OVER (PARTITION BY L, i, piece) AS kf
            FROM idx0) z
        WHERE kf <= {_HOT_SEGMENT_CAP}
    ),
    probes AS (
        SELECT rid, ls, i, substring(text, pst + dd, pln) AS piece
        FROM (
            SELECT doc_id AS rid, text, L AS lr, ls, i, dd,
                   CASE i WHEN 0 THEN 1 WHEN 1 THEN ls DIV 3 + 1
                          ELSE ls DIV 3 + (ls - ls DIV 3) DIV 2 + 1 END AS pst,
                   CASE i WHEN 0 THEN ls DIV 3 WHEN 1 THEN (ls - ls DIV 3) DIV 2
                          ELSE ls - ls DIV 3 - (ls - ls DIV 3) DIV 2 END AS pln
            FROM (SELECT doc_id, text, L, L + dl AS ls
                  FROM corpus LATERAL VIEW explode(sequence(-2, 2)) t1 AS dl)
            LATERAL VIEW explode(sequence(0, 2)) t2 AS i
            LATERAL VIEW explode(sequence(-2, 2)) t3 AS dd
        )
        WHERE ls >= 3 AND pst + dd >= 1 AND pst + dd + pln - 1 <= lr
    ),
    cand AS (
        SELECT DISTINCT least(p.rid, x.doc_id) AS d1, greatest(p.rid, x.doc_id) AS d2
        FROM probes p JOIN idx x ON x.L = p.ls AND x.i = p.i AND x.piece = p.piece
        WHERE p.rid <> x.doc_id
    )
    SELECT CAST(c.d1 AS BIGINT) AS doc1, CAST(c.d2 AS BIGINT) AS doc2,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
           CAST(a.L AS BIGINT) AS len1, CAST(b.L AS BIGINT) AS len2
    FROM cand c
    JOIN corpus a ON a.doc_id = c.d1
    JOIN corpus b ON b.doc_id = c.d2
    WHERE levenshtein(a.text, b.text) <= 2
    ORDER BY doc1, doc2
    """,
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text, length(text) AS L FROM documents
        UNION ALL
        SELECT doc_id + 10000000 AS doc_id,
               substring(text, 1, 2) || 'Z' || substring(text, 4) AS text,
               length(text) AS L
        FROM documents WHERE doc_id % 50 = 0
    ),
    idx0 AS (
        SELECT doc_id, L, i,
               substring(text,
                   CASE i WHEN 0 THEN 1 WHEN 1 THEN L // 3 + 1
                          ELSE L // 3 + (L - L // 3) // 2 + 1 END,
                   CASE i WHEN 0 THEN L // 3 WHEN 1 THEN (L - L // 3) // 2
                          ELSE L - L // 3 - (L - L // 3) // 2 END) AS piece
        FROM corpus CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) gi
        WHERE L >= 3
    ),
    idx AS (
        SELECT doc_id, L, i, piece FROM (
            SELECT doc_id, L, i, piece,
                   count(*) OVER (PARTITION BY L, i, piece) AS kf
            FROM idx0) z
        WHERE kf <= {_HOT_SEGMENT_CAP}
    ),
    probes AS (
        SELECT rid, ls, i, substring(text, pst + dd, pln) AS piece
        FROM (
            SELECT doc_id AS rid, text, L AS lr, ls, i, dd,
                   CASE i WHEN 0 THEN 1 WHEN 1 THEN ls // 3 + 1
                          ELSE ls // 3 + (ls - ls // 3) // 2 + 1 END AS pst,
                   CASE i WHEN 0 THEN ls // 3 WHEN 1 THEN (ls - ls // 3) // 2
                          ELSE ls - ls // 3 - (ls - ls // 3) // 2 END AS pln
            FROM (SELECT doc_id, text, L, L + dl AS ls
                  FROM corpus CROSS JOIN (SELECT unnest(generate_series(-2, 2)) AS dl) gdl)
            CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS i) gi
            CROSS JOIN (SELECT unnest(generate_series(-2, 2)) AS dd) gdd
        ) z
        WHERE ls >= 3 AND pst + dd >= 1 AND pst + dd + pln - 1 <= lr
    ),
    cand AS (
        SELECT DISTINCT least(p.rid, x.doc_id) AS d1, greatest(p.rid, x.doc_id) AS d2
        FROM probes p JOIN idx x ON x.L = p.ls AND x.i = p.i AND x.piece = p.piece
        WHERE p.rid <> x.doc_id
    )
    SELECT CAST(c.d1 AS BIGINT) AS doc1, CAST(c.d2 AS BIGINT) AS doc2,
           CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
           CAST(a.L AS BIGINT) AS len1, CAST(b.L AS BIGINT) AS len2
    FROM cand c
    JOIN corpus a ON a.doc_id = c.d1
    JOIN corpus b ON b.doc_id = c.d2
    WHERE levenshtein(a.text, b.text) <= 2
    ORDER BY doc1, doc2
    """,
    tags=("pipeline", "dedup"),
    doc="Edit-distance near-dup join with PassJoin segment blocking "
    "(complete for k <= 2 by pigeonhole over 3 segments, positional "
    "probes at home position ±2): <= 75 probe substrings per doc, one "
    "equi-join on (target_length, segment_index, segment_text), exact "
    "levenshtein verification on candidates only — never O(n²) pairs.",
)


# ---------------------------------------------------------------------------
# Duplicate-cluster assignment (the production "keep one per cluster" pass)
# ---------------------------------------------------------------------------
# Pair detection alone is not a dedup policy: near-dup similarity is not
# transitive, so production pipelines (e.g. the C4 / RefinedWeb / FineWeb
# recipes) take the CONNECTED COMPONENTS of the verified pair graph and
# keep one representative per component.  This op composes two already-
# verified pieces end to end: the complete prefix-filter Jaccard pair
# generator (dedup_ngram_jaccard, >= 0.9) supplies the edges, and
# min-label propagation over the checkpointed edge list assigns every
# document its component's min doc_id.  Scale shape: the pair stage is
# the prefix-filter equi-join (never O(n²)); each propagation round is
# ONE edge-keyed shuffle + min-aggregate over current labels, edges are
# materialized once, labels re-checkpoint per round (lineage cut); near-
# dup components are shallow (quasi-cliques), and the fixpoint-margin
# test pins >= 2 spare rounds at sf0.1 — the same discipline as
# graph_label_propagation/kcore.  Output covers EVERY document
# (singletons keep themselves), with cluster_size and the keep flag —
# exactly the columns the downstream "WHERE kept" filter needs.
_CLUSTER_ROUNDS = 6


def _cluster_assignment_oracle() -> str:
    from sensql_presto_spark.queries.registry import get

    pairs = get("dedup_ngram_jaccard").oracle
    return f"""
    WITH RECURSIVE pairs AS MATERIALIZED ({pairs}),
    edges AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    walk(node, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
    ),
    lab AS (SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node),
    sized AS (
        SELECT doc_id, cluster_id,
               count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        FROM lab
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           doc_id = cluster_id AS kept
    FROM sized ORDER BY doc_id
    """


@register(
    "dedup_cluster_assignment",
    oracle=_cluster_assignment_oracle(),
    tags=("pipeline", "dedup"),
    bench=True,
    doc="Near-dup cluster assignment: verified prefix-filter Jaccard "
    "pairs (>= 0.9) -> connected components via min-label propagation "
    "over checkpointed edges (one edge-keyed shuffle per round, "
    "fixpoint-margin pinned) -> per-document (cluster_id, cluster_size, "
    "kept) with the component-min doc as the kept representative; "
    "singletons keep themselves.",
)
def dedup_cluster_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    pairs = _ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    edges = (
        pairs.union(pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b")))
        .distinct()
        .toDF("u", "v")
        .localCheckpoint(eager=True)
    )
    labels = (
        catalog.table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("node"), F.col("doc_id").alias("label"))
        .localCheckpoint(eager=True)
    )
    prev_sum = None
    for _ in range(_CLUSTER_ROUNDS):
        # min(own label, labels of in-neighbors) expressed as ONE
        # union + groupBy-min — identical per-round fixpoint math to the
        # r12 join/least/coalesce form, but one exchange per round
        # instead of three (the node-sized labels side broadcasts into
        # the edge join; the old shape shuffled labels for the join, the
        # neighbor aggregate, AND the left join back).
        # r14 (VERDICT r13 #6): the checkpoint is LAZY so the convergence
        # probe's one-row aggregate is the job that materializes it —
        # 1 Spark job per round instead of 2 (checkpoint job + probe job;
        # the probe computes every partition, so the full relation is
        # persisted exactly as the eager form did).
        labels = (
            labels.union(
                edges.join(labels, edges.u == labels.node).select(
                    F.col("v").alias("node"), F.col("label")
                )
            )
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        # Early fixpoint exit (r13): labels are monotone non-increasing
        # (new = min(own, neighbors) <= own), so an unchanged label sum
        # proves NO label moved and every remaining round is a no-op —
        # the result is bit-identical to always running _CLUSTER_ROUNDS
        # rounds, at any scale (converged: identical by fixpoint;
        # not converged within the cap: both run the full cap).  The
        # probe is a 1-row aggregate over the just-checkpointed
        # node-sized relation — a scalar driver fetch, the standard
        # iterate-until-convergence discipline, never a data collect.
        # At sf0.001/0.01/0.1 the pair graph converges after round 1
        # (near-dup clusters are diameter-1 stars), so this runs 2
        # rounds instead of 6.
        round_sum = labels.agg(F.sum("label")).collect()[0][0]
        if round_sum == prev_sum:
            break
        prev_sum = round_sum
    sized = labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.count("*").over(Window.partitionBy("label")).alias("cluster_size"),
    )
    return sized.select(
        F.col("doc_id").cast("long"),
        F.col("cluster_id").cast("long"),
        F.col("cluster_size").cast("long"),
        (F.col("doc_id") == F.col("cluster_id")).alias("kept"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# IVF multiprobe (nprobe = 2) — the standard ANN recall/latency knob
# ---------------------------------------------------------------------------
# sim_ivf_topk searches only each query's single nearest cell (nprobe=1);
# every production IVF index (Faiss IVFFlat, ScaNN, Milvus) exposes
# nprobe as THE recall dial because the true neighbors of a query near a
# cell boundary live in the second-closest cell.  This op is the same
# verified machinery with the probe side widened: corpus vectors stay
# single-assigned (the index is unchanged), queries rank centroids and
# search the UNION of their top-2 cells.  Scale shape is identical to
# sim_ivf_topk — centroids are a bounded broadcast relation, the search
# join touches only the probed cells' rows (2x nprobe=1's work, still
# cell-pruned, never the whole corpus), ONE corpus scan.  Candidate sets
# grow monotonically with nprobe, so per-query recall@k can only
# improve; test_multiprobe_recall_dominates_single_probe pins that
# against sim_topk_bruteforce ground truth.
_sql_query(
    "sim_ivf_multiprobe",
    """
    WITH e AS (SELECT vec_id, label, transform(embedding, x -> cast(x AS double)) AS v FROM embeddings),
    cpos AS (
        SELECT label, pos, avg(val) AS m
        FROM (SELECT label, posexplode(v) AS (pos, val) FROM e)
        GROUP BY label, pos
    ),
    cent AS (
        SELECT label AS c_id,
               transform(array_sort(collect_list(struct(pos, m))), s -> s.m) AS cv
        FROM cpos GROUP BY label
    ),
    cnorm AS (SELECT c_id, cv, sqrt(aggregate(cv, cast(0 AS double), (a, x) -> a + x * x)) AS cnrm FROM cent),
    n AS (SELECT vec_id, v, sqrt(aggregate(v, cast(0 AS double), (a, x) -> a + x * x)) AS nrm FROM e),
    centdist AS (
        SELECT n.vec_id, c.c_id,
               aggregate(zip_with(n.v, c.cv, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (n.nrm * c.cnrm) AS cos
        FROM n CROSS JOIN cnorm c
    ),
    assign AS (
        SELECT vec_id, max_by(c_id, cos) AS bucket FROM centdist GROUP BY vec_id
    ),
    corpus AS (SELECT n.vec_id, n.v, n.nrm, a.bucket FROM n JOIN assign a ON n.vec_id = a.vec_id),
    probe_cells AS (
        SELECT vec_id, c_id AS bucket FROM (
            SELECT vec_id, c_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS crk
            FROM centdist WHERE vec_id < 5
        ) WHERE crk <= 2
    ),
    q AS (SELECT p.vec_id, p.bucket, n.v, n.nrm
          FROM probe_cells p JOIN n ON n.vec_id = p.vec_id),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               aggregate(zip_with(q.v, c.v, (x, y) -> x * y), cast(0 AS double),
                         (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cos
        FROM q JOIN corpus c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, rk, round(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 3
    ORDER BY query_id, rk
    """,
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cpos AS (
        SELECT label, i AS pos, avg(v[i]) AS m
        FROM e, range(1, 65) t(i)
        GROUP BY label, i
    ),
    cent AS (SELECT label AS c_id, list(m ORDER BY pos) AS cv FROM cpos GROUP BY label),
    centdist AS (
        SELECT e.vec_id, c.c_id, list_cosine_similarity(e.v, c.cv) AS cos
        FROM e CROSS JOIN cent c
    ),
    assign AS (
        SELECT vec_id, arg_max(c_id, cos) AS bucket FROM centdist GROUP BY vec_id
    ),
    corpus AS (SELECT e.vec_id, e.v, a.bucket FROM e JOIN assign a ON e.vec_id = a.vec_id),
    probe_cells AS (
        SELECT vec_id, c_id AS bucket FROM (
            SELECT vec_id, c_id,
                   row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS crk
            FROM centdist WHERE vec_id < 5
        ) z WHERE crk <= 2
    ),
    q AS (SELECT p.vec_id, p.bucket, e.v
          FROM probe_cells p JOIN e ON e.vec_id = p.vec_id),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_cosine_similarity(q.v, c.v) AS cos
        FROM q JOIN corpus c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        FROM scored
    )
    SELECT query_id, neighbor_id, rk, round(cos, 4) AS cos_sim
    FROM ranked WHERE rk <= 3
    ORDER BY query_id, rk
    """,
    tags=("pipeline", "similarity"),
    doc="IVF top-k with nprobe=2 (the Faiss/ScaNN recall dial): corpus "
    "stays single-assigned, each query searches the union of its two "
    "nearest cells — 2x the cell-pruned work of nprobe=1, ONE corpus "
    "scan, candidate sets grow monotonically so recall@k only improves.",
)


# ---------------------------------------------------------------------------
# BPE encode (tokenizer serving: apply the trained merges to the corpus)
# ---------------------------------------------------------------------------
# text_bpe_train_rounds is the training half of the tokenizer story;
# this is the serving half every data pipeline actually runs at scale:
# apply the learned merge table to the corpus and report per-document
# token counts — the number that drives sequence packing, cost
# estimation, and context-length filtering.  The encode pass reuses the
# exact training machinery (same separator scheme, same greedy
# left-to-right merge order, same per-round data-derived top pair), so
# the merges applied ARE the merges trained; the output is one row per
# document with exact-integer char/token counts before and after, and
# compression in basis points.  Scale shape: the working corpus is
# checkpointed between rounds (linear, zero re-derivation, the same
# discipline as training) and the final rollup is ONE map-side-combined
# doc_id groupBy.  Words under 2 chars are excluded by the same corpus
# rule as training (each is trivially a single token).
_BPE_ENCODE_ROLLUP_SQL = """
    SELECT b.doc_id,
           CAST(b.n_words AS BIGINT) AS n_words,
           CAST(b.toks AS BIGINT) AS tokens_before,
           CAST(a.toks AS BIGINT) AS tokens_after
    FROM (SELECT doc_id, count(*) AS n_words,
                 sum(size(split(substring(s, 2, length(s) - 2), '··'))) AS toks
          FROM {B} GROUP BY doc_id) b
    JOIN (SELECT doc_id,
                 sum(size(split(substring(s, 2, length(s) - 2), '··'))) AS toks
          FROM {A} GROUP BY doc_id) a
      ON a.doc_id = b.doc_id
"""


def _bpe_encode_oracle() -> str:
    # the corp0..corp3 construction is shared verbatim with _bpe_oracle's
    # prefix; only the final per-document rollup differs
    base = _bpe_oracle()
    prefix = base[: base.index("    summary AS (")]
    return (
        prefix
        + f"""
    rollup_ AS (
        SELECT b.doc_id, b.n_words, b.toks AS tokens_before, a.toks AS tokens_after
        FROM (SELECT doc_id, count(*) AS n_words,
                     sum(len(string_split(substring(s, 2, length(s) - 2), '··'))) AS toks
              FROM corp0 GROUP BY doc_id) b
        JOIN (SELECT doc_id,
                     sum(len(string_split(substring(s, 2, length(s) - 2), '··'))) AS toks
              FROM corp{_BPE_ROUNDS} GROUP BY doc_id) a
          ON a.doc_id = b.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(tokens_before AS BIGINT) AS tokens_before,
           CAST(tokens_after AS BIGINT) AS tokens_after,
           CAST(((tokens_before - tokens_after) * 10000) // tokens_before AS BIGINT) AS saved_bp
    FROM rollup_ ORDER BY doc_id
    """
    )


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("pipeline", "text", "tokenizer"),
    doc="Tokenizer serving: apply the 3 trained BPE merges to the corpus "
    "and emit per-document exact-integer token counts before/after plus "
    "compression in basis points — one checkpointed rewrite chain (same "
    "machinery as training), ONE doc-keyed rollup groupBy.",
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    catalog.register_views(spark, sf_dir)
    corp = spark.sql(_BPE_CORP0_SQL).localCheckpoint(eager=True)
    corp.createOrReplaceTempView("__bpee_corp0")
    for r in range(1, _BPE_ROUNDS + 1):
        nxt = spark.sql(_BPE_ROUND_SQL.format(P=f"__bpee_corp{r - 1}")).localCheckpoint(eager=True)
        nxt.createOrReplaceTempView(f"__bpee_corp{r}")
    rolled = spark.sql(
        _BPE_ENCODE_ROLLUP_SQL.format(B="__bpee_corp0", A=f"__bpee_corp{_BPE_ROUNDS}")
    )
    return rolled.selectExpr(
        "doc_id",
        "n_words",
        "tokens_before",
        "tokens_after",
        "CAST(((tokens_before - tokens_after) * 10000) DIV tokens_before AS BIGINT) AS saved_bp",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Per-column data-profile report (the data-quality primitive)
# ---------------------------------------------------------------------------
# Every ingestion pipeline fronts its tables with a profiling pass —
# null ratios, distinct cardinality, value ranges, width — both for
# data-quality gates (a column going 30% NULL overnight is an incident)
# and as optimizer input (the same statistics ANALYZE feeds the CBO).
# This op emits the report as rows, one per profiled column, over ONE
# scan of orders: all per-column aggregates (including the four exact
# count-DISTINCTs, which Catalyst plans as a single Expand + two-phase
# aggregate) reduce in one pass to a 1-row relation, and stack() pivots
# it to the per-column report — no per-column rescans, which is the
# difference between a profiling pass that costs one table read and one
# that costs C of them at 100 TB.  Exact integers throughout: money is
# profiled in cents, average widths in centi-chars via DIV.
_sql_query(
    "scale_data_profile",
    """
    WITH base AS (
        SELECT o_custkey, o_orderdate, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders
    ),
    p AS (
        SELECT count(*) AS n_rows,
               count(o_custkey) AS nn1, count(DISTINCT o_custkey) AS nd1,
               CAST(min(o_custkey) AS STRING) AS mn1, CAST(max(o_custkey) AS STRING) AS mx1,
               sum(length(CAST(o_custkey AS STRING))) AS sl1,
               count(price_c) AS nn2, count(DISTINCT price_c) AS nd2,
               CAST(min(price_c) AS STRING) AS mn2, CAST(max(price_c) AS STRING) AS mx2,
               sum(length(CAST(price_c AS STRING))) AS sl2,
               count(o_orderdate) AS nn3, count(DISTINCT o_orderdate) AS nd3,
               CAST(min(o_orderdate) AS STRING) AS mn3, CAST(max(o_orderdate) AS STRING) AS mx3,
               sum(length(CAST(o_orderdate AS STRING))) AS sl3,
               count(o_orderpriority) AS nn4, count(DISTINCT o_orderpriority) AS nd4,
               min(o_orderpriority) AS mn4, max(o_orderpriority) AS mx4,
               sum(length(o_orderpriority)) AS sl4
        FROM base
    )
    SELECT col,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nonnull AS BIGINT) AS n_nonnull,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           min_val, max_val,
           CAST((sum_len * 100) DIV n_nonnull AS BIGINT) AS avg_len_e2
    FROM (
        SELECT n_rows, stack(4,
            'o_custkey',       nn1, nd1, mn1, mx1, sl1,
            'o_totalprice_c',  nn2, nd2, mn2, mx2, sl2,
            'o_orderdate',     nn3, nd3, mn3, mx3, sl3,
            'o_orderpriority', nn4, nd4, mn4, mx4, sl4
        ) AS (col, n_nonnull, n_distinct, min_val, max_val, sum_len)
        FROM p
    )
    ORDER BY col
    """,
    oracle="""
    WITH base AS (
        SELECT o_custkey, o_orderdate, o_orderpriority,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders
    ),
    p AS (
        SELECT count(*) AS n_rows,
               count(o_custkey) AS nn1, count(DISTINCT o_custkey) AS nd1,
               CAST(min(o_custkey) AS VARCHAR) AS mn1, CAST(max(o_custkey) AS VARCHAR) AS mx1,
               sum(length(CAST(o_custkey AS VARCHAR))) AS sl1,
               count(price_c) AS nn2, count(DISTINCT price_c) AS nd2,
               CAST(min(price_c) AS VARCHAR) AS mn2, CAST(max(price_c) AS VARCHAR) AS mx2,
               sum(length(CAST(price_c AS VARCHAR))) AS sl2,
               count(o_orderdate) AS nn3, count(DISTINCT o_orderdate) AS nd3,
               CAST(min(o_orderdate) AS VARCHAR) AS mn3, CAST(max(o_orderdate) AS VARCHAR) AS mx3,
               sum(length(CAST(o_orderdate AS VARCHAR))) AS sl3,
               count(o_orderpriority) AS nn4, count(DISTINCT o_orderpriority) AS nd4,
               min(o_orderpriority) AS mn4, max(o_orderpriority) AS mx4,
               sum(length(o_orderpriority)) AS sl4
        FROM base
    ),
    rep AS (
        SELECT 'o_custkey' AS col, n_rows, nn1 AS n_nonnull, nd1 AS n_distinct,
               mn1 AS min_val, mx1 AS max_val, sl1 AS sum_len FROM p
        UNION ALL
        SELECT 'o_totalprice_c', n_rows, nn2, nd2, mn2, mx2, sl2 FROM p
        UNION ALL
        SELECT 'o_orderdate', n_rows, nn3, nd3, mn3, mx3, sl3 FROM p
        UNION ALL
        SELECT 'o_orderpriority', n_rows, nn4, nd4, mn4, mx4, sl4 FROM p
    )
    SELECT col,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_nonnull AS BIGINT) AS n_nonnull,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           min_val, max_val,
           CAST((sum_len * 100) // n_nonnull AS BIGINT) AS avg_len_e2
    FROM rep ORDER BY col
    """,
    tags=("pipeline", "scale", "quality"),
    doc="Per-column profiling report (null/nonnull counts, exact distinct "
    "cardinality, min/max, centi-char average width) over ONE scan of "
    "orders — stack() pivots a single multi-distinct aggregate row into "
    "the per-column report instead of rescanning per column; money "
    "profiled in cents, all arithmetic exact-integer.",
)


# ---------------------------------------------------------------------------
# Matryoshka truncated-dimension retrieval eval (adaptive retrieval)
# ---------------------------------------------------------------------------
# Matryoshka representation learning (Kusupati et al. 2022) trains
# embeddings whose PREFIX dimensions are themselves usable vectors, and
# adaptive-retrieval stacks exploit that: retrieve with the cheap head
# (here 16 of 64 dims — 4x less compute and bandwidth per comparison),
# keeping the full vector only for rerank.  Before shipping that, you
# measure what the truncation costs — this op computes, per probe, the
# top-3 agreement between head-dims retrieval and full-dims retrieval.
# Scoring is exact-integer MIPS (milli-quantized BIGINT dot products, no
# division, ties broken by neighbor id) so both engines rank identically
# bit-for-bit.  Scale shape: 8 probes broadcast against ONE corpus scan
# (the same bounded-broadcast shape as sim_topk_bruteforce); the head
# score reuses the same row via slice(), not a second scan; the
# agreement rollup touches O(probes x k) rows.
_sql_query(
    "sim_matryoshka_eval",
    """
    WITH e AS (
        SELECT vec_id,
               transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
    scored AS (
        SELECT q.qid, e.vec_id AS nid,
               aggregate(zip_with(q.qv, e.v, (x, y) -> x * y), 0L, (a, x) -> a + x) AS dot_full,
               aggregate(zip_with(slice(q.qv, 1, 16), slice(e.v, 1, 16), (x, y) -> x * y),
                         0L, (a, x) -> a + x) AS dot_head
        FROM e CROSS JOIN q
        WHERE q.qid <> e.vec_id
    ),
    rf AS (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY dot_full DESC, nid) AS rk
        FROM scored
    ),
    rh AS (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY dot_head DESC, nid) AS rk
        FROM scored
    )
    SELECT f.qid AS query_id,
           CAST(min(CASE WHEN f.rk = 1 THEN f.nid END) AS BIGINT) AS top1_full,
           CAST(min(CASE WHEN h2.rk = 1 THEN h2.nid END) AS BIGINT) AS top1_head,
           CAST(count(h.nid) AS BIGINT) AS overlap3,
           CAST((count(h.nid) * 10000) DIV 3 AS BIGINT) AS agreement_bp
    FROM (SELECT * FROM rf WHERE rk <= 3) f
    LEFT JOIN (SELECT * FROM rh WHERE rk <= 3) h ON h.qid = f.qid AND h.nid = f.nid
    JOIN (SELECT * FROM rh WHERE rk <= 3) h2 ON h2.qid = f.qid AND h2.rk = f.rk
    GROUP BY f.qid
    ORDER BY query_id
    """,
    oracle="""
    WITH e AS (
        SELECT vec_id,
               [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) for x in embedding] AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 8),
    scored AS (
        SELECT q.qid, e.vec_id AS nid,
               (SELECT sum(q.qv[i] * e.v[i]) FROM range(1, 65) t(i)) AS dot_full,
               (SELECT sum(q.qv[i] * e.v[i]) FROM range(1, 17) t(i)) AS dot_head
        FROM e CROSS JOIN q
        WHERE q.qid <> e.vec_id
    ),
    rf AS (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY dot_full DESC, nid) AS rk
        FROM scored
    ),
    rh AS (
        SELECT qid, nid,
               row_number() OVER (PARTITION BY qid ORDER BY dot_head DESC, nid) AS rk
        FROM scored
    )
    SELECT f.qid AS query_id,
           CAST(min(CASE WHEN f.rk = 1 THEN f.nid END) AS BIGINT) AS top1_full,
           CAST(min(CASE WHEN h2.rk = 1 THEN h2.nid END) AS BIGINT) AS top1_head,
           CAST(count(h.nid) AS BIGINT) AS overlap3,
           CAST((count(h.nid) * 10000) // 3 AS BIGINT) AS agreement_bp
    FROM (SELECT * FROM rf WHERE rk <= 3) f
    LEFT JOIN (SELECT * FROM rh WHERE rk <= 3) h ON h.qid = f.qid AND h.nid = f.nid
    JOIN (SELECT * FROM rh WHERE rk <= 3) h2 ON h2.qid = f.qid AND h2.rk = f.rk
    GROUP BY f.qid
    ORDER BY query_id
    """,
    tags=("pipeline", "similarity"),
    doc="Matryoshka adaptive-retrieval eval: per probe, top-3 agreement "
    "between 16-dim-head and full-64-dim retrieval under exact-integer "
    "milli-quantized MIPS (no division, id tiebreaks — bit-identical "
    "ranking in both engines); bounded probe broadcast, ONE corpus scan, "
    "head scores via slice() on the same row.",
)


# ---------------------------------------------------------------------------
# Cluster-quality evaluation (simplified silhouette, exact-integer)
# ---------------------------------------------------------------------------
# Clustering without a quality metric is a guess: silhouette — how much
# closer each point sits to its own cluster than to the nearest other
# cluster — is the standard label-free answer (Rousseeuw 1987).  Full
# silhouette is O(n²) pairwise; the production variant (and this op) is
# the SIMPLIFIED silhouette, which replaces mean-to-members with
# distance-to-centroid: per point, a = squared distance to its own
# centroid, b = min squared distance to any other centroid — O(n x k),
# never all-pairs.  Everything is exact-integer (embeddings milli-
# quantized and +2000-shifted so the centroid division is over positive
# values, trunc == floor in both engines); because the per-point margin
# b - a can be negative, the rollup emits numerator and denominator
# separately (sum_margin / sum_scale) instead of dividing — the
# documented cross-engine integer-division rule.  Scale shape: ONE
# (label, dim) centroid groupBy over the posexploded rows, ONE bounded
# join of rows against the k x 64 centroid relation, two map-side-
# combined rollups.
_sql_query(
    "cluster_silhouette_eval",
    """
    WITH e AS (
        SELECT vec_id, label,
               transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) + 2000L) AS q
        FROM embeddings
    ),
    rows_ AS (SELECT vec_id, label, posexplode(q) AS (pos, x) FROM e),
    cent AS (
        SELECT label AS c_lab, pos, (1000 * sum(x)) DIV count(*) AS c
        FROM rows_ GROUP BY label, pos
    ),
    dist AS (
        SELECT r.vec_id, r.label, c.c_lab,
               sum((r.x * 1000 - c.c) * (r.x * 1000 - c.c)) AS d2
        FROM rows_ r JOIN cent c ON c.pos = r.pos
        GROUP BY r.vec_id, r.label, c.c_lab
    ),
    ab AS (
        SELECT vec_id, label,
               min(CASE WHEN c_lab = label THEN d2 END) AS a2,
               min(CASE WHEN c_lab <> label THEN d2 END) AS b2
        FROM dist GROUP BY vec_id, label
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(b2 - a2) AS BIGINT) AS sum_margin,
           CAST(sum(greatest(a2, b2)) AS BIGINT) AS sum_scale,
           CAST(count(CASE WHEN b2 > a2 THEN 1 END) AS BIGINT) AS n_well_assigned
    FROM ab GROUP BY label ORDER BY label
    """,
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) + 2000 for x in embedding] AS q
        FROM embeddings
    ),
    rows_ AS (
        SELECT vec_id, label, i - 1 AS pos, q[i] AS x
        FROM e, range(1, 65) t(i)
    ),
    cent AS (
        SELECT label AS c_lab, pos, (1000 * sum(x)) // count(*) AS c
        FROM rows_ GROUP BY label, pos
    ),
    dist AS (
        SELECT r.vec_id, r.label, c.c_lab,
               sum((r.x * 1000 - c.c) * (r.x * 1000 - c.c)) AS d2
        FROM rows_ r JOIN cent c ON c.pos = r.pos
        GROUP BY r.vec_id, r.label, c.c_lab
    ),
    ab AS (
        SELECT vec_id, label,
               min(CASE WHEN c_lab = label THEN d2 END) AS a2,
               min(CASE WHEN c_lab <> label THEN d2 END) AS b2
        FROM dist GROUP BY vec_id, label
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(b2 - a2) AS BIGINT) AS sum_margin,
           CAST(sum(greatest(a2, b2)) AS BIGINT) AS sum_scale,
           CAST(count(CASE WHEN b2 > a2 THEN 1 END) AS BIGINT) AS n_well_assigned
    FROM ab GROUP BY label ORDER BY label
    """,
    tags=("pipeline", "cluster", "eval"),
    doc="Simplified-silhouette cluster-quality report (distance-to-"
    "centroid variant, O(n x k) not O(n^2)): per cluster, exact-integer "
    "sum of margins (b - a) and scales max(a, b) plus the well-assigned "
    "count; milli-quantized +2000-shifted arithmetic keeps both engines "
    "bit-identical, and the possibly-negative margin is never divided.",
)


# ---------------------------------------------------------------------------
# Personalized PageRank (seed-set teleport — the recommender variant)
# ---------------------------------------------------------------------------
# Global PageRank answers "what is important overall"; every production
# recommendation / related-items / trust-propagation system instead runs
# PERSONALIZED PageRank (Haveliwala 2002): the teleport mass returns to
# a seed set, so rank measures proximity to the seeds.  Same graph, same
# damping, same exact-integer quantization discipline as graph_pagerank
# (floor() before every double->BIGINT cast — DuckDB rounds, Spark
# truncates), only the teleport vector differs: seeds (node id % 150 ==
# 0, so the seed set scales with the corpus-sized web) split the full
# teleport mass; non-seeds get zero and hold rank only through in-links.
# Scale shape per round: ONE edge-join + dst-groupBy, identical to
# pagerank; the seed relation is a bounded broadcast.


def _ppr_sql(div: str) -> str:
    sql = """
    WITH params AS (
        SELECT 15 * greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS n
        FROM orders
    ),
    edges AS (
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               o_orderkey % (1 + o_custkey % 12) AS dst
        FROM orders
        WHERE o_custkey % (SELECT n FROM params)
              <> o_orderkey % (1 + o_custkey % 12)
        UNION
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params) + 1)
               % (SELECT n FROM params) AS dst
        FROM orders
    ),
    outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    seeds AS (SELECT id FROM nodes WHERE id % 150 = 0),
    ns AS (SELECT count(*) AS cnt FROM seeds),
    r0 AS (
        SELECT n.id,
               CASE WHEN s.id IS NOT NULL
                    THEN CAST(floor(1000000.0 / (SELECT cnt FROM ns)) AS BIGINT)
                    ELSE 0L END AS r
        FROM nodes n LEFT JOIN seeds s ON s.id = n.id
    ),"""
    for k in (1, 2, 3):
        sql += f"""
    r{k} AS (
        SELECT nodes.id,
               CASE WHEN s.id IS NOT NULL
                    THEN CAST(round(150000.0 / (SELECT cnt FROM ns)) AS BIGINT)
                    ELSE 0L END
               + CAST(floor(coalesce(sum(
                     CAST(floor(r{k - 1}.r * 1000.0 / outdeg.d) AS BIGINT)), 0)
                     * 85 / 100000.0) AS BIGINT) AS r
        FROM nodes
        LEFT JOIN seeds s ON s.id = nodes.id
        LEFT JOIN edges ON edges.dst = nodes.id
        LEFT JOIN r{k - 1} ON r{k - 1}.id = edges.src
        LEFT JOIN outdeg ON outdeg.src = edges.src
        GROUP BY nodes.id, s.id, (SELECT cnt FROM ns)
    ),"""
    sql += """
    ranked AS (
        SELECT id AS node_id, r AS rank_micro,
               row_number() OVER (ORDER BY r DESC, id) AS rk
        FROM r3
    )
    SELECT node_id, rank_micro, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 100 OR node_id % 150 = 0
    ORDER BY rk
    """
    if div == "duckdb":
        sql = sql.replace("0L ", "0 ").replace("ELSE 0L END", "ELSE 0 END")
    return sql


# r12 scan-guard rework (same rationale as graph_pagerank — the CTE
# form inlined to 320 orders scans under Catalyst): staged skewed web +
# checkpoint-per-round; the oracle keeps the verbatim all-SQL text.
_PPR_R0_SQL = """
    SELECT n.id,
           CASE WHEN s.id IS NOT NULL
                THEN CAST(floor(1000000.0 / (SELECT count(*) FROM __seeds)) AS BIGINT)
                ELSE 0L END AS r
    FROM __nodes n LEFT JOIN __seeds s ON s.id = n.id
"""

_PPR_ROUND_SQL = """
    SELECT n.id,
           CASE WHEN s.id IS NOT NULL
                THEN CAST(round(150000.0 / (SELECT count(*) FROM __seeds)) AS BIGINT)
                ELSE 0L END
           + CAST(floor(coalesce(sum(
                 CAST(floor(p.r * 1000.0 / od.d) AS BIGINT)), 0)
                 * 85 / 100000.0) AS BIGINT) AS r
    FROM __nodes n
    LEFT JOIN __seeds s ON s.id = n.id
    LEFT JOIN __edges e ON e.dst = n.id
    LEFT JOIN __prev p ON p.id = e.src
    LEFT JOIN __outdeg od ON od.src = e.src
    GROUP BY n.id, s.id
"""


@register(
    "graph_personalized_pagerank",
    oracle=_ppr_sql("duckdb"),
    tags=("pipeline", "graph", "pagerank"),
    doc="Personalized PageRank (damping 0.85, 3 rounds, seed-set "
    "teleport at id % 150 == 0): rank measures proximity to the seeds — "
    "the related-items/trust-propagation variant; one edge-join + "
    "dst-groupBy per round, bounded seed broadcast, floor-quantized "
    "exact-integer contributions identical in both engines; staged "
    "skewed web + checkpoint-per-round (the final round's groupBy stays "
    "a plan so the ranking window sits above its reduction).",
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    E = _skewed_web_edges(spark, sf_dir)
    N = _skewed_web_nodes(spark, sf_dir)
    D = _skewed_web_outdeg(spark, sf_dir)
    S = _session_memo(
        spark,
        "skewed_web_seeds",
        sf_dir,
        lambda: _sql_with_views(
            spark,
            "SELECT id FROM __nodes WHERE id % 150 = 0",
            __nodes=N,
        ).localCheckpoint(eager=True),
    )
    r = _sql_with_views(spark, _PPR_R0_SQL, __nodes=N, __seeds=S)
    for k in range(3):
        r = _sql_with_views(
            spark,
            _PPR_ROUND_SQL,
            __nodes=N,
            __seeds=S,
            __edges=E,
            __outdeg=D,
            __prev=r,
        )
        if k < 2:
            r = r.localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        """
        SELECT node_id, rank_micro, CAST(rk AS BIGINT) AS rk
        FROM (SELECT id AS node_id, r AS rank_micro,
                     row_number() OVER (ORDER BY r DESC, id) AS rk
              FROM __r)
        WHERE rk <= 100 OR node_id % 150 = 0
        ORDER BY rk
        """,
        __r=r,
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance feedback (Rocchio-style query expansion over BM25)
# ---------------------------------------------------------------------------
# The classic recall lever in lexical retrieval (Rocchio 1971; standard
# in Lucene/Terrier as "RM3-lite"): run the query, assume the top
# results are relevant, mine their highest-tf-idf terms, expand the
# query, and re-rank.  Both BM25 passes reuse text_bm25_topk's
# exact-integer rational scoring verbatim (same k1/b/Lucene-idf; the idf
# numerator ln((2n+2)/(2df+1)) is provably positive since df <= n, so no
# negative value ever meets integer division); expansion terms are
# scored by sum(tf * idf_micro) over each query's top-3 round-1 docs —
# positive integer sums, no division at all — and the top-2 non-query
# terms expand the term set.  Scale shape: the posting list and doc
# lengths are materialized ONCE and feed both passes (zero re-tokenize);
# each pass is the same bounded qterms-join + map-side-combined
# (query, doc) rollup + WindowGroupLimit top-k as text_bm25_topk; the
# expansion mine touches only top-3 x queries posting rows.
_PRF_MAIN_SQL = """
    WITH tot AS (SELECT count(*) AS n, cast(sum(dl) AS BIGINT) AS s FROM {D}),
    df AS (SELECT term, count(*) AS df FROM {P} GROUP BY term),
    idf AS (
        SELECT term, df,
               cast(floor(ln((2 * (SELECT n FROM tot) + 2) / (2.0 * df + 1))
                          * 1000000 + 0.5) AS BIGINT) AS idf_micro
        FROM df
    ),
    qterms AS (
        SELECT cast(ceil(rk / 2.0) AS INT) AS query_id, term, df
        FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk FROM df)
        WHERE rk <= 6
    ),
    contrib1 AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               {DIV} (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM {P} p
        JOIN qterms q ON p.term = q.term
        JOIN {D} d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    r1 AS (
        SELECT query_id, doc_id FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sum(c_micro) DESC, doc_id) AS rk
            FROM contrib1 GROUP BY query_id, doc_id
        ) z WHERE rk <= 3
    ),
    expcand AS (
        SELECT r.query_id, p.term, sum(p.tf * i.idf_micro) AS escore
        FROM r1 r
        JOIN {P} p ON p.doc_id = r.doc_id
        JOIN idf i ON i.term = p.term
        LEFT JOIN qterms q ON q.query_id = r.query_id AND q.term = p.term
        WHERE q.term IS NULL
        GROUP BY r.query_id, p.term
    ),
    expn AS (
        SELECT query_id, term,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY escore DESC, term) AS erk
        FROM expcand
    ),
    qterms2 AS (
        SELECT query_id, term, df FROM qterms
        UNION ALL
        SELECT e.query_id, e.term, d.df
        FROM expn e JOIN df d ON d.term = e.term WHERE e.erk <= 2
    ),
    contrib2 AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               {DIV} (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM {P} p
        JOIN qterms2 q ON p.term = q.term
        JOIN {D} d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    ranked2 AS (
        SELECT query_id, doc_id, bm25_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM (SELECT query_id, doc_id, cast(sum(c_micro) AS BIGINT) AS bm25_micro
              FROM contrib2 GROUP BY query_id, doc_id) z
    )
    SELECT r.query_id, CAST(r.rk AS BIGINT) AS rk, r.doc_id,
           r.bm25_micro AS bm25_prf_micro,
           e1.term AS exp_term1, e2.term AS exp_term2
    -- LEFT (not INNER) joins on the expansion terms: a sparse corpus can
    -- yield <2 expansion candidates for a query (round-1 top-3 docs made
    -- entirely of original query terms); the reranked top-5 must still
    -- emit, with NULL exp_term columns (r8 ADVICE).
    FROM ranked2 r
    LEFT JOIN expn e1 ON e1.query_id = r.query_id AND e1.erk = 1
    LEFT JOIN expn e2 ON e2.query_id = r.query_id AND e2.erk = 2
    WHERE r.rk <= 5
    ORDER BY r.query_id, r.rk
"""

_PRF_DUCK_PREFIX = """
    WITH posting AS MATERIALIZED (
        SELECT doc_id, term, count(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    doclen AS MATERIALIZED (
        SELECT doc_id, cast(sum(tf) AS BIGINT) AS dl FROM posting GROUP BY doc_id
    ),
"""

# r13 scan-audit fix: _PRF_MAIN_SQL (kept verbatim above — it builds the
# oracle text) re-expands under Spark's CTE inlining: df is re-aggregated
# for idf/qterms/qterms2, and the whole pass-1 subtree (contrib1 -> r1 ->
# expcand -> expn) is inlined once per expn reference (qterms2, e1, e2) —
# a 79 KB physical plan with 56 posting scans and 50 Window nodes.  The
# Spark-side builder stages the three BOUNDED relations — df (vocab-
# sized aggregate), qterms (6 rows), expn2 (<= 2 expansion terms per
# query) — as localCheckpoints, so each BM25 pass reads the posting list
# exactly once and the plan is linear.  Every expression is copied
# verbatim from _PRF_MAIN_SQL; only the staging boundaries are new.
_PRF_DF_SQL = "SELECT term, count(*) AS df FROM {P} GROUP BY term"

_PRF_QTERMS_SQL = """
    SELECT cast(ceil(rk / 2.0) AS INT) AS query_id, term, df
    FROM (SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rk FROM __prf_df)
    WHERE rk <= 6
"""

_PRF_EXPN2_SQL = """
    WITH tot AS (SELECT count(*) AS n, cast(sum(dl) AS BIGINT) AS s FROM {D}),
    contrib1 AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               DIV (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM {P} p
        JOIN __prf_qterms q ON p.term = q.term
        JOIN {D} d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    r1 AS (
        SELECT query_id, doc_id FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sum(c_micro) DESC, doc_id) AS rk
            FROM contrib1 GROUP BY query_id, doc_id
        ) z WHERE rk <= 3
    ),
    idf AS (
        SELECT term, df,
               cast(floor(ln((2 * (SELECT n FROM tot) + 2) / (2.0 * df + 1))
                          * 1000000 + 0.5) AS BIGINT) AS idf_micro
        FROM __prf_df
    ),
    expcand AS (
        SELECT r.query_id, p.term, sum(p.tf * i.idf_micro) AS escore
        FROM r1 r
        JOIN {P} p ON p.doc_id = r.doc_id
        JOIN idf i ON i.term = p.term
        LEFT JOIN __prf_qterms q ON q.query_id = r.query_id AND q.term = p.term
        WHERE q.term IS NULL
        GROUP BY r.query_id, p.term
    )
    SELECT query_id, term, erk FROM (
        SELECT query_id, term,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY escore DESC, term) AS erk
        FROM expcand
    ) WHERE erk <= 2
"""

# qterms2 is staged separately (12 rows): referencing the checkpointed
# expn2 relation under BOTH the union and the two erk joins of the final
# query trips a Catalyst optimizer crash in Spark 4.1 ("key not found:
# term#N" during lazyOptimizedPlan) — and the staging is what the plan
# wants anyway (the union feeds a join build side).
_PRF_QTERMS2_SQL = """
    SELECT query_id, term, df FROM __prf_qterms
    UNION ALL
    SELECT e.query_id, e.term, d.df
    FROM __prf_expn2 e JOIN __prf_df d ON d.term = e.term
"""

_PRF_FINAL_SQL = """
    WITH tot AS (SELECT count(*) AS n, cast(sum(dl) AS BIGINT) AS s FROM {D}),
    contrib2 AS (
        SELECT q.query_id, p.doc_id,
               (cast(floor(ln((2 * t.n + 2) / (2.0 * q.df + 1)) * 1000000 + 0.5) AS BIGINT)
                 * (22 * p.tf * t.s))
               DIV (10 * t.s * p.tf + 3 * t.s + 9 * t.n * d.dl) AS c_micro
        FROM {P} p
        JOIN __prf_qterms2 q ON p.term = q.term
        JOIN {D} d ON p.doc_id = d.doc_id
        CROSS JOIN tot t
    ),
    ranked2 AS (
        SELECT query_id, doc_id, bm25_micro,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY bm25_micro DESC, doc_id) AS rk
        FROM (SELECT query_id, doc_id, cast(sum(c_micro) AS BIGINT) AS bm25_micro
              FROM contrib2 GROUP BY query_id, doc_id) z
    )
    SELECT r.query_id, CAST(r.rk AS BIGINT) AS rk, r.doc_id,
           r.bm25_micro AS bm25_prf_micro,
           e1.term AS exp_term1, e2.term AS exp_term2
    FROM ranked2 r
    LEFT JOIN __prf_expn2 e1 ON e1.query_id = r.query_id AND e1.erk = 1
    LEFT JOIN __prf_expn2 e2 ON e2.query_id = r.query_id AND e2.erk = 2
    WHERE r.rk <= 5
    ORDER BY r.query_id, r.rk
"""


@register(
    "sim_query_expansion_prf",
    oracle=_PRF_DUCK_PREFIX
    + _PRF_MAIN_SQL.format(P="posting", D="doclen", DIV="//").lstrip().removeprefix("WITH"),
    tags=("pipeline", "text", "retrieval"),
    bench=True,
    doc="Pseudo-relevance feedback: BM25 pass 1 -> top-3 docs assumed "
    "relevant -> top-2 tf-idf expansion terms (positive integer sums, "
    "no division) -> expanded BM25 pass 2 -> top-5; posting list and "
    "doc lengths materialized once feed both passes, every score the "
    "same exact-integer rational as text_bm25_topk.",
)
def sim_query_expansion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    P = _term_postings(spark, sf_dir)
    D = _doc_lengths(spark, sf_dir)
    df = _sql_with_views(
        spark, _PRF_DF_SQL.format(P="__prf_posting"), __prf_posting=P
    ).localCheckpoint(eager=True)
    qterms = _sql_with_views(spark, _PRF_QTERMS_SQL, __prf_df=df).localCheckpoint(
        eager=True
    )
    expn2 = _sql_with_views(
        spark,
        _PRF_EXPN2_SQL.format(P="__prf_posting", D="__prf_doclen"),
        __prf_posting=P,
        __prf_doclen=D,
        __prf_df=df,
        __prf_qterms=qterms,
    ).localCheckpoint(eager=True)
    qterms2 = _sql_with_views(
        spark, _PRF_QTERMS2_SQL, __prf_qterms=qterms, __prf_expn2=expn2, __prf_df=df
    ).localCheckpoint(eager=True)
    return _sql_with_views(
        spark,
        _PRF_FINAL_SQL.format(P="__prf_posting", D="__prf_doclen"),
        __prf_posting=P,
        __prf_doclen=D,
        __prf_qterms2=qterms2,
        __prf_expn2=expn2,
    )


# ---------------------------------------------------------------------------
# Reciprocal k-NN pairs (mutual best-match filtering)
# ---------------------------------------------------------------------------
# A is near B's top-k does NOT mean B is near A's — hubness makes
# popular vectors everyone's neighbor while their own lists hold only
# other hubs.  Mutual (reciprocal) k-NN — keep the pair only when each
# side appears in the other's top-k — is the standard high-precision
# filter built on that asymmetry (bitext mining's margin criterion,
# reciprocal-rank matching in entity alignment, mutual-kNN graph
# clustering all use it).  This op composes the scale-adaptive
# sim_knn_join (checkpointed corpus, LSH-blocked, WindowGroupLimit
# top-3) with ONE equi-self-join on the (src, nbr) = (nbr, src) key
# pair; output carries both directions' ranks and similarity keys (the
# sim key is norm-asymmetric by construction).  Candidate volume is
# O(n x k) rows into an equi-join — never re-scoring, never O(n²).
def _reciprocal_oracle() -> str:
    from sensql_presto_spark.queries.registry import get

    return f"""
    WITH knn AS MATERIALIZED ({get("sim_knn_join").oracle}),
    m AS (
        SELECT a.vec_id AS vec_a, a.neighbor_id AS vec_b,
               a.rk AS rk_ab, b.rk AS rk_ba,
               a.sim_key AS sim_ab, b.sim_key AS sim_ba
        FROM knn a JOIN knn b
          ON b.vec_id = a.neighbor_id AND b.neighbor_id = a.vec_id
        WHERE a.vec_id < a.neighbor_id
    )
    SELECT CAST(vec_a AS BIGINT) AS vec_a, CAST(vec_b AS BIGINT) AS vec_b,
           CAST(rk_ab AS BIGINT) AS rk_ab, CAST(rk_ba AS BIGINT) AS rk_ba,
           CAST(sim_ab AS BIGINT) AS sim_ab, CAST(sim_ba AS BIGINT) AS sim_ba
    FROM m ORDER BY vec_a, vec_b
    """


@register(
    "sim_reciprocal_nn_pairs",
    oracle=_reciprocal_oracle(),
    tags=("pipeline", "similarity"),
    doc="Mutual k-NN pairs: keep (a, b) only when each appears in the "
    "other's top-3 (the hubness-robust high-precision match filter); "
    "ONE equi-self-join over sim_knn_join's O(n x k) output with both "
    "directions' ranks and norm-asymmetric sim keys emitted.",
)
def sim_reciprocal_nn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.queries.registry import get

    # both join sides read the same top-k relation: materialize it once
    # (without this, Spark's two plan branches would re-run the whole
    # blocked self-join + rank twice — the CTE-reuse discipline)
    knn = get("sim_knn_join").build(spark, sf_dir).localCheckpoint(eager=True)
    a = knn.select(
        F.col("vec_id").alias("vec_a"), F.col("neighbor_id").alias("vec_b"),
        F.col("rk").alias("rk_ab"), F.col("sim_key").alias("sim_ab"),
    )
    b = knn.select(
        F.col("neighbor_id").alias("vec_a"), F.col("vec_id").alias("vec_b"),
        F.col("rk").alias("rk_ba"), F.col("sim_key").alias("sim_ba"),
    )
    return (
        a.join(b, ["vec_a", "vec_b"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            F.col("vec_a").cast("long"), F.col("vec_b").cast("long"),
            F.col("rk_ab").cast("long"), F.col("rk_ba").cast("long"),
            F.col("sim_ab").cast("long"), F.col("sim_ba").cast("long"),
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Weighted exact quantiles (the revenue-weighted percentile)
# ---------------------------------------------------------------------------
# Unweighted quantiles answer "what does the median ROW look like";
# business metrics usually need "what does the median DOLLAR/TOKEN look
# like" — each value weighted by its mass (revenue-weighted price
# percentiles, token-weighted document-length percentiles for packing).
# Same bounded-state reduction as agg_exact_quantiles, with count
# replaced by an exact-integer weight sum: ONE map-side-combined
# (measure, value) groupBy collapses the corpus to its value histogram
# carrying sum(weight), a cumulative window over that cardinality-
# bounded table, and the weighted type-1 pick min{v : cumW * 1000 >=
# q * W} — all BIGINT, no division anywhere.
_sql_query(
    "agg_weighted_percentile",
    """
    WITH m1 AS (SELECT 'lineitem.price_c_by_qty' AS measure,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS val,
                       CAST(l_quantity AS BIGINT) AS w
                FROM lineitem),
    m2 AS (SELECT 'orders.totalprice_c_by_lines' AS measure,
                  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS val,
                  count(*) AS w
           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           GROUP BY o.o_orderkey, o.o_totalprice),
    m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
    hist AS (SELECT measure, val, sum(w) AS wsum FROM m GROUP BY measure, val),
    cum AS (
        SELECT measure, val,
               sum(wsum) OVER (PARTITION BY measure ORDER BY val) AS cum_w,
               sum(wsum) OVER (PARTITION BY measure) AS tot_w
        FROM hist
    ),
    qs AS (SELECT explode(array(500, 900, 990)) AS q_milli),
    pick AS (
        SELECT c.measure, q.q_milli, c.tot_w,
               min(c.val) AS quantile_value
        FROM cum c JOIN qs q
          ON c.cum_w * 1000 >= q.q_milli * c.tot_w
        GROUP BY c.measure, q.q_milli, c.tot_w
    )
    SELECT measure, CAST(q_milli AS BIGINT) AS q_milli,
           CAST(tot_w AS BIGINT) AS total_weight,
           CAST(quantile_value AS BIGINT) AS quantile_value
    FROM pick ORDER BY measure, q_milli
    """,
    oracle="""
    WITH m1 AS (SELECT 'lineitem.price_c_by_qty' AS measure,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS val,
                       CAST(l_quantity AS BIGINT) AS w
                FROM lineitem),
    m2 AS (SELECT 'orders.totalprice_c_by_lines' AS measure,
                  CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS val,
                  count(*) AS w
           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
           GROUP BY o.o_orderkey, o.o_totalprice),
    m AS (SELECT * FROM m1 UNION ALL SELECT * FROM m2),
    hist AS (SELECT measure, val, sum(w) AS wsum FROM m GROUP BY measure, val),
    cum AS (
        SELECT measure, val,
               sum(wsum) OVER (PARTITION BY measure ORDER BY val) AS cum_w,
               sum(wsum) OVER (PARTITION BY measure) AS tot_w
        FROM hist
    ),
    qs AS (SELECT unnest([500, 900, 990]) AS q_milli),
    pick AS (
        SELECT c.measure, q.q_milli, c.tot_w,
               min(c.val) AS quantile_value
        FROM cum c JOIN qs q
          ON c.cum_w * 1000 >= q.q_milli * c.tot_w
        GROUP BY c.measure, q.q_milli, c.tot_w
    )
    SELECT measure, CAST(q_milli AS BIGINT) AS q_milli,
           CAST(tot_w AS BIGINT) AS total_weight,
           CAST(quantile_value AS BIGINT) AS quantile_value
    FROM pick ORDER BY measure, q_milli
    """,
    tags=("pipeline", "aggregates", "quantiles"),
    doc="Weighted exact p50/p90/p99 (revenue-weighted percentile): the "
    "agg_exact_quantiles histogram reduction with count replaced by an "
    "exact-integer weight sum — one (measure, value) groupBy, a "
    "cardinality-bounded cumulative window, weighted type-1 pick, no "
    "division anywhere.",
)


# ---------------------------------------------------------------------------
# ROUGE-N overlap eval (summarization / paraphrase data-quality metric)
# ---------------------------------------------------------------------------
# Training-data pipelines for summarization/paraphrase tasks gate pairs
# on n-gram overlap with the reference — ROUGE-N (Lin 2004), here the
# distinct-n-gram ("set") variant both engines compute identically:
# recall_bp = |distinct n-grams(cand) ∩ distinct n-grams(ref)| * 10000
# DIV |distinct n-grams(ref)|, for N = 1 and 2.  Pairing is
# deterministic (candidate doc d vs reference doc d+100, d < 100).
# Scale shape: tokenize once per side, ONE equi-join per N on the
# n-gram value keyed by pair, two map-side-combined rollups; positive
# integers only ever meet DIV.
_sql_query(
    "text_rouge_overlap",
    """
    WITH cand AS (SELECT doc_id AS pid, split(text, ' ') AS t FROM documents WHERE doc_id < 100),
    ref AS (SELECT doc_id - 100 AS pid, split(text, ' ') AS t FROM documents
            WHERE doc_id >= 100 AND doc_id < 200),
    c1 AS (SELECT DISTINCT pid, explode(t) AS g FROM cand),
    r1 AS (SELECT DISTINCT pid, explode(t) AS g FROM ref),
    c2 AS (SELECT DISTINCT pid, explode(transform(sequence(0, size(t) - 2),
               i -> concat(t[i], ' ', t[i + 1]))) AS g FROM cand WHERE size(t) >= 2),
    r2 AS (SELECT DISTINCT pid, explode(transform(sequence(0, size(t) - 2),
               i -> concat(t[i], ' ', t[i + 1]))) AS g FROM ref WHERE size(t) >= 2),
    o1 AS (SELECT c1.pid, count(*) AS ov FROM c1 JOIN r1 ON r1.pid = c1.pid AND r1.g = c1.g
           GROUP BY c1.pid),
    o2 AS (SELECT c2.pid, count(*) AS ov FROM c2 JOIN r2 ON r2.pid = c2.pid AND r2.g = c2.g
           GROUP BY c2.pid),
    s1 AS (SELECT pid, count(*) AS n FROM r1 GROUP BY pid),
    s2 AS (SELECT pid, count(*) AS n FROM r2 GROUP BY pid)
    SELECT s1.pid AS pair_id,
           CAST(coalesce(o1.ov, 0) AS BIGINT) AS r1_overlap,
           CAST(s1.n AS BIGINT) AS r1_ref_size,
           CAST((coalesce(o1.ov, 0) * 10000) DIV s1.n AS BIGINT) AS rouge1_bp,
           CAST(coalesce(o2.ov, 0) AS BIGINT) AS r2_overlap,
           CAST(s2.n AS BIGINT) AS r2_ref_size,
           CAST((coalesce(o2.ov, 0) * 10000) DIV s2.n AS BIGINT) AS rouge2_bp
    FROM s1 JOIN s2 ON s2.pid = s1.pid
    LEFT JOIN o1 ON o1.pid = s1.pid
    LEFT JOIN o2 ON o2.pid = s1.pid
    ORDER BY pair_id
    """,
    oracle="""
    WITH cand AS (SELECT doc_id AS pid, string_split(text, ' ') AS t FROM documents WHERE doc_id < 100),
    ref AS (SELECT doc_id - 100 AS pid, string_split(text, ' ') AS t FROM documents
            WHERE doc_id >= 100 AND doc_id < 200),
    c1 AS (SELECT DISTINCT pid, unnest(t) AS g FROM cand),
    r1 AS (SELECT DISTINCT pid, unnest(t) AS g FROM ref),
    c2 AS (SELECT DISTINCT pid, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS g
           FROM cand WHERE len(t) >= 2),
    r2 AS (SELECT DISTINCT pid, unnest([t[i] || ' ' || t[i + 1] for i in range(1, len(t))]) AS g
           FROM ref WHERE len(t) >= 2),
    o1 AS (SELECT c1.pid, count(*) AS ov FROM c1 JOIN r1 ON r1.pid = c1.pid AND r1.g = c1.g
           GROUP BY c1.pid),
    o2 AS (SELECT c2.pid, count(*) AS ov FROM c2 JOIN r2 ON r2.pid = c2.pid AND r2.g = c2.g
           GROUP BY c2.pid),
    s1 AS (SELECT pid, count(*) AS n FROM r1 GROUP BY pid),
    s2 AS (SELECT pid, count(*) AS n FROM r2 GROUP BY pid)
    SELECT s1.pid AS pair_id,
           CAST(coalesce(o1.ov, 0) AS BIGINT) AS r1_overlap,
           CAST(s1.n AS BIGINT) AS r1_ref_size,
           CAST((coalesce(o1.ov, 0) * 10000) // s1.n AS BIGINT) AS rouge1_bp,
           CAST(coalesce(o2.ov, 0) AS BIGINT) AS r2_overlap,
           CAST(s2.n AS BIGINT) AS r2_ref_size,
           CAST((coalesce(o2.ov, 0) * 10000) // s2.n AS BIGINT) AS rouge2_bp
    FROM s1 JOIN s2 ON s2.pid = s1.pid
    LEFT JOIN o1 ON o1.pid = s1.pid
    LEFT JOIN o2 ON o2.pid = s1.pid
    ORDER BY pair_id
    """,
    tags=("pipeline", "text", "eval"),
    doc="ROUGE-1/ROUGE-2 (distinct-n-gram recall variant, basis points) "
    "over deterministic candidate/reference doc pairs: tokenize once per "
    "side, one n-gram equi-join per N keyed by pair, map-side rollups, "
    "positive-integer DIV only.",
)


# ---------------------------------------------------------------------------
# Top event-type journeys (3-step path mining — funnel discovery)
# ---------------------------------------------------------------------------
# Funnel ANALYSIS (events_funnel, events_transition_matrix) assumes you
# already know the path; funnel DISCOVERY asks the data what the common
# journeys are — the sankey/top-paths view every product-analytics tool
# (Amplitude/Mixpanel "Pathfinder") ships.  3-step paths per user via
# two lead()s over ONE user-keyed sort window (state per user is
# bounded), then a map-side-combined path count over the tiny
# |types|^3-bounded domain and a top-10 rank.
_sql_query(
    "events_top_paths",
    """
    WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT concat(e1, ' > ', e2, ' > ', e3) AS path, count(*) AS n
        FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rk,
           path, CAST(n AS BIGINT) AS n
    FROM paths ORDER BY rk LIMIT 10
    """,
    oracle="""
    WITH seq AS (
        SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT e1 || ' > ' || e2 || ' > ' || e3 AS path, count(*) AS n
        FROM seq WHERE e3 IS NOT NULL GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rk,
           path, CAST(n AS BIGINT) AS n
    FROM paths ORDER BY rk LIMIT 10
    """,
    tags=("events", "pattern", "paths"),
    doc="Funnel discovery: top-10 3-step event-type journeys via two "
    "lead()s over one user-keyed sort window and a |types|^3-bounded "
    "path count — the Pathfinder/sankey top-paths view.",
)


# ---------------------------------------------------------------------------
# k-NN label classification + accuracy (the serving-side ML eval)
# ---------------------------------------------------------------------------
# The simplest embedding-quality probe any pipeline runs: predict each
# probe's label by majority vote of its 3 nearest neighbors and score
# accuracy — if k-NN accuracy drops after a model update, retrieval and
# dedup thresholds calibrated on the old space are stale (the monitoring
# sibling of sim_centroid_drift_monitor).  Scoring is the cosine-monotone
# exact-integer key from sim_knn_join (sign-aware dot^2*1000 DIV
# |neighbor|^2, id tiebreaks) — NOT raw MIPS, whose norm bias lets a few
# large-norm vectors win every query's top-k on this fixture;
# majority vote ties break toward the smaller label in both engines.
# Scale shape: 16 probes broadcast against ONE corpus scan; vote and
# accuracy rollups touch O(probes x k) rows.
_sql_query(
    "sim_knn_classify",
    """
    WITH e AS (
        SELECT vec_id, label,
               transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, label AS qlab, v AS qv FROM e WHERE vec_id < 16),
    scored AS (
        SELECT qid, qlab, nlab, nid,
               CASE WHEN dot >= 0 THEN (dot * dot * 1000) DIV nrm2
                    ELSE -((dot * dot * 1000) DIV nrm2) END AS sim_key
        FROM (
            SELECT q.qid, q.qlab, e.label AS nlab, e.vec_id AS nid,
                   aggregate(zip_with(q.qv, e.v, (x, y) -> x * y), 0L, (a, x) -> a + x) AS dot,
                   aggregate(e.v, 0L, (a, x) -> a + x * x) AS nrm2
            FROM e CROSS JOIN q
            WHERE q.qid <> e.vec_id
        )
    ),
    top3 AS (
        SELECT qid, qlab, nlab FROM (
            SELECT qid, qlab, nlab,
                   row_number() OVER (PARTITION BY qid ORDER BY sim_key DESC, nid) AS rk
            FROM scored
        ) WHERE rk <= 3
    ),
    vote AS (
        SELECT qid, qlab, nlab AS pred, count(*) AS votes FROM top3 GROUP BY qid, qlab, nlab
    ),
    pick AS (
        SELECT qid, qlab, pred FROM (
            SELECT qid, qlab, pred,
                   row_number() OVER (PARTITION BY qid ORDER BY votes DESC, pred) AS vr
            FROM vote
        ) WHERE vr = 1
    )
    SELECT CAST(qlab AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(count(CASE WHEN pred = qlab THEN 1 END) AS BIGINT) AS n_correct,
           CAST((count(CASE WHEN pred = qlab THEN 1 END) * 10000) DIV count(*) AS BIGINT) AS accuracy_bp
    FROM pick GROUP BY qlab ORDER BY label
    """,
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               [CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT) for x in embedding] AS v
        FROM embeddings
    ),
    q AS (SELECT vec_id AS qid, label AS qlab, v AS qv FROM e WHERE vec_id < 16),
    scored AS (
        SELECT qid, qlab, nlab, nid,
               CASE WHEN dot >= 0 THEN (dot * dot * 1000) // nrm2
                    ELSE -((dot * dot * 1000) // nrm2) END AS sim_key
        FROM (
            SELECT q.qid, q.qlab, e.label AS nlab, e.vec_id AS nid,
                   (SELECT sum(q.qv[i] * e.v[i]) FROM range(1, 65) t(i)) AS dot,
                   (SELECT sum(e.v[i] * e.v[i]) FROM range(1, 65) t(i)) AS nrm2
            FROM e CROSS JOIN q
            WHERE q.qid <> e.vec_id
        ) y
    ),
    top3 AS (
        SELECT qid, qlab, nlab FROM (
            SELECT qid, qlab, nlab,
                   row_number() OVER (PARTITION BY qid ORDER BY sim_key DESC, nid) AS rk
            FROM scored
        ) z WHERE rk <= 3
    ),
    vote AS (
        SELECT qid, qlab, nlab AS pred, count(*) AS votes FROM top3 GROUP BY qid, qlab, nlab
    ),
    pick AS (
        SELECT qid, qlab, pred FROM (
            SELECT qid, qlab, pred,
                   row_number() OVER (PARTITION BY qid ORDER BY votes DESC, pred) AS vr
            FROM vote
        ) z WHERE vr = 1
    )
    SELECT CAST(qlab AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(count(CASE WHEN pred = qlab THEN 1 END) AS BIGINT) AS n_correct,
           CAST((count(CASE WHEN pred = qlab THEN 1 END) * 10000) // count(*) AS BIGINT) AS accuracy_bp
    FROM pick GROUP BY qlab ORDER BY label
    """,
    tags=("pipeline", "similarity", "eval"),
    doc="k-NN (k=3) majority-vote label classification with per-label "
    "accuracy in basis points: cosine-monotone exact-integer sim key "
    "(sign-aware dot^2*1000 DIV |neighbor|^2 — raw MIPS would let "
    "large-norm vectors dominate every query), bounded probe broadcast, "
    "ONE corpus scan, vote ties toward the smaller label.",
)


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999 — pagerank's link-analysis sibling)
# ---------------------------------------------------------------------------
# PageRank collapses importance to one score; HITS separates "points at
# good pages" (hub) from "is pointed at by good hubs" (authority) — the
# shape used for seed-site discovery and bipartite endorsement graphs.
# Two unrolled mutual-reinforcement rounds over the same corpus-scaled
# skewed web as graph_pagerank; scores stay exact-integer by scaling
# each iterate to a fixed 1e6 ceiling via its global max (a 1-row
# broadcast; positive values only ever meet DIV, and max-scaling is the
# standard power-iteration normalization — the fixpoint direction is
# unchanged).  Per round: ONE edge-join + groupBy per direction.
def _hits_sql(div: str) -> str:
    d = div
    sql = """
    WITH params AS (
        SELECT 15 * greatest(4, CAST(floor(count(*) / 375.0) AS BIGINT)) AS n
        FROM orders
    ),
    edges AS (
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               o_orderkey % (1 + o_custkey % 12) AS dst
        FROM orders
        WHERE o_custkey % (SELECT n FROM params)
              <> o_orderkey % (1 + o_custkey % 12)
        UNION
        SELECT DISTINCT o_custkey % (SELECT n FROM params) AS src,
               (o_custkey % (SELECT n FROM params) + 1)
               % (SELECT n FROM params) AS dst
        FROM orders
    ),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    h0 AS (SELECT id, CAST(1000000 AS BIGINT) AS h FROM nodes),
    a1r AS (SELECT e.dst AS id, sum(h0.h) AS a
            FROM edges e JOIN h0 ON h0.id = e.src GROUP BY e.dst),
    a1 AS (SELECT n.id,
                  (coalesce(r.a, 0) * 1000000) {D} (SELECT max(a) FROM a1r) AS a
           FROM nodes n LEFT JOIN a1r r ON r.id = n.id),
    h1r AS (SELECT e.src AS id, sum(a1.a) AS h
            FROM edges e JOIN a1 ON a1.id = e.dst GROUP BY e.src),
    h1 AS (SELECT n.id,
                  (coalesce(r.h, 0) * 1000000) {D} (SELECT max(h) FROM h1r) AS h
           FROM nodes n LEFT JOIN h1r r ON r.id = n.id),
    a2r AS (SELECT e.dst AS id, sum(h1.h) AS a
            FROM edges e JOIN h1 ON h1.id = e.src GROUP BY e.dst),
    a2 AS (SELECT n.id,
                  (coalesce(r.a, 0) * 1000000) {D} (SELECT max(a) FROM a2r) AS a
           FROM nodes n LEFT JOIN a2r r ON r.id = n.id),
    h2r AS (SELECT e.src AS id, sum(a2.a) AS h
            FROM edges e JOIN a2 ON a2.id = e.dst GROUP BY e.src),
    h2 AS (SELECT n.id,
                  (coalesce(r.h, 0) * 1000000) {D} (SELECT max(h) FROM h2r) AS h
           FROM nodes n LEFT JOIN h2r r ON r.id = n.id),
    ranked AS (
        SELECT a2.id, a2.a AS authority_micro, h2.h AS hub_micro,
               row_number() OVER (ORDER BY a2.a DESC, a2.id) AS ark
        FROM a2 JOIN h2 ON h2.id = a2.id
    )
    SELECT CAST(id AS BIGINT) AS node_id,
           CAST(authority_micro AS BIGINT) AS authority_micro,
           CAST(hub_micro AS BIGINT) AS hub_micro,
           CAST(ark AS BIGINT) AS ark
    FROM ranked WHERE ark <= 100
    ORDER BY ark
    """.replace("{D}", "DIV" if d == "spark" else "//")
    return sql


# r12 scan-guard rework: HITS's mutual recursion (a_k reads h_{k-1},
# h_k reads a_k, each referenced 2-3x) made the inlined-CTE form blow
# up EXPONENTIALLY — the optimized logical plan carried 1268 scans of
# orders (the worst plan in the registry; 8.5s at sf0.1).  Staged
# skewed web + checkpoint-per-iterate (every raw sum and every scaled
# iterate is node-sized); the LAST hub step stays a plan so the
# authority-ranking window sits above its groupBy reduction.  The
# oracle keeps the verbatim all-SQL text.
_HITS_RAW_SQL = """
    SELECT e.{GROUP} AS id, sum(p.v) AS v
    FROM __edges e JOIN __prev p ON p.id = e.{JOIN}
    GROUP BY e.{GROUP}
"""

_HITS_SCALE_SQL = """
    SELECT n.id, (coalesce(r.v, 0) * 1000000) DIV (SELECT max(v) FROM __raw) AS v
    FROM __nodes n LEFT JOIN __raw r ON r.id = n.id
"""


@register(
    "graph_hits",
    oracle=_hits_sql("duckdb"),
    tags=("pipeline", "graph"),
    doc="HITS hubs & authorities (2 mutual-reinforcement rounds over the "
    "corpus-scaled skewed web): one edge-join + groupBy per direction "
    "per round, iterates max-scaled to a 1e6 integer ceiling via a "
    "1-row broadcast (positive DIV only) — pagerank's link-analysis "
    "sibling, top-100 authorities emitted; staged web + checkpoint-per-"
    "iterate (the inlined-CTE form's mutual recursion expanded to 1268 "
    "orders scans under Catalyst).",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    E = _skewed_web_edges(spark, sf_dir)
    N = _skewed_web_nodes(spark, sf_dir)

    def step(prev: DataFrame, join_col: str, group_col: str, last: bool) -> DataFrame:
        raw = _sql_with_views(
            spark,
            _HITS_RAW_SQL.format(JOIN=join_col, GROUP=group_col),
            __edges=E,
            __prev=prev,
        )
        if not last:
            raw = raw.localCheckpoint(eager=True)
        scaled = _sql_with_views(spark, _HITS_SCALE_SQL, __nodes=N, __raw=raw)
        return scaled if last else scaled.localCheckpoint(eager=True)

    h0 = _sql_with_views(
        spark, "SELECT id, CAST(1000000 AS BIGINT) AS v FROM __nodes", __nodes=N
    )
    a1 = step(h0, "src", "dst", last=False)   # authorities from hub scores
    h1 = step(a1, "dst", "src", last=False)   # hubs from authority scores
    a2 = step(h1, "src", "dst", last=False)
    h2 = step(a2, "dst", "src", last=True)    # stays a plan: Aggregate below the window
    return _sql_with_views(
        spark,
        """
        SELECT CAST(id AS BIGINT) AS node_id,
               CAST(authority_micro AS BIGINT) AS authority_micro,
               CAST(hub_micro AS BIGINT) AS hub_micro,
               CAST(ark AS BIGINT) AS ark
        FROM (SELECT a.id, a.v AS authority_micro, h.v AS hub_micro,
                     row_number() OVER (ORDER BY a.v DESC, a.id) AS ark
              FROM __a a JOIN __h h ON h.id = a.id)
        WHERE ark <= 100
        ORDER BY ark
        """,
        __a=a2,
        __h=h2,
    )


# ---------------------------------------------------------------------------
# Vocabulary-growth curve (Heaps' law profile — tokenizer sizing input)
# ---------------------------------------------------------------------------
# Deciding a tokenizer's vocab size (or predicting OOV rates at corpus
# scale) starts from the vocabulary-growth curve V(N) — distinct types
# vs cumulative tokens (Heaps' law V ~ K·N^beta).  Computing it naively
# (re-scan per checkpoint) is quadratic; the scale shape here derives
# the WHOLE curve from two bounded relations: each term's FIRST document
# (one min-groupBy over the tokenized corpus — vocabulary-sized) and
# per-document token counts (doc-sized), both joined against 10
# broadcast checkpoint thresholds.  ONE tokenize scan total; all
# arithmetic exact-integer (Heaps ratio in ppm via DIV of positives).
_sql_query(
    "text_vocab_growth",
    """
    WITH tok AS (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
    nmax AS (SELECT max(doc_id) AS n FROM documents),
    first_ AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term),
    dlen AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
    ckpt AS (SELECT explode(sequence(1, 10)) AS step),
    thr AS (SELECT step, step * ((SELECT n FROM nmax) DIV 10) AS cutoff FROM ckpt),
    vocab AS (SELECT t.step, count(*) AS v
              FROM thr t JOIN first_ f ON f.fd <= t.cutoff GROUP BY t.step),
    toks AS (SELECT t.step, sum(d.ntok) AS nt
             FROM thr t JOIN dlen d ON d.doc_id <= t.cutoff GROUP BY t.step)
    SELECT CAST(t.step AS BIGINT) AS step,
           CAST(t.cutoff AS BIGINT) AS max_doc_id,
           CAST(k.nt AS BIGINT) AS tokens_cum,
           CAST(v.v AS BIGINT) AS vocab_cum,
           CAST((v.v * 1000000) DIV k.nt AS BIGINT) AS type_token_ppm
    FROM thr t JOIN vocab v ON v.step = t.step JOIN toks k ON k.step = t.step
    ORDER BY step
    """,
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    nmax AS (SELECT max(doc_id) AS n FROM documents),
    first_ AS (SELECT term, min(doc_id) AS fd FROM tok GROUP BY term),
    dlen AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
    ckpt AS (SELECT unnest(generate_series(1, 10)) AS step),
    thr AS (SELECT step, step * ((SELECT n FROM nmax) // 10) AS cutoff FROM ckpt),
    vocab AS (SELECT t.step, count(*) AS v
              FROM thr t JOIN first_ f ON f.fd <= t.cutoff GROUP BY t.step),
    toks AS (SELECT t.step, sum(d.ntok) AS nt
             FROM thr t JOIN dlen d ON d.doc_id <= t.cutoff GROUP BY t.step)
    SELECT CAST(t.step AS BIGINT) AS step,
           CAST(t.cutoff AS BIGINT) AS max_doc_id,
           CAST(k.nt AS BIGINT) AS tokens_cum,
           CAST(v.v AS BIGINT) AS vocab_cum,
           CAST((v.v * 1000000) // k.nt AS BIGINT) AS type_token_ppm
    FROM thr t JOIN vocab v ON v.step = t.step JOIN toks k ON k.step = t.step
    ORDER BY step
    """,
    tags=("pipeline", "text", "stats"),
    doc="Heaps'-law vocabulary-growth curve at 10 corpus checkpoints "
    "from ONE tokenize scan: term-first-document min-groupBy + per-doc "
    "token counts joined against broadcast thresholds — never a rescan "
    "per checkpoint; type/token ratio in ppm, all exact-integer.",
)


# ---------------------------------------------------------------------------
# Voice-activity segmentation (energy-gate VAD over real WAV payloads)
# ---------------------------------------------------------------------------
# Audio pipelines cut long recordings into speech segments before ASR /
# feature extraction; the classic first-stage detector is an energy
# gate: per analysis window, mean-square sample energy vs a threshold,
# consecutive active windows merged into segments.  This op rides the
# SAME real RIFF/WAVE path as mm_audio_windows (encode the ingest twin,
# stdlib-decode the container back to samples inside ONE Arrow
# mapInPandas pass) and emits the per-document segment report: window/
# active counts, segment count, longest segment, first active window.
# Segment merging is per-document state inside the Arrow pass (bounded
# by clip length, never a shuffle); the oracle re-derives the windows
# from the same byte arithmetic and merges with a gaps-and-islands
# window.  The 900 mean-square gate is a fixture constant chosen where
# the corpus actually splits (~40% of windows active, docs with 2+
# segments exist, so the merge logic is genuinely exercised; spaces
# encode far from the 'a'-origin, making "activity" deterministic).
_VAD_THRESHOLD = 900


@register(
    "mm_audio_vad_segments",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, off // 100 AS widx,
               length(substring(text, off + 1, 100)) AS n,
               list_sum([(ascii(c) - 96) * (ascii(c) - 96)
                         FOR c IN string_split(substring(text, off + 1, 100), '')]) AS raw_e
        FROM (SELECT doc_id, text, unnest(range(0, length(text), 100)) AS off
              FROM documents WHERE doc_id < 100)
    ),
    f AS (SELECT doc_id, widx, (raw_e // n) >= {_VAD_THRESHOLD} AS active FROM w),
    isl AS (
        SELECT doc_id, widx, active,
               widx - row_number() OVER (PARTITION BY doc_id, active ORDER BY widx) AS grp
        FROM f
    ),
    seg AS (
        SELECT doc_id, grp, count(*) AS seg_len
        FROM isl WHERE active GROUP BY doc_id, grp
    ),
    per_doc AS (
        SELECT f.doc_id,
               count(*) AS n_windows,
               count(CASE WHEN f.active THEN 1 END) AS n_active,
               coalesce(min(CASE WHEN f.active THEN f.widx END), -1) AS first_active
        FROM f GROUP BY f.doc_id
    ),
    segs AS (
        SELECT doc_id, count(*) AS n_segments, max(seg_len) AS longest_seg
        FROM seg GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n_windows AS BIGINT) AS n_windows,
           CAST(p.n_active AS BIGINT) AS n_active,
           CAST(coalesce(s.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(coalesce(s.longest_seg, 0) AS BIGINT) AS longest_seg,
           CAST(p.first_active AS BIGINT) AS first_active
    FROM per_doc p LEFT JOIN segs s ON s.doc_id = p.doc_id
    ORDER BY p.doc_id
    """,
    tags=("pipeline", "multimodal", "audio"),
    doc="Energy-gate voice-activity segmentation over real RIFF/WAVE "
    "payloads: stdlib wave decode inside ONE Arrow mapInPandas pass, "
    "per-window mean-square energy vs a fixed gate, consecutive active "
    "windows merged per document (bounded per-doc state, no shuffle); "
    "per-doc window/active/segment counts, longest segment, first "
    "active index.",
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from sensql_presto_spark.multimodal import decode_wav, encode_wav_pcm16

    def vad(batches):
        for pdf in batches:
            ids, nw, na, ns, lg, fa = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                wav = encode_wav_pcm16([(b - 96) * 256 for b in payload], sample_rate=8000)
                _rate, _nch, samples = decode_wav(wav)
                n_win = n_act = n_seg = longest = cur = 0
                first = -1
                for widx, off in enumerate(range(0, len(samples), 100)):
                    chunk = samples[off : off + 100]
                    # engine samples are byte*256; mean-square per sample
                    # in byte units = (sum s^2) DIV (65536 * n), and the
                    # 65536 factor cancels exactly under integer division
                    ms = sum(s * s for s in chunk) // (65536 * len(chunk))
                    active = ms >= _VAD_THRESHOLD
                    n_win += 1
                    if active:
                        n_act += 1
                        if first < 0:
                            first = widx
                        cur += 1
                        if cur == 1:
                            n_seg += 1
                        longest = max(longest, cur)
                    else:
                        cur = 0
                ids.append(doc_id)
                nw.append(n_win)
                na.append(n_act)
                ns.append(n_seg)
                lg.append(longest)
                fa.append(first)
            yield pd.DataFrame(
                {
                    "doc_id": ids, "n_windows": nw, "n_active": na,
                    "n_segments": ns, "longest_seg": lg, "first_active": fa,
                }
            )

    schema = ("doc_id bigint, n_windows bigint, n_active bigint, "
              "n_segments bigint, longest_seg bigint, first_active bigint")
    df = _binary_docs(spark, sf_dir).where(F.col("doc_id") < 100)
    return df.mapInPandas(vad, schema).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Ingest-order n-gram novelty curve (diminishing-returns audit)
# ---------------------------------------------------------------------------
# Data curation's "is more of this source still worth ingesting" number:
# as a corpus grows, the fraction of each new document's 3-grams never
# seen before decays (Heaps' law); a flattening novelty curve says the
# source is exhausting, a sudden jump says the distribution shifted.
# Computation: per-doc DISTINCT word 3-grams, corpus-wide first-occurrence
# doc per gram (one gram-keyed map-side-combined min), join back, then a
# 10-bucket ingest-decile rollup — three key-bounded exchanges (gram
# rollup, gram join-back, doc/decile rollup); never any pairwise
# comparison.  The decile
# boundary derives from max(doc_id)+1 via a 1-row broadcast.  All outputs
# exact BIGINT (novelty in basis points via floor of an identical-IEEE
# float division).
# r9 perf notes (two applications of existing house lessons, measured
# at sf0.1): (1) the all-SQL form recomputed the gram CTE for both of
# its consumers (first_seen + the per_doc join) — materialize the
# (doc_id, gram) occurrence list ONCE via localCheckpoint (the
# minhash/jaccard CTE-reuse discipline); (2) the array-HOF gram
# construction (transform + lambda concat) is interpreted, not
# codegen'd (the simhash lesson) — the posexplode + lead() window form
# is whole-stage-codegen and measured 4.8x faster (0.71s vs 3.37s) with
# bit-identical output.  Together: 8.0s -> ~1.5s, results unchanged
# (re-verified EXACT at both scales).
_NOVELTY_OCC_SQL = """
    WITH tr AS (SELECT doc_id, posexplode(split(text, ' ')) AS (pos, tk)
                FROM documents),
    led AS (SELECT doc_id, tk, lead(tk, 1) OVER w AS t2, lead(tk, 2) OVER w AS t3
            FROM tr WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
    SELECT DISTINCT doc_id, concat_ws(' ', tk, t2, t3) AS gram
    FROM led WHERE t3 IS NOT NULL
    """

_NOVELTY_MAIN_SQL = """
    WITH per_doc AS (
        SELECT doc_id, count(*) AS n_grams FROM __nov_occ GROUP BY doc_id
    ),
    -- r13: n_novel never needed the gram-keyed join-back of the WHOLE
    -- occurrence list (the oracle's formulation) — a gram g contributes
    -- novelty exactly to its first_doc, so counting first_seen rows per
    -- first_doc gives the identical per-doc novel count while shuffling
    -- the occurrence list once (the min rollup) instead of twice.
    novel AS (
        SELECT first_doc AS doc_id, count(*) AS n_novel
        FROM (SELECT gram, min(doc_id) AS first_doc FROM __nov_occ GROUP BY gram)
        GROUP BY first_doc
    ),
    -- decile boundary over the GRAM-BEARING corpus (docs with >= 3
    -- tokens) in BOTH engines — self-consistent with the occurrence list
    mx AS (SELECT max(doc_id) + 1 AS m FROM __nov_occ)
    SELECT CAST(floor(d.doc_id * 10.0 / (SELECT m FROM mx)) AS BIGINT) AS ingest_decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(d.n_grams) AS BIGINT) AS n_grams,
           CAST(sum(coalesce(nv.n_novel, 0)) AS BIGINT) AS n_novel,
           CAST(floor(sum(coalesce(nv.n_novel, 0)) * 10000.0 / sum(d.n_grams)) AS BIGINT) AS novelty_bp
    FROM per_doc d LEFT JOIN novel nv ON nv.doc_id = d.doc_id
    GROUP BY 1 ORDER BY 1
    """

_NOVELTY_ORACLE ="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g3
        FROM t WHERE len(toks) >= 3
    ),
    occ AS (SELECT doc_id, unnest(g3) AS gram FROM g),
    first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM occ GROUP BY gram),
    per_doc AS (
        SELECT o.doc_id,
               count(*) AS n_grams,
               sum(CASE WHEN f.first_doc = o.doc_id THEN 1 ELSE 0 END) AS n_novel
        FROM occ o JOIN first_seen f ON o.gram = f.gram
        GROUP BY o.doc_id
    ),
    mx AS (SELECT max(doc_id) + 1 AS m FROM occ)
    SELECT CAST(floor(d.doc_id * 10.0 / (SELECT m FROM mx)) AS BIGINT) AS ingest_decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS n_grams,
           CAST(sum(n_novel) AS BIGINT) AS n_novel,
           CAST(floor(sum(n_novel) * 10000.0 / sum(n_grams)) AS BIGINT) AS novelty_bp
    FROM per_doc d
    GROUP BY 1 ORDER BY 1
    """


@register(
    "text_ngram_novelty",
    oracle=_NOVELTY_ORACLE,
    tags=("pipeline", "text", "curation"),
    doc="Ingest-order 3-gram novelty curve (Heaps-law diminishing-returns "
    "audit): distinct grams per doc, corpus first-occurrence via ONE "
    "gram-keyed min, 10-bucket ingest-decile rollup with novelty in "
    "basis points; no pairwise work, broadcast decile boundary.",
    bench=True,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    occ = catalog.sql(spark, sf_dir, _NOVELTY_OCC_SQL).localCheckpoint(eager=True)
    occ.createOrReplaceTempView("__nov_occ")
    return spark.sql(_NOVELTY_MAIN_SQL)


# ---------------------------------------------------------------------------
# Term-distribution drift monitor (train/serve skew for text)
# ---------------------------------------------------------------------------
# The text twin of sim_centroid_drift_monitor: split the corpus into an
# earlier and a later half by ingest order and score every term's
# frequency shift with the 2x2 chi-square statistic
# N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — the standard feature-drift /
# corpus-comparison test (Kilgarriff 2001).  High-chi2 terms are the
# vocabulary that moved between snapshots; a pipeline gates retraining on
# exactly this report.  Counts are exact integers from ONE tokenize scan
# (map-side combined (term, half) rollup); the statistic is computed in
# DOUBLE from those integers with an identical expression tree in both
# engines (same IEEE result), rounded to 4dp, rank ties broken by term.
# Scale shape: one exchange on term, a 1-row totals broadcast, output
# bounded by vocabulary size.
_sql_query(
    "text_term_drift",
    """
    WITH mx AS (SELECT (max(doc_id) + 1) DIV 2 AS half FROM documents),
    tok AS (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
    cnt AS (
        SELECT term,
               sum(CASE WHEN doc_id < (SELECT half FROM mx) THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN doc_id >= (SELECT half FROM mx) THEN 1 ELSE 0 END) AS b
        FROM tok GROUP BY term
    ),
    tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM cnt),
    scored AS (
        SELECT c.term, c.a, c.b,
               round((t.ta + t.tb)
                     * pow(1.0 * c.a * (t.tb - c.b) - 1.0 * c.b * (t.ta - c.a), 2)
                     / ((1.0 * c.a + c.b) * (t.ta - c.a + t.tb - c.b) * t.ta * t.tb), 4) AS chi2
        FROM cnt c CROSS JOIN tot t
    )
    SELECT term, CAST(a AS BIGINT) AS n_first_half, CAST(b AS BIGINT) AS n_second_half, chi2,
           CAST(row_number() OVER (ORDER BY chi2 DESC, term) AS BIGINT) AS drift_rank
    FROM scored
    ORDER BY drift_rank
    """,
    oracle="""
    WITH mx AS (SELECT (max(doc_id) + 1) // 2 AS half FROM documents),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    cnt AS (
        SELECT term,
               sum(CASE WHEN doc_id < (SELECT half FROM mx) THEN 1 ELSE 0 END) AS a,
               sum(CASE WHEN doc_id >= (SELECT half FROM mx) THEN 1 ELSE 0 END) AS b
        FROM tok GROUP BY term
    ),
    tot AS (SELECT sum(a) AS ta, sum(b) AS tb FROM cnt),
    scored AS (
        SELECT c.term, c.a, c.b,
               round((t.ta + t.tb)
                     * pow(1.0 * c.a * (t.tb - c.b) - 1.0 * c.b * (t.ta - c.a), 2)
                     / ((1.0 * c.a + c.b) * (t.ta - c.a + t.tb - c.b) * t.ta * t.tb), 4) AS chi2
        FROM cnt c CROSS JOIN tot t
    )
    SELECT term, CAST(a AS BIGINT) AS n_first_half, CAST(b AS BIGINT) AS n_second_half, chi2,
           CAST(row_number() OVER (ORDER BY chi2 DESC, term) AS BIGINT) AS drift_rank
    FROM scored
    ORDER BY drift_rank
    """,
    tags=("pipeline", "text", "drift"),
    doc="Term-distribution drift between corpus halves: 2x2 chi-square "
    "per term (Kilgarriff's corpus-comparison statistic) from ONE "
    "tokenize scan's exact (term, half) counts; 1-row totals broadcast, "
    "output bounded by vocabulary, rank ties broken by term.",
)


# ---------------------------------------------------------------------------
# Embedding corpus health audit (the gate before any ANN build)
# ---------------------------------------------------------------------------
# Every vector-index build is preceded by a data-quality gate: ragged
# dimensions crash the index writer, zero-norm vectors make cosine
# undefined, NaN/Inf silently poison every distance they touch.  This
# audit reports all three per label bucket plus the norm envelope — on a
# healthy normalized corpus it returns min=max=1.0 norms and zero bad
# rows, which IS the assertion a pipeline makes before spending cluster
# hours on an IVF/PQ build.  Norms are computed with the same sequential
# fold both engines execute identically (Spark aggregate() vs DuckDB
# list_reduce() — same addition order, same IEEE doubles) and quantized
# to e4 integers; everything else is exact BIGINT.  Scale shape: one
# corpus scan, per-row array work, one label-keyed map-side-combined
# rollup — no joins at all.
_sql_query(
    "sim_embedding_norm_audit",
    """
    WITH e AS (SELECT label, transform(embedding, x -> cast(x AS DOUBLE)) AS v
               FROM embeddings),
    m AS (
        SELECT label, size(v) AS dims,
               sqrt(aggregate(transform(v, x -> x * x), cast(0 AS DOUBLE),
                              (a, b) -> a + b)) AS nrm,
               CASE WHEN exists(v, x -> isnan(x) OR abs(x) = cast('Infinity' AS DOUBLE))
                    THEN 1 ELSE 0 END AS bad
        FROM e
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(dims) AS BIGINT) AS dims_min,
           CAST(max(dims) AS BIGINT) AS dims_max,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
           CAST(sum(bad) AS BIGINT) AS n_nonfinite,
           CAST(min(cast(floor(nrm * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS min_norm_e4,
           CAST(max(cast(floor(nrm * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS max_norm_e4,
           CAST(sum(cast(floor(nrm * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_norm_e4
    FROM m GROUP BY label ORDER BY label
    """,
    oracle="""
    WITH e AS (SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    m AS (
        SELECT label, len(v) AS dims,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm,
               CASE WHEN len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0
                    THEN 1 ELSE 0 END AS bad
        FROM e
    )
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(min(dims) AS BIGINT) AS dims_min,
           CAST(max(dims) AS BIGINT) AS dims_max,
           CAST(sum(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
           CAST(sum(bad) AS BIGINT) AS n_nonfinite,
           CAST(min(cast(floor(nrm * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS min_norm_e4,
           CAST(max(cast(floor(nrm * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS max_norm_e4,
           CAST(sum(cast(floor(nrm * 10000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_norm_e4
    FROM m GROUP BY label ORDER BY label
    """,
    tags=("pipeline", "similarity", "audit"),
    doc="Embedding corpus health gate before ANN builds: per-label ragged-"
    "dimension envelope, zero-norm and NaN/Inf counts, e4-quantized norm "
    "min/max/sum (sequential fold — identical addition order in both "
    "engines); one scan, per-row array work, one label rollup, no joins.",
)


# ---------------------------------------------------------------------------
# Dedup detector evaluation: SimHash vs exact-Jaccard ground truth
# ---------------------------------------------------------------------------
# Choosing a near-dup detector IS an eval problem: every production
# pipeline tunes its cheap detector (SimHash bits, hamming radius, band
# shape) against exact-similarity ground truth on a slice and ships the
# cheapest detector whose precision/recall clears the bar.  This entry
# is that harness as a first-class operator, composing two already-
# oracled registry entries: predictions = dedup_simhash (hamming <= 3
# pairs), truth = dedup_ngram_jaccard (exact Jaccard >= 0.9 pairs), ONE
# full-outer equi-join on the pair key, a single-row confusion rollup
# with precision/recall/F1 in basis points.  (sim_ann_recall_eval is the
# same pattern for the ANN family.)  Both inputs are pair lists of
# banded/blocked detectors — candidate volume is bounded by their own
# caps, the eval join adds O(pairs), never O(n^2).  At sf0.01 this
# measures SimHash at P=92.3%, R=96.0% against exact ground truth — a
# genuinely discriminative readout, not a tautology.
_EVAL_PR_SELECT = """
    m AS (
        SELECT CASE WHEN s.id_a IS NOT NULL AND j.id_a IS NOT NULL THEN 1 ELSE 0 END AS tp,
               CASE WHEN s.id_a IS NOT NULL AND j.id_a IS NULL THEN 1 ELSE 0 END AS fp,
               CASE WHEN s.id_a IS NULL THEN 1 ELSE 0 END AS fn
        FROM s FULL OUTER JOIN j ON s.id_a = j.id_a AND s.id_b = j.id_b
    )
    SELECT CAST(sum(tp) + sum(fp) AS BIGINT) AS n_predicted,
           CAST(sum(tp) + sum(fn) AS BIGINT) AS n_truth,
           CAST(sum(tp) AS BIGINT) AS tp,
           CAST(sum(fp) AS BIGINT) AS fp,
           CAST(sum(fn) AS BIGINT) AS fn,
           CAST(CASE WHEN sum(tp) + sum(fp) = 0 THEN -1
                ELSE floor(sum(tp) * 10000.0 / (sum(tp) + sum(fp))) END AS BIGINT) AS precision_bp,
           CAST(CASE WHEN sum(tp) + sum(fn) = 0 THEN -1
                ELSE floor(sum(tp) * 10000.0 / (sum(tp) + sum(fn))) END AS BIGINT) AS recall_bp,
           CAST(CASE WHEN 2 * sum(tp) + sum(fp) + sum(fn) = 0 THEN -1
                ELSE floor(2 * sum(tp) * 10000.0 / (2 * sum(tp) + sum(fp) + sum(fn))) END AS BIGINT) AS f1_bp
    FROM m
"""


def _dedup_eval_oracle() -> str:
    from sensql_presto_spark.queries.registry import get

    return (
        f"WITH s AS MATERIALIZED ({get('dedup_simhash').oracle}),\n"
        f"j AS MATERIALIZED ({get('dedup_ngram_jaccard').oracle}),\n"
        + _EVAL_PR_SELECT
    )


@register(
    "dedup_eval_pr",
    oracle=_dedup_eval_oracle(),
    tags=("pipeline", "dedup", "eval"),
    doc="Dedup detector evaluation harness: SimHash (hamming<=3) pairs "
    "scored against exact n-gram-Jaccard (>=0.9) ground truth — ONE "
    "full-outer pair-key join, confusion counts, precision/recall/F1 in "
    "basis points (P=92.3% R=96.0% at sf0.01); composes two oracled "
    "registry entries, cost O(pairs) on top of their own banded bounds.",
    bench=True,
)
def dedup_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.queries.registry import get

    # the jaccard truth reads the session-memoized pair staging table
    # (built at most once per sf_dir); simhash predictions stage through
    # their own builder.  Views are uuid-suffixed and dropped after
    # analysis (r9 ADVICE: fixed names clobbered re-entrant builds).
    s = get("dedup_simhash").build(spark, sf_dir).select("id_a", "id_b")
    j = _ngram_jaccard_pairs(spark, sf_dir).select("id_a", "id_b")
    return _sql_with_views(
        spark,
        "WITH s AS (SELECT * FROM __eval_pr_s), j AS (SELECT * FROM __eval_pr_j),"
        + _EVAL_PR_SELECT,
        __eval_pr_s=s,
        __eval_pr_j=j,
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix vs labeled ground truth
# ---------------------------------------------------------------------------
# The third leg of the eval triad (sim_ann_recall_eval for ANN,
# dedup_eval_pr for dedup, this for classifiers): score text_lang_id's
# stopword-heuristic predictions against the corpus's labeled `lang`
# column and emit the full confusion matrix plus overall accuracy.  On
# this fixture the readout is deliberately unflattering — the corpus
# text is English-like word soup under every label, so the heuristic
# collapses to en/und and accuracy lands at ~39.6% — which is precisely
# the failure an eval harness exists to catch BEFORE a lang filter is
# deployed on 100 TB (a pipeline gating on lang_id would silently drop
# the fr/de/es/zh partitions).  Composes the already-oracled
# text_lang_id entry: one doc_id equi-join against the labels, a
# (true, pred)-keyed rollup bounded by |langs|^2, and a 1-row accuracy
# broadcast.
def _lang_confusion_oracle() -> str:
    from sensql_presto_spark.queries.registry import get

    return f"""
    WITH pred AS MATERIALIZED ({get("text_lang_id").oracle}),
    j AS (SELECT d.lang AS true_lang, p.predicted AS pred_lang
          FROM documents d JOIN pred p ON p.doc_id = d.doc_id),
    cm AS (SELECT true_lang, pred_lang, count(*) AS n FROM j GROUP BY true_lang, pred_lang),
    acc AS (SELECT sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END) AS hit,
                   sum(n) AS tot FROM cm)
    SELECT cm.true_lang, cm.pred_lang, CAST(cm.n AS BIGINT) AS n,
           CAST((SELECT floor(hit * 10000.0 / tot) FROM acc) AS BIGINT) AS overall_accuracy_bp
    FROM cm ORDER BY true_lang, pred_lang
    """


@register(
    "text_lang_confusion",
    oracle=_lang_confusion_oracle(),
    tags=("pipeline", "text", "eval"),
    doc="Language-ID eval harness: text_lang_id predictions vs the "
    "labeled lang column — full confusion matrix + overall accuracy in "
    "bp (39.6% on this fixture: the stopword heuristic collapses to "
    "en/und, the exact failure an eval gate catches before deploying a "
    "lang filter); one doc_id join, |langs|^2-bounded rollup.",
)
def text_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sensql_presto_spark.queries.registry import get

    pred = get("text_lang_id").build(spark, sf_dir)
    pred.createOrReplaceTempView("__langcm_pred")
    docs = catalog.table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__langcm_docs")
    return spark.sql(
        """
        WITH j AS (SELECT d.lang AS true_lang, p.predicted AS pred_lang
                   FROM __langcm_docs d JOIN __langcm_pred p ON p.doc_id = d.doc_id),
        cm AS (SELECT true_lang, pred_lang, count(*) AS n
               FROM j GROUP BY true_lang, pred_lang),
        acc AS (SELECT sum(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END) AS hit,
                       sum(n) AS tot FROM cm)
        SELECT cm.true_lang, cm.pred_lang, CAST(cm.n AS BIGINT) AS n,
               CAST((SELECT floor(hit * 10000.0 / tot) FROM acc) AS BIGINT) AS overall_accuracy_bp
        FROM cm ORDER BY true_lang, pred_lang
        """
    )


# ---------------------------------------------------------------------------
# Skew-salting planner (data-driven fanout plan with balance proof)
# ---------------------------------------------------------------------------
# scale_skew_report DETECTS skew and scale_salted_join EXECUTES a fixed
# salt; this operator does the step between them — from the key
# histogram, compute each key's salt fanout (ceil(n_key * T / N) for T
# target tasks, floor 1) and report the resulting per-task load against
# the unsalted worst case, i.e. the plan a shuffle manager would want
# BEFORE launching the big join.  The demo key is the log2-magnitude
# bucket of o_custkey — a deterministic power-law surrogate (bucket k
# holds ~2^k orders) on this uniform fixture; on real data the histogram
# input is the key itself.  The bucket is computed integrally as
# length(bin(o_custkey + 2)) - 1 = floor(log2(o_custkey + 2)) (r9
# ADVICE: floor(ln/ln) could flip at power-of-two boundaries if the two
# engines' libm log differs by an ulp).  At sf0.01 the plan takes the hottest key
# from 5112 rows/task to 465 (11x balance).  Everything is one
# map-side-combined histogram + a 1-row totals broadcast; exact BIGINT.
_sql_query(
    "scale_salt_planner",
    """
    WITH hist AS (
        SELECT CAST(length(bin(o_custkey + 2)) - 1 AS BIGINT) AS key_bucket,
               count(*) AS n
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT max(n) AS mx, sum(n) AS s FROM hist),
    plan AS (
        SELECT key_bucket, n,
               greatest(CAST(ceil(n * 32.0 / (SELECT s FROM tot)) AS BIGINT), 1L) AS fanout
        FROM hist
    )
    SELECT key_bucket, CAST(n AS BIGINT) AS n_rows, CAST(fanout AS BIGINT) AS fanout,
           CAST(ceil(n * 1.0 / fanout) AS BIGINT) AS salted_max_rows,
           CAST((SELECT mx FROM tot) AS BIGINT) AS unsalted_max_rows
    FROM plan ORDER BY key_bucket
    """,
    oracle="""
    WITH hist AS (
        SELECT CAST(length(bin(o_custkey + 2)) - 1 AS BIGINT) AS key_bucket,
               count(*) AS n
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT max(n) AS mx, sum(n) AS s FROM hist),
    plan AS (
        SELECT key_bucket, n,
               greatest(CAST(ceil(n * 32.0 / (SELECT s FROM tot)) AS BIGINT),
                        CAST(1 AS BIGINT)) AS fanout
        FROM hist
    )
    SELECT key_bucket, CAST(n AS BIGINT) AS n_rows, CAST(fanout AS BIGINT) AS fanout,
           CAST(ceil(n * 1.0 / fanout) AS BIGINT) AS salted_max_rows,
           CAST((SELECT mx FROM tot) AS BIGINT) AS unsalted_max_rows
    FROM plan ORDER BY key_bucket
    """,
    tags=("pipeline", "scale"),
    doc="Skew-salting planner: per-key salt fanout ceil(n*T/N) from ONE "
    "map-side histogram + 1-row totals broadcast, with the salted vs "
    "unsalted max-task-load balance proof (5112 -> 465 rows, 11x, at "
    "sf0.01); the planning step between scale_skew_report (detect) and "
    "scale_salted_join (execute).",
)


# ---------------------------------------------------------------------------
# Dedup impact report (what exact dedup actually saves, per source)
# ---------------------------------------------------------------------------
# After (or before committing to) a dedup pass, the pipeline wants the
# bill: per source, how many documents and tokens exact dedup removes
# and the basis-point savings — the number that decides whether the
# near-dup pass is even worth its cluster hours.  The corpus is the same
# planted-duplicate ingest dedup_exact uses (the raw fixture has no
# exact dups, so every 50th doc is re-ingested — a second crawl of the
# same pages), which lets a test tie this bill out against dedup_exact's
# independent groupBy computation.  Keeper = min doc_id
# per identical text; the group key is md5(text) so the ONE shuffle this
# query does moves 32-byte digests, not document bodies (at 100 TB the
# text column stays columnar-pruned out of the exchange; md5 collisions
# are ~2^-64 at corpus scale — the same contract dedup_exact documents).
# One window over the digest + one source-keyed rollup; exact BIGINT,
# savings via identical-IEEE floor division.
_sql_query(
    "text_dedup_impact",
    """
    WITH corpus AS (
        SELECT source, doc_id, text FROM documents
        UNION ALL
        SELECT source, doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 50 = 0
    ),
    g AS (
        SELECT source, doc_id, size(split(text, ' ')) AS n_tok,
               min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM corpus
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_removed,
           CAST(floor(sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) * 10000.0
                      / sum(n_tok)) AS BIGINT) AS saved_bp
    FROM g GROUP BY source ORDER BY source
    """,
    oracle="""
    WITH corpus AS (
        SELECT source, doc_id, text FROM documents
        UNION ALL
        SELECT source, doc_id + 1000000 AS doc_id, text
        FROM documents WHERE doc_id % 50 = 0
    ),
    g AS (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok,
               min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM corpus
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           CAST(sum(n_tok) AS BIGINT) AS tokens_total,
           CAST(sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) AS BIGINT) AS tokens_removed,
           CAST(floor(sum(CASE WHEN doc_id <> keep_id THEN n_tok ELSE 0 END) * 10000.0
                      / sum(n_tok)) AS BIGINT) AS saved_bp
    FROM g GROUP BY source ORDER BY source
    """,
    tags=("pipeline", "text", "dedup", "reporting"),
    doc="Exact-dedup impact bill per source: docs/tokens removed and bp "
    "saved with keeper = min doc_id per md5(text) group — the shuffle "
    "moves 32-byte digests, never document bodies; one digest window + "
    "one source rollup.",
)


# ---------------------------------------------------------------------------
# Curation attrition funnel (the "where did my data go" report)
# ---------------------------------------------------------------------------
# pipeline_end_to_end runs the curation pipeline and reports the FINAL
# corpus; operations teams need the complement — per-stage attrition:
# how many documents and tokens each gate removed, with stage-over-stage
# survival in basis points.  That one table is how a curation run is
# reviewed ("the diversity gate ate 40% — is the threshold wrong?") and
# how regressions between pipeline versions are caught.  Stages: raw
# (the planted-duplicate ingest, so the dedup stage is non-degenerate) ->
# length gate -> lexical-diversity gate -> exact dedup (keeper = min
# doc_id per md5(text) among gate survivors) -> decontamination (drop
# docs containing the benchmark 2-gram 'query query' — 31 hits at
# sf0.01, 262 at sf0.1, so this stage is non-degenerate too).  Shape:
# per-doc flags computed in ONE scan, the dedup keeper via one digest
# window, then a 5-row conditional-sum rollup; survival via lag() over
# the 5-row stage table.  Everything exact BIGINT.
_sql_query(
    "pipeline_attrition_funnel",
    """
    WITH corpus AS (
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, n_chars
        FROM documents WHERE doc_id % 50 = 0
    ),
    f AS (
        SELECT doc_id, text,
               size(split(text, ' ')) AS n_tok,
               CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS ok_len,
               CASE WHEN size(array_distinct(split(text, ' ')))
                         / CAST(size(split(text, ' ')) AS DOUBLE) > 0.3
                    THEN 1 ELSE 0 END AS ok_div,
               CASE WHEN text NOT LIKE '%query query%' THEN 1 ELSE 0 END AS ok_cln
        FROM corpus
    ),
    k AS (
        SELECT doc_id, n_tok, ok_len, ok_div, ok_cln,
               CASE WHEN ok_len = 1 AND ok_div = 1
                    AND doc_id = min(CASE WHEN ok_len = 1 AND ok_div = 1 THEN doc_id END)
                                 OVER (PARTITION BY md5(text))
                    THEN 1 ELSE 0 END AS keeper
        FROM f
    ),
    st AS (
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS gate,
               count(*) AS n_docs, sum(n_tok) AS n_tokens FROM k
        UNION ALL
        SELECT 1, 'length_gate', sum(ok_len), sum(ok_len * n_tok) FROM k
        UNION ALL
        SELECT 2, 'diversity_gate', sum(ok_len * ok_div), sum(ok_len * ok_div * n_tok) FROM k
        UNION ALL
        SELECT 3, 'exact_dedup', sum(keeper), sum(keeper * n_tok) FROM k
        UNION ALL
        SELECT 4, 'decontaminate', sum(keeper * ok_cln), sum(keeper * ok_cln * n_tok) FROM k
    )
    SELECT stage, gate, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(n_docs * 10000.0 /
                lag(n_docs, 1, n_docs) OVER (ORDER BY stage)) AS BIGINT) AS survival_bp
    FROM st ORDER BY stage
    """,
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text, n_chars
        FROM documents WHERE doc_id % 50 = 0
    ),
    f AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tok,
               CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS ok_len,
               CASE WHEN len(list_distinct(string_split(text, ' ')))
                         / CAST(len(string_split(text, ' ')) AS DOUBLE) > 0.3
                    THEN 1 ELSE 0 END AS ok_div,
               CASE WHEN text NOT LIKE '%query query%' THEN 1 ELSE 0 END AS ok_cln
        FROM corpus
    ),
    k AS (
        SELECT doc_id, n_tok, ok_len, ok_div, ok_cln,
               CASE WHEN ok_len = 1 AND ok_div = 1
                    AND doc_id = min(CASE WHEN ok_len = 1 AND ok_div = 1 THEN doc_id END)
                                 OVER (PARTITION BY md5(text))
                    THEN 1 ELSE 0 END AS keeper
        FROM f
    ),
    st AS (
        SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS gate,
               count(*) AS n_docs, sum(n_tok) AS n_tokens FROM k
        UNION ALL
        SELECT 1, 'length_gate', sum(ok_len), sum(ok_len * n_tok) FROM k
        UNION ALL
        SELECT 2, 'diversity_gate', sum(ok_len * ok_div), sum(ok_len * ok_div * n_tok) FROM k
        UNION ALL
        SELECT 3, 'exact_dedup', sum(keeper), sum(keeper * n_tok) FROM k
        UNION ALL
        SELECT 4, 'decontaminate', sum(keeper * ok_cln), sum(keeper * ok_cln * n_tok) FROM k
    )
    SELECT stage, gate, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(n_docs * 10000.0 /
                lag(n_docs, 1, n_docs) OVER (ORDER BY stage)) AS BIGINT) AS survival_bp
    FROM st ORDER BY stage
    """,
    tags=("pipeline", "text", "reporting"),
    doc="Curation attrition funnel: per-stage docs/tokens surviving "
    "length -> diversity -> exact-dedup -> decontamination gates with "
    "stage-over-stage survival bp — the report a curation run is "
    "reviewed by; ONE scan of per-doc flags + one digest window + a "
    "5-row rollup; every stage non-degenerate on the fixture.",
)


# ---------------------------------------------------------------------------
# Funnel conversion latency (how long each step takes)
# ---------------------------------------------------------------------------
# events_funnel counts WHO converts; product analytics equally needs HOW
# LONG conversion takes (time-to-convert drives nudge timing and churn
# prediction).  Same strictly-ordered step semantics as events_funnel
# (first view, first click AFTER it, first purchase AFTER that), then
# the per-user lags land in log2 minute buckets — the standard latency
# histogram that stays O(log range) rows per step regardless of corpus
# size (the exact-percentile variant would carry per-user state; the
# log-bucket histogram is the scale-stable form, like events_lateness_
# audit's fixed thresholds).  Buckets + extremes are exact BIGINT
# microseconds; the bucket index floor(log2(1 + lag/60s)) is computed
# INTEGRALLY as length(bin((lag_us + 60e6) div 60e6)) - 1 (r9 ADVICE:
# floor(ln/ln) relied on bit-identical libm across engines) — sound
# because floor(log2(a/b)) = floor(log2(a div b)) for a >= b >= 1:
# 2^k <= a/b implies the integer 2^k <= a div b, and a div b <= a/b.
# Shape: three user-keyed conditional-min aggregations
# over type-filtered scans (predicate pushdown on event_type), then a
# bucket rollup.
_sql_query(
    "events_funnel_lag",
    """
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c1 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON v.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c1 ON c1.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c1.t2 GROUP BY e.user_id),
    lags AS (
        SELECT 'view_to_click' AS step,
               unix_micros(c1.t2) - unix_micros(v.t1) AS lag_us
        FROM v JOIN c1 ON c1.user_id = v.user_id
        UNION ALL
        SELECT 'click_to_purchase',
               unix_micros(p.t3) - unix_micros(c1.t2)
        FROM c1 JOIN p ON p.user_id = c1.user_id
    )
    SELECT step,
           CAST(length(bin((lag_us + 60000000) DIV 60000000)) - 1 AS BIGINT) AS log2_minutes_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lag_us) AS BIGINT) AS min_lag_us,
           CAST(max(lag_us) AS BIGINT) AS max_lag_us
    FROM lags GROUP BY step, 2 ORDER BY step, log2_minutes_bucket
    """,
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c1 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON v.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c1 ON c1.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c1.t2 GROUP BY e.user_id),
    lags AS (
        SELECT 'view_to_click' AS step,
               epoch_us(c1.t2) - epoch_us(v.t1) AS lag_us
        FROM v JOIN c1 ON c1.user_id = v.user_id
        UNION ALL
        SELECT 'click_to_purchase',
               epoch_us(p.t3) - epoch_us(c1.t2)
        FROM c1 JOIN p ON p.user_id = c1.user_id
    )
    SELECT step,
           CAST(length(bin((lag_us + 60000000) // 60000000)) - 1 AS BIGINT) AS log2_minutes_bucket,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lag_us) AS BIGINT) AS min_lag_us,
           CAST(max(lag_us) AS BIGINT) AS max_lag_us
    FROM lags GROUP BY step, 2 ORDER BY step, log2_minutes_bucket
    """,
    tags=("events", "funnel", "timeseries"),
    doc="Funnel conversion latency: per-user strictly-ordered step lags "
    "in log2-minute buckets (O(log range) output rows per step — the "
    "scale-stable latency histogram) with exact min/max microseconds; "
    "three user-keyed conditional mins over type-pushdown scans.",
)
