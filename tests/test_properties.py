"""Property tests (hypothesis) for hashing/dedup invariants
(SURVEY.md §5 item 3).

Each example builds a tiny DataFrame from generated text and checks
algebraic invariants that must hold for ANY corpus — the kind of
guarantee an example-based oracle test can't give. Example counts are
kept small: every example runs real Spark jobs.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

WORDS = st.text(alphabet="abc xyz", min_size=0, max_size=30)
CORPUS = st.lists(WORDS, min_size=1, max_size=6)

SETTINGS = dict(max_examples=12, deadline=None)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(texts=CORPUS)
@settings(**SETTINGS)
def test_exact_dedup_accounting(spark, texts):
    """n_docs == len(corpus); n_docs == n_unique + n_dup_docs; the
    unique count equals the number of distinct normalized texts."""
    from postgres_s3_etl_spark.operators.dedup import exact_dedup_stats

    row = exact_dedup_stats(_docs_df(spark, texts)).collect()[0]
    assert row.n_docs == len(texts)
    assert row.n_docs == row.n_unique + row.n_dup_docs
    assert row.n_unique == len({t.strip().lower() for t in texts})


@given(text=WORDS)
@settings(**SETTINGS)
def test_minhash_identical_docs_collide(spark, text):
    """Two identical documents must land in identical band buckets —
    LSH recall on exact duplicates is 1 by construction."""
    from postgres_s3_etl_spark.operators.dedup import minhash_bands_for

    bands = minhash_bands_for(_docs_df(spark, [text, text])).collect()
    by_doc = {}
    for r in bands:
        by_doc.setdefault(r.doc_id, set()).add((r.band, r.bucket))
    assert by_doc[0] == by_doc[1]


@given(texts=st.lists(WORDS, min_size=2, max_size=4))
@settings(**SETTINGS)
def test_minhash_band_shape(spark, texts):
    """Every doc emits exactly LSH_BANDS rows, one per band id."""
    from postgres_s3_etl_spark.operators.dedup import LSH_BANDS, minhash_bands_for

    rows = minhash_bands_for(_docs_df(spark, texts)).collect()
    assert len(rows) == LSH_BANDS * len(texts)
    for i in range(len(texts)):
        assert sorted(r.band for r in rows if r.doc_id == i) == list(range(LSH_BANDS))


@given(text=st.text(alphabet="ab c", min_size=1, max_size=40))
@settings(**SETTINGS)
def test_shingle_count_bounds(spark, text):
    """#distinct shingles is in [1, max(n_words - 2, 1)]."""
    from postgres_s3_etl_spark.operators.dedup import _shingles_expr, _words_col

    df = _docs_df(spark, [text]).select(_words_col().alias("w")).select(
        F.size(_shingles_expr()).alias("n"), F.size("w").alias("nw")
    )
    r = df.collect()[0]
    assert 1 <= r.n <= max(r.nw - 2, 1)


@given(
    keys=st.lists(st.sampled_from(["a", "b", "hot"]), min_size=1, max_size=30),
    n_salts=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=8, deadline=None)
def test_salted_join_equivalence(spark, keys, n_salts):
    """salted_join(big, small) == big ⋈ small for ANY key multiset
    and salt count — salting must never change join semantics."""
    from postgres_s3_etl_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(k, i) for i, k in enumerate(keys)], "k string, v long"
    )
    small = spark.createDataFrame(
        [("a", 10), ("hot", 20), ("zzz", 30)], "k string, w long"
    )
    got = sorted(
        (r.k, r.v, r.w)
        for r in salted_join(big, small, ["k"], n_salts=n_salts).collect()
    )
    want = sorted((r.k, r.v, r.w) for r in big.join(small, "k").collect())
    assert got == want


MERGE_KEYS = st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=12, unique=True)
MERGE_OPS = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.sampled_from(["U", "D"])),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(base_keys=MERGE_KEYS, feed=MERGE_OPS)
@settings(**SETTINGS)
def test_merge_upsert_matches_python_model(spark, base_keys, feed):
    """MERGE semantics against a direct Python model: kept/updated/
    inserted/deleted actions and final payloads must agree for ANY
    base set and change feed."""
    from decimal import Decimal

    from postgres_s3_etl_spark.operators.cdc import merge_upsert

    base = spark.createDataFrame(
        [(k, Decimal(k) * 10) for k in base_keys] or [],
        "o_orderkey long, price decimal(18,2)",
    )
    changes = spark.createDataFrame(
        [(k, op, Decimal(k) * 10 + 1) for k, op in feed] or [],
        "o_orderkey long, op string, price decimal(18,2)",
    )
    got = {
        r.o_orderkey: (r.action, r.price)
        for r in merge_upsert(base, changes, "o_orderkey").collect()
    }
    feed_d = dict(feed)
    want = {}
    for k in set(base_keys) | set(feed_d):
        in_base, op = k in base_keys, feed_d.get(k)
        if in_base and op is None:
            want[k] = ("kept", Decimal(k) * 10)
        elif in_base and op == "U":
            want[k] = ("updated", Decimal(k) * 10 + 1)
        elif in_base and op == "D":
            want[k] = ("deleted", None)
        elif not in_base and op == "U":
            want[k] = ("inserted", Decimal(k) * 10 + 1)
        # not in base + D → no row
    assert got == want


TOKEN_DOCS = st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=20)


@given(sizes=TOKEN_DOCS)
@settings(**SETTINGS)
def test_shard_pack_conserves_and_orders(spark, sizes):
    """Packing conserves tokens, shard ids are dense from 0, and the
    shard of each doc equals prev_cum // budget under the md5 order —
    for ANY token-size distribution."""
    from postgres_s3_etl_spark.operators.sharding import shard_pack

    budget = 60
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n), "s", n) for i, n in enumerate(sizes)],
        "doc_id long, text string, source string, n_chars long",
    )
    packed = shard_pack(docs, budget=budget).collect()
    assert sum(r.n_tokens for r in packed) == sum(sizes)
    rows = sorted(packed, key=lambda r: r.ord_key)
    cum = 0
    for r in rows:
        assert r.shard_id == cum // budget
        cum += r.n_tokens
    ids = {r.shard_id for r in rows}
    assert ids == set(range(max(ids) + 1))


ORDER_HISTORIES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),      # customer key
        st.integers(min_value=0, max_value=400),    # day offset
    ),
    min_size=2,
    max_size=30,
)


@given(history=ORDER_HISTORIES)
@settings(max_examples=8, deadline=None)
def test_km_survival_invariants_any_history(spark, history, tmp_path_factory):
    """For ANY order history: survival is non-increasing in t, every
    risk set is at least the remaining event+censor mass, and the
    first risk set equals the number of multi-order customers."""
    import datetime

    from postgres_s3_etl_spark.operators.analytics import (
        q_customer_survival_km,
    )

    d = str(tmp_path_factory.mktemp("km"))
    base = datetime.date(1995, 1, 1)
    rows = [
        (i, ck, float(10 + i), base + datetime.timedelta(days=off), "O")
        for i, (ck, off) in enumerate(history)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderdate date, o_orderstatus string",
    ).write.mode("overwrite").parquet(d + "/orders.parquet")

    got = q_customer_survival_km(spark, d).collect()
    from collections import Counter

    multi = sum(1 for c in Counter(ck for ck, _ in history).values() if c >= 2)
    if not got:
        return  # no multi-order customer produced an event row
    assert got[0].n_risk <= multi
    last = 1.0 + 1e-9
    remaining = sum(r.n_events + r.n_censored for r in got)
    for r in got:
        assert r.survival <= last + 1e-9
        assert r.n_risk >= r.n_events + r.n_censored or r.n_risk >= r.n_events
        last = r.survival
    assert remaining <= multi
