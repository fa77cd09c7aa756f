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
