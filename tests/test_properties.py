"""Property-based checks (hypothesis): operator invariants that must
hold for ANY input, verified against a driver-side Python model on
small generated corpora. Example counts are kept low — each example
runs a Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geniepool_etl_spark.operators import dedup as D
from geniepool_etl_spark.operators import text as TX

# include stopwords so the stopword-ratio property is non-trivial
WORDS = ["alpha", "beta", "gamma", "delta", "the", "of", "in"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


def _spark():
    from geniepool_etl_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=docs_strategy)
def test_jaccard_pairs_invariants(texts):
    """0 < jaccard ≤ 1; id_a < id_b; intersection never exceeds either
    set size; values equal the exact Python-model Jaccard."""
    spark = _spark()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    rows = D.jaccard_pairs(df, n=2, max_shingle_freq=10**6).collect()

    def shingles(t: str) -> set[str]:
        w = t.split()
        return {" ".join(w[i : i + 2]) for i in range(len(w) - 1)}

    for r in rows:
        assert r.id_a < r.id_b
        assert 0 < r.jaccard <= 1
        sa, sb = shingles(texts[r.id_a]), shingles(texts[r.id_b])
        assert r.inter == len(sa & sb)
        assert r.size_a == len(sa) and r.size_b == len(sb)
        expected = len(sa & sb) / len(sa | sb)
        assert abs(r.jaccard - round(expected, 4)) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=docs_strategy)
def test_text_stats_match_python_model(texts):
    spark = _spark()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r for r in TX.with_text_stats(df).collect()}
    for i, t in enumerate(texts):
        words = t.split()
        r = rows[i]
        assert r.n_chars_m == len(t)
        # split on \s+ of a trimmed empty string yields [''] — one
        # (empty) token; mirror that engine behavior in the model.
        expected_words = len(words) if words else 1
        assert r.n_words == expected_words
        if words:
            assert r.stopword_ratio == round(
                sum(w in TX.STOPWORDS for w in words) / len(words), 4
            )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    base=st.dictionaries(
        st.integers(0, 20), st.sampled_from(WORDS), min_size=1, max_size=10
    ),
    updates=st.dictionaries(
        st.integers(0, 20), st.sampled_from(WORDS), max_size=10
    ),
)
def test_merge_upsert_model(base, updates):
    """merge_upsert == dict-update semantics for any key overlap, and
    applying the same update batch twice equals applying it once."""
    from geniepool_etl_spark.operators.upsert import merge_upsert

    spark = _spark()
    b = spark.createDataFrame(list(base.items()), "k LONG, v STRING")
    u_rows = list(updates.items())
    u = spark.createDataFrame(u_rows, "k LONG, v STRING") if u_rows else (
        spark.createDataFrame([], "k LONG, v STRING")
    )
    once = merge_upsert(b, u, ["k"])
    got = {r.k: r.v for r in once.collect()}
    assert got == {**base, **updates}
    twice = merge_upsert(once, u, ["k"])
    assert {r.k: r.v for r in twice.collect()} == got


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(n_parts=st.sampled_from([1, 3, 7]))
def test_hash_sample_partitioning_invariant(n_parts):
    """Deterministic hash sampling selects the SAME rows under any
    repartitioning — the property RNG-based df.sample lacks."""
    from geniepool_etl_spark.functions import portable_hash32
    from pyspark.sql import functions as F

    spark = _spark()
    df = spark.range(0, 500).select(F.col("id"))
    key = F.col("id").cast("string")
    pick = portable_hash32(key, 7) % 10 == 0
    a = sorted(r.id for r in df.where(pick).collect())
    b = sorted(
        r.id for r in df.repartition(n_parts).where(pick).collect()
    )
    assert a == b and len(a) > 0


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=docs_strategy)
def test_exact_dedup_partitions_corpus(texts):
    """exact_dedup keeps exactly one representative per distinct text,
    and it is always the minimum id."""
    spark = _spark()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    kept = sorted(r.doc_id for r in D.exact_dedup(df).collect())
    model = sorted(
        min(i for i, u in enumerate(texts) if u == t) for t in set(texts)
    )
    assert kept == model


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    ts_ns=st.lists(
        # epoch nanos in [2000-01-01, ~2100), micro-aligned so every
        # encoding can represent the same instant exactly
        st.integers(min_value=946_684_800, max_value=4_102_444_800).map(
            lambda s: s * 1_000_000_000
        ),
        min_size=1,
        max_size=6,
    )
)
def test_event_micros_encoding_equivalence(ts_ns):
    """The invariant the round-4 regression violated: the SAME instants
    written as nanos-long, TIMESTAMP, and TIMESTAMP_NTZ must normalize
    to the SAME ts_us — the timeline cannot stretch or compress with
    the writer's parquet encoding."""
    import datetime

    from geniepool_etl_spark.functions import event_micros

    spark = _spark()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows = list(enumerate(ts_ns))
    long_df = spark.createDataFrame(rows, "event_id LONG, ts LONG")
    dts = [
        (
            i,
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=ns // 1000),
        )
        for i, ns in rows
    ]
    ntz_df = spark.createDataFrame(dts, "event_id LONG, ts TIMESTAMP_NTZ")
    # TIMESTAMP (tz-aware type) rows must be built from tz-aware
    # datetimes: naive ones are interpreted via the Python process's
    # LOCAL timezone (TimestampType.toInternal uses time.mktime), so
    # the assertion would only hold on a UTC-configured OS.
    dts_utc = [
        (i, dt.replace(tzinfo=datetime.timezone.utc)) for i, dt in dts
    ]
    tz_df = spark.createDataFrame(dts_utc, "event_id LONG, ts TIMESTAMP")

    def us(df):
        return {
            r.event_id: r.us
            for r in df.select(
                "event_id", event_micros(df, "ts").alias("us")
            ).collect()
        }

    expected = {i: ns // 1000 for i, ns in rows}
    assert us(long_df) == expected
    assert us(ntz_df) == expected
    assert us(tz_df) == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    n_words=st.integers(min_value=0, max_value=300),
    chunk=st.integers(min_value=2, max_value=64),
    stride_frac=st.floats(min_value=0.3, max_value=1.0),
)
def test_chunk_documents_covers_every_word(n_words, chunk, stride_frac):
    """For ANY (doc length, chunk size, stride ≤ chunk): every word
    index is covered by some chunk, no chunk exceeds chunk_words, the
    final chunk ends exactly at the document end, and consecutive
    chunks start exactly stride words apart."""
    stride = max(1, int(chunk * stride_frac))
    spark = _spark()
    text = " ".join(f"w{i}" for i in range(n_words))
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    rows = sorted(
        TX.chunk_documents(
            df, chunk_words=chunk, stride_words=stride
        ).collect(),
        key=lambda r: r.chunk_idx,
    )
    if n_words == 0:
        assert rows == []
        return
    covered = set()
    for r in rows:
        ws = r.chunk_text.split()
        assert len(ws) == r.n_chunk_words <= chunk
        start = r.chunk_idx * stride
        assert ws[0] == f"w{start}"
        covered.update(range(start, start + len(ws)))
    assert covered == set(range(n_words))
    assert rows[-1].chunk_text.split()[-1] == f"w{n_words - 1}"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    # vocabulary size controls how often grams repeat across docs
    vocab=st.integers(min_value=3, max_value=12),
    seeds=st.lists(
        st.integers(min_value=0, max_value=2**31), min_size=2, max_size=5
    ),
)
def test_repeated_spans_match_reference_model(vocab, seeds):
    """repeated_ngram_spans vs a brute-force Python reference on random
    small-vocab corpora (small vocab → many genuine cross-doc repeats):
    the distributed island-merge must produce EXACTLY the reference's
    spans — same starts, ends, and gram counts — for any corpus."""
    import random

    from geniepool_etl_spark.operators import dedup as D

    n = 3
    docs = []
    for doc_id, seed in enumerate(seeds):
        rng = random.Random(seed)
        length = rng.randint(0, 24)
        docs.append(
            (doc_id, " ".join(f"v{rng.randrange(vocab)}" for _ in range(length)))
        )

    # brute-force reference: positioned n-grams, cross-doc repeated,
    # merge islands with gap <= n
    grams: dict = {}
    for doc_id, text in docs:
        ws = text.split()
        for p in range(max(0, len(ws) - n + 1)):
            grams.setdefault(" ".join(ws[p : p + n]), []).append((doc_id, p))
    rep_pos: dict = {}
    for g, occ in grams.items():
        if len({d for d, _ in occ}) >= 2:
            for d, p in occ:
                rep_pos.setdefault(d, set()).add(p)
    expected = set()
    for d, ps in rep_pos.items():
        run: list = []
        for p in sorted(ps):
            if run and p - run[-1] > n:
                expected.add((d, run[0], run[-1] + n - 1, len(run)))
                run = []
            run.append(p)
        if run:
            expected.add((d, run[0], run[-1] + n - 1, len(run)))

    spark = _spark()
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in D.repeated_ngram_spans(df, n=n).collect()
    }
    assert got == expected


_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # key
        st.integers(min_value=0, max_value=500),    # start
        st.integers(min_value=0, max_value=300),    # span
    ),
    min_size=0,
    max_size=12,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(left=_intervals, right=_intervals, bucket=st.sampled_from([37, 100, 1000]))
def test_interval_overlap_join_matches_model(left, right, bucket):
    """Bucketed rewrite == brute-force model for arbitrary closed
    intervals and ANY bucket width — each qualifying pair emitted
    exactly once (the canonical-bucket dedup rule), none invented,
    none lost across bucket boundaries."""
    from geniepool_etl_spark.operators import events as E

    spark = _spark()
    schema = "user_id LONG, id LONG, start_us LONG, end_us LONG"
    lrows = [(k, i, s, s + w) for i, (k, s, w) in enumerate(left)]
    rrows = [(k, 1000 + i, s, s + w) for i, (k, s, w) in enumerate(right)]
    if not lrows or not rrows:
        return
    got = sorted(
        (r.l_id, r.r_id)
        for r in E.interval_overlap_join(
            spark.createDataFrame(lrows, schema),
            spark.createDataFrame(rrows, schema),
            bucket_us=bucket,
        ).collect()
    )
    want = sorted(
        (li, ri)
        for (lk, li, ls, le) in lrows
        for (rk, ri, rs, re) in rrows
        if lk == rk and ls <= re and rs <= le
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    old=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-50, 50)),
        min_size=1, max_size=15,
    ),
    new=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-50, 50)),
        min_size=1, max_size=15,
    ),
)
def test_merge_rollup_matches_full_recompute(old, new):
    """merge(standing, batch) == recompute(history ∪ batch) for any
    key/value distribution — the mergeable-partials contract."""
    from pyspark.sql import functions as F

    from geniepool_etl_spark.operators.upsert import merge_rollup

    spark = _spark()
    schema = "k LONG, v LONG"

    def partials(rows):
        return (
            spark.createDataFrame(rows, schema)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").alias("s"),
                F.min("v").alias("mn"),
                F.max("v").alias("mx"),
            )
        )

    merged = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in merge_rollup(
            partials(old), partials(new), ["k"],
            count_cols=["n"], sum_cols=["s"],
            min_cols=["mn"], max_cols=["mx"],
        ).collect()
    }
    full = {
        r.k: (r.n, r.s, r.mn, r.mx) for r in partials(old + new).collect()
    }
    assert merged == full


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    log=st.lists(
        # (key, attr) per tick; ts = index, id = index → strictly
        # increasing per list, so any prefix/suffix split satisfies
        # the append-only precondition
        st.tuples(st.integers(0, 3), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=20,
    ),
    split_frac=st.sampled_from([0.0, 0.3, 0.5, 0.8, 1.0]),
)
def test_scd2_apply_batch_matches_full_rebuild(log, split_frac):
    """For ANY change log and ANY time split, applying the later
    slice as a batch onto standing history equals rebuilding from
    the whole log — versions, intervals, and is_current included.
    Degenerate splits (empty standing, empty batch) are part of the
    strategy's range."""
    from geniepool_etl_spark.operators.upsert import (
        scd2_apply_batch, scd2_from_changelog,
    )

    spark = _spark()
    schema = "k LONG, ts_us LONG, attr STRING, id LONG"
    # ids shifted negative: the apply path must not assume
    # nonnegative batch ids (its seed row is Long.MIN_VALUE)
    rows = [(k, i, a, i - 10) for i, (k, a) in enumerate(log)]
    cut = int(len(rows) * split_frac)
    old, new = rows[:cut], rows[cut:]

    def build(r):
        return scd2_from_changelog(
            spark.createDataFrame(r, schema),
            key="k", ts_col="ts_us", attr="attr", id_col="id",
        )

    def snap(df):
        return sorted(
            (r.k, r.version, r.attr, r.valid_from_us, r.valid_to_us,
             r.is_current)
            for r in df.collect()
        )

    if not old:
        # no standing history: the batch IS the bootstrap build
        merged = build(new)
    elif not new:
        merged = build(old)
    else:
        merged = scd2_apply_batch(
            build(old), spark.createDataFrame(new, schema),
            key="k", ts_col="ts_us", attr="attr", id_col="id",
        )
    assert snap(merged) == snap(build(rows))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    log=st.lists(
        st.tuples(st.integers(0, 2), st.sampled_from(["A", "B"])),
        min_size=1,
        max_size=12,
    ),
    facts=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 15)),
        min_size=1,
        max_size=12,
    ),
)
def test_point_in_time_matches_interval_predicate(log, facts):
    """The union-carry point-in-time join must equal the brute-force
    interval-predicate join (valid_from <= t < valid_to, open
    current interval) for ANY history and ANY fact timestamps —
    including facts before the first version and on unknown keys
    (both absent from the result)."""
    from geniepool_etl_spark.operators.upsert import (
        point_in_time_join, scd2_from_changelog,
    )

    spark = _spark()
    hist_rows = [(k, i, a, i) for i, (k, a) in enumerate(log)]
    fact_rows = [
        (1000 + j, k, t) for j, (k, t) in enumerate(facts)
    ]
    history = scd2_from_changelog(
        spark.createDataFrame(hist_rows, "k LONG, ts_us LONG, attr STRING, id LONG"),
        key="k", ts_col="ts_us", attr="attr", id_col="id",
    )
    f = spark.createDataFrame(
        fact_rows, "event_id LONG, k LONG, ts_us LONG"
    )
    got = sorted(
        (r.k, r.event_id, r.ts_us, r.attr_at_ts, r.version)
        for r in point_in_time_join(
            f, history, key="k", fact_ts="ts_us", attr="attr",
            fact_id="event_id",
        ).collect()
    )
    hist = history.collect()
    want = sorted(
        (fk, fid, ft, h.attr, h.version)
        for (fid, fk, ft) in fact_rows
        for h in hist
        if h.k == fk
        and h.valid_from_us <= ft
        and (h.valid_to_us is None or ft < h.valid_to_us)
    )
    assert got == want


@given(st.binary(min_size=0, max_size=512))
@settings(max_examples=300, deadline=None)
def test_media_parsers_total_on_arbitrary_bytes(payload):
    """The stdlib byte-walkers (audio: WAV/MP3+ID3, video: AVI/MP4
    box walk, image headers) must be TOTAL over arbitrary input:
    terminate (no hop loop can stall) and either return a dict or
    raise ValueError/NotImplementedError — never an IndexError,
    struct.error, or hang. At 100 TB every malformed payload WILL
    occur; the feature lanes rely on this contract to null-out
    poison rows instead of killing the stage."""
    from geniepool_etl_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_video,
    )

    for fn in (decode_audio, decode_image, decode_video):
        try:
            out = fn(payload)
            assert isinstance(out, dict) and out.get("format")
        except (ValueError, NotImplementedError):
            pass


@given(st.binary(min_size=0, max_size=256))
@settings(max_examples=300, deadline=None)
def test_media_parsers_total_on_marker_prefixed_bytes(tail):
    """Same totality contract, but forcing the walkers PAST the
    container sniff: valid magic prefixes followed by arbitrary
    bytes (the realistic corruption — truncated/garbled files that
    still carry their signature)."""
    from geniepool_etl_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        decode_video,
    )

    cases = [
        (decode_audio, b"RIFF\x24\x00\x00\x00WAVE"),
        (decode_audio, b"ID3\x04\x00\x00\x00\x00\x00\x05"),
        (decode_audio, b"\xff\xfb"),
        (decode_video, b"RIFF\x24\x00\x00\x00AVI "),
        (decode_video, b"\x00\x00\x00\x10ftypisom"),
        (decode_video, b"\x1aE\xdf\xa3"),
        (decode_image, b"\x89PNG\r\n\x1a\n"),
        (decode_image, b"RIFF\x24\x00\x00\x00WEBP"),
        (decode_image, b"II\x2a\x00"),
        (decode_image, b"MM\x00\x2a"),
        (decode_audio, b"fLaC"),
        (decode_audio, b"OggS"),
        (decode_image, b"\xff\xd8\xff"),
        (decode_image, b"BM"),
        (decode_image, b"GIF89a"),
    ]
    for fn, magic in cases:
        try:
            out = fn(magic + tail)
            assert isinstance(out, dict)
        except (ValueError, NotImplementedError):
            pass


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=25,
    )
)
def test_triangle_counts_match_bruteforce(edges):
    """PROPERTY: on ANY small multigraph (self-loops, duplicates,
    reversed edges included), the degree-ordered census equals the
    brute-force per-node triangle count over the simple undirected
    graph it induces."""
    import itertools

    from geniepool_etl_spark.operators.graph import triangle_counts

    spark = _spark()
    und = {
        (min(a, b), max(a, b)) for a, b in edges if a != b
    }
    nodes = sorted({n for e in und for n in e})
    want: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in und and (y, z) in und and (x, z) in und
        ):
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    if edges:
        df = spark.createDataFrame(edges, "src LONG, dst LONG")
    else:
        df = spark.createDataFrame([], "src LONG, dst LONG")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lefts=st.lists(
        st.tuples(
            st.integers(0, 2),           # key
            st.integers(0, 100),         # start
            st.integers(0, 40),          # span
        ),
        min_size=0,
        max_size=10,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 2), st.integers(0, 100), st.integers(0, 40)
        ),
        min_size=0,
        max_size=10,
    ),
)
def test_interval_overlap_join_matches_bruteforce(lefts, rights):
    """The bucketed range-join rewrite must equal the brute-force
    closed-interval overlap predicate over ALL same-key pairs, each
    pair exactly once — for any interval layout, including intervals
    spanning many buckets (bucket_us=16 vs spans up to 40, so the
    canonical-bucket dedup is load-bearing, not vacuous)."""
    from geniepool_etl_spark.operators.events import interval_overlap_join

    spark = _spark()
    schema = "user_id LONG, iid LONG, start_us LONG, end_us LONG"
    l_rows = [(k, i, s, s + d) for i, (k, s, d) in enumerate(lefts)]
    r_rows = [(k, i, s, s + d) for i, (k, s, d) in enumerate(rights)]
    ldf = spark.createDataFrame(l_rows, schema)
    rdf = spark.createDataFrame(r_rows, schema)
    got = {
        (r.user_id, r.l_iid, r.r_iid)
        for r in interval_overlap_join(ldf, rdf, bucket_us=16).collect()
    }
    expect = {
        (lk, li, ri)
        for (lk, li, ls, le) in l_rows
        for (rk, ri, rs, re) in r_rows
        if lk == rk and ls <= re and rs <= le
    }
    assert got == expect
    n = interval_overlap_join(ldf, rdf, bucket_us=16).count()
    assert n == len(expect)  # exactly-once, no canonical-bucket dupes


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lefts=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=1,
        max_size=10,
    ),
    rights=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)),
        min_size=0,
        max_size=10,
    ),
    tol=st.sampled_from([None, 0, 7]),
)
def test_asof_join_matches_bruteforce(lefts, rights, tol):
    """asof_join_latest_prior == the brute-force model 'most recent
    right row at or before each left row, per key, ties to the
    highest event_id, staleness beyond tolerance nulls out' — for any
    event layout including exact timestamp ties and duplicate
    timestamps on both sides."""
    from geniepool_etl_spark.operators.events import asof_join_latest_prior

    spark = _spark()
    schema = "user_id LONG, ts_us LONG, event_id LONG"
    l_rows = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    r_rows = [(k, t, 1000 + i) for i, (k, t) in enumerate(rights)]
    ldf = spark.createDataFrame(l_rows, schema)
    rdf = spark.createDataFrame(r_rows, schema)
    got = {
        r.event_id: (r.asof_ts_us, r.asof_event_id)
        for r in asof_join_latest_prior(ldf, rdf, tolerance_us=tol).collect()
    }

    def model(lk, lt):
        cand = [(rt, ri) for (rk, rt, ri) in r_rows if rk == lk and rt <= lt]
        if not cand:
            return (None, None)
        rt, ri = max(cand)
        if tol is not None and lt - rt > tol:
            return (None, None)
        return (rt, ri)

    assert got == {i: model(k, t) for (k, t, i) in l_rows}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    base=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("append"),
                st.lists(
                    st.tuples(
                        st.integers(min_value=100, max_value=140),
                        st.integers(min_value=0, max_value=9),
                    ),
                    min_size=0,
                    max_size=6,
                    unique_by=lambda t: t[0],
                ),
            ),
            st.tuples(
                st.just("merge"),
                st.lists(
                    st.tuples(
                        st.integers(min_value=0, max_value=60),
                        st.integers(min_value=50, max_value=59),
                    ),
                    min_size=1,
                    max_size=8,
                    unique_by=lambda t: t[0],
                ),
            ),
            st.tuples(
                st.just("delete"),
                st.integers(min_value=0, max_value=9),
            ),
            st.tuples(st.just("compact"), st.just(None)),
            st.tuples(
                st.just("cdc"),
                st.lists(
                    st.tuples(
                        st.integers(min_value=0, max_value=150),
                        st.integers(min_value=60, max_value=69),
                        st.booleans(),  # True=upsert, False=delete
                    ),
                    min_size=1,
                    max_size=8,
                    unique_by=lambda t: t[0],
                ),
            ),
        ),
        min_size=1,
        max_size=4,
    ),
)
def test_snaptable_op_chain_matches_model(base, ops):
    """ANY chain of append/merge/delete/compact over a snapshot table
    must equal a driver-side dict model, every intermediate version
    must stay time-travel readable with its model-time contents, and
    history row counts must track the model exactly.

    Append keys are drawn from a disjoint range so the append-only
    contract holds (duplicate-key appends are out of contract; merge
    is the keyed path)."""
    import tempfile

    from pyspark.sql import functions as F  # noqa: F401

    from geniepool_etl_spark import snaptable as T

    spark = _spark()
    tdir = tempfile.mkdtemp(prefix="gp_snap_prop_")

    def df_of(rows):
        return spark.createDataFrame(rows or [], "k LONG, v LONG")

    model = dict(base)
    T.write_table(df_of(base), tdir, "create")
    snapshots = [dict(model)]
    for op, arg in ops:
        if op == "append":
            # model contract: appended keys are new
            arg = [(k, v) for k, v in arg if k not in model]
            T.write_table(df_of(arg), tdir, "append")
            model.update(arg)
        elif op == "merge":
            T.merge_table(spark, tdir, df_of(arg), ["k"])
            model.update(arg)
        elif op == "delete":
            T.delete_where(spark, tdir, f"v = {arg}")
            model = {k: v for k, v in model.items() if v != arg}
        elif op == "cdc":
            ch = spark.createDataFrame(
                [(k, v, "upsert" if up else "delete") for k, v, up in arg],
                "k LONG, v LONG, _op STRING",
            )
            T.apply_cdc(spark, tdir, ch, ["k"])
            for k, v, up in arg:
                if up:
                    model[k] = v
                else:
                    model.pop(k, None)
        else:
            T.compact(spark, tdir, target_files=1)
        snapshots.append(dict(model))

    hist = {
        r.version: r.n_rows for r in T.history(spark, tdir).collect()
    }
    for v, snap in enumerate(snapshots):
        got = {
            r.k: r.v for r in T.read_table(spark, tdir, version=v).collect()
        }
        assert got == snap, f"version {v} diverged from model"
        assert hist[v] == len(snap)


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.one_of(
        st.binary(min_size=0, max_size=4000),
        # low-entropy streams: long runs + tiny alphabets force
        # dictionary growth, width bumps, KwKwK, and 4096 CLEARs
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=1, max_value=900),
            ),
            min_size=1,
            max_size=24,
        ).map(lambda runs: b"".join(bytes([b]) * n for b, n in runs)),
    )
)
def test_gif_lzw_roundtrip_property(data):
    """encode→decode is the identity for ANY byte stream — driver-side
    only (no Spark job per example), so the example budget can be
    high enough to reach the 4096-entry CLEAR path repeatedly.

    A pinned deterministic probe first: inputs whose FINAL code lands
    the decoder's table exactly at 2^w - 1 (the stream-end width-sync
    case hypothesis found in r8 — the encoder's flush emit has no
    companion add, so the decoder catches up and bumps before EOI;
    the encoder must mirror that bump for the EOI width)."""
    from geniepool_etl_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    for n in (250, 251, 252, 253, 254, 255, 506, 507):
        probe = bytes([0, 0, 2]) + bytes([1]) * (n * (n + 1) // 2)
        assert _gif_lzw_decode(_gif_lzw_encode(probe)) == probe

    assert _gif_lzw_decode(_gif_lzw_encode(data)) == data


@given(
    x=st.floats(min_value=-1.2, max_value=1.2, allow_nan=False),
    thr_milli=st.integers(min_value=-1000, max_value=1000),
)
@settings(max_examples=500, deadline=None)
def test_round4_boundary_predicate_matches_bigdecimal(x, thr_milli):
    """_ge_round4_boundary's vectorized `x >= B` must equal the JVM's
    `round(x, 4) >= threshold` for every double — including grid
    values, half-boundaries and their float neighbors. The mirror of
    Spark's round is Decimal HALF_UP on the exact binary value of x
    (java.math.BigDecimal(double) semantics), cast back to double."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from geniepool_etl_spark.operators.similarity import (
        _ge_round4_boundary,
    )

    threshold = thr_milli / 1000.0
    b = _ge_round4_boundary(threshold)
    probes = {x, math.nextafter(x, math.inf), math.nextafter(x, -math.inf)}
    # adversarial probes: exact grid points and half-boundaries near x
    g = round(x, 4)
    for dg in (-0.0001, 0.0, 0.0001):
        probes.add(g + dg)
        probes.add(g + dg + 0.00005)
        probes.add(math.nextafter(g + dg + 0.00005, -math.inf))
    for p in probes:
        jvm_round4 = float(
            Decimal(p).quantize(Decimal("0.0001"), ROUND_HALF_UP)
        )
        assert (p >= b) == (jvm_round4 >= threshold), (
            f"x={p!r} thr={threshold!r} B={b!r} round4={jvm_round4!r}"
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    lefts=st.lists(
        st.tuples(
            st.integers(0, 2), st.integers(0, 500), st.integers(0, 8)
        ),
        min_size=15,
        max_size=20,
    ),
    rights=st.lists(
        st.tuples(
            st.integers(0, 2), st.integers(0, 500), st.integers(0, 8)
        ),
        min_size=15,
        max_size=20,
    ),
    giant_span=st.integers(500_000, 5_000_000),
)
def test_interval_join_auto_bucket_handles_skew(lefts, rights, giant_span):
    """bucket_us=None (auto-sizing) must stay CORRECT on a skewed
    span distribution — >=30 tiny intervals (so p95 lands on them) plus one giant straggler
    thousands of times the p95 span — and must flag the skew: the
    p95-derived width gets floored so the straggler replicates across
    <=256 buckets instead of ~span/p95 (r8 verdict ask #5; one giant
    interval exploded across a fine grid meets every row in the
    join)."""
    import warnings as _w

    from geniepool_etl_spark.operators.events import interval_overlap_join

    spark = _spark()
    schema = "user_id LONG, iid LONG, start_us LONG, end_us LONG"
    l_rows = [(k, i, s, s + d) for i, (k, s, d) in enumerate(lefts)]
    # the straggler: key 0, spanning the whole probed range and beyond
    l_rows.append((0, 10_000, 0, giant_span))
    r_rows = [(k, i, s, s + d) for i, (k, s, d) in enumerate(rights)]
    ldf = spark.createDataFrame(l_rows, schema)
    rdf = spark.createDataFrame(r_rows, schema)
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        got = {
            (r.user_id, r.l_iid, r.r_iid)
            for r in interval_overlap_join(ldf, rdf).collect()
        }
    expect = {
        (lk, li, ri)
        for (lk, li, ls, le) in l_rows
        for (rk, ri, rs, re) in r_rows
        if lk == rk and ls <= re and rs <= le
    }
    assert got == expect
    assert any(
        "long-interval skew" in str(w.message) for w in caught
    ), "the straggler floor engaged silently"
