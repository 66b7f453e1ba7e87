"""PII redaction unit behavior: rule order, global replacement,
multi-occurrence counting, and non-PII text passing through untouched."""

from __future__ import annotations

from march_mania_spark_lakehouse_spark.operators import text as T


def _one(spark, s: str):
    df = spark.createDataFrame([(s,)], "text string")
    row = df.select(
        T.redact_pii("text").alias("red"), *T.pii_counts("text")
    ).first()
    return row.red, (row.n_email, row.n_phone, row.n_ip)


def test_all_kinds_redacted_and_counted(spark):
    red, counts = _one(
        spark,
        "mail a.b+c@sub.example.co.uk call 555-123-4567 or 555.987.6543 "
        "from 192.168.0.1",
    )
    assert red == "mail [EMAIL] call [PHONE] or [PHONE] from [IP]"
    assert counts == (1, 2, 1)


def test_email_rule_runs_before_ip_rule(spark):
    # the host part of an email must never be half-eaten as an IPv4
    red, counts = _one(spark, "x 1.2.3.4@4.3.2.1.com y")
    assert red == "x [EMAIL] y"
    assert counts[0] == 1


def test_clean_text_untouched(spark):
    s = "version 1.2 of the spec, chapter 3-4, costs $5.99"
    red, counts = _one(spark, s)
    assert red == s
    assert counts == (0, 0, 0)


def test_global_not_first_match_only(spark):
    red, counts = _one(spark, "a@b.io c@d.io e@f.io")
    assert red == "[EMAIL] [EMAIL] [EMAIL]"
    assert counts == (3, 0, 0)


# --------------------------------------------------------------------------
# pHash image near-dup (operators/multimodal.py): hash invariances and
# the pigeonhole banding guarantee
# --------------------------------------------------------------------------


def test_phash_brightness_invariant_and_content_sensitive():
    import numpy as np

    from march_mania_spark_lakehouse_spark.operators import multimodal as M

    rng = np.random.default_rng(11)
    img = rng.integers(0, 200, (24, 40, 3), dtype=np.uint8)
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    # uniform brightness shift only moves the DC coefficient
    assert ham(M.phash64(img), M.phash64(img + 20)) <= 1
    # grayscale of itself hashes identically (channel mean)
    assert M.phash64(img.mean(axis=2).astype(np.uint8)) == M.phash64(img)
    # unrelated content is far
    other = rng.integers(0, 200, (24, 40, 3), dtype=np.uint8)
    assert ham(M.phash64(img), M.phash64(other)) > 16
    # resolution change (same content resampled) stays near
    big = img.repeat(2, axis=0).repeat(2, axis=1)
    assert ham(M.phash64(img), M.phash64(big)) <= 2


def test_phash_banding_finds_all_pairs_within_distance(spark):
    """Pigeonhole: every pair within max_distance MUST surface —
    verified against brute force on a small corpus with borderline
    distances planted."""
    import numpy as np

    from march_mania_spark_lakehouse_spark.operators import multimodal as M

    rng = np.random.default_rng(5)
    base = rng.integers(0, 200, (32, 32), dtype=np.uint8)
    hashes = []
    for i in range(30):
        img = rng.integers(0, 200, (32, 32), dtype=np.uint8)
        hashes.append((i, M.phash64(img)))
    # planted: flip exactly k bits of base's hash for k = 0..8
    h0 = M.phash64(base)
    for k in range(9):
        h = h0
        for bit in range(k):
            h ^= 1 << (bit * 7)
        hashes.append((100 + k, h))
    df = spark.createDataFrame(hashes, "media_id long, phash long")
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in M.phash_near_dup_pairs(df, max_distance=6).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    want = {
        (a, b, ham(ha, hb))
        for (a, ha) in hashes
        for (b, hb) in hashes
        if a < b and ham(ha, hb) <= 6
    }
    assert got == want and len(want) >= 10


def test_phash_banding_recall_at_awkward_max_distances(spark):
    """The band layout must produce EXACTLY max_distance+1 non-empty
    bands for every max_distance — a fixed uniform width under-produced
    bands for 8, 9, 11, 13, 14 (the 9th of 9 8-bit bands overran bit
    63), silently losing qualifying pairs. Brute-force cross-check at
    each previously-broken value, with planted pairs at exactly
    max_distance (the hardest case: they may agree on only one band)."""
    import numpy as np

    from march_mania_spark_lakehouse_spark.operators import multimodal as M

    rng = np.random.default_rng(11)
    for max_distance in (8, 9, 11, 13, 14):
        hashes = [(i, int(rng.integers(0, 2**63))) for i in range(12)]
        h0 = hashes[0][1]
        # flip exactly max_distance bits, spread across the word so the
        # pair straddles as many bands as possible
        step = 63 // max_distance
        h = h0
        for j in range(max_distance):
            h ^= 1 << (j * step)
        hashes.append((500, h))
        df = spark.createDataFrame(hashes, "media_id long, phash long")
        got = {
            (r.id_a, r.id_b, r.distance)
            for r in M.phash_near_dup_pairs(df, max_distance=max_distance).collect()
        }
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        want = {
            (a, b, ham(ha, hb))
            for (a, ha) in hashes
            for (b, hb) in hashes
            if a < b and ham(ha, hb) <= max_distance
        }
        assert got == want, (max_distance, want - got)
        assert (0, 500, max_distance) in got  # the planted borderline pair


# --------------------------------------------------------------------------
# Property-based checks (hypothesis) for the Puffin/KMV layer
# --------------------------------------------------------------------------


def test_theta_image_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from march_mania_spark_lakehouse_spark.sources import puffin

    @settings(max_examples=60, deadline=None)
    @given(
        st.sets(st.integers(min_value=1, max_value=2**63 - 1), max_size=40),
        st.integers(min_value=1, max_value=32),
    )
    def check(hashes, k):
        state = sorted(hashes)[:k]
        img = puffin.theta_sketch_bytes(state, k)
        back, theta = puffin.theta_sketch_read(img)
        if len(state) < k:
            assert back == state and theta == 2**63
        else:
            assert theta == state[-1] and back == state[:-1]

    check()


def test_kmv_merge_is_commutative_idempotent_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from march_mania_spark_lakehouse_spark.sources import puffin

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=60),
        st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=60),
        st.integers(min_value=1, max_value=16),
    )
    def check(a, b, k):
        m1 = puffin.kmv_merge(a + b, k)
        m2 = puffin.kmv_merge(b + a, k)
        assert m1 == m2  # merge order never matters
        # merging partial sketches == merging raw streams
        pa, pb = puffin.kmv_merge(a, k), puffin.kmv_merge(b, k)
        assert puffin.kmv_merge(pa + pb, k) == m1
        # idempotent
        assert puffin.kmv_merge(m1 + m1, k) == m1

    check()


def test_murmur128_byte_prefix_property():
    """Hashes of distinct random byte strings never collide in 60
    samples, and the function is a pure function of its input."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from march_mania_spark_lakehouse_spark.sources import puffin

    @settings(max_examples=60, deadline=None)
    @given(st.binary(max_size=64), st.binary(max_size=64))
    def check(a, b):
        ha, hb = puffin.murmur3_x64_128(a, 9001), puffin.murmur3_x64_128(b, 9001)
        assert ha == puffin.murmur3_x64_128(a, 9001)
        if a != b:
            assert ha != hb  # 128-bit collision would be astronomical

    check()
