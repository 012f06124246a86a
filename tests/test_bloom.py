"""Bloom-prefiltered incremental dedup (edkray/ops/bloom.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from edkray.ops.bloom import bloom_build, bloom_test, incremental_dedup


def _mk(rows, extra=None):
    t = {
        "uid": pa.array([r[0] for r in rows], type=pa.int64()),
        "k": pa.array([r[1] for r in rows], type=pa.string()),
    }
    if extra:
        t["payload"] = pa.array([r[2] for r in rows], type=pa.string())
    return pa.table(t)


NEW = [
    (10, "a", "p10"), (11, "b", "p11"), (12, "a", "p12"),  # intra-dup on a
    (13, "c", "p13"), (14, "d", "p14"), (15, "e", "p15"),
]
CORPUS = [(1, "b", "x"), (2, "d", "x"), (3, "z", "x"), (4, "b", "x")]
# expected: a(first=10), c, e  — b and d already in corpus, 12 loses to 10
EXPECTED = {(10, "a"), (13, "c"), (15, "e")}


class TestBloomFilter:
    def test_no_false_negatives(self, ray_session):
        import ray.data

        corpus = ray.data.from_arrow(_mk(CORPUS, extra=True))
        bm = bloom_build(corpus, ["k"], num_bits=1 << 12, num_hashes=5)
        from edkray.ops.shuffle import _key_hash

        h = _key_hash(_mk(CORPUS, extra=True), ["k"], 101)
        assert bloom_test(bm, h, 1 << 12, 5).all()

    def test_absent_keys_mostly_negative(self, ray_session):
        import ray.data

        corpus = ray.data.from_arrow(
            pa.table({"k": pa.array([f"doc{i}" for i in range(100)])})
        )
        bm = bloom_build(corpus, ["k"], num_bits=1 << 16, num_hashes=5)
        from edkray.ops.shuffle import _key_hash

        probe = pa.table({"k": pa.array([f"other{i}" for i in range(1000)])})
        hits = bloom_test(bm, _key_hash(probe, ["k"], 101), 1 << 16, 5)
        assert hits.mean() < 0.05  # 64KiB bits / 100 keys → tiny FPR

    def test_bits_must_be_word_aligned(self, ray_session):
        import ray.data

        with pytest.raises(ValueError):
            bloom_build(ray.data.from_arrow(_mk(CORPUS, True)), ["k"], num_bits=100)


class TestIncrementalDedup:
    def _run(self, ray_session, **kw):
        import ray.data

        new = ray.data.from_arrow(_mk(NEW, extra=True))
        corpus = ray.data.from_arrow(_mk(CORPUS, extra=True))
        out = incremental_dedup(new, corpus, ["k"], ["uid"], num_buckets=4, **kw)
        df = out.to_pandas()
        return set(zip(df["uid"], df["k"])), df

    def test_broadcast_path(self, ray_session):
        got, df = self._run(ray_session, verify_mode="broadcast")
        assert got == EXPECTED
        assert list(df.columns) == ["uid", "k", "payload"]

    def test_shuffle_path(self, ray_session):
        got, df = self._run(ray_session, verify_mode="shuffle")
        assert got == EXPECTED
        assert sorted(df.columns) == ["k", "payload", "uid"]

    def test_auto_switches_to_shuffle_over_limit(self, ray_session):
        # broadcast_limit=0 forces every suspect through the shuffle path
        got, _ = self._run(ray_session, verify_mode="auto", broadcast_limit=0)
        assert got == EXPECTED

    def test_exact_under_total_fpr(self, ray_session):
        # 64-bit bloom ≈ every probe positive: result must not change
        got, _ = self._run(ray_session, verify_mode="broadcast", num_bits=64)
        assert got == EXPECTED
        got, _ = self._run(ray_session, verify_mode="shuffle", num_bits=64)
        assert got == EXPECTED

    def test_disjoint_corpus_all_kept(self, ray_session):
        import ray.data

        new = ray.data.from_arrow(_mk(NEW, extra=True))
        corpus = ray.data.from_arrow(_mk([(1, "zz", "x")], extra=True))
        out = incremental_dedup(new, corpus, ["k"], ["uid"], num_buckets=4)
        # only intra-new dedup applies (12 loses to 10 on key a)
        assert set(out.to_pandas()["uid"]) == {10, 11, 13, 14, 15}

    def test_everything_duplicate(self, ray_session):
        import ray.data

        new = ray.data.from_arrow(_mk([(9, "b", "p"), (8, "d", "p")], extra=True))
        corpus = ray.data.from_arrow(_mk(CORPUS, extra=True))
        out = incremental_dedup(new, corpus, ["k"], ["uid"], num_buckets=4)
        assert out.count() == 0

    def test_multi_column_key(self, ray_session):
        import ray.data

        new = ray.data.from_arrow(
            pa.table({
                "uid": pa.array([1, 2, 3], type=pa.int64()),
                "k": pa.array(["a", "a", "b"]),
                "k2": pa.array([1, 2, 1], type=pa.int64()),
            })
        )
        corpus = ray.data.from_arrow(
            pa.table({
                "uid": pa.array([0], type=pa.int64()),
                "k": pa.array(["a"]),
                "k2": pa.array([2], type=pa.int64()),
            })
        )
        out = incremental_dedup(new, corpus, ["k", "k2"], ["uid"], num_buckets=4)
        assert set(out.to_pandas()["uid"]) == {1, 3}

    def test_bad_mode_raises(self, ray_session):
        import ray.data

        with pytest.raises(ValueError):
            incremental_dedup(
                ray.data.from_arrow(_mk(NEW, True)),
                ray.data.from_arrow(_mk(CORPUS, True)),
                ["k"], ["uid"], verify_mode="nope",
            )
