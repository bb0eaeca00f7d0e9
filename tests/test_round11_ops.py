"""Round-11 operator tests: incremental near-dup against the persisted
MinHash band store (the LSH twin of round 10's incremental exact dedup) —
the global-equality law, re-run idempotence, torn-day invisibility, the
signature-parameter guard, and the prefix-cap emission rule."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import spark  # noqa: F401


def _neardup_docs(spark):
    """Corpus with planted near-dups: base docs + lightly-perturbed
    copies 100 ids later (same shape as the gate's corpus, small)."""
    base = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox number "),
            (F.col("id") % 9).cast("string"),
            F.lit(" jumps over the lazy dog again and again"),
        ).alias("text"),
    )
    perturbed = base.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" the end")).alias("text"),
    )
    return base.unionAll(perturbed)


def _fold_days(spark, docs, store, **kw):
    from bun_csv_spark.operators.dedup import incremental_neardup_update

    got = []
    for d in range(3):
        pairs = incremental_neardup_update(
            spark, docs.filter(F.col("doc_id") % 3 == d), store, d, **kw
        )
        got += [(d, r["id_a"], r["id_b"]) for r in pairs.collect()]
    return got


def test_incremental_neardup_equals_global_pairs(spark, tmp_path):
    """Three day-folds against the persisted band store must equal the
    GLOBAL LSH pair set over the undivided corpus (cap off so the law
    is exact), and each pair must surface on max(day_a, day_b) — the
    proof that the store carries exactly the banding history."""
    from bun_csv_spark.operators.dedup import neardup_pairs_minhash

    docs = _neardup_docs(spark)
    store = str(tmp_path / "store")
    got = _fold_days(spark, docs, store, max_bucket=None)
    want = [
        (max(r["id_a"] % 3, r["id_b"] % 3), r["id_a"], r["id_b"])
        for r in neardup_pairs_minhash(
            docs, "doc_id", "text", n_hashes=8, bands=4, shingle_k=5,
            max_bucket=None,
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    assert len(got) > 0  # the planted near-dups really collide


def test_incremental_neardup_rerun_is_idempotent(spark, tmp_path):
    """Re-running the SAME day (crash recovery) must converge: identical
    store content and identical emitted pairs — the per-day overwrite
    is the exactly-once mechanism."""
    from bun_csv_spark.operators.dedup import (
        incremental_neardup_update,
        load_fingerprint_store,
    )

    docs = _neardup_docs(spark)
    store = str(tmp_path / "store")
    day0 = docs.filter(F.col("doc_id") % 3 == 0)
    incremental_neardup_update(spark, day0, store, 0).collect()
    p1 = sorted(
        map(tuple, incremental_neardup_update(spark, day0, store, 1).collect())
    )
    a = sorted(map(tuple, load_fingerprint_store(spark, store).collect()))
    p2 = sorted(
        map(tuple, incremental_neardup_update(spark, day0, store, 1).collect())
    )
    b = sorted(map(tuple, load_fingerprint_store(spark, store).collect()))
    assert a == b and p1 == p2


def test_incremental_neardup_store_skips_torn_day(spark, tmp_path):
    """A day dir without _SUCCESS (crash mid-write) must be invisible to
    the store load, so the re-run folds against the same history."""
    import shutil

    from bun_csv_spark.operators.dedup import (
        incremental_neardup_update,
        load_fingerprint_store,
    )

    docs = _neardup_docs(spark)
    store = str(tmp_path / "store")
    incremental_neardup_update(
        spark, docs.filter(F.col("doc_id") % 3 == 0), store, 0
    ).collect()
    torn = tmp_path / "store" / "day=1"
    shutil.copytree(tmp_path / "store" / "day=0", torn)
    (torn / "_SUCCESS").unlink()
    st = load_fingerprint_store(spark, store)
    assert "day=1" not in " ".join(st.inputFiles())


def test_incremental_neardup_params_mismatch_raises(spark, tmp_path):
    """A fold with different signature parameters must raise — bucket-
    joining signatures from different (n_hashes, bands, shingle_k)
    silently finds nothing; the _PARAMS marker turns that data-
    corruption mode into an error."""
    from bun_csv_spark.operators.dedup import incremental_neardup_update

    docs = _neardup_docs(spark)
    store = str(tmp_path / "store")
    incremental_neardup_update(
        spark, docs.filter(F.col("doc_id") % 3 == 0), store, 0
    ).collect()
    with pytest.raises(ValueError, match="incomparable"):
        incremental_neardup_update(
            spark, docs.filter(F.col("doc_id") % 3 == 1), store, 1, n_hashes=4,
            bands=2,
        )


def test_avi_mjpeg_roundtrip_bit_exact():
    """Encode N macroblock-fixture frames into a real MJPEG AVI, walk
    the container back, decode every frame through the JPEG codec:
    pixels must be bit-identical (the lossless fixture contract the
    multimodal_video oracle rests on)."""
    import numpy as np

    from bun_csv_spark.multimodal.binary import (
        _avi_macroblock_fixture,
        decode_avi_frames,
        make_avi_mjpeg_payload,
        parse_avi_meta,
    )

    for i in (0, 5, 11):
        frames = _avi_macroblock_fixture(i, 2 + i % 3)
        b = make_avi_mjpeg_payload(frames, 40000)
        w0, h0, _ = frames[0]
        assert parse_avi_meta(b) == (w0, h0, 40000, len(frames))
        w, h, uspf, decoded = decode_avi_frames(b)
        assert (w, h, uspf, len(decoded)) == (w0, h0, 40000, len(frames))
        for f, (fw, fh, bgr) in enumerate(frames):
            want = np.frombuffer(bgr, np.uint8).reshape(fh, fw, 3)
            assert (decoded[f] == want).all()


def test_avi_malformed_inputs_raise():
    """Truncation, frame-count lies, and mixed frame dims must all fail
    fast with ValueError — never silently-wrong frames; a non-AVI
    payload is cleanly recognized (None / ValueError, no crash)."""
    from bun_csv_spark.multimodal.binary import (
        _avi_macroblock_fixture,
        decode_avi_frames,
        make_avi_mjpeg_payload,
        parse_avi_meta,
    )

    frames = _avi_macroblock_fixture(3, 3)
    b = make_avi_mjpeg_payload(frames, 40000)
    with pytest.raises(ValueError):
        decode_avi_frames(b[: len(b) // 2])  # truncated mid-movi
    # avih declares 3 frames; drop the movi list's last chunk bytes but
    # keep the RIFF size consistent -> count mismatch must raise
    import struct

    tampered = bytearray(b)
    # lie about total frames in avih (offset: RIFF(12) + LIST hdr(8) +
    # 'hdrl'(4) + avih hdr(8) + 4 dwords before dwTotalFrames)
    avih_body = b.find(b"avih") + 8
    struct.pack_into("<I", tampered, avih_body + 16, 99)
    with pytest.raises(ValueError, match="declares 99"):
        decode_avi_frames(bytes(tampered))
    with pytest.raises(ValueError, match="share one"):
        make_avi_mjpeg_payload(
            [_avi_macroblock_fixture(0, 1)[0], _avi_macroblock_fixture(1, 1)[0]]
        )
    assert parse_avi_meta(b"not a riff file at all") is None
    with pytest.raises(ValueError):
        decode_avi_frames(b"not a riff file at all")


def test_jpeg_missing_huffman_table_raises_valueerror():
    """A corrupt JPEG whose SOS references an undefined Huffman table
    must raise a clear ValueError at scan setup, not an AttributeError
    from inside the entropy decoder (r10 advice)."""
    import struct

    from bun_csv_spark.multimodal.binary import (
        decode_jpeg_pixels,
        make_jpeg_color_payload,
    )

    b = make_jpeg_color_payload(16, 16, bytes(16 * 16 * 3))
    # strip every DHT (FFC4) segment -> the SOS references tables that
    # were never defined
    out, pos = bytearray(), 0
    while pos < len(b):
        if b[pos] == 0xFF and pos + 1 < len(b) and b[pos + 1] == 0xC4:
            (seglen,) = struct.unpack_from(">H", b, pos + 2)
            pos += 2 + seglen
            continue
        out.append(b[pos])
        pos += 1
    with pytest.raises(ValueError, match="missing Huffman table"):
        decode_jpeg_pixels(bytes(out))


def test_sample_frames_uses_avi_header_duration(spark):
    """sample_frames (the generic plumbing) must take its duration from
    the REAL AVI header when the payload is an AVI — 4 frames x 40 ms =
    160 ms at every_ms=50 -> exactly 4 sampled rows — and key frame
    hashes off the decoded pixels."""
    from bun_csv_spark.multimodal.binary import (
        attach_avi_mjpeg_payload,
        sample_frames,
    )

    docs = spark.range(2, 3).select(F.col("id").alias("doc_id"))  # nf=4
    rows = sample_frames(
        attach_avi_mjpeg_payload(docs), "doc_id", "payload",
        every_ms=50, max_frames=8,
    ).collect()
    assert [(r["frame_idx"], r["frame_ts_ms"]) for r in rows] == [
        (0, 0), (1, 50), (2, 100), (3, 150)
    ]
    assert len({r["frame_hash"] for r in rows}) == 4
    # exact-divisor stride: ts == duration is media time that does not
    # exist — strict ts < duration, agreeing with sample_video_frames
    # (every_ms=40 on the 4x40ms=160ms clip -> 4 rows, not 5)
    rows40 = sample_frames(
        attach_avi_mjpeg_payload(docs), "doc_id", "payload",
        every_ms=40, max_frames=8,
    ).collect()
    assert [r["frame_ts_ms"] for r in rows40] == [0, 40, 80, 120]


@pytest.mark.parametrize("m_bits", [64, 1 << 16])
def test_incremental_dedup_bloom_prune_is_exact(spark, tmp_path, m_bits):
    """The bloom pre-prune of the store side must be invisible in the
    result: bloom has no false negatives, so every store fp actually in
    today survives the prune and the anti-join output is bit-identical
    — at ANY false-positive rate (m_bits=64 over ~7 distinct fps per
    day forces heavy FPs; 64 Kbit is the realistic regime)."""
    from bun_csv_spark.operators.dedup import incremental_dedup_update

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), (F.col("id") % 7).cast("string")).alias("text"),
    )

    def run(tag, **kw):
        store = str(tmp_path / tag)
        got = []
        for d in range(3):
            new = incremental_dedup_update(
                spark, docs.filter(F.col("doc_id") % 3 == d), store, d, **kw
            )
            got += [(d, r["doc_id"], r["fp"]) for r in new.collect()]
        return sorted(got)

    assert run("plain") == run("bloom", bloom_bits=m_bits)


def test_incremental_neardup_prefix_cap(spark, tmp_path):
    """The degenerate-bucket cap is PREFIX semantics: once a bucket's
    cumulative membership passes the cap, later folds emit no new
    pairs from it — but pairs emitted while it was small stand, and
    over-cap membership is still committed to the store (the cap gates
    emission, not history)."""
    from bun_csv_spark.operators.dedup import (
        incremental_neardup_update,
        load_fingerprint_store,
    )

    # six IDENTICAL docs, two per pseudo-day: the single bucket holds
    # 2 docs on day 0 (under cap 3 -> pair emitted), 4 by day 1 and 6
    # by day 2 (over cap -> nothing new)
    docs = spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.lit("completely identical document text for the cap test").alias(
            "text"
        ),
    )
    store = str(tmp_path / "store")
    got = []
    for d in range(3):
        pairs = incremental_neardup_update(
            spark, docs.filter(F.col("doc_id") % 3 == d), store, d,
            max_bucket=3,
        )
        got += [(d, r["id_a"], r["id_b"]) for r in pairs.collect()]
    assert got == [(0, 0, 3)]
    # all six docs' band rows are in the store regardless of the cap
    st = load_fingerprint_store(spark, store)
    assert st.select("doc_id").distinct().count() == 6
