"""Round-8 operator tests: incremental pipeline composition and
cross-modality leakage-safe splits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- incremental day pipeline ----------------------------------------------


def test_incremental_day_pipeline_invariants(spark):
    """The composed gate at sf0.001: one summary row per event_type with
    every family's invariants holding — CM never underestimates (est >=
    exact n, and here the sketched key IS the group key so est_count_cm
    bounds n from above), quantiles ordered, moments consistent."""
    import __spark_entry__ as entry

    rows = entry.q_incremental_day_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["min_c"] <= r["max_c"]
        assert r["p50"] <= r["p90"]
        assert r["est_count_cm"] >= r["n"]  # count-min one-sided error
        assert r["est_distinct_users"] > 0
        assert r["min_c"] <= r["mean_c_e4"] / 10_000 <= r["max_c"]


# --- cross-modality leakage-safe split -------------------------------------


def test_multimodal_split_components_move_as_unit(spark):
    """The contamination guarantee: every near-dup edge — whichever
    modality produced it — must land both endpoints in the SAME split,
    and at least one enforced pair must come from a non-text modality
    (otherwise the gate degenerates to the text-only cluster_split)."""
    import __spark_entry__ as entry
    from bun_csv_spark.multimodal.binary import (
        attach_bmp_payload,
        attach_pcm_wav_payload,
        extract_audio_fingerprint,
        extract_dhash,
    )
    from bun_csv_spark.operators.dedup import hamming_pairs64, neardup_pairs_minhash

    sf_dir = "/root/testdata/sf0.001"
    split = {
        r["doc_id"]: (r["split"], r["split_group"])
        for r in entry.q_multimodal_cluster_split(spark, sf_dir).collect()
    }

    docs = entry._t(spark, sf_dir, "documents").select("doc_id")
    twins = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("doc_id").alias("src")
    )
    tpairs = {
        (r["id_a"], r["id_b"])
        for r in neardup_pairs_minhash(
            entry._neardup_corpus(spark, sf_dir), "doc_id", "text",
            n_hashes=8, bands=4, shingle_k=5,
        ).select("id_a", "id_b").collect()
    }
    ih = (
        extract_dhash(attach_bmp_payload(docs, texture=True))
        .unionByName(
            extract_dhash(
                attach_bmp_payload(twins, src_col="src", bias=5, texture=True)
                .select("doc_id", "payload")
            )
        )
        .filter((F.col("width") >= 8) & (F.col("height") >= 8))
        .select("doc_id", "dhash")
    )
    ipairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs64(ih, "doc_id", "dhash", max_hamming=8)
        .select("id_a", "id_b").collect()
    }
    af = (
        extract_audio_fingerprint(attach_pcm_wav_payload(docs, texture=True))
        .unionByName(
            extract_audio_fingerprint(
                attach_pcm_wav_payload(twins, src_col="src", bias=4, texture=True)
                .select("doc_id", "payload")
            )
        )
        .select("doc_id", "fingerprint")
    )
    apairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs64(af, "doc_id", "fingerprint", max_hamming=8)
        .select("id_a", "id_b").collect()
    }

    edges = tpairs | ipairs | apairs
    assert edges, "no near-dup edges at all — fixture broken"
    for a, b in edges:
        assert split[a][0] == split[b][0], (a, b, split[a], split[b])
        assert split[a][1] == split[b][1], (a, b)

    nontext = (ipairs | apairs) - tpairs
    assert nontext, "every edge is a text edge — gate adds nothing over cluster_split"
    # and the planted perceptual twin (doc, doc+100000) must co-travel
    planted = [(a, b) for a, b in nontext if b == a + 100000 or a == b + 100000]
    assert planted, "no planted cross-modality twin pair found"


def test_incremental_day_pipeline_merge_associativity(spark):
    """The pipeline's merge step must not care HOW the days are grouped:
    merge(merge(d0, d1), d2) == merge(d0, merge(d1, d2)) for the agg
    state — the associativity a rolling daily job depends on (day N's
    state is itself a merge of all prior days)."""
    from bun_csv_spark.operators.maintenance import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    df = spark.range(3000).select(
        "id",
        (F.col("id") % 7).alias("k"),
        (F.col("id") * 37 % 1000).cast("long").alias("v"),
    )
    days = [df.filter(F.col("id") % 3 == d) for d in range(3)]
    s = [agg_state(d, ["k"], "v") for d in days]
    left = merge_agg_states(merge_agg_states(s[0], s[1], ["k"]), s[2], ["k"])
    right = merge_agg_states(s[0], merge_agg_states(s[1], s[2], ["k"]), ["k"])
    a = sorted(map(tuple, finalize_agg_state(left).collect()))
    b = sorted(map(tuple, finalize_agg_state(right).collect()))
    assert a == b
