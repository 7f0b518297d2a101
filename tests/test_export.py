"""Export-layer invariants: deterministic shard shuffle, sequence
packing, decontamination, repetition, PII scrub."""

from __future__ import annotations

from pyspark.sql import functions as F

from blog_parser_spark.operators import decontam, export, textstats
from blog_parser_spark.sources import io

from .conftest import SF_DIR


def _docs(spark):
    return io.read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_shard_assign_deterministic_and_dense(spark):
    docs = _docs(spark).select("doc_id")
    a = export.shard_assign(docs, "doc_id", 4)
    b = export.shard_assign(docs.repartition(7), "doc_id", 4)
    assert sorted(a.collect()) == sorted(b.collect())
    # positions are dense 0..n_i-1 within each shard
    per = (a.groupBy("shard")
           .agg(F.count("*").alias("n"), F.min("pos").alias("lo"),
                F.max("pos").alias("hi"), F.count_distinct("pos").alias("d"))
           .collect())
    assert len(per) == 4
    for r in per:
        assert (r.lo, r.hi, r.d) == (0, r.n - 1, r.n)


def test_pack_sequences_chunk_invariants(spark):
    budget = 100
    toks = _docs(spark).select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    packed = export.pack_sequences(toks, "doc_id", "n_tokens",
                                   budget=budget, n_shards=4)
    rows = sorted(packed.collect(), key=lambda r: (r.shard, r.pos))
    # reconstruct the token stream per shard: prefix sums must match the
    # (seq_id, seq_offset) coordinates exactly, and every doc starts at
    # prefix = seq_id * budget + seq_offset
    prefix: dict[int, int] = {}
    for r in rows:
        p = prefix.get(r.shard, 0)
        assert r.seq_id == p // budget
        assert r.seq_offset == p % budget
        prefix[r.shard] = p + r.n_tokens
    # seq_ids within a shard are non-decreasing and start at 0
    for shard in prefix:
        seqs = [r.seq_id for r in rows if r.shard == shard]
        assert seqs[0] == 0
        assert all(a <= b for a, b in zip(seqs, seqs[1:]))


def test_chunk_overlap_tiling_reconstructs_and_overlaps(spark):
    size, stride = 16, 12
    docs = _docs(spark).filter("doc_id < 40")
    chunks = export.chunk_overlap(docs, "doc_id", "text",
                                  chunk_size=size, stride=stride)
    orig = {r.doc_id: r.text.split(" ") for r in docs.collect()}
    per_doc: dict[int, list] = {}
    for r in chunks.collect():
        per_doc.setdefault(r.doc_id, []).append(r)
    assert set(per_doc) == set(orig)
    for d, rows in per_doc.items():
        rows.sort(key=lambda r: r.chunk_idx)
        toks = orig[d]
        rebuilt: list[str] = []
        for i, r in enumerate(rows):
            ct = r.chunk_text.split(" ")
            assert r.chunk_start == r.chunk_idx * stride
            assert r.chunk_tokens == len(ct)
            if i < len(rows) - 1:
                # interior chunks are full and overlap the next by
                # size - stride identical tokens
                nxt = rows[i + 1].chunk_text.split(" ")
                assert ct[stride:] == nxt[:size - stride]
                rebuilt += ct[:stride]
            else:
                rebuilt += ct
        assert rebuilt == toks


def test_chunk_overlap_validates_params(spark):
    docs = _docs(spark).limit(1)
    import pytest
    with pytest.raises(ValueError):
        export.chunk_overlap(docs, "doc_id", "text", chunk_size=0, stride=1)
    with pytest.raises(ValueError):
        export.chunk_overlap(docs, "doc_id", "text", chunk_size=8, stride=9)


def test_sample_mixture_equals_per_group_fraction(spark):
    from blog_parser_spark.operators import sampling
    docs = io.read_table(spark, SF_DIR, "documents") \
        .select("doc_id", "lang")
    weights = {"en": 100_000, "fr": 500_000, "zh": 1_000_000}
    mixed = sampling.sample_mixture(docs, "doc_id", "lang", weights)
    got = sorted(mixed.collect())
    expected = []
    for g, ppm in weights.items():
        expected += sampling.sample_fraction(
            docs.filter(F.col("lang") == g), "doc_id", ppm).collect()
    assert got == sorted(expected)
    # unlisted groups drop out entirely with default_ppm=0
    assert mixed.filter(~F.col("lang").isin(*weights)).count() == 0
    # samples nest as a group's weight grows
    wider = sampling.sample_mixture(docs, "doc_id", "lang",
                                    {**weights, "en": 300_000})
    assert set(r.doc_id for r in got) <= set(r.doc_id
                                             for r in wider.collect())


def test_contamination_flags_planted_copies(spark):
    docs = _docs(spark)
    eval_docs = docs.filter("doc_id < 20")
    clean = docs.filter("doc_id >= 20")
    planted = (docs.filter("doc_id < 3")
               .select((F.col("doc_id") + 900000).alias("doc_id"), "text"))
    out = decontam.contamination(clean.unionByName(planted), eval_docs)
    hits = {r.doc_id: r for r in out.filter("doc_id >= 900000").collect()}
    assert set(hits) == {900000, 900001, 900002}
    for r in hits.values():
        assert r.n_overlap == r.n_grams > 0
        assert r.overlap_frac == 1.0


def test_repetition_separates_boilerplate(spark):
    docs = _docs(spark).filter("doc_id < 50")
    w6 = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 6))
    boiler = (docs.filter("doc_id < 5")
              .select((F.col("doc_id") + 800000).alias("doc_id"),
                      F.concat_ws(" ", F.array_repeat(w6, 10)).alias("text")))
    rep = textstats.repetition(docs.unionByName(boiler))
    rows = {r.doc_id: r for r in rep.collect()}
    base_max = max(rows[d].top_gram_frac for d in rows if d < 800000)
    for d in range(800000, 800005):
        # the repeated 6-word block dominates: its seam 2-gram occurs 9x
        assert rows[d].top_gram_frac > base_max
        assert rows[d].dup_word_ratio > 0.8


def test_pii_scrub_counts_and_idempotence(spark):
    docs = _docs(spark).filter("doc_id < 10").select(
        "doc_id",
        F.concat("text", F.lit(" mail me at a.b+c@x.y or call 123 45"))
        .alias("text"))
    out = textstats.pii_scrub(docs)
    for r in out.collect():
        assert r.n_emails >= 1
        assert r.n_numbers >= 2
    # scrubbing already-scrubbed text is a no-op on the placeholders
    scrubbed = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", textstats.EMAIL_RE, "<EMAIL>"),
            textstats.NUMBER_RE, "<NUM>").alias("text"))
    again = textstats.pii_scrub(scrubbed)
    assert again.filter("n_emails > 0 OR n_numbers > 0").count() == 0
