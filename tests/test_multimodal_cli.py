"""Multimodal plumbing + CLI surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from katta_spark.multimodal import extract_features, sample_frames, synth_media


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 300, seed=7).cache()


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 300
    again = synth_media(spark, 300, seed=7)
    assert media.exceptAll(again).count() == 0
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features(media):
    feats = extract_features(media, feat_dim=16)
    rows = feats.collect()
    assert len(rows) == 300
    assert all(len(r.features) == 16 for r in rows)
    # deterministic: same row → same features
    again = {r.media_id: r.features for r in extract_features(media, 16).collect()}
    assert all(again[r.media_id] == r.features for r in rows)


def test_sample_frames(media):
    frames = sample_frames(media, every_ms=10_000)
    vids = media.where(F.col("kind") == "video").collect()
    want = sum(max(1, r.duration_ms // 10_000) for r in vids)
    got = frames.collect()
    assert len(got) == want
    assert all(len(r.frame_payload) == 32 for r in got)
    # frame_idx dense per media_id
    per = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")
    )
    assert per.where(F.col("mx") != F.col("n") - 1).count() == 0


def test_cli_end_to_end(spark, tiny_transcripts, tmp_path, capsys):
    """Drive the CLI functions in-process (same SparkSession via getOrCreate)."""
    from katta_spark import cli

    src = str(tmp_path / "tx.parquet")
    tiny_transcripts.write.mode("overwrite").parquet(src)
    idx = str(tmp_path / "idx")
    assert cli.main(["addIndex", idx, src, "--num-shards", "2"]) == 0
    out = capsys.readouterr().out
    assert json.loads(out.strip().splitlines()[-1])["n_docs"] == 2000

    # with a count: totalHits + hit table (Katta.java:823-838)
    assert cli.main(["search", idx, "hotalpha w00011", "-k", "5"]) == 0
    out = capsys.readouterr().out
    total = int(out.split()[0])
    assert total > 5 and "hits found in" in out
    assert len([ln for ln in out.splitlines() if ln.strip()[0:1].isdigit()]) >= 5

    # without a count: count-only form (Katta.java:839-846)
    assert cli.main(["search", idx, "hotalpha w00011"]) == 0
    out = capsys.readouterr().out
    assert int(out.split()[0]) == total and "Hits found in" in out

    assert cli.main(["count", idx, "hotalpha"]) == 0
    n = int(capsys.readouterr().out.strip().splitlines()[-1])
    assert n > 100

    # minimum-should-match narrows the total; synonyms widen it
    assert cli.main(
        ["search", idx, "hotalpha w00011", "-k", "5",
         "--min-should-match", "2"]
    ) == 0
    msm_total = int(capsys.readouterr().out.split()[0])
    assert 0 < msm_total < total
    assert cli.main(
        ["search", idx, "hotalpha w00011", "-k", "5",
         "--synonyms", "hotalpha=hotbeta"]
    ) == 0
    syn_total = int(capsys.readouterr().out.split()[0])
    assert syn_total > total

    assert cli.main(["check", idx]) == 0
    report = json.loads(capsys.readouterr().out)
    assert report["num_shards"] == 2 and len(report["shards"]) == 2
    assert all(s["terms"] > 0 for s in report["shards"])

    # grouped search needs a docvalue column — build a sidecar-carrying
    # index and group by the keyword-ish 'role' column
    gidx = str(tmp_path / "gidx")
    assert cli.main(
        ["addIndex", gidx, src, "--num-shards", "2",
         "--docvalue-cols", "role"]
    ) == 0
    capsys.readouterr()
    assert cli.main(
        ["group", gidx, "hotalpha", "role", "--k-groups", "2",
         "--k-docs", "2"]
    ) == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    assert "Total" in lines[0] and 3 <= len(lines) <= 5


def test_cli_generate_index(spark, tmp_path, capsys):
    """generateIndex parity: Katta.java:850-876 builds a synthetic benchmark
    index searchable on text terms and the NOT_ANALYZED keyword field."""
    from katta_spark import cli

    idx = str(tmp_path / "genidx")
    assert cli.main(
        ["generateIndex", idx, "20", "500", "--num-shards", "2"]
    ) == 0
    out = capsys.readouterr().out
    assert "Index created with : 500 documents in" in out
    assert json.loads(out.strip().splitlines()[-1])["n_docs"] == 500

    assert cli.main(["search", idx, "hotalpha", "-k", "5"]) == 0
    out = capsys.readouterr().out
    assert int(out.split()[0]) > 5 and "hits found in" in out
    # the keyword field is searchable (SampleIndexGenerator's NOT_ANALYZED key)
    assert cli.main(["count", idx, "role:user"]) == 0
    assert int(capsys.readouterr().out.strip().splitlines()[-1]) > 0


def test_cli_registry_pattern_search(spark, tiny_transcripts, tmp_path, capsys):
    """bin/katta search '<patterns>' parity via --root: names, regex
    ('index[12]'), and '*' resolve against the registry (Client.java:
    425-456) and multi-match patterns run the stats-combining multi-index
    search, equal to the whole corpus."""
    from katta_spark import cli
    from katta_spark.build import build_index

    root = tmp_path / "registry"
    root.mkdir()
    whole = str(tmp_path / "whole")
    build_index(spark, tiny_transcripts, whole, num_shards=2)
    for parity in (1, 2):
        build_index(
            spark,
            tiny_transcripts.where(
                F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(2))
                == parity - 1
            ),
            str(root / f"index{parity}"),
            num_shards=2,
        )

    # regex pattern resolves BOTH split indexes; totals equal the whole
    assert cli.main(
        ["search", "index[12]", "hotalpha w00011", "-k", "5",
         "--root", str(root)]
    ) == 0
    out_pat = capsys.readouterr().out
    assert cli.main(["search", whole, "hotalpha w00011", "-k", "5"]) == 0
    out_whole = capsys.readouterr().out
    assert int(out_pat.split()[0]) == int(out_whole.split()[0]) > 0
    # per-hit doc ids + scores match the whole-corpus table line-for-line
    tail = lambda s: [
        " ".join(ln.split()[2:]) for ln in s.splitlines()
        if ln.strip()[:1].isdigit() and "hits found" not in ln
    ]
    assert tail(out_pat) == tail(out_whole)

    # '*' resolves every registered index (the whole dir is NOT registered)
    assert cli.main(
        ["search", "*", "hotalpha", "-k", "3", "--root", str(root)]
    ) == 0
    assert "hits found in" in capsys.readouterr().out

    # a no-match pattern union errors clearly
    with pytest.raises(ValueError, match="no index matches"):
        cli.main(["search", "nosuch.*", "hotalpha", "-k", "3",
                  "--root", str(root)])
