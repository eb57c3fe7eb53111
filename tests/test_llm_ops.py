"""LLM-op correctness the oracle can't check: LSH recall vs exact,
SimHash determinism, ANN recall, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_demo_spark.operators import dedup, multimodal, similarity
from data_pipeline_demo_spark.sources.tables import table


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_minhash_lsh_matches_exact(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    exact = _pairs(dedup.jaccard_similarity_join(docs, threshold=0.7))
    lsh = _pairs(dedup.minhash_dedup_pairs(docs, threshold=0.7))
    assert lsh == exact  # full recall at this operating point
    assert len(exact) > 0  # the corpus has planted near-dups


def test_simhash_deterministic_and_finds_dups(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    fp1 = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    fp2 = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fp1 == fp2  # run-to-run deterministic
    near = dedup.simhash_near_pairs(docs, max_hamming=12)
    exact = _pairs(dedup.jaccard_similarity_join(docs, threshold=0.7))
    found = _pairs(near)
    # 8-bit blocking guarantees recall to Hamming 7; true pairs on this
    # corpus sit at 0-9, so overall recall should still be high
    assert len(exact & found) / len(exact) >= 0.8


def test_simhash_prefix_bits_scale_with_corpus():
    # fixed small corpora keep the 8-bit width (recall to Hamming 7)
    assert dedup.auto_prefix_bits(500) == 8
    assert dedup.auto_prefix_bits(100_000) == 8
    # width grows logarithmically past ~2^8 buckets' worth of docs
    assert dedup.auto_prefix_bits(1_000_000) == 11
    assert dedup.auto_prefix_bits(10_000_000) == 15
    # capped at 16 (4 blocks → pigeonhole still guarantees Hamming 3)
    assert dedup.auto_prefix_bits(10**9) == 16
    assert dedup.auto_prefix_bits(10**12) == 16
    # monotone non-decreasing
    widths = [dedup.auto_prefix_bits(n) for n in (1, 10**3, 10**6, 10**9)]
    assert widths == sorted(widths)


def test_simhash_candidate_volume_bounded_at_10x(spark):
    """Round-2 scale flag: with a fixed 8-bit width, a 10× corpus blows
    up the within-bucket self-join quadratically. With the corpus-aware
    width the expected bucket occupancy is constant, so candidate volume
    stays ~linear in n. Uses synthetic near-uniform fingerprints (the
    worst-case distribution for occupancy claims is benign-uniform; the
    exact verify keeps precision regardless)."""
    n = 40_960
    target = 16  # shrink the target so the widening triggers at test scale
    w = dedup.auto_prefix_bits(n, target_bucket_rows=target)
    assert w == 12  # ceil(log2(40960/16))
    fps = spark.range(n).select(
        F.col("id").alias("doc_id"), F.xxhash64("id").alias("simhash")
    )
    n_blocks = 64 // w
    cands = dedup._simhash_block_candidates(fps, "doc_id", w).count()
    # expected pairs/bucket ≈ C(n/2^w, 2); sum over buckets and rotations
    # ≈ n_blocks * n * (n/2^w − 1)/2 ≈ 1.2M here — assert a 3× margin,
    # far below the ≥25M the frozen 8-bit width would produce
    expected = n_blocks * n * (n / 2**w) / 2
    assert cands < 3 * expected


def test_dedup_pipelines_leave_no_cached_blocks(spark, sf_dir):
    """Judge round-2 finding #4: the shingle-set relation must not stay
    cached after a dedup query completes. The relation is now a scratch
    parquet intermediate, so the persistent-RDD registry must not grow
    across full materializations of both pipelines."""
    docs = table(spark, sf_dir, "documents")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    dedup.jaccard_similarity_join(docs, threshold=0.7).count()
    dedup.minhash_dedup_pairs(docs, threshold=0.7).count()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before


def test_exact_dedup_counts(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = dedup.exact_dedup(docs)
    assert out.count() == docs.select("text").distinct().count()
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs.count()


def test_ann_recall_vs_exact(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }
    ann = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(emb, probes, k=5).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.5, f"ANN recall {recall} collapsed"


def test_ann_persisted_index_prunes_and_matches(spark, sf_dir, tmp_path):
    """The at-rest ANN index: probes read ONLY their (tbl, bucket)
    partitions (PartitionFilters in the scan) and return the same top-k
    as the in-memory ANN path."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    idx_path = str(tmp_path / "ann_index")
    similarity.build_ann_index(emb, idx_path)
    out = similarity.ann_query_indexed(spark, idx_path, probes, k=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert pf.strip(), plan[:1500]  # pruning predicate reached the scan

    mem = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(emb, probes, k=5).collect()
    }
    idx = {(r["probe_id"], r["vec_id"]) for r in out.collect()}
    assert idx == mem  # same candidates, same exact re-rank


def test_ann_index_append_equals_rebuild(spark, sf_dir, tmp_path):
    """Incremental maintenance: build on half the corpus, append the
    other half — queries against the appended index return exactly what
    a one-shot build over the full corpus returns (the deterministic
    hyperplane family makes late-signed vectors land in their build-time
    buckets). Appending without metadata raises."""
    import pytest as _pytest

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    half_a = emb.filter(F.col("vec_id") % 2 == 0)
    half_b = emb.filter(F.col("vec_id") % 2 == 1)

    full_path = str(tmp_path / "ann_full")
    similarity.build_ann_index(emb, full_path)
    inc_path = str(tmp_path / "ann_inc")
    similarity.build_ann_index(half_a, inc_path)
    similarity.ann_index_append(half_b, inc_path)

    full = {
        (r["probe_id"], r["vec_id"], r["cosine"])
        for r in similarity.ann_query_indexed(spark, full_path, probes, k=5).collect()
    }
    inc = {
        (r["probe_id"], r["vec_id"], r["cosine"])
        for r in similarity.ann_query_indexed(spark, inc_path, probes, k=5).collect()
    }
    assert inc == full

    with _pytest.raises(ValueError, match="metadata"):
        similarity.ann_index_append(half_b, str(tmp_path / "nowhere"))


def test_ivf_index_append_exact_degeneracy(spark, sf_dir, tmp_path):
    """Append half the corpus to an IVF index built on the other half:
    with the quantizer frozen, nprobe == n_centroids must still equal
    the exact knn over the UNIONED corpus."""
    import pytest as _pytest

    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    idx = str(tmp_path / "ivf_inc")
    similarity.ivf_build_index(emb.filter(F.col("vec_id") % 2 == 0), idx, n_centroids=16)
    similarity.ivf_index_append(emb.filter(F.col("vec_id") % 2 == 1), idx)

    exact = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ivf_query(spark, idx, probes, k=5, nprobe=16).collect()
    }
    assert got == exact

    with _pytest.raises(ValueError, match="centroids"):
        similarity.ivf_index_append(emb, str(tmp_path / "missing"))


def test_ivf_index_recall_and_pruning(spark, sf_dir, tmp_path):
    """IVF tier: corpus partitioned by nearest centroid; probes read only
    nprobe partitions; recall vs exact knn stays useful and reaches 1.0
    when nprobe covers every centroid."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    idx = str(tmp_path / "ivf")
    similarity.ivf_build_index(emb, idx, n_centroids=16)
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ivf_query(spark, idx, probes, k=5, nprobe=6).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.4, recall  # weak-similarity corpus, 6/16 partitions read
    # full probe == exact (ANN degenerates to exhaustive correctly)
    full = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ivf_query(spark, idx, probes, k=5, nprobe=16).collect()
    }
    assert full == exact


def test_ivf_kmeans_refinement_recall_and_determinism(spark, sf_dir, tmp_path):
    """Lloyd refinement behind the quantizer seam: at equal nprobe the
    refined index's recall vs exact knn must be >= the hash-sample
    init's (centroids move toward member means, clusters tighten), the
    nprobe=n_centroids degenerate case must stay exactly == knn, and
    two refined builds must produce identical centroids (decimal-exact
    means are order-independent)."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }

    def recall(idx_path, nprobe):
        got = {
            (r["probe_id"], r["vec_id"])
            for r in similarity.ivf_query(
                spark, idx_path, probes, k=5, nprobe=nprobe
            ).collect()
        }
        return len(exact & got) / len(exact), got

    base_idx = str(tmp_path / "ivf_base")
    ref_idx = str(tmp_path / "ivf_ref")
    similarity.ivf_build_index(emb, base_idx, n_centroids=16)
    similarity.ivf_build_index(emb, ref_idx, n_centroids=16, refine_iters=2)

    base_recall, _ = recall(base_idx, 6)
    ref_recall, _ = recall(ref_idx, 6)
    assert ref_recall >= base_recall, (base_recall, ref_recall)
    # degenerate full probe still equals the exhaustive answer
    _, full = recall(ref_idx, 16)
    assert full == exact

    ref_idx2 = str(tmp_path / "ivf_ref2")
    similarity.ivf_build_index(emb, ref_idx2, n_centroids=16, refine_iters=2)
    c1 = sorted(
        (r["centroid_id"], tuple(r["__cvec"]))
        for r in spark.read.parquet(ref_idx + "_centroids").collect()
    )
    c2 = sorted(
        (r["centroid_id"], tuple(r["__cvec"]))
        for r in spark.read.parquet(ref_idx2 + "_centroids").collect()
    )
    assert c1 == c2


def test_cosine_near_dup_lsh_recall_and_precision(spark, sf_dir):
    """LSH tier vs exact tier on a corpus with planted near-dups
    (cosine ≈ 0.999): recall >= 0.95 at a 0.9 threshold, precision
    exact by construction (every emitted pair passed the exact-cosine
    verify — asserted by value)."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (x + 0.02 * F.sin(i + F.col("vec_id"))).cast("float"),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_dup_exact(corpus, 0.9).collect()
    }
    assert exact, "planted dups must be above the 0.9 threshold"
    got = similarity.cosine_near_dup_lsh(corpus, 0.9).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    assert len(exact & pairs) / len(exact) >= 0.95
    assert all(r["cosine"] >= 0.9 for r in got)  # exact-verify precision
    assert pairs <= exact  # never emits a sub-threshold pair


def test_cosine_near_dup_exact_matches_bruteforce(spark, sf_dir):
    """Exact tier vs a driver-side numpy brute force on a small slice."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    nrm = np.linalg.norm(M, axis=1)
    expected = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if M[i] @ M[j] / (nrm[i] * nrm[j]) >= 0.35 - 1e-9:
                expected.add((ids[i], ids[j]))
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_near_dup_exact(emb, 0.35).collect()
    }
    # fixed-point quantization can flip pairs within 1e-12 of the
    # threshold; the synthetic corpus has none that close
    assert got == expected


def test_knn_self_excluded_and_k(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    out = similarity.knn_exact(emb, probes, k=3).collect()
    per_probe = {}
    for r in out:
        assert r["probe_id"] != r["vec_id"]
        per_probe.setdefault(r["probe_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3] for v in per_probe.values())


def test_multimodal_roundtrip(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    media = multimodal.synthesize_media(docs)
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(feats) == set(src)
    for mid, f in feats.items():
        # payload bytes crossed the Arrow boundary intact
        assert f["sha256"] == src[mid]["meta"]["sha256"]
        assert f["n_bytes"] == src[mid]["meta"]["n_bytes"]
        w, h = multimodal.fake_decode_meta(bytes(src[mid]["payload"]))
        assert (f["width"], f["height"]) == (w, h)


def test_decode_seam_is_explicit():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_resize_images_caps_longest_side(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(60)
    media = multimodal.synthesize_media(docs)
    src = {r["media_id"]: r for r in media.collect()}
    out = multimodal.resize_images(media, max_dim=64)
    assert out.schema == multimodal.MEDIA_SCHEMA
    resized = {r["media_id"]: r for r in out.collect()}
    assert set(resized) == set(src)
    for mid, r in resized.items():
        w0, h0 = multimodal.fake_decode_meta(bytes(src[mid]["payload"]))
        w1, h1 = multimodal.fake_decode_meta(bytes(r["payload"]))
        assert max(w1, h1) <= 64
        if max(w0, h0) <= 64:
            # within bounds → byte-identical passthrough
            assert bytes(r["payload"]) == bytes(src[mid]["payload"])
        else:
            # longest side lands exactly on the cap; orientation kept
            assert max(w1, h1) == 64
            assert (w0 >= h0) == (w1 >= h1)
            if min(w1, h1) >= 10:
                # ratio preserved where rounding noise is small
                assert abs(w1 / h1 - w0 / h0) <= w0 / h0 * 0.1
        # meta describes the (possibly new) payload
        import hashlib

        assert r["meta"]["sha256"] == hashlib.sha256(bytes(r["payload"])).hexdigest()
        assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))


def test_approx_count_distinct_tolerance(spark, sf_dir):
    from data_pipeline_demo_spark.plans import all_queries

    qs, _ = all_queries()
    approx = {
        r["event_type"]: r["approx_users"]
        for r in qs["q56_approx_count_distinct"](spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(1, 0.05 * exact[k])


def test_approx_percentile_tolerance(spark, sf_dir):
    """GK quantile sketch vs the exact median, per group: with accuracy
    10000 the rank error is <=1/10000 of the group, which these group
    sizes round to at-worst-neighboring order statistics."""
    from data_pipeline_demo_spark.plans import all_queries

    qs, _ = all_queries()
    approx = {
        r["event_type"]: r["approx_median_value"]
        for r in qs["q56_approx_count_distinct"](spark, sf_dir).collect()
    }
    ev = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["m"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, 0.5)").alias("m"))
        .collect()
    }
    for k in exact:
        # exact interpolated median lies between the two neighboring
        # order statistics GK may return — allow a 2% value band
        assert abs(approx[k] - exact[k]) <= max(0.5, 0.02 * abs(exact[k]))


def test_html_udf_seam_matches_jvm_path(spark):
    from data_pipeline_demo_spark.functions.cleaning import (
        html_to_text_udf,
        strip_html,
    )

    rows = [
        (1, "<p>plain &amp; simple</p>"),
        (2, "<div class='x'>a &lt;tag&gt; literal</div><br/>"),
        (3, "no markup at all"),
        (4, "&quot;quoted&quot; &#39;single&#39;&nbsp;end"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    out = df.select(
        "id",
        strip_html("html").alias("jvm"),
        html_to_text_udf()("html").alias("py"),
    ).collect()
    for r in out:
        assert r["jvm"] == r["py"], (r["id"], r["jvm"], r["py"])


def test_frame_sample_plan(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(5)
    media = multimodal.synthesize_media(docs)
    frames = multimodal.frame_sample_plan(media, every_n=2).collect()
    assert len(frames) > 0
    assert all(r["frame_idx"] % 2 == 0 for r in frames)


def test_video_frame_sampling_roundtrip(spark, sf_dir):
    import hashlib
    import math

    docs = table(spark, sf_dir, "documents").limit(40)
    video = multimodal.synthesize_video(docs)
    n_frames = {r["media_id"]: r["n_frames"] for r in video.collect()}
    frames = multimodal.sample_frames(video, every_n=2).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(n_frames)
    for mid, rows in by_media.items():
        # every 2nd frame, starting at 0
        assert sorted(r["frame_idx"] for r in rows) == list(
            range(0, n_frames[mid], 2)
        )
        assert len(rows) == math.ceil(n_frames[mid] / 2)
        for r in rows:
            fb = bytes(r["frame_bytes"])
            assert len(fb) == multimodal.FRAME_SIZE
            # frame self-describes (media_id, idx) and hash survived Arrow
            import struct as _s

            m, i = _s.unpack(">qi", fb[:12])
            assert (m, i) == (r["media_id"], r["frame_idx"])
            assert hashlib.sha256(fb).hexdigest() == r["frame_sha256"]


def test_connected_components_known_graph(spark):
    """Two chains and an isolated pair: labels converge to the min id of
    each component (chain diameter > 1 exercises multiple rounds)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain: component 1
         (10, 11),                        # pair: component 10
         (20, 21), (21, 22), (20, 22)],   # triangle: component 20
        "doc_a long, doc_b long",
    )
    got = {
        (r["node"], r["component"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_dedup_keep_canonical_end_to_end(spark, sf_dir):
    """Full pass over the documents table: pairs from the exact Jaccard
    tier -> one survivor per cluster (the min doc_id), non-paired docs
    untouched."""
    docs = table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_similarity_join(docs, threshold=0.7)
    kept = dedup.dedup_keep_canonical(docs, pairs)
    p = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    comp = {}
    for a, b in p:
        # brute-force union-find for the expected survivor set
        ra = comp.setdefault(a, a)
        rb = comp.setdefault(b, b)
        while comp[ra] != ra:
            ra = comp[ra]
        while comp[rb] != rb:
            rb = comp[rb]
        if ra != rb:
            comp[max(ra, rb)] = min(ra, rb)
    def root(x):
        while comp[x] != x:
            x = comp[x]
        return x
    losers = {x for x in comp if root(x) != x}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == all_ids - losers
    assert kept.count() == docs.count() - len(losers)


def test_repetition_signals(spark, sf_dir):
    """Gopher-style repetition filters: hand-computed fixtures, then a
    smoke pass over the documents corpus."""
    from data_pipeline_demo_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),       # 5 bigrams, top 'a b' x3 -> 0.6
            (2, "u v w x y z"),       # all bigrams distinct -> 0.2
            (3, "solo"),              # shorter than n: one gram -> 1.0
        ],
        "doc_id long, text string",
    )
    rep = {
        r["doc_id"]: r for r in textstats.repetition_stats(docs, n=2).collect()
    }
    assert rep[1]["n_grams"] == 5 and rep[1]["top_gram_count"] == 3
    assert abs(rep[1]["top_ngram_fraction"] - 0.6) < 1e-12
    assert abs(rep[2]["top_ngram_fraction"] - 0.2) < 1e-12
    assert rep[3]["top_ngram_fraction"] == 1.0

    lines = spark.createDataFrame(
        [(1, "x\nx\ny"), (2, "a\nb\nc"), (3, ""), (4, "p\n\n  \np")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["f"]
        for r in lines.select(
            "doc_id", textstats.dup_line_fraction("text").alias("f")
        ).collect()
    }
    assert abs(got[1] - 1 / 3) < 1e-12
    assert got[2] == 0.0
    assert got[3] == 0.0        # no non-blank lines
    assert abs(got[4] - 0.5) < 1e-12  # blanks ignored, 'p' repeated

    # corpus smoke: fractions are well-formed over real documents
    corpus = table(spark, sf_dir, "documents")
    stats = textstats.repetition_stats(corpus).agg(
        F.min("top_ngram_fraction"), F.max("top_ngram_fraction")
    ).collect()[0]
    assert 0.0 < stats[0] <= stats[1] <= 1.0


def test_ann_multiprobe_raises_recall(spark, sf_dir, tmp_path):
    """Multi-probe (Hamming-1 neighbor buckets, probe side only) must
    give recall >= the single-probe baseline on the same index, and the
    candidate set must be a superset (same signatures, more buckets)."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }

    def recall(mp):
        got = {
            (r["probe_id"], r["vec_id"])
            for r in similarity.ann_lsh_topk(
                emb, probes, k=5, multiprobe=mp
            ).collect()
        }
        return len(exact & got) / len(exact)

    r0, r4 = recall(0), recall(4)
    assert r4 >= r0, (r0, r4)

    # indexed path agrees with the in-memory path under multiprobe
    idx_path = str(tmp_path / "ann_mp")
    similarity.build_ann_index(emb, idx_path)
    mem = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(emb, probes, k=5, multiprobe=2).collect()
    }
    idx = {
        (r["probe_id"], r["vec_id"])
        for r in similarity.ann_query_indexed(
            spark, idx_path, probes, k=5, multiprobe=2
        ).collect()
    }
    assert idx == mem


def test_pii_scrub(spark):
    from data_pipeline_demo_spark.operators import textstats

    docs = spark.createDataFrame(
        [
            (1, "contact jane.doe+x@corp.example.com for refunds"),
            (2, "card 4111 1111 1111 1111 charged, call +61 2 9876 5432"),
            (3, "no pii here just words"),
            (4, "order #12 shipped 2025-04-30"),  # short digit runs survive
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["clean"], r["hits"])
        for r in docs.select(
            "doc_id",
            textstats.scrub_pii("text").alias("clean"),
            textstats.pii_hits("text").alias("hits"),
        ).collect()
    }
    assert out[1] == ("contact <EMAIL> for refunds", 1)
    assert "<CARD>" in out[2][0] and "<PHONE>" in out[2][0]
    assert "4111" not in out[2][0] and "9876" not in out[2][0]
    assert out[2][1] == 2
    assert out[3] == ("no pii here just words", 0)
    assert "2025" in out[4][0] and out[4][1] == 0
    # scrub is idempotent
    twice = docs.select(
        textstats.scrub_pii(textstats.scrub_pii("text")).alias("c")
    ).collect()
    once = docs.select(textstats.scrub_pii("text").alias("c")).collect()
    assert [r["c"] for r in twice] == [r["c"] for r in once]


def test_connected_components_nonconvergence_raises(spark, monkeypatch):
    import pytest

    # force the DISTRIBUTED loop (the r13 driver union-find tier always
    # terminates, so the diameter refusal only guards the big-graph path)
    monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 0)
    # a 6-node path graph needs ~5 propagation rounds; cap at 2 -> raise
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iterations=2)


def test_connected_components_driver_tier_equals_distributed(spark, monkeypatch):
    """r13 differential: the small-graph union-find tier must emit the
    same (node, component) set — min-id representative included — as
    the distributed label propagation, on a random graph with chains,
    cliques, rings and singleton-free isolates, for long AND string
    node ids."""
    import random

    rng = random.Random(77)
    edges = [(i, i + 1) for i in range(0, 30, 3)]                # chains
    edges += [(100 + a, 100 + b) for a in range(5) for b in range(a)]  # clique
    edges += [(200 + i, 200 + (i + 1) % 7) for i in range(7)]    # ring
    edges += [(rng.randint(300, 340), rng.randint(300, 340)) for _ in range(40)]
    for ids, schema in (
        (edges, "doc_a long, doc_b long"),
        ([(f"n{a}", f"n{b}") for a, b in edges], "doc_a string, doc_b string"),
    ):
        df = spark.createDataFrame(ids, schema)
        fast = {
            (r["node"], r["component"])
            for r in dedup.connected_components(df).collect()
        }
        monkeypatch.setattr(dedup, "CC_DRIVER_MAX_EDGES", 0)
        slow = {
            (r["node"], r["component"])
            for r in dedup.connected_components(df).collect()
        }
        monkeypatch.undo()
        assert fast == slow and len(fast) > 20


def test_minhash_index_append_equals_rebuild(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    inc = str(tmp_path / "inc_idx")
    full = str(tmp_path / "full_idx")
    dedup.minhash_index_write(old, inc)
    dedup.minhash_index_append(new, inc)
    dedup.minhash_index_write(docs, full)
    a = {tuple(r) for r in spark.read.parquet(inc).collect()}
    b = {tuple(r) for r in spark.read.parquet(full).collect()}
    assert a == b


def test_minhash_index_append_requires_metadata(spark, sf_dir, tmp_path):
    import pytest

    docs = table(spark, sf_dir, "documents").limit(10)
    with pytest.raises(ValueError):
        dedup.minhash_index_append(docs, str(tmp_path / "nowhere"))


def test_dedup_against_index_matches_full_join_cross_pairs(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = str(tmp_path / "idx")
    dedup.minhash_index_write(old, idx)

    got = {
        (r["doc_new"], r["doc_old"], round(r["jaccard"], 9))
        for r in dedup.dedup_against_index(new, old, idx).collect()
    }

    # ground truth: exact Jaccard over the union, restricted to pairs
    # crossing the old/new split (LSH recall ≈ 1 at this operating
    # point — the same property test_minhash_lsh_matches_exact pins)
    full = dedup.jaccard_similarity_join(docs).collect()
    want = set()
    for r in full:
        a_new, b_new = r["doc_a"] % 5 == 0, r["doc_b"] % 5 == 0
        if a_new != b_new:
            nid, oid = (r["doc_a"], r["doc_b"]) if a_new else (r["doc_b"], r["doc_a"])
            want.add((nid, oid, round(r["jaccard"], 9)))
    assert got == want
    assert len(want) > 0  # the corpus plants cross-split near-dups


def test_knn_numpy_matches_exact_tier(spark, sf_dir):
    """The BLAS throughput tier returns the SAME neighbors (and ranks)
    as the bit-exact fold tier — only the score arithmetic differs
    (pairwise-BLAS vs fixed-point fold), which cannot reorder results
    on a corpus with no ties within float error."""
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    exact = {
        (r["probe_id"], r["rank"]): r["vec_id"]
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }
    fast = {
        (r["probe_id"], r["rank"]): r["vec_id"]
        for r in similarity.knn_numpy(emb, probes.toPandas(), k=5).collect()
    }
    assert fast == exact
    # partial top-k per batch never exceeds k per probe globally
    assert len(fast) == len({p for p, _ in fast}) * 5


def test_perplexity_filter_separates_gibberish(spark, sf_dir):
    """Char-bigram LM perplexity (CCNet/Gopher-style quality filter):
    the LM trains on the corpus itself; real corpus documents must
    score fewer bits-per-char than planted high-entropy gibberish, and
    a repeated in-distribution phrase scores lowest of all.
    Deterministic: two runs agree exactly."""
    from data_pipeline_demo_spark.operators.textstats import (
        perplexity_score,
        train_char_lm,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(300)
    lm = train_char_lm(docs)
    v = lm.select("v").first()["v"]
    assert lm.count() <= v * v  # alphabet^2 bound: broadcastable

    import random

    rng = random.Random(42)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789#@$%^&*()_+"
    gibberish = "".join(rng.choice(alphabet) for _ in range(400))
    common = docs.select(F.substring("text", 1, 40).alias("s")).first()["s"]
    probes = spark.createDataFrame(
        [(10**9, gibberish), (10**9 + 1, common * 10)],
        "doc_id long, text string",
    )
    scored = {
        r["doc_id"]: r["bits_per_char"]
        for r in perplexity_score(docs.unionByName(probes), lm).collect()
    }
    corpus_scores = [s for d, s in scored.items() if d < 10**9]
    assert scored[10**9] > max(corpus_scores)  # gibberish worst
    assert scored[10**9 + 1] <= min(corpus_scores) + 0.5  # phrase fluent
    # replay determinism
    again = {
        r["doc_id"]: r["bits_per_char"]
        for r in perplexity_score(docs.unionByName(probes), lm).collect()
    }
    assert again == scored


def test_cluster_embeddings_recovers_planted_structure(spark):
    """K-means clustering: three well-separated planted groups come
    back as pure clusters (every planted group lands wholly inside one
    cluster), every nonzero vector is assigned exactly once, the
    output replays deterministically, and the summary's shares sum
    to 1."""
    import math

    from data_pipeline_demo_spark.operators.similarity import (
        cluster_embeddings,
        cluster_summary,
    )

    # 3 orthogonal-ish directions in 8-d, 20 jittered members each,
    # plus one zero vector that must be excluded
    rows = []
    for g in range(3):
        base = [0.0] * 8
        base[g] = 1.0
        base[g + 3] = 0.5
        for m in range(20):
            jit = [
                v + 0.03 * math.sin(7 * g + m + i) for i, v in enumerate(base)
            ]
            rows.append((g * 100 + m, jit))
    rows.append((999, [0.0] * 8))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    assign = cluster_embeddings(emb, n_clusters=3, refine_iters=3)
    got = assign.collect()
    assert len(got) == 60  # zero vector excluded, everyone else once
    assert len({r["vec_id"] for r in got}) == 60
    by_group = {}
    for r in got:
        by_group.setdefault(r["vec_id"] // 100, set()).add(r["cluster_id"])
    # purity: each planted group maps into exactly one cluster
    assert all(len(cids) == 1 for cids in by_group.values()), by_group
    # separation: the three groups land in three distinct clusters
    assert len({next(iter(c)) for c in by_group.values()}) == 3
    assert all(r["sim"] > 0.9 for r in got)

    # determinism: bit-identical replay
    again = cluster_embeddings(emb, n_clusters=3, refine_iters=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))

    summ = {r["cluster_id"]: r for r in cluster_summary(assign).collect()}
    assert len(summ) == 3
    assert abs(sum(r["share"] for r in summ.values()) - 1.0) < 1e-12
    assert all(r["n_members"] == 20 for r in summ.values())
    assert all(r["min_sim"] > 0.9 for r in summ.values())


def test_minhash_tx_index_cdc_refresh_equals_rebuild(spark, tmp_path):
    """CDC-driven near-dup index maintenance: documents live in a
    txtable, the index in the transactional (doc, band)-keyed form.
    After update + insert + delete commits, one change-feed refresh
    leaves the index bit-identical to a from-scratch rebuild of the
    current snapshot, a same-version refresh is a no-op, and the
    refreshed index surfaces the newly planted near-dup."""
    from data_pipeline_demo_spark.operators.dedup import (
        TX_ROW_KEY,
        _banded_keys,
        dedup_against_tx_index,
        minhash_index_refresh_from_txtable,
        minhash_index_write_tx,
    )
    from data_pipeline_demo_spark.sinks.txlog import (
        read_txtable,
        txlog_delete,
        txlog_upsert,
    )

    docs_root = str(tmp_path / "docs")
    index_root = str(tmp_path / "idx")
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, f"document number {i} says: {base} variant {i}") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    txlog_upsert(spark, docs, docs_root, key="doc_id", num_buckets=4)

    minhash_index_write_tx(
        read_txtable(spark, docs_root), index_root, k=3, num_hashes=16, bands=8,
        num_buckets=4,
    )
    watermark = 0  # index built from snapshot version 0

    # change commits: rewrite doc 2 as a near-copy of doc 1, insert a
    # new near-copy of doc 3, delete doc 5
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [
                (2, f"document number 1 says: {base} variant 1 tweaked"),
                (9, f"document number 3 says: {base} variant 3"),
            ],
            "doc_id long, text string",
        ),
        docs_root,
    )
    txlog_delete(
        spark, docs_root,
        keys=spark.createDataFrame([(5,)], "doc_id long"),
    )

    n, consumed = minhash_index_refresh_from_txtable(
        spark, index_root, docs_root, since_version=watermark
    )
    assert n == 3  # 2 re-signed/inserted docs + 1 deleted doc
    assert consumed == 2

    # refresh ≡ rebuild: band rows of the refreshed index match a
    # from-scratch signing of the CURRENT snapshot exactly
    current = read_txtable(spark, docs_root)
    rebuilt = sorted(
        map(
            tuple,
            _banded_keys(current, "text", "doc_id", 3, 16, 8)
            .select("doc_id", "band", "key")
            .collect(),
        )
    )
    refreshed = sorted(
        map(
            tuple,
            read_txtable(spark, index_root)
            .select("doc_id", "band", "key")
            .collect(),
        )
    )
    assert refreshed == rebuilt

    # same-version refresh is a no-op
    assert minhash_index_refresh_from_txtable(
        spark, index_root, docs_root, since_version=consumed
    ) == (0, consumed)

    # the refreshed index finds the planted near-dup for a new batch
    probe = spark.createDataFrame(
        [(100, f"document number 1 says: {base} variant 1 tweaked")],
        "doc_id long, text string",
    )
    pairs = {
        (r["doc_new"], r["doc_old"])
        for r in dedup_against_tx_index(
            probe, current, index_root, threshold=0.5
        ).collect()
    }
    assert (100, 2) in pairs  # the rewritten doc 2
    assert (100, 5) not in pairs  # deleted doc's bands are gone


def test_pq_adc_score_parity_with_reconstruction(spark):
    """ADC's table-lookup score must equal the numpy dot product of the
    normalized probe with the code's reconstructed centroids — the
    definitional identity of asymmetric distance computation."""
    import numpy as np

    rng = np.random.default_rng(7)
    X = rng.normal(size=(24, 8)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    model = similarity.pq_train(df, m=4, k=4, sample_rows=24, iters=10)
    codes = similarity.pq_encode(df, model)
    probes = df.limit(2).toPandas().rename(columns={"vec_id": "probe_id"})
    got = similarity.pq_search(codes, probes, model, k=24).collect()
    assert got  # sanity

    books = np.asarray(model["codebooks"])
    dsub = model["dim"] // model["m"]
    code_map = {r["vec_id"]: np.frombuffer(r["pq_code"], np.uint8)
                for r in codes.collect()}
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for r in got:
        recon = np.concatenate(
            [books[j, code_map[r["vec_id"]][j]] for j in range(model["m"])]
        )
        assert abs(r["adc_score"] - float(Xn[r["probe_id"]] @ recon)) < 1e-9


def test_pq_recall_compression_and_determinism(spark, sf_dir):
    """On the real embeddings table: 16x compression (64 float32 dims ->
    16 code bytes), top-10 recall far above random, training bit-stable."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    model = similarity.pq_train(emb, m=16, k=64, sample_rows=500)
    model2 = similarity.pq_train(emb, m=16, k=64, sample_rows=500)
    assert model == model2  # deterministic for fixed corpus/params/seed

    codes = similarity.pq_encode(emb, model)
    first = codes.limit(1).collect()[0]
    assert len(first["pq_code"]) == 16  # m bytes: 16x under 64xfloat32

    pdf = emb.toPandas()
    X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    probes = pdf.iloc[:10].rename(columns={"vec_id": "probe_id"})
    got = similarity.pq_search(codes, probes, model, k=10)
    by_probe = {}
    for r in got.collect():
        by_probe.setdefault(r["probe_id"], set()).add(r["vec_id"])

    hits = total = 0
    for p in range(10):
        sims = Xn @ Xn[p]
        order = [ids[i] for i in np.argsort(-sims) if ids[i] != ids[p]][:10]
        hits += len(by_probe.get(ids[p], set()) & set(order))
        total += len(order)
    recall = hits / total
    # random top-10 of ~500 rows would land ~0.02; PQ must be far above
    assert recall >= 0.5, recall


def test_pq_edge_cases(spark):
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="divisible"):
        similarity.pq_train(df, m=2, k=2, sample_rows=10)
    model = similarity.pq_train(df, m=3, k=2, sample_rows=10)
    # the zero-norm vector is excluded from the code relation
    assert [r["vec_id"] for r in similarity.pq_encode(df, model).collect()] == [1]


# --- scalar quantization (SQ8) tier ---------------------------------------


def test_sq_roundtrip_error_bound(spark):
    """Reconstruction error per dimension <= scale/2 (uniform
    quantization's defining bound) on the normalized vectors."""
    import numpy as np

    rng = np.random.default_rng(11)
    X = rng.normal(size=(80, 16))
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(80)],
        "vec_id long, embedding array<float>",
    )
    model = similarity.sq_train(df)
    scale = np.asarray(model["scale"])
    lo = np.asarray(model["lo"])
    codes = {r["vec_id"]: r["sq_code"] for r in similarity.sq_encode(df, model).collect()}
    X32 = X.astype(np.float32).astype(np.float64)
    Xn = X32 / np.linalg.norm(X32, axis=1, keepdims=True)
    for i in range(80):
        c = np.frombuffer(codes[i], dtype=np.uint8).astype(np.float64)
        recon = lo + c * scale
        assert np.all(np.abs(recon - Xn[i]) <= scale / 2 + 1e-9)


def test_sq_search_recall_vs_exact(spark, sf_dir):
    """SQ8 at 4x compression is near-lossless for cosine top-k: recall@10
    against the exact tier stays high on the real embeddings table."""
    emb = table(spark, sf_dir, "embeddings")
    probes = (
        emb.limit(8)
        .select(F.col("vec_id").alias("probe_id"), "embedding")
    )
    exact = similarity.knn_exact(emb, probes, k=10)
    model = similarity.sq_train(emb)
    codes = similarity.sq_encode(emb, model)
    got = similarity.sq_search(codes, probes.toPandas(), model, k=10)
    want = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    have = {(r["probe_id"], r["vec_id"]) for r in got.collect()}
    assert len(have & want) / len(want) >= 0.9
    # 4x compression: one byte per dimension
    one = codes.first()
    assert len(one["sq_code"]) == model["dim"]


def test_sq_edge_cases(spark):
    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0, 4.0]),
            (1, [0.0, 0.0, 0.0, 0.0]),  # zero-norm: excluded
            (2, [2.0, 4.0, 6.0, 8.0]),  # same direction as 0
        ],
        "vec_id long, embedding array<float>",
    )
    model = similarity.sq_train(df)
    codes = similarity.sq_encode(df, model).collect()
    assert sorted(r["vec_id"] for r in codes) == [0, 2]
    # rows 0 and 2 normalize identically -> identical codes
    by_id = {r["vec_id"]: r["sq_code"] for r in codes}
    assert by_id[0] == by_id[2]
    # determinism
    model2 = similarity.sq_train(df)
    assert model == model2


# --- directional containment join -----------------------------------------


def test_containment_finds_excerpt_jaccard_misses(spark):
    """A paragraph quoted inside a long doc: containment(excerpt→long)
    ≈ 1 while Jaccard is far below any useful bar — the asymmetry this
    operator exists for."""
    para = " ".join(f"tok{i}" for i in range(30))
    long_doc = para + " " + " ".join(f"fill{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, long_doc), (2, para)], "doc_id long, text string"
    )
    got = dedup.containment_join(df, threshold=0.8).collect()
    dedup.clear_shingle_scratch()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(2, 1)]
    assert got[0]["containment"] == 1.0
    jac = dedup.jaccard_similarity_join(df, threshold=0.3).collect()
    dedup.clear_shingle_scratch()
    assert jac == []  # jaccard ≈ 28/328: the excerpt is invisible to it


def test_containment_prefix_filter_is_exact(spark):
    """Prefix-filtered result == naive all-pairs verification on a
    corpus with overlapping token windows (candidates pruned, answers
    identical)."""
    from data_pipeline_demo_spark.operators.textprep import shingle_hash_sets

    docs = []
    base = [f"w{i}" for i in range(60)]
    for d in range(20):
        lo = (d * 3) % 40
        docs.append((d, " ".join(base[lo : lo + 25])))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.containment_join(df, threshold=0.6).collect()
    }
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in shingle_hash_sets(df, "text", "doc_id", 3).collect()
    }
    dedup.clear_shingle_scratch()
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and sa and len(sa & sb) / len(sa) >= 0.6:
                want[(a, b)] = len(sa & sb) / len(sa)
    assert got.keys() == want.keys()
    for p in want:
        assert abs(got[p] - want[p]) < 1e-12


def test_containment_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d e f g")], "doc_id long, text string"
    )
    got = dedup.containment_join(df, threshold=0.5).collect()
    dedup.clear_shingle_scratch()
    # doc 1 has < k tokens -> no shingles -> no pair in either direction
    assert got == []


# --- audio tier ------------------------------------------------------------


def test_audio_stats_known_signal(spark, sf_dir):
    """RMS of a full-amplitude sine ≈ A/√2, peak ≤ A, duration exact —
    real DSP on the decoded samples."""
    import math

    docs = table(spark, sf_dir, "documents").limit(16)
    audio = multimodal.synthesize_audio(docs)
    stats = {r["media_id"]: r for r in multimodal.audio_stats(audio).collect()}
    src = {r["media_id"]: r["n_samples"] for r in audio.collect()}
    assert stats.keys() == src.keys()
    for mid, r in stats.items():
        assert r["duration_s"] == pytest.approx(src[mid] / r["sample_rate"])
        assert r["rms"] == pytest.approx(8000 / math.sqrt(2), rel=0.05)
        assert 7000 <= r["peak"] <= 8000


def test_audio_resample_preserves_signal(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(8)
    audio = multimodal.synthesize_audio(docs)
    res = multimodal.resample_audio(audio, target_rate=8_000)
    before = {r["media_id"]: r["n_samples"] for r in audio.collect()}
    stats = {
        r["media_id"]: r
        for r in multimodal.audio_stats(
            res.select("media_id", "payload")
        ).collect()
    }
    for mid, r in stats.items():
        # half the rate -> half the samples, same duration
        assert abs(r["duration_s"] - before[mid] / 16_000) < 1e-3
        assert r["sample_rate"] == 8_000
        # energy roughly preserved through linear interp (a 220-1045 Hz
        # sine at 8 kHz is far below Nyquist)
        import math

        assert r["rms"] == pytest.approx(8000 / math.sqrt(2), rel=0.1)


def test_audio_codec_rejects_unknown_container(spark):
    with pytest.raises(ValueError, match="RIFF"):
        multimodal._decode_audio(b"JUNKJUNKJUNKJUNKJUNKJUNK")


def test_wav_roundtrip_and_pipeline(spark):
    """REAL RIFF/WAVE PCM16 flows through the audio operators: encode
    via the stdlib codec, decode bit-exact, stats/resample dispatch on
    the RIFF magic, stereo downmixes to mono, unknown chunks skip."""
    import hashlib
    import math
    import struct as _struct

    import numpy as np

    rate = 16_000
    t = np.arange(rate)  # one second
    sig = (8000 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    wav = multimodal.wav_encode(sig, rate)
    got_rate, got = multimodal.wav_decode(wav)
    assert got_rate == rate and (got == sig).all()

    # unknown chunk between fmt and data is skipped per spec
    pos = wav.index(b"data")
    junk = b"LIST" + _struct.pack("<I", 6) + b"junk!!"
    tolerant = wav[:pos] + junk + wav[pos:]
    assert (multimodal.wav_decode(tolerant)[1] == sig).all()

    # stereo -> mono average
    stereo = np.empty(2 * len(sig), dtype="<i2")
    stereo[0::2] = sig
    stereo[1::2] = 0
    raw = multimodal.wav_encode(stereo, rate)
    # patch channel count and byte-rate fields to stereo
    fmt_at = raw.index(b"fmt ") + 8
    raw = (
        raw[: fmt_at + 2]
        + _struct.pack("<H", 2)
        + raw[fmt_at + 4 :]
    )
    _, mono = multimodal.wav_decode(raw)
    assert np.abs(mono - sig // 2).max() <= 1  # integer-mean downmix

    # through the Spark operators: stats + resample on real WAV bytes
    media = spark.createDataFrame(
        [
            (
                1,
                "audio",
                bytearray(wav),
                ("audio/wav", len(wav), hashlib.sha256(wav).hexdigest()),
            )
        ],
        multimodal.MEDIA_SCHEMA,
    )
    st = multimodal.audio_stats(media).collect()[0]
    assert st.media_id == 1 and st.sample_rate == rate
    assert st.duration_s == pytest.approx(1.0)
    assert st.rms == pytest.approx(8000 / math.sqrt(2), rel=0.01)

    res = multimodal.resample_audio(media, target_rate=8_000).collect()[0]
    assert res.sample_rate == 8_000 and res.n_samples == 8_000
    out = bytes(res.payload)
    assert out[:4] == b"RIFF"  # WAV in -> WAV out
    r2, s2 = multimodal.wav_decode(out)
    x = s2.astype(np.float64)
    assert float(np.sqrt((x * x).mean())) == pytest.approx(
        8000 / math.sqrt(2), rel=0.02
    )


# --- certified fast exact kNN ----------------------------------------------


def test_knn_exact_fast_bit_equals_exact(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("probe_id"), "embedding"
    )
    want = {
        (r["probe_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in similarity.knn_exact(emb, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in similarity.knn_exact_fast(emb, probes, k=5).collect()
    }
    assert got == want  # bit-exact scores AND identical ranking


def test_knn_exact_fast_fallback_on_degenerate_ties(spark):
    """A corpus of identical vectors defeats the certificate (every
    cosine is 1.0) — the fallback must still reproduce knn_exact."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = df.limit(2).select(F.col("vec_id").alias("probe_id"), "embedding")
    want = {
        (r["probe_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in similarity.knn_exact(df, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in similarity.knn_exact_fast(df, probes, k=5).collect()
    }
    assert got == want


def test_knn_exact_fast_small_corpus(spark):
    """Corpus smaller than k+margin: vacuous certificate, exact result."""
    import numpy as np

    rng = np.random.default_rng(2)
    rows = [(i, [float(v) for v in rng.normal(size=8)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = df.limit(1).select(F.col("vec_id").alias("probe_id"), "embedding")
    want = {
        (r["probe_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in similarity.knn_exact(df, probes, k=5).collect()
    }
    got = {
        (r["probe_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in similarity.knn_exact_fast(df, probes, k=5).collect()
    }
    assert got == want


# --- IVF-PQ composed tier (IVFADC) ----------------------------------------


def test_ivfpq_recall_and_partition_pruning(spark, sf_dir, tmp_path):
    """The composed IVF-PQ index on the real embeddings table: recall
    beats plain PQ's bar at modest nprobe (residual coding carries more
    precision per byte), full-probe recall is at least as good, and the
    probed scan reads only nprobe partitions."""
    import numpy as np

    emb = table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivfpq_idx")
    similarity.ivfpq_build_index(
        emb, path, n_centroids=16, m=16, k=64, refine_iters=1
    )

    pdf = emb.toPandas()
    X = np.asarray(list(pdf["embedding"]), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    probes = pdf.iloc[:10].rename(columns={"vec_id": "probe_id"})

    got = similarity.ivfpq_search(spark, path, probes, k=10, nprobe=8)
    by_probe = {}
    for r in got.collect():
        by_probe.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits = total = 0
    for p in range(10):
        sims = Xn @ Xn[p]
        order = [ids[i] for i in np.argsort(-sims) if ids[i] != ids[p]][:10]
        hits += len(by_probe.get(ids[p], set()) & set(order))
        total += len(order)
    recall = hits / total
    assert recall >= 0.5, recall

    # full probe (nprobe = n_centroids) recall >= partial
    got_full = similarity.ivfpq_search(spark, path, probes, k=10, nprobe=16)
    by_full = {}
    for r in got_full.collect():
        by_full.setdefault(r["probe_id"], set()).add(r["vec_id"])
    hits_f = sum(
        len(
            by_full.get(ids[p], set())
            & set([ids[i] for i in np.argsort(-(Xn @ Xn[p])) if ids[i] != ids[p]][:10])
        )
        for p in range(10)
    )
    assert hits_f >= hits

    # partition pruning: a single probe at nprobe=2 plans <= 2
    # centroid partitions (PartitionFilters on the parquet scan)
    one = probes.iloc[:1]
    df = similarity.ivfpq_search(spark, path, one, k=5, nprobe=2)
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(\d+,\d+\)\]", plan)


def test_ivfpq_determinism_and_storage(spark, sf_dir, tmp_path):
    import json

    import numpy as np

    emb = table(spark, sf_dir, "embeddings").limit(300)
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    similarity.ivfpq_build_index(emb, p1, n_centroids=8, m=8, k=32)
    similarity.ivfpq_build_index(emb, p2, n_centroids=8, m=8, k=32)
    m1 = json.load(open(p1 + "_ivfpq.json"))
    m2 = json.load(open(p2 + "_ivfpq.json"))
    assert m1 == m2  # bit-stable build
    codes = spark.read.parquet(p1)
    row = codes.limit(1).collect()[0]
    assert len(row["pq_code"]) == 8  # m bytes/vector + small centroid id
    # every non-zero corpus vector is coded exactly once
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == codes.count()


def test_ann_index_cdc_refresh_equals_rebuild(spark, tmp_path):
    """CDC-driven ANN index maintenance: vectors live in a txtable;
    after update + insert + delete commits, one preimage-fed refresh
    leaves the (tbl, bucket) parquet layout identical to a
    from-scratch build of the current snapshot — same rows AND same
    partition directories (fully drained partitions are removed, which
    dynamic overwrite alone can't do). Replay from the same watermark
    converges; same-version refresh is a no-op; queries see the new
    state."""
    import glob as _glob
    import os as _os

    from data_pipeline_demo_spark.operators import similarity
    from data_pipeline_demo_spark.sinks.txlog import (
        read_txtable,
        txlog_delete,
        txlog_upsert,
    )

    def vec(seed: int) -> list[float]:
        return [float(((seed * 37 + i * 13) % 19) - 9) for i in range(8)]

    tbl_root = str(tmp_path / "vecs")
    idx = str(tmp_path / "idx")
    base = [(i, vec(i)) for i in range(12)]
    txlog_upsert(
        spark,
        spark.createDataFrame(base, "vec_id long, embedding array<float>"),
        tbl_root,
        key="vec_id",
        num_buckets=4,
    )
    similarity.build_ann_index(
        read_txtable(spark, tbl_root), idx, num_planes=3, num_tables=4
    )
    watermark = 0

    # update vec 2 (moves buckets), insert vec 20, delete vec 5
    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(2, vec(101)), (20, vec(102))],
            "vec_id long, embedding array<float>",
        ),
        tbl_root,
    )
    txlog_delete(
        spark, tbl_root, keys=spark.createDataFrame([(5,)], "vec_id long")
    )

    n, consumed = similarity.ann_index_refresh_from_txtable(
        spark, idx, tbl_root, since_version=watermark
    )
    assert n == 3 and consumed == 2

    def snapshot(path: str):
        rows = sorted(
            (r.vec_id, r.tbl, r.bucket, tuple(r.embedding))
            for r in spark.read.parquet(path).collect()
        )
        parts = sorted(
            p.rsplit("/", 2)[-2] + "/" + p.rsplit("/", 2)[-1]
            for p in _glob.glob(_os.path.join(path, "tbl=*", "bucket=*"))
        )
        return rows, parts

    rebuilt_path = str(tmp_path / "rebuilt")
    similarity.build_ann_index(
        read_txtable(spark, tbl_root), rebuilt_path, num_planes=3,
        num_tables=4,
    )
    assert snapshot(idx) == snapshot(rebuilt_path)

    # replay from the SAME watermark converges (idempotent)
    similarity.ann_index_refresh_from_txtable(
        spark, idx, tbl_root, since_version=watermark
    )
    assert snapshot(idx) == snapshot(rebuilt_path)
    # consumed-version refresh is a no-op
    assert similarity.ann_index_refresh_from_txtable(
        spark, idx, tbl_root, since_version=consumed
    ) == (0, consumed)

    # queries observe the refresh: the deleted id never surfaces, the
    # updated vector is its own exact nearest neighbor at full probe
    probes = spark.createDataFrame(
        [(0, vec(101))], "probe_id long, embedding array<float>"
    )
    hits = similarity.ann_query_indexed(
        spark, idx, probes, k=3, num_planes=3, num_tables=4, multiprobe=2
    ).collect()
    assert all(r.vec_id != 5 for r in hits)
    assert hits and hits[0].vec_id == 2


def test_ivf_index_cdc_refresh_equals_rebuild(spark, tmp_path):
    """IVF CDC refresh against a FIXED quantizer: refresh == routing
    the current snapshot through the same frozen centroids (rows and
    partition directories), replay converges, no-op on consumed
    version, deleted ids vanish from queries."""
    import glob as _glob
    import os as _os

    from data_pipeline_demo_spark.operators import similarity
    from data_pipeline_demo_spark.sinks.txlog import (
        read_txtable,
        txlog_delete,
        txlog_upsert,
    )

    def vec(seed: int) -> list[float]:
        return [float(((seed * 41 + i * 7) % 17) - 8) for i in range(8)]

    tbl_root = str(tmp_path / "vecs")
    idx = str(tmp_path / "ivf")
    base = [(i, vec(i)) for i in range(16)]
    txlog_upsert(
        spark,
        spark.createDataFrame(base, "vec_id long, embedding array<float>"),
        tbl_root,
        key="vec_id",
        num_buckets=4,
    )
    similarity.ivf_build_index(
        read_txtable(spark, tbl_root), idx, n_centroids=4
    )
    watermark = 0

    txlog_upsert(
        spark,
        spark.createDataFrame(
            [(3, vec(201)), (30, vec(202))],
            "vec_id long, embedding array<float>",
        ),
        tbl_root,
    )
    txlog_delete(
        spark, tbl_root, keys=spark.createDataFrame([(7,)], "vec_id long")
    )

    n, consumed = similarity.ivf_index_refresh_from_txtable(
        spark, idx, tbl_root, since_version=watermark
    )
    assert n == 3 and consumed == 2

    def snapshot(path: str):
        rows = sorted(
            (r.vec_id, r.centroid_id, tuple(r.embedding))
            for r in spark.read.parquet(path).collect()
        )
        parts = sorted(
            _os.path.basename(p)
            for p in _glob.glob(_os.path.join(path, "centroid_id=*"))
        )
        return rows, parts

    # reference: route the CURRENT snapshot through the SAME frozen
    # quantizer (a rebuild would re-init centroids; the refresh
    # contract is the append contract - frozen lists)
    ref = str(tmp_path / "ref")
    import shutil

    shutil.copytree(idx + "_centroids", ref + "_centroids")
    similarity.ivf_index_append(read_txtable(spark, tbl_root), ref)
    assert snapshot(idx) == snapshot(ref)

    # replay from the same watermark converges
    similarity.ivf_index_refresh_from_txtable(
        spark, idx, tbl_root, since_version=watermark
    )
    assert snapshot(idx) == snapshot(ref)
    assert similarity.ivf_index_refresh_from_txtable(
        spark, idx, tbl_root, since_version=consumed
    ) == (0, consumed)

    # full-probe query over the refreshed index: exact over the
    # current snapshot - deleted id absent, updated vector found
    probes = spark.createDataFrame(
        [(0, vec(201))], "probe_id long, embedding array<float>"
    )
    hits = similarity.ivf_query(spark, idx, probes, k=3, nprobe=4).collect()
    assert all(r.vec_id != 7 for r in hits)
    assert hits and hits[0].vec_id == 3


def test_gopher_flags_edges(spark):
    """Published Gopher rules: hand-computed flag fixtures, incl. the
    n_words=0 edge (all flags except symbol-ratio fail; keep=0)."""
    from data_pipeline_demo_spark.operators.textstats import gopher_flags

    rows = [
        # 60 alphabetic words incl. 'the' and 'of' -> keep=1
        (1, " ".join(["the", "of"] + ["word"] * 58)),
        # empty text: n_words=0
        (2, ""),
        # symbol-heavy: 10 words, 3 '#' -> symbol flag 0
        (3, "the of aaa bbb ccc ddd eee fff # # #".replace("# # #", "### x y")),
        # numeric words: alpha fraction fails (2 alpha / 10 words)
        (4, "the of 11 22 33 44 55 66 77 88"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flags = gopher_flags("text", min_words=5, min_stop_hits=2)
    got = {
        r.doc_id: r.asDict()
        for r in df.select("doc_id", *[c.alias(n) for n, c in flags.items()])
        .collect()
    }
    assert got[1]["gopher_keep"] == 1 and got[1]["n_words"] == 60
    assert got[2]["n_words"] == 0
    assert got[2]["flag_word_count"] == 0
    assert got[2]["flag_mean_word_len"] == 0
    assert got[2]["gopher_keep"] == 0
    # doc 3: "### x y" => words the,of,aaa..fff,###,x,y = 11 words, 3 '#'
    assert got[3]["flag_symbol_ratio"] == 0
    assert got[4]["flag_alpha_words"] == 0
    assert got[4]["flag_stopwords"] == 1  # 'the' + 'of' distinct hits


def test_lexicon_sentiment_strategies_equal_and_hand_case(spark):
    """The pure-expression tier and the explode+broadcast-join tier
    produce IDENTICAL results (zero-hit docs included), and a
    hand-scored example pins the semantics."""
    from data_pipeline_demo_spark.operators.textstats import (
        lexicon_sentiment,
    )

    docs = spark.createDataFrame(
        [
            (1, "fast fast slow big"),      # 2+2-2+1 = 3 -> positive
            (2, "slow slow dup"),           # -2-2-3 = -7 -> negative
            (3, "table scan join"),         # 0 -> neutral
            (4, "fast slow"),               # 0 -> neutral
        ],
        "doc_id long, text string",
    )
    lex = {"fast": 2, "slow": -2, "big": 1, "small": -1, "dup": -3}
    expr = lexicon_sentiment(docs, lex, expr_max_words=64)
    joined = lexicon_sentiment(docs, lex, expr_max_words=1)  # force join
    want = {
        1: (3, "positive"), 2: (-7, "negative"),
        3: (0, "neutral"), 4: (0, "neutral"),
    }
    for df in (expr, joined):
        got = {
            r["doc_id"]: (r["sentiment_score"], r["sentiment"])
            for r in df.collect()
        }
        assert got == want
    # plan shapes: the expression tier stays shuffle- and explode-free
    plan = expr._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in jplan and "Generate" in jplan


def test_pmi_collocations_hand_case(spark):
    """Hand-computed PMI on a tiny corpus: 'big data' always adjacent,
    'foo'/'bar' never — the collocation outranks independents."""
    import math

    from data_pipeline_demo_spark.operators.textstats import (
        pmi_collocations,
    )

    docs = spark.createDataFrame(
        [(i, "big data foo bar") for i in range(6)]
        + [(100 + i, "foo big data bar") for i in range(6)],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, min_count=2, top_k=50).collect()
    got = {(r.w1, r.w2): (r.c12, r.pmi) for r in rows}
    # corpus: 12 docs x 4 tokens = 48 unigrams, 12 x 3 = 36 bigrams;
    # each word appears 12 times; 'big data' occurs 12 times
    c12, pmi = got[("big", "data")]
    assert c12 == 12
    want = round(math.log((12.0 * 48 * 48) / (36.0 * 12 * 12)), 6)
    assert pmi == want
    # 'data foo' occurs only in the first 6 docs
    assert got[("data", "foo")][0] == 6
    assert got[("big", "data")][1] > got[("data", "foo")][1]


def test_rake_keywords_hand_case(spark):
    """Hand-computed RAKE: phrase splitting at stopwords, word score
    degree/freq, phrase score = sum of member scores."""
    from data_pipeline_demo_spark.operators.textstats import rake_keywords

    # one doc: phrases are "deep learning systems" and "deep learning"
    docs = spark.createDataFrame(
        [(1, "deep learning systems of the deep learning")],
        "doc_id long, text string",
    )
    rows = rake_keywords(docs, top_k=10).collect()
    got = {r.phrase: (r.n_occ, r.score) for r in rows}
    # occurrences: "deep learning systems" (len 3), "deep learning" (2)
    # deep: freq 2, degree 3+2=5 -> 2.5 ; learning: same 2.5
    # systems: freq 1, degree 3 -> 3.0
    assert got["deep learning systems"] == (1, 8.0)   # 2.5+2.5+3.0
    assert got["deep learning"] == (1, 5.0)           # 2.5+2.5
    # stopwords never appear inside phrases
    assert all(
        w not in ("of", "the")
        for p in got
        for w in p.split(" ")
    )


def test_rake_drops_overlong_stopword_free_runs(spark):
    from data_pipeline_demo_spark.operators.textstats import rake_keywords

    docs = spark.createDataFrame(
        [(1, "one two three four five six")],  # no stopwords: one run of 6
        "doc_id long, text string",
    )
    assert rake_keywords(docs).count() == 0


def test_jaccard_positional_filter_bruteforce_parity(spark):
    """r12: the PPJoin positional filter must not change the output —
    randomized sets plus engineered EXACT-boundary pairs (J == t) vs a
    driver-side brute force, at two thresholds."""
    import itertools
    import random

    rng = random.Random(12012)
    rows = []
    # random sets of wildly varying sizes
    for i in range(120):
        n = rng.randint(1, 40)
        rows.append((i, sorted(rng.sample(range(300), n))))
    # engineered boundary pairs: |A∩B| = 7, |A∪B| = 10 → J = 0.7 exactly
    base = list(range(1000, 1007))
    rows.append((500, base + [2001, 2002, 2003]))
    rows.append((501, base))
    # J just under: 6/10
    rows.append((502, base[:6] + [2004, 2005, 2006, 2007]))
    rows.append((503, base[:6]))

    def jac(a, b):
        sa, sb = set(a), set(b)
        u = len(sa | sb)
        return len(sa & sb) / u if u else 0.0

    for t in (0.7, 0.3):
        want = {
            (x, y)
            for (x, sa), (y, sb) in itertools.combinations(rows, 2)
            if jac(sa, sb) >= t
        }
        df = spark.createDataFrame(rows, "doc_id int, sh array<int>")
        got = {
            (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
            for r in dedup.jaccard_join_on_sets(df, threshold=t).collect()
        }
        assert got == want
        if t == 0.7:
            # the engineered exact-boundary pair (J == t) must survive
            # the positional filter in the JOIN OUTPUT itself (r13: the
            # old assert checked `want`, which is computed by the same
            # jac() — vacuous by construction; ADVICE r12)
            assert (500, 501) in got
