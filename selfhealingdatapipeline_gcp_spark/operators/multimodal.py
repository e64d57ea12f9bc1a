"""Multimodal column plumbing (SURVEY §2).

Media assets are opaque ``binary`` payload columns + typed metadata,
processed with Arrow-batched ``mapInPandas`` — the shape a real
image/audio pipeline takes on Spark. The actual codec decode is
STUBBED (no image/audio libraries in this environment): decoding
raises NotImplementedError, and the metadata/frame extractors use a
clearly-marked deterministic fake derived from the payload bytes, so
the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

META_SCHEMA = ("doc_id bigint, n_bytes int, width int, height int, "
               "media_format string")
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_digest bigint"


def decode_image(payload: bytes) -> object:
    """Real codec hook — plug Pillow/libvips here on a real cluster."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "metadata extraction uses the deterministic fake below")


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic FAKE decode: dimensions derived from payload
    bytes (stands in for a real header parse)."""
    w = 64 + (payload[0] if payload else 0) % 1920
    h = 64 + (payload[-1] if payload else 0) % 1080
    return w, h


def with_payload(documents: DataFrame) -> DataFrame:
    """Opaque binary payload column + source metadata (the ingest
    shape: binary blob, typed sidecar columns). A frame that already
    carries a ``payload`` column (e.g. assets_from_binary_files)
    passes through — every operator in this module accepts either
    the documents table or a real binary-file scan."""
    if "payload" in documents.columns:
        return documents.select("doc_id", "payload", "media_format")
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("source").alias("media_format"),
    )


def assets_from_binary_files(files: DataFrame) -> DataFrame:
    """Adapt a ``binaryFile`` scan (sources.readers.read_binary_files:
    path, modificationTime, length, content) to the multimodal
    payload schema: doc_id = md5int(path) (stable across re-scans,
    independent of listing order), payload = the file bytes,
    media_format = the file extension. This is the REAL ingest path —
    every multimodal operator runs unchanged on its output."""
    from selfhealingdatapipeline_gcp_spark.functions import textfn
    return files.select(
        textfn.md5int(F.col("path")).alias("doc_id"),
        F.col("content").alias("payload"),
        F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
         .alias("media_format"),
    )


def multimodal_meta(documents: DataFrame) -> DataFrame:
    """Per-asset metadata extraction over Arrow batches.

    mapInPandas: payloads stream through in columnar batches; the
    batch loop is vectorized pandas, not per-row Python calls."""
    payloads = with_payload(documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_dims)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].str.len().astype("int32"),
                "width": dims.map(lambda d: d[0]).astype("int32"),
                "height": dims.map(lambda d: d[1]).astype("int32"),
                "media_format": pdf["media_format"],
            })

    return payloads.mapInPandas(extract, META_SCHEMA)


def multimodal_framesample(documents: DataFrame,
                           stride: int = 2) -> DataFrame:
    """Frame sampling plan: each asset yields every ``stride``-th
    frame index with a per-frame digest (deterministic fake for the
    real frame grab). Output is long-format (doc_id, frame_idx,
    digest) — the explode shape a video pipeline feeds to feature
    extraction.

    The digest is the repo-standard md5-hex→int (functions/textfn.py
    md5int) over ``payload + b'#' + str(frame_idx)`` so a SQL oracle
    can reproduce it bit-exactly:
    ('0x' || substr(md5(text || '#' || i), 1, 12))::BIGINT."""
    payloads = with_payload(documents)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            out_doc, out_idx, out_dig = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = 1 + (len(payload) % 10)
                for i in range(0, n_frames, stride):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    frame = payload + b"#" + str(i).encode("ascii")
                    out_dig.append(
                        int(hashlib.md5(frame).hexdigest()[:12], 16))
            yield pd.DataFrame({
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "frame_idx": pd.Series(out_idx, dtype="int32"),
                "frame_digest": pd.Series(out_dig, dtype="int64"),
            })

    return payloads.mapInPandas(sample, FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id bigint, feature array<float>, feat_norm double"
RESIZE_SCHEMA = ("doc_id bigint, width int, height int, out_width int, "
                 "out_height int, n_bytes_out int")


def multimodal_features(documents: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction plumbing: binary payload → fixed-dim float
    vector, Arrow-batched. The embedding model is STUBBED with a
    deterministic byte-histogram projection (no vision/audio models in
    this environment); the schema, batching, and array<float> output
    column are exactly what a real encoder drop-in needs."""
    import numpy as np

    payloads = with_payload(documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, norms = [], []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                # deterministic fake: bucketed byte histogram, L2'd
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                nrm = float(np.sqrt((hist * hist).sum()))
                vec = (hist / nrm if nrm > 0 else hist).astype("float32")
                feats.append(vec.tolist())
                norms.append(nrm)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "feature": feats,
                "feat_norm": norms,
            })

    return payloads.mapInPandas(extract, FEATURE_SCHEMA)


FEATURE_LONG_SCHEMA = ("doc_id bigint, dim_idx int, bucket_count bigint, "
                       "feat_norm_sq bigint")


def multimodal_features_long(documents: DataFrame,
                             dim: int = 16) -> DataFrame:
    """Long-format feature extraction: (doc_id, dim_idx, bucket_count,
    feat_norm_sq) — one row per histogram bucket, exact integer values.

    This is the oracle-checkable registered query (array cells break
    result canonicalizers); ``multimodal_features`` stays the library
    API returning array<float>. Same Arrow-batched mapInPandas
    plumbing, integer outputs so a SQL oracle can match bit-exactly."""
    import numpy as np

    payloads = with_payload(documents)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_cnt, out_nsq = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("int64")
                nsq = int((hist * hist).sum())
                out_doc.extend([doc_id] * dim)
                out_idx.extend(range(dim))
                out_cnt.extend(hist.tolist())
                out_nsq.extend([nsq] * dim)
            yield pd.DataFrame({
                "doc_id": pd.Series(out_doc, dtype="int64"),
                "dim_idx": pd.Series(out_idx, dtype="int32"),
                "bucket_count": pd.Series(out_cnt, dtype="int64"),
                "feat_norm_sq": pd.Series(out_nsq, dtype="int64"),
            })

    return payloads.mapInPandas(extract, FEATURE_LONG_SCHEMA)


def multimodal_resize_plan(documents: DataFrame,
                           target: tuple[int, int] = (224, 224)) -> DataFrame:
    """Resize plumbing: per-asset source dims (fake header parse) →
    target dims + projected output size. The actual pixel resample is
    the stubbed decode path (decode_image); everything around it —
    batch shape, dims metadata, size accounting — is real."""
    payloads = with_payload(documents)
    tw, th = target

    def plan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_dims)
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": w,
                "height": h,
                "out_width": tw,
                "out_height": th,
                "n_bytes_out": pd.Series([tw * th * 3] * len(pdf),
                                         dtype="int32"),
            })

    return payloads.mapInPandas(plan, RESIZE_SCHEMA)


def multimodal_dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact payload-level dedup for media assets: group by md5 of the
    BINARY payload (not any text field — re-encoded or re-ingested
    assets share bytes, not names). The scale shape of dedup_exact
    applied to the multimodal ingest: the shuffle key is a 32-char
    digest, never the payload itself, so asset size doesn't touch the
    exchange. JVM-side md5 over binary — no Python in the path."""
    payloads = with_payload(documents)
    return (
        payloads
        .groupBy(F.md5(F.col("payload")).alias("payload_md5"))
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count(F.lit(1)).alias("n_copies"),
             (F.count(F.lit(1)) > 1).alias("had_duplicates"))
        .select("keeper_doc_id", "n_copies", "had_duplicates")
        .orderBy("keeper_doc_id")
    )


def multimodal_ahash_pairs(documents: DataFrame,
                           max_hamming: int = 3,
                           max_bucket_assets: int = 10_000) -> DataFrame:
    """NEAR-match asset pairs within ``max_hamming`` bits of a 64-bit
    EXTENDED average-hash — what exact-signature grouping
    (multimodal_ahash_groups) misses: a re-encode that flips a few
    bits still pairs here.

    Signature: 4 integer-exact thresholds per histogram bucket
    (count·16 > tot · {1, 1.5, 0.5, 2} — all cross-multiplied to
    integers) → 64 bits. The 16-bit single-threshold aHash was
    measured DEGENERATE for pair generation (its buckets held
    thousands of colliding assets → 9.4M quadratic pairs at 5k docs);
    four thresholds quantize the histogram SHAPE finely enough that
    buckets stay small while re-encodes still collide. Pigeonhole
    over 4 disjoint 16-bit windows: two signatures within hamming ≤ 3
    agree exactly on at least one window, so window-equality buckets
    are a COMPLETE candidate generator; exact bit_count(xor)
    verifies.

    Scale shape (r7 — exact-signature collapse, VERDICT r6 #2): the
    corpus is first COLLAPSED to its distinct 64-bit signatures
    (identical-signature assets are byte-equivalent at this metric's
    resolution — their pairwise hamming is 0 by definition), window
    bucketing and pigeonhole pair generation run over the DISTINCT
    signature relation only, and membership expands back through two
    equi-joins on the signature key. In-task memory is therefore
    bounded by distinct histogram SHAPES per window value — corpus
    copies, re-ingests, and template-heavy media can no longer blow a
    bucket (the pre-r7 form capped on raw assets and raised at sf1 on
    this repo's distribution-degenerate synthetic corpus). The loud
    cap remains as a backstop on truly shape-diverse dense corpora.
    Pair expansion is a join fan-out (distributed), never an in-task
    list product, and the output needs no corpus-sized distinct():
    every unordered doc pair is emitted exactly once (each doc lives
    in exactly one signature group; group pairs are deduped at group
    grain — a pair-relation-sized distinct, not a corpus-pair one).

    Honest data caveat: pair DENSITY is a property of the corpus,
    not the plan — this repo's synthetic text gives near-uniform
    byte histograms, so the OUTPUT itself is dense (~9% of all pairs
    within hamming 3 at 5k docs). The collapse keeps the computation
    bounded regardless; the output size is what the query semantics
    demand."""
    feats = multimodal_features_long(documents)
    w = Window.partitionBy("doc_id")
    tot = F.sum("bucket_count").over(w)
    c16 = F.col("bucket_count") * 16
    # thresholds in exact integers: c·16 > tot, c·32 > 3·tot (1.5×),
    # c·32 > tot (0.5×), c·8 > tot (2×)
    tests = [c16 > tot,
             F.col("bucket_count") * 32 > 3 * tot,
             F.col("bucket_count") * 32 > tot,
             F.col("bucket_count") * 8 > tot]
    # the signature lives as FOUR 16-bit window values (threshold j
    # across the 16 dims), never one 64-bit integer — bit 63 would
    # overflow signed int64 (ANSI throws)
    sig = (
        feats.select(
            "doc_id", *[
                F.when(t, F.pow(F.lit(2.0), F.col("dim_idx"))
                           .cast("bigint"))
                 .otherwise(F.lit(0).cast("bigint")).alias(f"b{j}")
                for j, t in enumerate(tests)])
        .groupBy("doc_id")
        .agg(*[F.sum(f"b{j}").alias(f"w{j}") for j in range(4)])
        .withColumn("sig_key", F.concat_ws(
            "|", *[F.col(f"w{j}").cast("string") for j in range(4)]))
    )
    members = sig.select("sig_key", "doc_id")
    groups = (
        sig.groupBy("sig_key")
        .agg(*[F.min(f"w{j}").alias(f"w{j}") for j in range(4)],
             F.count(F.lit(1)).alias("n_members"))
    )
    # pigeonhole window bucketing over DISTINCT signatures only
    windows = groups.select(
        "sig_key", "w0", "w1", "w2", "w3",
        F.explode(F.array(*[
            F.concat(F.lit(f"w{j}|"), F.col(f"w{j}").cast("string"))
            for j in range(4)])).alias("bkey"))
    hamming = sum(
        F.bit_count(F.col(f"a.w{j}").bitwiseXOR(F.col(f"b.w{j}")))
        for j in range(4))

    def _bucket_pairs(buckets):
        """Generator pair emission over collected bucket members:
        each pair of distinct signatures sharing the bucket, oriented
        by sig_key, scored with the exact 64-bit hamming."""
        return (
            buckets
            .select(F.explode("mem").alias("a"), "mem")
            .select("a", F.explode(F.filter(
                "mem", lambda m: m["sig_key"] > F.col("a.sig_key")))
                .alias("b"))
            .select(F.col("a.sig_key").alias("sig_a"),
                    F.col("b.sig_key").alias("sig_b"),
                    hamming.cast("int").alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
        )

    mem_struct = F.struct("sig_key", "w0", "w1", "w2", "w3")
    buckets0 = (
        windows.groupBy("bkey")
        .agg(F.sort_array(F.collect_list(mem_struct)).alias("mem"))
        .filter(F.size("mem") >= 2)
    )
    small0 = buckets0.filter(F.size("mem") <= max_bucket_assets)
    # Recursive pigeonhole refinement (r7): a bucket whose DISTINCT
    # signature count exceeds the cap is re-banded instead of raised.
    # All its members agree exactly on one 16-bit window, so a
    # hamming-≤3 pair has ≤3 flips in the remaining 48 bits — among
    # any 4 disjoint 12-bit sub-windows of those bits at least one is
    # EXACT (pigeonhole again). Sub-bucketing on (bkey, sub-window)
    # keeps the candidate generator complete while dividing occupancy
    # by the sub-window's entropy; members of a hot bucket are
    # distinct signatures, so their remaining 48 bits are never
    # constant. A bucket still hot after refinement raises the loud
    # healer-classified cap — now a true backstop (it takes > cap
    # distinct histogram shapes agreeing on 28 of 64 bits).
    hot_members = (
        buckets0.filter(F.size("mem") > max_bucket_assets)
        .select("bkey", F.explode("mem").alias("m"))
        .select("bkey", F.col("m.sig_key").alias("sig_key"),
                *[F.col(f"m.w{j}").alias(f"w{j}") for j in range(4)])
    )
    win_idx = F.substring("bkey", 2, 1).cast("int")
    _o = {0: (1, 2, 3), 1: (0, 2, 3), 2: (0, 1, 3), 3: (0, 1, 2)}
    rem48 = F.lit(None).cast("bigint")
    for j in range(3, -1, -1):
        a_, b_, c_ = _o[j]
        rem48 = F.when(
            win_idx == j,
            F.col(f"w{a_}") * (2 ** 32) + F.col(f"w{b_}") * (2 ** 16)
            + F.col(f"w{c_}")).otherwise(rem48)
    sub_keys = F.array(*[
        F.concat(F.lit(f"{s}|"),
                 F.shiftright(rem48, 12 * s)
                  .bitwiseAND(F.lit(0xFFF)).cast("string"))
        for s in range(4)])
    overflow_msg = F.concat(
        F.lit("multimodal_ahash_pairs: bucket holds "),
        F.size("mem").cast("string"),
        F.lit(f" distinct signatures (> max_bucket_assets="
              f"{max_bucket_assets}) even after pigeonhole "
              "refinement — that many distinct histogram shapes agree "
              "on 28 of 64 signature bits; raise max_bucket_assets "
              "for a deliberate dense run"))
    buckets1 = (
        hot_members
        .select("sig_key", "w0", "w1", "w2", "w3", "bkey",
                F.explode(sub_keys).alias("sub"))
        .select("sig_key", "w0", "w1", "w2", "w3",
                F.concat("bkey", F.lit("#"), F.col("sub"))
                 .alias("bkey2"))
        .groupBy("bkey2")
        .agg(F.sort_array(F.collect_list(mem_struct)).alias("mem"))
        .filter(F.size("mem") >= 2)
        .filter(F.when(F.size("mem") > max_bucket_assets,
                       F.raise_error(overflow_msg))
                 .otherwise(F.lit(True)))
    )
    # group-grain candidate pairs (distinct signature pairs within
    # hamming), plus each multi-member group paired with itself at
    # hamming 0 — identical signatures are trivially within threshold
    gpairs = (
        _bucket_pairs(small0)
        .unionByName(_bucket_pairs(buckets1))
        .distinct()
    )
    self_pairs = (
        groups.filter(F.col("n_members") >= 2)
        .select(F.col("sig_key").alias("sig_a"),
                F.col("sig_key").alias("sig_b"),
                F.lit(0).cast("int").alias("hamming"))
    )
    edges = gpairs.unionByName(self_pairs)
    ma = members.select(F.col("sig_key").alias("sig_a"),
                        F.col("doc_id").alias("da"))
    mb = members.select(F.col("sig_key").alias("sig_b"),
                        F.col("doc_id").alias("db"))
    return (
        edges.join(ma, "sig_a").join(mb, "sig_b")
        # within a group emit each unordered pair once; across groups
        # the group pair is unique so every (da, db) combination is
        # already unique — orient by doc id either way
        .filter((F.col("sig_a") != F.col("sig_b"))
                | (F.col("da") < F.col("db")))
        .select(F.least("da", "db").alias("doc_a"),
                F.greatest("da", "db").alias("doc_b"),
                "hamming")
        .orderBy("doc_a", "doc_b")
    )


def multimodal_ahash_groups(documents: DataFrame) -> DataFrame:
    """Perceptual-hash dedup for media assets: the average-hash
    (aHash) discipline — bit j of the 16-bit signature is set iff
    histogram bucket j is above the per-asset mean — computed over
    the deterministic byte-histogram features that stand in for the
    stubbed decoder (a real pipeline swaps in 8×8-luma aHash/pHash
    inside the same mapInPandas stage and keeps this whole plan).

    Unlike byte-exact dedup (multimodal_dedup_exact), re-encoded
    variants of the same asset collide here: the signature quantizes
    SHAPE, not bytes. Output is GROUP-level (one row per distinct
    signature) — O(groups), never pairwise, so the plan scales like
    dedup_exact: one Arrow feature stage, one integer aggregate per
    asset, one groupBy on a 16-bit key. The above-mean test is pure
    integer arithmetic (count·16 > total), engine-exact."""
    feats = multimodal_features_long(documents)
    w = Window.partitionBy("doc_id")
    bit = F.when(
        F.col("bucket_count") * 16 > F.sum("bucket_count").over(w),
        F.pow(F.lit(2.0), F.col("dim_idx")).cast("bigint")
    ).otherwise(F.lit(0).cast("bigint"))
    sig = (
        feats.withColumn("b", bit)
        .groupBy("doc_id")
        .agg(F.sum("b").alias("ahash"))
    )
    return (
        sig.groupBy("ahash")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count(F.lit(1)).alias("n_assets"),
             (F.count(F.lit(1)) > 1).alias("had_collisions"))
        .orderBy("ahash")
    )


def multimodal_byte_entropy(documents: DataFrame,
                            dim: int = 16) -> DataFrame:
    """Per-asset byte-histogram Shannon entropy (nats, e6 integer) —
    the cheap corrupt-blob detector for a multimodal ingest: a
    truncated/encrypted/random-byte payload is near-uniform over the
    byte buckets (H → ln dim) while any structured payload (text,
    headers, real media containers) sits well below; the flag marks
    assets whose entropy crosses 2.7 (ln 16 ≈ 2.7726). The QC gate a
    pipeline runs before spending decode time on garbage.

    Composes multimodal_features_long's Arrow-batched histogram (one
    payload pass, integer counts — no new UDF); the entropy reduces
    per doc with the source_token_entropy discipline: each n·ln(n)
    term floors to an e6 INTEGER before the sum (order-independent
    across engines/retries), one double ln(N) + division at the end,
    floored e6. Output is doc-grain slim rows; payloads never
    shuffle."""
    feats = multimodal_features_long(documents, dim)
    nz = feats.filter(F.col("bucket_count") > 0)
    per = nz.groupBy("doc_id").agg(
        F.sum("bucket_count").alias("n_bytes"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.floor(F.col("bucket_count")
                      * F.log("bucket_count") * 1e6).cast("bigint"))
         .alias("__nlogn_e6"))
    ent = (F.log("n_bytes")
           - F.col("__nlogn_e6") / 1e6 / F.col("n_bytes"))
    e6 = F.floor(ent * 1e6).cast("bigint")
    return (
        per.select(
            "doc_id", "n_bytes", "n_buckets",
            e6.alias("entropy_e6"),
            (e6 >= 2700000).alias("is_near_uniform"))
        .orderBy("doc_id")
    )
