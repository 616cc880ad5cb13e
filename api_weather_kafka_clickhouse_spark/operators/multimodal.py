"""Multimodal column handling (SURVEY.md §2-D5): opaque binary
payloads + typed metadata, decode/feature-extract via Arrow-batched
Pandas UDFs, deterministic frame sampling.

The container has no image/audio codecs, so the *decode* itself is a
deterministic stand-in (byte statistics / adler-style checksum), but
the Spark-side plumbing is the real design and fully tested:

- payloads travel as `binary` columns with a `struct` metadata sibling
  (mime, n_bytes) — the 100 TB layout where bytes stay columnar and
  predicates prune on metadata without touching payloads;
- feature extraction runs in `mapInPandas` (Arrow batches of bytes →
  numpy → features), the shape a real image/audio decoder plugs into;
- frame sampling expands rows with built-in `sequence`+`explode`, so
  the fan-out happens JVM-side, not in Python.

A real decoder would replace `_extract_batch`'s body and raise
`NotImplementedError` absent its codec; everything around it stays.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load

ADLER_MOD = 65521

_FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, head_byte int, tail_byte int, checksum bigint"


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-materialized as the multimodal layout:
    (doc_id, payload binary, meta struct<mime,n_bytes>)."""
    d = load(spark, "documents", sf_dir)
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in decoder. Real codecs (PIL/ffmpeg) would
    slot in here unchanged; see module docstring."""
    import numpy as np

    for pdf in batches:
        payloads = pdf["payload"]
        # one numpy pass over the concatenated bytes (vs a Python sum
        # per row): decode work is where Arrow-batch UDFs pay off
        lens = payloads.map(len).to_numpy()
        if len(lens) and lens.sum():
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
            # segment sums via prefix sum: exact for empty segments in
            # any position (reduceat would need index clipping, which
            # corrupts the segment before a trailing empty payload)
            bounds = np.concatenate(([0], np.cumsum(lens)))
            prefix = np.concatenate(([0], np.cumsum(flat)))
            sums = prefix[bounds[1:]] - prefix[bounds[:-1]]
        else:
            sums = np.zeros(len(lens), dtype=np.int64)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": lens,
                "head_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                "tail_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                "checksum": sums % ADLER_MOD,
            }
        )


@register(
    "mm_feature_extract",
    oracle=f"""
    SELECT doc_id,
           strlen(text)    AS n_bytes,
           CASE WHEN strlen(text) = 0 THEN -1 ELSE ascii(text[1])  END AS head_byte,
           CASE WHEN strlen(text) = 0 THEN -1 ELSE ascii(text[-1]) END AS tail_byte,
           CAST(coalesce(list_sum([ascii(text[i]) for i in range(1, length(text) + 1)]), 0)
                % {ADLER_MOD} AS BIGINT) AS checksum
    FROM documents
    """,
    doc="Binary feature extraction through mapInPandas (Arrow batches). "
    "The oracle recomputes the byte statistics in pure SQL over the "
    "source text (ASCII corpus: char codes == bytes). Empty payloads "
    "are guarded to the kernel's sentinels (-1 head/tail, 0 checksum) "
    "— DuckDB's list_sum([]) is NULL and ascii('') is not -1, so an "
    "unguarded oracle would diverge on any empty document (the "
    "mm_resize_stub oracle guards the same case).",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return binary_table(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        _extract_batch, schema=_FEATURE_SCHEMA
    )


RESIZE_STRIDE = 4

_RESIZE_SCHEMA = "doc_id bigint, n_bytes_in bigint, n_bytes_out bigint, out_checksum bigint"


def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stride-downsample stand-in for an image/audio resize kernel:
    keep every RESIZE_STRIDE-th byte. A real resampler (PIL/librosa)
    replaces the two numpy lines; the Arrow-batch plumbing, schema,
    and metadata update are the production shape."""
    import numpy as np

    for pdf in batches:
        n_in, n_out, checks = [], [], []
        for b in pdf["payload"]:
            arr = np.frombuffer(b, dtype=np.uint8)[::RESIZE_STRIDE]
            n_in.append(len(b))
            n_out.append(len(arr))
            checks.append(int(arr.astype(np.int64).sum()) % ADLER_MOD)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes_in": n_in,
                "n_bytes_out": n_out,
                "out_checksum": checks,
            }
        )


@register(
    "mm_resize_stub",
    oracle=f"""
    SELECT doc_id,
           strlen(text) AS n_bytes_in,
           (strlen(text) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE} AS n_bytes_out,
           CAST(coalesce(list_sum([ascii(text[i]) for i in range(1, strlen(text) + 1)
                                   if (i - 1) % {RESIZE_STRIDE} = 0]), 0) % {ADLER_MOD}
                AS BIGINT) AS out_checksum
    FROM documents
    """,
    doc="Resize/resample through the multimodal decode path: every "
    "4th byte survives (deterministic downsample stand-in — no codecs "
    "in this container), metadata updated to the new size, checksum "
    "over the resampled payload. The oracle recomputes the stride "
    "sample in SQL over the source text (ASCII corpus: char == byte); "
    "coalesce guards empty payloads, where DuckDB's list_sum([]) is "
    "NULL but the kernel returns 0.",
)
def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return binary_table(spark, sf_dir).select("doc_id", "payload").mapInPandas(
        _resize_batch, schema=_RESIZE_SCHEMA
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, frame_idx, n_frames FROM (
      SELECT doc_id, strlen(text) // 100 AS n_frames,
             unnest([i for i in range(0, strlen(text) // 100) if i % 4 = 0]) AS frame_idx
      FROM documents
      WHERE strlen(text) // 100 > 0
    )
    """,
    doc="Deterministic frame sampling: metadata-declared frame count "
    "(1 frame / 100 bytes), sample every 4th frame. Fan-out via "
    "sequence+explode stays JVM-side; payload bytes are never read — "
    "the plan prunes to metadata only (verify with .explain: no "
    "payload column in ReadSchema).",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    bt = binary_table(spark, sf_dir)
    n_frames = F.col("meta.n_bytes") / F.lit(100)
    nf = F.floor(n_frames).cast("bigint")
    return (
        bt.select("doc_id", nf.alias("n_frames"))
        .filter(F.col("n_frames") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(4))).alias("frame_idx"),
            "n_frames",
        )
    )


# --- perceptual-hash near-dup dedup ----------------------------------

PHASH_BANDS = 4
PHASH_MAX_HAMMING = 3  # pigeonhole: < PHASH_BANDS flips guarantee a
# shared 16-bit band, so banding has perfect recall at this radius

_PHASH_SCHEMA = "doc_id bigint, phash bigint"


def _phash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Stand-in perceptual hash: 64 coarse byte-region means
    thresholded at the payload mean — the downscale+DCT+threshold
    shape of a real image pHash, over raw bytes. Structurally robust:
    a local edit disturbs only the regions it touches, so near-
    identical payloads land within a few bits. A real decoder
    (PIL + DCT) slots into the loop body unchanged.

    r10 upgrade (verdict item 7): every operation is EXACT integer
    arithmetic so a SQL oracle can recompute each bit — region bounds
    are ``i*n//64`` (not float linspace, whose truncation is
    platform-dependent at region edges) and the mean comparison is
    cross-multiplied (``region_sum * n > total_sum * region_len``),
    eliminating float division entirely. Same thresholding semantics,
    bit-for-bit reproducible in DuckDB."""
    import numpy as np

    for pdf in batches:
        hashes = []
        for p in pdf["payload"]:
            a = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
            n = len(a)
            if n == 0:
                hashes.append(0)
                continue
            prefix = np.concatenate(([0], np.cumsum(a)))
            idx = (np.arange(65, dtype=np.int64) * n) // 64
            rsums = prefix[idx[1:]] - prefix[idx[:-1]]
            rlens = idx[1:] - idx[:-1]
            total = int(prefix[-1])
            bits = rsums * n > total * rlens
            h = int(sum(1 << i for i, b in enumerate(bits) if b))
            hashes.append(h - (1 << 64) if h >= (1 << 63) else h)
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": hashes})


def phash_signatures(bt: DataFrame) -> DataFrame:
    """(doc_id, phash) via mapInPandas over the binary layout."""
    return bt.select("doc_id", "payload").mapInPandas(_phash_batch, _PHASH_SCHEMA)


def phash_pairs(sigs: DataFrame) -> DataFrame:
    """Near-dup pairs by banded Hamming join — the dedup_simhash
    kernel applied to decoder output: 4 x 16-bit bands generate
    candidates (equi-join, never all-pairs), bit_count(xor) verifies.
    At 100 TB the signature table is 16 bytes/row and bands are the
    bucketing key."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.shiftright(F.col("phash"), j * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for j in range(PHASH_BANDS)
        ]
    )
    bands = sigs.select("doc_id", "phash", F.explode(band_structs).alias("b")).select(
        "doc_id", "phash", "b.band_idx", "b.band_key"
    )
    ba = bands.select(F.col("doc_id").alias("doc_a"), F.col("phash").alias("ph_a"), "band_idx", "band_key")
    bb = bands.select(F.col("doc_id").alias("doc_b"), F.col("phash").alias("ph_b"), "band_idx", "band_key")
    hamming = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        ba.join(bb, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .distinct()
    )


# the oracle recomputes all 64 signature bits in SQL: a codes list
# (ascii(text[i]) — ASCII corpus, char == byte), one inclusive slice
# per region at exact bounds j*n//64, cross-multiplied threshold,
# HUGEINT bit accumulation folded back to signed 64 (bit 63 set means
# the BIGINT is negative — same two's-complement fold as the kernel).
_PHASH_BIT_TERMS = " + ".join(
    f"(CASE WHEN coalesce(list_sum(codes[({j}*n)//64 + 1 : ({j + 1}*n)//64]), 0) * n "
    f"> total * (({j + 1}*n)//64 - ({j}*n)//64) THEN {1 << j}::HUGEINT ELSE 0::HUGEINT END)"
    for j in range(64)
)

_PHASH_SIGS_CTE = f"""
    codes_t AS (
      SELECT doc_id, strlen(text) AS n,
             [ascii(text[i]) for i in range(1, strlen(text) + 1)] AS codes
      FROM documents
    ),
    tot AS (
      SELECT doc_id, n, codes, CAST(coalesce(list_sum(codes), 0) AS BIGINT) AS total
      FROM codes_t
    ),
    raw AS (
      SELECT doc_id,
             CASE WHEN n = 0 THEN 0::HUGEINT ELSE ({_PHASH_BIT_TERMS}) END AS h
      FROM tot
    ),
    sigs AS (
      SELECT doc_id,
             CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
                        THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                  AS BIGINT) AS phash
      FROM raw
    )
"""


@register(
    "mm_phash_signatures",
    oracle=f"WITH {_PHASH_SIGS_CTE} SELECT doc_id, phash FROM sigs",
    doc="Multimodal near-dup dedup, signature stage: perceptual-hash "
    "fingerprints from the (stand-in) decoder via mapInPandas — one "
    "16-byte row per payload regardless of media size, the index a "
    "100 TB image-dedup writes once and joins forever. Upgraded from "
    "rows-only to hash-checked in r10 (the dedup_simhash playbook): "
    "the kernel's region bounds are exact i*n//64 and its threshold "
    "is cross-multiplied, so the oracle recomputes every signature "
    "bit in SQL over the source text (ASCII corpus: char == byte). "
    "On the synthetic corpus the byte-positional stand-in only "
    "closes same-length edits (tested with crafted payloads; real "
    "DCT pHashes are decode-level robust).",
)
def mm_phash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return phash_signatures(binary_table(spark, sf_dir))


# Planted fixtures for the pair stage: the synthetic corpus has no
# byte-identical or same-length-edited texts (verified at sf0.01), so
# an unaugmented pair query would gate on an empty result — a check
# any bug that returns empty would pass. Both engines deterministically
# add an exact copy of every 7th doc (id + COPY_BASE) and a one-byte
# same-length edit of every 11th doc (id + EDIT_BASE), making the band
# join's output non-degenerate at every SF and guaranteeing at least
# the hamming-0 copy pairs by construction.
PHASH_COPY_MOD, PHASH_COPY_BASE = 7, 10_000_000
PHASH_EDIT_MOD, PHASH_EDIT_BASE = 11, 20_000_000
PHASH_EDIT_POS = 11  # 1-based char replaced with 'Q'

_PHASH_AUGMENT_SQL = f"""
    aug AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {PHASH_COPY_BASE}, text FROM documents
      WHERE doc_id % {PHASH_COPY_MOD} = 0
      UNION ALL
      SELECT doc_id + {PHASH_EDIT_BASE},
             substr(text, 1, {PHASH_EDIT_POS - 1}) || 'Q'
               || substr(text, {PHASH_EDIT_POS + 1})
      FROM documents
      WHERE doc_id % {PHASH_EDIT_MOD} = 0 AND strlen(text) > {PHASH_EDIT_POS}
    )
"""


def _augmented_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir).select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % PHASH_COPY_MOD == 0).select(
        (F.col("doc_id") + PHASH_COPY_BASE).alias("doc_id"), "text"
    )
    edited = (
        d.filter(
            (F.col("doc_id") % PHASH_EDIT_MOD == 0)
            & (F.length("text") > PHASH_EDIT_POS)
        )
        .select(
            (F.col("doc_id") + PHASH_EDIT_BASE).alias("doc_id"),
            F.concat(
                F.substring("text", 1, PHASH_EDIT_POS - 1),
                F.lit("Q"),
                F.expr(f"substring(text, {PHASH_EDIT_POS + 1})"),
            ).alias("text"),
        )
    )
    aug = d.unionByName(copies).unionByName(edited)
    return aug.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


@register(
    "mm_phash_band_pairs",
    oracle=f"""
    WITH {_PHASH_AUGMENT_SQL},
    codes_t AS (
      SELECT doc_id, strlen(text) AS n,
             [ascii(text[i]) for i in range(1, strlen(text) + 1)] AS codes
      FROM aug
    ),
    tot AS (
      SELECT doc_id, n, codes, CAST(coalesce(list_sum(codes), 0) AS BIGINT) AS total
      FROM codes_t
    ),
    raw AS (
      SELECT doc_id,
             CASE WHEN n = 0 THEN 0::HUGEINT ELSE ({_PHASH_BIT_TERMS}) END AS h
      FROM tot
    ),
    sigs AS (
      SELECT doc_id,
             CAST(h - CASE WHEN h >= 9223372036854775808::HUGEINT
                        THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                  AS BIGINT) AS phash
      FROM raw
    ),
    bands AS (
      SELECT doc_id, phash, j AS band_idx,
             (phash >> (j * 16)) & 65535 AS band_key
      FROM sigs, (VALUES (0), (1), (2), (3)) b(j)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_key = b.band_key
    WHERE a.doc_id < b.doc_id
      AND bit_count(xor(a.phash, b.phash)) <= {PHASH_MAX_HAMMING}
    """,
    doc="Multimodal near-dup dedup, pair stage — the pigeonhole band "
    "join over the signature table, hash-checked end-to-end (verdict "
    "item 7): 4 x 16-bit bands propose candidates via ONE equi-join "
    "on (band_idx, band_key) — never all-pairs — and bit_count(xor) "
    "<= 3 verifies, with PERFECT recall at that radius by pigeonhole "
    "(< 4 flips must leave one band intact). Runs over the corpus "
    "augmented with deterministic planted fixtures (exact copies + "
    "one-byte same-length edits, mirrored in both engines) because "
    "the synthetic corpus has no near-identical payloads — without "
    "them the gate row would be an empty result any empty-returning "
    "bug could fake. The oracle re-derives signatures in SQL and "
    "brute-bands them; the Spark plan shuffles 16-byte signature "
    "rows only, the 100 TB shape (payloads never enter the join).",
)
def mm_phash_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = phash_signatures(_augmented_binary(spark, sf_dir))
    return phash_pairs(sigs).select(
        "doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming")
    )


@register(
    "mm_blob_dedup",
    oracle=f"""
    WITH {_PHASH_AUGMENT_SQL},
    sized AS (
      SELECT doc_id, md5(text) AS digest, strlen(text) AS n_bytes
      FROM aug
    ),
    grouped AS (
      SELECT digest, n_bytes,
             CAST(count(*) AS BIGINT) AS n_copies,
             min(doc_id) AS keep_id,
             list_sort(list(doc_id)) AS ids
      FROM sized GROUP BY digest, n_bytes
    )
    SELECT digest, CAST(n_bytes AS BIGINT) AS n_bytes, n_copies,
           CAST(keep_id AS BIGINT) AS keep_id,
           array_to_string(list_transform(ids[2:len(ids)],
             x -> CAST(x AS VARCHAR)), ',') AS dup_ids,
           CAST((n_copies - 1) * n_bytes AS BIGINT) AS bytes_saved
    FROM grouped
    WHERE n_copies > 1
    """,
    doc="Exact blob dedup over the multimodal binary layout — the "
    "content-addressable-store identity (size, md5 digest) that a "
    "100 TB image/audio lake dedups on BEFORE any decode work: "
    "group by the 16-byte digest, keep the lowest doc_id, account "
    "bytes_saved = (copies-1) x size. ONE map-side-combined groupBy "
    "on the digest (payloads hash where they live; only digests and "
    "ids shuffle — at scale the shuffle is 24 bytes/row regardless "
    "of blob size); the collision story is the digest's, the size "
    "column disambiguates md5's theoretical pairs for free. Runs "
    "over the corpus augmented with the planted exact copies "
    "(mm_phash_band_pairs' fixture rule: the synthetic corpus has "
    "zero natural byte-identical payloads, and a dedup query gated "
    "on an empty result proves nothing).",
)
def mm_blob_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    bt = _augmented_binary(spark, sf_dir)
    sized = bt.select(
        "doc_id",
        F.md5("payload").alias("digest"),
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
    )
    grouped = sized.groupBy("digest", "n_bytes").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.min("doc_id").cast("bigint").alias("keep_id"),
        F.sort_array(F.collect_list("doc_id")).alias("ids"),
    )
    return grouped.filter(F.col("n_copies") > 1).select(
        "digest",
        "n_bytes",
        "n_copies",
        "keep_id",
        F.array_join(
            F.transform(
                F.expr("slice(ids, 2, size(ids) - 1)"),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("dup_ids"),
        ((F.col("n_copies") - 1) * F.col("n_bytes")).cast("bigint").alias("bytes_saved"),
    )


# --- container-format sniffing (round 11 continuation) ------------------

# Synthetic container headers planted by doc_id % 4 (the fixture trick
# of mm_phash_band_pairs: the detector must EARN its answer from the
# bytes; the planted label only grades it).
MAGIC_PNG = "89504E470D0A1A0A"
MAGIC_JPEG = "FFD8FF"
MAGIC_RIFF = "52494646"  # 'RIFF'; bytes 9-12 'WAVE' finish the claim
MAGIC_WAVE = "57415645"
_RIFF_STUB = MAGIC_RIFF + "00000000" + MAGIC_WAVE  # RIFF + size + WAVE


@register(
    "mm_magic_sniff",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
               WHEN 2 THEN 'audio/wav' ELSE 'application/octet-stream'
             END AS planted_mime,
             CASE doc_id % 4
               WHEN 0 THEN from_hex('{MAGIC_PNG}') || encode(text)
               WHEN 1 THEN from_hex('{MAGIC_JPEG}') || encode(text)
               WHEN 2 THEN from_hex('{_RIFF_STUB}') || encode(text)
               ELSE encode(text)
             END AS payload
      FROM documents
    ),
    sniffed AS (
      SELECT doc_id, planted_mime, octet_length(payload) AS n_bytes,
             CASE
               WHEN substr(hex(payload), 1, 16) = '{MAGIC_PNG}'
                 THEN 'image/png'
               WHEN substr(hex(payload), 1, 6) = '{MAGIC_JPEG}'
                 THEN 'image/jpeg'
               WHEN substr(hex(payload), 1, 8) = '{MAGIC_RIFF}'
                AND substr(hex(payload), 17, 8) = '{MAGIC_WAVE}'
                 THEN 'audio/wav'
               ELSE 'application/octet-stream'
             END AS detected_mime
      FROM aug
    )
    SELECT detected_mime,
           CAST(count(*) AS BIGINT) AS n_blobs,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(CASE WHEN detected_mime <> planted_mime THEN 1 ELSE 0 END)
                AS BIGINT) AS n_mismatch
    FROM sniffed GROUP BY detected_mime
    """,
    doc="Container-format sniffing at the binary layer — the ingest "
    "router every multimodal pipeline needs BEFORE decode: detect "
    "PNG / JPEG / RIFF-WAVE from the payload's magic bytes (RIFF "
    "requires BOTH the 'RIFF' prefix and 'WAVE' at bytes 9-12, the "
    "real two-probe rule) instead of trusting caller-supplied "
    "metadata, then route by detected type. Headers are planted "
    "deterministically by doc_id so the oracle can grade the "
    "detector (n_mismatch must be 0 — the planted label never "
    "feeds the detection branch). Detection reads a fixed-length "
    "byte prefix (Spark: hex of substr(payload); DuckDB: substr of "
    "hex — same values), so at 100 TB the sniff costs a prefix "
    "comparison per blob, never a payload scan, and the per-mime "
    "rollup is one map-side-combined aggregate.",
)
def mm_magic_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    mod = F.col("doc_id") % 4
    planted = (
        F.when(mod == 0, "image/png")
        .when(mod == 1, "image/jpeg")
        .when(mod == 2, "audio/wav")
        .otherwise("application/octet-stream")
    )
    raw = F.encode("text", "UTF-8")
    payload = (
        F.when(mod == 0, F.concat(F.lit(bytes.fromhex(MAGIC_PNG)), raw))
        .when(mod == 1, F.concat(F.lit(bytes.fromhex(MAGIC_JPEG)), raw))
        .when(mod == 2, F.concat(F.lit(bytes.fromhex(_RIFF_STUB)), raw))
        .otherwise(raw)
    )
    aug = d.select(
        "doc_id", planted.alias("planted_mime"), payload.alias("payload")
    )
    head = F.hex(F.expr("substring(payload, 1, 12)"))
    detected = (
        F.when(F.substring(head, 1, 16) == MAGIC_PNG, "image/png")
        .when(F.substring(head, 1, 6) == MAGIC_JPEG, "image/jpeg")
        .when(
            (F.substring(head, 1, 8) == MAGIC_RIFF)
            & (F.substring(head, 17, 8) == MAGIC_WAVE),
            "audio/wav",
        )
        .otherwise("application/octet-stream")
    )
    sniffed = aug.select(
        "planted_mime",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        detected.alias("detected_mime"),
    )
    return sniffed.groupBy("detected_mime").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blobs"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum(
            F.when(F.col("detected_mime") != F.col("planted_mime"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_mismatch"),
    )


# --- scene-cut detection (round 11 continuation) ------------------------

# A transition is a cut when the frame-signature delta (sum of byte
# values over the 100-byte frame region) jumps by more than CUT_DELTA
# — i.e. the mean "luminance" moves > 2.5 byte-values frame-to-frame.
CUT_DELTA = 250
CUT_HEAD = 16  # rendered cut-position prefix


@register(
    "mm_scene_cuts",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, i AS frame_idx,
             CAST(list_sum([ord(substr(substr(text, i * 100 + 1, 100), j, 1))
                   for j in range(1,
                     len(substr(text, i * 100 + 1, 100)) + 1)]) AS BIGINT)
               AS sig
      -- length() = CHARACTER count, matching the Spark side's
      -- F.length/F.ascii (char/codepoint-based); strlen would diverge
      -- on non-ASCII text (round-11 ADVICE).
      FROM (SELECT doc_id, text, unnest(range(0, length(text) // 100)) AS i
            FROM documents)
    ),
    d AS (
      SELECT doc_id, frame_idx, sig,
             abs(sig - lag(sig) OVER (PARTITION BY doc_id
                                      ORDER BY frame_idx)) AS delta
      FROM f
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_frames,
           CAST(sum(CASE WHEN delta > {CUT_DELTA} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cuts,
           CAST(min(CASE WHEN delta > {CUT_DELTA} THEN frame_idx END)
                AS BIGINT) AS first_cut_idx,
           coalesce(array_to_string(
             (list(frame_idx ORDER BY frame_idx)
                FILTER (delta > {CUT_DELTA}))[1:{CUT_HEAD}], ','), '')
             AS cuts_head
    FROM d GROUP BY doc_id
    """,
    doc="Scene-cut detection over the synthetic video layout (frame = "
    "100-CHARACTER region of the payload — char/codepoint-based in "
    "BOTH engines (F.length/F.ascii vs length()/ord(), round-11 "
    "ADVICE fix), so the parity contract survives a non-ASCII "
    "corpus; == bytes on the pinned-ASCII fixtures): "
    "a cut where the frame signature — the exact integer code-sum, "
    "the stand-in for a real decoder's per-frame luminance/histogram "
    "— jumps more than CUT_DELTA against the previous frame. This "
    "is the shot-boundary pass a video-training pipeline runs to "
    "pick keyframes (sample one frame per SCENE beats every-Nth "
    "when scenes are uneven). The real decoder drops into the "
    "signature expression; everything else — frame fan-out via "
    "sequence+explode (JVM-side), one doc-partitioned lag window, "
    "per-doc rollup — is the production plumbing and survives "
    "100 TB: work is frames-per-doc bounded, the only shuffle is "
    "the doc-partitioned window, and signatures are 8 bytes per "
    "frame regardless of frame size.",
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    nf = F.floor(F.length("text") / 100).cast("bigint")
    # Short docs filtered BEFORE the explode: sequence(0, nf-1) on an
    # nf=0 doc is a DESCENDING [0, -1] generator that would fabricate
    # frame rows correctness then depends on a later filter dropping
    # (round-12 advice) — this way none is ever materialized.
    frames = d.filter(F.length("text") >= 100).select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), nf - 1)).alias("frame_idx"),
    )
    frame_str = F.col("text").substr(
        (F.col("frame_idx") * 100 + 1).cast("int"), F.lit(100)
    )
    sig = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(frame_str)),
            lambda j: F.ascii(frame_str.substr(j, F.lit(1))),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    f = frames.select("doc_id", "frame_idx", sig.alias("sig"))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    dd = f.select(
        "doc_id",
        "frame_idx",
        F.abs(F.col("sig") - F.lag("sig").over(w)).alias("delta"),
    )
    is_cut = F.col("delta") > CUT_DELTA
    return dd.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        F.sum(F.when(is_cut, 1).otherwise(0)).cast("bigint").alias("n_cuts"),
        F.min(F.when(is_cut, F.col("frame_idx"))).cast("bigint").alias(
            "first_cut_idx"
        ),
        F.array_join(
            F.slice(
                F.array_sort(
                    F.collect_list(F.when(is_cut, F.col("frame_idx")))
                ),
                1,
                CUT_HEAD,
            ).cast("array<string>"),
            ",",
        ).alias("cuts_head"),
    )


# --- voice-activity segments (round 12) ---------------------------------


@register(
    "mm_audio_vad_segments",
    oracle="""
    WITH f AS (
      SELECT doc_id, i AS frame_idx,
             CAST(list_sum([ord(substr(substr(text, i * 100 + 1, 100), j, 1))
                   for j in range(1,
                     len(substr(text, i * 100 + 1, 100)) + 1)]) AS BIGINT)
               AS energy
      FROM (SELECT doc_id, text, unnest(range(0, length(text) // 100)) AS i
            FROM documents)
    ),
    t AS (
      SELECT doc_id, frame_idx, energy,
             CAST(sum(energy) OVER (PARTITION BY doc_id) AS BIGINT)
               AS total_energy,
             CAST(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_frames
      FROM f
    ),
    -- active = frame energy above the doc's mean frame energy,
    -- cross-multiplied so no float decides
    act AS (
      SELECT doc_id, frame_idx, n_frames,
             (energy * n_frames > total_energy) AS active
      FROM t
    ),
    isl AS (
      SELECT doc_id, frame_idx, n_frames,
             frame_idx - row_number() OVER (PARTITION BY doc_id
                                            ORDER BY frame_idx) AS grp
      FROM act WHERE active
    ),
    seg AS (
      SELECT doc_id, max(n_frames) AS n_frames, grp,
             CAST(count(*) AS BIGINT) AS seg_len,
             CAST(min(frame_idx) AS BIGINT) AS seg_start
      FROM isl GROUP BY doc_id, grp
    )
    SELECT doc_id,
           CAST(max(n_frames) AS BIGINT) AS n_frames,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(seg_len) AS BIGINT) AS n_active,
           CAST(max(seg_len) AS BIGINT) AS longest_segment,
           CAST(min(seg_start) AS BIGINT) AS first_active_idx
    FROM seg GROUP BY doc_id
    """,
    doc="Voice-activity detection over the synthetic audio layout "
    "(frame = 100-char region, char/codepoint-based in both engines "
    "like mm_scene_cuts): a frame is ACTIVE when its energy — the "
    "exact integer code-sum standing in for a real decoder's frame "
    "RMS — exceeds the document's mean frame energy "
    "(cross-multiplied, no float decides), and consecutive active "
    "frames merge into segments via the gaps-and-islands "
    "row_number difference. This is the silence-trimming pass an "
    "audio-training pipeline runs before transcription or segment "
    "sampling; the real energy kernel drops into the signature "
    "expression. Shape: frame fan-out stays JVM-side "
    "(sequence+explode), then TWO doc-partitioned windows (mean, "
    "islands) and one rollup — work is frames-per-doc bounded, "
    "shuffle is one doc-keyed exchange, 16 bytes per frame "
    "regardless of frame payload size. Survives 100 TB of audio "
    "because only signatures move.",
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, "documents", sf_dir)
    nf = F.floor(F.length("text") / 100).cast("bigint")
    # Short docs filtered BEFORE the explode: sequence(0, nf-1) on an
    # nf=0 doc is a DESCENDING [0, -1] generator that would fabricate
    # frame rows correctness then depends on a later filter dropping
    # (round-12 advice) — this way none is ever materialized.
    frames = d.filter(F.length("text") >= 100).select(
        "doc_id",
        "text",
        F.explode(F.sequence(F.lit(0), nf - 1)).alias("frame_idx"),
    )
    frame_str = F.col("text").substr(
        (F.col("frame_idx") * 100 + 1).cast("int"), F.lit(100)
    )
    energy = F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(frame_str)),
            lambda j: F.ascii(frame_str.substr(j, F.lit(1))),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    f = frames.select("doc_id", "frame_idx", energy.alias("energy"))
    wdoc = Window.partitionBy("doc_id")
    t = f.select(
        "doc_id",
        "frame_idx",
        "energy",
        F.sum("energy").over(wdoc).cast("bigint").alias("total_energy"),
        F.count(F.lit(1)).over(wdoc).cast("bigint").alias("n_frames"),
    )
    act = t.filter(
        F.col("energy") * F.col("n_frames") > F.col("total_energy")
    )
    word = Window.partitionBy("doc_id").orderBy("frame_idx")
    isl = act.select(
        "doc_id",
        "frame_idx",
        "n_frames",
        (F.col("frame_idx") - F.row_number().over(word)).alias("grp"),
    )
    seg = isl.groupBy("doc_id", "grp").agg(
        F.max("n_frames").alias("n_frames"),
        F.count(F.lit(1)).cast("bigint").alias("seg_len"),
        F.min("frame_idx").cast("bigint").alias("seg_start"),
    )
    return seg.groupBy("doc_id").agg(
        F.max("n_frames").cast("bigint").alias("n_frames"),
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_len").cast("bigint").alias("n_active"),
        F.max("seg_len").cast("bigint").alias("longest_segment"),
        F.min("seg_start").cast("bigint").alias("first_active_idx"),
    )
