"""Entity resolution: canonicalization, minhash-LSH blocking, connected
components (SURVEY.md §7.7 / north rule).

No reference analogue — this is the KG extension layered on the mention
table. Everything here is declarative DataFrame work so Catalyst handles
pushdown/pruning; the only iteration (connected components) uses the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — public), with
localCheckpoint() to truncate lineage between rounds.

Scale notes (100 TB posture):
  - blocking is explode -> groupBy(band) -> within-bucket self-join; bucket
    width is bounded by LSH parameters, and oversized buckets (degenerate
    surfaces) are capped explicitly to keep the self-join quadratic blowup
    bounded (no silent cap: the cap is a parameter and capped buckets can
    be counted by the caller).
  - minhash uses md5-derived 64-bit integer hashes (same function exists in
    DuckDB, which makes the op oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# WEAK references to DataFrames persisted by resolve_entities in this
# process; long-lived sessions (bench sweeps, eval loops, streaming batches)
# call release_persisted() between invocations so cached blocks don't
# accumulate until executor storage evicts under pressure. Weak refs keep
# the registry from pinning the DataFrames alive — once the caller drops
# its last reference, Spark's ContextCleaner can still GC-unpersist the
# blocks exactly as it did before the registry existed.
import weakref

_PERSISTED: list = []  # list[weakref.ref[DataFrame]]

# Observability: connected_components records which execution tier the last
# call took (driver-dict / driver-numpy / driver-streaming /
# contraction->driver-numpy / distributed-star), the edge count, and the
# memory-derived caps, so scale smokes and the bench artifact can show the
# tier actually exercised without re-deriving it from thresholds.
LAST_CC_INFO: dict = {}

# edges per driver-side Arrow batch in the streaming CC tier (~64 MB of
# int64 pairs); module-level so tests can force multi-batch ingestion on
# small graphs
_STREAM_BATCH_EDGES = 4_000_000


def _register_persisted(df: DataFrame) -> None:
    _PERSISTED.append(weakref.ref(df))


def release_persisted() -> int:
    """Unpersist every still-live DataFrame cached by this module; returns
    the count of frames unpersisted."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()()
        if df is None:
            continue  # already GC'd; ContextCleaner handles the blocks
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped
    return n


def normalize_surface(col):
    """Canonical surface form: lowercase, strip non-alphanumerics to single
    spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"[^\p{L}\p{Nd}]+", " "))


def canonicalize_mentions(mentions: DataFrame) -> DataFrame:
    return mentions.withColumn("norm", normalize_surface(F.col("surface")))


def _hash64(col, salt: int):
    """Deterministic 64-bit-ish hash from md5 (first 15 hex chars -> bigint).

    Reproducible in DuckDB: CAST(('0x' || substr(md5(salt || s),1,15)) AS BIGINT).
    """
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(salt) + "|"), col)), 1, 15), 16, 10).cast("bigint")


# Affine minhash family over Z_P: one md5 per shingle, n cheap arithmetic
# permutations derived from it (instead of n md5 evaluations — the md5 was
# >90% of the minhash cost). Constants are fixed/deterministic; the same
# formula is reproducible in DuckDB SQL.
MINHASH_P = 2147483647  # 2^31 - 1 (prime)


def minhash_affine_constants(n_hashes: int):
    """(a_i, b_i) pairs, deterministic."""
    import random

    rng = random.Random(12345)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P)) for _ in range(n_hashes)]


def _hash28(col):
    """Base hash: first 7 hex chars of md5 -> 28-bit int (DuckDB-reproducible)."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("bigint")


def shingles(col, k: int = 3):
    """Character k-shingles of a string column as an array (distinct)."""
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length({col}) < {k} THEN array({col}) "
            f"ELSE transform(sequence(1, length({col}) - {k} + 1), i -> substring({col}, i, {k})) END"
        )
    )


def minhash_signatures(df: DataFrame, text_col: str, key_col: str, n_hashes: int = 12, k: int = 3) -> DataFrame:
    """One row per key with minhash signature columns mh0..mh{n-1}.

    explode(shingles) -> one md5 per shingle -> n_hashes affine permutations
    -> column-wise min aggregation: a single shuffle on key_col with
    map-side partial aggregation. Input is spread to full parallelism first
    (a small doc table arrives as one file = one partition; at scale this
    repartition is a no-op relative to natural input splits).
    """
    from ..ops.text import spread_small_input

    df = spread_small_input(df)
    sh = df.select(key_col, F.explode(shingles(text_col, k)).alias("shingle")).withColumn(
        "h", _hash28(F.col("shingle"))
    )
    consts = minhash_affine_constants(n_hashes)
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MINHASH_P))).alias(f"mh{h}")
        for h, (a, b) in enumerate(consts)
    ]
    return sh.groupBy(key_col).agg(*aggs)


def minhash_signatures_kernel(
    df: DataFrame, text_col: str, key_col: str, n_hashes: int = 12, k: int = 3
) -> DataFrame:
    """Arrow-kernel evaluation of EXACTLY the minhash_signatures values:
    per row, distinct character k-shingles -> md5-prefix-28 hash -> n
    affine permutations -> column minima. Value-identical to the
    declarative path (hashlib md5 over utf-8 == F.md5; Python character
    slicing == substring; int64 % == pmod on nonnegative operands) —
    pinned by a parity test — but one per-row stage instead of a 290x
    row explosion through a 48-column hash aggregate: each task memoizes
    shingle hashes (corpus shingle vocabularies are Zipfian, so most md5
    calls become dict hits) and runs the affine family as one (n_hashes x
    n_shingles) numpy matrix op. Measured 2.9s -> 0.4s for the 48-hash
    pass over 50k ~300-char docs at 32 cores. The declarative
    minhash_signatures remains the oracle-facing reference."""
    import numpy as np
    import pandas as pd

    from ..ops.text import spread_small_input

    consts = minhash_affine_constants(n_hashes)
    a_vec = np.array([a for a, _ in consts], dtype=np.int64)[:, None]
    b_vec = np.array([b for _, b in consts], dtype=np.int64)[:, None]
    kt = df.schema[key_col].dataType.simpleString()
    schema = f"{key_col} {kt}, " + ", ".join(f"mh{i} bigint" for i in range(n_hashes))

    def kernel(batches):
        import hashlib

        memo: dict = {}

        def h28(s: str) -> int:
            v = memo.get(s)
            if v is None:
                v = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:7], 16)
                memo[s] = v
            return v

        m_p = MINHASH_P  # 2^31 - 1, Mersenne: x mod P via shift-add folds
        for pdf in batches:
            texts = pdf[text_col]
            keep = np.ones(len(pdf), dtype=bool)
            sh_sets = []
            for pos in range(len(pdf)):
                t = texts.iloc[pos]
                if t is None:
                    # declarative path: explode(shingles(NULL)) drops the row
                    keep[pos] = False
                    continue
                sh_sets.append(
                    {t} if len(t) < k else {t[i : i + k] for i in range(len(t) - k + 1)}
                )
            counts = np.fromiter((len(s) for s in sh_sets), dtype=np.int64, count=len(sh_sets))
            total = int(counts.sum())
            all_h = np.fromiter(
                (h28(s) for sh in sh_sets for s in sh), dtype=np.int64, count=total
            )
            offsets = np.zeros(len(sh_sets), dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            out = np.empty((len(sh_sets), n_hashes), dtype=np.int64)
            # chunk on doc boundaries so the (n_hashes x m) temp stays small
            d0 = 0
            while d0 < len(sh_sets):
                d1, m = d0, 0
                while d1 < len(sh_sets) and m < 100_000:
                    m += counts[d1]
                    d1 += 1
                lo = offsets[d0]
                hi = offsets[d1 - 1] + counts[d1 - 1]
                x = a_vec * all_h[None, lo:hi] + b_vec  # < 2^59 + 2^31
                # two folds: 2^31 ≡ 1 (mod P) — exact, no int64 division
                x = (x >> 31) + (x & m_p)
                x = (x >> 31) + (x & m_p)  # now in [0, P+2]
                np.subtract(x, m_p, out=x, where=x >= m_p)
                out[d0:d1] = np.minimum.reduceat(x, offsets[d0:d1] - lo, axis=1).T
                d0 = d1
            res = pd.DataFrame(out, columns=[f"mh{i}" for i in range(n_hashes)])
            res.insert(0, key_col, pdf[key_col].to_numpy()[keep])
            yield res

    return spread_small_input(df.select(key_col, text_col)).mapInPandas(kernel, schema=schema)


def _banded_bucket_frames(
    sig: DataFrame, carry: list, n_hashes: int, bands: int, max_bucket: int,
    block_cols=(),
) -> list:
    """Shared LSH banding: signature rows (mh0..mh{n-1} + carry columns) ->
    TWO frames of (*carry, band, sig) bucket rows — [normal buckets,
    split-bucket residue] — with oversized buckets SPLIT, then capped.

    A bucket larger than max_bucket would make the downstream self-join
    quadratic. Populations with long shared substrings (email domains,
    name morphemes) produce such buckets SYSTEMATICALLY at scale — a few
    percent of rows land in buckets whose band minima come entirely from
    the shared shingles — so dropping them wholesale costs real recall.
    Instead, members of an oversized bucket are re-keyed by two sub-band
    signatures over the FULL n-hash signature (rows 0..n/2 and n/2..n):
    high-similarity pairs survive with probability 1-(1-J^(n/2))^2 while
    the degenerate bucket fragments. Sub-buckets still over the cap are
    dropped (logged by bench's widevocab stats).

    Physical plan (optimization round 8): bucket rows are hash-repartitioned
    ONCE on the bucket key — explicitly, because the downstream verify
    stage is CPU-dense relative to its byte size and a planner-inserted
    exchange gets coalesced by AQE on bytes alone (measured 4 tasks /
    0.98s straggler on a stage with 2.6s of intersect CPU at sf0.1); the
    explicit count (default spark.sparkContext.defaultParallelism, conf
    `spark.nametag.lsh.bucketPartitions`) scales with the cluster. The
    oversized-bucket sets are keys-only aggregates computed FROM that
    same exchange (co-partitioned groupBy: no second exchange, payload
    columns pruned) and joined back as broadcast anti/semi probes, so the
    heavy shingle-payload rows are shuffled once and never re-sorted for
    size accounting (a window-count variant measured 20-30% SLOWER at
    240k surfaces — it re-sorts the payload per branch). Both branch
    plans are always present and lazy: AQE executes the split side as
    near-empty broadcast stages when no bucket is oversized, replacing
    the previous persist + EAGER oversized count that blocked the driver
    mid-plan and cached the payload rows. The two frames stay SEPARATE —
    the anti-join preserves the streamed side's partitioning, so each
    frame self-joins with NO further exchange (a union would discard it).
    Bucket membership, and therefore the candidate-pair set, is identical
    to the old policy.

    Since the r8 kernel rewrite this declarative machinery is OFF the hot
    paths: lsh_similarity_edges and minhash_dup_pairs run the same
    banding/split/cap policy partition-locally in
    _make_bucket_pair_kernel, and this definition remains for the staged
    reference path (lsh_candidate_pairs) and keys-only diagnostics
    (lsh_bucket_histogram). The two implementations of the policy are
    held together by the staged-reference parity test
    (tests/test_ops.py::test_minhash_dup_pairs_matches_staged_reference),
    which drives candidate membership through BOTH and must stay green
    after any policy change."""
    rows = n_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{h}").cast("string") for h in range(b * rows, (b + 1) * rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *parts)).alias("sig"))
        )
    half = n_hashes // 2
    sub1 = F.md5(F.concat_ws("_", *[F.col(f"mh{h}").cast("string") for h in range(half)]))
    sub2 = F.md5(F.concat_ws("_", *[F.col(f"mh{h}").cast("string") for h in range(half, n_hashes)]))
    buckets = sig.select(
        *carry, sub1.alias("_s1"), sub2.alias("_s2"), F.explode(F.array(*band_cols)).alias("bk")
    ).select(*carry, "_s1", "_s2", F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    spark = sig.sparkSession
    n_part = int(spark.conf.get("spark.nametag.lsh.bucketPartitions", "0") or 0)
    if n_part <= 0:
        n_part = spark.sparkContext.defaultParallelism
    bucket_key = list(block_cols) + ["band", "sig"]
    # persist the repartitioned bucket rows: the exchange alone is not
    # enough — every consumer stage (size aggregate, anti/semi probes,
    # each self-join side) would re-deserialize the full payload shuffle,
    # measured ~1.5x slower at 240k surfaces; the columnar cache makes
    # those reads cheap. Registered for release_persisted(). Lazy (no
    # eager count): it materializes inside the first downstream job.
    buckets = buckets.repartition(n_part, *bucket_key).persist()
    _register_persisted(buckets)
    oversized = (
        buckets.groupBy(*bucket_key).count().where(F.col("count") > max_bucket).select(*bucket_key)
    )
    ok = buckets.join(F.broadcast(oversized), bucket_key, "left_anti").drop("_s1", "_s2")
    split = (
        buckets.join(F.broadcast(oversized), bucket_key, "left_semi")
        .select(
            *carry,
            "band",
            F.explode(
                F.array(
                    F.concat(F.col("sig"), F.lit("#1:"), F.col("_s1")),
                    F.concat(F.col("sig"), F.lit("#2:"), F.col("_s2")),
                )
            ).alias("sig"),
        )
    )
    still_over = (
        split.groupBy(*bucket_key).count().where(F.col("count") > max_bucket).select(*bucket_key)
    )
    # re-keying replaced `sig`, so the split residue lost the bucket
    # partitioning; pin its self-join exchange at full parallelism too
    # (its verify is as CPU-dense per byte as the main branch's)
    split_ok = split.join(F.broadcast(still_over), bucket_key, "left_anti").repartition(
        n_part, *bucket_key
    )
    return [ok, split_ok]


def _banded_ok_buckets(
    sig: DataFrame, carry: list, n_hashes: int, bands: int, max_bucket: int,
    block_cols=(),
) -> DataFrame:
    """Union view of _banded_bucket_frames for consumers that only need the
    post-policy bucket MEMBERSHIP (histogram/diagnostics); pair-generating
    callers self-join the frames separately to keep the co-partitioning."""
    ok, split_ok = _banded_bucket_frames(sig, carry, n_hashes, bands, max_bucket, block_cols)
    return ok.unionByName(split_ok)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n_hashes: int = 12,
    bands: int = 4,
    k: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """Candidate pairs (a, b) with a < b sharing at least one LSH band.

    bands divide the signature into n_hashes/bands rows each; a pair of keys
    collides if any band hashes equal.
    """
    sig = minhash_signatures(df, text_col, key_col, n_hashes, k)
    frames = _banded_bucket_frames(sig, [key_col], n_hashes, bands, max_bucket)
    parts = []
    for ok in frames:
        left = ok.alias("l")
        right = ok.alias("r")
        parts.append(
            left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.sig") == F.col("r.sig"))
                & (F.col(f"l.{key_col}") < F.col(f"r.{key_col}")),
            ).select(F.col(f"l.{key_col}").alias("a"), F.col(f"r.{key_col}").alias("b"))
        )
    return parts[0].unionByName(parts[1]).distinct()


def _surface_signatures(
    df: DataFrame, text_col: str, key_col: str, n_hashes: int, k: int, block_col: str | None
):
    """(sig, carry) for the fused LSH path: one row per key with the shingle
    array riding along plus mh0..mh{n-1} computed via array transforms (one
    md5 per shingle, n affine permutations — no explode/shuffle)."""
    sh = shingles(text_col, k)
    carry0 = [F.col(key_col).alias("_k")]
    if block_col is not None:
        carry0.append(F.col(block_col).alias("_blk"))
    src = df.select(*carry0, sh.alias("_sh")).withColumn(
        "_h", F.transform("_sh", lambda s: _hash28(s))
    )
    consts = minhash_affine_constants(n_hashes)
    mins = [
        F.array_min(
            F.transform("_h", lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P)))
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(consts)
    ]
    # per-SURFACE extras that make the per-PAIR verify cheap (the pair
    # population is ~60-70x the surface population at production LSH
    # parameters): _n = distinct-shingle count, so Jaccard uses
    # |A∪B| = |A|+|B|−|A∩B| instead of materializing array_union per pair;
    # _hd = distinct 28-bit shingle hashes for the int-array prefilter
    # (sound only on collision-free surfaces — size(_hd) == _n on both
    # sides, checked per pair in lsh_similarity_edges; colliding rows
    # bypass straight to the exact string check)
    names0 = ["_k"] + (["_blk"] if block_col is not None else [])
    carry = ["_k", "_sh", "_hd", "_n"] + (["_blk"] if block_col is not None else [])
    return (
        src.select(
            *names0,
            "_sh",
            F.array_distinct("_h").alias("_hd"),
            F.size(F.array_distinct("_sh")).alias("_n"),
            *mins,
        ),
        carry,
    )


def _make_bucket_pair_kernel(
    n_hashes: int,
    max_bucket: int,
    mode: str,
    has_blk: bool,
    payload_col: str | None,
    threshold: float | None = None,
    cut: float | None = None,
    n_sig: int | None = None,
    mh_in_payload_prefix: bool = False,
):
    """mapInPandas kernel factory for banded-LSH pair generation: one
    partition's bucket rows arrive co-partitioned by the bucket key, so the
    ENTIRE cap/split/self-join/verify policy of _banded_bucket_frames plus
    the per-pair verifier runs partition-locally in numpy — one exchange
    and one stage where the declarative formulation paid a persist, two
    size aggregates, two broadcast barriers, two anti/semi probes, and two
    self-joins. Bucket membership, the split policy (oversized buckets
    re-keyed by the two half-signature tuples, still-oversized sub-buckets
    dropped), and every verifier value are identical to the declarative
    path: Jaccard/estimate divisions are int-derived float64 ops — the
    same IEEE-754 computation Catalyst's size()/lit division performs —
    and grouping by the raw half-signature TUPLE is equality-equivalent to
    grouping by its md5 (the md5 was only an equality proxy).

    modes: 'jaccard'  — exact distinct-shingle Jaccard >= threshold over
                        payload_col (array<string>, pre-distinct);
           'estimate' — matching-position fraction of the payload_col
                        signature arrays >= cut;
           'all'      — emit every in-bucket pair (bands == n_hashes:
                        banding already is the policy).

    Memory: the kernel holds one partition's bucket rows; partition count
    comes from the caller's repartition (conf
    spark.nametag.lsh.bucketPartitions), so at scale partitions stay
    surface-sized. Emitted pairs are (lo, hi) per bucket occurrence —
    exactly the l._k < r._k self-join rows."""
    half = n_hashes // 2

    def kernel(batches):
        import numpy as np
        import pandas as pd

        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pdfs[0] if len(pdfs) == 1 else pd.concat(pdfs, ignore_index=True)
        ks = pdf["_k"].to_numpy()
        payload = pdf[payload_col].to_numpy() if payload_col else None
        # split keys come from the payload's prefix (prefix-stable family)
        # when the caller didn't ship a separate _mh array
        mh = payload if mh_in_payload_prefix else pdf["_mh"].to_numpy()
        bandv = pdf["band"].to_numpy()
        sigv = pdf["sig"].to_numpy()
        if has_blk:
            blkv = pdf["_blk"].to_numpy()
            keys = np.array(
                [f"{x}\x00{b}\x00{s}" for x, b, s in zip(blkv, bandv, sigv)], dtype=object
            )
        else:
            keys = np.array([f"{b}\x00{s}" for b, s in zip(bandv, sigv)], dtype=object)
        uniq, inv = np.unique(keys, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        out_a: list = []
        out_b: list = []

        n_pending = 0

        def emit(i0, i1, hit):
            nonlocal n_pending
            a, b = ks[i0[hit]], ks[i1[hit]]
            # duplicate key VALUES in one bucket (duplicate input ids) must
            # not produce (k, k) rows — the join formulation's strict
            # l._k < r._k excluded equal keys entirely
            neq = a != b
            out_a.append(np.minimum(a[neq], b[neq]))
            out_b.append(np.maximum(a[neq], b[neq]))
            n_pending += len(out_a[-1])

        def verify(idx):
            s = len(idx)
            iu0, iu1 = np.triu_indices(s, 1)
            if mode == "all":
                emit(idx[iu0], idx[iu1], np.ones(len(iu0), dtype=bool))
                return
            if mode == "estimate":
                sg = np.stack([np.asarray(payload[i], dtype=np.int64) for i in idx])
                eq = np.zeros((s, s), dtype=np.int32)
                for d in range(sg.shape[1]):
                    col = sg[:, d]
                    eq += col[:, None] == col[None, :]
                hit = (eq[iu0, iu1] / np.float64(n_sig)) >= cut
                emit(idx[iu0], idx[iu1], hit)
                return
            # exact distinct-shingle Jaccard: localize shingles to int ids,
            # pairwise intersection counts via one float32 matmul (counts
            # are small integers — exact in float32), then the SAME
            # int/int -> float64 division the JVM size()/size() plan does
            vocab: dict = {}
            rows = []
            ns = np.empty(s, dtype=np.int64)
            for r, i in enumerate(idx):
                arr = payload[i]
                row = np.empty(len(arr), dtype=np.int32)
                for j, t in enumerate(arr):
                    v = vocab.get(t)
                    if v is None:
                        v = len(vocab)
                        vocab[t] = v
                    row[j] = v
                rows.append(row)
                ns[r] = len(arr)
            m = np.zeros((s, len(vocab)), dtype=np.float32)
            for r, row in enumerate(rows):
                m[r, row] = 1.0
            inter = (m @ m.T)[iu0, iu1].astype(np.int64)
            denom = ns[iu0] + ns[iu1] - inter
            hit = (inter / denom) >= threshold
            emit(idx[iu0], idx[iu1], hit)

        def flush():
            nonlocal n_pending
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            out_a.clear()
            out_b.clear()
            n_pending = 0
            return pd.DataFrame({"src": a, "dst": b})

        for g in range(len(uniq)):
            idx = order[bounds[g] : bounds[g + 1]]
            s = len(idx)
            if s < 2:
                continue
            if s <= max_bucket:
                verify(idx)
            else:
                # oversized: re-key every member by BOTH half-signature
                # tuples (the declarative explode put each row in sub-bucket
                # #1 AND #2); sub-buckets still over the cap are dropped
                for sl in (slice(0, half), slice(half, n_hashes)):
                    sub: dict = {}
                    for i in idx:
                        sub.setdefault(
                            np.asarray(mh[i], dtype=np.int64)[sl].tobytes(), []
                        ).append(i)
                    for members in sub.values():
                        if 2 <= len(members) <= max_bucket:
                            verify(np.asarray(members))
            # stream emitted pairs out in bounded chunks instead of holding
            # every pair of the partition for one final yield
            if n_pending >= 500_000:
                yield flush()
        if n_pending:
            yield flush()

    return kernel


def _kernel_banded_pairs(
    sig: DataFrame,
    n_hashes: int,
    bands: int,
    max_bucket: int,
    block: bool,
    payload_col: str | None,
    mode: str,
    threshold: float | None = None,
    cut: float | None = None,
    n_sig: int | None = None,
    mh_in_payload_prefix: bool = False,
) -> DataFrame:
    """Banding + one hash exchange + the partition-local pair kernel.

    sig: one row per key with _k, mh0..mh{n_hashes-1}, optional _blk, and
    the verifier payload column. Returns (src, dst) typed like _k, one row
    per verified in-bucket pair occurrence (callers distinct() if they need
    the pair LIST semantics).

    mh_in_payload_prefix: the payload array's first n_hashes elements ARE
    mh0..mh{n_hashes-1} (prefix-stable affine family) — skip carrying the
    redundant _mh array through the exchange; the kernel slices the
    payload for the oversized-bucket split keys instead."""
    rows = n_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh{h}").cast("string") for h in range(b * rows, (b + 1) * rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("_", *parts)).alias("sig"))
        )
    keep = ["_k"] + (["_blk"] if block else []) + ([payload_col] if payload_col else [])
    # rows with a NULL key, block, or payload could never produce a pair
    # under the join formulation (NULL never equality-matches and NULL
    # arrays verify to NULL); drop them before the exchange so the kernel
    # (which groups by formatted key strings) cannot pair them either
    guard = F.col("_k").isNotNull()
    if block:
        guard = guard & F.col("_blk").isNotNull()
    if payload_col:
        guard = guard & F.col(payload_col).isNotNull()
    carry_mh = (
        [] if mh_in_payload_prefix
        else [F.array(*[F.col(f"mh{h}") for h in range(n_hashes)]).alias("_mh")]
    )
    mh_names = [] if mh_in_payload_prefix else ["_mh"]
    buckets = sig.where(guard).select(
        *keep,
        *carry_mh,
        F.explode(F.array(*band_cols)).alias("bk"),
    ).select(*keep, *mh_names, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig"))
    spark = sig.sparkSession
    n_part = int(spark.conf.get("spark.nametag.lsh.bucketPartitions", "0") or 0)
    if n_part <= 0:
        n_part = spark.sparkContext.defaultParallelism
    bucket_key = (["_blk"] if block else []) + ["band", "sig"]
    buckets = buckets.repartition(n_part, *bucket_key)
    kt = sig.schema["_k"].dataType.simpleString()
    kernel = _make_bucket_pair_kernel(
        n_hashes, max_bucket, mode, block, payload_col,
        threshold=threshold, cut=cut, n_sig=n_sig,
        mh_in_payload_prefix=mh_in_payload_prefix,
    )
    return buckets.mapInPandas(kernel, schema=f"src {kt}, dst {kt}")


def lsh_bucket_histogram(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n_hashes: int = 12,
    bands: int = 4,
    k: int = 3,
    max_bucket: int = 200,
    block_col: str | None = None,
) -> dict:
    """Post-policy bucket-size histogram of the EXACT banding/split/cap
    pipeline lsh_similarity_edges runs (same _banded_ok_buckets call), plus
    the in-bucket candidate-pair mass the downstream self-join will pay.

    Returns {"hist_log2": {bin: n_buckets}, "n_buckets", "max_bucket_size",
    "candidate_pairs"} where hist_log2 bins buckets by floor(log2(size)) and
    candidate_pairs = sum over buckets of size*(size-1)/2 — the quantity
    that must stay linear-ish in surfaces for the resolve phase to scale."""
    sig, _carry = _surface_signatures(df, text_col, key_col, n_hashes, k, block_col)
    # the histogram only counts bucket members — drop the per-surface verify
    # payloads (shingle strings, hash arrays) so the persisted bucket table
    # is keys-only (the fused edges path at the same scale holds ITS table
    # in the same heap; carrying payloads twice OOMs an 8g local JVM)
    carry = ["_k"] + (["_blk"] if block_col is not None else [])
    sig = sig.select(*carry, *[f"mh{h}" for h in range(n_hashes)])
    ok = _banded_ok_buckets(
        sig, carry, n_hashes, bands, max_bucket,
        block_cols=["_blk"] if block_col is not None else (),
    )
    key = (["_blk"] if block_col is not None else []) + ["band", "sig"]
    sizes = ok.groupBy(*key).count().persist()
    _register_persisted(sizes)
    hist_rows = (
        sizes.select(F.floor(F.log2("count")).cast("int").alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    agg = sizes.agg(
        F.count(F.lit(1)).alias("n"),
        F.max("count").alias("mx"),
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("pairs"),
    ).collect()[0]
    return {
        "hist_log2": {int(r["b"]): int(r["count"]) for r in sorted(hist_rows, key=lambda r: r["b"])},
        "n_buckets": int(agg["n"]),
        "max_bucket_size": int(agg["mx"] or 0),
        "candidate_pairs": int(agg["pairs"] or 0),
    }


def lsh_similarity_edges(
    df: DataFrame,
    text_col: str,
    key_col: str,
    n_hashes: int = 12,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 200,
    block_col: str | None = None,
    dedupe: bool = True,
) -> DataFrame:
    """LSH candidate generation with the exact-Jaccard verify FUSED into the
    bucket self-join: the shingle set rides along with the band rows, so the
    within-bucket join immediately produces both shingle arrays and the
    similarity predicate applies in the same stage — two fewer shuffles than
    lsh_candidate_pairs + jaccard_filter (which join the shingles back on).
    Returns (src, dst) with src < dst. Used by resolve_entities, where the
    surface table is small relative to the mention table and per-stage
    latency dominates; the un-fused building blocks remain for callers that
    want candidates and verification separately.

    dedupe=False skips the final distinct: a pair passing the verify in
    several shared bands is then emitted once per band. Connectivity-only
    consumers (connected_components normalizes and distincts its input
    anyway) pass False to save a full exchange + aggregate over the edge
    set; anything that treats the rows as a pair LIST keeps the default.

    block_col: optional hard-blocking column (e.g. entity type) joined as
    part of the bucket key INSTEAD of being baked into the shingled text.
    Prefixing the text itself poisons the minhash at scale: the shared
    prefix shingles dominate a band's row-minima for a few percent of
    surfaces, producing systematic 10^4-member buckets that the cap must
    then drop (measured on the 240k-surface wide-vocab corpus:
    485 oversized buckets, max 12,895).

    Physical plan (optimization round 8): bucket rows repartition ONCE on
    the bucket key and the whole cap/split/self-join/exact-Jaccard policy
    runs partition-locally in an Arrow/numpy kernel
    (_make_bucket_pair_kernel): all members of a bucket are co-partitioned,
    so the oversized sizes the declarative path computed with global
    aggregates + broadcast anti/semi probes are known locally, and the
    within-bucket pair verify is a per-bucket matmul instead of a
    self-join. Two stages total; the previous formulation paid a persist,
    two size aggregates, two broadcast barriers, and two self-joins with a
    ~10-expression fused verify. The r7 two-tier hash prefilter
    (hash-Jaccard with the collision-free guard) is superseded: the kernel
    computes the exact distinct-shingle Jaccard directly, so the guarded
    prefilter's soundness argument — and its collision bypass — are
    trivially preserved (pinned by the same collision test). Edge SETS are
    identical; per-band duplicate occurrences (dedupe=False) are emitted
    per bucket exactly as the self-join did."""
    sh = shingles(text_col, k)
    cols = [F.col(key_col).alias("_k")]
    if block_col is not None:
        cols.append(F.col(block_col).alias("_blk"))
    src = df.select(*cols, sh.alias("_sh")).withColumn(
        "_h", F.transform("_sh", lambda s: _hash28(s))
    )
    consts = minhash_affine_constants(n_hashes)
    mins = [
        F.array_min(
            F.transform("_h", lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MINHASH_P)))
        ).alias(f"mh{i}")
        for i, (a, b) in enumerate(consts)
    ]
    names0 = ["_k"] + (["_blk"] if block_col is not None else [])
    sig = src.select(*names0, "_sh", *mins)
    out = _kernel_banded_pairs(
        sig, n_hashes, bands, max_bucket, block_col is not None, "_sh",
        mode="jaccard", threshold=threshold,
    )
    return out.distinct() if dedupe else out


def jaccard_filter(
    pairs: DataFrame, df: DataFrame, text_col: str, key_col: str, threshold: float = 0.5, k: int = 3
) -> DataFrame:
    """Exact character-shingle Jaccard on candidate pairs."""
    sh = df.select(F.col(key_col).alias("_k"), shingles(text_col, k).alias("_sh"))
    out = (
        pairs.join(sh.withColumnRenamed("_k", "a").withColumnRenamed("_sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("_k", "b").withColumnRenamed("_sh", "sh_b"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def _local_components(rows) -> list:
    """Driver-side union-find for small edge sets."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return [(n, find(n)) for n in parent]


def _uf_ingest(parent, si, di):
    """Hook-and-compress a batch of index-space edges (si, di) into the
    label array `parent` (parent[i] = current minimum-index label of node
    i's component; must be fully path-compressed on entry). Each round
    hooks every edge's larger endpoint-label to the smaller
    (np.minimum.at handles duplicate targets), fully compresses by pointer
    doubling, then shrinks the frontier to the still-crossing contracted
    edges — clique-ish clusters (the dominant similarity-graph shape)
    vanish after one round, long chains halve per round. On exit every
    ingested edge's endpoints share a label and `parent` is fully
    compressed, so batches can be ingested incrementally in any order
    (union-find is order-insensitive; each batch sees root labels)."""
    import numpy as np

    while len(si):
        ps, pd_ = parent[si], parent[di]
        hi = np.maximum(ps, pd_)
        lo = np.minimum(ps, pd_)
        cross = hi != lo
        if not cross.any():
            break
        np.minimum.at(parent, hi[cross], lo[cross])
        while True:
            p2 = parent[parent]
            if np.array_equal(p2, parent):
                break
            parent = p2
        # frontier shrink: re-express the remaining work as the CONTRACTED
        # graph (edges between current labels that still differ). Without
        # this the hook pass re-scans all |E| every round (measured 29.5s
        # for a 12.3M-edge surface graph; ~6s with it).
        es, ed = parent[si], parent[di]
        keep = es != ed
        si, di = es[keep], ed[keep]
    return parent


def _numpy_components(src, dst):
    """Vectorized min-label connected components over raw edge arrays
    (hook-and-compress, Shiloach-Vishkin shape): returns (nodes, labels)
    with labels[i] = minimum node id of nodes[i]'s component.

    Exact same result as _local_components (component = min id), but
    numpy-vectorized via _uf_ingest — ~2s for a 12M-edge graph where the
    dict-based walk takes ~30s. Used by the driver finish of
    connected_components; parity pinned by the tier-equality tests."""
    import numpy as np

    nodes = np.unique(np.concatenate([src, dst]))
    n_nodes = len(nodes)
    if n_nodes == 0:
        return nodes, nodes
    si = np.searchsorted(nodes, src)
    di = np.searchsorted(nodes, dst)
    parent = _uf_ingest(np.arange(n_nodes, dtype=np.int64), si, di)
    return nodes, nodes[parent]


def _forest_partition(batches):
    """mapInPandas kernel: union-find over ONE partition's edges, emitting
    the star forest (node -> partition-local min root) — same connectivity
    as the partition's edge set with at most one output row per node."""
    import pandas as pd

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for pdf in batches:
        for a, b in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
            a = int(a)
            b = int(b)
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
    out_n = []
    out_r = []
    for n in parent:
        r = find(n)
        if r != n:
            out_n.append(n)
            out_r.append(r)
    yield pd.DataFrame({"src": pd.array(out_n, dtype="int64"), "dst": pd.array(out_r, dtype="int64")})


def _parse_mem_bytes(s: str) -> int:
    """JVM memory string ('24g', '4096m', '512k', plain bytes) -> bytes."""
    s = s.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _driver_edge_cap(spark) -> int:
    """Memory-aware cap for the driver-collect CC tier, in edges.

    The collect path is Arrow `toPandas` (two int64 columns): ~16 B/edge
    in the final numpy arrays, but the Arrow batch + pandas DataFrame +
    transient copies peak near ~48 B/edge on the PYTHON driver process,
    with a comparable transient on the JVM side. Budget 1/8 of
    `spark.driver.memory` at 48 B/edge so the tier choice ports to real
    cluster drivers instead of assuming this sandbox's 128 GiB: a 4 GiB
    driver caps at ~11M edges, the floor keeps small drivers on the (much
    cheaper than star rounds) vectorized tier up to 2M edges, and the
    32M ceiling is the largest scale the tier has been measured at.
    Override per session with `spark.nametag.cc.driverEdgeCap` (edges) or
    per call with an explicit `contracted_driver_threshold`.

    Prerequisite note: without `spark.sql.execution.arrow.pyspark.enabled`
    the collect degrades to row-based toPandas (far larger driver
    footprint); the budget's 3x headroom covers that for the floor-sized
    graphs, but sessions built by this package enable Arrow."""
    conf_cap = spark.conf.get("spark.nametag.cc.driverEdgeCap", None)
    if conf_cap:
        return int(conf_cap)
    try:
        mem = _parse_mem_bytes(spark.conf.get("spark.driver.memory", "2g"))
    except (ValueError, TypeError):
        mem = 2 << 30
    return max(2_000_000, min(32_000_000, mem // 8 // 48))


def _driver_node_cap(spark) -> int:
    """Node cap for the STREAMING driver tier (edges exceed the collect
    cap but the node set fits): persistent driver state is just the sorted
    node-id array + the label array (16 B/node); per-batch buffers are
    bounded by the batch size, not the graph. Budget 1/8 of
    `spark.driver.memory` at 64 B/node (4x headroom for searchsorted /
    unique transients). Override with `spark.nametag.cc.driverNodeCap`."""
    conf_cap = spark.conf.get("spark.nametag.cc.driverNodeCap", None)
    if conf_cap is not None and conf_cap != "":
        return int(conf_cap)
    try:
        mem = _parse_mem_bytes(spark.conf.get("spark.driver.memory", "2g"))
    except (ValueError, TypeError):
        mem = 2 << 30
    return max(1_000_000, min(256_000_000, mem // 8 // 64))


def connected_components(
    edges: DataFrame,
    max_iterations: int = 20,
    driver_threshold: int = 200_000,
    contracted_driver_threshold: int | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components.

    edges: (src:long, dst:long). Returns (node:long, component:long) where
    component is the minimum node id of the component (including a
    (component, component) self-row). Isolated nodes that never appear in
    edges must be handled by the caller (left join + coalesce to self).

    Hybrid execution, four tiers: similarity graphs are usually tiny
    relative to the mention table (edges live on distinct-surface pairs),
    so when the edge count fits comfortably on the driver we run union-find
    locally instead of paying ~8 shuffle rounds per star iteration.
      1. driver-dict: <= driver_threshold edges, plain dict union-find.
      2. driver-numpy: up to contracted_driver_threshold edges (default
         derived from spark.driver.memory — _driver_edge_cap — so the
         collect tier never outgrows the actual driver), the raw pair
         list Arrow-collects and the VECTORIZED min-label union-find
         (_numpy_components, hook-and-compress) finishes in O(log n)
         numpy rounds — 12M edges in ~2s.
      3. driver-streaming: edges exceed the collect cap but the NODE set
         fits (_driver_node_cap): edges spill to parquet once and stream
         through a fixed driver label array in bounded batches — driver
         memory O(nodes + batch), not O(edges).
      4. distributed: endpoint-keyed contraction passes try to shrink the
         graph under the collect threshold, falling back to the
         fully-distributed alternating-star algorithm when they can't.
    The final (node -> min component id) mapping is independent of
    partitioning and of the tier taken."""
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long")).where(F.col("src") != F.col("dst"))
    e = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()

    e0 = e = e.persist()
    n_edges = e.count()
    spark = edges.sparkSession
    if contracted_driver_threshold is None:
        contracted_driver_threshold = _driver_edge_cap(spark)
    LAST_CC_INFO.update(
        {"n_edges": n_edges, "edge_cap": contracted_driver_threshold, "tier": None}
    )
    def _maybe_broadcast(df, n_rows):
        """Driver-built component tables are exact-size-known; hint them
        broadcastable so the surface-assignment join downstream plans a
        BroadcastHashJoin instead of shuffling both sides (a driver-local
        list/pandas frame plans as an RDD scan with UNKNOWN stats, so the
        auto-broadcast threshold never fires on its own). Values are
        unchanged — it is a planner hint. Cap keeps huge component tables
        off the executors' memory (conf `spark.nametag.cc.broadcastNodeCap`,
        rows)."""
        cap = int(spark.conf.get("spark.nametag.cc.broadcastNodeCap", "8000000"))
        return F.broadcast(df) if n_rows <= cap else df

    def _driver_finish(edge_df, cached, tier_label):
        """Arrow-collect the (src, dst) pairs and run the vectorized
        min-label union-find — ~16 bytes/edge on the driver, O(log n)
        numpy rounds (2s for 12M edges vs ~30s for the dict walk). The
        result is the same (component = min node id) for every tier, so
        the <=driver_threshold band routes through here too (the label
        keeps naming the ROUTING band, not the kernel)."""
        import pandas as pd

        LAST_CC_INFO["tier"] = tier_label
        pdf = edge_df.toPandas()
        cached.unpersist()
        nodes, labels = _numpy_components(pdf["src"].to_numpy(), pdf["dst"].to_numpy())
        if len(nodes) == 0:
            return spark.createDataFrame([], "node long, component long")
        return _maybe_broadcast(
            spark.createDataFrame(pd.DataFrame({"node": nodes, "component": labels})),
            len(nodes),
        )

    if n_edges <= driver_threshold:
        return _driver_finish(e, e0, "driver-dict")

    if n_edges <= contracted_driver_threshold:
        # the raw edge list already fits the driver: no contraction pass
        # needed (it exists to SHRINK a too-big graph, and on clique-shaped
        # similarity graphs it barely does: every dst-keyed star contracts
        # to itself — measured 12.34M -> 11.98M edges)
        return _driver_finish(e, e0, "driver-numpy")

    # STREAMING driver tier: the edge list is too big to collect, but
    # union-find only needs per-NODE state — and similarity graphs have far
    # fewer nodes (distinct surfaces) than edges. The edges spill to
    # parquet once (executors write in parallel; on a cluster this is the
    # shared FS the checkpoint dir already requires) and stream through
    # the driver's fixed label array in bounded batches: driver memory is
    # O(nodes + batch), not O(edges). Incremental ingest is exact —
    # union-find is order-insensitive and each batch is hooked against
    # fully-compressed root labels (_uf_ingest).
    node_cap = _driver_node_cap(spark)
    nd = e.select("src").union(e.select("dst")).distinct().persist()
    n_nodes = nd.count()
    LAST_CC_INFO["n_nodes"] = n_nodes
    if n_nodes <= node_cap:
        LAST_CC_INFO["tier"] = "driver-streaming"
        import os
        import shutil
        import tempfile
        import uuid

        import numpy as np
        import pandas as pd
        import pyarrow.dataset as pads

        nodes = np.sort(nd.toPandas().iloc[:, 0].to_numpy())
        nd.unpersist()
        # spill location: executors write it, the DRIVER reads it back, so
        # on a real cluster it must be a shared filesystem — set
        # spark.nametag.cc.spillDir (e.g. the same store the checkpoint
        # dir lives on). Local mode defaults to a driver tempdir. The
        # cleanup below is shutil-based, so spillDir must be a
        # locally-MOUNTED shared path (NFS etc.), not a remote URI scheme
        # (hdfs://, s3a://) — pyarrow's dataset reader would also need a
        # mounted path; both read-back and cleanup assume one.
        spill_root = spark.conf.get("spark.nametag.cc.spillDir", None)
        if spill_root:
            tmp = os.path.join(spill_root, f"nametag_cc_stream_{uuid.uuid4().hex}")
        else:
            tmp = tempfile.mkdtemp(prefix="nametag_cc_stream_")
        try:
            path = os.path.join(tmp, "edges.parquet")
            e.write.mode("overwrite").parquet(path)
            e0.unpersist()
            parent = np.arange(len(nodes), dtype=np.int64)
            n_streamed = 0
            for batch in pads.dataset(path).to_batches(
                columns=["src", "dst"], batch_size=_STREAM_BATCH_EDGES
            ):
                s = batch.column("src").to_numpy(zero_copy_only=False)
                d = batch.column("dst").to_numpy(zero_copy_only=False)
                n_streamed += len(s)
                parent = _uf_ingest(
                    parent, np.searchsorted(nodes, s), np.searchsorted(nodes, d)
                )
            # read-back validation: executors WROTE the spill, the driver
            # READ it. On a cluster where spark.nametag.cc.spillDir is
            # unset or not actually shared, the driver sees zero/partial
            # files and would silently emit singleton components — fail
            # loudly instead (r7 advisor, medium).
            if n_streamed != n_edges:
                raise RuntimeError(
                    f"streaming CC read back {n_streamed} of {n_edges} edges from "
                    f"{path}: the spill directory is not shared between executors "
                    "and the driver — set spark.nametag.cc.spillDir to a shared "
                    "filesystem path"
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        return _maybe_broadcast(
            spark.createDataFrame(pd.DataFrame({"node": nodes, "component": nodes[parent]})),
            len(nodes),
        )
    nd.unpersist()

    # contraction tier before the distributed star rounds: alternating
    # endpoint-keyed partition-local union-find forests. Keying co-locates
    # each node's star (an arbitrary shuffle placement gives partitions
    # with almost no node overlap and therefore no contraction at all);
    # passes repeat only while the graph is still over the driver
    # threshold AND shrinking — each pass preserves connectivity (a local
    # forest spans exactly its partition's connectivity), so any pass
    # count yields the same components. Output rows keep src > dst (the
    # local root is the partition minimum).
    contracted = e
    n_contracted = n_edges
    prev_cached = e0
    for key in ("dst", "src", "dst", "src"):
        nxt = (
            contracted.repartition(F.col(key))
            .mapInPandas(_forest_partition, schema="src long, dst long")
            .persist()
        )
        n_nxt = nxt.count()
        prev_cached.unpersist()
        prev_cached = nxt
        shrunk = n_nxt < 0.7 * n_contracted
        contracted, n_contracted = nxt, n_nxt
        if n_contracted <= contracted_driver_threshold or not shrunk:
            break
    e0 = e = contracted
    if n_contracted <= contracted_driver_threshold:
        LAST_CC_INFO["n_contracted"] = n_contracted
        return _driver_finish(contracted, e0, "contraction->driver-numpy")

    LAST_CC_INFO["tier"] = "distributed-star"
    LAST_CC_INFO["n_contracted"] = n_contracted
    star_rounds = 0
    prev_checksum = None
    for _ in range(max_iterations):
        star_rounds += 1
        # large-star: for each u over undirected neighborhood, connect every
        # strictly-larger neighbor to the min of N(u) + {u}
        und = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        mins = und.groupBy("src").agg(F.min("dst").alias("mn"))
        mins = mins.select("src", F.least("mn", F.col("src")).alias("m"))
        large = (
            und.join(mins, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

        # small-star: edges directed large->small; connect all smaller
        # neighbors and u itself to the min
        directed = large.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
        mins2 = directed.groupBy("src").agg(F.min("dst").alias("mn"))
        mins2 = mins2.select("src", F.least("mn", F.col("src")).alias("m"))
        small = (
            directed.join(mins2, "src")
            .select(F.col("dst").alias("node"), F.col("m"))
            .union(mins2.select(F.col("src").alias("node"), F.col("m")))
            .where(F.col("node") != F.col("m"))
            .distinct()
            .select(F.col("node").alias("src"), F.col("m").alias("dst"))
        )

        e = small.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).distinct()
        # lazy checkpoint: the checksum action below materializes it, so each
        # star round costs ONE job (plan truncation + convergence check
        # together) instead of two
        e = e.localCheckpoint(eager=False)

        checksum = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.hash("src", "dst").cast("long")).alias("s"),
        ).collect()[0]
        if e0 is not None:
            # only NOW is the lazy checkpoint materialized (by the checksum
            # job above) — unpersisting the input cache any earlier forces
            # that first job to recompute the edge pipeline from upstream
            # lineage (correct but a silent first-round recompute)
            e0.unpersist()
            e0 = None
        cur = (checksum["c"], checksum["s"])
        if cur == prev_checksum:
            break
        prev_checksum = cur

    LAST_CC_INFO["star_rounds"] = star_rounds
    out = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    # include the representative itself (component, component)
    return out.union(
        out.select(F.col("component").alias("node"), F.col("component"))
    ).distinct()


def resolve_entities(
    mentions: DataFrame,
    lsh_hashes: int = 12,
    lsh_bands: int = 4,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.6,
    max_bucket: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Mentions -> (mention_entities, entities).

    Blocking + similarity edges are built over distinct (type, norm) surface
    pairs (dramatically smaller than the mention table at scale: entity
    surfaces follow a Zipf law), then components are joined back.

    Returns:
      mention_entities: mentions + (norm, entity_id)
      entities: (entity_id, type, canonical, n_mentions, n_surfaces)
    """
    # cut the (expensive) upstream NER lineage once: every branch below —
    # surface aggregation, LSH, similarity join, final assignment join —
    # would otherwise recompute the mention table. Registered for
    # release_persisted() so long-lived sessions can reclaim the blocks.
    m = canonicalize_mentions(mentions).where(F.length("norm") > 0).persist()
    _register_persisted(m)

    surfaces = (
        m.groupBy("type", "norm").agg(F.count(F.lit(1)).alias("n_mentions"))
    ).persist()
    _register_persisted(surfaces)
    # stable surface key: deterministic hash of (type, norm)
    surfaces = surfaces.withColumn("sid", _hash64(F.concat_ws("\t", "type", "norm"), 0))

    # candidate pairs within the same entity type only: the type is a hard
    # BLOCKING column on the bucket key (not a prefix baked into the
    # shingled text, which poisons band minima at scale — see
    # lsh_similarity_edges); Jaccard verifies over the norm alone
    # dedupe=False: connected_components normalizes + distincts its input
    # anyway, so the edge list's own distinct would be a second full
    # exchange + aggregate over the same pairs for identical components
    edges = lsh_similarity_edges(
        surfaces.select("sid", "type", "norm"),
        "norm",
        "sid",
        n_hashes=lsh_hashes,
        bands=lsh_bands,
        k=shingle_k,
        threshold=jaccard_threshold,
        max_bucket=max_bucket,
        block_col="type",
        dedupe=False,
    )

    comp = connected_components(edges)
    assign = surfaces.join(comp, surfaces["sid"] == comp["node"], "left").select(
        surfaces["type"],
        surfaces["norm"],
        surfaces["n_mentions"],
        surfaces["sid"],
        F.coalesce(comp["component"], surfaces["sid"]).alias("entity_id"),
    )
    # connected_components already ran its jobs, so the persisted surface
    # table is materialized and this count is a cache read. Under the cap,
    # hint the (vocabulary-sized) assignment broadcastable: the
    # mention_entities join then leaves the (corpus-sized) mention table
    # unshuffled — the join posture that holds at 100 TB, where mentions
    # outgrow surfaces by orders of magnitude. Above the cap both sides
    # shuffle as before (conf `spark.nametag.resolve.broadcastSurfaceCap`).
    bcast_cap = int(
        mentions.sparkSession.conf.get("spark.nametag.resolve.broadcastSurfaceCap", "2000000")
    )
    assign_small = assign.select("type", "norm", "entity_id")
    if surfaces.count() <= bcast_cap:
        assign_small = F.broadcast(assign_small)

    # canonical surface = most frequent norm in the component (ties: lexical
    # ascending). One min_by aggregation — no window pass: min over the
    # struct (-n_mentions, norm) picks highest frequency then lowest norm.
    entities = assign.groupBy("entity_id").agg(
        F.min_by(
            F.struct(F.col("norm"), F.col("type")),
            F.struct((-F.col("n_mentions")).alias("_negn"), F.col("norm").alias("_n")),
        ).alias("_c"),
        F.sum("n_mentions").alias("n_mentions"),
        F.count(F.lit(1)).alias("n_surfaces"),
    ).select(
        "entity_id",
        F.col("_c.norm").alias("canonical"),
        F.col("_c.type").alias("type"),
        "n_mentions",
        "n_surfaces",
    )

    mention_entities = m.join(assign_small, ["type", "norm"], "left")
    return mention_entities, entities
