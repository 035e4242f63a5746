"""Near-duplicate detection for document corpora: exact, MinHash+LSH,
SimHash, and n-gram Jaccard.

All four are pure DataFrame compositions (explode → hash → groupBy →
self-join); no Python UDFs anywhere, so the whole pipeline stays inside
whole-stage codegen and scales by adding executors.

Scale design (the part that matters at 100 TB):

- Exact dedup is one hash-aggregate on the fingerprint — map-side partial
  aggregation makes the shuffle carry one row per distinct fingerprint per
  map task, not per input row.
- MinHash signatures are computed with ONE explode + ONE groupBy carrying
  H ``min()`` aggregates (H ≈ 16): again map-side combinable, so shuffle
  volume is |docs| × H hashes regardless of document length.
- LSH banding turns the quadratic all-pairs problem into a groupBy on
  (band_id, band_hash): only documents agreeing on a full band meet in a
  shuffle partition. Candidate pairs are emitted per-bucket; buckets are
  tiny by construction (hash equality on r concatenated minhashes), so the
  per-bucket self-join never sees skew unless the corpus has massive true
  duplicate classes — those are capped via ``max_bucket`` (documents in
  an over-full bucket are still deduped transitively through the exact
  fingerprint path).
- n-gram Jaccard (the verifier for LSH candidates) joins on shingle — at
  scale you run it ONLY on LSH candidate pairs, never all-pairs; the
  all-pairs form here is the small-scale oracle twin.

Hash choice: ``md5`` (hex string) rather than ``xxhash64``, deliberately —
md5 exists verbatim in DuckDB/Trino/Flink SQL, which makes every step
oracle-checkable bit-for-bit (``__spark_entry__.oracle_sql``). Min over
hex strings = min over the 128-bit integers (fixed-width lexicographic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from french_admin_etl_spark.functions.text import fingerprint, tokens


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles. Texts shorter than ``n`` tokens
    yield one whole-text shingle (greatest(size-n+1, 1) start positions)."""
    toks = tokens(col)
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on the whitespace-normalized fingerprint: one canonical
    (min id) survivor per distinct content + the duplicate count."""
    return (
        df.withColumn("_fp", fingerprint(text_col))
        .groupBy("_fp")
        .agg(
            F.min(id_col).alias("canonical_" + id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .withColumnRenamed("_fp", "fingerprint")
    )


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 16, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per document, ``num_hashes`` wide.

    Hash family: each md5 yields FOUR independent 32-bit words, so a
    16-hash signature costs 4 md5 calls per shingle, not 16 —
    ``mh_{4g+j} = min over shingles of word_j(md5(g || '|' || shingle))``
    with ``word_j`` = hex chars [8j, 8j+8) parsed as an unsigned int.
    md5's words are independent uniform bits, so this is the standard
    one-hash-many-words minhash trick; 4x less hashing in the scan.

    One explode + one combinable groupBy (map-side partial min) — shuffle
    volume is |docs| x num_hashes longs regardless of document length.
    """
    sh = df.select(id_col, F.explode(word_shingles(text_col, shingle_n)).alias("_sh"))
    groups = (num_hashes + 3) // 4
    aggs = []
    for g in range(groups):
        h = F.md5(F.concat(F.lit(f"{g}|"), F.col("_sh")))
        for j in range(4):
            i = 4 * g + j
            if i >= num_hashes:
                break
            word = F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long")
            aggs.append(F.min(word).alias(f"mh_{i}"))
    return sh.groupBy(id_col).agg(*aggs)


def banded_signature(
    sig: DataFrame, id_col: str, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH banding of a MinHash signature → one (id, band_id, band_hash)
    row per band per document. SINGLE-PASS: one explode over an inline
    array of (band_id, band_hash) structs — the signature frame is
    scanned ONCE, not ``bands`` times (a unionByName of per-band selects
    re-runs the upstream shingle explode + groupBy per band). Shared by
    :func:`lsh_candidate_pairs` (batch) and the incremental
    :mod:`.neardup_index` so the two banding definitions cannot drift."""
    if bands < 1 or num_hashes % bands:
        # silently flooring r would index a 15-hash family when 16 were
        # requested (trailing minhashes dropped) — same guard as
        # NearDupIndex.__init__ (review finding)
        raise ValueError(f"bands must divide num_hashes ({num_hashes} % {bands} != 0)")
    r = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band_id"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh_{b * r + j}") for j in range(r)])
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("_bd")
    ).select(id_col, F.col("_bd.band_id").alias("band_id"), F.col("_bd.band_hash").alias("band_hash"))


_BANDED_CACHE: list = []  # at most one (semantic_hash, DataFrame) — see below


def _retire_banded_cache(banded) -> None:
    """Bound the banded persist to ONE outstanding CacheManager entry: an
    identical plan (the common repeated-call case — bench passes, repeated
    sweeps over one corpus) keeps sharing the standing cache, while a call
    over a DIFFERENT corpus releases the previous cache before registering
    its own — the unbounded one-leaked-cache-per-call growth a looping
    driver used to accumulate (review finding). Unpersist failures (e.g.
    the owning session already stopped) are swallowed: the executor
    storage died with the session."""
    try:
        h = banded.semanticHash()
    except Exception:  # noqa: BLE001 — conservative: treat as a new plan
        h = object()
    if _BANDED_CACHE and _BANDED_CACHE[0][0] != h:
        _, old = _BANDED_CACHE.pop()
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — owning session gone
            pass
    if not _BANDED_CACHE:
        _BANDED_CACHE.append((h, banded))


def lsh_candidate_pairs(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 50,
    persist: bool = True,
) -> DataFrame:
    """LSH banding over a MinHash signature → candidate near-dup pairs.

    Signature splits into ``bands`` bands of ``num_hashes // bands`` rows;
    band hash = md5 of the concatenated minhashes. Two documents are a
    candidate pair iff they agree on at least one full band. Buckets larger
    than ``max_bucket`` are dropped (degenerate dup classes — handled by
    exact dedup) so no self-join quadratic blowup on pathological data.
    """
    banded = banded_signature(sig, id_col, num_hashes, bands)
    if persist:
        # banded feeds three consumers (bucket sizing + both self-join
        # sides); without the cache the signature explode+agg runs three
        # times. The columnar persist() is the right form — and because
        # the CacheManager keys entries by LOGICAL PLAN, a repeated call
        # over the same signature frame legitimately reuses the standing
        # cache instead of re-hashing the corpus (measured 1.4 s vs
        # 6.5 s per call at sf0.1; an RDD localCheckpoint of banded was
        # tried and is ~4.5x slower — row objects vs compressed columnar
        # batches). What must NOT happen is unbounded growth: a driver
        # looping over DIFFERENT corpora used to leak one never-released
        # cache per call (review finding) — so at most ONE banded cache
        # is kept outstanding, and a call with a different plan releases
        # the previous one first (_retire_banded_cache).
        banded = banded.persist()
        _retire_banded_cache(banded)

    sized = banded.join(
        banded.groupBy("band_id", "band_hash")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .filter((F.col("_bsz") > 1) & (F.col("_bsz") <= max_bucket)),
        ["band_id", "band_hash"],
    )
    a = sized.select("band_id", "band_hash", F.col(id_col).alias("id_a"))
    b = sized.select("band_id", "band_hash", F.col(id_col).alias("id_b"))
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity ≥ threshold over pairs.

    |A∩B| via a self-join on shingle; |A|,|B| from per-doc shingle counts;
    J = common / (|A| + |B| − common). Without ``candidates`` this is
    all-pairs — QUADRATIC in dup-class size, the small-scale oracle form.
    At scale pass ``candidates`` (columns id_a < id_b, e.g. the output of
    ``lsh_candidate_pairs``): the shingle join is then semi-restricted to
    candidate pairs, so cost is O(candidates × shingles), independent of
    corpus size — the standard LSH-then-verify pipeline.
    """
    if candidates is not None:
        # restrict the corpus ONCE to documents that appear in any
        # candidate pair — the shingle explode, the size aggregate, and
        # both self-join sides then see only candidate docs. The candidate
        # frame is MATERIALIZED first (localCheckpoint truncates lineage):
        # it feeds three consumers below, and without materialization each
        # would re-run the whole upstream MinHash+LSH pipeline.
        candidates = candidates.localCheckpoint(eager=False)
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        df = df.join(cand_ids, id_col, "left_semi")
    sh = df.select(id_col, F.explode(word_shingles(text_col, shingle_n)).alias("_sh"))
    if candidates is not None:
        # likewise: sizes + both self-join sides re-derive sh; checkpoint
        # the (small, candidate-restricted) shingle frame once
        sh = sh.localCheckpoint(eager=False)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    a = sh.select(F.col(id_col).alias("id_a"), "_sh")
    b = sh.select(F.col(id_col).alias("id_b"), "_sh")
    common = (
        a.join(b, "_sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    if candidates is not None:
        # pairs among candidate DOCS are a superset of candidate PAIRS —
        # keep only the pairs LSH actually proposed
        common = common.join(candidates.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi")
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document over whitespace tokens (with
    multiplicity). Token hash = first 8 hex chars of md5 → int; simhash
    bit j is 1 iff the (count-weighted) sum of (2·bit_j − 1) over tokens
    is positive.

    One explode + one groupBy with 32 combinable sums + a fold — stays
    JVM-side. Near-dups then cluster by hamming distance on the int.
    """
    tok = df.select(id_col, F.explode(tokens(text_col)).alias("_t"))
    h = F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10).cast("long")
    tok = tok.withColumn("_h", h)
    aggs = [
        F.sum(F.shiftright(F.col("_h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_b{j}")
        for j in range(32)
    ]
    bits = tok.groupBy(id_col).agg(*aggs)
    sim = None
    for j in range(32):
        term = F.when(F.col(f"_b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
        sim = term if sim is None else sim + term
    return bits.select(id_col, sim.alias("simhash"))


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: hamming(simhash_a, simhash_b) ≤ max_hamming.

    Scale path (the classic simhash-dedup blocking): split the 32-bit
    fingerprint into ``bands`` contiguous byte bands; by pigeonhole, two
    fingerprints within hamming distance < ``bands`` agree EXACTLY on at
    least one band, so candidates come from equi-joins on (band_id,
    band_value) — never an all-pairs cross join — then the cheap integer
    hamming check verifies. One explode (docs × bands rows), one shuffle
    on the band key; at 10^10 docs the band groupBy is combinable and the
    verify is per-candidate O(1). Requires ``max_hamming < bands`` for
    exact recall (3 < 4 here, the standard 32-bit configuration)."""
    if max_hamming >= bands:
        raise ValueError("pigeonhole blocking needs max_hamming < bands")
    sig = simhash32(df, id_col, text_col)
    width = 32 // bands
    mask = (1 << width) - 1
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band_id"),
            F.shiftright(F.col("simhash"), b * width).bitwiseAND(F.lit(mask)).alias("band_val"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*band_structs)).alias("_bd")
    ).select(id_col, "simhash", "_bd.band_id", "_bd.band_val")
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"), "band_id", "band_val"
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"), "band_id", "band_val"
    )
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming32(F.col("_sa"), F.col("_sb")).alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------- sub-document dedup


def content_defined_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    mod: int = 32,
    gram: int = 4,
) -> DataFrame:
    """Content-defined chunking (CDC, the dedup technique — rsync/LBFS
    style): split each document at positions where a rolling hash of the
    local ``gram``-char window hits ``0 mod mod``, so chunk boundaries are
    determined by CONTENT, not offsets — an insertion early in a document
    shifts every byte but leaves all later chunk boundaries (and hence
    their fingerprints) intact. This is what makes SUB-document dedup
    robust: shared passages between near-duplicate documents land in
    identical chunks wherever they sit.

    Expected chunk length ≈ ``mod`` chars. The window hash is a plain
    base-31 polynomial over the ``gram`` code points — chosen over md5
    because it is exactly expressible in both Spark and DuckDB SQL
    (oracle-checkable) and ~100x cheaper per position. Everything is
    JVM-side higher-order array functions on each row independently
    (sequence → filter → zip_with): embarrassingly parallel, zero
    shuffle, zero Python — a corpus scan at any scale. Production CDC
    adds min/max chunk clamps, which need sequential state — that variant
    belongs in a pandas UDF (``mapInPandas``) if ever needed; the
    unclamped form is the right oracle-checkable core.

    Returns one row per chunk: (id, chunk_idx, chunk, chunk_hash=md5).
    """
    text = F.col(text_col)
    n = F.length(text)
    weights = [31 ** (gram - 1 - k) for k in range(gram)]

    # one O(n) pass per row: explode the text into a codepoint ARRAY and
    # index it in the window lambda. (``substr(text, i, 1)`` per position
    # would re-scan the string from the start for every UTF-8 char
    # position — O(n^2) per document; measured 12x slower at sf0.1.)
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c))

    def _window_hash(cds: Column, i: Column) -> Column:
        # LONG arithmetic: ascii() yields an int codepoint, and codepoint
        # × weight overflows int32 for any codepoint > 72084 (every emoji)
        # — an ANSI ARITHMETIC_OVERFLOW job-killer, and with ANSI off a
        # silent wrap diverging from the numpy int64 twin in
        # content_defined_chunks_clamped (review finding, reproduced).
        # The DuckDB oracle (_cdc_chunk_sql) casts its terms to BIGINT in
        # lockstep — all three implementations hash in 64-bit.
        h = F.lit(0).cast("long")
        for k, w in enumerate(weights):
            h = h + F.element_at(cds, i + F.lit(k)).cast("long") * F.lit(w)
        return h

    # cut positions: i in [2, n-gram+1] where the window hash vanishes
    # (position 1 is always a chunk start; sequence() guarded — Spark
    # generates DESCENDING sequences when start > stop)
    cuts = F.when(
        n >= gram + 1,
        F.filter(
            F.sequence(F.lit(2), n - F.lit(gram - 1)),
            lambda i: _window_hash(F.col("_codes"), i) % F.lit(mod) == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    starts = F.concat(F.array(F.lit(1)), cuts)
    ends = F.concat(cuts, F.array(n + F.lit(1)))
    chunks = F.zip_with(starts, ends, lambda s, e: text.substr(s, e - s))

    out = (
        df.filter(text.isNotNull() & (n > 0))
        .withColumn("_codes", codes)  # materialized once per row
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
    )
    return out.withColumn("chunk_hash", F.md5(F.col("chunk")))


def shared_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    mod: int = 32,
    min_docs: int = 2,
) -> DataFrame:
    """Sub-document duplication report: chunk fingerprints appearing in at
    least ``min_docs`` DISTINCT documents, with occurrence counts and the
    chunk length. One combinable groupBy over the chunk stream — the
    shuffle carries one row per distinct chunk hash per map task."""
    ch = content_defined_chunks(df, id_col, text_col, mod=mod)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.countDistinct(F.col(id_col)).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max(F.length("chunk")).alias("chunk_len"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def content_defined_chunks_clamped(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    mod: int = 32,
    gram: int = 4,
    min_len: int = 8,
    max_len: int = 128,
) -> DataFrame:
    """Production-grade CDC chunking with min/max chunk clamps (what
    rsync/LBFS/restic actually ship): a rolling-hash cut is SUPPRESSED
    while the current chunk is shorter than ``min_len`` (suppression
    changes every later boundary decision — inherently sequential state,
    inexpressible as an independent per-position filter), and a cut is
    FORCED at ``max_len`` so a pathological hash-free stretch cannot
    produce an unbounded chunk.

    This is the engine's declared Arrow seam (U3 / input_hint: vectorized
    pandas UDFs, never per-row Python in a JVM-expressible path): one
    ``mapInPandas`` over Arrow record batches; inside, the window hashes
    are numpy-vectorized over the whole document (one multiply-add per
    weight) and only the sparse candidate list is walked sequentially.
    With ``min_len=1, max_len=inf`` the boundaries equal
    ``content_defined_chunks`` exactly (tested — the Python and JVM
    implementations cross-check each other).

    Embarrassingly parallel per document: no shuffle, scales as a corpus
    scan. Same output shape as ``content_defined_chunks``.
    """
    from pyspark.sql import types as T

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_field.name, id_field.dataType),
            T.StructField("chunk_idx", T.IntegerType()),
            T.StructField("chunk", T.StringType()),
            T.StructField("chunk_hash", T.StringType()),
        ]
    )
    weights = [31 ** (gram - 1 - k) for k in range(gram)]

    def chunk_batches(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = {"id": [], "chunk_idx": [], "chunk": [], "chunk_hash": []}
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or len(text) == 0:
                    continue
                n = len(text)
                codes = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if len(codes) != n:  # non-ascii: fall back to codepoints
                    codes = np.fromiter(map(ord, text), dtype=np.int64, count=n)
                codes = codes.astype(np.int64)
                if n >= gram + 1:
                    h = np.zeros(n - gram, dtype=np.int64)  # window starts 1..n-gram
                    for k, w in enumerate(weights):
                        h += codes[1 + k : n - gram + 1 + k] * w
                    candidates = (np.nonzero(h % mod == 0)[0] + 1).tolist()
                else:
                    candidates = []
                cuts, start = [], 0
                for c in candidates:
                    while c - start >= max_len:  # no cut for a whole window
                        start += max_len
                        cuts.append(start)
                    if c - start >= min_len:
                        cuts.append(c)
                        start = c
                while n - start > max_len:  # clamp the tail too
                    start += max_len
                    cuts.append(start)
                bounds = [0] + cuts + [n]
                for ci, (s, e) in enumerate(zip(bounds, bounds[1:])):
                    chunk = text[s:e]
                    out["id"].append(rid)
                    out["chunk_idx"].append(ci)
                    out["chunk"].append(chunk)
                    out["chunk_hash"].append(hashlib.md5(chunk.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    id_field.name: out["id"],
                    "chunk_idx": out["chunk_idx"],
                    "chunk": out["chunk"],
                    "chunk_hash": out["chunk_hash"],
                }
            )

    return df.select(id_col, text_col).mapInPandas(chunk_batches, out_schema)


# ------------------------------------------------------------ dedup clusters


def connected_components(
    edges: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge list → (id, component)
    with ``component`` = the MINIMUM vertex id in the component — the
    canonical-document assignment that turns near-dup PAIRS into dedup
    CLUSTERS (keep one doc per component, drop the rest).

    Min-label propagation: every vertex starts labeled with itself; each
    round joins labels across edges (both directions) and keeps the
    per-vertex minimum; stops when a round changes nothing. Rounds =
    O(component diameter) — near-dup clusters are tiny and dense
    (diameter 1-3 in practice), so this converges in a few rounds even
    on a 10^10-doc corpus; each round is one broadcast-or-shuffle
    equi-join + one combinable min-aggregate. Labels are
    ``localCheckpoint``'d per round so the plan doesn't grow with the
    iteration count (the standard Spark iterative-algorithm hygiene).
    The convergence check piggybacks on the same aggregate (one extra
    max() over a change flag), not a separate join."""
    both = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).unionByName(
        edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
    )
    both = both.persist()
    labels = (
        both.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        # candidate label for v = min over incoming neighbors' labels
        prop = (
            both.join(labels.withColumnRenamed("id", "u"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("component").alias("_neighbor_min"))
        )
        merged = (
            labels.join(prop, "id", "left")
            .select(
                "id",
                F.least(F.col("component"), F.coalesce("_neighbor_min", F.col("component"))).alias(
                    "new_component"
                ),
                (
                    F.least(F.col("component"), F.coalesce("_neighbor_min", F.col("component")))
                    < F.col("component")
                ).alias("_changed"),
            )
        )
        merged = merged.localCheckpoint(eager=True)
        changed = merged.agg(F.max(F.col("_changed").cast("int"))).collect()[0][0]
        labels = merged.select("id", F.col("new_component").alias("component"))
        if not changed:
            converged = True
            break
    both.unpersist()
    if not converged:
        # silently returning partial labels would split one real cluster
        # into several with wrong canonical ids (reviewer finding) —
        # pathological diameters (>max_iterations-long pair chains) must
        # surface, not corrupt the dedup
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (component diameter exceeds the bound); raise "
            "max_iterations"
        )
    return labels


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.7,
    shingle_n: int = 3,
    max_bucket: int = 50,
) -> DataFrame:
    """Near-duplicate CLUSTER summary: LSH candidates → Jaccard-verified
    pairs (>= threshold) → connected components → one row per cluster
    (canonical doc = min id, member count). The full pipeline a
    training-data dedup pass runs: everything upstream is banded/bucketed
    (never all-pairs), and the component step converges in O(cluster
    diameter) joins."""
    sig = minhash_signature(df, id_col, text_col, num_hashes, shingle_n)
    cand = lsh_candidate_pairs(sig, id_col, num_hashes, bands, max_bucket)
    verified = jaccard_pairs(
        df, id_col, text_col, shingle_n=shingle_n, threshold=threshold,
        candidates=cand,
    )
    comp = connected_components(verified.select("id_a", "id_b"))
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("id").alias("max_doc_id"),
    )
