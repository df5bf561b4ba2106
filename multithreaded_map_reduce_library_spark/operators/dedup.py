"""Deduplication operators for a 100 TB training-data pipeline.

Four tiers, all shuffle-minimal:

- **Exact** (:func:`exact_dedup_groups`): hash-groupBy on md5(text). One
  shuffle, map-side partial agg; the standard first pass.
- **MinHash signature + LSH banding** (:func:`minhash_signature`,
  :func:`lsh_band_keys`): the sketch is a *pure map-side expression* —
  no shuffle to build signatures; only candidate-pair generation shuffles,
  keyed on band hash. Hash family is ``md5(salt|shingle)`` whose
  fixed-width hex compares like the 128-bit integer (so MIN over strings
  is a valid permutation min-hash) and is reproducible in any engine with
  md5 — which is what makes the sketch oracle-checkable in DuckDB.
- **SimHash** (:func:`simhash_bits`): 64-bit near-dup fingerprint as a
  bitstring; per-bit majority over the document's distinct-token md5 bits.
  Pure expression (no shuffle); a vectorized pandas-UDF variant
  (:func:`simhash_pandas_udf`) is provided for when 64 aggregate
  expressions per row lose to NumPy at very high token counts.
- **N-gram Jaccard** (plans/pipeline.py): exact pairwise verification over
  shingle joins — used to confirm LSH candidates.

The reference has no dedup (SURVEY.md §2.2); these are the driver-mandated
pipeline extensions.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas-UDF type hints resolve

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.functions.text import (
    tokens,
    word_shingle_hash32,
    word_shingles,
)


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5(text) -> (hash, representative id, count).

    Keep-policy: lowest id wins (deterministic). At scale this is one
    hash-shuffle on a 32-char key with map-side combine.
    """
    return df.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies")
    )


#: Prime > 2^32 for the (a*h + b) mod p universal hash family.
MH_PRIME = 4294967311


def mh_params(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash-family member ``i`` — derived from
    public md5 so any engine reproduces them. a is capped at 2^30 so
    a*h + b < 2^63 (h < 2^32): no 64-bit overflow in Spark OR DuckDB
    (whose BIGINT errors on overflow instead of wrapping)."""
    import hashlib

    a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:8], 16) % (2**30) + 1
    b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:8], 16) % MH_PRIME
    return a, b


def shingle_hashes(shingles: Column) -> Column:
    """Each shingle hashed ONCE to a 32-bit int (first 8 hex digits of its
    md5). The expensive md5 pass happens here a single time; the hash
    family in :func:`minhash_signature` is cheap integer arithmetic over
    this array. Callers must materialize the result through its own
    projection before fanning out (see :func:`minhash_banded`)."""
    return F.transform(
        shingles, lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
    )


def minhash_signature(hashes: Column, num_hashes: int = 16) -> Column:
    """MinHash signature as array<bigint> of length ``num_hashes`` over a
    pre-hashed shingle array (:func:`shingle_hashes`):
    ``sig[i] = MIN over shingles of (a_i * h + b_i) mod P``.

    One md5 per shingle total (vs one per shingle *per hash* in the naive
    form — measured 6s -> sub-second for the signature stage at sf0.1);
    the 16 min-reductions are integer codegen.
    """

    def member(i: int):
        a, b = mh_params(i)
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MH_PRIME)

    return F.array(
        *[F.array_min(F.transform(hashes, member(i))) for i in range(num_hashes)]
    )


def lsh_band_keys(sig: Column, bands: int = 4, rows: int = 4) -> Column:
    """LSH banding: array of ``bands`` bucket keys, each the md5 of one
    band's slice of the (bigint) signature rendered as decimal CSV. Two
    docs sharing any band key are candidate near-duplicates."""
    return F.array(
        *[
            F.md5(
                F.concat(
                    F.lit(f"band{b}|"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(sig, b * rows + 1, rows), lambda x: x.cast("string")
                        ),
                    ),
                )
            )
            for b in range(bands)
        ]
    )


def minhash_band_keys_pandas_udf(
    shingle_n: int = 3, num_hashes: int = 16, bands: int = 4
):
    """Arrow-batched end-to-end sketch: text -> shingle hashes -> minhash
    signature -> LSH band keys, all inside one pandas UDF (hashlib md5 +
    vectorized NumPy modular arithmetic). Byte-identical to the expression
    pipeline (shingle_hash32 -> minhash_signature -> lsh_band_keys), which
    tests assert — the hash family constants and band-key rendering are
    shared. This is the fast path for the banding stage; the expression
    forms remain the definition the DuckDB oracles mirror."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rows = num_hashes // bands
    ab = [mh_params(i) for i in range(num_hashes)]
    a_arr = np.array([a for a, _ in ab], dtype=np.int64)[:, None]
    b_arr = np.array([b for _, b in ab], dtype=np.int64)[:, None]

    @pandas_udf("array<string>")
    def band_keys(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks = [
                t
                for t in text.replace("\t", " ").replace("\r", " ").replace("\n", " ").split(" ")
                if t
            ]
            if len(toks) < shingle_n:
                grams = [" ".join(toks)]
            else:
                grams = [
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                ]
            h = np.array(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams],
                dtype=np.int64,
            )
            sig = ((a_arr * h + b_arr) % MH_PRIME).min(axis=1)
            keys = [
                hashlib.md5(
                    (
                        f"band{b}|" + ",".join(str(m) for m in sig[b * rows : (b + 1) * rows])
                    ).encode("utf-8")
                ).hexdigest()
                for b in range(bands)
            ]
            out.append(keys)
        return pd.Series(out)

    return band_keys


def minhash_banded(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
) -> DataFrame:
    """(doc, band_key) rows: one row per document per LSH band.

    The shingle array and signature are materialized through *separate
    projection boundaries* — inlining ``word_shingles`` into each of the
    ``num_hashes`` transform lambdas makes Catalyst re-evaluate the full
    tokenize+shingle expression per hash (measured 6x slowdown at sf0.01).
    """
    keys_udf = minhash_band_keys_pandas_udf(shingle_n, num_hashes, bands)
    return df.select(
        F.col(id_col).alias("doc"), F.explode(keys_udf(text_col)).alias("band_key")
    ).distinct()


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
    band_cap: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) from MinHash-LSH banding.

    Plan shape at scale: map-side signature -> explode bands (x4 rows, tiny)
    -> shuffle on band key -> within-bucket self-join. No all-pairs cross
    join anywhere. The banded side is (doc_id, band_key) only — 2 narrow
    columns regardless of document size, so the self-join shuffles a tiny
    projection of the corpus, never the text.

    ``band_cap`` is the HOT-BUCKET cap (the O(n^2)-per-bucket guard the
    round-1 SCALING.md promised): within each band key only the ``cap``
    lowest doc ids participate in pair generation. A band key shared by
    millions of boilerplate documents otherwise produces a quadratic pair
    set on one shuffle partition; the cap bounds every bucket's fan-out at
    cap*(cap-1)/2 pairs. Deterministic (ordered by doc id), so the SQL
    oracle reproduces the exact candidate set. The ROW_NUMBER shuffles on
    the same band_key as the self-join, so AQE reuses the partitioning.
    """
    banded = minhash_banded(df, text_col, id_col, num_hashes, bands, shingle_n)
    if band_cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band_key").orderBy(F.asc("doc"))
        banded = (
            banded.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= band_cap)
            .drop("_rn")
        )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.doc") < F.col("b.doc")))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over an undirected edge list (id_a, id_b) by
    iterative min-label propagation: each vertex repeatedly adopts the
    minimum label among itself and its neighbors until fixpoint.

    This is the dedup *clustering* step: LSH candidate pairs are edges,
    components are duplicate groups, and min(doc_id) is the canonical
    representative. Each iteration is fully distributed (join + groupBy on
    the edge key); the driver only checks convergence. Iterations are
    bounded by the graph diameter — near-dup graphs are shallow (clusters
    are cliques-ish), so this converges in a handful of rounds; at true
    100 TB scale you'd switch to the large-star/small-star rewrite
    (Kiveris et al., "Connected Components in MapReduce and Beyond") which
    squares the diameter away. localCheckpoint truncates lineage per
    round so plans don't grow with the iteration count.
    """
    both = edges.selectExpr("id_a AS u", "id_b AS v").union(
        edges.selectExpr("id_b AS u", "id_a AS v")
    )
    both = both.localCheckpoint()
    labels = both.select(F.col("u").alias("doc")).distinct().withColumn(
        "lbl", F.col("doc")
    )
    for _ in range(max_iter):
        nbr_min = (
            both.join(labels, both.v == labels.doc)
            .groupBy(F.col("u").alias("doc"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "doc", "left")
            .select(
                "doc",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias(
                    "lbl"
                ),
            )
            .localCheckpoint()
        )
        n_changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            break
    return labels.select("doc", F.col("lbl").alias("cluster"))


def connected_components_star(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the 100 TB replacement for plain min-label propagation
    (:func:`connected_components`), whose round count is bounded by the
    graph DIAMETER. Star rounds contract paths doubly-exponentially-ish
    (O(log^2 n) rounds in the worst case, ~log n in practice), so a
    million-node duplicate chain converges in a dozen rounds instead of a
    million.

    large-star(u): every neighbor v > u is re-pointed at
    m = min(neighbors(u) + {u}).
    small-star(u, over edges directed larger->smaller): every smaller
    neighbor and u itself re-point at the minimum smaller neighbor.
    Both are one groupBy (min) + one join per round, all on the node key
    — fully distributed, no driver state beyond the convergence counter.
    The fixpoint is a forest of stars: every node points directly at its
    component's minimum id, which is the same canonical labeling
    min-label propagation produces (tests assert equality on the LSH
    graph and on an adversarial long chain).
    """
    # Canonical undirected edge set, self-loops dropped.
    e = (
        edges.select(
            F.least("id_a", "id_b").alias("v"), F.greatest("id_a", "id_b").alias("u")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        e.select(F.col("u").alias("doc"))
        .union(e.select(F.col("v").alias("doc")))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # --- large-star: neighbors in both directions ---
        both = e.selectExpr("u", "v").union(e.selectExpr("v AS u", "u AS v"))
        mins = both.groupBy("u").agg(F.min("v").alias("mn"))
        mins = mins.select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        large = (
            both.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
        )
        # --- small-star over larger->smaller direction ---
        dire = (
            large.select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        mins_s = dire.groupBy("u").agg(F.min("v").alias("m"))
        joined = dire.join(mins_s, "u")
        small = (
            joined.select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(joined.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e_new = (
            small.select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        changed = (
            e_new.exceptAll(e).limit(1).count() + e.exceptAll(e_new).limit(1).count()
        )
        e = e_new
        if changed == 0:
            break
    # Fixpoint: e is a star forest (u -> component min). Roots self-label.
    # groupBy-min guards the (max_iter hit, not yet a forest) case where a
    # node could still carry two outgoing edges.
    stars = e.groupBy(F.col("u").alias("doc")).agg(F.min("v").alias("cluster"))
    return (
        vertices.join(stars, "doc", "left")
        .select("doc", F.coalesce(F.col("cluster"), F.col("doc")).alias("cluster"))
    )


def _hex_digit_value(h: Column, pos: int) -> Column:
    """Value 0-15 of the hex digit at 1-based ``pos`` of md5-hex ``h``."""
    return F.conv(F.substring(h, pos, 1), 16, 10).cast("int")


def simhash_bit_exprs(token_hash: Column, nbits: int = 64) -> list[Column]:
    """Bit b (0/1) of the first ``nbits`` bits of an md5-hex token hash."""
    out = []
    for b in range(nbits):
        v = _hex_digit_value(token_hash, b // 4 + 1)
        shift = 3 - (b % 4)
        out.append((F.floor(v / F.lit(2**shift)).cast("int") % 2))
    return out


def simhash_bits(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", nbits: int = 64) -> DataFrame:
    """64-bit SimHash per document as a bitstring column ``simhash``.

    Majority vote per bit over the document's *distinct* tokens (weight 1
    per token; documented divergence from tf-weighted variants). Computed
    as one explode -> groupBy with 64 SUM aggregates — a single shuffle
    with partial aggregation; bit-extraction arithmetic stays in codegen.
    """
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    h = F.md5(F.col("tok"))
    aggs = [F.sum(e).alias(f"b{i}") for i, e in enumerate(simhash_bit_exprs(h, nbits))]
    per_doc = toks.groupBy("doc").agg(F.count("*").alias("n_tokens"), *aggs)
    bit_chars = [
        F.when(F.col(f"b{i}") * 2 >= F.col("n_tokens"), F.lit("1")).otherwise(F.lit("0"))
        for i in range(nbits)
    ]
    return per_doc.select(
        F.col("doc").alias(id_col),
        F.concat(*bit_chars).alias("simhash"),
        F.col("n_tokens").alias("n_distinct_tokens"),
    )


def simhash_pandas_udf(nbits: int = 64):
    """Vectorized SimHash for very high token counts: Arrow-batched pandas
    UDF computing the same md5-based fingerprint with NumPy bit unpacking.
    Provably equal to :func:`simhash_bits` (tests/test_dedup.py)."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def simhash(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            toks = {t for t in text.replace("\t", " ").replace("\r", " ").replace("\n", " ").split(" ") if t}
            if not toks:
                out.append("0" * nbits)
                continue
            acc = np.zeros(nbits, dtype=np.int64)
            for t in toks:
                digest = hashlib.md5(t.encode("utf-8")).digest()
                bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[:nbits]
                acc += bits
            maj = (acc * 2 >= len(toks)).astype(np.uint8)
            out.append("".join("1" if x else "0" for x in maj))
        return pd.Series(out)

    return simhash


def winnowing_stats_pandas_udf(shingle_n: int = 3, window: int = 4):
    """Arrow-batched winnowing (MOSS, SIGMOD 2003) kernel: text ->
    shingle hashes (hashlib md5, byte-identical to
    :func:`shingle_hashes`) -> sliding-window minima via vectorized
    ``np.minimum.reduce`` over ``window`` shifted views -> distinct
    fingerprint count. Returns struct<m, nf> = (shingle count,
    fingerprint count). The expression form stays the definition the
    DuckDB oracle mirrors; this is the fast path (the interpreted
    higher-order md5 transform alone measured ~8 s at sf0.1 vs ~1 s for
    this kernel), same split as the MinHash band-keys UDF above."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<m: bigint, nf: bigint>")
    def stats(texts: pd.Series) -> pd.DataFrame:
        ms, nfs = [], []
        for text in texts:
            toks = [
                t
                for t in text.replace("\t", " ").replace("\r", " ").replace("\n", " ").split(" ")
                if t
            ]
            if len(toks) < shingle_n:
                grams = [" ".join(toks)]
            else:
                grams = [
                    " ".join(toks[i : i + shingle_n])
                    for i in range(len(toks) - shingle_n + 1)
                ]
            m = len(grams)
            ms.append(m)
            if m < window:
                nfs.append(0)
                continue
            h = np.array(
                [int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16) for g in grams],
                dtype=np.int64,
            )
            mins = np.minimum.reduce([h[k : m - window + 1 + k] for k in range(window)])
            nfs.append(int(np.unique(mins).size))
        return pd.DataFrame({"m": ms, "nf": nfs})

    return stats
