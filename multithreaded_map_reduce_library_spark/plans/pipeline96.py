"""Pipeline batch 96 (round 4): UNIGRAM-LM TOKENIZER SEGMENTATION — the
SentencePiece-style tokenizer primitive the BPE family was missing. BPE
(``bpe_learn_merges`` / ``bpe_tokenize_corpus``) tokenizes by greedy
merges; a unigram LM tokenizer instead picks the segmentation of each
word that MINIMIZES total piece cost (-log piece probability) — a
shortest path over the word's character positions (Viterbi).

``unigram_lm_segmentation``:
1. Build the piece vocabulary from the corpus token stream: every
   character, the top-64 character bigrams, the top-32 trigrams
   (deterministic (count DESC, gram ASC) cut).
2. Cost of a piece = -ln(count / total_char_count), e6-quantized — the
   integer-grid form of the unigram LM negative log-likelihood.
3. For the top-40 most frequent words (length ≤ 16) run the exact DP:
   dist(pos) = min over pieces ending at pos of dist(start) + cost.
   16 unrolled relaxation rounds (a length-16 word uses ≤ 16 pieces);
   costs are packed as cost_e6*32 + n_pieces, so the argmin also
   tie-breaks deterministically toward fewer pieces.

Everything after the e6 cost grid is integer arithmetic, and the DP is
plain joins — no recursion, no UDF, both engines run the identical
unrolled program.

Reference parity anchor: the reference engine (mapreduce.h:44-83) has no
tokenizer tier; this extends the driver-mandated superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from multithreaded_map_reduce_library_spark.plans.registry import register
from multithreaded_map_reduce_library_spark.sources.catalog import load_table

_TOP_BIGRAMS = 64
_TOP_TRIGRAMS = 32
_TOP_WORDS = 40
_MAX_WLEN = 16
_PACK = 32  # packed = cost_e6 * 32 + n_pieces (n_pieces <= 16 < 32)

_DUCK_TOKS = """
        toks AS (
            SELECT tok FROM documents,
                 UNNEST(list_filter(string_split_regex(text, '[ \t\r\n]'), t -> t <> '')) AS u(tok)
        ),
        wf AS MATERIALIZED (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY tok
        )"""


def _duck_grams(n: int) -> str:
    # gram counts over the word-frequency rollup, weighted by freq —
    # exactly the token-stream counts at a fraction of the explode volume
    return f"""(
            SELECT substr(tok, CAST(p AS INTEGER), {n}) AS gram, freq
            FROM (SELECT tok, freq, UNNEST(range(1, len(tok) - {n - 1} + 1)) AS p FROM wf)
        )"""


def duck_dp_ctes() -> tuple[str, str]:
    """The unrolled optimal-segmentation DP as a CTE block (needs the
    :func:`duck_vocab_ctes` block in scope): returns (ctes, final_name).
    Shared with the WordPiece-greedy regret query (pipeline97)."""
    rounds = [
        "dp0 AS MATERIALIZED (SELECT word, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS v FROM words)"
    ]
    prev = "dp0"
    for t in range(1, _MAX_WLEN + 1):
        # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and each
        # round references the previous one twice — unmaterialized, dp16
        # would expand to 2^16 copies of the corpus scan subtree (observed
        # as an EMFILE blowup before any result).
        rounds.append(
            f"""
        dp{t} AS MATERIALIZED (
            SELECT word, pos, MIN(v) AS v FROM (
                SELECT word, pos, v FROM {prev}
                UNION ALL
                SELECT g.word, g.pos_to AS pos, d.v + g.w32 AS v
                FROM {prev} d JOIN eg g ON g.word = d.word AND g.pos_from = d.pos
            ) GROUP BY word, pos
        )"""
        )
        prev = f"dp{t}"
    return ",".join(rounds), prev


def duck_vocab_ctes() -> str:
    """toks/wf/gram-count/piece-cost/words/eg CTE block (no WITH keyword) —
    the unigram-LM piece graph, shared with pipeline97."""
    return f"""{_DUCK_TOKS},
        g1 AS (SELECT gram, CAST(SUM(freq) AS BIGINT) AS cnt FROM {_duck_grams(1)} GROUP BY gram),
        g2 AS (SELECT gram, CAST(SUM(freq) AS BIGINT) AS cnt FROM {_duck_grams(2)} GROUP BY gram),
        g3 AS (SELECT gram, CAST(SUM(freq) AS BIGINT) AS cnt FROM {_duck_grams(3)} GROUP BY gram),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM g1),
        pieces AS (
            SELECT gram, cnt FROM g1
            UNION ALL
            SELECT gram, cnt FROM (
                SELECT gram, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS rn FROM g2
            ) WHERE rn <= {_TOP_BIGRAMS}
            UNION ALL
            SELECT gram, cnt FROM (
                SELECT gram, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS rn FROM g3
            ) WHERE rn <= {_TOP_TRIGRAMS}
        ),
        costs AS (
            SELECT gram,
                   CAST(FLOOR(ln(CAST(total AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS cost_e6
            FROM pieces CROSS JOIN tot
        ),
        words AS MATERIALIZED (
            SELECT word, freq FROM (
                SELECT tok AS word, freq,
                       ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS rn
                FROM wf WHERE len(tok) <= {_MAX_WLEN}
            ) WHERE rn <= {_TOP_WORDS}
        ),
        eg AS MATERIALIZED (
            SELECT w.word, CAST(e.pos_to - e.l AS BIGINT) AS pos_from,
                   CAST(e.pos_to AS BIGINT) AS pos_to,
                   c.cost_e6 * {_PACK} + 1 AS w32
            FROM words w,
                 LATERAL (
                     SELECT CAST(p AS BIGINT) AS pos_to, CAST(l AS BIGINT) AS l,
                            substr(w.word, CAST(p - l + 1 AS INTEGER), CAST(l AS INTEGER)) AS piece
                     FROM (SELECT UNNEST(range(1, len(w.word) + 1)) AS p),
                          (SELECT UNNEST([1, 2, 3]) AS l)
                     WHERE l <= p
                 ) e
            JOIN costs c ON c.gram = e.piece
        )"""


def _unigram_oracle() -> str:
    dp_ctes, dp_final = duck_dp_ctes()
    return f"""
        WITH {duck_vocab_ctes()},
        {dp_ctes}
        SELECT w.word, w.freq, CAST(len(w.word) AS BIGINT) AS word_len,
               CAST(d.v // {_PACK} AS BIGINT) AS seg_cost_e6,
               CAST(d.v % {_PACK} AS BIGINT) AS n_pieces
        FROM words w JOIN {dp_final} d ON d.word = w.word AND d.pos = len(w.word)
    """


@register(
    "unigram_lm_segmentation",
    oracle=_unigram_oracle(),
    tags=("tokenizer", "unigram-lm", "viterbi", "documents", "topk", "global-sort"),
    bench=True,
)
def unigram_lm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) optimal segmentation cost of the
    corpus's top-40 words: piece vocabulary = every character + top-64
    bigrams + top-32 trigrams of the token stream, piece cost =
    e6-quantized -ln(count/total_chars), and per word the exact minimal
    total cost over all segmentations plus the piece count of that
    optimum (fewest-pieces tie-break via cost*32+pieces packing) — a
    16-round unrolled Bellman-Ford over the word's positions, where 16
    relaxations are exact because a length-16 word has at most 16
    pieces.

    Scale design: the corpus-sized work is the three n-gram counting
    shuffles (map-side combined, the wordcount shape) and the word
    frequency rollup; the top-k cuts are tiny global windows on gram
    rollups; the DP itself runs on a 40-word × 17-position relation —
    metadata, regardless of corpus size. This is the plan shape a real
    tokenizer trainer uses at 100 TB: corpus passes for counts, DP on
    the (bounded) vocabulary."""
    words, eg = build_piece_graph(spark, sf_dir)
    dp = run_optimal_dp(words, eg)
    pk = F.lit(_PACK).cast("bigint")
    # run_optimal_dp returns ONE row per word, already at the final
    # position (ADVICE r9: the old pos == length(word) filter became a
    # tautological no-op when the round-9 fold narrowed the contract).
    return (
        words.join(dp, "word")
        .select(
            "word",
            "freq",
            F.length("word").cast("bigint").alias("word_len"),
            F.call_function("div", F.col("v"), pk).alias("seg_cost_e6"),
            (F.col("v") % pk).cast("bigint").alias("n_pieces"),
        )
    )


def build_piece_graph(spark: SparkSession, sf_dir: str):
    """(words, eg): the top-40 word set with frequencies, and the piece
    edge list (word, pos_from, pos_to, w32 = cost_e6*32 + 1). Shared with
    the WordPiece-greedy regret query (pipeline97)."""
    from multithreaded_map_reduce_library_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # one corpus-sized shuffle (the wordcount shape); all gram counting
    # then runs over this vocabulary-sized rollup, weighted by freq —
    # identical counts to a token-stream pass at a fraction of the volume
    wf = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .localCheckpoint()
    )

    def grams(n: int) -> DataFrame:
        pos = F.explode(F.sequence(F.lit(1), F.length("tok") - F.lit(n - 1))).alias("p")
        return (
            wf.where(F.length("tok") >= n)
            .select("tok", "freq", pos)
            .select(F.expr(f"substring(tok, p, {n})").alias("gram"), "freq")
            .groupBy("gram")
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )

    g1 = grams(1).localCheckpoint()
    tot = g1.agg(F.sum("cnt").cast("bigint").alias("total"))

    def topcut(df: DataFrame, k: int) -> DataFrame:
        rn = F.row_number().over(Window.orderBy(F.desc("cnt"), F.asc("gram")))
        return df.withColumn("rn", rn).where(F.col("rn") <= k).select("gram", "cnt")

    pieces = g1.unionAll(topcut(grams(2), _TOP_BIGRAMS)).unionAll(
        topcut(grams(3), _TOP_TRIGRAMS)
    )
    costs = pieces.crossJoin(F.broadcast(tot)).select(
        "gram",
        F.floor(
            F.log(F.col("total").cast("double") / F.col("cnt").cast("double"))
            * 1000000.0
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("cost_e6"),
    )
    wrn = F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("word")))
    words = (
        wf.where(F.length("tok") <= _MAX_WLEN)
        .select(F.col("tok").alias("word"), "freq")
        .withColumn("rn", wrn)
        .where(F.col("rn") <= _TOP_WORDS)
        .select("word", "freq")
        .localCheckpoint()
    )
    span = words.select(
        "word",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos_to"),
    ).select("word", "pos_to", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("l"))
    eg = (
        span.where(F.col("l") <= F.col("pos_to"))
        .select(
            "word",
            (F.col("pos_to") - F.col("l")).cast("bigint").alias("pos_from"),
            F.col("pos_to").cast("bigint").alias("pos_to"),
            F.expr("substring(word, pos_to - l + 1, l)").alias("piece"),
        )
        .join(costs.withColumnRenamed("gram", "piece"), "piece")
        .select(
            "word", "pos_from", "pos_to", (F.col("cost_e6") * _PACK + 1).alias("w32")
        )
        .localCheckpoint()
    )
    return words, eg


def word_edge_arrays(eg: DataFrame) -> DataFrame:
    """(word, edges): the piece graph folded to one array row per word —
    edges is array<struct<pos_from,pos_to,w32>>. One tiny shuffle (the
    relation is |words|·|positions|·3 rows); element order is irrelevant
    to every consumer (they filter/min over it), so no sort is needed."""
    return eg.groupBy("word").agg(
        F.collect_list(F.struct("pos_from", "pos_to", "w32")).alias("edges")
    )


def run_optimal_dp(words: DataFrame, eg: DataFrame) -> DataFrame:
    """Optimal-segmentation cost per word: (word, pos, v) at the word's
    FINAL position (pos = len(word)), v = packed min cost from 0.

    The piece graph is a DAG whose positions 0..len are already in
    topological order, so one left-to-right pass computes the exact
    minimum — the round-3 form ran the same recurrence as a 16-round
    unrolled Bellman-Ford (16 join+groupBy Spark jobs plus checkpoint
    jobs over a ≤680-row relation, pure scheduling overhead; the oracle
    still replays that unrolled form and the results are identical
    because extra relaxation rounds past the topological pass are
    no-ops). Here the per-word edge list folds to an array and the DP is
    a single F.aggregate expression: dist[p] = min over edges ending at
    p of dist[pos_from] + w32, all in exact BIGINTs — zero joins, zero
    extra jobs. Every position is reachable (every character is in the
    piece vocabulary), so the running min never sees an empty set."""
    ea = word_edge_arrays(eg)
    # acc = dist array for positions 0..p-1 (1-indexed: element i+1 = pos i)
    dist = F.aggregate(
        F.sequence(F.lit(1), F.length("word").cast("bigint")),
        F.array(F.lit(0).cast("bigint")),
        lambda acc, p: F.concat(
            acc,
            F.array(
                F.array_min(
                    F.transform(
                        F.filter("edges", lambda e: e["pos_to"] == p),
                        lambda e: F.element_at(acc, (e["pos_from"] + 1).cast("int"))
                        + e["w32"],
                    )
                )
            ),
        ),
    )
    return words.join(ea, "word").select(
        "word",
        F.length("word").cast("bigint").alias("pos"),
        F.element_at(dist, (F.length("word") + 1).cast("int")).alias("v"),
    )
