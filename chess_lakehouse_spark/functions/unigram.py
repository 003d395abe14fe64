"""Distributed unigram-LM (SentencePiece-style) tokenizer induction.

The EM-family complement of :mod:`chess_lakehouse_spark.functions.bpe`:
where BPE grows a vocabulary bottom-up by greedy pair merges, the unigram
LM (Kudo 2018, "Subword Regularization", public) starts from a LARGE seed
vocabulary of candidate pieces and re-estimates piece weights by
expectation-maximization over the best segmentation of each word. This
implementation is the deterministic HARD-EM (Viterbi) variant: the E-step
segments every word with the exact Viterbi DP under integer micro-nat
piece costs and a total order on ties, the M-step re-counts piece usage
from those segmentations — so any engine / partitioning / run learns the
identical vocabulary, and the whole trainer unrolls into a SQL oracle
(the kmeans/bpe unroll discipline).

Scale shape (the bpe_train observation): all statistics live on the
DISTINCT-WORD frequency table — a 100 TB corpus collapses to a
~10-100M-row (word, count) frame in one map-combined aggregation. Each EM
round is ONE map-side Viterbi pass over that frame (the vocabulary is a
baked literal map — it is driver-bounded by construction, the kmeans
centroid-collect pattern) + ONE map-combined piece-count aggregation; the
driver holds only the ≤(chars + n_seed_multi)-row vocabulary.

Cross-engine portability: piece costs are integer MICRO-NATS —
``CAST(ROUND(ln(total/weight) * 1e6) AS BIGINT)`` computed INSIDE each
engine from identical integer weights (the sweep-tested ROUND-of-ln-ratio
pillar; every DP accumulation after that is exact integer addition), and
the Viterbi tie-break is the total order (cost ASC, piece-count ASC,
segmentation-string ASC).

Reference surface parity note: the reference has no tokenizer (its text
functions are the chess extension scalars, src/read-pgn.ts:48); this is
part of the training-data extension surface (SURVEY.md §2.13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chess_lakehouse_spark.session import local_df

from chess_lakehouse_spark.functions.text import WS_SPLIT as _WS_SPLIT

#: Segmentation-string separator in the Viterbi tie-break (unit
#: separator: below any printable byte, so the lexicographic order of
#: joined segmentations is the order of the piece sequences).
_SEP = 31


def _words(df: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> distinct (w, n) word frequency table (the bpe_train
    collapse; one explode + one map-combined count)."""
    from chess_lakehouse_spark.session import spread

    return (
        # spread: the tokenize/explode map inherits the scan's single
        # fixture-file partition without it (guide §2.5).
        spread(df.select(F.col(text_col)))
        .select(
            F.explode(
                F.filter(F.split(F.col(text_col), _WS_SPLIT), lambda w: w != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _seed_weights(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, wt): every substring of length 1..max_piece_len of every
    word, weighted by occurrence count x word frequency — the suffix
    substring statistics SentencePiece seeds from, bounded by
    |distinct words| x len x max_piece_len."""
    pieces = F.expr(
        f"""
      flatten(transform(sequence(1, length(w)), i ->
        filter(transform(sequence(1, {max_piece_len}), d ->
          CASE WHEN i + d - 1 <= length(w) THEN substring(w, i, d)
               ELSE CAST(NULL AS string) END),
          p -> p IS NOT NULL)))
    """
    )
    return (
        words.select("n", F.explode(pieces).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").alias("wt"))
    )


def _sql_quote(s: str) -> str:
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _viterbi_sql(vocab: dict[str, int], max_piece_len: int) -> str:
    """Exact Viterbi segmentation as ONE codegen SQL expression over the
    free variable ``w`` (a column or lambda variable): fold positions
    1..len(w) carrying the DP table as an array of (cost, k, seg)
    structs; at each position the candidate pieces are the
    <= max_piece_len suffixes ending there, looked up in the baked
    vocabulary-cost map literal (try_element_at: ANSI-safe, NULL on
    miss); ties resolve by the (cost, k, seg) struct order, which
    array_min applies directly. Evaluates to the winning segmentation
    as chr(31)-joined pieces."""
    entries = ", ".join(
        f"'{_sql_quote(p)}', CAST({c} AS BIGINT)" for p, c in sorted(vocab.items())
    )
    vmap = f"map({entries})"
    cand = f"""
      filter(transform(sequence(1, {max_piece_len}), d ->
        CASE WHEN i - d >= 0
              AND try_element_at({vmap}, substring(w, i - d + 1, d)) IS NOT NULL
          THEN named_struct(
            'c', element_at(acc, i - d + 1).c
                 + try_element_at({vmap}, substring(w, i - d + 1, d)),
            'k', element_at(acc, i - d + 1).k + 1,
            's', concat(element_at(acc, i - d + 1).s, chr({_SEP}),
                        substring(w, i - d + 1, d)))
          ELSE CAST(NULL AS struct<c: bigint, k: int, s: string>) END),
        x -> x IS NOT NULL)
    """
    return f"""
      aggregate(
        sequence(1, length(w)),
        array(named_struct('c', CAST(0 AS BIGINT), 'k', 0, 's', '')),
        (acc, i) -> concat(acc, array(array_min({cand}))),
        acc -> element_at(acc, length(w) + 1).s)
    """


def _costs(spark, weighted: list[tuple[str, int]]) -> dict[str, int]:
    """Integer micro-nat costs from integer weights: piece cost =
    round-half-away(ln(total/weight) * 1e6). Computed IN THE SPARK JVM
    (one job over the |vocab|-row frame) rather than in Python, so the
    engine pair under test is exactly the sweep-tested
    Spark-ln == DuckDB-ln pillar; every DP accumulation after this is
    exact integer addition."""
    total = sum(w for _, w in weighted)
    wdf = local_df(spark, sorted(weighted), "piece string, wt long")
    rows = wdf.select(
        "piece",
        F.expr(
            f"CAST(ROUND(ln(CAST({total} AS DOUBLE) / CAST(wt AS DOUBLE))"
            " * 1000000) AS BIGINT)"
        ).alias("cost"),
    ).collect()  # |vocab| rows
    return {r["piece"]: r["cost"] for r in rows}


def unigram_lm_train(
    df: DataFrame,
    text_col: str,
    max_piece_len: int = 3,
    n_seed_multi: int = 40,
    em_iters: int = 2,
    n_keep_multi: int = 12,
) -> list[tuple[str, int]]:
    """Learn a unigram-LM tokenizer vocabulary from the corpus by
    deterministic Viterbi hard-EM. Returns the final vocabulary as a
    ranked list of (piece, weight): every single character seen in the
    corpus (coverage — any word remains segmentable) plus the top
    ``n_keep_multi`` multi-character pieces by final EM usage, all
    ranked by (weight DESC, piece ASC).

    Rounds: seed = all substrings <= max_piece_len weighted by
    occurrence x word count (chars all kept; multi-char top
    ``n_seed_multi`` by (wt DESC, piece ASC)); then ``em_iters`` rounds
    of {cost <- micro-nat ln(total/wt); Viterbi-segment every distinct
    word; wt <- usage counts}. A multi-char piece whose usage drops to
    zero leaves the vocabulary; a character's weight floors at 1 (the
    coverage smoothing — every word must stay segmentable, stated
    contract). The driver holds only the <= (alphabet + n_seed_multi)
    vocabulary rows per round (the kmeans centroid-collect pattern);
    the word table stays distributed — each round is one map-side DP
    pass plus one map-combined piece count."""
    if max_piece_len < 2:
        raise ValueError(
            f"unigram_lm_train: max_piece_len must be >= 2, got {max_piece_len}"
        )
    if em_iters < 1:
        raise ValueError(f"unigram_lm_train: em_iters must be >= 1, got {em_iters}")
    if n_seed_multi < 1 or n_keep_multi < 1:
        raise ValueError("unigram_lm_train: seed/keep sizes must be >= 1")
    # Lazy persist (the bpe_train/kmeans_fit r16 discipline): the
    # materialization rides the seed-collect job instead of its own.
    words = _words(df, text_col).persist()
    seed = _seed_weights(words, max_piece_len)
    chars = {
        r["piece"]: r["wt"]
        for r in seed.where(F.length("piece") == 1).collect()
    }  # |alphabet| rows
    multi = {
        r["piece"]: r["wt"]
        for r in seed.where(F.length("piece") > 1)
        .orderBy(F.col("wt").desc(), F.col("piece").asc())
        .limit(n_seed_multi)
        .collect()
    }  # n_seed_multi rows
    if not chars:
        words.unpersist()
        return []
    vocab = {**chars, **multi}
    for _ in range(em_iters):
        costs = _costs(df.sparkSession, sorted(vocab.items()))
        seg = words.select(
            "n", F.expr(_viterbi_sql(costs, max_piece_len)).alias("s")
        )
        used = (
            seg.select(
                "n",
                F.explode(
                    F.filter(F.split(F.col("s"), chr(_SEP)), lambda p: p != "")
                ).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("n").alias("wt"))
            .collect()
        )  # <= |vocab| rows
        counts = {r["piece"]: r["wt"] for r in used}
        vocab = {c: max(counts.get(c, 0), 1) for c in chars}
        vocab.update({p: counts[p] for p in multi if counts.get(p, 0) > 0})
        multi = {p: w for p, w in vocab.items() if len(p) > 1}
    kept_multi = sorted(multi.items(), key=lambda x: (-x[1], x[0]))[:n_keep_multi]
    final = [(p, w) for p, w in vocab.items() if len(p) == 1] + kept_multi
    words.unpersist()
    return sorted(final, key=lambda x: (-x[1], x[0]))


def unigram_segment(
    df: DataFrame,
    text_col: str,
    vocab: list[tuple[str, int]],
    max_piece_len: int,
    out_col: str = "pieces",
) -> DataFrame:
    """Tokenize: Viterbi-segment every whitespace word of ``text_col``
    under the trained vocabulary's micro-nat costs, appending
    ``out_col`` = the flat piece array. ONE map-side codegen pass (the
    DP SQL is inlined per word through a lambda rebind of its free
    variable); the fertility-audit consumer divides size(pieces) by the
    word count to price the vocabulary."""
    if not vocab:
        raise ValueError("unigram_segment: empty vocabulary")
    costs = _costs(df.sparkSession, sorted(vocab))
    dp = _viterbi_sql(costs, max_piece_len)
    from chess_lakehouse_spark.functions.text import WS_SPLIT_SQL

    expr = f"""
      flatten(transform(
        filter(split({text_col}, '{WS_SPLIT_SQL}'), x -> x <> ''),
        w -> filter(split({dp}, chr({_SEP})), p -> p <> '')))
    """
    return df.withColumn(out_col, F.expr(expr))
