"""Distributed BPE vocabulary induction, pinned against an independent
pure-Python reference implementation (Sennrich-style) with the identical
tie-break (count DESC, pa ASC, pb ASC)."""

from __future__ import annotations

from collections import Counter

import pytest

from chess_lakehouse_spark.functions.bpe import EOW, bpe_apply, bpe_train

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new low",
]


def _ref_word_freq(texts):
    freq = Counter()
    for t in texts:
        for w in t.split():
            freq[w] += 1
    return freq


def _ref_train(texts, n_merges, min_pair_count=2):
    freq = _ref_word_freq(texts)
    vocab = {}
    for w, n in freq.items():
        syms = list(w)
        syms[-1] = syms[-1] + EOW
        vocab[tuple(syms)] = vocab.get(tuple(syms), 0) + n
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        # count DESC, pa ASC, pb ASC
        (pa, pb), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((pa, pb))
        new_vocab = {}
        for syms, n in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == pa and syms[j + 1] == pb:
                    out.append(pa + pb)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges


def _ref_tokenize(text, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    out = []
    for w in text.split():
        syms = list(w)
        syms[-1] = syms[-1] + EOW
        while len(syms) > 1:
            cand = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cand:
                break
            rk, _ = min(cand)
            pa, pb = merges[rk]
            nxt, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == pa and syms[j + 1] == pb:
                    nxt.append(pa + pb)
                    j += 2
                else:
                    nxt.append(syms[j])
                    j += 1
            syms = nxt
        out.extend(syms)
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], "id long, text string")


def test_bpe_train_matches_reference(spark, corpus_df):
    got = bpe_train(corpus_df, "text", n_merges=12)
    want = _ref_train(CORPUS, 12)
    assert got == want
    assert len(got) >= 5  # the fixture corpus genuinely produces merges
    # e-s is the most frequent first pair in 'newest' x6 ('es' 6 beats 'lo' 6
    # on the pa tie-break? verified by the reference — just pin prefix shape)
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in got)


def test_bpe_train_early_stop(spark):
    df = spark.createDataFrame([(0, "ab cd ef")], "id long, text string")
    # every adjacent pair occurs once -> below min_pair_count=2 -> no merges
    assert bpe_train(df, "text", n_merges=5) == []


def test_bpe_train_checkpoint_rounds(spark, corpus_df):
    """Run past the lineage-checkpoint boundary (every 8 rounds)."""
    got = bpe_train(corpus_df, "text", n_merges=20, min_pair_count=1)
    want = _ref_train(CORPUS, 20, min_pair_count=1)
    assert got == want


def test_bpe_apply_matches_reference(spark, corpus_df):
    merges = bpe_train(corpus_df, "text", n_merges=10)
    texts = ["newest lower low", "wider new holdout"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = {r["id"]: r["tokens"] for r in bpe_apply(df, "id", "text", merges).collect()}
    for i, t in enumerate(texts):
        assert rows[i] == _ref_tokenize(t, merges)


def test_merge_expr_fold_matches_python_on_adversarial_arrays(spark):
    """The SQL fold in _merge_expr is the trickiest expression in the
    module (pending-buffer state machine); pin it against the Python
    left-to-right non-overlapping merge on adversarial symbol arrays —
    overlaps ('aaa'), pa==pb, pair at start/end, no match, quotes."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.bpe import _merge_expr

    def py_merge(syms, pa, pb):
        out, j = [], 0
        while j < len(syms):
            if j < len(syms) - 1 and syms[j] == pa and syms[j + 1] == pb:
                out.append(pa + pb)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        return out

    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b", "a"], "a", "b"),
        (["b", "a", "b"], "a", "b"),
        (["a", "b"], "a", "b"),
        (["a"], "a", "b"),
        ([], "a", "b"),
        (["x", "y", "z"], "a", "b"),
        (["a", "b", "b", "a", "a", "b"], "a", "b"),
        (["'", "b", "'", "b"], "'", "b"),
        (["ab", "c" + EOW], "ab", "c" + EOW),
        # backslashes (code/Windows-path corpora): the SQL literal splice
        # must escape them BEFORE quote-escaping or the fold mis-merges
        (["\\", "b", "\\", "b"], "\\", "b"),
        (["a\\b", "c", "a\\b", "c"], "a\\b", "c"),
        (["\\'", "x", "\\'", "x"], "\\'", "x"),
        (["\\\\", "n" + EOW], "\\\\", "n" + EOW),
    ]
    rows = [(i, syms) for i, (syms, _, _) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, syms array<string>")
    # one job: every case's merge expression evaluated as its own column
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            *[
                _merge_expr(pa, pb).alias(f"m{i}")
                for i, (_, pa, pb) in enumerate(cases)
            ],
        ).collect()
    }
    for i, (syms, pa, pb) in enumerate(cases):
        assert got[i][f"m{i}"] == py_merge(syms, pa, pb), (syms, pa, pb)


def test_bpe_apply_empty_and_single_char(spark):
    merges = [("l", "o" + EOW)]
    df = spark.createDataFrame([(0, ""), (1, "a"), (2, "lo")], "id long, text string")
    rows = {r["id"]: r["tokens"] for r in bpe_apply(df, "id", "text", merges).collect()}
    assert rows[0] == []
    assert rows[1] == ["a" + EOW]
    assert rows[2] == ["lo" + EOW]


def test_bpe_train_duckdb_oracle_parity(spark):
    """The suite's unrolled-CTE oracle (gated as the bpe_train driver query
    since r6) replays every merge round — greedy leftmost non-overlapping
    apply included — identically to BOTH the Spark implementation and the
    pure-Python reference, on the real fixture corpus."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import _bpe_oracle

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, "text", n_merges=5)
    want = [(i + 1, pa, pb) for i, (pa, pb) in enumerate(merges)]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    assert con.execute(_bpe_oracle(5)).fetchall() == want


def test_bpe_oracle_early_stop_and_pair_runs(spark):
    """Adversarial oracle semantics on a synthetic corpus: pa == pb runs
    ('aaa' -> [aa, a], 'aaaa' -> [aa, aa]) where greedy selection inside a
    match run matters, plus the early-stop passthrough when the corpus
    runs out of pairs above min_pair_count (n_merges overshoots)."""
    import duckdb

    from chess_lakehouse_spark.suite.llm import _bpe_oracle

    texts = ["aaa aaa aaaa", "ab ab aab", "ba ab aaa"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    merges = bpe_train(df, "text", n_merges=12)
    want = [(i + 1, pa, pb) for i, (pa, pb) in enumerate(merges)]
    assert want == [
        (i + 1, pa, pb) for i, (pa, pb) in enumerate(_ref_train(texts, 12))
    ]

    con = duckdb.connect()
    con.register("docs_pd", df.toPandas())
    con.execute("CREATE VIEW documents AS SELECT * FROM docs_pd")
    got = con.execute(_bpe_oracle(12)).fetchall()
    assert got == want
    assert len(want) < 12  # the early-stop path actually engaged
