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


def test_vocab_and_encode_round_trip(spark):
    """build_token_vocab is partition-invariant (lexicographic ids) and
    encode_token_ids round-trips: decoding ids through the vocab
    reproduces the token arrays exactly; OOV tokens map to unk_id with
    n_oov counted; empty/NULL token arrays survive as []."""
    from chess_lakehouse_spark.functions.bpe import (
        build_token_vocab,
        encode_token_ids,
    )

    rows = [
        (1, ["b", "a", "b", "c"]),
        (2, ["c", "a"]),
        (3, []),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    vocab = build_token_vocab(df)
    vmap = {r.token: r.token_id for r in vocab.collect()}
    assert vmap["<unk>"] == 0
    assert vmap["a"] == 1 and vmap["b"] == 2 and vmap["c"] == 3  # lexicographic
    # partition-invariance: same table from a repartitioned input
    vmap2 = {
        r.token: r.token_id
        for r in build_token_vocab(df.repartition(7)).collect()
    }
    assert vmap2 == vmap

    enc = {r.doc_id: r for r in encode_token_ids(df, "doc_id", vocab).collect()}
    assert list(enc[1].ids) == [2, 1, 2, 3] and enc[1].n_tokens == 4
    assert list(enc[3].ids) == [] and enc[3].n_tokens == 0
    assert list(enc[4].ids) == [] and enc[4].n_oov == 0

    # OOV: encode a NEW corpus against the OLD vocab
    new = spark.createDataFrame(
        [(9, ["a", "zzz", "c"])], "doc_id long, tokens array<string>"
    )
    got = encode_token_ids(new, "doc_id", vocab).collect()[0]
    assert list(got.ids) == [1, 0, 3] and got.n_oov == 1 and got.n_tokens == 3


def test_train_tokenize_encode_pack_chain(spark):
    """The full export chain on the real fixture: bpe_train → bpe_apply →
    build_token_vocab → encode_token_ids → pack_bins_bfd. Ids decode back
    to the exact token stream, and the packer consumes the produced
    n_tokens directly."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.bpe import (
        bpe_apply,
        bpe_train,
        build_token_vocab,
        encode_token_ids,
    )
    from chess_lakehouse_spark.operators.sampling import pack_bins_bfd

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, "text", n_merges=4)
    toks = bpe_apply(docs, "doc_id", "text", merges)
    vocab = build_token_vocab(toks)
    enc = encode_token_ids(toks, "doc_id", vocab)

    # round-trip a sample: ids -> tokens equals bpe_apply's output
    id2tok = {r.token_id: r.token for r in vocab.collect()}
    want = {r.doc_id: list(r.tokens) for r in toks.limit(5).collect()}
    got = {
        r.doc_id: [id2tok[i] for i in r.ids]
        for r in enc.where(F.col("doc_id").isin(list(want))).collect()
    }
    assert got == want
    assert enc.where(F.col("n_oov") != 0).count() == 0  # same-corpus vocab

    packed = pack_bins_bfd(enc, "doc_id", "n_tokens", budget=512, n_shards=4)
    assert packed.count() == enc.count()  # no-split: every doc placed once


def test_pipeline_cli_encode_corpus_stage(spark, tmp_path, capsys):
    """encode-corpus CLI: merges artifact + corpus in, ids + vocab out;
    re-encoding a NEW corpus against the minted vocab maps unseen tokens
    to <unk> and counts them."""
    import sys
    from pathlib import Path

    from pyspark.sql import functions as F

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    import pipeline_cli

    from chess_lakehouse_spark.functions.bpe import bpe_train

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = tmp_path / "corpus"
    docs.write.parquet(str(src))
    merges = bpe_train(docs, "text", n_merges=3)
    mfile = tmp_path / "bpe_merges.txt"
    mfile.write_text("\n".join(f"{a}\t{b}" for a, b in merges) + "\n")

    out = tmp_path / "encoded"
    pipeline_cli.main([
        "encode-corpus", "--inParquet", str(src), "--mergesTxt", str(mfile),
        "--outDir", str(out),
    ])
    ids = spark.read.parquet(str(out / "ids"))
    vocab = spark.read.parquet(str(out / "vocab"))
    assert ids.count() == docs.count()
    assert ids.agg(F.sum("n_oov")).collect()[0][0] == 0  # own-corpus vocab
    assert vocab.where(F.col("token_id") == 0).collect()[0].token == "<unk>"
    assert "oov_tokens=0" in capsys.readouterr().out

    # new corpus against the minted vocab: unseen words become <unk>
    new = tmp_path / "new"
    spark.createDataFrame(
        [(999999, "zzzunseen " * 5)], "doc_id long, text string"
    ).write.parquet(str(new))
    out2 = tmp_path / "encoded2"
    pipeline_cli.main([
        "encode-corpus", "--inParquet", str(new), "--mergesTxt", str(mfile),
        "--outDir", str(out2), "--vocabParquet", str(out / "vocab"),
    ])
    row = spark.read.parquet(str(out2 / "ids")).collect()[0]
    assert row.n_oov > 0


def test_decode_round_trips_encoded_corpus(spark):
    """text → tokenize → encode → DECODE reproduces the original text up
    to whitespace normalization (single spaces), on the real fixture and
    on a doc with an <unk> id."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.bpe import (
        bpe_apply,
        bpe_train,
        build_token_vocab,
        decode_token_ids,
        encode_token_ids,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = bpe_train(docs, "text", n_merges=4)
    toks = bpe_apply(docs, "doc_id", "text", merges)
    vocab = build_token_vocab(toks)
    enc = encode_token_ids(toks, "doc_id", vocab)
    dec = decode_token_ids(enc, "doc_id", vocab)

    orig = {
        r.doc_id: " ".join(r.text.split()) for r in docs.select("doc_id", "text").collect()
    }
    got = {r.doc_id: r.text for r in dec.collect()}
    assert got == orig

    # an unk id decodes to the vocab's reserved token, loudly
    one = spark.createDataFrame(
        [(7, [0, int(vocab.where(F.col("token") != "<unk>").first().token_id)])],
        "doc_id long, ids array<bigint>",
    )
    out = decode_token_ids(one, "doc_id", vocab).collect()[0].text
    assert out.startswith("<unk>")


def test_vocab_unk_collision_and_decode_sentinel(spark):
    """A corpus that already carries the unk sentinel gets ONE vocab row
    for it (id 0) — the encode join cannot duplicate occurrences — and a
    custom sentinel flows through decode's fallback (review findings,
    fixed)."""
    from pyspark.sql import functions as F

    from chess_lakehouse_spark.functions.bpe import (
        build_token_vocab,
        decode_token_ids,
        encode_token_ids,
    )

    df = spark.createDataFrame(
        [(1, ["<unk>", "a", "<unk>"])], "doc_id long, tokens array<string>"
    )
    vocab = build_token_vocab(df)
    assert vocab.where(F.col("token") == "<unk>").count() == 1
    enc = encode_token_ids(df, "doc_id", vocab).collect()[0]
    assert list(enc.ids) == [0, 1, 0] and enc.n_tokens == 3 and enc.n_oov == 0
    # custom sentinel: ids absent from the vocab fall back to it
    v2 = build_token_vocab(df, unk="[UNK]")
    one = spark.createDataFrame([(7, [99])], "doc_id long, ids array<bigint>")
    assert decode_token_ids(one, "doc_id", v2, unk="[UNK]").collect()[0].text == "[UNK]"
