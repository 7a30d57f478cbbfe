"""Distributed BPE training vs a pure-Python reference implementation
(same winner rule: max count, then lexicographically-smallest wrapped
pair; same left-to-right non-overlapping merge)."""

from pyspark.sql import functions as F

from hand_index_spark.operators.bpe import (
    CLOSE,
    OPEN,
    token_stats,
    train_bpe,
)


def _py_bpe(texts, rounds):
    corpora = [[OPEN + c + CLOSE for c in t] for t in texts]

    def wrapped(tok):  # tokens are stored wrapped already
        return tok

    merges = []
    for _ in range(rounds):
        counts = {}
        for toks in corpora:
            for a, b in zip(toks, toks[1:]):
                counts[a + b] = counts.get(a + b, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a_b = best
        merged = OPEN + a_b.replace(CLOSE + OPEN, "")[1:-1] + CLOSE
        # left-to-right non-overlapping merge
        for di, toks in enumerate(corpora):
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] + toks[i + 1] == a_b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            corpora[di] = out
    return corpora, merges


def test_bpe_matches_python_reference(spark):
    texts = [
        "the cat sat on the mat",
        "the theme of the thesis",
        "abababab",
        "mississippi mississippi",
        "x",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], schema="doc_id long, text string"
    )
    corpus, merges = train_bpe(df, "text", rounds=5)
    ref_corpora, ref_merges = _py_bpe(texts, 5)
    assert merges == ref_merges
    got = {
        r["doc_id"]: (r["n_tokens"], r["first_token"])
        for r in token_stats(corpus).collect()
    }
    for i, toks in enumerate(ref_corpora):
        unwrapped = [t[1:-1] for t in toks]
        assert got[i] == (len(unwrapped), unwrapped[0]), (i, got[i], unwrapped)


def test_bpe_adjacent_repeats_merge_greedily(spark):
    # 'abab...' must compress to [ab]*k in round 1 (the wrapped-token
    # encoding makes adjacent occurrences non-overlapping in replace)
    df = spark.createDataFrame([(0, "ab" * 6)], schema="doc_id long, text string")
    corpus, merges = train_bpe(df, "text", rounds=1)
    assert merges == [OPEN + "a" + CLOSE + OPEN + "b" + CLOSE]
    row = token_stats(corpus).collect()[0]
    assert row["n_tokens"] == 6 and row["first_token"] == "ab"


def test_bpe_stops_when_no_pairs(spark):
    df = spark.createDataFrame([(0, "q")], schema="doc_id long, text string")
    corpus, merges = train_bpe(df, "text", rounds=3)
    assert merges == []
    assert token_stats(corpus).collect()[0]["n_tokens"] == 1
