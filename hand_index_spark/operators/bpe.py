"""Distributed BPE tokenizer training (Sennrich et al. 2016), the
corpus-level merge loop a training-data pipeline runs before anything
else can count tokens.

Representation: a document's token sequence is one STRING with every
token wrapped as chr(30)+token+chr(31) (both control chars reserved —
they cannot appear in text). That encoding makes each merge round pure
engine primitives, bit-identically replayable by the DuckDB oracle:

- pair counting: split on chr(31)+chr(30) -> adjacent-pair explode ->
  one map-side-combinable groupBy (the only shuffle per round, keyed
  on the pair string);
- winner selection: ORDER BY count DESC, pair ASC LIMIT 1 — a
  single-row collect (binary string collation on both engines);
- merge application: plain left-to-right ``replace()`` of the literal
  pattern chr(30)+a+chr(31)+chr(30)+b+chr(31) with chr(30)+a+b+chr(31).
  Because every token carries BOTH boundary marks, adjacent
  occurrences never overlap ('abab' merges to [ab][ab], matching
  greedy BPE) and false matches inside longer tokens are impossible.

Scale shape: each round is O(corpus) map work + one pair-count shuffle
+ one scalar pick — the canonical distributed BPE round. At 100 TB
you'd take the top-K non-conflicting pairs per round to amortize corpus
passes (K merges per scan); the loop here takes K=1 so the oracle can
pin every intermediate state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OPEN = "\x1e"
CLOSE = "\x1f"


def wrap_chars(col):
    """text -> initial character-token string ⟨c1⟩⟨c2⟩... ([\\s\\S]
    so newlines wrap too)."""
    return F.regexp_replace(col, r"([\s\S])", OPEN + "$1" + CLOSE)


def tokens_expr(s_col: str = "s"):
    return F.split(
        F.expr(f"substring({s_col}, 2, length({s_col}) - 2)"), CLOSE + OPEN
    )


def _pairs(corpus: DataFrame) -> DataFrame:
    # materialize the split ONCE as a column: element_at inside the
    # HOF lambda otherwise re-evaluates the full split per access
    # (measured O(tokens^2) per doc — 90 s -> ~15 s at 6 rounds)
    t = F.col("t")
    return (
        corpus.select(tokens_expr().alias("t"))
        .filter(F.size(t) >= 2)  # sequence(0, -1) guard
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - 2),
                    lambda i: F.concat(
                        F.lit(OPEN),
                        F.element_at(t, i + 1),
                        F.lit(CLOSE + OPEN),
                        F.element_at(t, i + 2),
                        F.lit(CLOSE),
                    ),
                )
            ).alias("p")
        )
    )


def train_bpe(
    docs: DataFrame, text_col: str, rounds: int
) -> tuple[DataFrame, list[str]]:
    """Run ``rounds`` merge rounds over docs[text_col]. Returns the
    final corpus (doc_id, s) and the learned merge patterns (each the
    literal wrapped-pair string, most-frequent-first)."""
    corpus = docs.select("doc_id", wrap_chars(F.col(text_col)).alias("s"))
    merges: list[str] = []
    for _ in range(rounds):
        top = (
            _pairs(corpus)
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        pat = top[0]["p"]
        merges.append(pat)
        rep = pat.replace(CLOSE + OPEN, "")
        corpus = corpus.withColumn(
            "s", F.replace(F.col("s"), F.lit(pat), F.lit(rep))
        )
        # materialize each round once: without this, round r's
        # pair-count job re-derives the corpus from scratch through r
        # stacked replaces (measured 89 s -> ~15 s at 6 rounds / 500
        # docs; same multi-consumer rule as the dedup base scan)
        corpus = corpus.localCheckpoint(eager=True)
    return corpus, merges


def token_stats(corpus: DataFrame) -> DataFrame:
    """Per-doc (doc_id, n_tokens, first_token) after training."""
    return corpus.select("doc_id", tokens_expr().alias("t")).select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.element_at("t", 1).alias("first_token"),
    )


def bpe_oracle_sql(table: str, text_col: str, rounds: int) -> str:
    """DuckDB twin: one CTE pair (pair-count argmax + replace) per
    round, replaying the exact same winner selection and merge."""
    ctes = [
        f"c0 AS (SELECT doc_id, regexp_replace({text_col}, "
        f"'([\\s\\S])', chr(30)||'\\1'||chr(31), 'g') AS s FROM {table})"
    ]
    toks = "str_split(substr(s, 2, length(s) - 2), chr(31)||chr(30))"
    for r in range(rounds):
        ctes.append(
            f"""p{r} AS (
      SELECT unnest(list_transform(range(1, len(t)),
        i -> chr(30)||t[i]||chr(31)||chr(30)||t[i+1]||chr(31))) AS p
      FROM (SELECT {toks} AS t FROM c{r})
    )"""
        )
        ctes.append(
            f"m{r} AS (SELECT p FROM p{r} GROUP BY p "
            f"ORDER BY count(*) DESC, p ASC LIMIT 1)"
        )
        ctes.append(
            f"c{r + 1} AS (SELECT doc_id, replace(s, (SELECT p FROM m{r}), "
            f"replace((SELECT p FROM m{r}), chr(31)||chr(30), '')) AS s "
            f"FROM c{r})"
        )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT doc_id, CAST(len({toks}) AS BIGINT) AS n_tokens,
           {toks}[1] AS first_token
    FROM c{rounds}
    """
