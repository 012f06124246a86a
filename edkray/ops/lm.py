"""Statistical n-gram LM quality scoring (CCNet-style), distributed.

The classic web-corpus curation signal (CCNet, Gopher, RedPajama):
score every document by the per-token log-probability of a simple
statistical language model trained on the corpus itself — low scores
flag gibberish / boilerplate, the score feeds quality bucketing. This
module trains a BIGRAM model with stupid backoff (Brants et al. 2007,
"Large Language Models in Machine Translation") and scores each doc:

    P(w2 | w1) = C(w1,w2) / C(w1)        if C(w1,w2) survived pruning
               = 0.4 * C(w2) / N          otherwise (backoff)
    lm_score(doc) = mean over positions of ln P

Training is one distributed pass: per-batch polars tokenize + partial
counts, then :func:`grouped_agg` folds them (shuffle carries (token,
count) rows, never text). Bigrams below ``min_count`` are pruned — the
standard LM practice that bounds the model (the pruned mass is exactly
what backoff is for) — and the bound on the collected model is
ENFORCED (grouped_agg_small's contract): above ``max_model_rows`` the
collect raises with a pointer to sample-based training rather than
silently OOMing the driver. Scoring broadcasts the pruned model once
(``ray.put``) and runs an actor-pool stage whose per-batch work is
pure polars: explode tokens, shift-over-doc to form pairs, two hash
joins against the model tables, one group-by mean. Docs with < 2
tokens have no bigram positions and are not emitted.

Tokenization is ``split(' ')`` exactly (DuckDB ``string_split`` zips
identically, empty tokens preserved) so the SQL oracle reproduces the
model and the scores bit-for-bit up to float summation order.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import ray
import ray.data

from edkray.ops.aggregate import grouped_agg


class BigramModel:
    """Pruned bigram counts + unigram counts + total token count,
    held as polars frames for vectorized hash-join scoring."""

    def __init__(self, uni: pl.DataFrame, big: pl.DataFrame, total: int,
                 backoff: float = 0.4):
        self.uni, self.big, self.total, self.backoff = uni, big, total, backoff


def _tokens(batch: pa.Table, text_col: str, id_col: str | None = None) -> pl.DataFrame:
    cols = [id_col, text_col] if id_col else [text_col]
    df = pl.from_arrow(batch.select(cols))
    if id_col is None:
        df = df.with_row_index("__doc")
        id_col = "__doc"
    return (
        df.filter(pl.col(text_col).is_not_null())  # null text = no tokens
        .select(pl.col(id_col).alias("__doc"),
                pl.col(text_col).str.split(" ").alias("w"))
        .explode("w")
    )


def fit_bigram_lm(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_count: int = 1,
    max_model_rows: int = 5_000_000,
    backoff: float = 0.4,
    batch_size: int = 8192,
) -> BigramModel:
    """One distributed counting pass → pruned broadcastable model."""

    def _partial(batch: pa.Table) -> pa.Table:
        tok = _tokens(batch, text_col)
        tok = tok.with_columns(w1=pl.col("w").shift(1).over("__doc"))
        uni = tok.group_by("w").len().rename({"len": "c"})
        big = (tok.filter(pl.col("w1").is_not_null())
               .group_by(["w1", "w"]).len().rename({"len": "c"}))
        # one partial table; `kind` keeps the two count families apart
        # without null keys in the shuffle (kind 0 rows pad w1 with "")
        return pl.concat([
            uni.select(pl.lit(0).alias("kind"), pl.lit("").alias("w1"), "w", "c"),
            big.select(pl.lit(1).alias("kind"), "w1", "w", "c"),
        ]).to_arrow()

    counts = grouped_agg(
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=batch_size),
        ["kind", "w1", "w"], [("sum", "c", "c")],
    )
    try:
        model = pl.from_pandas(counts.to_pandas(limit=max_model_rows))
    except ValueError as e:
        raise ValueError(
            f"fit_bigram_lm: model exceeds max_model_rows={max_model_rows}; "
            f"raise min_count (prunes the bigram tail) or train on a sample "
            f"(the CCNet approach) instead of broadcasting the full model"
        ) from e
    uni = model.filter(pl.col("kind") == 0).select("w", "c")
    big = (model.filter((pl.col("kind") == 1) & (pl.col("c") >= min_count))
           .select("w1", pl.col("w").alias("w2"), "c"))
    total = int(uni["c"].sum())
    return BigramModel(uni, big, total, backoff)


def score_bigram_lm(
    ds: ray.data.Dataset,
    model: BigramModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 4096,
    concurrency: tuple[int, int] | int = (1, 4),
) -> ray.data.Dataset:
    """Per-doc stupid-backoff score: (id_col, n_tokens, lm_score) for
    every doc with ≥ 1 bigram position."""
    model_ref = ray.put((model.uni, model.big, model.total, model.backoff))

    class _Scorer:
        def __init__(self):
            self.uni, self.big, self.total, self.backoff = ray.get(model_ref)
            self.uni1 = self.uni.rename({"w": "w1", "c": "c1"})
            self.uni2 = self.uni.rename({"c": "c2"})

        def __call__(self, batch: pa.Table) -> pa.Table:
            tok = _tokens(batch, text_col, id_col)
            tok = tok.with_columns(w1=pl.col("w").shift(1).over("__doc"))
            ntok = tok.group_by("__doc").len().rename({"len": "n_tokens"})
            pairs = (
                tok.filter(pl.col("w1").is_not_null())
                .join(self.big, left_on=["w1", "w"],
                      right_on=["w1", "w2"], how="left")
                .join(self.uni1, on="w1", how="left")
                .join(self.uni2, on="w", how="left")
            )
            lp = (
                pl.when(pl.col("c").is_not_null())
                .then((pl.col("c").cast(pl.Float64) / pl.col("c1")).log())
                .otherwise((self.backoff * pl.col("c2").fill_null(1).cast(pl.Float64)
                            / self.total).log())
            )
            out = (
                pairs.select("__doc", lp.alias("lp"))
                .group_by("__doc").agg(pl.col("lp").mean().alias("lm_score"))
                .join(ntok, on="__doc")
                .rename({"__doc": id_col})
                .select(id_col, "n_tokens", "lm_score")
                .sort(id_col)
            )
            t = out.to_arrow()
            return t.set_column(
                t.schema.get_field_index("n_tokens"), "n_tokens",
                t["n_tokens"].cast(pa.int64()))

    return ds.map_batches(_Scorer, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)
