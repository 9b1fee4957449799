"""Tokenizer induction (M6 extension): distributed BPE merge learning —
the first merge steps of byte-pair encoding (Sennrich et al. 2016)
computed as a declarative DataFrame plan.

The scale design is the one real BPE trainers use: BPE never iterates
over the corpus — it iterates over the WORD-FREQUENCY table. One
corpus-sized hash aggregate collapses N tokens to the (word, n) vocab
(~10^7 rows at web scale, independent of corpus size); every merge
iteration after that is vocab-sized work: pair counts are a fan-out of
the symbol arrays weighted by n, the winning pair is an
orderBy().limit(1) TakeOrderedAndProject (parallel partial top-1, no
global sort), and applying the merge is a JVM-side ``aggregate`` fold
over each word's symbol array with the 1-row winner broadcast onto the
vocab — fully lazy, no driver-side collect anywhere (contrast the IVF
trainer, whose centroid collect is a justified driver constant; here
even that is avoided because the "model" is one row per step).

Greedy left-to-right merge semantics (the BPE standard: on [a,a,a] the
pair (a,a) merges the first two, the third stays) fall out of the fold:
the accumulator is the space-joined merged prefix, and a symbol joins
the previous one only when the accumulator's LAST symbol equals the
winner's first half. Verified identical between Spark's ``aggregate``
and DuckDB's ``list_reduce`` (both seed with the first element), and
exact by construction — string equality and BIGINT sums only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_sync_poc_spark.registry import register
from cdc_sync_poc_spark.sources.loader import load_table, spread_small_input

BPE_STEPS = 3  # learned merges; each step adds one vocab-sized pass

# fold applying the broadcast winning pair (column `pair`, "p1 p2") to
# one word's space-joined symbol string (column `spaced`); the NULL
# guard passes spaced through when a step found no pairs (empty top-1
# left-joined in) instead of annihilating the vocab state
_MERGE_FOLD = """CASE WHEN pair IS NULL THEN spaced ELSE aggregate(
  slice(split(spaced, ' '), 2, size(split(spaced, ' ')) - 1),
  cast(split(spaced, ' ')[0] as string),
  (acc, y) -> CASE
    WHEN regexp_extract(acc, '[^ ]*$', 0) = split(pair, ' ')[0]
         AND y = split(pair, ' ')[1]
    THEN regexp_replace(acc, '[^ ]*$', '') || replace(pair, ' ', '')
    ELSE acc || ' ' || y END) END"""


def _learn_ctes() -> list[str]:
    """The learn-side CTE chain: vocab, then per step i the pair
    fan-out p{i}, winner t{i}, and null-safe merge application
    s{i+1} (LEFT JOIN — an empty winner passes syms through unchanged,
    mirroring _bpe_chain, instead of annihilating the vocab state)."""
    ctes = [
        """v AS (
  SELECT word, count(*)::BIGINT AS n
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' GROUP BY word
)""",
        "s1 AS (SELECT word, n, string_split(word, '') AS syms FROM v)",
    ]
    for i in range(1, BPE_STEPS + 1):
        ctes.append(
            f"""p{i} AS (
  SELECT unnest(list_transform(range(2, len(syms) + 1),
                i -> syms[i-1] || ' ' || syms[i])) AS pair, n
  FROM s{i}
)"""
        )
        ctes.append(
            f"""t{i} AS (
  SELECT pair, sum(n)::BIGINT AS cnt FROM p{i}
  GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1
)"""
        )
        ctes.append(
            f"""s{i + 1} AS (
  SELECT word, n,
         CASE WHEN t.pair IS NULL THEN syms
              ELSE string_split(list_reduce(syms, (acc, y) -> CASE
           WHEN regexp_extract(acc, '[^ ]*$') = string_split(t.pair, ' ')[1]
                AND y = string_split(t.pair, ' ')[2]
           THEN regexp_replace(acc, '[^ ]*$', '') || replace(t.pair, ' ', '')
           ELSE acc || ' ' || y END), ' ') END AS syms
  FROM s{i} LEFT JOIN t{i} t ON TRUE
)"""
        )
    return ctes


def _oracle() -> str:
    """Merge-table oracle: the learn chain, then one row per found
    winner (an exhausted corpus reports fewer than BPE_STEPS rows —
    same as the Spark union of empty top-1 frames)."""
    selects = [
        f"SELECT {i}::BIGINT AS step, pair, replace(pair, ' ', '') AS merged, cnt"
        f" FROM t{i}"
        for i in range(1, BPE_STEPS + 1)
    ]
    return (
        "WITH " + ",\n".join(_learn_ctes()) + "\n" + "\nUNION ALL ".join(selects)
    )


def _apply_oracle_prefix() -> str:
    """The learn-side CTE chain plus the per-word token costs under the
    fully-merged vocab state — shared by every tokenize-apply oracle."""
    return (
        "WITH "
        + ",\n".join(_learn_ctes())
        + f""",
wtok AS (SELECT word, len(syms)::BIGINT AS n_tok, length(word)::BIGINT AS n_char
         FROM s{BPE_STEPS + 1})
"""
    )


@register("bpe_merge_steps", oracle=_oracle())
def bpe_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE_STEPS byte-pair-encoding merges learned from the
    corpus: per step, the winning symbol pair and its weighted count.
    See the module docstring for the scale argument (corpus touched by
    exactly ONE hash aggregate; each step is vocab-sized)."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    return bpe_merges_frame(docs)


def bpe_merges_frame(docs: DataFrame) -> DataFrame:
    """Merge table of bpe_merge_steps over any (text) frame."""
    _cur, merges = _bpe_chain(docs)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionAll(m)
    return out


def _bpe_chain(docs: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    """Run the BPE_STEPS learn loop once: returns the fully-merged
    vocab state (word, n, spaced) and the per-step merge-record frames
    — the single implementation behind bpe_merge_steps (consumes the
    merge records) and the tokenize-apply ops (consume the final
    state; the unused branch stays unexecuted, Spark is lazy)."""
    # persisted: the vocab feeds every step's top-1 branch AND every
    # merge lineage (2·BPE_STEPS-1 consumers in the final union plan);
    # without it the corpus explode+agg — the ONLY corpus-sized work —
    # re-runs per consumer. Caching the vocab-sized frame makes each
    # merge step O(vocab), the textbook BPE cost model.
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    return _bpe_chain_from_vocab(vocab)


def _bpe_chain_from_vocab(vocab: DataFrame) -> tuple[DataFrame, list[DataFrame]]:
    """The BPE learn loop over an already-built (word, n) vocabulary —
    the corpus never appears: every step is vocab-sized. Split out so
    the streaming word-count maintainer (streaming/bpe_vocab.py) can
    learn merges from its incrementally-maintained store through the
    exact code path the batch query uses (same winners, same
    tie-breaks). ``vocab`` should be persisted/materialized by the
    caller (it feeds 2·BPE_STEPS-1 consumers)."""
    cur = vocab.withColumn("spaced", F.array_join(F.split("word", ""), " "))
    merges = []
    for step in range(1, BPE_STEPS + 1):
        # CASE guard: Spark's sequence(2, 1) counts DOWN (unlike
        # DuckDB's empty range(2, 2)), so a single-symbol word would
        # index past the array under ANSI mode
        pairs = cur.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(split(spaced, ' ')) < 2"
                    " THEN cast(array() as array<string>)"
                    " ELSE transform(sequence(2, size(split(spaced, ' '))),"
                    " i -> split(spaced, ' ')[i-2] || ' ' || split(spaced, ' ')[i-1])"
                    " END"
                )
            ).alias("pair"),
            "n",
        )
        # persisted: this 1-row frame is consumed by the NEXT step's
        # merge lineage (as a broadcast) AND by the final union; without
        # the cache each consumer re-runs the whole step chain up to
        # here, turning BPE_STEPS sequential steps into O(steps^2) jobs
        top1 = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .persist()
        )
        merges.append(
            top1.select(
                F.lit(step).cast("long").alias("step"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "cnt",
            )
        )
        # LEFT join on TRUE (not crossJoin): an empty winner frame
        # null-fills `pair` and the fold's NULL guard keeps the state,
        # where a cross join would silently empty the whole vocab
        cur = (
            cur.join(F.broadcast(top1.select("pair")), F.lit(True), "left")
            .withColumn("spaced", F.expr(_MERGE_FOLD))
            .select("word", "n", "spaced")
        )
    return cur, merges


def _wtok(docs: DataFrame) -> DataFrame:
    """(word, n_tok, n_char) under the learned merges — the per-word
    token costs every tokenize-apply op joins against."""
    cur, _merges = _bpe_chain(docs)
    return cur.select(
        "word",
        F.size(F.split("spaced", " ")).cast("long").alias("n_tok"),
        F.length("word").cast("long").alias("n_char"),
    )


@register(
    "bpe_tokenize_count",
    oracle=_apply_oracle_prefix()
    + """,
dw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT dw.doc_id,
       sum(w.n_char)::BIGINT AS n_char_tokens,
       sum(w.n_tok)::BIGINT AS n_bpe_tokens,
       round(CAST(sum(w.n_char) AS DOUBLE) / sum(w.n_tok), 6) AS compression
FROM dw JOIN wtok w USING (word)
GROUP BY dw.doc_id
""",
)
def bpe_tokenize_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges back to the corpus: per document,
    the token count under the character baseline vs the induced vocab,
    and the resulting compression ratio — the metric a tokenizer-
    induction pipeline actually tunes for.

    The tokenization itself never touches the corpus: the per-WORD
    token count is computed once on the vocab table (each word's symbol
    array after BPE_STEPS folds), and documents join their exploded
    words against that (word -> n_tok) table — at web scale a shuffle
    join on the uniform word key (the vocab side is ~10^7 rows; no
    broadcast hint, Catalyst decides), followed by one per-doc hash
    agg. The double division is the only float, rounded once."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    wtok = _wtok(docs)
    dw = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        dw.join(wtok, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("n_char").alias("n_char_tokens"),
            F.sum("n_tok").alias("n_bpe_tokens"),
            F.round(
                F.sum("n_char").cast("double") / F.sum("n_tok"), 6
            ).alias("compression"),
        )
    )


@register(
    "bpe_fertility_by_lang",
    oracle=_apply_oracle_prefix()
    + """,
dw AS (
  SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT dw.lang,
       count(*)::BIGINT AS n_words,
       sum(w.n_tok)::BIGINT AS n_bpe_tokens,
       round(CAST(sum(w.n_tok) AS DOUBLE) / count(*), 6) AS fertility,
       round(CAST(sum(w.n_char) AS DOUBLE) / sum(w.n_tok), 6) AS chars_per_token
FROM dw JOIN wtok w USING (word)
GROUP BY dw.lang
""",
)
def bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: average BPE tokens per word
    and characters per token under the induced merges — the standard
    fairness metric for a shared multilingual vocabulary (a language
    whose fertility stays near the character baseline is being
    under-served by the learned merges).

    Same two-table shape as bpe_tokenize_count — the per-word token
    cost comes off the vocab table, the corpus only pays one explode +
    join + langs-sized agg; the language dimension rides through the
    rollup for free."""
    docs = spread_small_input(load_table(spark, sf_dir, "documents"))
    wtok = _wtok(docs)
    dw = docs.select(
        "lang", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        dw.join(wtok, "word")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_tok").alias("n_bpe_tokens"),
            F.round(F.sum("n_tok").cast("double") / F.count("*"), 6).alias(
                "fertility"
            ),
            F.round(
                F.sum("n_char").cast("double") / F.sum("n_tok"), 6
            ).alias("chars_per_token"),
        )
    )
