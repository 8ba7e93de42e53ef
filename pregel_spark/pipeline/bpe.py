"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016).

Learning the merge table over a web-scale corpus is a census problem,
not a text problem: after ONE word-instance census (map-side combined,
output is vocabulary-sized — millions of rows from 100 TB of text),
every merge round runs on the vocabulary table only. Each round is

    pair census over adjacent symbol pairs (weighted by word count)
      -> argmax pair (TakeOrdered 1; deterministic tie-break)
      -> greedy left-to-right merge applied as a native array fold

so the corpus is scanned exactly once, and the per-round work is
O(vocab), never O(corpus). No Python touches a row anywhere: the fold
is ``F.aggregate`` (JVM codegen), the census a ``groupBy``, the argmax
a top-1.

Pinned spec (engine-portable; the DuckDB oracle and the pure-Python
test oracle replay it exactly):
- Words = the repo-wide whitespace tokenizer (``dedup.tokens_col``);
  counts are instance counts.
- Initial symbols = the word's characters, with ``</w>`` appended to
  the LAST character (Sennrich's end-of-word marker).
- Pair counts are per adjacent POSITION (a word "aaa"(x n) contributes
  2n to pair (a,a)).
- Best pair = max count, ties broken by lexicographically smallest
  (left, right) — Python/Spark/DuckDB all compare strings bytewise on
  this ASCII-safe symbol alphabet.
- A merge applies greedily left-to-right, non-overlapping: in a run of
  k consecutive matches every odd-indexed one merges. The fold below
  implements exactly that, because a just-merged symbol ``left+right``
  can never equal ``left`` again (it is strictly longer).
- Learning stops early when no adjacent pair remains.

Encoding reuses the same machinery: the merge ranks replay over the
DISTINCT-word table (one fold-scan per merge round, lineage cut every
``checkpoint_every`` rounds so expression depth stays bounded), then
documents join the encoded vocabulary — the corpus-sized side is
touched by one explode + one hash join, never by the merge replay.

The reference engine has no tokenizer; this is part of the
training-data pipeline surface the round brief makes first-class.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import tokens_col

END = "</w>"


def _char_symbols(word) -> F.Column:
    """Word -> [c1, c2, ..., ck + '</w>'] as a native column."""
    w = F.col(word) if isinstance(word, str) else word
    return F.transform(
        F.sequence(F.lit(1), F.length(w)),
        lambda i: F.concat(
            w.substr(i, F.lit(1)),
            F.when(i == F.length(w), F.lit(END)).otherwise(F.lit("")),
        ),
    )


def word_census(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(word, n) instance counts — the ONE corpus-sized exchange."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _apply_merge(syms, left: str, right: str) -> F.Column:
    """Greedy left-to-right non-overlapping (left,right) -> left+right,
    as one native array fold (see module spec for why the fold is
    exactly the greedy semantics)."""
    merged = F.lit(left + right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_census(vocab: DataFrame) -> DataFrame:
    """(l, r, cnt) adjacent-position pair census over (word, n, syms)."""
    two = vocab.where(F.size("syms") >= 2)
    pairs = two.select(
        F.col("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i.cast("int")).alias("l"),
                    F.element_at("syms", (i + 1).cast("int")).alias("r"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("n").alias("cnt"))


@dataclass
class BpeResult:
    merges: list[tuple[str, str, int]]  # (left, right, pair_count) by rank
    vocab: DataFrame  # (word, n, syms) after all merges
    rounds: int = 0  # Spark rounds taken (== len(merges) when batch=1)


def _triple_ceilings(vocab: DataFrame, cands: list) -> dict:
    """Created-pair ceilings for candidate pairs, from ONE adjacent-
    triple census restricted to candidate middles: for (l, r) the max
    weighted count over x of triples (x, l, r) and over y of
    (l, r, y). Any pair a merge of (l, r) can CREATE — (x, l+r) or
    (l+r, y) — has count bounded by these (each created adjacency
    consumes one such triple occurrence), and the bound is valid at
    any point inside a disjoint batch because merging a
    symbol-disjoint pair never raises a triple's max-over-x count
    (a replaced x only re-labels existing occurrences)."""
    three = vocab.where(F.size("syms") >= 3)
    cand_rows = [(l, r) for (l, r) in cands]
    trip = three.select(
        F.col("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 2),
                lambda i: F.struct(
                    F.element_at("syms", i.cast("int")).alias("a"),
                    F.element_at("syms", (i + 1).cast("int")).alias("b"),
                    F.element_at("syms", (i + 2).cast("int")).alias("c"),
                ),
            )
        ).alias("t"),
    ).select("n", "t.a", "t.b", "t.c")
    cand_df = vocab.sparkSession.createDataFrame(
        cand_rows, "l string, r string"
    )
    # left ceilings: middle pair (b,c) is the candidate, max over a
    lefts = (
        trip.join(F.broadcast(cand_df), (trip.b == cand_df.l) & (trip.c == cand_df.r))
        .groupBy("l", "r", "a")
        .agg(F.sum("n").alias("cnt"))
        .groupBy("l", "r")
        .agg(F.max("cnt").alias("ceil_l"))
    )
    rights = (
        trip.join(F.broadcast(cand_df), (trip.a == cand_df.l) & (trip.b == cand_df.r))
        .groupBy("l", "r", "c")
        .agg(F.sum("n").alias("cnt"))
        .groupBy("l", "r")
        .agg(F.max("cnt").alias("ceil_r"))
    )
    out: dict = {(l, r): 0 for (l, r) in cands}
    for row in lefts.collect():
        out[(row["l"], row["r"])] = max(out[(row["l"], row["r"])], int(row["ceil_l"]))
    for row in rights.collect():
        out[(row["l"], row["r"])] = max(out[(row["l"], row["r"])], int(row["ceil_r"]))
    return out


def _select_batch(
    top: list, ceilings: dict, batch: int, prior_concats: set | frozenset = frozenset()
) -> list:
    """The exactness-preserving batch rule (see ``bpe_learn``):
    walk the (cnt desc, l, r)-ordered prefix WITHOUT skipping; stop at
    the first pair that (a) shares a symbol with an earlier pick,
    (b) has an element string-equal to an earlier pick's CONCATENATION
    (symbol identity is the string, so merging (a,b) mints new "ab"
    symbols — a later ("ab", c) would gain count mid-batch and its
    recorded census count would no longer be the sequential one), or
    (c) does not STRICTLY beat the created-pair ceiling of every
    earlier pick. Additionally (d): a pick whose OWN concatenation
    string-equals an already-existing multi-char symbol — one minted
    by a PREVIOUS round's merge (``prior_concats`` = every prior
    merge's l+r, which is exactly the set of multi-char symbols) or by
    an earlier pick in this batch — ends the batch AFTER that pick:
    applying it would grow counts of PRE-EXISTING pairs involving that
    symbol, and ``_triple_ceilings`` bounds only the created portion,
    so pre-existing + created could overtake a later pick (the pick
    itself is still the exact sequential argmax; only picks after it
    lose their guarantee). What remains provably replays sequential
    BPE."""
    picked: list = []
    used: set = set()
    concats: set = set()
    ceiling = -1
    for row in top:
        l, r, cnt = row["l"], row["r"], int(row["cnt"])
        if len(picked) >= batch:
            break
        if picked and (
            cnt <= ceiling
            or l in used
            or r in used
            or l in concats
            or r in concats
        ):
            break
        picked.append((l, r, cnt))
        used.update((l, r))
        if l + r in prior_concats or l + r in concats:
            break  # guard (d): collision with an existing symbol
        concats.add(l + r)
        ceiling = max(ceiling, ceilings[(l, r)])
    return picked


def bpe_learn(
    docs: DataFrame,
    n_merges: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch: int = 1,
) -> BpeResult:
    """Learn ``n_merges`` BPE merges over the corpus (may stop early
    when no pair remains).

    ``batch=1`` (default): one 1-row TakeOrdered per merge — the only
    driver round-trip, same pattern as the BSP loop's aggregators.

    ``batch>1``: per ROUND, select up to ``batch`` merges that are
    provably identical to running that many sequential rounds, then
    apply them in one vocabulary pass — at production merge counts
    (32k-entry tokenizers) this divides the number of Spark jobs by
    the achieved batch size. The selection rule and why it is EXACT
    (not a heuristic):

    1. Candidates are the (cnt desc, l asc, r asc)-ordered census
       prefix taken WITHOUT skipping: the moment a pair conflicts, the
       batch ends. Hence every census pair ranked better than a batch
       member is itself in the batch, and every non-batch pair ranked
       worse can only LOSE count during the batch (a merge never
       creates an adjacency between two pre-existing symbols), so it
       can never overtake.
    2. Batch pairs are pairwise symbol-disjoint AND no pick's element
       string-equals an earlier pick's concatenation (symbol identity
       is the string), so their own counts are invariant while earlier
       batch merges apply, and their greedy applications commute (a
       disjoint replacement can neither create nor destroy an
       occurrence of the other pair).
    3. Merging (l, r) can only CREATE pairs of the form (x, l+r) or
       (l+r, y), and each created adjacency consumes an occurrence of
       the triple (x, l, r) / (l, r, y) — so created-pair counts are
       bounded by the triple-census ceilings (``_triple_ceilings``,
       bounds valid throughout the batch by the same disjointness
       argument). The batch extends only while the next pick's count
       STRICTLY exceeds every earlier pick's ceiling, so no created
       pair can tie or beat a later batch member in sequential order.

    Under 1-3, sequential BPE's argmax at step i is exactly the i-th
    batch pair, with the same recorded count. Byte-equality with
    ``batch=1`` is pinned by ``tests/test_bpe.py`` on adversarial
    corpora (including created-pair-overtakes and tie-breaks, where
    the guard must shrink the batch)."""
    vocab = word_census(docs, id_col, text_col).select(
        "word", "n", _char_symbols("word").alias("syms")
    )
    # localCheckpoint, NOT persist: each round's plan stacks `batch`
    # nested array folds on top of the previous round's — persist keeps
    # the logical plan, so a 1k-merge run accumulates a ~1000-deep
    # expression tree and OOMs the driver on tree operations (measured:
    # Java heap space in generateTreeString at ~30 batched rounds).
    # Checkpointing caches AND cuts lineage to a leaf every round.
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        top = (
            _pair_census(vocab)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(max(1, 2 * want))
            .collect()
        )
        if not top:
            break
        if want == 1:
            picked = [(top[0]["l"], top[0]["r"], int(top[0]["cnt"]))]
        else:
            ceilings = _triple_ceilings(vocab, [(t["l"], t["r"]) for t in top])
            picked = _select_batch(
                top, ceilings, want,
                prior_concats={pl + pr for pl, pr, _ in merges},
            )
        merges.extend(picked)
        syms = F.col("syms")
        for l, r, _ in picked:
            syms = _apply_merge(syms, l, r)
        vocab = vocab.select("word", "n", syms.alias("syms")).localCheckpoint(
            eager=True
        )
        rounds += 1
    return BpeResult(merges=merges, vocab=vocab, rounds=rounds)


def merges_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    rows = [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, cnt bigint"
    )


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    checkpoint_every: int = 16,
) -> DataFrame:
    """Replay the merge table over a (word, ...) table: adds ``syms``.
    One fold-scan per merge; lineage cut every ``checkpoint_every``
    rounds so codegen expression depth stays bounded at real tokenizer
    sizes (thousands of merges)."""
    out = words.withColumn("syms", _char_symbols("word"))
    for i, m in enumerate(merges):
        out = out.withColumn("syms", _apply_merge(F.col("syms"), m[0], m[1]))
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=False)
    return out


def bpe_encode_stats(
    docs: DataFrame,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_subwords) per document under the learned merges.

    The merge replay runs on the distinct-word table only; documents
    are touched by one explode + one hash join on ``word``.
    """
    ex = docs.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("word"))
    sizes = segment_words(ex.select("word").distinct(), merges).select(
        "word", F.size("syms").alias("_k")
    )
    per_doc = (
        ex.join(sizes, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_w"),
            F.sum("_k").alias("_s"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("_w", F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce("_s", F.lit(0)).cast("bigint").alias("n_subwords"),
        )
    )
