"""Distributed byte-pair-encoding training + encoding.

The trainer the rest of the corpus pipeline feeds (token_vocabulary
counts words; pack_sequences budgets BPE tokens — this learns the BPE
itself).  Semantics follow the public reference algorithm (Sennrich,
Haddow & Birch 2016, "Neural Machine Translation of Rare Words with
Subword Units"): merges are learned over a WORD-FREQUENCY table,
adjacent-pair occurrences are counted with overlaps
(``zip(word, word[1:])``), each merge is applied left-to-right
non-overlapping, ties break deterministically on
(count desc, pair lexicographic).

Scale design — the part Spark buys:

- the 100 TB corpus collapses to its distinct pre-tokenized words in
  ONE scan (``word_freq_table``: narrow split/explode -> hash agg).
  Every training iteration after that runs on the word table, whose
  size is the corpus' VOCABULARY, not its volume: iterations are
  corpus-size-independent.
- size-based plan selection, same decision as ``dedup_clusters``: a
  word table at or under ``small_vocab_words`` rows is collected once
  and trained with an incremental pair-index kernel on the driver
  (per-merge cost ~ words containing the pair, not the table) — zero
  iterative Spark jobs, identical merges.  The default threshold is
  byte-sized like dedup_clusters' edge cap: 200k words cost ~100-200
  MB of driver heap as Python char lists + pair index (dicts/sets of
  int entries dominate at ~60-100 B each — far heavier per row than
  the 16 B/edge numpy kernel), a broadcast-class transfer, not a
  multi-GB one.  Above it, the distributed loop runs: per round one pair-count aggregate over the checkpointed
  word table + one Arrow re-segmentation kernel, lineage cut by an
  eager ``localCheckpoint`` per round (superseded rounds released).
- ``merges_per_round > 1`` batches symbol-disjoint merges per
  distributed round (the standard distributed-BPE approximation —
  picks k merges from ONE ranking, so ranks are stale for later picks
  in the batch; exact Sennrich order is guaranteed only at 1).

No SQL oracle: BPE training is genuinely iterative (each merge
depends on all previous merges), the class the driver contract
exempts; correctness is pinned by an in-test reference
implementation written independently of this module (full recount,
no index) plus local==distributed equality.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _release_local_checkpoint
from .pipeline import _WS_ASCII

__all__ = ["word_freq_table", "train_bpe", "apply_bpe",
           "save_bpe", "load_bpe"]


def word_freq_table(df: DataFrame, text_col: str = "text",
                    lowercase: bool = False) -> DataFrame:
    """``(word, n)`` over the whitespace pre-tokenization — the single
    corpus scan of BPE training.  Narrow split/explode then one hash
    aggregate on the word; all downstream iterations see only this.
    (Case is the caller's choice — unlike ``text._tokens`` this does
    NOT fold case unless asked; the :func:`apply_bpe` kernel
    pre-tokenizes with the exact Python twin of this split.  The
    lowercase=True twin of the gated ``pipeline.token_vocabulary``
    counts is pinned by a differential test — change tokenization
    semantics in BOTH or neither.)"""
    t = F.col(text_col)
    if lowercase:
        # Python casing on BOTH sides: JVM lowercase and str.lower()
        # disagree on locale/context-sensitive mappings (Turkish I,
        # final sigma), and the encode kernel folds with str.lower —
        # the trained symbols must match what encoding produces.  The
        # default (no fold) path stays pure codegen.
        @F.pandas_udf(T.StringType())
        def _py_lower(s: pd.Series) -> pd.Series:
            return s.str.lower()

        t = _py_lower(t)
    w = F.explode(F.split(F.trim(t), r"\s+")).alias("word")
    return (df.select(w).where(F.length("word") > 0)
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _py_words(text: str, lowercase: bool) -> list:
    """Python twin of word_freq_table's split (Java ``\\s`` is
    ASCII-only and Spark trim strips spaces — see pipeline._WS_ASCII)."""
    if lowercase:
        text = text.lower()
    return [w for w in _WS_ASCII.split(text.strip(" ")) if w]


def _merge_seq(syms: list, a: str, b: str, ab: str) -> list:
    """Apply one merge left-to-right, non-overlapping (the reference
    replace semantics): 'a a a' under (a,a) -> ['aa', 'a']."""
    out = []
    i = 0
    last = len(syms) - 1
    while i <= last:
        if i < last and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pairs_of(syms: list) -> list:
    return list(zip(syms, syms[1:]))


def _train_local(words: list[tuple[str, int]], num_merges: int,
                 min_pair_count: int) -> list[tuple[str, str]]:
    """Exact sequential trainer over a collected word table with an
    incremental pair index: per merge, only words CONTAINING the pair
    are re-segmented and only their pair deltas touch the counts."""
    seqs = [list(w) for w, _ in words]
    cnts = [int(n) for _, n in words]
    pair_n: dict[tuple, int] = defaultdict(int)
    pair_w: dict[tuple, set] = defaultdict(set)
    for i, (s, n) in enumerate(zip(seqs, cnts)):
        for p in _pairs_of(s):
            pair_n[p] += n
            pair_w[p].add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_n:
            break
        # deterministic argmax: count desc, then pair lexicographic
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] < min_pair_count:
            break
        a, b = best
        ab = a + b
        for i in sorted(pair_w[best]):
            old = seqs[i]
            n = cnts[i]
            for p in _pairs_of(old):
                pair_n[p] -= n
                if pair_n[p] <= 0:
                    del pair_n[p]
            new = _merge_seq(old, a, b, ab)
            seqs[i] = new
            for p in _pairs_of(new):
                pair_n[p] += n
                pair_w[p].add(i)
        # stale word-index entries are filtered lazily: pair_w may
        # still list words that no longer contain a pair — harmless,
        # the per-word delta above recomputes from the actual sequence
        del pair_w[(a, b)]
        merges.append((a, b))
    return merges


_SYMS_TYPE = T.ArrayType(T.StringType())


def train_bpe(df: DataFrame, num_merges: int, text_col: str = "text",
              lowercase: bool = False, min_pair_count: int = 2,
              merges_per_round: int = 1,
              small_vocab_words: int = 200_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus DataFrame; returns
    the ordered merge list (a driver-side object by design — it IS the
    model, vocab-sized, like ``fit_centroids``' centroid matrix).

    See the module docstring for plan selection and the
    ``merges_per_round`` approximation contract.  Training stops early
    when no pair reaches ``min_pair_count``.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    if merges_per_round < 1:
        raise ValueError(
            f"merges_per_round must be >= 1, got {merges_per_round}")
    wf = word_freq_table(df, text_col=text_col, lowercase=lowercase)
    wp = wf.persist()
    n_words = wp.count()
    if n_words == 0:
        wp.unpersist()
        return []
    if n_words <= small_vocab_words:
        rows = wp.collect()
        wp.unpersist()
        return _train_local([(r["word"], r["n"]) for r in rows],
                            num_merges, min_pair_count)

    # char split in an Arrow kernel, not F.split(word, ''): Python
    # list() splits by CODE POINT where Java splits by UTF-16 unit —
    # astral-plane chars must segment identically to the local path
    @F.pandas_udf(_SYMS_TYPE)
    def to_chars(w: pd.Series) -> pd.Series:
        return w.map(list)

    words = wp.select(to_chars("word").alias("syms"),
                      F.col("n")).localCheckpoint()
    wp.unpersist()
    merges: list[tuple[str, str]] = []
    while len(merges) < num_merges:
        pair_counts = (
            # single-symbol words hold no pairs — and sequence(1, 0)
            # DESCENDS in Spark, so they must not reach the transform
            words.where(F.size("syms") > 1)
            .select(
                "n",
                F.explode(F.expr(
                    "transform(sequence(1, size(syms) - 1), "
                    "i -> struct(syms[i-1] AS a, syms[i] AS b))"
                )).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
        )
        want = min(merges_per_round, num_merges - len(merges))
        # over-fetch: disjointness filtering happens below, and early
        # rounds are conflict-heavy (top pairs share hot symbols) — a
        # bare limit(want) would under-fill the batch and inflate the
        # round count.  The fetch is still a tiny driver list.
        fetch = want if want == 1 else min(8 * want, want + 256)
        top = (pair_counts.where(F.col("cnt") >= min_pair_count)
               .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
               .limit(fetch).collect())
        if not top:
            break
        batch: list[tuple[str, str]] = []
        used: set[str] = set()
        for r in top:
            a, b = r["a"], r["b"]
            if a in used or b in used:
                continue  # symbol-disjoint batching only
            batch.append((a, b))
            used.update((a, b, a + b))
            if len(batch) == want:
                break
        @F.pandas_udf(_SYMS_TYPE)
        def apply_batch(syms: pd.Series) -> pd.Series:
            out = []
            for s in syms:
                s = list(s)
                for a, b in batch:
                    s = _merge_seq(s, a, b, a + b)
                out.append(s)
            return pd.Series(out)

        # eager checkpoint truncates lineage each round; the superseded
        # round's blocks are released immediately (dedup_clusters
        # protocol — a released checkpoint must never be scanned again).
        # Fully-merged single-symbol words can never pair again and are
        # dropped, so the table SHRINKS as hot words finish merging
        nxt = (words.select(apply_batch("syms").alias("syms"), "n")
               .where(F.size("syms") > 1)
               .localCheckpoint())
        _release_local_checkpoint(words)
        words = nxt
        merges.extend(batch)
    _release_local_checkpoint(words)
    return merges[:num_merges]


def apply_bpe(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text", lowercase: bool = False,
              out_col: str = "bpe_tokens") -> DataFrame:
    """Encode texts with a learned merge list: each pre-tokenized word
    is re-segmented by repeatedly applying the PRESENT pair with the
    lowest merge rank (the standard priority encode — equivalent to
    replaying the training merges in order) — one Arrow kernel, one
    narrow pass, merge ranks shipped in the closure (vocab-sized).
    Distinct words are encoded once per Arrow batch (corpus word
    frequency makes the per-word cache hit rate high).

    Output: input columns + ``out_col`` (array<string>) +
    ``n_bpe`` (int) token count.
    """
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word)
        while len(syms) > 1:
            best = None
            for p in _pairs_of(syms):
                r = ranks.get(p)
                if r is not None and (best is None or r < best[0]):
                    best = (r, p)
            if best is None:
                break
            (a, b) = best[1]
            syms = _merge_seq(syms, a, b, a + b)
        cache[word] = syms
        return syms

    @F.pandas_udf(_SYMS_TYPE)
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            toks = []
            if t:
                for w in _py_words(t, lowercase):
                    toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    t = F.col(text_col)
    return (df.withColumn(out_col, encode(t))
            .withColumn("n_bpe", F.size(out_col).cast("int")))


def save_bpe(merges: list[tuple[str, str]], path: str) -> None:
    """Persist a learned merge list as JSON — the model artifact a
    separate encode job (or a restarted stream) loads.  Order IS the
    model; the file keeps it.  Written tmp-then-rename so a crash
    mid-write can neither truncate the artifact nor destroy a
    previous good model at the same path."""
    import json
    import os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"format": "bpe-merges-v1",
                   "merges": [list(p) for p in merges]}, f)
    os.replace(tmp, path)


def load_bpe(path: str) -> list[tuple[str, str]]:
    """Load a merge list written by :func:`save_bpe` — payload
    validated, not just the format tag (a malformed entry would
    otherwise load silently and never match during encode)."""
    import json

    with open(path) as f:
        d = json.load(f)
    if d.get("format") != "bpe-merges-v1":
        raise ValueError(f"not a bpe-merges-v1 file: {path}")
    merges = d.get("merges")
    if not isinstance(merges, list) or any(
        not (isinstance(p, list) and len(p) == 2
             and all(isinstance(x, str) for x in p))
        for p in merges
    ):
        raise ValueError(
            f"corrupt bpe-merges-v1 payload in {path}: 'merges' must "
            "be a list of [str, str] pairs")
    return [tuple(p) for p in merges]
