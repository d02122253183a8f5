"""Pretrained BPE merge table + corpus-wide apply (VERDICT r5 #1).

The round-5 BPE lanes train and apply ``_BPE_ROUNDS = 3`` merges — a
correctness-shaped toy. Real tokenizers ship a PRETRAINED table of
10^3-10^5 merges and the apply pass is the single hottest operator in
a training-data pipeline. This module provides the production shape:

- :func:`pretrained_merges` — a deterministic >=1024-entry merge table
  trained (classic Sennrich 2016 counting, pure Python, incremental
  pair-count maintenance) on a fixed synthetic English-morphology seed
  corpus embedded below. Training is driver-side and cached per
  process; at fleet scale the table is a distributed artifact loaded
  once — what matters is that the APPLY path below never depends on
  table size linearly per token.
- :func:`bpe_apply_lowest_rank` — the per-word apply used by real
  tokenizers (GPT-2 ``bpe()``): repeatedly merge the lowest-ranked
  pair present. Per-word cost is O(len^2) in the worst case and
  INDEPENDENT of merge-table size — the property that makes 50k-merge
  production tables affordable.
- :func:`bpe_apply_in_order` — the SQL-expressible equivalent: one
  greedy-leftmost replace-all pass per merge, in rank order, over the
  boundary-safe ``|x||y|`` encoding (the same encoding as the trained
  lanes in queries/sketch_ops.py). The DuckDB oracle runs exactly this
  via ``list_reduce`` over the literal pattern list.

Equivalence (why one in-order pass == lowest-rank-first, so the oracle
is exact): merges only CONCATENATE adjacent tokens, so a new adjacency
always involves the token the merge just created; any merge consuming
that token was learned later (the component had to exist during
training) and therefore has a higher rank. Hence when the in-order
pass reaches rank r, no lower-ranked pair can ever reappear. The one
loophole is surface-string collisions (two merge paths producing equal
strings would alias pairs compared as strings), which training closes
by skipping candidate pairs whose concatenation is already a vocab
string — the same unique-vocab invariant real tokenizers enforce via
their string->id vocab map. tests/test_corpus_ops.py pins the
equivalence on the live corpus vocabulary and on randomized words.

Reference for semantics parity: the trained-table lanes at
queries/sketch_ops.py (text_bpe_train / text_bpe_apply); reference
repo has no tokenizer surface (uts.ts is a time-series store) — this
is part of the LLM-pipeline operator set the build brief adds.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from functools import lru_cache

_N_MERGES = 1024

# Seed corpus: common-English stems x derivational/inflectional
# suffixes, Zipf-weighted. Naive concatenation yields some non-words —
# irrelevant: the table only needs realistic ENGLISH CHARACTER
# STATISTICS so merge priorities conflict the way a real table's do.
_STEMS = (
    "the and that have with this from they would there their what about "
    "which when make like time just know take people into year your good "
    "some could them other than then look only come over think also back "
    "after work first well even want because these give most table value "
    "order stream window filter group merge batch query scan sort hash "
    "join column row line part key data small big fast slow spark vector "
    "customer supplier nation region price total count system process "
    "state result number record market share power water light paper "
    "house point world school family student question govern interest "
    "develop present company program problem service friend father "
    "mother business country"
).split()
_SUFFIXES = (
    "", "s", "ed", "ing", "er", "ers", "est", "ly", "ment", "ness",
    "tion", "able", "ion", "al", "ity", "ize", "ized", "ful", "less",
    "ish",
)


def _seed_words() -> list[tuple[str, int]]:
    """Deterministic (word, freq) seed corpus, Zipf-weighted by
    enumeration order (stem-major), suffixed forms rarer than stems."""
    out: list[tuple[str, int]] = []
    rank = 0
    for stem in _STEMS:
        for j, suf in enumerate(_SUFFIXES):
            rank += 1
            freq = max(1, 6000 // (rank + 10 * j))
            out.append((stem + suf, freq))
    return out


def _merge_seg(seg: tuple[str, ...], x: str, y: str) -> tuple[str, ...]:
    """Greedy-leftmost merge of ALL (x, y) adjacencies — the scan order
    string replace implements, shared by both apply variants."""
    out: list[str] = []
    i = 0
    n = len(seg)
    while i < n:
        if i + 1 < n and seg[i] == x and seg[i + 1] == y:
            out.append(x + y)
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return tuple(out)


@lru_cache(maxsize=1)
def pretrained_merges() -> tuple[tuple[str, str], ...]:
    """Train the merge table once per process: classic frequency-greedy
    BPE with the repo's deterministic tie-break (freq desc, x asc,
    y asc), incremental pair-count maintenance (only words containing
    the merged pair are touched), and the unique-vocab-string skip
    documented in the module docstring."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w), f) for w, f in _seed_words()
    ]
    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)  # pair -> word indexes (may go stale)
    for wi, (seg, freq) in enumerate(words):
        for pair in zip(seg, seg[1:]):
            counts[pair] += freq
            where[pair].add(wi)

    vocab = {c for seg, _ in words for c in seg}
    merges: list[tuple[str, str]] = []
    while len(merges) < _N_MERGES and counts:
        best = min(
            (p for p in counts if p[0] + p[1] not in vocab),
            key=lambda p: (-counts[p], p),
            default=None,
        )
        if best is None:
            break
        x, y = best
        merges.append(best)
        vocab.add(x + y)
        for wi in list(where[best]):
            seg, freq = words[wi]
            if best not in zip(seg, seg[1:]):  # stale index entry
                where[best].discard(wi)
                continue
            for pair in zip(seg, seg[1:]):
                counts[pair] -= freq
                if counts[pair] <= 0:
                    del counts[pair]
            new = _merge_seg(seg, x, y)
            words[wi] = (new, freq)
            for pair in zip(new, new[1:]):
                counts[pair] += freq
                where[pair].add(wi)
        counts.pop(best, None)
    if len(merges) < _N_MERGES:
        raise AssertionError(
            f"seed corpus exhausted at {len(merges)} merges; enlarge _STEMS"
        )
    return tuple(merges)


@lru_cache(maxsize=1)
def pretrained_vocab_ids() -> dict[str, int]:
    """token string -> 1-based id: the 26 base letters first (the apply
    corpus is [a-z]+ words, so every base symbol must have an id even
    if absent from the seed corpus), then merge outputs in rank order.
    Unique by the training-time skip, so the mapping is a bijection."""
    ids: dict[str, int] = {}
    for c in "abcdefghijklmnopqrstuvwxyz":
        ids[c] = len(ids) + 1
    for x, y in pretrained_merges():
        tok = x + y
        assert tok not in ids, tok
        ids[tok] = len(ids) + 1
    return ids


@lru_cache(maxsize=1)
def _rank_table() -> dict[tuple[str, str], int]:
    return {p: r for r, p in enumerate(pretrained_merges())}


def bpe_apply_lowest_rank(word: str, ranks: dict | None = None) -> list[str]:
    """Production apply (GPT-2 ``bpe()`` shape): repeatedly merge the
    lowest-ranked pair present, greedy-leftmost. Cost independent of
    merge-table size."""
    if ranks is None:
        ranks = _rank_table()
    seg = tuple(word)
    while len(seg) > 1:
        best = None
        best_rank = None
        for pair in set(zip(seg, seg[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = pair, r
        if best is None:
            break
        seg = _merge_seg(seg, best[0], best[1])
    return list(seg)


def bpe_apply_in_order(word: str, merges=None) -> list[str]:
    """Oracle-shaped apply: one greedy-leftmost pass per merge, in rank
    order — provably equal to :func:`bpe_apply_lowest_rank` for tables
    with the unique-vocab invariant (module docstring)."""
    if merges is None:
        merges = pretrained_merges()
    seg = tuple(word)
    for x, y in merges:
        if len(seg) == 1:
            break
        seg = _merge_seg(seg, x, y)
    return list(seg)


def merge_patterns_sql() -> str:
    """The merge table as a DuckDB list literal of boundary-safe
    patterns ``'|x||y|'`` in rank order — the oracle applies them with
    ``list_reduce(..., (acc, p) -> replace(acc, p, replace(p, '||', '')))``."""
    pats = ", ".join(f"'|{x}||{y}|'" for x, y in pretrained_merges())
    return f"[{pats}]"


def vocab_values_sql() -> str:
    """The vocabulary as a DuckDB VALUES table ``(tok, tid)``."""
    rows = ", ".join(f"('{t}', {i})" for t, i in pretrained_vocab_ids().items())
    return f"(VALUES {rows})"
