"""Real byte-pair-encoding token counting (r3 verdict ask #4): a
merges-table BPE encoder replacing the `bpe_ish` regex heuristic where
token budgets must match a real tokenizer — sequence packing, quality
stats, cost estimation at training scale.

Spark shape: the merges table is a driver-side constant closed over by
ONE Arrow pandas_udf (`bpe_token_count_udf`); inside each batch the
kernel pre-tokenizes with the GPT-2-style word regex and encodes each
DISTINCT word once (the standard tokenizer word-cache — Zipf makes the
distinct-word set per batch tiny relative to occurrences), then sums
cached lengths per row. No per-row Spark Python, no shuffle: the count
rides the scan exactly like `token_count_expr`.

The merges themselves are DATA, not code (a vocab file in a real
system): `train_bpe` learns them deterministically (max pair count,
lexicographic tiebreak) and `default_merges()` caches a table trained
on the embedded seed corpus below. The driver gate's oracle is an
INDEPENDENT pure-Python encoder in tools/make_fixtures.py consuming
the same merges table — implementation-independent like the XXH64
fixtures.

No reference counterpart: the reference estimates LLM cost from
character counts (/root/reference/app/utils/cost_calculator.py); a
training-data pipeline needs the real thing.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F

# GPT-2-style pre-tokenizer (the bpe_ish regex, applied in Python so
# the Spark kernel and the pure-Python oracle split identically).
PRETOKEN_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

# Deterministic seed corpus for the default merges table — insurance
# flavored so the default vocabulary compresses the domain's hot words.
_SEED_CORPUS = """
the insured party shall pay the premium for the policy period stated
on the declarations page and the insurer shall provide coverage for
general liability up to the limit of liability stated therein
this quote is valid for thirty days from the quote date and the
effective date of coverage begins upon receipt of payment in full
commission percentage payable to the broker is calculated on the net
premium excluding taxes and fees as itemized in the schedule
workers compensation coverage applies to employees of the named
insured within the state of operation subject to statutory limits
property coverage includes buildings contents and business personal
property against fire theft and water damage subject to deductible
the total insured value and the deductible amount are stated in the
coverage schedule attached to and forming part of this policy
cancellation requires written notice thirty days in advance and any
unearned premium will be returned on a pro rata basis to the insured
"""


def train_bpe(texts: list[str], n_merges: int = 256) -> list[tuple[str, str]]:
    """Learn a merges table: repeatedly merge the most frequent
    adjacent symbol pair across the word-frequency dictionary
    (lexicographic pair tiebreak → fully deterministic). Classic
    Sennrich et al. 2016 training over PRETOKEN_RE words."""
    freqs: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in PRETOKEN_RE.findall(t):
            k = tuple(w)
            freqs[k] = freqs.get(k, 0) + 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for word, n in freqs.items():
            for a, b in zip(word, word[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_freqs: dict[tuple[str, ...], int] = {}
        for word, n in freqs.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            k = tuple(out)
            new_freqs[k] = new_freqs.get(k, 0) + n
        freqs = new_freqs
    return merges


@lru_cache(maxsize=1)
def default_merges() -> tuple[tuple[str, str], ...]:
    """The packaged merges table: trained once per process from the
    embedded seed corpus (deterministic; ~1 ms)."""
    return tuple(train_bpe([_SEED_CORPUS], n_merges=256))


def bpe_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2 merge loop: repeatedly merge ALL occurrences of the
    lowest-rank pair present until none applies."""
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_pair = None
        for pair in zip(parts, parts[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, pair
        if best_pair is None:
            break
        a, b = best_pair
        out: list[str] = []
        i = 0
        while i < len(parts):
            if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


def bpe_token_count_udf(merges: tuple[tuple[str, str], ...] | None = None):
    """Arrow pandas_udf: BPE token count per text (null → null). The
    encoder runs once per DISTINCT word per batch via a kernel-local
    cache; rows sum cached lengths. Executors rebuild the tiny ranks
    dict from the serialized merges tuple — no broadcast needed for a
    vocab-file-sized constant (a 50k-merge production table would ride
    a broadcast instead; the seam is this closure)."""
    table = tuple(default_merges() if merges is None else merges)

    @F.pandas_udf("long")
    def n_bpe(texts: pd.Series) -> pd.Series:
        ranks = {pair: i for i, pair in enumerate(table)}
        cache: dict[str, int] = {}

        def count_one(t):
            if t is None:
                return None
            total = 0
            for w in PRETOKEN_RE.findall(t):
                n = cache.get(w)
                if n is None:
                    n = len(bpe_encode(w, ranks))
                    cache[w] = n
                total += n
            return total

        return texts.map(count_one)

    return n_bpe
