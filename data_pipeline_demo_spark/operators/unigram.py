"""Unigram-LM subword tokenizer (SentencePiece's algorithm): vocabulary
induction by EM + pruning, tokenization by Viterbi best segmentation.

Kudo 2018, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (public paper) — the OTHER
mainstream subword scheme beside BPE (``operators/bpe.py``): instead of
greedy merges, fit a unigram language model over a candidate piece
inventory and keep the ``vocab_size`` pieces the model likes best.

Scale shape — the same industrial split as BPE and for the same reason:

- **counting is distributed**: the word-frequency table comes from one
  explode + combinable groupBy; its size is the DISTINCT vocabulary
  (capped deterministically at ``max_words``), not the corpus.
- **EM + pruning are driver-side over that table**: every E-step is a
  forward-backward pass per DISTINCT word weighted by its count —
  O(distinct words × len × max_piece_len), corpus-size-independent.
- **tokenization is map-only**: piece log-probs broadcast into an
  Arrow-batch ``mapInPandas`` kernel with per-batch word memoization;
  Viterbi over a word is O(len × max_piece_len). No shuffle.

Reference scope note: the reference pipeline has no tokenizer; this
extends the §2 text-analysis family per the LLM-ops charter
(`BASELINE.json` north star).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts

_NEG_INF = float("-inf")


def _seed_pieces(
    words: list[tuple[str, int]], max_piece_len: int, seed_size: int
) -> dict[str, float]:
    """Candidate inventory: every substring of length ≤ max_piece_len,
    scored by count-weighted occurrence; ALL single characters are kept
    unconditionally (they guarantee every training word stays
    segmentable through every pruning round), plus the top
    ``seed_size`` multi-character candidates (deterministic tie-break
    on the piece)."""
    counts: dict[str, float] = {}
    for w, n in words:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0.0) + n
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )[: int(seed_size)]
    return {**chars, **dict(multi)}


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def _forward_backward(
    word: str, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word under the current model plus
    the word's log-likelihood — the textbook lattice forward-backward
    over all segmentations (log-space)."""
    L = len(word)
    fwd = [_NEG_INF] * (L + 1)
    fwd[0] = 0.0
    for j in range(1, L + 1):
        acc = _NEG_INF
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None or fwd[i] == _NEG_INF:
                continue
            x = fwd[i] + lp
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        fwd[j] = acc
    ll = fwd[L]
    if ll == _NEG_INF:
        return {}, _NEG_INF
    bwd = [_NEG_INF] * (L + 1)
    bwd[L] = 0.0
    for i in range(L - 1, -1, -1):
        acc = _NEG_INF
        for j in range(i + 1, min(i + max_len, L) + 1):
            lp = logp.get(word[i:j])
            if lp is None or bwd[j] == _NEG_INF:
                continue
            x = lp + bwd[j]
            acc = x if acc == _NEG_INF else (
                max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
            )
        bwd[i] = acc
    exp: dict[str, float] = {}
    for i in range(L):
        if fwd[i] == _NEG_INF:
            continue
        for j in range(i + 1, min(i + max_len, L) + 1):
            lp = logp.get(word[i:j])
            if lp is None or bwd[j] == _NEG_INF:
                continue
            post = math.exp(fwd[i] + lp + bwd[j] - ll)
            if post > 0.0:
                p = word[i:j]
                exp[p] = exp.get(p, 0.0) + post
    return exp, ll


def _em_step(
    words: list[tuple[str, int]], logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """One EM iteration over the word-frequency table. Returns the
    re-estimated log-probs and the corpus log-likelihood BEFORE the
    update (EM guarantees the next one is ≥ this)."""
    expected: dict[str, float] = {}
    total_ll = 0.0
    for w, n in words:
        exp, ll = _forward_backward(w, logp, max_len)
        if ll == _NEG_INF:
            continue  # unsegmentable (chars pruned?) — cannot happen
        total_ll += n * ll
        for p, c in exp.items():
            expected[p] = expected.get(p, 0.0) + n * c
    return _normalize(expected), total_ll


def unigram_train(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_words: int = 100_000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    prune_ratio: float = 0.25,
    lowercase: bool = True,
) -> dict:
    """Learn a unigram-LM subword vocabulary of (at most) ``vocab_size``
    pieces. Seed with frequent substrings, then alternate ``em_iters``
    EM passes with pruning the worst ``prune_ratio`` of multi-character
    pieces until the inventory fits — SentencePiece's train loop (its
    exact loss-based pruning replaced by probability-rank pruning;
    single characters are never pruned, so coverage of the training
    alphabet is structural). Deterministic: seed selection, EM, and
    pruning all tie-break on the piece string. Returns a
    JSON-serializable ``{"pieces": {piece: logp}, "lowercase": ...,
    "max_piece_len": ...}`` model."""
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if not 0.0 < prune_ratio < 1.0:
        raise ValueError(f"prune_ratio must be in (0,1), got {prune_ratio}")
    rows = (
        word_counts(df, text_col, lowercase)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(int(max_words))
        .collect()
    )
    words = [(r["word"], r["n"]) for r in rows]
    if not words:
        return {
            "pieces": {},
            "lowercase": bool(lowercase),
            "max_piece_len": int(max_piece_len),
        }
    seed = _seed_pieces(
        words, max_piece_len, seed_size=max(vocab_size * seed_factor, 16)
    )
    logp = _normalize(seed)
    n_chars = sum(1 for p in logp if len(p) == 1)
    while True:
        for _ in range(int(em_iters)):
            logp, _ = _em_step(words, logp, max_piece_len)
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(vocab_size - n_chars, 0)
        if n_multi <= target_multi:
            break
        keep = max(int(n_multi * (1.0 - prune_ratio)), target_multi)
        if keep >= n_multi:
            keep = target_multi
        ranked = sorted(
            ((p, lp) for p, lp in logp.items() if len(p) > 1),
            key=lambda plp: (-plp[1], plp[0]),
        )
        kept_multi = dict(ranked[:keep])
        logp = {
            p: lp
            for p, lp in logp.items()
            if len(p) == 1 or p in kept_multi
        }
        logp, _ = _em_step(words, logp, max_piece_len)
    logp, _ = _em_step(words, logp, max_piece_len)
    return {
        "pieces": dict(sorted(logp.items())),
        "lowercase": bool(lowercase),
        "max_piece_len": int(max_piece_len),
    }


def viterbi_segment(
    word: str, pieces: dict[str, float], max_len: int
) -> list[str]:
    """Best segmentation under the unigram model (max sum of piece
    log-probs; ties prefer FEWER pieces, then lexicographically earlier
    boundaries — fully deterministic). Characters outside the learned
    alphabet fall back to themselves at a floor score below every
    learned piece, so any string segments."""
    if not word:
        return []
    floor = (min(pieces.values()) if pieces else 0.0) - 10.0
    L = len(word)
    # (score, -n_pieces) maximized; back[i] = (start, piece)
    best = [(_NEG_INF, 0)] * (L + 1)
    best[0] = (0.0, 0)
    back: list[tuple[int, str] | None] = [None] * (L + 1)
    for j in range(1, L + 1):
        for i in range(max(0, j - max_len), j):
            if best[i][0] == _NEG_INF:
                continue
            p = word[i:j]
            lp = pieces.get(p)
            if lp is None:
                if j - i != 1:
                    continue
                lp = floor
            cand = (best[i][0] + lp, best[i][1] - 1)
            if cand > best[j]:
                best[j] = cand
                back[j] = (i, p)
    out: list[str] = []
    j = L
    while j > 0:
        i, p = back[j]
        out.append(p)
        j = i
    out.reverse()
    return out


def unigram_tokenize(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Map-only Viterbi tokenization: piece log-probs ride into an
    Arrow-batch kernel with per-batch word memoization (each distinct
    word segments once per batch). Appends ``out_col`` (array<string>);
    concatenating a word's pieces recovers the word exactly (tested)."""
    pieces = model["pieces"]
    max_len = int(model.get("max_piece_len", 8))
    lowercase = model.get("lowercase", True)
    fields = df.schema.fieldNames()

    def run(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}

            def enc(text):
                toks: list[str] = []
                t = text.lower() if lowercase else text
                for w in t.split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = viterbi_segment(w, pieces, max_len)
                    toks.extend(got)
                return toks

            pdf = pdf.copy()
            pdf[out_col] = [enc(t) for t in pdf[text_col]]
            yield pdf

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<string>"]
    )
    return df.mapInPandas(run, schema).select(*fields, out_col)


def unigram_token_frequencies(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus token-frequency table under the learned unigram
    vocabulary — one tokenize scan + one combinable groupBy; optional
    deterministic top-k."""
    tok = unigram_tokenize(df, model, text_col)
    freq = (
        tok.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k is not None:
        freq = freq.orderBy(F.col("n").desc(), F.col("token")).limit(int(top_k))
    return freq
